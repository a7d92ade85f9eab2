package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Ingest

class IngestSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("payload round trip: encode -> decode -> normalize reproduces the source") {
    val orders = Tables.orders(spark, Sf0001)
    val out = Ingest.normalizeOrders(Ingest.payloadsFrom(orders))
    val src = orders.select(
      col("o_orderkey").as("shopify_order_id"),
      col("o_totalprice").as("total_price"),
      col("o_orderdate").as("created_at"),
      col("o_orderstatus").as("currency"))
    val diff = out.drop("raw", "shop_domain")
      .exceptAll(src)
      .count()
    assert(diff == 0, "normalized rows must equal the source columns exactly")
    assert(out.count() == orders.count())
  }

  test("product payload round trip reproduces the part columns") {
    val part = Tables.part(spark, Sf0001)
    val out = Ingest.normalizeProducts(Ingest.productPayloadsFrom(part))
    val src = part.select(
      col("p_partkey").as("shopify_product_id"),
      col("p_name").as("title"),
      col("p_brand").as("vendor"),
      col("p_retailprice").as("price"))
    assert(out.exceptAll(src).count() == 0)
    assert(out.count() == part.count())
  }

  test("raw archive column is valid JSON holding the full payload (F8)") {
    val raw = Ingest.normalizeOrders(Ingest.payloadsFrom(Tables.orders(spark, Sf0001)))
      .select(get_json_object(col("raw"), "$.total_price").as("tp"),
              col("total_price"))
      .filter(col("tp").cast("double") =!= col("total_price"))
    assert(raw.count() == 0)
  }

  test("shop domain scheme is stripped (F9)") {
    val doms = Ingest.normalizeOrders(Ingest.payloadsFrom(Tables.orders(spark, Sf0001)))
      .select("shop_domain").distinct().as[String].collect()
    assert(doms.nonEmpty && doms.forall(d => d.startsWith("tenant-") && !d.contains("https://")))
  }

  test("customerDisplayName matches JS `${first} ${last}`.trim() nulls included (F5)") {
    val r = Seq(
      (Some("Ada"), Some("Lovelace")),
      (Some("Ada"), None),
      (None, Some("Lovelace")),
      (Option.empty[String], Option.empty[String]))
      .toDF("f", "l")
      .select(Ingest.customerDisplayName(col("f"), col("l")).as("n"))
      .as[String].collect()
    assert(r.toSeq == Seq("Ada Lovelace", "Ada", "Lovelace", ""))
  }

  test("paged fetch: stubbed 250-row pager reproduces ingest_customers exactly") {
    // the wire payloads a cursor-paged REST sync would deliver, pre-sliced
    // into pages (the reference caps pages at 250 rows,
    // services/shopifyApi.js:24; 40 here so sf0.001's 150 customers span a
    // real multi-page cursor chain)
    val pages = Ingest.customerPayloadsFrom(
        Tables.customer(spark, Sf0001).orderBy("c_custkey"))
      .as[String].collect().grouped(40).toVector
    var calls = 0
    def pager(cursor: Option[String]): (Seq[String], Option[String]) = {
      calls += 1
      val i = cursor.map(_.toInt).getOrElse(0)
      (pages(i).toSeq, if (i + 1 < pages.size) Some((i + 1).toString) else None)
    }
    val viaPaged = Ingest.normalizeCustomers(
      Ingest.pagedPayloads(spark, pager, numPartitions = 4))
    val direct = SparkEntry.queries("ingest_customers")(spark, Sf0001)
    assert(calls == pages.size, "every page fetched exactly once")
    assert(viaPaged.count() == direct.count())
    assert(viaPaged.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaPaged).count() == 0)
  }

  test("paged fetch: runaway cursor chain fails loudly") {
    intercept[IllegalArgumentException] {
      Ingest.fetchAllPages(_ => (Seq("x"), Some("same")), maxPages = 10)
    }
  }
}
