package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch-ingestion row transforms — the reference's API-payload → typed-row
  * extraction (`services/dataIngestion.js:31-64`, SURVEY.md §2.1 S1 + §2.6
  * F5–F9) as one set-oriented pass instead of a per-row upsert loop:
  *
  *  - F5 name concat+trim:   `` `${first} ${last}`.trim() ``            → `trim(concat_ws(" ", …))`
  *  - F6 parseFloat:         `parseFloat(order.total_price)`            → `cast("double")`
  *  - F7 ISO date parse:     `new Date(order.created_at)`               → `to_timestamp`
  *  - F8 raw JSON archive:   `JSON.stringify(obj)` into JSONB           → `to_json(struct(…))`
  *  - F9 domain cleaning:    strip the scheme prefix                    → `regexp_replace`
  *  - S1 payload decode:     Shopify REST JSON body                     → `from_json` with an explicit schema
  *
  * The fetch itself is a driver-side HTTP GET in the reference
  * (`services/shopifyApi.js:17-45`) — network-free here, so [[payloadsFrom]]
  * synthesizes the exact wire shape from the testdata and the pipeline is
  * proven by round-trip: encode → decode → normalize must reproduce what the
  * oracle computes algebraically from the base columns.
  */
object Ingest {

  /** Wire schema of an order payload (fixed DDL, no inference —
    * SURVEY.md §1.3). Every field is a string, as REST JSON delivers it. */
  val orderPayloadSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("total_price", StringType),
    StructField("created_at", StringType),
    StructField("currency", StringType),
    StructField("shop_domain", StringType)))

  /** Synthesizes the JSON documents a Shopify orders pull would deliver —
    * all-string fields, ISO-8601 timestamps, an `https://` shop domain. */
  def payloadsFrom(orders: DataFrame): DataFrame =
    orders.select(to_json(struct(
      col("o_orderkey").cast("string").as("id"),
      col("o_totalprice").cast("string").as("total_price"),
      date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("created_at"),
      col("o_orderstatus").as("currency"),
      concat(lit("https://tenant-"), col("o_orderkey") % 5, lit(".example.com")).as("shop_domain")
    )).as("payload"))

  /** S1 decode + F5–F9 normalization: one declarative pass, no per-row
    * round trips. `raw` keeps the full payload verbatim (the JSONB archive
    * column, `migrations/init.sql:57`).
    */
  def normalizeOrders(payloads: DataFrame): DataFrame =
    payloads
      // bindOnce: the parsed struct is referenced 5 times below —
      // CollapseProject would otherwise re-run from_json per reference
      .select(graft.functions.ExprUtils.bindOnce(
        from_json(col("payload"), orderPayloadSchema)) { o =>
          struct(
            o.getField("id").cast("long").as("shopify_order_id"),
            o.getField("total_price").cast("double").as("total_price"), // F6
            to_timestamp(o.getField("created_at"), "yyyy-MM-dd'T'HH:mm:ss").as("created_at"), // F7
            o.getField("currency").as("currency"),
            regexp_replace(o.getField("shop_domain"), "^https://", "").as("shop_domain")) // F9
        }.as("r"),
        col("payload").as("raw")) // F8 archive
      .select(col("r.*"), col("raw"))

  /** The flagship ingest round trip registered as a driver query: testdata →
    * wire payloads → decode → normalize. Dropping `raw` from the compared
    * output keeps the oracle engine-agnostic (JSON text formatting differs
    * across engines; the archive column is pinned by IngestSpec instead).
    */
  def ingestNormalize(spark: SparkSession, dir: String): DataFrame =
    // sort the narrow BASE, not the result: an orderBy above this pipeline
    // makes the range sampler re-run the whole JSON round trip (measured
    // 2.42→1.00 s at sf0.1); shopify_order_id IS o_orderkey and every op
    // above the sort is order-preserving — see Tables.documentsById.
    // keySorted (not orderBy) keeps the JSON round trip n-way parallel:
    // AQE's byte-based coalescing had serialized it to 2 tasks (r20 opt)
    normalizeOrders(payloadsFrom(
        graft.Tables.keySorted(graft.Tables.orders(spark, dir), "o_orderkey")))
      .drop("raw")

  /** What the round trip must reproduce, computed directly on the base
    * table — double → string → double is exact (shortest round-trip repr),
    * timestamps are second-aligned, and the regex mirrors Spark's.
    */
  val ingestNormalizeSql: String =
    """SELECT o_orderkey AS shopify_order_id,
      |o_totalprice AS total_price,
      |o_orderdate AS created_at,
      |o_orderstatus AS currency,
      |'tenant-' || CAST(o_orderkey % 5 AS VARCHAR) || '.example.com' AS shop_domain
      |FROM orders ORDER BY shopify_order_id""".stripMargin

  /** F5: the reference's customer display name (`dataIngestion.js:41`) —
    * null-safe concat + trim (concat_ws skips nulls like JS template +
    * trim of the stray space).
    */
  def customerDisplayName(first: org.apache.spark.sql.Column,
                          last: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(concat_ws(" ", first, last))

  /** Wire schema of a customer payload. */
  val customerPayloadSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType)))

  /** Customer payload synthesis: name split across first/last fields the
    * way the upstream API delivers it (`mktsegment` stands in for a last
    * name so the concat path is non-trivial). */
  def customerPayloadsFrom(customer: DataFrame): DataFrame =
    customer.select(to_json(struct(
      col("c_custkey").cast("string").as("id"),
      col("c_name").as("first_name"),
      col("c_mktsegment").as("last_name"),
      concat(lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", "")),
        lit("@example.com")).as("email")
    )).as("payload"))

  /** Customer decode + F5 normalization. */
  def normalizeCustomers(payloads: DataFrame): DataFrame =
    payloads
      .select(graft.functions.ExprUtils.bindOnce(
        from_json(col("payload"), customerPayloadSchema)) { c =>
          struct(
            c.getField("id").cast("long").as("shopify_customer_id"),
            customerDisplayName(c.getField("first_name"), c.getField("last_name")).as("name"), // F5
            c.getField("email").as("email"))
        }.as("r"))
      .select(col("r.*"))

  def ingestCustomers(spark: SparkSession, dir: String): DataFrame =
    // base-sorted for the same reason as ingestNormalize
    normalizeCustomers(customerPayloadsFrom(
      graft.Tables.customer(spark, dir).orderBy("c_custkey")))

  val ingestCustomersSql: String =
    """SELECT c_custkey AS shopify_customer_id,
      |TRIM(CONCAT_WS(' ', c_name, c_mktsegment)) AS name,
      |LOWER(REGEXP_REPLACE(c_name, '[^A-Za-z0-9]', '', 'g')) || '@example.com' AS email
      |FROM customer ORDER BY shopify_customer_id""".stripMargin

  // --- products (`services/dataIngestion.js:67-72`) --------------------------
  // The reference fetches the product list, records the count, and drops the
  // rows. The engine analogue keeps the same decode round trip as orders/
  // customers and lands the count-shaped summary the reference records —
  // per-vendor product counts + price stats off the DECODED payloads, so the
  // whole S1 decode path is exercised, not just a count(*).

  /** Wire schema of a product payload. */
  val productPayloadSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("vendor", StringType),
    StructField("price", StringType)))

  /** Product payload synthesis from `part` (brand ≙ vendor). */
  def productPayloadsFrom(part: DataFrame): DataFrame =
    part.select(to_json(struct(
      col("p_partkey").cast("string").as("id"),
      col("p_name").as("title"),
      col("p_brand").as("vendor"),
      col("p_retailprice").cast("string").as("price")
    )).as("payload"))

  /** Product decode: payload → typed row. */
  def normalizeProducts(payloads: DataFrame): DataFrame =
    payloads
      .select(graft.functions.ExprUtils.bindOnce(
        from_json(col("payload"), productPayloadSchema)) { p =>
          struct(
            p.getField("id").cast("long").as("shopify_product_id"),
            p.getField("title").as("title"),
            p.getField("vendor").as("vendor"),
            p.getField("price").cast("double").as("price")) // F6
        }.as("r"))
      .select(col("r.*"))

  /** Decode round trip + the count summary the reference records. */
  def ingestProducts(spark: SparkSession, dir: String): DataFrame =
    normalizeProducts(productPayloadsFrom(graft.Tables.part(spark, dir)))
      .groupBy(col("vendor"))
      .agg(count(lit(1)).as("n_products"),
        round(avg(col("price")), 2).as("avg_price"),
        round(sum(col("price")), 2).as("total_price"))
      .orderBy("vendor")

  val ingestProductsSql: String =
    """SELECT p_brand AS vendor, COUNT(*) AS n_products,
      |ROUND(AVG(p_retailprice), 2) AS avg_price,
      |ROUND(SUM(p_retailprice), 2) AS total_price
      |FROM part GROUP BY p_brand ORDER BY vendor""".stripMargin

  // --- paged REST fetch (`services/shopifyApi.js:17-45`) ---------------------
  // The reference GETs one page (250-row cap) and stops; a faithful client
  // follows the pagination cursor until exhausted. The fetch itself is
  // driver-side and inherently sequential (each cursor comes from the
  // previous response) — that is fine for what REST paging is for:
  // dimension-sized syncs (customers, products). Corpus-scale ingest lands
  // files and goes through the batch/streaming sources instead; this helper
  // exists so the one reference behavior with no engine counterpart has a
  // tested seam. Zero-egress container ⇒ the page function is injected
  // (unit tests stub it; a real deployment passes an HTTP closure).

  /** Paged fetch → one `payload` string column, ready for the
    * `normalize*` decoders. Pages are pulled on the driver (sequential by
    * nature of cursor paging; driver memory = one sync's payloads — the
    * dimension-sized contract above), then distributed so decode +
    * downstream transforms run on executors.
    */
  def pagedPayloads(spark: SparkSession,
                    fetchPage: Option[String] => (Seq[String], Option[String]),
                    numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val ds = spark.createDataset(fetchAllPages(fetchPage)).toDF("payload")
    if (numPartitions > 0) ds.repartition(numPartitions) else ds
  }

  /** Follow a cursor-paged fetch to exhaustion.
    *
    * @param fetchPage None = first page; Some(cursor) = continue. Returns
    *   the page's raw payload documents and the next cursor (None = done).
    * @param maxPages  runaway-pagination guard (a buggy server that echoes
    *   a constant cursor would otherwise loop forever).
    */
  def fetchAllPages(
      fetchPage: Option[String] => (Seq[String], Option[String]),
      maxPages: Int = 100000): Seq[String] = {
    val out = Seq.newBuilder[String]
    var cursor: Option[String] = None
    var pages = 0
    var done = false
    while (!done) {
      require(pages < maxPages, s"pagination did not terminate within $maxPages pages")
      val (rows, next) = fetchPage(cursor)
      out ++= rows
      pages += 1
      cursor = next
      done = next.isEmpty
    }
    out.result()
  }
}
