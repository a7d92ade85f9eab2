package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — rewritten per investigation. Current: decompose
  * profile_columns' 4 s (round 13): min/max(string) buffers force
  * SortAggregate, and fused with the multi-distinct Expand that means TWO
  * full sorts of #cols× expanded rows. Variants: fused (gate as shipped),
  * stats-only (keyless SortAggregate, no Expand), distinct-only (Expand +
  * HashAggregate when buffers are long-only), split = stats × distinct
  * cross join. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.1")
    val cols = graft.operators.Profile.ordersCols.map(_._1)

    def time(name: String)(dfB: => org.apache.spark.sql.DataFrame): Unit = {
      val df = dfB
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-14s min=${ts.min}%.2f s  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      println("  agg ops: " + df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Aggregate") || l.contains("Expand"))
        .map(_.trim.takeWhile(_ != '(')).mkString(" | "))
    }

    time("fused")(graft.operators.Profile.profileOrders(spark, "/root/testdata/sf0.1"))
    time("stats-only")(orders.groupBy().agg(count(lit(1)).as("n"),
      cols.flatMap(c => Seq(count(col(c)).as(s"nn_$c"), min(col(c).cast("string")).as(s"mn_$c"),
        max(col(c).cast("string")).as(s"mx_$c"))): _*))
    time("distinct-only")(orders.groupBy().agg(
      countDistinct(col(cols.head)).as("d0"),
      cols.tail.map(c => countDistinct(col(c)).as(s"d_$c")): _*))
    time("split")(
      orders.groupBy().agg(count(lit(1)).as("n"),
        cols.flatMap(c => Seq(count(col(c)).as(s"nn_$c"), min(col(c).cast("string")).as(s"mn_$c"))): _*)
      .crossJoin(orders.groupBy().agg(
        countDistinct(col(cols.head)).as("d0"),
        cols.tail.map(c => countDistinct(col(c)).as(s"d_$c")): _*)))
    spark.stop()
  }
}
