package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode bridge between the public `Column` API and Catalyst
  * `Expression`s. Spark 4 moved Column onto the ColumnNode abstraction and
  * made the converters `private[sql]`, so first-party extension libraries
  * (this one, like Delta/Sedona before it) host a tiny adapter inside the
  * `org.apache.spark.sql` namespace instead of reimplementing the
  * conversion.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** [[expression]] with the ColumnNode CONVERTED to its Catalyst form —
    * API-built columns (`lit(...)`, `xxhash64(...)`) come back from
    * [[expression]] as a lazy `ColumnNodeExpression` wrapper, which defeats
    * structural pattern matches (the round-21 kernel-dispatch helpers
    * match on `Literal`/`XxHash64`/`Md5Prefix60` trees). Conversion-only —
    * no resolution against a plan, so unresolved attribute references pass
    * through untouched. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}

/** Access to the RDD cached by `Dataset.localCheckpoint` — the analyzed
  * plan of a checkpointed Dataset is a `LogicalRDD` over the persisted
  * blocks. Iterative operators need this to UNPERSIST a superseded round's
  * blocks (`Dataset` exposes persist/unpersist only for `cache()`-style
  * plans): without it, a k-round iteration accumulates k full working-set
  * copies in the block manager and a 64M-edge connected-components run
  * OOMs around round 13 (PLANS.md "CC constant", round-7 addendum).
  */
object DatasetInternals {
  def checkpointedRdd(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }
}

/** Runtime SQL registration of the graft expressions for sessions that were
  * not built with `spark.sql.extensions=graft.GraftExtensions` (the config
  * path only applies at session construction — `getOrCreate` on a live
  * session ignores it).
  */
object GraftSqlFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def litInt(e: Expression): Int = e.eval().asInstanceOf[Number].intValue
    def litDouble(e: Expression): Double = e.eval().asInstanceOf[Number].doubleValue
    reg.createOrReplaceTempFunction("graft_dot",
      (args: Seq[Expression]) => DotProduct(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64",
      (args: Seq[Expression]) => SimHash64(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      (args: Seq[Expression]) => MinHashSig(args(0), args(1), args(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_winnowing_mins",
      (args: Seq[Expression]) => WinnowingMins(args(0), litInt(args(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine_pairs",
      (args: Seq[Expression]) => CosinePairs(args(0), litDouble(args(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_jaccard_pairs",
      (args: Seq[Expression]) => JaccardPairs(args(0), litDouble(args(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine_pairs_bounded",
      (args: Seq[Expression]) => CosinePairsBounded(args(0), args(1), litDouble(args(2))), "built-in")
    reg.createOrReplaceTempFunction("graft_jaccard_pairs_bounded",
      (args: Seq[Expression]) => JaccardPairsBounded(args(0), args(1), litDouble(args(2))), "built-in")
    reg.createOrReplaceTempFunction("graft_hamming_pairs_bounded",
      (args: Seq[Expression]) => HammingPairsBounded(args(0), args(1), litInt(args(2))), "built-in")
    reg.createOrReplaceTempFunction("graft_md5_prefix60",
      (args: Seq[Expression]) => Md5Prefix60(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_word_shingles",
      (args: Seq[Expression]) => WordShingles(args(0), litInt(args(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_might_contain",
      (args: Seq[Expression]) => BloomMightContain(args(0), args(1), litInt(args(2))), "built-in")
  }
}
