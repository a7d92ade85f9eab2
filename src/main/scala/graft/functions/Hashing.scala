package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash functions for the dedup / fingerprint operators.
  *
  * Two tiers:
  *  - `xxhash64` (Spark built-in, codegen, fastest) — the production
  *    default for every shingle/token hash in [[graft.operators.Dedup]].
  *  - [[h60]] — a PORTABLE 60-bit hash (first 15 hex chars of md5) that is
  *    bit-identical in Spark and DuckDB, so pipelines built on it get an
  *    exact DuckDB oracle in the driver's correctness gate. md5 is ~3×
  *    slower per call than xxhash64 but identical in distribution quality;
  *    the operator logic (signatures, banding, bucket election, verify) is
  *    hash-agnostic, so the gate run on h60 verifies the same plan shapes
  *    the xxhash64 production path executes (their equivalence per hash
  *    input is pinned in CatalystExpressionSpec).
  */
object Hashing {

  /** Portable 60-bit hash of any Spark-hashable column: the first 15 hex
    * chars of the md5 digest as a long (60 bits — always inside BIGINT on
    * both engines). DuckDB mirror: [[h60Sql]]. Computed by the codegen
    * [[org.apache.spark.sql.graft.Md5Prefix60]] expression straight from
    * digest bytes; [[h60Reference]] keeps the hex-string formulation for
    * the equivalence spec.
    */
  def h60(c: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, Md5Prefix60}
    ColumnBridge.column(Md5Prefix60(ColumnBridge.expression(c.cast("binary"))))
  }

  /** Reference hex-string formulation of [[h60]] (spec-pinned equivalent). */
  def h60Reference(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL mirror of [[h60]] for an arbitrary SQL expression. */
  def h60Sql(e: String): String =
    s"('0x' || SUBSTR(MD5($e), 1, 15))::BIGINT"
}
