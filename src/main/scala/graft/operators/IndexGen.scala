package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.functions.FsUtils

/** Quantizer-generation fencing for the ANN index's code tiers (round 18,
  * closing the round-17 verdict's one latent trap): PQ/ADC/residual codes
  * encode against a SPECIFIC cluster geometry, and
  * [[graft.streaming.EmbeddingIndexStream.reclusterIndex]] replaces that
  * geometry — after a recluster, stale code dirs would silently score
  * old-geometry codes against new centroids/anchors. The contract was
  * prose ("rebuild offline"); these markers make it MECHANICAL:
  *
  *  - the exact index dir carries a `.quantizer-gen-<g>` marker (0 when
  *    absent — the never-reclustered legacy state). [[graft.streaming
  *    .EmbeddingIndexStream.reclusterIndex]] writes g+1 INSIDE its tmp
  *    dir, so the atomic swap carries data + quantizer + generation in
  *    one rename (no torn window).
  *  - every code dir carries `.encoded-gen-<g>` — the generation its
  *    codes encode against (0 when absent).
  *  - readers that pair a code dir with an exact dir call
  *    [[requireMatch]] and REFUSE on mismatch instead of wrong-answering;
  *    the streamed writer refuses to append new-geometry codes into an
  *    old-geometry dir ([[requireAppendable]]).
  *
  * Crash direction is fail-safe: a lost/missing marker reads as
  * generation 0, which can only produce a REFUSAL against a reclustered
  * (g ≥ 1) index, never a silent wrong answer. Dot-prefixed files are
  * invisible to Spark's listing, so markers never surface as data.
  */
object IndexGen {

  // DOT-prefixed, '='-free marker names: Spark's path filter keeps
  // underscore-prefixed names that contain '=' (the partition-dir
  // heuristic), so `_QUANTIZER_GEN=1` would surface as a data file —
  // dot-prefixed names are unconditionally invisible (the `.tombstones`
  // / `.quantizer` precedent)
  private val QuantPrefix = ".quantizer-gen-"
  private val CodePrefix = ".encoded-gen-"

  private def readMarker(spark: SparkSession, dir: String, prefix: String): Long = {
    val fs = FsUtils.fs(spark, dir)
    val p = new Path(dir)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).map(_.getPath.getName)
      .collectFirst { case n if n.startsWith(prefix) =>
        n.stripPrefix(prefix).toLong }
      .getOrElse(0L)
  }

  private def writeMarker(spark: SparkSession, dir: String, prefix: String,
                          gen: Long): Unit = {
    val fs = FsUtils.fs(spark, dir)
    val p = new Path(dir)
    fs.mkdirs(p)
    // drop any stale marker first: two markers would make the read
    // order-dependent; a crash between delete and create reads as gen 0,
    // which fails CLOSED against any reclustered pairing
    fs.listStatus(p).map(_.getPath)
      .filter(_.getName.startsWith(prefix))
      .foreach(fs.delete(_, false))
    fs.create(new Path(p, s"$prefix$gen"), true).close()
  }

  /** The generation the exact index dir's quantizer serves (0 = never
    * reclustered). */
  def quantizerGen(spark: SparkSession, indexDir: String): Long =
    readMarker(spark, indexDir, QuantPrefix)

  /** Stamp the exact index dir's quantizer generation (reclusterIndex
    * writes this inside its tmp dir before the atomic swap). */
  def setQuantizerGen(spark: SparkSession, indexDir: String, gen: Long): Unit =
    writeMarker(spark, indexDir, QuantPrefix, gen)

  /** The generation a code dir's codes encode against (0 when unstamped —
    * codes built before any recluster). */
  def encodedGen(spark: SparkSession, codeDir: String): Long =
    readMarker(spark, codeDir, CodePrefix)

  /** Stamp a code dir with the generation it encodes against. Call AFTER
    * the code write (a parquet overwrite deletes the dir, marker
    * included; the post-write stamp closes that window fail-safe). */
  def setEncodedGen(spark: SparkSession, codeDir: String, gen: Long): Unit =
    writeMarker(spark, codeDir, CodePrefix, gen)

  /** The read fence: refuse to pair a code dir with an exact dir whose
    * quantizer belongs to a different generation. */
  def requireMatch(spark: SparkSession, codeDir: String, exactDir: String): Unit = {
    val cg = encodedGen(spark, codeDir)
    val qg = quantizerGen(spark, exactDir)
    require(cg == qg,
      s"code tier at $codeDir encodes against quantizer generation $cg but " +
      s"the exact index at $exactDir serves generation $qg — a recluster " +
      "invalidated these codes. Rebuild the code tier against the current " +
      "quantizer (buildIndexPq/buildIndexPqResidual with encodedGen = " +
      "IndexGen.quantizerGen(exactDir)) before querying it.")
  }

  /** The write fence: refuse to append codes encoded under generation
    * `gen` into a dir whose existing codes belong to another generation
    * (a mixed-generation code dir is unreadable by construction). A new /
    * empty dir is stamped to `gen` instead. */
  def requireAppendable(spark: SparkSession, codeDir: String, gen: Long): Unit = {
    val fs = FsUtils.fs(spark, codeDir)
    val p = new Path(codeDir)
    val hasData = fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isDirectory && (s.getPath.getName.startsWith("batch=") ||
        s.getPath.getName.startsWith("cluster=")))
    if (!hasData) setEncodedGen(spark, codeDir, gen)
    else {
      val cg = encodedGen(spark, codeDir)
      require(cg == gen,
        s"refusing to append generation-$gen codes into $codeDir, whose " +
        s"existing codes encode against generation $cg — rebuild the code " +
        "tier after a recluster instead of appending across geometries.")
    }
  }
}
