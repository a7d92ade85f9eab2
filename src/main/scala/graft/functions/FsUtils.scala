package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem helpers for the parquet-pure swap/commit patterns. */
object FsUtils {

  def fs(spark: org.apache.spark.sql.SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** `FileSystem.rename` reports most failures via `false`, not an
    * exception (missing source, vanished destination parent, cross-store
    * moves) — ignoring it turns a failed swap into silent data loss. */
  def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
}
