package graft.tools

/** Dev scratch: dump the seeded constants (MinHash permutations, LSH
  * hyperplanes) to JSON so oracle SQL can be developed in the python/DuckDB
  * harness before being templated into SparkEntry.
  */
object DumpConsts {
  def main(args: Array[String]): Unit = {
    val perms = graft.operators.Dedup.permutations(64)
    val planes = graft.operators.Similarity.hyperplanes(64, 64)
    val permsJson = perms.map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")
    val planesJson = planes.map(_.map(d => String.format(java.util.Locale.ROOT, "%.17g", Double.box(d))).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)),
      s"""{"perms":$permsJson,"planes":$planesJson}""")
  }
}
