package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated substrings — run only matching
    // queries (local iteration; the driver always passes 2 args = run all)
    val only: String => Boolean = args.drop(2).headOption match {
      case Some(pats) => name => pats.split(',').exists(name.contains)
      case None => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        // cache hygiene between gates. DataFrame-level persists are swept
        // SILENTLY by clearCache() — by design: memoized indexes (e.g.
        // Similarity.sharedIvf) leave their frame cached for reuse and
        // repair themselves after the sweep, so a DF-level entry here is
        // legitimate. RDD-level persists have no such owner and would pin
        // memory for the rest of the run, so they are STRICT by default: a
        // gate that leaks one is recorded as FAILED (its dump is deleted,
        // so the driver's compare reports it) and the discipline can't
        // erode silently; SPARK_GRAFT_LENIENT_CACHE=1 restores
        // warn-and-clean for local archaeology.
        spark.catalog.clearCache()
        val leftover = spark.sparkContext.getPersistentRDDs
        if (leftover.nonEmpty) {
          val what = leftover.values.map(_.name).mkString(", ")
          leftover.values.foreach(_.unpersist(blocking = false))
          if (sys.env.get("SPARK_GRAFT_LENIENT_CACHE").contains("1"))
            System.err.println(s"[verify] $name leaked ${leftover.size} " +
              s"RDD-level persist(s): $what")
          else {
            System.err.println(s"[verify] $name failed: leaked " +
              s"${leftover.size} RDD-level persist(s): $what")
            org.apache.commons.io.FileUtils.deleteQuietly(
              new java.io.File(s"$outDir/$name"))
          }
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
