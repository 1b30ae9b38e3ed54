package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ChatQueries, DocQueries, PreferenceQueries, Q, RelationalQueries, WeatherQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory lives in graft.queries.{RelationalQueries, DocQueries};
  * each entry pairs the Spark implementation with (when SQL-expressible) a
  * DuckDB oracle whose arithmetic is written to hash-match bit-for-bit.
  */
object SparkEntry {
  /** Suite order is a measurement decision: the weather gates are the
    * cross-round comparison anchors, and r10–r12 all diagnosed their tail
    * timings inflating 2.6–4.5x with suite position behind ~150 gates of
    * doc-pipeline cache/GC residue. Running them FIRST overcorrects the
    * other way — solo fresh-JVM medians read 0.45–0.7 s for gates whose
    * hot-JVM cost is ~0.26 s, because HotSpot takes tens of seconds of
    * execution to fully compile the Spark stack. So: the ~60 light
    * relational gates run first (a JIT warm phase that is itself useful
    * signal), the weather anchors read on a hot, residue-free JVM, and the
    * heavy doc pipelines — the only family that builds real cache/GC
    * residue — run last, where they contaminate nobody but themselves. */
  val inventory: Seq[(String, Q)] =
    RelationalQueries.all ++ WeatherQueries.all ++ DocQueries.all ++
      ChatQueries.all ++ PreferenceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises scan → join → hash-agg → window-rank in one plan (A9+W4). */
  def entry(spark: SparkSession): DataFrame =
    inventory.toMap.apply("q_a9_ranked_summary")
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map { case (name, q) => name -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    inventory.collect { case (name, Q(_, Some(sql), _)) => name -> sql }.toMap
}
