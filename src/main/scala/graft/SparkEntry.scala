package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DocQueries, Q, RelationalQueries, WeatherQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory lives in graft.queries.{RelationalQueries, DocQueries};
  * each entry pairs the Spark implementation with (when SQL-expressible) a
  * DuckDB oracle whose arithmetic is written to hash-match bit-for-bit.
  */
object SparkEntry {
  val inventory: Seq[(String, Q)] =
    RelationalQueries.all ++ DocQueries.all ++ WeatherQueries.all

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
    inventory.collect { case (name, Q(_, Some(sql))) => name -> sql }.toMap
}
