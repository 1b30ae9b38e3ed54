package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scratch: run the two jaccard gates at a given SF and report (a) hot wall
  * times over several runs and (b) whether any executed plan broadcast the
  * token-index self-join (the suspected bimodality mechanism: the cached
  * index sits near the autoBroadcastJoinThreshold, so AQE can flip between
  * broadcast and shuffle joins between runs). */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var sawBroadcast = List.empty[String]
    spark.listenerManager.register(new QueryExecutionListener {
      def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
        val p = qe.executedPlan.toString
        for (line <- p.linesIterator if line.contains("BroadcastHashJoin"))
          sawBroadcast ::= line.trim.take(120)
      }
      def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    for (name <- Seq("q_dedup_jaccard", "q_dedup_jaccard_char")) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache()
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name times=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    sawBroadcast.distinct.foreach(l => println(s"[probe] BHJ: $l"))
    spark.stop()
  }
}
