package graft

import org.apache.spark.sql.SparkSession

/** Scratch sweep: flag scale-hazard nodes in every inventory query's plan. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    SparkEntry.inventory.foreach { case (name, q) =>
      try {
        val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
        val hazards = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
          .collect { case (h, true) => h }
        if (hazards.nonEmpty) println(s"SWEEP $name: ${hazards.mkString(", ")}")
      } catch { case e: Throwable => println(s"SWEEP $name ERROR: ${e.getMessage.take(120)}") }
    }
    println("SWEEP done")
    spark.stop()
  }
}
