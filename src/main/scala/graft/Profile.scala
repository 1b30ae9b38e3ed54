package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Scratch profiling harness (not part of the contract surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $n: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // --- q_text_spans_within_cut, staged ---
    val seeded = graft.core.Parallelism.fanOut(Tables.documents(spark, d))
      .select(col("doc_id"),
        concat_ws(" ", col("text"),
          array_join(slice(TextFunctions.tokens(col("text")), 1, 10), " ")).as("text"))
    val spans = Dedup.repeatedSpansWithinDoc(seeded, "doc_id", "text", k = 3)
    (1 to 3).foreach { i =>
      time(s"spansWithin only r$i") { noop(spans) }
    }
    val cut = Dedup.cutSpans(seeded, "doc_id", "text", spans)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        md5(col("text")).as("clean_md5"))
    (1 to 3).foreach { i =>
      time(s"cutSpans no-sort r$i") { noop(cut) }
    }
    (1 to 3).foreach { i =>
      time(s"cutSpans sorted r$i") { noop(cut.orderBy("doc_id")) }
    }
    (1 to 3).foreach { i =>
      time(s"full gate r$i") {
        noop(SparkEntry.queries("q_text_spans_within_cut")(spark, d))
      }
    }
    spark.stop()
  }
}
