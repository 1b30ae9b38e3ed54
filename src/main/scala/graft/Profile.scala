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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $n: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    val shingleSet =
      (t: org.apache.spark.sql.Column) => array_distinct(TextFunctions.shingles(t, 3))
    val sig = Dedup.simhash(docs, "doc_id", "text", shingleSet)
    time("simhash sig run1") { sig.write.format("noop").mode("overwrite").save() }
    time("simhash sig run2") { sig.write.format("noop").mode("overwrite").save() }
    val jp = Dedup.jaccardPairs(docs, "doc_id", "text", 0.3, tokens = shingleSet)
    time("jaccard run1") { jp.write.format("noop").mode("overwrite").save() }
    time("jaccard run2") { jp.write.format("noop").mode("overwrite").save() }
    val sp = Dedup.simhashPairs(docs, "doc_id", "text", 16, shingleSet)
    time("simhash pairs run1") { sp.write.format("noop").mode("overwrite").save() }
    time("simhash pairs run2") { sp.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
