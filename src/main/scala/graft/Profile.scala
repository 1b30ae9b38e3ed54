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
    println("PROF docs partitions: " + docs.rdd.getNumPartitions)
    val shingleSet =
      (t: org.apache.spark.sql.Column) => array_distinct(TextFunctions.shingles(t, 3))
    time("tokenIndex count") {
      println("  rows=" + Dedup.tokenIndex(docs, "doc_id", "text", shingleSet).count())
    }
    val sig = Dedup.minhashSig(docs, "doc_id", "text", 32, shingleSet)
    time("minhash sig noop") { sig.write.format("noop").mode("overwrite").save() }
    val bands = Dedup.minhashBands(sig, 32, 4)
    time("bands noop") { bands.write.format("noop").mode("overwrite").save() }
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
    time("cand count") { println("  cand=" + cand.count()) }
    time("full lsh noop") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 32, 4, 0.3, shingleSet)
        .write.format("noop").mode("overwrite").save()
    }
    time("text_stats noop") {
      docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("a"),
        TextFunctions.bpeTokenCount(col("text")).as("b"),
        TextFunctions.avgTokenLen(col("text")).as("c"),
        TextFunctions.punctRatio(col("text")).as("d"),
        TextFunctions.stopwordRatio(col("text")).as("e"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
