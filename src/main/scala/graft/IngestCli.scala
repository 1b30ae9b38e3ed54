package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Dedup
import graft.streaming.StreamingOps

/** One-command STREAMING ingest — the live twin of [[CorpusCli]] and the
  * runnable form of [[StreamingOps.ingestDedupPipeline]]: documents landing
  * as JSONL files in `--in` are deduplicated against the ingested corpus
  * (exact content hash, then stored-LSH near-dup edges folded into the
  * persistent component labeling) and appended to the state zone.
  *
  * ```
  * sbt "runMain graft.IngestCli --corpus /root/testdata/sf0.001 \
  *      --in /tmp/arrivals --state /tmp/ingest_state"
  * ```
  *
  * First run BUILDS the corpus index artifacts under `--state` (content
  * hashes, LSH band index, token sets — the batch builders' persisted
  * shapes) and seeds `labels` with the corpus ids as their own components
  * (the corpus is assumed already deduplicated — run [[CorpusCli]] first).
  * Every run then processes the files currently in `--in` with
  * `Trigger.AvailableNow` and EXITS — rerun when new files land; the
  * checkpoint guarantees a file is ingested exactly once, so the command
  * is safe to cron. Survivors append to `state/docs`; the labeling
  * temp-swaps per batch ([[StreamingOps.ingestDedupPipeline]]'s contract).
  * Prints one JSON summary line (docs/labels counts after the run).
  */
object IngestCli {

  val ArrivalSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  final case class Summary(nDocs: Long, nLabels: Long, nCorpus: Long)

  /** Build-or-load the corpus index artifacts under `stateDir`. */
  private def ensureIndexes(spark: SparkSession, corpusDir: String,
                            stateDir: String, k: Int, rowsPerBand: Int): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(stateDir), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/index/hashes")))
      return
    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    corpus.select(md5(col("text")).as("content_hash")).distinct()
      .write.mode("overwrite").parquet(s"$stateDir/index/hashes")
    Dedup.minhashBands(
        Dedup.minhashSig(corpus, "doc_id", "text", k), k, rowsPerBand)
      .withColumnRenamed("doc_id", "id_corpus")
      .write.mode("overwrite").parquet(s"$stateDir/index/bands")
    corpus.select(col("doc_id").as("id_corpus"),
        graft.functions.TextFunctions.tokenSet(col("text")).as("toks_corpus"))
      .write.mode("overwrite").parquet(s"$stateDir/index/sets")
    corpus.select(col("doc_id").as("id"), col("doc_id").as("comp"),
        lit(true).as("is_keeper"))
      .write.mode("overwrite").parquet(s"$stateDir/labels")
  }

  def run(spark: SparkSession, corpusDir: String, inDir: String,
          stateDir: String, k: Int = 16, rowsPerBand: Int = 4,
          threshold: Double = 0.5): Summary = {
    ensureIndexes(spark, corpusDir, stateDir, k, rowsPerBand)
    val hashes = spark.read.parquet(s"$stateDir/index/hashes")
    val bands = spark.read.parquet(s"$stateDir/index/bands")
    val sets = spark.read.parquet(s"$stateDir/index/sets")
    val arrivals = spark.readStream.schema(ArrivalSchema).json(inDir)
    val q = StreamingOps.ingestDedupPipeline(arrivals, hashes, bands, sets,
        stateDir, "doc_id", "text", k, rowsPerBand, threshold)
      .option("checkpointLocation", s"$stateDir/checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(stateDir), spark.sparkContext.hadoopConfiguration)
    def countOf(dir: String): Long =
      if (fs.exists(new org.apache.hadoop.fs.Path(dir)))
        spark.read.parquet(dir).count()
      else 0L
    Summary(
      nDocs = countOf(s"$stateDir/docs"),
      nLabels = countOf(s"$stateDir/labels"),
      nCorpus = hashes.count())
  }

  def main(args: Array[String]): Unit = {
    def arg(name: String, default: String): String =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }.getOrElse(default)
    val spark = core.GraftSession.local("ingest-cli")
    try {
      val s = run(spark,
        corpusDir = arg("--corpus", "/root/testdata/sf0.001"),
        inDir = arg("--in", "/tmp/graft_arrivals"),
        stateDir = arg("--state", "/tmp/graft_ingest"),
        k = arg("--k", "16").toInt,
        rowsPerBand = arg("--rows-per-band", "4").toInt,
        threshold = arg("--threshold", "0.5").toDouble)
      println(s"""{"n_docs":${s.nDocs},"n_labels":${s.nLabels},""" +
        s""""n_corpus_hashes":${s.nCorpus}}""")
    } finally spark.stop()
  }
}
