package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata, the standard
  * pattern for petabyte media corpora (payload stays columnar/compressed in
  * parquet, metadata is filterable without touching bytes).
  *
  * The decode/feature kernels are STUBBED (deliberately): the container has
  * no image/audio codecs, so `fakeDecodeFeatures` derives a deterministic
  * fake feature vector from the payload bytes. The Spark-side contract —
  * schema, partition-preserving mapPartitions batch shape, metadata columns —
  * is real and tested; swapping the kernel for a real codec changes one
  * function.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType),
      StructField("sha256", StringType),
      StructField("source", StringType))), nullable = true)))

  /** Wrap any text/binary-bearing frame into the media shape (used to build
    * test corpora from the documents table: payload = utf-8 bytes). */
  def fromText(docs: DataFrame, idCol: String, textCol: String,
               sourceCol: String, kind: String = "image"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(textCol).cast("binary").as("payload"),
      struct(
        length(col(textCol).cast("binary")).cast("long").as("byte_len"),
        sha2(col(textCol).cast("binary"), 256).as("sha256"),
        col(sourceCol).as("source")).as("meta"))

  /** Deterministic fake "decode + feature extract": 8 doubles derived from
    * payload bytes. Stands in for a real image/audio kernel (??? in the
    * container); runs per-partition with no shuffle and no driver collect. */
  def fakeDecodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = media.schema.add("features", ArrayType(DoubleType))
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats: Array[Double] =
          if (payload == null) Array.fill(8)(0.0)
          else {
            val acc = new Array[Double](8)
            var i = 0
            while (i < payload.length) {
              acc(i % 8) += (payload(i) & 0xff) / 255.0
              i += 1
            }
            acc.map(v => if (payload.length == 0) 0.0 else v / math.max(1, payload.length / 8))
          }
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB resize kernel: a real implementation decodes `payload`, resizes to
    * (w, h) and re-encodes; the container has no codecs, so the stub keeps
    * the payload and records the target dims in metadata. The plumbing —
    * partition-local map, no shuffle, schema evolution via struct rewrite —
    * is the real contract. */
  def fakeResize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.byte_len"), col("meta.sha256"), col("meta.source"),
      lit(w).as("target_w"), lit(h).as("target_h")))

  /** STUB frame sampler for video payloads: a real kernel emits one row per
    * sampled frame; the stub derives `nFrames` deterministic pseudo-frames
    * (payload slices) per media row. Generator shape (explode) is the real
    * contract: output rows >> input rows with no shuffle. */
  def frameSample(media: DataFrame, nFrames: Int): DataFrame =
    media
      .select(col("media_id"), col("kind"), col("meta"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_no"),
        col("payload"))
      .withColumn("frame_payload",
        // deterministic slice stand-in for a decoded frame
        col("payload").substr(col("frame_no") * 8 + 1, lit(8)))
      .drop("payload")

  /** Metadata-only projection — the common 100 TB access pattern: filter and
    * count media without deserializing payloads (parquet column pruning keeps
    * the payload column unread). */
  def metaStats(media: DataFrame): DataFrame =
    media.groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(col("meta.byte_len")).as("total_bytes"),
        countDistinct(col("meta.sha256")).as("distinct_payloads"))
}
