package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Multimodal, Similarity}

/** ANN quality and multimodal plumbing. */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("IVF top-k reaches high recall vs brute force at nProbe=4/16") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val k = 10
    def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "nbr_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = resultSet(Similarity.bruteForceTopK(emb, queries, k))
    val ivf = resultSet(Similarity.ivfTopK(emb, queries, k, nLists = 16, nProbe = 4))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // probing every cell must recover exact search entirely
    val full = resultSet(Similarity.ivfTopK(emb, queries, k, nLists = 16, nProbe = 16))
    assert(full == exact, "nProbe = nLists should equal brute force")
  }

  test("sharedIvf memoizes per key and re-persists after a cache sweep") {
    import org.apache.spark.storage.StorageLevel
    val emb = Tables.embeddings(spark, sf)
    val a = Similarity.sharedIvf(emb, corpusKey = "spec-corpus", nLists = 8)
    val b = Similarity.sharedIvf(emb, corpusKey = "spec-corpus", nLists = 8)
    assert(a eq b, "same (session, key, nLists, seed) must return the memoized index")
    assert(a.assigned.storageLevel != StorageLevel.NONE)
    // the harness sweeps the whole cache between gates; the next lookup must
    // repair persistence instead of recomputing the assignment scan uncached
    spark.catalog.clearCache()
    assert(a.assigned.storageLevel == StorageLevel.NONE)
    val c = Similarity.sharedIvf(emb, corpusKey = "spec-corpus", nLists = 8)
    assert((c eq a) && c.assigned.storageLevel != StorageLevel.NONE,
      "post-sweep lookup must re-persist the memoized assignment frame")
    // distinct keys build distinct indexes (caller owns key↔data contract)
    val other = Similarity.sharedIvf(emb, corpusKey = "other-corpus", nLists = 8)
    assert(!(other eq a))
    spark.catalog.clearCache()
  }

  test("int8-quantized search keeps high recall vs exact top-10") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(Similarity.bruteForceTopK(emb, queries, k = 10))
    val quant = topSets(Similarity.bruteForceTopKQuantized(emb, queries, k = 10))
    // int8 rounding perturbs scores by <= ~0.5/scale per element; the
    // neighbor sets may differ at the tail but must overlap heavily
    val recalls = exact.map { case (q, ids) => (quant(q) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean top-10 recall $mean")
  }

  test("saved+loaded IVF index searches identically and prunes to probed cells") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 4)
    val built = Similarity.buildIvf(emb, nLists = 8, seed = 42L)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    try {
      Similarity.saveIvf(built, dir)
      val loaded = Similarity.loadIvf(spark, dir)
      // the loaded quantizer is the same literal centroids, so searches are
      // row-identical to the in-memory index
      val a = Similarity.searchIvf(built, queries, k = 5, nProbe = 2)
        .orderBy("query_id", "rank").collect()
      val b = Similarity.searchIvf(loaded, queries, k = 5, nProbe = 2)
        .orderBy("query_id", "rank").collect()
      assert(a.toSeq == b.toSeq)
      assert(a.nonEmpty)
      // the index parquet is laid out one directory per cell, so a probe
      // can prune to its cells' files at the scan
      val cellDirs = new java.io.File(s"$dir/assigned").listFiles()
        .filter(_.getName.startsWith("cell="))
      assert(cellDirs.length == 8, s"got ${cellDirs.map(_.getName).toSeq}")
    } finally {
      built.assigned.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("hyperplane sign buckets stay balanced on the sf0.01 embeddings") {
    import graft.functions.VectorFunctions
    val emb = Tables.embeddings(spark, sf)
    val counts = emb
      .select(VectorFunctions.hyperplaneBucket(col("embedding"), 6, 64).as("b"))
      .groupBy("b").count()
      .collect().map(_.getLong(1))
    val total = counts.sum
    assert(total == 500)
    // 64 buckets over 500 rows (uniform ≈ 7.8/bucket): the worst bucket must
    // stay a small fraction of the corpus — the property the bucket-local
    // pair join's cost model depends on (measured max is 22 = 4.4%)
    assert(counts.max <= total * 6 / 100,
      s"worst bucket holds ${counts.max} of $total rows")
    assert(counts.length >= 48, s"only ${counts.length} buckets occupied")
  }

  test("frame sampling explodes deterministic pseudo-frames per media row") {
    val media = Multimodal.fromText(
      Tables.documents(spark, sf).limit(5), "doc_id", "text", "source", kind = "video")
    val frames = Multimodal.frameSample(media, nFrames = 4)
    assert(frames.count() == 20)
    assert(frames.columns.contains("frame_payload") && !frames.columns.contains("payload"))
    val one = frames.filter(col("frame_no") === 1).select("frame_payload").collect()
    assert(one.forall(_.getAs[Array[Byte]](0).length <= 8))
  }

  test("decode staging column never clobbers a caller column of the same name") {
    val media = Multimodal.fromText(
        Tables.documents(spark, sf).limit(3), "doc_id", "text", "source")
      .withColumn("__graft_bytes_0", lit(42))
    val out = Multimodal.fakeDecodeFeatures(media)
    assert(out.columns.contains("__graft_bytes_0"))
    assert(out.select("__graft_bytes_0").collect().forall(_.getInt(0) == 42))
    // features identical to the collision-free path
    val plain = Multimodal.fakeDecodeFeatures(media.drop("__graft_bytes_0"))
    assert(out.select("media_id", "features").collect().toSeq ==
      plain.select("media_id", "features").collect().toSeq)
  }

  test("resize stub records target dims in metadata, payload untouched") {
    val media = Multimodal.fromText(
      Tables.documents(spark, sf).limit(3), "doc_id", "text", "source")
    val resized = Multimodal.fakeResize(media, 224, 224)
    val r = resized.select("meta.target_w", "meta.target_h", "meta.byte_len").head()
    assert(r.getInt(0) == 224 && r.getInt(1) == 224 && r.getLong(2) > 0)
  }
}
