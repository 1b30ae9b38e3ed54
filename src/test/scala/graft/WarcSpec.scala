package graft

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC/WET container grammar and the crawl-delivery round trips. */
class WarcSpec extends SparkSpec {

  test("record grammar: binary-safe payload, header order, case-insensitive lookup") {
    // payload deliberately contains the record terminator sequence — the
    // parse must be driven by Content-Length, never by scanning for CRLFs
    val payload = "abc\r\n\r\ndef".getBytes("UTF-8")
    val rec = Warc.buildRecord(Seq(
      "WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "https://example.org/x/1"), payload)
    val parsed = Warc.parseWarc(rec)
    assert(parsed.isDefined && parsed.get.size == 1)
    val r = parsed.get.head
    assert(r.version == "WARC/1.0")
    assert(r.warcType == "conversion")
    assert(r.targetUri == "https://example.org/x/1")
    assert(r.payload.toSeq == payload.toSeq)
    // header lookup is case-insensitive per the grammar; order preserved
    assert(r.header("warc-target-uri").contains("https://example.org/x/1"))
    assert(r.headers.map(_._1) ==
      Seq("WARC-Type", "WARC-Target-URI", "Content-Length"))
    // derived Content-Length, not trusted input
    assert(r.header("content-length").contains(payload.length.toString))
  }

  test("file layouts: plain concatenation, per-record gzip members, one big member") {
    val a = Warc.buildRecord(Seq("WARC-Type" -> "conversion"),
      "first".getBytes("UTF-8"))
    val b = Warc.buildRecord(Seq("WARC-Type" -> "conversion"),
      "second".getBytes("UTF-8"), version = "WARC/1.1")
    def texts(bytes: Array[Byte]): Seq[String] =
      Warc.parseWarc(bytes).get.map(r => new String(r.payload, "UTF-8"))
    assert(texts(a ++ b) == Seq("first", "second"))
    // Common Crawl layout: one gzip member per record, concatenated
    assert(texts(Warc.gzipMember(a) ++ Warc.gzipMember(b))
      == Seq("first", "second"))
    // a single member holding both records is equally legal gzip
    assert(texts(Warc.gzipMember(a ++ b)) == Seq("first", "second"))
    // versions survive
    assert(Warc.parseWarc(a ++ b).get.map(_.version)
      == Seq("WARC/1.0", "WARC/1.1"))
    // determinism: same record, same member bytes (timestamp-free header)
    assert(Warc.gzipMember(a).toSeq == Warc.gzipMember(a).toSeq)
  }

  test("malformed streams all refuse as None, never a partial parse") {
    val good = Warc.buildRecord(Seq("WARC-Type" -> "conversion"),
      "ok".getBytes("UTF-8"))
    def mutate(f: Array[Byte] => Array[Byte]): Option[Seq[Warc.WarcRecord]] =
      Warc.parseWarc(f(good.clone()))
    assert(Warc.parseWarc(null).isEmpty)
    assert(Warc.parseWarc(Array.emptyByteArray).isEmpty)
    // bad magic
    assert(mutate { b => b(0) = 'X'.toByte; b }.isEmpty)
    // truncated payload (drop the terminator + last byte)
    assert(Warc.parseWarc(good.dropRight(5)).isEmpty)
    // lying Content-Length
    assert(Warc.parseWarc(new String(good, "ISO-8859-1")
      .replace("Content-Length: 2", "Content-Length: 9")
      .getBytes("ISO-8859-1")).isEmpty)
    // non-numeric Content-Length
    assert(Warc.parseWarc(new String(good, "ISO-8859-1")
      .replace("Content-Length: 2", "Content-Length: xx")
      .getBytes("ISO-8859-1")).isEmpty)
    // header line without a colon
    assert(Warc.parseWarc(new String(good, "ISO-8859-1")
      .replace("WARC-Type: conversion", "WARC-Type conversion")
      .getBytes("ISO-8859-1")).isEmpty)
    // a half-good file refuses whole: good record + garbage tail
    assert(Warc.parseWarc(good ++ "WARC/1.0\r\nbroken".getBytes("UTF-8")).isEmpty)
    // corrupt gzip
    val gz = Warc.gzipMember(good)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x55).toByte
    assert(Warc.parseWarc(gz).isEmpty)
  }

  test("wetFileBytes: warcinfo header first, conversions in id order, octet-true lengths") {
    // unicode text: content_length must be OCTETS, not chars
    val docs = Seq((7L, "héllo wörld"), (3L, ""), (5L, "plain"))
    val bytes = Warc.wetFileBytes("web", docs, gzipped = true)
    val recs = Warc.parseWarc(bytes).get
    assert(recs.head.warcType == "warcinfo")
    val conv = recs.filter(_.warcType == "conversion")
    assert(conv.map(_.targetUri) == Seq(
      "https://example.org/web/3", "https://example.org/web/5",
      "https://example.org/web/7"))
    assert(new String(conv(2).payload, "UTF-8") == "héllo wörld")
    assert(conv(2).payload.length == "héllo wörld".getBytes("UTF-8").length)
    assert(conv(0).payload.isEmpty)
    // deterministic bytes end to end
    assert(bytes.toSeq == Warc.wetFileBytes("web", docs.reverse, gzipped = true).toSeq)
  }

  test("distributed round trip: wetExport -> wetRecords reproduces the corpus; malformed file flagged") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      ("a", 1L, "alpha doc"), ("a", 2L, "ünïcode ∂oc"),
      ("b", 10L, ""), ("b", 11L, "carries\r\n\r\nterminators"))
      .toDF("source", "doc_id", "text")
    val files = Warc.wetExport(docs, gzipped = true)
    assert(files.select("source", "n_records").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
      == Set(("a", 2L), ("b", 2L)))
    val back = Warc.wetRecords(files)
    val rows = back.filter(col("is_valid"))
      .select(element_at(split(col("target_uri"), "/"), -1).cast("long"),
        col("content_length"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(
      (1L, 9L, "alpha doc"),
      (2L, "ünïcode ∂oc".getBytes("UTF-8").length.toLong, "ünïcode ∂oc"),
      (10L, 0L, ""),
      (11L, 22L, "carries\r\n\r\nterminators")))
    // a corrupt file lands one is_valid = false row, not silence
    val bad = files.limit(1)
      .withColumn("payload", lit("not a warc".getBytes("UTF-8")))
    val flagged = Warc.wetRecords(bad).collect()
    assert(flagged.length == 1 && !flagged.head.getBoolean(5)
      && flagged.head.isNullAt(4))
    // segmented export: every (source, segment) file parses, the record
    // union is the same corpus, and segment membership is the stable
    // doc-id hash (re-export never reshuffles docs across segments)
    val seg = Warc.wetExport(docs, gzipped = true, segments = 3)
    assert(seg.select("source", "segment").distinct().count()
      == seg.count())
    val segRows = Warc.wetRecords(seg).filter(col("is_valid"))
      .select(element_at(split(col("target_uri"), "/"), -1).cast("long"),
        col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(segRows == rows.map(t => (t._1, t._3)))
    val seg2 = Warc.wetExport(docs, gzipped = true, segments = 3)
      .select("source", "segment", "n_records").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(seg2 == seg.select("source", "segment", "n_records").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("HTTP response layer: head/body split, status parse, binary-safe body, malformed refuse") {
    val body = "<p>x</p>".getBytes("UTF-8")
    val resp = Warc.buildHttpResponse(200, "OK", "text/html; charset=UTF-8", body)
    val parsed = Warc.parseHttpResponse(resp)
    assert(parsed.isDefined)
    val (st, hdrs, b) = parsed.get
    assert(st == 200 && b.toSeq == body.toSeq)
    assert(hdrs.exists { case (k, v) =>
      k == "Content-Type" && v.startsWith("text/html") })
    assert(hdrs.exists { case (k, v) =>
      k == "Content-Length" && v == body.length.toString })
    // the split is at the FIRST separator; a body carrying CRLFCRLF survives
    val tricky = Warc.buildHttpResponse(200, "OK", "text/html",
      "a\r\n\r\nb".getBytes("UTF-8"))
    assert(new String(Warc.parseHttpResponse(tricky).get._3, "UTF-8")
      == "a\r\n\r\nb")
    // malformed: no separator, bad status line, null
    assert(Warc.parseHttpResponse("junk no separator".getBytes("UTF-8")).isEmpty)
    assert(Warc.parseHttpResponse(
      "NOPE/1.1 200 OK\r\n\r\nbody".getBytes("UTF-8")).isEmpty)
    assert(Warc.parseHttpResponse("HTTP/1.1 2xx\r\n\r\n".getBytes("UTF-8")).isEmpty)
    assert(Warc.parseHttpResponse(null).isEmpty)
  }

  test("warcExport -> warcToWet: 200 html extracted, requests/non-200/non-html screened") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      ("a", 1L, "<html><head><title>t one</title></head><body><p>alpha beta</p></body></html>"),
      ("a", 2L, "<html><body><div>gamma</div><script>var x=1;</script></body></html>"),
      ("b", 9L, "<html><body><h1>delta</h1></body></html>"))
      .toDF("source", "doc_id", "html")
    val files = Warc.warcExport(docs, gzipped = true, segments = 2)
    // the capture layer: one response row per doc, all 200 text/html;
    // request + warcinfo records are plumbing and never surface
    val resp = Warc.warcResponses(files)
    assert(resp.count() == 3 && resp.filter(col("is_valid")).count() == 3)
    assert(resp.select("status").distinct().collect().map(_.getInt(0)).toSeq
      == Seq(200))
    // extraction matches the engine's own HTML cleaner applied directly
    val expected = docs.select(col("doc_id"),
        graft.operators.Curation.htmlToText(col("html")).as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = Warc.warcToWet(files)
      .select(element_at(split(col("target_uri"), "/"), -1).cast("long"),
        col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected)
    assert(got.exists(_._2 == "t one\nalpha beta"))
    assert(got.exists(_._2 == "gamma")) // script body gone
    // screened captures: a 404 page and a 200 text/plain record parse at
    // the response layer but never reach the text layer
    val f404 = Warc.buildRecord(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://example.org/x/7",
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.buildHttpResponse(404, "Not Found", "text/html",
        "<p>gone</p>".getBytes("UTF-8")))
    val fPlain = Warc.buildRecord(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://example.org/x/8",
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.buildHttpResponse(200, "OK", "text/plain",
        "raw".getBytes("UTF-8")))
    val screened = Seq(("x", 0L, f404 ++ fPlain, 2L))
      .toDF("source", "segment", "payload", "n_records")
    assert(Warc.warcResponses(screened).filter(col("is_valid")).count() == 2)
    assert(Warc.warcToWet(screened).count() == 0)
  }

  test("on-disk round trip through binaryFile: one segment file per source, gz and plain") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(("x", 1L, "one"), ("x", 2L, "two"), ("y", 9L, "nine"))
      .toDF("source", "doc_id", "text")
    for (gz <- Seq(true, false)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_wet").toString
      try {
        Warc.writeWetFiles(Warc.wetExport(docs, gzipped = gz), dir, gzipped = gz)
        val names = new java.io.File(dir).listFiles().map(_.getName)
          .filterNot(_.startsWith(".")).toSet // local-FS .crc sidecars
        val ext = if (gz) ".wet.gz" else ".wet"
        assert(names == Set(s"x-00000$ext", s"y-00000$ext"))
        val sources = Warc.readWetFiles(spark, dir)
          .select("source", "segment").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        assert(sources == Set(("x", 0L), ("y", 0L)))
        val back = Warc.wetRecords(Warc.readWetFiles(spark, dir))
        val rows = back.filter(col("is_valid"))
          .select(col("source"),
            element_at(split(col("target_uri"), "/"), -1).cast("long"),
            col("text"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
          .toSet
        assert(rows == Set(("x", 1L, "one"), ("x", 2L, "two"),
          ("y", 9L, "nine")))
      } finally org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }
}
