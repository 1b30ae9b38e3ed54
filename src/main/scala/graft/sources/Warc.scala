package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/WET container codec — the delivery format of web-crawl corpora
  * (Common Crawl ships `.warc.gz` captures and `.wet.gz` extracted-text
  * conversions; a 100 TB pretraining ingest starts from exactly these
  * files). Implemented from the public ISO 28500 / WARC 1.x record
  * grammar, the same no-library byte-kernel discipline as the image/audio
  * codecs in [[graft.operators.Multimodal]]:
  *
  *  - a record is `WARC/1.x CRLF`, header lines, a blank CRLF, exactly
  *    `Content-Length` payload BYTES (binary-safe — the payload may
  *    contain anything, including CRLFCRLF), then CRLF CRLF;
  *  - a file is a plain record concatenation, and the `.gz` form is the
  *    Common Crawl convention of one gzip MEMBER per record concatenated
  *    back to back (so a reader can seek to a member and inflate one
  *    record without touching the rest — the property that makes the
  *    format range-requestable at crawl scale). `java.util.zip`'s
  *    GZIPInputStream walks concatenated members natively, and
  *    GZIPOutputStream writes a timestamp-free header, so compressed
  *    output is deterministic byte for byte (the re-export contract
  *    [[Export.jsonlSharded]] established).
  *
  * Parsing is fail-soft like every ingest surface: a malformed stream
  * (bad magic, non-numeric or lying Content-Length, missing terminator)
  * returns None rather than throwing, and the Spark surfaces flag the row.
  *
  * Scale shape: building WET files is ONE shuffle on the grouping key
  * (the file is the delivery unit, exactly a WET segment); parsing is a
  * partition-local flatMap generator over file payloads — records never
  * shuffle, and reading a crawl drop from disk is an embarrassingly
  * parallel `binaryFile` scan with one task per segment file. */
object Warc {

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** One parsed record: version, headers IN FILE ORDER (lookup is
    * case-insensitive per the grammar), raw payload bytes. */
  final case class WarcRecord(version: String, headers: Seq[(String, String)],
                              payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
    def warcType: String = header("WARC-Type").getOrElse("")
    def targetUri: String = header("WARC-Target-URI").getOrElse("")
  }

  /** Serialize one record. Header order is the caller's — [[wetFileBytes]]
    * fixes a canonical order so file bytes are deterministic end to end.
    * Content-Length is always appended last, computed from the payload
    * (a hand-passed length could lie; the grammar's only load-bearing
    * header is derived, never trusted). */
  def buildRecord(headers: Seq[(String, String)], payload: Array[Byte],
                  version: String = "WARC/1.0"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 256)
    out.write((version + "\r\n").getBytes("US-ASCII"))
    (headers :+ ("Content-Length" -> payload.length.toString)).foreach {
      case (k, v) => out.write(s"$k: $v\r\n".getBytes("UTF-8"))
    }
    out.write(Crlf)
    out.write(payload)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** One gzip member (the per-record compression unit of `.warc.gz`).
    * Java's gzip header carries no timestamp, so same bytes in → same
    * bytes out, every run and every engine. */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Inflate a (possibly multi-member) gzip stream; None on corruption. */
  private[sources] def gunzipAll(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 64 * 1024)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4 + 64)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  private[sources] def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Parse a WARC file (plain or gzipped, any member layout) into its
    * records. None on ANY malformation — a crawl segment either parses
    * completely or is flagged; a half-read file silently dropping tail
    * records is the failure mode this refuses to have. */
  def parseWarc(bytes: Array[Byte]): Option[Seq[WarcRecord]] = {
    if (bytes == null || bytes.isEmpty) return None
    val plain = if (isGzip(bytes)) gunzipAll(bytes) match {
      case Some(p) => p
      case None => return None
    } else bytes
    val recs = Seq.newBuilder[WarcRecord]
    var pos = 0
    // skip leading CRLFs between records / at end
    def skipCrlf(): Unit =
      while (pos + 1 < plain.length &&
        plain(pos) == '\r' && plain(pos + 1) == '\n') pos += 2
    def readLine(): Option[String] = {
      var i = pos
      while (i + 1 < plain.length &&
        !(plain(i) == '\r' && plain(i + 1) == '\n')) i += 1
      if (i + 1 >= plain.length) None
      else {
        val s = new String(plain, pos, i - pos, "UTF-8")
        pos = i + 2
        Some(s)
      }
    }
    while ({ skipCrlf(); pos < plain.length }) {
      val version = readLine() match {
        case Some(v) if v.startsWith("WARC/") => v
        case _ => return None
      }
      val hdrs = Seq.newBuilder[(String, String)]
      var blank = false
      while (!blank) {
        readLine() match {
          case Some("") => blank = true
          case Some(line) =>
            val colon = line.indexOf(':')
            if (colon <= 0) return None
            hdrs += ((line.substring(0, colon).trim,
              line.substring(colon + 1).trim))
          case None => return None
        }
      }
      val headers = hdrs.result()
      val len = headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Content-Length") => v
      } match {
        case Some(v) => try v.toInt catch {
          case _: NumberFormatException => return None
        }
        case None => return None
      }
      if (len < 0 || pos + len > plain.length) return None
      val payload = java.util.Arrays.copyOfRange(plain, pos, pos + len)
      pos += len
      // the record terminator is mandatory
      if (pos + 4 > plain.length ||
        plain(pos) != '\r' || plain(pos + 1) != '\n' ||
        plain(pos + 2) != '\r' || plain(pos + 3) != '\n') return None
      pos += 4
      recs += WarcRecord(version, headers, payload)
    }
    val out = recs.result()
    if (out.isEmpty) None else Some(out)
  }

  /** Deterministic target URI for a corpus document — the WET convention
    * keeps the source page's URI on each conversion record; a synthesized
    * corpus gets a stable synthetic one. */
  def docUri(source: String, docId: Long): String =
    s"https://example.org/$source/$docId"

  /** Assemble one WET file: a leading `warcinfo` record describing the
    * file, then one `conversion` record per document (text/plain payload,
    * UTF-8), in ascending id order — the canonical-order rule that makes
    * file bytes deterministic. `gzipped` writes the Common Crawl
    * one-member-per-record layout. */
  def wetFileBytes(source: String, docs: Seq[(Long, String)],
                   gzipped: Boolean): Array[Byte] = {
    val info = buildRecord(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:warcinfo:$source>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft\r\nformat: WET\r\nsource: $source\r\n"
        .getBytes("UTF-8"))
    val recs = docs.sortBy(_._1).map { case (id, text) =>
      buildRecord(Seq(
        "WARC-Type" -> "conversion",
        "WARC-Record-ID" -> s"<urn:graft:doc:$id>",
        "WARC-Target-URI" -> docUri(source, id),
        "Content-Type" -> "text/plain"),
        Option(text).getOrElse("").getBytes("UTF-8"))
    }
    val all = info +: recs
    val out = new java.io.ByteArrayOutputStream()
    if (gzipped) all.foreach(r => out.write(gzipMember(r)))
    else all.foreach(out.write)
    out.toByteArray
  }

  /** Build per-source WET segment files from a documents frame — the
    * export half of the crawl-delivery round trip. ONE shuffle on the
    * (source, segment) key; each group serializes partition-locally.
    * `segments` shards a source across numbered files by the stable
    * doc-id hash bucket — real crawl drops are SEGMENTED (Common Crawl's
    * `...-NNNNN.warc.wet.gz`) precisely so one fat source neither exceeds
    * the bounded file size nor serializes through one task; the parallel
    * unit is the segment, and the segment count is the knob. Output:
    * (source, segment, payload, n_records) — n_records counts conversion
    * records (the warcinfo header record is file metadata, not data). */
  def wetExport(docs: DataFrame, gzipped: Boolean = true,
                segments: Int = 1): DataFrame = {
    require(segments > 0, "segments must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source").cast("string"), col("doc_id").cast("long"),
        col("text").cast("string"),
        graft.operators.Sampling.hashBucket(col("doc_id").cast("string"),
          segments, ":wet").cast("long").as("segment"))
      .as[(String, Long, String, Long)]
      .groupByKey(r => (r._1, r._4))
      .mapGroups { (key: (String, Long),
                    rows: Iterator[(String, Long, String, Long)]) =>
        val ds = rows.map(r => (r._2, r._3)).toSeq
        (key._1, key._2, wetFileBytes(key._1, ds, gzipped), ds.size.toLong)
      }
      .toDF("source", "segment", "payload", "n_records")
  }

  /** Explode WET files back to text records — the ingest half. A flatMap
    * GENERATOR (records out >> files in), partition-local, no shuffle:
    * the crawl-scale read path is `binaryFile` scan -> this. Conversion
    * records land one row each: (source, rec_index among conversions,
    * target_uri, content_length in octets, text decoded UTF-8);
    * non-conversion records (warcinfo, request/response of a full WARC)
    * are file plumbing and are skipped. A malformed file contributes one
    * `is_valid = false` row with null fields instead of vanishing — the
    * ingest ledger must see it. */
  def wetRecords(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("source").cast("string"), col("payload"))
      .as[(String, Array[Byte])]
      .flatMap { case (src, payload) =>
        parseWarc(payload) match {
          case Some(recs) =>
            recs.filter(_.warcType == "conversion").zipWithIndex.map {
              case (r, i) =>
                (src, i.toLong, r.targetUri, r.payload.length.toLong,
                  new String(r.payload, "UTF-8"), true)
            }
          case None => Seq((src, -1L, null: String, 0L, null: String, false))
        }
      }
      .toDF("source", "rec_index", "target_uri", "content_length", "text",
        "is_valid")
  }

  /** Serialize one HTTP/1.1 response (status line, headers, CRLF CRLF,
    * body) — the payload of a WARC `response` record. Content-Length and
    * Content-Type ride as real HTTP headers; the WARC record length is
    * derived independently by [[buildRecord]] (the two lengths are
    * different layers and the parser trusts neither across layers). */
  def buildHttpResponse(status: Int, reason: String, contentType: String,
                        body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    head.getBytes("ISO-8859-1") ++ body
  }

  /** Split a WARC response record's payload into (status, headers, body).
    * None when there is no status line or no head/body separator —
    * fail-soft like the container parse. */
  def parseHttpResponse(payload: Array[Byte])
      : Option[(Int, Seq[(String, String)], Array[Byte])] = {
    if (payload == null) return None
    var i = 0
    var end = -1
    while (i + 3 < payload.length && end < 0) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') end = i
      else i += 1
    }
    if (end < 0) return None
    val lines = new String(payload, 0, end, "ISO-8859-1").split("\r\n")
    val status = "^HTTP/1\\.[01] (\\d{3})(?: |$)".r
      .findFirstMatchIn(lines.head).map(_.group(1).toInt)
      .getOrElse(return None)
    val headers = lines.tail.toSeq.flatMap { line =>
      val colon = line.indexOf(':')
      if (colon <= 0) None
      else Some((line.substring(0, colon).trim, line.substring(colon + 1).trim))
    }
    Some((status, headers,
      java.util.Arrays.copyOfRange(payload, end + 4, payload.length)))
  }

  /** Assemble one full-capture WARC file: warcinfo, then per document a
    * `request` record (what the crawler sent) and a `response` record
    * (status line + HTTP headers + HTML body) — the Common Crawl
    * `.warc.gz` record pattern, each record its own gzip member when
    * `gzipped`. Ascending id order for deterministic bytes. */
  def warcFileBytes(source: String, docs: Seq[(Long, String)],
                    gzipped: Boolean): Array[Byte] = {
    val info = buildRecord(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:warcinfo:$source>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft\r\nformat: WARC\r\nsource: $source\r\n"
        .getBytes("UTF-8"))
    val recs = docs.sortBy(_._1).flatMap { case (id, html) =>
      val uri = docUri(source, id)
      val req = buildRecord(Seq(
        "WARC-Type" -> "request",
        "WARC-Record-ID" -> s"<urn:graft:req:$id>",
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=request"),
        s"GET /$source/$id HTTP/1.1\r\nHost: example.org\r\n\r\n"
          .getBytes("ISO-8859-1"))
      val resp = buildRecord(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:graft:resp:$id>",
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        buildHttpResponse(200, "OK", "text/html; charset=UTF-8",
          Option(html).getOrElse("").getBytes("UTF-8")))
      Seq(req, resp)
    }
    val all = info +: recs
    val out = new java.io.ByteArrayOutputStream()
    if (gzipped) all.foreach(r => out.write(gzipMember(r)))
    else all.foreach(out.write)
    out.toByteArray
  }

  /** [[wetExport]]'s full-capture sibling: per-(source, segment) WARC
    * files of request/response records from an (source, doc_id, html)
    * frame. Same ONE-shuffle shape. */
  def warcExport(docs: DataFrame, gzipped: Boolean = true,
                 segments: Int = 1): DataFrame = {
    require(segments > 0, "segments must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source").cast("string"), col("doc_id").cast("long"),
        col("html").cast("string"),
        graft.operators.Sampling.hashBucket(col("doc_id").cast("string"),
          segments, ":wet").cast("long").as("segment"))
      .as[(String, Long, String, Long)]
      .groupByKey(r => (r._1, r._4))
      .mapGroups { (key: (String, Long),
                    rows: Iterator[(String, Long, String, Long)]) =>
        val ds = rows.map(r => (r._2, r._3)).toSeq
        (key._1, key._2, warcFileBytes(key._1, ds, gzipped), ds.size.toLong)
      }
      .toDF("source", "segment", "payload", "n_records")
  }

  /** Explode full-capture WARC files to their HTTP responses — the
    * partition-local generator under [[warcToWet]]: one row per
    * `response` record with the HTTP layer split (status, content type,
    * body decoded UTF-8); request/warcinfo records are crawl plumbing and
    * are skipped; a malformed FILE or an unsplittable response payload
    * flags `is_valid = false` instead of vanishing. */
  def warcResponses(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("source").cast("string"), col("payload"))
      .as[(String, Array[Byte])]
      .flatMap { case (src, payload) =>
        parseWarc(payload) match {
          case Some(recs) =>
            recs.filter(_.warcType == "response").map { r =>
              parseHttpResponse(r.payload) match {
                case Some((status, hdrs, body)) =>
                  val ct = hdrs.collectFirst {
                    case (k, v) if k.equalsIgnoreCase("Content-Type") => v
                  }.getOrElse("")
                  (src, r.targetUri, status, ct,
                    new String(body, "UTF-8"), true)
                case None =>
                  (src, r.targetUri, 0, null: String, null: String, false)
              }
            }
          case None =>
            Seq((src, null: String, 0, null: String, null: String, false))
        }
      }
      .toDF("source", "target_uri", "status", "content_type", "body",
        "is_valid")
  }

  /** The crawl-to-corpus conversion step — what turns a `.warc.gz` drop
    * into the `.wet.gz` text layer: keep `200` HTML responses, extract
    * text from the body with the engine's [[graft.operators.Curation]]
    * HTML cleaner (a Column regex chain — codegen stays whole-stage; the
    * byte kernels only handle the container layers). Output:
    * (source, target_uri, text), ready for [[wetExport]]-shaped delivery
    * or straight into the curation chain. */
  def warcToWet(files: DataFrame): DataFrame =
    warcResponses(files)
      .filter(col("is_valid") && col("status") === 200 &&
        lower(col("content_type")).startsWith("text/html"))
      .select(col("source"), col("target_uri"),
        graft.operators.Curation.htmlToText(col("body")).as("text"))

  /** Write [[wetExport]] files to `dir` (one `<source>-NNNNN.wet[.gz]`
    * per segment — the Common Crawl numbered-segment naming) and read
    * them back through Spark's binaryFile source — the on-disk round trip
    * a real crawl drop takes. Writing is a foreachPartition direct write
    * (each task writes its own segment file through the Hadoop
    * filesystem — the shard-parallel layout, no driver funnel). */
  def writeWetFiles(files: DataFrame, dir: String, gzipped: Boolean = true): Unit = {
    val ext = if (gzipped) ".wet.gz" else ".wet"
    val conf = new org.apache.spark.util.SerializableConfiguration(
      files.sparkSession.sparkContext.hadoopConfiguration)
    files.select(col("source").cast("string"),
        col("segment").cast("long"), col("payload"))
      .rdd.foreachPartition { it =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(dir), conf.value)
        it.foreach { r =>
          val name = f"${r.getString(0)}-${r.getLong(1)}%05d$ext"
          val out = fs.create(
            new org.apache.hadoop.fs.Path(dir, name), true)
          out.write(r.getAs[Array[Byte]](2)); out.close()
        }
      }
  }

  /** Read a directory of WET segment files: one task per file via the
    * binaryFile source (no splitting — a gzip member stream isn't
    * arbitrarily splittable; the segment file IS the parallel unit, the
    * Common Crawl contract), source and segment recovered from the
    * `<source>-NNNNN` file name. */
  def readWetFiles(spark: SparkSession, dir: String): DataFrame =
    readWetFiles(spark, Seq(dir))

  /** [[readWetFiles]] over an explicit path list — the incremental-ingest
    * shape: only the NOT-YET-SEEN segment files of a drop are loaded. */
  def readWetFiles(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val name = regexp_replace(element_at(split(col("path"), "/"), -1),
      "\\.wet(\\.gz)?$", "")
    spark.read.format("binaryFile").load(paths: _*)
      .select(
        regexp_replace(name, "-\\d+$", "").as("source"),
        coalesce(regexp_extract(name, "-(\\d+)$", 1).cast("long"), lit(0L))
          .as("segment"),
        col("content").as("payload"))
  }
}
