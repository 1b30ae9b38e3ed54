package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** POSIX ustar (tar) container + the WebDataset sample convention — the
  * delivery format of large MULTIMODAL training corpora (image/audio/video
  * datasets ship as plain tar shards whose members group into samples by
  * basename: `<key>.txt`, `<key>.json`, `<key>.jpg`, ... — the public
  * WebDataset convention; loaders stream shards sequentially, which is
  * why the container is plain seekable tar, not a random-access archive).
  * Completes the engine's delivery-format triangle: JSONL(.gz/.zst) for
  * text ([[Export.jsonlSharded]]), WARC/WET for crawl ([[Warc]]), tar/WDS
  * for multimodal. Same no-library byte-kernel discipline, from the
  * public ustar layout (POSIX.1-1988):
  *
  *  - a member is one 512-byte header block (name, octal mode/uid/gid/
  *    size/mtime, checksum over the header with the checksum field read
  *    as spaces, typeflag, `ustar\0` magic + `00` version) followed by
  *    the data rounded up to 512-byte blocks;
  *  - an archive is member concatenation terminated by two zero blocks.
  *
  * Writers here are canonical and deterministic: mode 0644, uid/gid 0,
  * mtime 0, empty uname/gname, members sorted by name — same samples in,
  * same shard bytes out, every run and every engine (the re-export
  * contract the JSONL and WARC sinks established). The PARSER accepts any
  * conforming ustar stream and is fail-soft whole-file: bad magic, a
  * checksum mismatch, a lying size, or a missing terminator returns None
  * rather than throwing, and the Spark surfaces flag the row.
  *
  * Scale shape: building shards is ONE shuffle on the shard key (the
  * shard file is the delivery unit); reading is a `binaryFile` scan with
  * one task per shard and a partition-local flatMap — samples never
  * shuffle. */
object Tar {

  private val BlockSize = 512

  /** One archive member: full name and raw bytes. */
  final case class TarEntry(name: String, bytes: Array[Byte])

  /** Write an octal field: `width-1` digits + NUL (the POSIX form). */
  private def octal(value: Long, width: Int, dst: Array[Byte],
                    off: Int): Unit = {
    val s = java.lang.Long.toOctalString(value)
    val pad = width - 1 - s.length
    require(pad >= 0, s"octal field overflow: $value in width $width")
    var i = 0
    while (i < pad) { dst(off + i) = '0'; i += 1 }
    s.getBytes("US-ASCII").copyToArray(dst, off + pad)
    dst(off + width - 1) = 0
  }

  /** One member: 512-byte ustar header + data padded to the block size. */
  def tarEntryBytes(name: String, data: Array[Byte]): Array[Byte] = {
    val nameBytes = name.getBytes("UTF-8")
    require(nameBytes.length > 0 && nameBytes.length <= 100,
      s"ustar name must be 1..100 bytes: '$name'")
    val h = new Array[Byte](BlockSize)
    nameBytes.copyToArray(h, 0)                    // name [0,100)
    octal(0x1a4, 8, h, 100)                        // mode 0644
    octal(0, 8, h, 108)                            // uid
    octal(0, 8, h, 116)                            // gid
    octal(data.length.toLong, 12, h, 124)          // size
    octal(0, 12, h, 136)                           // mtime (deterministic)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces for sum
    h(156) = '0'                                   // typeflag: regular file
    "ustar".getBytes("US-ASCII").copyToArray(h, 257) // magic + NUL at 262
    h(263) = '0'; h(264) = '0'                     // version "00"
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    // chksum: 6 octal digits, NUL, space (the historical layout)
    val cs = java.lang.Long.toOctalString(sum)
    val pad = 6 - cs.length
    i = 0
    while (i < pad) { h(148 + i) = '0'; i += 1 }
    cs.getBytes("US-ASCII").copyToArray(h, 148 + pad)
    h(154) = 0; h(155) = ' '
    val padded = (data.length + BlockSize - 1) / BlockSize * BlockSize
    val out = new Array[Byte](BlockSize + padded)
    h.copyToArray(out, 0)
    data.copyToArray(out, BlockSize)
    out
  }

  /** A full archive: members in the given order + two zero blocks. */
  def tarFileBytes(entries: Seq[TarEntry]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      entries.iterator.map(_.bytes.length + 2 * BlockSize).sum +
        2 * BlockSize)
    entries.foreach(e => out.write(tarEntryBytes(e.name, e.bytes)))
    out.write(new Array[Byte](2 * BlockSize))
    out.toByteArray
  }

  /** Parse a ustar archive, plain or gzipped (`.tar.gz` shards — real
    * WebDataset corpora frequently ship compressed; the gzip layer is
    * transparent here exactly as in [[Warc.parseWarc]]); None for
    * anything malformed (fail-soft whole-file, the [[Warc.parseWarc]]
    * contract): corrupt gzip, short blocks, bad magic, checksum
    * mismatch, non-octal or lying size, a missing two-block terminator,
    * or trailing non-zero bytes. */
  def parseTar(raw: Array[Byte]): Option[Seq[TarEntry]] = {
    if (raw == null) return None
    val bytes = if (Warc.isGzip(raw)) Warc.gunzipAll(raw) match {
      case Some(p) => p
      case None => return None
    } else raw
    if (bytes.length % BlockSize != 0 ||
      bytes.length < 2 * BlockSize) return None
    def isZeroBlock(off: Int): Boolean = {
      var i = off
      while (i < off + BlockSize) { if (bytes(i) != 0) return false; i += 1 }
      true
    }
    def parseOctal(off: Int, width: Int): Option[Long] = {
      // digits, terminated by NUL or space; leading spaces allowed
      var i = off
      val end = off + width
      while (i < end && bytes(i) == ' ') i += 1
      var v = 0L
      var any = false
      while (i < end && bytes(i) >= '0' && bytes(i) <= '7') {
        v = v * 8 + (bytes(i) - '0'); any = true; i += 1
      }
      while (i < end && (bytes(i) == 0 || bytes(i) == ' ')) i += 1
      if (any && i == end) Some(v) else None
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[TarEntry]
    var off = 0
    while (off + BlockSize <= bytes.length) {
      if (isZeroBlock(off)) {
        // terminator: a second zero block, then nothing but zeros
        if (off + 2 * BlockSize > bytes.length) return None
        if (!isZeroBlock(off + BlockSize)) return None
        var i = off + 2 * BlockSize
        while (i < bytes.length) { if (bytes(i) != 0) return None; i += 1 }
        return Some(out.toSeq)
      }
      // magic "ustar" NUL at [257,263)
      if (bytes(257 + off) != 'u' || bytes(258 + off) != 's' ||
        bytes(259 + off) != 't' || bytes(260 + off) != 'a' ||
        bytes(261 + off) != 'r' || bytes(262 + off) != 0) return None
      val stored = parseOctal(off + 148, 8).getOrElse(return None)
      var sum = 0L
      var i = 0
      while (i < BlockSize) {
        sum += (if (i >= 148 && i < 156) ' '.toInt
                else bytes(off + i) & 0xff)
        i += 1
      }
      if (sum != stored) return None
      val size = parseOctal(off + 124, 12).getOrElse(return None)
      if (size < 0 || size > Int.MaxValue) return None
      var nameEnd = off
      while (nameEnd < off + 100 && bytes(nameEnd) != 0) nameEnd += 1
      if (nameEnd == off) return None
      val name = new String(bytes, off, nameEnd - off, "UTF-8")
      val dataOff = off + BlockSize
      // bounds arithmetic in Long: a near-Int.MaxValue octal size would
      // wrap an Int padding/bounds check negative and crash the copy
      // instead of fail-softing (the documented contract is None)
      val paddedL = (size + BlockSize - 1) / BlockSize * BlockSize
      if (dataOff.toLong + paddedL + 2L * BlockSize > bytes.length)
        return None
      val padded = paddedL.toInt
      val tf = bytes(off + 156)
      if (tf != '0' && tf != 0) return None // only regular files here
      out += TarEntry(name,
        java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size.toInt))
      off = dataOff + padded
    }
    None // ran off the end without a terminator
  }

  // ------------------- WebDataset sample convention -------------------

  /** WebDataset member key: fixed-width so lexicographic member order is
    * numeric sample order (the loader streams members sequentially and
    * groups ADJACENT members into samples). Non-negative only — a '-'
    * prefix sorts before '0' and would silently break the lexicographic ≡
    * numeric invariant the canonical-bytes contract rests on. */
  private[graft] def wdsKey(id: Long): String = {
    require(id >= 0, s"WebDataset sample ids must be non-negative: $id")
    f"$id%020d"
  }

  /** One shard's bytes: per sample (sorted by id — canonical member
    * order), `<key>.txt` (UTF-8 text) then `<key>.bin` (the binary
    * payload, skipped when null). */
  def wdsFileBytes(samples: Seq[(Long, String, Array[Byte])]): Array[Byte] =
    tarFileBytes(samples.sortBy(_._1).flatMap { case (id, text, bin) =>
      val k = wdsKey(id)
      TarEntry(s"$k.txt",
        Option(text).getOrElse("").getBytes("UTF-8")) ::
        (if (bin == null) Nil else TarEntry(s"$k.bin", bin) :: Nil)
    })

  /** Build WebDataset tar shards from (doc_id, text, payload) rows — ONE
    * shuffle on the hash-derived shard key (the shard file is the
    * delivery unit, the [[Warc.wetExport]] shape). Deterministic: shard
    * membership is a pure hash of the id, member order is sorted by id.
    * With `gzip = true` each shard's bytes are one gzip stream (the
    * `.tar.gz` delivery form; [[Warc.gzipMember]]'s timestamp-free
    * framing keeps the canonical-bytes contract — same samples in, same
    * compressed bytes out). */
  def wdsExport(docs: DataFrame, shards: Int = 8,
                gzip: Boolean = false): DataFrame = {
    require(shards > 0, "shards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text").cast("string"),
        col("payload"),
        graft.operators.Sampling.hashBucket(col("doc_id").cast("string"),
          shards, ":wds").cast("long").as("shard"))
      .as[(Long, String, Array[Byte], Long)]
      .groupByKey(_._4)
      .mapGroups { (shard: Long,
                    rows: Iterator[(Long, String, Array[Byte], Long)]) =>
        val ss = rows.map(r => (r._1, r._2, r._3)).toSeq
        val tar = wdsFileBytes(ss)
        (shard, if (gzip) Warc.gzipMember(tar) else tar, ss.size.toLong)
      }
      .toDF("shard", "payload", "n_samples")
  }

  /** Write [[wdsExport]] shards to `dir` (one `shard-NNNNN.tar` each — the
    * WebDataset numbered-shard naming) through a foreachPartition direct
    * write (each task writes its own shard file, no driver funnel — the
    * [[Warc.writeWetFiles]] layout). */
  def writeWdsFiles(files: DataFrame, dir: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      files.sparkSession.sparkContext.hadoopConfiguration)
    files.select(col("shard").cast("long"), col("payload"))
      .rdd.foreachPartition { it =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(dir), conf.value)
        it.foreach { r =>
          val bytes = r.getAs[Array[Byte]](1)
          // extension follows the payload (gzipped exports land as
          // .tar.gz), so a directory listing reads true
          val ext = if (Warc.isGzip(bytes)) "tar.gz" else "tar"
          val name = f"shard-${r.getLong(0)}%05d.$ext"
          val out = fs.create(
            new org.apache.hadoop.fs.Path(dir, name), true)
          out.write(bytes); out.close()
        }
      }
  }

  /** Read a directory (or explicit list) of `.tar` shards: one task per
    * shard via the binaryFile source — tar members are sequential, the
    * shard file IS the parallel unit (the WebDataset loader contract). */
  def readWdsFiles(spark: org.apache.spark.sql.SparkSession,
                   dir: String): DataFrame = readWdsFiles(spark, Seq(dir))

  /** [[readWdsFiles]] over an explicit path list — the incremental-ingest
    * shape: only the NOT-YET-SEEN shards of a drop are loaded. */
  def readWdsFiles(spark: org.apache.spark.sql.SparkSession,
                   paths: Seq[String]): DataFrame = {
    val name = regexp_replace(element_at(split(col("path"), "/"), -1),
      "\\.tar(\\.gz)?$", "")
    spark.read.format("binaryFile").load(paths: _*)
      .select(
        coalesce(regexp_extract(name, "-(\\d+)$", 1).cast("long"), lit(0L))
          .as("shard"),
        col("content").as("payload"))
  }

  /** Sample id from a member key: the numeric key when it parses (our
    * canonical [[wdsKey]] form), else a deterministic 64-bit FNV-1a of
    * the key string — foreign WebDataset shards use keys like
    * `sample_000`, and a loader surface must not throw on them (the
    * [[Warc.wetRecords]] URI-tail convention). */
  private def keyId(key: String): Long =
    try key.toLong catch {
      case _: NumberFormatException =>
        var h = 0xcbf29ce484222325L
        key.foreach { c => h ^= c.toLong; h *= 0x100000001b3L }
        h
    }

  /** Explode shards back to samples — the loader half: partition-local
    * flatMap generator, no shuffle; adjacent members sharing a key
    * assemble into one sample row (key, text from `.txt`, bytes of the
    * single binary member, member count). A malformed shard contributes
    * one `is_valid = false` row instead of vanishing — the ingest ledger
    * must see it. */
  def wdsSamples(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("shard").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (shard, payload) =>
        parseTar(payload) match {
          case None =>
            Seq((shard, -1L, null: String, null: Array[Byte], 0, false))
          case Some(entries) =>
            // group ADJACENT members by key prefix (the WDS contract)
            val grouped = scala.collection.mutable.ArrayBuffer
              .empty[(String, scala.collection.mutable.ArrayBuffer[TarEntry])]
            entries.foreach { e =>
              val key = e.name.takeWhile(_ != '.')
              if (grouped.nonEmpty && grouped.last._1 == key)
                grouped.last._2 += e
              else grouped +=
                ((key, scala.collection.mutable.ArrayBuffer(e)))
            }
            grouped.map { case (key, ms) =>
              val txt = ms.find(_.name.endsWith(".txt"))
                .map(e => new String(e.bytes, "UTF-8")).orNull
              val bin = ms.find(!_.name.endsWith(".txt")).map(_.bytes).orNull
              (shard, keyId(key), txt, bin, ms.size, true)
            }.toSeq
        }
      }
      .toDF("shard", "key", "text", "bin", "n_members", "is_valid")
  }
}
