package graft

import org.apache.spark.sql.functions._

import graft.sources.Tar
import graft.sources.Tar.TarEntry

/** ustar container grammar and the WebDataset sample round trips. */
class TarSpec extends SparkSpec {

  private def b(s: String) = s.getBytes("UTF-8")

  test("ustar grammar: header layout, checksum, padding, terminator") {
    val e = Tar.tarEntryBytes("0001.txt", b("hello"))
    assert(e.length == 1024) // one header block + one padded data block
    // name NUL-terminated, magic + version at the POSIX offsets
    assert(new String(e, 0, 8, "US-ASCII") == "0001.txt" && e(8) == 0)
    assert(new String(e, 257, 5, "US-ASCII") == "ustar" && e(262) == 0)
    assert(e(263) == '0' && e(264) == '0')
    assert(e(156) == '0') // regular file
    // size field: 11 octal digits + NUL ("hello" = 5)
    assert(new String(e, 124, 11, "US-ASCII") == "00000000005" && e(135) == 0)
    // checksum: recompute with the field as spaces and compare
    var sum = 0L
    (0 until 512).foreach(i => sum += (if (i >= 148 && i < 156) ' '.toInt
                                       else e(i) & 0xff))
    val stored = java.lang.Long.parseLong(
      new String(e, 148, 6, "US-ASCII"), 8)
    assert(stored == sum && e(154) == 0 && e(155) == ' ')
    assert(new String(e, 512, 5, "UTF-8") == "hello")
    assert((517 until 1024).forall(e(_) == 0)) // data padded with zeros
  }

  test("archive round trip: empty members, exact-block members, binary-safe data") {
    val entries = Seq(
      TarEntry("a.txt", b("")),                       // zero-length member
      TarEntry("b.bin", Array.fill[Byte](512)(0)),    // data IS a zero block
      TarEntry("c.bin", Array.tabulate[Byte](513)(i => (i % 251).toByte)),
      TarEntry("d.txt", b("snow☃man")))          // multi-byte UTF-8
    val tar = Tar.tarFileBytes(entries)
    assert(tar.length % 512 == 0)
    val back = Tar.parseTar(tar)
    assert(back.isDefined && back.get.size == 4)
    back.get.zip(entries).foreach { case (got, want) =>
      assert(got.name == want.name)
      assert(got.bytes.toSeq == want.bytes.toSeq)
    }
    // the all-zero data block of b.bin must be consumed as DATA, not
    // read as the archive terminator (sizes drive the walk)
    assert(back.get(1).bytes.forall(_ == 0))
  }

  test("malformed archives all refuse as None") {
    val good = Tar.tarFileBytes(Seq(TarEntry("x.txt", b("payload"))))
    def mut(f: Array[Byte] => Array[Byte]): Option[Seq[TarEntry]] =
      Tar.parseTar(f(good.clone()))
    assert(Tar.parseTar(null).isEmpty)
    assert(Tar.parseTar(Array[Byte]()).isEmpty)
    assert(Tar.parseTar(Array.fill[Byte](512)(0)).isEmpty)   // half terminator
    assert(mut(t => t.take(600)).isEmpty)                    // not 512-aligned
    assert(mut(t => t.take(1024)).isEmpty)                   // missing terminator
    assert(mut { t => t(257) = 'X'; t }.isEmpty)             // bad magic
    assert(mut { t => t(0) = 'y'; t }.isEmpty)               // checksum mismatch
    assert(mut { t => t(130) = '7'; t }.isEmpty)             // checksum (size touched)
    assert(mut { t => t(124) = 'z'; t }.isEmpty)             // non-octal size
    // lying size that overruns the archive
    val lying = good.clone()
    // size 0777777 — recompute checksum so ONLY the size lies
    "00000777777".getBytes("US-ASCII").copyToArray(lying, 124)
    java.util.Arrays.fill(lying, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += lying(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    ("0" * (6 - cs.length) + cs).getBytes("US-ASCII").copyToArray(lying, 148)
    lying(154) = 0; lying(155) = ' '
    assert(Tar.parseTar(lying).isEmpty)
    // trailing garbage after the two-block terminator
    assert(Tar.parseTar(good ++ Array.fill[Byte](512)(1)).isEmpty)
    val trailing = good ++ Array.fill[Byte](512)(0)
    trailing(trailing.length - 1) = 1
    assert(Tar.parseTar(trailing).isEmpty)
    // near-Int.MaxValue size with a VALID checksum: the padded-size and
    // bounds arithmetic must stay in Long — an Int wrap used to crash the
    // copy instead of refusing (fail-soft means None, never a throw)
    val huge = good.clone()
    "17777777777".getBytes("US-ASCII").copyToArray(huge, 124) // 2^31 - 1
    java.util.Arrays.fill(huge, 148, 156, ' '.toByte)
    var sum2 = 0L
    (0 until 512).foreach(i => sum2 += huge(i) & 0xff)
    val cs2 = java.lang.Long.toOctalString(sum2)
    ("0" * (6 - cs2.length) + cs2).getBytes("US-ASCII").copyToArray(huge, 148)
    huge(154) = 0; huge(155) = ' '
    assert(Tar.parseTar(huge).isEmpty)
  }

  test("wds keys refuse negative ids — the lexicographic≡numeric invariant") {
    // '-' sorts before '0', so a negative id would silently break the
    // sorted-member == numeric-sample-order contract; the writer refuses
    intercept[IllegalArgumentException] {
      Tar.wdsFileBytes(Seq((-1L, "neg", null)))
    }
  }

  test("wds shards: canonical bytes, adjacent-member samples, fail-soft rows") {
    import spark.implicits._
    // same samples in any input order -> identical shard bytes (sorted)
    val samples = Seq(
      (7L, "seven", b("AA")), (3L, "three", b("BB")), (11L, "eleven", b("CC")))
    val f1 = Tar.wdsFileBytes(samples)
    val f2 = Tar.wdsFileBytes(samples.reverse)
    assert(f1.toSeq == f2.toSeq)
    val names = Tar.parseTar(f1).get.map(_.name)
    assert(names == Seq(
      "00000000000000000003.txt", "00000000000000000003.bin",
      "00000000000000000007.txt", "00000000000000000007.bin",
      "00000000000000000011.txt", "00000000000000000011.bin"))
    // a null binary member drops .bin: the sample is text-only
    val textOnly = Tar.wdsFileBytes(Seq((5L, "five", null)))
    assert(Tar.parseTar(textOnly).get.map(_.name) ==
      Seq("00000000000000000005.txt"))
    // FOREIGN shards use non-numeric keys: the loader hashes them to a
    // deterministic 64-bit id instead of throwing
    val foreign = Tar.tarFileBytes(Seq(
      TarEntry("sample_000.txt", b("alien")),
      TarEntry("sample_000.bin", b("BYTES"))))
    val fRows = Tar.wdsSamples(
        Seq((0L, foreign)).toDF("shard", "payload"))
      .collect()
    assert(fRows.length == 1 && fRows(0).getBoolean(5))
    assert(fRows(0).getAs[String]("text") == "alien" &&
      fRows(0).getInt(4) == 2)
    val again = Tar.wdsSamples(Seq((0L, foreign)).toDF("shard", "payload"))
      .head().getLong(1)
    assert(again == fRows(0).getLong(1)) // hash id is deterministic
    // distributed round trip + a malformed shard flagged, not dropped
    val docs = Seq((1L, "one", b("x1")), (2L, "two", b("x2")),
      (3L, "three", b("x3"))).toDF("doc_id", "text", "payload")
    val shards = Tar.wdsExport(docs, shards = 2)
    assert(shards.agg(sum("n_samples")).head().getLong(0) == 3L)
    val bad = Seq((99L, b("not a tar archive at all, far too short")))
      .toDF("shard", "payload")
    val rows = Tar.wdsSamples(
        shards.select("shard", "payload").unionByName(bad))
      .collect().map(r => (r.getLong(1), r.getAs[String]("text"),
        r.getAs[Array[Byte]]("bin"), r.getInt(4), r.getBoolean(5)))
    val ok = rows.filter(_._5).sortBy(_._1)
    assert(ok.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(ok.map(_._2).toSeq == Seq("one", "two", "three"))
    assert(ok.map(x => new String(x._3, "UTF-8")).toSeq ==
      Seq("x1", "x2", "x3"))
    assert(ok.forall(_._4 == 2))
    assert(rows.count(!_._5) == 1)
    // the read path never shuffles (binaryFile-scan shape) — checked on a
    // local relation so the EXPORT's one legitimate exchange stays out of
    // the measured plan
    val local = shards.select("shard", "payload")
      .as[(Long, Array[Byte])].collect().toSeq.toDF("shard", "payload")
    val plan = Tar.wdsSamples(local).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"wdsSamples must not shuffle:\n$plan")
  }

  test("gzipped wds shards: canonical bytes, transparent parse, file roundtrip") {
    import spark.implicits._
    val samples = Seq(
      (7L, "seven", b("AA")), (3L, "three", b("BB")), (11L, "eleven", b("CC")))
    val docs = samples.toDF("doc_id", "text", "payload")
    // canonical compressed bytes: same samples in -> same .tar.gz bytes
    // out, across re-exports (timestamp-free gzip framing)
    val gz1 = Tar.wdsExport(docs, shards = 1, gzip = true)
      .select("payload").head().getAs[Array[Byte]](0)
    val gz2 = Tar.wdsExport(docs.orderBy(col("doc_id").desc), shards = 1,
        gzip = true)
      .select("payload").head().getAs[Array[Byte]](0)
    assert(gz1.toSeq == gz2.toSeq)
    assert((gz1(0) & 0xff) == 0x1f && (gz1(1) & 0xff) == 0x8b)
    // the gzip layer is byte-transparent: parseTar(gz) == parseTar(plain)
    val plain = Tar.wdsFileBytes(samples)
    assert(Tar.parseTar(gz1).get.map(e => (e.name, e.bytes.toSeq)) ==
      Tar.parseTar(plain).get.map(e => (e.name, e.bytes.toSeq)))
    // corrupt gzip fail-softs as None / an is_valid=false row
    val corrupt = gz1.clone(); corrupt(gz1.length / 2) =
      (corrupt(gz1.length / 2) ^ 0x55).toByte
    assert(Tar.parseTar(corrupt).isEmpty) // DEFLATE/CRC trips -> None
    val flagged = Tar.wdsSamples(
        Seq((0L, corrupt.take(20))).toDF("shard", "payload"))
      .head()
    assert(!flagged.getBoolean(5))
    // file lifecycle: gz payloads land as .tar.gz, read back by shard
    // number, samples identical to the plain-tar path
    val dir = java.nio.file.Files.createTempDirectory("graft-wdsgz").toString
    Tar.writeWdsFiles(Seq((4L, gz1)).toDF("shard", "payload"), dir)
    assert(new java.io.File(dir, "shard-00004.tar.gz").isFile)
    val readBack = Tar.wdsSamples(Tar.readWdsFiles(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[String]("text"), r.getBoolean(5)))
    assert(readBack.map(_._1).toSet == Set(4L))
    assert(readBack.map(x => (x._2, x._3)).sortBy(_._1).toSeq ==
      Seq((3L, "three"), (7L, "seven"), (11L, "eleven")))
    assert(readBack.forall(_._4))
  }
}
