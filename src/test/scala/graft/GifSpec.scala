package graft

import org.apache.spark.sql.functions._

import graft.operators.{Gif, Multimodal}

/** GIF87a/89a codec: exact palette round trips (including the LZW width
  * ladder to 12 bits and multiple dictionary resets), interlace, a
  * HAND-ASSEMBLED stream decoded from paper-computed bytes (pins the LZW
  * bit packing and width-bump timing against the spec, not against the
  * encoder), local color tables, animation compositing (disposal +
  * transparency), malformed-input strictness, and the rasterView/aHash
  * acceptance of GIF payloads. */
class GifSpec extends SparkSpec {
  import spark.implicits._

  private val palette: Array[Byte] = {
    val p = new Array[Byte](256 * 3)
    for (i <- 0 until 256) {
      p(i * 3) = i.toByte
      p(i * 3 + 1) = ((i + 85) % 256).toByte
      p(i * 3 + 2) = (255 - i).toByte
    }
    p
  }

  private def expectRgb(idx: Int): (Int, Int, Int) =
    (idx, (idx + 85) % 256, 255 - idx)

  test("exact round trip through encode/decode (256-color palette)") {
    val w = 13; val h = 7
    val idx = Array.tabulate(w * h)(i => ((i * 71 + 13) % 256).toByte)
    val Some((dw, dh, nc, px)) = Gif.decode(Gif.encode(idx, w, h, palette))
    assert((dw, dh, nc) == (w, h, 3))
    for (p <- 0 until w * h) {
      val want = expectRgb(idx(p) & 0xff)
      val got = (px(p * 3) & 0xff, px(p * 3 + 1) & 0xff, px(p * 3 + 2) & 0xff)
      assert(got == want, s"pixel $p: $got != $want")
    }
  }

  test("LZW width ladder to 12 bits and dictionary resets round-trip") {
    // 300k low-entropy-ish bytes: enough distinct phrases to climb the
    // width ladder past 2048 entries and force >=2 full-table CLEAR
    // resets; a one-bit desync anywhere corrupts everything downstream
    val rnd = new scala.util.Random(7)
    val w = 500; val h = 600
    val idx = Array.fill(w * h)((rnd.nextInt(256)).toByte)
    val bytes = Gif.encode(idx, w, h, palette)
    val Some((dw, dh, _, px)) = Gif.decode(bytes)
    assert(dw == w && dh == h)
    var p = 0
    while (p < w * h) {
      assert((px(p * 3) & 0xff) == (idx(p) & 0xff), s"pixel $p")
      p += 1
    }
    // and a HIGHLY compressible plane (long runs -> deep LZW chains)
    val runs = Array.tabulate(w * h)(i => ((i / 997) % 256).toByte)
    val Some((_, _, _, px2)) = Gif.decode(Gif.encode(runs, w, h, palette))
    assert((0 until w * h).forall(p => (px2(p * 3) & 0xff) == (runs(p) & 0xff)))
  }

  test("hand-assembled 3x1 two-color stream decodes to white/black/white") {
    // GIF89a, 2-color table (black, white), pixels [1,0,1], minCodeSize 2:
    // clear=4 eoi=5, codes 4,1,0,1 at 3 bits; the add after reading code 3
    // brings the decoder table to 8 = 2^3, so EOI is read at 4 bits — the
    // packed stream 4|1<<3|0<<6|1<<9|5<<12 = 0x520C is the two bytes
    // 0x0C 0x52. Every byte below is from the 89a spec by hand.
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    b('G', 'I', 'F', '8', '9', 'a')
    b(0x03, 0x00, 0x01, 0x00) // logical screen 3x1
    b(0x80, 0x00, 0x00)       // GCT of 2, bg 0, aspect 0
    b(0x00, 0x00, 0x00, 0xff, 0xff, 0xff) // palette: black, white
    b(0x21, 0xf9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00) // GCE, no transparency
    b(0x2c, 0x00, 0x00, 0x00, 0x00, 0x03, 0x00, 0x01, 0x00, 0x00)
    b(0x02)                   // LZW min code size
    b(0x02, 0x0c, 0x52, 0x00) // one 2-byte sub-block + terminator
    b(0x3b)
    val Some((w, h, _, px)) = Gif.decode(out.toByteArray)
    assert((w, h) == (3, 1))
    val got = px.map(_ & 0xff).toSeq
    assert(got == Seq(255, 255, 255, 0, 0, 0, 255, 255, 255))
  }

  test("hand-assembled local color table overrides the global one") {
    // 1x1 frame, GCT black/white but an LCT red/green; index 1 -> green.
    // LZW (min 2): codes 4,1,5 at 3 bits = 4|1<<3|5<<6 = 0x14C -> 4C 01.
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    b('G', 'I', 'F', '8', '9', 'a')
    b(0x01, 0x00, 0x01, 0x00, 0x80, 0x00, 0x00)
    b(0x00, 0x00, 0x00, 0xff, 0xff, 0xff)       // GCT
    b(0x2c, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x80)
    b(0xff, 0x00, 0x00, 0x00, 0xff, 0x00)       // LCT: red, green
    b(0x02, 0x02, 0x4c, 0x01, 0x00, 0x3b)
    val Some((_, _, _, px)) = Gif.decode(out.toByteArray)
    assert(px.map(_ & 0xff).toSeq == Seq(0, 255, 0))
  }

  test("interlaced stream decodes to the same plane as sequential") {
    val w = 9; val h = 11 // odd dims hit every interlace pass unevenly
    val idx = Array.tabulate(w * h)(i => ((i * 31) % 256).toByte)
    val seqBytes = Gif.encode(idx, w, h, palette)
    val intBytes = Gif.encode(idx, w, h, palette, interlaced = true)
    assert(!java.util.Arrays.equals(seqBytes, intBytes))
    val Some((_, _, _, a)) = Gif.decode(seqBytes)
    val Some((_, _, _, b)) = Gif.decode(intBytes)
    assert(java.util.Arrays.equals(a, b))
  }

  test("animation: disposal-to-background and transparency composite") {
    // screen 4x4 on palette idx 0 background; frame 0 = solid idx 10 with
    // disposal 2 (restore to background after); frame 1 = 2x2 at (1,1) of
    // idx 20 with idx-20-transparent top-left pixel... use a mixed frame:
    // indices [20, 30, 30, 20] with transparentIdx 30 -> only the 20s land.
    val f0 = Gif.Frame(Array.fill(16)(10.toByte), 0, 0, 4, 4, disposal = 2)
    val f1 = Gif.Frame(Array[Byte](20, 30, 30, 20), 1, 1, 2, 2,
      transparentIdx = 30)
    val bytes = Gif.encodeFrames(Seq(f0, f1), 4, 4, palette)
    val Some((sw, sh, frames)) = Gif.decodeFrames(bytes)
    assert((sw, sh) == (4, 4) && frames.length == 2)
    // frame 0: solid idx 10 everywhere
    val want10 = expectRgb(10)
    assert((0 until 16).forall { p =>
      (frames(0).canvas(p * 3) & 0xff) == want10._1 &&
        (frames(0).canvas(p * 3 + 1) & 0xff) == want10._2 })
    // frame 1: background (idx 0) restored, then (1,1) and (2,2) get idx 20
    // while the transparent 30s leave background showing
    val want0 = expectRgb(0); val want20 = expectRgb(20)
    for (y <- 0 until 4; x <- 0 until 4) {
      val o = (y * 4 + x) * 3
      val want = if ((x, y) == (1, 1) || (x, y) == (2, 2)) want20 else want0
      val got = (frames(1).canvas(o) & 0xff, frames(1).canvas(o + 1) & 0xff,
        frames(1).canvas(o + 2) & 0xff)
      assert(got == want, s"($x,$y): $got != $want")
    }
  }

  test("malformed inputs fail soft") {
    val good = Gif.encode(Array[Byte](1, 2, 3, 4), 2, 2, palette)
    assert(Gif.decode(null).isEmpty)
    assert(Gif.decode(Array.emptyByteArray).isEmpty)
    assert(Gif.decode("not a gif at all".getBytes("UTF-8")).isEmpty)
    assert(Gif.decode(good.take(good.length - 1)).isEmpty)  // no trailer
    assert(Gif.decode(good.take(25)).isEmpty)               // mid-stream cut
    assert(Gif.decode(good ++ Array[Byte](0)).isEmpty)      // trailing bytes
    // an index beyond a small color table: 4-color GCT but minCodeSize 3,
    // literal 6 (clear=8 eoi=9, codes 8,6,9 at 4 bits = 8|6<<4|9<<8 -> 68 09)
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    b('G', 'I', 'F', '8', '9', 'a')
    b(0x01, 0x00, 0x01, 0x00, 0x91, 0x00, 0x00)
    (0 until 12).foreach(_ => b(0x40)) // 4-entry GCT
    b(0x2c, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
    b(0x03, 0x02, 0x68, 0x09, 0x00, 0x3b)
    assert(Gif.decode(out.toByteArray).isEmpty)
    // a frame rectangle outside the logical screen
    val f = Gif.Frame(Array.fill(4)(1.toByte), 3, 3, 2, 2)
    assert(Gif.decodeFrames(Gif.encodeFrames(Seq(f), 4, 4, palette)).isEmpty)
  }

  test("decoder never throws: random bytes and single-byte corruptions") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val b = Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte)
      Gif.decode(b) // None or a valid decode — anything but a throw
    }
    // every single-byte corruption of a real stream (magic, descriptors,
    // LZW payload, trailer) must fail soft or decode to SOMETHING —
    // AIOOBE/negative-size/infinite-loop paths all surface here
    val good = Gif.encode(Array.tabulate(24)(i => (i * 11).toByte), 4, 6,
      palette)
    for (i <- good.indices) {
      val c = good.clone()
      c(i) = (c(i) ^ 0x5b).toByte
      Gif.decode(c)
    }
    // and truncations at every length
    for (n <- 0 until good.length) Gif.decode(good.take(n))
  }

  test("encodeGif corpus decodes to the palette construction; aHash accepts GIF") {
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz", "s1"), (2L, "x", "s1"),
        (3L, "", "s2"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.encodeGif(
      Multimodal.fromText(docs, "doc_id", "text", "source"))
    val feats = Multimodal.decodeGifFeatures(media)
      .orderBy("media_id").collect()
    // doc 1: 26 bytes -> h = 2, 8 pixels = indices 'a'..'h'
    val idx1 = "abcdefgh".map(_.toInt)
    assert(feats(0).getAs[Int]("width") == 4 &&
      feats(0).getAs[Int]("height") == 2 && feats(0).getAs[Boolean]("is_valid"))
    assert(feats(0).getAs[Double]("mean_r") == idx1.sum / 8.0)
    assert(feats(0).getAs[Double]("mean_g") ==
      idx1.map(i => (i + 85) % 256).sum / 8.0)
    assert(feats(0).getAs[Double]("mean_b") ==
      idx1.map(255 - _).sum / 8.0)
    // doc 2: "x" -> h=1, indices [120, 0, 0, 0]
    assert(feats(1).getAs[Double]("mean_r") == 120 / 4.0)
    // doc 3: empty -> one all-zero row, mean_b = 255
    assert(feats(2).getAs[Boolean]("is_valid") &&
      feats(2).getAs[Double]("mean_b") == 255.0)
    // rasterView dispatch: aHash accepts the GIF container
    val ah = Multimodal.aHashFeatures(media, grid = 2)
      .orderBy("media_id").collect()
    assert(ah.forall(_.getAs[Boolean]("is_valid")))
    // and resize hands a GIF back as PNG (palette can't hold resampled colors)
    val resized = Multimodal.resizePpm(media, 2, 1).select("payload")
      .collect().map(_.getAs[Array[Byte]]("payload"))
    assert(resized.forall(p => (p(0) & 0xff) == 0x89 && p(1) == 'P'.toByte))
  }

  test("temporal hash: bright-bright-dark-dark animation reads 0b1100") {
    // palette byte sum per pixel depends only on (v+85) mod 256: v = 170
    // maps to 255+255 = 510 per pixel (bright), v = 171 to 0+255 = 255
    // (dark). Four frames [bright, bright, dark, dark] at windows = 4:
    // per-byte window means [170, 170, 85, 85], tot = 510, so bits 0 and
    // 1 set -> thash 12.
    val frames = Seq(170, 170, 171, 171).map(v =>
      Gif.Frame(Array.fill(64)(v.toByte), 0, 0, 8, 8))
    val payload = Gif.encodeFrames(frames, 8, 8, palette)
    val media = Seq((1L, "video", payload, (payload.length.toLong,
        null: String, "s")))
      .toDF("media_id", "kind", "payload", "meta")
      .withColumn("meta", struct(col("meta._1").as("byte_len"),
        col("meta._2").as("sha256"), col("meta._3").as("source")))
    val r = Multimodal.gifTemporalHash(media, windows = 4).head
    assert(r.getAs[Boolean]("is_valid"))
    assert(r.getAs[Int]("n_bits") == 4 && r.getAs[Long]("n_frames") == 4L)
    assert(r.getAs[Long]("thash") == 12L, r.toString)
  }

  test("encodeGifFrames corpus: one composited row per frame") {
    val docs = Seq((1L, "abc", "s1"), (2L, "", "s2"))
      .toDF("doc_id", "text", "source")
    val rows = Multimodal.decodeGifFrameFeatures(Multimodal.encodeGifFrames(
        Multimodal.fromText(docs, "doc_id", "text", "source")))
      .orderBy("media_id", "frame_no").collect()
    // doc 1: 3 frames of solid 'a','b','c'
    assert(rows.count(_.getAs[Long]("media_id") == 1L) == 3)
    for ((ch, i) <- "abc".zipWithIndex) {
      val r = rows(i)
      assert(r.getAs[Int]("frame_no") == i && r.getAs[Boolean]("is_valid"))
      assert(r.getAs[Double]("mean_r") == ch.toInt.toDouble)
      assert(r.getAs[Double]("mean_g") == ((ch.toInt + 85) % 256).toDouble)
    }
    // doc 2: empty text -> a single solid-0 frame
    val r2 = rows.filter(_.getAs[Long]("media_id") == 2L)
    assert(r2.length == 1 && r2(0).getAs[Double]("mean_b") == 255.0)
  }
}
