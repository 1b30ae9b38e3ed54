package graft

import org.apache.spark.sql.functions._

import graft.operators.{Jpeg, Multimodal}

/** Baseline JPEG codec: exact solid-block round trip (the oracle-gate
  * construction), lossy Annex-K sanity, a HAND-ASSEMBLED greyscale stream
  * (pins the marker walk + canonical Huffman decode against bytes computed
  * on paper, not against the encoder), malformed-input strictness, and the
  * rasterView/aHash acceptance of JPEG payloads. */
class JpegSpec extends SparkSpec {
  import spark.implicits._

  /** The JFIF colour round trip with the codec's floor(x+0.5) rounds —
    * the closed form a solid MCU must decode back to under FlatQuant. */
  private def roundTrip(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    def cl(v: Int) = math.max(0, math.min(255, v))
    val y = cl(math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt)
    val cb = cl(math.floor(128.5 - 0.1687 * r - 0.3313 * g + 0.5 * b).toInt)
    val cr = cl(math.floor(128.5 + 0.5 * r - 0.4187 * g - 0.0813 * b).toInt)
    val cbm = cb - 128.0; val crm = cr - 128.0
    (cl(math.floor(y + 1.402 * crm + 0.5).toInt),
      cl(math.floor(y - 0.344136 * cbm - 0.714136 * crm + 0.5).toInt),
      cl(math.floor(y + 1.772 * cbm + 0.5).toInt))
  }

  private def solidStrip(colors: Seq[(Int, Int, Int)]): Array[Byte] = {
    val w = 16 * colors.length
    val px = new Array[Byte](w * 16 * 3)
    for (((r, g, b), m) <- colors.zipWithIndex; y <- 0 until 16; x <- 0 until 16) {
      px((y * w + m * 16 + x) * 3) = r.toByte
      px((y * w + m * 16 + x) * 3 + 1) = g.toByte
      px((y * w + m * 16 + x) * 3 + 2) = b.toByte
    }
    px
  }

  test("solid MCUs under FlatQuant decode to the exact JFIF round trip") {
    val colors = Seq((200, 30, 90), (0, 0, 0), (255, 255, 255), (17, 203, 77))
    val bytes = Jpeg.encode(solidStrip(colors), 16 * colors.length, 16,
      Jpeg.FlatQuant, Jpeg.FlatQuant)
    val Some((w, h, nc, px)) = Jpeg.decode(bytes)
    assert((w, h, nc) == (16 * colors.length, 16, 3))
    for ((c, m) <- colors.zipWithIndex) {
      val want = roundTrip(c._1, c._2, c._3)
      // every pixel of the MCU, not just a sample — subsampling/upsampling
      // and block edges must all reproduce the constant
      for (y <- 0 until 16; x <- 0 until 16) {
        val o = (y * w + m * 16 + x) * 3
        val got = (px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff)
        assert(got == want, s"MCU $m pixel ($x,$y): $got != $want")
      }
    }
  }

  test("Annex K tables on a gradient: valid, right dims, bounded error") {
    val w = 32; val h = 32
    val px = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      (i % 3 match {
        case 0 => x * 8
        case 1 => y * 8
        case 2 => (x + y) * 4
      }).toByte
    }
    val bytes = Jpeg.encode(px, w, h)
    val Some((dw, dh, nc, out)) = Jpeg.decode(bytes)
    assert((dw, dh, nc) == (w, h, 3))
    var maxErr = 0
    var i = 0
    while (i < out.length) {
      maxErr = math.max(maxErr, math.abs((out(i) & 0xff) - (px(i) & 0xff)))
      i += 1
    }
    // Annex K at this smoothness: quantization + 4:2:0 error stays modest
    assert(maxErr <= 48, s"max per-channel error $maxErr")
  }

  test("odd dimensions survive the MCU padding (17x9)") {
    val w = 17; val h = 9
    val px = Array.tabulate(w * h * 3)(i => ((i * 37) % 251).toByte)
    val Some((dw, dh, _, out)) = Jpeg.decode(Jpeg.encode(px, w, h))
    assert(dw == w && dh == h && out.length == w * h * 3)
  }

  test("hand-assembled greyscale stream decodes to solid 128") {
    // 8x8, one component, quant table all 8s, Annex K DC-luma + AC-luma
    // Huffman tables. Solid 128 level-shifts to 0: DC diff 0 = category 0,
    // canonical DC code '00'; EOB is the first length-4 AC code '1010'
    // (lengths 2,2,3 precede it canonically). Entropy bits 001010 pad with
    // 1s to 0x2B. Every byte below is from the T.81 construction by hand.
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    b(0xff, 0xd8) // SOI
    b(0xff, 0xdb, 0x00, 0x43, 0x00) // DQT: table 0, 8-bit
    (0 until 64).foreach(_ => b(8))
    b(0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x08, 0x00, 0x08, 0x01,
      0x01, 0x11, 0x00) // SOF0: 8x8, 1 comp, 1x1, q0
    // DHT DC-luma (Annex K)
    b(0xff, 0xc4, 0x00, 0x1f, 0x00)
    b(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    (0 to 11).foreach(b(_))
    // DHT AC-luma (Annex K), 162 values
    b(0xff, 0xc4, 0x00, 0xb5, 0x10)
    b(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    val acVals = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
    acVals.foreach(b(_))
    b(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3f, 0x00) // SOS
    b(0x2b) // entropy: DC cat-0 '00' + EOB '1010' + pad '11'
    b(0xff, 0xd9) // EOI
    val Some((w, h, nc, px)) = Jpeg.decode(out.toByteArray)
    assert((w, h, nc) == (8, 8, 1))
    assert(px.forall(p => (p & 0xff) == 128))
  }

  test("hand-assembled stream with DRI/RST0: restart consumed, DC predictor reset") {
    // 16x8 greyscale = two 8x8 MCUs, restart interval 1: entropy is
    // MCU0 | RST0 | MCU1. MCU0: DC cat-0 ('00') + EOB ('1010') pad-> 0x2B,
    // all-128 block. MCU1 after the PREDICTOR RESET: DC cat-2 ('011') +
    // value bits '10' (+2) + EOB ('1010') -> 011101010 pad-> 0x75 0x7F;
    // DC 2 x quant 8 -> IDCT 2 -> solid 130. A decoder that fails to reset
    // the predictor or to consume the marker cannot produce this plane.
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    b(0xff, 0xd8)
    b(0xff, 0xdb, 0x00, 0x43, 0x00); (0 until 64).foreach(_ => b(8))
    b(0xff, 0xdd, 0x00, 0x04, 0x00, 0x01) // DRI: interval 1
    b(0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x08, 0x00, 0x10, 0x01,
      0x01, 0x11, 0x00) // SOF0: w=16 h=8, 1 comp 1x1
    b(0xff, 0xc4, 0x00, 0x1f, 0x00)
    b(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    (0 to 11).foreach(b(_))
    b(0xff, 0xc4, 0x00, 0xb5, 0x10) // Annex K AC-luma ('1010' = EOB)
    b(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    val acVals = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
    acVals.foreach(b(_))
    b(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3f, 0x00)
    b(0x2b)             // MCU0
    b(0xff, 0xd0)       // RST0
    b(0x75, 0x7f)       // MCU1 (DC +2 after reset)
    b(0xff, 0xd9)
    val Some((w, h, nc, px)) = Jpeg.decode(out.toByteArray)
    assert((w, h, nc) == (16, 8, 1))
    for (y <- 0 until 8; x <- 0 until 16) {
      val want = if (x < 8) 128 else 130
      assert((px((y * 16 + x) * 3) & 0xff) == want, s"($x,$y)")
    }
  }

  test("malformed inputs fail soft") {
    val good = Jpeg.encode(solidStrip(Seq((10, 20, 30))), 16, 16)
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decode("not a jpeg".getBytes("UTF-8")).isEmpty)
    // truncated anywhere in the tail
    assert(Jpeg.decode(good.take(good.length - 3)).isEmpty)
    assert(Jpeg.decode(good.take(20)).isEmpty)
    // trailing bytes after EOI
    assert(Jpeg.decode(good ++ Array[Byte](0)).isEmpty)
    // progressive: flip SOF0 (0xC0) to SOF2 (0xC2)
    val prog = good.clone()
    val sof = prog.indices.dropRight(1)
      .find(i => (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }

  test("encodeJpeg corpus decodes to the closed-form means; aHash accepts JPEG") {
    val docs = Seq((1L, "abcdef", "s1"), (2L, "x", "s1"), (3L, "", "s2"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.encodeJpeg(
      Multimodal.fromText(docs, "doc_id", "text", "source"))
    val feats = Multimodal.decodeJpegFeatures(media)
      .orderBy("media_id").collect()
    // doc 1: "abcdef" -> 2 MCUs coloured (97,98,99) and (100,101,102)
    val m1 = Seq(roundTrip(97, 98, 99), roundTrip(100, 101, 102))
    assert(feats(0).getAs[Int]("width") == 32 &&
      feats(0).getAs[Int]("height") == 16 &&
      feats(0).getAs[Boolean]("is_valid"))
    assert(feats(0).getAs[Double]("mean_r") == m1.map(_._1).sum / 2.0)
    assert(feats(0).getAs[Double]("mean_g") == m1.map(_._2).sum / 2.0)
    assert(feats(0).getAs[Double]("mean_b") == m1.map(_._3).sum / 2.0)
    // doc 2: "x" -> one MCU (120, 0, 0) zero-padded
    val m2 = roundTrip(120, 0, 0)
    assert(feats(1).getAs[Double]("mean_r") == m2._1.toDouble &&
      feats(1).getAs[Double]("mean_g") == m2._2.toDouble)
    // doc 3: empty text -> one zero-padded MCU (0,0,0) round-trips to black
    assert(feats(2).getAs[Boolean]("is_valid") &&
      feats(2).getAs[Double]("mean_b") == roundTrip(0, 0, 0)._3.toDouble)
    // rasterView dispatch: the aHash kernel accepts the JPEG container
    val ah = Multimodal.aHashFeatures(media, grid = 4)
      .orderBy("media_id").collect()
    assert(ah.forall(_.getAs[Boolean]("is_valid")))
    assert(ah.head.getAs[Int]("n_bits") == 16)
    // and resize-in-kind hands a JPEG back as PNG (no second lossy pass)
    val resized = Multimodal.resizePpm(media, 4, 4).select("payload")
      .collect().map(_.getAs[Array[Byte]]("payload"))
    assert(resized.forall(p => (p(0) & 0xff) == 0x89 && p(1) == 'P'.toByte))
  }
}
