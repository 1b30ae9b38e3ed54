package graft.operators

/** Baseline sequential JPEG (SOF0) — encoder and decoder, pure JVM, zero
  * new dependencies: the remaining real-world image format beside the
  * engine's PNG/QOI/PPM codecs (reference images in `/root/reference` are
  * app-served PNGs; JPEG is what an actual crawl corpus holds).
  *
  * Everything here follows the PUBLIC spec (ITU-T T.81 / ISO 10918-1):
  *  - marker segment walk (SOI, APPn/COM skipped, DQT, DHT, DRI, SOF0,
  *    SOS, RSTn, EOI);
  *  - canonical Huffman decode via the spec's MINCODE/MAXCODE/VALPTR
  *    construction (F.2.2.3), byte-stuffing (0xFF 0x00) and restart
  *    markers handled in the bit reader;
  *  - per-block pipeline: DC prediction + EXTEND, AC run/size with
  *    EOB/ZRL, zigzag placement, dequantization, float IDCT
  *    (A.3.3), level shift, clamp;
  *  - component sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0),
  *    greyscale (1 component) and YCbCr (3 components, JFIF
  *    conversion);
  *  - progressive (SOF2), arithmetic coding, 12-bit precision and
  *    hierarchical modes are OUT of scope and fail soft (None), the
  *    [[Multimodal.pngDecode]] strictness convention.
  *
  * The ENCODER is a valid minimal baseline writer (interleaved single
  * scan, Annex K quantization + Huffman tables by default, 4:2:0 for RGB
  * input) — like [[Multimodal.pngEncode]] it exists to build honest
  * corpora for the decoder and the oracle gates; the decoder never
  * assumes its output shape.
  *
  * DETERMINISM: every float round in the codec is `floor(x + 0.5)` (one
  * double expression, mirrorable in any engine), so gates can pin the
  * decode bit-for-bit with an analytic oracle. With a DC quantizer of 8,
  * a solid 8x8 block round-trips EXACTLY (FDCT of a constant block is
  * 8·(v−128) in the DC slot and 0 elsewhere; quant/dequant by 8 and the
  * IDCT hand back v), which is what `q_multimodal_jpeg_decode` exploits.
  */
object Jpeg {

  /** Zigzag scan order: zigzag(k) = raster index of the k-th coefficient
    * (T.81 Figure 5). */
  private[operators] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K (K.1) luminance quantization table, raster order. */
  val StdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K (K.2) chrominance quantization table, raster order. */
  val StdChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** A quantizer whose DC step is 8 and AC step 16: the DC/8 round trip of
    * a SOLID block is exact (see the object doc), which lets oracle gates
    * pin the full encode→decode chain analytically. A legal table like any
    * other — the decoder reads whatever DQT the stream carries. */
  val FlatQuant: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)

  // ---- Annex K (K.3) Huffman table specs: (BITS, HUFFVAL). The DECODER
  //      never uses these (it reads DHT); only the encoder writes them.
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
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
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** ctab(u)(x) = C(u)·cos((2x+1)uπ/16) — the shared FDCT/IDCT basis. */
  private val Ctab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ======================== encoder ========================

  /** Canonical Huffman ENCODE table from (BITS, HUFFVAL): symbol →
    * (code, length), per T.81 C.2. */
  private def buildEncodeTable(bits: Array[Int],
                               vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        table(vals(k)) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    table
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >>> (nBits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing (T.81 F.1.2.3)
        nBits -= 8
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1-bits (spec convention)
      val pad = 8 - nBits
      put((1 << pad) - 1, pad)
    }
  }

  /** Magnitude category of a coefficient (0 for 0, else bit length of |v|). */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Forward DCT of one level-shifted block (raster f) into raster F —
    * SEPARABLE (rows then columns, 2·8³ multiplies instead of the direct
    * form's 8⁴): the standard factorization; float results differ from the
    * direct sum only in summation order (≪ quantizer steps). */
  private def fdct(f: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // 1-D DCT along each row
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += f(y * 8 + x) * Ctab(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) { // 1-D DCT down each column
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Ctab(v)(yy); yy += 1 }
        out(v * 8 + u) = 0.25 * s
        u += 1
      }
      v += 1
    }
    out
  }

  /** Encode an RGB plane (w·h·3 bytes) as a baseline 4:2:0 YCbCr JPEG.
    * JFIF colour conversion with `floor(x + 0.5)` rounds, edge-replicated
    * padding to 16-pixel MCU multiples, half-up integer 2x2 chroma box
    * mean, Annex K Huffman tables, one interleaved scan, no restarts. */
  def encode(px: Array[Byte], w: Int, h: Int,
             lumaQ: Array[Int] = StdLumaQuant,
             chromaQ: Array[Int] = StdChromaQuant): Array[Byte] = {
    require(px.length == w * h * 3, "plane must be w*h*3 RGB bytes")
    require(lumaQ.length == 64 && chromaQ.length == 64 &&
      (lumaQ ++ chromaQ).forall(q => q >= 1 && q <= 255),
      "quant tables must be 64 entries in [1, 255]")
    val wP = (w + 15) / 16 * 16
    val hP = (h + 15) / 16 * 16
    // full-resolution YCbCr planes, edge-replicated to the padded size
    val yPl = new Array[Int](wP * hP)
    val cbPl = new Array[Int](wP * hP)
    val crPl = new Array[Int](wP * hP)
    var yy = 0
    while (yy < hP) {
      val sy = math.min(yy, h - 1)
      var xx = 0
      while (xx < wP) {
        val sx = math.min(xx, w - 1)
        val o = (sy * w + sx) * 3
        val r = px(o) & 0xff; val g = px(o + 1) & 0xff; val b = px(o + 2) & 0xff
        yPl(yy * wP + xx) = clamp255(math.floor(
          0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt)
        cbPl(yy * wP + xx) = clamp255(math.floor(
          128.5 - 0.1687 * r - 0.3313 * g + 0.5 * b).toInt)
        crPl(yy * wP + xx) = clamp255(math.floor(
          128.5 + 0.5 * r - 0.4187 * g - 0.0813 * b).toInt)
        xx += 1
      }
      yy += 1
    }
    // 2x2 box-subsampled chroma (half-up integer mean)
    val wC = wP / 2; val hC = hP / 2
    val cbS = new Array[Int](wC * hC)
    val crS = new Array[Int](wC * hC)
    var cy = 0
    while (cy < hC) {
      var cx = 0
      while (cx < wC) {
        var sCb = 0; var sCr = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            sCb += cbPl((cy * 2 + dy) * wP + cx * 2 + dx)
            sCr += crPl((cy * 2 + dy) * wP + cx * 2 + dx)
            dx += 1
          }
          dy += 1
        }
        cbS(cy * wC + cx) = (sCb + 2) / 4
        crS(cy * wC + cx) = (sCr + 2) / 4
        cx += 1
      }
      cy += 1
    }
    val out = new java.io.ByteArrayOutputStream(1024)
    def b(v: Int): Unit = out.write(v & 0xff)
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    def marker(m: Int): Unit = { b(0xff); b(m) }
    marker(0xd8) // SOI
    // APP0 / JFIF 1.02, no thumbnail
    marker(0xe0); be16(16)
    out.write("JFIF".getBytes("US-ASCII")); b(0)
    b(1); b(2); b(0); be16(1); be16(1); b(0); b(0)
    // DQT: table 0 (luma), table 1 (chroma), 8-bit, zigzag order
    marker(0xdb); be16(2 + 2 * 65)
    b(0x00); Zigzag.foreach(z => b(lumaQ(z)))
    b(0x01); Zigzag.foreach(z => b(chromaQ(z)))
    // SOF0: 8-bit, 3 components, Y 2x2 q0, Cb 1x1 q1, Cr 1x1 q1
    marker(0xc0); be16(8 + 3 * 3)
    b(8); be16(h); be16(w); b(3)
    b(1); b(0x22); b(0)
    b(2); b(0x11); b(1)
    b(3); b(0x11); b(1)
    // DHT: four Annex K tables
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length)
      b((tc << 4) | th); bits.foreach(b); vals.foreach(b)
    }
    dht(0, 0, DcLumaBits, DcLumaVals)
    dht(1, 0, AcLumaBits, AcLumaVals)
    dht(0, 1, DcChromaBits, DcChromaVals)
    dht(1, 1, AcChromaBits, AcChromaVals)
    // SOS: 3 components, (dc, ac) tables (0,0) luma / (1,1) chroma
    marker(0xda); be16(6 + 2 * 3)
    b(3); b(1); b(0x00); b(2); b(0x11); b(3); b(0x11)
    b(0); b(63); b(0)
    // entropy-coded interleaved scan
    val encDcL = buildEncodeTable(DcLumaBits, DcLumaVals)
    val encAcL = buildEncodeTable(AcLumaBits, AcLumaVals)
    val encDcC = buildEncodeTable(DcChromaBits, DcChromaVals)
    val encAcC = buildEncodeTable(AcChromaBits, AcChromaVals)
    val bw = new BitWriter(out)
    val predDc = new Array[Int](3)
    def encodeBlock(plane: Array[Int], pw: Int, bx: Int, by: Int,
                    quant: Array[Int], comp: Int,
                    dcTab: Array[(Int, Int)], acTab: Array[(Int, Int)]): Unit = {
      val f = new Array[Double](64)
      var i = 0
      while (i < 64) {
        f(i) = plane((by * 8 + i / 8) * pw + bx * 8 + i % 8) - 128.0
        i += 1
      }
      val coef = fdct(f)
      val q = new Array[Int](64)
      i = 0
      while (i < 64) {
        q(i) = math.floor(coef(Zigzag(i)) / quant(Zigzag(i)) + 0.5).toInt
        i += 1
      }
      // DC: size category of the differential + magnitude bits
      val diff = q(0) - predDc(comp)
      predDc(comp) = q(0)
      val dcCat = category(diff)
      val (dcCode, dcLen) = dcTab(dcCat)
      bw.put(dcCode, dcLen)
      if (dcCat > 0)
        bw.put(if (diff >= 0) diff else diff + (1 << dcCat) - 1, dcCat)
      // AC: run/size with ZRL and EOB
      var run = 0
      var k = 1
      while (k < 64) {
        if (q(k) == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = acTab(0xf0); bw.put(c, l); run -= 16 }
          val cat = category(q(k))
          val (c, l) = acTab((run << 4) | cat)
          bw.put(c, l)
          bw.put(if (q(k) >= 0) q(k) else q(k) + (1 << cat) - 1, cat)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c, l) = acTab(0x00); bw.put(c, l) }
    }
    var my = 0
    while (my < hP / 16) {
      var mx = 0
      while (mx < wP / 16) {
        encodeBlock(yPl, wP, mx * 2, my * 2, lumaQ, 0, encDcL, encAcL)
        encodeBlock(yPl, wP, mx * 2 + 1, my * 2, lumaQ, 0, encDcL, encAcL)
        encodeBlock(yPl, wP, mx * 2, my * 2 + 1, lumaQ, 0, encDcL, encAcL)
        encodeBlock(yPl, wP, mx * 2 + 1, my * 2 + 1, lumaQ, 0, encDcL, encAcL)
        encodeBlock(cbS, wC, mx, my, chromaQ, 1, encDcC, encAcC)
        encodeBlock(crS, wC, mx, my, chromaQ, 2, encDcC, encAcC)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ======================== decoder ========================

  /** Canonical Huffman DECODE table (T.81 F.2.2.3): per code length l,
    * (mincode, maxcode, valptr) over HUFFVAL. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int = vals(valPtr(l) + code - minCode(l))
  }

  /** MSB-first bit reader over the entropy-coded segment: un-stuffs
    * 0xFF 0x00, stops (reports exhaustion) at any real marker. Restart
    * markers are consumed explicitly via [[restart]]. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var broken = false
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= b.length) { broken = true; return 0 }
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) { broken = true; return 0 }
          val n = b(pos + 1) & 0xff
          if (n != 0x00) { broken = true; return 0 } // a real marker: stop
          pos += 2
        } else pos += 1
        acc = v; nBits = 8
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an RSTn marker; false if it is not there. */
    def restart(): Boolean = {
      nBits = 0
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
    /** Byte-align (end of scan). */
    def align(): Unit = { nBits = 0 }
  }

  /** EXTEND (T.81 F.2.2.1): map `cat` magnitude bits to a signed value. */
  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0 else if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v

  private case class Component(id: Int, h: Int, v: Int, tq: Int,
                               var dcTab: Int = 0, var acTab: Int = 0)

  /** Decode a baseline JPEG to (width, height, components, RGB plane).
    * Greyscale sources replicate Y into all three channels; colour
    * sources convert per JFIF (`floor(x + 0.5)` rounds, clamped).
    * Strict: anything outside baseline-sequential-Huffman, a malformed
    * segment, a truncated or over-long entropy stream, or trailing bytes
    * after EOI yields None. */
  def decode(bts: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bts == null || bts.length < 4) return None
    if ((bts(0) & 0xff) != 0xff || (bts(1) & 0xff) != 0xd8) return None
    var i = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    def be16(o: Int): Int = ((bts(o) & 0xff) << 8) | (bts(o + 1) & 0xff)
    // ---- marker segment walk up to SOS
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 4 > bts.length) return None
      if ((bts(i) & 0xff) != 0xff) return None
      val m = bts(i + 1) & 0xff
      if (m == 0xff) { i += 1 } // fill bytes before a marker are legal
      else {
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > bts.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        m match {
          case 0xc0 => // SOF0 — baseline
            if (comps != null || len < 8) return None
            val prec = bts(seg) & 0xff
            h = be16(seg + 1); w = be16(seg + 3)
            val n = bts(seg + 5) & 0xff
            if (prec != 8 || w <= 0 || h <= 0 || (n != 1 && n != 3) ||
                len != 8 + 3 * n || w.toLong * h > Int.MaxValue / 8) return None
            comps = Array.tabulate(n) { c =>
              val o = seg + 6 + 3 * c
              Component(bts(o) & 0xff, (bts(o + 1) & 0xff) >> 4,
                bts(o + 1) & 0x0f, bts(o + 2) & 0xff)
            }
            if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 ||
                c.tq > 3)) return None
            if (n == 1 && (comps(0).h != 1 || comps(0).v != 1)) return None
          case 0xc4 => // DHT (possibly several tables per segment)
            var o = seg
            while (o < segEnd) {
              if (o + 17 > segEnd) return None
              val tc = (bts(o) & 0xff) >> 4
              val th = bts(o) & 0x0f
              if (tc > 1 || th > 3) return None
              val bitsArr = Array.tabulate(16)(k => bts(o + 1 + k) & 0xff)
              val nVals = bitsArr.sum
              if (nVals > 256 || o + 17 + nVals > segEnd) return None
              val valsArr = Array.tabulate(nVals)(k => bts(o + 17 + k) & 0xff)
              val t = new HuffTable(bitsArr, valsArr)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              o += 17 + nVals
            }
          case 0xdb => // DQT (possibly several tables; 8- or 16-bit)
            var o = seg
            while (o < segEnd) {
              val pq = (bts(o) & 0xff) >> 4
              val tq = bts(o) & 0x0f
              if (pq > 1 || tq > 3) return None
              val step = if (pq == 0) 1 else 2
              if (o + 1 + 64 * step > segEnd) return None
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tab(Zigzag(k)) =
                  if (pq == 0) bts(o + 1 + k) & 0xff
                  else be16(o + 1 + 2 * k)
                if (tab(Zigzag(k)) == 0) return None
                k += 1
              }
              quant(tq) = tab
              o += 1 + 64 * step
            }
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = be16(seg)
          case 0xda => // SOS
            if (comps == null || len < 6) return None
            val ns = bts(seg) & 0xff
            if (ns != comps.length || len != 6 + 2 * ns) return None
            var k = 0
            while (k < ns) {
              val cs = bts(seg + 1 + 2 * k) & 0xff
              val c = comps.find(_.id == cs).getOrElse(return None)
              c.dcTab = (bts(seg + 2 + 2 * k) & 0xff) >> 4
              c.acTab = bts(seg + 2 + 2 * k) & 0x0f
              k += 1
            }
            // Ss=0, Se=63, Ah/Al=0 for baseline
            if ((bts(seg + 1 + 2 * ns) & 0xff) != 0 ||
                (bts(seg + 2 + 2 * ns) & 0xff) != 63 ||
                (bts(seg + 3 + 2 * ns) & 0xff) != 0) return None
            sosAt = segEnd
          case 0xc2 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
               0xcb | 0xcd | 0xce | 0xcf =>
            return None // progressive/extended/arithmetic/hierarchical
          case mm if (mm >= 0xe0 && mm <= 0xef) || mm == 0xfe => // APPn/COM
          case _ => return None
        }
        if (sosAt < 0) i = i + 2 + len
      }
    }
    // ---- entropy-coded scan
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = hMax * 8
    val mcuH = vMax * 8
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    for (c <- comps) {
      if (quant(c.tq) == null || dcTabs(c.dcTab) == null ||
          acTabs(c.acTab) == null) return None
    }
    // per-component storage at its own resolution, MCU-padded
    val planes = comps.map(c =>
      new Array[Int](mcusX * c.h * 8 * mcusY * c.v * 8))
    val planeW = comps.map(c => mcusX * c.h * 8)
    val br = new BitReader(bts, sosAt)
    val predDc = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val nzU = new Array[Int](64)
    val nzV = new Array[Int](64)
    val nzF = new Array[Double](64)
    def decodeBlock(ci: Int, bx: Int, by: Int): Boolean = {
      val c = comps(ci)
      val dc = dcTabs(c.dcTab); val ac = acTabs(c.acTab)
      val q = quant(c.tq)
      def huff(t: HuffTable): Int = {
        var code = br.bit()
        var l = 1
        while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
          code = (code << 1) | br.bit()
          l += 1
        }
        if (l > 16 || br.broken) { br.broken = true; return -1 }
        t.value(l, code)
      }
      java.util.Arrays.fill(coef, 0)
      val dcCat = huff(dc)
      if (dcCat < 0 || dcCat > 11) return false
      val diff = extend(br.bits(dcCat), dcCat)
      predDc(ci) += diff
      coef(0) = predDc(ci) * q(0)
      var k = 1
      while (k < 64) {
        val rs = huff(ac)
        if (rs < 0) return false
        val run = rs >> 4
        val cat = rs & 0x0f
        if (cat == 0) {
          if (run == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += run
          if (k > 63) return false
          val z = Zigzag(k)
          coef(z) = extend(br.bits(cat), cat) * q(z)
          k += 1
        }
      }
      if (br.broken) return false
      // IDCT + level shift + clamp into the component plane. The nonzero
      // coefficients are gathered ONCE per block so the pixel loop pays
      // 64·nnz multiplies, not 64·64 zero-checks — real blocks quantize
      // most AC away (a DC-only block costs 64 multiplies total), and the
      // gather order (raster) is fixed, so summation stays deterministic.
      var nnz = 0
      var ci2 = 0
      while (ci2 < 64) {
        if (coef(ci2) != 0) {
          nzU(nnz) = ci2 % 8; nzV(nnz) = ci2 / 8
          nzF(nnz) = coef(ci2).toDouble
          nnz += 1
        }
        ci2 += 1
      }
      val pw = planeW(ci)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var t = 0
          while (t < nnz) {
            s += Ctab(nzU(t))(x) * Ctab(nzV(t))(y) * nzF(t)
            t += 1
          }
          planes(ci)((by * 8 + y) * pw + bx * 8 + x) =
            clamp255(math.floor(0.25 * s + 0.5).toInt + 128)
          x += 1
        }
        y += 1
      }
      true
    }
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(predDc, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            if (!decodeBlock(ci, mx * c.h + bx, my * c.v + by)) return None
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    br.align()
    // EOI must follow immediately; nothing after it
    if (br.pos + 2 != bts.length || (bts(br.pos) & 0xff) != 0xff ||
        (bts(br.pos + 1) & 0xff) != 0xd9) return None
    // ---- assemble RGB
    val rgb = new Array[Byte](w * h * 3)
    if (comps.length == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = planes(0)(y * pw + x).toByte
          val o = (y * w + x) * 3
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val cY = comps(0); val cCb = comps(1); val cCr = comps(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def sample(ci: Int, c: Component): Int =
            planes(ci)((y * c.v / vMax) * planeW(ci) + x * c.h / hMax)
          val yv = sample(0, cY).toDouble
          val cb = sample(1, cCb) - 128.0
          val cr = sample(2, cCr) - 128.0
          val o = (y * w + x) * 3
          rgb(o) = clamp255(math.floor(yv + 1.402 * cr + 0.5).toInt).toByte
          rgb(o + 1) = clamp255(math.floor(
            yv - 0.344136 * cb - 0.714136 * cr + 0.5).toInt).toByte
          rgb(o + 2) = clamp255(math.floor(yv + 1.772 * cb + 0.5).toInt).toByte
          x += 1
        }
        y += 1
      }
    }
    Some((w, h, comps.length, rgb))
  }
}
