package graft.operators

/** GIF87a/89a — encoder and decoder, pure JVM, zero new dependencies: with
  * JPEG and PNG shipped, GIF is the last of the three image containers a
  * real crawl corpus holds in volume (and the only palette-indexed one —
  * its decode path exercises color-table lookup and LZW, which nothing in
  * the PNG/JPEG chains covers).
  *
  * Everything here follows the PUBLIC spec (GIF89a Programming Reference,
  * CompuServe 1990; GIF LZW is the classic variable-width LZW):
  *  - header + logical screen descriptor + global color table;
  *  - block walk: extensions (0x21 — graphic control, comment, plain
  *    text, application, all sub-block framed) skipped or parsed, image
  *    descriptors (0x2C) decoded, trailer (0x3B) required;
  *  - per-image: optional LOCAL color table (overrides global),
  *    INTERLACE (the four-pass 8/8-8/4-4/2-1 row order) undone,
  *    LZW-compressed index stream inflated through the sub-block chain;
  *  - LZW: variable code width starting at minCodeSize+1, LSB-first bit
  *    packing, CLEAR/EOI codes, the `code == next` one-ahead case
  *    (cScSc), width growth at table sizes 2^w, 4096-entry cap with
  *    explicit CLEAR reset;
  *  - 89a graphic control: per-frame delay, TRANSPARENT index (skipped at
  *    composite time), disposal methods 0/1 (leave), 2 (restore to
  *    background), 3 (restore to previous) for multi-frame streams.
  *
  * STRICTNESS follows the [[Multimodal.pngDecode]] convention: bad magic,
  * nonsense dimensions, an index outside the active color table, LZW
  * codes beyond the table, a stream that ends before the frame's pixel
  * count, a missing trailer, or trailing bytes after the trailer all
  * decode to None. The ENCODER (like [[Jpeg.encode]]) exists to build
  * honest corpora — the decoder never assumes its output shape; GIF is
  * LOSSLESS, so gates pin decodes bit-for-bit against analytic oracles
  * that mirror the pixel construction (the PNG-gate convention).
  *
  * Reference surface: /root/reference serves static app imagery
  * (webui/static); a corpus engine meets GIF in the wild, not there.
  */
object Gif {

  private val MaxCodeBits = 12
  private val MaxCodes = 1 << MaxCodeBits // 4096

  // ---------------------------------------------------------------- LZW --

  /** GIF LZW compression of an index stream (values < 2^minCodeSize).
    * Emits CLEAR first, resets the table with an explicit CLEAR when the
    * 4096-entry cap is hit, ends with EOI. Code width: the bump is a
    * POST-EMIT check against the next free code (the giflib discipline) —
    * the decoder's add after reading code C_i leaves its table exactly
    * where the encoder's stood when C_i was written, so checking `next >=
    * 2^w` after each write keeps every later code (including EOI, where
    * the decoder has CAUGHT UP because the final data code has no add)
    * read at the width it was written (pinned by the hand-assembled
    * stream and the multi-reset round trip in GifSpec). */
  private[operators] def lzwEncode(minCodeSize: Int,
                                   data: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCodeSize + 1
    // (prefix code << 8 | next byte) -> code; cleared on table reset
    var table = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
      if (next >= (1 << codeSize) && codeSize < MaxCodeBits) codeSize += 1
    }
    emit(clear)
    if (data.isEmpty) { emit(eoi); if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
      return out.toByteArray }
    var cur = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val k = data(i) & 0xff
      val key: Integer = (cur << 8) | k
      val hit = table.get(key)
      if (hit != null) cur = hit
      else {
        emit(cur)
        if (next < MaxCodes) {
          table.put(key, next)
          next += 1
        } else {
          emit(clear)
          table = new java.util.HashMap[Integer, Integer]()
          next = eoi + 1
          codeSize = minCodeSize + 1
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF LZW decompression: `packed` is the reassembled sub-block payload,
    * `nPixels` the frame's exact index count. STRICT: a code beyond the
    * table's one-ahead frontier, a first-after-clear code that isn't a
    * literal, output past nPixels, or a stream that ends (bits or EOI)
    * before nPixels indices have been produced all return null. */
  private[operators] def lzwDecode(minCodeSize: Int, packed: Array[Byte],
                                   nPixels: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val outArr = new Array[Byte](nPixels)
    var outLen = 0
    // table as (prefix, suffix) pairs; codes < clear are literals
    val prefix = new Array[Int](MaxCodes)
    val suffix = new Array[Byte](MaxCodes)
    var next = eoi + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    val stack = new Array[Byte](MaxCodes + 1)
    def expand(code: Int): Int = { // push string(code) reversed; return first byte
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c
      // literal byte, then the stacked suffixes in reverse
      if (outLen + 1 + sp > nPixels) return -1
      outArr(outLen) = c.toByte; outLen += 1
      while (sp > 0) { sp -= 1; outArr(outLen) = stack(sp); outLen += 1 }
      first
    }
    while (true) {
      while (bitCnt < codeSize) {
        if (pos >= packed.length) return null // bits ran out before EOI
        bitBuf |= (packed(pos) & 0xffL) << bitCnt
        bitCnt += 8
        pos += 1
      }
      val code = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize
      bitCnt -= codeSize
      if (code == clear) {
        next = eoi + 1
        codeSize = minCodeSize + 1
        prev = -1
      } else if (code == eoi) {
        return if (outLen == nPixels) outArr else null
      } else if (prev == -1) {
        if (code >= clear) return null // first code must be a literal
        if (outLen >= nPixels) return null
        outArr(outLen) = code.toByte; outLen += 1
        prev = code
      } else {
        if (code < next && code != eoi && code != clear) {
          if (expand(code) < 0) return null
        } else if (code == next && next < MaxCodes) {
          // the one-ahead cScSc case: string(prev) + first(prev)
          var firstOfPrev = prev
          while (firstOfPrev >= clear) firstOfPrev = prefix(firstOfPrev)
          prefix(next) = prev; suffix(next) = firstOfPrev.toByte
          if (expand(code) < 0) return null
          // entry was provisionally written above; the commit below
          // re-derives the same pair
        } else return null
        if (next < MaxCodes) {
          prefix(next) = prev
          suffix(next) = {
            var f = code
            while (f >= clear) f = prefix(f)
            f.toByte
          }
          next += 1
          if (next == (1 << codeSize) && codeSize < MaxCodeBits)
            codeSize += 1
        }
        prev = code
      }
    }
    null // unreachable
  }

  // ------------------------------------------------------------- writer --

  private def le16(v: Int, out: java.io.ByteArrayOutputStream): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def subBlocks(data: Array[Byte],
                        out: java.io.ByteArrayOutputStream): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
    out.write(0) // block terminator
  }

  /** A single frame for [[encodeFrames]]: palette indices (row-major,
    * w*h bytes), drawn at (left, top) with the given disposal method and
    * optional transparent index. */
  case class Frame(indices: Array[Byte], left: Int, top: Int,
                   w: Int, h: Int, disposal: Int = 0,
                   transparentIdx: Int = -1, delayCs: Int = 4)

  /** Minimal single-image GIF89a writer: logical screen = the image,
    * global 2^bpp-entry color table (`palette` is 3·2^bpp RGB bytes), one
    * graphic control extension (exercises the decoder's extension walk),
    * one image descriptor. `interlaced` writes the four-pass row order
    * with the flag set. */
  def encode(indices: Array[Byte], w: Int, h: Int, palette: Array[Byte],
             interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && indices.length == w * h,
      s"need $w*$h indices, got ${indices.length}")
    val nColors = palette.length / 3
    require(nColors > 1 && (nColors & (nColors - 1)) == 0 &&
      nColors <= 256 && palette.length == nColors * 3,
      s"palette must be 3*2^k bytes (k in 1..8), got ${palette.length}")
    val bpp = 31 - Integer.numberOfLeadingZeros(nColors) // log2
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w, out); le16(h, out)
    out.write(0x80 | ((bpp - 1) << 4) | (bpp - 1)) // GCT flag, res, size
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    out.write(palette, 0, palette.length)
    // graphic control extension (89a) — no transparency, zero delay
    out.write(0x21); out.write(0xf9); out.write(4)
    out.write(0); le16(0, out); out.write(0); out.write(0)
    // image descriptor
    out.write(0x2c)
    le16(0, out); le16(0, out); le16(w, out); le16(h, out)
    out.write(if (interlaced) 0x40 else 0x00)
    val stream =
      if (!interlaced) indices
      else { // write rows in interlace pass order
        val re = new Array[Byte](indices.length)
        var o = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
             y <- start until h by step) {
          System.arraycopy(indices, y * w, re, o, w)
          o += w
        }
        re
      }
    val minCodeSize = math.max(2, bpp) // spec: at least 2
    out.write(minCodeSize)
    subBlocks(lzwEncode(minCodeSize, stream), out)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Multi-frame (animated) GIF89a writer: NETSCAPE2.0 looping
    * application extension, then per frame a graphic control extension
    * (disposal, delay, transparency) + image descriptor. The logical
    * screen is (screenW, screenH); frames may be sub-rectangles. */
  def encodeFrames(frames: Seq[Frame], screenW: Int, screenH: Int,
                   palette: Array[Byte], background: Int = 0): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val nColors = palette.length / 3
    require(nColors > 1 && (nColors & (nColors - 1)) == 0 && nColors <= 256,
      s"palette must be 3*2^k bytes, got ${palette.length}")
    val bpp = 31 - Integer.numberOfLeadingZeros(nColors)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(screenW, out); le16(screenH, out)
    out.write(0x80 | ((bpp - 1) << 4) | (bpp - 1))
    out.write(background)
    out.write(0)
    out.write(palette, 0, palette.length)
    // NETSCAPE2.0 loop-forever application extension
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); le16(0, out); out.write(0)
    for (f <- frames) {
      require(f.indices.length == f.w * f.h, "frame size mismatch")
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((f.disposal & 7) << 2 | (if (f.transparentIdx >= 0) 1 else 0))
      le16(f.delayCs, out)
      out.write(if (f.transparentIdx >= 0) f.transparentIdx else 0)
      out.write(0)
      out.write(0x2c)
      le16(f.left, out); le16(f.top, out); le16(f.w, out); le16(f.h, out)
      out.write(0x00)
      val minCodeSize = math.max(2, bpp)
      out.write(minCodeSize)
      subBlocks(lzwEncode(minCodeSize, f.indices), out)
    }
    out.write(0x3b)
    out.toByteArray
  }

  // ------------------------------------------------------------- reader --

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def remaining: Int = b.length - pos
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def le16(): Int = { val v = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)
      pos += 2; v }
    def take(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; a }
    def skip(n: Int): Unit = pos += n
  }

  /** One decoded frame: full-canvas RGB plane AFTER compositing (the
    * frame drawn over the prior canvas per its predecessor's disposal),
    * plus the frame's own descriptor fields. */
  case class DecodedFrame(index: Int, left: Int, top: Int, w: Int, h: Int,
                          delayCs: Int, canvas: Array[Byte])

  /** Decode every frame of a GIF87a/89a stream: (screenW, screenH,
    * frames), each frame's `canvas` the composited screenW*screenH*3 RGB
    * plane. None on any malformation (strictness header above). */
  def decodeFrames(b: Array[Byte]): Option[(Int, Int, Seq[DecodedFrame])] = {
    if (b == null || b.length < 13) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    val r = new Reader(b)
    r.skip(6)
    try {
      val sw = r.le16(); val sh = r.le16()
      if (sw <= 0 || sh <= 0 || sw.toLong * sh > (1L << 26)) return None
      val packed = r.u8()
      val bgIndex = r.u8()
      r.skip(1) // aspect ratio
      // a truncated global table is a malformation NOW, not later: take()
      // on a short buffer would zero-pad (copyOfRange semantics) and read
      // silently-black entries — check remaining first, like the LCT path
      if ((packed & 0x80) != 0 && r.remaining < 3 * (2 << (packed & 7)))
        return None
      val gct: Array[Byte] =
        if ((packed & 0x80) != 0) r.take(3 * (2 << (packed & 7))) else null
      val canvas = new Array[Byte](sw * sh * 3)
      // pre-fill with the background color when a global table names it
      if (gct != null && bgIndex * 3 + 2 < gct.length) {
        var p = 0
        while (p < sw * sh) {
          canvas(p * 3) = gct(bgIndex * 3)
          canvas(p * 3 + 1) = gct(bgIndex * 3 + 1)
          canvas(p * 3 + 2) = gct(bgIndex * 3 + 2)
          p += 1
        }
      }
      val bg = java.util.Arrays.copyOf(canvas, canvas.length)
      val frames = scala.collection.mutable.ArrayBuffer.empty[DecodedFrame]
      var transparentIdx = -1
      var disposal = 0
      var delayCs = 0
      var sawTrailer = false
      while (!sawTrailer) {
        if (r.remaining < 1) return None
        r.u8() match {
          case 0x3b => sawTrailer = true
          case 0x21 => // extension: label + sub-blocks
            if (r.remaining < 1) return None
            val label = r.u8()
            if (label == 0xf9) { // graphic control
              if (r.remaining < 6) return None
              val sz = r.u8(); if (sz != 4) return None
              val flags = r.u8()
              delayCs = r.le16()
              val tIdx = r.u8()
              transparentIdx = if ((flags & 1) != 0) tIdx else -1
              disposal = (flags >> 2) & 7
              if (r.u8() != 0) return None // terminator
            } else { // comment / plain text / application: skip sub-blocks
              var n = if (r.remaining < 1) return None else r.u8()
              while (n != 0) {
                if (r.remaining < n + 1) return None
                r.skip(n)
                n = r.u8()
              }
            }
          case 0x2c => // image descriptor
            if (r.remaining < 9) return None
            val left = r.le16(); val top = r.le16()
            val fw = r.le16(); val fh = r.le16()
            val fpk = r.u8()
            if (fw <= 0 || fh <= 0 || left + fw > sw || top + fh > sh)
              return None
            val lct: Array[Byte] =
              if ((fpk & 0x80) != 0) {
                val n = 3 * (2 << (fpk & 7))
                if (r.remaining < n) return None
                r.take(n)
              } else null
            val table = if (lct != null) lct else gct
            if (table == null) return None
            val interlaced = (fpk & 0x40) != 0
            if (r.remaining < 1) return None
            val minCodeSize = r.u8()
            if (minCodeSize < 2 || minCodeSize > 11) return None
            // reassemble the sub-block chain
            val blocks = new java.io.ByteArrayOutputStream()
            var n = if (r.remaining < 1) return None else r.u8()
            while (n != 0) {
              if (r.remaining < n + 1) return None
              blocks.write(b, r.pos, n)
              r.skip(n)
              n = r.u8()
            }
            val idx = lzwDecode(minCodeSize, blocks.toByteArray, fw * fh)
            if (idx == null) return None
            val rows: Int => Int =
              if (!interlaced) identity
              else { // stream row s lands at canvas row order(s)
                val order = new Array[Int](fh)
                var o = 0
                for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                     y <- start until fh by step) { order(o) = y; o += 1 }
                order(_)
              }
            // snapshot for disposal 3 (restore to previous)
            val before =
              if (disposal == 3)
                java.util.Arrays.copyOf(canvas, canvas.length)
              else null
            var sy = 0
            while (sy < fh) {
              val cy = top + rows(sy)
              var x = 0
              while (x < fw) {
                val ci = idx(sy * fw + x) & 0xff
                if (ci != transparentIdx) {
                  if (ci * 3 + 2 >= table.length) return None
                  val o = (cy * sw + left + x) * 3
                  canvas(o) = table(ci * 3)
                  canvas(o + 1) = table(ci * 3 + 1)
                  canvas(o + 2) = table(ci * 3 + 2)
                }
                x += 1
              }
              sy += 1
            }
            frames += DecodedFrame(frames.length, left, top, fw, fh,
              delayCs, java.util.Arrays.copyOf(canvas, canvas.length))
            // dispose for the NEXT frame
            disposal match {
              case 2 => // restore frame rect to background
                var y = 0
                while (y < fh) {
                  val o = ((top + y) * sw + left) * 3
                  System.arraycopy(bg, o, canvas, o, fw * 3)
                  y += 1
                }
              case 3 if before != null =>
                System.arraycopy(before, 0, canvas, 0, canvas.length)
              case _ => ()
            }
            transparentIdx = -1; disposal = 0; delayCs = 0
          case _ => return None // unknown block type
        }
      }
      if (r.remaining != 0) return None // trailing bytes: strict
      if (frames.isEmpty) return None
      Some((sw, sh, frames.toSeq))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** First-frame decode under the [[Jpeg.decode]] contract:
    * (width, height, channels=3, row-major RGB of the LOGICAL SCREEN with
    * frame 1 composited). */
  def decode(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    decodeFrames(b).map { case (sw, sh, frames) =>
      (sw, sh, 3, frames.head.canvas)
    }
}
