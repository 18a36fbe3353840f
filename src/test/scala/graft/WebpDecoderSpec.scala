package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MultimodalOps, WebpDecoder}

/** Verifies the pure-JVM VP8L decoder against a TEST-SIDE MINIMAL
  * ENCODER (the GifDecoderSpec posture — the JDK ships no WebP codec,
  * so the reference is a from-the-spec encoder that can emit every
  * layout the decoder claims: simple and code-length-coded prefix
  * codes, LZ77 backreferences through the neighbor map, color-cache
  * hits, and the subtract-green transform). Every decoded mean is
  * checked EXACTLY against the source pixels (VP8L is lossless).
  * Plus the strictness contract: truncated payloads, unsupported
  * transforms, non-opaque alpha, lossy VP8, and version drift all
  * return None — the histogram tier, never garbage. */
class WebpDecoderSpec extends AnyFunSuite {

  // ---- LSB-first bit writer (the VP8L byte order) ----
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def bit(b: Int): Unit = {
      cur |= (b & 1) << nb; nb += 1
      if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { bit((v >> i) & 1); i += 1 }
    }
    /** prefix-code bits go most-significant-first (DEFLATE order). */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bit((c >> i) & 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      val out = buf.toArray
      if (nb > 0) out :+ cur.toByte else out
    }
  }

  /** canonical (length, symbol)-ordered code assignment — the same
    * convention the decoder builds. */
  private def canonical(lengths: Map[Int, Int]): Map[Int, Int] = {
    val maxLen = lengths.values.max
    val count = new Array[Int](maxLen + 1)
    lengths.values.foreach(l => count(l) += 1)
    var code = 0
    val next = new Array[Int](maxLen + 2)
    for (l <- 1 to maxLen) { code = (code + count(l - 1)) << 1; next(l) = code }
    lengths.toSeq.sortBy { case (s, l) => (l, s) }.map { case (s, l) =>
      val c = next(l); next(l) += 1; s -> c
    }.toMap
  }

  private def riff(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def tag(t: String): Unit = bos.write(t.getBytes("US-ASCII"))
    def u32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    val padded = payload.length + (payload.length & 1)
    tag("RIFF"); u32(4 + 8 + padded); tag("WEBP")
    tag("VP8L"); u32(payload.length); bos.write(payload)
    if ((payload.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  /** header + transform-free preamble shared by most fixtures. */
  private def preamble(bw: BitWriter, w: Int, h: Int,
      cacheBits: Int = 0, subtractGreen: Boolean = false): Unit = {
    bw.bits(w - 1, 14); bw.bits(h - 1, 14)
    bw.bit(0) // alpha hint
    bw.bits(0, 3) // version
    if (subtractGreen) { bw.bit(1); bw.bits(2, 2) } // transform: subtract-green
    bw.bit(0) // no more transforms
    if (cacheBits > 0) { bw.bit(1); bw.bits(cacheBits, 4) } else bw.bit(0)
    bw.bit(0) // no meta prefix
  }

  /** simple prefix code: 1 or 2 symbols (lengths {1} / {1,1}). */
  private def writeSimple(bw: BitWriter, symbols: Seq[Int]): Map[Int, Int] = {
    bw.bit(1)
    bw.bit(symbols.length - 1)
    val s0 = symbols.head
    if (s0 > 1) { bw.bit(1); bw.bits(s0, 8) } else { bw.bit(0); bw.bits(s0, 1) }
    if (symbols.length == 2) bw.bits(symbols(1), 8)
    if (symbols.length == 1) Map(s0 -> 0)
    else canonical(symbols.map(_ -> 1).toMap)
  }

  /** full code-length-coded prefix code for an alphabet where the used
    * symbols all take length 2 (≤4 of them) — exercises the canonical
    * path end to end: the code-length code covers {0, 2}, every
    * alphabet entry is spelled out one bit at a time. */
  private def writeCanonical(bw: BitWriter, alphabetSize: Int,
      symbols: Seq[Int]): Map[Int, Int] = {
    require(symbols.size == 4, "4 symbols at length 2 = a complete code")
    bw.bit(0) // not simple
    bw.bits(1, 4) // num_code_lengths = 5: covers order [17,18,0,1,2]
    Seq(0, 0, 1, 0, 1).foreach(l => bw.bits(l, 3)) // cl lengths for 17,18,0,1,2
    bw.bit(0) // no max_symbol cap: spell out the full alphabet
    val clCode = canonical(Map(0 -> 1, 2 -> 1)) // 0 -> code 0, 2 -> code 1
    val used = symbols.toSet
    (0 until alphabetSize).foreach { s =>
      val cl = if (used(s)) 2 else 0
      bw.code(clCode(cl), 1)
    }
    canonical(symbols.map(_ -> 2).toMap)
  }

  private def meansOf(pixels: Seq[(Int, Int, Int)]): (Double, Double, Double) = {
    val n = pixels.size.toDouble
    (pixels.map(_._1).sum / n, pixels.map(_._2).sum / n, pixels.map(_._3).sum / n)
  }

  // ---- uniform 8-bit code + ARGB stream writers (transform fixtures
  // carry arbitrary byte values, which simple/4-symbol codes cannot) --

  /** complete 8-bit code over symbols 0..255 (canonical code ==
    * symbol), via a single-symbol code-length code and, for alphabets
    * above 256, the max_symbol cap. */
  private def writeUniform8(bw: BitWriter, alphabetSize: Int): Unit = {
    bw.bit(0) // not simple
    bw.bits(8, 4) // num_code_lengths = 12: order through symbol "8"
    Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1).foreach(l => bw.bits(l, 3))
    if (alphabetSize > 256) { // spell exactly 256 lengths then stop
      bw.bit(1); bw.bits(3, 3); bw.bits(254, 8) // nbits = 8, max = 2 + 254
    } else bw.bit(0)
    // the single-symbol code-length code emits "8" in zero bits each
  }

  private def writeArgb(bw: BitWriter, p: Int): Unit = {
    bw.code((p >>> 8) & 0xff, 8) // green
    bw.code((p >>> 16) & 0xff, 8) // red
    bw.code(p & 0xff, 8) // blue
    bw.code((p >>> 24) & 0xff, 8) // alpha
  }

  /** entropy-coded SUB-image (no meta-prefix bit per the spec ABNF). */
  private def writeSubImage(bw: BitWriter, pixels: Seq[Int]): Unit = {
    bw.bit(0) // no color cache
    writeUniform8(bw, 256 + 24)
    writeUniform8(bw, 256); writeUniform8(bw, 256); writeUniform8(bw, 256)
    writeSimple(bw, Seq(0)) // distance code (unused)
    pixels.foreach(writeArgb(bw, _))
  }

  /** main (spatially coded) image body with uniform 8-bit codes. */
  private def writeMainPixels(bw: BitWriter, pixels: Seq[Int]): Unit = {
    bw.bit(0) // no color cache
    bw.bit(0) // no meta prefix
    writeUniform8(bw, 256 + 24)
    writeUniform8(bw, 256); writeUniform8(bw, 256); writeUniform8(bw, 256)
    writeSimple(bw, Seq(0))
    pixels.foreach(writeArgb(bw, _))
  }

  private def header(bw: BitWriter, w: Int, h: Int): Unit = {
    bw.bits(w - 1, 14); bw.bits(h - 1, 14)
    bw.bit(0); bw.bits(0, 3) // alpha hint, version
  }

  // ---- test-side FORWARD transforms (spec formulas, independent
  // coding; the decoder must invert them exactly) ----
  private def chn(p: Int, s: Int): Int = (p >>> s) & 0xff
  private def packArgb(a: Int, r: Int, g: Int, b: Int): Int =
    (a << 24) | (r << 16) | (g << 8) | b
  private def subPix(x: Int, y: Int): Int = packArgb(
    (chn(x, 24) - chn(y, 24)) & 0xff, (chn(x, 16) - chn(y, 16)) & 0xff,
    (chn(x, 8) - chn(y, 8)) & 0xff, (chn(x, 0) - chn(y, 0)) & 0xff)
  private def avg2(x: Int, y: Int): Int = packArgb(
    (chn(x, 24) + chn(y, 24)) >> 1, (chn(x, 16) + chn(y, 16)) >> 1,
    (chn(x, 8) + chn(y, 8)) >> 1, (chn(x, 0) + chn(y, 0)) >> 1)
  private def clamp(v: Int): Int = math.max(0, math.min(255, v))

  private def predictAt(pix: Array[Int], w: Int, x: Int, y: Int,
      mode: Int): Int = {
    val pos = y * w + x
    if (x == 0 && y == 0) 0xff000000
    else if (y == 0) pix(pos - 1)
    else if (x == 0) pix(pos - w)
    else {
      val l = pix(pos - 1); val t = pix(pos - w)
      val tl = pix(pos - w - 1); val tr = pix(pos - w + 1)
      def sel: Int = {
        var pl = 0; var pt = 0
        Seq(24, 16, 8, 0).foreach { s =>
          val p = chn(l, s) + chn(t, s) - chn(tl, s)
          pl += math.abs(p - chn(l, s)); pt += math.abs(p - chn(t, s))
        }
        if (pl < pt) l else t
      }
      mode match {
        case 0 => 0xff000000
        case 1 => l
        case 2 => t
        case 3 => tr
        case 4 => tl
        case 5 => avg2(avg2(l, tr), t)
        case 6 => avg2(l, tl)
        case 7 => avg2(l, t)
        case 8 => avg2(tl, t)
        case 9 => avg2(t, tr)
        case 10 => avg2(avg2(l, tl), avg2(t, tr))
        case 11 => sel
        case 12 => packArgb(
          clamp(chn(l, 24) + chn(t, 24) - chn(tl, 24)),
          clamp(chn(l, 16) + chn(t, 16) - chn(tl, 16)),
          clamp(chn(l, 8) + chn(t, 8) - chn(tl, 8)),
          clamp(chn(l, 0) + chn(t, 0) - chn(tl, 0)))
        case 13 =>
          val av = avg2(l, t)
          def c(a: Int, b: Int): Int = clamp(a + (a - b) / 2)
          packArgb(c(chn(av, 24), chn(tl, 24)), c(chn(av, 16), chn(tl, 16)),
            c(chn(av, 8), chn(tl, 8)), c(chn(av, 0), chn(tl, 0)))
      }
    }
  }

  private def predForward(pix: Array[Int], w: Int, h: Int, sizeBits: Int,
      sw: Int, modes: Array[Int]): Array[Int] =
    Array.tabulate(w * h) { pos =>
      val x = pos % w; val y = pos / w
      val mode = chn(modes((y >> sizeBits) * sw + (x >> sizeBits)), 8)
      subPix(pix(pos), predictAt(pix, w, x, y, mode))
    }

  private def ctd(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  private def colorForward(pix: Array[Int], w: Int, h: Int, sizeBits: Int,
      sw: Int, cte: Array[Int]): Array[Int] =
    Array.tabulate(w * h) { pos =>
      val x = pos % w; val y = pos / w
      val e = cte((y >> sizeBits) * sw + (x >> sizeBits))
      val p = pix(pos)
      val g = chn(p, 8)
      val r0 = chn(p, 16); val b0 = chn(p, 0)
      val r = (r0 - ctd(chn(e, 0), g)) & 0xff
      val b = (b0 - ctd(chn(e, 8), g) - ctd(chn(e, 16), r0)) & 0xff
      packArgb(chn(p, 24), r, g, b)
    }

  private def sgForward(pix: Array[Int]): Array[Int] =
    pix.map { p =>
      val g = chn(p, 8)
      packArgb(chn(p, 24), (chn(p, 16) - g) & 0xff, g, (chn(p, 0) - g) & 0xff)
    }

  private def meansOfArgb(pix: Array[Int]): MultimodalOps.DecodedImage = {
    val n = pix.length.toDouble
    MultimodalOps.DecodedImage(0, 0, pix.map(chn(_, 16)).sum / n,
      pix.map(chn(_, 8)).sum / n, pix.map(chn(_, 0)).sum / n)
  }

  test("predictor transform: all 14 modes roundtrip exactly") {
    val w = 16; val h = 16
    val sizeBits = 2; val sw = 4 // 4x4 blocks of 4px
    val rnd = new scala.util.Random(1311)
    val pix = Array.fill(w * h)(packArgb(255, rnd.nextInt(256),
      rnd.nextInt(256), rnd.nextInt(256)))
    val modes = Array.tabulate(16)(i => packArgb(255, 0, i % 14, 0))
    val res = predForward(pix, w, h, sizeBits, sw, modes)
    val bw = new BitWriter
    header(bw, w, h)
    bw.bit(1); bw.bits(0, 2) // transform: PREDICTOR
    bw.bits(sizeBits - 2, 3)
    writeSubImage(bw, modes.toSeq)
    bw.bit(0) // no more transforms
    writeMainPixels(bw, res.toSeq)
    val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
    assert(got.isDefined, "predictor stream must decode")
    val exp = meansOfArgb(pix)
    assert(got.get == exp.copy(width = w, height = h))
  }

  test("predictor arithmetic pinned by hand: truncating casHalf and the select tie") {
    // casHalf, mode 13 on a 2x2 single block: L=T=10, TL=13 per rgb
    // channel -> pred = 10 + (10-13)/2 = 9 under C-truncating division
    // (floor division would give 8 and shift the mean)
    def run(mode: Int, p00: Int, p10: Int, p01: Int): Double = {
      val w = 2; val h = 2
      val pix = Array(p00, p10, p01, 0 /* filled from pred */ )
      val pred = predictAt(pix, w, 1, 1, mode)
      pix(3) = pred // target = prediction, residual 0
      val res = predForward(pix, w, h, 1, 1,
        Array(packArgb(255, 0, mode, 0)))
      val bw = new BitWriter
      header(bw, w, h)
      bw.bit(1); bw.bits(0, 2); bw.bits(0, 3) // predictor, sizeBits=2... (block 4 covers 2x2)
      writeSubImage(bw, Seq(packArgb(255, 0, mode, 0)))
      bw.bit(0)
      writeMainPixels(bw, res.toSeq)
      val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
      assert(got.isDefined, s"mode-$mode stream must decode")
      got.get.meanR
    }
    val r13 = run(13, packArgb(255, 13, 13, 13), packArgb(255, 10, 10, 10),
      packArgb(255, 10, 10, 10))
    assert(r13 == (13 + 10 + 10 + 9) / 4.0, s"casHalf must truncate toward zero (got $r13)")
    // select tie: pl == pt == 10 exactly -> the 2021-amended rule picks T
    val r11 = run(11, packArgb(255, 5, 5, 0), packArgb(255, 0, 10, 0),
      packArgb(255, 10, 0, 0))
    assert(r11 == (5 + 0 + 10 + 0) / 4.0, s"select tie must resolve to T (got $r11)")
  }

  test("color (cross-color) transform inverts exactly, alone and with subtract-green") {
    val w = 8; val h = 4
    val sizeBits = 2; val sw = 2 // two 4px-wide blocks
    val rnd = new scala.util.Random(1312)
    val pix = Array.fill(w * h)(packArgb(255, rnd.nextInt(256),
      rnd.nextInt(256), rnd.nextInt(256)))
    // cte pixel layout: blue = green_to_red, green = green_to_blue,
    // red = red_to_blue (all signed int8)
    val cte = Array(packArgb(255, 5, 246, 16), packArgb(255, 255, 3, 200))
    val fwd = colorForward(pix, w, h, sizeBits, sw, cte)
    val bw = new BitWriter
    header(bw, w, h)
    bw.bit(1); bw.bits(1, 2) // transform: COLOR
    bw.bits(sizeBits - 2, 3)
    writeSubImage(bw, cte.toSeq)
    bw.bit(0)
    writeMainPixels(bw, fwd.toSeq)
    val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
    assert(got.isDefined, "color-transform stream must decode")
    assert(got.get == meansOfArgb(pix).copy(width = w, height = h))
    // read order [COLOR, SUBTRACT_GREEN]: forwards apply in read order,
    // the decoder must invert in REVERSE order
    val fwd2 = sgForward(colorForward(pix, w, h, sizeBits, sw, cte))
    val bw2 = new BitWriter
    header(bw2, w, h)
    bw2.bit(1); bw2.bits(1, 2); bw2.bits(sizeBits - 2, 3)
    writeSubImage(bw2, cte.toSeq)
    bw2.bit(1); bw2.bits(2, 2) // transform: SUBTRACT_GREEN
    bw2.bit(0)
    writeMainPixels(bw2, fwd2.toSeq)
    val got2 = WebpDecoder.decode(riff(0x2f.toByte +: bw2.toBytes))
    assert(got2.isDefined, "color+subtract-green stream must decode")
    assert(got2.get == meansOfArgb(pix).copy(width = w, height = h))
  }

  test("color-indexing transform: delta-coded palette, packed indices") {
    val w = 6; val h = 2 // tableSize 5 -> widthBits 1 -> packedW 3
    val colors = Array(packArgb(255, 10, 20, 30), packArgb(255, 200, 150, 5),
      packArgb(255, 0, 255, 128), packArgb(255, 77, 66, 55),
      packArgb(255, 1, 2, 3))
    val raw = colors.indices.map(i =>
      if (i == 0) colors(0) else subPix(colors(i), colors(i - 1)))
    val idx = Array(0, 4, 1, 1, 3, 2, 2, 0, 4, 3, 1, 0)
    // packed: 2 indices per green byte, low nibble first
    val packed = (0 until h).flatMap { y =>
      (0 until 3).map { px =>
        val lo = idx(y * w + 2 * px); val hi = idx(y * w + 2 * px + 1)
        packArgb(255, 0, lo | (hi << 4), 0)
      }
    }
    val bw = new BitWriter
    header(bw, w, h)
    bw.bit(1); bw.bits(3, 2) // transform: COLOR_INDEXING
    bw.bits(4, 8) // table size - 1
    writeSubImage(bw, raw)
    bw.bit(0)
    writeMainPixels(bw, packed)
    val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
    assert(got.isDefined, "palette stream must decode")
    val exp = meansOfArgb(idx.map(colors))
    assert(got.get == exp.copy(width = w, height = h))
  }

  test("color-indexing strictness: out-of-range index and combos return None") {
    // tableSize 3 -> widthBits 2 -> 2-bit indices, index 3 is out of range
    val colors = Array(packArgb(255, 1, 1, 1), packArgb(255, 2, 2, 2),
      packArgb(255, 3, 3, 3))
    val raw = colors.indices.map(i =>
      if (i == 0) colors(0) else subPix(colors(i), colors(i - 1)))
    val bw = new BitWriter
    header(bw, 4, 1) // packedW = 1
    bw.bit(1); bw.bits(3, 2); bw.bits(2, 8)
    writeSubImage(bw, raw)
    bw.bit(0)
    // packed byte carries indices (0,1,2,3): the 3 is malformed
    writeMainPixels(bw, Seq(packArgb(255, 0, 0 | (1 << 2) | (2 << 4) | (3 << 6), 0)))
    assert(WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes)).isEmpty,
      "out-of-range palette index must not decode")
  }

  test("color-indexing combined with subtract-green decodes (round 12)") {
    // read order [SG, PAL] -> inverses [PAL, SG]: unpack to the stored
    // palette colors, then the subtract-green inverse adds g to r and b
    val colors = Array(packArgb(255, 1, 1, 1), packArgb(255, 2, 2, 2),
      packArgb(255, 3, 3, 3))
    val raw = colors.indices.map(i =>
      if (i == 0) colors(0) else subPix(colors(i), colors(i - 1)))
    val bw = new BitWriter
    header(bw, 4, 1)
    bw.bit(1); bw.bits(2, 2) // subtract-green (read first, inverted last)
    bw.bit(1); bw.bits(3, 2); bw.bits(2, 8) // COLOR_INDEXING, tableSize 3
    writeSubImage(bw, raw)
    bw.bit(0)
    // indices (0, 1, 2, 0) packed into one green byte (widthBits 2)
    writeMainPixels(bw, Seq(packArgb(255, 0, 0 | (1 << 2) | (2 << 4) | (0 << 6), 0)))
    val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
    assert(got.isDefined, "palette + subtract-green is in the full-VP8L subset now")
    val sgInv = Array(0, 1, 2, 0).map(colors).map { p =>
      val g = chn(p, 8)
      packArgb(chn(p, 24), (chn(p, 16) + g) & 0xff, g, (chn(p, 0) + g) & 0xff)
    }
    assert(got.get == meansOfArgb(sgInv).copy(width = 4, height = 1))
  }

  test("color-indexing combined with predictor decodes at the packed width (round 12)") {
    // read order [PAL, PRED]: the predictor was read AFTER the palette,
    // so it applies to the PACKED image (width 3, the green bytes are
    // packed index pairs) and inverts FIRST; its block sub-image is
    // sized from the packed width.
    val w = 6; val h = 2
    val colors = Array(packArgb(255, 10, 20, 30), packArgb(255, 200, 150, 5),
      packArgb(255, 0, 255, 128), packArgb(255, 77, 66, 55),
      packArgb(255, 1, 2, 3))
    val raw = colors.indices.map(i =>
      if (i == 0) colors(0) else subPix(colors(i), colors(i - 1)))
    val idx = Array(0, 4, 1, 1, 3, 2, 2, 0, 4, 3, 1, 0)
    val packedW = 3 // tableSize 5 -> widthBits 1 -> 2 indices per byte
    val packed = (0 until h).flatMap { y =>
      (0 until packedW).map { px =>
        val lo = idx(y * w + 2 * px); val hi = idx(y * w + 2 * px + 1)
        packArgb(255, 0, lo | (hi << 4), 0)
      }
    }.toArray
    // predictor at packed width: one block (sizeBits 2 covers 3x2), mode 1 (L)
    val sizeBits = 2; val sw = (packedW + 3) >> 2
    val modes = Array(packArgb(255, 0, 1, 0))
    val residuals = predForward(packed, packedW, h, sizeBits, sw, modes)
    val bw = new BitWriter
    header(bw, w, h)
    bw.bit(1); bw.bits(3, 2); bw.bits(4, 8) // COLOR_INDEXING, tableSize 5
    writeSubImage(bw, raw)
    bw.bit(1); bw.bits(0, 2) // PREDICTOR (read second: packed width)
    bw.bits(sizeBits - 2, 3)
    writeSubImage(bw, modes)
    bw.bit(0)
    writeMainPixels(bw, residuals)
    val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
    assert(got.isDefined, "palette + predictor is in the full-VP8L subset now")
    assert(got.get == meansOfArgb(idx.map(colors)).copy(width = w, height = h))
  }

  test("meta-prefix entropy image: two prefix-code groups select per block (round 12)") {
    // 8x1 image, metaBits 2 -> two 4px blocks; the meta entropy image
    // maps block 0 -> group 0, block 1 -> group 1 via (red<<8)|green.
    // Each group is five single-symbol simple codes, so the groups'
    // literals differ with zero data bits — the decode is the group map.
    val bw = new BitWriter
    header(bw, 8, 1)
    bw.bit(0) // no transforms
    bw.bit(0) // no color cache
    bw.bit(1) // meta prefix present
    bw.bits(0, 3) // metaBits = 2 -> metaW = 2
    writeSubImage(bw, Seq(packArgb(255, 0, 0, 0), packArgb(255, 0, 1, 0)))
    // group 0: literal (r,g,b,a) = (6,5,7,255)
    writeSimple(bw, Seq(5)); writeSimple(bw, Seq(6)); writeSimple(bw, Seq(7))
    writeSimple(bw, Seq(255)); writeSimple(bw, Seq(0))
    // group 1: literal (10,9,11,255)
    writeSimple(bw, Seq(9)); writeSimple(bw, Seq(10)); writeSimple(bw, Seq(11))
    writeSimple(bw, Seq(255)); writeSimple(bw, Seq(0))
    // zero data bits: every pixel decodes from its block's group codes
    val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
    assert(got.isDefined, "meta-prefix stream must decode")
    assert(got.get == MultimodalOps.DecodedImage(8, 1, 8.0, 7.0, 9.0))
  }

  test("literal-only stream with simple prefix codes decodes exactly") {
    // 4x3 image: green in {10, 200}, red in {30, 40}, blue fixed 7
    val w = 4; val h = 3
    val pixels = (0 until w * h).map { i =>
      (if (i % 3 == 0) 30 else 40, if (i % 2 == 0) 10 else 200, 7)
    }
    val bw = new BitWriter
    preamble(bw, w, h)
    val gc = writeSimple(bw, Seq(10, 200))
    val rc = writeSimple(bw, Seq(30, 40))
    val bc = writeSimple(bw, Seq(7))
    val ac = writeSimple(bw, Seq(255))
    writeSimple(bw, Seq(0)) // distance code (unused)
    pixels.foreach { case (r, g, b) =>
      bw.code(gc(g), 1); bw.code(rc(r), 1)
      assert(bc(b) == 0 && ac(255) == 0) // single-symbol: zero bits
    }
    val bytes = riff(0x2f.toByte +: bw.toBytes)
    val got = WebpDecoder.decode(bytes)
    assert(got.isDefined, "simple-code stream must decode")
    val (mr, mg, mb) = meansOf(pixels)
    assert(got.get == MultimodalOps.DecodedImage(w, h, mr, mg, mb))
    // and the dispatch tier routes WebP bytes to this decoder
    assert(MultimodalOps.decodeImage(bytes).contains(got.get))
  }

  test("code-length-coded (canonical) green code decodes exactly") {
    val w = 8; val h = 2
    val greens = Seq(10, 20, 30, 40)
    val pixels = (0 until w * h).map(i => (55, greens(i % 4), 99))
    val bw = new BitWriter
    preamble(bw, w, h)
    val gc = writeCanonical(bw, 256 + 24, greens)
    val rc = writeSimple(bw, Seq(55))
    writeSimple(bw, Seq(99)); writeSimple(bw, Seq(255)); writeSimple(bw, Seq(0))
    pixels.foreach { case (_, g, _) => bw.code(gc(g), 2) }
    assert(rc(55) == 0)
    val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
    assert(got.isDefined, "canonical-code stream must decode")
    val (mr, mg, mb) = meansOf(pixels)
    assert(got.get == MultimodalOps.DecodedImage(w, h, mr, mg, mb))
  }

  test("LZ77 backreference through the neighbor map copies the previous pixel") {
    // 5x1: one literal + a length-4 backref at distance code 2 -> (1,0).
    // Length symbols live above 255, which a SIMPLE code's 8-bit
    // second symbol cannot express — the green code must go through
    // the canonical path (a real-encoder constraint, found the hard
    // way: bits(259, 8) silently writes symbol 3).
    val w = 5; val h = 1
    val bw = new BitWriter
    preamble(bw, w, h)
    val gc = writeCanonical(bw, 256 + 24, Seq(100, 256 + 3, 0, 1))
    writeSimple(bw, Seq(60)); writeSimple(bw, Seq(70)); writeSimple(bw, Seq(255))
    val dc = writeSimple(bw, Seq(1)) // distance prefix 1 -> code 2 -> neighbor (1,0)
    bw.code(gc(100), 2) // literal pixel (r/b/a single-symbol: 0 bits)
    bw.code(gc(256 + 3), 2) // backref: length 4, distance from the single-symbol code
    assert(dc(1) == 0)
    val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
    assert(got.isDefined, "LZ77 stream must decode")
    assert(got.get == MultimodalOps.DecodedImage(w, h, 60.0, 100.0, 70.0))
  }

  test("color-cache hit replays an inserted pixel") {
    val w = 2; val h = 1
    val cacheBits = 4
    val argb = (255 << 24) | (33 << 16) | (110 << 8) | 44
    val idx = (0x1e35a7bd * argb) >>> (32 - cacheBits)
    val bw = new BitWriter
    preamble(bw, w, h, cacheBits = cacheBits)
    // cache symbols live above 279: canonical path required (as above)
    val gc = writeCanonical(bw, 256 + 24 + (1 << cacheBits),
      Seq(110, 256 + 24 + idx, 0, 1))
    writeSimple(bw, Seq(33)); writeSimple(bw, Seq(44)); writeSimple(bw, Seq(255))
    writeSimple(bw, Seq(0))
    bw.code(gc(110), 2) // literal: inserted into the cache
    bw.code(gc(256 + 24 + idx), 2) // cache hit of the same pixel
    val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
    assert(got.isDefined, "color-cache stream must decode")
    assert(got.get == MultimodalOps.DecodedImage(w, h, 33.0, 110.0, 44.0))
  }

  test("subtract-green transform inverts exactly") {
    val w = 3; val h = 1
    val truePixels = Seq((120, 100, 90), (120, 200, 90), (120, 100, 90))
    val bw = new BitWriter
    preamble(bw, w, h, subtractGreen = true)
    // channels stored minus green, mod 256
    val gs = truePixels.map(_._2).distinct
    val rs = truePixels.map(p => (p._1 - p._2) & 0xff).distinct
    val bs = truePixels.map(p => (p._3 - p._2) & 0xff).distinct
    val gc = writeSimple(bw, gs)
    val rc = writeSimple(bw, rs)
    val bc = writeSimple(bw, bs)
    writeSimple(bw, Seq(255)); writeSimple(bw, Seq(0))
    truePixels.foreach { case (r, g, b) =>
      bw.code(gc(g), if (gs.size == 2) 1 else 0)
      bw.code(rc((r - g) & 0xff), if (rs.size == 2) 1 else 0)
      bw.code(bc((b - g) & 0xff), if (bs.size == 2) 1 else 0)
    }
    val got = WebpDecoder.decode(riff(0x2f.toByte +: bw.toBytes))
    assert(got.isDefined, "subtract-green stream must decode")
    val (mr, mg, mb) = meansOf(truePixels)
    assert(got.get == MultimodalOps.DecodedImage(w, h, mr, mg, mb))
  }

  test("strictness: unsupported layouts and malformed payloads return None") {
    // a valid baseline to mutate
    val bw = new BitWriter
    preamble(bw, 2, 1)
    val gc = writeSimple(bw, Seq(5))
    writeSimple(bw, Seq(6)); writeSimple(bw, Seq(7)); writeSimple(bw, Seq(255))
    writeSimple(bw, Seq(0))
    assert(gc(5) == 0)
    val good = riff(0x2f.toByte +: bw.toBytes)
    assert(WebpDecoder.decode(good).isDefined)
    // truncated: cut mid-bitstream
    assert(WebpDecoder.decode(good.dropRight(3)).isEmpty)
    // predictor transform: outside the subset
    val bwT = new BitWriter
    bwT.bits(1, 14); bwT.bits(0, 14); bwT.bit(0); bwT.bits(0, 3)
    bwT.bit(1); bwT.bits(0, 2) // transform type 0 = predictor
    assert(WebpDecoder.decode(riff(0x2f.toByte +: bwT.toBytes)).isEmpty)
    // version != 0
    val bwV = new BitWriter
    bwV.bits(1, 14); bwV.bits(0, 14); bwV.bit(0); bwV.bits(1, 3)
    assert(WebpDecoder.decode(riff(0x2f.toByte +: bwV.toBytes)).isEmpty)
    // non-opaque alpha falls to the histogram tier
    val bwA = new BitWriter
    preamble(bwA, 1, 1)
    writeSimple(bwA, Seq(5)); writeSimple(bwA, Seq(6)); writeSimple(bwA, Seq(7))
    writeSimple(bwA, Seq(128)) // alpha 128
    writeSimple(bwA, Seq(0))
    assert(WebpDecoder.decode(riff(0x2f.toByte +: bwA.toBytes)).isEmpty)
    // lossy VP8 chunk: recognized container, not this codec
    val lossy = good.clone()
    System.arraycopy("VP8 ".getBytes("US-ASCII"), 0, lossy, 12, 4)
    assert(WebpDecoder.decode(lossy).isEmpty)
    // coincidental magic: RIFF/WEBP but garbage payload
    val garbage = riff(Array.fill[Byte](10)(0x55))
    assert(WebpDecoder.decode(garbage).isEmpty)
    // color-cache flag set with cache_bits = 0: spec requires 1..11
    // when the flag is 1, so this is malformed, not "no cache"
    val bwC = new BitWriter
    bwC.bits(1, 14); bwC.bits(0, 14); bwC.bit(0); bwC.bits(0, 3)
    bwC.bit(0) // no transforms
    bwC.bit(1); bwC.bits(0, 4) // flag set, cache_bits = 0
    bwC.bit(0) // no meta prefix
    writeSimple(bwC, Seq(5)); writeSimple(bwC, Seq(6)); writeSimple(bwC, Seq(7))
    writeSimple(bwC, Seq(255)); writeSimple(bwC, Seq(0))
    assert(WebpDecoder.decode(riff(0x2f.toByte +: bwC.toBytes)).isEmpty)
  }
}
