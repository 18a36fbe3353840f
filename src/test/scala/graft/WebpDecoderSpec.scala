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
  }
}
