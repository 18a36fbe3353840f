package graft.ops

/** Pure-JVM WebP LOSSLESS (VP8L) decoder for the multimodal decode
  * tier — the last web-common image format after PPM/BMP/PNG/
  * JPEG(baseline+progressive)/GIF. VP8L is a self-contained bitstream
  * (no loop filter, no DCT): an LSB-first bit reader over the RIFF
  * payload, canonical prefix codes (simple 1–2-symbol and full
  * code-length-coded forms), LZ77 backreferences with the 120-entry
  * 2-D neighbor map, a hash-addressed color cache, and the
  * subtract-green inverse transform.
  *
  * Supported subset (the honest claim for a from-scratch parser, the
  * GifDecoder posture): single-group streams (no meta-prefix image),
  * the SUBTRACT_GREEN transform (its inverse is exact and local);
  * streams using the PREDICTOR / COLOR / COLOR_INDEXING transforms
  * decode their transform headers structurally and return None — a
  * wrong inverse would produce garbage features, and the histogram
  * tier is the contract for payloads outside the subset. Any
  * truncated, malformed, version≠0, or non-opaque-alpha payload
  * returns None (a mean over transparent pixels is not a mean — the
  * GIF transparency rule).
  *
  * Format facts used here are from the public "WebP Lossless
  * Bitstream Specification": prefix codes are canonical with code
  * bits read most-significant-first (the DEFLATE convention) while
  * the byte stream is consumed least-significant-bit-first; the
  * green/length/cache alphabet is 256 + 24 + cache_size; distance
  * symbols 1..120 map through the scan-order neighbor table, >120 are
  * direct distances minus 120. */
object WebpDecoder {

  def decode(p: Array[Byte],
      grid: Array[Long] = null): Option[MultimodalOps.DecodedImage] =
    try decodeImpl(p, grid)
    catch {
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** LSB-first bit reader (the VP8L byte order). */
  private final class BitReader(p: Array[Byte], start: Int, end: Int) {
    private var bytePos = start
    private var bitPos = 0
    var truncated = false
    def bit(): Int = {
      if (bytePos >= end) { truncated = true; return 0 }
      val b = (p(bytePos) >> bitPos) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  /** Canonical prefix code as a flat tree walked bit-by-bit: codes are
    * assigned in (length, symbol) order per DEFLATE and read from the
    * most significant code bit. A single-symbol code reads zero bits. */
  private final class PrefixCode(lengths: Array[Int]) {
    // tree as arrays: node -> (left, right); leaves hold symbol | 0x40000000
    private val left = scala.collection.mutable.ArrayBuffer[Int](-1)
    private val right = scala.collection.mutable.ArrayBuffer[Int](-1)
    private var single = -1
    val valid: Boolean = build()

    private def build(): Boolean = {
      val syms = lengths.indices.filter(lengths(_) > 0)
      if (syms.isEmpty) return false
      if (syms.length == 1) { single = syms.head; return true }
      // canonical code assignment: count lengths, first code per length
      val maxLen = syms.map(lengths(_)).max
      if (maxLen > 15) return false
      val count = new Array[Int](maxLen + 1)
      syms.foreach(s => count(lengths(s)) += 1)
      var code = 0
      val next = new Array[Int](maxLen + 2)
      var l = 1
      while (l <= maxLen) {
        code = (code + count(l - 1)) << 1
        next(l) = code
        l += 1
      }
      // over-subscribed or incomplete codes are malformed
      var kraft = 0L
      syms.foreach(s => kraft += (1L << (maxLen - lengths(s))))
      if (kraft != (1L << maxLen)) return false
      syms.sorted.foreach { s =>
        val len = lengths(s)
        val c = next(len); next(len) += 1
        var node = 0
        var i = len - 1
        while (i >= 0) {
          val b = (c >> i) & 1
          val child = if (b == 0) left(node) else right(node)
          val nxt =
            if (child == -1) {
              left += -1; right += -1
              val n = left.size - 1
              if (b == 0) left(node) = n else right(node) = n
              n
            } else child
          if (i == 0) {
            if (b == 0) left(node) = 0x40000000 | s else right(node) = 0x40000000 | s
          } else node = nxt
          i -= 1
        }
      }
      true
    }

    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var node = 0
      while (true) {
        val child = if (br.bit() == 0) left(node) else right(node)
        if (child == -1) return -1
        if ((child & 0x40000000) != 0) return child & 0x3fffffff
        node = child
      }
      -1
    }
  }

  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Distance codes 1..120 → (xoffset, yoffset) scan-order neighbors,
    * as listed in the lossless bitstream spec. */
  private val NeighborMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))
  require(NeighborMap.length == 120)

  private def decodeImpl(p: Array[Byte],
      grid: Array[Long]): Option[MultimodalOps.DecodedImage] = {
    // ---- RIFF container walk ----
    if (p.length < 20) return None
    def tag(off: Int): String =
      new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long = (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    if (tag(0) != "RIFF" || tag(8) != "WEBP") return None
    val riffSize = u32(4)
    if (riffSize + 8 > p.length) return None // truncated container
    // walk chunks to the VP8L payload (honest walk: a VP8X/EXIF-led
    // file still finds its lossless chunk; VP8 (lossy) returns None)
    var off = 12
    var payloadStart = -1
    var payloadEnd = -1
    while (off + 8 <= riffSize + 8 && payloadStart < 0) {
      val t = tag(off)
      val sz = u32(off + 4)
      if (off + 8 + sz > p.length) return None
      if (t == "VP8L") { payloadStart = off + 8; payloadEnd = (off + 8 + sz).toInt }
      off += (8 + sz + (sz & 1)).toInt // chunks pad to even sizes
    }
    if (payloadStart < 0) return None

    // ---- VP8L header ----
    if (p(payloadStart) != 0x2f.toByte) return None
    val br = new BitReader(p, payloadStart + 1, payloadEnd)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bits(1) // alpha-is-used hint (informative only)
    if (br.bits(3) != 0) return None // version must be 0
    if (w.toLong * h > (1L << 24)) return None // fixture-scale sanity bound

    // ---- transforms (level-0 stream) ----
    var subtractGreen = false
    var seenTransforms = 0
    while (br.bit() == 1) {
      val ttype = br.bits(2)
      if ((seenTransforms & (1 << ttype)) != 0) return None // each at most once
      seenTransforms |= 1 << ttype
      ttype match {
        case 2 => subtractGreen = true
        case _ => return None // predictor/color/color-indexing: outside the subset
      }
    }

    // ---- color cache ----
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    if (cacheBits > 11) return None
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null

    // ---- meta prefix (single group only) ----
    if (br.bit() == 1) return None // entropy image: outside the subset

    // ---- the 5 prefix codes ----
    def readCode(alphabetSize: Int): PrefixCode = {
      val lengths = new Array[Int](alphabetSize)
      if (br.bit() == 1) { // simple code: 1 or 2 symbols
        val numSymbols = br.bit() + 1
        val firstIs8 = br.bit()
        val s0 = br.bits(if (firstIs8 == 1) 8 else 1)
        if (s0 >= alphabetSize) return new PrefixCode(new Array[Int](0))
        if (numSymbols == 2) {
          val s1 = br.bits(8)
          if (s1 >= alphabetSize || s1 == s0) return new PrefixCode(new Array[Int](0))
          lengths(s0) = 1; lengths(s1) = 1
        } else lengths(s0) = 1 // single symbol: read() returns it, 0 bits
      } else {
        val numCodeLengths = 4 + br.bits(4)
        val clLengths = new Array[Int](19)
        var i = 0
        while (i < numCodeLengths) {
          clLengths(CodeLengthOrder(i)) = br.bits(3); i += 1
        }
        val clCode = new PrefixCode(clLengths)
        if (!clCode.valid) return new PrefixCode(new Array[Int](0))
        var maxSymbol =
          if (br.bit() == 1) {
            val nbits = 2 + 2 * br.bits(3)
            2 + br.bits(nbits)
          } else alphabetSize
        var sym = 0
        var prevLen = 8
        while (sym < alphabetSize && maxSymbol > 0) {
          maxSymbol -= 1
          val cl = clCode.read(br)
          if (cl < 0 || br.truncated) return new PrefixCode(new Array[Int](0))
          cl match {
            case c if c < 16 =>
              lengths(sym) = c; sym += 1
              if (c != 0) prevLen = c
            case 16 =>
              val n = 3 + br.bits(2)
              // a repeat that would run past the alphabet end is a
              // bitstream error, same as the 17/18 overshoot below
              if (sym + n > alphabetSize) return new PrefixCode(new Array[Int](0))
              var j = 0
              while (j < n) {
                lengths(sym) = prevLen; sym += 1; j += 1
              }
            case 17 => sym += 3 + br.bits(3)
            case _ => sym += 11 + br.bits(7)
          }
        }
        if (sym > alphabetSize) return new PrefixCode(new Array[Int](0))
      }
      new PrefixCode(lengths)
    }

    val greenCode = readCode(256 + 24 + cacheSize)
    val redCode = readCode(256)
    val blueCode = readCode(256)
    val alphaCode = readCode(256)
    val distCode = readCode(40)
    if (!greenCode.valid || !redCode.valid || !blueCode.valid ||
      !alphaCode.valid || !distCode.valid) return None

    // LZ77 prefix value: codes 0..3 are 1..4; above that, extra bits.
    // The cap differs by alphabet: length symbols stop at 24, distance
    // symbols run to 40 (extraBits up to 18 → distances to ~1M) — a
    // shared 24-cap would reject valid long-distance backreferences.
    def lz77Value(code: Int, maxCode: Int): Int = {
      if (code < 0 || code >= maxCode) return -1
      if (code < 4) code + 1
      else {
        val extraBits = (code - 2) >> 1
        val offset = (2 + (code & 1)) << extraBits
        offset + br.bits(extraBits) + 1
      }
    }

    // ---- pixel decode ----
    val n = w * h
    val pix = new Array[Int](n) // ARGB
    def cacheInsert(argb: Int): Unit =
      if (cache != null)
        cache(((0x1e35a7bd * argb) >>> (32 - cacheBits))) = argb
    var pos = 0
    while (pos < n) {
      val s = greenCode.read(br)
      if (s < 0 || br.truncated) return None
      if (s < 256) {
        val g = s
        val r = redCode.read(br)
        val b = blueCode.read(br)
        val a = alphaCode.read(br)
        if (r < 0 || b < 0 || a < 0 || br.truncated) return None
        val argb = (a << 24) | (r << 16) | (g << 8) | b
        pix(pos) = argb
        cacheInsert(argb)
        pos += 1
      } else if (s < 256 + 24) {
        val length = lz77Value(s - 256, 24)
        val ds = distCode.read(br)
        if (ds < 0 || br.truncated) return None
        val dcode = lz77Value(ds, 40)
        if (length < 1 || dcode < 1) return None
        val distance =
          if (dcode > 120) dcode - 120
          else {
            val (xoff, yoff) = NeighborMap(dcode - 1)
            math.max(1, yoff * w + xoff)
          }
        if (distance > pos || pos + length > n) return None
        var j = 0
        while (j < length) {
          val argb = pix(pos - distance)
          pix(pos) = argb
          cacheInsert(argb)
          pos += 1; j += 1
        }
      } else {
        if (cache == null) return None
        val idx = s - 256 - 24
        if (idx >= cacheSize) return None
        pix(pos) = cache(idx)
        pos += 1
      }
    }
    if (br.truncated) return None

    // ---- inverse transforms + channel stats ----
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < n) {
      val argb = pix(i)
      if (((argb >>> 24) & 0xff) != 255) return None // non-opaque: histogram tier
      val g = (argb >>> 8) & 0xff
      var r = (argb >>> 16) & 0xff
      var b = argb & 0xff
      if (subtractGreen) { r = (r + g) & 0xff; b = (b + g) & 0xff }
      sr += r; sg += g; sb += b
      if (grid != null) MultimodalOps.gridAdd(grid, i % w, i / w, w, h, r, g, b)
      i += 1
    }
    Some(MultimodalOps.DecodedImage(w, h, sr.toDouble / n, sg.toDouble / n,
      sb.toDouble / n))
  }
}
