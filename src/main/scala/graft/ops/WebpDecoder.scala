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
  * Coverage (round 12: the full VP8L feature set): meta-prefix entropy
  * images (N prefix-code groups selected per pixel block, the
  * spec's (red<<8|green) group index) and ALL FOUR transforms —
  * SUBTRACT_GREEN, PREDICTOR (all 14 modes, sub-image-coded block
  * modes), COLOR (cross-color multipliers, signed int8 delta
  * arithmetic) and COLOR_INDEXING (delta-coded palette, packed
  * sub-byte indices) — in ANY spec-legal combination: a palette read
  * shrinks the working width for everything read after it (libwebp's
  * ReadTransform posture), and inverses apply in reverse bitstream
  * order walking the widths back. An out-of-range palette index
  * returns None (stricter than libwebp's black pixel: a wrong
  * feature is worse than no feature), as does any
  * truncated, malformed, version≠0, or non-opaque-alpha payload
  * (a mean over transparent pixels is not a mean — the
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

    // ---- entropy-coded image decode (main image AND the transform
    // sub-images share this; per the spec ABNF only the spatially
    // coded image carries the meta-prefix bit). Returns null on any
    // malformed/truncated/unsupported layout. ----
    def entropyImage(ew: Int, eh: Int, isMain: Boolean): Array[Int] = {
      // color cache (present at every level)
      val cacheFlag = br.bit() == 1
      val cacheBits = if (cacheFlag) br.bits(4) else 0
      // spec: when the flag is set, cache_bits is 1..11 — a set flag
      // with 0 bits is malformed, not "no cache" (ADVICE_r11)
      if (cacheFlag && (cacheBits < 1 || cacheBits > 11)) return null
      val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
      val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
      // meta prefix (spatially-coded image only): an entropy image at
      // block grain selects which of N prefix-code GROUPS decodes each
      // pixel — group index = (red << 8) | green of the block's entropy
      // pixel, group count = max index + 1 (the spec's rule). The
      // entropy image is itself an entropy-coded image (recursive call,
      // never meta-coded per the ABNF).
      var metaCodes: Array[Int] = null
      var metaW = 0
      var metaBits = 0
      var numGroups = 1
      if (isMain && br.bit() == 1) {
        metaBits = br.bits(3) + 2
        metaW = (ew + (1 << metaBits) - 1) >> metaBits
        val mh = (eh + (1 << metaBits) - 1) >> metaBits
        val mimg = entropyImage(metaW, mh, isMain = false)
        if (mimg == null) return null
        metaCodes = mimg.map(p => ((p >>> 16) & 0xff) << 8 | ((p >>> 8) & 0xff))
        numGroups = metaCodes.max + 1
        // fixture-scale sanity bound, same spirit as the w*h cap
        if (numGroups > (1 << 16)) return null
      }

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

      // one 5-code group per meta index, read in index order
      val greenCodes = new Array[PrefixCode](numGroups)
      val redCodes = new Array[PrefixCode](numGroups)
      val blueCodes = new Array[PrefixCode](numGroups)
      val alphaCodes = new Array[PrefixCode](numGroups)
      val distCodes = new Array[PrefixCode](numGroups)
      var gi = 0
      while (gi < numGroups) {
        greenCodes(gi) = readCode(256 + 24 + cacheSize)
        redCodes(gi) = readCode(256)
        blueCodes(gi) = readCode(256)
        alphaCodes(gi) = readCode(256)
        distCodes(gi) = readCode(40)
        if (!greenCodes(gi).valid || !redCodes(gi).valid ||
          !blueCodes(gi).valid || !alphaCodes(gi).valid ||
          !distCodes(gi).valid) return null
        gi += 1
      }

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

      val n = ew * eh
      val pix = new Array[Int](n) // ARGB
      def cacheInsert(argb: Int): Unit =
        if (cache != null)
          cache(((0x1e35a7bd * argb) >>> (32 - cacheBits))) = argb
      var pos = 0
      while (pos < n) {
        // the prefix group is selected by the CURRENT pixel's block
        // (re-evaluated per symbol — an LZ77 copy can cross blocks)
        val grp =
          if (metaCodes == null) 0
          else {
            val idx = metaCodes(((pos / ew) >> metaBits) * metaW +
              ((pos % ew) >> metaBits))
            if (idx >= numGroups) return null
            idx
          }
        val greenCode = greenCodes(grp)
        val s = greenCode.read(br)
        if (s < 0 || br.truncated) return null
        if (s < 256) {
          val g = s
          val r = redCodes(grp).read(br)
          val b = blueCodes(grp).read(br)
          val a = alphaCodes(grp).read(br)
          if (r < 0 || b < 0 || a < 0 || br.truncated) return null
          val argb = (a << 24) | (r << 16) | (g << 8) | b
          pix(pos) = argb
          cacheInsert(argb)
          pos += 1
        } else if (s < 256 + 24) {
          val length = lz77Value(s - 256, 24)
          val ds = distCodes(grp).read(br)
          if (ds < 0 || br.truncated) return null
          val dcode = lz77Value(ds, 40)
          if (length < 1 || dcode < 1) return null
          val distance =
            if (dcode > 120) dcode - 120
            else {
              val (xoff, yoff) = NeighborMap(dcode - 1)
              math.max(1, yoff * ew + xoff)
            }
          if (distance > pos || pos + length > n) return null
          var j = 0
          while (j < length) {
            val argb = pix(pos - distance)
            pix(pos) = argb
            cacheInsert(argb)
            pos += 1; j += 1
          }
        } else {
          if (cache == null) return null
          val idx = s - 256 - 24
          if (idx >= cacheSize) return null
          pix(pos) = cache(idx)
          pos += 1
        }
      }
      if (br.truncated) return null
      pix
    }

    // ---- per-channel ARGB helpers (shared by the inverses) ----
    @inline def ch(p: Int, s: Int): Int = (p >>> s) & 0xff
    @inline def pack(a: Int, r: Int, g: Int, b: Int): Int =
      (a << 24) | (r << 16) | (g << 8) | b
    def addPix(x: Int, y: Int): Int = pack(
      (ch(x, 24) + ch(y, 24)) & 0xff, (ch(x, 16) + ch(y, 16)) & 0xff,
      (ch(x, 8) + ch(y, 8)) & 0xff, (ch(x, 0) + ch(y, 0)) & 0xff)
    def avg2(x: Int, y: Int): Int = pack(
      (ch(x, 24) + ch(y, 24)) >> 1, (ch(x, 16) + ch(y, 16)) >> 1,
      (ch(x, 8) + ch(y, 8)) >> 1, (ch(x, 0) + ch(y, 0)) >> 1)
    @inline def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

    // ---- transforms (level-0 stream): read each one's data inline,
    // remember READ ORDER (inverses apply in reverse of it) ----
    final case class PredXf(sizeBits: Int, sw: Int, modes: Array[Int])
    final case class ColorXf(sizeBits: Int, sw: Int, cte: Array[Int])
    final case class PaletteXf(widthBits: Int, colors: Array[Int])
    val xforms = scala.collection.mutable.ArrayBuffer.empty[Any]
    var seenTransforms = 0
    // COLOR_INDEXING packs sub-byte indices, so everything READ AFTER
    // it — later transforms' block sub-images and the main image —
    // lives at the PACKED width (libwebp's ReadTransform shrinks xsize
    // in place); transforms read before it stay at the full width.
    // The inverse pass below walks widths back in reverse
    // automatically via `pw`, so any spec-legal combination of the
    // four transforms decodes (the round-11 gap).
    var curW = w
    while (br.bit() == 1) {
      val ttype = br.bits(2)
      if ((seenTransforms & (1 << ttype)) != 0) return None // each at most once
      seenTransforms |= 1 << ttype
      ttype match {
        case 0 | 1 => // PREDICTOR / COLOR: block-grain sub-image
          val sizeBits = br.bits(3) + 2
          val sw = (curW + (1 << sizeBits) - 1) >> sizeBits
          val sh = (h + (1 << sizeBits) - 1) >> sizeBits
          val sub = entropyImage(sw, sh, isMain = false)
          if (sub == null) return None
          xforms += (if (ttype == 0) PredXf(sizeBits, sw, sub)
                     else ColorXf(sizeBits, sw, sub))
        case 2 => xforms += "subtract-green"
        case _ => // COLOR_INDEXING: delta-coded palette + packed indices
          val tableSize = br.bits(8) + 1
          val raw = entropyImage(tableSize, 1, isMain = false)
          if (raw == null) return None
          val colors = new Array[Int](tableSize)
          var prev = 0
          var i = 0
          while (i < tableSize) { // palette entries are delta-coded
            colors(i) = addPix(raw(i), prev); prev = colors(i); i += 1
          }
          val widthBits =
            if (tableSize <= 2) 3
            else if (tableSize <= 4) 2
            else if (tableSize <= 16) 1
            else 0
          if (widthBits > 0) curW = (w + (1 << widthBits) - 1) >> widthBits
          xforms += PaletteXf(widthBits, colors)
      }
    }

    // ---- main (spatially coded) image — at the current (packed when
    // a palette transform was read) width ----
    var pix = entropyImage(curW, h, isMain = true)
    if (pix == null) return None
    var pw = curW // current buffer width as inverses apply

    // ---- inverse transforms, REVERSE bitstream order ----
    var xi = xforms.size - 1
    var malformed = false
    while (xi >= 0 && !malformed) {
      xforms(xi) match {
        case "subtract-green" =>
          var i = 0
          while (i < pix.length) {
            val p = pix(i)
            val g = ch(p, 8)
            pix(i) = pack(ch(p, 24), (ch(p, 16) + g) & 0xff, g,
              (ch(p, 0) + g) & 0xff)
            i += 1
          }
        case PredXf(sizeBits, sw, modes) =>
          // scan-order reconstruction: residual + predicted, mod 256
          // per channel. Edge rules per the spec: (0,0) is black-
          // predicted, the rest of row 0 is L, column 0 is T; the
          // top-right of the rightmost pixel wraps to the leftmost
          // pixel of the SAME row (pos - w + 1 in scan order).
          def select(l: Int, t: Int, tl: Int): Int = {
            var pl = 0; var pt = 0
            var s = 0
            while (s <= 24) {
              val p = ch(l, s) + ch(t, s) - ch(tl, s)
              pl += math.abs(p - ch(l, s)); pt += math.abs(p - ch(t, s))
              s += 8
            }
            if (pl < pt) l else t // the 2021-amended strict form
          }
          def casFull(l: Int, t: Int, tl: Int): Int = pack(
            clamp255(ch(l, 24) + ch(t, 24) - ch(tl, 24)),
            clamp255(ch(l, 16) + ch(t, 16) - ch(tl, 16)),
            clamp255(ch(l, 8) + ch(t, 8) - ch(tl, 8)),
            clamp255(ch(l, 0) + ch(t, 0) - ch(tl, 0)))
          def casHalf(av: Int, tl: Int): Int = {
            // clamp(a + (a - b) / 2), C-truncating division
            @inline def c(a: Int, b: Int): Int = clamp255(a + (a - b) / 2)
            pack(c(ch(av, 24), ch(tl, 24)), c(ch(av, 16), ch(tl, 16)),
              c(ch(av, 8), ch(tl, 8)), c(ch(av, 0), ch(tl, 0)))
          }
          var y = 0; var pos = 0
          while (y < h && !malformed) {
            var x = 0
            while (x < pw && !malformed) {
              val pred =
                if (x == 0 && y == 0) 0xff000000
                else if (y == 0) pix(pos - 1)
                else if (x == 0) pix(pos - pw)
                else {
                  val mode = ch(modes((y >> sizeBits) * sw + (x >> sizeBits)), 8)
                  val l = pix(pos - 1); val t = pix(pos - pw)
                  val tl = pix(pos - pw - 1); val tr = pix(pos - pw + 1)
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
                    case 11 => select(l, t, tl)
                    case 12 => casFull(l, t, tl)
                    case 13 => casHalf(avg2(l, t), tl)
                    case _ => malformed = true; 0
                  }
                }
              if (!malformed) pix(pos) = addPix(pix(pos), pred)
              pos += 1; x += 1
            }
            y += 1
          }
        case ColorXf(sizeBits, sw, cte) =>
          // cross-color inverse: signed int8 multipliers, green drives
          // red, then green + NEW red drive blue (libwebp layout:
          // g2r = blue channel, g2b = green, r2b = red of the element)
          @inline def ctd(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
          var y = 0; var pos = 0
          while (y < h) {
            var x = 0
            while (x < pw) {
              val e = cte((y >> sizeBits) * sw + (x >> sizeBits))
              val p = pix(pos)
              val g = ch(p, 8)
              val r = (ch(p, 16) + ctd(ch(e, 0), g)) & 0xff
              val b = (ch(p, 0) + ctd(ch(e, 8), g) + ctd(ch(e, 16), r)) & 0xff
              pix(pos) = pack(ch(p, 24), r, g, b)
              pos += 1; x += 1
            }
            y += 1
          }
        case PaletteXf(widthBits, colors) =>
          val bpp = 8 >> widthBits // bits per packed index
          val perUnit = 1 << widthBits // indices per green byte
          val mask = (1 << bpp) - 1
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h && !malformed) {
            var x = 0
            while (x < w && !malformed) {
              val packed = pix(y * pw + (x >> widthBits))
              val idx = (ch(packed, 8) >> ((x & (perUnit - 1)) * bpp)) & mask
              if (idx >= colors.length) malformed = true
              else out(y * w + x) = colors(idx)
              x += 1
            }
            y += 1
          }
          pix = out
          pw = w
      }
      xi -= 1
    }
    if (malformed || pw != w) return None

    // ---- channel stats over the reconstructed image ----
    val n = w * h
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < n) {
      val argb = pix(i)
      if (((argb >>> 24) & 0xff) != 255) return None // non-opaque: histogram tier
      val g = (argb >>> 8) & 0xff
      val r = (argb >>> 16) & 0xff
      val b = argb & 0xff
      sr += r; sg += g; sb += b
      if (grid != null) MultimodalOps.gridAdd(grid, i % w, i / w, w, h, r, g, b)
      i += 1
    }
    Some(MultimodalOps.DecodedImage(w, h, sr.toDouble / n, sg.toDouble / n,
      sb.toDouble / n))
  }
}
