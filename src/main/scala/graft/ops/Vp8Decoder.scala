package graft.ops

/** Lossy WebP (VP8) GROUND LAYER — the first slice of the last
  * remaining multimodal decode gap (VERDICT_r11 "What's missing" #4).
  * VP8 is the RFC 6386 intra/inter codec; a full keyframe decode
  * needs the boolean arithmetic decoder, header parse, coefficient
  * trees, dequant, IDCT/WHT and prediction. This file lands the
  * foundation the rest builds on, each piece spec-pinned against a
  * test-side from-the-RFC encoder (the GifDecoder/WebpDecoder
  * posture):
  *
  *  - the UNCOMPRESSED frame prefix: 3-byte frame tag (keyframe bit,
  *    version, show_frame, first-partition size), the 0x9D012A start
  *    code, 14-bit width/height with 2-bit upscale codes — so lossy
  *    WebP payloads now surface REAL dimensions to the metadata tier
  *    instead of nothing;
  *  - the RFC 6386 §7.2 boolean arithmetic decoder (bool/literal/
  *    signed forms), round-tripped against the §7.1 encoder written
  *    test-side;
  *  - the keyframe compressed-header walk (color space, clamping,
  *    segmentation block with its quantizer/filter deltas and segment
  *    tree probs, loop-filter block with the mode/ref adjustments,
  *    DCT partition count, the full quantizer-index block, refresh
  *    bit) — everything in front of the coefficient-probability
  *    update loop, which is where the next slice (token trees +
  *    IDCT) picks up.
  *
  * Until that slice lands, [[MultimodalOps]]' lossy-WebP payloads
  * keep the byte-strip dHash tier for pixel work, now with true
  * (width, height) from [[dims]].
  */
object Vp8Decoder {

  /** RFC 6386 §7.2 boolean decoder. `value` holds 16 fresh bits
    * (big-endian) plus up to 8 consumed ones; renormalization pulls a
    * byte every 8 shifts. Reads past the buffer pad zero bits (the
    * RFC's documented tail behavior). */
  final class BoolDecoder(p: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value =
      (((if (start < end) p(start) & 0xff else 0) << 8) |
        (if (start + 1 < end) p(start + 1) & 0xff else 0))
    private var pos = start + 2
    private var shifts = 0
    var overrun = false

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      val ret =
        if (value >= bigSplit) { range -= split; value -= bigSplit; 1 }
        else { range = split; 0 }
      while (range < 128) {
        value <<= 1
        range <<= 1
        shifts += 1
        if (shifts == 8) {
          shifts = 0
          if (pos < end) { value |= p(pos) & 0xff; pos += 1 }
          else overrun = true
        }
      }
      ret
    }

    /** n-bit unsigned literal, MSB first, each bit at probability 128. */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** n-bit magnitude followed by a sign bit (the header's
      * "delta + sign" fields). */
    def signedLiteral(n: Int): Int = {
      val mag = literal(n)
      if (bool(128) == 1) -mag else mag
    }

    /** flag-gated signed delta: absent ⇒ 0. */
    def maybeSigned(n: Int): Int = if (bool(128) == 1) signedLiteral(n) else 0
  }

  /** Parsed keyframe header — every field in front of the coefficient
    * probability updates. */
  final case class Vp8Header(
      version: Int, showFrame: Boolean, firstPartSize: Int,
      width: Int, xscale: Int, height: Int, yscale: Int,
      colorSpace: Int, clampingType: Int,
      segmentationEnabled: Boolean,
      segmentQuantDeltas: Array[Int], segmentFilterDeltas: Array[Int],
      segmentAbsDeltas: Boolean, segmentTreeProbs: Array[Int],
      filterType: Int, filterLevel: Int, sharpness: Int,
      refLfDeltas: Array[Int], modeLfDeltas: Array[Int],
      nDctPartitions: Int,
      yAcQi: Int, yDcDelta: Int, y2DcDelta: Int, y2AcDelta: Int,
      uvDcDelta: Int, uvAcDelta: Int,
      refreshEntropyProbs: Boolean)

  /** RIFF walk to a chunk's payload range [start, end). */
  private[ops] def riffPayload(p: Array[Byte], want: String): Option[(Int, Int)] = {
    if (p.length < 20) return None
    def tag(off: Int): String =
      new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long = (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    if (tag(0) != "RIFF" || tag(8) != "WEBP") return None
    val riffSize = u32(4)
    if (riffSize + 8 > p.length) return None
    var off = 12
    while (off + 8 <= riffSize + 8) {
      val t = tag(off)
      val sz = u32(off + 4)
      if (off + 8 + sz > p.length) return None
      if (t == want) return Some((off + 8, (off + 8 + sz).toInt))
      off += (8 + sz + (sz & 1)).toInt
    }
    None
  }

  /** Width/height (after upscale codes are stripped — the stored 14-bit
    * values) of a lossy-WebP payload, from the UNCOMPRESSED frame
    * prefix only. None for non-VP8, non-keyframe, or malformed. */
  def dims(p: Array[Byte]): Option[(Int, Int)] =
    riffPayload(p, "VP8 ").flatMap { case (s, e) =>
      parseHeaderAt(p, s, e).map(h => (h.width, h.height))
    }

  /** Full front-of-frame header of a lossy-WebP payload. */
  def parseHeader(p: Array[Byte]): Option[Vp8Header] =
    riffPayload(p, "VP8 ").flatMap { case (s, e) => parseHeaderAt(p, s, e) }

  /** RFC 6386 §9.1–9.4: frame tag, start code, dimensions, then the
    * keyframe compressed header through the quantizer/refresh block. */
  private def parseHeaderAt(p: Array[Byte], start: Int, end: Int)
      : Option[Vp8Header] = {
    if (end - start < 10) return None
    val b0 = p(start) & 0xff; val b1 = p(start + 1) & 0xff
    val b2 = p(start + 2) & 0xff
    val frameTag = b0 | (b1 << 8) | (b2 << 16)
    val keyFrame = (frameTag & 1) == 0
    val version = (frameTag >> 1) & 7
    val showFrame = ((frameTag >> 4) & 1) == 1
    val firstPartSize = (frameTag >> 5) & 0x7ffff
    if (!keyFrame || version > 3) return None
    // keyframe start code
    if ((p(start + 3) & 0xff) != 0x9d || (p(start + 4) & 0xff) != 0x01 ||
      (p(start + 5) & 0xff) != 0x2a) return None
    val hw = (p(start + 6) & 0xff) | ((p(start + 7) & 0xff) << 8)
    val hh = (p(start + 8) & 0xff) | ((p(start + 9) & 0xff) << 8)
    val w = hw & 0x3fff; val xs = hw >> 14
    val h = hh & 0x3fff; val ys = hh >> 14
    if (w == 0 || h == 0) return None
    val partEnd = math.min(end.toLong, start + 10L + firstPartSize).toInt
    if (partEnd <= start + 10) return None
    val d = new BoolDecoder(p, start + 10, partEnd)

    val colorSpace = d.bool(128)
    val clampingType = d.bool(128)

    // segmentation (§9.3)
    val segQ = new Array[Int](4); val segF = new Array[Int](4)
    val segTree = Array.fill(3)(255)
    var segAbs = false
    val segEnabled = d.bool(128) == 1
    if (segEnabled) {
      val updateMap = d.bool(128) == 1
      val updateData = d.bool(128) == 1
      if (updateData) {
        segAbs = d.bool(128) == 1
        var i = 0
        while (i < 4) { segQ(i) = d.maybeSigned(7); i += 1 }
        i = 0
        while (i < 4) { segF(i) = d.maybeSigned(6); i += 1 }
      }
      if (updateMap) {
        var i = 0
        while (i < 3) {
          if (d.bool(128) == 1) segTree(i) = d.literal(8)
          i += 1
        }
      }
    }

    // loop filter (§9.4)
    val filterType = d.bool(128)
    val filterLevel = d.literal(6)
    val sharpness = d.literal(3)
    val refLf = new Array[Int](4); val modeLf = new Array[Int](4)
    if (d.bool(128) == 1) { // lf delta enabled
      if (d.bool(128) == 1) { // update
        var i = 0
        while (i < 4) { refLf(i) = d.maybeSigned(6); i += 1 }
        i = 0
        while (i < 4) { modeLf(i) = d.maybeSigned(6); i += 1 }
      }
    }

    // token partitions (§9.5) + quantizer block (§9.6)
    val nParts = 1 << d.literal(2)
    val yAcQi = d.literal(7)
    val yDc = d.maybeSigned(4)
    val y2Dc = d.maybeSigned(4)
    val y2Ac = d.maybeSigned(4)
    val uvDc = d.maybeSigned(4)
    val uvAc = d.maybeSigned(4)
    val refresh = d.bool(128) == 1 // §9.7 (keyframe form)
    if (d.overrun) return None

    Some(Vp8Header(version, showFrame, firstPartSize, w, xs, h, ys,
      colorSpace, clampingType, segEnabled, segQ, segF, segAbs, segTree,
      filterType, filterLevel, sharpness, refLf, modeLf,
      nParts, yAcQi, yDc, y2Dc, y2Ac, uvDc, uvAc, refresh))
  }
}
