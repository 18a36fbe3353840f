package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Vp8Decoder

/** VP8 ground layer vs a test-side RFC 6386 §7.1 bool ENCODER (the
  * WebpDecoderSpec posture: the JDK ships no VP8 codec, so the
  * reference is written from the spec and every parsed field is
  * checked exactly). */
class Vp8DecoderSpec extends AnyFunSuite {

  /** RFC 6386 §7.1 boolean arithmetic encoder (libvpx stop_encode
    * flush: 32 trailing zero bits at probability 128). */
  private final class BoolEncoder {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var range = 255
    private var bottom = 0L
    private var bitCount = 24
    def bool(prob: Int, v: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (v == 1) { bottom += split; range -= split } else range = split
      while (range < 128) {
        if ((bottom & (1L << 31)) != 0) { // carry into flushed bytes
          var i = out.length - 1
          while (i >= 0 && out(i) == 0xff.toByte) { out(i) = 0; i -= 1 }
          if (i >= 0) out(i) = (out(i) + 1).toByte
        }
        range <<= 1
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          out += ((bottom >> 24) & 0xff).toByte
          bottom &= 0xffffff
          bitCount = 8
        }
      }
    }
    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }
    def signedLiteral(v: Int, n: Int): Unit = {
      literal(math.abs(v), n); bool(128, if (v < 0) 1 else 0)
    }
    def maybeSigned(v: Int, n: Int): Unit =
      if (v == 0) bool(128, 0) else { bool(128, 1); signedLiteral(v, n) }
    def finish(): Array[Byte] = {
      (0 until 32).foreach(_ => bool(128, 0))
      out.toArray
    }
  }

  private def riffVp8(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def tag(t: String): Unit = bos.write(t.getBytes("US-ASCII"))
    def u32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    val padded = payload.length + (payload.length & 1)
    tag("RIFF"); u32(4 + 8 + padded); tag("WEBP")
    tag("VP8 "); u32(payload.length); bos.write(payload)
    if ((payload.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  /** uncompressed prefix + first-partition bytes. */
  private def frame(w: Int, h: Int, part: Array[Byte], xs: Int = 0,
      ys: Int = 0, frameType: Int = 0, version: Int = 0): Array[Byte] = {
    val tagv = frameType | (version << 1) | (1 << 4) | (part.length << 5)
    Array[Byte](
      (tagv & 0xff).toByte, ((tagv >> 8) & 0xff).toByte,
      ((tagv >> 16) & 0xff).toByte,
      0x9d.toByte, 0x01.toByte, 0x2a.toByte,
      ((w | (xs << 14)) & 0xff).toByte, (((w | (xs << 14)) >> 8) & 0xff).toByte,
      ((h | (ys << 14)) & 0xff).toByte, (((h | (ys << 14)) >> 8) & 0xff).toByte
    ) ++ part
  }

  test("bool coder roundtrips a deterministic mixed-probability stream") {
    var seed = 0x2545f491L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val stream = (0 until 4000).map { _ =>
      val p = 1 + (math.abs(next()) % 254).toInt // prob in 1..254
      val b = (math.abs(next()) % 2).toInt
      (p, b)
    }
    val enc = new BoolEncoder
    stream.foreach { case (p, b) => enc.bool(p, b) }
    val bytes = enc.finish()
    val dec = new Vp8Decoder.BoolDecoder(bytes, 0, bytes.length)
    stream.foreach { case (p, b) => assert(dec.bool(p) === b) }
    assert(!dec.overrun)
  }

  test("keyframe header parses every front-of-frame field exactly") {
    val enc = new BoolEncoder
    enc.bool(128, 0) // color space 0
    enc.bool(128, 1) // clamping 1
    enc.bool(128, 1) // segmentation enabled
    enc.bool(128, 1) // update map
    enc.bool(128, 1) // update feature data
    enc.bool(128, 1) // abs deltas
    Seq(12, -7, 0, 63).foreach(enc.maybeSigned(_, 7)) // segment quant
    Seq(0, 5, -6, 1).foreach(enc.maybeSigned(_, 6)) // segment filter
    // segment tree probs: update 2 of 3
    enc.bool(128, 1); enc.literal(200, 8)
    enc.bool(128, 0)
    enc.bool(128, 1); enc.literal(33, 8)
    enc.bool(128, 1) // filter type
    enc.literal(17, 6) // filter level
    enc.literal(5, 3) // sharpness
    enc.bool(128, 1) // lf delta enabled
    enc.bool(128, 1) // lf delta update
    Seq(2, 0, -3, 0).foreach(enc.maybeSigned(_, 6)) // ref frame deltas
    Seq(0, 0, 4, -1).foreach(enc.maybeSigned(_, 6)) // mode deltas
    enc.literal(2, 2) // log2 partitions -> 4
    enc.literal(93, 7) // y_ac_qi
    enc.maybeSigned(3, 4) // y_dc
    enc.maybeSigned(0, 4) // y2_dc
    enc.maybeSigned(-8, 4) // y2_ac
    enc.maybeSigned(1, 4) // uv_dc
    enc.maybeSigned(0, 4) // uv_ac
    enc.bool(128, 1) // refresh entropy probs
    val payload = frame(640, 360, enc.finish(), xs = 1, ys = 2)
    val h = Vp8Decoder.parseHeader(riffVp8(payload))
    assert(h.isDefined, "keyframe header must parse")
    val g = h.get
    assert((g.width, g.xscale, g.height, g.yscale) === ((640, 1, 360, 2)))
    assert(g.showFrame && g.version === 0)
    assert((g.colorSpace, g.clampingType) === ((0, 1)))
    assert(g.segmentationEnabled && g.segmentAbsDeltas)
    assert(g.segmentQuantDeltas.toSeq === Seq(12, -7, 0, 63))
    assert(g.segmentFilterDeltas.toSeq === Seq(0, 5, -6, 1))
    assert(g.segmentTreeProbs.toSeq === Seq(200, 255, 33))
    assert((g.filterType, g.filterLevel, g.sharpness) === ((1, 17, 5)))
    assert(g.refLfDeltas.toSeq === Seq(2, 0, -3, 0))
    assert(g.modeLfDeltas.toSeq === Seq(0, 0, 4, -1))
    assert(g.nDctPartitions === 4)
    assert(g.yAcQi === 93)
    assert((g.yDcDelta, g.y2DcDelta, g.y2AcDelta, g.uvDcDelta, g.uvAcDelta) ===
      ((3, 0, -8, 1, 0)))
    assert(g.refreshEntropyProbs)
    assert(Vp8Decoder.dims(riffVp8(payload)) === Some((640, 360)))
    // tier contract: pixels stay on the byte tier until the
    // coefficient/IDCT slice lands — metadata is real, decode is None
    assert(graft.ops.MultimodalOps.decodeImage(riffVp8(payload)).isEmpty)
  }

  test("minimal header: all optional blocks absent") {
    val enc = new BoolEncoder
    enc.bool(128, 0); enc.bool(128, 0) // color space, clamping
    enc.bool(128, 0) // segmentation off
    enc.bool(128, 0) // filter type
    enc.literal(0, 6); enc.literal(0, 3)
    enc.bool(128, 0) // lf deltas off
    enc.literal(0, 2) // one partition
    enc.literal(4, 7) // y_ac_qi
    (0 until 5).foreach(_ => enc.bool(128, 0)) // no quant deltas
    enc.bool(128, 0) // no refresh
    val g = Vp8Decoder.parseHeader(riffVp8(frame(16, 16, enc.finish()))).get
    assert(!g.segmentationEnabled && g.nDctPartitions === 1 && g.yAcQi === 4)
    assert(g.segmentTreeProbs.toSeq === Seq(255, 255, 255))
  }

  test("strictness: interframe, bad start code, bad version, truncation -> None") {
    val enc = new BoolEncoder
    enc.bool(128, 0); enc.bool(128, 0); enc.bool(128, 0)
    enc.bool(128, 0); enc.literal(0, 6); enc.literal(0, 3); enc.bool(128, 0)
    enc.literal(0, 2); enc.literal(4, 7)
    (0 until 5).foreach(_ => enc.bool(128, 0)); enc.bool(128, 0)
    val part = enc.finish()
    assert(Vp8Decoder.parseHeader(riffVp8(frame(16, 16, part, frameType = 1))).isEmpty)
    assert(Vp8Decoder.parseHeader(riffVp8(frame(16, 16, part, version = 4))).isEmpty)
    val bad = frame(16, 16, part); bad(4) = 0x77
    assert(Vp8Decoder.parseHeader(riffVp8(bad)).isEmpty)
    assert(Vp8Decoder.parseHeader(riffVp8(frame(16, 16, part).take(9))).isEmpty)
    // zero dimensions are malformed
    assert(Vp8Decoder.parseHeader(riffVp8(frame(0, 16, part))).isEmpty)
    // a VP8L payload has no "VP8 " chunk
    assert(Vp8Decoder.dims(Array[Byte](1, 2, 3)).isEmpty)
  }
}
