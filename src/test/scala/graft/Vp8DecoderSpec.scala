package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Vp8Decoder
import graft.Vp8TestCodec.{BoolEncoder, encodeCoeffs, treeWrite}

/** VP8 ground layer vs a test-side RFC 6386 §7.1 bool ENCODER (the
  * WebpDecoderSpec posture: the JDK ships no VP8 codec, so the
  * reference is written from the spec and every parsed field is
  * checked exactly). */
class Vp8DecoderSpec extends AnyFunSuite {

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
    // strictness contract: a header with no coefficient section behind
    // it must overrun the bool decoder and stay off the pixel tier
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

  // ===== round 13: coefficient decode + IDCT + reconstruction ========

  /** One macroblock's fixture content: quantized coefficient LEVELS in
    * natural order (y2; 16 luma blocks missing their DC — it rides
    * y2; 4+4 chroma). */
  private case class MbFix(segId: Int, skip: Boolean, ymode: Int, uvmode: Int,
      y2: Array[Int], y: Array[Array[Int]], u: Array[Array[Int]],
      v: Array[Array[Int]],
      // B_PRED (ymode 4): 16 subblock modes; y blocks then carry
      // their own DC (type-3 coding, no Y2). null ⇒ all B_DC.
      bmodes: Array[Int] = null) {
    def bmodesOr: Array[Int] = if (bmodes != null) bmodes else new Array[Int](16)
  }

  private def zeros = new Array[Int](16)

  /** Deterministic shared probability table — every slot explicitly
    * updated in-stream, so the fixture is self-contained regardless of
    * the engine-local defaults (the decoder's documented conformance
    * posture). */
  private def fixtureProbs(): Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11)((t, b, c, l) =>
      ((t * 59 + b * 31 + c * 17 + l * 7) % 224) + 16)

  private val SkipProb = 200

  /** Assemble a complete 2×2-macroblock (32×32) keyframe bitstream:
    * segmentation with an update map and ABS per-segment quantizers,
    * two token partitions (round-robin by MB row), full probability
    * updates, per-MB skip flags — the whole §9/§10/§13 surface the
    * decoder claims. */
  private def encodeFrame(mbs: Seq[MbFix], mbW: Int, mbH: Int,
      segQ: Array[Int], nParts: Int, filterType: Int = 0,
      filterLevel: Int = 0, sharpness: Int = 0,
      segF: Array[Int] = Array(0, 0, 0, 0),
      skipSlot: (Int, Int, Int, Int) = null): Array[Byte] = {
    import Vp8Decoder.{CoeffUpdateProb, KfYmodeProb, KfYmodeTree, KfUvModeProb, SegmentTree, UvModeTree}
    val probs = fixtureProbs()
    // a skipped slot models a stream RELYING on the codec default:
    // no in-stream update, and the encoder really codes tokens with
    // the default value for that slot
    if (skipSlot != null)
      probs(skipSlot._1)(skipSlot._2)(skipSlot._3)(skipSlot._4) = 128
    val enc0 = new BoolEncoder
    enc0.bool(128, 0); enc0.bool(128, 0) // color space, clamping
    enc0.bool(128, 1) // segmentation enabled
    enc0.bool(128, 1) // update map
    enc0.bool(128, 1) // update feature data
    enc0.bool(128, 1) // abs deltas
    segQ.foreach(enc0.maybeSigned(_, 7))
    segF.foreach(enc0.maybeSigned(_, 6)) // per-segment filter deltas
    // segment tree probs: all three explicit (160, 170, 180)
    Seq(160, 170, 180).foreach { pr => enc0.bool(128, 1); enc0.literal(pr, 8) }
    val segTreeProbs = Array(160, 170, 180)
    enc0.bool(128, filterType)
    enc0.literal(filterLevel, 6)
    enc0.literal(sharpness, 3)
    enc0.bool(128, 0) // lf deltas off
    enc0.literal(Integer.numberOfTrailingZeros(nParts), 2)
    enc0.literal(0, 7) // y_ac_qi (unused: abs segment quantizers)
    (0 until 5).foreach(_ => enc0.bool(128, 0)) // no quant deltas
    enc0.bool(128, 1) // refresh entropy probs
    // full coefficient probability update
    for (t <- 0 until 4; b <- 0 until 8; c <- 0 until 3; l <- 0 until 11) {
      if (skipSlot == ((t, b, c, l))) enc0.bool(CoeffUpdateProb, 0)
      else { enc0.bool(CoeffUpdateProb, 1); enc0.literal(probs(t)(b)(c)(l), 8) }
    }
    enc0.bool(128, 1) // mb_no_coeff_skip
    enc0.literal(SkipProb, 8)

    val tokEncs = Array.fill(nParts)(new BoolEncoder)
    // entropy contexts, mirrored from the decode loop
    val aboveY = new Array[Int](mbW * 4)
    val aboveU = new Array[Int](mbW * 2)
    val aboveV = new Array[Int](mbW * 2)
    val aboveY2 = new Array[Int](mbW)
    val aboveBm = new Array[Int](mbW * 4)
    for (mbY <- 0 until mbH) {
      val leftY = new Array[Int](4)
      val leftU = new Array[Int](2)
      val leftV = new Array[Int](2)
      var leftY2 = 0
      val leftBm = new Array[Int](4)
      val te = tokEncs(mbY % nParts)
      for (mbX <- 0 until mbW) {
        val mb = mbs(mbY * mbW + mbX)
        val isB = mb.ymode == 4
        treeWrite(enc0, SegmentTree, segTreeProbs, mb.segId)
        enc0.bool(SkipProb, if (mb.skip) 1 else 0)
        treeWrite(enc0, KfYmodeTree, KfYmodeProb, mb.ymode)
        if (isB) {
          val bm = mb.bmodesOr
          for (b <- 0 until 16) {
            val am = if (b < 4) aboveBm(mbX * 4 + b) else bm(b - 4)
            val lm = if (b % 4 == 0) leftBm(b / 4) else bm(b - 1)
            treeWrite(enc0, Vp8Decoder.KfBmodeTree,
              Vp8Decoder.KfBmodeProbs(am)(lm), bm(b))
          }
        }
        val implied = if (isB) 0 else Vp8Decoder.impliedBmode(mb.ymode)
        for (k <- 0 until 4) {
          aboveBm(mbX * 4 + k) = if (isB) mb.bmodesOr(12 + k) else implied
          leftBm(k) = if (isB) mb.bmodesOr(k * 4 + 3) else implied
        }
        treeWrite(enc0, UvModeTree, KfUvModeProb, mb.uvmode)
        if (!mb.skip) {
          if (!isB) {
            val nz2 = encodeCoeffs(te, mb.y2, 1, 0, probs, aboveY2(mbX) + leftY2)
            aboveY2(mbX) = if (nz2) 1 else 0; leftY2 = aboveY2(mbX)
          }
          for (b <- 0 until 16) {
            val row = b / 4; val colb = b % 4
            val nz = encodeCoeffs(te, mb.y(b), if (isB) 3 else 0,
              if (isB) 0 else 1, probs,
              aboveY(mbX * 4 + colb) + leftY(row))
            aboveY(mbX * 4 + colb) = if (nz) 1 else 0; leftY(row) = if (nz) 1 else 0
          }
          for (b <- 0 until 8) {
            val blocks = if (b < 4) mb.u else mb.v
            val above = if (b < 4) aboveU else aboveV
            val left = if (b < 4) leftU else leftV
            val bb = b % 4; val row = bb / 2; val colb = bb % 2
            val nz = encodeCoeffs(te, blocks(bb), 2, 0, probs,
              above(mbX * 2 + colb) + left(row))
            above(mbX * 2 + colb) = if (nz) 1 else 0; left(row) = if (nz) 1 else 0
          }
        } else {
          java.util.Arrays.fill(aboveY, mbX * 4, mbX * 4 + 4, 0)
          java.util.Arrays.fill(leftY, 0)
          aboveU(mbX * 2) = 0; aboveU(mbX * 2 + 1) = 0
          aboveV(mbX * 2) = 0; aboveV(mbX * 2 + 1) = 0
          leftU(0) = 0; leftU(1) = 0; leftV(0) = 0; leftV(1) = 0
          if (!isB) { aboveY2(mbX) = 0; leftY2 = 0 }
        }
      }
    }
    val part0 = enc0.finish()
    val parts = tokEncs.map(_.finish())
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(frame(mbW * 16, mbH * 16, part0))
    for (i <- 0 until nParts - 1) {
      val sz = parts(i).length
      bos.write(sz & 0xff); bos.write((sz >> 8) & 0xff); bos.write((sz >> 16) & 0xff)
    }
    parts.foreach(bos.write)
    riffVp8(bos.toByteArray)
  }

  // ---- independent reconstruction (the expected pixels) -------------

  private def idctRef(in: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    val out = new Array[Int](16)
    for (i <- 0 until 4) {
      val a = in(i) + in(i + 8); val b = in(i) - in(i + 8)
      val c = ((in(i + 4) * 35468) >> 16) -
        (in(i + 12) + ((in(i + 12) * 20091) >> 16))
      val d = (in(i + 4) + ((in(i + 4) * 20091) >> 16)) +
        ((in(i + 12) * 35468) >> 16)
      t(i) = a + d; t(i + 12) = a - d; t(i + 4) = b + c; t(i + 8) = b - c
    }
    for (i <- 0 until 4) {
      val r = 4 * i
      val a = t(r) + t(r + 2); val b = t(r) - t(r + 2)
      val c = ((t(r + 1) * 35468) >> 16) -
        (t(r + 3) + ((t(r + 3) * 20091) >> 16))
      val d = (t(r + 1) + ((t(r + 1) * 20091) >> 16)) +
        ((t(r + 3) * 35468) >> 16)
      out(r) = (a + d + 4) >> 3; out(r + 3) = (a - d + 4) >> 3
      out(r + 1) = (b + c + 4) >> 3; out(r + 2) = (b - c + 4) >> 3
    }
    out
  }

  private def iwhtRef(in: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    val out = new Array[Int](16)
    for (i <- 0 until 4) {
      val a = in(i) + in(12 + i); val b = in(4 + i) + in(8 + i)
      val c = in(4 + i) - in(8 + i); val d = in(i) - in(12 + i)
      t(i) = a + b; t(4 + i) = c + d; t(8 + i) = a - b; t(12 + i) = d - c
    }
    for (i <- 0 until 4) {
      val r = 4 * i
      val a = t(r) + t(r + 3); val b = t(r + 1) + t(r + 2)
      val c = t(r + 1) - t(r + 2); val d = t(r) - t(r + 3)
      out(r) = (a + b + 3) >> 3; out(r + 1) = (c + d + 3) >> 3
      out(r + 2) = (a - b + 3) >> 3; out(r + 3) = (d - c + 3) >> 3
    }
    out
  }

  private def clamp(v: Int) = math.max(0, math.min(255, v))

  /** Reference reconstruction of the fixture: borders, per-segment
    * dequant, prediction, transform adds — written flat from the RFC,
    * independent of the decoder's plane layout. Returns (Y, U, V) as
    * (x, y) → value maps over the full macroblock canvas. */
  private def reconstructRef(mbs: Seq[MbFix], mbW: Int, mbH: Int,
      segQ: Array[Int]): (Array[Array[Int]], Array[Array[Int]], Array[Array[Int]]) = {
    import Vp8Decoder.{AcQLookup, DcQLookup}
    val W = mbW * 16; val H = mbH * 16
    val Y = Array.fill(H, W)(0)
    val U = Array.fill(H / 2, W / 2)(0)
    val V = Array.fill(H / 2, W / 2)(0)
    def pix(pl: Array[Array[Int]], x: Int, y: Int): Int =
      if (y < 0) 127 else if (x < 0) 129 else pl(y)(x)
    def predict(pl: Array[Array[Int]], bx: Int, by: Int, n: Int, mode: Int,
        hasA: Boolean, hasL: Boolean): Unit = mode match {
      case 0 =>
        var sum = 0; var cnt = 0
        if (hasA) { sum += (0 until n).map(i => pix(pl, bx + i, by - 1)).sum; cnt += n }
        if (hasL) { sum += (0 until n).map(i => pix(pl, bx - 1, by + i)).sum; cnt += n }
        val dc = if (cnt == 0) 128 else (sum + cnt / 2) / cnt
        for (y <- 0 until n; x <- 0 until n) pl(by + y)(bx + x) = dc
      case 1 => for (y <- 0 until n; x <- 0 until n)
        pl(by + y)(bx + x) = pix(pl, bx + x, by - 1)
      case 2 => for (y <- 0 until n; x <- 0 until n)
        pl(by + y)(bx + x) = pix(pl, bx - 1, by + y)
      case _ =>
        val tl = if (by == 0 || bx == 0) pix(pl, bx - 1, by - 1)
        else pl(by - 1)(bx - 1)
        for (y <- 0 until n; x <- 0 until n)
          pl(by + y)(bx + x) = clamp(pix(pl, bx - 1, by + y) +
            pix(pl, bx + x, by - 1) - tl)
    }
    def addBlock(pl: Array[Array[Int]], bx: Int, by: Int, res: Array[Int]): Unit =
      for (y <- 0 until 4; x <- 0 until 4)
        pl(by + y)(bx + x) = clamp(pl(by + y)(bx + x) + res(4 * y + x))
    def q127(v: Int) = math.max(0, math.min(127, v))
    // §12.3 subblock predictors, INDEPENDENT formulation: per-pixel
    // diagonal-index formulas (zVR/zVL/zHD/zHU + edge-walk arrays)
    // instead of the decoder's unrolled assignments.
    def predict4Ref(pl: Array[Array[Int]], bx: Int, by: Int, mode: Int,
        arRow: Int, arX0: Int): Unit = {
      val a = Array.tabulate(4)(i => pix(pl, bx + i, by - 1))
      val l = Array.tabulate(4)(i => pix(pl, bx - 1, by + i))
      val tl = pix(pl, bx - 1, by - 1)
      val ar = Array.tabulate(4)(i => pix(pl, math.min(arX0 + i, W - 1), arRow))
      val e9 = Array(l(3), l(2), l(1), l(0), tl) ++ a // left↑corner→above
      val e8 = a ++ ar // above→above-right
      def s3(p: Int, q: Int, r: Int) = (p + 2 * q + r + 2) >> 2
      def s2(p: Int, q: Int) = (p + q + 1) >> 1
      def px(x: Int, y: Int): Int = mode match {
        case 0 => (a.sum + l.sum + 4) >> 3
        case 1 => clamp(l(y) + a(x) - tl)
        case 2 => s3(if (x == 0) tl else a(x - 1), a(x), if (x == 3) ar(0) else a(x + 1))
        case 3 => s3(if (y == 0) tl else l(y - 1), l(y), l(math.min(y + 1, 3)))
        case 4 =>
          val i = x + y
          if (i < 6) s3(e8(i), e8(i + 1), e8(i + 2)) else s3(e8(6), e8(7), e8(7))
        case 5 => s3(e9(x - y + 3), e9(x - y + 4), e9(x - y + 5))
        case 6 =>
          val z = 2 * x - y
          if (z == -2) s3(e9(2), e9(3), e9(4))
          else if (z == -3) s3(e9(1), e9(2), e9(3))
          else {
            val j = x - (y >> 1)
            if ((z & 1) == 0) s2(e9(j + 4), e9(j + 5))
            else s3(e9(j + 3), e9(j + 4), e9(j + 5))
          }
        case 7 =>
          val z = 2 * x + y
          if (z == 8) s3(e8(4), e8(5), e8(6))
          else if (z == 9) s3(e8(5), e8(6), e8(7))
          else {
            val j = x + (y >> 1)
            if ((z & 1) == 0) s2(e8(j), e8(j + 1))
            else s3(e8(j), e8(j + 1), e8(j + 2))
          }
        case 8 =>
          val z = 2 * y - x
          if (z == -2) s3(e9(4), e9(5), e9(6))
          else if (z == -3) s3(e9(5), e9(6), e9(7))
          else {
            val j = y - (x >> 1)
            if ((z & 1) == 0) s2(e9(3 - j), e9(4 - j))
            else s3(e9(3 - j), e9(4 - j), e9(5 - j))
          }
        case _ =>
          val z = x + 2 * y
          if (z < 5) {
            val j = y + (x >> 1)
            if ((x & 1) == 0) s2(l(j), l(j + 1))
            else s3(l(j), l(j + 1), l(math.min(j + 2, 3)))
          } else if (z == 5) s3(l(2), l(3), l(3))
          else l(3)
      }
      val out = Array.tabulate(4, 4)((y, x) => px(x, y))
      for (y <- 0 until 4; x <- 0 until 4) pl(by + y)(bx + x) = out(y)(x)
    }
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val mb = mbs(mbY * mbW + mbX)
      val qi = q127(segQ(mb.segId))
      val y1dc = DcQLookup(qi); val y1ac = AcQLookup(qi)
      val y2dc = DcQLookup(qi) * 2
      val y2ac = math.max(8, AcQLookup(qi) * 155 / 100)
      val uvdc = math.min(132, DcQLookup(qi)); val uvac = AcQLookup(qi)
      if (mb.ymode == 4) {
        // B_PRED: per-subblock predict-then-add in raster order (each
        // subblock reads its already-reconstructed neighbors); luma
        // DC is coded in-block (type 3) and scales by y1dc
        for (b <- 0 until 16) {
          val colb = b % 4; val row = b / 4
          val bx = mbX * 16 + colb * 4; val by = mbY * 16 + row * 4
          val arRow = if (colb == 3) mbY * 16 - 1 else by - 1
          val arX0 = if (colb == 3) mbX * 16 + 16 else bx + 4
          predict4Ref(Y, bx, by, mb.bmodesOr(b), arRow, arX0)
          if (!mb.skip) {
            val dq = Array.tabulate(16)(i =>
              mb.y(b)(i) * (if (i == 0) y1dc else y1ac))
            addBlock(Y, bx, by, idctRef(dq))
          }
        }
      } else predict(Y, mbX * 16, mbY * 16, 16, mb.ymode, mbY > 0, mbX > 0)
      predict(U, mbX * 8, mbY * 8, 8, mb.uvmode, mbY > 0, mbX > 0)
      predict(V, mbX * 8, mbY * 8, 8, mb.uvmode, mbY > 0, mbX > 0)
      if (!mb.skip) {
        if (mb.ymode != 4) {
          val dq2 = Array.tabulate(16)(i =>
            mb.y2(i) * (if (i == 0) y2dc else y2ac))
          val dcs = iwhtRef(dq2)
          for (b <- 0 until 16) {
            val dq = Array.tabulate(16)(i =>
              if (i == 0) dcs(b) else mb.y(b)(i) * y1ac)
            // (luma DC rides Y2; y1dc scales the direct DC of B_PRED)
            val _ = y1dc
            addBlock(Y, mbX * 16 + (b % 4) * 4, mbY * 16 + (b / 4) * 4, idctRef(dq))
          }
        }
        for (b <- 0 until 4) {
          val dqU = Array.tabulate(16)(i => mb.u(b)(i) * (if (i == 0) uvdc else uvac))
          val dqV = Array.tabulate(16)(i => mb.v(b)(i) * (if (i == 0) uvdc else uvac))
          addBlock(U, mbX * 8 + (b % 2) * 4, mbY * 8 + (b / 2) * 4, idctRef(dqU))
          addBlock(V, mbX * 8 + (b % 2) * 4, mbY * 8 + (b / 2) * 4, idctRef(dqV))
        }
      }
    }
    (Y, U, V)
  }

  // ---- independent §15 loop-filter replay ---------------------------

  private def c8(v: Int): Int = math.max(-128, math.min(127, v))

  private def lfLimits(level: Int, sharp: Int): (Int, Int, Int, Int) = {
    var i = level
    if (sharp > 0) { i >>= (if (sharp > 4) 2 else 1); if (i > 9 - sharp) i = 9 - sharp }
    if (i < 1) i = 1
    (i, (level + 2) * 2 + i, level * 2 + i,
      if (level >= 40) 2 else if (level >= 15) 1 else 0)
  }

  /** One eight-tap segment in the signed domain; get/set address
    * offsets across the edge (-4..3, q0 at 0). */
  private def lfSeg(get: Int => Int, set: (Int, Int) => Unit, interior: Int,
      edge: Int, hevT: Int, mbEdge: Boolean, simple: Boolean): Unit = {
    val s = (-4 to 3).map(o => get(o) - 128)
    val (p3, p2, p1, p0, q0, q1, q2, q3) =
      (s(0), s(1), s(2), s(3), s(4), s(5), s(6), s(7))
    def put(o: Int, v: Int): Unit = set(o, v + 128)
    if (simple) {
      if (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= edge) {
        val a = c8(c8(p1 - q1) + 3 * (q0 - p0))
        put(0, c8(q0 - (c8(a + 4) >> 3))); put(-1, c8(p0 + (c8(a + 3) >> 3)))
      }
      return
    }
    val mask = math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= edge &&
      Seq(p3 - p2, p2 - p1, p1 - p0, q1 - q0, q2 - q1, q3 - q2)
        .forall(d => math.abs(d) <= interior)
    if (!mask) return
    val hev = math.abs(p1 - p0) > hevT || math.abs(q1 - q0) > hevT
    if (mbEdge && !hev) {
      val w = c8(c8(p1 - q1) + 3 * (q0 - p0))
      put(0, c8(q0 - c8((27 * w + 63) >> 7))); put(-1, c8(p0 + c8((27 * w + 63) >> 7)))
      put(1, c8(q1 - c8((18 * w + 63) >> 7))); put(-2, c8(p1 + c8((18 * w + 63) >> 7)))
      put(2, c8(q2 - c8((9 * w + 63) >> 7))); put(-3, c8(p2 + c8((9 * w + 63) >> 7)))
    } else {
      val a = c8((if (hev) c8(p1 - q1) else 0) + 3 * (q0 - p0))
      val f = c8(a + 4) >> 3
      put(0, c8(q0 - f)); put(-1, c8(p0 + (c8(a + 3) >> 3)))
      if (!mbEdge && !hev) {
        val f2 = (f + 1) >> 1
        put(1, c8(q1 - f2)); put(-2, c8(p1 + f2))
      }
    }
  }

  private def lfEdge(pl: Array[Array[Int]], ex: Int, ey: Int, len: Int,
      vertical: Boolean, interior: Int, edge: Int, hevT: Int,
      mbEdge: Boolean, simple: Boolean): Unit =
    for (i <- 0 until len) {
      val (cx, cy) = if (vertical) (ex, ey + i) else (ex + i, ey)
      if (vertical)
        lfSeg(o => pl(cy)(cx + o), (o, v) => pl(cy)(cx + o) = v,
          interior, edge, hevT, mbEdge, simple)
      else
        lfSeg(o => pl(cy + o)(cx), (o, v) => pl(cy + o)(cx) = v,
          interior, edge, hevT, mbEdge, simple)
    }

  /** Replay of the decoder's filter traversal over the reference
    * reconstruction: raster MBs, column edges (MB then interior) then
    * row edges; per-MB level from the ABS segment filter values +
    * intra ref delta; interior edges skipped on skip MBs; the simple
    * filter touches luma only. */
  private def lfRef(yP: Array[Array[Int]], uP: Array[Array[Int]],
      vP: Array[Array[Int]], mbs: Seq[MbFix], mbW: Int, mbH: Int,
      filterType: Int, sharp: Int, segF: Array[Int]): Unit = {
    val simple = filterType == 1
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val mb = mbs(mbY * mbW + mbX)
      val level = math.max(0, math.min(63, segF(mb.segId)))
      if (level > 0) {
        val (in, mbE, sbE, hevT) = lfLimits(level, sharp)
        val interiorEdges = !mb.skip || mb.ymode == 4
        def planes(f: (Array[Array[Int]], Int, Int, Int) => Unit): Unit = {
          f(yP, mbX * 16, mbY * 16, 16)
          if (!simple) { f(uP, mbX * 8, mbY * 8, 8); f(vP, mbX * 8, mbY * 8, 8) }
        }
        if (mbX > 0) planes((p, x, y, n) =>
          lfEdge(p, x, y, n, vertical = true, in, mbE, hevT, mbEdge = true, simple))
        if (interiorEdges) planes((p, x, y, n) =>
          (4 until n by 4).foreach(o =>
            lfEdge(p, x + o, y, n, vertical = true, in, sbE, hevT, mbEdge = false, simple)))
        if (mbY > 0) planes((p, x, y, n) =>
          lfEdge(p, x, y, n, vertical = false, in, mbE, hevT, mbEdge = true, simple))
        if (interiorEdges) planes((p, x, y, n) =>
          (4 until n by 4).foreach(o =>
            lfEdge(p, x, y + o, n, vertical = false, in, sbE, hevT, mbEdge = false, simple)))
      }
    }
  }

  private def yuv2rgb(y: Int, u: Int, v: Int): (Int, Int, Int) = {
    val c = 298 * (y - 16)
    (clamp((c + 409 * (v - 128) + 128) >> 8),
      clamp((c - 100 * (u - 128) - 208 * (v - 128) + 128) >> 8),
      clamp((c + 516 * (u - 128) + 128) >> 8))
  }

  // the 2×2-MB fixture: all four 16×16 modes, a skip MB, per-segment
  // quantizers, category tokens, negative coefficients, zero runs
  private def fixture(): (Seq[MbFix], Array[Int]) = {
    val segQ = Array(40, 60, 0, 100)
    def blk(pairs: (Int, Int)*): Array[Int] = {
      val a = new Array[Int](16)
      pairs.foreach { case (i, v) => a(i) = v }
      a
    }
    val mb00 = MbFix(0, skip = false, ymode = 0, uvmode = 3,
      y2 = blk(0 -> 3, 1 -> -2, 5 -> 1),
      y = Array.tabulate(16)(b => if (b % 3 == 0) blk(1 -> 2, 4 -> -1) else zeros),
      u = Array(blk(0 -> 1, 2 -> 6), zeros, blk(0 -> -2), zeros),
      v = Array(zeros, blk(1 -> 1), zeros, zeros))
    val mb10 = MbFix(1, skip = true, ymode = 1, uvmode = 0,
      y2 = zeros, y = Array.fill(16)(zeros), u = Array.fill(4)(zeros),
      v = Array.fill(4)(zeros))
    val mb01 = MbFix(2, skip = false, ymode = 2, uvmode = 1,
      y2 = blk(0 -> -5),
      y = Array.tabulate(16)(b =>
        if (b == 0) blk(1 -> 6, 15 -> -1) // cat1 + a trailing coeff
        else if (b == 5) blk(2 -> -9) // cat2, zero run before it
        else zeros),
      u = Array.fill(4)(zeros),
      v = Array(blk(0 -> 2, 1 -> 2, 2 -> 2), zeros, zeros, zeros))
    val mb11 = MbFix(3, skip = false, ymode = 3, uvmode = 2,
      y2 = blk(0 -> 1, 15 -> 1), // coeff at the last scan position
      y = Array.tabulate(16)(b =>
        if (b == 15) blk(1 -> 15, 2 -> -40, 3 -> 80) // cat3..cat5
        else zeros),
      u = Array(zeros, zeros, zeros, blk(0 -> 1)),
      v = Array.fill(4)(zeros))
    (Seq(mb00, mb10, mb01, mb11), segQ)
  }

  test("IDCT/IWHT structure: DC impulse is flat, AC impulses are additive") {
    for (dc <- Seq(8, 100, -13, 2000)) {
      val out = idctRef(blkOf(0 -> dc))
      assert(out.toSeq === Seq.fill(16)((dc + 4) >> 3))
      val w = iwhtRef(blkOf(0 -> dc))
      assert(w.toSeq === Seq.fill(16)((dc + 3) >> 3))
    }
    // linearity of the integer transform holds on shift-safe inputs
    // (multiples of 8 keep every intermediate exact through >>16)
    val a = blkOf(1 -> 64); val b = blkOf(4 -> -128)
    val sum = idctRef(Array.tabulate(16)(i => a(i) + b(i)))
    val apart = idctRef(a).zip(idctRef(b)).map { case (x, y) => x + y }
    // (x+4>>3) + (y+4>>3) vs (x+y+4)>>3 differ by rounding only
    sum.zip(apart).foreach { case (s, t) => assert(math.abs(s - t) <= 1) }
    // and the decoder's in-place forms agree with the reference forms
    val probe = Array.tabulate(16)(i => (i * 37 - 80) * 4)
    val inPlace = probe.clone(); Vp8Decoder.idct4x4(inPlace)
    assert(inPlace.toSeq === idctRef(probe).toSeq)
    assert(Vp8Decoder.iwht4x4(probe).toSeq === iwhtRef(probe).toSeq)
  }

  private def blkOf(pairs: (Int, Int)*): Array[Int] = {
    val a = new Array[Int](16)
    pairs.foreach { case (i, v) => a(i) = v }
    a
  }

  test("full keyframe roundtrip: tokens, Y2/WHT, segmentation, partitions, all modes") {
    val (mbs, segQ) = fixture()
    val webp = encodeFrame(mbs, 2, 2, segQ, nParts = 2)
    val (expY, expU, expV) = reconstructRef(mbs, 2, 2, segQ)
    val fOpt = Vp8Decoder.parseHeader(webp)
    assert(fOpt.isDefined && fOpt.get.nDctPartitions === 2)
    val frame = {
      val (s, e) = riffRange(webp)
      Vp8Decoder.decodeFrame(webp, s, e)
    }
    assert(frame.isDefined, "keyframe must decode")
    val f = frame.get
    assert((f.width, f.height) === ((32, 32)))
    for (y <- 0 until 32; x <- 0 until 32)
      assert(f.yAt(x, y) === expY(y)(x), s"luma ($x,$y)")
    for (y <- 0 until 16; x <- 0 until 16) {
      assert(f.uAt(x, y) === expU(y)(x), s"U ($x,$y)")
      assert(f.vAt(x, y) === expV(y)(x), s"V ($x,$y)")
    }
    // decode() means equal the reference means through the same YUV→RGB
    val img = graft.ops.MultimodalOps.decodeImage(webp)
    assert(img.isDefined, "lossy WebP must take the pixel tier now")
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    for (y <- 0 until 32; x <- 0 until 32) {
      val (r, g, b) = yuv2rgb(expY(y)(x), expU(y / 2)(x / 2), expV(y / 2)(x / 2))
      sr += r; sg += g; sb += b
    }
    assert(img.get === graft.ops.MultimodalOps.DecodedImage(32, 32,
      sr / 1024, sg / 1024, sb / 1024))
  }

  private def riffRange(p: Array[Byte]): (Int, Int) = {
    // VP8 payload starts after RIFF(12) + chunk header(8)
    (20, p.length)
  }

  test("pixel tier: lossy WebP hashes identically to a PPM of the same pixels; rendition floor holds") {
    import graft.functions.DHash64
    val (mbs, segQ) = fixture()
    val webp = encodeFrame(mbs, 2, 2, segQ, nParts = 1)
    val (expY, expU, expV) = reconstructRef(mbs, 2, 2, segQ)
    def rgb(x: Int, y: Int): (Int, Int, Int) =
      yuv2rgb(expY(y)(x), expU(y / 2)(x / 2), expV(y / 2)(x / 2))
    val ppmBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"P6\n32 32\n255\n".getBytes("US-ASCII"))
      for (y <- 0 until 32; x <- 0 until 32) {
        val (r, g, b) = rgb(x, y); bos.write(r); bos.write(g); bos.write(b)
      }
      bos.toByteArray
    }
    assert(DHash64.hash(webp) === DHash64.hash(ppmBytes),
      "same pixels must hash identically across VP8 and PPM (the perceptual point)")
    // rendition: one coefficient bumped = a re-encode-grade perturbation;
    // the hash must stay within q166's Hamming ≤ 3 join radius
    val (mbs2, _) = fixture()
    mbs2.head.y(0)(1) += 1
    val rendition = encodeFrame(mbs2, 2, 2, segQ, nParts = 1)
    val d = java.lang.Long.bitCount(
      DHash64.hash(webp) ^ DHash64.hash(rendition))
    assert(d <= 3, s"rendition moved $d hash bits")
  }

  test("loop filter roundtrip: simple (luma-only) and normal (3-tap/hev, chroma) forms") {
    val (mbs, segQ) = fixture()
    // abs segment filter levels: a level-0 MB (the skip MB's segment),
    // a sub-15 level, a >=15 (hev-active) and a >=40 one
    val segF = Array(18, 0, 44, 31)
    for (ft <- Seq(0, 1); sharp <- Seq(0, 3)) {
      val webp = encodeFrame(mbs, 2, 2, segQ, nParts = 1, filterType = ft,
        filterLevel = 21 /* ignored under abs segment values */,
        sharpness = sharp, segF = segF)
      val (expY, expU, expV) = reconstructRef(mbs, 2, 2, segQ)
      lfRef(expY, expU, expV, mbs, 2, 2, ft, sharp, segF)
      val f = Vp8Decoder.decodeFrame(webp, 20, webp.length).get
      for (y <- 0 until 32; x <- 0 until 32)
        assert(f.yAt(x, y) === expY(y)(x),
          s"luma ($x,$y) filterType=$ft sharp=$sharp")
      for (y <- 0 until 16; x <- 0 until 16) {
        assert(f.uAt(x, y) === expU(y)(x), s"U ($x,$y) ft=$ft sharp=$sharp")
        assert(f.vAt(x, y) === expV(y)(x), s"V ($x,$y) ft=$ft sharp=$sharp")
      }
    }
    // and the filter genuinely moves pixels (the roundtrip isn't
    // vacuously comparing two unfiltered frames)
    val unfiltered = encodeFrame(mbs, 2, 2, segQ, nParts = 1)
    val filtered = encodeFrame(mbs, 2, 2, segQ, nParts = 1, filterType = 0,
      segF = segF)
    val f0 = Vp8Decoder.decodeFrame(unfiltered, 20, unfiltered.length).get
    val f1 = Vp8Decoder.decodeFrame(filtered, 20, filtered.length).get
    val moved = (for (y <- 0 until 32; x <- 0 until 32
      if f0.yAt(x, y) != f1.yAt(x, y)) yield 1).size
    assert(moved > 0, "normal filter at level 18-44 must adjust some edges")
  }

  test("filter limits: sharpness clamps the interior limit, level sets hev threshold") {
    assert(Vp8Decoder.filterLimits(0, 0) === ((1, 5, 1, 0)))
    assert(Vp8Decoder.filterLimits(18, 0) === ((18, 58, 54, 1)))
    assert(Vp8Decoder.filterLimits(18, 3) === ((6, 46, 42, 1)))
    assert(Vp8Decoder.filterLimits(44, 7) === ((2, 94, 90, 2)))
    assert(Vp8Decoder.filterLimits(63, 5) === ((4, 134, 130, 2)))
  }

  // ---- B_PRED (the 4×4 intra family) ---------------------------------

  /** The engine-local stand-in tables, injected as the SUPPLIED table
    * set ([[graft.ops.Vp8Tables]]): B_PRED decodes only with supplied
    * tables, and injecting the same values the fixture encoder uses
    * exercises the identical resolution path a deployment takes with
    * the RFC constants. */
  private def engineTables: graft.ops.Vp8Tables.Tables =
    graft.ops.Vp8Tables.Tables(
      Vp8Decoder.defaultCoeffProbs(),
      Array.fill(4, 8, 3, 11)(Vp8Decoder.CoeffUpdateProb),
      Vp8Decoder.KfBmodeProbs)

  private def withTables[A](t: graft.ops.Vp8Tables.Tables)(body: => A): A = {
    graft.ops.Vp8Tables.injected = Some(t)
    try body finally graft.ops.Vp8Tables.injected = None
  }


  /** A 2×2 frame exercising every B_* mode, cross-MB subblock-mode
    * contexts (including the implied mode of a non-B neighbor), a
    * skipped B_PRED MB, and type-3 in-block DC coefficients. */
  private def bpredFixture(): (Seq[MbFix], Array[Int]) = {
    val segQ = Array(40, 60, 0, 100)
    def blk(pairs: (Int, Int)*): Array[Int] = {
      val a = new Array[Int](16)
      pairs.foreach { case (i, v) => a(i) = v }
      a
    }
    // all ten modes across the first MB; residuals on a spread of
    // blocks (in-block DC + ACs — the type-3 path)
    val mb00 = MbFix(0, skip = false, ymode = 4, uvmode = 3,
      y2 = zeros,
      y = Array.tabulate(16)(b =>
        if (b % 4 == 0) blk(0 -> 3, 1 -> -2) // DC + AC in one block
        else if (b == 5) blk(0 -> -7) // cat1-range DC
        else if (b == 10) blk(2 -> 9, 15 -> 1) // zero-run + tail
        else zeros),
      u = Array(blk(0 -> 1), zeros, zeros, zeros),
      v = Array(zeros, zeros, blk(1 -> -1), zeros),
      bmodes = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 1, 2, 3, 4, 5))
    // a non-B neighbor: its implied submode (V → B_VE) must feed
    // mb11's left context and mb01 reads nothing from it
    val mb10 = MbFix(1, skip = false, ymode = 1, uvmode = 0,
      y2 = blk(0 -> 2), y = Array.fill(16)(zeros),
      u = Array.fill(4)(zeros), v = Array.fill(4)(zeros))
    // below mb00: above contexts are mb00's bottom row (2,3,4,5)
    val mb01 = MbFix(2, skip = false, ymode = 4, uvmode = 1,
      y2 = zeros,
      y = Array.tabulate(16)(b => if (b == 3) blk(0 -> 80) else zeros), // cat5 DC
      u = Array.fill(4)(zeros), v = Array.fill(4)(zeros),
      bmodes = Array(9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 9, 8, 7, 6, 5, 4))
    // skipped B_PRED: prediction-only reconstruction, Y2 contexts
    // untouched, loop-filter interior edges still run
    val mb11 = MbFix(3, skip = true, ymode = 4, uvmode = 2,
      y2 = zeros, y = Array.fill(16)(zeros),
      u = Array.fill(4)(zeros), v = Array.fill(4)(zeros),
      bmodes = Array(4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 1, 1, 2, 2))
    (Seq(mb00, mb10, mb01, mb11), segQ)
  }

  test("B_PRED keyframe roundtrip: all ten 4x4 modes, contexts, interleaved recon") {
    withTables(engineTables) {
    val (mbs, segQ) = bpredFixture()
    val webp = encodeFrame(mbs, 2, 2, segQ, nParts = 1)
    val (expY, expU, expV) = reconstructRef(mbs, 2, 2, segQ)
    val f = Vp8Decoder.decodeFrame(webp, 20, webp.length)
    assert(f.isDefined, "B_PRED keyframe must decode now")
    for (y <- 0 until 32; x <- 0 until 32)
      assert(f.get.yAt(x, y) === expY(y)(x), s"luma ($x,$y)")
    for (y <- 0 until 16; x <- 0 until 16) {
      assert(f.get.uAt(x, y) === expU(y)(x), s"U ($x,$y)")
      assert(f.get.vAt(x, y) === expV(y)(x), s"V ($x,$y)")
    }
    // the pixel tier serves it
    assert(graft.ops.MultimodalOps.decodeImage(webp).isDefined)
    }
  }

  test("B_PRED + loop filter: skipped B_PRED MB still filters interior edges") {
    withTables(engineTables) {
    val (mbs, segQ) = bpredFixture()
    val segF = Array(18, 0, 44, 31)
    for (ft <- Seq(0, 1)) {
      val webp = encodeFrame(mbs, 2, 2, segQ, nParts = 1, filterType = ft,
        sharpness = 0, segF = segF)
      val (expY, expU, expV) = reconstructRef(mbs, 2, 2, segQ)
      lfRef(expY, expU, expV, mbs, 2, 2, ft, 0, segF)
      val f = Vp8Decoder.decodeFrame(webp, 20, webp.length).get
      for (y <- 0 until 32; x <- 0 until 32)
        assert(f.yAt(x, y) === expY(y)(x), s"luma ($x,$y) ft=$ft")
      for (y <- 0 until 16; x <- 0 until 16) {
        assert(f.uAt(x, y) === expU(y)(x), s"U ($x,$y) ft=$ft")
        assert(f.vAt(x, y) === expV(y)(x), s"V ($x,$y) ft=$ft")
      }
    }
    // the skipped B_PRED MB (bottom-right, segment 3, level 31) must
    // have moved pixels relative to the unfiltered decode — the rule
    // a skip-only interior-edge gate would miss
    val u0 = {
      val w = encodeFrame(mbs, 2, 2, segQ, nParts = 1)
      Vp8Decoder.decodeFrame(w, 20, w.length).get
    }
    val f0 = {
      val w = encodeFrame(mbs, 2, 2, segQ, nParts = 1, filterType = 0, segF = segF)
      Vp8Decoder.decodeFrame(w, 20, w.length).get
    }
    val moved = (for (y <- 16 until 32; x <- 16 until 32
      if u0.yAt(x, y) != f0.yAt(x, y)) yield 1).size
    assert(moved > 0, "filter must move pixels inside the skipped B_PRED MB")
    }
  }

  test("declared edge: truncated token data is None") {
    val (mbs, segQ) = fixture()
    // chopping the token partition tail must fail closed, not garble
    val webp = encodeFrame(mbs, 2, 2, segQ, nParts = 1)
    assert(graft.ops.MultimodalOps.decodeImage(webp.dropRight(12)).isEmpty)
    // a B_PRED MB with default (all-B_DC) subblock modes also decodes
    // — under supplied tables
    withTables(engineTables) {
      val bmbs = mbs.updated(0, mbs.head.copy(ymode = 4))
      assert(graft.ops.MultimodalOps.decodeImage(
        encodeFrame(bmbs, 2, 2, segQ, nParts = 1)).isDefined)
    }
  }

  test("without supplied tables a B_PRED stream falls to the byte tier") {
    val (mbs, segQ) = bpredFixture()
    val webp = encodeFrame(mbs, 2, 2, segQ, nParts = 1)
    // the identical bytes decode with tables and refuse without —
    // never wrong pixels tagged as real-tier output (ADVICE_r13)
    withTables(engineTables) {
      assert(Vp8Decoder.decodeFrame(webp, 20, webp.length).isDefined)
    }
    assert(Vp8Decoder.decodeFrame(webp, 20, webp.length).isEmpty)
    assert(graft.ops.MultimodalOps.decodeImage(webp).isEmpty)
  }

  test("a stream leaving coefficient slots at codec defaults is refused without tables") {
    val (mbs, segQ) = fixture()
    val webp = encodeFrame(mbs, 2, 2, segQ, nParts = 1)
    // the fixture encoder updates every slot, so the plain stream
    // decodes without tables
    assert(Vp8Decoder.decodeFrame(webp, 20, webp.length).isDefined)
    // flipping ONE update flag to "keep default" must flip the verdict
    // to None: re-encode with a single skipped slot
    val webp2 = encodeFrame(mbs, 2, 2, segQ, nParts = 1,
      skipSlot = (3, 7, 2, 10))
    assert(Vp8Decoder.decodeFrame(webp2, 20, webp2.length).isEmpty,
      "default-reliant stream must fall to the byte tier")
    // with supplied tables the same stream decodes (the skipped slot
    // reads its value from the supplied defaults)
    withTables(engineTables) {
      assert(Vp8Decoder.decodeFrame(webp2, 20, webp2.length).isDefined)
    }
  }

  test("Vp8Tables file loader: round-trip, shape and range validation") {
    import graft.ops.Vp8Tables
    val t = engineTables
    val flat = (t.coeffProbs.flatten.flatten.flatten ++
      t.coeffUpdateProbs.flatten.flatten.flatten ++
      t.kfBmodeProbs.flatten.flatten)
    assert(flat.length === 2 * 1056 + 900)
    val text = "# graft vp8 tables\n" +
      flat.grouped(16).map(_.mkString(" ")).mkString("\n")
    val f = java.io.File.createTempFile("vp8tables", ".txt")
    try {
      val w = new java.io.PrintWriter(f, "UTF-8")
      w.print(text); w.close()
      val loaded = Vp8Tables.loadFile(f)
      assert(loaded.isDefined, "well-formed table file must load")
      // the loaded set decodes a B_PRED stream exactly like the
      // directly-injected engine tables
      val (mbs, segQ) = bpredFixture()
      val webp = encodeFrame(mbs, 2, 2, segQ, nParts = 1)
      val viaFile = withTables(loaded.get) {
        Vp8Decoder.decodeFrame(webp, 20, webp.length)
      }
      val viaInject = withTables(engineTables) {
        Vp8Decoder.decodeFrame(webp, 20, webp.length)
      }
      assert(viaFile.isDefined && viaInject.isDefined)
      for (y <- 0 until 32; x <- 0 until 32)
        assert(viaFile.get.yAt(x, y) === viaInject.get.yAt(x, y))
      // wrong count rejected whole
      assert(Vp8Tables.parseText(flat.dropRight(1).mkString(" ")).isEmpty)
      // out-of-range probability (0 and 256) rejected
      assert(Vp8Tables.parseText(
        (0 +: flat.tail).mkString(" ")).isEmpty)
      assert(Vp8Tables.parseText(
        (256 +: flat.tail).mkString(" ")).isEmpty)
      // non-integer garbage rejected
      assert(Vp8Tables.parseText("not a table").isEmpty)
      // missing file is None, not an exception
      assert(Vp8Tables.loadFile(new java.io.File(f.getPath + ".nope")).isEmpty)
    } finally f.delete()
  }
}
