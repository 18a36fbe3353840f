package graft

/** Shared TEST-SIDE VP8 encode helpers (the WebpDecoderSpec posture:
  * the JDK ships no VP8 codec, so fixtures are written from the RFC):
  * the §7.1 boolean arithmetic encoder, the generic §8.2 tree writer,
  * and the §13.3 coefficient-block token encoder. Used by
  * Vp8DecoderSpec's frame fixtures and GraftProps' grammar
  * properties. */
object Vp8TestCodec {

  /** RFC 6386 §7.1 boolean arithmetic encoder (libvpx stop_encode
    * flush: 32 trailing zero bits at probability 128). */
  final class BoolEncoder {
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

  /** Generic tree WRITE — walks the shared tree to the token's leaf
    * and emits the path bits with the node probabilities (the §8.2
    * encode direction). `start` mirrors the decoder's
    * EOB-cannot-follow-ZERO entry point. */
  def treeWrite(enc: BoolEncoder, tree: Array[Int],
      probs: Array[Int], tok: Int, start: Int = 0): Unit = {
    def go(i: Int, path: List[(Int, Int)]): Option[List[(Int, Int)]] = {
      var r: Option[List[(Int, Int)]] = None
      var b = 0
      while (b <= 1 && r.isEmpty) {
        val c = tree(i + b)
        val p2 = path :+ ((i >> 1, b))
        if (c <= 0) { if (-c == tok) r = Some(p2) }
        else r = go(c, p2)
        b += 1
      }
      r
    }
    val path = go(start, Nil)
      .getOrElse(sys.error(s"token $tok unreachable from tree node $start"))
    path.foreach { case (pi, bit) => enc.bool(probs(pi), bit) }
  }

  /** Token-encode one block of QUANTIZED levels (natural order),
    * tracking the in-block context exactly like §13.3's decode loop.
    * Returns the nonzero flag the neighbor contexts consume. */
  def encodeCoeffs(enc: BoolEncoder, levels: Array[Int],
      blockType: Int, first: Int,
      probs: Array[Array[Array[Array[Int]]]], ctx0: Int): Boolean = {
    import graft.ops.Vp8Decoder.{CatBase, CatBits, CatProbs, CoeffBands, CoeffTree, TokEob, Zigzag}
    val nzIdx = (first until 16).filter(i => levels(Zigzag(i)) != 0)
    var c = ctx0
    var prevZero = false
    if (nzIdx.isEmpty) {
      treeWrite(enc, CoeffTree, probs(blockType)(CoeffBands(first))(c), TokEob)
      return false
    }
    val last = nzIdx.max
    var idx = first
    while (idx <= last) {
      val v = levels(Zigzag(idx))
      val pr = probs(blockType)(CoeffBands(idx))(c)
      val start = if (prevZero) 2 else 0
      if (v == 0) {
        treeWrite(enc, CoeffTree, pr, 0, start); c = 0; prevZero = true
      } else {
        val av = math.abs(v)
        val tok =
          if (av <= 4) av
          else (0 to 5).find(k => k == 5 || av < CatBase(k) + (1 << CatBits(k)))
            .map(_ + 5).get
        treeWrite(enc, CoeffTree, pr, tok, start)
        if (tok >= 5) {
          val cat = tok - 5
          val extra = av - CatBase(cat)
          var j = 0
          while (j < CatBits(cat)) {
            enc.bool(CatProbs(cat)(j), (extra >> (CatBits(cat) - 1 - j)) & 1)
            j += 1
          }
        }
        enc.bool(128, if (v < 0) 1 else 0)
        c = if (av > 1) 2 else 1
        prevZero = false
      }
      idx += 1
    }
    if (last < 15)
      treeWrite(enc, CoeffTree, probs(blockType)(CoeffBands(last + 1))(c), TokEob)
    true
  }
}
