package graft.ops

/** Operator-suppliable VP8 codec-default probability tables.
  *
  * RFC 6386 fixes three constant tables a conforming decoder needs for
  * streams that do not carry their own values: the default coefficient
  * probabilities (§13.5, 4×8×3×11), the probabilities coding the
  * per-slot coefficient-update flags (§13.4, 4×8×3×11), and the
  * keyframe subblock-mode probabilities (§11.4, 10×10×9 — these have
  * NO in-stream update mechanism at all). The RFC's values are not
  * reproducible in this offline container, so [[Vp8Decoder]] ships
  * engine-local stand-ins and STRICTLY refuses any stream that would
  * depend on them ("a wrong pixel is worse than no pixel"): without a
  * supplied table set, a frame that leaves any coefficient slot at its
  * default, or that uses B_PRED at all, falls to the byte tier.
  *
  * A deployment that has the RFC text pastes the three tables into one
  * plain-text file — integers in RFC reading order, whitespace
  * separated, `#`-comments allowed: first the 1056 default coefficient
  * probabilities (type-major t,b,c,l), then the 1056 update-flag
  * probabilities in the same order, then the 900 kf_bmode entries
  * (above-major a,l,node) — and points the engine at it with the
  * `graft.vp8.tables` system property or the `GRAFT_VP8_TABLES`
  * environment variable (on a cluster, ship the file with
  * `spark-submit --files` and give the executor-local name; the
  * loader runs once per JVM). With the tables present, libvpx-encoded
  * lossy WebP reaches the pixel tier; without them nothing changes
  * except the strictness above. Shape and range (probabilities are
  * 1..255) are validated at load; a malformed file is treated as
  * absent and reported once on stderr rather than half-applied.
  */
object Vp8Tables {

  /** One resolved table set, shapes exactly as the decoder consumes
    * them. Arrays are treated as immutable by contract; the decoder
    * deep-copies [[coeffProbs]] before applying in-stream updates. */
  final case class Tables(
      coeffProbs: Array[Array[Array[Array[Int]]]],
      coeffUpdateProbs: Array[Array[Array[Array[Int]]]],
      kfBmodeProbs: Array[Array[Array[Int]]])

  private[graft] val CoeffSlots = 4 * 8 * 3 * 11 // 1056
  private[graft] val BmodeSlots = 10 * 10 * 9 // 900

  /** Test/embedding hook: a directly-injected table set wins over the
    * conf-loaded one. Scoped-use only (set, exercise, restore). */
  @volatile private[graft] var injected: Option[Tables] = None

  private lazy val fromConf: Option[Tables] =
    sys.props.get("graft.vp8.tables").orElse(sys.env.get("GRAFT_VP8_TABLES"))
      .flatMap { path =>
        val t = loadFile(new java.io.File(path))
        if (t.isEmpty)
          System.err.println(
            s"[graft] VP8 table file '$path' missing or malformed — " +
              "codec-default streams stay on the byte tier")
        t
      }

  /** The table set in effect for this JVM, if any. */
  def resolved: Option[Tables] =
    if (injected.isDefined) injected else fromConf

  /** Parse a table file: `#` starts a comment to end of line; tokens
    * are base-10 integers. Exactly 1056 + 1056 + 900 values, each in
    * 1..255, or the file is rejected whole. */
  def loadFile(f: java.io.File): Option[Tables] = {
    if (!f.isFile) return None
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try parseText(src.mkString)
    catch { case _: java.io.IOException => None }
    finally src.close()
  }

  private[graft] def parseText(text: String): Option[Tables] = {
    val toks = text.linesIterator
      .map(l => { val h = l.indexOf('#'); if (h >= 0) l.substring(0, h) else l })
      .flatMap(_.split("\\s+")).filter(_.nonEmpty).toArray
    if (toks.exists(t => !t.matches("-?\\d+"))) return None
    fromValues(toks.map(_.toInt))
  }

  private[graft] def fromValues(vals: Array[Int]): Option[Tables] = {
    if (vals.length != 2 * CoeffSlots + BmodeSlots) return None
    if (vals.exists(v => v < 1 || v > 255)) return None
    var k = 0
    def next(): Int = { val v = vals(k); k += 1; v }
    def coeff(): Array[Array[Array[Array[Int]]]] =
      Array.fill(4)(Array.fill(8)(Array.fill(3)(Array.fill(11)(next()))))
    val cp = coeff()
    val up = coeff()
    val bm = Array.fill(10)(Array.fill(10)(Array.fill(9)(next())))
    Some(Tables(cp, up, bm))
  }
}
