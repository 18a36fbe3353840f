package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-identity proof for the driver-looped unigram-LM trainer
  * (q167/q168): an independent ENUMERATIVE reimplementation — every
  * segmentation of every word generated recursively, scored with the
  * same left-to-right double product, ties resolved by the
  * reverse-lexicographically-largest length sequence (the provable
  * closed form of the DP's longest-last-piece-wins rule) — must agree
  * with the accumulator-driven loop at every EM round, not just the
  * graded round 2. */
class UnigramSpec extends AnyFunSuite with LocalSparkSuite {
  private val Lmax = ops.TextOps.UniMaxPiece
  private val Clip = ops.TextOps.UniClip
  private val TopMulti = ops.TextOps.UniTopMulti

  private lazy val words: Map[String, Long] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .select(substring(col("word"), 1, Clip).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
  }

  private def allSegs(w: String): Seq[List[Int]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(Lmax, w.length)).flatMap(l =>
      allSegs(w.substring(l)).map(l :: _))

  /** true iff a > b in the reversed-lens lexicographic order (both
    * sum to the same word length, so neither is a proper prefix). */
  private def revLexGreater(a: List[Int], b: List[Int]): Boolean = {
    val (ra, rb) = (a.reverse, b.reverse)
    ra.zip(rb).collectFirst {
      case (x, y) if x != y => x > y
    }.getOrElse(false)
  }

  private def bruteSeg(w: String, prob: Map[String, Double]): List[Int] = {
    val scored = allSegs(w).flatMap { lens =>
      var off = 0
      var sc = 1.0
      var ok = true
      lens.foreach { l =>
        if (ok) prob.get(w.substring(off, off + l)) match {
          case Some(p) => sc *= p; off += l
          case None => ok = false
        }
      }
      if (ok) Some((lens, sc)) else None
    }
    assert(scored.nonEmpty, s"no valid segmentation for '$w'")
    scored.reduceLeft { (a, b) =>
      if (b._2 > a._2) b
      else if (b._2 < a._2) a
      else if (revLexGreater(b._1, a._1)) b
      else a
    }._1
  }

  private def bruteTrain(rounds: Int)
      : (Seq[Map[String, Long]], Map[String, Long]) = {
    val occ = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(Lmax, w.length - i)
      } occ.update(w.substring(i, i + l),
        occ.getOrElse(w.substring(i, i + l), 0L) + c)
    }
    val chars = occ.toSeq.filter(_._1.length == 1)
    val multi = occ.toSeq.filter(_._1.length >= 2)
      .sortBy { case (p, c) => (-c, p) }.take(TopMulti)
    var vocab: Map[String, Long] = (chars ++ multi).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[Map[String, Long]]
    (1 to rounds).foreach { _ =>
      val tot = vocab.valuesIterator.sum.toDouble
      val probs = vocab.map { case (p, c) => p -> c.toDouble / tot }
      val n = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, c) =>
        var off = 0
        bruteSeg(w, probs).foreach { l =>
          val piece = w.substring(off, off + l)
          n.update(piece, n.getOrElse(piece, 0L) + c)
          off += l
        }
      }
      out += n.toMap
      vocab = vocab.iterator.collect { case (p, _) if p.length == 1 =>
        p -> math.max(n.getOrElse(p, 0L), 1L)
      }.toMap ++ n.filter(_._1.length >= 2)
    }
    (out.toSeq, vocab)
  }

  test("driver-looped trainer ≡ enumerative recount at every round (N=3)") {
    val (loopOut, loopVocab) = ops.TextOps.unigramTrainLoop(spark, sfDir, 3)
    val (bruteOut, bruteVocab) = bruteTrain(3)
    assert(loopOut.size == 3)
    loopOut.zip(bruteOut).zipWithIndex.foreach { case ((l, b), r) =>
      assert(l == b, s"round ${r + 1} expected-count tables differ")
    }
    assert(loopVocab == bruteVocab, "final post-M-step vocab differs")
  }

  test("Viterbi paths reconstruct every word") {
    val (_, vocab) = ops.TextOps.unigramTrainLoop(spark, sfDir, 2)
    val tot = vocab.valuesIterator.sum.toDouble
    val probs = vocab.map { case (p, c) => p -> c.toDouble / tot }
    words.keysIterator.foreach { w =>
      val lens = ops.TextOps.uniViterbi(w, probs)
      assert(lens.sum == w.length, s"path of '$w' does not cover it")
      var off = 0
      val pieces = lens.map { l =>
        val p = w.substring(off, off + l); off += l; p
      }
      assert(pieces.mkString == w)
      assert(pieces.forall(probs.contains), s"'$w' used an OOV piece")
    }
  }

  test("score ties resolve to the longer piece (oracle CASE-chain rule)") {
    // exact tie by powers of two: 0.5 * 0.5 == 0.25 bit-for-bit
    val probs = Map("a" -> 0.5, "b" -> 0.5, "ab" -> 0.25)
    assert(ops.TextOps.uniViterbi("ab", probs).toList == List(2))
    assert(bruteSeg("ab", probs) == List(2))
  }

  test("q168 fertility totals match a driver recount under the trained model") {
    import spark.implicits._
    val fert = ops.TextOps.unigramFertility(spark, sfDir)
      .select(col("source"), col("n_words"), col("n_tokens"))
      .as[(String, Long, Long)].collect()
      .map { case (s, w, t) => s -> (w, t) }.toMap
    // independent recount: per-source word instances segmented under
    // the same round-2 model via the BRUTE-FORCE path
    val (_, vocab) = bruteTrain(2)
    val tot = vocab.valuesIterator.sum.toDouble
    val probs = vocab.map { case (p, c) => p -> c.toDouble / tot }
    val bySource = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .select(col("source"), substring(col("word"), 1, Clip).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val expect = bySource.groupBy(_._1).map { case (src, rows) =>
      val nw = rows.map(_._3).sum
      val nt = rows.map { case (_, w, c) => c * bruteSeg(w, probs).size }.sum
      src -> (nw, nt)
    }
    assert(fert == expect)
  }
}
