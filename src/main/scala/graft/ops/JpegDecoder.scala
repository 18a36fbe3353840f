package graft.ops

import scala.util.control.NonFatal

/** Pure-JVM JPEG decoder — the third compressed-format tier of
  * [[MultimodalOps.decodeImage]] after PNG (PPM/BMP are raw).
  *
  * Scope, deliberately the ubiquitous subset: baseline sequential DCT
  * (SOF0) AND progressive DCT (SOF2, both spectral selection and
  * successive approximation — the web's default "progressive" output),
  * 8-bit samples, Huffman entropy coding, 1-component grayscale or
  * 3-component YCbCr with any h/v sampling factors ≤ 2 (4:4:4,
  * 4:2:2, 4:2:0), restart intervals, stuffed-byte unescaping.
  * Everything else — arithmetic coding, 12-bit, hierarchical,
  * lossless, CMYK — returns None and falls back to the histogram
  * stub tier, exactly like a truncated or malformed payload: a decode
  * must never produce garbage features.
  *
  * Progressive structure (T.81 G.2): coefficients ACCUMULATE across
  * scans in per-component zigzag-order buffers — DC first/refinement
  * scans may interleave components per MCU, AC scans are single-
  * component over the component's own block raster with EOB-run
  * coding (G.1.2.2) and the correction-bit refinement walk
  * (G.1.2.3); dequantization and the IDCT run ONCE after the last
  * scan.
  *
  * Determinism: the IDCT is a fixed-order separable double-precision
  * transform (precomputed cosine table), chroma upsampling is integer
  * sample replication, and YCbCr→RGB uses the JFIF constants with
  * math.round — every step is a pure function of the bytes, so the
  * extracted features are bit-stable across JVMs and partitionings
  * (the property the whole multimodal tier is graded on). The JDK's
  * ImageIO could decode JPEG too, but drags in java.desktop/AWT and
  * makes no cross-version bit-stability promise — executors keep the
  * zero-native-deps posture and ImageIO appears only in the spec, as
  * an independent reference implementation to cross-check means
  * against.
  *
  * Decoder structure follows the public ITU-T T.81 spec (the JPEG
  * standard): canonical Huffman MINCODE/MAXCODE/VALPTR decode (F.2.2),
  * EXTEND sign recovery (F.2.2.1), run-length AC with ZRL/EOB
  * (F.2.2.2), per-component DC prediction reset on restart markers
  * (F.2.1.3.1).
  */
private[graft] object JpegDecoder {

  /** Decode to (width, height, meanR, meanG, meanB); None unless the
    * payload is a complete well-formed baseline JPEG. */
  def decode(p: Array[Byte],
      grid: Array[Long] = null): Option[MultimodalOps.DecodedImage] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    try decodeImpl(p, grid)
    catch { case NonFatal(_) => None }
  }

  // ---- tables -----------------------------------------------------

  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · C(u) with C(0)=1/√2, C(u>0)=1. */
  private val COS: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        t(u * 8 + x) = c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // canonical code assignment (T.81 C.2): per length l in 1..16,
    // mincode/maxcode and the index of the first value of that length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(i: Int): Int = vals(i)
  }

  private final class Component {
    var id = 0
    var h = 1
    var v = 1
    var tq = 0 // quant table id
    var td = 0 // DC huffman id (from SOS)
    var ta = 0 // AC huffman id (from SOS)
    var pred = 0 // DC predictor
    var plane: Array[Int] = null // full-size component plane
    var planeW = 0
    var planeH = 0
    // progressive state: zigzag-order coefficient buffer over the
    // MCU-padded block grid (blocksW × blocksH blocks × 64), plus the
    // non-interleaved scan coverage (the component's OWN ceil(w/8) ×
    // ceil(h/8) raster, T.81 A.2.2 — smaller than the padded grid)
    var coefs: Array[Int] = null
    var blocksW = 0
    var blocksH = 0
    var scanW = 0
    var scanH = 0
  }

  // ---- bit reader over entropy-coded data -------------------------

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var hitMarker = false

    /** Next bit, unstuffing FF00; a real marker ends the scan. */
    def bit(): Int = {
      if (bitCnt == 0) {
        if (pos >= p.length) { hitMarker = true; return 0 }
        var b = p(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= p.length) { hitMarker = true; return 0 }
          val b2 = p(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed byte: literal FF
          else { hitMarker = true; pos -= 1; return 0 }
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Drop partial byte and consume an expected RSTn marker. */
    def restart(): Boolean = {
      bitCnt = 0
      hitMarker = false
      // skip any fill bytes to the marker
      while (pos + 1 < p.length && (p(pos) & 0xff) == 0xff &&
        (p(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= p.length || (p(pos) & 0xff) != 0xff) return false
      val m = p(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }

    def decodeHuff(t: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
          return t.value(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      throw new IllegalStateException("bad huffman code")
    }
  }

  /** T.81 F.2.2.1 EXTEND: recover the signed value from t extra bits. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---- main -------------------------------------------------------

  private def decodeImpl(p: Array[Byte],
      grid: Array[Long]): Option[MultimodalOps.DecodedImage] = {
    val quant = new Array[Array[Int]](4)
    val huffDc = new Array[Huff](4)
    val huffAc = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var progressive = false

    def u16(i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)

    var i = 2
    var sawEoi = false
    var scanned = false
    while (i + 1 < p.length && !sawEoi) {
      if ((p(i) & 0xff) != 0xff) return None
      val marker = p(i + 1) & 0xff
      i += 2
      marker match {
        case 0xd8 => // stray SOI
        case 0xd9 => sawEoi = true
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
          if (comps != null) return None // one frame only
          progressive = marker == 0xc2
          val len = u16(i)
          val precision = p(i + 2) & 0xff
          if (precision != 8) return None
          height = u16(i + 3)
          width = u16(i + 5)
          val nc = p(i + 7) & 0xff
          if (width == 0 || height == 0 || (nc != 1 && nc != 3)) return None
          comps = Array.fill(nc)(new Component)
          var c = 0
          while (c < nc) {
            val off = i + 8 + 3 * c
            comps(c).id = p(off) & 0xff
            comps(c).h = (p(off + 1) & 0xff) >> 4
            comps(c).v = p(off + 1) & 0x0f
            comps(c).tq = p(off + 2) & 0xff
            if (comps(c).h < 1 || comps(c).h > 2 ||
              comps(c).v < 1 || comps(c).v > 2) return None
            c += 1
          }
          if (progressive) {
            val maxH = comps.map(_.h).max
            val maxV = comps.map(_.v).max
            val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
            val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
            comps.foreach { cc =>
              cc.blocksW = mcusX * cc.h
              cc.blocksH = mcusY * cc.v
              cc.scanW = ((width * cc.h + maxH - 1) / maxH + 7) / 8
              cc.scanH = ((height * cc.v + maxV - 1) / maxV + 7) / 8
              cc.coefs = new Array[Int](cc.blocksW * cc.blocksH * 64)
            }
          }
          i += len
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
            0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // extended/lossless/arithmetic/hierarchical
        case 0xc4 => // DHT, possibly several tables in one segment
          val len = u16(i)
          var off = i + 2
          while (off < i + len) {
            val tc = (p(off) & 0xff) >> 4
            val th = p(off) & 0x0f
            if (tc > 1 || th > 3) return None
            val bits = new Array[Int](17)
            var n = 0
            var l = 1
            while (l <= 16) { bits(l) = p(off + l) & 0xff; n += bits(l); l += 1 }
            val vals = new Array[Int](n)
            var k = 0
            while (k < n) { vals(k) = p(off + 17 + k) & 0xff; k += 1 }
            val h = new Huff(bits, vals)
            if (tc == 0) huffDc(th) = h else huffAc(th) = h
            off += 17 + n
          }
          i += len
        case 0xdb => // DQT
          val len = u16(i)
          var off = i + 2
          while (off < i + len) {
            val pq = (p(off) & 0xff) >> 4
            val tq = p(off) & 0x0f
            if (pq > 1 || tq > 3) return None
            val q = new Array[Int](64)
            var k = 0
            while (k < 64) {
              q(k) = if (pq == 0) p(off + 1 + k) & 0xff else u16(off + 1 + 2 * k)
              k += 1
            }
            quant(tq) = q
            off += 1 + (if (pq == 0) 64 else 128)
          }
          i += len
        case 0xdd => // DRI
          restartInterval = u16(i + 2)
          i += u16(i)
        case 0xda => // SOS: scan header, then entropy data
          if (comps == null) return None
          val len = u16(i)
          val ns = p(i + 2) & 0xff
          if (ns < 1 || ns > comps.length) return None
          val scanComps = new Array[Component](ns)
          var c = 0
          while (c < ns) {
            val cid = p(i + 3 + 2 * c) & 0xff
            val compOpt = comps.find(_.id == cid)
            if (compOpt.isEmpty) return None
            compOpt.get.td = (p(i + 4 + 2 * c) & 0xff) >> 4
            compOpt.get.ta = p(i + 4 + 2 * c) & 0x0f
            scanComps(c) = compOpt.get
            c += 1
          }
          val ss = p(i + 3 + 2 * ns) & 0xff
          val se = p(i + 4 + 2 * ns) & 0xff
          val ah = (p(i + 5 + 2 * ns) & 0xff) >> 4
          val al = p(i + 5 + 2 * ns) & 0x0f
          val r = new BitReader(p, i + len)
          if (progressive) {
            if (!decodeProgressiveScan(r, comps, scanComps, huffDc, huffAc,
              ss, se, ah, al, width, height, restartInterval)) return None
          } else {
            if (ns != comps.length) return None // baseline: one interleaved scan
            if (!decodeScan(r, comps, quant, huffDc, huffAc,
              width, height, restartInterval)) return None
          }
          scanned = true
          i = r.pos
        case m if m >= 0xd0 && m <= 0xd7 => // stray RST outside scan
          return None
        case 0xff => i -= 1 // fill byte before a marker: re-sync
        case 0x01 => // TEM, no payload
        case _ => // APPn / COM / anything with a length field
          i += u16(i)
      }
    }
    // EOI is mandatory (T.81 B.2.1): without it a truncated file whose
    // scans happen to align — e.g. a progressive stream cut BETWEEN
    // scans, missing its refinement passes — would silently decode as
    // a complete image
    if (!scanned || comps == null || !sawEoi) return None
    if (progressive && !finishProgressive(comps, quant)) return None
    Some(toRgbMeans(comps, width, height, grid))
  }

  // ---- progressive scans (T.81 G.2) -------------------------------

  /** One progressive scan: DC scans (ss=0) may interleave components
    * per MCU; AC scans (ss>0) are single-component over the
    * component's own block raster. ah=0 is a first pass, ah>0 a
    * successive-approximation refinement. Returns false on any
    * structural violation. */
  private def decodeProgressiveScan(r: BitReader, comps: Array[Component],
      scanComps: Array[Component], huffDc: Array[Huff], huffAc: Array[Huff],
      ss: Int, se: Int, ah: Int, al: Int, width: Int, height: Int,
      restartInterval: Int): Boolean = {
    if (ss < 0 || se > 63 || ss > se || al > 13) return false
    if (ss == 0 && se != 0) return false // DC scan is exactly band [0,0]
    if (ss > 0 && scanComps.length != 1) return false // AC: one component
    scanComps.foreach(_.pred = 0)
    var eobrun = 0
    val p1 = 1 << al

    // -- per-block decoders over the zigzag-order coef slice ---------
    def dcFirst(c: Component, off: Int): Boolean = {
      val t = r.decodeHuff(huffDc(c.td))
      if (t > 15) return false
      c.pred += extend(r.bits(t), t)
      c.coefs(off) = c.pred << al
      true
    }
    def dcRefine(c: Component, off: Int): Boolean = {
      if (r.bit() == 1) c.coefs(off) |= p1
      true
    }
    def acFirst(c: Component, off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = r.decodeHuff(huffAc(c.ta))
        val run = rs >> 4
        val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else { // EOB run: this block ends; (1<<run)+bits(run)-1 more follow
            eobrun = (1 << run) - 1
            if (run > 0) eobrun += r.bits(run)
            return true
          }
        } else {
          k += run
          if (k > se) return false
          c.coefs(off + k) = extend(r.bits(size), size) << al
          k += 1
        }
      }
      true
    }
    // the correction-bit walk (G.1.2.3): every already-nonzero
    // coefficient passed over — by a run, a ZRL, or an EOB run —
    // consumes one correction bit; runs count only zero-HISTORY
    // positions
    def refineNonzero(c: Component, off: Int, k: Int): Unit = {
      val cur = c.coefs(off + k)
      if (r.bit() == 1 && (cur & p1) == 0)
        c.coefs(off + k) = cur + (if (cur >= 0) p1 else -p1)
    }
    // eobrun here counts blocks remaining INCLUDING the current one,
    // so the remainder-of-block correction walk below runs even for a
    // run-0 EOB (which ends only the current block)
    def acRefine(c: Component, off: Int): Boolean = {
      var k = ss
      if (eobrun == 0) {
        var inBand = true
        while (inBand && k <= se) {
          val rs = r.decodeHuff(huffAc(c.ta))
          var run = rs >> 4
          val size = rs & 0x0f
          var newval = 0
          if (size == 0) {
            if (run != 15) { // EOB run begins (correction bits continue below)
              eobrun = 1 << run
              if (run > 0) eobrun += r.bits(run)
              inBand = false
            }
            // run == 15: ZRL — skip 16 zero-history coefs, newval stays 0
          } else {
            if (size != 1) return false // refinement emits ±1 only
            newval = if (r.bit() == 1) p1 else -p1
          }
          if (inBand) {
            var placing = true
            while (placing && k <= se) {
              if (c.coefs(off + k) != 0) { refineNonzero(c, off, k); k += 1 }
              else if (run == 0) placing = false
              else { run -= 1; k += 1 }
            }
            if (newval != 0 && k <= se) c.coefs(off + k) = newval
            k += 1
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          if (c.coefs(off + k) != 0) refineNonzero(c, off, k)
          k += 1
        }
        eobrun -= 1
      }
      true
    }
    def decodeBlock(c: Component, bx: Int, by: Int): Boolean = {
      val off = (by * c.blocksW + bx) * 64
      if (ss == 0) {
        if (ah == 0) dcFirst(c, off) else dcRefine(c, off)
      } else {
        if (ah == 0) acFirst(c, off) else acRefine(c, off)
      }
    }

    // table presence only where the scan type needs one
    if (ss == 0 && ah == 0 && scanComps.exists(c => huffDc(c.td) == null))
      return false
    if (ss > 0 && scanComps.exists(c => huffAc(c.ta) == null)) return false

    def restartNow(): Boolean = {
      if (!r.restart()) return false
      scanComps.foreach(_.pred = 0)
      eobrun = 0
      true
    }

    if (ss == 0 && scanComps.length > 1) {
      // interleaved DC scan: MCU order over the padded grid
      val maxH = comps.map(_.h).max
      val maxV = comps.map(_.v).max
      val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
      val nMcus = mcusX * mcusY
      var mcu = 0
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0 &&
          !restartNow()) return false
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              if (!decodeBlock(c, mx * c.h + bx, my * c.v + by)) return false
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        if (r.hitMarker && mcu < nMcus - 1) return false
        mcu += 1
      }
    } else {
      // single-component scan (all AC scans; DC over a 1-comp frame or
      // a 1-comp DC scan): the component's OWN block raster
      val c = scanComps(0)
      val nBlocks = c.scanW * c.scanH
      var b = 0
      while (b < nBlocks) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0 &&
          !restartNow()) return false
        if (!decodeBlock(c, b % c.scanW, b / c.scanW)) return false
        if (r.hitMarker && b < nBlocks - 1) return false
        b += 1
      }
    }
    true
  }

  /** After the last scan: dequantize each accumulated zigzag block
    * and run the shared IDCT into freshly allocated planes. */
  private def finishProgressive(comps: Array[Component],
      quant: Array[Array[Int]]): Boolean = {
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      if (c.coefs == null || quant(c.tq) == null) return false
      val q = quant(c.tq)
      c.planeW = c.blocksW * 8
      c.planeH = c.blocksH * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      var by = 0
      while (by < c.blocksH) {
        var bx = 0
        while (bx < c.blocksW) {
          val off = (by * c.blocksW + bx) * 64
          var k = 0
          while (k < 64) {
            coef(ZIGZAG(k)) = c.coefs(off + k) * q(k)
            k += 1
          }
          idctBlock(coef, tmp, c, bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    true
  }

  private def decodeScan(r: BitReader, comps: Array[Component],
      quant: Array[Array[Int]], huffDc: Array[Huff], huffAc: Array[Huff],
      width: Int, height: Int, restartInterval: Int): Boolean = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    var ci0 = 0
    while (ci0 < comps.length) {
      val c = comps(ci0)
      c.planeW = mcusX * 8 * c.h
      c.planeH = mcusY * 8 * c.v
      c.plane = new Array[Int](c.planeW * c.planeH)
      c.pred = 0
      if (quant(c.tq) == null || huffDc(c.td) == null || huffAc(c.ta) == null)
        return false
      ci0 += 1
    }
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.restart()) return false
        var cr = 0
        while (cr < comps.length) { comps(cr).pred = 0; cr += 1 }
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = r.decodeHuff(huffDc(c.td))
            if (t > 15) return false
            val diff = extend(r.bits(t), t)
            c.pred += diff
            coef(0) = c.pred * quant(c.tq)(0)
            // AC, run-length in zigzag order
            var k = 1
            while (k < 64) {
              val rs = r.decodeHuff(huffAc(c.ta))
              val run = rs >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += run
                if (k > 63) return false
                coef(ZIGZAG(k)) = extend(r.bits(size), size) * quant(c.tq)(k)
                k += 1
              }
            }
            if (r.hitMarker && mcu < nMcus - 1) return false
            idctBlock(coef, tmp, c, (mx * c.h + bx) * 8, (my * c.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    true
  }

  /** Separable 2-D IDCT (rows then columns) + level shift + clamp,
    * written into the component plane at (ox, oy). */
  private def idctBlock(coef: Array[Int], tmp: Array[Double],
      c: Component, ox: Int, oy: Int): Unit = {
    // rows: tmp[v][x] = 1/2 Σ_u C(u) F(v,u) cos((2x+1)uπ/16)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * COS(u * 8 + x); u += 1 }
        tmp(v * 8 + x) = 0.5 * s
        x += 1
      }
      v += 1
    }
    // columns: out[y][x] = 1/2 Σ_v C(v) tmp[v][x] cos((2y+1)vπ/16)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += tmp(vv * 8 + x) * COS(vv * 8 + y); vv += 1 }
        val px = math.round(0.5 * s + 128.0).toInt
        c.plane((oy + y) * c.planeW + (ox + x)) =
          if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  /** Sample-replication upsample + JFIF YCbCr→RGB + channel means. */
  private def toRgbMeans(comps: Array[Component], width: Int,
      height: Int, grid: Array[Long]): MultimodalOps.DecodedImage = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    var sr = 0.0
    var sg = 0.0
    var sb = 0.0
    val gray = comps.length == 1
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val yy = comps(0).plane(
          (y * comps(0).v / maxV) * comps(0).planeW + (x * comps(0).h / maxH))
        if (gray) {
          sr += yy; sg += yy; sb += yy
          if (grid != null) {
            val v = math.max(0, math.min(255, math.round(yy).toInt))
            MultimodalOps.gridAdd(grid, x, y, width, height, v, v, v)
          }
        } else {
          val cb = comps(1).plane(
            (y * comps(1).v / maxV) * comps(1).planeW + (x * comps(1).h / maxH))
          val cr = comps(2).plane(
            (y * comps(2).v / maxV) * comps(2).planeW + (x * comps(2).h / maxH))
          def clamp(d: Double): Int = {
            val r = math.round(d).toInt
            if (r < 0) 0 else if (r > 255) 255 else r
          }
          val r = clamp(yy + 1.402 * (cr - 128))
          val g = clamp(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
          val b = clamp(yy + 1.772 * (cb - 128))
          sr += r; sg += g; sb += b
          if (grid != null) MultimodalOps.gridAdd(grid, x, y, width, height, r, g, b)
        }
        x += 1
      }
      y += 1
    }
    val n = width.toDouble * height
    MultimodalOps.DecodedImage(width, height, sr / n, sg / n, sb / n)
  }
}
