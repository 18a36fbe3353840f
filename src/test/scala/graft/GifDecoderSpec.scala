package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GifDecoder, MultimodalOps}

/** Cross-checks the pure-JVM GIF decoder two ways:
  *
  *  1. against the JDK's ImageIO GIF codec as an independent
  *     reference — ImageIO encodes synthetic low-color images (GIF is
  *     palettized, so a ≤256-color source round-trips LOSSLESSLY and
  *     the channel means must agree EXACTLY, no tolerance), both
  *     decoders read the same bytes;
  *  2. against a test-side minimal encoder (root-codes-only LZW with
  *     periodic CLEAR — the classic "uncompressed GIF" construction)
  *     that can emit layouts ImageIO's writer never produces:
  *     interlaced frames and local color tables.
  *
  * Plus the strictness contract: truncated files, missing trailers,
  * transparency-flagged frames, and coincidental magic all return
  * None (they must fall to the histogram tier, never decode to
  * garbage). ImageIO stays test-only: executors never touch
  * java.desktop. */
class GifDecoderSpec extends AnyFunSuite {

  /** Deterministic 8-color test card (few colors → ImageIO's GIF
    * palette quantization is lossless). */
  private def testImage(w: Int, h: Int): BufferedImage = {
    val palette = Array(0x000000, 0xff0000, 0x00ff00, 0x0000ff,
      0xffff00, 0x00ffff, 0xff00ff, 0xffffff)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, palette((x * 7 + y * 13 + (x * y) % 5) % 8))
    img
  }

  private def encodeImageIo(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", bos), "JDK GIF writer missing")
    bos.toByteArray
  }

  private def means(img: BufferedImage): (Double, Double, Double) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
    }
    val n = img.getWidth.toDouble * img.getHeight
    (sr / n, sg / n, sb / n)
  }

  test("ImageIO round-trip: palettized images decode with EXACT channel means") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 16), (37, 23), (64, 48))) {
      val img = testImage(w, h)
      val bytes = encodeImageIo(img)
      val got = GifDecoder.decode(bytes)
      assert(got.isDefined, s"${w}x$h did not decode")
      val d = got.get
      assert(d.width === w && d.height === h)
      // the SOURCE image is the ground truth: ≤8 distinct colors, so
      // the palette write is lossless and the means must match
      // EXACTLY, no tolerance. (Deliberately NOT ImageIO's read-back:
      // the JDK writes these files INTERLACED — descriptor flag 0x41 —
      // and its own reader mis-places rows of tiny interlaced frames,
      // e.g. a 3x2 round-trip returns row 1 as palette entry 0.
      // Channel means are row-order-free, so this decoder is immune
      // to interlace layout by construction and recovers the original
      // content where ImageIO's reader does not.)
      val ref = means(img)
      assert((d.meanR, d.meanG, d.meanB) === ref, s"${w}x$h means")
    }
  }

  // ---- minimal test-side encoder (root codes + periodic CLEAR) ----

  /** Emit a valid GIF89a with the given indexed pixels. The LZW body
    * uses only root codes with a CLEAR before the dictionary would
    * force a code-width change — decodable by any conformant reader. */
  private def buildGif(w: Int, h: Int, palette: Array[Int],
      pixels: Array[Int], interlaced: Boolean, localPalette: Boolean,
      transparent: Boolean = false, trailer: Boolean = true): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def b(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { b(v); b(v >> 8) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    val palBits = 2 // 4-entry tables keep minCode = 2 (the floor)
    require(palette.length == 4, "test encoder uses 4-entry palettes")
    b(if (localPalette) 0x00 else 0x80 | (palBits - 1)) // screen flags
    b(0); b(0) // bg index, aspect
    def writePalette(): Unit =
      palette.foreach { rgb => b(rgb >> 16); b(rgb >> 8); b(rgb) }
    if (!localPalette) writePalette()
    if (transparent) { // GCE with transparency flag on index 0
      b(0x21); b(0xf9); b(4); b(0x01); u16(0); b(0); b(0)
    }
    b(0x2c); u16(0); u16(0); u16(w); u16(h)
    b((if (localPalette) 0x80 | (palBits - 1) else 0) |
      (if (interlaced) 0x40 else 0))
    if (localPalette) writePalette()
    val minCode = 2
    b(minCode)
    // pack variable-width codes LSB-first: CLEAR, then roots with a
    // CLEAR re-issued before the dict would hit 1 << (minCode + 1)
    val clear = 1 << minCode; val eoi = clear + 1
    var acc = 0L; var accBits = 0
    val body = new ByteArrayOutputStream()
    var dictSize = eoi + 1
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits; accBits += codeSize
      while (accBits >= 8) { body.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    put(clear)
    // if interlaced, the FILE stores rows in pass order; the decoder's
    // means are row-order-free but the stream must still be the
    // permuted raster to be a faithful interlaced file
    val rowOrder: Seq[Int] =
      if (!interlaced) 0 until h
      else (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)
    for (y <- rowOrder; x <- 0 until w) {
      // each emitted code grows the dict by one (after the first);
      // re-clear before the width would change so codeSize stays put
      if (dictSize == (1 << codeSize) - 1) { put(clear); dictSize = eoi + 1 }
      put(pixels(y * w + x))
      dictSize += 1
    }
    put(eoi)
    if (accBits > 0) body.write((acc & 0xff).toInt)
    // sub-block framing
    val data = body.toByteArray
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      b(n); bos.write(data, off, n); off += n
    }
    b(0) // data terminator
    if (trailer) b(0x3b)
    bos.toByteArray
  }

  private val pal4 = Array(0x102030, 0xff0000, 0x00ff00, 0x0000ff)

  private def expectedMeans(pixels: Array[Int]): (Double, Double, Double) = {
    val n = pixels.length.toDouble
    (pixels.map(i => (pal4(i) >> 16) & 0xff).sum / n,
      pixels.map(i => (pal4(i) >> 8) & 0xff).sum / n,
      pixels.map(i => pal4(i) & 0xff).sum / n)
  }

  test("hand-built files: sequential + interlaced + local palette all decode to the pixel means") {
    val w = 13; val h = 11
    val rnd = new scala.util.Random(7)
    val pixels = Array.fill(w * h)(rnd.nextInt(4))
    val want = expectedMeans(pixels)
    for ((inter, local) <- Seq((false, false), (true, false), (false, true), (true, true))) {
      val bytes = buildGif(w, h, pal4, pixels, inter, local)
      val got = GifDecoder.decode(bytes)
      assert(got.isDefined, s"interlaced=$inter local=$local")
      val d = got.get
      assert(d.width === w && d.height === h)
      assert((d.meanR, d.meanG, d.meanB) === want, s"interlaced=$inter local=$local")
      // the sequential layouts must also agree with ImageIO's reading
      // (interlaced excluded: the JDK reader mis-places rows of small
      // interlaced frames — see the round-trip test's note)
      if (!inter) {
        val ref = means(ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        assert((d.meanR, d.meanG, d.meanB) === ref, s"vs ImageIO local=$local")
      }
    }
  }

  test("strictness: truncation, missing trailer, transparency, bad magic all reject") {
    val w = 8; val h = 8
    val pixels = Array.tabulate(w * h)(_ % 4)
    val good = buildGif(w, h, pal4, pixels, interlaced = false, localPalette = false)
    assert(GifDecoder.decode(good).isDefined)
    // every truncation of a valid file must reject (structure gate)
    for (cut <- Seq(4, 10, 14, good.length / 2, good.length - 1))
      assert(GifDecoder.decode(good.take(cut)).isEmpty, s"truncated at $cut")
    assert(GifDecoder.decode(
      buildGif(w, h, pal4, pixels, interlaced = false, localPalette = false,
        trailer = false)).isEmpty, "missing trailer")
    assert(GifDecoder.decode(
      buildGif(w, h, pal4, pixels, interlaced = false, localPalette = false,
        transparent = true)).isEmpty, "transparent frame must fall to the stub tier")
    val magic = "GIF89a".getBytes("US-ASCII") ++ Array.fill[Byte](40)(0x55)
    assert(GifDecoder.decode(magic).isEmpty, "coincidental magic")
    assert(GifDecoder.decode("not a gif at all".getBytes).isEmpty)
  }

  test("the multimodal dispatch routes GIF bytes to the real decode tier") {
    val img = testImage(24, 16)
    val bytes = encodeImageIo(img)
    val viaDispatch = MultimodalOps.decodeImage(bytes)
    assert(viaDispatch.isDefined)
    assert(viaDispatch.get === GifDecoder.decode(bytes).get)
  }
}
