package graft.operators

/** From-spec PNG decoder (public PNG spec, RFC 2083 / ISO 15948) — the
  * lossless-image analog of [[Jpeg]]: chunk walk → concatenated-IDAT
  * zlib inflate (`java.util.zip.Inflater`, in the JDK) → per-scanline
  * unfilter (None/Sub/Up/Average/Paeth, §6) → packed 0xRRGGBB pixels.
  *
  * Scope: 8-bit depth, non-interlaced, color types 0 (grayscale),
  * 2 (truecolor), 3 (palette) and 6 (truecolor+alpha; alpha is parsed
  * then dropped — the decode operators sum RGB channels only, matching
  * `BufferedImage.getRGB`'s non-premultiplied channels). 16-bit depth,
  * sub-byte depths, gray+alpha (type 4) and Adam7 interlace return None —
  * callers fall back to the ImageIO path, never mis-decode. Chunk CRCs
  * are not verified (decode either reproduces the pixels or quarantines
  * on structural damage; the operators' contract is format-level).
  *
  * Grayscale convention: a type-0 sample g maps to (g, g, g) RAW — the
  * libpng convention; PNG gray is display-referred. (The JDK's
  * `BufferedImage.getRGB` over its TYPE_BYTE_GRAY decode result instead
  * applies a linear-gray→sRGB ColorModel conversion — a java.awt
  * artifact, not PNG semantics — so gray cross-checks pin against the
  * raw raster samples.)
  *
  * Every supported shape is CI-pinned bit-for-bit against the JDK's own
  * PNG codec on gradient fixtures (OperatorQualitySpec), the same
  * cross-check pattern as the baseline-JPEG family.
  */
object Png {

  private val SIG = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Decode to (width, height, row-major packed 0xRRGGBB). None for
    * anything outside the documented scope or structurally damaged. */
  def decodeRgb(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try decode0(p) catch { case scala.util.control.NonFatal(_) => None }

  private def decode0(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p.length < 8) return None
    var i = 0
    while (i < 8) { if ((p(i) & 0xff) != SIG(i)) return None; i += 1 }
    def u32(off: Int): Long =
      ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
        ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)
    var pos = 8
    var w = 0
    var h = 0
    var colorType = -1
    var palette: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 8 <= p.length) {
      val len = u32(pos)
      if (len < 0 || len > Int.MaxValue - 16 || pos + 12 + len > p.length) return None
      val typ = new String(p, pos + 4, 4, "US-ASCII")
      val data = pos + 8
      typ match {
        case "IHDR" =>
          if (len != 13 || colorType != -1) return None
          w = u32(data).toInt; h = u32(data + 4).toInt
          val bitDepth = p(data + 8) & 0xff
          colorType = p(data + 9) & 0xff
          val interlace = p(data + 12) & 0xff
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
          if (bitDepth != 8 || interlace != 0) return None // fallback scope
          if (colorType != 0 && colorType != 2 && colorType != 3 &&
            colorType != 6) return None
        case "PLTE" =>
          if (len % 3 != 0 || len > 768) return None
          palette = Array.tabulate((len / 3).toInt) { j =>
            ((p(data + 3 * j) & 0xff) << 16) |
              ((p(data + 3 * j + 1) & 0xff) << 8) | (p(data + 3 * j + 2) & 0xff)
          }
        case "IDAT" => idat.write(p, data, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks (tRNS alpha included) are dropped
      }
      pos += 12 + len.toInt
    }
    if (!sawEnd || colorType < 0 || idat.size() == 0) return None
    if (colorType == 3 && palette == null) return None
    val bpp = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case _ => 4
    }
    val stride = w * bpp
    val raw = inflateExact(idat.toByteArray, (stride + 1) * h)
    if (raw == null) return None

    // unfilter in place into `prev`/`cur` rows (§6.1): x is the byte being
    // reconstructed, a = left (bpp back), b = above, c = above-left
    val out = new Array[Int](w * h)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride) // zero-initialized = row above row 0
    var y = 0
    while (y < h) {
      val rowOff = y * (stride + 1)
      val filter = raw(rowOff) & 0xff
      var x = 0
      while (x < stride) {
        val rx = raw(rowOff + 1 + x) & 0xff
        val a = if (x >= bpp) cur(x - bpp) else 0
        val b = prev(x)
        val c = if (x >= bpp) prev(x - bpp) else 0
        cur(x) = filter match {
          case 0 => rx
          case 1 => (rx + a) & 0xff
          case 2 => (rx + b) & 0xff
          case 3 => (rx + ((a + b) >> 1)) & 0xff
          case 4 => // Paeth predictor (§6.6)
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (rx + pred) & 0xff
          case _ => return None
        }
        x += 1
      }
      var px = 0
      while (px < w) {
        out(y * w + px) = colorType match {
          case 0 => val g = cur(px); (g << 16) | (g << 8) | g
          case 2 => (cur(3 * px) << 16) | (cur(3 * px + 1) << 8) | cur(3 * px + 2)
          case 3 =>
            val idx = cur(px)
            if (idx >= palette.length) return None
            palette(idx)
          case _ => (cur(4 * px) << 16) | (cur(4 * px + 1) << 8) | cur(4 * px + 2)
        }
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some((w, h, out))
  }

  /** Inflate to EXACTLY `want` bytes; null on short/corrupt streams. Kept
    * as raw bytes — consumers mask with & 0xff — so a near-cap image does
    * not pay a 4× Array[Int] transient copy per decode thread. */
  private def inflateExact(z: Array[Byte], want: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(z)
      val buf = new Array[Byte](want)
      var got = 0
      while (got < want && !inf.finished()) {
        val n = inf.inflate(buf, got, want - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        got += n
      }
      if (got != want) return null
      // 'exactly' also bounds the OTHER side: a stream that would inflate
      // past `want` is corrupt/oversized, not a short read — one more
      // inflate() must produce nothing and leave the inflater finished
      // (ADVICE round-14: unchecked, an oversized IDAT decoded silently)
      if (!inf.finished()) {
        val probe = new Array[Byte](1)
        if (inf.inflate(probe, 0, 1) != 0 || !inf.finished()) return null
      }
      buf
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }
}
