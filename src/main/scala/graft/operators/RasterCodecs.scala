package graft.operators

/** From-spec BMP and GIF decoders (public Windows BMP layout / GIF89a
  * spec) — with [[Png]] and [[Jpeg]] they complete the image-operator
  * decode path without `javax.imageio` on any per-row hot path. Both are
  * CI-pinned bit-for-bit against the JDK codecs on gradient fixtures and
  * fall back (None) for anything outside the documented scope — callers
  * quarantine or route to the ImageIO reader, never mis-decode. */
object RasterCodecs {

  // ------------------------------------------------------------------ BMP

  /** Uncompressed (BI_RGB) BMP: 24/32-bit truecolor and 8-bit palette,
    * BITMAPINFOHEADER (or longer V4/V5 headers — extra fields ignored),
    * bottom-up or top-down row order, 4-byte-aligned strides. RLE and
    * bitfield compressions return None. The row layout is the same DIB
    * convention [[Multimodal.aviDecodeDib]] already parses inside AVI. */
  def decodeBmp(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try decodeBmp0(p) catch { case scala.util.control.NonFatal(_) => None }

  private def decodeBmp0(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (u16(o) & 0xffffL) | ((u16(o + 2) & 0xffffL) << 16)
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val dataOff = u32(10).toInt
    val hdrSize = u32(14).toInt
    if (hdrSize < 40) return None // BITMAPCOREHEADER out of scope
    val w = u32(18).toInt
    val hRaw = u32(22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bits = u16(28)
    val compression = u32(30)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    if (compression != 0) return None // BI_RGB only
    if (bits != 24 && bits != 32 && bits != 8) return None
    val palette: Array[Int] =
      if (bits == 8) {
        val declared = u32(46).toInt
        val n = if (declared == 0) 256 else declared
        if (n < 0 || n > 256) return None
        val base = 14 + hdrSize
        if (base + 4 * n > p.length) return None
        Array.tabulate(n) { i => // BGRA quads
          ((p(base + 4 * i + 2) & 0xff) << 16) |
            ((p(base + 4 * i + 1) & 0xff) << 8) | (p(base + 4 * i) & 0xff)
        }
      } else null
    val bytesPp = bits / 8
    val stride = (w * bytesPp + 3) & ~3
    if (dataOff < 0 || dataOff.toLong + stride.toLong * h > p.length) return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * stride
      var x = 0
      while (x < w) {
        out(y * w + x) =
          if (bits == 8) {
            val idx = p(srcRow + x) & 0xff
            if (idx >= palette.length) return None
            palette(idx)
          } else {
            val o = srcRow + x * bytesPp // BGR(A) byte order
            ((p(o + 2) & 0xff) << 16) | ((p(o + 1) & 0xff) << 8) | (p(o) & 0xff)
          }
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  // ------------------------------------------------------------------ GIF

  /** GIF87a/89a FIRST frame: global or local color table, LZW decode
    * (variable code width, clear/end codes, sub-block framing, §22 of the
    * GIF89a spec), Adam-free 4-pass interlace. Matches `ImageIO.read`'s
    * first-frame semantics with alpha dropped (a transparent index still
    * carries its palette RGB, which is what `getRGB & 0xffffff` yields).
    * Frames smaller than the logical screen return just the frame raster
    * (dims = frame dims), the shape the fixtures and operators use. */
  def decodeGif(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try decodeGif0(p) catch { case scala.util.control.NonFatal(_) => None }

  private def decodeGif0(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p.length < 13) return None
    val hdr = new String(p, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    var pos = 6
    pos += 4 // logical screen w/h (frame descriptor dims are what we emit)
    val flags = p(pos) & 0xff
    pos += 3 // flags, background index, aspect
    def readColorTable(n: Int): Array[Int] = {
      val t = Array.tabulate(n) { i =>
        ((p(pos + 3 * i) & 0xff) << 16) | ((p(pos + 3 * i + 1) & 0xff) << 8) |
          (p(pos + 3 * i + 2) & 0xff)
      }
      pos += 3 * n
      t
    }
    val globalTable =
      if ((flags & 0x80) != 0) readColorTable(2 << (flags & 7)) else null
    // block walk to the first image descriptor
    while (pos < p.length) {
      (p(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while (pos < p.length && (p(pos) & 0xff) != 0) pos += 1 + (p(pos) & 0xff)
          pos += 1 // block terminator
        case 0x2c => // image descriptor
          val w = u16(pos + 5); val h = u16(pos + 7)
          val iflags = p(pos + 9) & 0xff
          pos += 10
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
          val table =
            if ((iflags & 0x80) != 0) readColorTable(2 << (iflags & 7))
            else globalTable
          if (table == null) return None
          val interlaced = (iflags & 0x40) != 0
          val indices = lzwDecode(p, pos, w * h).getOrElse(return None)
          val out = new Array[Int](w * h)
          var row = 0
          // 4-pass interlace row order (GIF89a appendix E)
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(h)(y => y)
            else {
              val order = new Array[Int](h)
              var i = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until h by step) { order(i) = y; i += 1 }
              order
            }
          while (row < h) {
            val dstRow = rowOrder(row)
            var x = 0
            while (x < w) {
              val idx = indices(row * w + x)
              if (idx >= table.length) return None
              out(dstRow * w + x) = table(idx)
              x += 1
            }
            row += 1
          }
          return Some((w, h, out))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** GIF LZW: `want` pixel indices from the sub-block-framed code stream
    * at `pos` (first byte = minimum code size). None on malformed data. */
  private def lzwDecode(p: Array[Byte], pos0: Int, want: Int): Option[Array[Int]] = {
    var pos = pos0
    if (pos >= p.length) return None
    val minCode = p(pos) & 0xff; pos += 1
    if (minCode < 2 || minCode > 8) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as (prefix, suffix) pairs; max 4096 entries per spec
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var dictSize = eoi + 1
    var codeWidth = minCode + 1
    val out = new Array[Int](want)
    var got = 0
    // bit reader over sub-blocks (LSB-first within bytes)
    var blockEnd = pos // exclusive end of current sub-block's data
    var acc = 0L; var nBits = 0
    def fill(): Boolean = { // ensure ≥ codeWidth bits or fail
      while (nBits < codeWidth) {
        if (pos >= blockEnd) {
          if (pos >= p.length) return false
          val len = p(pos) & 0xff; pos += 1
          if (len == 0) return false // terminator with codes still wanted
          blockEnd = pos + len
          if (blockEnd > p.length) return false
        }
        acc |= (p(pos) & 0xffL) << nBits
        nBits += 8
        pos += 1
      }
      true
    }
    def next(): Int = {
      if (!fill()) return -1
      val c = (acc & ((1 << codeWidth) - 1)).toInt
      acc >>>= codeWidth
      nBits -= codeWidth
      c
    }
    val stack = new Array[Int](4097)
    var prev = -1
    var firstOfPrev = 0
    while (got < want) {
      val code = next()
      if (code < 0) return None
      if (code == clear) {
        dictSize = eoi + 1; codeWidth = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (got == want) Some(out) else None
      } else {
        var sp = 0
        var cur = code
        if (code >= dictSize) { // the KwKwK case: code == dictSize only
          if (prev < 0 || code != dictSize) return None
          stack(sp) = firstOfPrev; sp += 1
          cur = prev
        }
        while (cur >= clear + 2) { // walk the chain down to a root
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
          if (sp > 4096) return None
        }
        val first = cur // root code = literal index
        stack(sp) = first; sp += 1
        while (sp > 0 && got < want) { sp -= 1; out(got) = stack(sp); got += 1 }
        if (sp > 0) return None // produced more pixels than the raster holds
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
        firstOfPrev = first
      }
    }
    Some(out)
  }
}
