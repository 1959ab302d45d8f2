package graft.operators

/** Baseline-sequential JPEG decoder for single-component (grayscale)
  * images, implemented in pure Scala from the public ITU-T T.81 spec —
  * the DCT-family analog of [[Multimodal.rle8Decode]]'s from-spec RLE8:
  * it closes the "no DCT codec in the JDK for video frames" boundary for
  * grayscale MJPG (each AVI `00dc` chunk is an independent JPEG, decoded
  * here without touching `javax.imageio`, which cannot be handed an
  * in-container frame slice without a per-frame stream copy anyway).
  *
  * Scope (documented, spec-cited): baseline sequential DCT (SOF0),
  * 8-bit precision, ONE component, standard or optimized Huffman
  * tables, restart intervals. Progressive (SOF2), arithmetic coding,
  * hierarchical, and multi-component color (subsampled YCbCr) are out of
  * scope and return None → callers quarantine (`ok=false`), never
  * mis-decode.
  *
  * Decode pipeline per T.81: marker parse (DQT §B.2.4.1, DHT §B.2.4.2,
  * SOF0 §B.2.2, DRI §B.2.4.4, SOS §B.2.3) → entropy-coded segment with
  * byte stuffing (§B.1.1.5) and RSTn handling (§E.1.4) → per-block
  * Huffman DC diff + AC run/size decode (§F.2.2) → dequantize →
  * inverse zigzag → 2-D IDCT (§A.3.3, double-precision separable) →
  * level shift + clamp.
  *
  * Purity of the arithmetic: the double IDCT is deterministic (strict
  * IEEE on the JVM) and, for the block-constant fixtures the gate row
  * uses, EXACT — a constant block has only a DC coefficient, which
  * survives quality-1.0 quantization (all-ones tables) bit-perfectly, so
  * decoded pixel sums have closed forms a SQL oracle can replay.
  */
object Jpeg {

  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16) · C(u), C(0)=1/√2 — the separable IDCT basis
  private val COS: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        t(x * 8 + u) = c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Canonical Huffman table: flat (code-length, symbol) lookup decoded
    * bit-serially — at most 16 steps per symbol, plenty for fixture-scale
    * frames and branch-predictable. mincode/maxcode per length per
    * T.81 §F.2.2.3 DECODE. */
  private final class Huff(counts: Array[Int], symbols: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      if (l > 16) throw new IllegalArgumentException("bad Huffman code")
      symbols(valPtr(l) + code - minCode(l)) & 0xff
    }
  }

  /** Entropy-segment bit reader: un-stuffs 0xFF00, stops AT any other
    * marker (restart handling is the caller's). */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= p.length) throw new IllegalArgumentException("eof")
        var b = p(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= p.length) throw new IllegalArgumentException("eof")
          val n = p(pos) & 0xff
          if (n == 0x00) pos += 1 // stuffed byte
          else { // real marker mid-segment — treat as truncation
            throw new IllegalArgumentException("marker in segment")
          }
          b = 0xff
        }
        buf = b
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def reset(): Unit = { cnt = 0 }
  }

  // T.81 §F.2.2.1 EXTEND: map the n-bit magnitude to its signed value
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  /** Decode `bytes` as a baseline-sequential grayscale JPEG.
    * Returns (width, height, row-major pixels 0-255), or None for
    * anything outside the documented scope or malformed. */
  def decodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try decode0(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def decode0(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    var pos = 0
    def u8(): Int = { val v = p(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((p(pos) & 0xff) << 8) | (p(pos + 1) & 0xff); pos += 2; v }
    if (p.length < 4 || u16() != 0xffd8) return None // SOI

    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var width = 0
    var height = 0
    var qId = -1
    var restartInterval = 0
    var sawSof = false

    while (pos + 4 <= p.length) {
      var m = u8()
      if (m != 0xff) return None
      do { m = u8() } while (m == 0xff) // fill bytes
      m match {
        case 0xd9 => return None // EOI before SOS
        case 0xc0 => // SOF0 baseline
          val len = u16(); val end = pos + len - 2
          if (u8() != 8) return None // precision
          height = u16(); width = u16()
          val nc = u8()
          if (nc != 1) return None // grayscale scope
          u8() // component id
          val hv = u8()
          if (hv != 0x11) return None // no subsampling for 1 component
          qId = u8()
          pos = end
          sawSof = true
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // extended/progressive/lossless/arithmetic — out of scope
        case 0xc4 => // DHT
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val tcTh = u8()
            val counts = Array.fill(16)(u8())
            val n = counts.sum
            val syms = new Array[Byte](n)
            var i = 0
            while (i < n) { syms(i) = p(pos).toByte; pos += 1; i += 1 }
            val h = new Huff(counts, syms)
            if ((tcTh >> 4) == 0) dcTabs(tcTh & 3) = h else acTabs(tcTh & 3) = h
          }
        case 0xdb => // DQT
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val pqTq = u8()
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) {
              q(i) = if ((pqTq >> 4) == 0) u8() else u16()
              i += 1
            }
            qtabs(pqTq & 3) = q
          }
        case 0xdd => // DRI
          u16(); restartInterval = u16()
        case 0xda => // SOS
          if (!sawSof) return None
          val len = u16(); val end = pos + len - 2
          val ns = u8()
          if (ns != 1) return None
          u8() // component selector
          val tdTa = u8()
          pos = end // skip Ss/Se/Ah/Al (fixed for baseline)
          val dcT = dcTabs(tdTa >> 4)
          val acT = acTabs(tdTa & 0xf)
          val qt = qtabs(qId)
          if (dcT == null || acT == null || qt == null) return None
          return decodeScan(p, pos, width, height, dcT, acT, qt, restartInterval)
        case _ => // APPn / COM / anything with a length — skip
          val len = u16()
          pos += len - 2
      }
    }
    None
  }

  private def decodeScan(p: Array[Byte], start: Int, width: Int, height: Int,
                         dcT: Huff, acT: Huff, qt: Array[Int],
                         ri: Int): Option[(Int, Int, Array[Int])] = {
    if (width <= 0 || height <= 0 || width * height > (1 << 26)) return None
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val out = new Array[Int](width * height)
    val br = new BitReader(p, start)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var pred = 0
    var blk = 0
    val nBlk = bw * bh
    while (blk < nBlk) {
      if (ri > 0 && blk > 0 && blk % ri == 0) {
        // RSTn: byte-align, consume the marker, reset the DC predictor
        br.reset()
        var q = br.pos
        while (q + 1 < p.length && !((p(q) & 0xff) == 0xff &&
          ((p(q + 1) & 0xff) >= 0xd0 && (p(q + 1) & 0xff) <= 0xd7))) q += 1
        if (q + 1 >= p.length) return None
        br.pos = q + 2
        pred = 0
      }
      java.util.Arrays.fill(coef, 0)
      // DC (§F.2.2.1)
      val t = dcT.decode(br)
      pred += extend(br.receive(t), t)
      coef(0) = pred * qt(0)
      // AC (§F.2.2.2)
      var k = 1
      var done = false
      while (k < 64 && !done) {
        val rs = acT.decode(br)
        val r = rs >> 4
        val s = rs & 0xf
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else done = true // EOB
        } else {
          k += r
          if (k > 63) return None
          coef(ZIGZAG(k)) = extend(br.receive(s), s) * qt(k)
          k += 1
        }
      }
      // zigzag note: coef is indexed in NATURAL order via ZIGZAG(k); DC at 0
      // IDCT, separable: rows then columns (§A.3.3)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var acc = 0.0
          var u = 0
          while (u < 8) {
            val cu = COS(x * 8 + u)
            var v = 0
            while (v < 8) {
              acc += cu * COS(y * 8 + v) * coef(v * 8 + u)
              v += 1
            }
            u += 1
          }
          tmp(y * 8 + x) = acc / 4.0
          x += 1
        }
        y += 1
      }
      val bx = blk % bw
      val by = blk / bw
      var yy = 0
      while (yy < 8) {
        val py = by * 8 + yy
        if (py < height) {
          var xx = 0
          while (xx < 8) {
            val px = bx * 8 + xx
            if (px < width) {
              val v = math.round(tmp(yy * 8 + xx)).toInt + 128
              out(py * width + px) = if (v < 0) 0 else if (v > 255) 255 else v
            }
            xx += 1
          }
        }
        yy += 1
      }
      blk += 1
    }
    Some((width, height, out))
  }
}
