package graft.operators

/** Baseline-sequential JPEG decoder implemented in pure Scala from the
  * public ITU-T T.81 spec — the DCT-family analog of
  * [[Multimodal.rle8Decode]]'s from-spec RLE8. It closes the "no DCT
  * codec in the JDK for video frames" boundary for MJPG (each AVI `00dc`
  * chunk is an independent JPEG, decoded here without touching
  * `javax.imageio`, which cannot be handed an in-container frame slice
  * without a per-frame stream copy anyway).
  *
  * Scope (documented, spec-cited): baseline sequential DCT (SOF0) AND
  * progressive DCT (SOF2, spectral selection + successive approximation
  * per Annex G — the dominant web JPEG encoding), 8-bit precision,
  * one-component grayscale and three-component interleaved YCbCr color
  * with arbitrary sampling factors ≤4 (4:4:4, 4:2:0 — the JDK encoder's
  * invariable choice — and 4:2:2 all fall out of the general MCU walk),
  * standard or optimized Huffman tables, restart intervals, AND both
  * ARITHMETIC entropy framings — sequential (SOF9) and progressive
  * (SOFA, §G.2) — via the from-spec T.81 Annex D QM coder in
  * [[JpegArith]] (DAC conditioning, per-scan/per-restart statistics
  * resets). 12-BIT extended precision decodes for the sequential
  * grayscale frames (SOF1 Huffman / SOF9 arithmetic) through the
  * dedicated [[decodeGray12]] entry point, and LOSSLESS predictive
  * frames (SOF3, Annex H — predictors 1-7, point transform, restarts,
  * 2-16-bit precision, single component) through [[decodeLossless]].
  * Hierarchical, arithmetic-lossless (SOF11), multi-component lossless,
  * 12-bit color/progressive, and other component counts return None →
  * callers quarantine (`ok=false`), never mis-decode.
  * Progressive decode accumulates raw coefficients across scans in
  * per-component MCU-padded grids and dequantizes + IDCTs once at EOI.
  *
  * Decode pipeline per T.81: marker parse (DQT §B.2.4.1, DHT §B.2.4.2,
  * SOF0 §B.2.2, DRI §B.2.4.4, SOS §B.2.3) → entropy-coded segment with
  * byte stuffing (§B.1.1.5) and RSTn handling (§E.1.4) → per-MCU
  * interleaved block order (§A.2.3) → per-block Huffman DC diff + AC
  * run/size decode (§F.2.2) → dequantize → inverse zigzag → 2-D IDCT
  * (§A.3.3, double-precision separable) → level shift + clamp →
  * replication chroma upsample → JFIF BT.601 YCbCr→RGB.
  *
  * Exactness story for the oracle fixtures: a constant 8×8 block has
  * only a DC coefficient, which survives quality-1.0 quantization
  * (all-ones tables) bit-perfectly under ANY conformant codec; and for
  * NEUTRAL-GRAY color (R=G=B=v) the encoder's fixed-point luma constants
  * sum to exactly 2¹⁶ so Y=v and Cb=Cr=128 exactly, chroma subsampling
  * averages a constant (exact), and the inverse transform's chroma terms
  * vanish — so neutral-gray macroblock fixtures round-trip the ENTIRE
  * 3-component interleaved pipeline bit-perfectly, giving closed-form
  * pixel sums while the stream stays real entropy-coded DCT data.
  * Chroma-dependent arithmetic is CI-pinned against the JDK decoder on
  * colored fixtures instead (rounding-tolerance bounds).
  */
object Jpeg {

  private[graft] val ZIGZAG: Array[Int] = Array(
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

  /** Canonical Huffman table decoded bit-serially — at most 16 steps per
    * symbol. mincode/maxcode per length per T.81 §F.2.2.3 DECODE. */
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

  /** Entropy-segment bit reader: un-stuffs 0xFF00, treats any other
    * marker mid-read as truncation (restart handling is the caller's). */
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
          if ((p(pos) & 0xff) == 0x00) pos += 1 // stuffed byte
          else throw new IllegalArgumentException("marker in segment")
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

  // one frame component: sampling factors, tables, and its decoded plane
  private final class Comp(val id: Int, val h: Int, val v: Int, val qId: Int) {
    var dcId = 0
    var acId = 0
    var pred = 0
    var dcCtx = 0 // arithmetic DC conditioning category (§F.1.4.4.1.2)
    var planeW = 0 // in pixels, = blocks across * 8
    var planeH = 0
    var plane: Array[Int] = null
    // progressive (SOF2) only: the raw coefficient grid accumulated across
    // scans (natural order within each 64-int block), MCU-padded
    var blocksW = 0
    var blocksH = 0
    var coefs: Array[Int] = null
  }

  /** Decoded image: `px` is gray values for nComp==1, packed 0xRRGGBB
    * for nComp==3; row-major, length width*height. */
  final case class JpegImage(width: Int, height: Int, nComp: Int, px: Array[Int])

  /** Decode `bytes` as a baseline-sequential GRAYSCALE JPEG. Returns
    * (width, height, row-major pixels 0-255); None for color streams —
    * the grayscale-MJPG contract of [[Multimodal.aviDecodeMjpg]] wants
    * color frames quarantined, not silently luma-flattened. */
  def decodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeImage(bytes, grayOnly = true) match {
      case Some(img) if img.nComp == 1 => Some((img.width, img.height, img.px))
      case _ => None
    }

  /** Decode grayscale OR color; color arrives packed 0xRRGGBB. */
  def decodeRgb(bytes: Array[Byte]): Option[JpegImage] =
    decodeImage(bytes).map { img =>
      if (img.nComp == 3) img
      else img.copy(px = img.px.map(g => (g << 16) | (g << 8) | g))
    }

  /** Decode a 12-BIT extended-sequential GRAYSCALE JPEG (SOF1 Huffman or
    * SOF9 arithmetic; T.81 extended precision). Returns row-major pixels
    * 0-4095. Deliberately a SEPARATE entry point: [[decodeGray]] /
    * [[decodeRgb]] keep their 8-bit pixel contract (a 12-bit sample
    * would overflow the packed 0xRRGGBB channels), so 12-bit streams
    * quarantine there and only decode where the caller asked for the
    * wide range. 12-bit color and 12-bit progressive stay out of scope. */
  def decodeGray12(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeImage(bytes, grayOnly = true, allow12 = true) match {
      case Some(img) if img.nComp == 1 => Some((img.width, img.height, img.px))
      case _ => None
    }

  /** Decode a LOSSLESS JPEG (SOF3, T.81 Annex H — the last non-exotic DCT
    * -family branch): single-component (grayscale) Huffman process,
    * predictors 1-7 (§H.1.2.1), point transform Pt, restart intervals
    * (prediction resets per §H.2.2), sample precision P ∈ 2..16, modulo-
    * 2¹⁶ reconstruction (§H.1.2.1) with the SSSS=16 "diff = 32768" escape.
    * Returns (width, height, row-major samples shifted left by Pt — the
    * §H.1.2 output convention — precision). Multi-component lossless,
    * arithmetic lossless (SOF11) and DNL return None → quarantine; the
    * DCT entry points ([[decodeGray]]/[[decodeRgb]]/[[decodeGray12]])
    * keep quarantining SOF3 streams by design.
    *
    * Conformance note (same honest boundary as [[JpegArith]]): encoder
    * ([[encodeLossless]]) and decoder are mirrors by the same author;
    * round-trips are self-consistent and the predictor math is pinned by
    * closed-form unit fixtures, but no external SOF3 bitstream is
    * available in this environment to anchor cross-codec conformance.
    * Since round 17 the boundary is ALSO regression-pinned: golden
    * bitstreams + pixel dumps for the predictor × precision × restart ×
    * point-transform matrix are checked in under
    * `src/test/resources/golden_jpeg/` (GoldenBitstreamSpec), so either
    * side drifting — even in tandem — fails CI. */
  def decodeLossless(bytes: Array[Byte]): Option[(Int, Int, Array[Int], Int)] =
    try decodeLossless0(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeLossless0(p: Array[Byte]): Option[(Int, Int, Array[Int], Int)] = {
    var pos = 0
    def u8(): Int = { val v = p(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((p(pos) & 0xff) << 8) | (p(pos + 1) & 0xff); pos += 2; v }
    if (p.length < 4 || u16() != 0xffd8) return None // SOI
    val dcTabs = new Array[Huff](4)
    var width = 0
    var height = 0
    var precision = 0
    var restartInterval = 0
    var result: Array[Int] = null
    var pt = 0
    while (result == null) {
      if (pos + 1 >= p.length) return None
      if (u8() != 0xff) return None
      var m = u8()
      while (m == 0xff && pos < p.length) m = u8() // §B.1.1.2 fill bytes
      m match {
        case 0xc3 => // SOF3 (§H.1)
          if (precision != 0) return None // one frame only
          u16() // Lf
          precision = u8()
          if (precision < 2 || precision > 16) return None
          height = u16(); width = u16()
          val nf = u8()
          // single-component scope; multi-component lossless quarantines
          if (nf != 1 || width <= 0 || height <= 0) return None
          // header-driven allocation guard (the progressive-budget lesson):
          // a crafted SOF3 maxing dims must not OOM before entropy data is
          // even read — 2²⁶ samples ≈ 256 MB of Int, far above any fixture
          if (width.toLong * height.toLong >
            java.lang.Long.getLong("graft.jpeg.losslessSampleBudget", 1L << 26))
            return None
          u8() // Ci
          if (u8() != 0x11) return None // H=V=1 for the only component
          u8() // Tq (§H.1: quantization unused in lossless; selector ignored)
        case 0xc4 => // DHT — lossless uses DC-class tables only
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val tcTh = u8()
            if ((tcTh >> 4) > 1 || (tcTh & 0xf) > 3) return None
            val counts = new Array[Int](16)
            var n = 0
            var i = 0
            while (i < 16) { counts(i) = u8(); n += counts(i); i += 1 }
            val syms = new Array[Byte](n)
            i = 0
            while (i < n) { syms(i) = p(pos).toByte; pos += 1; i += 1 }
            val h = new Huff(counts, syms)
            if ((tcTh >> 4) == 0) dcTabs(tcTh & 3) = h
            // AC-class tables are legal to carry, unused in lossless
          }
        case 0xdd => // DRI
          u16(); restartInterval = u16()
        case 0xda => // SOS (§H.1: Ss = predictor selector, Al = Pt)
          if (precision == 0) return None
          u16() // Ls
          if (u8() != 1) return None // Ns
          u8() // Cs
          val tdta = u8()
          // range-check Td BEFORE indexing the length-4 table array — the
          // quarantine path must be the `return None`, not a swallowed
          // ArrayIndexOutOfBounds
          if ((tdta >> 4) > 3) return None
          val huff = dcTabs(tdta >> 4)
          if (huff == null) return None
          val ss = u8() // predictor 1..7
          val se = u8()
          val ahal = u8()
          pt = ahal & 0xf
          if (ss < 1 || ss > 7 || se != 0 || (ahal >> 4) != 0) return None
          if (pt >= precision) return None
          val w = width
          val out = new Array[Int](w * height)
          val defaultPred = 1 << (precision - pt - 1)
          var br = new BitReader(p, pos)
          var sinceRestart = 0
          var restartCount = 0
          var resetPred = true
          // §H.1.2.2: the 1-D horizontal predictor (Ra) is used for the
          // first LINE of samples at the start of the scan AND at the
          // beginning of each restart interval — not just the first
          // sample. raLineY tracks the line where the current reset
          // happened; that whole line (from the reset sample on) predicts
          // with Ra, later lines resume the selected predictor.
          var raLineY = 0
          var y = 0
          while (y < height) {
            var x = 0
            while (x < w) {
              if (restartInterval > 0 && sinceRestart == restartInterval) {
                // byte-aligned RSTn in modulo-8 sequence (§E.1.4); for the
                // non-interleaved single-component scan one MCU = 1 sample
                br.reset()
                var q = br.pos
                while (q + 1 < p.length && !((p(q) & 0xff) == 0xff &&
                  ((p(q + 1) & 0xff) >= 0xd0 && (p(q + 1) & 0xff) <= 0xd7))) q += 1
                if (q + 1 >= p.length) return None
                if ((p(q + 1) & 0xff) != 0xd0 + (restartCount & 7)) return None
                restartCount += 1
                br = new BitReader(p, q + 2)
                sinceRestart = 0
                resetPred = true // §H.2.2: prediction resets at the interval
                raLineY = y
              }
              val pred =
                if (resetPred) { resetPred = false; defaultPred }
                else if (y == raLineY) out(y * w + x - 1) // Ra regime line
                else if (x == 0) out((y - 1) * w) // first column: Rb
                else {
                  val a = out(y * w + x - 1)
                  val b = out((y - 1) * w + x)
                  val c = out((y - 1) * w + x - 1)
                  ss match {
                    case 1 => a
                    case 2 => b
                    case 3 => c
                    case 4 => a + b - c
                    case 5 => a + ((b - c) >> 1)
                    case 6 => b + ((a - c) >> 1)
                    case _ => (a + b) >> 1
                  }
                }
              val t = huff.decode(br)
              if (t > 16) return None
              val diff = if (t == 16) 32768 else extend(br.receive(t), t)
              out(y * w + x) = (pred + diff) & 0xffff // §H.1.2.1 mod 2¹⁶
              sinceRestart += 1
              x += 1
            }
            y += 1
          }
          result = out
        case 0xd9 => return None // EOI before any scan
        case x if x >= 0xe0 && x <= 0xef => val len = u16(); pos += len - 2
        case 0xfe => val len = u16(); pos += len - 2 // COM
        // anything else — DQT is pointless-but-legal noise we still skip;
        // other SOFs, DAC, DNL, unknown markers quarantine
        case 0xdb => val len = u16(); pos += len - 2
        case _ => return None
      }
    }
    val px = if (pt == 0) result else result.map(_ << pt)
    Some((width, height, px, precision))
  }

  /** From-spec SOF3 fixture ENCODER — mirrors [[decodeLossless]] (same
    * predictor walk, same modulo-2¹⁶ diffs, SSSS=16 escape, restart
    * handling), emitting one canonical 17-symbol Huffman table (all
    * categories at 5 bits — valid canonical lengths, trivially decodable).
    * `samples` are the POST-point-transform values (what the decoder
    * reconstructs before its `<< pt` output shift). */
  private[graft] def encodeLossless(w: Int, h: Int, precision: Int,
                                    predictor: Int, ptShift: Int,
                                    samples: Array[Int],
                                    restartInterval: Int = 0): Array[Byte] = {
    require(samples.length == w * h, "sample grid must be w*h")
    require(predictor >= 1 && predictor <= 7, "predictor 1..7")
    require(precision >= 2 && precision <= 16 && ptShift < precision)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    marker(0xc3); u16(11); u8(precision); u16(h); u16(w); u8(1)
    u8(1); u8(0x11); u8(0)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    // DHT: DC table 0 — 17 symbols (categories 0..16), all 5-bit canonical
    marker(0xc4); u16(2 + 1 + 16 + 17)
    u8(0x00)
    val counts = Array(0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    counts.foreach(u8)
    (0 to 16).foreach(u8)
    marker(0xda); u16(8); u8(1); u8(1); u8(0x00)
    u8(predictor); u8(0); u8(ptShift)
    var bitBuf = 0
    var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          u8(bitBuf)
          if ((bitBuf & 0xff) == 0xff) u8(0) // §B.1.1.5 byte stuffing
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def flushByte(): Unit = if (bitCnt > 0) { // 1-fill pad (§F.1.2.3)
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      u8(bitBuf)
      if ((bitBuf & 0xff) == 0xff) u8(0)
      bitBuf = 0; bitCnt = 0
    }
    val defaultPred = 1 << (precision - ptShift - 1)
    var sinceRestart = 0
    var restartCount = 0
    var resetPred = true
    var raLineY = 0 // §H.1.2.2 Ra regime line — mirrors the decoder
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          flushByte()
          marker(0xd0 + (restartCount & 7))
          restartCount += 1
          sinceRestart = 0
          resetPred = true
          raLineY = y
        }
        val pred =
          if (resetPred) { resetPred = false; defaultPred }
          else if (y == raLineY) samples(y * w + x - 1)
          else if (x == 0) samples((y - 1) * w)
          else {
            val a = samples(y * w + x - 1)
            val b = samples((y - 1) * w + x)
            val c = samples((y - 1) * w + x - 1)
            predictor match {
              case 1 => a
              case 2 => b
              case 3 => c
              case 4 => a + b - c
              case 5 => a + ((b - c) >> 1)
              case 6 => b + ((a - c) >> 1)
              case _ => (a + b) >> 1
            }
          }
        // diff modulo 2¹⁶, represented in [-32767, 32768] with the
        // SSSS=16 no-bits escape for exactly 32768 (§H.1.2.2)
        val d16 = (samples(y * w + x) - pred) & 0xffff
        if (d16 == 0x8000) putBits(16, 5)
        else {
          val diff = if (d16 >= 0x8000) d16 - 0x10000 else d16
          var t = 0
          var mag = if (diff < 0) -diff else diff
          while (mag != 0) { t += 1; mag >>= 1 }
          putBits(t, 5) // canonical 5-bit code for category t IS t
          if (t > 0) putBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        }
        sinceRestart += 1
        x += 1
      }
      y += 1
    }
    flushByte()
    marker(0xd9)
    out.toByteArray
  }

  private def decodeImage(bytes: Array[Byte],
                          grayOnly: Boolean = false,
                          allow12: Boolean = false): Option[JpegImage] =
    try decode0(bytes, grayOnly, allow12)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decode0(p: Array[Byte], grayOnly: Boolean,
                      allow12: Boolean): Option[JpegImage] = {
    var pos = 0
    def u8(): Int = { val v = p(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((p(pos) & 0xff) << 8) | (p(pos + 1) & 0xff); pos += 2; v }
    if (p.length < 4 || u16() != 0xffd8) return None // SOI

    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var width = 0
    var height = 0
    var comps: Array[Comp] = null
    var restartInterval = 0
    var progressive = false
    var arith = false
    var precision = 8
    // DAC conditioning (§B.2.4.3); spec defaults L=0, U=1, Kx=5
    val arithDcL = Array.fill(4)(0)
    val arithDcU = Array.fill(4)(1)
    val arithAcKx = Array.fill(4)(5)
    var sawProgScan = false
    var hMax = 0
    var vMax = 0
    var mcusX = 0
    var mcusY = 0

    // 2-byte bound, not 4: EOI (FFD9) is the stream's final two bytes and
    // the progressive path must reach it to reconstruct; length reads past
    // the end throw and quarantine via decodeImage's catch
    while (pos + 2 <= p.length) {
      var m = u8()
      if (m != 0xff) return None
      do { m = u8() } while (m == 0xff) // fill bytes
      m match {
        case 0xd9 => // EOI: progressive reconstructs here, baseline fails
          return if (progressive && sawProgScan)
            reconstructProgressive(width, height, comps, qtabs, hMax, vMax)
          else None
        case 0xc0 | 0xc1 | 0xc2 | 0xc9 | 0xca => // SOF0 baseline / SOF1
          // extended sequential / SOF2 progressive / SOF9 sequential-
          // arithmetic / SOFA progressive-arithmetic — the arithmetic
          // entropy layers decode via the from-spec QM coder in
          // [[JpegArith]]
          if (comps != null) return None // second frame header
          progressive = m == 0xc2 || m == 0xca
          arith = m == 0xc9 || m == 0xca
          val len = u16(); val end = pos + len - 2
          if (end < pos) return None // len < 2: malformed, never rewind
          // precision: 8-bit everywhere; 12-bit admitted only for the
          // extended SEQUENTIAL frames (SOF1/SOF9) when the caller used
          // the wide-range entry point, and only grayscale (a 12-bit
          // sample overflows the packed-RGB contract)
          precision = u8()
          val prec12ok = allow12 && (m == 0xc1 || m == 0xc9)
          if (precision != 8 && !(precision == 12 && prec12ok)) return None
          height = u16(); width = u16()
          val nc = u8()
          if (nc != 1 && nc != 3) return None
          if (precision == 12 && nc != 1) return None
          // gray-only callers (the grayscale-MJPG contract) reject color
          // frames HERE, at header-parse time — never after decoding up to
          // width·height·3 transient planes that would only be discarded
          if (grayOnly && nc != 1) return None
          comps = Array.fill(nc) {
            val id = u8() // component identifier (§B.2.2 Ci)
            val hv = u8()
            val q = u8()
            val c = new Comp(id, hv >> 4, hv & 0xf, q)
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4) return None
            c
          }
          if (comps.map(_.id).distinct.length != nc) return None
          if (progressive) {
            // coefficient grids live across ALL scans (4 B/coefficient +
            // the pixel planes), so the progressive path is budgeted by
            // its EXACT transient allocation, not a pixel-count proxy — a
            // crafted SOF2 header maxing dims could otherwise pressure
            // ~150-400 MB per decode thread (ADVICE round-14). Default
            // 2^27 B (134 MB) admits ~8 MP 4:2:0; raise
            // -Dgraft.jpeg.progressiveByteBudget for larger scans.
            if (width <= 0 || height <= 0 ||
              width.toLong * height > (1L << 26)) return None
            hMax = comps.map(_.h).max
            vMax = comps.map(_.v).max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            val budget = java.lang.Long.getLong(
              "graft.jpeg.progressiveByteBudget", 1L << 27)
            val transientBytes = comps.map { c =>
              val bw = mcusX.toLong * c.h
              val bh = mcusY.toLong * c.v
              bw * bh * 64L * 4L + (bw * 8L) * (bh * 8L) * 4L
            }.sum
            if (transientBytes > budget) return None
            comps.foreach { c =>
              c.blocksW = mcusX * c.h
              c.blocksH = mcusY * c.v
              c.coefs = new Array[Int](c.blocksW * c.blocksH * 64)
              c.planeW = c.blocksW * 8
              c.planeH = c.blocksH * 8
              c.plane = new Array[Int](c.planeW * c.planeH)
            }
          }
          pos = end
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xcb | 0xcd | 0xce | 0xcf =>
          return None // lossless/hierarchical — out of scope; all four
          // DCT frames (SOF0/SOF1/SOF2/SOF9/SOFA) decode above
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
        case 0xcc => // DAC: arithmetic conditioning (§B.2.4.3)
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val tcTb = u8()
            val cs = u8()
            // §B.2.4.3: Tc ∈ {0 (DC), 1 (AC)}, Tb ∈ 0..3 — an out-of-range
            // class or table id quarantines the stream instead of silently
            // aliasing onto a valid conditioning slot via the & 3 mask
            if ((tcTb >> 4) > 1 || (tcTb & 0xf) > 3) return None
            val id = tcTb & 3
            if ((tcTb >> 4) == 0) {
              val l = cs & 0xf; val u = cs >> 4
              if (l > u) return None
              arithDcL(id) = l; arithDcU(id) = u
            } else {
              if (cs < 1 || cs > 63) return None
              arithAcKx(id) = cs
            }
          }
        case 0xdd => // DRI
          u16(); restartInterval = u16()
        case 0xda => // SOS
          if (comps == null) return None
          val len = u16(); val end = pos + len - 2
          if (end < pos) return None
          val ns = u8()
          // baseline single-scan: Ns must cover the frame exactly
          // (1-component frames non-interleaved, 3-component interleaved);
          // a progressive scan may cover any subset (AC scans exactly one)
          if (ns < 1 || ns > comps.length ||
            (!progressive && ns != comps.length)) return None
          // Cs selectors match frame components BY IDENTIFIER (§B.2.3 Csj
          // = some Ci) — an unknown or duplicate selector quarantines; a
          // reordered-but-valid selector list decodes correctly because the
          // MCU block walk follows SCAN order while planes/color keep
          // frame order
          val scanComps = new Array[Comp](ns)
          var i = 0
          while (i < ns) {
            val cs = u8()
            val tdTa = u8()
            val found = comps.find(_.id == cs)
            if (found.isEmpty) return None // selector names no frame comp
            val c = found.get
            if (scanComps.contains(c)) return None // duplicate selector
            c.dcId = tdTa >> 4
            c.acId = tdTa & 0xf
            scanComps(i) = c
            i += 1
          }
          if (!progressive) {
            pos = end // skip Ss/Se/Ah/Al (fixed for sequential)
            if (comps.exists(c => qtabs(c.qId) == null)) return None
            if (arith) // Td/Ta select DAC conditioning, not Huffman tables
              return decodeScanArith(p, pos, width, height, comps, scanComps,
                qtabs, arithDcL, arithDcU, arithAcKx, restartInterval,
                precision)
            if (comps.exists(c => dcTabs(c.dcId) == null || acTabs(c.acId) == null))
              return None
            return decodeScan(p, pos, width, height, comps, scanComps, qtabs,
              dcTabs, acTabs, restartInterval, precision)
          }
          // progressive scan header (§G.1): spectral band + successive
          // approximation; validate per B.2.3 / G.1.1.1.1 and quarantine
          // anything non-conformant rather than guess
          val ss = u8(); val se = u8(); val ahal = u8()
          val ah = ahal >> 4; val al = ahal & 0xf
          pos = end
          if (ss > se || se > 63 || al > 13 ||
            !(ah == 0 || ah == al + 1)) return None
          if (ss == 0 && se != 0) return None // DC scan is exactly band 0
          if (ss > 0 && ns != 1) return None // AC scans are single-component
          if (arith) {
            pos = progressiveScanArith(p, pos, comps, scanComps,
              arithDcL, arithDcU, arithAcKx, restartInterval,
              ss, se, ah, al, mcusX, mcusY, width, height, hMax, vMax)
          } else {
            if (ss == 0 && ah == 0 &&
              scanComps.exists(c => dcTabs(c.dcId) == null)) return None
            if (ss > 0 && acTabs(scanComps(0).acId) == null) return None
            pos = progressiveScan(p, pos, scanComps, dcTabs, acTabs,
              restartInterval, ss, se, ah, al, mcusX, mcusY, width, height,
              hMax, vMax)
          }
          sawProgScan = true
        case _ => // APPn / COM / anything with a length — skip
          val len = u16()
          if (len < 2) return None // a backward skip would loop forever
          pos += len - 2
      }
    }
    None
  }

  /** Separable IDCT (§A.3.3) of one DEQUANTIZED natural-order block into
    * component `c`'s plane at top-left pixel (px0, py0), with level shift
    * and clamp. `tmp` is caller-provided 64-double scratch. Shared by the
    * baseline streaming path and the progressive coefficient-grid
    * reconstruction. */
  private def idctToPlane(coef: Array[Int], tmp: Array[Double], c: Comp,
                          px0: Int, py0: Int,
                          half: Int = 128, maxV: Int = 255): Unit = {
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
    var yy = 0
    while (yy < 8) {
      val py = py0 + yy
      var xx = 0
      while (xx < 8) {
        val v = math.round(tmp(yy * 8 + xx)).toInt + half // level shift (2^(P-1))
        c.plane((py * c.planeW) + px0 + xx) =
          if (v < 0) 0 else if (v > maxV) maxV else v
        xx += 1
      }
      yy += 1
    }
  }

  /** Final image assembly from filled component planes: crop for
    * grayscale, replication upsample + JFIF BT.601 YCbCr→RGB for color
    * (CCIR 601 per the JFIF spec; chroma-constant fixtures are exact under
    * ANY upsample). Shared by the baseline and progressive paths. */
  private def assemble(width: Int, height: Int, comps: Array[Comp],
                       hMax: Int, vMax: Int): Option[JpegImage] =
    if (comps.length == 1) {
      val c = comps(0)
      val out = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out(y * width + x) = c.plane(y * c.planeW + x); x += 1 }
        y += 1
      }
      Some(JpegImage(width, height, 1, out))
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      val out = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = cy.plane((y * cy.v / vMax) * cy.planeW + (x * cy.h / hMax))
          val pb = cb.plane((y * cb.v / vMax) * cb.planeW + (x * cb.h / hMax)) - 128
          val pr = cr.plane((y * cr.v / vMax) * cr.planeW + (x * cr.h / hMax)) - 128
          var r = math.round(yy + 1.402 * pr).toInt
          var g = math.round(yy - 0.344136 * pb - 0.714136 * pr).toInt
          var b = math.round(yy + 1.772 * pb).toInt
          if (r < 0) r = 0 else if (r > 255) r = 255
          if (g < 0) g = 0 else if (g > 255) g = 255
          if (b < 0) b = 0 else if (b > 255) b = 255
          out(y * width + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      Some(JpegImage(width, height, 3, out))
    }

  /** One progressive scan (T.81 §G.1.2) into the components' coefficient
    * grids: DC first/refinement over MCUs (interleaved) or the component's
    * own block grid, AC first/refinement (run-length + EOBRUN, correction
    * bits) always single-component non-interleaved. Coefficients are
    * stored SHIFTED (value << Al accumulates across approximation passes).
    * Returns the position of the next marker's 0xFF. */
  private def progressiveScan(p: Array[Byte], start: Int,
                              scanComps: Array[Comp],
                              dcTabs: Array[Huff], acTabs: Array[Huff],
                              ri: Int, ss: Int, se: Int, ah: Int, al: Int,
                              mcusX: Int, mcusY: Int,
                              width: Int, height: Int,
                              hMax: Int, vMax: Int): Int = {
    val br = new BitReader(p, start)
    var eobrun = 0
    scanComps.foreach(_.pred = 0)

    def restart(): Unit = {
      br.reset()
      var q = br.pos
      while (q + 1 < p.length && !((p(q) & 0xff) == 0xff &&
        ((p(q + 1) & 0xff) >= 0xd0 && (p(q + 1) & 0xff) <= 0xd7))) q += 1
      if (q + 1 >= p.length) throw new IllegalArgumentException("missing RST")
      br.pos = q + 2
      scanComps.foreach(_.pred = 0)
      eobrun = 0
    }

    def dcFirst(c: Comp, bx: Int, by: Int): Unit = {
      val t = dcTabs(c.dcId).decode(br) // §G.1.2.1: diff coded as baseline,
      c.pred += extend(br.receive(t), t) // delivered at point transform Al
      c.coefs(((by * c.blocksW) + bx) * 64) = c.pred << al
    }
    def dcRefine(c: Comp, bx: Int, by: Int): Unit = {
      if (br.bit() == 1) c.coefs(((by * c.blocksW) + bx) * 64) |= (1 << al)
    }
    def acFirst(c: Comp, off: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      val ac = acTabs(c.acId)
      var k = ss
      while (k <= se) {
        val rs = ac.decode(br)
        val r = rs >> 4
        val s = rs & 0xf
        if (s == 0) {
          if (r < 15) { // EOBn: run of (1<<r)+ext blocks ending here (§G.1.2.2)
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            k = se + 1
          } else k += 16 // ZRL
        } else {
          k += r
          if (k > se) throw new IllegalArgumentException("AC band overrun")
          c.coefs(off + ZIGZAG(k)) = extend(br.receive(s), s) << al
          k += 1
        }
      }
    }
    // §G.1.2.3: one correction bit per already-nonzero coefficient passed;
    // new coefficients arrive as ±1 at bit Al
    def acRefine(c: Comp, off: Int): Unit = {
      val bit = 1 << al
      val ac = acTabs(c.acId)
      def correct(z: Int): Unit =
        if (br.bit() == 1 && (c.coefs(z) & bit) == 0)
          c.coefs(z) += (if (c.coefs(z) > 0) bit else -bit)
      var k = ss
      if (eobrun > 0) {
        eobrun -= 1
        while (k <= se) {
          val z = off + ZIGZAG(k)
          if (c.coefs(z) != 0) correct(z)
          k += 1
        }
        return
      }
      while (k <= se) {
        val rs = ac.decode(br)
        var r = rs >> 4
        val s = rs & 0xf
        var newVal = 0
        if (s == 0) {
          if (r < 15) { // EOBn: correct the rest of this block, then run
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            while (k <= se) {
              val z = off + ZIGZAG(k)
              if (c.coefs(z) != 0) correct(z)
              k += 1
            }
            return
          } // else ZRL: r=15 → skip 16 zero-history positions below
        } else {
          if (s != 1) throw new IllegalArgumentException("bad refinement size")
          newVal = if (br.bit() == 1) bit else -bit
        }
        // advance over r ZERO-HISTORY positions (correcting nonzero-history
        // coefficients in passing), then place the new ±1 if any
        var placed = false
        while (k <= se && !placed) {
          val z = off + ZIGZAG(k)
          if (c.coefs(z) != 0) correct(z)
          else if (r == 0) {
            if (newVal != 0) c.coefs(z) = newVal
            placed = true
          } else r -= 1
          k += 1
        }
      }
    }

    // single-component (non-interleaved) walk over the component's OWN
    // block grid (§A.2.2), not the MCU-padded one
    def walkBlocks(c: Comp, op: (Comp, Int, Int) => Unit): Unit = {
      val bw = ((width * c.h + hMax - 1) / hMax + 7) / 8
      val bh = ((height * c.v + vMax - 1) / vMax + 7) / 8
      var blk = 0
      val n = bw * bh
      while (blk < n) {
        if (ri > 0 && blk > 0 && blk % ri == 0) restart()
        op(c, blk % bw, blk / bw)
        blk += 1
      }
    }

    if (ss == 0) {
      val op: (Comp, Int, Int) => Unit = if (ah == 0) dcFirst else dcRefine
      if (scanComps.length > 1) {
        var mcu = 0
        val nMcu = mcusX * mcusY
        while (mcu < nMcu) {
          if (ri > 0 && mcu > 0 && mcu % ri == 0) restart()
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var bv = 0
            while (bv < c.v) {
              var bh2 = 0
              while (bh2 < c.h) {
                op(c, mx * c.h + bh2, my * c.v + bv)
                bh2 += 1
              }
              bv += 1
            }
            ci += 1
          }
          mcu += 1
        }
      } else walkBlocks(scanComps(0), op)
    } else {
      val c = scanComps(0)
      val op: (Comp, Int, Int) => Unit =
        if (ah == 0) (cc, bx, by) => acFirst(cc, ((by * cc.blocksW) + bx) * 64)
        else (cc, bx, by) => acRefine(cc, ((by * cc.blocksW) + bx) * 64)
      walkBlocks(c, op)
    }

    // byte-align and skip to the next true marker (RSTn between restart
    // intervals were consumed in-scan; a trailing one is skipped here)
    var q = br.pos
    while (q + 1 < p.length && !((p(q) & 0xff) == 0xff && {
      val nm = p(q + 1) & 0xff
      nm != 0x00 && !(nm >= 0xd0 && nm <= 0xd7)
    })) q += 1
    q
  }

  /** One PROGRESSIVE-ARITHMETIC scan (SOFA, T.81 §G.2) into the
    * components' coefficient grids: the same spectral-band/successive-
    * approximation walk as [[progressiveScan]] but the entropy layer is
    * the QM coder with per-scan statistics — DC first scans run the
    * §F.2.4 diff model in the point-transformed domain, DC refinements
    * are one fixed-bin bit per block, AC first scans band-parameterize
    * the sequential model (no cross-block EOBRUN in arithmetic coding),
    * AC refinements follow Figure G.8's correction-bit walk. Statistics,
    * predictors, and conditioning reset per scan and per restart.
    * Returns the position of the next marker's 0xFF. */
  private def progressiveScanArith(p: Array[Byte], start: Int,
                                   comps: Array[Comp], scanComps: Array[Comp],
                                   dcL: Array[Int], dcU: Array[Int],
                                   acKx: Array[Int],
                                   ri: Int, ss: Int, se: Int, ah: Int, al: Int,
                                   mcusX: Int, mcusY: Int,
                                   width: Int, height: Int,
                                   hMax: Int, vMax: Int): Int = {
    var dec = new JpegArith.QmDecoder(p, start)
    var dcStats = Array.fill(4)(JpegArith.freshStats(64))
    var acStats = Array.fill(4)(JpegArith.freshStats(256))
    var fb = JpegArith.freshStats(1)
    fb(0) = JpegArith.FixedBin
    scanComps.foreach { c => c.pred = 0; c.dcCtx = 0 }
    val coefZ = new Array[Int](64)

    def restart(): Unit = {
      var q = dec.pos
      while (q + 1 < p.length && !((p(q) & 0xff) == 0xff &&
        ((p(q + 1) & 0xff) >= 0xd0 && (p(q + 1) & 0xff) <= 0xd7))) q += 1
      if (q + 1 >= p.length) throw new IllegalArgumentException("missing RST")
      dec = new JpegArith.QmDecoder(p, q + 2)
      dcStats = Array.fill(4)(JpegArith.freshStats(64))
      acStats = Array.fill(4)(JpegArith.freshStats(256))
      fb = JpegArith.freshStats(1)
      fb(0) = JpegArith.FixedBin
      scanComps.foreach { c => c.pred = 0; c.dcCtx = 0 }
    }

    def dcFirstA(c: Comp, bx: Int, by: Int): Unit = {
      val (diff, nctx) = JpegArith.decodeDcDiff(
        dec, dcStats(c.dcId), c.dcCtx, dcL(c.dcId), dcU(c.dcId))
      c.dcCtx = nctx
      c.pred += diff // predictor lives in the point-transformed domain
      c.coefs(((by * c.blocksW) + bx) * 64) = c.pred << al
    }
    def dcRefineA(c: Comp, bx: Int, by: Int): Unit =
      if (dec.decode(fb, 0) == 1)
        c.coefs(((by * c.blocksW) + bx) * 64) |= (1 << al)
    def acFirstA(c: Comp, off: Int): Unit = {
      java.util.Arrays.fill(coefZ, 0)
      JpegArith.decodeAcBand(dec, acStats(c.acId), fb, acKx(c.acId), coefZ,
        ss, se, al)
      var k = ss
      while (k <= se) {
        if (coefZ(k) != 0) c.coefs(off + ZIGZAG(k)) = coefZ(k)
        k += 1
      }
    }
    def acRefineA(c: Comp, off: Int): Unit =
      JpegArith.decodeAcRefineBlock(dec, acStats(c.acId), fb, c.coefs, off,
        ZIGZAG, ss, se, al)

    def walkBlocks(c: Comp, op: (Comp, Int, Int) => Unit): Unit = {
      val bw = ((width * c.h + hMax - 1) / hMax + 7) / 8
      val bh = ((height * c.v + vMax - 1) / vMax + 7) / 8
      var blk = 0
      val n = bw * bh
      while (blk < n) {
        if (ri > 0 && blk > 0 && blk % ri == 0) restart()
        op(c, blk % bw, blk / bw)
        blk += 1
      }
    }

    if (ss == 0) {
      val op: (Comp, Int, Int) => Unit = if (ah == 0) dcFirstA else dcRefineA
      if (scanComps.length > 1) {
        var mcu = 0
        val nMcu = mcusX * mcusY
        while (mcu < nMcu) {
          if (ri > 0 && mcu > 0 && mcu % ri == 0) restart()
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var bv = 0
            while (bv < c.v) {
              var bh2 = 0
              while (bh2 < c.h) {
                op(c, mx * c.h + bh2, my * c.v + bv)
                bh2 += 1
              }
              bv += 1
            }
            ci += 1
          }
          mcu += 1
        }
      } else walkBlocks(scanComps(0), op)
    } else {
      val c = scanComps(0)
      val op: (Comp, Int, Int) => Unit =
        if (ah == 0) (cc, bx, by) => acFirstA(cc, ((by * cc.blocksW) + bx) * 64)
        else (cc, bx, by) => acRefineA(cc, ((by * cc.blocksW) + bx) * 64)
      walkBlocks(c, op)
    }

    // byte-align and skip to the next true marker, as progressiveScan does
    var q = dec.pos
    while (q + 1 < p.length && !((p(q) & 0xff) == 0xff && {
      val nm = p(q + 1) & 0xff
      nm != 0x00 && !(nm >= 0xd0 && nm <= 0xd7)
    })) q += 1
    q
  }

  /** Dequantize + IDCT the accumulated progressive coefficient grids and
    * assemble the final image (runs at EOI, §G.1.2's reconstruction). */
  private def reconstructProgressive(width: Int, height: Int,
                                     comps: Array[Comp],
                                     qtabs: Array[Array[Int]],
                                     hMax: Int, vMax: Int): Option[JpegImage] = {
    if (comps == null) return None
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    comps.foreach { c =>
      val qt = qtabs(c.qId)
      if (qt == null) return None
      var by = 0
      while (by < c.blocksH) {
        var bx = 0
        while (bx < c.blocksW) {
          val off = ((by * c.blocksW) + bx) * 64
          var i = 0
          while (i < 64) { // qt is zigzag-ordered, coefs natural-ordered
            val z = ZIGZAG(i)
            coef(z) = c.coefs(off + z) * qt(i)
            i += 1
          }
          idctToPlane(coef, tmp, c, bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
    }
    assemble(width, height, comps, hMax, vMax)
  }

  private def decodeScan(p: Array[Byte], start: Int, width: Int, height: Int,
                         comps: Array[Comp], scanComps: Array[Comp],
                         qtabs: Array[Array[Int]],
                         dcTabs: Array[Huff], acTabs: Array[Huff],
                         ri: Int, precision: Int = 8): Option[JpegImage] = {
    val half = 1 << (precision - 1)
    val maxV = (1 << precision) - 1
    if (width <= 0 || height <= 0 || width.toLong * height > (1L << 26)) return None
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      c.pred = 0
    }
    val br = new BitReader(p, start)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)

    // decode one 8×8 block of component `c` whose top-left pixel (in the
    // component's own plane resolution) is (px0, py0)
    def block(c: Comp, px0: Int, py0: Int): Unit = {
      val qt = qtabs(c.qId)
      java.util.Arrays.fill(coef, 0)
      val t = dcTabs(c.dcId).decode(br) // DC (§F.2.2.1)
      c.pred += extend(br.receive(t), t)
      coef(0) = c.pred * qt(0)
      var k = 1 // AC (§F.2.2.2)
      var done = false
      while (k < 64 && !done) {
        val rs = acTabs(c.acId).decode(br)
        val r = rs >> 4
        val s = rs & 0xf
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else done = true // EOB
        } else {
          k += r
          if (k > 63) throw new IllegalArgumentException("AC overrun")
          coef(ZIGZAG(k)) = extend(br.receive(s), s) * qt(k)
          k += 1
        }
      }
      idctToPlane(coef, tmp, c, px0, py0, half, maxV)
    }

    def restart(): Unit = {
      // RSTn: byte-align, consume the marker, reset every DC predictor
      br.reset()
      var q = br.pos
      while (q + 1 < p.length && !((p(q) & 0xff) == 0xff &&
        ((p(q + 1) & 0xff) >= 0xd0 && (p(q + 1) & 0xff) <= 0xd7))) q += 1
      if (q + 1 >= p.length) throw new IllegalArgumentException("missing RST")
      br.pos = q + 2
      comps.foreach(_.pred = 0)
    }

    if (comps.length == 1) {
      // non-interleaved: the MCU is one block, over the component's own
      // full block grid (§A.2.2)
      val c = comps(0)
      val bw = (width + 7) / 8
      val bh = (height + 7) / 8
      // plane sized by the MCU math above can be smaller than the block
      // grid here (hMax==h==1): resize to the non-interleaved grid
      c.planeW = bw * 8
      c.planeH = bh * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      var blk = 0
      val nBlk = bw * bh
      while (blk < nBlk) {
        if (ri > 0 && blk > 0 && blk % ri == 0) restart()
        block(c, (blk % bw) * 8, (blk / bw) * 8)
        blk += 1
      }
      assemble(width, height, comps, hMax, vMax)
    } else {
      // interleaved MCUs (§A.2.3): per MCU, each component contributes
      // its h×v blocks in raster order
      var mcu = 0
      val nMcu = mcusX * mcusY
      while (mcu < nMcu) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) restart()
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              block(c, (mx * c.h + bh) * 8, (my * c.v + bv) * 8)
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcu += 1
      }
      assemble(width, height, comps, hMax, vMax)
    }
  }

  /** Sequential ARITHMETIC scan (SOF9): same MCU walk as [[decodeScan]]
    * but the entropy layer is the T.81 Annex D QM coder with the §F.2.4
    * DC/AC statistical models ([[JpegArith]]). Restart markers flush the
    * coder and reset ALL statistics areas, DC predictors, and DC
    * conditioning categories (§F.1.4.4.1.3). The walk is kept parallel
    * to decodeScan's rather than abstracted over it — the per-block
    * decode shapes differ enough (streamed Huffman bits vs decision
    * trees over persistent statistics) that a shared harness would be
    * all parameters. */
  private def decodeScanArith(p: Array[Byte], start: Int,
                              width: Int, height: Int,
                              comps: Array[Comp], scanComps: Array[Comp],
                              qtabs: Array[Array[Int]],
                              dcL: Array[Int], dcU: Array[Int],
                              acKx: Array[Int],
                              ri: Int, precision: Int = 8): Option[JpegImage] = {
    val half = 1 << (precision - 1)
    val maxV = (1 << precision) - 1
    if (width <= 0 || height <= 0 || width.toLong * height > (1L << 26)) return None
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      c.pred = 0
      c.dcCtx = 0
    }
    var dec = new JpegArith.QmDecoder(p, start)
    var dcStats = Array.fill(4)(JpegArith.freshStats(64))
    var acStats = Array.fill(4)(JpegArith.freshStats(256))
    var fb = JpegArith.freshStats(1)
    fb(0) = JpegArith.FixedBin
    val coefZ = new Array[Int](64)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)

    def block(c: Comp, px0: Int, py0: Int): Unit = {
      val qt = qtabs(c.qId)
      java.util.Arrays.fill(coefZ, 0)
      val (diff, nctx) = JpegArith.decodeDcDiff(
        dec, dcStats(c.dcId), c.dcCtx, dcL(c.dcId), dcU(c.dcId))
      c.dcCtx = nctx
      c.pred += diff
      coefZ(0) = c.pred
      JpegArith.decodeAcBlock(dec, acStats(c.acId), fb, acKx(c.acId), coefZ)
      var i = 0 // dequantize + inverse zigzag (qt is zigzag-ordered)
      while (i < 64) { coef(ZIGZAG(i)) = coefZ(i) * qt(i); i += 1 }
      idctToPlane(coef, tmp, c, px0, py0, half, maxV)
    }

    def restart(): Unit = {
      // the QM decoder stops consuming at any marker; entropy remnants
      // before it can only contain stuffed FF00 pairs, so scanning for
      // FF D0-D7 cannot false-positive
      var q = dec.pos
      while (q + 1 < p.length && !((p(q) & 0xff) == 0xff &&
        ((p(q + 1) & 0xff) >= 0xd0 && (p(q + 1) & 0xff) <= 0xd7))) q += 1
      if (q + 1 >= p.length) throw new IllegalArgumentException("missing RST")
      dec = new JpegArith.QmDecoder(p, q + 2)
      dcStats = Array.fill(4)(JpegArith.freshStats(64))
      acStats = Array.fill(4)(JpegArith.freshStats(256))
      fb = JpegArith.freshStats(1)
      fb(0) = JpegArith.FixedBin
      comps.foreach { c => c.pred = 0; c.dcCtx = 0 }
    }

    if (comps.length == 1) {
      // non-interleaved single-component walk (§A.2.2), same grid fixup
      // as decodeScan's
      val c = comps(0)
      val bw = (width + 7) / 8
      val bh = (height + 7) / 8
      c.planeW = bw * 8
      c.planeH = bh * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      var blk = 0
      val nBlk = bw * bh
      while (blk < nBlk) {
        if (ri > 0 && blk > 0 && blk % ri == 0) restart()
        block(c, (blk % bw) * 8, (blk / bw) * 8)
        blk += 1
      }
      assemble(width, height, comps, hMax, vMax)
    } else {
      var mcu = 0
      val nMcu = mcusX * mcusY
      while (mcu < nMcu) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) restart()
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              block(c, (mx * c.h + bh) * 8, (my * c.v + bv) * 8)
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcu += 1
      }
      assemble(width, height, comps, hMax, vMax)
    }
  }
}
