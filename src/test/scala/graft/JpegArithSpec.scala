package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Jpeg, JpegArith, Multimodal}

/** T.81 Annex D QM coder + §F.1.4/§F.2.4 sequential-DCT statistical
  * models. No arithmetic-JPEG codec exists in this container, so
  * conformance is pinned by (a) encoder↔decoder round-trips at the bit,
  * coefficient-block, and full-stream levels, (b) pixel parity between
  * an arithmetic stream and its JDK-Huffman twin carrying the SAME
  * quantized coefficients, and (c) structural invariants of the Table
  * D.3 state machine (see JpegArith's scaladoc for the full story). */
class JpegArithSpec extends AnyFunSuite {

  // deterministic PRNG — fixture bytes must be identical across runs
  private def rng(seed: Long) = new scala.util.Random(seed)

  test("Table D.3 structural invariants: Qe bounds, switch states, fixed bin") {
    val switchStates = (0 until 113).filter(JpegArith.switchOf(_) == 1)
    // the fast-attack states at the head of each estimation plane
    assert(switchStates == Seq(0, 14, 36, 64, 80, 88, 95, 105, 110, 112))
    (0 until JpegArith.tableSize).foreach { i =>
      assert(JpegArith.qeOf(i) >= 1 && JpegArith.qeOf(i) < 0x8000, s"Qe($i)")
      assert(JpegArith.nmpsOf(i) < JpegArith.tableSize, s"NMPS($i)")
    }
    // no ADAPTIVE state transitions into the fixed bin
    (0 until 113).foreach(i => assert(JpegArith.nlpsOf(i) < 113, s"NLPS($i)"))
    // index 113 is the non-adaptive bin: self-loops, never switches MPS
    assert(JpegArith.nmpsOf(113) == 113 && JpegArith.nlpsOf(113) == 113 &&
      JpegArith.switchOf(113) == 0)
    // along the steady-state MPS chain (past the attack states) the LPS
    // estimate Qe must shrink — the adaptation direction of §D.1.5
    (1 until 13).foreach { i =>
      assert(JpegArith.qeOf(JpegArith.nmpsOf(i)) <= JpegArith.qeOf(i), s"chain at $i")
    }
  }

  test("bit-level round-trip: biased random decision streams, many contexts") {
    val r = rng(0xA117L)
    // several biases to drive states deep into each estimation plane and
    // exercise LPS/MPS exchange, carry chains, and FF stuffing
    for (bias <- Seq(0.02, 0.2, 0.5, 0.8, 0.98); n <- Seq(1, 7, 64)) {
      val ctxOf = Array.fill(5000)(r.nextInt(n))
      val bits = Array.fill(5000)(if (r.nextDouble() < bias) 1 else 0)
      val encStats = JpegArith.freshStats(n)
      val enc = new JpegArith.QmEncoder
      var i = 0
      while (i < bits.length) { enc.encode(encStats, ctxOf(i), bits(i)); i += 1 }
      val seg = enc.finish()
      // stuffing invariant: inside the segment every 0xFF is followed by 0x00
      seg.indices.dropRight(1).foreach { j =>
        if ((seg(j) & 0xff) == 0xff) assert((seg(j + 1) & 0xff) == 0x00, s"at $j")
      }
      val decStats = JpegArith.freshStats(n)
      val dec = new JpegArith.QmDecoder(seg, 0)
      i = 0
      while (i < bits.length) {
        assert(dec.decode(decStats, ctxOf(i)) == bits(i), s"bias=$bias n=$n bit $i")
        i += 1
      }
    }
  }

  test("bit-level round-trip survives trailing-zero-byte truncation " +
    "(the spec lets encoders discard trailing 0x00s; decoder pads zeros)") {
    val r = rng(0xBEEF)
    val bits = Array.fill(800)(if (r.nextDouble() < 0.7) 1 else 0)
    val st = JpegArith.freshStats(1)
    val enc = new JpegArith.QmEncoder
    bits.foreach(enc.encode(st, 0, _))
    var seg = enc.finish()
    while (seg.nonEmpty && seg.last == 0 &&
      (seg.length < 2 || (seg(seg.length - 2) & 0xff) != 0xff)) // keep stuffs
      seg = seg.dropRight(1)
    val dst = JpegArith.freshStats(1)
    val dec = new JpegArith.QmDecoder(seg, 0)
    bits.zipWithIndex.foreach { case (b, i) => assert(dec.decode(dst, 0) == b, s"bit $i") }
  }

  test("DC model round-trip: diffs across magnitudes, signs, conditioning") {
    for ((l, u) <- Seq((0, 1), (0, 0), (2, 5), (0, 15))) {
      val r = rng(1000L * l + u)
      val diffs = Array.fill(600)(r.nextInt(5) match {
        case 0 => 0
        case 1 => r.nextInt(3) - 1
        case 2 => (r.nextInt(64) + 1) * (if (r.nextBoolean()) 1 else -1)
        case 3 => (r.nextInt(2047) + 1) * (if (r.nextBoolean()) 1 else -1)
        case _ => (r.nextInt(16383) + 1) * (if (r.nextBoolean()) 1 else -1)
      })
      val encSt = JpegArith.freshStats(64)
      val enc = new JpegArith.QmEncoder
      var ctx = 0
      diffs.foreach { d => ctx = JpegArith.encodeDcDiff(enc, encSt, ctx, l, u, d) }
      val seg = enc.finish()
      val decSt = JpegArith.freshStats(64)
      val dec = new JpegArith.QmDecoder(seg, 0)
      var dctx = 0
      diffs.zipWithIndex.foreach { case (d, i) =>
        val (got, nctx) = JpegArith.decodeDcDiff(dec, decSt, dctx, l, u)
        assert(got == d, s"L=$l U=$u diff $i")
        dctx = nctx
      }
    }
  }

  test("AC model round-trip: random blocks with runs, EOBs, magnitude banks") {
    for (kx <- Seq(1, 5, 63)) {
      val r = rng(7700L + kx)
      val blocks = Array.fill(300) {
        val b = new Array[Int](64)
        val nnz = r.nextInt(12) // 0 = immediate EOB
        (0 until nnz).foreach { _ =>
          val k = 1 + r.nextInt(63)
          b(k) = (r.nextInt(3) match {
            case 0 => r.nextInt(2) + 1
            case 1 => r.nextInt(255) + 1
            case _ => r.nextInt(16383) + 1
          }) * (if (r.nextBoolean()) 1 else -1)
        }
        b
      }
      val encSt = JpegArith.freshStats(256)
      val encFb = JpegArith.freshStats(1); encFb(0) = JpegArith.FixedBin
      val enc = new JpegArith.QmEncoder
      blocks.foreach(JpegArith.encodeAcBlock(enc, encSt, encFb, kx, _))
      val seg = enc.finish()
      val decSt = JpegArith.freshStats(256)
      val decFb = JpegArith.freshStats(1); decFb(0) = JpegArith.FixedBin
      val dec = new JpegArith.QmDecoder(seg, 0)
      blocks.zipWithIndex.foreach { case (b, i) =>
        val got = new Array[Int](64)
        JpegArith.decodeAcBlock(dec, decSt, decFb, kx, got)
        assert(got.drop(1).sameElements(b.drop(1)), s"kx=$kx block $i")
      }
    }
  }

  // ---- full-stream fixtures ----

  private val onesQ = Array.fill(64)(1)

  /** Gray arithmetic stream from block-constant values — DC-only blocks
    * (forward DCT of a constant block v is exactly 8·(v−128)). */
  private def arithGray(w: Int, h: Int, blockVal: (Int, Int) => Int,
                        ri: Int = 0): Array[Byte] =
    JpegArith.encodeSequential(w, h,
      Seq(JpegArith.ArithComp(id = 1, h = 1, v = 1, qId = 0, dcId = 0, acId = 0)),
      Map(0 -> onesQ),
      (_, bx, by) => {
        val b = new Array[Int](64)
        b(0) = 8 * ((blockVal(bx, by) & 0xff) - 128)
        b
      }, ri = ri)

  test("full-stream gray: arithmetic stream decodes; pixel parity with the " +
    "JDK-Huffman twin carrying the same coefficients") {
    val v = (bx: Int, by: Int) => (37 * bx + 11 * by * by + 5) % 256
    val (w, h) = (48, 24)
    val Some((aw, ah, apx)) = Jpeg.decodeGray(arithGray(w, h, v)): @unchecked
    assert(aw == w && ah == h)
    // exactness: block-constant + all-ones quant round-trips bit-perfectly
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        assert(apx(y * w + x) == v(x / 8, y / 8), s"($x,$y)")
      }
    }
    // parity with the Huffman twin (JDK encoder at quality 1.0 = all-ones
    // quant on these block-constant pixels → identical coefficients)
    val Some((hw, hh, hpx)) =
      Jpeg.decodeGray(Multimodal.jpegGrayBytes(w, h, v)): @unchecked
    assert(hw == aw && hh == ah && hpx.sameElements(apx))
  }

  test("full-stream gray with restart intervals: per-interval flush + " +
    "statistics reset round-trips") {
    val v = (bx: Int, by: Int) => (203 * bx + 31 * by) % 256
    val (w, h) = (64, 32)
    for (ri <- Seq(1, 3, 7)) {
      val Some((dw, dh, px)) = Jpeg.decodeGray(arithGray(w, h, v, ri = ri)): @unchecked
      assert(dw == w && dh == h)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          assert(px(y * w + x) == v(x / 8, y / 8), s"ri=$ri ($x,$y)")
        }
      }
    }
  }

  test("full-stream gray with AC energy: decode matches an independent " +
    "dequant+IDCT reference on random coefficient blocks") {
    val r = rng(0xDC7)
    val (w, h) = (32, 16)
    val bw = w / 8
    val coefs = Array.fill(h / 8, bw) {
      val b = new Array[Int](64)
      b(0) = r.nextInt(401) - 200
      (0 until 6).foreach(_ => b(1 + r.nextInt(63)) = r.nextInt(41) - 20)
      b
    }
    val bytes = JpegArith.encodeSequential(w, h,
      Seq(JpegArith.ArithComp(1, 1, 1, 0, 0, 0)), Map(0 -> onesQ),
      (_, bx, by) => coefs(by)(bx))
    val Some((dw, dh, px)) = Jpeg.decodeGray(bytes): @unchecked
    assert(dw == w && dh == h)
    // reference: direct O(64²) IDCT of the same (zigzag-ordered) blocks
    val zig = Jpeg.ZIGZAG
    def cc(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val blk = coefs(y / 8)(x / 8)
        val nat = new Array[Int](64)
        (0 until 64).foreach(i => nat(zig(i)) = blk(i))
        var acc = 0.0
        (0 until 8).foreach { u =>
          (0 until 8).foreach { vv =>
            acc += cc(u) * cc(vv) * nat(vv * 8 + u) *
              math.cos((2 * (x % 8) + 1) * u * math.Pi / 16) *
              math.cos((2 * (y % 8) + 1) * vv * math.Pi / 16)
          }
        }
        val want = math.max(0, math.min(255, math.round(acc / 4.0).toInt + 128))
        assert(px(y * w + x) == want, s"($x,$y)")
      }
    }
  }

  test("full-stream color 4:2:0 neutral-gray: parity with the JDK-Huffman " +
    "color twin through the full interleaved pipeline") {
    val (w, h) = (32, 32) // 2×2 macroblocks
    val gv = (mx: Int, my: Int) => { val g = 40 + 60 * mx + 90 * my; (g << 16) | (g << 8) | g }
    // neutral gray: Y = v exactly, Cb = Cr = 128 → chroma DC diff 0
    val comps = Seq(
      JpegArith.ArithComp(1, 2, 2, 0, 0, 0), // Y, 4:2:0
      JpegArith.ArithComp(2, 1, 1, 1, 1, 1), // Cb
      JpegArith.ArithComp(3, 1, 1, 1, 1, 1)) // Cr
    val bytes = JpegArith.encodeSequential(w, h, comps,
      Map(0 -> onesQ, 1 -> onesQ),
      (ci, bx, by) => {
        val b = new Array[Int](64)
        if (ci == 0) { // Y plane: 8×8 blocks inside 16×16 macroblocks
          val g = (gv(bx / 2, by / 2) & 0xff)
          b(0) = 8 * (g - 128)
        } // chroma: level 128 → coefficient 0
        b
      })
    val Some(aimg) = Jpeg.decodeRgb(bytes): @unchecked
    val Some(himg) = Jpeg.decodeRgb(Multimodal.jpegRgbBytes(w, h, gv)): @unchecked
    assert(aimg.width == w && aimg.height == h && aimg.nComp == 3)
    assert(himg.width == aimg.width && himg.height == aimg.height)
    assert(aimg.px.sameElements(himg.px))
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        assert(aimg.px(y * w + x) == gv(x / 16, y / 16), s"($x,$y)")
      }
    }
  }

  test("malformed arithmetic streams quarantine (None), never mis-decode") {
    val good = arithGray(16, 16, (bx, by) => 50 + 10 * bx + 20 * by)
    assert(Jpeg.decodeGray(good).nonEmpty)
    // truncations across the whole stream: the entropy decoder pads
    // zeros at EOF, so a cut stream either fails marker parse (None) or
    // yields pixels — it must never throw
    (2 until good.length by 3).foreach { cut =>
      Jpeg.decodeGray(good.take(cut)) // must not throw
    }
    // a sequential-shaped scan header under a SOFA frame marker violates
    // the progressive scan rules (DC band must be exactly 0) → quarantine
    val sofa = good.clone()
    val sofIdx = sofa.indices.find(i =>
      (sofa(i) & 0xff) == 0xff && (sofa(i + 1) & 0xff) == 0xc9).get
    sofa(sofIdx + 1) = 0xca.toByte
    assert(Jpeg.decodeGray(sofa).isEmpty)
    // DAC with L > U quarantines
    val badDac = good.clone()
    val dacIdx = badDac.indices.find(i =>
      (badDac(i) & 0xff) == 0xff && (badDac(i + 1) & 0xff) == 0xcc).get
    badDac(dacIdx + 5) = 0x0f.toByte // L=15, U=0
    assert(Jpeg.decodeGray(badDac).isEmpty)
  }

  // ---- progressive-arithmetic (SOFA, §G.2) ----

  private val fullProgScript = Seq(
    JpegArith.ProgScan(Seq(0), 0, 0, 0, 1),   // DC first at Al=1
    JpegArith.ProgScan(Seq(0), 1, 5, 0, 1),   // AC band first at Al=1
    JpegArith.ProgScan(Seq(0), 6, 63, 0, 1),
    JpegArith.ProgScan(Seq(0), 0, 0, 1, 0),   // DC refinement
    JpegArith.ProgScan(Seq(0), 1, 5, 1, 0),   // AC refinements
    JpegArith.ProgScan(Seq(0), 6, 63, 1, 0))

  test("progressive-arithmetic gray: multi-scan successive approximation " +
    "decodes identically to the sequential-arithmetic twin") {
    val r = rng(0x50FA)
    val (w, h) = (32, 16)
    val coefs = Array.fill(h / 8, w / 8) {
      val b = new Array[Int](64)
      b(0) = r.nextInt(401) - 200
      (0 until 8).foreach(_ => b(1 + r.nextInt(63)) = r.nextInt(41) - 20)
      b
    }
    val comps = Seq(JpegArith.ArithComp(1, 1, 1, 0, 0, 0))
    val blocks = (_: Int, bx: Int, by: Int) => coefs(by)(bx)
    val seqBytes = JpegArith.encodeSequential(w, h, comps, Map(0 -> onesQ), blocks)
    val progBytes = JpegArith.encodeProgressive(w, h, comps, Map(0 -> onesQ),
      blocks, fullProgScript)
    val Some((sw, sh, spx)) = Jpeg.decodeGray(seqBytes): @unchecked
    val Some((pw, ph, ppx)) = Jpeg.decodeGray(progBytes): @unchecked
    assert(pw == sw && ph == sh && ppx.sameElements(spx))
  }

  test("progressive-arithmetic gray with restart intervals round-trips") {
    val r = rng(0x50FB)
    val (w, h) = (48, 16)
    val coefs = Array.fill(h / 8, w / 8) {
      val b = new Array[Int](64)
      b(0) = r.nextInt(201) - 100
      (0 until 5).foreach(_ => b(1 + r.nextInt(63)) = r.nextInt(21) - 10)
      b
    }
    val comps = Seq(JpegArith.ArithComp(1, 1, 1, 0, 0, 0))
    val blocks = (_: Int, bx: Int, by: Int) => coefs(by)(bx)
    val seqBytes = JpegArith.encodeSequential(w, h, comps, Map(0 -> onesQ), blocks)
    val progBytes = JpegArith.encodeProgressive(w, h, comps, Map(0 -> onesQ),
      blocks, fullProgScript, ri = 2)
    val Some((_, _, spx)) = Jpeg.decodeGray(seqBytes): @unchecked
    val Some((pw, ph, ppx)) = Jpeg.decodeGray(progBytes): @unchecked
    assert(pw == w && ph == h && ppx.sameElements(spx))
  }

  test("progressive-arithmetic block-constant gray: pixel parity with the " +
    "JDK progressive-HUFFMAN twin and exact closed-form values") {
    val v = (bx: Int, by: Int) => (55 + 41 * bx + 23 * by) % 256
    val (w, h) = (40, 24)
    val comps = Seq(JpegArith.ArithComp(1, 1, 1, 0, 0, 0))
    val bytes = JpegArith.encodeProgressive(w, h, comps, Map(0 -> onesQ),
      (_, bx, by) => {
        val b = new Array[Int](64)
        b(0) = 8 * ((v(bx, by) & 0xff) - 128)
        b
      }, fullProgScript)
    val Some((dw, dh, px)) = Jpeg.decodeGray(bytes): @unchecked
    assert(dw == w && dh == h)
    (0 until h).foreach { y =>
      (0 until w).foreach { x => assert(px(y * w + x) == v(x / 8, y / 8), s"($x,$y)") }
    }
    val Some((hw, hh, hpx)) =
      Jpeg.decodeGray(Multimodal.jpegGrayProgressiveBytes(w, h, v)): @unchecked
    assert(hw == dw && hh == dh && hpx.sameElements(px))
  }

  test("progressive-arithmetic 4:2:0 color: interleaved DC scan + per-" +
    "component AC scans match the sequential-arithmetic twin") {
    val (w, h) = (32, 32)
    val r = rng(0x50FC)
    // luma blocks carry AC energy; chroma stays neutral (DC 0)
    val yCoefs = Array.fill(4, 4) {
      val b = new Array[Int](64)
      b(0) = r.nextInt(201) - 100
      (0 until 4).foreach(_ => b(1 + r.nextInt(63)) = r.nextInt(17) - 8)
      b
    }
    val comps = Seq(
      JpegArith.ArithComp(1, 2, 2, 0, 0, 0),
      JpegArith.ArithComp(2, 1, 1, 1, 1, 1),
      JpegArith.ArithComp(3, 1, 1, 1, 1, 1))
    val blocks = (ci: Int, bx: Int, by: Int) =>
      if (ci == 0) yCoefs(by)(bx) else new Array[Int](64)
    val script = Seq(
      JpegArith.ProgScan(Seq(0, 1, 2), 0, 0, 0, 1), // interleaved DC first
      JpegArith.ProgScan(Seq(0), 1, 63, 0, 0),      // AC full-band, Al=0
      JpegArith.ProgScan(Seq(1), 1, 63, 0, 0),
      JpegArith.ProgScan(Seq(2), 1, 63, 0, 0),
      JpegArith.ProgScan(Seq(0, 1, 2), 0, 0, 1, 0)) // DC refinement
    val seqBytes = JpegArith.encodeSequential(w, h, comps,
      Map(0 -> onesQ, 1 -> onesQ), blocks)
    val progBytes = JpegArith.encodeProgressive(w, h, comps,
      Map(0 -> onesQ, 1 -> onesQ), blocks, script)
    val Some(simg) = Jpeg.decodeRgb(seqBytes): @unchecked
    val Some(pimg) = Jpeg.decodeRgb(progBytes): @unchecked
    assert(pimg.width == w && pimg.height == h && pimg.nComp == 3)
    assert(pimg.px.sameElements(simg.px))
  }

  // ---- 12-bit extended sequential (SOF1 Huffman / SOF9 arithmetic) ----

  test("12-bit: SOF1-Huffman and SOF9-arithmetic twins decode to identical " +
    "0-4095 pixels incl. range extremes; 8-bit entry points quarantine") {
    val v12 = (bx: Int, by: Int) => Seq(0, 4095, 2048, 17, 3333, 512)(
      (bx + by * 3) % 6)
    val (w, h) = (24, 16)
    val huff = Multimodal.jpegGray12HuffBytes(w, h, v12)
    val ones16 = Array.fill(64)(1)
    val arith = JpegArith.encodeSequential(w, h,
      Seq(JpegArith.ArithComp(1, 1, 1, 0, 0, 0)), Map(0 -> ones16),
      (_, bx, by) => {
        val b = new Array[Int](64)
        b(0) = 8 * ((v12(bx, by) & 0xfff) - 2048)
        b
      }, precision = 12)
    val Some((hw, hh, hpx)) = Jpeg.decodeGray12(huff): @unchecked
    val Some((aw, ah, apx)) = Jpeg.decodeGray12(arith): @unchecked
    assert(hw == w && hh == h && aw == w && ah == h)
    assert(hpx.sameElements(apx))
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        assert(hpx(y * w + x) == v12(x / 8, y / 8), s"($x,$y)")
      }
    }
    // the 8-bit contract paths must quarantine 12-bit streams, never
    // deliver out-of-range samples into packed-RGB arithmetic
    assert(Jpeg.decodeGray(huff).isEmpty && Jpeg.decodeGray(arith).isEmpty)
    assert(Jpeg.decodeRgb(huff).isEmpty && Jpeg.decodeRgb(arith).isEmpty)
    // and decodeGray12 still reads plain 8-bit streams (superset entry)
    assert(Jpeg.decodeGray12(
      Multimodal.jpegGrayBytes(16, 8, (_, _) => 77)).nonEmpty)
  }

  test("12-bit arithmetic with AC energy: decode matches the dequant+IDCT " +
    "reference at the 2048 level shift and 4095 clamp") {
    val r = rng(0x12B1)
    val (w, h) = (16, 16)
    val coefs = Array.fill(2, 2) {
      val b = new Array[Int](64)
      b(0) = r.nextInt(8001) - 4000
      (0 until 6).foreach(_ => b(1 + r.nextInt(63)) = r.nextInt(801) - 400)
      b
    }
    val bytes = JpegArith.encodeSequential(w, h,
      Seq(JpegArith.ArithComp(1, 1, 1, 0, 0, 0)), Map(0 -> onesQ),
      (_, bx, by) => coefs(by)(bx), precision = 12)
    val Some((dw, dh, px)) = Jpeg.decodeGray12(bytes): @unchecked
    assert(dw == w && dh == h)
    val zig = Jpeg.ZIGZAG
    def cc(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val blk = coefs(y / 8)(x / 8)
        val nat = new Array[Int](64)
        (0 until 64).foreach(i => nat(zig(i)) = blk(i))
        var acc = 0.0
        (0 until 8).foreach { u =>
          (0 until 8).foreach { vv =>
            acc += cc(u) * cc(vv) * nat(vv * 8 + u) *
              math.cos((2 * (x % 8) + 1) * u * math.Pi / 16) *
              math.cos((2 * (y % 8) + 1) * vv * math.Pi / 16)
          }
        }
        val want = math.max(0, math.min(4095, math.round(acc / 4.0).toInt + 2048))
        assert(px(y * w + x) == want, s"($x,$y)")
      }
    }
  }

  test("fuzz: bit-flip and truncation mutations of arithmetic streams " +
    "(SOF9/SOFA/12-bit) never throw or hang — decode or quarantine") {
    val r = rng(0xF022)
    val gray = arithGray(24, 16, (bx, by) => (40 * bx + 90 * by) % 256, ri = 2)
    val prog = JpegArith.encodeProgressive(16, 16,
      Seq(JpegArith.ArithComp(1, 1, 1, 0, 0, 0)), Map(0 -> onesQ),
      (_, bx, by) => { val b = new Array[Int](64); b(0) = 64 * (bx - by); b },
      fullProgScript)
    val b12 = JpegArith.encodeSequential(16, 8,
      Seq(JpegArith.ArithComp(1, 1, 1, 0, 0, 0)), Map(0 -> onesQ),
      (_, bx, by) => { val b = new Array[Int](64); b(0) = 8 * (500 * bx - 2000); b },
      precision = 12)
    for (base <- Seq(gray, prog, b12); _ <- 0 until 150) {
      val m = base.clone()
      r.nextInt(3) match {
        case 0 => // single bit flip anywhere
          val i = r.nextInt(m.length)
          m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
        case 1 => // byte splice
          m(r.nextInt(m.length)) = r.nextInt(256).toByte
        case _ => () // plain truncation below
      }
      val cut = 2 + r.nextInt(m.length - 1)
      // must terminate without an uncaught throw; result value is free
      Jpeg.decodeGray(m)
      Jpeg.decodeGray12(m)
      Jpeg.decodeGray(m.take(cut))
      Jpeg.decodeGray12(m.take(cut))
    }
  }

  test("fuzz: bit-flip and truncation mutations of SOF3 lossless streams " +
    "never throw or hang — decode or quarantine") {
    val r = rng(0x50F3F0)
    val bases = Seq(
      Jpeg.encodeLossless(13, 9, 8, 4, 0,
        Array.tabulate(13 * 9)(i => i * 37 % 256)),
      Jpeg.encodeLossless(8, 8, 16, 7, 1,
        Array.tabulate(64)(i => i * 991 % 32768), restartInterval = 8))
    for (base <- bases; _ <- 0 until 200) {
      val m = base.clone()
      r.nextInt(3) match {
        case 0 =>
          val i = r.nextInt(m.length)
          m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
        case 1 => m(r.nextInt(m.length)) = r.nextInt(256).toByte
        case _ => ()
      }
      val cut = 2 + r.nextInt(m.length - 1)
      Jpeg.decodeLossless(m)
      Jpeg.decodeLossless(m.take(cut))
      // the DCT paths must also survive mutated SOF3 bytes (sniffed as
      // JPEG, routed to decode0, quarantined there)
      Jpeg.decodeGray(m)
    }
  }

  test("Multimodal plumbing: arithmetic JPEGs flow through decodeJpegRgb " +
    "and imageDhash identically to their Huffman twins") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val (w, h) = (32, 32)
    val gv = (mx: Int, my: Int) => { val g = 30 + 50 * mx + 70 * my; (g << 16) | (g << 8) | g }
    val arith = JpegArith.encodeSequential(w, h,
      Seq(JpegArith.ArithComp(1, 2, 2, 0, 0, 0),
        JpegArith.ArithComp(2, 1, 1, 1, 1, 1),
        JpegArith.ArithComp(3, 1, 1, 1, 1, 1)),
      Map(0 -> onesQ, 1 -> onesQ),
      (ci, bx, by) => {
        val b = new Array[Int](64)
        if (ci == 0) b(0) = 8 * ((gv(bx / 2, by / 2) & 0xff) - 128)
        b
      })
    val huff = Multimodal.jpegRgbBytes(w, h, gv)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", arith, "image/jpeg", Some(w), Some(h), None),
      Multimodal.MediaRow(2L, "image", huff, "image/jpeg", Some(w), Some(h), None))
    val ds = spark.createDataset(rows)
    val out = Multimodal.decodeJpegRgb(ds).collect().sortBy(_.media_id)
    assert(out.forall(_.ok))
    assert(out(0).sum_r == out(1).sum_r && out(0).sum_g == out(1).sum_g &&
      out(0).sum_b == out(1).sum_b && out(0).first_pixel == out(1).first_pixel)
  }

  test("SOF3 lossless: bit-exact round-trip across predictors 1-7, " +
    "precisions 2/8/12/16, point transform, odd dims, restart intervals") {
    val r = rng(0x50f3)
    for {
      predictor <- 1 to 7
      precision <- Seq(2, 8, 12, 16)
      pt <- Seq(0, 1) if pt < precision
      restart <- Seq(0, 5)
    } {
      val (w, h) = (11, 7) // no 8-alignment in lossless — sample walk only
      val mod = 1 << (precision - pt)
      val samples = Array.fill(w * h)(r.nextInt(mod))
      val bytes = Jpeg.encodeLossless(w, h, precision, predictor, pt,
        samples, restartInterval = restart)
      val Some((dw, dh, px, dp)) = Jpeg.decodeLossless(bytes): @unchecked
      assert((dw, dh, dp) == (w, h, precision),
        s"pred=$predictor p=$precision pt=$pt rst=$restart")
      assert(px.toSeq == samples.map(_ << pt).toSeq,
        s"pixels diverged: pred=$predictor p=$precision pt=$pt rst=$restart")
    }
  }

  test("SOF3 lossless: the SSSS=16 escape (diff ≡ 32768 mod 2^16) " +
    "round-trips at full 16-bit swing") {
    // first sample: default pred 1<<15 = 32768, sample 0 → d16 = 0x8000;
    // then a 0 → 65535 swing forces the escape mid-scan too
    val samples = Array(0, 65535, 0, 65535, 32768, 0)
    val bytes = Jpeg.encodeLossless(3, 2, 16, 1, 0, samples)
    val Some((_, _, px, _)) = Jpeg.decodeLossless(bytes): @unchecked
    assert(px.toSeq == samples.toSeq)
  }

  test("SOF3 lossless: scope boundaries — DCT entry points quarantine " +
    "SOF3 streams, decodeLossless quarantines DCT/malformed streams") {
    val samples = Array.tabulate(6 * 4)(i => i * 9 % 256)
    val sof3 = Jpeg.encodeLossless(6, 4, 8, 4, 0, samples)
    // DCT paths must not mis-decode a lossless stream
    assert(Jpeg.decodeGray(sof3).isEmpty)
    assert(Jpeg.decodeRgb(sof3).isEmpty)
    assert(Jpeg.decodeGray12(sof3).isEmpty)
    // and the lossless path must not touch a DCT stream
    val dct = Multimodal.jpegGray12HuffBytes(8, 8, (_, _) => 1234)
    assert(Jpeg.decodeLossless(dct).isEmpty)
    // malformed: truncation never throws and never yields WRONG pixels —
    // a cut inside the entropy data quarantines; a cut that only loses
    // the trailing EOI may still decode, but then must be bit-exact
    val want = samples.toSeq
    (1 until sof3.length by 7).foreach { n =>
      Jpeg.decodeLossless(sof3.take(n)) match {
        case None => ()
        case Some((w, h, px, _)) =>
          assert((w, h) == (6, 4) && px.toSeq == want,
            s"truncation at $n decoded WRONG pixels")
      }
    }
    // crafted header maxing dims trips the sample budget, not an OOM
    val big = sof3.clone()
    // height/width live at SOF3 payload offsets +5/+7 (after FFD8 FFC3 len P)
    big(7) = 0x7f.toByte; big(8) = 0xff.toByte // height 32767
    big(9) = 0x7f.toByte; big(10) = 0xff.toByte // width 32767
    assert(Jpeg.decodeLossless(big).isEmpty)
  }
}
