package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Jpeg, JpegArith}

/** Regression conformance for the SELF-CONSISTENT codecs (round-16 VERDICT
  * #3): the SOF3/SOF9/SOFA encoder+decoder pairs share an author and no
  * external reference codec exists in this environment, so a mirrored
  * encoder/decoder deviation would round-trip invisibly. External
  * conformance stays impossible — regression conformance doesn't: the
  * encoder's CURRENT bytes and the decoder's CURRENT pixels for a fixture
  * matrix (precisions × predictors × restart intervals × subsampling ×
  * conditioning × scan scripts) are checked in under
  * `src/test/resources/golden_jpeg/`, and this spec asserts byte- and
  * pixel-exact equality forever. Either side drifting — even in tandem —
  * now fails a test instead of silently re-defining the format.
  *
  * Regenerating the goldens is a DELIBERATE act (a format change, not a
  * refactor): run with GRAFT_REGEN_GOLDEN=1, eyeball the diff, commit.
  */
class GoldenBitstreamSpec extends AnyFunSuite {

  private val goldenDir: Path = Paths.get("src/test/resources/golden_jpeg")
  private val regen = sys.env.contains("GRAFT_REGEN_GOLDEN")

  /** Deterministic sample grid (java.util.Random's LCG is spec-stable). */
  private def grid(seed: Long, n: Int, bound: Int): Array[Int] = {
    val r = new java.util.Random(seed)
    Array.fill(n)(r.nextInt(bound))
  }

  /** Deterministic sparse zigzag coefficient blocks. */
  private def coefBlocks(seed: Long, bw: Int, bh: Int,
                         dcBound: Int, acBound: Int): Array[Array[Array[Int]]] = {
    val r = new java.util.Random(seed)
    Array.fill(bh, bw) {
      val b = new Array[Int](64)
      b(0) = r.nextInt(2 * dcBound + 1) - dcBound
      (0 until 6).foreach(_ => b(1 + r.nextInt(63)) = r.nextInt(2 * acBound + 1) - acBound)
      b
    }
  }

  private val onesQ = Array.fill(64)(1)

  /** name → (encode now, decode bytes → (w, h, pixel stream)). */
  private case class Golden(name: String, encode: () => Array[Byte],
                            decode: Array[Byte] => Option[(Int, Int, Array[Int])])

  private def lossless(name: String, w: Int, h: Int, precision: Int,
                       predictor: Int, pt: Int, ri: Int, seed: Long) =
    Golden(name,
      () => Jpeg.encodeLossless(w, h, precision, predictor, pt,
        grid(seed, w * h, 1 << (precision - pt)), ri),
      bytes => Jpeg.decodeLossless(bytes).map { case (dw, dh, px, _) => (dw, dh, px) })

  private def grayComp = Seq(JpegArith.ArithComp(1, 1, 1, 0, 0, 0))

  private def seqGray(name: String, w: Int, h: Int, seed: Long, ri: Int = 0,
                      dcL: Int = 0, dcU: Int = 1, acKx: Int = 5) =
    Golden(name,
      () => {
        val c = coefBlocks(seed, w / 8, h / 8, 200, 20)
        JpegArith.encodeSequential(w, h, grayComp, Map(0 -> onesQ),
          (_, bx, by) => c(by)(bx), ri = ri, dcL = dcL, dcU = dcU, acKx = acKx)
      },
      bytes => Jpeg.decodeGray(bytes))

  private val fullProgScript = Seq(
    JpegArith.ProgScan(Seq(0), 0, 0, 0, 1),
    JpegArith.ProgScan(Seq(0), 1, 5, 0, 1),
    JpegArith.ProgScan(Seq(0), 6, 63, 0, 1),
    JpegArith.ProgScan(Seq(0), 0, 0, 1, 0),
    JpegArith.ProgScan(Seq(0), 1, 5, 1, 0),
    JpegArith.ProgScan(Seq(0), 6, 63, 1, 0))

  private def progGray(name: String, w: Int, h: Int, seed: Long, ri: Int = 0) =
    Golden(name,
      () => {
        val c = coefBlocks(seed, w / 8, h / 8, 100, 10)
        JpegArith.encodeProgressive(w, h, grayComp, Map(0 -> onesQ),
          (_, bx, by) => c(by)(bx), fullProgScript, ri = ri)
      },
      bytes => Jpeg.decodeGray(bytes))

  private val cases: Seq[Golden] =
    // SOF3 lossless: every predictor at 8-bit, the wide precisions, a
    // restart interval, and a point transform
    (1 to 7).map(p =>
      lossless(s"sof3_p8_pred$p", 16, 8, 8, p, 0, 0, seed = 0xC3000L + p)) ++
    Seq(
      lossless("sof3_p12_pred4", 12, 6, 12, 4, 0, 0, seed = 0xC312L),
      lossless("sof3_p16_pred6", 10, 5, 16, 6, 0, 0, seed = 0xC316L),
      lossless("sof3_p8_pred5_ri3", 16, 8, 8, 5, 0, 3, seed = 0xC35DL),
      lossless("sof3_p8_pred2_pt2", 16, 8, 8, 2, 2, 0, seed = 0xC3B2L),
      // SOF9 sequential-arithmetic: gray, restart, non-default conditioning
      seqGray("sof9_gray", 32, 16, seed = 0x9001L),
      seqGray("sof9_gray_ri3", 32, 16, seed = 0x9003L, ri = 3),
      seqGray("sof9_gray_cond", 32, 16, seed = 0x9005L, dcL = 1, dcU = 2, acKx = 9),
      // SOF9 interleaved 4:2:0 color (Y carries the detail, neutral chroma)
      Golden("sof9_color420",
        () => {
          val c = coefBlocks(0x9420L, 4, 4, 150, 12)
          val comps = Seq(
            JpegArith.ArithComp(1, 2, 2, 0, 0, 0),
            JpegArith.ArithComp(2, 1, 1, 1, 1, 1),
            JpegArith.ArithComp(3, 1, 1, 1, 1, 1))
          JpegArith.encodeSequential(32, 32, comps, Map(0 -> onesQ, 1 -> onesQ),
            (ci, bx, by) => if (ci == 0) c(by)(bx) else new Array[Int](64))
        },
        bytes => Jpeg.decodeRgb(bytes).map(i => (i.width, i.height, i.px))),
      // SOFA progressive-arithmetic: full successive-approximation script
      progGray("sofa_gray", 32, 16, seed = 0xA001L),
      progGray("sofa_gray_ri2", 48, 16, seed = 0xA002L, ri = 2))

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def goldenPath(name: String) = goldenDir.resolve(s"$name.golden")

  test("golden bitstreams: encoder bytes and decoder pixels are pinned " +
    "for the SOF3/SOF9/SOFA fixture matrix") {
    if (regen) Files.createDirectories(goldenDir)
    val failures = cases.flatMap { g =>
      val bytes = g.encode()
      val Some((w, h, px)) = g.decode(bytes): @unchecked
      val body = s"${hex(bytes)}\n$w $h\n${px.mkString(",")}\n"
      val path = goldenPath(g.name)
      if (regen) {
        Files.write(path, body.getBytes(StandardCharsets.UTF_8)); Nil
      } else if (!Files.exists(path))
        Seq(s"${g.name}: golden file missing (${path}) — run once with " +
          "GRAFT_REGEN_GOLDEN=1 and commit the files")
      else {
        val lines = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
          .split("\n", -1)
        val (gHex, gDims, gPx) = (lines(0), lines(1), lines(2))
        // 1) encoder drift: current bytes must equal the pinned bytes
        val encDrift =
          if (hex(bytes) != gHex)
            Seq(s"${g.name}: ENCODER drift — bytes differ from the golden " +
              s"bitstream (${bytes.length} B now vs ${gHex.length / 2} B pinned)")
          else Nil
        // 2) decoder drift: the PINNED bytes must still decode to the
        // pinned pixels (catches decoder changes even when the encoder
        // drifted in tandem — the mirrored-deviation failure mode)
        val decDrift = g.decode(unhex(gHex)) match {
          case Some((dw, dh, dpx)) =>
            if (s"$dw $dh" != gDims || dpx.mkString(",") != gPx)
              Seq(s"${g.name}: DECODER drift — pinned bitstream no longer " +
                "decodes to the pinned pixels")
            else Nil
          case None =>
            Seq(s"${g.name}: DECODER drift — pinned bitstream now quarantines")
        }
        encDrift ++ decDrift
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("golden corpus is complete: one file per fixture case, no strays") {
    assume(!regen)
    assert(Files.isDirectory(goldenDir),
      s"$goldenDir missing — run once with GRAFT_REGEN_GOLDEN=1 and commit")
    import scala.jdk.CollectionConverters._
    val onDisk = Files.list(goldenDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".golden"))
      .map(_.stripSuffix(".golden")).toSet
    assert(onDisk == cases.map(_.name).toSet,
      s"golden dir / fixture matrix mismatch: extra=${onDisk -- cases.map(_.name).toSet} " +
        s"missing=${cases.map(_.name).toSet -- onDisk}")
  }
}
