package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, RasterCodecs, Tar, Warc}

/** Mutation fuzz for the remaining container/byte-walker parsers (round-16
  * VERDICT #7): the JPEG family already lives under decode-or-quarantine
  * fuzz discipline; Tar (POSIX ustar + pax/GNU longnames), Warc (ISO 28500
  * + gzip members) and the GIF LZW decoder get the same treatment here.
  * Mutations: single bit flips, slice splices, short insert/deletes
  * (every downstream offset shifts), truncations, and TARGETED
  * length-field lies (tar octal size, WARC Content-Length, GIF descriptor
  * dims and sub-block lengths). The contract under fuzz: parse or
  * quarantine — never an uncaught throw, never a hang, never an
  * input-disproportionate allocation. Results are free to be damaged rows;
  * only termination and exception-safety are asserted.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private def rng(seed: Long) = new java.util.Random(seed)

  /** Generic mutation, three arms that all mutate (ADVICE r17): a single
    * bit flip, a splice (a random slice copied over another region —
    * mis-frames structures without changing length), and an insert/delete
    * of a short run (SHIFTS every downstream offset, the class the other
    * two can't reach). Truncation is applied by the caller so targeted
    * length-field lies can compose with it. Length changes stay ≤16 bytes
    * so callers' structure-relative offsets (tar's 512-byte header grid)
    * remain in bounds. */
  private def mutate(r: java.util.Random, base: Array[Byte]): Array[Byte] =
    r.nextInt(3) match {
      case 0 =>
        val m = base.clone()
        val i = r.nextInt(m.length)
        m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
        m
      case 1 =>
        val m = base.clone()
        val len = 1 + r.nextInt(math.min(64, m.length))
        val src = r.nextInt(m.length - len + 1)
        // dst must differ from src — a same-offset copy is a structural
        // no-op and this arm exists to mutate. When the slice spans the
        // whole buffer (only one placement possible), degrade to a bit
        // flip rather than fuzz the unmutated base.
        if (m.length == len) {
          val i = r.nextInt(m.length)
          m(i) = (m(i) ^ 1).toByte
        } else {
          var dst = r.nextInt(m.length - len + 1)
          while (dst == src) dst = r.nextInt(m.length - len + 1)
          System.arraycopy(m, src, m, dst, len)
        }
        m
      case _ =>
        val len = 1 + r.nextInt(16)
        if (r.nextBoolean() && base.length > len + 2) {
          val at = r.nextInt(base.length - len)
          base.take(at) ++ base.drop(at + len)
        } else {
          val at = r.nextInt(base.length)
          val ins = Array.fill(len)(r.nextInt(256).toByte)
          base.take(at) ++ ins ++ base.drop(at)
        }
    }

  test("Tar.parse fuzz: flips, splices, truncations and octal size-field " +
    "lies parse-or-quarantine, never throw") {
    val r = rng(0x7A8001L)
    val entries = Seq(
      "a/one.txt" -> Array.tabulate(700)(i => (i * 31).toByte),
      ("deep/" + "d" * 120 + "/two.bin") -> Array.tabulate(90)(i => (i * 7).toByte),
      "three.json" -> "{\"k\": 1}".getBytes("UTF-8"))
    val bases = Seq(Tar.tarBytes(entries, "pax"), Tar.tarBytes(entries, "gnu"))
    for (base <- bases; _ <- 0 until 250) {
      val m = mutate(r, base)
      if (r.nextInt(4) == 0) {
        // the size-field lie: overwrite a header's octal size with a huge
        // value (or garbage) — a skip computed from it must not loop, scan
        // past the buffer, or allocate by the lie
        val hdrOff = 512 * r.nextInt(base.length / 512)
        val lie = r.nextInt(3) match {
          case 0 => "77777777777\u0000" // ~8 GiB
          case 1 => "99999999999\u0000" // not octal
          case _ => "-0000000100\u0000" // negative-ish garbage
        }
        val lb = lie.getBytes("US-ASCII")
        System.arraycopy(lb, 0, m, hdrOff + 124, math.min(lb.length, 12))
      }
      val cut = 2 + r.nextInt(m.length - 1)
      Tar.parse(1L, m).toList          // must terminate, never throw
      Tar.parse(2L, m.take(cut)).toList
    }
  }

  test("Warc.parse fuzz: flips, splices, truncations and Content-Length " +
    "lies parse-or-quarantine on both plain and gzip-member streams") {
    val r = rng(0x3A4C02L)
    val html = "<html><head><title>t</title></head><body>" +
      (1 to 40).map(i => s"<p>para $i with some words</p>").mkString + "</body></html>"
    val bases = Seq(
      Warc.warcBytes("https://h0.example.org/x", html, 7L, gzipped = false),
      Warc.warcBytes("https://h1.example.org/y", html, 8L, gzipped = true))
    for (base <- bases; _ <- 0 until 250) {
      var m = mutate(r, base)
      if (r.nextInt(4) == 0) {
        // Content-Length lie (plain stream only reads it as text; on the
        // gzip stream this just corrupts compressed bytes — also fine)
        val s = new String(m.map(b => (b & 0xff).toChar))
        val at = s.indexOf("Content-Length: ")
        if (at >= 0) {
          val lie = r.nextInt(3) match {
            case 0 => "99999999" case 1 => "-1\u0000\u0000" case _ => "zz"
          }
          val lb = lie.getBytes("US-ASCII")
          System.arraycopy(lb, 0, m, at + 16,
            math.min(lb.length, m.length - at - 16))
        }
      }
      val cut = 2 + r.nextInt(m.length - 1)
      Warc.parse(1L, m).toList
      Warc.parse(2L, m.take(cut)).toList
      m = null // keep the loop allocation-flat
    }
  }

  test("RasterCodecs.decodeGif fuzz: flips, splices, truncations, lying " +
    "descriptor dims and sub-block lengths decode-or-quarantine") {
    val r = rng(0x61F003L)
    // real JDK LZW streams: a solid tile (degenerate dictionary) and a
    // noisy gradient (deep dictionary, code-width growth)
    def gradientGif(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, ((x * 29 + y * 13) ^ (x + y)) & 0xff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", bos)
      bos.toByteArray
    }
    val bases = Seq(Multimodal.gifGrayBytes(33, 17, 180), gradientGif(40, 24))
    for (base <- bases; _ <- 0 until 300) {
      val m = mutate(r, base)
      if (r.nextInt(4) == 0) {
        // descriptor-dimension lie: find an image separator and claim a
        // 65535×65535 frame — the pixel guard must quarantine, not OOM
        val sep = m.indexWhere(_ == 0x2c.toByte)
        if (sep >= 0 && sep + 9 < m.length) {
          java.util.Arrays.fill(m, sep + 5, math.min(sep + 9, m.length), 0xff.toByte)
        }
      } else if (r.nextInt(4) == 0) {
        // sub-block length lie past the end of the buffer
        m(m.length - 2 - r.nextInt(math.min(32, m.length - 2))) = 0xff.toByte
      }
      val cut = 2 + r.nextInt(m.length - 1)
      RasterCodecs.decodeGif(m)
      RasterCodecs.decodeGif(m.take(cut))
    }
  }
}
