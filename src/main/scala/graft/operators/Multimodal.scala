package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata, the
  * standard layout for multimodal training shards. IMAGE decode is REAL
  * (`decodeImages` — `javax.imageio` is in the JDK: PNG/JPEG/BMP/GIF to
  * actual dims + per-pixel checksum, undecodable rows quarantined, never
  * task failures). AUDIO decode is REAL for PCM WAV (`audioWindows` —
  * `javax.sound.sampled` is in the JDK). VIDEO frame indexing is REAL
  * (`aviFrameIndex` — a pure-Scala RIFF/AVI header walk yielding actual
  * frame offsets/sizes/dims), and so is frame PIXEL decode: uncompressed
  * DIB ([[aviDecodeDib]]), RLE8 ([[aviDecodeRle8]], from the BMP spec)
  * and MJPG ([[aviDecodeMjpg]] via the from-spec T.81 decoder in
  * [[graft.operators.Jpeg]], which also handles 3-component color —
  * [[decodeJpegRgb]]); only progressive/arithmetic JPEG and non-MJPG
  * DCT video codecs quarantine. `decodeStub` keeps
  * the deterministic fake-header path so the generic typed-pipeline shape
  * stays testable independent of any container format, and a production
  * build swaps `decodeStub`/`extractFeatures` for a JNI/FFI codec without
  * touching the plan shape.
  *
  * Scale notes: media rows are large (MBs), so operators here avoid
  * wide shuffles — everything is mapPartitions-shaped (narrow), and
  * metadata-only aggregates drop the payload column *before* grouping so
  * the shuffle carries bytes-counts, not bytes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
  ))

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            mime: String, width: Option[Int], height: Option[Int],
                            duration_ms: Option[Long])

  final case class DecodedMedia(media_id: Long, kind: String, width: Int, height: Int,
                                n_frames: Int, checksum: Long)

  final case class MediaFeatures(media_id: Long, feature: Array[Float])

  /** STUB decoder — deterministic fake: "header" = first 8 bytes as two
    * big-endian ints (width, height); frames = payload length / 1024 + 1;
    * checksum = simple byte sum. A real build replaces this body with an
    * actual codec call; the signature and batch shape stay.
    */
  def decodeStub(r: MediaRow): DecodedMedia = {
    val p = if (r.payload == null) Array.empty[Byte] else r.payload
    def be32(off: Int): Int =
      if (p.length < off + 4) 0
      else ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
        ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
    var sum = 0L
    var i = 0
    while (i < p.length) { sum += (p(i) & 0xff); i += 1 }
    DecodedMedia(r.media_id, r.kind,
      width = math.abs(be32(0)) % 8192,
      height = math.abs(be32(4)) % 8192,
      n_frames = p.length / 1024 + 1,
      checksum = sum)
  }

  /** Decode pass: typed, per-partition (narrow — no shuffle). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  final case class DecodedImage(media_id: Long, width: Int, height: Int,
                                pix_sum: Long, ok: Boolean)

  /** REAL image decode — `javax.imageio` ships in the JDK, so the image
    * half of the multimodal story needs no external codec: PNG/JPEG/BMP/GIF
    * payloads decode to actual dimensions and a per-pixel RGB checksum
    * (Σ r+g+b over all pixels). Undecodable payloads come back as
    * `ok = false` zeros — quarantine rows, never task failures. Same
    * narrow mapPartitions shape as [[decode]]; audio/video remain header
    * stubs (no codecs in the JDK for those).
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // no temp-file cache: payloads are in-memory byte arrays; per-task
      // disk spooling would only add IO and /tmp churn
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        try {
          pixelsOf(if (r.payload == null) Array.empty[Byte] else r.payload) match {
            case None => DecodedImage(r.media_id, 0, 0, 0L, ok = false)
            case Some((w, h, buf)) =>
              var s = 0L
              var i = 0
              while (i < buf.length) {
                val rgb = buf(i)
                s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                i += 1
              }
              DecodedImage(r.media_id, w, h, s, ok = true)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            DecodedImage(r.media_id, 0, 0, 0L, ok = false)
        }
      }
    }
  }

  // javax.imageio's STATIC entry points (ImageIO.read / ImageIO.write) run
  // a synchronized plugin-registry lookup per CALL; under 32 decode threads
  // on tiny images that lock serializes the whole stage (measured on the
  // 500×(≤31×16)-PNG gate row: best-of-N steady slower than the cold run —
  // the contention grows as JIT makes everything else faster). One
  // reader/writer per (thread, format), fed MemoryCache image streams
  // directly, keeps the per-row path registry-free; readers reset() before
  // reuse so a corrupt payload can't poison the next row.
  private val writerTL: ThreadLocal[java.util.HashMap[String, javax.imageio.ImageWriter]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, javax.imageio.ImageWriter]())
  private def writeVia(fmt: String,
                       img: java.awt.image.BufferedImage): Array[Byte] = {
    val m = writerTL.get()
    var w = m.get(fmt)
    if (w == null) {
      w = javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
      m.put(fmt, w)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { w.setOutput(out); w.write(img); out.flush() }
    finally { w.setOutput(null); out.close() }
    bos.toByteArray
  }
  private def writePng(img: java.awt.image.BufferedImage): Array[Byte] =
    writeVia("png", img)

  private val jpegWriterTL: ThreadLocal[javax.imageio.ImageWriter] =
    ThreadLocal.withInitial(() =>
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next())
  /** Quality-1.0 JPEG encode on the cached per-thread writer — the fixture
    * encoders run per ROW inside map tasks, so the static registry lookup
    * they used to make per call was the same 32-thread lock as the decode
    * side. */
  private def writeJpegQ1(img: java.awt.image.BufferedImage,
                          progressive: Boolean = false): Array[Byte] = {
    val w = jpegWriterTL.get()
    val param = w.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    if (progressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      w.setOutput(out)
      w.write(null, new javax.imageio.IIOImage(img, null, null), param)
      out.flush()
    } finally { w.setOutput(null); out.close() }
    baos.toByteArray
  }

  private val readerTL: ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, javax.imageio.ImageReader]())
  private def sniffImageFormat(p: Array[Byte]): String =
    if (p.length >= 4 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') "png"
    else if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) "jpeg"
    else if (p.length >= 3 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F') "gif"
    else if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') "bmp"
    else null
  /** ImageIO decode without the static registry path: null for
    * unrecognized/undecodable payloads (the quarantine contract), throws
    * only what callers already catch. */
  private def readImage(p: Array[Byte]): java.awt.image.BufferedImage =
    sniffImageFormat(p) match {
      case null => // exotic container: fall back to the registry path once
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      case fmt =>
        val m = readerTL.get()
        var r = m.get(fmt)
        if (r == null) {
          r = javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next()
          m.put(fmt, r)
        }
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(p))
        try { r.reset(); r.setInput(in, true, true); r.read(0) }
        finally { in.close() }
    }

  /** Packed-RGB pixel extraction for the image operators: PNG/BMP/GIF go
    * through the from-spec decoders first ([[Png]], [[RasterCodecs]] — no
    * ImageIO, no ColorModel conversion; shapes outside their scope fall
    * back to the ImageIO reader), JPEG and unrecognized containers through
    * the cached per-thread ImageIO reader with one bulk getRGB (per-pixel
    * getRGB pays the ColorModel conversion per CALL and is ~10x slower on
    * megapixel rows). Null payload / unrecognized / undecodable → None
    * (the quarantine contract). */
  /** Decoded RGB pixels via the from-spec decoders, ImageIO as fallback
    * for out-of-scope shapes. PATH BOUNDARY (ADVICE round-14, closed in
    * code round-16): GRAY is normalized — the ImageIO fallback reads raw
    * raster samples as (g,g,g) (libpng convention, matching [[Png]])
    * instead of getRGB's gray→sRGB ColorModel ramp, so gray content
    * yields one pixel value (and one dhash key) across both strata
    * (CI-pinned in OperatorQualitySpec). The residual difference is
    * lossy-JPEG IDCT (±1 LSB between the from-spec float IDCT and the
    * JDK decoder) — inherent to JPEG, absorbed by hamming-tolerant
    * joins, not a key seam for lossless formats. */
  private def pixelsOf(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val viaSpec = sniffImageFormat(p) match {
      case "png" => Png.decodeRgb(p)
      case "bmp" => RasterCodecs.decodeBmp(p)
      case "gif" => RasterCodecs.decodeGif(p)
      case "jpeg" => // baseline + progressive from spec; arithmetic/12-bit
        Jpeg.decodeRgb(p).map(img => (img.width, img.height, img.px)) // → fallback
      case _ => None
    }
    viaSpec.orElse {
      val img = readImage(p)
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        // Gray images: read RAW raster samples as (g,g,g) — the same
        // libpng convention the from-spec PNG decoder uses — instead of
        // getRGB's linear-gray→sRGB ColorModel ramp. Without this, the
        // SAME visual content hashes differently depending on which
        // decoder stratum handled it (e.g. a 16-bit gray PNG falls back
        // here while its 8-bit twin decodes from spec), silently
        // splitting dedup groups on a key seam. 16-bit samples take the
        // high byte, matching the 8-bit truncation everywhere else.
        val isGray = img.getColorModel.getColorSpace.getType ==
          java.awt.color.ColorSpace.TYPE_GRAY
        if (isGray) {
          val raster = img.getRaster
          // arbitrary sample depth → 8-bit: >8-bit keeps the high byte
          // (shift = size-8, matching the 16-bit high-byte truncation
          // everywhere else — a flat shift of 8 would near-zero 9-15-bit
          // samples), sub-8-bit scales linearly to full range (0..2ⁿ-1 →
          // 0..255) so a 4-bit white is white, not 15/255 gray
          val size = raster.getSampleModel.getSampleSize(0)
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val s = raster.getSample(x, y, 0)
              val g =
                if (size >= 8) (s >> (size - 8)) & 0xff
                else (s * 255) / ((1 << size) - 1)
              out(y * w + x) = (g << 16) | (g << 8) | g
              x += 1
            }
            y += 1
          }
          Some((w, h, out))
        } else Some((w, h, img.getRGB(0, 0, w, h, null, 0, w)))
      }
    }
  }

  /** Real PNG bytes for a solid-`rgb` w×h image (ImageIO encoder). The
    * oracle-able fixture: PNG is lossless, so decoded dims and the pixel
    * checksum of a solid color are pure integer functions of (w, h, rgb). */
  def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    writePng(img)
  }

  /** EXIF orientation (tag 0x0112) from a JPEG's APP1 segment — the
    * public TIFF 6.0 IFD layout inside the Exif APP1 header: both byte
    * orders (II/MM), IFD0 entry walk, SHORT value read in the declared
    * endianness. Returns None when there is no APP1/Exif, no orientation
    * tag, or the structure is damaged — a pipeline treats that as
    * orientation 1 (upright) but must be able to DISTINGUISH absent from
    * upright, hence Option. Bounds-checked throughout; never throws. */
  def exifOrientation(p: Array[Byte]): Option[Int] = {
    try {
      if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
      var pos = 2
      while (pos + 4 <= p.length) {
        if ((p(pos) & 0xff) != 0xff) return None
        // T.81 B.1.1.2 permits any number of 0xFF fill bytes before the
        // marker code — skip them like the decoder's marker loop does
        var mp = pos + 1
        while (mp < p.length && (p(mp) & 0xff) == 0xff) mp += 1
        if (mp + 1 >= p.length) return None
        val m = p(mp) & 0xff
        pos = mp + 1 // first byte after the marker code
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { /* standalone: done */ }
        else if (m == 0xda || m == 0xd9) return None // scan/EOI: no APP1 seen
        else {
          val len = ((p(pos) & 0xff) << 8) | (p(pos + 1) & 0xff)
          if (len < 2 || pos + len > p.length) return None
          if (m == 0xe1 && len >= 16 &&
            new String(p, pos + 2, 4, "US-ASCII") == "Exif" &&
            p(pos + 6) == 0 && p(pos + 7) == 0) {
            val tiff = pos + 8 // TIFF header base (offsets are relative to it)
            val bom = new String(p, tiff, 2, "US-ASCII")
            val le = bom == "II"
            if (!le && bom != "MM") return None
            def u16(o: Int): Int =
              if (le) (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
              else ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
            def u32(o: Int): Long =
              if (le) (u16(o) & 0xffffL) | ((u16(o + 2) & 0xffffL) << 16)
              else ((u16(o) & 0xffffL) << 16) | (u16(o + 2) & 0xffffL)
            if (u16(tiff + 2) != 42) return None
            val ifd = tiff + u32(tiff + 4).toInt
            if (ifd < tiff || ifd + 2 > p.length) return None
            val n = u16(ifd)
            var e = 0
            while (e < n) {
              val ent = ifd + 2 + 12 * e
              if (ent + 12 > p.length) return None
              if (u16(ent) == 0x0112 && u16(ent + 2) == 3 && u32(ent + 4) == 1L) {
                val v = u16(ent + 8) // SHORT value left-justified in field
                return if (v >= 1 && v <= 8) Some(v) else None
              }
              e += 1
            }
            return None // APP1 present, orientation absent
          }
          pos += len // len counts itself; pos already sits at the length field
        }
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Fixture: insert a minimal Exif APP1 (single IFD0 entry: orientation)
    * right after SOI of an existing JPEG. `le` picks the TIFF byte order
    * so both endiannesses are exercised. */
  def jpegWithExif(jpeg: Array[Byte], orientation: Int,
                   le: Boolean = true): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    val app1 = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = { app1.write(v & 0xff); () }
    def w16(v: Int): Unit = if (le) { b(v); b(v >> 8) } else { b(v >> 8); b(v) }
    def w32(v: Int): Unit =
      if (le) { w16(v & 0xffff); w16(v >>> 16) } else { w16(v >>> 16); w16(v & 0xffff) }
    b(0xff); b(0xe1); b(0); b(34) // APP1, len = 2+6+8+2+12+4
    "Exif".foreach(c => b(c)); b(0); b(0)
    (if (le) "II" else "MM").foreach(c => b(c))
    w16(42); w32(8) // magic + IFD0 offset
    w16(1) // one entry
    w16(0x0112); w16(3); w32(1); w16(orientation); w16(0) // SHORT, padded
    w32(0) // next IFD
    jpeg.take(2) ++ app1.toByteArray ++ jpeg.drop(2)
  }

  final case class ImageExif(media_id: Long, has_exif: Boolean,
                             orientation: Int, ok: Boolean)

  /** Per-image EXIF orientation extraction — the prep step an image
    * pipeline runs BEFORE decode/resize so rotated captures land upright
    * (orientation 0 = no usable Exif; pipelines default it to 1). Narrow
    * mapPartitions; payloads never reach a shuffle. */
  def imageExif(media: Dataset[MediaRow]): Dataset[ImageExif] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      exifOrientation(p) match {
        case Some(o) => ImageExif(r.media_id, has_exif = true, o, ok = true)
        case None => ImageExif(r.media_id, has_exif = false, 0,
          ok = p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)
      }
    })
  }

  final case class ImageDhash(media_id: Long, width: Int, height: Int,
                              dhash_bits: String, ok: Boolean)

  /** Sampled difference hash (dHash) — the image-native member of the
    * near-dup family: decode, gray ((r+g+b)/3), sample a 9×8 grid with
    * the SAME integer mapping as [[resizeImages]] (src = dst·srcDim div
    * dstDim), emit one bit per horizontal neighbor pair (left > right),
    * row-major, as a 64-char '0'/'1' string. Hash equality groups exact
    * and near-exact rescales; banded substrings feed an LSH-style
    * candidate join for small Hamming distances (the simhash recipe).
    * The grid sampling (not region averaging) keeps every bit a pure
    * integer function of the pixels, so the gate oracle replays the hash
    * CLOSED-FORM from the gradient fixture's pixel formula. Undecodable
    * or sub-grid (<9×8) images quarantine. Decoder-stratum note (see
    * [[pixelsOf]]): gray handling is NORMALIZED across the from-spec and
    * ImageIO paths (both emit raw (g,g,g)), so gray content hashes
    * identically whichever stratum decodes it; the residual seam is the
    * ±1 IDCT LSB of lossy JPEG across decoders — inherent to JPEG, and
    * absorbed by the hamming-≤3 near join rather than exact grouping. */
  def imageDhash(media: Dataset[MediaRow]): Dataset[ImageDhash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      try {
        pixelsOf(if (r.payload == null) Array.empty[Byte] else r.payload) match {
          case Some((w, h, buf)) if w >= 9 && h >= 8 =>
            val bits = new java.lang.StringBuilder(64)
            var y2 = 0
            while (y2 < 8) {
              val sy = y2 * h / 8
              var x2 = 0
              while (x2 < 8) {
                def gray(xs: Int): Int = {
                  val rgb = buf(sy * w + xs)
                  (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                }
                bits.append(
                  if (gray(x2 * w / 9) > gray((x2 + 1) * w / 9)) '1' else '0')
                x2 += 1
              }
              y2 += 1
            }
            ImageDhash(r.media_id, w, h, bits.toString, ok = true)
          case _ => ImageDhash(r.media_id, 0, 0, "", ok = false)
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          ImageDhash(r.media_id, 0, 0, "", ok = false)
      }
    })
  }

  /** Real BMP bytes (JDK encoder: 24-bit BI_RGB, bottom-up, padded
    * strides) for a solid-`rgb` w×h image — lossless like [[pngBytes]],
    * same closed-form oracle story, decoded by the from-spec
    * [[RasterCodecs.decodeBmp]]. */
  def bmpBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    writeVia("bmp", img)
  }

  /** Real GIF bytes (JDK encoder: real LZW, 256-gray palette) for a solid
    * gray w×h image — pixel RGB decodes to (g, g, g), so the checksum is
    * the closed form w·h·3g. Decoded by the from-spec
    * [[RasterCodecs.decodeGif]]. */
  def gifGrayBytes(w: Int, h: Int, g: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.getRaster.setSample(x, y, 0, g & 0xff); x += 1 }
      y += 1
    }
    writeVia("gif", img)
  }

  /** Real PNG bytes for a w×h GRAY GRADIENT image: pixel (x, y) has gray
    * level `(seed + 3x + 7y) mod 256` in all three channels. Lossless like
    * [[pngBytes]], but position-dependent — a resample that picks the
    * wrong source pixels changes the checksum, which a solid color would
    * mask. */
  def pngGradientBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (seed + 3 * x + 7 * y) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    writePng(img)
  }

  /** Gradient + a 5-px-period 60-gray stripe: the near-dup fixture. A
    * pure gradient is dHash-INVARIANT under the integer resample (floor
    * composition lands on the same source pixel), so resized twins hash
    * at hamming 0 and a near-dup row degenerates to the exact join; the
    * stripe plants sparse high-frequency edges whose sampled column can
    * shift by one under a 3/2 resample, flipping 1-3 hash bits — the
    * regime a hamming-≤k band join exists for. Still closed-form:
    * g = (seed + 3x + 7y + 60·((x div 5) mod 2)) mod 256. */
  def pngStripeBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (seed + 3 * x + 7 * y + 60 * ((x / 5) % 2)) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    writePng(img)
  }

  final case class ResizedImage(media_id: Long, width: Int, height: Int,
                                out_w: Int, out_h: Int, pix_sum: Long,
                                ok: Boolean)

  /** REAL image resize (thumbnailing, the standard multimodal prep step):
    * decode via ImageIO, nearest-neighbor resample to `outW`×`outH` with
    * the integer mapping src = (dst · srcDim) div dstDim, and emit the
    * resized grid's RGB checksum. The mapping is pure integer arithmetic,
    * so a SQL oracle replays WHICH source pixels survive exactly — an
    * off-by-one in the sampling grid hash-fails. Same narrow mapPartitions
    * shape as [[decodeImages]]: payloads stay inside the map task, only
    * 40ish bytes of features ever reach a shuffle; undecodable rows
    * quarantine as ok=false. */
  def resizeImages(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[ResizedImage] = {
    require(outW > 0 && outH > 0, "output dims must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        try {
          pixelsOf(if (r.payload == null) Array.empty[Byte] else r.payload) match {
            case None => ResizedImage(r.media_id, 0, 0, outW, outH, 0L, ok = false)
            case Some((w, h, buf)) =>
              var s = 0L
              var y2 = 0
              while (y2 < outH) {
                val sy = y2 * h / outH
                var x2 = 0
                while (x2 < outW) {
                  val rgb = buf(sy * w + x2 * w / outW)
                  s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  x2 += 1
                }
                y2 += 1
              }
              ResizedImage(r.media_id, w, h, outW, outH, s, ok = true)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            ResizedImage(r.media_id, 0, 0, outW, outH, 0L, ok = false)
        }
      }
    }
  }

  /** Resize-and-MATERIALIZE: the thumbnail twin of [[resizeImages]] that
    * re-encodes the resampled grid as a lossless PNG `MediaRow`, so the
    * result can feed any downstream image operator ([[imageDhash]],
    * [[decodeImages]], …) — the real-pipeline composition "resize, then
    * perceptual-hash the thumbnail". Same integer mapping as
    * [[resizeImages]] (src = dst·srcDim div dstDim) at output dims
    * (w·num div den, h·num div den), so every surviving pixel — and
    * therefore every downstream hash bit — stays a pure integer function
    * of the source pixels that a SQL oracle can replay. Narrow
    * mapPartitions; payloads never cross a shuffle. Undecodable inputs
    * or degenerate output dims quarantine as an empty-payload row (every
    * downstream decoder already treats that as ok=false). */
  def resizeEncodePng(media: Dataset[MediaRow], num: Int, den: Int): Dataset[MediaRow] = {
    require(num > 0 && den > 0, "scale factors must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        try {
          pixelsOf(if (r.payload == null) Array.empty[Byte] else r.payload) match {
            case Some((w, h, buf)) if w.toLong * num / den > 0 && h.toLong * num / den > 0 =>
              val ow = (w.toLong * num / den).toInt
              val oh = (h.toLong * num / den).toInt
              val img = new java.awt.image.BufferedImage(
                ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y2 = 0
              while (y2 < oh) {
                val sy = (y2.toLong * h / oh).toInt
                var x2 = 0
                while (x2 < ow) {
                  img.setRGB(x2, y2, buf(sy * w + (x2.toLong * w / ow).toInt))
                  x2 += 1
                }
                y2 += 1
              }
              MediaRow(r.media_id, "image", writePng(img), "image/png",
                Some(ow), Some(oh), None)
            case _ =>
              MediaRow(r.media_id, "image", Array.empty[Byte], "image/png",
                None, None, None)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            MediaRow(r.media_id, "image", Array.empty[Byte], "image/png",
              None, None, None)
        }
      }
    }
  }

  /** Feature extraction stub: fixed-size float vector derived
    * deterministically from the payload (real build: model inference here).
    * Batch shape: one vector per row, dims = `dims`.
    */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      val f = new Array[Float](dims)
      var i = 0
      while (i < p.length) { f(i % dims) += (p(i) & 0xff) / 255.0f; i += 1 }
      MediaFeatures(r.media_id, f)
    })
  }

  /** Real WAV (RIFF PCM s16le mono) bytes for a sample array — the
    * audio analog of [[pngBytes]]: PCM is lossless, so anything decoded
    * from these bytes is a pure integer function of the sample values. */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  final case class AudioWindow(media_id: Long, win_idx: Int, n_samples: Int,
                               sum_sq: Long, peak: Int, sample_rate: Int,
                               ok: Boolean)

  /** REAL audio decode + fixed-size windowing — `javax.sound.sampled`
    * ships in the JDK, so PCM WAV needs no external codec. Each payload
    * decodes to s16 mono samples, then splits into `frameSize`-sample
    * windows with integer features (Σ s², max |s|) — the framing stage
    * every audio pipeline (VAD, fingerprinting, feature extraction) runs
    * first. Undecodable / non-PCM16 payloads yield one `ok = false` row —
    * quarantine, never task failure.
    *
    * Scale shape: narrow mapPartitions (decode is per-row CPU work); the
    * multi-MB payload is dropped at decode, so only fixed-width window
    * rows ever reach a shuffle.
    */
  def audioWindows(media: Dataset[MediaRow], frameSize: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(
            if (r.payload == null) Array.empty[Byte] else r.payload))
        val fmt = in.getFormat
        val pcm16Mono = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
        if (!pcm16Mono) Iterator.single(
          AudioWindow(r.media_id, 0, 0, 0L, 0, 0, ok = false))
        else {
          val bytes = in.readAllBytes()
          val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                      else java.nio.ByteOrder.LITTLE_ENDIAN
          val sb = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
          val n = sb.remaining()
          val rate = fmt.getSampleRate.toInt
          val nWin = (n + frameSize - 1) / frameSize
          Iterator.tabulate(nWin) { w =>
            var i = w * frameSize
            val end = math.min(i + frameSize, n)
            var ss = 0L
            var peak = 0
            while (i < end) {
              val s = sb.get(i).toInt
              ss += s.toLong * s
              val a = math.abs(s)
              if (a > peak) peak = a
              i += 1
            }
            AudioWindow(r.media_id, w, end - w * frameSize, ss, peak, rate, ok = true)
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          Iterator.single(AudioWindow(r.media_id, 0, 0, 0L, 0, 0, ok = false))
      }
    })
  }

  final case class AudioSig(media_id: Long, sig: String, ok: Boolean)

  /** Perceptual AUDIO signature for near-dup detection: the energy-
    * envelope analog of [[imageDhash]]. The first `nWin` windows of
    * `winSize` samples each reduce to Σs² (the same feature
    * [[audioWindows]] emits), and each bit compares consecutive window
    * energies — so the signature is invariant under amplitude scaling
    * (gain/normalization, the most common benign audio transform), the
    * way dHash is invariant under brightness shift. nWin=65 yields the
    * 64-bit string [[Dedup.bitstringNearPairs]] bands. Too-short or
    * non-PCM16 payloads quarantine. Zero shuffle: payload → one
    * signature row inside the decode mapPartitions. */
  def audioEnvelopeSig(media: Dataset[MediaRow], winSize: Int,
                       nWin: Int): Dataset[AudioSig] = {
    require(winSize >= 1 && nWin >= 2)
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(
            if (r.payload == null) Array.empty[Byte] else r.payload))
        val fmt = in.getFormat
        val pcm16Mono = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
        if (!pcm16Mono) AudioSig(r.media_id, "", ok = false)
        else {
          val bytes = in.readAllBytes()
          val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                      else java.nio.ByteOrder.LITTLE_ENDIAN
          val sb = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
          if (sb.remaining() < winSize * nWin) AudioSig(r.media_id, "", ok = false)
          else {
            val sums = Array.tabulate(nWin) { w =>
              var i = w * winSize
              val end = i + winSize
              var ss = 0L
              while (i < end) {
                val s = sb.get(i).toInt
                ss += s.toLong * s
                i += 1
              }
              ss
            }
            val bits = new java.lang.StringBuilder(nWin - 1)
            var w = 0
            while (w < nWin - 1) {
              bits.append(if (sums(w) > sums(w + 1)) '1' else '0')
              w += 1
            }
            AudioSig(r.media_id, bits.toString, ok = true)
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) => AudioSig(r.media_id, "", ok = false)
      }
    })
  }

  // IMA/DVI ADPCM tables (public spec: IMA "Recommended Practices for
  // Enhancing Digital Audio Compatibility", rev 3.00 — the same tables in
  // RFC 3551 §4.5.1 and the WAV format-0x11 codec)
  private val AdpcmStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val AdpcmIndex: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode an IMA ADPCM nibble stream (one 4-bit code per input byte's
    * low nibble) into s16 PCM, from the initial (predictor=0, index=0)
    * state — the codec KERNEL of WAV format 0x11 / RFC 3551 DVI4, pure
    * integer and fully deterministic. Returns the decoded samples. */
  def adpcmDecode(nibbles: Array[Byte]): Array[Int] =
    adpcmDecodeFrom(nibbles, 0, nibbles.length, 0, 0)

  /** Same kernel from an explicit (predictor, step-index) seed over a
    * byte-range of low nibbles — the per-block entry the WAV format-0x11
    * container path needs (each block header carries its own seed). */
  private[operators] def adpcmDecodeFrom(nibbles: Array[Byte], off: Int,
                                         len: Int, pred0: Int,
                                         idx0: Int): Array[Int] = {
    val out = new Array[Int](len)
    var pred = pred0
    var idx = math.max(0, math.min(88, idx0))
    var i = 0
    while (i < len) {
      val nib = nibbles(off + i) & 0x0f
      val step = AdpcmStep(idx)
      var diff = step >> 3
      if ((nib & 1) != 0) diff += step >> 2
      if ((nib & 2) != 0) diff += step >> 1
      if ((nib & 4) != 0) diff += step
      pred = if ((nib & 8) != 0) pred - diff else pred + diff
      if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
      idx += AdpcmIndex(nib)
      if (idx < 0) idx = 0 else if (idx > 88) idx = 88
      out(i) = pred
      i += 1
    }
    out
  }

  /** Test/fixture-side IMA ADPCM ENCODER (same spec section): greedy
    * nibble choice against the shared step table. decode(encode(pcm))
    * tracks the input within the local step size — the codec's designed
    * error bound, asserted in CI. */
  def adpcmEncode(pcm: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](pcm.length)
    var pred = 0
    var idx = 0
    var i = 0
    while (i < pcm.length) {
      val step = AdpcmStep(idx)
      var delta = pcm(i) - pred
      var nib = 0
      if (delta < 0) { nib = 8; delta = -delta }
      if (delta >= step) { nib |= 4; delta -= step }
      if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1 }
      if (delta >= (step >> 2)) { nib |= 1 }
      // replay the decoder's reconstruction so the states stay in lockstep
      var diff = step >> 3
      if ((nib & 1) != 0) diff += step >> 2
      if ((nib & 2) != 0) diff += step >> 1
      if ((nib & 4) != 0) diff += step
      pred = if ((nib & 8) != 0) pred - diff else pred + diff
      if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
      idx += AdpcmIndex(nib)
      if (idx < 0) idx = 0 else if (idx > 88) idx = 88
      out(i) = nib.toByte
      i += 1
    }
    out
  }

  /** Minimal WAV format-0x11 (IMA ADPCM) container bytes: RIFF/WAVE with
    * a 20-byte `fmt ` chunk (tag 0x11, mono, 4-bit, cbSize=2 carrying
    * samplesPerBlock) and one `data` block per entry — each block the
    * standard 4-byte state header (initial predictor s16 LE, step index
    * u8, reserved u8) followed by nibble PAIRS (low nibble first). All
    * blocks must share one nibble count (blockAlign is a single fmt
    * field). Fixture-side helper, pairs with [[adpcmFromWav]] the way
    * [[wavBytes]] pairs with [[audioWindows]]. */
  def adpcmWavBytes(sampleRate: Int,
                    blocks: Array[(Int, Int, Array[Byte])]): Array[Byte] = {
    require(blocks.nonEmpty && blocks.map(_._3.length).distinct.length == 1,
      "uniform nibble count per block")
    val nNib = blocks(0)._3.length
    require(nNib % 2 == 0, "nibbles pack two per byte")
    val blockAlign = 4 + nNib / 2
    val samplesPerBlock = 1 + nNib
    val dataSz = blocks.length * blockAlign
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 8 + dataSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 20 + 8 + dataSz)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * blockAlign / samplesPerBlock)
      .putShort(blockAlign.toShort).putShort(4).putShort(2)
      .putShort(samplesPerBlock.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSz)
    blocks.foreach { case (pred0, idx0, nibs) =>
      bb.putShort(pred0.toShort).put(idx0.toByte).put(0.toByte)
      var j = 0
      while (j < nNib) {
        bb.put((((nibs(j + 1) & 0xf) << 4) | (nibs(j) & 0xf)).toByte)
        j += 2
      }
    }
    bb.array()
  }

  final case class AdpcmBlock(media_id: Long, block_idx: Int, n_samples: Int,
                              sum_pcm: Long, min_pcm: Int, max_pcm: Int,
                              last_pcm: Int, ok: Boolean)

  /** REAL compressed-audio CONTAINER decode: WAV format 0x11 (IMA ADPCM)
    * parsed from the RIFF chunks — fmt tag/mono check, blockAlign +
    * samplesPerBlock from the fmt extension, then per-block decode seeded
    * from each block's own 4-byte state header (the header predictor IS
    * sample 0, per the format spec). Per-block integer features; a
    * payload that is not mono IMA-ADPCM WAV quarantines as one ok=false
    * row. Narrow mapPartitions; payloads never reach a shuffle. */
  def adpcmFromWav(media: Dataset[MediaRow]): Dataset[AdpcmBlock] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      def bad = Iterator.single(AdpcmBlock(r.media_id, 0, 0, 0L, 0, 0, 0, ok = false))
      try {
        val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        if (p.length < 12 || bb.getInt(0) != 0x46464952 /* RIFF */ ||
          bb.getInt(8) != 0x45564157 /* WAVE */) bad
        else {
          var off = 12
          var blockAlign = -1
          var samplesPerBlock = -1
          var dataOff = -1
          var dataLen = -1
          while (off + 8 <= p.length) {
            val id = bb.getInt(off)
            val sz = bb.getInt(off + 4)
            if (sz < 0 || off + 8 + sz > p.length) { off = p.length }
            else {
              if (id == 0x20746d66 /* fmt */ && sz >= 20 &&
                bb.getShort(off + 8) == 0x11 && bb.getShort(off + 10) == 1) {
                blockAlign = bb.getShort(off + 20) & 0xffff
                samplesPerBlock = bb.getShort(off + 26) & 0xffff
              } else if (id == 0x61746164 /* data */) {
                dataOff = off + 8; dataLen = sz
              }
              off += 8 + sz + (sz & 1)
            }
          }
          val nNib = samplesPerBlock - 1
          if (blockAlign < 5 || samplesPerBlock < 2 || dataOff < 0 ||
            nNib != (blockAlign - 4) * 2) bad
          else {
            val nBlocks = dataLen / blockAlign
            Iterator.tabulate(nBlocks) { b =>
              val base = dataOff + b * blockAlign
              val pred0 = bb.getShort(base).toInt
              val idx0 = p(base + 2) & 0xff
              if (idx0 > 88) AdpcmBlock(r.media_id, b, 0, 0L, 0, 0, 0, ok = false)
              else {
                val nibs = new Array[Byte](nNib)
                var j = 0
                while (j < nNib) {
                  val byte = p(base + 4 + j / 2) & 0xff
                  nibs(j) = (if (j % 2 == 0) byte & 0xf else byte >> 4).toByte
                  j += 1
                }
                val dec = adpcmDecodeFrom(nibs, 0, nNib, pred0, idx0)
                var s = pred0.toLong
                var mn = pred0
                var mx = pred0
                var i = 0
                while (i < dec.length) {
                  val v = dec(i)
                  s += v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  i += 1
                }
                AdpcmBlock(r.media_id, b, samplesPerBlock, s, mn, mx,
                  if (dec.isEmpty) pred0 else dec(dec.length - 1), ok = true)
              }
            }
          }
        }
      } catch { case scala.util.control.NonFatal(_) => bad }
    })
  }

  // ------------------------------------------------------------- G.711

  /** G.711 µ-law byte → linear PCM (ITU-T G.711, the 0x07 WAV format tag
    * and RFC 3551 PCMU payload): stateless 8-bit logarithmic companding,
    * the telephony/speech-corpus codec. Output is the classic
    * 16-bit-scaled linear value in [-32124, 32124] (the 14-bit G.711
    * value << 2 — the same scale javax.sound and libavcodec emit). */
  def ulawToPcm(b: Int): Int = {
    val u = ~b & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law byte → linear PCM (the 0x06 WAV format tag / RFC 3551
    * PCMA): 16-bit-scaled linear in [-32256, 32256] (the 13-bit G.711
    * value << 3; 0x55 toggle + segment expansion; sign bit SET means
    * positive, unlike µ-law). */
  def alawToPcm(b: Int): Int = {
    val a = (b ^ 0x55) & 0xff
    val t = (a & 0x0f) << 4
    val seg = (a >> 4) & 7
    val mag = seg match {
      case 0 => t + 8
      case 1 => t + 0x108
      case s => (t + 0x108) << (s - 1)
    }
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Minimal G.711 WAV container bytes: RIFF/WAVE, 16-byte `fmt ` chunk
    * with tag 0x07 (µ-law) or 0x06 (A-law), mono, 8 bits/sample, one data
    * chunk of raw companded bytes. Fixture-side helper, pairs with
    * [[g711FromWav]]. */
  def g711WavBytes(sampleRate: Int, bytes: Array[Byte],
                   mu: Boolean): Array[Byte] = {
    val n = bytes.length
    val bb = java.nio.ByteBuffer.allocate(44 + n + (n & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + n + (n & 1)).putInt(0x45564157)
    bb.putInt(0x20746d66).putInt(16)
      .putShort(if (mu) 0x07 else 0x06).putShort(1).putInt(sampleRate)
      .putInt(sampleRate) // byte rate = sample rate at 1 byte/sample
      .putShort(1).putShort(8)
    bb.putInt(0x61746164).putInt(n).put(bytes)
    bb.array()
  }

  final case class G711Pcm(media_id: Long, law: String, n_samples: Int,
                           sum_pcm: Long, min_pcm: Int, max_pcm: Int,
                           last_pcm: Int, ok: Boolean)

  /** REAL telephony-audio CONTAINER decode: WAV format 0x07 (µ-law) /
    * 0x06 (A-law) parsed from the RIFF chunks, each companded byte
    * expanded by the stateless G.711 kernel, integer stream features
    * emitted (the decode is stateless, so the gate oracle replays the
    * segment-expansion formula per byte in closed form). Not-mono /
    * not-8-bit / not-G.711 payloads quarantine as one ok=false row. Same
    * narrow mapPartitions shape as [[adpcmFromWav]]. */
  def g711FromWav(media: Dataset[MediaRow]): Dataset[G711Pcm] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      def bad = G711Pcm(r.media_id, "", 0, 0L, 0, 0, 0, ok = false)
      try {
        val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        if (p.length < 12 || bb.getInt(0) != 0x46464952 ||
          bb.getInt(8) != 0x45564157) bad
        else {
          var off = 12
          var tag = -1
          var dataOff = -1
          var dataLen = -1
          while (off + 8 <= p.length) {
            val id = bb.getInt(off)
            val sz = bb.getInt(off + 4)
            if (sz < 0 || off + 8 + sz > p.length) { off = p.length }
            else {
              if (id == 0x20746d66 && sz >= 16 && bb.getShort(off + 10) == 1 &&
                (bb.getShort(off + 22) & 0xffff) == 8)
                tag = bb.getShort(off + 8) & 0xffff
              else if (id == 0x61746164) { dataOff = off + 8; dataLen = sz }
              off += 8 + sz + (sz & 1)
            }
          }
          if ((tag != 0x06 && tag != 0x07) || dataOff < 0 || dataLen <= 0) bad
          else {
            val mu = tag == 0x07
            var s = 0L
            var mn = Int.MaxValue
            var mx = Int.MinValue
            var last = 0
            var i = 0
            while (i < dataLen) {
              val v = if (mu) ulawToPcm(p(dataOff + i) & 0xff)
                else alawToPcm(p(dataOff + i) & 0xff)
              s += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              last = v
              i += 1
            }
            G711Pcm(r.media_id, if (mu) "ulaw" else "alaw", dataLen, s, mn, mx,
              last, ok = true)
          }
        }
      } catch { case scala.util.control.NonFatal(_) => bad }
    })
  }

  final case class AdpcmPcm(media_id: Long, n_samples: Int, sum_pcm: Long,
                            min_pcm: Int, max_pcm: Int, last_pcm: Int,
                            ok: Boolean)

  /** REAL compressed-AUDIO decode: IMA ADPCM nibble payloads decoded by
    * [[adpcmDecode]] into s16 PCM, emitting integer stream features
    * (sample sum / min / max / final predictor). Completes the
    * compressed-codec triad (RLE8 video, baseline JPEG image, ADPCM
    * audio), all from public specs in pure Scala. The decode is a
    * STATEFUL integer recurrence — the gate row's DuckDB oracle replays
    * it exactly with a recursive CTE over the same step/index tables,
    * so every adaptive state transition is value-checked, not just
    * aggregate shapes. Malformed (empty) payloads quarantine. Same
    * narrow mapPartitions shape as [[decode]]. */
  def adpcmFeatures(media: Dataset[MediaRow]): Dataset[AdpcmPcm] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      if (p.isEmpty) AdpcmPcm(r.media_id, 0, 0L, 0, 0, 0, ok = false)
      else {
        val pcm = adpcmDecode(p)
        var s = 0L
        var mn = Int.MaxValue
        var mx = Int.MinValue
        var i = 0
        while (i < pcm.length) {
          val v = pcm(i)
          s += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        AdpcmPcm(r.media_id, pcm.length, s, mn, mx, pcm(pcm.length - 1), ok = true)
      }
    })
  }

  /** Real minimal RIFF/AVI container bytes: `LIST hdrl` (avih + one
    * `vids/MJPG` strl) followed by `LIST movi` holding one `00dc` chunk per
    * entry of `frameSizes` (deterministic filler payload). The video analog
    * of [[pngBytes]]/[[wavBytes]]: the container layout is a pure integer
    * function of the frame sizes, so frame byte-offsets parsed back from
    * these bytes are oracle-checkable by closed-form prefix sums.
    * Frame sizes must be even (RIFF pads odd chunks; even sizes keep the
    * offset arithmetic SQL-replayable). */
  def aviBytes(frameSizes: Array[Int], width: Int, height: Int,
               usecPerFrame: Int, fourcc: String = "MJPG"): Array[Byte] =
    aviContainer(frameSizes, width, height, usecPerFrame, fourcc) {
      (buf, i, sz) =>
        var j = 0
        while (j < sz) { buf.put(((i * 31 + j * 7) % 251).toByte); j += 1 }
    }

  /** [[aviBytes]] with caller-supplied frame payloads (e.g. RLE8-encoded
    * frames) instead of the deterministic filler. */
  def aviBytesFrames(frames: Array[Array[Byte]], width: Int, height: Int,
                     usecPerFrame: Int, fourcc: String): Array[Byte] =
    aviContainer(frames.map(_.length), width, height, usecPerFrame, fourcc) {
      (buf, i, _) => buf.put(frames(i)); ()
    }

  private def aviContainer(frameSizes: Array[Int], width: Int, height: Int,
                           usecPerFrame: Int, fourcc: String)(
                           writeFrame: (java.nio.ByteBuffer, Int, Int) => Unit): Array[Byte] = {
    require(frameSizes.forall(s => s >= 0 && s % 2 == 0), "frame sizes must be even")
    require(fourcc.length == 4, s"fourcc must be 4 chars, got '$fourcc'")
    val uncompressed = fourcc == "DIB " // BI_RGB: raw bottom-up BGR24 rows
    val strlContent = 4 + (8 + 56) + (8 + 40)        // 'strl' + strh + strf
    val hdrlContent = 4 + (8 + 56) + (8 + strlContent) // 'hdrl' + avih + LIST strl
    val moviContent = 4 + frameSizes.map(8 + _).sum
    val riffContent = 4 + (8 + hdrlContent) + (8 + moviContent)
    val buf = java.nio.ByteBuffer.allocate(8 + riffContent)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fcc("RIFF"); buf.putInt(riffContent); fcc("AVI ")
    fcc("LIST"); buf.putInt(hdrlContent); fcc("hdrl")
    fcc("avih"); buf.putInt(56)
    buf.putInt(usecPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frameSizes.length)                     // dwTotalFrames
      .putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)       // dwReserved[4]
    fcc("LIST"); buf.putInt(strlContent); fcc("strl")
    fcc("strh"); buf.putInt(56)
    fcc("vids"); fcc(fourcc)
    buf.putInt(0).putInt(0).putInt(0)
      .putInt(usecPerFrame).putInt(1000000)          // dwScale / dwRate
      .putInt(0).putInt(frameSizes.length)           // dwStart / dwLength
      .putInt(0).putInt(-1).putInt(0)                // sugg / quality / sampleSize
    buf.putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort) // rcFrame
    fcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
    if (uncompressed) buf.putInt(0) else fcc(fourcc) // biCompression: 0 = BI_RGB
    buf.putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    fcc("LIST"); buf.putInt(moviContent); fcc("movi")
    frameSizes.zipWithIndex.foreach { case (sz, i) =>
      fcc(if (uncompressed) "00db" else "00dc"); buf.putInt(sz)
      writeFrame(buf, i, sz)
    }
    buf.array()
  }

  final case class VideoFrame(media_id: Long, frame_idx: Int, byte_offset: Long,
                              frame_bytes: Int, width: Int, height: Int,
                              n_frames: Int, ok: Boolean)

  /** REAL video frame indexing — a pure-Scala RIFF walk (header parsing,
    * no codec needed): validates `RIFF`/`AVI `, reads dims + frame count
    * from `avih`, and enumerates the `movi` list's `##dc`/`##db` chunks
    * into (frame_idx, byte_offset, frame_bytes) rows — the seek index a
    * frame sampler needs before any pixel decode. Replaces the former
    * payload-length stub: offsets/counts now come from the actual
    * container bytes (pixel decode of the frames themselves would still
    * need a codec the JDK doesn't ship). Malformed payloads yield one
    * `ok = false` row — quarantine, never task failure. Same narrow
    * mapPartitions shape as [[decode]]; only fixed-width index rows ever
    * reach a shuffle. */
  /** Parsed AVI container layout: dims + declared frame count from `avih`,
    * plus the movi chunks' (byte_offset, size). None for anything that is
    * not a well-formed RIFF/AVI payload — including NEGATIVE chunk sizes,
    * which would otherwise make the walk advance by zero and stall the
    * task forever (quarantine must never hang an executor). */
  private[graft] final case class AviLayout(
      width: Int, height: Int, nFrames: Int, frames: Vector[(Long, Int)])

  /** Frame-slice bound check BEFORE allocating, in Long arithmetic: a
    * malformed index entry declaring a huge chunk size (sz near
    * Int.MaxValue) must quarantine, not wrap `o.toInt + sz` negative and
    * pass the check — today parseAvi's own offset walk happens to throw
    * on such entries first, but the decode path must not depend on that
    * accident. */
  private[graft] def frameInBounds(o: Long, sz: Int, payloadLen: Int): Boolean =
    sz >= 0 && o >= 0 && o + sz.toLong <= payloadLen

  private[graft] def parseAvi(p: Array[Byte]): Option[AviLayout] = {
    def u32(off: Int): Long =
      (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
        ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    def fcc(off: Int): String = new String(p, off, 4, "US-ASCII")
    try {
      if (p.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ") return None
      var width = 0; var height = 0; var nFrames = 0
      val frames = Vector.newBuilder[(Long, Int)]
      var n = 0
      val end = math.min(p.length.toLong, 8L + u32(4)).toInt
      var off = 12
      while (off + 8 <= end) {
        val id = fcc(off)
        val sz = u32(off + 4).toInt
        if (sz < 0) return None // corrupt size — zero-progress guard
        if (id == "LIST" && off + 12 <= end) {
          fcc(off + 8) match {
            case "movi" =>
              var fo = off + 12
              val lend = math.min(off + 8L + sz, end.toLong).toInt
              while (fo + 8 <= lend) {
                val cid = fcc(fo)
                val csz = u32(fo + 4).toInt
                if (csz < 0) return None // corrupt size — zero-progress guard
                if (cid.endsWith("dc") || cid.endsWith("db")) {
                  frames += ((fo + 8L, csz)); n += 1
                }
                fo += 8 + csz + (csz & 1)
              }
              off += 8 + sz + (sz & 1)
            case "hdrl" | "strl" => off += 12 // descend
            case _ => off += 8 + sz + (sz & 1)
          }
        } else {
          if (id == "avih" && off + 8 + 56 <= end) {
            nFrames = u32(off + 8 + 16).toInt
            width = u32(off + 8 + 32).toInt
            height = u32(off + 8 + 36).toInt
          }
          off += 8 + sz + (sz & 1)
        }
      }
      if (n == 0) None
      else Some(AviLayout(width, height, nFrames, frames.result()))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def aviFrameIndex(media: Dataset[MediaRow]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      parseAvi(p) match {
        case None => Iterator.single(
          VideoFrame(r.media_id, 0, 0L, 0, 0, 0, 0, ok = false))
        case Some(av) =>
          av.frames.iterator.zipWithIndex.map { case ((o, sz), i) =>
            VideoFrame(r.media_id, i, o, sz, av.width, av.height,
              av.nFrames, ok = true)
          }
      }
    })
  }

  final case class VideoPixels(media_id: Long, frame_idx: Int, width: Int,
                               height: Int, frame_bytes: Int, sum_bytes: Long,
                               top_row_sum: Long, first_pixel: Int, ok: Boolean)

  /** REAL video PIXEL decode for uncompressed (`DIB `/BI_RGB) AVI — raw
    * bottom-up BGR24 rows with 4-byte-aligned stride need no codec, just
    * byte parsing: the codec-less subset a JDK-only engine can decode
    * honestly (compressed codecs need a native lib and stay out of
    * scope). Per frame: full byte checksum, the TOP image row's pixel sum
    * (= the LAST stored row, skipping stride padding — bottom-up row
    * order and alignment are decode steps a payload-sum stub cannot
    * fake), and the packed top-left pixel as r·2¹⁶+g·2⁸+b. A frame whose
    * chunk size disagrees with stride×height quarantines as ok=false.
    * Same narrow mapPartitions shape as [[decode]]: payloads never reach
    * a shuffle. */
  def aviDecodeDib(media: Dataset[MediaRow]): Dataset[VideoPixels] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      def bad = Iterator.single(
        VideoPixels(r.media_id, 0, 0, 0, 0, 0L, 0L, 0, ok = false))
      parseAvi(p) match {
        case None => bad
        case Some(av) =>
          val (width, height) = (av.width, av.height)
          val stride = (width * 3 + 3) & ~3
          if (stride <= 0 || height <= 0) bad
          else av.frames.iterator.zipWithIndex.map { case ((o, sz), i) =>
            if (sz != stride * height || o + sz > p.length)
              VideoPixels(r.media_id, i, width, height, sz, 0L, 0L, 0, ok = false)
            else {
              val base = o.toInt
              var sum = 0L
              var j = 0
              while (j < sz) { sum += p(base + j) & 0xff; j += 1 }
              val rowBase = base + sz - stride // last stored row = top image row
              var topSum = 0L
              j = 0
              while (j < width * 3) { topSum += p(rowBase + j) & 0xff; j += 1 }
              val b = p(rowBase) & 0xff
              val g = p(rowBase + 1) & 0xff
              val rr = p(rowBase + 2) & 0xff
              VideoPixels(r.media_id, i, width, height, sz, sum, topSum,
                rr * 65536 + g * 256 + b, ok = true)
            }
          }
      }
    })
  }

  /** RLE8-encode decode-order pixel rows (Microsoft BMP/AVI 'MRLE',
    * biCompression = BI_RLE8 — the lossless run-length codec of the BMP
    * spec). Rows where `absolute(y)` holds are written in ABSOLUTE mode
    * (escape `00 n` + n literal bytes, padded to a word boundary); other
    * rows as (count, value) runs. Every row ends with the EOL escape
    * `00 00`, the frame with EOB `00 01` — so a fixture built with a
    * mixed predicate exercises every code path of [[rle8Decode]].
    * Fixture-side helper (the mm_* synthesis seam); rows must be ≤255
    * wide for single-escape absolute encoding. */
  def rle8EncodeRows(rows: Array[Array[Byte]],
                     absolute: Int => Boolean): Array[Byte] = {
    val bb = new scala.collection.mutable.ArrayBuffer[Byte]()
    rows.zipWithIndex.foreach { case (row, y) =>
      require(row.length <= 255, "absolute escape encodes <=255 pixels")
      if (absolute(y) && row.length >= 3) {
        bb += 0; bb += row.length.toByte
        row.foreach(bb += _)
        if ((row.length & 1) == 1) bb += 0 // pad to word boundary
      } else {
        var x = 0
        while (x < row.length) {
          var run = 1
          while (x + run < row.length && row(x + run) == row(x) && run < 255)
            run += 1
          bb += run.toByte; bb += row(x)
          x += run
        }
      }
      bb += 0; bb += 0 // EOL
    }
    bb += 0; bb += 1 // EOB
    bb.toArray
  }

  /** Decode one RLE8 frame into its w×h pixel grid (decode order: row 0 =
    * BOTTOM image row, the DIB convention). Supports all four escapes of
    * the BMP spec: runs, EOL, EOB, absolute mode, and the `00 02 dx dy`
    * delta (cursor move; skipped pixels keep the 0 background, as decoders
    * conventionally leave them). Returns None on any malformed input —
    * truncated escape, run past the row end, cursor off the grid. */
  private[graft] def rle8Decode(p: Array[Byte], off: Int, sz: Int,
                                w: Int, h: Int): Option[Array[Byte]] = {
    if (w <= 0 || h <= 0 || off < 0 || off.toLong + sz > p.length) return None
    // header-declared dims: bound the pixel buffer BEFORE allocating so a
    // malformed 50000x50000 header quarantines instead of overflowing
    // w*h into a negative size or attempting a multi-GB allocation
    if (w.toLong * h > (1L << 26)) return None
    val out = new Array[Byte](w * h)
    var x = 0; var y = 0
    var i = off
    val end = off + sz
    var done = false
    while (!done) {
      if (i + 2 > end) return None // truncated stream (no EOB)
      val b0 = p(i) & 0xff; val b1 = p(i + 1) & 0xff
      i += 2
      if (b0 > 0) { // run of b0 copies of b1
        if (y >= h || x + b0 > w) return None
        var k = 0
        while (k < b0) { out(y * w + x) = b1.toByte; x += 1; k += 1 }
      } else b1 match {
        case 0 => x = 0; y += 1 // EOL
        case 1 => done = true // EOB
        case 2 => // delta — move the cursor
          if (i + 2 > end) return None
          x += p(i) & 0xff; y += p(i + 1) & 0xff
          i += 2
          if (x > w || y > h) return None
        case n => // absolute mode: n literal pixels + word padding
          val pad = n & 1
          if (i + n + pad > end || y >= h || x + n > w) return None
          var k = 0
          while (k < n) { out(y * w + x) = p(i + k); x += 1; k += 1 }
          i += n + pad
      }
    }
    Some(out)
  }

  /** REAL compressed-codec video decode: BMP/AVI RLE8 ('MRLE') frames
    * decompressed by [[rle8Decode]] into pixel grids — a genuine (if
    * simple) lossless codec implemented from the public BMP spec in pure
    * Scala, closing the "no codec in the JDK" boundary for the RLE
    * family (the DCT family is closed by [[graft.operators.Jpeg]]:
    * grayscale MJPG via [[aviDecodeMjpg]], color via
    * [[decodeJpegRgb]]). Output
    * features per frame: decoded pixel sum, the TOP image row's sum (=
    * the LAST decoded row — bottom-up row order is a decode step a
    * compressed-byte-sum stub cannot fake), and the top-left pixel's
    * palette index. Malformed frames quarantine as ok=false. Same narrow
    * mapPartitions shape as [[decode]]: payloads never reach a shuffle.
    *
    * @param every decode every `every`-th frame (frame sampling — the
    *               standard cost-control step before per-frame feature
    *               extraction). Unsampled frames are SKIPPED before the
    *               RLE decode, so decode CPU is proportional to sampled
    *               frames, not container frames; the index walk that finds
    *               them stays O(container). */
  def aviDecodeRle8(media: Dataset[MediaRow],
                    every: Int = 1): Dataset[VideoPixels] = {
    require(every >= 1, "every must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      def bad = Iterator.single(
        VideoPixels(r.media_id, 0, 0, 0, 0, 0L, 0L, 0, ok = false))
      parseAvi(p) match {
        case None => bad
        case Some(av) =>
          av.frames.iterator.zipWithIndex
            .filter(_._2 % every == 0).map { case ((o, sz), i) =>
            rle8Decode(p, o.toInt, sz, av.width, av.height) match {
              case None =>
                VideoPixels(r.media_id, i, av.width, av.height, sz, 0L, 0L, 0, ok = false)
              case Some(img) =>
                var sum = 0L; var j = 0
                while (j < img.length) { sum += img(j) & 0xff; j += 1 }
                val top = (av.height - 1) * av.width
                var topSum = 0L; j = 0
                while (j < av.width) { topSum += img(top + j) & 0xff; j += 1 }
                VideoPixels(r.media_id, i, av.width, av.height, sz, sum,
                  topSum, img(top) & 0xff, ok = true)
            }
          }
      }
    })
  }

  /** Grayscale JPEG fixture bytes via the JDK encoder: a TYPE_BYTE_GRAY
    * image whose 8×8 blocks are each CONSTANT `blockVal(bx, by)`, written
    * at compression quality 1.0. At quality 1.0 the scaled quantization
    * tables are all ones, and a constant block has only a DC coefficient
    * (all AC terms are exact zeros of the forward DCT), so the block
    * round-trips bit-perfectly through ANY conformant decoder — which is
    * what lets the mm_decode_jpeg oracle state decoded pixel sums in
    * closed form while the frames remain REAL entropy-coded DCT data
    * (Huffman tables, zigzag, dequant and IDCT all genuinely exercised).
    * Fixture-side helper, pairs with [[graft.operators.Jpeg.decodeGray]]
    * exactly like [[rle8EncodeRows]] pairs with [[rle8Decode]]. */
  def jpegGrayBytes(w: Int, h: Int, blockVal: (Int, Int) => Int): Array[Byte] =
    jpegGrayBytes0(w, h, blockVal, progressive = false)

  /** The PROGRESSIVE (SOF2) twin of [[jpegGrayBytes]]: same block-constant
    * quality-1.0 exactness argument — DC-only blocks survive successive
    * approximation bit-perfectly (shifted diffs + refinement bits
    * reconstruct every DC bit; all AC scans are pure EOB runs) — but the
    * stream now carries the JDK encoder's multi-scan progression script
    * (spectral selection + successive approximation, T.81 Annex G), the
    * dominant encoding of web JPEGs. */
  def jpegGrayProgressiveBytes(w: Int, h: Int,
                               blockVal: (Int, Int) => Int): Array[Byte] =
    jpegGrayBytes0(w, h, blockVal, progressive = true)

  private def jpegGrayBytes0(w: Int, h: Int, blockVal: (Int, Int) => Int,
                             progressive: Boolean): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "block-constant fixture needs 8-aligned dims")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, blockVal(x / 8, y / 8) & 0xff)
        x += 1
      }
      y += 1
    }
    writeJpegQ1(img, progressive)
  }

  /** 12-BIT extended-sequential Huffman (SOF1) grayscale JPEG fixture,
    * built from spec — the JDK encoder is 8-bit only, so like the
    * arithmetic fixtures this stream has no other possible source in
    * this container. Block-constant 12-bit values (0..4095) under
    * all-ones 16-bit (Pq=1) quantization: every block is DC-only, DC =
    * 8·(v−2048) survives exactly, so decoded sums are closed-form.
    * Hand-rolled canonical tables: DC categories 0..15 (fourteen 5-bit
    * codes + two 6-bit — 12-bit diffs reach category 15, beyond the
    * Annex K 8-bit tables), AC = a single 1-bit EOB code. Entropy bits
    * are FF00-stuffed and 1-padded per §F.1.2.3. */
  def jpegGray12HuffBytes(w: Int, h: Int,
                          blockVal12: (Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "block-constant fixture needs 8-aligned dims")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    marker(0xdb); u16(2 + 1 + 128); u8(0x10) // Pq=1 (16-bit), Tq=0
    (0 until 64).foreach(_ => u16(1))
    marker(0xc1); u16(11); u8(12); u16(h); u16(w); u8(1) // SOF1, P=12
    u8(1); u8(0x11); u8(0)
    // DHT: DC table 0 — categories 0..15 canonical (counts L5=14, L6=2)
    marker(0xc4); u16(2 + 1 + 16 + 16)
    u8(0x00)
    val dcCounts = Array(0, 0, 0, 0, 14, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcCounts.foreach(u8)
    (0 to 15).foreach(u8)
    // DHT: AC table 0 — single EOB symbol, 1-bit code '0'
    marker(0xc4); u16(2 + 1 + 16 + 1)
    u8(0x10)
    val acCounts = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acCounts.foreach(u8)
    u8(0x00)
    marker(0xda); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    // canonical code assignment mirrors the decoder's mincode walk
    val dcCode = new Array[Int](16)
    val dcLen = new Array[Int](16)
    locally {
      var code = 0
      var l = 1
      var sym = 0
      while (l <= 16) {
        var i = 0
        while (i < dcCounts(l - 1)) { dcCode(sym) = code; dcLen(sym) = l; code += 1; sym += 1; i += 1 }
        code <<= 1
        l += 1
      }
    }
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
    var pred = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        val dc = 8 * ((blockVal12(bx, by) & 0xfff) - 2048)
        val diff = dc - pred
        pred = dc
        var t = 0
        var mag = if (diff < 0) -diff else diff
        while (mag != 0) { t += 1; mag >>= 1 }
        putBits(dcCode(t), dcLen(t))
        if (t > 0) putBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        putBits(0, 1) // EOB (AC code '0')
        bx += 1
      }
      by += 1
    }
    if (bitCnt > 0) { // 1-fill pad (§F.1.2.3)
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      u8(bitBuf)
      if ((bitBuf & 0xff) == 0xff) u8(0)
    }
    marker(0xd9)
    out.toByteArray
  }

  final case class DecodedGray12(media_id: Long, width: Int, height: Int,
                                 sum_px: Long, max_px: Int, first_pixel: Int,
                                 ok: Boolean)

  /** 12-bit extended-sequential grayscale decode (SOF1 Huffman or SOF9
    * arithmetic) via [[graft.operators.Jpeg.decodeGray12]]; pixel range
    * 0-4095 — kept OFF the 8-bit decode paths by contract. Same narrow
    * mapPartitions shape as [[decode]]: payloads never reach a shuffle. */
  def decodeGray12(media: Dataset[MediaRow]): Dataset[DecodedGray12] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      graft.operators.Jpeg.decodeGray12(p) match {
        case Some((w, h, px)) =>
          var sum = 0L
          var mx = 0
          var i = 0
          while (i < px.length) {
            sum += px(i)
            if (px(i) > mx) mx = px(i)
            i += 1
          }
          DecodedGray12(r.media_id, w, h, sum, mx, px(0), ok = true)
        case None => DecodedGray12(r.media_id, 0, 0, 0L, 0, 0, ok = false)
      }
    })
  }

  final case class DecodedLossless(media_id: Long, width: Int, height: Int,
                                   precision: Int, sum_px: Long, max_px: Int,
                                   first_pixel: Int, ok: Boolean)

  /** LOSSLESS JPEG (SOF3, T.81 Annex H) grayscale decode via
    * [[graft.operators.Jpeg.decodeLossless]] — bit-exact sample recovery
    * at 2-16-bit precision, kept OFF the DCT decode paths by contract
    * (they quarantine SOF3). Same narrow mapPartitions shape as
    * [[decode]]: payloads never reach a shuffle. */
  def decodeJpegLossless(media: Dataset[MediaRow]): Dataset[DecodedLossless] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      graft.operators.Jpeg.decodeLossless(p) match {
        case Some((w, h, px, prec)) =>
          var sum = 0L
          var mx = 0
          var i = 0
          while (i < px.length) {
            sum += px(i)
            if (px(i) > mx) mx = px(i)
            i += 1
          }
          DecodedLossless(r.media_id, w, h, prec, sum, mx, px(0), ok = true)
        case None => DecodedLossless(r.media_id, 0, 0, 0, 0L, 0, 0, ok = false)
      }
    })
  }

  /** Color JPEG fixture bytes via the JDK encoder: a TYPE_3BYTE_BGR image
    * whose 16×16 MACROBLOCKS (the 4:2:0 MCU the JDK encoder always emits)
    * are each a CONSTANT color `rgbVal(mx, my)`, written at quality 1.0.
    * For NEUTRAL-GRAY colors (R=G=B=v) the pipeline is exact end-to-end:
    * the encoder's fixed-point luma constants sum to exactly 2¹⁶ so Y=v
    * and Cb=Cr=128, subsampling averages constants, every block is
    * DC-only under all-ones quantization, and the inverse transform's
    * chroma terms vanish — closed-form oracles for the FULL 3-component
    * interleaved decode path. Colored macroblocks stay constant-chroma
    * (upsample-exact) but pick up ±1-2 color-convert rounding — those are
    * CI-pinned against the JDK decoder, not oracled. */
  def jpegRgbBytes(w: Int, h: Int, rgbVal: (Int, Int) => Int): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "macroblock-constant fixture needs 16-aligned dims")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, rgbVal(x / 16, y / 16) & 0xffffff)
        x += 1
      }
      y += 1
    }
    writeJpegQ1(img)
  }

  final case class DecodedRgb(media_id: Long, width: Int, height: Int,
                              sum_r: Long, sum_g: Long, sum_b: Long,
                              first_pixel: Int, ok: Boolean)

  /** REAL color-JPEG image decode via the from-spec [[graft.operators.Jpeg]]
    * decoder (no `javax.imageio` on the decode path): 3-component
    * interleaved baseline YCbCr with the encoder's sampling choice
    * (4:2:0 from the JDK; 4:4:4/4:2:2 handled by the same MCU walk),
    * emitting per-channel pixel sums + the packed top-left pixel —
    * channel sums force the YCbCr→RGB conversion to actually run, and
    * the top-left pixel pins MCU/block placement. Undecodable payloads
    * quarantine. Same narrow mapPartitions shape as [[decode]]. */
  def decodeJpegRgb(media: Dataset[MediaRow]): Dataset[DecodedRgb] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      graft.operators.Jpeg.decodeRgb(p) match {
        case Some(img) =>
          var (sr, sg, sb) = (0L, 0L, 0L)
          var j = 0
          while (j < img.px.length) {
            val v = img.px(j)
            sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
            j += 1
          }
          DecodedRgb(r.media_id, img.width, img.height, sr, sg, sb,
            img.px(0), ok = true)
        case None => DecodedRgb(r.media_id, 0, 0, 0L, 0L, 0L, 0, ok = false)
      }
    })
  }

  /** REAL DCT-codec video decode: grayscale MJPG AVI frames — each `00dc`
    * chunk an independent baseline JPEG — decoded by the from-spec
    * [[graft.operators.Jpeg]] decoder (ITU-T T.81; pure Scala, no
    * `javax.imageio` on the decode path). This closes the long-documented
    * "DCT-family codecs out of scope" boundary for the grayscale-MJPG
    * family. COLOR frames quarantine as ok=false here BY FEATURE CONTRACT
    * (this operator's features are single-plane pixel sums); the decoder
    * itself handles 3-component color — [[decodeJpegRgb]] is the color
    * path with per-channel sums. Output features
    * per frame match [[aviDecodeRle8]]: decoded pixel sum, TOP image row
    * sum (JPEG rows are top-down, unlike DIB/RLE8 — the y=0 row, a row
    * order a stub cannot fake), and the top-left pixel. `frame_bytes` is
    * the compressed chunk size (encoder-dependent — gate rows drop it).
    * Same narrow mapPartitions shape as [[decode]]: payloads never reach
    * a shuffle, decode CPU tracks sampled frames. */
  def aviDecodeMjpg(media: Dataset[MediaRow],
                    every: Int = 1): Dataset[VideoPixels] = {
    require(every >= 1, "every must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      def bad = Iterator.single(
        VideoPixels(r.media_id, 0, 0, 0, 0, 0L, 0L, 0, ok = false))
      parseAvi(p) match {
        case None => bad
        case Some(av) =>
          av.frames.iterator.zipWithIndex
            .filter(_._2 % every == 0).map { case ((o, sz), i) =>
              if (!frameInBounds(o, sz, p.length))
                VideoPixels(r.media_id, i, av.width, av.height, sz, 0L, 0L, 0, ok = false)
              else {
                val frame = new Array[Byte](sz)
                System.arraycopy(p, o.toInt, frame, 0, sz)
                graft.operators.Jpeg.decodeGray(frame) match {
                  case Some((w, h, img)) if w == av.width && h == av.height =>
                    var sum = 0L; var j = 0
                    while (j < img.length) { sum += img(j); j += 1 }
                    var topSum = 0L; j = 0
                    while (j < w) { topSum += img(j); j += 1 } // y=0: top-down
                    VideoPixels(r.media_id, i, w, h, sz, sum, topSum,
                      img(0), ok = true)
                  case _ =>
                    VideoPixels(r.media_id, i, av.width, av.height, sz,
                      0L, 0L, 0, ok = false)
                }
              }
            }
      }
    })
  }

  /** Metadata-only profile: drops the payload before the shuffle. */
  def profile(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"), col("mime"),
        coalesce(length(col("payload")), lit(0)).as("payload_bytes"))
      .groupBy("kind", "mime")
      .agg(count("*").as("n"), sum("payload_bytes").as("total_bytes"),
        round(avg("payload_bytes"), 2).as("avg_bytes"))

  /** Deterministic synthetic media table for tests/demos (no external data;
    * payload bytes are a pure function of media_id). */
  def synthetic(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val len = 64 + (id % 7).toInt * 512
      val payload = Array.tabulate[Byte](len)(i => ((id * 31 + i * 7) % 251).toByte)
      MediaRow(id, kind, payload,
        mime = kind match { case "image" => "image/png"; case "audio" => "audio/wav"; case _ => "video/mp4" },
        width = if (kind == "image") Some(64 + (id % 16).toInt * 8) else None,
        height = if (kind == "image") Some(64 + (id % 9).toInt * 8) else None,
        duration_ms = if (kind != "image") Some(1000L + id % 60000) else None)
    }
  }
}
