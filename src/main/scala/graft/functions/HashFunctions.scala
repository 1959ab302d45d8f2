package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** Hashing utilities.
  *
  * `canonicalJsonMd5` byte-matches the reference's event-hash derivation
  * (src/etl/transform/inpe_focos_diario.py:155-163): Python
  * `json.dumps(payload, ensure_ascii=False)` of
  * `{"file_date": str, "lat": round(lat,6), "lon": round(lon,6),
  *   "view_ts": str|None, "satelite": str|None}` with default separators
  * `", "` / `": "`, insertion key order, then md5 hex. The tricky part is the
  * float representation: Python prints the shortest decimal that round-trips;
  * after `round(x, 6)` that is the ≤6-dp decimal form, which we reproduce via
  * exact BigDecimal scaling.
  */
object HashFunctions {

  /** Python `round(x, 6)` — correctly-rounded half-even decimal rounding of
    * the exact binary value (CPython `double_round`). SIGNED ZERO is
    * preserved: CPython rounds any negative value that lands on zero to
    * -0.0 (round(-1e-7, 6) == -0.0, rendered "-0.0" by json.dumps), but
    * BigDecimal has no signed zero — re-apply the input's sign bit. */
  def pyRound6(x: Double): Double = {
    val r = new JBigDecimal(x).setScale(6, RoundingMode.HALF_EVEN).doubleValue()
    if (r == 0.0 && java.lang.Double.doubleToRawLongBits(x) < 0) -0.0 else r
  }

  /** Python `repr(float)` for doubles that are exactly representable at ≤6
    * decimal places (the post-round(·,6) domain): plain decimal, trailing
    * zeros stripped, integral floats keep a trailing ".0".
    */
  def pyFloatRepr6(x: Double): String = {
    if (x.isNaN || x.isInfinite)
      throw new IllegalArgumentException("non-finite not allowed (allow_nan=False)")
    val bd0 = new JBigDecimal(x).setScale(6, RoundingMode.HALF_EVEN).stripTrailingZeros()
    // BigDecimal("0.000000") strips to 0E-6; normalize zero
    val bd = if (bd0.compareTo(JBigDecimal.ZERO) == 0) JBigDecimal.ZERO else bd0
    val digits = bd.unscaledValue.abs.toString
    val adjExp = digits.length - bd.scale - 1 // power of ten of leading digit
    // Python repr(-0.0) is "-0.0": BigDecimal drops the zero's sign, so
    // recover it from the double's sign bit
    val sign = if (bd.signum < 0 ||
      (bd.signum == 0 && java.lang.Double.doubleToRawLongBits(x) < 0)) "-" else ""
    // Python repr switches to scientific when exp < -4 or >= 16
    if (adjExp < -4 || adjExp >= 16) {
      val mant =
        if (digits.length == 1) digits
        else digits.head.toString + "." + digits.tail
      val expSign = if (adjExp < 0) "-" else "+"
      f"$sign$mant%se$expSign${math.abs(adjExp)}%02d"
    } else {
      val s = bd.toPlainString
      // toPlainString carries the '-' for nonzero negatives but not for
      // the recovered negative ZERO — prepend it there
      val signed = if (bd.signum == 0 && sign == "-") "-" + s else s
      if (signed.contains('.')) signed else signed + ".0"
    }
  }

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      // Python json.dumps uses the SHORT escapes for backspace/form-feed
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c) // ensure_ascii=False: non-ascii passes through
    }
    sb.append('"').toString
  }

  /** The exact payload string Python builds for the event hash. */
  def canonicalEventPayload(fileDate: String, lat: Double, lon: Double,
                            viewTs: String, satelite: String): String = {
    val vts = if (viewTs == null) "null" else jsonStr(viewTs)
    val sat = if (satelite == null) "null" else jsonStr(satelite)
    s"""{"file_date": ${jsonStr(fileDate)}, "lat": ${pyFloatRepr6(pyRound6(lat))}, """ +
      s""""lon": ${pyFloatRepr6(pyRound6(lon))}, "view_ts": $vts, "satelite": $sat}"""
  }

  // per-row getInstance("MD5") is a JCA provider lookup — thread-local
  // reuse matters in the ingest hot path (one hash per event row)
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def md5Hex(s: String): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = Character.forDigit((d(i) >> 4) & 0xf, 16)
      hex(2 * i + 1) = Character.forDigit(d(i) & 0xf, 16)
      i += 1
    }
    new String(hex)
  }

  def eventHash(fileDate: String, lat: Double, lon: Double,
                viewTs: String, satelite: String): String =
    // null-propagate on a null file_date (the one argument that was NOT
    // guarded — it NPE'd the whole task) like Spark's builtins; viewTs
    // and satelite render as JSON null per the reference payload
    if (fileDate == null) null
    else md5Hex(canonicalEventPayload(fileDate, lat, lon, viewTs, satelite))

  val eventHashUdf =
    udf((fileDate: String, lat: Double, lon: Double, viewTs: String, sat: String) =>
      eventHash(fileDate, lat, lon, viewTs, sat))

  // ------------------------------------------------------------- simhash

  /** 64-bit FNV-1a — stable token hash shared by simhash (and tests). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= (s.charAt(i) & 0xffffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SimHash over a token multiset: per-bit vote of each token's 64-bit
    * hash; sign of the vote becomes the output bit. Near-dup docs differ in
    * few bits (compare via popcount of xor).
    */
  def simHash64(tokens: Seq[String]): Long = {
    if (tokens == null || tokens.isEmpty) return 0L
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val simHash64Udf = udf((tokens: Seq[String]) => simHash64(tokens))

  def hammingDistance64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
  val hamming64Udf = udf((a: Long, b: Long) => hammingDistance64(a, b))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("event_hash", eventHashUdf)
    spark.udf.register("simhash64", simHash64Udf)
    spark.udf.register("hamming64", hamming64Udf)
  }
}
