package graft.serve

import java.sql.Date
import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The serving layer: parameterized query functions mirroring the
  * reference's 11 API routes over the persisted fact cube
  * (api/app/main.py:925-1866). The engine deliverable is these functions,
  * not an HTTP server (SURVEY §3 EP3).
  *
  * All functions take the fact cube (`mv_focos_day_dim` shape: day, uf,
  * cd_uf, cd_mun, mun_nm_mun, bioma, cd_bioma, uc_nome, cd_cnuc, ti_nome,
  * terrai_cod, n_focos) and return DataFrames; the driver-side scalars
  * (legend breaks) collect only the ≤ thousands of aggregated values, never
  * facts.
  */
object Serve {

  val MaxRangeDays = 365 // APP_MAX_RANGE_DAYS, main.py:77
  val TsWeekThresholdDays = 92 // main.py:78
  val TsMonthThresholdDays = 273 // main.py:79
  val MunGuardrailLimit = 10 // main.py:76
  val PointsDefaultLimit = 20000 // main.py:84
  val PointsHardCap = 50000 // main.py:83

  final case class Filters(uf: Option[String] = None, bioma: Option[String] = None,
                           mun: Option[String] = None, uc: Option[String] = None,
                           ti: Option[String] = None)

  /** P10 — trim + uppercase, empty → None (main.py:136-158). */
  def normText(v: Option[String]): Option[String] =
    v.map(_.trim).filter(_.nonEmpty).map(_.toUpperCase)

  def normalizeFilters(f: Filters): Filters =
    Filters(normText(f.uf), normText(f.bioma), normText(f.mun), normText(f.uc), normText(f.ti))

  def validateRange(from: LocalDate, to: LocalDate): Unit = {
    require(from.isBefore(to), "invalid range: require from < to (to is exclusive)")
    require(java.time.temporal.ChronoUnit.DAYS.between(from, to) <= MaxRangeDays,
      s"range too large: max $MaxRangeDays days")
  }

  /** P11 — dynamic WHERE: half-open [from, to) + per-dimension
    * "code OR upper(name)" equality (main.py:171-215). */
  def factWhere(from: LocalDate, to: LocalDate, f0: Filters): Column = {
    val f = normalizeFilters(f0)
    var c = col("day") >= lit(Date.valueOf(from)) && col("day") < lit(Date.valueOf(to))
    f.uf.foreach(v => c = c && col("uf") === v)
    f.bioma.foreach(v => c = c &&
      (col("cd_bioma").cast("string") === v || upper(coalesce(col("bioma"), lit(""))) === v))
    f.mun.foreach(v => c = c &&
      (col("cd_mun").cast("string") === v || upper(coalesce(col("mun_nm_mun"), lit(""))) === v))
    f.uc.foreach(v => c = c &&
      (col("cd_cnuc").cast("string") === v || upper(coalesce(col("uc_nome"), lit(""))) === v))
    f.ti.foreach(v => c = c &&
      (col("terrai_cod").cast("string") === v || upper(coalesce(col("ti_nome"), lit(""))) === v))
    c
  }

  /** Timeseries auto-bucketing (main.py:392-397). */
  def granularity(days: Long): String =
    if (days > TsMonthThresholdDays) "month"
    else if (days > TsWeekThresholdDays) "week"
    else "day"

  /** /api/timeseries/total (main.py:1448-1506). */
  def timeseries(cube: DataFrame, from: LocalDate, to: LocalDate, f: Filters): DataFrame = {
    validateRange(from, to)
    val days = java.time.temporal.ChronoUnit.DAYS.between(from, to)
    val bucket = granularity(days) match {
      case "day" => col("day")
      case g => date_trunc(g, col("day")).cast("date")
    }
    cube.filter(factWhere(from, to, f))
      .groupBy(bucket.as("bucket"))
      .agg(sum("n_focos").as("n_focos"))
      .orderBy("bucket")
  }

  /** /api/totals (main.py:1597-1635). */
  def totals(cube: DataFrame, from: LocalDate, to: LocalDate, f: Filters): DataFrame = {
    validateRange(from, to)
    cube.filter(factWhere(from, to, f))
      .agg(coalesce(sum("n_focos"), lit(0)).as("n_focos"))
  }

  /** /api/top — T1 with the municipality guardrail (main.py:1509-1594):
    * without a UF filter, `mun` is capped at 10 regardless of the requested
    * limit. Ordering: n_focos desc, key asc — fully tiebroken.
    */
  def top(cube: DataFrame, from: LocalDate, to: LocalDate, f: Filters,
          by: String, limit: Int): DataFrame = {
    validateRange(from, to)
    require(limit >= 1 && limit <= 100, "limit must be 1..100")
    val (keyCol, nameCol) = by match {
      case "uf" => (col("uf"), col("uf"))
      case "mun" => (col("cd_mun"), col("mun_nm_mun"))
      case "bioma" => (col("cd_bioma"), col("bioma"))
      case "uc" => (col("cd_cnuc"), col("uc_nome"))
      case "ti" => (col("terrai_cod"), col("ti_nome"))
      case other => throw new IllegalArgumentException(s"unsupported top dimension: $other")
    }
    val effLimit =
      if (by == "mun" && normalizeFilters(f).uf.isEmpty) math.min(limit, MunGuardrailLimit)
      else limit
    cube.filter(factWhere(from, to, f) && keyCol.isNotNull)
      .groupBy(keyCol.as("key"))
      .agg(max(nameCol).as("name"), sum("n_focos").as("n_focos"))
      .orderBy(col("n_focos").desc, col("key").asc)
      .limit(effLimit)
  }

  /** /api/summary — totals + mean + peak day (T2 tiebreak: n_focos desc,
    * day asc; main.py:1638-1710). Single-pass: max_by with struct ordering.
    */
  def summary(cube: DataFrame, from: LocalDate, to: LocalDate, f: Filters): DataFrame = {
    validateRange(from, to)
    val daily = cube.filter(factWhere(from, to, f))
      .groupBy("day").agg(sum("n_focos").as("n"))
    daily.agg(
      coalesce(sum("n"), lit(0)).as("total_focos"),
      round(avg("n"), 2).as("mean_daily"),
      max_by(col("day"), struct(col("n"), to_timestamp(col("day")).cast("long") * -1))
        .as("peak_day"),
      max("n").as("peak_n"))
  }

  /** /api/points — T3 limit+1 truncation probe (main.py:496-526):
    * fetches lim+1 rows in ONE job (TakeOrderedAndProject) and slices
    * driver-side, exactly as the reference fetches limit+1 rows in a single
    * query — no second execution for the truncation flag.
    */
  def points(facts: DataFrame, from: LocalDate, to: LocalDate,
             bbox: Option[(Double, Double, Double, Double)],
             limit: Int = PointsDefaultLimit): (Seq[org.apache.spark.sql.Row], Boolean) = {
    validateRange(from, to)
    val lim = math.min(limit, PointsHardCap)
    var c = col("file_date") >= lit(Date.valueOf(from)) &&
      col("file_date") < lit(Date.valueOf(to))
    bbox.foreach { case (minLon, minLat, maxLon, maxLat) =>
      require(minLon < maxLon && minLat < maxLat, "invalid bbox")
      c = c && col("lon") >= minLon && col("lon") <= maxLon &&
        col("lat") >= minLat && col("lat") <= maxLat
    }
    val taken = facts.filter(c).orderBy(col("file_date"), col("event_hash")).take(lim + 1)
    (taken.take(lim).toSeq, taken.length > lim)
  }

  /** /api/choropleth/uf — J9: latest geometry per UF left-joined with the
    * period aggregate, zero-filled (main.py:950-975). `geoms` carries
    * (uf, day, geom…); latest = row_number by day desc.
    */
  def choroplethUf(cube: DataFrame, geoms: DataFrame,
                   from: LocalDate, to: LocalDate, f: Filters): DataFrame = {
    validateRange(from, to)
    val agg = cube.filter(factWhere(from, to, f))
      .groupBy("uf").agg(sum("n_focos").as("n_focos"))
    val latest = geoms.withColumn("rn", row_number().over(
        Window.partitionBy("uf").orderBy(col("day").desc)))
      .filter(col("rn") === 1).drop("rn", "day")
    latest.join(agg, Seq("uf"), "left")
      .withColumn("n_focos", coalesce(col("n_focos"), lit(0)))
      .orderBy("uf")
  }

  // ------------------------------------------------------- legend breaks

  final case class Legend(breaks: Seq[Double], domain: (Double, Double),
                          method: String, zeroClass: Boolean)

  /** Exact port of compute_breaks (api/app/main.py:255-314): nearest-rank
    * quantiles with `round((n-1)*q)` indexing over positive values, a
    * separate zero class, equal-interval fallback when quantile breaks are
    * not strictly increasing. Runs driver-side on the aggregated values
    * (≤5 570 — one per municipality), as the reference does in Python.
    */
  def computeBreaks(values: Seq[Long], k: Int = 5, zeroClass: Boolean = true): Legend = {
    val classes = math.max(1, k)
    if (values.isEmpty) return Legend(Seq(0.0, 1.0), (0.0, 0.0), "equal", zeroClass)

    val hasZeroOrLess = values.exists(_ <= 0)
    val positive = values.filter(_ > 0).sorted
    val useZeroClass = zeroClass && hasZeroOrLess && positive.nonEmpty
    val sample = if (useZeroClass && positive.nonEmpty) positive else values.sorted

    def quantile(sortedVals: Seq[Long], q: Double): Double = {
      if (sortedVals.isEmpty) return 0.0
      val n = sortedVals.length
      // Python round() = banker's rounding; (n-1)*q is k/classes * (n-1)
      val idx = math.max(0, math.min(n - 1,
        BigDecimal((n - 1) * q).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toInt))
      sortedVals(idx).toDouble
    }
    def strictlyIncreasing(vs: Seq[Double]): Boolean =
      vs.length >= 2 && vs.sliding(2).forall(p => p(1) > p(0))
    def equalBreaks(minV: Double, maxV: Double, cls: Int): Seq[Double] = {
      val c = math.max(1, cls)
      if (maxV <= minV) Seq(minV, minV + 1.0)
      else { val step = (maxV - minV) / c; (0 to c).map(i => minV + step * i) }
    }

    val uniqueSample = sample.distinct.sorted
    var method = "quantile"
    var breaks: Seq[Double] =
      if (uniqueSample.length <= 1) {
        method = "equal"
        val only = uniqueSample.headOption.map(_.toDouble).getOrElse(0.0)
        Seq(only, only + 1.0)
      } else {
        val qb = (0 to classes).map(i => quantile(sample, i.toDouble / classes))
        if (strictlyIncreasing(qb)) qb
        else {
          method = "equal"
          val eqCls = math.min(classes, math.max(2, uniqueSample.length - 1))
          equalBreaks(uniqueSample.head.toDouble, uniqueSample.last.toDouble, eqCls)
        }
      }
    if (!strictlyIncreasing(breaks)) {
      method = "equal"
      breaks = equalBreaks(sample.min.toDouble, sample.max.toDouble, 1)
    }
    Legend(breaks, (values.min.toDouble, values.max.toDouble), method, useZeroClass)
  }

  /** /api/validate consistency triple (main.py:1733-1790): totals ==
    * timeseries sum == per-entity (choropleth) sum under any filter combo.
    */
  def validateConsistency(cube: DataFrame, from: LocalDate, to: LocalDate,
                          f: Filters): (Long, Long, Long) = {
    val filtered = cube.filter(factWhere(from, to, f))
    val total = filtered.agg(coalesce(sum("n_focos"), lit(0))).head.getLong(0)
    val tsSum = timeseries(cube, from, to, f)
      .agg(coalesce(sum("n_focos"), lit(0))).head.getLong(0)
    val byUf = filtered.groupBy("uf").agg(sum("n_focos").as("n"))
      .agg(coalesce(sum("n"), lit(0))).head.getLong(0)
    (total, tsSum, byUf)
  }
}
