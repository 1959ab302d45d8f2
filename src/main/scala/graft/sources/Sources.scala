package graft.sources

import java.time.{LocalDate, YearMonth}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Ingest

/** S1/S2/S3 — the reference's source-selection chain re-expressed with the
  * I/O seam injected (src/etl/extract/inpe_focos_diario.py):
  *
  *  - S1 daily CSV per date (build_daily_brasil_url + cache, :38-43,212-255)
  *  - S2 monthly CSV/ZIP archive fallback, preferred once the date is older
  *    than `retentionDays` (45; config.py:16, download_daily_csv :266-311)
  *  - S3 monthly→daily row filter: locate the date column by preferred-name
  *    list then substring heuristic, regex-extract ISO or BR dates, keep
  *    rows equal to the target day (:85-156)
  *
  * Fetching is caller-supplied (tests inject local fixture paths; a
  * production deployment wires an HTTP download-to-staging step) so the
  * chain itself — which source wins, and the row filter — is the tested,
  * engine-owned logic. ZIP extraction is the fetcher's concern: a fetcher
  * returning a path may first unzip (java.util.zip) to produce the CSV.
  */
object Sources {

  val RetentionDays = 45 // inpe_retention_days, src/etl/config.py:16

  final case class Resolved(df: DataFrame, source: String)

  /** S3: preferred exact names, then "data"+("hora"|"gmt") substring
    * fallback (_find_date_col, inpe_focos_diario.py:92-113). Columns are
    * matched on their normalized form. */
  def findDateColumn(columns: Seq[String]): Option[String] = {
    val norm = columns.map(c => c -> Ingest.normalizeHeader(c)).toMap
    val preferred = Seq("data_hora_gmt", "datahora", "data_hora",
      "datahora_gmt", "data_hora_utc", "datahora_utc")
    preferred.iterator.flatMap(p => columns.find(c => norm(c) == p)).nextOption()
      .orElse(columns.find { c =>
        val n = norm(c); n.contains("data") && (n.contains("hora") || n.contains("gmt"))
      })
  }

  /** S3: regex-extract an ISO (yyyy-MM-dd) or BR (dd/MM/yyyy) date from a
    * messy timestamp string; null when neither matches (_extract_date,
    * inpe_focos_diario.py:116-132). */
  def extractDateCol(c: Column): Column = {
    val iso = regexp_extract(c, "(\\d{4}-\\d{2}-\\d{2})", 1)
    val br = regexp_extract(c, "(\\d{2})/(\\d{2})/(\\d{4})", 0)
    when(iso =!= "", to_date(iso, "yyyy-MM-dd"))
      .when(br =!= "", to_date(br, "dd/MM/yyyy"))
      .otherwise(lit(null).cast("date"))
  }

  /** S3 — monthly CSV → the target day's rows only
    * (_filter_monthly_to_daily, inpe_focos_diario.py:135-156). Header set
    * and column order pass through untouched; only rows are dropped, so the
    * downstream transform sees exactly what a daily file would contain.
    */
  def filterMonthlyToDaily(spark: SparkSession, monthlyCsvPath: String,
                           d: LocalDate): DataFrame = {
    val raw = Ingest.readCsv(spark, monthlyCsvPath)
    val dateCol = findDateColumn(raw.columns.toSeq).getOrElse(
      throw new IllegalArgumentException(
        s"data_hora_gmt column not found | cols=${raw.columns.take(50).mkString(",")}"))
    raw.filter(extractDateCol(col(dateCol)) === lit(java.sql.Date.valueOf(d)))
  }

  /** S1 cache — fetch-to-file with skip-if-present ("extract cache hit",
    * inpe_focos_diario.py:224-233): a non-empty cached file short-circuits
    * the fetch; the fetcher returning None models an HTTP 404. */
  def cachedFetch(cacheDir: java.nio.file.Path, name: String,
                  fetch: () => Option[Array[Byte]],
                  force: Boolean = false): Option[java.nio.file.Path] = {
    val out = cacheDir.resolve(name)
    if (!force && java.nio.file.Files.exists(out) && java.nio.file.Files.size(out) > 0)
      Some(out)
    else fetch().map { bytes =>
      java.nio.file.Files.createDirectories(cacheDir)
      java.nio.file.Files.write(out, bytes)
      out
    }
  }

  /** S2 zip step — extract the first .csv entry of a monthly archive
    * (_extract_zip_to_csv, inpe_focos_diario.py:71-82). */
  def extractZipCsv(zipPath: java.nio.file.Path, csvPath: java.nio.file.Path): Unit = {
    val zf = new java.util.zip.ZipFile(zipPath.toFile)
    try {
      import scala.jdk.CollectionConverters._
      val entry = zf.entries().asScala
        .find(e => !e.isDirectory && e.getName.toLowerCase.endsWith(".csv"))
        .getOrElse(throw new java.io.FileNotFoundException(s"no csv found in zip: $zipPath"))
      val in = zf.getInputStream(entry)
      try java.nio.file.Files.copy(in, csvPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    } finally zf.close()
  }

  /** S1+S2 — the full fallback chain (download_daily_csv,
    * inpe_focos_diario.py:257-311):
    *
    *   1. date older than the retention window → try monthly first;
    *   2. then the daily file;
    *   3. then monthly again as the 404 fallback;
    *   4. else fail.
    *
    * @param daily   resolve a date to its daily CSV path, None ⇔ HTTP 404
    * @param monthly resolve a month to its (already unzipped) monthly CSV
    */
  def resolveDaily(spark: SparkSession, d: LocalDate,
                   daily: LocalDate => Option[String],
                   monthly: YearMonth => Option[String],
                   today: LocalDate = LocalDate.now(),
                   retentionDays: Int = RetentionDays): Resolved = {
    val cutoff = today.minusDays(retentionDays.toLong)
    val tryMonthlyFirst = !d.isAfter(cutoff)
    def fromMonthly: Option[Resolved] =
      monthly(YearMonth.from(d)).map(p =>
        Resolved(filterMonthlyToDaily(spark, p, d), s"monthly:$p"))
    def fromDaily: Option[Resolved] =
      daily(d).map(p => Resolved(Ingest.readCsv(spark, p), s"daily:$p"))

    (if (tryMonthlyFirst) fromMonthly.orElse(fromDaily)
     else fromDaily.orElse(fromMonthly))
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no daily or monthly source found for $d"))
  }

  final case class JsonlRead(clean: DataFrame, corrupt: DataFrame)

  /** JSON-Lines corpus source — the interchange format of document
    * pipelines. Explicit caller schema (NO inference: schema inference is a
    * full extra pass over the data, a non-starter at corpus scale) and
    * PERMISSIVE parsing with corrupt-line capture: one malformed line must
    * not kill a billion-line ingest, and must not vanish silently either —
    * `corrupt` carries the raw offending lines for quarantine. The parsed
    * frame is persisted (registered with [[graft.CacheRegistry]]) because
    * both outputs filter it — and because Spark refuses corrupt-column-only
    * filters on a raw file scan precisely to stop people double-parsing the
    * corpus; production jobs that only want `clean` should write `corrupt`
    * to a quarantine sink in the same pass.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): JsonlRead = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "caller schema must not define _corrupt_record")
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val parsed = graft.CacheRegistry.register(
      spark.read.schema(withCorrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    JsonlRead(
      clean = parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      corrupt = parsed.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("raw_line")))
  }
}
