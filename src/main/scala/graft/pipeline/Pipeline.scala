package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Date
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.Enrich
import graft.ingest.Ingest
import graft.marts.Marts

/** Orchestration: the reference's per-day batch model (SURVEY §2.10, EP1/EP2)
  * — one invocation per date, idempotent re-runs, resumable backfill with an
  * atomically-written JSON state file (src/etl/backfill.py:47-66,151-212).
  *
  * Storage layout under `root`:
  *   curated/   — ingested facts, partitioned by file_date
  *   enriched/  — spatially enriched facts, partitioned by file_date
  *   marts/<name>/ — aggregate tables, partitioned by day or month
  */
final class Pipeline(spark: SparkSession, root: String,
                     municipios: DataFrame, biomas: DataFrame) {

  private def path(p: String) = s"$root/$p"
  private def exists(p: String) = new java.io.File(p.stripPrefix("file:")).exists()

  def readOrEmpty(p: String, like: DataFrame): DataFrame =
    if (exists(path(p))) spark.read.parquet(path(p))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)

  /** EP1 steps 4–7 for one day: ingest → idempotent load → enrich → marts. */
  def runDay(csvPath: String, fileDate: LocalDate): Map[String, Long] = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val d = Date.valueOf(fileDate)

    // E+T: CSV → curated records
    val raw = Ingest.readCsv(spark, csvPath)
    val records = Ingest.transform(raw, d).cache()

    // L: idempotent append against the same file_date partition only
    val existing = readOrEmpty(s"curated/file_date=$fileDate", records.drop("file_date"))
    val existingHashes =
      if (existing.columns.contains("event_hash")) existing.select("event_hash")
      else records.limit(0).select("event_hash")
    val fresh = records.join(existingHashes, Seq("event_hash"), "left_anti")
    fresh.write.mode("append").partitionBy("file_date").parquet(path("curated"))
    val attempted = records.count()
    val inserted = fresh.count()

    // Enrich: new-rows-only, municipality PIP + first-match biome
    val curatedDay = spark.read.parquet(path("curated"))
      .filter(col("file_date") === lit(d))
    val already = readOrEmpty("enriched", curatedDay)
    val newRows =
      if (already.columns.contains("event_hash"))
        Enrich.newRowsOnly(curatedDay, already.filter(col("file_date") === lit(d)))
      else curatedDay
    val withMun = Enrich.enrichMunicipio(newRows, municipios)
    val enriched = Enrich.enrichFirstMatch(withMun, biomas,
      Map("cd_bioma" -> "cd_bioma", "bioma_nome" -> "bioma"), "bioma_checked")
    enriched.write.mode("append").partitionBy("file_date").parquet(path("enriched"))

    // Marts for the day (delete-day-then-insert ≡ dynamic overwrite)
    val enrichedAll = spark.read.parquet(path("enriched"))
    val dayFacts = enrichedAll.filter(Marts.dayKey === lit(d))
    Marts.writePartitioned(Marts.focosDiarioMunicipio(dayFacts),
      path("marts/focos_diario_municipio"), "day")
    val ufArea = Marts.ufAreaRollup(municipios.select(col("uf"), col("area_km2")))
    Marts.writePartitioned(Marts.focosDiarioUf(dayFacts, ufArea),
      path("marts/focos_diario_uf"), "day")
    Marts.writePartitioned(Marts.focosDiarioBioma(
      enrichedAll.filter(col("file_date") === lit(d))), path("marts/focos_diario_bioma"), "day")

    records.unpersist()
    Map("attempted" -> attempted, "inserted" -> inserted)
  }

  /** Conservation-of-counts invariants (src/etl/backfill.py:69-135):
    * curated(day) == enriched(day); sum(mun mart) == curated rows with
    * municipality. Returns error strings; empty = all good. */
  def checkDay(fileDate: LocalDate): Seq[String] = {
    val d = Date.valueOf(fileDate)
    val errs = scala.collection.mutable.Buffer[String]()
    val curated = spark.read.parquet(path("curated")).filter(col("file_date") === lit(d))
    val enriched = spark.read.parquet(path("enriched")).filter(col("file_date") === lit(d))
    val nCur = curated.count(); val nEnr = enriched.count()
    if (nCur != nEnr) errs += s"curated($nCur) != enriched($nEnr) for $fileDate"
    val withMun = enriched.filter(col("mun_cd_mun").isNotNull && Marts.dayKey === lit(d)).count()
    val martSum = spark.read.parquet(path("marts/focos_diario_municipio"))
      .filter(col("day") === lit(d))
      .agg(coalesce(sum("n_focos"), lit(0L))).head.getLong(0)
    if (withMun != martSum) errs += s"mart sum($martSum) != enriched with mun($withMun) for $fileDate"
    errs.toSeq
  }

  // ------------------------------------------------------ resumable backfill

  private def statePath = Paths.get(path("backfill_state.json").stripPrefix("file:"))

  def readState(): Option[LocalDate] =
    if (Files.exists(statePath)) {
      val s = Files.readString(statePath)
      "\"last_completed\"\\s*:\\s*\"([0-9-]+)\"".r.findFirstMatchIn(s)
        .map(m => LocalDate.parse(m.group(1)))
    } else None

  /** Atomic tmp+rename state write (backfill.py:63-66). */
  def writeState(last: LocalDate): Unit = {
    val tmp = Paths.get(statePath.toString + ".tmp")
    Files.createDirectories(statePath.getParent)
    Files.writeString(tmp, s"""{"last_completed": "$last"}""")
    Files.move(tmp, statePath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** EP2 — range mode: loop days, stop on first failure, resume from state.
    * @param csvFor resolves a date to its CSV path (the S1/S2 source
    *               resolver seam — tests inject local fixtures)
    */
  def backfill(start: LocalDate, end: LocalDate, csvFor: LocalDate => String,
               resume: Boolean = false, checks: Boolean = true): Seq[LocalDate] = {
    val from = if (resume) readState().map(_.plusDays(1)).getOrElse(start) else start
    val done = scala.collection.mutable.Buffer[LocalDate]()
    var cur = from
    while (!cur.isAfter(end)) {
      runDay(csvFor(cur), cur)
      if (checks) {
        val errs = checkDay(cur)
        require(errs.isEmpty, s"invariants failed for $cur: ${errs.mkString("; ")}")
      }
      writeState(cur)
      done += cur
      cur = cur.plusDays(1)
    }
    done.toSeq
  }
}
