package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Date
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.Enrich
import graft.ingest.Ingest
import graft.marts.Marts

object Pipeline {
  /** Bounded await for the concurrent-action pools (r18 VERDICT item 4):
    * `Await.result(…, Duration.Inf)` on a non-daemon pool turns one wedged
    * write (stale FS mount) into a forever-hang of the whole query; the
    * bound fails loudly instead. Generous by design — it exists to catch
    * wedges, never to time out real work; override via env for clusters
    * whose single mart write legitimately exceeds it. */
  private[graft] val awaitLimit: scala.concurrent.duration.Duration =
    scala.concurrent.duration.Duration(
      sys.env.getOrElse("SPARK_GRAFT_PARALLEL_AWAIT_SEC", "14400").toLong,
      java.util.concurrent.TimeUnit.SECONDS)

  /** Run independent driver-side Spark actions concurrently (guide §2.6:
    * actions are only sequential because driver code calls them
    * sequentially — a small pool lets the scheduler back-fill executors
    * freed by one job's tail with the next job's tasks, and overlaps the
    * per-action driver latency: plan analysis + commit + listing, ~half
    * the wall on lifecycle rows). Daemon threads (a wedged body can never
    * pin the JVM open) + the bounded await above. ALL futures are awaited
    * before the first failure is rethrown, so nothing is left in flight
    * when the caller sees the exception. Job groups/descriptions are
    * thread-local, so per-thread submission keeps UI attribution correct. */
  private[graft] def inParallel[A](bodies: Seq[() => A], threads: Int = 4): Seq[A] = {
    if (bodies.lengthCompare(1) <= 0) return bodies.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(threads, bodies.length),
      new java.util.concurrent.ThreadFactory {
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, "graft-parallel-action"); t.setDaemon(true); t
        }
      })
    val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fs = bodies.map(b => scala.concurrent.Future(b())(ec))
      val rs = fs.map(f => scala.util.Try(
        scala.concurrent.Await.result(f, awaitLimit)))
      rs.collectFirst { case scala.util.Failure(e) => throw e }
      rs.map(_.get)
    } finally pool.shutdown()
  }
}

/** Orchestration: the reference's per-day batch model (SURVEY §2.10, EP1/EP2)
  * — one invocation per date, idempotent re-runs, resumable backfill with an
  * atomically-written JSON state file (src/etl/backfill.py:47-66,151-212).
  *
  * Storage layout under `root`:
  *   curated/   — ingested facts, partitioned by file_date
  *   enriched/  — spatially enriched facts, partitioned by file_date
  *   marts/<name>/ — aggregate tables, partitioned by day or month
  *
  * The full reference enrichment chain runs per day: municipality PIP+KNN
  * (sql/enrich/20_enrich_municipio.sql) then first-match biome, UC and TI
  * (21_enrich_biomas_ucs_tis.sql:21-119); marts cover municipality/UF
  * daily+monthly, trend, biome/UC/TI daily+monthly
  * (sql/marts/10..61) and the 11-column fact cube
  * (sqlm/marts/canonical/065_mv_focos_day_dim.sql).
  *
  * Scale: every mart read is bounded by a `file_date` PARTITION predicate
  * before the derived day-key filter — `coalesce(to_date(view_ts),
  * file_date)` alone would defeat partition pruning and scan full history
  * every day. `view_ts` dates lag `file_date` by at most the retention
  * window, so the bound is semantically safe.
  */
final class Pipeline(spark: SparkSession, root: String,
                     municipios0: DataFrame, biomas0: DataFrame,
                     ucs0: Option[DataFrame] = None, tis0: Option[DataFrame] = None,
                     retentionDays: Int = 45) {

  private def path(p: String) = s"$root/$p"

  /** Dimension tables are bounded by contract (≤ thousands of polygon rows
    * — the reference holds them as small Postgres tables) and broadcast-
    * join in EVERY statement a runDay executes. Collected ONCE into a
    * driver-local relation, each statement's broadcast build is a plan-
    * local LocalTableScan — zero Spark jobs — instead of a fresh collect
    * job per broadcast per statement (the round-12 profile: ~46 ×130 ms
    * broadcast mini-jobs across the 16 executions of a twice-run day,
    * pure scheduler overhead on identical dim bytes). A cluster catalog's
    * cached dim table reaches the same state after first use; here the
    * pipeline instance IS that scope. */
  private def localized(df: DataFrame): DataFrame = {
    // the bounded-dim contract, enforced loudly: collect limit+1 rows so a
    // mis-wired fact-sized "dim" fails with a clear message instead of
    // OOMing the driver mid-collect
    val limit = 200000
    val rows = df.limit(limit + 1).collect()
    require(rows.length <= limit,
      s"dimension exceeds the bounded-dim contract (> $limit rows); " +
        "refusing to localize it into the driver — wire it as a regular " +
        s"distributed table instead (schema: ${df.schema.simpleString})")
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
  }
  private val municipios = localized(municipios0)
  private val biomas = localized(biomas0)
  private val ucs = ucs0.map(localized)
  private val tis = tis0.map(localized)
  /** UF area rollup is dim-derived and day-independent: one aggregate per
    * pipeline instance, not one per mart write. */
  private lazy val ufAreaDim =
    localized(Marts.ufAreaRollup(municipios.select(col("uf"), col("area_km2"))))

  // Schemas of the warehouse stores this instance reads back: every
  // schema-less spark.read.parquet runs a footer-inference JOB first
  // (~50-100 ms of driver latency), and one runDay re-reads curated /
  // enriched / mart stores several times. Store schemas are stable for the
  // life of a Pipeline (the writers in this class define them), so the
  // first read of each store infers once and later reads reuse it. Keyed
  // by relative path — a backfill touching many partitions shares the
  // parent-store entries. (At cluster scale the catalog serves this role.)
  private val tableSchemas =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]

  private[graft] def readTable(p: String): DataFrame =
    Option(tableSchemas.get(p)) match {
      case Some(sc) => spark.read.schema(sc).parquet(path(p))
      case None =>
        val df = spark.read.parquet(path(p))
        tableSchemas.put(p, df.schema)
        df
    }

  /** Writers call this after writing `written` under store path `p`: a
    * cached entry for that store (or a partition dir under it) survives
    * only if its data fields and the written data fields are SET-EQUAL by
    * name+type (modulo `partCols`) — the steady state, identical-schema
    * appends. Otherwise the entry is dropped so the next read re-infers
    * instead of silently projecting a stale schema. The check is
    * two-directional on purpose: a write that ADDS a column would
    * otherwise read back as absent, and a write that DROPS or renames one
    * would otherwise read the missing column back as all-null for the
    * life of this instance. `partCols` are excluded on BOTH sides: a
    * partition-dir read ("curated/file_date=X") never carries the
    * partition column, by design. */
  private[graft] def noteWrite(p: String, written: DataFrame,
                        partCols: Seq[String] = Seq("file_date")): Unit = {
    def dataSet(fields: Array[org.apache.spark.sql.types.StructField]) =
      fields.filterNot(f => partCols.contains(f.name))
        .map(f => (f.name, f.dataType)).toSet
    val writtenSet = dataSet(written.schema.fields)
    val it = tableSchemas.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      if (k == p || k.startsWith(p + "/") || p.startsWith(k + "/")) {
        if (dataSet(e.getValue.fields) != writtenSet) it.remove()
      }
    }
  }
  // Hadoop FS probe, not java.io.File: with an HDFS/S3 root a local-FS
  // probe is always false, readOrEmpty would always come back empty, and
  // every re-run would duplicate rows through the "idempotent" append
  private def exists(p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }

  def readOrEmpty(p: String, like: DataFrame): DataFrame =
    if (exists(path(p))) readTable(p)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)

  /** biome + UC + TI first-match enrichment, lowest-id tiebreak
    * (21_enrich_biomas_ucs_tis.sql:33-43,62-73,92-103). Missing dims yield
    * null columns with the checked flag still set (the reference marks rows
    * checked even when no polygon matches, :47-58). */
  private def enrichDims(withMun: DataFrame): DataFrame = {
    val withBioma = Enrich.enrichFirstMatch(withMun, biomas,
      Map("cd_bioma" -> "cd_bioma", "bioma_nome" -> "bioma"), "bioma_checked")
    val withUc = ucs match {
      case Some(uc) => Enrich.enrichFirstMatch(withBioma, uc,
        Map("cd_cnuc" -> "cd_cnuc", "nome_uc" -> "uc_nome"), "uc_checked")
      case None => withBioma
        .withColumn("cd_cnuc", lit(null).cast("string"))
        .withColumn("uc_nome", lit(null).cast("string"))
        .withColumn("uc_checked", lit(true))
    }
    tis match {
      case Some(ti) => Enrich.enrichFirstMatch(withUc, ti,
        Map("terrai_cod" -> "terrai_cod", "terrai_nom" -> "ti_nome"), "ti_checked")
      case None => withUc
        .withColumn("terrai_cod", lit(null).cast("string"))
        .withColumn("ti_nome", lit(null).cast("string"))
        .withColumn("ti_checked", lit(true))
    }
  }

  /** Mart input for day `d`: partition-pruned read of enriched/, then the
    * derived day-key filter. The `file_date` BETWEEN bound is what makes a
    * single-day run scan O(retention) partitions instead of full history
    * (the reference scans the FULL enriched table with only the day-key
    * predicate, 10_focos_diario_municipio.sql:50 — the window is the
    * deliberate scale deviation, same as [[monthInput]]'s). Padded BOTH
    * sides: the day key can lag file_date (GMT view_ts vs local file day)
    * AND lead it (late files carrying earlier view days — a monthly-
    * archive backfill), so a one-sided [d-retention, d] window silently
    * dropped late-arriving rows from every day-d rebuild. */
  def martInput(enrichedAll: DataFrame, d: Date): DataFrame =
    enrichedAll
      .filter(col("file_date").between(
        date_sub(lit(d), retentionDays), date_add(lit(d), retentionDays)))
      .filter(Marts.dayKey === lit(d))

  /** Monthly-mart input: the whole month containing `d` (the reference
    * deletes+rebuilds the month partition, 11_focos_mensal_municipio.sql),
    * still bounded by a file_date partition window around the month. */
  def monthInput(enrichedAll: DataFrame, d: Date): DataFrame = {
    val ld = d.toLocalDate
    val mStart = Date.valueOf(ld.withDayOfMonth(1))
    val mEnd = Date.valueOf(ld.withDayOfMonth(ld.lengthOfMonth))
    enrichedAll
      .filter(col("file_date").between(
        date_sub(lit(mStart), retentionDays), date_add(lit(mEnd), retentionDays)))
      .filter(date_trunc("month", Marts.dayKey).cast("date") === lit(mStart))
  }

  /** EP1 steps 4–7 for one day: ingest → idempotent load → enrich → marts. */
  def runDay(csvPath: String, fileDate: LocalDate): Map[String, Long] =
    runDayFrom(Ingest.readCsv(spark, csvPath), fileDate)

  /** Same, from an already-resolved raw CSV DataFrame (the S1/S2 source
    * resolver seam — Sources.resolveDaily feeds this directly). */
  def runDayFrom(raw: DataFrame, fileDate: LocalDate,
                 marts: Set[String] = allMarts.toSet): Map[String, Long] = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val d = Date.valueOf(fileDate)

    // E+T: CSV → curated records. Both load counts ride the write job as
    // Observations — `attempted` on the pre-cache transform output,
    // `inserted` on the anti-joined frame — so the K3 accounting costs
    // ZERO extra passes: counting `fresh` with a separate action would
    // re-run the left-anti join over the batch, a whole second scan at
    // production scale.
    val obsAttempted = org.apache.spark.sql.Observation()
    val records = Ingest.transform(raw, d)
      .observe(obsAttempted, count(lit(1)).as("n")).cache()

    // L: idempotent append against the same file_date partition only
    val existing = readOrEmpty(s"curated/file_date=$fileDate", records.drop("file_date"))
    val existingHashes =
      if (existing.columns.contains("event_hash")) existing
      else records.limit(0)
    val obsInserted = org.apache.spark.sql.Observation()
    // persisted (O(batch), one day's inserts): the anti-joined frame feeds
    // BOTH the curated append and the curatedDay union below — without the
    // cache the left-anti join would re-run when the enrich chain executes.
    // The Observation attaches ABOVE the cache, on the write's frame only:
    // observe-then-persist buries CollectMetrics inside the InMemoryRelation,
    // where the write's QueryExecution cannot surface the metric (measured:
    // obs.get then throws key-not-found on any run whose anti-join survives
    // optimization).
    val fresh = Ingest.idempotentAppend(records, existingHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: a failing write below must still release the two cached
    // frames — a long backfill on a shared session would otherwise
    // accumulate leaked cache entries across failed days
    try {
      // Materialize the records cache with ONE action before the two
      // concurrent writers start: obsAttempted's CollectMetrics lives
      // INSIDE the cached plan, and a materialization split across two
      // racing jobs would fire the Observation with a partial count (each
      // execution observes only the partitions IT computed). Must be a SQL
      // action (`count()`), NOT `queryExecution.toRdd` — a raw RDD action
      // skips SQLExecution.withNewExecutionId, the QueryExecutionListener
      // never fires, and obs.get blocks forever (measured: PipelineSpec
      // hangs). One extra tiny job; both writers then read the warm cache.
      records.count()
      val attempted = obsAttempted.get("n").asInstanceOf[Long]

      // The curated append and the enrich chain are INDEPENDENT writes to
      // distinct stores: the enrich input is EXACTLY existing ∪ fresh —
      // both frames already in hand (`existing`'s file listing was pinned
      // when the frame was created, BEFORE the append, so re-executing its
      // plan cannot double-count the new files; the store re-read this
      // union replaced cost a full-store listing, O(days) at production
      // retention, plus a day-partition re-scan per runDay) — so the two
      // writes' driver latencies overlap (§2.6) instead of serializing.
      // Crash safety is order-free: an interrupted run leaves an orphan on
      // EITHER side and the next runDay heals both — a curated row missing
      // from enriched re-enriches via newRowsOnly; an enriched row missing
      // from curated re-inserts via the anti-join and is NOT re-enriched
      // (its event_hash is already in `already`) — PipelineSpec pins both
      // directions. Column order matches the old read-back: data columns
      // first, partition column appended last. The file_date guard is
      // vacuous on the partition dir but pins the read-back's exact filter
      // semantics for `fresh`.
      val curatedDay = {
        val ex = if (existing.columns.contains("file_date")) existing
                 else existing.withColumn("file_date", lit(d))
        // fail-loud on store drift, with the drifted columns NAMED: an older
        // curated partition carrying a data column the current transform no
        // longer produces is a store-vs-code drift an operator must
        // adjudicate (re-baseline the store or fix the transform) — a bare
        // AnalysisException from the select reads as a bug, not as drift
        val missing = ex.columns.filterNot(fresh.columns.contains)
        require(missing.isEmpty,
          s"curated store partition file_date=$fileDate carries column(s) " +
            s"${missing.mkString(", ")} the current transform no longer " +
            "produces — store schema drift, not a code bug; re-baseline the " +
            "store or restore the column(s) in Ingest.transform")
        ex.unionByName(fresh.select(ex.columns.map(col): _*))
          .filter(col("file_date") === lit(d))
      }
      val already = readOrEmpty("enriched", curatedDay)
      val newRows =
        if (already.columns.contains("event_hash"))
          Enrich.newRowsOnly(curatedDay, already.filter(col("file_date") === lit(d)))
        else curatedDay
      val enriched = enrichDims(Enrich.enrichMunicipio(newRows, municipios))
      Pipeline.inParallel(Seq(
        () => {
          fresh.observe(obsInserted, count(lit(1)).as("n"))
            .write.mode("append").partitionBy("file_date").parquet(path("curated"))
          noteWrite("curated", fresh)
        },
        () => {
          enriched.write.mode("append").partitionBy("file_date").parquet(path("enriched"))
          noteWrite("enriched", enriched)
        }))
      val inserted = obsInserted.get("n").asInstanceOf[Long]

      writeMarts(d, marts)
      Map("attempted" -> attempted, "inserted" -> inserted)
    } finally {
      records.unpersist()
      fresh.unpersist()
    }
  }

  /** All marts for one day (delete-day-then-insert ≡ dynamic partition
    * overwrite; the hard-coded file order 10,11,20,21,30 + dashboard layer,
    * src/etl/marts_runner.py:16-34). */
  /** All mart names, in the reference's file order. */
  val allMarts: Seq[String] = Seq(
    "focos_diario_municipio", "focos_mensal_municipio",
    "focos_diario_uf", "focos_mensal_uf",
    "focos_diario_bioma", "focos_mensal_bioma",
    "focos_diario_uc", "focos_mensal_uc",
    "focos_diario_ti", "focos_mensal_ti",
    "focos_diario_uf_trend", "mv_focos_day_dim")

  /** `only`: rebuild a subset of marts — a backfill that touched one
    * dimension doesn't pay for the other eleven tables (the reference's
    * marts_runner applies whatever SQL files it is pointed at,
    * src/etl/marts_runner.py:16-34). Default rebuilds everything. */
  def writeMarts(d: Date, only: Set[String] = allMarts.toSet): Unit = {
    // Mart aggregates are day/month slices — a few thousand rows whatever
    // the corpus size. AQE's partition coalescing keeps their exchanges
    // task-efficient at any session parallelism (measured: pinning a
    // smaller shuffle-partition count here was indistinguishable from
    // letting AQE coalesce, so no knob).
    val enrichedAll = readTable("enriched")
    // each slice feeds ~3 mart aggregates — cache for the duration of the
    // rebuild so the enriched partitions are scanned once per slice, not
    // once per mart. Slices are partition-bounded (one day / one month of
    // facts), so the cache is O(batch), never O(history); released before
    // returning. Lazy: a subset rebuild materializes only what it reads.
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def slice(df: DataFrame): DataFrame = { val c = df.cache(); cached += c; c }
    lazy val dayFacts = slice(martInput(enrichedAll, d))
    lazy val monthFacts = slice(monthInput(enrichedAll, d))
    lazy val fileDateFacts = slice(enrichedAll.filter(col("file_date") === lit(d)))
    lazy val monthFileFacts = slice(enrichedAll.filter(
      date_trunc("month", col("file_date")).cast("date") ===
        lit(Date.valueOf(d.toLocalDate.withDayOfMonth(1)))))
    lazy val ufArea = ufAreaDim
    // The twelve mart tables are INDEPENDENT writes to distinct paths (the
    // one exception — the trend view reads the daily-UF mart — is ordered
    // below), and each is a small aggregate job followed by driver-side
    // commit/listing latency. Submitting them from a bounded pool overlaps
    // one mart's driver latency with another's executor work instead of
    // serializing ~12 × (plan + job + commit) — the §2.6 back-fill
    // pattern; Spark's scheduler runs concurrent jobs FIFO, which is
    // exactly the desired fill-the-tail behavior. 3 in flight is enough
    // to hide the latency without the tiny aggregates fighting for cores.
    // Job groups/descriptions are thread-local, so per-thread submission
    // also keeps the UI attribution correct. Failures propagate: every
    // future is awaited and the first throwable rethrown.
    def mart(name: String)(build: => DataFrame, part: String = "day"): Unit =
      if (only(name)) {
        val b = build
        Marts.writePartitioned(b, path(s"marts/$name"), part)
        noteWrite(s"marts/$name", b, Seq(part))
      }
    val bodies = scala.collection.mutable.Buffer[() => Unit]()
    def submit(body: => Unit): Unit = bodies += (() => body)
    try {
      // materialize the shared cached slices up front on THIS thread (the
      // lazy vals are thread-safe but a racing first-use from two pool
      // threads would serialize on the lazy-init lock while holding a
      // running job); forcing the ones this rebuild reads keeps the pool
      // threads to pure aggregate+write work. Referencing the lazy val is
      // enough — the cache itself stays lazy Spark-side.
      val needsDay = Seq("focos_diario_municipio", "focos_diario_uf",
        "mv_focos_day_dim").exists(only)
      val needsMonth = Seq("focos_mensal_municipio", "focos_mensal_uf").exists(only)
      val needsFile = Seq("focos_diario_bioma", "focos_diario_uc",
        "focos_diario_ti").exists(only)
      val needsMonthFile = Seq("focos_mensal_bioma", "focos_mensal_uc",
        "focos_mensal_ti").exists(only)
      if (needsDay) dayFacts
      if (needsMonth) monthFacts
      if (needsFile) fileDateFacts
      if (needsMonthFile) monthFileFacts
      if (Seq("focos_diario_uf", "focos_mensal_uf").exists(only)) ufArea

      submit {
        mart("focos_diario_municipio")(Marts.focosDiarioMunicipio(dayFacts))
        mart("focos_mensal_municipio")(Marts.focosMensalMunicipio(monthFacts), "month")
      }
      submit {
        mart("focos_diario_uf")(Marts.focosDiarioUf(dayFacts, ufArea))
        mart("focos_mensal_uf")(Marts.focosMensalUf(monthFacts, ufArea), "month")
        // trend view over the (small) daily UF mart — W1/W2 moving
        // averages; stays on the SAME task as its input mart's write
        if (only("focos_diario_uf_trend")) {
          val trend = Marts.focosDiarioUfTrend(readTable("marts/focos_diario_uf"))
          trend.write.mode("overwrite").parquet(path("marts/focos_diario_uf_trend"))
          noteWrite("marts/focos_diario_uf_trend", trend, Seq.empty)
        }
      }
      // biome/UC/TI marts key on raw file_date (40/50/60_*.sql — §7.4 risk 5)
      submit {
        mart("focos_diario_bioma")(Marts.focosDiarioBioma(fileDateFacts))
        mart("focos_mensal_bioma")(Marts.focosMensalBioma(monthFileFacts), "month")
      }
      submit {
        mart("focos_diario_uc")(Marts.focosDiarioKeyed(fileDateFacts, "cd_cnuc", Seq("uc_nome")))
        mart("focos_mensal_uc")(Marts.focosMensalKeyed(monthFileFacts, "cd_cnuc", Seq("uc_nome")), "month")
      }
      submit {
        mart("focos_diario_ti")(Marts.focosDiarioKeyed(fileDateFacts, "terrai_cod", Seq("ti_nome")))
        mart("focos_mensal_ti")(Marts.focosMensalKeyed(monthFileFacts, "terrai_cod", Seq("ti_nome")), "month")
      }
      // fact cube for the serving layer (065_mv_focos_day_dim.sql) — cd_uf is
      // the UF code column the reference denormalizes; our dims carry uf text
      submit {
        mart("mv_focos_day_dim")(
          Marts.factCube(dayFacts.withColumn("cd_uf", col("mun_uf"))))
      }
      // 3 in flight (Pipeline.inParallel awaits ALL before surfacing the
      // first failure, so no write is still in flight when the caller sees
      // the exception or the unpersist below runs)
      Pipeline.inParallel(bodies.toSeq, threads = 3)
      ()
    } finally {
      cached.foreach(_.unpersist(false))
    }
  }

  /** Checked-flag read path: re-enrich only rows some dimension has not
    * checked yet (the reference's `where not bioma_checked` working set,
    * 21_enrich_biomas_ucs_tis.sql:17-27), then overwrite the day partition.
    * Used when a dimension arrives after facts were first enriched. */
  def reenrichDay(fileDate: LocalDate): Long = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val d = Date.valueOf(fileDate)
    val day = readTable("enriched").filter(col("file_date") === lit(d))
    val unchecked = day.filter(
      !col("bioma_checked") || !col("uc_checked") || !col("ti_checked"))
    val n = unchecked.count()
    if (n > 0) {
      val base = unchecked.drop("cd_bioma", "bioma", "bioma_checked",
        "cd_cnuc", "uc_nome", "uc_checked", "terrai_cod", "ti_nome", "ti_checked")
      val redone = enrichDims(base)
      val checked = day.filter(
        col("bioma_checked") && col("uc_checked") && col("ti_checked"))
      val out = checked.unionByName(redone.select(checked.columns.toIndexedSeq.map(col): _*))
      // read-modify-overwrite of exactly one partition (§7.4 risk 7)
      val tmp = path(s"enriched_tmp_$fileDate")
      out.write.mode("overwrite").parquet(tmp)
      val rewritten = spark.read.parquet(tmp).withColumn("file_date", lit(d))
      rewritten.write.mode("overwrite").partitionBy("file_date").parquet(path("enriched"))
      noteWrite("enriched", rewritten)
      // Hadoop FS delete, not java.io: with an HDFS/S3 root a local-FS
      // delete silently no-ops and enriched_tmp_* datasets leak forever
      val tmpHp = new org.apache.hadoop.fs.Path(tmp)
      tmpHp.getFileSystem(spark.sessionState.newHadoopConf()).delete(tmpHp, true)
      ()
    }
    n
  }

  /** Conservation-of-counts invariants (src/etl/backfill.py:69-135):
    * curated(day) == enriched(day); sum(mun mart) == enriched rows with
    * municipality == sum over the UF mart. Returns error strings.
    *
    * Deliberate divergence from the reference check: backfill.py:112
    * compares the mart (keyed on the DERIVED day) against enriched rows
    * scoped by FILE_DATE — an invariant that only balances when
    * view-day == file-day for every row of the day. The engine compares
    * the mart against [[martInput]] — the exact frame the mart was built
    * from — so the conservation claim holds under cross-day rows too
    * (and a stale mart after late files arrive fails LOUDLY instead of
    * being unverifiable). */
  def checkDay(fileDate: LocalDate): Seq[String] = {
    val d = Date.valueOf(fileDate)
    val errs = scala.collection.mutable.Buffer[String]()
    def martSum(mart: String, valueCol: String): Long =
      readTable(s"marts/$mart").filter(col("day") === lit(d))
        .agg(coalesce(sum(valueCol), lit(0L))).head().getLong(0)
    // five INDEPENDENT read-only verification aggregates — §2.6 overlap
    // (they were five serialized actions, each a tiny job plus its driver
    // latency; the invariant comparisons below are pure driver arithmetic)
    val Seq(nCur, nEnr, withMun, munSum, ufSum) = Pipeline.inParallel(Seq(
      () => readTable("curated").filter(col("file_date") === lit(d)).count(),
      () => readTable("enriched").filter(col("file_date") === lit(d)).count(),
      () => martInput(readTable("enriched"), d)
        .filter(col("mun_cd_mun").isNotNull).count(),
      () => martSum("focos_diario_municipio", "n_focos"),
      () => martSum("focos_diario_uf", "n_focos")))
    if (nCur != nEnr) errs += s"curated($nCur) != enriched($nEnr) for $fileDate"
    if (withMun != munSum) errs += s"mun mart sum($munSum) != enriched with mun($withMun) for $fileDate"
    if (munSum != ufSum) errs += s"uf mart sum($ufSum) != mun mart sum($munSum) for $fileDate"
    errs.toSeq
  }

  // ------------------------------------------------------ resumable backfill

  // Hadoop FS, not java.nio: with an HDFS/S3 warehouse root a java.nio
  // Paths.get("s3://…") is a LOCAL relative path — state writes would land
  // on the driver's disk, a resumed backfill on another driver would find
  // nothing, and the whole range would silently re-run from `start`
  private def statePath = new org.apache.hadoop.fs.Path(path("backfill_state.json"))
  private def stateFs =
    statePath.getFileSystem(spark.sessionState.newHadoopConf())

  def readState(): Option[LocalDate] =
    if (stateFs.exists(statePath)) {
      val in = stateFs.open(statePath)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      "\"last_completed\"\\s*:\\s*\"([0-9-]+)\"".r.findFirstMatchIn(s)
        .map(m => LocalDate.parse(m.group(1)))
    } else None

  /** Atomic tmp+rename state write (backfill.py:63-66): FileContext.rename
    * with Rename.OVERWRITE is the Hadoop API with the atomic-replace
    * contract the reference's Path.replace relies on (FileSystem.rename
    * does not overwrite). */
  def writeState(last: LocalDate): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(statePath.toString + ".tmp")
    val out = stateFs.create(tmp, true)
    try out.write(s"""{"last_completed": "$last"}""".getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(statePath.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, statePath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    ()
  }

  /** EP2 — range mode: loop days, stop on first failure, resume from state.
    * @param csvFor resolves a date to its raw CSV DataFrame (the S1/S2
    *               source resolver seam — wire Sources.resolveDaily here;
    *               tests inject local fixtures)
    */
  def backfill(start: LocalDate, end: LocalDate, csvFor: LocalDate => DataFrame,
               resume: Boolean = false, checks: Boolean = true,
               marts: Set[String] = allMarts.toSet): Seq[LocalDate] = {
    val from = if (resume) readState().map(_.plusDays(1)).getOrElse(start) else start
    val done = scala.collection.mutable.Buffer[LocalDate]()
    var cur = from
    while (!cur.isAfter(end)) {
      runDayFrom(csvFor(cur), cur, marts)
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
