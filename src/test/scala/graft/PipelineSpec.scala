package graft

import java.nio.file.{Files, Path}
import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingest
import graft.pipeline.Pipeline

/** End-to-end pipeline integration test on a synthetic 3-day fixture:
  * ingest → enrich (municipality + biome + UC + TI) → marts + cube, with
  * the backfill invariants of src/etl/backfill.py:69-135 asserted per day,
  * idempotent re-runs, resumable state, mart-read partition pruning, and
  * the checked-flags re-enrich path.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  type MP = Seq[Seq[Seq[Seq[Double]]]]
  private def rect(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double): MP =
    Seq(Seq(Seq(Seq(minLon, minLat), Seq(maxLon, minLat), Seq(maxLon, maxLat),
      Seq(minLon, maxLat), Seq(minLon, minLat))))

  private def bboxed(df: DataFrame, minLon: Double, minLat: Double,
                     maxLon: Double, maxLat: Double): DataFrame =
    df.withColumn("min_lon", lit(minLon)).withColumn("min_lat", lit(minLat))
      .withColumn("max_lon", lit(maxLon)).withColumn("max_lat", lit(maxLat))

  private lazy val municipios: DataFrame = {
    import spark.implicits._
    val a = bboxed(Seq(("1100015", "Alpha", "RO", 5000.0)).toDF("cd_mun", "nm_mun", "uf", "area_km2"),
      0, 0, 10, 10).withColumn("geom", typedLit(rect(0, 0, 10, 10)))
    val b = bboxed(Seq(("1100023", "Beta", "AC", 7000.0)).toDF("cd_mun", "nm_mun", "uf", "area_km2"),
      10.5, 0, 20, 10).withColumn("geom", typedLit(rect(10.5, 0, 20, 10)))
    a.unionByName(b)
  }

  private lazy val biomas: DataFrame = {
    import spark.implicits._
    bboxed(Seq((1L, "1", "Amazonia")).toDF("dim_id", "cd_bioma", "bioma_nome"),
      0, 0, 20, 10).withColumn("geom", typedLit(rect(0, 0, 20, 10)))
  }
  private lazy val ucs: DataFrame = {
    import spark.implicits._
    bboxed(Seq((1L, "42", "UC X")).toDF("dim_id", "cd_cnuc", "nome_uc"),
      0, 0, 5, 10).withColumn("geom", typedLit(rect(0, 0, 5, 10)))
  }
  private lazy val tis: DataFrame = {
    import spark.implicits._
    bboxed(Seq((1L, "7", "TI Y")).toDF("dim_id", "terrai_cod", "terrai_nom"),
      5.5, 0, 10, 10).withColumn("geom", typedLit(rect(5.5, 0, 10, 10)))
  }

  /** Per day: 2 points in UC territory, 1 in TI territory (all mun Alpha),
    * 2 in mun Beta, plus one exact duplicate and one invalid-lat row. */
  private def writeDailyCsv(dir: Path, day: LocalDate): String = {
    val d = day.toString
    val rows = Seq(
      s"2,5;1,5;$d 12:00:00;AQUA;Alpha;RO;Amazonia",
      s"4,5;4,4;$d 12:05:00;AQUA;Alpha;RO;Amazonia",
      s"3,5;7,5;$d 12:10:00;TERRA;Alpha;RO;Amazonia",
      s"1,5;11,5;$d 12:15:00;AQUA;Beta;AC;Amazonia",
      s"8,5;15,5;$d 12:20:00;TERRA;Beta;AC;Amazonia",
      s"2,5;1,5;$d 12:00:00;AQUA;Alpha;RO;Amazonia", // duplicate of row 1
      s"999;1,5;$d 12:25:00;AQUA;Alpha;RO;Amazonia" // invalid latitude
    )
    val f = dir.resolve(s"$day.csv")
    Files.writeString(f,
      "latitude;longitude;data_hora_gmt;satelite;municipio;estado;bioma\n" +
        rows.mkString("\n") + "\n")
    f.toString
  }

  private lazy val fixture: (Pipeline, String, Path) = {
    val dir = Files.createTempDirectory("graft_pipeline")
    val root = dir.resolve("warehouse").toString
    val p = new Pipeline(spark, root, municipios, biomas, Some(ucs), Some(tis))
    (p, root, dir)
  }

  private val d1 = LocalDate.parse("2024-01-01")
  private val d3 = LocalDate.parse("2024-01-03")

  test("3-day backfill: enrich chain + marts + conservation invariants") {
    val (p, root, dir) = fixture
    val done = p.backfill(d1, d3,
      d => Ingest.readCsv(spark, writeDailyCsv(dir, d)), checks = true)
    assert(done.size == 3)
    assert(p.readState().contains(d3))

    val curated = spark.read.parquet(s"$root/curated")
    assert(curated.count() == 15) // 5 valid unique rows x 3 days
    val enriched = spark.read.parquet(s"$root/enriched")
    assert(enriched.count() == 15)
    assert(enriched.filter(col("mun_cd_mun").isNull).count() == 0)
    // UC/TI coverage: 2 points/day in the UC box, 1/day in the TI box
    assert(enriched.filter(col("cd_cnuc") === "42").count() == 6)
    assert(enriched.filter(col("terrai_cod") === "7").count() == 3)
    assert(enriched.filter(!col("bioma_checked") || !col("uc_checked") || !col("ti_checked"))
      .count() == 0)

    // marts: all six daily tables + monthly mun + cube materialized
    def mart(n: String) = spark.read.parquet(s"$root/marts/$n")
    assert(mart("focos_diario_municipio").agg(sum("n_focos")).head.getLong(0) == 15)
    assert(mart("focos_diario_uf").agg(sum("n_focos")).head.getLong(0) == 15)
    assert(mart("focos_mensal_municipio").agg(sum("n_focos")).head.getLong(0) == 15)
    assert(mart("focos_diario_bioma").agg(sum("focos")).head.getLong(0) == 15)
    assert(mart("focos_diario_uc").agg(sum("focos")).head.getLong(0) == 6)
    assert(mart("focos_diario_ti").agg(sum("focos")).head.getLong(0) == 3)
    val cube = mart("mv_focos_day_dim")
    assert(cube.agg(sum("n_focos")).head.getLong(0) == 15)
    // all 11 dimension columns populated end-to-end
    assert(cube.filter(col("cd_cnuc") === "42").agg(sum("n_focos")).head.getLong(0) == 6)
    assert(cube.filter(col("terrai_cod") === "7").agg(sum("n_focos")).head.getLong(0) == 3)
    assert(cube.filter(col("cd_bioma") === "1").agg(sum("n_focos")).head.getLong(0) == 15)
  }

  test("enrichMunicipio: KNN fallback snaps a gap point within 2 km to the " +
    "nearest municipality and leaves a far point unassigned") {
    import spark.implicits._
    import graft.enrich.Enrich
    // Alpha covers lon [0,10], Beta [10.5,20] — a 0.5° gap between them.
    // (10.49, 5) is ~1.1 km from Beta's western edge → snaps to Beta;
    // (10.25, 5) is ~27 km from both → stays null; (5, 5) is exact-PIP
    // inside Alpha and must NOT be touched by the fallback.
    val facts = Seq(("h1", 5.0, 5.0), ("h2", 10.49, 5.0), ("h3", 10.25, 5.0))
      .toDF("event_hash", "lon", "lat")
    val got = Enrich.enrichMunicipio(facts, municipios)
      .select("event_hash", "mun_cd_mun", "mun_nm_mun", "mun_uf")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == Set(
      ("h1", "1100015", "Alpha", "RO"),
      ("h2", "1100023", "Beta", "AC"),
      ("h3", null, null, null)))
    // exactly one output row per fact — the conservation invariant the
    // linear join+window form must preserve
    assert(Enrich.enrichMunicipio(facts, municipios).count() == 3)
  }

  test("schema cache: a write that changes the store schema invalidates the " +
    "cached entry; an unchanged-schema write keeps it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schema_cache")
    val root = dir.resolve("wh").toString
    val p = new Pipeline(spark, root, municipios, biomas)
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$root/demo")
    assert(p.readTable("demo").columns.toSeq == Seq("a", "b")) // primes cache
    // the store gains a column; without invalidation the cached schema
    // silently projects it away
    val v2 = Seq((2, "y", 9L)).toDF("a", "b", "c")
    v2.write.mode("overwrite").parquet(s"$root/demo")
    assert(p.readTable("demo").columns.toSeq == Seq("a", "b"),
      "precondition: the stale cache really is in play")
    p.noteWrite("demo", v2, Seq.empty)
    assert(p.readTable("demo").columns.toSeq.sorted == Seq("a", "b", "c"),
      "changed-schema write must invalidate the cached entry")
    // unchanged-schema append keeps the (re-primed) cache entry valid
    p.noteWrite("demo", v2, Seq.empty)
    assert(p.readTable("demo").columns.toSeq.sorted == Seq("a", "b", "c"))
    // a write that DROPS a column must also invalidate (set equality, not
    // subset): a one-directional check would keep the stale 3-column entry
    // and read the vanished column back as all-null forever
    val v3 = Seq((3, "z")).toDF("a", "b")
    v3.write.mode("overwrite").parquet(s"$root/demo")
    p.noteWrite("demo", v3, Seq.empty)
    assert(p.readTable("demo").columns.toSeq.sorted == Seq("a", "b"),
      "dropped-column write must invalidate the cached entry")
  }

  test("localized dims: a fact-sized frame mis-wired as a dimension fails " +
    "the bounded-dim contract loudly instead of collecting unbounded") {
    val dir = Files.createTempDirectory("graft_dim_guard")
    val big = spark.range(200001).selectExpr("cast(id as string) as uf",
      "cast(id as double) as area_km2", "'x' as nm_mun", "'1' as cd_mun",
      "'g' as geom_json")
    val e = intercept[IllegalArgumentException] {
      new Pipeline(spark, dir.resolve("wh").toString, big, biomas)
    }
    assert(e.getMessage.contains("bounded-dim"))
  }

  test("idempotent re-run inserts nothing and keeps counts stable") {
    val (p, root, dir) = fixture
    val again = p.runDay(writeDailyCsv(dir, d1), d1)
    assert(again("attempted") == 5)
    assert(again("inserted") == 0)
    assert(spark.read.parquet(s"$root/curated").count() == 15)
    assert(spark.read.parquet(s"$root/enriched").count() == 15)
    assert(p.checkDay(d1).isEmpty)
  }

  test("resume skips completed days") {
    val (p, _, _) = fixture
    val resumed = p.backfill(d1, d3,
      _ => fail("resume must not re-run completed days"): DataFrame,
      resume = true)
    assert(resumed.isEmpty)
  }

  test("mart input is partition-pruned on file_date (not just the derived day key)") {
    val (p, root, _) = fixture
    val plan = p.martInput(spark.read.parquet(s"$root/enriched"),
      java.sql.Date.valueOf(d1)).queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*file_date[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.isDefined, s"no file_date partition filter in plan:\n$plan")
  }

  test("curatedDay union view: a re-run heals curated orphans AND admits the " +
    "late batch's new rows (existing ∪ fresh ≡ the partition read-back)") {
    // Own root: this test doctors the curated store, so it must not share
    // the lazy fixture other tests assert exact counts against.
    val dir2 = Files.createTempDirectory("graft_pipeline_union")
    val root = dir2.resolve("warehouse").toString
    val p = new Pipeline(spark, root, municipios, biomas, Some(ucs), Some(tis))
    val day = LocalDate.parse("2024-02-01")
    val first = p.runDay(writeDailyCsv(dir2, day), day)
    assert(first("inserted") == 5)

    // Simulate a prior crashed batch: two curated rows whose enrichment
    // never happened (curated append succeeded, enriched write did not).
    // runDayFrom used to see them via the partition READ-BACK; the
    // existing ∪ fresh union view must see them via `existing`.
    val part = s"$root/curated/file_date=$day"
    val orphans = spark.read.parquet(part).limit(2)
      .withColumn("event_hash", concat(lit("orphan_"), col("event_hash")))
      .withColumn("lat", col("lat") + lit(0.01))
    orphans.write.mode("append").parquet(part)

    // Late file for the SAME day: the original rows plus one new point
    // (valid coords inside mun Alpha / biome / UC boxes)
    val f = dir2.resolve(s"$day-late.csv")
    val d = day.toString
    Files.writeString(f,
      "latitude;longitude;data_hora_gmt;satelite;municipio;estado;bioma\n" +
        s"2,5;1,5;$d 12:00:00;AQUA;Alpha;RO;Amazonia\n" +
        s"9,1;2,2;$d 18:00:00;AQUA;Alpha;RO;Amazonia\n")
    val again = p.runDay(f.toString, day)
    assert(again("attempted") == 2)
    assert(again("inserted") == 1) // the 18:00 point only

    // curated: 5 original + 2 orphans + 1 late insert
    val curated = spark.read.parquet(s"$root/curated")
    assert(curated.count() == 8)
    // enriched must match curated 1:1 — the 2 orphans healed (only the
    // read-back used to guarantee that) AND the fresh row admitted (only
    // `fresh` carries it: its files postdate `existing`'s pinned listing)
    val enriched = spark.read.parquet(s"$root/enriched")
    assert(enriched.count() == 8)
    assert(enriched.select("event_hash").distinct().count() == 8)
    assert(enriched.filter(col("event_hash").startsWith("orphan_")).count() == 2)
    assert(enriched.filter(col("mun_cd_mun").isNull).count() == 0)
    assert(p.checkDay(day).isEmpty)
  }

  test("checked-flags read path: reenrichDay restores a late-arriving dimension") {
    val (p, root, dir2) = fixture
    // simulate "UC dim arrived late": null the UC outputs of day 1 and clear its flag
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val day = spark.read.parquet(s"$root/enriched")
      .filter(col("file_date") === lit(java.sql.Date.valueOf(d1)))
    val doctored = day
      .withColumn("uc_checked", lit(false))
      .withColumn("cd_cnuc", lit(null).cast("string"))
      .withColumn("uc_nome", lit(null).cast("string"))
    val tmp = dir2.resolve("doctored").toString
    doctored.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp)
      .withColumn("file_date", lit(java.sql.Date.valueOf(d1)))
      .write.mode("overwrite").partitionBy("file_date").parquet(s"$root/enriched")

    assert(p.reenrichDay(d1) == 5) // every day-1 row was unchecked
    val redone = spark.read.parquet(s"$root/enriched")
      .filter(col("file_date") === lit(java.sql.Date.valueOf(d1)))
    assert(redone.count() == 5)
    assert(redone.filter(col("cd_cnuc") === "42").count() == 2)
    assert(redone.filter(!col("uc_checked")).count() == 0)
    assert(p.checkDay(d1).isEmpty)
  }

  test("EP3 over EP1: the Serve layer answers from the pipeline-written cube") {
    import graft.serve.Serve
    val (_, root, _) = fixture
    val cube = spark.read.parquet(s"$root/marts/mv_focos_day_dim")
    val from = d1
    val to = d3.plusDays(1)

    assert(Serve.totals(cube, from, to, Serve.Filters()).head.getLong(0) == 15)
    assert(Serve.totals(cube, from, to, Serve.Filters(uf = Some("ro")))
      .head.getLong(0) == 9) // filter normalization upper-cases "ro"

    val s = Serve.summary(cube, from, to, Serve.Filters()).head
    assert(s.getAs[Long]("total_focos") == 15)
    assert(s.getAs[java.sql.Date]("peak_day").toLocalDate == d1) // 5/5/5 tie -> earliest
    assert(s.getAs[Long]("peak_n") == 5)

    val top = Serve.top(cube, from, to, Serve.Filters(), by = "uf", limit = 5)
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("n_focos"))
    assert(top.toSeq == Seq("RO" -> 9L, "AC" -> 6L))

    val (tot, ts, byUf) = Serve.validateConsistency(cube, from, to, Serve.Filters())
    assert(tot == 15 && ts == 15 && byUf == 15)
  }

  test("A7 period stats: single-pass max_by peak over the daily UF mart") {
    import graft.marts.Marts
    val (_, root, _) = fixture
    val dailyUf = spark.read.parquet(s"$root/marts/focos_diario_uf")
    val period = Marts.focosPeriodoUf(dailyUf,
        java.sql.Date.valueOf(d1), java.sql.Date.valueOf(d3))
      .collect().map(r => r.getAs[String]("uf") -> r).toMap
    assert(period.keySet == Set("RO", "AC"))
    val ro = period("RO")
    assert(ro.getAs[Long]("n_focos_total") == 9)
    assert(ro.getAs[java.math.BigDecimal]("n_focos_avg_daily").doubleValue() == 3.0)
    assert(ro.getAs[Long]("n_focos_max_daily") == 3)
    // 3/3/3 tie -> earliest day wins (DISTINCT ON tiebreak, W3)
    assert(ro.getAs[java.sql.Date]("peak_day").toLocalDate == d1)
  }
}
