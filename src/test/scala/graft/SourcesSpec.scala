package graft

import java.nio.file.Files
import java.time.{LocalDate, YearMonth}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DimNormalizer, Sources}

/** S2/S3 source chain + S6 dimension normalizer unit tests with local
  * fixtures (VERDICT round-2 item 6). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeMonthly(): String = {
    val dir = Files.createTempDirectory("graft_monthly")
    val f = dir.resolve("2024-01.csv")
    // mixed ISO and BR timestamp formats in one file, ';' dialect
    Files.writeString(f,
      """Data Hora GMT;Latitude;Longitude;Satelite
        |2024-01-01 10:00:00;-10,5;-55,1;AQUA
        |2024-01-02 09:30:00;-10,6;-55,2;AQUA
        |02/01/2024 11:00;-10,7;-55,3;TERRA
        |2024-01-03 08:00:00;-10,8;-55,4;AQUA
        |garbage-timestamp;-10,9;-55,5;AQUA
        |""".stripMargin)
    f.toString
  }

  test("S3: date column located by preferred name then substring heuristic") {
    assert(Sources.findDateColumn(Seq("foo", "Data Hora GMT", "lat")).contains("Data Hora GMT"))
    assert(Sources.findDateColumn(Seq("foo", "minha_data_gmt")).contains("minha_data_gmt"))
    assert(Sources.findDateColumn(Seq("datahora", "data_hora_gmt")).contains("data_hora_gmt"))
    assert(Sources.findDateColumn(Seq("lat", "lon")).isEmpty)
  }

  test("S3: monthly -> daily row filter keeps exactly the target day (ISO + BR formats)") {
    val monthly = writeMonthly()
    val d2 = Sources.filterMonthlyToDaily(spark, monthly, LocalDate.parse("2024-01-02"))
    assert(d2.count() == 2) // one ISO row + one BR-format row
    val d3 = Sources.filterMonthlyToDaily(spark, monthly, LocalDate.parse("2024-01-03"))
    assert(d3.count() == 1)
    val d9 = Sources.filterMonthlyToDaily(spark, monthly, LocalDate.parse("2024-01-09"))
    assert(d9.count() == 0) // garbage timestamps never match
  }

  test("S2: retention cutoff flips the daily/monthly preference order") {
    val monthly = writeMonthly()
    val today = LocalDate.parse("2024-03-01") // cutoff = 2024-01-16
    val dailyDir = Files.createTempDirectory("graft_daily")
    val dailyCsv = dailyDir.resolve("2024-02-20.csv")
    Files.writeString(dailyCsv, "latitude;longitude;satelite\n-1,0;-50,0;AQUA\n")

    // old date -> monthly preferred even though a daily file exists
    val old = Sources.resolveDaily(spark, LocalDate.parse("2024-01-02"),
      daily = _ => Some(dailyCsv.toString), monthly = _ => Some(monthly), today = today)
    assert(old.source.startsWith("monthly:"))
    assert(old.df.count() == 2)

    // recent date -> daily preferred
    val recent = Sources.resolveDaily(spark, LocalDate.parse("2024-02-20"),
      daily = _ => Some(dailyCsv.toString), monthly = _ => Some(monthly), today = today)
    assert(recent.source.startsWith("daily:"))

    // recent date, daily 404 -> monthly fallback
    val fallback = Sources.resolveDaily(spark, LocalDate.parse("2024-01-03"),
      daily = _ => None, monthly = _ => Some(monthly), today = today, retentionDays = 365)
    assert(fallback.source.startsWith("monthly:"))
    assert(fallback.df.count() == 1)

    // nothing available -> FileNotFoundException
    intercept[java.io.FileNotFoundException] {
      Sources.resolveDaily(spark, LocalDate.parse("2024-02-21"),
        daily = _ => None, monthly = _ => None, today = today)
    }
  }

  test("S6: differently-shaped dim sources normalize to one schema") {
    import spark.implicits._
    val a = Seq(("001", "Parque X", "g1"), ("", "Parque Y", "g2"))
      .toDF("uc_cd_cnuc", "nm_uc", "wkb_geometry")
      .withColumn("id_uc", org.apache.spark.sql.functions.lit("FALLBACK"))
    val b = Seq(("002", "Parque Z", "g3")).toDF("cd_cnuc", "nome_uc", "geom")

    val na = DimNormalizer.normalizeUc(a)
    val nb = DimNormalizer.normalizeUc(b)
    assert(na.columns.toSet == Set("dim_id", "code", "name", "geom"))
    assert(na.columns.toSet == nb.columns.toSet)
    // candidate order: cd_cnuc-family wins over id_uc; empty trims to the
    // next candidate (nullif(trim(..),'') coalesce)
    val rows = na.orderBy("dim_id").collect()
    assert(rows.map(_.getAs[String]("code")).toSeq == Seq("001", "FALLBACK"))
    assert(nb.head.getAs[String]("code") == "002")
  }

  test("S6: TI and biome normalizers resolve their own candidate families") {
    import spark.implicits._
    val ti = Seq(("T1", "Terra A", "g1")).toDF("terrai_cod", "terrai_nom", "geom")
    val nt = DimNormalizer.normalizeTi(ti)
    assert(nt.columns.toSet == Set("dim_id", "code", "name", "geom"))
    assert(nt.head.getAs[String]("code") == "T1"
      && nt.head.getAs[String]("name") == "Terra A")
    val bio = Seq(("3", "Cerrado", "g2")).toDF("cod_bioma", "nm_bioma", "wkb_geometry")
    val nbio = DimNormalizer.normalizeBioma(bio)
    assert(nbio.head.getAs[String]("code") == "3"
      && nbio.head.getAs[String]("name") == "Cerrado")
    // a frame with NO candidate for the family fails loudly, not silently
    val err = intercept[IllegalArgumentException] {
      DimNormalizer.normalizeBioma(Seq(("x", "g")).toDF("unrelated", "geom"))
    }
    assert(err.getMessage.contains("no code column"))
  }

  test("JSONL source: clean rows parsed against the explicit schema, bad lines quarantined verbatim") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    val f = dir.resolve("docs.jsonl")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
      """{"doc_id": 3, "text": "truncated...""", // malformed JSON
      """not json at all""",
      """{"doc_id": 4, "text": null, "lang": "en"}"""))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val r = Sources.readJsonl(spark, f.toString, schema)
    val clean = r.clean.collect().map(x =>
      (x.getLong(0), if (x.isNullAt(1)) null else x.getString(1))).sortBy(_._1)
    assert(clean.toSeq == Seq((1L, "hello world"), (2L, "bonjour"), (4L, null)))
    assert(r.clean.columns.toSeq == Seq("doc_id", "text", "lang"))
    val bad = r.corrupt.collect().map(_.getString(0)).sorted
    assert(bad.length == 2 && bad.exists(_.contains("truncated")) &&
      bad.contains("not json at all"))
    intercept[IllegalArgumentException] {
      Sources.readJsonl(spark, f.toString,
        schema.add("_corrupt_record", StringType))
    }
  }

  test("S6: first available source wins, in fixed candidate order") {
    import spark.implicits._
    val d = Seq(("1", "x", "g")).toDF("cd_bioma", "bioma", "geom")
    val (name, _) = DimNormalizer.pickSource(Seq(
      "ref_core.biomas_4326_sub" -> None, "ref_core.biomas_4326" -> Some(d),
      "ref.biomas_4326" -> Some(d)))
    assert(name == "ref_core.biomas_4326")
    intercept[IllegalArgumentException] {
      DimNormalizer.pickSource(Seq("a" -> None, "b" -> None))
    }
  }
}
