package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingest
import graft.sources.Sources

/** Unit coverage for the ingest projections (P1/P2/P4/P5/P6) and the S1
  * cache / S2 zip helpers. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("P1: header normalization = strip().lower().replace(' ','_')") {
    assert(Ingest.normalizeHeader("  Data Hora GMT ") == "data_hora_gmt")
    assert(Ingest.normalizeHeader("Latitude") == "latitude")
    assert(Ingest.normalizeHeader("riscofogo") == "riscofogo")
  }

  test("P2: preferred exact name wins, then substring-contains fallback") {
    assert(Ingest.resolveColumn(Seq("lat", "latitude"), Ingest.latPreferred).contains("lat"))
    assert(Ingest.resolveColumn(Seq("latitude_gms"), Ingest.latPreferred).contains("latitude_gms"))
    assert(Ingest.resolveColumn(Seq("foo"), Ingest.latPreferred).isEmpty)
    // ts preference order: data_hora_gmt > datahora > data_hora > data
    assert(Ingest.resolveColumn(Seq("data", "data_hora_gmt"), Ingest.tsPreferred)
      .contains("data_hora_gmt"))
  }

  test("P3-P6: locale cast, null-word cleaning, coordinate validation") {
    import spark.implicits._
    val raw = Seq(
      ("-10,5", "-55,1", "2024-01-01 12:00:00", "AQUA", "Cidade"),
      ("not-a-number", "-55,2", "2024-01-01 12:01:00", "nan", "  "), // bad lat -> dropped
      ("91,0", "-55,3", "2024-01-01 12:02:00", "TERRA", "NULL"), // out of range -> dropped
      ("-10,6", "-55,4", "", "none", "Outra")
    ).toDF("Latitude", "Longitude", "Data Hora GMT", "Satelite", "Municipio")
    val out = Ingest.transform(raw, java.sql.Date.valueOf("2024-01-01"))
    val rows = out.orderBy("lat").collect()
    assert(rows.length == 2)
    assert(out.filter(col("lat") === -10.5).count() == 1) // comma decimal parsed
    // null-word cleaning: 'nan'/'none' satellites and blank municipio -> null
    val r2 = out.filter(col("lat") === -10.6).head
    assert(r2.getAs[String]("satelite") == null)
    assert(r2.getAs[String]("view_ts") == null) // empty string -> null
    // props JSON carries the original (cleaned) row
    assert(r2.getAs[String]("props").contains("\"longitude\":\"-55,4\""))
    // hashes are distinct and deterministic
    assert(out.select("event_hash").distinct().count() == 2)
  }

  test("S4: comma-dialect files sniff correctly too") {
    val dir = Files.createTempDirectory("graft_comma")
    val f = dir.resolve("d.csv")
    Files.writeString(f, "latitude,longitude,satelite\n-10.5,-55.1,AQUA\n-10.6,-55.2,TERRA\n")
    val df = Ingest.readCsv(spark, f.toString)
    // data columns + the engine's file-order bookkeeping column
    assert(df.columns.toSeq.filterNot(_.startsWith("__")) ==
      Seq("latitude", "longitude", "satelite"))
    assert(df.columns.contains("__src_order"))
    assert(df.count() == 2)
  }

  test("S4: mixed-delimiter directories sniff PER FILE — the other-dialect " +
    "file's rows parse instead of silently nulling out") {
    val dir = Files.createTempDirectory("graft_mixed")
    // alphabetically-first file is comma; the semicolon file would have
    // been parsed as one giant column under single-file sniffing, its
    // coordinates nulled, and every row silently dropped by P4
    Files.writeString(dir.resolve("a_comma.csv"),
      "latitude,longitude,satelite\n-10.5,-55.1,AQUA\n")
    Files.writeString(dir.resolve("b_semi.csv"),
      "latitude;longitude;satelite\n-11.5;-56.1;TERRA\n-11.6;-56.2;NOAA\n")
    val out = Ingest.transform(Ingest.readCsv(spark, dir.toString),
      java.sql.Date.valueOf("2024-01-01"))
    assert(out.count() == 3, "a row from the other-dialect file was dropped")
    assert(out.filter(col("lat") === -11.5).count() == 1)
    assert(out.filter(col("lat") === -10.5).count() == 1)
  }

  test("P9: multi-file reads dedup with a file-order survivor key") {
    val dir = Files.createTempDirectory("graft_multifile")
    // same event hash inputs in both files, different municipio: the survivor
    // must come from the lexically FIRST file regardless of split packing.
    // b.csv is made much larger so size-ordered split packing would visit it
    // first — the survivor must still come from a.csv.
    Files.writeString(dir.resolve("a.csv"),
      "latitude;longitude;satelite;municipio\n-10.5;-55.1;AQUA;FIRST\n")
    val pad = (1 to 200).map(i => s"-2$i.0;-40.0;NOAA;PAD$i").mkString("\n")
    Files.writeString(dir.resolve("b.csv"),
      s"latitude;longitude;satelite;municipio\n-10.5;-55.1;AQUA;SECOND\n$pad\n")
    val out = Ingest.transform(Ingest.readCsv(spark, dir.toString + "/*.csv"),
      java.sql.Date.valueOf("2024-01-01"))
    val dup = out.filter(col("lat") === -10.5).collect()
    assert(dup.length == 1) // deduped across files
    assert(dup.head.getAs[String]("municipio") == "FIRST")
    // props JSON never leaks bookkeeping columns
    assert(!dup.head.getAs[String]("props").contains("__src_order"))
  }

  test("S1: cachedFetch skips the fetcher on a warm cache and models 404") {
    val dir = Files.createTempDirectory("graft_cache")
    var calls = 0
    def fetch(): Option[Array[Byte]] = { calls += 1; Some("data".getBytes) }
    val p1 = Sources.cachedFetch(dir, "2024-01-01.csv", fetch _)
    assert(p1.isDefined && calls == 1)
    val p2 = Sources.cachedFetch(dir, "2024-01-01.csv", fetch _)
    assert(p2 == p1 && calls == 1) // cache hit: no second fetch
    assert(Sources.cachedFetch(dir, "missing.csv", () => None).isEmpty) // 404
    val p3 = Sources.cachedFetch(dir, "2024-01-01.csv", fetch _, force = true)
    assert(p3.isDefined && calls == 2) // force re-fetches
  }

  test("S2: zip extraction picks the first csv entry") {
    val dir = Files.createTempDirectory("graft_zip")
    val zip = dir.resolve("m.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zip))
    zos.putNextEntry(new java.util.zip.ZipEntry("readme.txt"))
    zos.write("not csv".getBytes); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("focos_2024-01.CSV"))
    zos.write("a;b\n1;2\n".getBytes); zos.closeEntry()
    zos.close()
    val out = dir.resolve("m.csv")
    Sources.extractZipCsv(zip, out)
    assert(Files.readString(out) == "a;b\n1;2\n")
    val empty = dir.resolve("e.zip")
    val z2 = new java.util.zip.ZipOutputStream(Files.newOutputStream(empty))
    z2.putNextEntry(new java.util.zip.ZipEntry("x.txt")); z2.closeEntry(); z2.close()
    intercept[java.io.FileNotFoundException] {
      Sources.extractZipCsv(empty, dir.resolve("e.csv"))
    }
  }
}
