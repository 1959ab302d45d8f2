package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogHygiene.quietKnownBenign()
    new java.io.File(outDir).mkdirs()
    // optional comma-separated filter for local iteration (unset in CI)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // Boundary-type guard: a DECIMAL in a FINAL schema stringifies
        // differently per engine under the gate's pandas canonicalization
        // (DuckDB DECIMAL/HUGEINT → float64 '513.0' vs Spark Decimal
        // '513.00') and hash-mismatches even when every cell is equal.
        // The repo-wide recipe is DOUBLE or fixed-point BIGINT finals —
        // fail loud here so a new query can't regress it to a red row.
        // recurse into struct/array/map: a nested Decimal stringifies just
        // as divergently as a top-level one
        def hasDecimal(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
          case _: org.apache.spark.sql.types.DecimalType => true
          case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasDecimal(f.dataType))
          case a: org.apache.spark.sql.types.ArrayType => hasDecimal(a.elementType)
          case m: org.apache.spark.sql.types.MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
          case _ => false
        }
        val decCols = df.schema.fields.collect {
          case f if hasDecimal(f.dataType) => f.name
        }
        require(decCols.isEmpty,
          s"$name emits DecimalType final column(s) ${decCols.mkString(",")} — " +
            "cast to DOUBLE or fixed-point BIGINT (see q1_pricing_summary)")
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
