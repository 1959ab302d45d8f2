package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Poison-injection coverage for the Verify harness: a failing query must
  * surface in the failures artifact and the output census — never vanish
  * as a silently absent parquet dir (the round-7 `dedup_clusters` gate
  * incident, where a transient Spark failure left the driver's
  * CORRECTNESS file one row short with nothing loud anywhere).
  */
class VerifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpDir(): String =
    Files.createTempDirectory("graft_verify_spec").toString

  private def good(name: String): (String, (SparkSession, String) => DataFrame) =
    name -> ((s: SparkSession, _: String) => {
      import s.implicits._
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    })

  test("poison: a query that always throws lands in failures and census, others still write") {
    val out = tmpDir()
    val poison = "zz_poison" -> ((_: SparkSession, _: String) => {
      throw new RuntimeException("injected poison")
    }: DataFrame)
    val failures = Verify.runQueries(spark, Seq(good("aa_ok"), poison), "unused", out)
    assert(failures.keySet == Set("zz_poison"))
    assert(failures("zz_poison").contains("injected poison"))
    // the healthy query is unaffected by its neighbor's failure
    assert(Files.exists(Paths.get(s"$out/aa_ok/_SUCCESS")))
    assert(spark.read.parquet(s"$out/aa_ok").count() == 2)
    // census reports exactly the poisoned name
    assert(Verify.census(out, Seq("aa_ok", "zz_poison"), spark.sessionState.newHadoopConf()) == Seq("zz_poison"))
    // and the artifact file round-trips as JSON the driver could read
    Verify.writeJsonMap(s"$out/failures.json", failures)
    val txt = Files.readString(Paths.get(s"$out/failures.json"))
    assert(txt.contains("zz_poison") && txt.contains("injected poison"))
  }

  test("transient failure is retried once with a fresh plan and recovers") {
    val out = tmpDir()
    val calls = new AtomicInteger(0)
    val flaky = "ab_flaky" -> ((s: SparkSession, _: String) => {
      if (calls.getAndIncrement() == 0)
        throw new IllegalStateException("block cannot be recomputed after unpersisting")
      import s.implicits._
      Seq((7L, "ok")).toDF("id", "v")
    })
    val failures = Verify.runQueries(spark, Seq(flaky), "unused", out)
    assert(failures.isEmpty, s"flaky query should recover on retry: $failures")
    assert(calls.get() == 2)
    assert(Files.exists(Paths.get(s"$out/ab_flaky/_SUCCESS")))
    assert(Verify.census(out, Seq("ab_flaky"), spark.sessionState.newHadoopConf()).isEmpty)
  }

  test("deterministic failure (DecimalType guard) fails both attempts and is recorded") {
    val out = tmpDir()
    val dec = "ac_decimal" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      Seq(1L).toDF("id").select(col("id").cast("decimal(10,2)").as("d"))
    })
    val failures = Verify.runQueries(spark, Seq(dec), "unused", out)
    assert(failures.contains("ac_decimal"))
    assert(failures("ac_decimal").contains("DecimalType"))
    assert(Verify.census(out, Seq("ac_decimal"), spark.sessionState.newHadoopConf()) == Seq("ac_decimal"))
  }
}
