package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Dedup, Layout, Scd, Skew}

/** Degenerate-input behavior of the round-7 operators: empty frames,
  * single rows, and all-duplicate inputs must return well-formed (usually
  * empty) results, never throw — a 100 TB pipeline hits every one of these
  * (an empty partition day, a single-user slice, a fully-deduped batch).
  */
class EdgeCasesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def emptyEvents = {
    import spark.implicits._
    Seq.empty[(Long, Timestamp, Long, Double)]
      .toDF("user_id", "ts", "event_id", "value")
  }

  test("sessionize/cohort/transition on empty input: empty, schema intact") {
    val s = Analytics.sessionize(emptyEvents, "user_id", "ts", "event_id",
      "value", 1800)
    assert(s.count() == 0)
    assert(s.columns.toSeq == Seq("user_id", "session_id", "n_events",
      "session_start", "session_end", "duration_s", "total_value"))
    assert(Analytics.cohortRetention(emptyEvents, "user_id", "ts").count() == 0)
  }

  test("funnel on empty input: all steps present with zero users, conv NULL") {
    import spark.implicits._
    val f = Analytics.funnel(
      Seq.empty[(Long, String, Timestamp)].toDF("user_id", "event_type", "ts"),
      Seq("A", "B"), "event_type", "user_id", "ts").collect()
    assert(f.map(_.getLong(2)).toSeq == Seq(0L, 0L))
    assert(f.forall(_.isNullAt(3)), "0/0 conversion must be NULL, not a crash")
  }

  test("single-user single-event: one session, one cohort cell, no transitions") {
    import spark.implicits._
    val one = Seq((1L, ts("2024-01-01 10:00:00"), 1L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val s = Analytics.sessionize(one, "user_id", "ts", "event_id", "value", 1800)
      .collect()
    assert(s.length == 1 && s.head.getLong(2) == 1L && s.head.getLong(5) == 0L)
    val c = Analytics.cohortRetention(one, "user_id", "ts").collect()
    assert(c.length == 1 && c.head.getInt(1) == 0 && c.head.getDouble(4) == 100.0)
  }

  test("upsert: empty source keeps target verbatim; empty target inserts all") {
    import spark.implicits._
    val t = Seq((1L, "a")).toDF("k", "v")
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val kept = Scd.upsert(t, empty, Seq("k"), Seq("v")).collect()
    assert(kept.length == 1 && kept.head.getString(2) == "keep")
    val ins = Scd.upsert(empty, t, Seq("k"), Seq("v")).collect()
    assert(ins.length == 1 && ins.head.getString(2) == "insert")
    assert(Scd.upsert(empty, empty, Seq("k"), Seq("v")).count() == 0)
  }

  test("saltedJoin/fuzzyJoin on empty sides: empty result, no crash") {
    import spark.implicits._
    val big = Seq((1L, 1.0)).toDF("k", "v")
    val emptyBig = Seq.empty[(Long, Double)].toDF("k", "v")
    val small = Seq((1L, "x")).toDF("sk", "name")
    val emptySmall = Seq.empty[(Long, String)].toDF("sk", "name")
    assert(Skew.saltedJoin(emptyBig, small, "k", "sk", 4).count() == 0)
    assert(Skew.saltedJoin(big, emptySmall, "k", "sk", 4).count() == 0)
    val probes = Seq.empty[(Long, String)].toDF("pid", "q")
    val cat = Seq((1L, "abc")).toDF("id", "name")
    assert(Dedup.fuzzyJoin(probes, cat, "pid", "q", "id", "name", 2).count() == 0)
  }

  test("fuzzyJoin: null probe strings never match (and never crash)") {
    import spark.implicits._
    val probes = Seq((1L, Option("abc")), (2L, None: Option[String]))
      .toDF("pid", "q")
    val cat = Seq((1L, "abd")).toDF("id", "name")
    val got = Dedup.fuzzyJoin(probes, cat, "pid", "q", "id", "name", 2)
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
  }

  test("upsert: null keys match null-safely — replays are noops, not inserts") {
    import spark.implicits._
    val t = Seq((Option(1L), "a"), (None: Option[Long], "n")).toDF("k", "v")
    val replay = Seq((None: Option[Long], "n")).toDF("k", "v")
    val got = Scd.upsert(t, replay, Seq("k"), Seq("v")).collect()
      .map(r => Option(r.get(0)) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got.size == 2, s"null key duplicated: ${got.keySet}")
    assert(got(None) == (("n", "noop")))
    val updated = Scd.upsert(t, Seq((None: Option[Long], "n2")).toDF("k", "v"),
      Seq("k"), Seq("v")).collect()
      .map(r => Option(r.get(0)) -> r.getString(2)).toMap
    assert(updated(None) == "update")
  }

  test("zorderStats: full-64-bit key spans don't overflow (exact decimal scaling)") {
    import spark.implicits._
    // span ≈ 9.2e18 — a long (c-lo)*mask multiply would wrap negative
    val lo = Long.MinValue + 10
    val hi = Long.MaxValue - 10
    val df = Seq((lo, 0L), (hi, 100L), (0L, 50L), (hi / 2, 25L)).toDF("x", "y")
    val st = Layout.zorderStats(df, "x", "y", bits = 15, bucketBits = 4).collect()
    assert(st.map(_.getLong(1)).sum == 4L)
    assert(st.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 16),
      s"bucket out of range: ${st.map(_.getLong(0)).toSeq}")
    // the two extremes land in the first and last code regions
    val bMin = st.filter(_.getLong(2) == lo).head.getLong(0)
    val bMax = st.filter(_.getLong(3) == hi).head.getLong(0)
    assert(bMin == 0 && bMax == 15, s"extremes at $bMin/$bMax")
  }

  test("zorderStats: empty input and constant columns degrade to empty / one bucket") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(Layout.zorderStats(empty, "x", "y", 8, 4).count() == 0)
    // constant dimensions: every row scales to cell 0 -> single bucket
    val const = (1 to 10).map(_ => (5L, 5L)).toDF("x", "y")
    val st = Layout.zorderStats(const, "x", "y", 8, 4).collect()
    assert(st.length == 1 && st.head.getLong(1) == 10L)
  }

  test("classifier fit on empty frame fails loudly (no NPE on null sums)") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Double)].toDF("y", "x")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Classifier.fitHardSigmoid(
        empty, col("y"), Seq(col("x")), lr = 1.0, iters = 1)
    }
    assert(e.getMessage.contains("empty frame"))
  }

  test("containmentPairs: empty corpus and sub-shingle docs yield empty, schema intact") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = Dedup.containmentPairs(empty, "doc_id", "text", lit(1))
    assert(r.count() == 0)
    assert(r.columns.toSeq == Seq("id_a", "id_b", "inter", "sz_a", "cont_micro"))
    // 4-word docs fall back to one whole-doc gram (the ShingleKernel
    // semantic): identical short docs are full mutual containment dups
    val short = Seq((1L, "only four words here"), (2L, "only four words here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(short, "doc_id", "text", lit(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toList.sorted
    assert(pairs == List((1L, 2L, 1000000L), (2L, 1L, 1000000L)))
  }

  test("rrfFuse with a single ranker reproduces its ranking order") {
    import spark.implicits._
    val r1 = Seq((0L, 5L, 1), (0L, 9L, 2)).toDF("query_id", "doc_id", "rank")
    val got = graft.operators.Retrieval.rrfFuse(Seq(r1), kConst = 60, k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(4))).toList
    assert(got == List((5L, 1), (9L, 2)))
  }

  test("dsirLogWeights: empty target slice still yields finite weights (add-1 smoothing)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .dsirLogWeights(docs, "doc_id", "text", lit(false))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == 2)
    // with no target rows every bucket has ct=0: log(1/256) − log((cr+1)/(nr+256))
    // is finite and NEGATIVE for observed features
    assert(got.forall(_._2 < 0L), s"weights must be finite negatives: ${got.toList}")
  }
}
