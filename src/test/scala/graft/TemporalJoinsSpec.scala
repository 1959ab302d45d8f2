package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** Semantics pins for the temporal joins: as-of tie/miss behavior, interval
  * boundary inclusivity, exactly-once pair emission across bins, and the
  * plan shapes that make both operators scale-safe (single hash exchange
  * for as-of; no BroadcastNestedLoopJoin for the binned range join).
  */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def versions() = {
    import spark.implicits._
    Seq(
      (1L, 10L, "a"), // key 1: versions at 10, 20
      (1L, 20L, "b"),
      (2L, 15L, "x")  // key 2: one version
    ).toDF("k", "vts", "payload")
  }

  private def events() = {
    import spark.implicits._
    Seq(
      (100L, 1L, 5L),  // before any version -> null
      (101L, 1L, 10L), // exactly at version ts -> "a" (<= semantics)
      (102L, 1L, 15L), // between -> "a"
      (103L, 1L, 20L), // at second -> "b"
      (104L, 1L, 99L), // far after -> "b" (wide gap carries forward)
      (105L, 2L, 14L), // before key-2's only version -> null
      (106L, 2L, 15L), // at it -> "x"
      (107L, 3L, 50L)  // key with no versions at all -> null
    ).toDF("eid", "k", "ets")
  }

  test("asofJoin: <= tie semantics, null before first version, gap carry-forward") {
    val out = TemporalJoins.asofJoin(events(), "ets", versions(), "vts",
      Seq("k"), Seq("payload"))
      .select("eid", "payload").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out === Map(100L -> null, 101L -> "a", 102L -> "a", 103L -> "b",
      104L -> "b", 105L -> null, 106L -> "x", 107L -> null))
  }

  test("asofJoin: a right row with null ord is never a valid version") {
    import spark.implicits._
    val right = Seq((1L, Option.empty[Long], "ghost"), (1L, Some(10L), "a"))
      .toDF("k", "vts", "payload")
    val out = TemporalJoins.asofJoin(
      Seq((100L, 1L, 5L), (101L, 1L, 12L)).toDF("eid", "k", "ets"), "ets",
      right, "vts", Seq("k"), Seq("payload"))
      .select("eid", "payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    // pre-version event gets null (NOT the null-ord row's payload)
    assert(out === Map(100L -> null, 101L -> "a"))
  }

  test("asofJoin: preserves all left columns and attaches multi-column payload") {
    import spark.implicits._
    val right = Seq((1L, 10L, "a", 1.5)).toDF("k", "vts", "s", "v")
    val left = Seq((100L, 1L, 12L, "keepme")).toDF("eid", "k", "ets", "note")
    val row = TemporalJoins.asofJoin(left, "ets", right, "vts",
      Seq("k"), Seq("s", "v")).collect().head
    val m = row.getValuesMap[Any](Seq("eid", "k", "ets", "note", "s", "v"))
    assert(m("eid") == 100L && m("note") == "keepme" && m("s") == "a" && m("v") == 1.5)
  }

  test("asofJoin plan: exactly one hash exchange on the key, no join operator") {
    val plan = TemporalJoins.asofJoin(events(), "ets", versions(), "vts",
      Seq("k"), Seq("payload")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"union-merge as-of must not plan a join:\n$plan")
  }

  test("rangeJoinBinned: boundary-inclusive, exactly-once pairs across many bins") {
    import spark.implicits._
    // interval [100, 300] spans 21 bins at width 10 — the point at 250
    // still pairs with it exactly once; boundaries 100 and 300 included,
    // 99 and 301 excluded; other-key point excluded
    val iv = Seq((1L, 10L, 100L, 300L), (2L, 11L, 100L, 300L))
      .toDF("k", "iid", "lo", "hi")
    val pts = Seq((1L, 1000L, 99L), (1L, 1001L, 100L), (1L, 1002L, 250L),
      (1L, 1003L, 300L), (1L, 1004L, 301L), (2L, 1005L, 250L))
      .toDF("k", "pid", "pts")
    val out = TemporalJoins.rangeJoinBinned(pts, "pts", iv, "lo", "hi",
      Seq("k"), 10L)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((10L, 1001L), (10L, 1002L), (10L, 1003L), (11L, 1005L)))
  }

  test("rangeJoinBinned: overlapping intervals each emit their own pair") {
    import spark.implicits._
    val iv = Seq((1L, 20L, 0L, 100L), (1L, 21L, 50L, 150L)).toDF("k", "iid", "lo", "hi")
    val pts = Seq((1L, 2000L, 75L)).toDF("k", "pid", "pts")
    val out = TemporalJoins.rangeJoinBinned(pts, "pts", iv, "lo", "hi",
      Seq("k"), 100L).select("iid").as[Long].collect().sorted.toSeq
    assert(out === Seq(20L, 21L))
  }

  test("asofJoin matches brute force on randomized keys/timestamps") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rightRaw = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(9999).toLong))
    // unique per (key, ts) — the operator's documented precondition
    val right = rightRaw.groupBy(r => (r._1, r._2))
      .map { case ((k, ts), rows) => (k, ts, rows.map(_._3).max) }.toSeq
    val left = (1 to 500).map(i =>
      (i.toLong, rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong))
    val got = TemporalJoins.asofJoin(left.toDF("eid", "k", "ets"), "ets",
      right.toDF("k", "vts", "p"), "vts", Seq("k"), Seq("p"))
      .select("eid", "p").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expected = left.map { case (eid, k, ets) =>
      val c = right.filter(r => r._1 == k && r._2 <= ets)
      eid -> (if (c.isEmpty) None else Some(c.maxBy(_._2)._3))
    }.toMap
    assert(got === expected)
  }

  test("rangeJoinBinned matches brute force on randomized intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val iv = (1 to 200).map { i =>
      val lo = rnd.nextInt(2000).toLong
      (rnd.nextInt(10).toLong, i.toLong, lo, lo + rnd.nextInt(300).toLong)
    }
    val pts = (1 to 400).map(i =>
      (rnd.nextInt(10).toLong, (1000 + i).toLong, rnd.nextInt(2300).toLong))
    val got = TemporalJoins.rangeJoinBinned(pts.toDF("k", "pid", "pts"),
      "pts", iv.toDF("k", "iid", "lo", "hi"), "lo", "hi", Seq("k"), 128L)
      .select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = (for {
      (ik, iid, lo, hi) <- iv
      (pk, pid, p) <- pts
      if ik == pk && p >= lo && p <= hi
    } yield (iid, pid)).sorted
    assert(got === expected)
  }

  test("rangeJoinBinned plan: equi-join, never BroadcastNestedLoop") {
    import spark.implicits._
    val iv = Seq((1L, 10L, 100L, 300L)).toDF("k", "iid", "lo", "hi")
    val pts = Seq((1L, 1000L, 250L)).toDF("k", "pid", "pts")
    val plan = TemporalJoins.rangeJoinBinned(pts, "pts", iv, "lo", "hi",
      Seq("k"), 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("Join"), plan)
  }
}
