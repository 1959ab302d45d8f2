package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Layout}

/** Hand-computable cases for the event-analytics trio (sessionize, funnel,
  * cohort) and the z-order layout operator. */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("sessionize: gap splits, session numbering, span and exact totals") {
    import spark.implicits._
    val ev = Seq(
      // user 1: 3 events 10 min apart (one session), then a 2h gap
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.5),
      (1L, ts("2024-01-01 10:10:00"), 2L, 2.5),
      (1L, ts("2024-01-01 10:20:00"), 3L, 3.0),
      (1L, ts("2024-01-01 12:30:00"), 4L, 1.0),
      // user 2: exactly at the 30-min gap boundary — NOT a new session
      (2L, ts("2024-01-01 09:00:00"), 5L, 4.0),
      (2L, ts("2024-01-01 09:30:00"), 6L, 5.0),
      // ...and one second past the gap — new session
      (2L, ts("2024-01-01 10:00:01"), 7L, 6.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Analytics.sessionize(ev, "user_id", "ts", "event_id", "value", 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getTimestamp(3), r.getTimestamp(4), r.getLong(5),
          r.getDecimal(6).doubleValue()))).toMap
    assert(got.size == 4)
    assert(got((1L, 1L)) == ((3L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:20:00"), 1200L, 7.0)))
    assert(got((1L, 2L)) == ((1L, ts("2024-01-01 12:30:00"),
      ts("2024-01-01 12:30:00"), 0L, 1.0)))
    assert(got((2L, 1L)) == ((2L, ts("2024-01-01 09:00:00"),
      ts("2024-01-01 09:30:00"), 1800L, 9.0)))
    assert(got((2L, 2L)) == ((1L, ts("2024-01-01 10:00:01"),
      ts("2024-01-01 10:00:01"), 0L, 6.0)))
  }

  test("funnel: later steps only count events at/after the prior frontier") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes A→B in order
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 11:00:00")),
      // user 2 did B BEFORE their first A — must not count for step B
      (2L, "B", ts("2024-01-01 09:00:00")),
      (2L, "A", ts("2024-01-01 10:00:00")),
      // user 3's B is exactly AT their A frontier (same ts) — counts (>=)
      (3L, "A", ts("2024-01-01 08:00:00")),
      (3L, "B", ts("2024-01-01 08:00:00")),
      // user 4 only does B — never enters the funnel
      (4L, "B", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(ev, Seq("A", "B"), "event_type", "user_id", "ts")
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1) == (("A", 3L, 100.0)))     // users 1, 2, 3
    assert(got(2) == (("B", 2L, 66.6667)))   // users 1 and 3; NOT 2 or 4
  }

  test("cohort retention: weekly offsets against the cohort's own size") {
    import spark.implicits._
    // Mondays: 2024-01-01, 2024-01-08, 2024-01-15
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), // cohort w0
      (1L, ts("2024-01-09 10:00:00")), // active w1
      (2L, ts("2024-01-03 10:00:00")), // cohort w0, never returns
      (3L, ts("2024-01-10 10:00:00")), // cohort w1
      (3L, ts("2024-01-16 10:00:00")), // active w2 (offset 1)
      (3L, ts("2024-01-17 23:00:00"))  // same week — dedup'd
    ).toDF("user_id", "ts")
    val got = Analytics.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(("2024-01-01", 0)) == ((2L, 2L, 100.0)))
    assert(got(("2024-01-01", 1)) == ((1L, 2L, 50.0)))
    assert(got(("2024-01-08", 0)) == ((1L, 1L, 100.0)))
    assert(got(("2024-01-08", 1)) == ((1L, 1L, 100.0)))
    assert(got.size == 4)
  }

  test("sessionize matches a brute-force per-user fold on randomized event streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val gap = 600L
    val rows = (0 until 2000).map { i =>
      val u = rnd.nextInt(20).toLong
      val t = new Timestamp(1704067200000L + rnd.nextInt(200000) * 1000L)
      (u, t, i.toLong, rnd.nextInt(100) / 10.0)
    }
    val got = Analytics.sessionize(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value", gap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getTimestamp(3), r.getTimestamp(4), r.getLong(5))))
      .toMap
    // brute force: sort each user's events, split on gap, roll up
    val expect = rows.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._3))
      val sessions = sorted.foldLeft(List.empty[List[(Long, Timestamp, Long, Double)]]) {
        case (acc, e) => acc match {
          case cur :: rest if (e._2.getTime - cur.head._2.getTime) <= gap * 1000 =>
            (e :: cur) :: rest // cur.head is the session's LAST event (prepend order)
          case _ => List(e) :: acc
        }
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        (u, (i + 1).toLong) ->
          ((s.size.toLong, s.head._2, s.last._2,
            (s.last._2.getTime - s.head._2.getTime) / 1000L))
      }
    }
    assert(got.size == expect.size, s"${got.size} vs ${expect.size} sessions")
    expect.foreach { case (k, v) => assert(got(k) == v, s"session $k") }
  }

  test("funnel matches brute force on randomized step sequences") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val steps = Seq("A", "B", "C")
    val rows = (0 until 1500).map { i =>
      (rnd.nextInt(60).toLong, steps(rnd.nextInt(3)),
        new Timestamp(1704067200000L + rnd.nextInt(100000) * 1000L), i.toLong)
    }
    val got = Analytics.funnel(rows.toDF("user_id", "event_type", "ts", "event_id"),
        steps, "event_type", "user_id", "ts")
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // brute force frontier walk per user
    val byUser = rows.groupBy(_._1)
    var frontier: Map[Long, Long] = byUser.flatMap { case (u, evs) =>
      val as = evs.filter(_._2 == "A").map(_._3.getTime)
      if (as.nonEmpty) Some(u -> as.min) else None
    }
    val counts = scala.collection.mutable.ArrayBuffer(frontier.size.toLong)
    steps.tail.foreach { st =>
      frontier = frontier.flatMap { case (u, t0) =>
        val nxt = byUser.getOrElse(u, Nil)
          .filter(e => e._2 == st && e._3.getTime >= t0).map(_._3.getTime)
        if (nxt.nonEmpty) Some(u -> nxt.min) else None
      }
      counts += frontier.size.toLong
    }
    assert(got == counts.zipWithIndex.map { case (n, i) => (i + 1) -> n }.toMap)
  }

  test("zorderCode: interleaving identities and locality ordering") {
    import spark.implicits._
    val df = Seq((5L, 0L), (0L, 5L), (3L, 3L), (7L, 7L))
      .toDF("x", "y")
      .withColumn("z", Layout.zorderCode(col("x"), col("y"), 3))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // x occupies even bit positions, y odd: z(x,0) spreads x's bits,
    // z(0,y) = 2 * z(y,0)
    assert(z((5L, 0L)) == 0x11L)          // 101 -> 1_0_1 at bits 4,2,0
    assert(z((0L, 5L)) == 0x22L)          // shifted one left
    assert(z((3L, 3L)) == 0xfL)           // 11 interleaved with 11
    assert(z((7L, 7L)) == 0x3fL)
  }

  test("zorderStats: buckets cover narrow rectangles vs the global span") {
    import spark.implicits._
    // 64×64 grid, every cell once: a z-ordered 16-bucket split must give
    // each bucket a rectangle far smaller than the full key square
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val st = Layout.zorderStats(grid, "x", "y", bits = 6, bucketBits = 4)
      .collect()
    assert(st.length == 16)
    assert(st.map(_.getLong(1)).sum == 4096L)
    st.foreach { r =>
      val (xs, ys) = (r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4))
      // each of the 16 buckets is a 16×16 quadrant of the 64×64 space
      assert(xs <= 15 && ys <= 15, s"bucket ${r.getLong(0)} spans $xs x $ys")
    }
  }
}
