package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Error-bound and identity tests for the approximate sketches — the
  * correctness signal for operators whose output is approximate by design
  * (rows-only in the driver gate, like language ID).
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** events carries TIMESTAMP(NANOS) — needs the nanosAsLong session conf. */
  private def events() = {
    SparkEntry.configure(spark)
    spark.read.parquet("/root/testdata/sf0.01/events.parquet")
  }

  test("CMS estimate never undercounts and equals exact counts when buckets don't collide") {
    import spark.implicits._
    // 20 distinct terms into 4×1024 cells: collisions essentially impossible,
    // so every estimate must be EXACT; with width 2 (forced collisions) the
    // estimate must only ever overcount.
    val docs = (0 until 100).map { i =>
      (i.toLong, (0 to i % 20).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val wide = Sketches.cmsHeavyHitters(docs, "text", threshold = 1L,
      depth = 4, width = 1024).collect()
    assert(wide.nonEmpty)
    wide.foreach { r =>
      assert(r.getLong(2) == r.getLong(1),
        s"collision-free sketch must be exact: ${r.mkString(",")}")
      assert(r.getBoolean(3))
    }
    val narrow = Sketches.cmsHeavyHitters(docs, "text", threshold = 1L,
      depth = 2, width = 2).collect()
    narrow.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted under forced collisions: ${r.mkString(",")}")
    }
  }

  test("cmsCells total mass equals the token count in every row (depth-wise conservation)") {
    import spark.implicits._
    val terms = (0 until 500).map(i => s"w${i % 37}").toDF("term")
    val cells = Sketches.cmsCells(terms, "term", depth = 3, width = 64)
      .groupBy("j").agg(sum("cell").as("mass")).collect()
    assert(cells.length == 3)
    cells.foreach(r => assert(r.getLong(1) == 500L,
      s"row ${r.getInt(0)} mass ${r.getLong(1)} != 500"))
  }

  test("HLL distinct within 5% of exact on the events table") {
    val ev = events()
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("ex"))
    val approx = Sketches.hllDistinct(ev, "event_type", "user_id")
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05,
        s"${r.getString(0)}: approx $a vs exact $e off by ${math.abs(a - e) / e}")
    }
  }

  test("approx quantiles within 2% rank error of exact percentiles") {
    val ev = events()
    val approx = Sketches.approxQuantiles(ev, "event_type", "value",
      Seq(0.5, 0.9, 0.99), accuracy = 10000).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // rank error bound: the value returned for probability p must sit at a
    // true rank within p ± 1/accuracy (GK guarantee); check via the CDF
    val byType = ev.select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for ((t, qs) <- approx; (p, q) <- Seq(0.5, 0.9, 0.99).zip(qs)) {
      val vals = byType(t)
      val rank = vals.count(_ <= q).toDouble / vals.length
      assert(math.abs(rank - p) <= 0.02,
        s"$t p$p: returned value at true rank $rank")
    }
  }

  test("approxQuantilesAudit: heavy ties at the quantile stay within_bound (interval rank)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // 1000 rows, 500 of them the SAME value straddling every quantile —
    // count(<=q) alone would put the rank far from p*n and flag a
    // legitimate GK answer; the interval check must pass all three p's
    val df = ((1 to 250).map(i => ("g", i * 1.0)) ++
      (1 to 500).map(_ => ("g", 1000.0)) ++
      (1 to 250).map(i => ("g", 2000.0 + i))).toDF("g", "v")
    val got = Sketches.approxQuantilesAudit(df, "g", "v", Seq(0.5, 0.9, 0.99))
      .collect()
    assert(got.length == 3)
    got.foreach(r => assert(r.getBoolean(3),
      s"tie-straddled quantile flagged out of bound: $r"))
  }
}
