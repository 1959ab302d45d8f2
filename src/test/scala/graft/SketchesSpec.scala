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

  // ---- exact selection operators (countFramePicks / rankSelect) --------
  // reference: the naive full rank window both operators replace

  private def refPicks(rows: Seq[(String, Double)],
                       ps: Seq[Double]): Map[(String, Double), Double] =
    rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      ps.map { p =>
        val k = math.max(1L, math.ceil(p * sorted.size).toLong)
        (g, p) -> sorted((k - 1).toInt)
      }
    }

  /** Adversarial group shapes: singleton, pair, all-equal, heavy central
    * tie, dense duplicates, smooth, skewed sizes. */
  private def shapeRows: Seq[(String, Double)] = {
    var seed = 42L
    def nextDouble(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 11).toDouble / (1L << 53).toDouble) * 100.0
    }
    Seq(("single", Seq(7.5)),
      ("pair", Seq(1.0, 2.0)),
      ("allequal", Seq.fill(200)(3.25)),
      ("centraltie", (1 to 100).map(_ * 1.0) ++ Seq.fill(300)(50.0) ++
        (1 to 100).map(900.0 + _)),
      ("dups2dp", (1 to 2000).map(_ => math.floor(nextDouble() * 4) / 4)),
      ("smooth", (1 to 5000).map(_ => nextDouble())),
      ("tiny", Seq(9.0, 1.0, 5.0))
    ).flatMap { case (g, vs) => vs.map(v => (g, v)) }
  }

  test("countFramePicks equals the full-rank-window reference on every shape") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rows = shapeRows
    val ps = Seq(0.05, 0.5, 0.95, 1.0)
    val expected = refPicks(rows, ps)
    val counts = rows.toDF("g", "v")
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val got = Sketches.countFramePicks(counts, "g", "v", "c",
      ps.map(p => (s"p$p", (n: org.apache.spark.sql.Column) =>
        greatest(lit(1L), ceil(lit(p) * n)))))
      .collect()
    assert(got.length == rows.map(_._1).distinct.size)
    got.foreach { r =>
      val g = r.getString(0)
      ps.zipWithIndex.foreach { case (p, i) =>
        assert(r.getDouble(i + 1) == expected((g, p)),
          s"countFramePicks($g, p=$p): got ${r.getDouble(i + 1)}, " +
            s"want ${expected((g, p))}")
      }
    }
  }

  test("rankSelect equals the reference on every shape, even with a coarse sketch") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rows = shapeRows
    val ps = Seq(0.05, 0.5, 0.95, 1.0)
    val expected = refPicks(rows, ps)
    // accuracy 50 on 5000-row groups: rank error up to ~100, so the grid
    // brackets (not sketch exactness) must carry correctness
    for (accuracy <- Seq(50, 10000)) {
      val got = Sketches.rankSelect(rows.toDF("g", "v"), "g", col("v"),
        ps.map(p => (s"p$p", (n: org.apache.spark.sql.Column) =>
          greatest(lit(1L), ceil(lit(p) * n)))),
        accuracy = accuracy)
        .collect()
      assert(got.length == rows.map(_._1).distinct.size)
      got.foreach { r =>
        val g = r.getString(0)
        ps.zipWithIndex.foreach { case (p, i) =>
          assert(r.getDouble(i + 1) == expected((g, p)),
            s"rankSelect($g, p=$p, accuracy=$accuracy): " +
              s"got ${r.getDouble(i + 1)}, want ${expected((g, p))}")
        }
      }
      graft.CacheRegistry.unpersistAll(spark)
    }
  }

  test("rankSelect audit columns: __lt/__le bracket the sketch value's true rank interval") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rows = shapeRows.filter(_._1 == "centraltie")
    val got = Sketches.rankSelect(rows.toDF("g", "v"), "g", col("v"),
      Seq(("med", (n: org.apache.spark.sql.Column) =>
        greatest(lit(1L), ceil(lit(0.5) * n)))),
      accuracy = 10000, auditPs = Seq(0.5)).collect()
    assert(got.length == 1)
    val r = got.head
    val ap = r.getAs[Double]("__ap_0")
    val lt = rows.count(_._2 < ap).toLong
    val le = rows.count(_._2 <= ap).toLong
    assert(r.getAs[Long]("__lt_0") == lt && r.getAs[Long]("__le_0") == le)
    // GK bound: target rank n/2 must fall within errors of [lt+1, le]
    val n = rows.size
    assert(lt + 1 <= n / 2.0 + n / 10000.0 + 1 &&
      n / 2.0 - n / 10000.0 - 1 <= le)
    graft.CacheRegistry.unpersistAll(spark)
  }
}
