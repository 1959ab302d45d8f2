package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profile, Web}

/** Hand-computable cases for URL canonicalization and the KS drift
  * statistic. */
class WebSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Web.canonicalUrl(col("u"))).collect().map(_.getString(0)).toSeq
  }

  test("canonicalUrl: scheme/host case, www, default ports") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/a",
      "https://example.com:443/a",
      "https://example.com:80/a", // :80 NOT default for https — kept
      "http://example.com:8080/a",
      "http://cdn.example.com/a") == Seq(
      "http://example.com/a",
      "https://example.com/a",
      "https://example.com:80/a",
      "http://example.com:8080/a",
      "http://cdn.example.com/a"))
  }

  test("canonicalUrl: fragments, utm params, separator repair") {
    assert(canon(
      "http://e.com/p#frag",
      "http://e.com/p?utm_source=x",
      "http://e.com/p?utm_source=x&id=5",
      "http://e.com/p?id=5&utm_campaign=y",
      "http://e.com/p?a=1&utm_medium=z&b=2",
      "http://e.com/p?id=5#frag") == Seq(
      "http://e.com/p",
      "http://e.com/p",
      "http://e.com/p?id=5",
      "http://e.com/p?id=5",
      "http://e.com/p?a=1&b=2",
      "http://e.com/p?id=5"))
  }

  test("canonicalUrl: utm removal is case-insensitive, boundary-anchored, " +
    "and never touches the path") {
    assert(canon(
      "http://e.com/p?UTM_SOURCE=feed",        // upper-case tracking param
      "http://e.com/p?id=5&Utm_Campaign=y",    // mixed-case, non-leading
      "http://e.com/p?xutm_source=1",          // param NAME merely contains utm_
      "http://e.com/utm_guide=intro/start",    // utm_ inside a PATH segment
      "http://e.com/p?autumn_sale=1") == Seq(  // near-miss param name
      "http://e.com/p",
      "http://e.com/p?id=5",
      "http://e.com/p?xutm_source=1",
      "http://e.com/utm_guide=intro/start",
      "http://e.com/p?autumn_sale=1"))
  }

  test("canonicalUrl: trailing slashes and empty paths") {
    assert(canon(
      "http://e.com",
      "http://e.com/",
      "http://e.com/a/b/",
      "http://e.com/a//",
      "http://e.com/?id=1") == Seq(
      "http://e.com/",
      "http://e.com/",
      "http://e.com/a/b",
      "http://e.com/a",
      "http://e.com/?id=1"))
  }

  test("canonicalUrl is idempotent over the messy-URL space (a canonical " +
    "key that re-canonicalizes differently breaks incremental dedup)") {
    import spark.implicits._
    // the full cross product of the synthesis dimensions, plus hand edges
    val urls = (for {
      scheme <- Seq("http", "HTTPS")
      www <- Seq("", "WWW.")
      port <- Seq("", ":80", ":443", ":8080")
      path <- Seq("", "/", "/docs/3", "/docs/3/")
      query <- Seq("", "?utm_source=x", "?id=5&utm_campaign=y", "?a=1&b=2")
      frag <- Seq("", "#sec")
    } yield s"$scheme://${www}site.co.br$port$path$query$frag") ++
      Seq("http://e.com/p?xutm_source=1", "http://e.com/utm_guide=x/y")
    val once = urls.toDF("u").select(Web.canonicalUrl(col("u")).as("c"))
    val twice = once.select(col("c"), Web.canonicalUrl(col("c")).as("cc"))
      .filter(col("c") =!= col("cc")).collect()
    assert(twice.isEmpty,
      s"non-idempotent: ${twice.take(5).map(r => r.getString(0) + " -> " + r.getString(1)).mkString("; ")}")
  }

  test("registeredDomain: two-label public suffixes from the fixture list") {
    import spark.implicits._
    val got = Seq("a.b.site.com", "cdn.site.co.br", "site.co.uk", "x.site.org",
      "shop.example.com.au", "news.example.co.jp", "gov.uk", "localhost")
      .toDF("h").select(Web.registeredDomain(col("h"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("site.com", "site.co.br", "site.co.uk", "site.org",
      "example.com.au", "example.co.jp",
      // bare suffix host: no third label to take — falls back to itself
      "gov.uk",
      // single-label host: no registered domain
      ""))
    // a custom rule set overrides the default snapshot
    val custom = Seq("cdn.site.co.br").toDF("h")
      .select(Web.registeredDomain(col("h"),
        Web.PslRules(Seq("x.y"), Nil, Nil, Nil, Nil, Nil)))
      .collect().map(_.getString(0))
    assert(custom.toSeq == Seq("co.br"))
  }

  test("registeredDomain: PSL wildcard and exception rule semantics") {
    import spark.implicits._
    val cases = Seq(
      // *.ck: any 2-label name under ck is a public suffix
      "a.b.foo.ck" -> "b.foo.ck",
      "b.foo.ck" -> "b.foo.ck",
      // bare wildcard-made suffix: falls back to itself
      "foo.ck" -> "foo.ck",
      // !www.ck beats *.ck: www.ck IS the registered domain
      "www.ck" -> "www.ck",
      "a.www.ck" -> "www.ck",
      "a.b.www.ck" -> "www.ck",
      // *.kawasaki.jp: 3-label wildcard
      "a.ward.kawasaki.jp" -> "a.ward.kawasaki.jp",
      "deep.a.ward.kawasaki.jp" -> "a.ward.kawasaki.jp",
      "ward.kawasaki.jp" -> "ward.kawasaki.jp", // bare suffix → itself
      // !city.kawasaki.jp beats the wildcard
      "city.kawasaki.jp" -> "city.kawasaki.jp",
      "sub.city.kawasaki.jp" -> "city.kawasaki.jp",
      // host equal to a wildcard BASE is not matched by the wildcard —
      // default rule applies
      "kawasaki.jp" -> "kawasaki.jp",
      // 3-label literal rules: the US state trees
      "school.k12.ma.us" -> "school.k12.ma.us",
      "www.school.k12.ma.us" -> "school.k12.ma.us",
      "k12.ma.us" -> "k12.ma.us", // bare literal suffix → itself
      // single-label hosts under a *.X TLD have no registered domain
      "ck" -> "",
      // private-section literal rules resolve like any 2-label rule
      "user.github.io" -> "user.github.io",
      "deep.user.github.io" -> "user.github.io",
      "bucket.s3.amazonaws.com" -> "bucket.s3.amazonaws.com")
    val got = cases.map(_._1).toDF("h")
      .select(Web.registeredDomain(col("h"))).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (h, want)) =>
      assert(g == want, s"host $h: got $g, want $want")
    }
  }

  test("registeredDomain: 4-label literal and wildcard rules (pvt.k12.ma.us, " +
    "*.compute.amazonaws.com) beat the shorter rules") {
    import spark.implicits._
    val cases = Seq(
      // pvt.k12.ma.us is a 4-label LITERAL rule — it must win over the
      // 3-label k12.ma.us rule that is also in the snapshot
      "school.pvt.k12.ma.us" -> "school.pvt.k12.ma.us",
      "www.school.pvt.k12.ma.us" -> "school.pvt.k12.ma.us",
      "pvt.k12.ma.us" -> "pvt.k12.ma.us", // bare literal suffix → itself
      // a k12.ma.us host NOT under pvt. still resolves by the 3-label rule
      "other.k12.ma.us" -> "other.k12.ma.us",
      // *.compute.amazonaws.com: any 4-label name under the base is a
      // public suffix; registered domain is 5 labels
      "vm.eu1.compute.amazonaws.com" -> "vm.eu1.compute.amazonaws.com",
      "x.vm.eu1.compute.amazonaws.com" -> "vm.eu1.compute.amazonaws.com",
      // bare wildcard-made suffix: falls back to itself
      "eu1.compute.amazonaws.com" -> "eu1.compute.amazonaws.com",
      // host equal to the wildcard BASE is not matched by the wildcard —
      // default 'com' rule applies
      "compute.amazonaws.com" -> "amazonaws.com")
    val got = cases.map(_._1).toDF("h")
      .select(Web.registeredDomain(col("h"))).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (h, want)) =>
      assert(g == want, s"host $h: got $g, want $want")
    }
  }

  test("PSL snapshot provenance: every rule family is populated and resolves " +
    "per the published PSL algorithm (snapshot edits cannot silently drop a family)") {
    import spark.implicits._
    val r = Web.publicSuffixRules
    // one representative rule per family, taken FROM the parsed snapshot
    // (not hard-coded hosts), so the test follows snapshot refreshes: a
    // family that parses empty, or whose rules stop resolving, fails here
    // with the family name
    val families: Seq[(String, Seq[String], String => (String, String))] = Seq(
      // literal rule S: host x.S → registered domain x.S
      ("lit2", r.lit2, s => (s"example.$s", s"example.$s")),
      ("lit3", r.lit3, s => (s"example.$s", s"example.$s")),
      ("lit4", r.lit4, s => (s"example.$s", s"example.$s")),
      // wildcard *.B: host x.y.B → suffix is y.B, registered domain x.y.B
      ("wild2", r.wild2, b => (s"example.sub.$b", s"example.sub.$b")),
      ("wild3", r.wild3, b => (s"example.sub.$b", s"example.sub.$b")),
      ("wild4", r.wild4, b => (s"example.sub.$b", s"example.sub.$b")),
      // exception !E under a sibling wildcard: any host under E → E itself
      ("exc2", r.exc2, e => (s"deep.$e", e)),
      ("exc3", r.exc3, e => (s"deep.$e", e)))
    families.foreach { case (name, rules, mk) =>
      assert(rules.nonEmpty, s"snapshot family $name parsed EMPTY")
      val (host, want) = mk(rules.head)
      val got = Seq(host).toDF("h")
        .select(Web.registeredDomain(col("h"))).collect().head.getString(0)
      assert(got == want, s"family $name (rule '${rules.head}'): " +
        s"host $host resolved to '$got', want '$want'")
      // and the family's suffix is a true public suffix: the bare
      // registrable form one label up resolves to itself
      val bare = want.split("\\.", 2) match { case Array(_, rest) => rest case _ => want }
      if (bare.contains('.')) {
        val gotBare = Seq(want).toDF("h")
          .select(Web.registeredDomain(col("h"))).collect().head.getString(0)
        assert(gotBare == want,
          s"family $name: registrable '$want' must be its own registered domain, got '$gotBare'")
      }
    }
  }

  test("registeredDomain plan stays Expand-free and UDF-free") {
    import spark.implicits._
    val plan = Seq("a.b.c").toDF("h")
      .select(Web.registeredDomain(col("h")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "PSL lookup must not Expand")
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("ScalaUDF"), "PSL lookup must stay codegen")
  }

  test("ksDrift: hand-computed two-sample statistic") {
    import spark.implicits._
    // A = {0.10, 0.20, 0.30}, B = {0.30, 0.40} at 10 bins/unit:
    // bins 1,2,3 vs 3,4. ECDF gaps (×nA·nB=6): bin1 |1·2−0·3|=2,
    // bin2 |2·2−0·3|=4, bin3 |3·2−1·3|=3, bin4 |3·2−2·3|=0 → sup 4 at bin 2.
    val df = Seq(("a", 0.10), ("a", 0.20), ("a", 0.30), ("b", 0.30), ("b", 0.40))
      .toDF("g", "v")
    val r = Profile.ksDrift(df, "v", "g", "a", "b", binsPerUnit = 10).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getAs[Long]("n_a"), row.getAs[Long]("n_b")) == ((3L, 2L)))
    assert(row.getAs[Long]("ks_num") == 4L)
    assert(row.getAs[Long]("bin_at_max") == 2L)
    assert(row.getAs[Long]("ks_e6") == 666666L) // 4e6 // 6
    assert(row.getAs[Boolean]("valid"))
  }

  test("histDriftWindows: hand-computed total-variation per window, " +
    "reference-only bins folded closed-form") {
    import spark.implicits._
    // reference: bins 1:1, 2:2, 3:1 (refTot 4)
    val ref = Seq(0.1, 0.2, 0.2, 0.3).map(v => ("r", v)).toDF("g", "v")
    // window 0: all mass on bin 1 → TV vs ref = 0.75;
    // window 100: all mass on bin 9 (disjoint) → TV = 1.0
    val mon = Seq((10L, 0.1), (20L, 0.1), (150L, 0.9))
      .toDF("ts_s", "v").withColumn("ts", col("ts_s").cast("timestamp"))
    val got = Profile.histDriftWindows(mon, ref, "v", "ts",
        windowSeconds = 100, binsPerUnit = 10)
      .orderBy("win_start").collect()
    assert(got.length == 2)
    assert((got(0).getAs[Long]("win_start"), got(0).getAs[Long]("n"),
      got(0).getAs[Long]("drift_num"), got(0).getAs[Long]("tv_e6")) ==
      ((0L, 2L, 12L, 750000L)))
    assert((got(1).getAs[Long]("win_start"), got(1).getAs[Long]("n"),
      got(1).getAs[Long]("drift_num"), got(1).getAs[Long]("tv_e6")) ==
      ((100L, 1L, 8L, 1000000L)))
    assert(got.forall(_.getAs[Boolean]("valid")))
  }

  test("histDriftWindows: an empty reference flags valid=false instead of " +
    "going silently blind") {
    import spark.implicits._
    val mon = Seq((10L, 0.1)).toDF("ts_s", "v")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val emptyRef = Seq.empty[(String, Double)].toDF("g", "v")
    val r = Profile.histDriftWindows(mon, emptyRef, "v", "ts", 100, 10)
      .collect().head
    assert(!r.getAs[Boolean]("valid"))
    assert(r.isNullAt(r.fieldIndex("drift_num"))) // NULL, never a fake 0
  }

  test("ksDrift: a missing comparison group flags valid=false instead of " +
    "reading as zero drift") {
    import spark.implicits._
    val df = Seq(("a", 0.10), ("a", 0.20)).toDF("g", "v") // no 'b' rows at all
    val r = Profile.ksDrift(df, "v", "g", "a", "b", binsPerUnit = 10).collect().head
    assert(!r.getAs[Boolean]("valid"))
    assert(r.getAs[Long]("ks_num") == 0L) // the degenerate value a gate must not trust
    assert(r.isNullAt(r.fieldIndex("ks_e6"))) // 0-division → NULL, not 0
  }

  test("charLnSumE8 kernel: matches the reference histogram fold (ASCII + unicode)") {
    import spark.implicits._
    def ref(s: String): Long =
      s.codePoints().toArray.groupBy(identity).values
        .map(g => g.length.toLong * Math.round(Math.log(g.length.toDouble) * 1e8))
        .sum
    val cases = Seq("", "a", "aaaa", "abab", "hello world",
      "the quick brown fox jumps over the lazy dog",
      "acentuação çãõ üé", "日本語テキスト 日本", "mixed ascii ação 日本")
    val got = cases.toDF("t")
      .select(graft.plans.CharLnSumE8Expr(col("t"))).collect().map(_.getLong(0))
    assert(got.toSeq == cases.map(ref),
      s"kernel/reference divergence: ${cases.zip(got).zip(cases.map(ref))}")
    // single-char docs: n·ln(n) − S is exactly 0 (entropy 0, no drift from
    // the quantization)
    assert(ref("aaaa") == 4L * Math.round(Math.log(4.0) * 1e8))
  }

  test("ksDrift: identical samples have zero drift") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val r = Profile.ksDrift(df, "v", "g", "a", "b", binsPerUnit = 100).collect().head
    assert(r.getAs[Long]("ks_num") == 0L)
    assert(r.getAs[Long]("ks_e6") == 0L)
  }

  test("ksDrift: BOTH groups absent still yields exactly one valid=false row " +
    "(admission gates always have a flag to read)") {
    import spark.implicits._
    val df = Seq(("x", 1.0), ("y", 2.0)).toDF("g", "v") // neither 'a' nor 'b'
    val rows = Profile.ksDrift(df, "v", "g", "a", "b", binsPerUnit = 10).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(!r.getAs[Boolean]("valid"))
    assert(r.getAs[Long]("n_a") == 0L && r.getAs[Long]("n_b") == 0L)
    assert(r.isNullAt(r.fieldIndex("ks_e6")))
    // and the fallback never shadows a real row
    val real = Profile.ksDrift(
      Seq(("a", 1.0), ("b", 5.0)).toDF("g", "v"), "v", "g", "a", "b", 10)
      .collect()
    assert(real.length == 1 && real.head.getAs[Boolean]("valid"))
    assert(real.head.getAs[Long]("ks_num") == 1L)
  }

  private def ranksOf(edges: Seq[(Long, Long)], nodes: Seq[Long],
                      iters: Int, parts: Int = 3): Map[Long, Long] = {
    import spark.implicits._
    Web.pageRankE9(
        edges.toDF("src", "dst").repartition(parts),
        nodes.toDF("id").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRankE9: 2-cycle is the uniform fixpoint at every iteration count " +
    "(10 iterations crosses the lineage-truncation boundary)") {
    // each node's inflow == its own rank, so (15b + 85b)/100 == b exactly;
    // k=10 exercises the every-8-rounds localCheckpoint path
    val edges = Seq(0L -> 1L, 1L -> 0L)
    Seq(1, 3, 10).foreach { k =>
      assert(ranksOf(edges, Seq(0L, 1L), k) ==
        Map(0L -> 500000000L, 1L -> 500000000L), s"iterations=$k")
    }
  }

  test("pageRankE9: hand-computed asymmetric graph, one iteration") {
    // nodes {0,1,2}; edges 0→1, 0→2 (odeg 2), 1→2, 2→0; base = 333333333
    // inflow: 0←333333333, 1←166666666, 2←166666666+333333333
    // rank' = (15·base + 85·inflow) div 100
    val got = ranksOf(Seq(0L -> 1L, 0L -> 2L, 1L -> 2L, 2L -> 0L), Seq(0L, 1L, 2L), 1)
    assert(got == Map(0L -> 333333333L, 1L -> 191666666L, 2L -> 474999999L))
  }

  test("pageRankE9: partition-count invariant (exact integer arithmetic) " +
    "and teleport floor for no-in-edge nodes") {
    // chain 0→1→2 plus isolated-in node 3 (out-edge only: 3→0)
    val edges = Seq(0L -> 1L, 1L -> 2L, 3L -> 0L)
    val nodes = Seq(0L, 1L, 2L, 3L)
    val a = ranksOf(edges, nodes, 3, parts = 1)
    val b = ranksOf(edges, nodes, 3, parts = 7)
    assert(a == b)
    // node 3 has no in-edges: rank settles at the pure teleport term
    val base = 1000000000L / 4
    assert(a(3L) == 15L * base / 100L)
    // total mass never exceeds the initial 1e9 (leak/rounding only shrink)
    assert(a.values.sum <= 1000000000L)
  }

  test("teleportBaseE9: guards the n >= 1e9 silent-zero regime") {
    assert(Web.teleportBaseE9(4L) == 250000000L)
    assert(Web.teleportBaseE9(999999999L) == 1L)
    intercept[IllegalArgumentException](Web.teleportBaseE9(1000000000L))
    intercept[IllegalArgumentException](Web.teleportBaseE9(0L))
  }

  test("pageRankE9: dangling-mass redistribution, hand-computed, conserves " +
    "total mass up to rounding") {
    import spark.implicits._
    // nodes {0,1}, edge 0→1 only; node 1 is dangling. base = 5e8.
    // leak variant:   rank0' = 15·5e8/100 = 75,000,000
    //                 rank1' = (15·5e8 + 85·5e8)/100 = 500,000,000
    // redistribution: dangling mass 5e8, share 5e8 div 2 = 2.5e8
    //                 rank0' = (7.5e9 + 85·2.5e8) div 100 = 287,500,000
    //                 rank1' = (7.5e9 + 85·(5e8+2.5e8)) div 100 = 712,500,000
    def run(redistribute: Boolean) = Web.pageRankE9(
        Seq(0L -> 1L).toDF("src", "dst"), Seq(0L, 1L).toDF("id"), 1,
        redistributeDangling = redistribute)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(false) == Map(0L -> 75000000L, 1L -> 500000000L))
    val re = run(true)
    assert(re == Map(0L -> 287500000L, 1L -> 712500000L))
    assert(re.values.sum == 1000000000L) // no leak
  }

  test("pageRankE9: Observation-based early stop — a fixpoint graph stops " +
    "after one iteration with the fixpoint values (iterations is a cap)") {
    import spark.implicits._
    // 2-cycle: delta after iteration 1 is exactly 0, so the loop must stop
    // there; a 50-iteration cap that actually ran 50 eager localCheckpoint
    // rounds would take ~minutes — bound wall-clock as the stop signal
    val t0 = System.nanoTime()
    val got = Web.pageRankE9(
        Seq(0L -> 1L, 1L -> 0L).toDF("src", "dst"), Seq(0L, 1L).toDF("id"),
        iterations = 50, convergeDeltaE9 = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    assert(got == Map(0L -> 500000000L, 1L -> 500000000L))
    assert(sec < 60.0, s"early stop did not engage (took $sec s)")
    // and the converged result matches the lazy fixed-k plan
    val lazyRun = ranksOf(Seq(0L -> 1L, 1L -> 0L), Seq(0L, 1L), 3)
    assert(got == lazyRun)
  }
}
