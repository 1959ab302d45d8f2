package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoFunctions
import graft.plans.GraftExtensions

/** The native PointInMultiPolygon expression must agree with the
  * property-tested UDF/kernel everywhere, handle nulls, stay codegen'd,
  * and be SQL-callable via the extension registration. */
class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  type MP = Seq[Seq[Seq[Seq[Double]]]]
  private val square: MP = Seq(Seq(Seq(
    Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(10.0, 10.0), Seq(0.0, 10.0), Seq(0.0, 0.0))))
  private val withHole: MP = Seq(Seq(
    Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(10.0, 10.0), Seq(0.0, 10.0), Seq(0.0, 0.0)),
    Seq(Seq(4.0, 4.0), Seq(6.0, 4.0), Seq(6.0, 6.0), Seq(4.0, 6.0), Seq(4.0, 4.0))))

  test("native expression equals the UDF on a grid, including holes and nulls") {
    import spark.implicits._
    val pts = (for (x <- -2 to 12; y <- -2 to 12) yield (x + 0.5, y + 0.5)).toDF("lon", "lat")
    val geoms = Seq(("sq", square), ("hole", withHole)).toDF("name", "geom")
    val joined = pts.crossJoin(geoms)
      .withColumn("via_expr", GeoFunctions.pointInMultiPolygon(col("lon"), col("lat"), col("geom")))
      .withColumn("via_udf", GeoFunctions.pointInMultiPolygonUdf(col("lon"), col("lat"), col("geom")))
    assert(joined.filter(!(col("via_expr") <=> col("via_udf"))).count() == 0)
    assert(joined.filter(col("name") === "hole" && col("lon") === 4.5 && col("lat") === 4.5)
      .head.getAs[Boolean]("via_expr") == false) // inside the hole
    // null geometry -> null result
    val n = pts.limit(1)
      .withColumn("geom", lit(null).cast("array<array<array<array<double>>>>"))
      .select(GeoFunctions.pointInMultiPolygon(col("lon"), col("lat"), col("geom")))
    assert(n.head.isNullAt(0))
  }

  test("the expression stays out of ScalaUDF — codegen-friendly plan") {
    // non-literal input (range) so the predicate survives constant folding
    val pts = spark.range(2).select(
      (col("id") * 10 + 1).cast("double").as("lon"),
      (col("id") * 10 + 1).cast("double").as("lat"))
    val df = pts.withColumn("geom", typedLit(square))
      .filter(GeoFunctions.pointInMultiPolygon(col("lon"), col("lat"), col("geom")))
    assert(df.count() == 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"native expr compiled to a UDF:\n$plan")
    assert(plan.toLowerCase.contains("pointinmultipolygon"), plan)
  }

  test("shingle/minhash native expressions match the reference UDFs byte-for-byte") {
    import spark.implicits._
    import graft.operators.Dedup
    // real corpus + adversarial rows: non-ASCII (the UDF hashes UTF-16 code
    // units), short docs (< n words), repeated words, whitespace edges
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (900001L, "não é ó açaí coração"),
        (900002L, "one"),
        (900003L, "a a a a a"),
        (900004L, "  padded   whitespace\tand\ttabs  "),
        (900005L, "múltiplos tokens não-ascii você já viu")
      ).toDF("doc_id", "text"))
    val both = docs
      .withColumn("via_expr", Dedup.shingleHashes(col("text"), 3))
      .withColumn("via_udf", Dedup.shingleHashesRef(col("text"), 3))
      .withColumn("sig_expr", Dedup.minhashSignature(col("via_expr"), 64))
      .withColumn("sig_udf", Dedup.minhashSignatureRef(col("via_udf"), 64))
    assert(both.filter(!(col("via_expr") <=> col("via_udf"))).count() == 0,
      "shingle hashes diverge from the UDF reference")
    assert(both.filter(!(col("sig_expr") <=> col("sig_udf"))).count() == 0,
      "minhash signatures diverge from the UDF reference")
    // null text keeps the UDF's semantics: EMPTY set, not null
    val nullRow = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(Dedup.shingleHashes(col("text"), 3).as("sh"))
      .head
    assert(!nullRow.isNullAt(0) && nullRow.getSeq[Long](0).isEmpty)
  }

  test("minhash banded subtree is UDF-free (shingle + signature codegen native)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val sig = docs
      .withColumn("sh", graft.operators.Dedup.shingleHashes(col("text"), 3))
      .withColumn("sig", graft.operators.Dedup.minhashSignature(col("sh"), 64))
    assert(sig.count() == 2)
    val plan = sig.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"minhash path still contains a ScalaUDF:\n$plan")
  }

  test("distance-to-polygon native expression matches the reference UDF bit-for-bit") {
    import spark.implicits._
    // grid of probes around/inside both fixtures, incl. an open-ring variant
    val openRing: MP = Seq(Seq(Seq(
      Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(10.0, 10.0), Seq(0.0, 10.0)))) // not closed
    val pts = (for (x <- -3 to 13 by 2; y <- -3 to 13 by 2) yield (x + 0.3, y + 0.7))
      .toDF("lon", "lat")
    val geoms = Seq(("sq", square), ("hole", withHole), ("open", openRing))
      .toDF("name", "geom")
    val joined = pts.crossJoin(geoms)
      .withColumn("via_expr", GeoFunctions.distanceToMultiPolygonMeters(
        col("lon"), col("lat"), col("geom")))
      .withColumn("via_udf", GeoFunctions.distanceToMultiPolygonMetersUdf(
        col("lon"), col("lat"), col("geom")))
    assert(joined.filter(!(col("via_expr") <=> col("via_udf"))).count() == 0,
      "distance diverges from the UDF reference")
    assert(joined.filter(col("via_expr") === 0.0).count() > 0, "fixture sanity: some probes inside")
  }

  test("simhash/sign-bucket native expressions match the reference UDFs bit-for-bit") {
    import spark.implicits._
    // simhash over real + non-ASCII corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, "não é ó açaí coração")).toDF("doc_id", "text"))
      .withColumn("tokens", split(lower(trim(col("text"))), "\\s+"))
    val sh = docs
      .withColumn("via_expr", graft.plans.SimHash64Expr(col("tokens")))
      .withColumn("via_udf", graft.functions.HashFunctions.simHash64Udf(col("tokens")))
    assert(sh.filter(!(col("via_expr") <=> col("via_udf"))).count() == 0,
      "simhash diverges from the UDF reference")

    // sign buckets over real embeddings — the sim_topk_lsh oracle depends on
    // bit-exact fp dot products, so equality here must be exact
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    for (offset <- Seq(0, 4, 12)) {
      val b = e
        .withColumn("via_expr", graft.operators.Similarity.signBucket(col("v"), 4, offset))
        .withColumn("via_udf", graft.operators.Similarity.signBucketRef(col("v"), 4, offset))
      assert(b.filter(!(col("via_expr") <=> col("via_udf"))).count() == 0,
        s"sign bucket diverges from the UDF reference at offset $offset")
    }
  }

  test("vec_dot / vec_norm / sq_dists match the HOF reference folds bit-for-bit on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val paired = e.crossJoin(e.select(col("vec_id").as("id2"), col("v").as("v2")))
      .filter(col("vec_id") < 10 && col("id2") < 10)
      .withColumn("dot_e", graft.operators.Similarity.dot(col("v"), col("v2")))
      .withColumn("dot_r", graft.operators.Similarity.dotRef(col("v"), col("v2")))
      .withColumn("nrm_e", graft.operators.Similarity.l2Norm(col("v")))
      .withColumn("nrm_r", graft.operators.Similarity.l2NormRef(col("v")))
    assert(paired.filter(!(col("dot_e") <=> col("dot_r")) ||
      !(col("nrm_e") <=> col("nrm_r"))).count() == 0)
    // sq_dists: same ascending (x-c)^2 fold as the HOF composition
    val cents = e.orderBy("vec_id").limit(3)
      .collect().map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val centsLit = typedLit(cents.zipWithIndex)
      .cast("array<struct<c:array<double>,cell:int>>")
    val hof = transform(centsLit, p =>
      aggregate(zip_with(col("v"), p.getField("c"), (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, x) => acc + x))
    val cmp = e.withColumn("via_expr", graft.plans.SqDistsExpr(col("v"), cents))
      .withColumn("via_hof", hof)
    assert(cmp.filter(!(col("via_expr") <=> col("via_hof"))).count() == 0)
  }

  test("apply_merge equals the reference HOF fold: adjacency join, no re-match of fresh merges") {
    import spark.implicits._
    val rows = Seq(
      Seq("a", "b", "c"),            // ab c
      Seq("a", "b", "a", "b"),       // ab ab
      Seq("a", "a", "b", "b"),       // a ab b
      Seq("b", "a"),                 // no match
      Seq.empty[String],
      Seq("a", "b", "b")             // ab b — merged ab must not re-match 'a'
    ).toDF("t")
    def hof(toks: org.apache.spark.sql.Column, l: String, r: String, m: String) =
      aggregate(toks, array().cast("array<string>"),
        (acc, x) => when(
          size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
          .otherwise(concat(acc, array(x))))
    val cmp = rows
      .withColumn("via_expr", graft.plans.ApplyMergeExpr(col("t"), "a", "b", "ab"))
      .withColumn("via_hof", hof(col("t"), "a", "b", "ab"))
    assert(cmp.filter(!(col("via_expr") <=> col("via_hof"))).count() == 0)
  }

  test("mask_intersect_count equals the HOF popcount form, incl. nulls and width mismatch") {
    import spark.implicits._
    val rows = Seq(
      (Seq(0xffL, 0x0fL), Seq(0x0fL, 0xffL)),          // 4 + 4
      (Seq(-1L), Seq(-1L)),                             // 64
      (Seq(0L, 0L, 0L), Seq(-1L, -1L, -1L)),            // 0
      (Seq(0x3L, 0x5L), Seq(0x1L)),                     // shorter right: min-width
      (Seq.empty[Long], Seq(0xffL))                     // empty left
    ).toDF("a", "b")
    val cmp = rows
      .withColumn("via_expr", graft.plans.MaskIntersectCountExpr(col("a"), col("b")))
      .withColumn("via_hof", coalesce(aggregate(
        zip_with(slice(col("a"), lit(1), least(size(col("a")), size(col("b")))),
          slice(col("b"), lit(1), least(size(col("a")), size(col("b")))),
          (x, y) => bit_count(x.bitwiseAND(y)).cast("long")),
        lit(0L), (acc, x) => acc + x), lit(0L)))
    assert(cmp.filter(!(col("via_expr") <=> col("via_hof"))).count() == 0)
    // null input -> null out
    val n = rows.limit(1)
      .select(graft.plans.MaskIntersectCountExpr(
        lit(null).cast("array<bigint>"), col("b")))
    assert(n.head.isNullAt(0))
  }

  test("pip_native is SQL-callable after extension registration") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((2.0, 3.0)).toDF("lon", "lat").createOrReplaceTempView("pts_native")
    val mpSql = "array(array(array(" +
      "array(0D,0D), array(10D,0D), array(10D,10D), array(0D,10D), array(0D,0D))))"
    val r = spark.sql(
      s"SELECT pip_native(lon, lat, $mpSql) AS hit, " +
        s"pip_native(lon + 20, lat, $mpSql) AS miss FROM pts_native").head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }
}
