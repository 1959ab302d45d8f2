package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>/array<double>).
  *
  * Vector math uses `zip_with` + `aggregate` built-ins — fully codegen'd, no
  * UDF in the hot path.
  *
  * Scale design: brute force broadcasts the (small) query set and scans the
  * corpus once — embarrassingly parallel, per-partition top-k via
  * TakeOrderedAndProject after the window. The LSH variant prunes the scan
  * to matching sign-buckets: at 1000 executors the bucket join is a
  * hash-partitioned equi-join on the bucket key, and only intra-bucket pairs
  * pay the O(d) dot product.
  */
object Similarity {

  /** dot(a,b) via zip_with + aggregate (double). */
  def dot(a: Column, b: Column): Column = graft.plans.DotExpr(a, b)

  def l2Norm(v: Column): Column = graft.plans.L2NormExpr(v)

  /** Reference HOF forms of [[dot]]/[[l2Norm]] — the fold the native
    * kernels mirror bit-for-bit; kept for the parity tests. */
  def dotRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def l2NormRef(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Shared exact-cosine rerank tail: candidates carry (query_id, qv, qn,
    * neighbor_id, cv, cn); output contract (rounding, tie-break, columns)
    * lives HERE once for brute/LSH/IVF, so the cross-implementation
    * equality tests hold by construction. */
  private def rerankTopK(candidates: DataFrame, k: Int): DataFrame = {
    val scored = candidates
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Brute-force top-k cosine neighbors of each query vector.
    *
    * @param corpus  (idCol, vecCol) table — the big side, scanned once
    * @param queries (idCol, vecCol) table — small, broadcast
    * @return (query_id, neighbor_id, cosine, rank) — rank 1..k per query,
    *         ties broken by neighbor id; a query is never its own neighbor.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    rerankTopK(c.join(broadcast(q), col("query_id") =!= col("neighbor_id")), k)
  }

  /** Per-class embedding statistics: member count, the class centroid
    * (per-dimension mean, 6dp), and the summed member→centroid cosine — the
    * intra-class compactness audit run on an embedding table before using
    * its labels for semantic dedup or stratified sampling (a class whose
    * members don't cohere around their centroid makes a bad dedup bucket).
    *
    * Scale shape: centroid = posexplode + (label, pos)-keyed partial-agg
    * mean (never a whole-vector shuffle), reassembled with an ordered
    * collect over the (label × dim)-sized frame; members then join the
    * centroid table on the label key for a row-local cosine. Fixed-point
    * output contract: cosines rounded 6dp, summed as DECIMAL, emitted in
    * 1e-6 units — engine summation order invisible.
    *
    * @return (label, n_vecs, sum_cos_1e6)
    */
  def classStats(df: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    val base = graft.CacheRegistry.register(
      df.select(col(labelCol).as("label"), col(vecCol).cast("array<double>").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cents = base
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(round(avg("x"), 6).as("m"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cent"))
    base.join(cents, "label")
      .select(col("label"),
        round(cosine(col("v"), col("cent")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("c"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("c")) * 1000000L).cast("long").as("sum_cos_1e6"))
  }

  /** Contrastive hard-negative mining: for each query vector, the k
    * most-cosine-similar corpus vectors with a DIFFERENT label — the
    * "looks alike, isn't" negatives an embedding-model trainer pairs with
    * its positives (in-batch-negatives upgrade; see e.g. DPR, Karpukhin et
    * al. 2020 §3.2 on hard negatives from a retriever).
    *
    * Same physique as [[bruteForceTopK]]: the small query set broadcasts,
    * the corpus is scanned once, per-query top-k rides the WindowGroupLimit
    * rank pushdown; the label-mismatch predicate is evaluated with the
    * broadcast join, so same-label candidates are dropped before any
    * cosine math. The (query_id, neighbor_id, cosine, rank) contract and
    * tie rules match the other top-k operators.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("__cl")).withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("__ql")).withColumn("qn", l2Norm(col("qv")))
    rerankTopK(c.join(broadcast(q), col("__ql") =!= col("__cl")), k)
  }

  /** Deterministic random-hyperplane sign bits: plane p's component for
    * dimension d is a fixed pseudo-random ±1-ish value derived from
    * fnv1a64(p:d) — no RNG state, reproducible across runs/executors.
    */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val h = HashFunctions.fnv1a64(s"$plane:$dim")
    // map to (-1, 1) uniformly
    (h.toDouble / Long.MaxValue.toDouble)
  }

  private val signBucketUdf = udf((v: Seq[Double], nPlanes: Int, planeOffset: Int) => {
    if (v == null) null.asInstanceOf[java.lang.Long]
    else {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var s = 0.0
        var d = 0
        while (d < v.length) { s += v(d) * planeComponent(planeOffset + p, d); d += 1 }
        if (s > 0) bucket |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(bucket)
    }
  })

  /** Random-hyperplane LSH bucket id (nPlanes sign bits → long);
    * `planeOffset` selects an independent plane family per hash table.
    * Native codegen expression (graft.plans.SignBucketExpr) — the UDF stays
    * as the parity reference. */
  def signBucket(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    graft.plans.SignBucketExpr(vec, nPlanes, planeOffset)

  /** Reference UDF binding for parity tests. */
  private[graft] def signBucketRef(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    signBucketUdf(vec.cast("array<double>"), lit(nPlanes), lit(planeOffset))

  /** LSH-bucketed approximate top-k: textbook multi-table sign-LSH
    * (Indyk–Motwani) with hamming-1 multi-probe (Lv et al. VLDB'07) —
    * a candidate matches when query and corpus vector share a bucket in ANY
    * of `nTables` independent plane families, with each query additionally
    * probing its bucket's hamming-1 neighbors.
    *
    * Scale: the corpus is indexed with nTables postings per vector (the
    * standard LSH index cost, a narrow explode — no shuffle of the vectors
    * beyond the bucket equi-join); probing multiplies only the small
    * broadcast QUERY side by nTables·(nPlanes+1). A pair can match in
    * several tables, so candidates dedup on (query, neighbor) before the
    * exact rerank. Scan reduction vs brute ≈ 2^nPlanes / (nTables·(nPlanes+1)).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nPlanes: Int = 8,
              nTables: Int = 4, multiProbe: Boolean = true): DataFrame = {
    require(nPlanes < 63, "bucket is a long of sign bits")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", l2Norm(col("cv"))) // once per vector, before the table explode
      .withColumn("tb", explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"), signBucket(col("cv"), nPlanes, t * nPlanes).as("b"))): _*)))
      .select(col("tb.t").as("t"), col("tb.b").as("bucket"),
        col("neighbor_id"), col("cv"), col("cn"))
    val qProbes = (0 until nTables).flatMap { t =>
      val base = signBucket(col("qv"), nPlanes, t * nPlanes)
      val bs =
        if (multiProbe) base +: (0 until nPlanes).map(p => base.bitwiseXOR(lit(1L << p)))
        else Seq(base)
      bs.map(b => struct(lit(t).as("t"), b.as("b")))
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2Norm(col("qv"))) // once per query, before the explode
      .withColumn("tb", explode(array(qProbes: _*)))
      .select(col("tb.t").as("t"), col("tb.b").as("bucket"),
        col("query_id"), col("qv"), col("qn"))
    rerankTopK(c.join(broadcast(q), Seq("t", "bucket"))
      .dropDuplicates("query_id", "neighbor_id"), k) // pair may match in >1 table
  }

  /** (squared-L2 distance, cell id) pairs to every centroid — the single
    * source of truth for both assignment and probing, so their tie-break
    * (dist asc, cell asc) agrees BY CONSTRUCTION. */
  private def centroidDistPairs(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    // k×d distance work runs in the native SqDistsExpr kernel (codegen,
    // centroid matrix as a generated-code reference object — same ascending
    // fold as the oracle unroll); only the k-element index zip stays a HOF.
    // Field names imposed by cast, NOT .as aliases: the analyzer strips
    // aliases inside lambda bodies when the surrounding select is rewritten
    // (e.g. by a generator such as posexplode), which breaks getField.
    val ds = graft.plans.SqDistsExpr(vec, centroids)
    val idxLit = typedLit(centroids.indices.toList)
    zip_with(ds, idxLit, (dd, ii) => struct(dd, ii))
      .cast("array<struct<dist:double,cell:int>>")
  }

  /** The `nProbe` nearest cells for a query vector, nearest-first (ties →
    * lower cell id) — built-ins only. */
  def ivfProbeCells(vec: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    slice(transform(array_sort(centroidDistPairs(vec, centroids)),
      p => p.getField("cell")), 1, nProbe)

  /** IVF-style coarse quantization: assign each vector to the nearest of
    * `centroids` (broadcast list), search only matching cells. Centroids are
    * caller-provided (e.g. sampled + k-means'd offline); here we only need
    * the assignment + cell-restricted search plumbing. Defined as the first
    * probe cell so assignment and probing can never diverge.
    */
  def ivfCellId(vec: Column, centroids: Seq[Seq[Double]]): Column =
    element_at(ivfProbeCells(vec, centroids, 1), 1)

  /** Nearest-centroid assignment WITH its squared-L2 distance — struct
    * (dist, cell), same tie-break (dist asc, cell asc) as [[ivfCellId]] by
    * construction. The distance is what SemDeDup-style policies rank by
    * ("keep the doc closest to its cluster centroid"). */
  def ivfCellAssign(vec: Column, centroids: Seq[Seq[Double]]): Column =
    element_at(array_sort(centroidDistPairs(vec, centroids)), 1)

  /** round(x, 6) with the oracle engine's exact semantics: scale by 1e6 in
    * DOUBLE (the multiply's own fp rounding is part of the contract — e.g.
    * the double just below 5e-7 scales to exactly 0.5 and rounds UP), then
    * round half-away-from-zero, then divide. Decimal-string rounding
    * (BigDecimal HALF_UP on the exact binary value) disagrees on such
    * inputs — verified empirically against DuckDB's round(double, 6).
    * The half-case test is exact for |p| < 2^52 because p - floor(p) is
    * computed without rounding there. Negative underflow keeps its sign
    * (-2e-7 → -0.0), as std::round does.
    */
  private[graft] def roundHalfAwayAtMicro(m: Double): Double = {
    val p = m * 1e6
    val f = math.floor(p)
    val diff = p - f
    val r =
      if (diff > 0.5) f + 1
      else if (diff < 0.5) f
      else if (p >= 0) f + 1 else f // half → away from zero
    val q = r / 1e6
    if (q == 0.0 && p < 0) -0.0 else q
  }

  /** Lloyd's k-means over an embedding column — trains the IVF coarse
    * quantizer natively instead of requiring caller-provided centroids.
    * Deterministic end-to-end so the fit is reproducible (and oracle-able):
    *  - init: the k lowest-id vectors;
    *  - assignment: exact squared-L2 argmin (ties → lower cell), the same
    *    [[ivfCellId]] expression used at query time — left-fold IEEE order,
    *    so any engine folding left reproduces it bit-for-bit;
    *  - update: per-dimension mean ROUNDED to 6 dp — partial-aggregation
    *    summation order is nondeterministic at the 1e-16 level, rounding at
    *    1e-6 makes the new centroids run- and engine-independent;
    *  - an emptied cell keeps its previous centroid.
    *
    * Scale: per iteration one narrow shuffle — posexplode to (cell, dim)
    * rows with map-side partial aggregation down to k·d groups — then k·d
    * doubles to the driver (centroids are driver state by design, as in any
    * Spark k-means); assignment broadcasts those k·d literals into a
    * codegen'd expression. No per-row driver work.
    */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int): Seq[Seq[Double]] = {
    val base = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // AQE pinned off for the Lloyd loop — the connectedComponents/bpeFit
    // rationale: one tiny aggregate action per iteration, where AQE's
    // stage materialization costs more than the work. Restored on exit.
    val sess = corpus.sparkSession
    val aqePrev = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    var cents: IndexedSeq[Seq[Double]] = base.orderBy("id").limit(k)
      .collect().map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    for (_ <- 1 to iters) {
      val means = base
        .select(col("v"), ivfCellId(col("v"), cents).as("cell"))
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) => rows.sortBy(_.getInt(1))
            .map(r => roundHalfAwayAtMicro(r.getDouble(2))).toIndexedSeq
          case None => cents(c) // emptied cell keeps its centroid
        }
      }
    }
    cents
    } finally sess.conf.set("spark.sql.adaptive.enabled", aqePrev)
  }

  /** IVF-restricted ANN top-k: the corpus is partitioned into centroid
    * cells (one cell per vector — the inverted file); each query probes its
    * `nProbe` nearest cells and reranks candidates by exact cosine.
    *
    * Scale: the candidate join is a hash-partitioned equi-join on the cell
    * id; queries (small side) are broadcast ×nProbe. A corpus vector lives
    * in exactly ONE cell, so a (query, neighbor) pair matches at most once —
    * no dedup needed. Scan reduction ≈ nCells / nProbe vs brute force.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              centroids: Seq[Seq[Double]], nProbe: Int = 1): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.length, "nProbe must be 1..nCells")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell", ivfCellId(col("cv"), centroids))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2Norm(col("qv"))) // once per query, before the explode
      .withColumn("cell", explode(ivfProbeCells(col("qv"), centroids, nProbe)))
    rerankTopK(c.join(broadcast(q), Seq("cell")), k)
  }

  /** Product-quantization codebooks (Jégou/Douze/Schmid TPAMI'11 §II):
    * the vector space is split into `m` contiguous `dims/m`-dim subspaces
    * and an independent k-means codebook is trained per subspace — m·log2(k)
    * bits encode a vector, k·m small centroids reconstruct it. Training is
    * m [[kmeansFit]] runs over sliced vectors (each a corpus scan with
    * map-side-combined k·(dims/m) partial sums — same scale shape as IVF
    * training; at 100 TB you train on a sample, encode the full corpus).
    */
  def pqFit(corpus: DataFrame, idCol: String, vecCol: String, dims: Int,
            m: Int, k: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && dims % m == 0, s"dims=$dims must split evenly into m=$m subspaces")
    val sub = dims / m
    (0 until m).map { s =>
      kmeansFit(corpus.select(col(idCol).as("id"),
        slice(col(vecCol).cast("array<double>"), s * sub + 1, sub).as("v")),
        "id", "v", k, iters)
    }
  }

  /** Squared-L2 distances to every centroid, in cell order — the ADC
    * distance-table builder (one k-entry table per query per subspace). */
  def centroidDists(vec: Column, centroids: Seq[Seq[Double]]): Column =
    transform(centroidDistPairs(vec, centroids), p => p.getField("dist"))

  /** PQ asymmetric-distance (ADC) top-k (Jégou et al. TPAMI'11 §III): each
    * query precomputes an m×k distance table to the codebook centroids;
    * a corpus vector's approximate distance is then m table lookups on its
    * CODES — the encoded corpus is scanned without touching any corpus
    * vector. Scale: the codes frame is m ints per vector (the whole point
    * of PQ — ~8 bytes instead of dims×8); queries with their tables are
    * broadcast, so the scan is shuffle-free and codegen'd (element_at on a
    * small array). Ranking is per-query (dist asc, ties → lower neighbor).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, codebooks: Seq[Seq[Seq[Double]]],
             dims: Int): DataFrame = {
    val m = codebooks.length
    val sub = dims / m
    val codes = pqEncode(corpus, idCol, vecCol, codebooks, dims)
      .select(col(idCol).as("neighbor_id") +: (0 until m).map(s => col(s"code$s")): _*)
    val v = col(vecCol).cast("array<double>")
    val q = queries.select(col(idCol).as("query_id") +:
      codebooks.zipWithIndex.map { case (cb, s) =>
        centroidDists(slice(v, s * sub + 1, sub), cb).as(s"__qt$s")
      }: _*)
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dist",
        (0 until m).map(s => element_at(col(s"__qt$s"), col(s"code$s") + 1))
          .reduce(_ + _))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc_dist"), 6).as("adc_dist"), col("rank"))
  }

  /** PQ encoding: per subspace the nearest codebook centroid (ties → lower
    * code, the [[ivfCellAssign]] rule), plus the total squared
    * reconstruction error Σ_s ‖v_s − c_{code_s}‖² — the quantity PQ
    * minimizes and the quality gauge an index build monitors. Row-local
    * built-ins against broadcast codebook literals: no shuffle, no UDF.
    * Output: idCol, code0..code{m-1} (int), err (squared L2, 6 dp).
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebooks: Seq[Seq[Seq[Double]]], dims: Int): DataFrame = {
    val m = codebooks.length
    require(m >= 1 && dims % m == 0, s"dims=$dims must split evenly into m=$m subspaces")
    val sub = dims / m
    val v = col(vecCol).cast("array<double>")
    val assigns = codebooks.zipWithIndex.map { case (cb, s) =>
      ivfCellAssign(slice(v, s * sub + 1, sub), cb).as(s"__a$s")
    }
    val base = df.select(col(idCol) +: assigns: _*)
    val codes = (0 until m).map(s => base(s"__a$s.cell").as(s"code$s"))
    // left-to-right sum matches the oracle's d0 + d1 + … evaluation order
    val err = (0 until m).map(s => base(s"__a$s.dist")).reduce(_ + _)
    base.select((col(idCol) +: codes :+ round(err, 6).as("err")): _*)
  }
}
