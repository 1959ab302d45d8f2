package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sparse lexical retrieval — the inverted-index complement of the dense-ANN
  * operators in [[Similarity]]. A training-data pipeline uses this for
  * query-driven corpus curation (pull documents matching a probe set),
  * benchmark decontamination by retrieval, and as the first stage of hybrid
  * (BM25 + embedding) mining.
  */
object Retrieval {

  /** Lucene-style BM25 top-k: for each query string, the k best-scoring
    * documents under
    * `idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))` with
    * `idf = ln(1 + (N-df+0.5)/(df+0.5))` (the Robertson/Sparck-Jones form
    * Lucene uses, non-negative by construction).
    *
    * Spark-first shape, sized for an unbounded corpus and a small query set:
    *  - per-doc term frequencies aggregate map-side before any shuffle
    *    (partial HashAggregate on (doc, term));
    *  - the tiny query-term list broadcasts and SEMI-prunes the tf table
    *    BEFORE anything term-keyed shuffles — the corpus-wide inverted
    *    index is built only for the terms actually queried;
    *  - df(term) is then a count over that pruned posting list, and the
    *    (term, df, idf) frame — at most |query terms| rows — broadcasts
    *    back onto the postings: the only all-corpus shuffle left is the
    *    (query, doc) score sum;
    *  - top-k per query is a row_number window partitioned by query id —
    *    with few queries each partition is one reducer's sort of that
    *    query's candidates; Spark's rank pushdown (WindowGroupLimit)
    *    truncates each map-side partition to k before the shuffle, so no
    *    reducer materializes a full candidate list.
    *
    * Determinism for the cross-engine oracle: idf is rounded to 8 dp, each
    * term contribution to 6 dp, and the per-doc score summed as DECIMAL —
    * order-free exact — then emitted in 1e-6 units as BIGINT, so engine
    * summation order and float formatting cannot leak into the comparison
    * (ties broken by doc id).
    *
    * @param queries (query_id, query_text) pairs; must be small (they
    *                broadcast — retrieval with a BILLION queries is a
    *                different operator: a term-keyed join, not this one)
    * @return (query_id, doc_id, score_micro, rank), rank 1..k per query
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, String)], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "empty query set")
    val spark = docs.sparkSession
    import spark.implicits._

    def toks(c: Column): Column = split(lower(trim(c)), "\\s+")

    val docToks = docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("w"))

    val qterms = queries.toDF("query_id", "qtext")
      .select(col("query_id"), explode(toks(col("qtext"))).as("term"))
      .distinct()

    // prune the exploded term stream with a broadcast of the DISTINCT
    // query-term list BEFORE the tf groupBy — the term-keyed shuffle then
    // carries only query-term postings, not the whole vocabulary. Postings
    // are built once per term even when queries share a term, so df is a
    // plain count. Persisted: both the df subtree and the scoring subtree
    // read it (released via CacheRegistry).
    val termList = qterms.select("term").distinct()
    // corpus stats (N docs, Σdl) fold into the SAME scan that builds the
    // postings — observed on the pre-explode doc rows during the postings
    // materialization, so the corpus is read ONCE, not once per aggregate
    // (in production the postings mart build records its stats the same
    // way). The observe sits above the scan and below the explode/join, so
    // it sees every doc even though the semi-join drops non-query terms.
    val obs = org.apache.spark.sql.Observation()
    val prunedTf = graft.CacheRegistry.register(docToks
      .observe(obs, count(lit(1)).as("n"),
        sum(size(col("w")).cast("long")).as("sumdl"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .join(broadcast(termList), "term")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // materialize postings + stats: must be a Dataset ACTION (count), not a
    // raw toRdd execution — observed metrics are delivered through the
    // QueryExecutionListener, which only fires on actions; the cache build
    // stores all columns either way
    prunedTf.count()
    val df = prunedTf.groupBy("term").agg(count(lit(1)).as("df"))
    // metrics arrive asynchronously after the action; AWAIT the
    // observation's completion future with a deadline rather than calling
    // obs.get, which (a) blocks FOREVER when a repeated invocation's
    // postings subtree is served from the plan cache (the cached plan
    // hides this call's CollectMetrics node, so the promise never
    // completes) and (b) NPEs on the schema-less metrics Row some
    // execution paths deliver. Await parks on the promise — no sleep-poll
    // inside the timed region, zero added latency once the listener fires.
    // Fields are read positionally — (n, sumdl) is the observe()
    // expression order. On timeout fall back to the explicit stats
    // aggregate: one extra corpus scan, identical values (the
    // repeated-invocation case only).
    val statsRow: Option[org.apache.spark.sql.Row] =
      try {
        scala.concurrent.Await.ready(
          obs.future, scala.concurrent.duration.Duration(2, "s"))
        obs.future.value.flatMap(_.toOption)
      } catch {
        case _: java.util.concurrent.TimeoutException => None
        case _: InterruptedException => Thread.currentThread().interrupt(); None
      }
    // a cache-served execution resolves the promise with a ZERO-LENGTH row
    // — same meaning as no row: this call's metrics never computed
    val stats = statsRow.filter(_.length >= 2) match {
      case Some(r) =>
        spark.range(1).select(
          lit(r.getLong(0)).as("n"),
          lit(if (r.isNullAt(1)) 0L else r.getLong(1)).as("sumdl"))
      case _ =>
        // make the hidden extra corpus scan ATTRIBUTABLE: on a loaded box the
        // metrics can land after the 2 s deadline, and a timed run that
        // silently pays this scan (plus the full poll stall) would otherwise
        // look like an unexplained regression
        System.err.println(
          "[graft] bm25: observed corpus stats not delivered within 2s " +
            "(cache-served plan or loaded machine); falling back to an " +
            "explicit stats aggregate — one extra corpus scan in this timing")
        docToks.agg(count(lit(1)).as("n"),
          sum(size(col("w")).cast("long")).as("sumdl"))
    }

    // identical IEEE evaluation order on both engines: every operand cast
    // to double explicitly, parenthesization mirrored in the oracle SQL
    val avgdl = col("sumdl").cast("double") / col("n").cast("double")
    val idf8 = round(
      log(lit(1.0) + (col("n").cast("double") - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5)), 8)
    val tfn = (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val contrib = round(col("idf") * tfn, 6)

    val idfFrame = df.crossJoin(stats).withColumn("idf", idf8)
    val scored = prunedTf
      .join(broadcast(idfFrame), "term")
      .join(broadcast(qterms), "term")
      .select(col("query_id"), col("doc_id"),
        contrib.cast(DecimalType(18, 6)).as("c"))
      .groupBy("query_id", "doc_id")
      .agg((sum(col("c")) * 1000000).cast("long").as("score_micro"))

    perQueryTopK(scored, "score_micro", k)
  }

  /** Query–document Jaccard top-k: a second, set-based lexical ranker for
    * hybrid fusion — score = |Q∩D| / |Q∪D| over DISTINCT whitespace
    * tokens, emitted in integer micro units (|∩|·10⁶ div |∪| — no float
    * boundary for engines to disagree on), ties by doc id.
    *
    * Scale shape mirrors [[bm25TopK]]: candidates come from the exploded
    * doc-term stream semi-pruned by the broadcast query-term list (docs
    * sharing ≥1 distinct term — exactly the rows a corpus×queries cross
    * join would keep, at inverted-index cost), the per-pair set math is
    * row-local against the broadcast query arrays, and top-k rides the
    * WindowGroupLimit rank pushdown.
    */
  def jaccardTopK(docs: DataFrame, idCol: String, textCol: String,
                  queries: Seq[(Long, String)], k: Int = 10): DataFrame = {
    require(queries.nonEmpty, "empty query set")
    val spark = docs.sparkSession
    import spark.implicits._
    def toks(c: Column): Column = array_distinct(split(lower(trim(c)), "\\s+"))

    val dw = docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("dw"))
    val qf = queries.toDF("query_id", "qtext")
      .select(col("query_id"), toks(col("qtext")).as("qw"))
    val qterms = qf.select(col("query_id"), explode(col("qw")).as("term")).distinct()

    val cand = dw.select(col("doc_id"), explode(col("dw")).as("term"))
      .join(broadcast(qterms), "term")
      .select("query_id", "doc_id").distinct()
    val scored = cand.join(dw, "doc_id").join(broadcast(qf), "query_id")
      .withColumn("score_micro", expr(
        "CAST(size(array_intersect(dw, qw)) AS BIGINT) * CAST(1000000 AS BIGINT)" +
          " div CAST(size(array_union(dw, qw)) AS BIGINT)"))
    perQueryTopK(scored, "score_micro", k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009): fuse
    * any number of (query_id, doc_id, rank) frames into one ranking by
    * `score(d) = Σ_r 1/(kConst + rank_r(d))`, computed in exact integer
    * micro units (`10⁶ div (kConst + rank)`) so engine float-sum order
    * cannot leak into the result; ties by doc id.
    *
    * Scale shape: the inputs are already per-query top-k truncated, so the
    * UNION is `k·rankers` rows per query — the (query, doc) fusion shuffle
    * is ranking-sized, never corpus-sized; the final top-k rides
    * WindowGroupLimit. Each input must have distinct (query_id, doc_id)
    * (true of any rank frame); `n_rankers` counts how many rankers
    * surfaced the doc — the agreement signal hybrid curation filters on.
    */
  def rrfFuse(rankings: Seq[DataFrame], kConst: Int = 60, k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "no rankings to fuse")
    val u = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionAll _)
    val fused = u
      .select(col("query_id"), col("doc_id"),
        expr(s"CAST(1000000 AS BIGINT) div CAST($kConst + rank AS BIGINT)").as("p"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("p")).as("rrf_micro"), count(lit(1)).as("n_rankers"))
    perQueryTopK(fused, "rrf_micro", k, Seq("n_rankers"))
  }

  /** The shared per-query top-k tail — rank by (score desc, doc_id asc),
    * keep rank <= k. ONE implementation (the Similarity.rerankTopK rule)
    * so the rankers rrfFuse fuses can never silently diverge on the
    * tie-break contract. */
  private def perQueryTopK(scored: DataFrame, scoreCol: String, k: Int,
                           extra: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col(scoreCol).desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select((Seq("query_id", "doc_id", scoreCol) ++ extra :+ "rank").map(col): _*)
  }
}
