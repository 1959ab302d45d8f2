package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document-corpus analysis: language ID, quality metrics, token counts,
  * fingerprints — composed from graft.functions.TextFunctions. Row-local
  * (no shuffle); safe to run inline in any scan.
  */
object TextAnalysis {

  /** Attach the full analysis column set to a documents table. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val withQuality = TextFunctions.qualityColumns(t).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    withQuality
      .withColumn("stopword_ratio", TextFunctions.stopwordRatio(t))
      .withColumn("tokens_ws", TextFunctions.tokenCountWs(t))
      .withColumn("tokens_bpeish", TextFunctions.tokenCountBpeishUdf(t))
      .withColumn("lang_pred", TextFunctions.detectLanguageUdf(t))
      .withColumn("fingerprint", TextFunctions.fingerprint64Udf(t))
  }

  /** Quality filter used by training-data pipelines: keeps documents whose
    * heuristics pass configurable gates. */
  def qualityFilter(df: DataFrame, textCol: String,
                    minWords: Int = 5, minAlphaRatio: Double = 0.5,
                    maxPunctRatio: Double = 0.3): DataFrame = {
    val analyzed = analyze(df, textCol)
    analyzed.filter(
      col("n_words") >= minWords &&
        col("alpha_ratio") >= minAlphaRatio &&
        col("punct_ratio") <= maxPunctRatio)
  }

  /** Train/eval decontamination by word n-gram overlap — the standard
    * benchmark-contamination check (Brown et al. 2020 §C run it with
    * 13-grams; Dodge et al. 2021 audit C4 the same way): a training
    * document is contaminated when it shares any length-`n` word n-gram
    * with any document of the held-out/eval partition (`isEval` rows).
    *
    * Returns the NON-eval rows of `docs` annotated with
    * `n_shared_grams` (distinct overlapping n-grams), `n_eval_docs`
    * (distinct eval documents hit), and a 0/1 `contaminated` flag —
    * zero-filled, so the output is a full per-document audit report, not
    * just the hits.
    *
    * Scale shape: both sides reduce to DISTINCT 64-bit FNV shingle hashes
    * via the codegen'd [[graft.plans.ShingleHashesExpr]] (8-byte join
    * payload — the gram strings never reach the shuffle), then one
    * equi-join on the hash. The eval side is benchmark-sized in practice
    * (orders of magnitude under the corpus), so AQE broadcasts it and the
    * 100 TB side is a single scan + map-side join + partial agg. Documents
    * shorter than `n` words hash as one whole-document gram (the
    * [[Dedup.shingleHashes]] fallback) — they match only verbatim copies.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    isEval: Column, n: Int = 5): DataFrame = {
    // a NULL predicate result must not make the row vanish from BOTH
    // sides (filter(!NULL) and filter(NULL) each drop it): an
    // unclassifiable document defaults to the TRAIN side, where it still
    // gets audited against the eval grams
    val tagged = docs.withColumn("__eval", coalesce(isEval, lit(false)))
    // per-doc hash sets are already distinct (sorted-dedup inside the
    // expression), so neither join input needs its own distinct shuffle.
    // The signature frame is persisted PRE-explode (one row per doc, the
    // minHashLshPairs convention): the eval and train subtrees below both
    // read it, which would otherwise re-scan + re-shingle the corpus twice.
    val sigs = graft.CacheRegistry.register(
      tagged.select(col(idCol).as("__id"), col("__eval"),
        Dedup.shingleHashes(col(textCol), n).as("__hs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val grams = sigs.select(col("__id"), col("__eval"),
      explode(col("__hs")).as("__g"))
    val ev = grams.filter(col("__eval"))
      .select(col("__g"), col("__id").as("__eval_id"))
    val hits = grams.filter(!col("__eval")).drop("__eval")
      .join(ev, "__g")
      .groupBy("__id")
      .agg(countDistinct("__g").as("n_shared_grams"),
        countDistinct("__eval_id").as("n_eval_docs"))
    tagged.filter(!col("__eval")).drop("__eval")
      .join(hits, col(idCol) === col("__id"), "left")
      .drop("__id")
      .withColumn("n_shared_grams", coalesce(col("n_shared_grams"), lit(0L)))
      .withColumn("n_eval_docs", coalesce(col("n_eval_docs"), lit(0L)))
      .withColumn("contaminated", (col("n_shared_grams") > 0).cast("int"))
  }

  /** Bigram-LM fluency score with Jelinek–Mercer interpolation — the
    * next-order upgrade of the unigram `text_lm_score` signal (CCNet uses a
    * 5-gram KenLM the same way; a corpus-trained bigram model is the
    * distributed-friendly middle ground):
    * `p(w|v) = λ·C(vw)/C(v) + (1-λ)·C(w)/N`, doc score = Σ -ln p over its
    * transitions (docs under 2 tokens have none and drop out).
    *
    * Determinism contract (the text_lm_score recipe): per-transition -ln p
    * rounded to 8 dp, summed as DECIMAL (order-free exact), emitted in 1e-8
    * units as BIGINT.
    *
    * Scale shape: the exploded bigram stream persists (counted once, scored
    * once); C2 is a (v,w)-keyed count, the two unigram joins are
    * vocabulary-keyed — all equi-joins, nothing broadcasts except the 1-row
    * total (N is derived from the unigram frame, not a second corpus scan).
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String,
                    lambda: Double = 0.7): DataFrame = {
    // tokenized ONCE and persisted: the unigram and bigram streams both
    // derive from this frame, so the corpus is scanned + regex-split a
    // single time (released via CacheRegistry)
    val t = graft.CacheRegistry.register(
      graft.Queries.fanOut(docs).select(col(idCol).as("__id"),
        split(lower(trim(col(textCol))), "\\s+").as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val uni = graft.CacheRegistry.register(
      t.select(explode(col("w")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = uni.agg(sum("c").as("n"))
    val bg = graft.CacheRegistry.register(
      t.filter(size(col("w")) >= 2)
        .select(col("__id"), explode(expr(
          "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS v, w[i + 1] AS wd))")).as("p"))
        .select(col("__id"), col("p.v").as("v"), col("p.wd").as("wd"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // decorate the DISTINCT-bigram frame with both unigram counts FIRST:
    // c2 is vocabulary-sized (distinct (v,wd) pairs), so the cv/cw joins
    // run on it instead of dragging the corpus-sized occurrence stream
    // through three shuffle joins — bg shuffles ONCE, on (v, wd)
    // the transition score depends only on the DISTINCT bigram, so the
    // ln/round runs once per vocabulary entry on the c2 frame, not once
    // per occurrence; the 8dp-rounded value is an exact multiple of 1e-8
    // and carries as an exact LONG in 1e-8 units, so the per-doc sum is a
    // plain long aggregation — bit-identical to the former DECIMAL(18,8)
    // sum (each term |k| < 2^52), minus the per-row libm + decimal cost
    val c2 = bg.groupBy("v", "wd").agg(count(lit(1)).as("c2"))
      .join(uni.select(col("tok").as("v"), col("c").as("cv")), "v")
      .join(uni.select(col("tok").as("wd"), col("c").as("cw")), "wd")
      .crossJoin(broadcast(totals))
      .withColumn("s_e8", round(round(-log(
        lit(lambda) * (col("c2").cast("double") / col("cv").cast("double")) +
          lit(1.0 - lambda) * (col("cw").cast("double") / col("n").cast("double"))), 8)
        * 100000000L).cast("long"))
      .select("v", "wd", "s_e8")
    bg.join(c2, Seq("v", "wd"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(col("s_e8")).as("nll_1e8"))
      .select(col("__id").as(idCol), col("n_transitions"), col("nll_1e8"))
  }

  /** Percentile gate: keep the top `num/den` fraction of documents by a
    * (discretized) score — "train on the top decile by quality" — without
    * ever sorting the corpus globally.
    *
    * The global rank decomposes exactly like corpus_select_budget's cumsum:
    * scores are rounded to ≤10⁴ distinct bins, per-bin counts roll up on a
    * tiny frame (the only global window runs over THAT), and the in-bin
    * row_number is a window PARTITIONED by bin. `cum_above + in-bin rank`
    * IS the global (score desc, id asc) rank, shard-parallel at any corpus
    * size. Selection is pure integer arithmetic — `rank·den ≤ num·N` —
    * so engines can't disagree on a float boundary.
    *
    * Returns every row annotated with (rank, selected); `scoreCol` must be
    * already discretized (e.g. `round(q, 4)`).
    */
  def percentileGate(df: DataFrame, idCol: String, scoreCol: String,
                     num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, s"need 0 <= $num/$den <= 1")
    binnedRank(df, idCol, scoreCol)
      .withColumn("selected", col("rank") * den <= lit(num) * col("__n"))
      .drop("__n")
  }

  /** The binned global-rank core shared by [[percentileGate]] and
    * [[percentRankMicro]]: every row annotated with its exact
    * (score desc, id asc) corpus rank and the corpus size `__n`, without a
    * global sort — per-bin counts roll up on a tiny frame, the in-bin
    * row_number window is bin-partitioned.
    *
    * NULL scores: the row is RETURNED (the "every row annotated"
    * contract) with NULL rank/__n — an unscored document cannot be
    * ranked — and is excluded from `__n`, so non-null rows' percentiles
    * are computed over the rankable corpus only. (The old inner join
    * silently DROPPED null-score rows while still counting them in __n,
    * deflating every real row's percentile.) */
  private def binnedRank(df: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // both the bin aggregate and the probe side read the scored frame
    val t = graft.CacheRegistry.register(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val wAbove = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bins = t.filter(col(scoreCol).isNotNull)
      .groupBy(scoreCol).agg(count(lit(1)).as("__bn"))
    val binsC = bins
      .withColumn("__cum_above", coalesce(sum("__bn").over(wAbove), lit(0L)))
      .withColumn("__n", sum("__bn").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(scoreCol), col("__cum_above"), col("__n"))
    val wIn = Window.partitionBy(scoreCol).orderBy(idCol)
    t.join(broadcast(binsC), Seq(scoreCol), "left")
      .withColumn("rank", when(col(scoreCol).isNotNull,
        col("__cum_above") + row_number().over(wIn)))
      .drop("__cum_above")
  }

  /** Percent-rank in integer micro-units — `(rank-1)·1e6 // (n-1)` under
    * the (score desc, id asc) total order — the common scale for fusing
    * incomparable quality signals without a float boundary anywhere.
    * `greatest(__n - 1, 1)` guards the single-row corpus, where n−1 = 0
    * would make the division NULL (Spark) or error (an oracle's `//`):
    * the lone row ranks 0, the same value the formula yields for every
    * top-ranked row. */
  def percentRankMicro(df: DataFrame, idCol: String, scoreCol: String,
                       outCol: String): DataFrame =
    binnedRank(df, idCol, scoreCol)
      .withColumn(outCol,
        expr(s"(rank - 1) * 1000000L div greatest(__n - 1, 1L)"))
      .drop("rank", "__n")

  /** Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 Table A1):
    * word count in [50, 100k], mean word length in [3, 10], ≥80% of words
    * alphabetic, ≥2 distinct stopword hits, symbol-to-word ratio ≤ 0.1.
    * Every rule is evaluated in PURE INTEGER form (3·nw ≤ Σlen ≤ 10·nw,
    * 5·alpha ≥ 4·nw, 10·sym ≤ nw) so no float boundary can flip a verdict
    * between engines; all metrics are row-local codegen — the gate runs
    * inline in any scan at any corpus size, and is STREAMING-SAFE (no
    * shuffle, no state): apply it to a readStream frame unchanged
    * (StreamingSpec pins streaming ≡ batch).
    *
    * Appends the metric, per-rule, and `pass` columns to `df`. */
  def gopherRules(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__w", split(lower(trim(col(textCol))), "\\s+"))
      .withColumn("n_words", size(col("__w")).cast("long"))
      .withColumn("word_chars", expr("aggregate(__w, 0L, (a, x) -> a + length(x))"))
      .withColumn("alpha_words",
        expr("CAST(size(filter(__w, x -> x rlike '\\\\p{L}')) AS BIGINT)"))
      .withColumn("stop_hits",
        expr("CAST(size(array_intersect(array_distinct(__w), " +
          "array('the','be','to','of','and','that','have','with'))) AS BIGINT)"))
      .withColumn("symbols", {
        // Column expressions, not spliced SQL text: a column name needing
        // backticks (dots/spaces) would parse wrong — and a crafted name
        // would be interpreted as SQL
        val t = col(textCol)
        val hashes = length(t) - length(replace(t, lit("#")))
        val ellipses = (length(t) - length(replace(t, lit("...")))).cast("long")
        (hashes.cast("long") + floor(ellipses / lit(3))).cast("long")
      })
      .drop("__w")
      .withColumn("r_word_count", col("n_words").between(50, 100000))
      .withColumn("r_mean_word_len",
        lit(3) * col("n_words") <= col("word_chars") &&
          col("word_chars") <= lit(10) * col("n_words"))
      .withColumn("r_alpha_frac", lit(5) * col("alpha_words") >= lit(4) * col("n_words"))
      .withColumn("r_stopwords", col("stop_hits") >= 2)
      .withColumn("r_symbol_ratio", lit(10) * col("symbols") <= col("n_words"))
      .withColumn("pass",
        col("r_word_count") && col("r_mean_word_len") && col("r_alpha_frac") &&
          col("r_stopwords") && col("r_symbol_ratio"))

  /** C4 cleaning rules (Raffel et al. 2020, §2.2 — the canonical web-text
    * filter set, complementing [[gopherRules]]): terminal punctuation,
    * no "lorem ipsum" placeholder, no curly brace (code), no javascript
    * mention, no cookie/privacy/terms boilerplate, minimum word and
    * sentence counts. Every predicate is a row-local string/integer
    * Column expression (no spliced SQL, no UDF) — stateless, so the gate
    * runs identically inline in a batch scan or a streaming pipeline. */
  def c4Rules(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val low = lower(t)
    df.withColumn("n_words", size(split(t, "\\s+")).cast("long"))
      // sentence COUNT is approximated by terminal-mark count (the C4
      // heuristic granularity — ellipses/abbreviations overcount; proper
      // splitting is a tokenizer concern), hence the honest column name
      .withColumn("n_sentence_marks",
        (length(t) - length(regexp_replace(t, "[.!?]", ""))).cast("long"))
      .withColumn("r_terminal_punct", t.rlike("[.!?\"]$"))
      .withColumn("r_no_lorem", !low.contains("lorem ipsum"))
      .withColumn("r_no_curly", !t.contains("{"))
      .withColumn("r_no_js", !low.contains("javascript"))
      .withColumn("r_no_policy",
        !(low.contains("cookie policy") || low.contains("privacy policy") ||
          low.contains("terms of use")))
      .withColumn("r_min_words", col("n_words") >= 5)
      .withColumn("r_min_sentences", col("n_sentence_marks") >= 3)
      .withColumn("pass",
        col("r_terminal_punct") && col("r_no_lorem") && col("r_no_curly") &&
          col("r_no_js") && col("r_no_policy") && col("r_min_words") &&
          col("r_min_sentences"))
  }

  /** Gopher REPETITION screens (Rae et al. 2021, arXiv:2112.11446 Table
    * A1 — the half of the Gopher filter set [[gopherRules]] doesn't
    * cover): a document dominated by repeated lines or by one n-gram is
    * boilerplate/spam regardless of its other quality stats.
    *
    * "Lines" are `chunkWords`-word chunks (the dedup_lines convention —
    * this corpus carries no newlines); both line metrics come from the
    * [[graft.plans.DedupWordChunksExpr]] first-occurrence kernel (distinct
    * chunks == kept chunks), and the top-2/3-gram numerators from the
    * [[graft.plans.TopNgramCharsExpr]] single-pass kernel — every metric
    * is row-local codegen, NO shuffle/explode (the corpus-sized
    * explode+groupBy the naive form needs is what a 100 TB gate must
    * avoid), stateless and therefore streaming-safe.
    *
    * Rules in pure integer form (no float boundary can flip a verdict
    * between engines):
    *   duplicate-line fraction  ≤ 0.30 ⟺ 10·(n_lines−n_kept) ≤ 3·n_lines
    *   duplicate-line char frac ≤ 0.20 ⟺ 5·dup_line_chars ≤ line_chars
    *   top-2-gram char fraction ≤ 0.20 ⟺ 5·top2_chars ≤ word_chars
    *   top-3-gram char fraction ≤ 0.18 ⟺ 50·top3_chars ≤ 9·word_chars
    * where line_chars counts every chunk's codepoints (word chars + the
    * in-chunk separators: word_chars + n_words − n_lines).
    */
  def repetitionRules(df: DataFrame, textCol: String,
                      chunkWords: Int = 8): DataFrame =
    df.withColumn("__w", split(trim(col(textCol)), "\\s+"))
      .withColumn("n_words", size(col("__w")).cast("long"))
      .withColumn("word_chars", expr("aggregate(__w, 0L, (a, x) -> a + length(x))"))
      .withColumn("__kept", graft.plans.DedupWordChunksExpr(col("__w"), chunkWords))
      .withColumn("n_lines",
        expr(s"CAST(ceil(size(__w) / $chunkWords.0) AS BIGINT)"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn("kept_chars", expr("aggregate(__kept, 0L, (a, x) -> a + length(x))"))
      .withColumn("line_chars", col("word_chars") + col("n_words") - col("n_lines"))
      .withColumn("dup_line_chars", col("line_chars") - col("kept_chars"))
      .withColumn("top2_chars", graft.plans.TopNgramCharsExpr(col("__w"), 2))
      .withColumn("top3_chars", graft.plans.TopNgramCharsExpr(col("__w"), 3))
      .withColumn("r_dup_lines",
        (col("n_lines") - col("n_kept")) * 10 <= col("n_lines") * 3)
      .withColumn("r_dup_line_chars", col("dup_line_chars") * 5 <= col("line_chars"))
      .withColumn("r_top2", col("top2_chars") * 5 <= col("word_chars"))
      .withColumn("r_top3", col("top3_chars") * 50 <= col("word_chars") * 9)
      .withColumn("pass",
        col("r_dup_lines") && col("r_dup_line_chars") &&
          col("r_top2") && col("r_top3"))
      .drop("__w", "__kept")

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023,
    * arXiv:2302.03169): score every document by how much more likely its
    * hashed n-gram features are under a TARGET distribution (the corpus
    * you wish you had more of) than under the RAW corpus — the log weight
    * a resampling pass (e.g. [[percentileGate]] over this score) selects
    * on.
    *
    * Features are whitespace-bigram OCCURRENCES hashed into 256 buckets by
    * the first md5 hex byte — engine-portable (DuckDB computes the same
    * md5 of the same "w₁ w₂" string), collision-tolerant by design (DSIR's
    * whole point is that a hashed multinomial suffices). Both bucket
    * models are add-1-smoothed over the full 256-bucket space, so no
    * feature can be unseen and the broadcast join below never misses.
    *
    * Determinism: each log-probability is rounded to 8 dp and cast to
    * DECIMAL BEFORE subtracting (two exact 8 dp values — the difference is
    * exact), the per-doc sum is DECIMAL (fold-order-free), and the result
    * is emitted in 1e-8 units as BIGINT — the text_lm_score recipe, so the
    * oracle hash-matches bit-for-bit.
    *
    * Scale shape: ONE pass over the bigram stream builds BOTH models as a
    * 256-row conditional aggregate (map-side partials absorb everything);
    * the model broadcasts back onto the stream and the per-doc sum is one
    * map-side-combined aggregation keyed by the doc. Rows never carry
    * anything wider than (id, 2-char bucket) through a shuffle.
    *
    * @param isTarget row predicate over `docs` marking the target sample
    * @return (idCol, n_feats, log_weight_1e8), one row per doc with ≥2
    *         tokens (docs without a bigram have no features — callers
    *         zero-fill if they need total coverage)
    */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
                     isTarget: Column): DataFrame = {
    val t = graft.Queries.fanOut(docs)
      .select(col(idCol).as("__id"), isTarget.as("__tgt"),
        split(lower(trim(col(textCol))), "\\s+").as("w"))
    // persisted: the model aggregation AND the scoring join both read the
    // hashed-bigram stream — without this the tokenize+explode+md5 runs
    // twice over the corpus (released via CacheRegistry)
    val bg = graft.CacheRegistry.register(
      t.filter(size(col("w")) >= 2)
        .select(col("__id"), col("__tgt"), explode(expr(
          "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))")).as("g"))
        .select(col("__id"), col("__tgt"),
          substring(md5(col("g")), 1, 2).as("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val model = bg.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
    val totals = model.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    // the per-feature score depends ONLY on the bucket, so the ln/round
    // runs 256 times on the model frame — never per occurrence (at corpus
    // scale that is 256 vs 10¹¹ libm calls). Each 8dp-rounded term is an
    // exact multiple of 1e-8, so it carries as an exact LONG in 1e-8 units
    // (|k| < 2^52 by construction) and the per-doc sum is a plain long
    // aggregation — bit-identical to the former DECIMAL(18,8) sum, minus
    // the per-row decimal arithmetic.
    def lnE8(c: Column): Column = round(round(log(c), 8) * 100000000L).cast("long")
    val model2 = model.crossJoin(broadcast(totals))
      .withColumn("s_e8",
        lnE8((col("ct") + 1).cast("double") / (col("nt") + 256).cast("double")) -
          lnE8((col("cr") + 1).cast("double") / (col("nr") + 256).cast("double")))
      .select("b", "s_e8")
    bg.join(broadcast(model2), "b")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_feats"),
        sum(col("s_e8")).as("log_weight_1e8"))
      .select(col("__id").as(idCol), col("n_feats"), col("log_weight_1e8"))
  }
}
