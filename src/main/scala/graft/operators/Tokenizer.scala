package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the "learn the tokenizer from the
  * corpus" step of a training-data pipeline (Sennrich et al. 2016,
  * arXiv:1508.07909).
  *
  * Scale design: the corpus is touched ONCE, to build word counts; every
  * merge round after that operates on the VOCABULARY (words × current
  * token splits), which is orders of magnitude smaller than the corpus and
  * stays fully distributed. Per round: one map-side-combined pair-count
  * aggregation, a top-1 collect of a single row (the best pair — the only
  * driver traffic, mirroring [[Similarity.kmeansFit]]'s centroids), and a
  * codegen'd fold that applies the merge to every word's token list. The
  * round-over-round frame is localCheckpoint'ed with eager release, the
  * same lineage-truncation pattern as [[Dedup.connectedComponents]].
  *
  * Divergence from reference BPE implementations: no end-of-word marker
  * token (merges never cross word boundaries here either, since folding is
  * per word — the marker only matters for detokenization, which is out of
  * scope).
  */
object Tokenizer {

  /** Greedy left-to-right single-merge application: fold the token list,
    * joining each (l, r) adjacency into m. Non-overlapping by
    * construction — a token just created by the merge is compared as its
    * merged form and cannot re-match `l` unless it literally equals it. */
  private def applyMerge(toks: Column, l: String, r: String, m: String): Column =
    aggregate(toks, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
        .otherwise(concat(acc, array(x))))

  /** Lowercased letter-run words — the tokenization every BPE entry point
    * shares. */
  private def wordsOf(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}]+"), x => length(x) > 0)

  /** One word → its BPE token list: character split, then the merge rules
    * folded in rank order. The single source of the encode semantics —
    * [[bpeEncode]] and [[bpeEncodeCorpus]] both call this. */
  private def encodeWord(w: Column,
                         mergeRules: Seq[(String, String, String)]): Column =
    mergeRules.foldLeft(
      transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))) {
      case (acc, (l, r, m)) => applyMerge(acc, l, r, m)
    }

  /** Encode text with a learned merge table, row-locally: per-word
    * [[encodeWord]], flattened back to one token list. The merge table
    * rides into the plan as literals. The folds are interpreted HOFs — use
    * [[bpeEncodeCorpus]] for corpus-scale batch work, this form for
    * streams and small frames.
    *
    * @param mergeRules (l, r, merged) in rank order, from [[bpeFit]]
    */
  def bpeEncode(text: Column, mergeRules: Seq[(String, String, String)]): Column =
    flatten(transform(wordsOf(text), w => encodeWord(w, mergeRules)))

  /** Corpus-scale BPE token counting: encode each DISTINCT word once
    * (vocabulary-sized fold work — the merge folds are interpreted HOFs,
    * so running them per word OCCURRENCE costs the corpus/vocabulary ratio
    * more for identical results; measured 25 s → 2 s at sf0.1), then join
    * occurrences back through the encoded dictionary and sum per document.
    * This is also how production tokenizers amortize encoding. Documents
    * with no words come back with 0.
    *
    * @return (idCol, n_bpe_tokens) one row per input document
    */
  def bpeEncodeCorpus(docs: DataFrame, idCol: String, textCol: String,
                      mergeRules: Seq[(String, String, String)]): DataFrame = {
    // the distinct-vocab build and the occurrence join both read the word
    // stream — persist so the corpus splits once (released via CacheRegistry)
    val words = graft.CacheRegistry.register(
      docs.select(col(idCol), explode(wordsOf(col(textCol))).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val vocab = words.select("w").distinct()
      .select(col("w"),
        size(encodeWord(col("w"), mergeRules)).cast("long").as("n"))
    docs.select(col(idCol))
      .join(words.join(vocab, "w").groupBy(idCol)
        .agg(sum("n").as("__sum")), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__sum"), lit(0L)).as("n_bpe_tokens"))
  }

  /** Learn the first `merges` BPE merge rules from a text corpus.
    *
    * Deterministic end-to-end: tokenization = lowercased letter runs (the
    * corpus-stats convention), ties on pair count break lexicographically
    * (left asc, right asc) — so the learned table is reproducible across
    * runs and engines.
    *
    * @return one row per merge, in order: (merge_rank 1-based, l, r,
    *         merged, pair_count at the time of the merge)
    */
  def bpeFit(docs: DataFrame, textCol: String,
             merges: Int): Seq[(Int, String, String, String, Long)] = {
    require(merges >= 1, "need at least one merge")
    var vocab = docs
      .select(explode(wordsOf(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("t", encodeWord(col("w"), Nil))
      .localCheckpoint(true)
    def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    var prevCkpt = ckptRdd(vocab)
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val best = vocab
        .select(col("cnt"), explode(zip_with(
          slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
          slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
          (a, b) => struct(a.as("l"), b.as("r")))).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("cnt").cast("long").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word fused to one token
      else {
        val l: String = best(0).getString(0)
        val r: String = best(0).getString(1)
        val c: Long = best(0).getLong(2)
        val m = l + r
        out += ((rank, l, r, m, c))
        val next = vocab.withColumn("t", applyMerge(col("t"), l, r, m))
          .localCheckpoint(true)
        prevCkpt.foreach(_.unpersist(false))
        prevCkpt = ckptRdd(next)
        vocab = next
        rank += 1
      }
    }
    prevCkpt.foreach(_.unpersist(false))
    out.result()
  }
}
