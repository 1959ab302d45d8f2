package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Blocklist filtering — remove every row whose key appears in a ban list
  * (URL blocklists, opted-out creators, benchmark digests, licensing
  * takedowns). Exact anti-join semantics; the interesting part is doing it
  * when the blocklist is too big to broadcast but the corpus is 100 TB.
  */
object Blocklist {

  /** Exact `big ANTI JOIN blocklist` with a Bloom-filter pre-pass.
    *
    * A plain anti-join on a non-broadcastable blocklist shuffles the ENTIRE
    * big side on the key. Instead:
    *  1. the blocklist aggregates into a Bloom sketch (Spark's native
    *     `BloomFilterAggregate` — built distributed via partial aggregates,
    *     only the ~1.2 MB/10⁶-keys bitmap reaches the driver);
    *  2. the sketch becomes a LITERAL in a codegen'd `might_contain`
    *     predicate (the same expression Spark's runtime row-level filtering
    *     injects), evaluated at the scan: rows the filter rejects are
    *     DEFINITELY clean and never shuffle;
    *  3. only the might-contain candidates (true hits + the ~1% false
    *     positives) take the exact anti-join that removes FPs.
    * The big side is scanned twice (clean branch + candidate branch), but
    * scans prune columns and the predicate is codegen — trading a full
    * corpus shuffle for a second cheap scan is the right side of the
    * bargain at any scale where the blocklist doesn't broadcast.
    *
    * The result is EXACTLY the anti-join (FPs are removed by step 3) — the
    * sketch only reduces work, never changes the answer.
    *
    * @param fpBits bloom bits per blocklist key (≈9.6 → 1% FP; raise to
    *               shrink the candidate branch, lower to shrink the sketch)
    */
  def bloomAntiJoin(big: DataFrame, keyCol: Column,
                    blocklist: DataFrame, blockKeyCol: Column,
                    fpBits: Double = 10.0): DataFrame = {
    // persisted: three consumers read the key projection (count job,
    // bloom-aggregate job, anti-join build side) — released via CacheRegistry
    val keys = graft.CacheRegistry.register(
      blocklist.select(blockKeyCol.as("__bk")).filter(col("__bk").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // sketch sizing needs the cardinality — one count job over the (small
    // relative to `big`) blocklist, then one aggregate job for the bitmap
    val nKeys = keys.count()
    // empty blocklist: BloomFilterAggregate.eval returns null (might_contain
    // of a null sketch is null, which would drop EVERY row from BOTH
    // branches) — nothing is blocked, so the answer is `big` itself
    if (nKeys == 0L) return big
    val numBits = math.max(64L, (nKeys * fpBits).toLong)
    // Spark silently Math.min-clamps the sizing against the runtime-filter
    // session caps (default 4M items / 64M bits) — a saturated sketch would
    // keep results EXACT but send ~everything through the candidate branch,
    // voiding the operator; raise the caps for the one aggregate job below,
    // restoring the prior session values afterwards so later queries (and
    // Spark's own injected runtime bloom filters) keep their intended sizing
    val conf = big.sparkSession.conf
    val capKeys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> nKeys,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits)
    val saved = capKeys.map { case (k, _) => k -> conf.getOption(k) }
    val bloomBin =
      try {
        capKeys.foreach { case (k, need) =>
          if (conf.getOption(k).map(_.toLong).getOrElse(0L) < need)
            conf.set(k, need.toString)
        }
        val agg = new BloomFilterAggregate(
          ColumnBridge.expression(xxhash64(col("__bk"))),
          Literal(nKeys), Literal(numBits), 0, 0)
        keys.select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
          .head().getAs[Array[Byte]](0)
      } finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    val might = ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBin, BinaryType),
      ColumnBridge.expression(xxhash64(keyCol))))
    // coalesce(might, false): a NULL key hashes null-safely, but the
    // documented contract is "EXACTLY the anti-join", which KEEPS left rows
    // with null keys (null = anything is never true) — route any
    // null-valued predicate to the clean branch rather than dropping the
    // row from both
    val clean = big.filter(!coalesce(might, lit(false)))
    val candidates = big.filter(coalesce(might, lit(false)))
      .join(keys, keyCol === col("__bk"), "left_anti")
    clean.unionByName(candidates)
  }
}
