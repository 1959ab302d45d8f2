package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators for event/feature pipelines.
  *
  * The reference joins events to slowly-arriving dimension state with
  * "latest row at or before" semantics (latest-per-key reads, e.g.
  * `/root/reference/api/app/main.py` choropleth vintage selection) and
  * window-bounded correlation (session/period filters); these two
  * operators give both shapes a scale-safe Spark form:
  *
  *  - [[asofJoin]] — the classic feature-store/event-enrichment join
  *    ("what was the feature value when this event happened");
  *  - [[rangeJoinBinned]] — point-in-interval correlation without the
  *    BroadcastNestedLoopJoin that a raw theta-join degenerates to.
  */
object TemporalJoins {

  /** As-of join: for every left row, attach the payload of the latest
    * right row with the same key and `rightOrd` ≤ the left row's
    * `leftOrd` (nulls when no prior right row exists).
    *
    * Union-merge-window implementation: both sides are unioned into one
    * stream tagged by priority (right rows sort before left rows at equal
    * ord, giving ≤ semantics), hash-partitioned by key ONCE, sorted within
    * partitions, and swept with a running `last(payload, ignoreNulls)`.
    * At 100 TB this is the shape that survives: one exchange per side, no
    * per-key state beyond the sort, no interval explosion — versus the
    * point-in-validity-window join (explodes on wide windows) or a
    * broadcast of the right side (dies when the dimension history itself
    * is fact-sized). Wide validity gaps cost nothing: the sweep carries
    * the struct forward for free.
    *
    * The right side must be unique per (keys, rightOrd) — pre-aggregate
    * ties away ("latest of several rows at the same instant" is otherwise
    * ambiguous and would break determinism).
    *
    * @param left     probe side; ALL its columns are preserved
    * @param leftOrd  ordering column on the left (numeric/timestamp)
    * @param right    versioned side (key + ord + payload)
    * @param rightOrd ordering column on the right, same type as leftOrd
    * @param keys     equi-join key column names present on both sides
    * @param payload  right columns to carry onto matching left rows
    */
  def asofJoin(left: DataFrame, leftOrd: String, right: DataFrame,
               rightOrd: String, keys: Seq[String],
               payload: Seq[String]): DataFrame = {
    require(!keys.contains(leftOrd), "ordering column cannot be a join key")
    val extras = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftOrd)
    val rPre = right.select(
      keys.map(col) :+ col(rightOrd).as("__ord") :+
        struct(payload.map(col): _*).as("__p"): _*)
      // a version with no ordering value would sort NULLS FIRST and leak
      // its payload onto every pre-first-version left row — "no ord" means
      // "never valid", so drop it
      .filter(col("__ord").isNotNull)
      // null-KEYED versions drop too: the union+window implementation
      // would otherwise group them with null-keyed LEFT rows (window
      // partitioning is null-safe) and hand those rows a payload a plain
      // equi-join — the documented "same key" semantics, and the oracle's
      // SQL join — would never produce. Null-keyed left rows are KEPT and
      // get null payloads, like any unmatched probe row
      .filter(keys.map(col(_).isNotNull).reduceOption(_ && _).getOrElse(lit(true)))
    val pType = rPre.schema("__p").dataType
    val rAligned = extras.foldLeft(rPre.withColumn("__pri", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val lAligned = left.withColumnRenamed(leftOrd, "__ord")
      .withColumn("__pri", lit(1))
      .withColumn("__p", lit(null).cast(pType))
    // right-before-left at equal ord ⇒ a version stamped exactly at the
    // event instant is visible to it (≤, not <)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ord"), col("__pri"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned.select(lAligned.columns.map(col).toSeq: _*))
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__pri") === 1)
      .select(keys.map(col) ++ Seq(col("__ord").as(leftOrd)) ++
        extras.map(col) ++
        payload.map(p => col("__asof").getField(p).as(p)): _*)
  }

  /** Point-in-interval (range) join via bin bucketing: emit every
    * (point, interval) pair with equal keys and
    * `startCol ≤ ptCol ≤ endCol`.
    *
    * Spark executes a raw inequality join as BroadcastNestedLoopJoin —
    * every point scanned against every interval, a non-starter at scale.
    * Instead each interval is exploded to the fixed-width bins it overlaps
    * (⌈len/binWidth⌉+1 rows — pick binWidth near the typical interval
    * length to bound the blow-up at ~2×), each point lands in exactly ONE
    * bin, and the (keys, bin) equi-join + residual between-predicate emits
    * every qualifying pair EXACTLY once — no post-dedup shuffle. Catalyst
    * sees a plain equi-join and picks broadcast vs shuffle from stats/AQE
    * as usual; the interval side only ever grows by the small explode
    * factor.
    *
    * Column names other than `keys` must be disjoint between the two
    * frames (rename before calling).
    */
  def rangeJoinBinned(points: DataFrame, ptCol: String, intervals: DataFrame,
                      startCol: String, endCol: String, keys: Seq[String],
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedIv = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val binnedPt = points.withColumn("__bin",
      floor(col(ptCol) / binWidth).cast("long"))
    binnedPt.join(binnedIv, keys :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
