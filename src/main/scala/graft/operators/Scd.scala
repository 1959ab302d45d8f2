package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 maintenance (Kimball's SCD2) as pure
  * DataFrame algebra — the MERGE-style upsert a warehouse needs without
  * assuming a transactional table format: versions carry
  * (valid_from, valid_to, is_current), updates close the current version
  * and open a new one only when an attribute actually changed.
  *
  * Scale shape: ONE full-outer equi-join of the OPEN slice against the
  * update batch (history rows never join — they pass through, and with the
  * dimension stored partitioned by `is_current` they are not even
  * scanned), then a single-pass classify-and-explode that emits 1 or 2
  * rows per joined key — no second join, no window. With the dim bucketed
  * by key ([[graft.marts.Marts]] writeBucketed) the merge runs without a
  * dim-side exchange.
  */
object Scd {

  /** Apply one update batch to an SCD2 dimension.
    *
    * @param dim      current SCD2 table: keyCols ++ attrCols ++
    *                 (valid_from non-null, valid_to, is_current)
    * @param updates  key-unique batch: keyCols ++ attrCols ++ effCol
    *                 (dedup upstream, e.g. [[Dedup.exact]] latest-wins)
    * @param effCol   the batch's effective timestamp/date column
    * @return the post-merge SCD2 table, same columns as `dim`:
    *         changed open rows closed at eff; changed or brand-new keys
    *         open a new version at eff; identical updates are no-ops;
    *         history rows pass through untouched. Attribute comparison is
    *         null-safe (a NULL attr equals NULL — no churn on NULLs).
    *         Updates with a NULL eff are UNVERSIONABLE and fail closed:
    *         an existing key keeps its open version unchanged, a
    *         brand-new key emits nothing — never a version row with
    *         valid_from = NULL, which would corrupt the dimPresent
    *         contract every later merge relies on.
    */
  def scd2Apply(dim: DataFrame, updates: DataFrame, keyCols: Seq[String],
                attrCols: Seq[String], effCol: String): DataFrame = {
    val validToType = dim.schema("valid_to").dataType
    val keys = keyCols.map(col)
    // explicit presence marker (the upsert convention) — inferring
    // presence from __eff.isNotNull conflated "no update row joined" with
    // "update row whose eff is NULL", silently dropping the latter's
    // changed attributes and, worse, inserting brand-new keys with
    // valid_from = NULL (which the NEXT merge's dimPresent contract then
    // misclassifies, overwriting the open version without closing it)
    val u = updates.select(
      keyCols.map(col) ++
        attrCols.map(a => col(a).as(s"__u_$a")) :+
        col(effCol).as("__eff") :+ lit(true).as("__u_present"): _*)
    val open = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current"))
    val j = open.join(u, keyCols, "full_outer")
    val dimPresent = col("valid_from").isNotNull // non-null by SCD2 contract
    val updPresent = col("__u_present").isNotNull
    val effOk = col("__eff").isNotNull
    val same = attrCols.map(a => col(a) <=> col(s"__u_$a")).reduce(_ && _)
    def row(attrs: Seq[Column], vf: Column, vt: Column, cur: Column): Column =
      struct(keys ++ attrs :+ vf.as("valid_from") :+
        vt.cast(validToType).as("valid_to") :+ cur.as("is_current"): _*)
    val keepOld = row(attrCols.map(col), col("valid_from"), col("valid_to"),
      col("is_current"))
    val closed = row(attrCols.map(col), col("valid_from"), col("__eff"),
      lit(false))
    val fresh = row(attrCols.map(a => col(s"__u_$a").as(a)), col("__eff"),
      lit(null), lit(true))
    val branches =
      when(dimPresent && updPresent && effOk && !same, array(closed, fresh))
        .when(dimPresent, array(keepOld)) // no/no-op/unversionable update
        .when(updPresent && effOk, array(fresh)) // brand-new key
        // brand-new key with a NULL eff: unversionable — FAIL CLOSED with
        // an empty branch (slice(_,1,0) = typed empty array; explode
        // drops it) rather than open a version with valid_from = NULL
        .otherwise(slice(array(fresh), 1, 0))
    val outCols = (keyCols ++ attrCols ++ Seq("valid_from", "valid_to", "is_current")).map(col)
    hist.select(outCols: _*)
      .unionAll(j.select(explode(branches).as("__r")).select(col("__r.*"))
        .select(outCols: _*))
  }

  /** Type-1 MERGE (upsert, no history): source rows overwrite matching
    * target rows, unmatched source rows insert, unmatched target rows pass
    * through — `MERGE INTO t USING s ON key WHEN MATCHED THEN UPDATE WHEN
    * NOT MATCHED THEN INSERT`, as pure DataFrame algebra over plain
    * parquet. Emits a `merge_action` audit column
    * (update / insert / keep / noop): `noop` = matched but every attribute
    * already null-safe-equal, the rows a real writer would skip rewriting.
    * Key matching is null-safe (see inline note) — ANSI MERGE would leave
    * null-keyed rows unmatched; here they merge, which is what makes the
    * streaming sink built on this operator idempotent under replay.
    *
    * Scale shape: ONE full-outer equi-join on the key, no window, no
    * second pass; with the target bucketed by key the join runs without a
    * target-side exchange, and the action column drives partition-level
    * write skipping (partitions whose rows are all keep/noop need no
    * rewrite).
    */
  def upsert(target: DataFrame, source: DataFrame, keyCols: Seq[String],
             attrCols: Seq[String]): DataFrame = {
    val s = source.select(
      keyCols.map(k => col(k).as(s"__s_$k")) ++
        attrCols.map(a => col(a).as(s"__s_$a")) :+
        lit(true).as("__s_present"): _*)
    val t = target.select(
      keyCols.map(col) ++ attrCols.map(col) :+ lit(true).as("__t_present"): _*)
    // NULL-SAFE key match (<=>), diverging deliberately from ANSI MERGE's
    // ON-equality (which never matches NULL keys): a null-keyed target row
    // must absorb its source twin as noop/update, not accumulate an
    // insert per batch — the same rule the idempotent append sink applies
    val cond = keyCols.map(k => col(k) <=> col(s"__s_$k"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val j = t.join(s, cond, "full_outer")
    val same = attrCols.map(a => col(a) <=> col(s"__s_$a"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val action =
      when(col("__t_present").isNull, lit("insert"))
        .when(col("__s_present").isNull, lit("keep"))
        .when(same, lit("noop"))
        .otherwise(lit("update"))
    // keys via the present flags, NOT coalesce — a matched null key must
    // stay null rather than fall through to the other (also null) side
    val keys = keyCols.map { k =>
      when(col("__t_present").isNotNull, col(k)).otherwise(col(s"__s_$k")).as(k)
    }
    val merged = attrCols.map { a =>
      when(col("__s_present").isNotNull, col(s"__s_$a")).otherwise(col(a)).as(a)
    }
    j.select(keys ++ merged :+ action.as("merge_action"): _*)
  }
}
