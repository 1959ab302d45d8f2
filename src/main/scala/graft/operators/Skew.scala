package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-mitigation operators.
  *
  * AQE's skew-join/partition-coalescing handles moderate skew at runtime;
  * these are for the pathological cases a 100 TB corpus hits — a handful of
  * keys owning most of the rows (the empty-string language, the null
  * municipality, the boilerplate duplicate) where ONE reducer would
  * otherwise receive a whole key's rows.
  */
object Skew {

  // xxhash64 rejects MAP-typed columns at analysis time (maps have no
  // canonical order to hash) — salt entropy comes from every HASHABLE
  // column instead, so an irrelevant map metadata column can't fail the
  // whole operator (the topKPerKey lesson, generalized to the salted
  // siblings). A row that is ONLY maps salts constantly — the unsalted
  // plan, not an error.
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case _ => false
    }

  private def saltHashCols(df: DataFrame): Seq[Column] = {
    val cs = df.schema.fields.filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name)).toSeq
    if (cs.isEmpty) Seq(lit(1)) else cs
  }

  /** Two-stage salted aggregation: stage 1 groups by (key, salt) so a hot
    * key's rows spread over `salts` reducers and combine map-side; stage 2
    * combines the ≤`salts` partial rows per key. Result is IDENTICAL to a
    * direct `groupBy(key).agg(count, sum)` — the decomposition relies only
    * on count/sum being commutative monoids — but no reducer ever sees more
    * than ~1/salts of a hot key. The salt is a deterministic row hash, not
    * rand(): re-runs (and speculative re-executes) of a task salt
    * identically, so the operator stays idempotent.
    *
    * Sum columns are aggregated as exact DECIMAL(38,6) partials (double
    * partial sums would make the result depend on the salt split's
    * summation grouping).
    */
  def saltedCountSum(df: DataFrame, key: Column, keyName: String,
                     sumCol: Column, salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salt = pmod(xxhash64(struct(saltHashCols(df): _*)), lit(salts))
    df.select(key.as(keyName), sumCol.cast("decimal(38,6)").as("__v"),
        salt.as("__salt"))
      .groupBy(col(keyName), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum("__v").as("__s"))
      .groupBy(col(keyName))
      .agg(sum("__n").as("n"), sum("__s").as("s"))
  }

  /** Salted inner equi-join: the big side gets a deterministic row-hash
    * salt in [0, salts); the small side is replicated once per salt value;
    * the join runs on (key, salt), so a hot key's rows spread over `salts`
    * reducers instead of landing on one. Result is EXACTLY
    * `big.join(small, bigKey === smallKey)` — each big row matches the one
    * replica carrying its own salt.
    *
    * AQE's OptimizeSkewedJoin handles this at runtime by splitting skewed
    * partitions, but only for sort-merge joins whose output feeds no
    * partitioning-dependent parent; the explicit salt is the plannable
    * version — it also keeps working under `spark.sql.adaptive.enabled=
    * false` and when the join output must stay hash-distributed. Cost: the
    * small side shuffles ×salts (keep `salts` modest, 8–32).
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salt = pmod(xxhash64(struct(saltHashCols(big): _*)),
      lit(salts)).cast("int")
    val b = big.withColumn("__bsalt", salt)
    val s = small.withColumn("__ssalt",
      explode(array((0 until salts).map(lit): _*)))
    // SHUFFLE_HASH on the replicated small side: it is the natural build
    // side (per-partition build = |small|·salts/numPartitions, bounded by
    // construction), and hashing it skips the per-partition SORT of the
    // big side a sort-merge join would pay — the big side is exactly the
    // thing salting is protecting. A pure planner hint: join semantics
    // and the (key, salt) distribution are unchanged.
    b.join(s.hint("SHUFFLE_HASH"),
        b(bigKey) === s(smallKey) && b("__bsalt") === s("__ssalt"))
      .drop("__bsalt", "__ssalt")
  }

  /** Two-phase per-key top-K: `row_number() ≤ k` over each key by a TOTAL
    * order, skew-safe. A single `row_number` window sends EVERY row of a
    * hot key to one reducer — the C4/RefinedWeb per-domain cap meets
    * exactly that key distribution (one template site can own a large
    * fraction of a crawl). Phase 1 ranks within (key, salt) — a hot key's
    * rows spread over `salts` reducers, each keeping its local top-k —
    * then phase 2 ranks the ≤ k·salts survivors per key. Result is
    * IDENTICAL to the direct window: every global top-k row is in the
    * top-k of its salt bucket (the order is total), so phase 1 never
    * drops a winner, and phase 2 assigns the same ranks because every row
    * ordered before a top-k row also survives. The salt is a
    * deterministic row hash (same idempotence argument as
    * [[saltedCountSum]]).
    *
    * @param order a TOTAL order (include a unique tiebreak column —
    *              row_number over a partial order is nondeterministic in
    *              the direct window too, but here it could also change
    *              WHICH rows survive phase 1)
    * @return input columns + `rankName` (int, 1-based), rows with rank ≤ k
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                 k: Int, rankName: String = "rk", salts: Int = 16): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(salts >= 1, "salts must be >= 1")
    Seq("__tksalt", "__tkrn", rankName).foreach(n =>
      require(!df.columns.contains(n),
        s"topKPerKey reserves column name '$n' but the input already has it"))
    // salt over key + order-referenced columns only (the order is a TOTAL
    // order by contract, so these give full row entropy): hashing every
    // input column would break on un-hashable types the caller never
    // ranks by (xxhash64 rejects map columns at analysis time). Fall back
    // to all columns when the order refs can't be extracted (resolved
    // plans always yield them).
    val orderRefs = order.flatMap(
      org.apache.spark.sql.graftbridge.ColumnBridge.referencedNames).distinct
    // the narrowing is only safe when EVERY order ref resolved to a
    // top-level input column: a struct-field / qualified / case-mismatched
    // ref that silently dropped out would leave salt = hash(keys) —
    // constant per key, putting a hot key's every row in ONE salt bucket,
    // the exact single-reducer straggler this function exists to prevent.
    // Any unresolved ref ⇒ hash ALL columns (the map-type restriction
    // returns in that corner, loudly, at analysis time).
    val matched = orderRefs.filter(df.columns.contains)
    val saltCols =
      if (orderRefs.nonEmpty && matched.size == orderRefs.size)
        (keys ++ matched).distinct
      else df.columns.toSeq
    val salt = pmod(xxhash64(struct(saltCols.map(col).toIndexedSeq: _*)),
      lit(salts)).cast("int")
    val w1 = Window.partitionBy(keys.map(col) :+ col("__tksalt"): _*)
      .orderBy(order: _*)
    val pruned = df.withColumn("__tksalt", salt)
      .withColumn("__tkrn", row_number().over(w1))
      .filter(col("__tkrn") <= k)
      .drop("__tksalt", "__tkrn")
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    pruned.withColumn(rankName, row_number().over(w2))
      .filter(col(rankName) <= k)
  }
}
