package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    val salt = pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts))
    df.select(key.as(keyName), sumCol.cast("decimal(38,6)").as("__v"),
        salt.as("__salt"))
      .groupBy(col(keyName), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum("__v").as("__s"))
      .groupBy(col(keyName))
      .agg(sum("__n").as("n"), sum("__s").as("s"))
  }
}
