package org.apache.spark.sql.graftbridge


import org.apache.spark.sql.{Observation, Row}

/** `Observation`'s non-blocking accessors are `private[sql]`; the public
  * `get` BLOCKS forever when a repeated invocation's observed subtree is
  * served from the plan cache (the cached plan hides the new
  * CollectMetrics node, so its metrics never fire), and `getOrEmpty` NPEs
  * on the schema-less metrics Row some execution paths deliver. This
  * re-exports the raw-row accessor so callers can poll with a deadline and
  * read fields positionally — the same package-escape pattern as
  * [[ColumnBridge]].
  */
object ObservationBridge {
  def rowOrEmpty(o: Observation): Option[Row] = o.getRowOrEmpty
}
