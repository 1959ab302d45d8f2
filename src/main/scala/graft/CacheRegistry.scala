package graft

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of every DataFrame the graft operators persist internally
  * (minhash shingle projections, jaccard doc aggregates, the Queries memo
  * cache). Operator outputs are lazy, so the operators themselves have no
  * safe point to unpersist — a one-shot Verify/Bench process simply exits,
  * but a long-lived service embedding this module would otherwise accumulate
  * cached RDDs without bound. Such a host calls [[unpersistAll]] at its own
  * quiescent points (e.g. after consuming an operator's output, or on
  * session close) to bound cache growth.
  */
object CacheRegistry {
  private val frames =
    new ConcurrentHashMap[SparkSession, ConcurrentLinkedQueue[DataFrame]]()
  private val hooks = new ConcurrentLinkedQueue[SparkSession => Unit]()

  /** Track a frame the caller just persisted; returns it unchanged. */
  private[graft] def register(df: DataFrame): DataFrame = {
    frames.computeIfAbsent(df.sparkSession, _ => new ConcurrentLinkedQueue[DataFrame]())
      .add(df)
    df
  }

  /** Extra per-session cleanup (e.g. evicting memo-map entries) run by
    * [[unpersistAll]] after the frames are unpersisted. */
  private[graft] def addHook(h: SparkSession => Unit): Unit = hooks.add(h)

  /** Unpersist every operator-cached frame registered for `spark` and run
    * the cleanup hooks. Returns the number of frames released. Safe to call
    * repeatedly; operators re-persist (and re-register) on next use.
    */
  def unpersistAll(spark: SparkSession, blocking: Boolean = false): Int = {
    val q = frames.remove(spark)
    val n = if (q == null) 0 else {
      val fs = q.asScala.toList
      fs.foreach(_.unpersist(blocking))
      fs.size
    }
    hooks.asScala.foreach(h => h(spark))
    n
  }
}
