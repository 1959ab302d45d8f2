package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of every DataFrame the graft operators persist internally
  * (minhash shingle projections, jaccard doc aggregates, CC edge lists, the
  * Queries memo cache). Operator outputs are lazy, so the operators
  * themselves have no safe point to unpersist — a one-shot Verify/Bench
  * process simply exits, but a long-lived service embedding this module
  * would otherwise accumulate cached RDDs without bound. Such a host calls
  * [[unpersistAll]] at its own quiescent points (e.g. after consuming an
  * operator's output, or on session close) to bound cache growth.
  *
  * register/unpersistAll are mutually synchronized: a registration cannot
  * land in a queue a concurrent unpersistAll has already drained (which
  * would orphan the frame — cached forever, invisible to later calls).
  * The actual `unpersist` calls run outside the lock so a slow blocking
  * unpersist cannot stall operators registering on other threads.
  */
object CacheRegistry {
  private val frames = mutable.Map.empty[SparkSession, mutable.ListBuffer[DataFrame]]
  private val hooks = mutable.ListBuffer.empty[SparkSession => Unit]
  private val lock = new Object

  /** Track a frame the caller just persisted; returns it unchanged.
    * `owner` keys the frame under a session other than `df.sparkSession` —
    * used when an operator persists on a call-scoped cloned session (CC's
    * loop session) but the host only ever calls unpersistAll on the
    * original: the frame must be released from the session the host knows.
    */
  private[graft] def register(df: DataFrame, owner: SparkSession = null): DataFrame = {
    val key = if (owner != null) owner else df.sparkSession
    lock.synchronized {
      frames.getOrElseUpdate(key, mutable.ListBuffer.empty) += df
    }
    df
  }

  /** Extra per-session cleanup (e.g. evicting memo-map entries) run by
    * [[unpersistAll]] after the frames are unpersisted. */
  private[graft] def addHook(h: SparkSession => Unit): Unit =
    lock.synchronized { hooks += h }

  /** Unpersist every operator-cached frame registered for `spark` and run
    * the cleanup hooks. Returns the number of frames released. Safe to call
    * repeatedly and concurrently with operator builds; operators re-persist
    * (and re-register) on next use.
    */
  def unpersistAll(spark: SparkSession, blocking: Boolean = false): Int = {
    val (fs, hs) = lock.synchronized {
      (frames.remove(spark).map(_.toList).getOrElse(Nil), hooks.toList)
    }
    fs.foreach(_.unpersist(blocking))
    hs.foreach(h => h(spark))
    fs.size
  }
}
