package graft

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames a query builder materialized (localCheckpoint /
  * cache) that must outlive the builder call but not the query run: the
  * harness mains (Bench, Verify) drain it after each query so checkpoint
  * blocks don't accumulate in executor storage for the life of the session
  * — ContextCleaner only frees them when the RDD is GC'd, which in a
  * long-lived bench/verify JVM can be never. At 100 TB the same discipline
  * applies: a pipeline that checkpoints a derived corpus per stage must
  * unpersist superseded stages explicitly (see Dedup.duplicateClusters for
  * the in-operator version of this rule).
  */
object Cleanup {
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a materialized DataFrame for later unpersist; returns it. */
  def register(df: DataFrame): DataFrame = { pending.add(df); df }

  /** Unpersist every registered DataFrame (non-blocking). Safe to call when
    * empty; safe to call repeatedly.
    */
  def drain(): Unit = {
    var df = pending.poll()
    while (df != null) { df.unpersist(); df = pending.poll() }
  }
}
