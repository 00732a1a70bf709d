package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tracks DataFrames persisted INSIDE operator pipelines (shared shingle sets,
  * normalized embedding views, triangle witness tables, …) so they can be
  * released once a query's results are materialized — round-1 audit: operators
  * persisted intermediates they could never unpersist (the caller materializes
  * after the operator returns), a cache leak in a long-lived session.
  *
  * Operators call [[persist]] instead of `df.persist()`; harness code
  * (Bench/Verify, or an embedding application) calls [[release]] after
  * materializing. Deliberate session-lifetime caches (the memoized canonical /
  * oriented edge tables in [[SparkEntry]]) do NOT go through the tracker — they
  * are shared across queries by design and released by
  * [[SparkEntry.releaseCaches]].
  */
object CacheTracker {

  private val tracked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, DataFrame)]()

  /** Persist `df` and remember it for later [[release]]. */
  def persist(df: DataFrame): DataFrame = {
    tracked.add((df.sparkSession, df))
    df.persist()
  }

  /** Unpersist every tracked frame of `spark` (non-blocking). */
  def release(spark: SparkSession): Unit = {
    val it = tracked.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e._1 eq spark) {
        it.remove()
        try e._2.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }
  }

  private[graft] def trackedCount(spark: SparkSession): Int = {
    var n = 0
    tracked.forEach(e => if (e._1 eq spark) n += 1)
    n
  }
}
