package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * A bounded, access-ordered memoization cache for persisted DataFrames,
 * keyed by the canonicalized logical plan of the frame being persisted.
 *
 * Why this exists: operators like MinHash LSH and IVF search build an
 * expensive projection (shingling, vector normalization) consumed by
 * several downstream plans. Persisting it once per distinct source is
 * the right move, but a bare `.persist()` with no lifecycle leaks a
 * MEMORY_AND_DISK frame per call for the session's lifetime. This cache
 * gives every such projection the same treatment:
 *
 *  - memoized per canonicalized plan, so repeated queries over the same
 *    source reuse one persisted frame instead of re-registering;
 *  - LRU-bounded: beyond `maxEntries` the least-recently-used frame is
 *    unpersisted and rebuilt on next touch (projections are
 *    deterministic, so eviction never changes results, only cost);
 *  - session-validity guarded: canonicalized scans can collide across
 *    sessions in one JVM, and a frame from a stopped session is dead;
 *  - explicitly flushable via [[clear]] for long multi-corpus sessions.
 */
object PlanCache {
  // every instance self-registers so a process-wide flush reaches
  // caches the flusher has never heard of (new query modules included)
  private val instances =
    new java.util.concurrent.CopyOnWriteArrayList[PlanCache]()
  private[util] def register(c: PlanCache): Unit = { instances.add(c); () }

  /** Flush EVERY PlanCache in the process — the bench's cold-cost mode
    * and long multi-corpus sessions need the full sweep, not a
    * hand-maintained list that silently misses a module's cache. */
  def releaseAll(): Unit = instances.forEach(_.clear())
}

final class PlanCache(val maxEntries: Int) {

  PlanCache.register(this)

  // access-ordered LinkedHashMap = LRU; eviction unpersists so the
  // executor-side blocks go with the map entry, not at session death
  private val cache = new java.util.LinkedHashMap[LogicalPlan, DataFrame](
      16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[LogicalPlan, DataFrame]): Boolean =
      if (size() > maxEntries) {
        e.getValue.unpersist(blocking = false); true
      } else false
  }

  /** The persisted frame for `df`'s canonicalized plan, building and
    * persisting (MEMORY_AND_DISK) on first touch. */
  def persisted(df: DataFrame): DataFrame = {
    val key = df.queryExecution.analyzed.canonicalized
    cache.synchronized {
      val cached = cache.get(key)
      if (cached != null && !cached.sparkSession.sparkContext.isStopped) cached
      else {
        val persisted =
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cache.put(key, persisted)
        persisted
      }
    }
  }

  // Row counts are deterministic per canonicalized plan (sources are
  // immutable fixtures), so the memo survives frame eviction: an
  // evicted-and-rebuilt frame has the same count. Bounded at 4x the
  // frame cap — counts are 8 bytes, frames are gigabytes.
  private val counts = new java.util.LinkedHashMap[LogicalPlan, java.lang.Long](
      16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[LogicalPlan, java.lang.Long]): Boolean =
      size() > math.max(maxEntries * 4, 16)
  }

  /** `df.count()` memoized by canonicalized plan — callers that size a
    * plan from its input cardinality (e.g. adaptive banding depth) pay
    * the counting job once per distinct source, not once per call. */
  def memoizedCount(df: DataFrame): Long = {
    val key = df.queryExecution.analyzed.canonicalized
    val hit = counts.synchronized(counts.get(key))
    if (hit != null) hit.longValue()
    else {
      // count OUTSIDE the lock: a Spark job under `counts.synchronized`
      // would serialize unrelated callers behind one action
      val n = df.count()
      counts.synchronized(counts.put(key, n))
      n
    }
  }

  def size: Int = cache.synchronized(cache.size)

  /** Unpersist and drop every cached frame — the full flush. */
  def clear(): Unit = cache.synchronized {
    cache.values.forEach(df => { df.unpersist(blocking = false); () })
    cache.clear()
  }
}
