package graft

/** One flush for every operator-level [[graft.util.PlanCache]] in the
  * library. The caches are the right default inside a session (repeat
  * queries over one corpus reuse the expensive shingle/normalize/hash
  * projections), but a benchmark timing MANY corpus-sized operators in
  * one JVM accumulates several multi-GB persisted frames whose storage
  * blocks compete with the next query's execution memory — at the
  * corpus-100× tier that inflated an unrelated query 7× (measured:
  * tx22 9.8 s in a fresh JVM vs 67 s after tx06's 500k-doc prep stayed
  * persisted). Flushing between tier queries makes each number the
  * query's own self-contained cost. */
object Caches {
  def releaseAll(): Unit = {
    // every PlanCache in the process, via the self-registration sweep
    // (operator AND query-module caches — a hand-kept list here once
    // missed five of the nine instances)
    graft.util.PlanCache.releaseAll()
    // Similarity predates PlanCache and keeps its own LRU + memoized
    // quantizer/codebook state — its hook flushes those
    graft.similarity.Similarity.releaseCaches()
  }
}
