package graft.util

import org.apache.spark.sql.DataFrame

/** One-generation cache registry for operators that return LAZY frames
  * built over cached intermediates (the dedup/similarity pair
  * generators): the cache must outlive the function return — the
  * caller's action is what materializes it — so a `finally` unpersist
  * inside the operator is impossible. Left alone, every invocation in a
  * long-lived session adds another never-unpersisted CacheManager entry
  * (cache entries are strong references — LRU evicts their BLOCKS under
  * pressure, but the entries themselves accumulate forever).
  *
  * [[rotate]] bounds that: caching a new generation under an operator
  * key unpersists the previous generation, so a session holds at most
  * ONE generation of pair-stage caches per operator. Unpersisting under
  * concurrency is safe — an in-flight consumer of the old generation
  * recomputes from lineage (slower, never wrong).
  */
object CacheSlots {

  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFrame]]()

  /** Register `dfs` under `key`, unpersist the previously registered
    * generation, THEN cache the new one. Returns `dfs` for chaining.
    *
    * The unpersist-BEFORE-cache order is load-bearing: a re-invocation
    * on the same input produces a plan-identical generation, and the
    * CacheManager dedups identical plans into one shared entry — with
    * the opposite order the unpersist would evict the entry the new
    * generation just registered (silently un-caching the operator).
    * Dropping the stale entry first and re-registering is always safe,
    * and it avoids the sameResult guard that order would need: plan
    * canonicalization on real operator trees measured 40-90 ms per
    * call and perturbed AQE cache planning (a reproducible +0.5 s and
    * a different stage count on the q24 bench row).
    *
    * Rotation is ATOMIC (one global lock): un-synchronized, two
    * concurrent rotations of the same key could interleave so the
    * losing generation is cached after the winner unpersisted it —
    * a CacheManager entry no later rotation can reach, the exact leak
    * this registry exists to bound. The lock covers driver-side
    * bookkeeping only (unpersist(blocking=false), lazy cache
    * registration), so it is microseconds, not job-length. Note the
    * deliberate limit: a generation is keyed per OPERATOR, so
    * concurrent invocations with different inputs still unpersist each
    * other's caches — the in-flight loser recomputes from lineage
    * (slower, never wrong; every cached plan here is deterministic).
    */
  def rotate(key: String, dfs: DataFrame*): Seq[DataFrame] = synchronized {
    val prev = slots.put(key, dfs.toVector)
    if (prev != null) prev.foreach(_.unpersist(false))
    dfs.foreach(_.cache())
    dfs.toVector
  }

  /** [[rotate]] for the single-frame case. */
  def rotateOne(key: String, df: DataFrame): DataFrame = {
    rotate(key, df); df
  }
}
