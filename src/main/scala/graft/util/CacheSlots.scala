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

  /** Cache every frame in `dfs` and register them under `key`,
    * unpersisting the generation previously registered there. Returns
    * `dfs` for chaining.
    *
    * A previous-generation frame whose plan is `sameResult` as a new one
    * is NOT unpersisted: the CacheManager dedups identical plans into a
    * shared entry, so dropping the old frame would evict the entry the
    * new generation just registered (a re-invocation on the same input
    * would silently un-cache itself — the bench-documented
    * shared-entry poison, in reverse).
    */
  def rotate(key: String, dfs: DataFrame*): Seq[DataFrame] = {
    dfs.foreach(_.cache())
    val prev = slots.put(key, dfs.toVector)
    if (prev != null) prev
      .filterNot(p => dfs.exists(d =>
        d.queryExecution.analyzed.sameResult(p.queryExecution.analyzed)))
      .foreach(_.unpersist(false))
    dfs.toVector
  }

  /** [[rotate]] for the single-frame case. */
  def rotateOne(key: String, df: DataFrame): DataFrame = {
    rotate(key, df); df
  }
}
