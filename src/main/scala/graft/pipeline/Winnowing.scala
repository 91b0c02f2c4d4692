package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Let

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03;
  * the MOSS algorithm): hash every character k-gram of the
  * whitespace-stripped normalized text, then keep the minimum hash of
  * each sliding window of `w` consecutive k-grams. Guarantees: any match
  * of length >= w+k-1 shares a fingerprint, and fingerprint density is
  * ~2/(w+1) of the grams — a tunable, position-robust signature that
  * exact-line or whole-doc hashing can't give.
  *
  * Everything is a per-row projection over higher-order functions
  * (sequence / transform / slice / array_min) — zero shuffles to
  * fingerprint a corpus, so the stage is embarrassingly parallel at any
  * scale. Pair generation then reuses the LSH playbook: explode the
  * (small) fingerprint set and equi-join on the fingerprint value, with a
  * document-frequency cap dropping degenerate grams shared by everything
  * (same boilerplate-control as [[Dedup.jaccardPairs]]).
  */
object Winnowing {

  /** Array of distinct winnowing fingerprints (md5 hex of each selected
    * k-gram; md5 so the DuckDB oracle reproduces values bit-for-bit).
    * Documents shorter than k+w-1 stripped chars yield an empty array.
    *
    * Normalize/strip stay in codegen'd Column land; the hash+select
    * kernel is the native [[graft.functions.WinnowFingerprints]]
    * expression — one O(n) monotonic-deque pass per row. The HOF
    * spelling below is the semantically-identical reference
    * implementation (equality property-checked in ProfileSpec) and
    * measured ~20x slower corpus-wide.
    */
  def fingerprintSet(text: Column, k: Int, w: Int): Column =
    graft.functions.VectorFunctions.winnowFps(
      replace(TextAnalysis.normalize(text), lit(" "), lit("")), k, w)

  /** Pure-builtin reference implementation of [[fingerprintSet]].
    *
    * The stripped text and the gram-hash array are [[Let]]-bound: each is
    * evaluated once per row. Referencing them straight from the window
    * lambda would re-run the normalize regex and all |s| md5s PER WINDOW
    * — O(n^2) regex work that turns a seconds-scan into minutes. Even
    * Let-bound, three nested CodegenFallback HOFs interpret per element —
    * which is why the native expression above owns the hot path.
    */
  def fingerprintSetHof(text: Column, k: Int, w: Int): Column =
    Let.let(replace(TextAnalysis.normalize(text), lit(" "), lit("")), s =>
      Let.let(
        transform(sequence(lit(1), greatest(length(s) - (k - 1), lit(0))),
          i => md5(s.substr(i, lit(k)))),
        grams => {
          val minima = transform(
            sequence(lit(1), size(grams) - (w - 1)),
            j => array_min(slice(grams, j, lit(w))))
          when(length(s) >= k + w - 1, array_distinct(minima))
            .otherwise(array().cast("array<string>"))
        }))

  /** One row per (id, fingerprint). */
  def fingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    docs.select(col(idCol),
      explode(fingerprintSet(col(textCol), k, w)).as("fp"))

  /** Near-duplicate candidate pairs: documents sharing >= `minShared`
    * fingerprints, excluding fingerprints occurring in more than
    * `maxDocFreq` documents (boilerplate). One fingerprint-keyed
    * aggregation + one pair-keyed aggregation — both map-side
    * combinable; no all-pairs stage anywhere.
    */
  def pairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4,
      minShared: Long = 2, maxDocFreq: Long = 50): DataFrame = {
    // NOT pinned (r16 A/B): the initial plan shows 4 Generate-over-union
    // subtrees (fps in the cap aggregation and the kept side, duplicated
    // across the self-join branches), but at runtime ReusedExchange
    // collapses the duplicated broadcast cap, and caching the exploded
    // (id, fp) rows measured a net LOSS (q50 2.46 → 3.01 s isolated
    // min, 4 reps): the native kernel re-eval is cheaper than the cache
    // materialization + read.
    val fps = fingerprints(docs, idCol, textCol, k, w)
    // df-cap BEFORE any pair generation: a boilerplate fingerprint shared
    // by everything would otherwise drive the self-join quadratic. Both
    // the cap aggregation and the self-join shuffle on `fp`, so the
    // exchange is reused, never widened.
    val dfCap = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select("fp")
    val kept = fps.join(dfCap, Seq("fp"))
    kept.select(col("fp"), col(idCol).as("id_a"))
      .join(kept.select(col("fp"), col(idCol).as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
