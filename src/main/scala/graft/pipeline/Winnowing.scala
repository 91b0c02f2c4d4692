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
    *
    * Shape (r16): group-then-combine. The previous df-cap + self-join
    * spelling evaluated the fps subtree — scan + normalize + the
    * md5-heavy winnow kernel, the dominant per-row cost — FOUR times in
    * the executed plan (the cap aggregation duplicated under both
    * broadcast branches, plus both self-join sides; no exchange reuse
    * fired). Collecting each fingerprint's member ids in ONE
    * aggregation runs the kernel once and replaces the self-join with
    * an in-row combination explode. The collector is the capped
    * aggregate ([[graft.functions.CappedCollectLongAgg]], cap + 1
    * elements max), so the one-giant-key skew the df-cap guards against
    * cannot OOM the aggregation buffer either: over-cap groups arrive
    * truncated at maxDocFreq + 1 and are dropped by the size filter —
    * exactly the rows the old df-cap dropped. Isolated A/B at sf0.1 is
    * in OPTIMIZATION_r16.md (q50/q92/q105 share this path).
    */
  def pairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4,
      minShared: Long = 2, maxDocFreq: Long = 50): DataFrame = {
    require(maxDocFreq < Int.MaxValue, "maxDocFreq must fit in an Int")
    // the capped collector is long-typed; integral ids round-trip
    // losslessly (the cast pair is a no-op for the bigint callers)
    val idType = docs.schema(docs.schema.fieldIndex(idCol)).dataType
    val fps = fingerprints(docs, idCol, textCol, k, w)
    val groups = fps.groupBy("fp")
      .agg(graft.functions.VectorFunctions
        .cappedCollect(col(idCol).cast("long"), maxDocFreq.toInt + 1)
        .as("ids"))
      // size == maxDocFreq + 1 ⇔ over the df cap (truncated) → dropped;
      // size 1 pairs with nothing
      .filter(size(col("ids")).between(2, maxDocFreq))
      .select("ids")
    // all unordered member pairs per fingerprint: two chained explodes
    // (codegen'd Generates) with the a < b orientation filter — group
    // fanout is bounded by the cap, so this stage is O(cap) per group
    groups
      .select(col("ids"), explode(col("ids")).as("id_a"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("id_a").cast(idType).as("id_a"),
        col("id_b").cast(idType).as("id_b"), col("n_shared"))
  }
}
