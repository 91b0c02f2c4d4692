package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via hashed n-gram importance resampling
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): estimate bag-of-hashed-n-gram unigram+bigram
  * distributions for a small high-quality *target* corpus and the large
  * *raw* corpus, then score every raw document by its log importance
  * weight Σ log(p_target(b)/p_raw(b)) over its gram buckets and keep the
  * top-weighted documents.
  *
  * Shape at 100 TB: the two distribution fits are single
  * map-side-combinable aggregations collapsing to `buckets` cells each —
  * the per-partition partial agg does all the work, the shuffle moves at
  * most `buckets` rows per partition. The fitted log-ratio table is
  * driver-small (one double per bucket; the paper uses 10^4, we default
  * 2^11) and ships to executors as an array literal, so scoring is a
  * zero-shuffle, zero-join projection over the corpus scan — the same
  * broadcast-parameters pattern as [[TextAnalysis.hashedLinearScore]]
  * and the k-means assignment path. Selection is `orderBy(...).limit(k)`
  * = TakeOrderedAndProject: per-partition top-k then a driver merge of
  * k-row heads, never a global sort shuffle. For bucket counts past
  * driver comfort (10^8+), swap the literal for a broadcast join on the
  * bucket id; the two fit aggregations are unchanged.
  *
  * Gram hashing reuses the md5-bucket idiom (14 hex chars → long) so the
  * whole path stays reproducible in any engine with md5.
  */
object Dsir {

  /** Hashed unigram+bigram multiset of a document, as bucket ids.
    * Row-local; bigrams join with '_' before hashing. The token array is
    * let-bound: Catalyst does not CSE an outer expression referenced
    * inside a HOF lambda, so without the binding every `element_at(w, i)`
    * in the bigram lambda would re-run the whole normalize+split per
    * element — O(tokens²) regex work per document (measured 50× on q76).
    */
  def gramBuckets(text: Column, buckets: Int): Column =
    graft.functions.Let.let(TextAnalysis.tokens(text), w => {
      val bigrams = when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat_ws("_", element_at(w, i), element_at(w, i + 1))))
        .otherwise(array().cast("array<string>"))
      transform(concat(w, bigrams),
        g => conv(substring(md5(g), 1, 14), 16, 10).cast("long") % buckets)
    })

  /** Corpus gram-bucket histogram: `buckets`-or-fewer rows of
    * (bucket, cnt). One combinable aggregation — partial counts collapse
    * map-side, only bucket cells cross the wire.
    */
  def bucketCounts(docs: DataFrame, textCol: String, buckets: Int): DataFrame =
    docs
      .select(explode(gramBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))

  private def ratiosFrom(
      t: Array[Long], r: Array[Long], buckets: Int): Array[Double] = {
    val tTot = (t.sum + buckets).toDouble
    val rTot = (r.sum + buckets).toDouble
    Array.tabulate(buckets)(b =>
      math.log((t(b) + 1) / tTot) - math.log((r(b) + 1) / rTot))
  }

  /** Fit per-bucket log importance ratios with add-one smoothing:
    * w_b = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B)). The result is
    * driver-small by construction (B doubles). Use this form when target
    * and raw are genuinely different corpora (the paper's
    * Wikipedia-vs-CommonCrawl setting — two scans are unavoidable).
    */
  def fitLogRatios(
      target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int): Array[Double] = {
    def hist(d: DataFrame): Array[Long] = {
      val h = new Array[Long](buckets)
      bucketCounts(d, textCol, buckets).collect()
        .foreach(r => h(r.getLong(0).toInt) = r.getLong(1))
      h
    }
    ratiosFrom(hist(target), hist(raw), buckets)
  }

  /** One-pass fit for the common case where the target is a *slice* of
    * the raw corpus (a predicate): both histograms come out of a single
    * gram-hashing scan — raw count and `count_if(isTarget)` in the same
    * combinable aggregation. Halves the dominant cost (per-gram md5).
    */
  def fitLogRatiosFlagged(
      docs: DataFrame, isTarget: Column, textCol: String,
      buckets: Int): Array[Double] = {
    val t = new Array[Long](buckets)
    val r = new Array[Long](buckets)
    docs
      .select(isTarget.as("__dsir_t"),
        explode(gramBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("r"), count_if(col("__dsir_t")).as("t"))
      .collect()
      .foreach { x =>
        val b = x.getLong(0).toInt
        r(b) = x.getLong(1); t(b) = x.getLong(2)
      }
    ratiosFrom(t, r, buckets)
  }

  /** Score documents by summed log importance weight — a pure
    * projection: tokenize, hash, look each bucket up in the literal
    * ratio table, fold in gram order. Returns
    * (idCol, n_grams, weight) with the weight rounded once.
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      logRatios: Array[Double], roundTo: Int = 6): DataFrame = {
    val table = lit(logRatios)
    val gs = gramBuckets(col(textCol), logRatios.length)
    val packed = graft.functions.Let.let(gs, g =>
      struct(
        size(g).cast("long").as("n_grams"),
        round(aggregate(
          transform(g, b => element_at(table, b.cast("int") + 1)),
          lit(0.0), (a, x) => a + x), roundTo).as("weight")))
    docs.select(col(idCol), packed.as("p"))
      .select(col(idCol), col("p.n_grams"), col("p.weight"))
  }

  /** Keep the `k` highest-weighted documents (ties broken by id
    * ascending): TakeOrderedAndProject, no global sort shuffle.
    */
  def selectTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("weight").desc, col(idCol).asc).limit(k)
}
