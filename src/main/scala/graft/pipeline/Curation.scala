package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis.tokens

/** Corpus-curation operators a large-scale training-data pipeline needs
  * around the cleaning funnel: deterministic dataset splits and
  * vocabulary construction. Both are built from codegen'd expressions +
  * map-side-combinable aggregations — the shapes that hold at 100 TB.
  */
object Curation {

  /** Uniform hash fraction in [0,1) for an id: first 16 bits of
    * md5(id-as-string). No RNG state — identical on every run, executor,
    * and engine (the DuckDB oracle reproduces it bit-for-bit), which is
    * what makes train/val/test membership stable across reprocessing.
    *
    * Operators never consume this RAW — they go through
    * [[saltedFraction]] with a per-PURPOSE salt. A shared unsalted
    * fraction makes every composed decision fully correlated: a 0.5
    * sample keeps exactly the ids whose fraction is < 0.5, and a
    * downstream 0.8/0.1/0.1 split then puts ALL survivors in train —
    * val and test silently empty; shard assignment, epoch upsampling,
    * and weighted sampling inherit the same bias. Salting makes each
    * decision an independent uniform draw while staying deterministic.
    */
  def splitFraction(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("double") / 65536.0

  /** [[splitFraction]] under a purpose salt: `md5(purpose || '|' || id)`
    * — independent across purposes, deterministic within one.
    */
  def saltedFraction(purpose: String, id: Column): Column =
    conv(substring(md5(concat(lit(purpose + "|"), id.cast("string"))), 1, 4),
      16, 10).cast("double") / 65536.0

  /** Deterministic train/val/test assignment as a pure projection (no
    * shuffle, no sample() nondeterminism). `splits` are (name, weight)
    * with weights summing to 1; cut points are cumulative. A null id
    * hashes to a null fraction, which fails every `<` cut and lands in
    * the LAST split — deterministic, and it keeps nulls out of train.
    */
  def hashSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "weights sum to 1")
    val frac = saltedFraction("split", col(idCol))
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
    val head = when(frac < cuts.head, splits.head._1)
    val cased = splits.zip(cuts).drop(1).dropRight(1)
      .foldLeft(head) { case (acc, ((name, _), cut)) =>
        acc.when(frac < cut, name)
      }
    df.withColumn(splitCol, cased.otherwise(splits.last._1))
  }

  /** Deterministic stratified sampling: keep a row iff its hash fraction
    * falls under its stratum's rate — per-language (or per-source) quotas
    * as a pure projection + filter. No `sample()` RNG, no shuffle, stable
    * membership across reprocessing (the property that keeps train sets
    * reproducible when the corpus is re-ingested). Strata absent from
    * `rates` fall back to `defaultRate`.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, r).otherwise(acc)
    }
    df.filter(saltedFraction("sample", col(idCol)) < rate)
  }

  /** Temperature-scaled domain mixing (the multilingual/domain rebalance
    * of XLM-R §3.1 and mC4): sampling probability p_d ∝ n_d^alpha
    * flattens the domain distribution — alpha < 1 upweights tail
    * domains — and each domain's keep-rate is budget·p_d/n_d capped at
    * 1. Domain counts are a driver-small aggregate (domains are a
    * catalog, not a corpus: hundreds, not millions), the summation runs
    * in sorted-domain order for reproducibility, and membership reuses
    * the md5-fraction rule via [[stratifiedSample]] — so the mix is a
    * pure deterministic filter: no RNG, no extra shuffle, stable across
    * re-ingestion. Rows whose domain is NULL are dropped (rate 0).
    */
  def temperatureMix(
      df: DataFrame, idCol: String, domainCol: String,
      alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha in [0, 1]")
    require(budget > 0, "budget must be positive")
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("__n"))
      .collect()
      .flatMap(r => Option(r.getAs[String](0)).map(_ -> r.getLong(1)))
      .sortBy(_._1)
    val z = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val rates = counts.map { case (d, n) =>
      d -> math.min(1.0, budget * math.pow(n.toDouble, alpha) / z / n)
    }.toMap
    stratifiedSample(df, idCol, domainCol, rates, defaultRate = 0.0)
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * bins — the pretraining step that turns a cleaned corpus into
    * near-full context windows. Exact bin packing is inherently serial,
    * so this is the scalable approximation every large pipeline uses:
    * spread documents over `buckets` deterministic hash buckets, order
    * within each bucket (longest-first, id tiebreak), and cut bins by
    * the running token total — `bin = floor(precedingCumSum / budget)`.
    * Each bin's total stays under budget + one document; the only
    * shuffle is the per-bucket window, and buckets keep any single
    * partition's window bounded at corpus scale.
    *
    * Output: one row per document with (bucket, bin, n_tok).
    */
  def packSequences(
      docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, buckets: Int = 64): DataFrame = {
    require(budgetTokens > 0 && buckets > 0)
    val nTok = size(tokens(col(textCol))).cast("long")
    // explicit floor: engines disagree on double->int casts (Spark
    // truncates, SQL-standard engines round)
    val bucket = floor(saltedFraction("pack", col(idCol)) * buckets).cast("int")
    val w = Window.partitionBy("bucket")
      .orderBy(col("n_tok").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), nTok.as("n_tok"), bucket.as("bucket"))
      .withColumn("bin",
        floor((sum("n_tok").over(w) - col("n_tok")) / budgetTokens))
      .select(col(idCol), col("bucket"), col("bin"), col("n_tok"))
  }

  /** Token-budget quality selection — the greedy-knapsack curation step
    * ("give me the best N-billion tokens per domain") that turns a scored
    * corpus into a fixed-size training mix. Within each domain, documents
    * are ranked by [[TextAnalysis.qualityScore]] (id tiebreak) and kept
    * while the running token total BEFORE the document is under
    * `budgetTokens` — so each domain's kept set overshoots by at most one
    * document, and membership is fully deterministic (the ranking is pure
    * double arithmetic both engines compute bit-identically; no RNG).
    *
    * Scale shape: one projection computes tokens + quality (codegen'd,
    * no UDFs), then ONE window shuffle partitioned by domain — domains
    * are the natural unit of parallelism (hundreds of them, each far
    * smaller than the corpus). Contrast with a global top-k by quality,
    * which would funnel everything through one ordering.
    */
  def budgetSelect(
      docs: DataFrame, idCol: String, textCol: String, domainCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    val scored = docs.select(
      col(idCol), col(domainCol),
      size(tokens(col(textCol))).cast("long").as("n_tok"),
      TextAnalysis.qualityScore(col(textCol)).as("quality"))
    val w = Window.partitionBy(domainCol)
      .orderBy(col("quality").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("cum_before", sum("n_tok").over(w) - col("n_tok"))
      .filter(col("cum_before") < budgetTokens)
      .drop("cum_before")
  }

  /** T5-style span corruption planning (Raffel et al. 2020 §3.1.4): mark
    * which tokens a denoising objective would mask, deterministically.
    * A token position STARTS a span when its md5 fraction
    * (`md5(id|'s'|pos)`, the [[splitFraction]] trick per position) falls
    * under `density / spanLen`; a span covers `spanLen` consecutive
    * tokens, overlapping spans merge. Expected masked fraction ≈
    * `density`, expected span length `spanLen` — the T5 knobs — with no
    * RNG state: every executor, every rerun, and the SQL oracle agree on
    * the exact masked set.
    *
    * Returns per-document (n_tok, n_spans, n_masked) as a pure row-local
    * projection: the start flags and the merged-coverage count are
    * array-lambda arithmetic over one tokenization — no shuffle, no
    * window, no fan-out.
    */
  def spanCorruptionPlan(
      docs: DataFrame, idCol: String, textCol: String,
      density: Double = 0.15, spanLen: Int = 3): DataFrame = {
    require(density > 0 && density < 1 && spanLen > 0)
    val startP = density / spanLen
    docs.select(
      col(idCol),
      graft.functions.Let.let(tokens(col(textCol)), w =>
        graft.functions.Let.let(
          transform(sequence(lit(0), size(w) - 1), i =>
            conv(substring(md5(
              concat(col(idCol).cast("string"), lit("|s|"), i.cast("string"))),
              1, 4), 16, 10).cast("double") / 65536.0 < startP), starts =>
          struct(
            size(w).cast("long").as("n_tok"),
            size(filter(starts, s => s)).cast("long").as("n_spans"),
            // token i is masked iff any of positions [i-spanLen+1, i]
            // starts a span — merged coverage, counted per position
            size(filter(sequence(lit(0), size(w) - 1), i =>
              exists(
                sequence(greatest(lit(0), i - (spanLen - 1)), i),
                j => element_at(starts, j + 1))))
              .cast("long").as("n_masked")))).as("m"))
      .select(col(idCol), col("m.n_tok"), col("m.n_spans"), col("m.n_masked"))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * never straddle splits, or the eval set silently contains
    * paraphrases of training rows. Membership hashes the document's
    * near-dup COMPONENT id (connected components over the pair graph;
    * singletons use their own id), so an entire duplicate cluster lands
    * in one split by construction — the [[hashSplit]] determinism
    * carried up to the cluster level.
    *
    * Scale shape: the component table is pair-graph-sized (only docs
    * that have a near-dup, a small fraction of the corpus), so the left
    * join broadcasts under AQE; everything else is the same pure
    * projection as [[hashSplit]].
    */
  def groupAwareSplit(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      splitCol: String = "split"): DataFrame = {
    val comp = Components.connectedComponents(pairs)
      .withColumnRenamed("id", "__cid")
    val grouped = docs
      .join(comp, col(idCol) === col("__cid"), "left")
      .withColumn("group_id", coalesce(col("component"), col(idCol)))
      .drop("__cid", "component")
    hashSplit(grouped, "group_id", splits, splitCol)
  }

  /** Sliding-window document chunking — the context-window prep step
    * (RAG indexing, long-document pretraining): one output row per
    * chunk of `chunkTokens` tokens starting every `strideTokens`
    * (stride < chunk ⇒ overlapping chunks), the last chunk truncated at
    * the document end. Emits (id, chunk_idx, chunk_tok, chunk_hash) —
    * the md5 digest stands in for chunk text so the fan-out stays
    * narrow; join back on (id, chunk_idx) when the text is needed.
    *
    * Shape at 100 TB: entirely row-local — tokenize once (let-bound),
    * generate offsets with `sequence`, slice + hash per chunk, explode.
    * No shuffle, no window; the fan-out factor is ~n_tok/stride per
    * document, decided per row.
    */
  def chunkDocuments(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0, "positive chunk and stride")
    val chunks = graft.functions.Let.let(tokens(col(textCol)), w =>
      transform(
        // n_tok >= 1 always (normalize of "" is [""]), so the int cast's
        // truncation IS the floor of the nonnegative quotient
        sequence(lit(0), ((size(w) - 1) / strideTokens).cast("int")),
        i => graft.functions.Let.let(
          slice(w, i * strideTokens + 1, lit(chunkTokens)), c =>
            struct(
              size(c).cast("long").as("chunk_tok"),
              md5(array_join(c, " ")).as("chunk_hash")))))
    docs
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.chunk_tok"), col("c.chunk_hash"))
  }

  /** Epoch-weighted domain mixing: [[temperatureMix]] can only KEEP OR
    * DROP (rates capped at 1), but production pretraining mixes routinely
    * REPEAT high-value domains — Wikipedia at 3 epochs while web crawl
    * runs at 0.5 — so the mix operator must upsample too. Each document
    * emits `floor(r)` copies plus one more iff its md5 hash fraction
    * falls under `frac(r)`, where `r` is its domain's epoch count: the
    * emitted corpus hits each domain's epoch target exactly in
    * expectation, deterministically (no RNG state — same copies on every
    * rerun, executor, and engine). Output carries `copy_idx` (0-based)
    * so downstream shuffles can decorrelate the copies.
    *
    * Scale shape: a pure row-local projection + controlled explode — no
    * shuffle, no window; the fan-out factor is the epoch count, decided
    * per row. Domains absent from `epochs` use `defaultEpochs`; a NULL
    * domain emits nothing (rate 0), keeping unlabeled rows out of the
    * mix like [[temperatureMix]].
    */
  def epochMix(
      df: DataFrame, idCol: String, domainCol: String,
      epochs: Map[String, Double], defaultEpochs: Double): DataFrame = {
    require(defaultEpochs >= 0 && epochs.values.forall(_ >= 0),
      "epoch counts must be nonnegative")
    val rate = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (d, r)) =>
      when(col(domainCol) === d, r).otherwise(acc)
    }
    val copies = (floor(rate).cast("int")
      + when(saltedFraction("epoch", col(idCol)) < rate - floor(rate), 1).otherwise(0))
    // guard the empty case: Spark's sequence(0, -1) would step DOWN and
    // yield [0, -1] instead of an empty range
    val idxs = when(copies > 0, sequence(lit(0), copies - 1))
      .otherwise(array().cast("array<int>"))
    df.withColumn("copy_idx", explode(idxs))
  }

  /** CCNet-style perplexity tiering (Wenzek et al. 2020 §4.3): rank every
    * document within its language by language-model score and cut the
    * ranking into thirds — head (most fluent), middle, tail. CCNet keeps
    * head+middle and drops (or downweights) tail; the cut is RELATIVE per
    * language, which is the point — an absolute perplexity threshold
    * would gut low-resource languages whose LM is weaker everywhere.
    *
    * The score is [[TextProfile.knBigramLmScores]] (interpolated
    * Kneser-Ney, fitted on the corpus itself — the self-scoring variant);
    * the cut uses `percent_rank` ordered by (score desc, id), so tier
    * membership is exact integer-rank arithmetic: no RNG, no approximate
    * quantiles, bit-identical across engines and reruns.
    *
    * Scale shape: scoring is the KN pipeline's hash aggregations; the
    * tiering itself is ONE window shuffle partitioned by language.
    * Per-language ranking is a distributed sort within each language's
    * partitions — the same shape CCNet runs (per-language shards sorted
    * by perplexity). A language so large its sort won't fit one
    * partitioning is exactly the case AQE skew-split handles.
    */
  def perplexityTiers(
      docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val scored = docs
      .join(TextProfile.knBigramLmScores(docs, idCol, textCol), Seq(idCol))
    val pr = percent_rank().over(Window.partitionBy(langCol)
      .orderBy(col("kn_logprob").desc, col(idCol)))
    scored
      .withColumn("__pr", pr)
      .withColumn("tier",
        when(col("__pr") < 1.0 / 3.0, "head")
          .when(col("__pr") < 2.0 / 3.0, "middle")
          .otherwise("tail"))
      .drop("__pr")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES,
    * 2006): keep the k rows with the largest `u^(1/w)` where u is the
    * document's deterministic md5 hash fraction ([[splitFraction]]) and
    * w its weight — e.g. a quality score, so curation keeps a
    * quality-BIASED sample rather than the quality-TOP slice that
    * [[budgetSelect]] takes (pure top-k collapses diversity; A-ES is the
    * standard fix). With u fixed per id, membership is deterministic
    * across reruns and engines, yet distributed exactly as
    * weighted-without-replacement for the given hash draw.
    *
    * Scale shape: the key is a pure projection; the global top-k is
    * Spark's TakeOrdered (per-partition heaps + driver merge of k rows),
    * NOT a full sort — the one global-selection shape that stays cheap
    * at corpus scale. Ties (same 16-bit u, same weight) break by id.
    * Weights must be strictly positive.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weight: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val key = pow(saltedFraction("weighted", col(idCol)), lit(1.0) / weight)
    df.withColumn("es_key", key)
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Document-frequency vocabulary: distinct tokens per document,
    * df-counted corpus-wide, min-df-filtered, top-k by (df desc, token).
    * One explode + one hash aggregation (map-side combinable) + a
    * driver-small top-k — the linear vocab-construction shape.
    */
  def vocabulary(
      docs: DataFrame, textCol: String,
      minDf: Long = 2, topK: Int = 25): DataFrame = {
    val ranked = docs
      .select(explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("token"))
      .limit(topK)
    // global window is fine here: input is already the k-row top-k
    ranked.withColumn("rank",
      row_number().over(Window.orderBy(col("df").desc, col("token")))
        .cast("bigint"))
  }
}
