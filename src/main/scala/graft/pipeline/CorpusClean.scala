package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

final case class CleanResult(
    survivors: DataFrame,
    nRaw: Long, nAfterQuality: Long, nAfterExact: Long, nAfterNear: Long,
    nParasDropped: Long = 0L)

/** The composed corpus-cleaning pipeline every LLM-data run needs:
  *
  *   1. quality gate — drop documents scoring under `minQuality`;
  *   2. (optional) corpus-wide paragraph dedup — every duplicated
  *      paragraph keeps only its first (doc, pos) occurrence and the
  *      documents are reassembled ([[ParagraphDedup]]), the RefinedWeb /
  *      Dolma production order: paragraph-level before document-level,
  *      so a boilerplate-padded copy collapses onto its source and the
  *      later exact stage sees the CLEANED text;
  *   3. exact dedup — keep the lowest id per content fingerprint;
  *   4. near-dup removal — MinHash-LSH pairs among the survivors; of
  *      each pair the higher id is dropped (greedy, one pass — a
  *      connected-components pass would also drop transitive dups, at
  *      the cost of an iterative join; at threshold levels used for
  *      training data the greedy pass removes the overwhelming bulk).
  *
  * Each stage is one shuffle class: a scan-side filter, a fingerprint
  * hash-aggregate, and the banded LSH join — nothing quadratic. The
  * paragraph stage rewrites the text, so the tokenize-once
  * materialization happens AFTER it when enabled (and right after the
  * quality gate otherwise).
  */
object CorpusClean {

  def clean(
      docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.6,
      k: Int = 8, bands: Int = 4, minEstSim: Double = 0.5,
      paragraphDedup: Boolean = false, paragraphMinChars: Int = 0): CleanResult = {
    // funnel counts ride the stage actions (r16): nRaw and nQuality are
    // observed metrics (CollectMetrics, exactly-once per action) on the
    // input and the quality gate, collected when the FIRST downstream
    // action materializes the quality cache — two dedicated count
    // actions and the raw cache (quality is its only consumer now)
    // removed from the funnel's serial chain.
    val obsRaw = org.apache.spark.sql.Observation()
    val obsQual = org.apache.spark.sql.Observation()

    // normalize + tokenize ONCE; every later stage (quality score,
    // fingerprint = md5(norm), shingles) reads the materialized parts
    // instead of re-running regexp_replace+split over the text.
    val quality = docs
      .observe(obsRaw, count(lit(1)).as("n"))
      .withColumn("__norm", TextAnalysis.normalize(col(textCol)))
      .withColumn("__w", split(col("__norm"), " "))
      .filter(TextAnalysis.qualityScoreFromParts(
        col(textCol), col("__norm"), col("__w")) >= minQuality)
      .observe(obsQual, count(lit(1)).as("n"))
      .cache()

    // stage 2: global keep-first paragraph dedup; the rewritten text
    // invalidates the quality-stage tokenization, so norm/tokens are
    // re-materialized over text_clean for the exact and near stages
    val (working, nParasDropped) =
      if (!paragraphDedup) (quality, 0L)
      else {
        val pd = ParagraphDedup.dedupParagraphs(
          quality.select(col(idCol), col(textCol)),
          idCol, textCol, minChars = paragraphMinChars)
        val dropRow = pd
          .agg(sum(col("n_paras_before") - col("n_paras_after"))).head()
        val dropped = if (dropRow.isNullAt(0)) 0L else dropRow.getLong(0)
        val rewritten = quality.drop(textCol, "__norm", "__w")
          .join(pd.select(col(idCol), col("text_clean").as(textCol)), Seq(idCol))
          .withColumn("__norm", TextAnalysis.normalize(col(textCol)))
          .withColumn("__w", split(col("__norm"), " "))
          .cache()
        (rewritten, dropped)
      }

    // exact survives into the RETURNED survivors plan, so it cannot be
    // unpersisted here like the other stages — one generation per
    // operator via CacheSlots (re-invocation unpersists the previous)
    val exact = graft.util.CacheSlots.rotateOne("corpusClean.exact",
      working
        .withColumn("__fp", md5(col("__norm"))) // = fingerprint(textCol)
        .withColumn("__keep", min(col(idCol)).over(Window.partitionBy("__fp")))
        .filter(col(idCol) === col("__keep"))
        .drop("__fp", "__keep"))
    val nExact = exact.count()

    val removed = Dedup
      .minhashPairsFromTokens(exact, idCol, "__w", k, bands, minEstSim)
      .select(col("id_b").as(idCol))
      .distinct()
    val survivors = exact.join(removed, Seq(idCol), "left_anti")
      .drop("__norm", "__w")
    val nNear = survivors.count()

    // every stage action has run by here, so the observed input/quality
    // counts are available without their own jobs
    val nRaw = obsRaw.get("n").asInstanceOf[Long]
    val nQuality = obsQual.get("n").asInstanceOf[Long]
    quality.unpersist()
    if (working ne quality) working.unpersist()
    CleanResult(survivors, nRaw, nQuality, nExact, nNear, nParasDropped)
  }

  /** Transitive near-dup removal: cluster the pair graph into connected
    * components ([[Components]]) and keep only each component's
    * minimum-id member. Unlike the greedy pass in [[clean]] (which drops
    * every pair's higher id in one shot), this follows chains: for the
    * pair set {A~C, B~C} (no A~B pair) greedy drops only C and keeps
    * both A and B, while the component collapses all three to A. Costs
    * an iterative join (diameter-bounded rounds) — the price of exact
    * transitive semantics.
    */
  def removeNearDupsTransitive(
      docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = Components.connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Per-cluster representative selection: connected components over the
    * near-dup pair graph, keeping each component's BEST-scoring member
    * (highest `scoreCol`, lowest id tie-break) — the "keep the longest /
    * highest-quality duplicate" rule production pipelines prefer over
    * the keep-lowest-id of [[removeNearDupsTransitive]] (an arbitrary id
    * ordering shouldn't decide which near-duplicate survives when one
    * copy is truncated or boilerplate-padded).
    *
    * Returns (id, component, keep_id) for every clustered id; a doc
    * survives iff id == keep_id (unclustered docs are absent and always
    * survive). The selection is a combinable min(struct(-score, id))
    * aggregate per component — no per-cluster window sort, so a
    * pathological million-member component still partial-aggregates.
    */
  def clusterRepresentatives(
      docs: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame): DataFrame = {
    val scored = Components.connectedComponents(pairs)
      .join(docs.select(col(idCol).cast("long").as("id"),
        col(scoreCol).as("__score")), Seq("id"))
    val best = scored.groupBy("component")
      .agg(min(struct((-col("__score")).as("n"), col("id").as("i"))).as("__b"))
      .select(col("component"), col("__b").getField("i").as("keep_id"))
    scored.join(best, Seq("component")).select("id", "component", "keep_id")
  }

  /** [[clusterRepresentatives]] composed to survivors: drop every
    * clustered doc that is not its component's representative.
    */
  def keepBestPerCluster(
      docs: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame): DataFrame = {
    val losers = clusterRepresentatives(docs, idCol, scoreCol, pairs)
      .filter(col("id") =!= col("keep_id"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Single-row funnel report, oracle-comparable. */
  def report(spark: SparkSession, r: CleanResult): DataFrame = {
    import spark.implicits._
    Seq((r.nRaw, r.nAfterQuality, r.nParasDropped, r.nAfterExact, r.nAfterNear))
      .toDF("n_raw", "n_after_quality", "n_paras_dropped",
        "n_after_exact", "n_after_near")
  }
}
