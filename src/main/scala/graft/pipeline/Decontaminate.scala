package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (the GPT-3 appendix-C / PaLM eval-overlap
  * check): a training document is contaminated when it shares any
  * word n-gram with a held-out benchmark sample, and at corpus scale the
  * check must stream the corpus once against a broadcast benchmark.
  *
  * Shape at 100 TB: per-document n-gram sets are built row-local
  * (normalize + split + slide, all codegen'd — no shuffle), the
  * benchmark's gram set is distinct-ed and BROADCAST (benchmarks are
  * small by construction — thousands of samples, not billions), and the
  * only shuffle is the final map-side-combinable count per doc_id.
  * The corpus side is never collected, never self-joined.
  */
object Decontaminate {

  /** Sliding word n-grams of a token-array column, each joined by single
    * spaces; empty when the document has fewer than `n` tokens. Spark's
    * `sequence` would count DOWN for start > stop, so the short-doc case
    * is guarded explicitly. The token array is let-bound
    * ([[graft.functions.Let]]) because a raw expression referenced inside
    * the `transform` lambda re-evaluates per element — for a
    * tokenization subtree that turns one split into one split per gram.
    */
  def ngrams(words: Column, n: Int): Column =
    graft.functions.Let.let(words, w =>
      when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => array_join(slice(w, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))

  /** Per-document contamination report against `bench`: documents
    * sharing at least one n-gram with any benchmark sample, with the
    * matched-gram count, the document's distinct-gram total, and the
    * overlap fraction. Clean documents are absent (inner semantics —
    * the common case is "flag and drop the hits").
    */
  def contaminationReport(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val docGrams = docs
      .select(col(idCol).as("doc_id"),
        array_distinct(ngrams(TextAnalysis.tokens(col(textCol)), n)).as("g"))
      .select(col("doc_id"), size(col("g")).cast("long").as("n_grams"),
        explode(col("g")).as("gram"))

    val benchGrams = bench
      .select(explode(
        array_distinct(ngrams(TextAnalysis.tokens(col(benchTextCol)), n)))
        .as("gram"))
      .distinct()

    docGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).as("n_matched"))
      .select(
        col("doc_id").as(idCol),
        col("n_matched"),
        col("n_grams"),
        round(col("n_matched").cast("double") / col("n_grams"), 4)
          .as("overlap_frac"))
  }

  /** [[contaminationReport]] with a bloom-filter prefilter — the shape
    * that wins when the corpus is 100 TB and the benchmark gram set,
    * while driver-small, is too large to hash-probe cheaply per gram in
    * a broadcast join alone. The benchmark grams are folded into ONE
    * serialized bloom filter (a distributed, map-side-combinable
    * aggregate — bitmaps OR-merge), which ships to executors as a
    * literal a few hundred KB wide and is probed INSIDE the corpus scan
    * stage (pure codegen'd predicate, no shuffle). Only grams the bloom
    * admits — true matches plus an `fpp` sliver of false positives —
    * reach the exact broadcast equi-join that confirms them. Blooms
    * have no false negatives, so the result is IDENTICAL to the exact
    * report; the oracle is the same SQL.
    */
  def contaminationReportBloom(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    import graft.functions.VectorFunctions
    val benchGrams = bench
      .select(explode(
        array_distinct(ngrams(TextAnalysis.tokens(col(benchTextCol)), n)))
        .as("gram"))
      .distinct()
    // two driver-sized actions over the (small) benchmark side only; the
    // corpus is never touched until the single filtered scan below
    val nBench = math.max(1L, benchGrams.count())
    val bloom = benchGrams
      .agg(VectorFunctions.bloomAgg(col("gram"), nBench, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)

    val docGrams = docs
      .select(col(idCol).as("doc_id"),
        array_distinct(ngrams(TextAnalysis.tokens(col(textCol)), n)).as("g"))
      .select(col("doc_id"), size(col("g")).cast("long").as("n_grams"),
        explode(col("g")).as("gram"))
      .filter(VectorFunctions.bloomContains(lit(bloom), col("gram")))

    docGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).as("n_matched"))
      .select(
        col("doc_id").as(idCol),
        col("n_matched"),
        col("n_grams"),
        round(col("n_matched").cast("double") / col("n_grams"), 4)
          .as("overlap_frac"))
  }

  /** Embedding-space contamination — the semantic complement of the
    * n-gram check (paraphrased benchmark leakage shares no 8-gram but
    * sits next to the benchmark in embedding space). Reports each corpus
    * vector whose max cosine against any benchmark vector reaches
    * `minSim`, with the best-matching benchmark id (ties on the rounded
    * similarity break to the smallest id, mirrored in the oracle).
    *
    * Shape at 100 TB: benchmark side BROADCAST (eval sets are small by
    * construction), similarity via the codegen'd dot expression, and the
    * only shuffle is the map-side-combinable max(struct) per id — the
    * corpus streams through once; no pair set ever shuffles.
    */
  def semanticContaminationReport(
      corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchIdCol: String, benchVecCol: String,
      minSim: Double): DataFrame = {
    // the lowest-id tie-break rides on numeric negation inside the
    // max(struct) argmax — a string bench id would fail at runtime with
    // an opaque cast error; fail at the API instead
    require(bench.schema(benchIdCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"semanticContaminationReport: $benchIdCol must be numeric " +
        "(the deterministic lowest-id tie-break negates it)")
    val b = broadcast(bench.select(
      col(benchIdCol).as("__bid"),
      col(benchVecCol).cast("array<double>").as("__bv")))
    corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(b)
      .filter(col(idCol) =!= col("__bid"))
      .select(col(idCol), col("__bid"),
        round(Similarity.dot(col("__v"), col("__bv")), 4).as("sim"))
      .groupBy(idCol)
      .agg(max(struct(col("sim"), (-col("__bid")).as("nb"))).as("m"))
      .select(col(idCol),
        (-col("m.nb")).as(s"bench_$benchIdCol"),
        col("m.sim").as("max_sim"))
      .filter(col("max_sim") >= minSim)
  }

  /** [[semanticContaminationReport]] routed through an IVF index over the
    * BENCHMARK side — the shape for large bench batteries, where the
    * exact crossJoin's O(|corpus| x |bench|) dot products dominate. The
    * bench set is quantized into `nCentroids` inverted lists (seeded by
    * its lowest-id vectors, the [[Similarity.ivfTopK]] rule); each corpus
    * vector computes dots against only its `nProbe` nearest lists —
    * O(|corpus| x |bench| x nProbe/nCentroids) compute.
    *
    * Shape at 100 TB: up to `maxLiteralK` lists, probe selection is a
    * row-local argsort over centroid LITERALS (no join, no row inflation
    * beyond x nProbe, no window shuffle); past it — where the generated
    * method would blow the JVM's 64 KB codegen ceiling — routing
    * automatically takes the [[Similarity.ivfTopKBig]] probe shape
    * (broadcast centroid table, per-corpus-row rank window), same
    * ranking and tie-break, pinned equal in PipelineSpec. Either way the
    * inverted lists are the only broadcast (bench-sized); the corpus
    * streams through the broadcast equi-join once and the final shuffle
    * is the map-side-combinable max(struct) per id. With
    * nProbe = nCentroids every list is probed and the result equals the
    * exact report by construction (pinned in PipelineSpec); below that,
    * recall follows the probed-list mass.
    */
  def semanticContaminationReportAnn(
      corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchIdCol: String, benchVecCol: String,
      minSim: Double, nCentroids: Int, nProbe: Int,
      maxLiteralK: Int = Similarity.LiteralAssignMaxK): DataFrame = {
    require(bench.schema(benchIdCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"semanticContaminationReportAnn: $benchIdCol must be numeric " +
        "(the deterministic lowest-id tie-break negates it)")
    require(nCentroids > 0 && nProbe > 0 && nProbe <= nCentroids,
      "need 0 < nProbe <= nCentroids")
    val b0 = bench.select(
      col(benchIdCol).cast("long").as("id"),
      col(benchVecCol).cast("array<double>").as("v"))
    // coarse quantizer: the nCentroids lowest-id bench vectors
    val centArr = b0.orderBy(col("id")).limit(nCentroids).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    // invert the BENCH side (nearest centroid, tie smallest cid — the
    // shared assignment rule); bench batteries are broadcast-small
    val lists = broadcast(
      Similarity.assignToCentroids(b0, centArr)
        .select(col("id").as("__bid"), col("v").as("__bv"), col("cid")))
    val corpusV = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val routed = if (centArr.length <= maxLiteralK) {
      // row-local probe routing: argsort over centroid literals,
      // ascending (negated-sim, cid) — csim desc with smallest-cid ties.
      // The negation is (0.0 - x), which can never produce -0.0, so the
      // struct sort order is signed-zero-proof on both engines.
      val probeIds = {
        val entries = array(centArr.map { case (cid, cv) =>
          struct(
            round(lit(0.0) - Similarity.dot(col("__v"),
              array(cv.map(lit): _*)), 6).as("negc"),
            lit(cid).as("cid"))
        }.toIndexedSeq: _*)
        transform(slice(array_sort(entries), 1, nProbe),
          e => e.getField("cid"))
      }
      corpusV.withColumn("cid", explode(probeIds))
    } else {
      // large-quantizer route (the ivfTopKBig probe shape): broadcast
      // the centroid table, rank lists per corpus row, keep nProbe.
      // Costs one rank window over |corpus| x nCentroids rows — the
      // documented trade past the codegen ceiling. round(dot) ranked
      // DESC with smallest-cid ties is exactly the literal argsort's
      // order (HALF_UP rounding commutes with negation). The window
      // partitions by (id, vector), NOT id alone: the literal route
      // probes per ROW, so duplicate corpus ids with DIFFERENT vectors
      // must each get their own nProbe lists (id-only partitioning
      // starved one duplicate's nearest lists and lowered its max
      // similarity). Exact duplicate rows are collapsed first — they
      // carry identical probe sets and the report's per-id max cannot
      // see the difference — keeping every window partition exactly
      // nCentroids rows.
      val spark = corpus.sparkSession
      import spark.implicits._
      val cents = broadcast(
        centArr.toSeq.toDF("cid", "__cv")
          .select(col("cid"), col("__cv").cast("array<double>").as("__cv")))
      corpusV.dropDuplicates(idCol, "__v").crossJoin(cents)
        .withColumn("__csim", round(Similarity.dot(col("__v"), col("__cv")), 6))
        .withColumn("__pr", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(idCol), col("__v"))
            .orderBy(col("__csim").desc, col("cid"))))
        .filter(col("__pr") <= nProbe)
        .select(col(idCol), col("__v"), col("cid"))
    }
    routed
      .join(lists, Seq("cid"))
      .filter(col(idCol) =!= col("__bid"))
      .select(col(idCol),
        round(Similarity.dot(col("__v"), col("__bv")), 4).as("sim"),
        col("__bid"))
      .groupBy(idCol)
      .agg(max(struct(col("sim"), (-col("__bid")).as("nb"))).as("m"))
      .select(col(idCol),
        (-col("m.nb")).as(s"bench_$benchIdCol"),
        col("m.sim").as("max_sim"))
      .filter(col("max_sim") >= minSim)
  }
}
