package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Brute-force top-k is the exact baseline: broadcast the (small) query
  * set against a full scan of the corpus — one pass, no shuffle of the
  * big side, O(|corpus| x |queries| x dim) codegen'd arithmetic via
  * zip_with/aggregate (no UDFs).
  *
  * The scale path is [[lshTopK]]: deterministic random-hyperplane
  * signatures bucket the corpus so each query only scans its own bucket
  * — candidate generation becomes an equi-join, trading recall for a
  * ~2^planes reduction in scanned vectors (recall is property-tested
  * against the brute-force baseline in PipelineSpec).
  */
object Similarity {

  /** Dot product of two double arrays — a custom codegen'd Catalyst
    * expression ([[graft.functions.DotProduct]]); sequential summation
    * order, bit-identical to the folded-builtin form below and to the
    * oracle's list_dot_product.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** The pure-builtin equivalent (higher-order functions); kept as the
    * reference implementation — interpreted lambdas make it ~3x slower
    * at pair-join scale.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; a zero vector is similar to nothing (0.0) rather
    * than a crash — Spark 4's ANSI mode (the default) raises
    * DIVIDE_BY_ZERO even for DOUBLE division, so the unguarded ratio
    * dies on the first zero vector in a corpus (the test embeddings
    * contain one; real corpora always do).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.Let.let(norm(a) * norm(b), d =>
      when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Unit-length (L2) normalization — after it, cosine reduces to a pure
    * dot product, which is what makes pre-normalizing the corpus pay for
    * itself at scale (one pass now, a sqrt-free hot loop forever after).
    * A zero vector passes through unchanged (ANSI double division by
    * zero throws; see [[cosine]]).
    */
  def l2Normalize(v: Column): Column =
    graft.functions.Let.let(asDouble(v), d =>
      graft.functions.Let.let(norm(d), n =>
        when(n === 0.0, d).otherwise(transform(d, x => x / n))))

  /** Symmetric int8 quantization: each component scaled by 127/max|x| and
    * rounded — 4x smaller than float32 at rest and over the wire. The
    * exact expression shape (`round(x * 127.0 / mx)`) is mirrored by the
    * DuckDB oracle; keep them in sync.
    */
  def quantizeInt8(v: Column): Column =
    graft.functions.Let.let(asDouble(v), d =>
      graft.functions.Let.let(array_max(transform(d, x => abs(x))), mx =>
        // zero vector: every component quantizes to 0 (the ratio would
        // ANSI-throw; see cosine)
        when(mx === 0.0, transform(d, _ => lit(0).cast("int")))
          .otherwise(transform(d, x => round(x * lit(127.0) / mx).cast("int")))))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix: entry (j, i) is
    * +1 when the first hex digit of md5("seed|j|i") is even (Achlioptas
    * 2003's database-friendly ±1 projection, seeded by a hash instead of
    * an RNG so every executor — and the DuckDB oracle — reproduces the
    * same matrix with no broadcast of random state).
    */
  def jlSigns(seed: String, outDim: Int, inDim: Int): Array[Array[Double]] =
    Array.tabulate(outDim, inDim) { (j, i) =>
      if (Character.digit(md5hex(s"$seed|$j|$i").charAt(0), 16) % 2 == 0) 1.0
      else -1.0
    }

  /** Random projection to `outDim` dimensions: out_j = <v, s_j> / √outDim
    * with the [[jlSigns]] ±1 rows. The JL lemma bounds the norm/distance
    * distortion at O(√(log n / outDim)) — the standard cheap dimension
    * reduction before clustering or coarse ANN at corpus scale. Shape:
    * the sign rows are literal arrays compiled into the projection (no
    * join, no shuffle — a pure per-row map over the scan), and each
    * component is the zip_with/aggregate fold that
    * [[graft.plans.RewriteHofDotProduct]] fuses into the codegen'd
    * vec_dot loop.
    */
  def randomProjection(
      vec: Column, inDim: Int, outDim: Int, seed: String = "jl"): Column = {
    require(inDim > 0 && outDim > 0, "positive dimensions")
    val signs = jlSigns(seed, outDim, inDim)
    val scale = math.sqrt(outDim.toDouble)
    array((0 until outDim).map { j =>
      dotHof(asDouble(vec), lit(signs(j))) / scale
    }: _*)
  }

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, sim, rank). Ties broken by
    * neighbor id on the ROUNDED similarity so ranking is reproducible
    * across engines.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      assumeNormalized: Boolean = true): DataFrame = {
    // norms hoisted to the per-ROW projections (r16): cosine() per pair
    // recomputed BOTH norms per candidate pair (2 extra O(dim) dots ×
    // |corpus|·|queries|) and its Let spelling is a lambda HOF —
    // CodegenFallback — which kicked the whole per-pair projection out
    // of whole-stage codegen. Same IEEE arithmetic (d = qn·cn, 0-guard,
    // dot/d), evaluated once per row instead of once per pair.
    val q = queries.select(
      col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("__qn", norm(col("qv")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("__cn", norm(col("cv")))
    val sim =
      if (assumeNormalized) dot(col("qv"), col("cv"))
      else when(col("__qn") * col("__cn") === 0.0, lit(0.0))
        .otherwise(dot(col("qv"), col("cv")) / (col("__qn") * col("__cn")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(sim, 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Hard-negative mining for contrastive training (the in-batch /
    * BM25-style negative upgrade every embedding-model pipeline needs):
    * for each query, the k most-similar corpus vectors whose LABEL
    * differs — near the anchor in embedding space yet semantically
    * wrong, exactly the pairs that sharpen a contrastive loss.
    *
    * Same scale shape as [[bruteForceTopK]]: query side broadcast, one
    * corpus stream, codegen'd dot, map-side top-k via the rank window
    * (WindowGroupLimit bounds per-key state before the shuffle). For
    * billion-vector corpora compose with the IVF/PQ candidate paths the
    * same way q84 does for plain ANN.
    */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int,
      assumeNormalized: Boolean = true): DataFrame = {
    // norms per row, not per pair — same rationale as [[bruteForceTopK]]
    val q = queries.select(
      col(idCol).as("query_id"), col(labelCol).as("query_label"),
      asDouble(col(vecCol)).as("qv"))
      .withColumn("__qn", norm(col("qv")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(labelCol).as("neighbor_label"),
      asDouble(col(vecCol)).as("cv"))
      .withColumn("__cn", norm(col("cv")))
    val sim =
      if (assumeNormalized) dot(col("qv"), col("cv"))
      else when(col("__qn") * col("__cn") === 0.0, lit(0.0))
        .otherwise(dot(col("qv"), col("cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(!(col("neighbor_label") <=> col("query_label")))
      .withColumn("sim", round(sim, 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "query_label", "neighbor_id", "neighbor_label",
        "sim", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a value in [-0.5, 0.5) derived from md5 — no RNG state, so executors
    * and the SQL oracle regenerate identical planes.
    */
  def planeComponent(plane: Int, dim: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$dim".getBytes("UTF-8"))
      .take(7).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16).toDouble /
      java.lang.Math.pow(16, 14)) - 0.5
  }

  /** Sign-of-projection LSH signature: bit p = (v . plane_p) >= 0. */
  def lshSignature(vec: Column, planes: Int, dim: Int): Column = {
    val v = asDouble(vec)
    (0 until planes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(p, d))): _*)
      when(dot(v, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket,
    * plus — with `multiProbe` — every bucket at hamming distance 1 (flip
    * one plane bit). Multi-probe recovers most of the recall lost to
    * boundary effects for the cost of `planes` extra bucket lookups per
    * query, all still equi-join candidate generation (no corpus rescan).
    * `planes` tunes the bucket granularity (2^planes buckets).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int, dim: Int, multiProbe: Boolean = true): DataFrame = {
    val sig = lshSignature(col(vecCol), planes, dim)
    val c = corpus.select(
      col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"),
      sig.as("bucket"))
    val probeBuckets =
      if (!multiProbe) array(col("bucket0"))
      else array(col("bucket0") +:
        (0 until planes).map(p =>
          col("bucket0").bitwiseXOR(lit(1L << p))): _*)
    val q = queries.select(
      col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"),
      sig.as("bucket0"))
      .withColumn("bucket", explode(probeBuckets))
      .drop("bucket0")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(dot(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** IVF-style approximate top-k: a coarse quantizer of `nCentroids`
    * deterministic centroids (the lowest-id vectors — at corpus scale
    * you'd k-means these, the plumbing is identical) partitions the
    * corpus into inverted lists; each query probes its `nProbe` nearest
    * lists. Candidate generation is a broadcast assign + equi-join on the
    * centroid id — the corpus is scanned once to build lists and then
    * only |lists probed| / |lists| of it per query batch.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int, nProbe: Int, refineIters: Int = 0): DataFrame =
    ivfTopKImpl(corpus, queries, idCol, vecCol, k, nCentroids, nProbe,
      refineIters, broadcastQueries = true)

  /** [[ivfTopK]] for query sets too big to broadcast — the all-pairs
    * regime (global embedding dedup, corpus-vs-corpus retrieval) where
    * the "query" side IS a corpus. Identical routing algebra, identical
    * results; only the physical shape differs: the probe set flows
    * through a SHUFFLE equi-join on the list id (hinted `merge`, so no
    * size-estimate can silently broadcast a 100 TB side), and each
    * probed list meets each query exactly once — never all-pairs.
    * Uneven list sizes are AQE skew-split territory (sort-merge joins
    * re-plan at runtime); the centroid table is the only broadcast
    * (nCentroids rows — driver-small by construction).
    */
  def ivfTopKBig(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int, nProbe: Int, refineIters: Int = 0): DataFrame =
    ivfTopKImpl(corpus, queries, idCol, vecCol, k, nCentroids, nProbe,
      refineIters, broadcastQueries = false)

  private def ivfTopKImpl(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int, nProbe: Int, refineIters: Int,
      broadcastQueries: Boolean): DataFrame = {
    // the coarse quantizer: the nCentroids lowest-id vectors as-is, or —
    // with refineIters > 0 — that same seed pushed through Lloyd rounds
    // ([[lloydCentroids]]), the k-means-trained IVF of a production index
    val c0 = corpus.select(
      col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val centArr =
      if (refineIters > 0) lloydCentroids(c0, nCentroids, refineIters)
      else c0.orderBy(col("id")).limit(nCentroids).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
    import corpus.sparkSession.implicits._
    val cents = broadcast(
      centArr.toSeq.toDF("cid", "centroid")
        .select(col("cid"), col("centroid").cast("array<double>")
          .as("centroid")))
    // invert: each corpus vector to its single nearest centroid, via the
    // shared [[assignToCentroids]] — a literal-projection argmax (no
    // join, no row inflation, whole-stage codegen) up to
    // [[LiteralAssignMaxK]] lists, the broadcast-join shape above it.
    // Tie-break: highest rounded csim, then smallest cid — reproducible
    // across engines/summation orders, mirrored by the oracle.
    val assigned = assignToCentroids(
        corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")),
        centArr)
      .select(col("id").as("neighbor_id"), col("v").as("cv"), col("cid"))
    // each query probes its nProbe nearest lists
    val q = queries.select(
      col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val probes = q.crossJoin(cents)
      .withColumn("csim", round(dot(col("qv"), col("centroid")), 6))
      .withColumn("pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cid"))))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "cid")
    val probeSide =
      if (broadcastQueries) broadcast(probes) else probes.hint("merge")
    val scored = assigned.join(probeSide, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(dot(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Per-label centroid statistics: the vector-aggregation shape (mean
    * over an array column) every embedding pipeline needs for cluster
    * summaries and IVF seeding. posexplode → per-(label, dim) avg (one
    * map-side-combinable agg over |corpus| x dim rows) → per-label
    * re-assembly; no self-joins, no driver collect of vectors.
    * Output: (label, n_vectors, centroid array<double>, centroid_norm).
    */
  def labelCentroids(
      corpus: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val dims = corpus.select(
      col(labelCol).as("label"),
      posexplode(asDouble(col(vecCol))).as(Seq("pos", "v")))
    val perDim = dims.groupBy("label", "pos")
      .agg(avg("v").as("m"), count(lit(1)).as("n"))
    perDim.groupBy("label")
      .agg(
        max("n").as("n_vectors"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("centroid"),
        round(sqrt(sum(col("m") * col("m"))), 4).as("centroid_norm"))
  }

  /** Lloyd's k-means over the embedding corpus with deterministic
    * seeding: the `k` lowest-id vectors start the centroid set (the same
    * seed rule as [[ivfTopK]]'s coarse quantizer), then `iters` rounds of
    * assign → per-cluster mean. Each round is one corpus scan: assignment
    * is a pure projection-argmax over centroid literals (no join, no row
    * inflation, stays in whole-stage codegen) and the mean is a single
    * map-side-combinable (cid, dim) aggregate — the classic Spark Lloyd
    * shape, with only k x dim doubles ever crossing the driver. Clusters
    * that attract no vectors drop out (k shrinks), mirroring the SQL
    * oracle's GROUP BY semantics.
    *
    * Centroid similarities round to 6 decimals and cluster means to 6
    * decimals per dimension, so assignments and centroids are
    * bit-reproducible across engines and summation orders.
    *
    * The literal-argmax assignment is O(k x dim) expression nodes — the
    * right trade up to a few hundred centroids (zero joins, whole-stage
    * codegen). Past [[LiteralAssignMaxK]] the assignment automatically
    * flips to a broadcast join against the centroid table + `max_by`
    * aggregate (same semantics and tie-break, tested equivalent in
    * PipelineSpec); the Lloyd loop and update agg are unchanged.
    *
    * Output: (id, cid, sim) — the assignment after `iters` mean updates.
    */
  /** Above this k, centroid assignment switches from the literal-argmax
    * projection to the broadcast-join shape: the literal form embeds
    * k x dim constants into one generated method, and codegen methods hit
    * the JVM's 64 KB bytecode ceiling somewhere past a few hundred
    * centroids x typical dims — falling back to interpreted evaluation
    * (or failing) exactly when k gets production-sized (SemDeDup runs
    * 10^3-10^5 clusters).
    */
  val LiteralAssignMaxK: Int = 256

  /** The assignment step: each (id, v) row to its nearest centroid,
    * appending (cid, csim). Tie-break everywhere: highest csim, then
    * smallest cid — matching the oracle's row_number ORDER BY csim DESC,
    * cid.
    *
    * Two physically different, semantically identical shapes:
    *  - k <= maxLiteralK: argmax over centroid LITERALS — a pure
    *    projection, no join, no row inflation, whole-stage codegen. Rows
    *    are pre-sorted cid desc so on a similarity tie the later (higher
    *    pref) struct — the smaller cid — wins.
    *  - k > maxLiteralK: broadcast the centroid table, inflate x k,
    *    map-side-combine a max_by per id (`first(v)` rides along, every
    *    duplicate is identical) — one shuffle on id, no codegen ceiling.
    */
  private[pipeline] def assignToCentroids(
      df: DataFrame, cents: Array[(Long, Seq[Double])],
      maxLiteralK: Int = LiteralAssignMaxK): DataFrame =
    if (cents.length <= maxLiteralK) {
      val argmax = array_max(array(
        cents.sortBy(-_._1).zipWithIndex.map { case ((cid, cv), i) =>
          struct(
            round(dot(col("v"), array(cv.map(lit): _*)), 6).as("csim"),
            lit(i).as("pref"), lit(cid).as("cid"))
        }.toIndexedSeq: _*))
      df.withColumn("a", argmax)
        .withColumn("cid", col("a.cid")).withColumn("csim", col("a.csim"))
        .drop("a")
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val centDf = broadcast(
        cents.toSeq.toDF("__c_cid", "__c_v")
          .select(col("__c_cid"), col("__c_v").cast("array<double>").as("__c_v")))
      df.crossJoin(centDf)
        .withColumn("__c_sim", round(dot(col("v"), col("__c_v")), 6))
        .groupBy("id")
        .agg(
          first("v").as("v"),
          max_by(
            struct(col("__c_cid").as("cid"), col("__c_sim").as("csim")),
            struct(col("__c_sim"), -col("__c_cid"))).as("__best"))
        .select(
          col("id"), col("v"),
          col("__best.cid").as("cid"), col("__best.csim").as("csim"))
    }

  /** Lloyd refinement: seed with the k lowest-id vectors, run `iters`
    * assign → per-cluster-mean rounds, return the final centroid set.
    * Expects `c` shaped (id, v array<double>). Only k x dim doubles ever
    * reach the driver; each round is one corpus scan ending in a
    * map-side-combinable (cid, dim) aggregate.
    */
  private def lloydCentroids(
      c: DataFrame, k: Int, iters: Int,
      maxLiteralK: Int = LiteralAssignMaxK): Array[(Long, Seq[Double])] = {
    var cents: Array[(Long, Seq[Double])] =
      c.orderBy(col("id")).limit(k).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
    var it = 0
    while (it < iters) {
      val perDim = assignToCentroids(c, cents, maxLiteralK).select(
          col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(round(avg("x"), 6).as("m"))
      cents = perDim.groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      it += 1
    }
    cents
  }

  def kmeansAssign(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int,
      maxLiteralK: Int = LiteralAssignMaxK): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // sim stays at the assignment's 6-decimal rounding: re-rounding a
    // pre-rounded value to 4 decimals lands on exact .5 boundaries ~1% of
    // the time, where Spark's BigDecimal HALF_UP and other engines'
    // multiply-then-round disagree — single rounding is engine-stable
    assignToCentroids(c, lloydCentroids(c, k, iters, maxLiteralK), maxLiteralK)
      .select(col("id"), col("cid"), col("csim").as("sim"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    * clusters become the blocking key, near-duplicate cosine pairs are
    * generated only within a cluster ([[embeddingDupPairs]]), and any
    * vector that is the HIGHER id of at least one qualifying pair is
    * removed. For transitive duplicate groups this keeps exactly the
    * lowest id; for non-transitive chains it can remove more than a
    * greedy sweep would (pairs (1,3),(3,5) remove both 3 and 5, where
    * greedy keep-lowest retains 5) — the cheaper rule is the point: it
    * stays one distinct over the pair list, no iterative sweep.
    * Candidate generation never leaves a cluster — the whole operator is
    * the cluster assignment plus one blocked self-join, linear in corpus
    * size for balanced clusterings, with the degenerate-cluster cap
    * inherited from [[embeddingDupPairs]].
    *
    * Output: (id, cid) for every removed vector.
    */
  def semanticDupRemovals(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, minSim: Double,
      maxBlockDocs: Long = 10000): DataFrame = {
    // assignment columns live under reserved names while joined against
    // the caller's corpus: a corpus whose idCol is literally "id" (or
    // that carries its own "id"/"cid") would otherwise make these joins
    // ambiguous
    val asg = kmeansAssign(corpus, idCol, vecCol, k, iters)
      .select(col("id").as("__sdd_id"), col("cid").as("__sdd_cid"))
    val blocked = corpus.join(asg, corpus(idCol) === col("__sdd_id"))
      .drop("__sdd_id")
    val pairs = embeddingDupPairs(
      blocked, idCol, vecCol, "__sdd_cid", minSim, maxBlockDocs)
    pairs.select(col("id_b").as("__sdd_rm")).distinct()
      .join(asg, col("__sdd_rm") === col("__sdd_id"))
      .select(col("__sdd_id").as("id"), col("__sdd_cid").as("cid"))
  }

  /** Near-duplicate embedding pairs within a blocking key (e.g. a cluster
    * label): same-block self-join keeps the pair space linear in practice
    * while the threshold does the semantics.
    *
    * The self-join is quadratic INSIDE a block, so one dominant label
    * (unbalanced clustering, a catch-all "other" bucket) would pin a
    * reducer with ~n²/2 pairs. Blocks holding more than `maxBlockDocs`
    * vectors are dropped before the join — the same degenerate-bucket
    * guard as the dedup family's df-caps ([[Dedup.simhashPairs]]): a
    * block that hot needs a finer blocking key (e.g. IVF-list assignment,
    * [[ivfTopK]]'s centroid argmax), not a bigger reducer. The guard is
    * a map-side-combinable count + broadcast anti-join of the over-cap
    * keys, so no stage ever concentrates a hot block's rows.
    */
  def embeddingDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String, blockCol: String,
      minSim: Double, maxBlockDocs: Long = 10000): DataFrame = {
    // cached BEFORE both consumers (cap aggregation + self-join sides):
    // the input vector/assignment plan must evaluate once
    val c0 = graft.util.CacheSlots.rotateOne("similarity.embeddingDupPairs",
      corpus.select(
        col(blockCol).as("block"), col(idCol).as("id"),
        asDouble(col(vecCol)).as("v")))
    // over-cap blocks removed via combinable count + broadcast anti-join
    // (|hot| <= rows / cap by construction) — a count-over-partition
    // window would buffer the dominant block's vectors in one task,
    // stalling on exactly the catch-all-cluster input this cap guards
    val hotBlocks = c0.groupBy("block").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlockDocs).select("block")
    val c = c0.join(broadcast(hotBlocks), Seq("block"), "left_anti")
    c.as("a").join(c.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .withColumn("sim", round(dot(col("a.v"), col("b.v")), 4))
      .filter(col("sim") >= minSim)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("sim"))
  }
}
