package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Let, VectorFunctions}

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): split each `dim`-vector into `m`
  * subspaces, quantize every sub-vector to the nearest of `k` per-
  * subspace codewords, and answer similarity queries from the m-byte
  * code instead of the raw floats — the memory-scale path for ANN. At
  * 100 TB of float32 embeddings, the PQ code table is 32× smaller
  * (m=8 codes vs 64 floats here): the exhaustive ADC scan reads a
  * few bytes per row, and the raw vectors are touched only to rerank a
  * per-query shortlist.
  *
  * Codebooks here are *sampled* — per subspace, the sub-vectors of the
  * `k` lowest-md5-rank rows (a deterministic pseudo-random sample, the
  * reservoir-free spelling of "init from data"). That keeps every value
  * a verbatim float-cast from the corpus (no training arithmetic to
  * drift across engines) so the whole pipeline — sampling, encoding,
  * ADC, rerank — replays exactly in the SQL oracle. Refining them with
  * [[Similarity]]'s Lloyd loop per subspace is a drop-in upgrade (the
  * codebook is just the input array); the operator shapes below don't
  * change.
  *
  * Shapes at scale: sampling is m TakeOrderedAndProject jobs (per-
  * partition top-k, driver merge — no global sort); encoding is a
  * zero-shuffle projection with literal codebooks (the [[Similarity]]
  * literal-argmax pattern, same ~256-codeword codegen ceiling); the ADC
  * scan broadcasts the query side like [[Similarity.bruteForceTopK]];
  * reranking joins raw vectors for shortlist rows only.
  */
object Pq {

  /** m × (≤k) × dsub codewords; `codes(s)(j)` is subspace `s`'s `j`-th
    * codeword. Values are exact float→double casts of corpus entries.
    */
  final case class Codebooks(
      m: Int, dsub: Int, codes: Array[Array[Array[Double]]])

  private def mdRank(s: Int, id: Column): Column =
    conv(substring(md5(concat_ws(":", lit(s), id.cast("string"))), 1, 14),
      16, 10).cast("long")

  /** Deterministic per-subspace codeword sample: the sub-vectors of the
    * `k` rows with the smallest md5(s:id) rank (ties by id). One
    * TakeOrderedAndProject per subspace — k rows to the driver each,
    * never a full sort.
    */
  def sampleCodebooks(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Codebooks = {
    val first = corpus.select(col(vecCol)).limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        "sampleCodebooks: empty corpus — nothing to train codebooks on"))
    val dim = first.getSeq[Any](0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val codes = Array.tabulate(m) { s =>
      corpus
        .select(col(idCol).cast("long").as("id"),
          col(vecCol).cast("array<double>").as("v"))
        .orderBy(mdRank(s, col("id")).asc, col("id").asc)
        .limit(k)
        .collect()
        .map(r => r.getSeq[Double](1).slice(s * dsub, (s + 1) * dsub).toArray)
    }
    Codebooks(m, dsub, codes)
  }

  private def litArr(c: Array[Double]): Column =
    array(c.toIndexedSeq.map(lit): _*)

  /** ‖xs − c‖² via the expanded form xx − 2·(xs·c) + cc, all three dot
    * products in sequential summation order so the oracle's
    * list_dot_product replays it bit-for-bit.
    */
  private def subDist2(xs: Column, xx: Column, c: Array[Double]): Column = {
    val cc = c.foldLeft(0.0)((a, x) => a + x * x)
    xx - lit(2.0) * VectorFunctions.vecDot(xs, litArr(c)) + lit(cc)
  }

  /** The m-entry code array for one vector column — a pure literal-
    * codebook projection; ties in the argmin go to the smallest codeword
    * index on the 6-dp-rounded distance, mirroring the oracle's
    * row_number.
    */
  private def codesColumn(vec: Column, cb: Codebooks): Column =
    Let.let(vec.cast("array<double>"), v =>
      array((0 until cb.m).map { s =>
        Let.let(slice(v, s * cb.dsub + 1, cb.dsub), xs =>
          Let.let(VectorFunctions.vecDot(xs, xs), xx =>
            array_min(array(cb.codes(s).zipWithIndex.map { case (c, j) =>
              struct(
                round(subDist2(xs, xx, c), 6).as("d"),
                lit(j).as("code"))
            }.toIndexedSeq: _*)).getField("code")))
      }: _*))

  /** PQ-encode the corpus: (idCol, codes array<int>). A pure projection —
    * literal codebooks, no join, no shuffle.
    */
  def encode(
      corpus: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks): DataFrame =
    corpus.select(col(idCol), codesColumn(col(vecCol), cb).as("codes"))

  /** ADC score: Σ_s dot(query_sub, codeword(code_s)) — the query side is
    * a raw vector column, the corpus side only its code array.
    */
  private def adcExpr(qv: Column, codes: Column, cb: Codebooks): Column =
    (0 until cb.m).map { s =>
      val cbS: Column = typedlit[Seq[Seq[Double]]](
        cb.codes(s).map(_.toSeq).toSeq)
      VectorFunctions.vecDot(
        slice(qv, s * cb.dsub + 1, cb.dsub),
        element_at(cbS, element_at(codes, s + 1) + 1))
    }.reduce(_ + _)

  /** Asymmetric-distance top-k: approximate dot(query, vector) as
    * Σ_s dot(query_sub, codeword(code_s)) read off the code array, rank
    * per query on the rounded ADC score, then rerank the shortlist with
    * the exact dot against the raw vectors (the only place raw floats
    * are read). Output: (query_id, neighbor_id, adc_sim, exact_sim,
    * rnk ≤ k).
    */
  def adcTopK(
      encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, cb: Codebooks, k: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val adc = adcExpr(col("__qv"), col("codes"), cb)
    val scored = encoded
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("__qv"),
        round(adc, 4).as("adc_sim"))
    val ranked = scored
      .withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("adc_sim").desc, col("neighbor_id").asc)))
      .filter(col("rnk") <= k)
    ranked
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__nv")), Seq("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"), col("adc_sim"),
        round(VectorFunctions.vecDot(col("__qv"), col("__nv")), 4)
          .as("exact_sim"),
        col("rnk").cast("long").as("rnk"))
  }

  /** IVF-PQ — the production index composition (FAISS `IVFx,PQy`): a
    * coarse quantizer partitions the corpus into inverted lists, each
    * query probes its `nProbe` nearest lists, candidates are scored from
    * their m-byte PQ codes (ADC), and only the per-query shortlist
    * touches raw floats for the exact rerank. Relative to [[adcTopK]]'s
    * exhaustive code scan, the candidate set shrinks to
    * nProbe/nCentroids of the corpus; relative to
    * [[Similarity.ivfTopK]], candidate scoring reads codes, not vectors.
    *
    * Shapes at scale: ONE corpus pass computes both the list assignment
    * and the code array (two literal projections over the same scan);
    * probes broadcast; the candidate join is an equi-join on the list id
    * (never all-pairs); the rerank join touches k rows per query.
    * Output: (query_id, neighbor_id, cid, adc_sim, exact_sim, rnk) —
    * `cid` pins list membership cross-engine.
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, cb: Codebooks, k: Int,
      nCentroids: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c0 = corpus.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val centArr = c0.orderBy(col("id")).limit(nCentroids).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

    // one pass over the corpus: list id + code array, both projections
    val lists = Similarity.assignToCentroids(c0, centArr)
      .select(col("id").as("neighbor_id"), col("cid"),
        codesColumn(col("v"), cb).as("codes"))

    import corpus.sparkSession.implicits._
    val cents = broadcast(
      centArr.toSeq.toDF("cid", "centroid")
        .select(col("cid"),
          col("centroid").cast("array<double>").as("centroid")))
    val q = queries.select(
      col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val probes = q.crossJoin(cents)
      .withColumn("csim",
        round(VectorFunctions.vecDot(col("__qv"), col("centroid")), 6))
      .withColumn("pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cid"))))
      .filter(col("pr") <= nProbe)
      .select("query_id", "__qv", "cid")

    val scored = lists.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cid"), col("__qv"),
        round(adcExpr(col("__qv"), col("codes"), cb), 4).as("adc_sim"))
    val ranked = scored
      .withColumn("rnk", row_number().over(Window
        .partitionBy("query_id")
        .orderBy(col("adc_sim").desc, col("neighbor_id").asc)))
      .filter(col("rnk") <= k)
    ranked
      .join(corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__nv")), Seq("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"), col("cid"), col("adc_sim"),
        round(VectorFunctions.vecDot(col("__qv"), col("__nv")), 4)
          .as("exact_sim"),
        col("rnk").cast("long").as("rnk"))
  }
}
