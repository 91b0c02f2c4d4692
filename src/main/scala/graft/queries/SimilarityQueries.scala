package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{Multimodal, Similarity}

/** Oracle-checked similarity-search and multimodal queries over the
  * `embeddings` and `documents` tables. The embedding vectors are
  * pre-normalized (self-dot = 1.0) so cosine = dot product; both engines
  * cast float -> double, fold in array order, and round to 4 decimals
  * before ranking, which makes top-k reproducible.
  */
object SimilarityQueries {

  /** Exact brute-force top-3 cosine neighbors for every 100th vector. */
  def q27EmbeddingTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopK(
        corpus = emb, queries = emb.filter(col("vec_id") % 100 === 0),
        idCol = "vec_id", vecCol = "embedding", k = 3)
      .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      .orderBy("query_id", "rnk")
  }

  val q27Oracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id % 100 = 0
      |),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |         round(list_dot_product(qv, cv), 4) AS sim
      |  FROM c, q WHERE query_id <> neighbor_id
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY sim DESC, neighbor_id) AS rnk
      |  FROM scored
      |)
      |SELECT query_id, neighbor_id, sim, rnk
      |FROM ranked WHERE rnk <= 3
      |ORDER BY query_id, rnk""".stripMargin

  /** Planted near-duplicate vectors: every 41st vector gets an exact twin
    * (the raw corpus has no close pairs — max within-label cosine ~0.47).
    */
  val embAugSql: String =
    """emb_aug AS (
      |  SELECT vec_id, label, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id, label, embedding
      |  FROM embeddings WHERE vec_id % 41 = 0
      |)""".stripMargin

  def embAug(spark: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    spark.sql(s"WITH $embAugSql SELECT * FROM emb_aug")
  }

  /** Near-duplicate embedding pairs blocked by cluster label. */
  def q28EmbeddingDupPairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingDupPairs(
        embAug(spark, dir),
        idCol = "vec_id", vecCol = "embedding", blockCol = "label",
        minSim = 0.95)
      .orderBy("id_a", "id_b")

  val q28Oracle: String =
    s"""WITH $embAugSql,
      |c AS (
      |  SELECT label, vec_id, embedding::DOUBLE[] AS v FROM emb_aug
      |)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |       round(list_dot_product(a.v, b.v), 4) AS sim
      |FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_dot_product(a.v, b.v), 4) >= 0.95
      |ORDER BY id_a, id_b""".stripMargin

  /** LSH-bucketed approximate top-k — the 100 TB path (bucketed candidate
    * generation instead of a full scan per query). No SQL oracle: the
    * plane construction is engine-side; recall vs the exact baseline is
    * property-tested in PipelineSpec.
    */
  def q29AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.lshTopK(
        corpus = emb, queries = emb.filter(col("vec_id") % 100 === 0),
        idCol = "vec_id", vecCol = "embedding", k = 3,
        planes = 4, dim = 64)
      .withColumnRenamed("rank", "rnk")
      .orderBy("query_id", "rnk")
  }

  /** Multimodal metadata + payload plumbing: binary column, typed
    * metadata, content digest.
    */
  def q30MediaMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
      .filter(col("media_id") % 11 === 0)
      .select(
        col("media_id"), col("media_type"), col("width"), col("height"),
        col("duration_ms"),
        octet_length(col("payload")).cast("bigint").as("n_bytes"),
        sha2(col("payload"), 256).as("sha"))
      .orderBy("media_id")

  val q30Oracle: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  CAST(64 + (doc_id % 16) * 16 AS INT) AS width,
      |  CAST(64 + (doc_id % 9) * 16 AS INT) AS height,
      |  CAST((doc_id % 120) * 250 AS INT) AS duration_ms,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS sha
      |FROM documents WHERE doc_id % 11 = 0
      |ORDER BY media_id""".stripMargin

  /** Batch "decode" feature extraction through the mapPartitions boundary
    * (stubbed codec — see Multimodal.decodeStub). Rows-only check.
    */
  def q31MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
      .filter(col("media_id") % 11 === 0)
    Multimodal.extractFeatures(spark, media)
      .toDF()
      .select(
        col("media_id"), col("media_type"), col("n_bytes"),
        round(col("byte_mean"), 4).as("byte_mean"), col("n_frames"))
      .orderBy("media_id")
  }

  /** IVF-bucketed approximate top-k (rows-only; recall property-tested
    * against the exact baseline in PipelineSpec).
    */
  def q35AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopK(
        corpus = emb, queries = emb.filter(col("vec_id") % 100 === 0),
        idCol = "vec_id", vecCol = "embedding", k = 3,
        nCentroids = 16, nProbe = 4)
      .withColumnRenamed("rank", "rnk")
      .orderBy("query_id", "rnk")
  }

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_embedding_topk" -> (q27EmbeddingTopK _),
    "q28_embedding_dup_pairs" -> (q28EmbeddingDupPairs _),
    "q29_ann_lsh" -> (q29AnnLsh _),
    "q30_media_meta" -> (q30MediaMeta _),
    "q31_media_features" -> (q31MediaFeatures _),
    "q35_ann_ivf" -> (q35AnnIvf _)
  )

  def oracles: Map[String, String] = Map(
    "q27_embedding_topk" -> q27Oracle,
    "q28_embedding_dup_pairs" -> q28Oracle,
    "q30_media_meta" -> q30Oracle
  )
}
