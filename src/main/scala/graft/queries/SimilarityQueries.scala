package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{AudioCodec, ImageDedup, MediaRecord, Multimodal,
  Similarity}

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

  /** Near-duplicate embedding pairs blocked by cluster label; the
    * degenerate-block cap is mirrored in the oracle's QUALIFY so both
    * engines drop the same (none, at this fixture's balance) blocks.
    */
  def q28EmbeddingDupPairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingDupPairs(
        embAug(spark, dir),
        idCol = "vec_id", vecCol = "embedding", blockCol = "label",
        minSim = 0.95, maxBlockDocs = 10000)
      .orderBy("id_a", "id_b")

  val q28Oracle: String =
    s"""WITH $embAugSql,
      |c AS (
      |  SELECT label, vec_id, embedding::DOUBLE[] AS v FROM emb_aug
      |  QUALIFY count(*) OVER (PARTITION BY label) <= 10000
      |)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |       round(list_dot_product(a.v, b.v), 4) AS sim
      |FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_dot_product(a.v, b.v), 4) >= 0.95
      |ORDER BY id_a, id_b""".stripMargin

  /** LSH-bucketed approximate top-k — the 100 TB path (bucketed candidate
    * generation instead of a full scan per query). The md5-derived
    * hyperplanes are deterministic and engine-independent, so the oracle
    * regenerates them in SQL (`('0x'||hex)::BIGINT / 16^14 - 0.5`, the
    * same arithmetic as [[Similarity.planeComponent]]); recall vs the
    * exact baseline is additionally property-tested in PipelineSpec.
    */
  def q29AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.lshTopK(
        corpus = emb, queries = emb.filter(col("vec_id") % 100 === 0),
        idCol = "vec_id", vecCol = "embedding", k = 3,
        planes = 4, dim = 64)
      .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      .orderBy("query_id", "rnk")
  }

  val q29Oracle: String =
    """WITH pl AS (
      |  SELECT p, list_transform(range(0, 64),
      |           d -> ('0x' || substr(md5(p || ':' || d), 1, 14))::BIGINT
      |                / 72057594037927936.0 - 0.5) AS plane
      |  FROM (SELECT unnest(range(0, 4)) AS p)
      |),
      |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |sig AS (
      |  SELECT c.vec_id,
      |         CAST(sum(CASE WHEN list_dot_product(c.v, pl.plane) >= 0
      |                       THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM c, pl GROUP BY c.vec_id
      |),
      |corpus AS (
      |  SELECT c.vec_id AS neighbor_id, c.v AS cv, s.bucket
      |  FROM c JOIN sig s ON s.vec_id = c.vec_id
      |),
      |q AS (
      |  SELECT c.vec_id AS query_id, c.v AS qv,
      |         unnest([s.bucket, xor(s.bucket, 1), xor(s.bucket, 2),
      |                 xor(s.bucket, 4), xor(s.bucket, 8)]) AS bucket
      |  FROM c JOIN sig s ON s.vec_id = c.vec_id
      |  WHERE c.vec_id % 100 = 0
      |),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |         round(list_dot_product(qv, cv), 4) AS sim
      |  FROM corpus JOIN q USING (bucket)
      |  WHERE query_id <> neighbor_id
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY sim DESC, neighbor_id) AS rnk
      |  FROM scored
      |)
      |SELECT query_id, neighbor_id, sim, rnk
      |FROM ranked WHERE rnk <= 3
      |ORDER BY query_id, rnk""".stripMargin

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
    * (stubbed codec — see Multimodal.decodeStub). The stub features are
    * deterministic byte statistics, so the oracle recomputes them from
    * the same ASCII text the payload encodes: byte_mean = mean character
    * code, n_frames = the video frame-sampling arithmetic.
    */
  def q31MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
      .filter(col("media_id") % 11 === 0)
    Multimodal.extractFeatures(spark, media)
      .toDF()
      .select(
        col("media_id"), col("media_type"),
        col("n_bytes").cast("bigint").as("n_bytes"),
        round(col("byte_mean"), 4).as("byte_mean"), col("n_frames"))
      .orderBy("media_id")
  }

  val q31Oracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS media_type,
      |    CAST((doc_id % 120) * 250 AS INT) AS duration_ms,
      |    text
      |  FROM documents WHERE doc_id % 11 = 0
      |),
      |b AS (
      |  SELECT media_id, round(avg(ascii(substr(text, i, 1))), 4) AS byte_mean
      |  FROM m, unnest(range(1, length(text) + 1)) AS u(i)
      |  GROUP BY media_id
      |)
      |SELECT m.media_id, m.media_type,
      |       octet_length(encode(m.text)) AS n_bytes,
      |       coalesce(b.byte_mean, 0.0) AS byte_mean,
      |       CAST(CASE WHEN m.media_type = 'video'
      |                 THEN greatest(1, m.duration_ms // 1000)
      |                 ELSE 1 END AS INT) AS n_frames
      |FROM m LEFT JOIN b ON m.media_id = b.media_id
      |ORDER BY m.media_id""".stripMargin

  /** Frame sampling through the typed Dataset API: up to 4 evenly-spaced
    * payload slices per media row (Multimodal.sampleFrames — the stub
    * stands in for decoded video frames). The slice arithmetic is
    * deterministic, so the oracle states its closed form: frame size
    * len/4, 4 frames covering (len/4)*4 bytes once len >= 4, else one
    * 1-byte frame per byte.
    */
  def q45FrameSamples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
      .filter(col("media_id") % 13 === 0)
      .as[graft.pipeline.MediaRecord]
      .map { r =>
        val frames = Multimodal.sampleFrames(r.payload, 4)
        (r.media_id, r.media_type, frames.length.toLong,
          frames.map(_.length.toLong).sum)
      }
      .toDF("media_id", "media_type", "n_frames_sampled", "sampled_bytes")
      .orderBy("media_id")
  }

  val q45Oracle: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  CAST(least(4, octet_length(encode(text))) AS BIGINT)
      |    AS n_frames_sampled,
      |  CAST(CASE WHEN octet_length(encode(text)) >= 4
      |            THEN (octet_length(encode(text)) // 4) * 4
      |            ELSE octet_length(encode(text)) END AS BIGINT)
      |    AS sampled_bytes
      |FROM documents WHERE doc_id % 13 = 0
      |ORDER BY media_id""".stripMargin

  /** REAL audio decode through the same mapPartitions boundary as the
    * image path: deterministic 16-bit PCM samples (pure integer
    * arithmetic on (doc_id, i)) are wrapped in a hand-rolled RIFF/WAVE
    * container, decoded back through the JDK's `javax.sound.sampled`
    * parser ([[AudioCodec]]), and summarized. The oracle regenerates the
    * PCM from the same formula — decode(encode(pcm)) must reproduce it
    * exactly, so a wrong data offset, byte order, or sign convention in
    * the decode path breaks the match.
    *
    * The oracle-facing projection de-normalizes the float features back
    * to EXACT integers (amplitude sum, per-bucket counts): histogram
    * fractions like count/800 terminate on a 5th decimal '5', where
    * float32 representation error makes cross-engine rounding a coin
    * flip — integers have no such boundary.
    */
  def q71WavFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter(col("doc_id") % 17 === 0)
      .select(col("doc_id")).as[Long]
    val media = ids.map { id =>
      val n = (800 + (id % 5) * 100).toInt
      val samples = Array.tabulate(n) { i =>
        (((id * 7919L + i.toLong * 104729L) % 65536L) - 32768L).toShort
      }
      MediaRecord(id, "audio", 0, 0, 0, AudioCodec.encodePcm16Wav(samples, 8000))
    }.toDF()
    val total = ((col("n_bytes") - 44) / 2).cast("bigint")
    val counts = (0 until 8).map(i =>
      round(element_at(col("feature"), i + 1).cast("double") * total)
        .cast("bigint").as(s"c$i"))
    Multimodal.extractFeatures(spark, media).toDF()
      .select(Seq(
        col("media_id"),
        col("n_bytes").cast("bigint").as("n_bytes"),
        total.as("n_samples"),
        round(col("byte_mean") * total).cast("bigint").as("amp_sum")) ++ counts: _*)
      .orderBy("media_id")
  }

  val q71Oracle: String =
    """WITH p AS (
      |  SELECT doc_id, CAST(800 + (doc_id % 5) * 100 AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 17 = 0
      |),
      |s AS (
      |  SELECT p.doc_id, p.n,
      |         ((p.doc_id * 7919 + t.i * 104729) % 65536) - 32768 AS v
      |  FROM p, generate_series(0, 1199) AS t(i)
      |  WHERE t.i < p.n
      |)
      |SELECT doc_id AS media_id,
      |       CAST(44 + 2 * n AS BIGINT) AS n_bytes,
      |       n AS n_samples,
      |       CAST(sum(abs(v)) AS BIGINT) AS amp_sum,
      |       CAST(sum(CASE WHEN least(7, abs(v) // 4096) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
      |       CAST(sum(CASE WHEN least(7, abs(v) // 4096) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |       CAST(sum(CASE WHEN least(7, abs(v) // 4096) = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |       CAST(sum(CASE WHEN least(7, abs(v) // 4096) = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
      |       CAST(sum(CASE WHEN least(7, abs(v) // 4096) = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
      |       CAST(sum(CASE WHEN least(7, abs(v) // 4096) = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
      |       CAST(sum(CASE WHEN least(7, abs(v) // 4096) = 6 THEN 1 ELSE 0 END) AS BIGINT) AS c6,
      |       CAST(sum(CASE WHEN least(7, abs(v) // 4096) = 7 THEN 1 ELSE 0 END) AS BIGINT) AS c7
      |FROM s GROUP BY doc_id, n
      |ORDER BY media_id""".stripMargin

  /** IVF-bucketed approximate top-k. Assignment/probe ranking rounds
    * centroid similarities to 6 decimals (and output sims to 4), making
    * the whole operator engine-reproducible — the oracle re-runs the
    * quantizer in SQL. Recall vs the exact baseline is additionally
    * property-tested in PipelineSpec.
    */
  def q35AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopK(
        corpus = emb, queries = emb.filter(col("vec_id") % 100 === 0),
        idCol = "vec_id", vecCol = "embedding", k = 3,
        nCentroids = 16, nProbe = 4)
      .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      .orderBy("query_id", "rnk")
  }

  val q35Oracle: String =
    """WITH cents AS (
      |  SELECT vec_id AS cid, embedding::DOUBLE[] AS centroid
      |  FROM embeddings ORDER BY vec_id LIMIT 16
      |),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
      |assign0 AS (
      |  SELECT neighbor_id, cid,
      |         row_number() OVER (PARTITION BY neighbor_id
      |           ORDER BY round(list_dot_product(cv, centroid), 6) DESC, cid) AS rn
      |  FROM c, cents
      |),
      |assigned AS (
      |  SELECT c.neighbor_id, c.cv, a.cid
      |  FROM c JOIN assign0 a ON a.neighbor_id = c.neighbor_id AND a.rn = 1
      |),
      |q AS (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id % 100 = 0
      |),
      |probes0 AS (
      |  SELECT query_id, qv, cid,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY round(list_dot_product(qv, centroid), 6) DESC, cid) AS pr
      |  FROM q, cents
      |),
      |probes AS (SELECT query_id, qv, cid FROM probes0 WHERE pr <= 4),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |         round(list_dot_product(qv, cv), 4) AS sim
      |  FROM assigned JOIN probes USING (cid)
      |  WHERE query_id <> neighbor_id
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY sim DESC, neighbor_id) AS rnk
      |  FROM scored
      |)
      |SELECT query_id, neighbor_id, sim, rnk
      |FROM ranked WHERE rnk <= 3
      |ORDER BY query_id, rnk""".stripMargin

  /** Unrolled Lloyd iterations in SQL, mirroring
    * [[Similarity.kmeansAssign]] exactly: seed = k lowest-id vectors,
    * assignment = rounded-dot argmax (row_number tie-broken by cid),
    * update = per-(cid, dim) avg rounded to 6, empty clusters dropped by
    * GROUP BY. Expects a CTE named `c(id, v)` in scope; leaves `afinal`
    * (id, cid, csim, rn) for the caller to project.
    */
  private def kmeansSql(k: Int, iters: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"cents0 AS (SELECT id AS cid, v AS cv FROM c ORDER BY id LIMIT $k)")
    for (i <- 0 until iters) {
      sb.append(s""",
        |a$i AS (
        |  SELECT c.id, cid,
        |         row_number() OVER (PARTITION BY c.id
        |           ORDER BY round(list_dot_product(c.v, cv), 6) DESC, cid)
        |           AS rn
        |  FROM c, cents$i),
        |m$i AS (
        |  SELECT a.cid, u.i, round(avg(c.v[u.i]), 6) AS m
        |  FROM c JOIN (SELECT id, cid FROM a$i WHERE rn = 1) a USING (id),
        |       unnest(range(1, ${dim + 1})) AS u(i)
        |  GROUP BY a.cid, u.i),
        |cents${i + 1} AS (
        |  SELECT cid, list(m ORDER BY i) AS cv FROM m$i GROUP BY cid)"""
        .stripMargin)
    }
    sb.append(s""",
      |afinal AS (
      |  SELECT c.id, cid, round(list_dot_product(c.v, cv), 6) AS csim,
      |         row_number() OVER (PARTITION BY c.id
      |           ORDER BY round(list_dot_product(c.v, cv), 6) DESC, cid)
      |           AS rn
      |  FROM c, cents$iters)""".stripMargin)
    sb.toString
  }

  /** Distributed Lloyd's k-means: deterministic seed, two mean updates,
    * final assignment. The oracle replays every iteration in SQL.
    */
  def q66KmeansClusters(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansAssign(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        k = 8, iters = 2)
      .select(col("id").as("vec_id"), col("cid"), col("sim"))
      .orderBy("vec_id")

  val q66Oracle: String =
    s"""WITH c AS (
      |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
      |),
      |${kmeansSql(k = 8, iters = 2, dim = 64)}
      |SELECT id AS vec_id, cid, csim AS sim
      |FROM afinal WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** SemDeDup over the twin-planted corpus: k-means blocks, within-block
    * cosine pairs, greedy keep-lowest-id. Output = the removed vectors.
    */
  def q67SemanticDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticDupRemovals(
        embAug(spark, dir), "vec_id", "embedding",
        k = 8, iters = 2, minSim = 0.95, maxBlockDocs = 10000)
      .select(col("id").as("vec_id"), col("cid"))
      .orderBy("vec_id")

  val q67Oracle: String =
    s"""WITH $embAugSql,
      |c AS (
      |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM emb_aug
      |),
      |${kmeansSql(k = 8, iters = 2, dim = 64)},
      |asg AS (SELECT id, cid FROM afinal WHERE rn = 1),
      |blocked AS (
      |  SELECT c.id, c.v, a.cid FROM c JOIN asg a USING (id)
      |  QUALIFY count(*) OVER (PARTITION BY a.cid) <= 10000
      |),
      |pairs AS (
      |  SELECT b.id AS id_b
      |  FROM blocked a JOIN blocked b ON a.cid = b.cid AND a.id < b.id
      |  WHERE round(list_dot_product(a.v, b.v), 4) >= 0.95
      |)
      |SELECT DISTINCT p.id_b AS vec_id, a.cid
      |FROM pairs p JOIN asg a ON a.id = p.id_b
      |ORDER BY vec_id""".stripMargin

  /** IVF with a k-means-trained coarse quantizer: the production-index
    * composition ([[Similarity.ivfTopK]] with refineIters > 0 routes the
    * seed centroids through [[Similarity.kmeansAssign]]'s Lloyd rounds
    * before building inverted lists). The oracle replays the Lloyd
    * rounds (same CTEs as q66) and probes against the refined set —
    * `afinal` IS the corpus-to-list assignment.
    */
  def q69AnnIvfKmeans(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopK(
        corpus = emb, queries = emb.filter(col("vec_id") % 100 === 0),
        idCol = "vec_id", vecCol = "embedding", k = 3,
        nCentroids = 16, nProbe = 4, refineIters = 2)
      .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      .orderBy("query_id", "rnk")
  }

  val q69Oracle: String =
    s"""WITH c AS (
      |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
      |),
      |${kmeansSql(k = 16, iters = 2, dim = 64)},
      |assigned AS (
      |  SELECT c.id AS neighbor_id, c.v AS cv, a.cid
      |  FROM c JOIN (SELECT id, cid FROM afinal WHERE rn = 1) a USING (id)
      |),
      |q AS (
      |  SELECT id AS query_id, v AS qv FROM c WHERE id % 100 = 0
      |),
      |probes0 AS (
      |  SELECT query_id, qv, cid,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY round(list_dot_product(qv, cv2), 6) DESC, cid) AS pr
      |  FROM q, (SELECT cid, cv AS cv2 FROM cents2) cc
      |),
      |probes AS (SELECT query_id, qv, cid FROM probes0 WHERE pr <= 4),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |         round(list_dot_product(qv, cv), 4) AS sim
      |  FROM assigned JOIN probes USING (cid)
      |  WHERE query_id <> neighbor_id
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY sim DESC, neighbor_id) AS rnk
      |  FROM scored
      |)
      |SELECT query_id, neighbor_id, sim, rnk
      |FROM ranked WHERE rnk <= 3
      |ORDER BY query_id, rnk""".stripMargin

  /** REAL MP4 container parsing through the mapPartitions boundary:
    * deterministic (id-derived) track layouts are written by the
    * hand-rolled ISO-BMFF encoder and read back through the generic box
    * walker ([[graft.pipeline.VideoCodec]]) — major brand, mvhd
    * timescale/duration (BOTH v0 and v1 layouts, picked by id parity),
    * track count, first video codec fourcc, audio-track count. The
    * oracle restates the id formulas; every column is an exact integer
    * or fourcc string (the q71 de-normalization lesson). A wrong box
    * size, offset, or endianness in the walker breaks the match.
    */
  def q74Mp4Metadata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.pipeline.VideoCodec
    val ids = Tables.documents(spark, dir)
      .filter(col("doc_id") % 19 === 0)
      .select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val ts = 100L * (1 + id % 9)
        val durMs = 200L * (1 + id % 50)
        val tracks = ("vide", if (id % 2 == 0) "avc1" else "hev1") +:
          Seq.fill((id % 3).toInt)(("soun", "mp4a"))
        val bytes = VideoCodec.encodeMp4(
          majorBrand = if (id % 2 == 0) "isom" else "mp42",
          mvhdVersion = (id % 2).toInt,
          timescale = ts, duration = durMs * ts / 1000L, tracks = tracks)
        val m = VideoCodec.probe(bytes)
          .getOrElse(sys.error(s"mp4 probe failed for id=$id"))
        (id, m.majorBrand, m.timescale, m.durationUnits, m.durationMs,
          m.trackCount.toLong, m.videoCodec, m.audioTracks.toLong)
      }
    }.toDF("media_id", "major_brand", "timescale", "duration_units",
        "duration_ms", "n_tracks", "video_codec", "n_audio_tracks")
      .orderBy("media_id")
  }

  val q74Oracle: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS major_brand,
      |  CAST(100 * (1 + doc_id % 9) AS BIGINT) AS timescale,
      |  CAST((200 * (1 + doc_id % 50)) * (100 * (1 + doc_id % 9)) // 1000
      |    AS BIGINT) AS duration_units,
      |  CAST(200 * (1 + doc_id % 50) AS BIGINT) AS duration_ms,
      |  CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
      |  CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'hev1' END AS video_codec,
      |  CAST(doc_id % 3 AS BIGINT) AS n_audio_tracks
      |FROM documents WHERE doc_id % 19 = 0
      |ORDER BY media_id""".stripMargin

  /** q78: REAL video pixel decode — AVI with uncompressed DIB frames,
    * hand-encoded from id-derived pixel formulas
    * ([[graft.pipeline.VideoCodec.encodeAviDib]]), decoded through the
    * generic RIFF walker + the JDK's BMP reader, and routed through the
    * standard [[Multimodal.extractFeatures]] batch boundary. Every
    * output de-normalizes to exact integers (q71 lesson): per-pixel
    * integer luma1000 = 299r+587g+114b summed over ALL frames, 8
    * histogram-bucket counts, and the fixed container length formula.
    * `n_frames` comes from the decoder's movi walk, and the pixel-count
    * denominators reuse it — a dropped or duplicated frame breaks every
    * column at once.
    */
  def q78AviFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.pipeline.VideoCodec
    val ids = Tables.documents(spark, dir)
      .filter(col("doc_id") % 23 === 0)
      .select(col("doc_id")).as[Long]
    val media = ids.map { id =>
      val w = (8 + (id % 3) * 4).toInt
      val h = (6 + (id % 4) * 2).toInt
      val n = (3 + id % 3).toInt
      val frames = (0 until n).map { f =>
        val px = new Array[Byte](3 * w * h)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(i) = ((id * 31 + f * 17 + y * 5 + x * 3) % 256).toByte
            px(i + 1) = ((id * 13 + f * 19 + y * 7 + x * 11) % 256).toByte
            px(i + 2) = ((id * 29 + f * 23 + y * 3 + x * 13) % 256).toByte
            i += 3; x += 1
          }
          y += 1
        }
        px
      }
      MediaRecord(id, "video", w, h, n * 40,
        VideoCodec.encodeAviDib(frames, w, h, usPerFrame = 40000))
    }.toDF()
    val wCol = lit(8) + (col("media_id") % 3) * 4
    val hCol = lit(6) + (col("media_id") % 4) * 2
    val px = (col("n_frames") * wCol * hCol).cast("bigint")
    val counts = (0 until 8).map(i =>
      round(element_at(col("feature"), i + 1).cast("double") * px)
        .cast("bigint").as(s"c$i"))
    Multimodal.extractFeatures(spark, media).toDF()
      .select(Seq(
        col("media_id"),
        col("n_bytes").cast("bigint").as("n_bytes"),
        col("n_frames").cast("bigint").as("n_frames"),
        round(col("byte_mean") * px * 1000).cast("bigint").as("luma_sum"))
        ++ counts: _*)
      .orderBy("media_id")
  }

  val q78Oracle: String = {
    val buckets = (0 until 8).map(k =>
      s"CAST(sum(CASE WHEN least(7, luma // 32000) = $k THEN 1 ELSE 0 END) " +
        s"AS BIGINT) AS c$k").mkString(",\n|       ")
    s"""WITH p AS (
       |  SELECT doc_id,
       |         8 + (doc_id % 3) * 4 AS w,
       |         6 + (doc_id % 4) * 2 AS h,
       |         3 + (doc_id % 3) AS n
       |  FROM documents WHERE doc_id % 23 = 0
       |),
       |px AS (
       |  SELECT p.doc_id, p.w, p.h, p.n,
       |         299 * ((p.doc_id * 29 + f.i * 23 + y.i * 3 + x.i * 13) % 256)
       |       + 587 * ((p.doc_id * 13 + f.i * 19 + y.i * 7 + x.i * 11) % 256)
       |       + 114 * ((p.doc_id * 31 + f.i * 17 + y.i * 5 + x.i * 3) % 256)
       |           AS luma
       |  FROM p,
       |       generate_series(0, 4) AS f(i),
       |       generate_series(0, 11) AS y(i),
       |       generate_series(0, 15) AS x(i)
       |  WHERE f.i < p.n AND y.i < p.h AND x.i < p.w
       |)
       |SELECT doc_id AS media_id,
       |       CAST(224 + n * (8 + 3 * w * h) AS BIGINT) AS n_bytes,
       |       CAST(n AS BIGINT) AS n_frames,
       |       CAST(sum(luma) AS BIGINT) AS luma_sum,
       |       $buckets
       |FROM px GROUP BY doc_id, w, h, n
       |ORDER BY media_id""".stripMargin
  }

  /** q140: COMPRESSED-video pixel decode — Motion-JPEG AVI ('00dc'
    * chunks, each a self-contained JPEG) decoded through the RIFF walk +
    * the JDK JPEG reader ([[graft.pipeline.VideoCodec.decodeAvi]]),
    * retiring the last multimodal stub. JPEG is lossy in general, but
    * the fixture frames are solid grayscale at quality 1.0, which
    * round-trips EXACTLY (all-ones quant tables, DC-only blocks, no
    * color transform — see [[graft.pipeline.ImageCodec.encodeJpeg]]), so
    * the oracle replays per-frame luma as exact integers from the same
    * id formulas: frame f of id is gray (id*37 + f*11) % 256 at
    * 16 × (8 + id%3 · 8). Same de-normalized outputs as q78 (luma sum ×
    * 1000, histogram-bucket counts), same shared-frame-count coupling.
    */
  def q140MjpegFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.pipeline.{ImageCodec, VideoCodec}
    val ids = Tables.documents(spark, dir)
      .filter(col("doc_id") % 31 === 0)
      .select(col("doc_id")).as[Long]
    val media = ids.map { id =>
      val w = 16
      val h = (8 + (id % 3) * 8).toInt
      val n = (2 + id % 4).toInt
      val jpegs = (0 until n).map { f =>
        val g = ((id * 37 + f * 11) % 256).toInt
        ImageCodec.encodeJpeg(ImageCodec.grayImage(w, h, g), 1.0f)
      }
      MediaRecord(id, "video", w, h, n * 33,
        VideoCodec.encodeAviMjpeg(jpegs, w, h, usPerFrame = 33000))
    }.toDF()
    val px = (col("n_frames") * lit(16) *
      (lit(8) + (col("media_id") % 3) * 8)).cast("bigint")
    val counts = (0 until 8).map(i =>
      round(element_at(col("feature"), i + 1).cast("double") * px)
        .cast("bigint").as(s"c$i"))
    Multimodal.extractFeatures(spark, media).toDF()
      .select(Seq(
        col("media_id"),
        col("n_frames").cast("bigint").as("n_frames"),
        round(col("byte_mean") * px * 1000).cast("bigint").as("luma_sum"))
        ++ counts: _*)
      .orderBy("media_id")
  }

  val q140Oracle: String = {
    val buckets = (0 until 8).map(k =>
      s"CAST(sum(CASE WHEN least(7, (1000 * g) // 32000) = $k " +
        s"THEN w * h ELSE 0 END) AS BIGINT) AS c$k").mkString(",\n|       ")
    s"""WITH p AS (
       |  SELECT doc_id, 16 AS w, 8 + (doc_id % 3) * 8 AS h,
       |         2 + (doc_id % 4) AS n
       |  FROM documents WHERE doc_id % 31 = 0
       |),
       |f AS (
       |  SELECT p.doc_id, p.w, p.h, p.n,
       |         ((p.doc_id * 37 + fi.i * 11) % 256) AS g
       |  FROM p, generate_series(0, 4) AS fi(i)
       |  WHERE fi.i < p.n
       |)
       |SELECT doc_id AS media_id,
       |       CAST(n AS BIGINT) AS n_frames,
       |       CAST(sum(1000 * g * w * h) AS BIGINT) AS luma_sum,
       |       $buckets
       |FROM f GROUP BY doc_id, w, h, n
       |ORDER BY media_id""".stripMargin
  }

  /** q144: COLOR MJPEG pixel decode, tolerance-free — YCbCr 4:2:0 color
    * frames through the JDK JPEG reader with an EXACT integer oracle:
    * a solid color at quality 1.0 survives the trip as
    * invert(forward(rgb)) in libjpeg's fixed-point arithmetic (forward
    * jccolor.c, inverse jdcolor.c; the lossy middle is exact for
    * DC-only blocks under unit quant tables, and 4:2:0 subsampling of a
    * constant chroma plane is exact). The model
    * ([[graft.pipeline.ImageCodec.jpegSolidColorRoundTrip]]) is pinned
    * against the real decoder across a color grid in MultimodalSpec;
    * here the oracle replays it in SQL (floor(x/65536.0) = the
    * arithmetic >>16) over per-frame colors derived from the id.
    */
  def q144MjpegColorFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.pipeline.{ImageCodec, VideoCodec}
    val ids = Tables.documents(spark, dir)
      .filter(col("doc_id") % 37 === 0)
      .select(col("doc_id")).as[Long]
    val media = ids.map { id =>
      val w = 16
      val h = (8 + (id % 2) * 8).toInt
      val n = (2 + id % 3).toInt
      val jpegs = (0 until n).map { f =>
        ImageCodec.encodeJpeg(ImageCodec.colorImage(w, h,
          ((id * 53 + f * 7) % 256).toInt,
          ((id * 101 + f * 3) % 256).toInt,
          ((id * 197 + f * 13) % 256).toInt), 1.0f)
      }
      MediaRecord(id, "video", w, h, n * 33,
        VideoCodec.encodeAviMjpeg(jpegs, w, h, usPerFrame = 33000))
    }.toDF()
    val px = (col("n_frames") * lit(16) *
      (lit(8) + (col("media_id") % 2) * 8)).cast("bigint")
    val counts = (0 until 8).map(i =>
      round(element_at(col("feature"), i + 1).cast("double") * px)
        .cast("bigint").as(s"c$i"))
    Multimodal.extractFeatures(spark, media).toDF()
      .select(Seq(
        col("media_id"),
        col("n_frames").cast("bigint").as("n_frames"),
        round(col("byte_mean") * px * 1000).cast("bigint").as("luma_sum"))
        ++ counts: _*)
      .orderBy("media_id")
  }

  val q144Oracle: String = {
    val buckets = (0 until 8).map(k =>
      s"CAST(sum(CASE WHEN least(7, CAST(luma // 32000 AS BIGINT)) = $k " +
        s"THEN w * h ELSE 0 END) AS BIGINT) AS c$k").mkString(",\n|       ")
    s"""WITH p AS (
       |  SELECT doc_id, 16 AS w, 8 + (doc_id % 2) * 8 AS h,
       |         2 + (doc_id % 3) AS n
       |  FROM documents WHERE doc_id % 37 = 0
       |),
       |fr AS (
       |  SELECT p.doc_id, p.w, p.h, p.n,
       |         (p.doc_id * 53 + fi.i * 7) % 256 AS r,
       |         (p.doc_id * 101 + fi.i * 3) % 256 AS g,
       |         (p.doc_id * 197 + fi.i * 13) % 256 AS b
       |  FROM p, generate_series(0, 4) AS fi(i) WHERE fi.i < p.n
       |),
       |ycc AS (
       |  SELECT doc_id, w, h, n,
       |    CAST(floor((19595*r + 38470*g + 7471*b + 32768) / 65536.0) AS BIGINT) AS yy,
       |    CAST(floor((-11059*r - 21709*g + 32768*b + 8421375) / 65536.0) AS BIGINT) - 128 AS cb,
       |    CAST(floor((32768*r - 27439*g - 5329*b + 8421375) / 65536.0) AS BIGINT) - 128 AS cr
       |  FROM fr
       |),
       |dec AS (
       |  SELECT doc_id, w, h, n,
       |    greatest(0, least(255, yy + CAST(floor((91881*cr + 32768) / 65536.0) AS BIGINT))) AS r2,
       |    greatest(0, least(255, yy + CAST(floor((-22554*cb - 46802*cr + 32768) / 65536.0) AS BIGINT))) AS g2,
       |    greatest(0, least(255, yy + CAST(floor((116130*cb + 32768) / 65536.0) AS BIGINT))) AS b2
       |  FROM ycc
       |),
       |lum AS (
       |  SELECT doc_id, w, h, n, 299*r2 + 587*g2 + 114*b2 AS luma FROM dec
       |)
       |SELECT doc_id AS media_id,
       |       CAST(n AS BIGINT) AS n_frames,
       |       CAST(sum(luma * w * h) AS BIGINT) AS luma_sum,
       |       $buckets
       |FROM lum GROUP BY doc_id, w, h, n
       |ORDER BY media_id""".stripMargin
  }

  /** Semantic decontamination: every 23rd vector plays the benchmark
    * set; corpus vectors whose max cosine against it reaches 0.25 are
    * reported with their best-matching benchmark id. The oracle replays
    * the rounded-sim/lowest-id argmax per vector.
    */
  def q83SemanticDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.pipeline.Decontaminate.semanticContaminationReport(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 23 === 0), "vec_id", "embedding",
        minSim = 0.25)
      .orderBy("vec_id")
  }

  val q83Oracle: String =
    """WITH b AS (
      |  SELECT vec_id AS bid, embedding::DOUBLE[] AS bv
      |  FROM embeddings WHERE vec_id % 23 = 0
      |),
      |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (
      |  SELECT c.vec_id, b.bid, round(list_dot_product(v, bv), 4) AS sim
      |  FROM c JOIN b ON c.vec_id <> b.bid
      |),
      |m AS (
      |  SELECT vec_id, bid, sim,
      |         row_number() OVER (PARTITION BY vec_id
      |                            ORDER BY sim DESC, bid) AS rn
      |  FROM s
      |)
      |SELECT vec_id, bid AS bench_vec_id, sim AS max_sim
      |FROM m WHERE rn = 1 AND sim >= 0.25
      |ORDER BY vec_id""".stripMargin

  /** Semantic decontamination through the bench-side IVF index
    * ([[graft.pipeline.Decontaminate.semanticContaminationReportAnn]]):
    * same fixture as q83 (every 23rd vector plays the benchmark), but
    * each corpus vector scores only its 2-of-8 probed inverted lists —
    * the O(|corpus| x |bench| x nProbe/nCentroids) shape a 100k-row bench
    * battery needs instead of q83's exact crossJoin. The oracle replays
    * the identical routing algebra (bench quantization, row-local probe
    * argsort, per-id rounded-sim/lowest-id argmax), so the distributed
    * shape is proven row-equal to the routing semantics; PipelineSpec
    * separately pins nProbe = nCentroids ≡ the exact q83 report and the
    * partial-probe recall floor.
    */
  def q152SemanticDecontaminateAnn(
      spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.pipeline.Decontaminate.semanticContaminationReportAnn(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 23 === 0), "vec_id", "embedding",
        minSim = 0.25, nCentroids = 8, nProbe = 2)
      .orderBy("vec_id")
  }

  val q152Oracle: String =
    """WITH b AS (
      |  SELECT vec_id AS bid, embedding::DOUBLE[] AS bv
      |  FROM embeddings WHERE vec_id % 23 = 0
      |),
      |cents AS (
      |  SELECT bid AS cid, bv AS centroid FROM b ORDER BY bid LIMIT 8
      |),
      |bl AS (
      |  SELECT bid, bv, cid FROM (
      |    SELECT b.bid, b.bv, cents.cid,
      |           row_number() OVER (PARTITION BY b.bid
      |             ORDER BY round(list_dot_product(bv, centroid), 6) DESC,
      |                      cid) AS rn
      |    FROM b, cents) WHERE rn = 1
      |),
      |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |pr AS (
      |  SELECT vec_id, v, cid FROM (
      |    SELECT c.vec_id, c.v, cents.cid,
      |           row_number() OVER (PARTITION BY c.vec_id
      |             ORDER BY round(0 - list_dot_product(v, centroid), 6) ASC,
      |                      cid) AS k
      |    FROM c, cents) WHERE k <= 2
      |),
      |s AS (
      |  SELECT pr.vec_id, bl.bid, round(list_dot_product(v, bv), 4) AS sim
      |  FROM pr JOIN bl USING (cid) WHERE pr.vec_id <> bl.bid
      |),
      |m AS (
      |  SELECT vec_id, bid, sim,
      |         row_number() OVER (PARTITION BY vec_id
      |                            ORDER BY sim DESC, bid) AS rn
      |  FROM s
      |)
      |SELECT vec_id, bid AS bench_vec_id, sim AS max_sim
      |FROM m WHERE rn = 1 AND sim >= 0.25
      |ORDER BY vec_id""".stripMargin

  // ---- q93: contrastive hard-negative mining --------------------------

  /** [[Similarity.hardNegatives]] on the raw embeddings: for every 100th
    * vector, the 5 most-similar vectors of a DIFFERENT label — the
    * contrastive-training pair miner. The oracle is q27's top-k replay
    * plus the null-safe label-mismatch predicate.
    */
  def q93HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.hardNegatives(
        corpus = emb, queries = emb.filter(col("vec_id") % 100 === 0),
        idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = 5)
      .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      .orderBy("query_id", "rnk")
  }

  val q93Oracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, label AS query_label,
      |         embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id % 100 = 0
      |),
      |c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
      |             embedding::DOUBLE[] AS cv
      |      FROM embeddings),
      |scored AS (
      |  SELECT query_id, query_label, neighbor_id, neighbor_label,
      |         round(list_dot_product(qv, cv), 4) AS sim
      |  FROM c, q
      |  WHERE neighbor_label IS DISTINCT FROM query_label
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY sim DESC, neighbor_id) AS rnk
      |  FROM scored
      |)
      |SELECT query_id, query_label, neighbor_id, neighbor_label, sim, rnk
      |FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  // ---- q88: MP3 container metadata ------------------------------------

  /** Compressed-audio metadata at value level: hand-rolled CBR MP3 frame
    * sequences (id-derived bitrate/rate/frame count, alternating padding
    * bits, an ID3v2 tag on even ids) walked by the independent header
    * parser ([[AudioCodec.probeMp3]]). Every output is an exact integer
    * the oracle recomputes from the same id algebra — byte length checks
    * the frame-size formula per frame, duration checks the 1152-samples
    * constant, and a parser that miscounts or loses sync breaks every
    * column at once.
    */
  def q88Mp3Metadata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter(col("doc_id") % 13 === 0)
      .select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val b = 1 + (id % 14).toInt
        val r = (id % 3).toInt
        val nf = (40 + id % 20).toInt
        val frames = (0 until nf).map(i => (b, r, ((id + i) % 2) == 1))
        val id3 = if (id % 2 == 0) (id % 7).toInt * 3 else -1
        val bytes = AudioCodec.encodeMp3(frames, id3)
        val m = AudioCodec.probeMp3(bytes)
          .getOrElse(sys.error(s"mp3 probe failed for id=$id"))
        require(!m.vbr, "CBR fixture must not read as VBR")
        (id, m.nBytes.toLong, m.nFrames.toLong, m.sampleRate.toLong,
          m.bitrateKbps.toLong, m.durationMs)
      }
    }.toDF("media_id", "n_bytes", "n_frames", "sample_rate", "bitrate_kbps",
        "duration_ms")
      .orderBy("media_id")
  }

  val q88Oracle: String =
    """WITH p AS (
      |  SELECT doc_id,
      |         ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
      |           [CAST(doc_id % 14 AS INT) + 1] AS kbps,
      |         ([44100,48000,32000])[CAST(doc_id % 3 AS INT) + 1] AS sr,
      |         40 + doc_id % 20 AS nf
      |  FROM documents WHERE doc_id % 13 = 0
      |)
      |SELECT doc_id AS media_id,
      |  CAST((CASE WHEN doc_id % 2 = 0 THEN 10 + (doc_id % 7) * 3 ELSE 0 END)
      |    + nf * (144000 * kbps // sr)
      |    + (CASE WHEN doc_id % 2 = 0 THEN nf // 2 ELSE (nf + 1) // 2 END)
      |    AS BIGINT) AS n_bytes,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(sr AS BIGINT) AS sample_rate,
      |  CAST(kbps AS BIGINT) AS bitrate_kbps,
      |  CAST(nf * 1152 * 1000 // sr AS BIGINT) AS duration_ms
      |FROM p ORDER BY media_id""".stripMargin

  // ---- q99: perceptual image near-dup pairs (dHash + hamming bands) ---

  /** Deterministic 18x16 grayscale BMP fixture: base pixels are
    * md5-derived from (id/5, x, y) — so ids sharing a 5-block share a
    * base image — and each id perturbs ONE pixel (at (id%18, id%16), by
    * +128 mod 256). A single-pixel edit moves one 2x2 block sum and
    * flips at most two dHash bits, so within-group pairs sit at hamming
    * <= 4 while cross-group hashes are ~32 bits apart. BMP is lossless:
    * decode(encode(pixels)) == pixels, which is what lets the oracle
    * regenerate the pixels arithmetically.
    */
  private def dhashFixtureBmp(id: Long): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bi = new java.awt.image.BufferedImage(
      18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 18) {
        // first digest byte as unsigned — identical to the previous
        // hex-format-then-parse round trip, minus the two allocations
        var v = md.digest(s"${id / 5},$x,$y".getBytes("UTF-8"))(0) & 0xff
        if (x == (id % 18) && y == (id % 16)) v = (v + 128) % 256
        bi.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "bmp", bos)
    bos.toByteArray
  }

  /** REAL image decode → dHash → banded hamming pairs
    * ([[graft.pipeline.ImageDedup]]): perceptual near-duplicate image
    * detection, the multimodal complement of q47's text SimHash pairs.
    * The oracle regenerates the pixel grid from the md5 formula, pools
    * the same 2x2 block sums, rebuilds the 64-bit hash as five 13-bit
    * bands, and replays the band join + hamming filter — so a wrong
    * decode offset, luma weight, pooling, bit order, or band split all
    * break the match.
    */
  def q99ImageDhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val media = ids.map(id => (id, dhashFixtureBmp(id)))
      .toDF("media_id", "payload")
    ImageDedup.dhashPairs(spark, media, "media_id", "payload",
        maxHamming = 4)
      .orderBy("id_a", "id_b")
  }

  val q99Oracle: String =
    """WITH px AS (
      |  SELECT doc_id AS id, x, y,
      |         (('0x' || substr(md5((doc_id // 5) || ',' || x || ',' || y),
      |                          1, 2))::INT
      |          + CASE WHEN x = doc_id % 18 AND y = doc_id % 16
      |                 THEN 128 ELSE 0 END) % 256 AS v
      |  FROM documents, unnest(range(0, 18)) u(x), unnest(range(0, 16)) w(y)
      |),
      |blocks AS (
      |  SELECT id, x // 2 AS bx, y // 2 AS by, sum(v) AS s
      |  FROM px GROUP BY id, bx, by
      |),
      |bits AS (
      |  SELECT a.id, (a.by * 8 + a.bx) AS bit,
      |         CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bset
      |  FROM blocks a
      |  JOIN blocks b ON a.id = b.id AND a.by = b.by AND b.bx = a.bx + 1
      |  WHERE a.bx < 8
      |),
      |bands AS (
      |  SELECT id, bit // 13 AS band,
      |         CAST(sum(bset * (1::BIGINT << (bit % 13))) AS BIGINT) AS bv
      |  FROM bits GROUP BY id, band
      |),
      |cand AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |  FROM bands a
      |  JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.id < b.id
      |),
      |h AS (
      |  SELECT c.id_a, c.id_b,
      |         CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
      |  FROM cand c
      |  JOIN bands x ON x.id = c.id_a
      |  JOIN bands y ON y.id = c.id_b AND y.band = x.band
      |  GROUP BY c.id_a, c.id_b
      |)
      |SELECT id_a, id_b, hamming FROM h WHERE hamming <= 4
      |ORDER BY id_a, id_b""".stripMargin

  /** REAL image resize ([[graft.pipeline.Multimodal.resizeImages]] →
    * [[graft.pipeline.ImageCodec.resizeNearest]]): the q99 BMP fixtures
    * decode and nearest-neighbor-downsample 18x16 → 9x8 (dst (x,y)
    * selects src (2x, 2y) by exact integer arithmetic), and each
    * image's resized pixel sequence is md5'd. The oracle regenerates
    * the EXACT pixel values from the fixture formula, subsamples the
    * even coordinates, and hashes the identical row-major CSV — so a
    * decode offset, a rounding kernel sneaking in, or a pixel-order
    * drift breaks every row.
    */
  def q126ImageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val media = ids.map(id => (id, dhashFixtureBmp(id)))
      .toDF("media_id", "payload")
    graft.pipeline.Multimodal.resizeImages(
        spark, media, "media_id", "payload", w = 9, h = 8)
      .select(col("media_id"), col("src_w"), col("src_h"),
        md5(array_join(transform(col("pixels"),
          p => p.cast("string")), ",")).as("out_md5"))
      .orderBy("media_id")
  }

  val q126Oracle: String =
    """WITH px AS (
      |  SELECT doc_id AS id, x, y,
      |         (('0x' || substr(md5((doc_id // 5) || ',' || x || ',' || y),
      |                          1, 2))::INT
      |          + CASE WHEN x = doc_id % 18 AND y = doc_id % 16
      |                 THEN 128 ELSE 0 END) % 256 AS v
      |  FROM documents, unnest(range(0, 18)) u(x), unnest(range(0, 16)) w(y)
      |),
      |sub AS (
      |  SELECT id, x, y, v * 65793 AS rgb
      |  FROM px WHERE x % 2 = 0 AND y % 2 = 0
      |)
      |SELECT id AS media_id, 18 AS src_w, 16 AS src_h,
      |       md5(string_agg(CAST(rgb AS VARCHAR), ',' ORDER BY y, x))
      |         AS out_md5
      |FROM sub GROUP BY id ORDER BY media_id""".stripMargin

  /** Frame-windowed audio energy over the q71 WAV fixtures
    * ([[graft.pipeline.Multimodal.audioFrameEnergies]]): real WAV
    * decode, 200-sample (25 ms at 8 kHz) non-overlapping frames, exact
    * Σ|s| and max|s| per frame — every frame of every fixture replayed
    * arithmetically by the oracle, including the short trailing frame.
    */
  def q127AudioFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter(col("doc_id") % 17 === 0)
      .select(col("doc_id")).as[Long]
    val media = ids.map { id =>
      val n = (800 + (id % 5) * 100).toInt
      val samples = Array.tabulate(n) { i =>
        (((id * 7919L + i.toLong * 104729L) % 65536L) - 32768L).toShort
      }
      (id, AudioCodec.encodePcm16Wav(samples, 8000))
    }.toDF("media_id", "payload")
    Multimodal.audioFrameEnergies(
        spark, media, "media_id", "payload", frameSamples = 200)
      .orderBy("media_id", "frame_idx")
  }

  val q127Oracle: String =
    """WITH p AS (
      |  SELECT doc_id, CAST(800 + (doc_id % 5) * 100 AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 17 = 0
      |),
      |s AS (
      |  SELECT p.doc_id, t.i,
      |         ((p.doc_id * 7919 + t.i * 104729) % 65536) - 32768 AS v
      |  FROM p, generate_series(0, 1199) AS t(i)
      |  WHERE t.i < p.n
      |)
      |SELECT doc_id AS media_id,
      |       CAST(i // 200 AS INT) AS frame_idx,
      |       CAST(count(*) AS INT) AS n_in_frame,
      |       CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
      |       CAST(max(abs(v)) AS INT) AS peak
      |FROM s GROUP BY doc_id, i // 200
      |ORDER BY media_id, frame_idx""".stripMargin

  /** IVF ANN with a CORPUS-SIZED query set ([[Similarity.ivfTopKBig]]):
    * every embedding queries the index at once — the all-pairs regime
    * (global embedding dedup) where broadcasting the query side is
    * impossible. The probe set flows through a shuffle merge-join on the
    * list id (PlanSpec gates that no plan broadcasts it); the oracle
    * replays the identical routing + rank algebra with queries = the
    * whole table, so the distributed shape is proven row-equal to the
    * reference semantics.
    */
  def q143IvfCorpusQueries(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopKBig(
        corpus = emb, queries = emb,
        idCol = "vec_id", vecCol = "embedding", k = 2,
        nCentroids = 16, nProbe = 2)
      .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      .orderBy("query_id", "rnk")
  }

  val q143Oracle: String =
    """WITH cents AS (
      |  SELECT vec_id AS cid, embedding::DOUBLE[] AS centroid
      |  FROM embeddings ORDER BY vec_id LIMIT 16
      |),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
      |assign0 AS (
      |  SELECT neighbor_id, cid,
      |         row_number() OVER (PARTITION BY neighbor_id
      |           ORDER BY round(list_dot_product(cv, centroid), 6) DESC, cid) AS rn
      |  FROM c, cents
      |),
      |assigned AS (
      |  SELECT c.neighbor_id, c.cv, a.cid
      |  FROM c JOIN assign0 a ON a.neighbor_id = c.neighbor_id AND a.rn = 1
      |),
      |q AS (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
      |),
      |probes0 AS (
      |  SELECT query_id, qv, cid,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY round(list_dot_product(qv, centroid), 6) DESC, cid) AS pr
      |  FROM q, cents
      |),
      |probes AS (SELECT query_id, qv, cid FROM probes0 WHERE pr <= 2),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |         round(list_dot_product(qv, cv), 4) AS sim
      |  FROM assigned JOIN probes USING (cid)
      |  WHERE query_id <> neighbor_id
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY sim DESC, neighbor_id) AS rnk
      |  FROM scored
      |)
      |SELECT query_id, neighbor_id, sim, rnk
      |FROM ranked WHERE rnk <= 2
      |ORDER BY query_id, rnk""".stripMargin

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q143_ivf_corpus_queries" -> (q143IvfCorpusQueries _),
    "q144_mjpeg_color_features" -> (q144MjpegColorFeatures _),
    "q126_image_resize" -> (q126ImageResize _),
    "q127_audio_frames" -> (q127AudioFrames _),
    "q99_image_dhash_pairs" -> (q99ImageDhashPairs _),
    "q27_embedding_topk" -> (q27EmbeddingTopK _),
    "q28_embedding_dup_pairs" -> (q28EmbeddingDupPairs _),
    "q29_ann_lsh" -> (q29AnnLsh _),
    "q30_media_meta" -> (q30MediaMeta _),
    "q31_media_features" -> (q31MediaFeatures _),
    "q35_ann_ivf" -> (q35AnnIvf _),
    "q45_frame_samples" -> (q45FrameSamples _),
    "q71_wav_features" -> (q71WavFeatures _),
    "q74_mp4_metadata" -> (q74Mp4Metadata _),
    "q88_mp3_metadata" -> (q88Mp3Metadata _),
    "q93_hard_negatives" -> (q93HardNegatives _),
    "q78_avi_features" -> (q78AviFeatures _),
    "q140_mjpeg_features" -> (q140MjpegFeatures _),
    "q66_kmeans_clusters" -> (q66KmeansClusters _),
    "q67_semantic_dedup" -> (q67SemanticDedup _),
    "q69_ann_ivf_kmeans" -> (q69AnnIvfKmeans _),
    "q83_semantic_decontaminate" -> (q83SemanticDecontaminate _),
    "q152_semantic_decontaminate_ann" -> (q152SemanticDecontaminateAnn _)
  )

  def oracles: Map[String, String] = Map(
    "q143_ivf_corpus_queries" -> q143Oracle,
    "q144_mjpeg_color_features" -> q144Oracle,
    "q126_image_resize" -> q126Oracle,
    "q127_audio_frames" -> q127Oracle,
    "q99_image_dhash_pairs" -> q99Oracle,
    "q27_embedding_topk" -> q27Oracle,
    "q28_embedding_dup_pairs" -> q28Oracle,
    "q29_ann_lsh" -> q29Oracle,
    "q30_media_meta" -> q30Oracle,
    "q31_media_features" -> q31Oracle,
    "q35_ann_ivf" -> q35Oracle,
    "q45_frame_samples" -> q45Oracle,
    "q71_wav_features" -> q71Oracle,
    "q74_mp4_metadata" -> q74Oracle,
    "q88_mp3_metadata" -> q88Oracle,
    "q93_hard_negatives" -> q93Oracle,
    "q78_avi_features" -> q78Oracle,
    "q140_mjpeg_features" -> q140Oracle,
    "q66_kmeans_clusters" -> q66Oracle,
    "q67_semantic_dedup" -> q67Oracle,
    "q69_ann_ivf_kmeans" -> q69Oracle,
    "q83_semantic_decontaminate" -> q83Oracle,
    "q152_semantic_decontaminate_ann" -> q152Oracle
  )
}
