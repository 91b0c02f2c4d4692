package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{Curation, Similarity, TextAnalysis}

/** Oracle-checked corpus-curation queries: deterministic dataset splits,
  * PII redaction, vocabulary construction, and per-label embedding
  * centroids — the operators that sit around the cleaning funnel in a
  * real training-data run. Every formula is mirrored verbatim in DuckDB
  * (md5 hash fractions, identical regex strings, per-dimension avg).
  */
object CurationQueries {

  // ---- q41: deterministic hash split ----------------------------------

  def q41HashSplit(spark: SparkSession, dir: String): DataFrame =
    Curation.hashSplit(Tables.documents(spark, dir), "doc_id")
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "split")

  val q41Oracle: String =
    """WITH f AS (
      |  SELECT lang,
      |         ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::INT
      |           / 65536.0 AS frac
      |  FROM documents
      |)
      |SELECT lang,
      |       CASE WHEN frac < 0.8 THEN 'train'
      |            WHEN frac < 0.9 THEN 'val'
      |            ELSE 'test' END AS split,
      |       count(*) AS n_docs
      |FROM f GROUP BY lang, split ORDER BY lang, split""".stripMargin

  // ---- q42: PII redaction ---------------------------------------------

  /** Planted PII: every 29th document gets an email, phone, and IP
    * appended — shared SQL so both engines see identical inputs.
    */
  val docsPiiSql: String =
    """docs_pii AS (
      |  SELECT doc_id, source, lang,
      |         CASE WHEN doc_id % 29 = 0
      |              THEN text || ' contact: user' || doc_id ||
      |                   '@example.com or 555-123-4567 at 10.0.0.' ||
      |                   (doc_id % 255)
      |              ELSE text END AS text
      |  FROM documents
      |)""".stripMargin

  def q42PiiRedaction(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    val docs = spark.sql(s"WITH $docsPiiSql SELECT * FROM docs_pii")
    docs
      .select(
        col("source"),
        TextAnalysis.piiEmailCount(col("text")).as("e"),
        TextAnalysis.piiPhoneCount(col("text")).as("p"),
        TextAnalysis.piiIpCount(col("text")).as("i"),
        length(TextAnalysis.redactPii(col("text"))).as("lr"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("e").as("n_emails"),
        sum("p").as("n_phones"),
        sum("i").as("n_ips"),
        sum("lr").as("len_redacted"))
      .orderBy("source")
  }

  val q42Oracle: String = {
    import TextAnalysis.{PiiEmail, PiiIp, PiiPhone}
    s"""WITH $docsPiiSql
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(len(regexp_extract_all(text, '$PiiEmail'))) AS BIGINT)
       |    AS n_emails,
       |  CAST(sum(len(regexp_extract_all(text, '$PiiPhone'))) AS BIGINT)
       |    AS n_phones,
       |  CAST(sum(len(regexp_extract_all(text, '$PiiIp'))) AS BIGINT)
       |    AS n_ips,
       |  CAST(sum(length(
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '$PiiEmail', '[EMAIL]', 'g'),
       |      '$PiiPhone', '[PHONE]', 'g'),
       |      '$PiiIp', '[IP]', 'g'))) AS BIGINT) AS len_redacted
       |FROM docs_pii GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- q43: vocabulary ------------------------------------------------

  def q43Vocabulary(spark: SparkSession, dir: String): DataFrame =
    Curation.vocabulary(Tables.documents(spark, dir), "text",
        minDf = 5, topK = 25)
      .orderBy("rank")

  val q43Oracle: String =
    s"""WITH tok AS (
       |  SELECT unnest(list_distinct(string_split(
       |           ${PipelineQueries.normSql}, ' '))) AS token
       |  FROM documents
       |),
       |df AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
       |ranked AS (
       |  SELECT token, df,
       |         row_number() OVER (ORDER BY df DESC, token) AS rank
       |  FROM df WHERE df >= 5
       |)
       |SELECT token, df, rank FROM ranked
       |WHERE rank <= 25 ORDER BY rank""".stripMargin

  // ---- q44: per-label embedding centroids -----------------------------

  def q44LabelCentroids(spark: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroids(
        Tables.embeddings(spark, dir), "label", "embedding")
      .select("label", "n_vectors", "centroid_norm")
      .orderBy("label")

  val q44Oracle: String =
    """WITH d AS (
      |  SELECT label, i, embedding[i]::DOUBLE AS v
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
      |),
      |m AS (
      |  SELECT label, i, avg(v) AS m, count(*) AS n
      |  FROM d GROUP BY label, i
      |)
      |SELECT label, max(n) AS n_vectors,
      |       round(sqrt(sum(m * m)), 4) AS centroid_norm
      |FROM m GROUP BY label ORDER BY label""".stripMargin

  // ---- q55: deterministic stratified sampling -------------------------

  /** Per-language sampling quotas — over-keep the head language's
    * counterweight strata. The md5-fraction membership rule is the same
    * one q41 proves deterministic.
    */
  private val SampleRates = Map("en" -> 0.5, "zh" -> 0.3)
  private val DefaultRate = 0.1

  def q55StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val totals = docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
    val sampled = Curation
      .stratifiedSample(docs, "doc_id", "lang", SampleRates, DefaultRate)
      .groupBy(col("lang").as("s_lang")).agg(count(lit(1)).as("n_sampled"))
    // null-safe join: a NULL stratum (sampled under the default rate)
    // must still line up with its totals row
    totals.join(sampled, totals("lang") <=> sampled("s_lang"), "left")
      .select(col("lang"), col("n_total"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy("lang")
  }

  val q55Oracle: String =
    """WITH f AS (
      |  SELECT lang,
      |         ('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 4))::INT
      |           / 65536.0 AS frac
      |  FROM documents
      |)
      |SELECT lang, count(*) AS n_total,
      |       CAST(sum(CASE WHEN frac < (CASE lang WHEN 'en' THEN 0.5
      |                                            WHEN 'zh' THEN 0.3
      |                                            ELSE 0.1 END)
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      |FROM f GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q56: embedding normalization + int8 quantization ---------------

  def q56QuantizeEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val d = col("embedding").cast("array<double>")
    Tables.embeddings(spark, dir)
      .filter(array_max(transform(d, x => abs(x))) > 0)
      .select(col("label"),
        Similarity.norm(d).as("nrm"),
        Similarity.quantizeInt8(col("embedding")).as("q"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg("nrm"), 4).as("avg_norm"),
        sum(aggregate(col("q"), lit(0L),
          (acc, x) => acc + abs(x).cast("long"))).as("sum_qabs"),
        min(array_min(col("q"))).as("min_q"),
        max(array_max(col("q"))).as("max_q"))
      .orderBy("label")
  }

  val q56Oracle: String =
    """WITH v AS (
      |  SELECT label,
      |         list_transform(embedding, x -> x::DOUBLE) AS d
      |  FROM embeddings
      |),
      |w AS (
      |  SELECT label, d,
      |         list_aggregate(list_transform(d, x -> abs(x)), 'max') AS mx,
      |         sqrt(list_aggregate(list_transform(d, x -> x * x), 'sum'))
      |           AS nrm
      |  FROM v
      |),
      |q AS (
      |  SELECT label, nrm,
      |         list_transform(d, x -> CAST(round(x * 127.0 / mx) AS INT))
      |           AS q
      |  FROM w WHERE mx > 0
      |)
      |SELECT label, count(*) AS n_vecs,
      |       round(avg(nrm), 4) AS avg_norm,
      |       CAST(sum(list_aggregate(list_transform(q, x -> abs(x)), 'sum'))
      |            AS BIGINT) AS sum_qabs,
      |       min(list_aggregate(q, 'min')) AS min_q,
      |       max(list_aggregate(q, 'max')) AS max_q
      |FROM q GROUP BY label ORDER BY label""".stripMargin

  // ---- q60: sequence packing ------------------------------------------

  private val PackBudget = 512L
  private val PackBuckets = 8

  def q60SequencePacking(spark: SparkSession, dir: String): DataFrame =
    Curation.packSequences(Tables.documents(spark, dir), "doc_id", "text",
        budgetTokens = PackBudget, buckets = PackBuckets)
      .groupBy("bucket", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("sum_tokens"),
        max("n_tok").as("max_tok"))
      .orderBy("bucket", "bin")

  val q60Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(${PipelineQueries.normSql}, ' '))
       |              AS BIGINT) AS n_tok,
       |         CAST(floor((('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 4))::INT
       |               / 65536.0) * $PackBuckets) AS INT) AS bucket
       |  FROM documents
       |),
       |b AS (
       |  SELECT doc_id, n_tok, bucket,
       |         CAST(floor((sum(n_tok) OVER (
       |             PARTITION BY bucket ORDER BY n_tok DESC, doc_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           - n_tok) / $PackBudget) AS BIGINT) AS bin
       |  FROM t
       |)
       |SELECT bucket, bin, count(*) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       |       max(n_tok) AS max_tok
       |FROM b GROUP BY bucket, bin ORDER BY bucket, bin""".stripMargin

  // ---- q65: temperature-scaled domain mixing ---------------------------

  /** Skewed domain fixture: every even doc collapses into one dominant
    * 'web' domain (~half the corpus), odd docs keep their source —
    * alpha = 0.5 must upweight the 20 small domains relative to 'web'.
    * Budget is half the corpus, derived from the data so the query is
    * scale-free.
    */
  def q65TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("domain",
        when(col("doc_id") % 2 === 0, lit("web")).otherwise(col("source")))
    val budget = docs.count() / 2
    val mixed = Curation
      .temperatureMix(docs, "doc_id", "domain", alpha = 0.5, budget = budget)
      .groupBy(col("domain").as("m_domain"))
      .agg(count(lit(1)).as("n_sampled"))
    docs.groupBy("domain").agg(count(lit(1)).as("n_total"))
      .join(mixed, col("domain") === col("m_domain"), "left")
      .select(col("domain"), col("n_total"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy("domain")
  }

  val q65Oracle: String =
    """WITH dom AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 2 = 0 THEN 'web' ELSE source END AS domain
      |  FROM documents
      |),
      |c AS (SELECT domain, count(*) AS n FROM dom GROUP BY domain),
      |z AS (SELECT sum(pow(n, 0.5)) AS z,
      |             (SELECT count(*) // 2 FROM documents) AS budget
      |      FROM c),
      |r AS (
      |  SELECT domain, n,
      |         least(1.0, z.budget * pow(n, 0.5) / z.z / n) AS rate
      |  FROM c, z
      |),
      |f AS (
      |  SELECT domain,
      |         ('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 4))::INT
      |           / 65536.0 AS frac
      |  FROM dom
      |)
      |SELECT f.domain, CAST(count(*) AS BIGINT) AS n_total,
      |       CAST(sum(CASE WHEN frac < rate THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_sampled
      |FROM f JOIN r ON f.domain = r.domain
      |GROUP BY f.domain ORDER BY f.domain""".stripMargin

  // ---- q85: token-budget quality selection ----------------------------

  private val SelectBudget = 2000L

  /** Per-source greedy knapsack: best-quality docs first until the token
    * budget binds. The oracle replays the identical quality arithmetic
    * (q21's formula) and window cutoff — double-identical ranking makes
    * the kept SET, not just the aggregates, engine-reproducible.
    */
  def q85BudgetSelect(spark: SparkSession, dir: String): DataFrame =
    Curation.budgetSelect(Tables.documents(spark, dir), "doc_id", "text",
        "source", budgetTokens = SelectBudget)
      .groupBy(col("source").as("domain"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum("n_tok").as("sum_tokens"),
        round(min("quality"), 4).as("min_q"),
        round(max("quality"), 4).as("max_q"))
      .orderBy("domain")

  val q85Oracle: String = {
    val normSql = PipelineQueries.normSql
    val stopList = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, source, $normSql AS norm,
       |         len(string_split($normSql, ' ')) AS n_tok,
       |         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
       |         len(list_filter(string_split($normSql, ' '),
       |                         x -> x IN ($stopList))) AS n_stop
       |  FROM documents
       |),
       |scored AS (
       |  SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
       |    0.25 * (
       |      least(1.0, n_tok / 100.0)
       |      + greatest(0.0, 1.0 - 5.0 * (CAST(n_punct AS DOUBLE) / len(norm)))
       |      + least(1.0, 5.0 * (CAST(n_stop AS DOUBLE) / n_tok))
       |      + greatest(0.0, 1.0 - abs((len(norm) - (n_tok - 1.0)) / n_tok - 5.0) / 5.0)
       |    ) AS q
       |  FROM t
       |),
       |sel AS (
       |  SELECT *,
       |         sum(n_tok) OVER (PARTITION BY source ORDER BY q DESC, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
       |           AS cum_before
       |  FROM scored
       |)
       |SELECT source AS domain, count(*) AS n_kept,
       |       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       |       round(min(q), 4) AS min_q, round(max(q), 4) AS max_q
       |FROM sel WHERE cum_before < $SelectBudget
       |GROUP BY source ORDER BY domain""".stripMargin
  }

  // ---- q104: weighted sampling without replacement (A-ES) -------------

  private val WsK = 100

  /** [[Curation.weightedSample]] biased by quality (+0.1 so the weight
    * is strictly positive): the Efraimidis–Spirakis `u^(1/w)` key over
    * the md5 hash fraction, global top-[[WsK]]. The oracle recomputes
    * the identical quality arithmetic (q21's formula), hash draw, and
    * pow-key ordering — the SELECTED MEMBERSHIP, not an aggregate, is
    * what's compared.
    */
  def q104WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (lit(0.1) + TextAnalysis.qualityScore(col("text"))).as("w"))
    Curation.weightedSample(docs, "doc_id", col("w"), WsK)
      .select(col("doc_id"), col("lang"), round(col("w"), 4).as("weight"))
  }

  val q104Oracle: String = {
    val normSql = PipelineQueries.normSql
    val stopList = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, lang, $normSql AS norm,
       |         len(string_split($normSql, ' ')) AS n_tok,
       |         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
       |         len(list_filter(string_split($normSql, ' '),
       |                         x -> x IN ($stopList))) AS n_stop
       |  FROM documents
       |),
       |scored AS (
       |  SELECT doc_id, lang,
       |    0.1 + 0.25 * (
       |      least(1.0, n_tok / 100.0)
       |      + greatest(0.0, 1.0 - 5.0 * (CAST(n_punct AS DOUBLE) / len(norm)))
       |      + least(1.0, 5.0 * (CAST(n_stop AS DOUBLE) / n_tok))
       |      + greatest(0.0, 1.0 - abs((len(norm) - (n_tok - 1.0)) / n_tok - 5.0) / 5.0)
       |    ) AS w
       |  FROM t
       |),
       |keyed AS (
       |  SELECT doc_id, lang, w,
       |         pow(('0x' || substr(md5('weighted|' || CAST(doc_id AS VARCHAR)), 1, 4))::INT
       |               / 65536.0,
       |             1.0 / w) AS es_key
       |  FROM scored
       |)
       |SELECT doc_id, lang, round(w, 4) AS weight
       |FROM keyed ORDER BY es_key DESC, doc_id LIMIT $WsK""".stripMargin
  }

  // ---- q107: epoch-weighted domain mixing (upsampling) ----------------

  private val MixEpochs = Seq("src0" -> 3.0, "src1" -> 2.5, "src2" -> 0.4)

  /** [[Curation.epochMix]]: src0 at 3 epochs (exact triplication), src1
    * at 2.5 (2 or 3 copies by hash draw), src2 downsampled at 0.4, the
    * rest at 1. The FULL emitted multiset — every (doc, copy_idx) row —
    * is compared, so a wrong floor/fraction split, hash draw, or
    * empty-range guard shows up as row drift.
    */
  def q107EpochMix(spark: SparkSession, dir: String): DataFrame =
    Curation.epochMix(Tables.documents(spark, dir).select("doc_id", "source"),
        "doc_id", "source", MixEpochs.toMap, defaultEpochs = 1.0)
      .select(col("doc_id"), col("source"),
        col("copy_idx").cast("long").as("copy_idx"))
      .orderBy("doc_id", "copy_idx")

  val q107Oracle: String = {
    val cases = MixEpochs
      .map { case (s, r) => s"WHEN source = '$s' THEN $r" }.mkString(" ")
    s"""WITH base AS (
       |  SELECT doc_id, source,
       |         CASE $cases ELSE 1.0 END AS rate,
       |         ('0x' || substr(md5('epoch|' || CAST(doc_id AS VARCHAR)), 1, 4))::INT
       |           / 65536.0 AS frac
       |  FROM documents
       |),
       |n AS (
       |  SELECT doc_id, source,
       |         CAST(floor(rate) AS BIGINT)
       |           + CASE WHEN frac < rate - floor(rate) THEN 1 ELSE 0 END
       |           AS k
       |  FROM base
       |)
       |SELECT doc_id, source, unnest(range(k)) AS copy_idx
       |FROM n ORDER BY doc_id, copy_idx""".stripMargin
  }

  // ---- q110: deterministic sharded export + on-disk manifest ----------

  private val NExportShards = 8

  /** [[graft.pipeline.Export.exportShards]]: hash-shard the corpus into
    * a hive `shard=K/` tree (one shuffle, one file per shard) and
    * manifest it by READING THE TREE BACK. The oracle recomputes shard
    * membership from the md5 fraction, so a writer that dropped,
    * duplicated, or misrouted one row drifts the per-shard counts or
    * id bounds.
    */
  def q110ExportShards(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-export").toString
    // oracle-replayable per-row hash (md5 prefix → 60-bit int) so the
    // XOR content digest — the manifest's integrity surface — is
    // value-checked end-to-end by DuckDB, not just spec-tested
    val rowDigest = conv(substring(
        md5(concat(lit("digest|"), col("doc_id").cast("string"),
          lit("|"), coalesce(col("lang"), lit("")))), 1, 15), 16, 10)
      .cast("long")
    graft.pipeline.Export.exportShards(
        Tables.documents(spark, dir).select("doc_id", "lang"),
        "doc_id", s"$tmp/shards", NExportShards, Some(rowDigest))
      .select(col("shard").cast("int").as("shard"), col("n_rows"),
        col("id_min"), col("id_max"), col("content_digest"))
      .orderBy("shard")
  }

  val q110Oracle: String =
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |         floor((('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 4))::INT
       |                  / 65536.0) * $NExportShards) AS shard
       |  FROM documents
       |)
       |SELECT CAST(shard AS INT) AS shard, count(*) AS n_rows,
       |       min(doc_id) AS id_min, max(doc_id) AS id_max,
       |       bit_xor(('0x' || substr(md5('digest|' || CAST(doc_id AS VARCHAR)
       |                 || '|' || coalesce(lang, '')), 1, 15))::BIGINT)
       |         AS content_digest
       |FROM s GROUP BY shard ORDER BY shard""".stripMargin

  // ---- q86: Johnson–Lindenstrauss random projection -------------------

  private val JlOutDim = 16

  /** ±1-sign random projection of a sampled embedding set: per-vector
    * original and projected L2 norms, both rounded — the JL distortion
    * made visible row by row. The md5-seeded sign matrix is regenerated
    * verbatim by the oracle, so projected values are engine-identical.
    */
  def q86RandomProjection(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).filter(col("vec_id") % 37 === 0)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val d = col("embedding").cast("array<double>")
    emb.select(
        col("vec_id"), col("label"),
        round(Similarity.norm(d), 4).as("nrm"),
        graft.functions.Let.let(
          Similarity.randomProjection(col("embedding"), dim, JlOutDim, "jl"),
          p => round(Similarity.norm(p), 4)).as("pnrm"))
      .orderBy("vec_id")
  }

  val q86Oracle: String =
    s"""WITH v AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e
       |  FROM embeddings WHERE vec_id % 37 = 0
       |),
       |d AS (
       |  SELECT vec_id, label, t.i AS i, e[t.i + 1] AS x
       |  FROM v, unnest(range(0, len(e))) AS t(i)
       |),
       |p AS (
       |  SELECT d.vec_id, u.j AS j,
       |         sum(x * CASE WHEN ('0x' || substr(
       |                 md5('jl|' || u.j || '|' || d.i), 1, 1))::INT % 2 = 0
       |               THEN 1.0 ELSE -1.0 END) / sqrt($JlOutDim.0) AS pj
       |  FROM d, unnest(range(0, $JlOutDim)) AS u(j)
       |  GROUP BY d.vec_id, u.j
       |),
       |n AS (
       |  SELECT vec_id, label, round(sqrt(sum(x * x)), 4) AS nrm
       |  FROM d GROUP BY vec_id, label
       |),
       |pn AS (
       |  SELECT vec_id, round(sqrt(sum(pj * pj)), 4) AS pnrm
       |  FROM p GROUP BY vec_id
       |)
       |SELECT n.vec_id, n.label, n.nrm, pn.pnrm
       |FROM n JOIN pn USING (vec_id) ORDER BY vec_id""".stripMargin

  // ---- q89: sliding-window document chunking --------------------------

  private val ChunkTokens = 64
  private val StrideTokens = 48

  /** Overlapping 64-token chunks every 48 tokens, one row per chunk with
    * its exact token count and text digest — the oracle regenerates the
    * identical offsets, slices, and md5s, so chunk CONTENT (not just
    * counts) is value-checked.
    */
  def q89ChunkDocuments(spark: SparkSession, dir: String): DataFrame =
    Curation.chunkDocuments(Tables.documents(spark, dir), "doc_id", "text",
        chunkTokens = ChunkTokens, strideTokens = StrideTokens)
      .orderBy("doc_id", "chunk_idx")

  val q89Oracle: String = {
    val normSql = PipelineQueries.normSql
    s"""WITH w AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS w FROM documents
       |),
       |c AS (
       |  SELECT doc_id, t.i AS chunk_idx,
       |         list_slice(w, t.i * $StrideTokens + 1,
       |                    t.i * $StrideTokens + $ChunkTokens) AS ck
       |  FROM w, unnest(range(0, 1 + (len(w) - 1) // $StrideTokens)) AS t(i)
       |)
       |SELECT doc_id, chunk_idx, CAST(len(ck) AS BIGINT) AS chunk_tok,
       |       md5(array_to_string(ck, ' ')) AS chunk_hash
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  }

  // ---- q94: T5-style span corruption plan -----------------------------

  private val CorruptDensity = 0.15
  private val CorruptSpanLen = 3

  /** Deterministic denoising-objective planning: per document, how many
    * tokens, how many corruption spans start, and how many tokens the
    * merged spans mask. The oracle regenerates the identical md5 start
    * flags and merged coverage with nested list lambdas.
    */
  def q94SpanCorruption(spark: SparkSession, dir: String): DataFrame =
    Curation.spanCorruptionPlan(Tables.documents(spark, dir), "doc_id",
        "text", density = CorruptDensity, spanLen = CorruptSpanLen)
      .orderBy("doc_id")

  val q94Oracle: String = {
    val startP = CorruptDensity / CorruptSpanLen
    val back = CorruptSpanLen - 1
    s"""WITH w AS (
       |  SELECT doc_id, string_split(${PipelineQueries.normSql}, ' ') AS w
       |  FROM documents
       |),
       |s AS (
       |  SELECT doc_id, len(w) AS n_tok,
       |         list_transform(range(0, len(w)), i ->
       |           ('0x' || substr(md5(doc_id || '|s|' || i), 1, 4))::INT
       |             / 65536.0 < $startP) AS starts
       |  FROM w
       |)
       |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       |       CAST(len(list_filter(starts, x -> x)) AS BIGINT) AS n_spans,
       |       CAST(len(list_filter(range(0, n_tok), i ->
       |              len(list_filter(range(greatest(0, i - $back), i + 1),
       |                              j -> starts[j + 1])) > 0))
       |            AS BIGINT) AS n_masked
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // ---- q98: end-to-end curation pipeline ------------------------------

  private val PipelineMinQuality = 0.5
  private val PipelineBudget = 1500L

  /** The training-data twin of q64's end-to-end ETL: one composed run of
    * quality gate → corpus-wide exact dedup (keep-first, combinable
    * min(struct) — no window) → per-source token-budget selection →
    * context-window chunk accounting, reported per source. Every stage
    * reuses an oracle-pinned operator; the oracle chains the same
    * algebra, so a divergence in ANY stage shifts the final counts.
    */
  def q98CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val qual = docs
      .filter(TextAnalysis.qualityScore(col("text")) >= PipelineMinQuality)
    // keep-first per exact-content digest: map-side-combinable agg over
    // the digest (the ParagraphDedup shape), never a per-group window
    val uniq = qual
      .groupBy(md5(TextAnalysis.normalize(col("text"))).as("__digest"))
      .agg(min(struct(col("doc_id"), col("source"), col("text"))).as("r"))
      .select(col("r.doc_id"), col("r.source"), col("r.text"))
    val kept = Curation.budgetSelect(uniq, "doc_id", "text", "source",
      budgetTokens = PipelineBudget)
    kept
      .groupBy(col("source").as("domain"))
      .agg(
        count(lit(1)).as("n_selected"),
        sum("n_tok").as("sum_tokens"),
        sum(lit(1L) + floor((col("n_tok") - 1) / StrideTokens).cast("long"))
          .as("n_chunks"))
      .orderBy("domain")
  }

  val q98Oracle: String = {
    val normSql = PipelineQueries.normSql
    val stopList = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, source, $normSql AS norm,
       |         len(string_split($normSql, ' ')) AS n_tok,
       |         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
       |         len(list_filter(string_split($normSql, ' '),
       |                         x -> x IN ($stopList))) AS n_stop
       |  FROM documents
       |),
       |scored AS (
       |  SELECT doc_id, source, norm, CAST(n_tok AS BIGINT) AS n_tok,
       |    0.25 * (
       |      least(1.0, n_tok / 100.0)
       |      + greatest(0.0, 1.0 - 5.0 * (CAST(n_punct AS DOUBLE) / len(norm)))
       |      + least(1.0, 5.0 * (CAST(n_stop AS DOUBLE) / n_tok))
       |      + greatest(0.0, 1.0 - abs((len(norm) - (n_tok - 1.0)) / n_tok - 5.0) / 5.0)
       |    ) AS q
       |  FROM t
       |),
       |qual AS (SELECT * FROM scored WHERE q >= $PipelineMinQuality),
       |uniq AS (
       |  SELECT doc_id, source, n_tok, q
       |  FROM qual
       |  QUALIFY row_number() OVER (PARTITION BY md5(norm)
       |                             ORDER BY doc_id) = 1
       |),
       |sel AS (
       |  SELECT *,
       |         sum(n_tok) OVER (PARTITION BY source ORDER BY q DESC, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
       |           AS cum_before
       |  FROM uniq
       |)
       |SELECT source AS domain, count(*) AS n_selected,
       |       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       |       CAST(sum(1 + (n_tok - 1) // $StrideTokens) AS BIGINT)
       |         AS n_chunks
       |FROM sel WHERE cum_before < $PipelineBudget
       |GROUP BY source ORDER BY domain""".stripMargin
  }

  // ---- q113: Gopher quality-rule bundle --------------------------------

  /** Deterministic structural planting: the synthetic corpus is
    * single-line word soup, so every Nth document gets the pathology a
    * Gopher rule exists to catch — bullet lists + a trailing ellipsis
    * (%7), duplicated lines (%11), symbol runs (%13), numeric-only words
    * (%17). Shared SQL text, identical in both engines (q42 pattern).
    */
  val docsGopherSql: String =
    """docs_gopher AS (
      |  SELECT doc_id,
      |         text ||
      |         CASE WHEN doc_id % 7 = 0
      |              THEN chr(10) || '- first point' || chr(10) ||
      |                   '- second point' || chr(10) || 'so it goes...'
      |              ELSE '' END ||
      |         CASE WHEN doc_id % 11 = 0
      |              THEN chr(10) || 'same line repeated' || chr(10) ||
      |                   'same line repeated'
      |              ELSE '' END ||
      |         CASE WHEN doc_id % 3 > 0
      |              THEN ' note that we have worked with care to be sure'
      |              ELSE '' END ||
      |         CASE WHEN doc_id % 13 = 0 THEN ' ### ##### ##' ELSE '' END ||
      |         CASE WHEN doc_id % 17 = 0
      |              THEN ' 101 202 303 404 505 606 707 808'
      |              ELSE '' END AS text
      |  FROM documents
      |)""".stripMargin

  /** The Gopher rule bundle ([[TextAnalysis.gopherRules]]) over the
    * planted corpus: every metric AND the pass verdict value-checked per
    * document. Word bounds 20..80 (vs the paper's 50..100k) so the
    * 10..99-word synthetic corpus splits on the length rule too.
    */
  def q113GopherRules(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    spark.sql(s"WITH $docsGopherSql SELECT doc_id, text FROM docs_gopher")
      .select(col("doc_id"),
        TextAnalysis.gopherRules(col("text"),
          minWords = 20, maxWords = 80).as("g"))
      .select(col("doc_id"), col("g.*"))
      .orderBy("doc_id")
  }

  val q113Oracle: String = {
    val normSql = PipelineQueries.normSql
    val stopSum = TextAnalysis.GopherStopwords
      .map(s => s"CASE WHEN list_contains(w, '$s') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $docsGopherSql,
       |m AS (
       |  SELECT doc_id, text, $normSql AS norm,
       |         string_split($normSql, ' ') AS w,
       |         string_split(text, chr(10)) AS l
       |  FROM docs_gopher
       |),
       |r AS (
       |  SELECT doc_id,
       |    len(w) AS n_words,
       |    (length(norm) - (len(w) - 1)) / CAST(len(w) AS DOUBLE) AS mwl,
       |    (len(regexp_extract_all(text, '#')) +
       |     len(regexp_extract_all(text, '\\.\\.\\.')))
       |      / CAST(len(w) AS DOUBLE) AS sym,
       |    len(regexp_extract_all(text, '(^|\\n)[-*•]'))
       |      / CAST(len(l) AS DOUBLE) AS bullet,
       |    len(regexp_extract_all(text, '\\.\\.\\.(\\n|$$)'))
       |      / CAST(len(l) AS DOUBLE) AS ell,
       |    len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
       |      / CAST(len(w) AS DOUBLE) AS alpha,
       |    $stopSum AS stop_hits,
       |    (len(l) - len(list_distinct(l))) / CAST(len(l) AS DOUBLE) AS dup
       |  FROM m
       |)
       |SELECT doc_id, n_words,
       |       round(mwl, 4) AS mean_word_len,
       |       round(sym, 4) AS sym_ratio,
       |       round(bullet, 4) AS bullet_frac,
       |       round(ell, 4) AS ellipsis_frac,
       |       round(alpha, 4) AS alpha_frac,
       |       stop_hits,
       |       round(dup, 4) AS dup_line_frac,
       |       (n_words BETWEEN 20 AND 80) AND mwl BETWEEN 3 AND 10
       |         AND sym <= 0.1 AND bullet <= 0.1 AND ell <= 0.3
       |         AND alpha >= 0.8 AND stop_hits >= 2 AND dup <= 0.3 AS passes
       |FROM r ORDER BY doc_id""".stripMargin
  }

  // ---- q128: skip-gram pairs + deterministic negative sampling --------

  /** Word2vec-style training-pair prep ([[graft.pipeline.SkipGram]]):
    * ±2-window skip-gram positives from ONE row-local tokenization
    * fan-out, plus 2 md5-deterministic negative vocab ids per positive.
    * Aggregated per center token so the oracle pins pair counts, context
    * diversity, AND the full negative-draw arithmetic (vocab ids from a
    * lexicographic row_number — a changed hash, window, bound check, or
    * vocab order shifts some sum).
    */
  def q128SkipgramPairs(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.SkipGram
    val docs = Tables.documents(spark, dir)
    val vocab = SkipGram.vocabulary(docs, "text")
    val pos = SkipGram.pairs(docs, "doc_id", "text", window = 2)
    val pairAgg = pos.groupBy("center")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("context")).as("n_ctx"))
    val negAgg = SkipGram.withNegatives(pos, vocab, k = 2)
      .groupBy("center").agg(sum("neg_id").as("sum_neg"))
    pairAgg
      .join(negAgg, Seq("center"))
      .join(broadcast(vocab), col("center") === col("token"))
      .select(col("center"), col("vocab_id"), col("n_pairs"),
        col("n_ctx"), col("sum_neg"))
      .orderBy("center")
  }

  val q128Oracle: String = {
    val normSql = PipelineQueries.normSql
    s"""WITH t AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS w FROM documents
       |),
       |vocab AS (
       |  SELECT token, row_number() OVER (ORDER BY token) AS vocab_id
       |  FROM (SELECT DISTINCT unnest(w) AS token FROM t)
       |),
       |vs AS (SELECT count(*) AS n FROM vocab),
       |tok AS (
       |  SELECT doc_id, w, len(w) AS n,
       |         unnest(range(1, len(w) + 1)) AS i
       |  FROM t
       |),
       |p AS (
       |  SELECT doc_id, w[i] AS center, w[i + o.o] AS context
       |  FROM tok, (VALUES (-2), (-1), (1), (2)) o(o)
       |  WHERE i + o.o BETWEEN 1 AND n
       |),
       |pa AS (
       |  SELECT center, CAST(count(*) AS BIGINT) AS n_pairs,
       |         CAST(count(DISTINCT context) AS BIGINT) AS n_ctx
       |  FROM p GROUP BY center
       |),
       |neg AS (
       |  SELECT center,
       |         1 + ('0x' || substr(md5(center || '|' || context || '|' || d.j),
       |                             1, 14))::BIGINT % (SELECT n FROM vs)
       |           AS neg_id
       |  FROM p, (VALUES (0), (1)) d(j)
       |),
       |na AS (SELECT center, CAST(sum(neg_id) AS BIGINT) AS sum_neg
       |       FROM neg GROUP BY center)
       |SELECT pa.center, v.vocab_id, pa.n_pairs, pa.n_ctx, na.sum_neg
       |FROM pa JOIN na USING (center) JOIN vocab v ON v.token = pa.center
       |ORDER BY center""".stripMargin
  }

  // ---- q129: corpus card (one-pass rollup profile) --------------------

  /** The "corpus card" a dataset release ships: per-language AND overall
    * rows from ONE ROLLUP aggregation over one enriched scan — document
    * counts, token totals, exact-dedup distinct fingerprints, PII
    * incidence (over the q42 planted corpus so the counter is non-
    * vacuous), and mean quality. Every stat is a combinable aggregate;
    * the rollup adds the ALL row without a second pass.
    */
  def q129CorpusCard(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    val docs = spark.sql(s"WITH $docsPiiSql SELECT * FROM docs_pii")
    val t = TextAnalysis
    val enriched = docs.select(
      col("lang"),
      t.tokenCount(col("text")).as("n_tok"),
      round(t.qualityScore(col("text")), 4).as("q"),
      t.fingerprint(col("text")).as("fp"),
      (t.piiEmailCount(col("text")) + t.piiPhoneCount(col("text")) +
        t.piiIpCount(col("text")) > 0).as("has_pii"))
    enriched.rollup("lang")
      .agg(
        grouping(col("lang")).cast("int").as("is_total"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("n_tokens"),
        countDistinct(col("fp")).as("n_distinct_fp"),
        sum(when(col("has_pii"), 1L).otherwise(0L)).as("n_pii_docs"),
        // per-doc rounding to 4dp first: the cross-engine values are
        // then EXACTLY equal, and the 3dp-rounded mean cannot flip on
        // FP summation-order drift (~1e-13) of the aggregate
        round(avg("q"), 3).as("avg_quality"))
      .select(col("is_total"),
        coalesce(col("lang"), lit("ALL")).as("lang"),
        col("n_docs"), col("n_tokens"), col("n_distinct_fp"),
        col("n_pii_docs"), col("avg_quality"))
      .orderBy("is_total", "lang")
  }

  val q129Oracle: String = {
    val normSql = PipelineQueries.normSql
    s"""WITH $docsPiiSql,
       |enriched AS (
       |  SELECT lang,
       |         len(string_split($normSql, ' ')) AS n_tok,
       |         len(string_split($normSql, ' ')) AS nt,
       |         length($normSql) AS n_chars,
       |         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
       |         len(list_filter(string_split($normSql, ' '),
       |             x -> x IN ('the','a','of','and','to','in','is','it',
       |                        'for','on'))) AS n_stop,
       |         md5($normSql) AS fp,
       |         (len(regexp_extract_all(text,
       |            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) +
       |          len(regexp_extract_all(text, '\\d{3}[-.]\\d{3}[-.]\\d{4}')) +
       |          len(regexp_extract_all(text,
       |            '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}')) > 0)
       |           AS has_pii
       |  FROM docs_pii
       |),
       |scored AS (
       |  SELECT lang, n_tok, fp, has_pii,
       |         (least(1.0, n_tok / 100.0)
       |          + greatest(0.0, 1.0 - 5.0 * (n_punct / CAST(n_chars AS DOUBLE)))
       |          + least(1.0, 5.0 * (n_stop / CAST(n_tok AS DOUBLE)))
       |          + greatest(0.0, 1.0 - abs((n_chars - (n_tok - 1))
       |                                    / CAST(n_tok AS DOUBLE) - 5.0) / 5.0))
       |         * 0.25 AS q0, round((least(1.0, n_tok / 100.0)
       |          + greatest(0.0, 1.0 - 5.0 * (n_punct / CAST(n_chars AS DOUBLE)))
       |          + least(1.0, 5.0 * (n_stop / CAST(n_tok AS DOUBLE)))
       |          + greatest(0.0, 1.0 - abs((n_chars - (n_tok - 1))
       |                                    / CAST(n_tok AS DOUBLE) - 5.0) / 5.0))
       |         * 0.25, 4) AS q
       |  FROM enriched
       |)
       |SELECT CASE WHEN GROUPING(lang) = 1 THEN 1 ELSE 0 END AS is_total,
       |       coalesce(lang, 'ALL') AS lang,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |       CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
       |       CAST(sum(CASE WHEN has_pii THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_pii_docs,
       |       round(avg(q), 3) AS avg_quality
       |FROM scored GROUP BY ROLLUP (lang)
       |ORDER BY is_total, lang""".stripMargin
  }

  // ---- q130: unigram-LM (SentencePiece-style) tokenizer training ------

  /** Hard-EM unigram tokenizer training ([[graft.pipeline.Unigram]]):
    * weighted-substring seed vocabulary → Viterbi E-step → usage-based
    * M-step with pruning → second E-step. The oracle re-trains the WHOLE
    * model in SQL: it enumerates every segmentation of every word with a
    * recursive CTE, picks the best path under the identical
    * (score DESC, longest-last-piece) ordering, re-derives the round-2
    * scores, and segments again — so a drifted seed count, DP tie-break,
    * prune rule, or score rounding shifts usage counts somewhere.
    */
  def q130UnigramVocab(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.pipeline.Unigram
      .train(spark, Tables.documents(spark, dir), "text",
        maxPieceLen = 4, minSeedCount = 2, rounds = 2)
      .toDF()
      .select(col("piece"), length(col("piece")).cast("int").as("piece_len"),
        col("usage"), col("score"))
      .orderBy("piece")
  }

  val q130Oracle: String = {
    val normSql = PipelineQueries.normSql
    def segCte(segName: String, vocabName: String): String =
      s"""$segName AS (
         |  SELECT word, f, 0 AS pos, CAST(0 AS DOUBLE) AS total,
         |         '' AS pieces, '' AS rkey
         |  FROM wc
         |  UNION ALL
         |  SELECT s.word, s.f, s.pos + v.plen, s.total + v.score,
         |         CASE WHEN s.pieces = '' THEN v.piece
         |              ELSE s.pieces || ' ' || v.piece END,
         |         lpad(CAST(99 - v.plen AS VARCHAR), 2, '0') || s.rkey
         |  FROM $segName s JOIN $vocabName v
         |    ON substr(s.word, s.pos + 1, v.plen) = v.piece
         |  WHERE s.pos < length(s.word)
         |)""".stripMargin
    s"""WITH RECURSIVE wc AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(string_split($normSql, ' ')) AS word
       |        FROM documents)
       |  WHERE length(word) BETWEEN 1 AND 16
       |  GROUP BY word
       |),
       |sub AS (
       |  SELECT substr(word, i, l.l) AS piece, sum(f) AS cnt
       |  FROM (SELECT word, f, unnest(range(1, length(word) + 1)) AS i
       |        FROM wc),
       |       (VALUES (1), (2), (3), (4)) l(l)
       |  WHERE i + l.l - 1 <= length(word)
       |  GROUP BY piece
       |),
       |seed AS (
       |  SELECT piece, cnt FROM sub WHERE cnt >= 2 OR length(piece) = 1
       |),
       |st AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM seed),
       |v0 AS (
       |  SELECT piece, length(piece) AS plen,
       |         round(ln(cnt / st.tot), 6) AS score
       |  FROM seed, st
       |),
       |${segCte("s1", "v0")},
       |b1 AS (
       |  SELECT word, f, pieces,
       |         row_number() OVER (PARTITION BY word
       |                            ORDER BY total DESC, rkey ASC) AS rn
       |  FROM s1 WHERE pos = length(word)
       |),
       |u1 AS (
       |  SELECT piece, CAST(sum(f) AS BIGINT) AS u
       |  FROM (SELECT unnest(string_split(pieces, ' ')) AS piece, f
       |        FROM b1 WHERE rn = 1)
       |  GROUP BY piece
       |),
       |v2base AS (
       |  SELECT piece, u FROM u1
       |  UNION ALL
       |  SELECT piece, 1 AS u FROM seed
       |  WHERE length(piece) = 1 AND piece NOT IN (SELECT piece FROM u1)
       |),
       |t2 AS (SELECT CAST(sum(u) AS DOUBLE) AS tot FROM v2base),
       |v2 AS (
       |  SELECT piece, length(piece) AS plen,
       |         round(ln(u / t2.tot), 6) AS score
       |  FROM v2base, t2
       |),
       |${segCte("s2", "v2")},
       |b2 AS (
       |  SELECT word, f, pieces,
       |         row_number() OVER (PARTITION BY word
       |                            ORDER BY total DESC, rkey ASC) AS rn
       |  FROM s2 WHERE pos = length(word)
       |),
       |u2 AS (
       |  SELECT piece, CAST(sum(f) AS BIGINT) AS u
       |  FROM (SELECT unnest(string_split(pieces, ' ')) AS piece, f
       |        FROM b2 WHERE rn = 1)
       |  GROUP BY piece
       |)
       |SELECT v2.piece, CAST(length(v2.piece) AS INT) AS piece_len,
       |       CAST(coalesce(u2.u, 0) AS BIGINT) AS usage, v2.score
       |FROM v2 LEFT JOIN u2 ON u2.piece = v2.piece
       |ORDER BY v2.piece""".stripMargin
  }

  // ---- q136: feature-hashed text embedding ----------------------------

  /** [[TextAnalysis.hashedEmbedding]] over the corpus: every document
    * becomes a 64-dim signed-bag-of-words vector. The oracle regenerates
    * each token's (bucket, sign) from the identical md5 arithmetic and
    * re-aggregates per dimension, value-checking the l2 norm and the
    * first four dimensions per document — a drifted hash slice, sign
    * rule, scaling, or dimension order flips rows.
    */
  def q136HashedEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val v = TextAnalysis.hashedEmbedding(col("text"), dims = 64)
    Tables.documents(spark, dir)
      .select(col("doc_id"), v.as("v"))
      .select(col("doc_id"),
        round(sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)), 4)
          .as("nrm"),
        round(element_at(col("v"), 1), 4).as("d0"),
        round(element_at(col("v"), 2), 4).as("d1"),
        round(element_at(col("v"), 3), 4).as("d2"),
        round(element_at(col("v"), 4), 4).as("d3"))
      .orderBy("doc_id")
  }

  val q136Oracle: String = {
    val normSql = PipelineQueries.normSql
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         len(string_split($normSql, ' ')) AS n,
       |         unnest(string_split($normSql, ' ')) AS t
       |  FROM documents
       |),
       |bs AS (
       |  SELECT doc_id, n,
       |         ('0x' || substr(md5(t), 1, 14))::BIGINT % 64 AS b,
       |         (('0x' || substr(md5(t), 15, 1))::BIGINT % 2) * 2 - 1 AS s
       |  FROM tok
       |),
       |ds AS (
       |  SELECT doc_id, max(n) AS n, b,
       |         sum(s) / sqrt(CAST(max(n) AS DOUBLE)) AS v
       |  FROM bs GROUP BY doc_id, b
       |)
       |SELECT doc_id,
       |       round(sqrt(sum(v * v)), 4) AS nrm,
       |       round(coalesce(sum(CASE WHEN b = 0 THEN v END), 0.0), 4) AS d0,
       |       round(coalesce(sum(CASE WHEN b = 1 THEN v END), 0.0), 4) AS d1,
       |       round(coalesce(sum(CASE WHEN b = 2 THEN v END), 0.0), 4) AS d2,
       |       round(coalesce(sum(CASE WHEN b = 3 THEN v END), 0.0), 4) AS d3
       |FROM ds GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---- q137: raw text → embedding → ANN, end to end --------------------

  /** The model-free retrieval pipeline COMPOSED: documents featurize
    * through [[TextAnalysis.hashedEmbedding]] and the q95 keyword-query
    * docs rank the corpus by COSINE over those vectors
    * ([[Similarity.bruteForceTopK]] with normalization, since hashed
    * embeddings are not unit-length). Proves the text→vector→ANN path
    * needs no external model artifact anywhere; the oracle rebuilds the
    * embeddings bucket-by-bucket AND replays the cosine ranking.
    */
  def q137TextAnnPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = docs.select(col("doc_id"),
      TextAnalysis.hashedEmbedding(col("text"), dims = 64).as("v"))
    Similarity.bruteForceTopK(
        corpus = emb,
        queries = emb.filter(col("doc_id") % 97 === 0),
        idCol = "doc_id", vecCol = "v", k = 5, assumeNormalized = false)
      .orderBy("query_id", "rank")
  }

  val q137Oracle: String = {
    val normSql = PipelineQueries.normSql
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         len(string_split($normSql, ' ')) AS n,
       |         unnest(string_split($normSql, ' ')) AS t
       |  FROM documents
       |),
       |bs AS (
       |  SELECT doc_id, n,
       |         ('0x' || substr(md5(t), 1, 14))::BIGINT % 64 AS b,
       |         (('0x' || substr(md5(t), 15, 1))::BIGINT % 2) * 2 - 1 AS s
       |  FROM tok
       |),
       |ds AS (
       |  SELECT doc_id, b, sum(s) / sqrt(CAST(max(n) AS DOUBLE)) AS v
       |  FROM bs GROUP BY doc_id, b
       |),
       |vecs AS (
       |  SELECT d.doc_id,
       |         list(coalesce(ds.v, 0.0) ORDER BY dim.b) AS vec
       |  FROM (SELECT DISTINCT doc_id FROM documents) d
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) dim
       |  LEFT JOIN ds ON ds.doc_id = d.doc_id AND ds.b = dim.b
       |  GROUP BY d.doc_id
       |),
       |q AS (SELECT doc_id AS query_id, vec AS qv FROM vecs
       |      WHERE doc_id % 97 = 0),
       |scored AS (
       |  SELECT query_id, c.doc_id AS neighbor_id,
       |         round(list_dot_product(qv, c.vec) /
       |               (sqrt(list_dot_product(qv, qv)) *
       |                sqrt(list_dot_product(c.vec, c.vec))), 4) AS sim
       |  FROM vecs c, q WHERE query_id <> c.doc_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, sim, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_gopher_rules" -> (q113GopherRules _),
    "q128_skipgram_pairs" -> (q128SkipgramPairs _),
    "q129_corpus_card" -> (q129CorpusCard _),
    "q130_unigram_vocab" -> (q130UnigramVocab _),
    "q136_hashed_embedding" -> (q136HashedEmbedding _),
    "q137_text_ann_pipeline" -> (q137TextAnnPipeline _),
    "q41_hash_split" -> (q41HashSplit _),
    "q65_temperature_mix" -> (q65TemperatureMix _),
    "q42_pii_redaction" -> (q42PiiRedaction _),
    "q43_vocabulary" -> (q43Vocabulary _),
    "q44_label_centroids" -> (q44LabelCentroids _),
    "q55_stratified_sample" -> (q55StratifiedSample _),
    "q56_quantize_embeddings" -> (q56QuantizeEmbeddings _),
    "q60_sequence_packing" -> (q60SequencePacking _),
    "q85_budget_select" -> (q85BudgetSelect _),
    "q86_random_projection" -> (q86RandomProjection _),
    "q89_chunk_documents" -> (q89ChunkDocuments _),
    "q94_span_corruption" -> (q94SpanCorruption _),
    "q98_curation_pipeline" -> (q98CurationPipeline _),
    "q104_weighted_sample" -> (q104WeightedSample _),
    "q107_epoch_mix" -> (q107EpochMix _),
    "q110_export_shards" -> (q110ExportShards _)
  )

  def oracles: Map[String, String] = Map(
    "q113_gopher_rules" -> q113Oracle,
    "q128_skipgram_pairs" -> q128Oracle,
    "q129_corpus_card" -> q129Oracle,
    "q130_unigram_vocab" -> q130Oracle,
    "q136_hashed_embedding" -> q136Oracle,
    "q137_text_ann_pipeline" -> q137Oracle,
    "q41_hash_split" -> q41Oracle,
    "q65_temperature_mix" -> q65Oracle,
    "q42_pii_redaction" -> q42Oracle,
    "q43_vocabulary" -> q43Oracle,
    "q44_label_centroids" -> q44Oracle,
    "q55_stratified_sample" -> q55Oracle,
    "q56_quantize_embeddings" -> q56Oracle,
    "q60_sequence_packing" -> q60Oracle,
    "q85_budget_select" -> q85Oracle,
    "q86_random_projection" -> q86Oracle,
    "q89_chunk_documents" -> q89Oracle,
    "q94_span_corruption" -> q94Oracle,
    "q98_curation_pipeline" -> q98Oracle,
    "q104_weighted_sample" -> q104Oracle,
    "q107_epoch_mix" -> q107Oracle,
    "q110_export_shards" -> q110Oracle
  )
}
