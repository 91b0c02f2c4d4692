package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{TextProfile, Winnowing}

/** Oracle-checked corpus-profiling queries: winnowing (rolling-hash)
  * fingerprints and the shared-fingerprint near-dup pairs built on them,
  * Gopher-style repetition fractions, and token-entropy profiles. The
  * DuckDB oracles rebuild each formula verbatim (same md5 k-gram hashes,
  * same window minima, same log2 entropy) over the same tables.
  */
object ProfileQueries {

  /** Winnowing parameters shared by q49/q50 and their oracles: k-gram
    * size 8, window 4 → guarantee threshold t = k+w-1 = 11 stripped
    * chars.
    */
  private val K = 8
  private val W = 4

  /** DuckDB CTEs computing the winnowing fingerprint set per row of
    * `table` (which must expose `doc_id` and `text`): mirrors
    * [[Winnowing.fingerprintSet]] exactly.
    */
  private def winnowSql(table: String): String =
    s"""stripped AS (
       |  SELECT doc_id,
       |         replace(${PipelineQueries.normSql}, ' ', '') AS s
       |  FROM $table
       |),
       |hashed AS (
       |  SELECT doc_id, s,
       |         list_transform(range(1, len(s) - ${K - 2}),
       |                        i -> md5(substr(s, i, $K))) AS h
       |  FROM stripped
       |),
       |fps AS (
       |  SELECT doc_id,
       |         CASE WHEN len(s) >= ${K + W - 1}
       |              THEN list_distinct(list_transform(
       |                     range(1, len(s) - ${K + W - 3}),
       |                     j -> list_aggregate(h[j:j+${W - 1}], 'min')))
       |              ELSE [] END AS fp_set
       |  FROM hashed
       |)""".stripMargin

  // ---- q49: winnowing fingerprint profile ------------------------------

  def q49WinnowProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // single pass: explode_outer keeps fingerprint-less docs for the doc
    // count, count("fp") skips their null, and ONE scan runs the (md5-
    // heavy) fingerprint kernel — a forked base would recompute it per
    // branch
    docs
      .select(col("source"), col("doc_id"),
        explode_outer(Winnowing.fingerprintSet(col("text"), K, W)).as("fp"))
      .groupBy("source")
      .agg(
        countDistinct("doc_id").as("n_docs"),
        count("fp").as("n_fp"),
        countDistinct("fp").as("n_fp_distinct"))
      .orderBy("source")
  }

  val q49Oracle: String =
    s"""WITH docs AS (SELECT doc_id, source, text FROM documents),
       |${winnowSql("docs")},
       |fs AS (SELECT f.doc_id, d.source, f.fp_set
       |       FROM fps f JOIN docs d USING (doc_id)),
       |a AS (SELECT source, count(*) AS n_docs,
       |             CAST(sum(len(fp_set)) AS BIGINT) AS n_fp
       |      FROM fs GROUP BY source),
       |b AS (SELECT source, count(DISTINCT fp) AS n_fp_distinct
       |      FROM (SELECT source, unnest(fp_set) AS fp FROM fs)
       |      GROUP BY source)
       |SELECT a.source, a.n_docs, a.n_fp, b.n_fp_distinct
       |FROM a JOIN b USING (source) ORDER BY source""".stripMargin

  // ---- q50: winnowing near-dup pairs -----------------------------------

  /** Memoized + cached winnowing pair graph shared by q50 and q57: the
    * md5-heavy fingerprint kernel and the inverted-index self-join run
    * once per (session, dir); q50 measures/checks the pair generation and
    * q57 measures/checks only the clustering on top of it, instead of
    * paying pair-gen twice (the same scaffolding-sharing pattern as
    * [[graft.etl.BackupHistoryDerivation.frame]]).
    */
  private val pairMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def winnowPairGraph(spark: SparkSession, dir: String): DataFrame =
    pairMemo.getOrElseUpdate((spark, dir),
      Winnowing.pairs(PipelineQueries.docsAug(spark, dir), "doc_id", "text",
        K, W, minShared = 5, maxDocFreq = 20).cache())

  /** Bench-only: drop the memoized pair graph so a repeated q50 run
    * measures pair generation again instead of a cache read. The last
    * rep leaves the cache materialized, which is exactly what q57 (run
    * later in bench order) should build on.
    */
  private[graft] def resetWinnowPairGraph(spark: SparkSession, dir: String): Unit =
    pairMemo.remove((spark, dir)).foreach(_.unpersist(blocking = true))

  /** Bench-only: materialize the pair graph untimed, so a q57 rep
    * measures clustering on top of it rather than pair generation.
    */
  private[graft] def warmWinnowPairGraph(spark: SparkSession, dir: String): Unit = {
    winnowPairGraph(spark, dir).count(); ()
  }

  def q50WinnowPairs(spark: SparkSession, dir: String): DataFrame =
    winnowPairGraph(spark, dir).orderBy("id_a", "id_b")

  val q50Oracle: String =
    s"""WITH ${PipelineQueries.docsAugSql},
       |docs AS (SELECT doc_id, text FROM docs_aug),
       |${winnowSql("docs")},
       |flat AS (SELECT doc_id, unnest(fp_set) AS fp FROM fps),
       |rare AS (
       |  SELECT fp FROM (SELECT fp, count(*) AS df FROM flat GROUP BY fp)
       |  WHERE df <= 20
       |),
       |kept AS (SELECT flat.* FROM flat JOIN rare USING (fp))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |FROM kept a JOIN kept b USING (fp)
       |WHERE a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= 5
       |ORDER BY id_a, id_b""".stripMargin

  // ---- q51: repetition profile -----------------------------------------

  def q51Repetition(spark: SparkSession, dir: String): DataFrame =
    TextProfile.repetitionProfile(
        Tables.documents(spark, dir), "doc_id", "text", minTokens = 10)
      .select(col("doc_id"),
        round(col("dup_trigram_frac"), 4).as("dup_trigram_frac"),
        round(col("top_bigram_frac"), 4).as("top_bigram_frac"))
      .orderBy(col("dup_trigram_frac").desc, col("doc_id"))
      .limit(20)

  val q51Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         string_split(${PipelineQueries.normSql}, ' ') AS w
       |  FROM documents
       |),
       |base AS (
       |  SELECT doc_id, w,
       |         list_transform(range(1, len(w)),
       |                        i -> w[i] || ' ' || w[i+1]) AS bg,
       |         list_transform(range(1, len(w) - 1),
       |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS tri
       |  FROM t WHERE len(w) >= 10
       |),
       |dup AS (
       |  SELECT doc_id,
       |         CASE WHEN len(tri) > 0
       |              THEN (len(tri) - len(list_distinct(tri)))::DOUBLE / len(tri)
       |              ELSE 0.0 END AS dup3
       |  FROM base
       |),
       |top AS (
       |  SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM (
       |    SELECT doc_id, g, count(*) AS c
       |    FROM (SELECT doc_id, unnest(bg) AS g FROM base)
       |    GROUP BY doc_id, g)
       |  GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |       round(d.dup3, 4) AS dup_trigram_frac,
       |       round(t2.mx::DOUBLE / t2.tot, 4) AS top_bigram_frac
       |FROM dup d JOIN top t2 USING (doc_id)
       |ORDER BY dup_trigram_frac DESC, doc_id
       |LIMIT 20""".stripMargin

  // ---- q52: token entropy per language ---------------------------------

  def q52Entropy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.select("doc_id", "lang")
      .join(TextProfile.tokenEntropy(docs, "doc_id", "text"), Seq("doc_id"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("entropy"), 4).as("avg_entropy"),
        round(min("entropy"), 4).as("min_entropy"),
        round(max("entropy"), 4).as("max_entropy"))
      .orderBy("lang")
  }

  val q52Oracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, lang,
       |         unnest(string_split(${PipelineQueries.normSql}, ' ')) AS t
       |  FROM documents
       |),
       |c AS (SELECT doc_id, lang, t, count(*) AS c
       |      FROM tok GROUP BY doc_id, lang, t),
       |e AS (
       |  SELECT doc_id, lang,
       |         log2(sum(c)) - sum(c * log2(c)) / sum(c) AS entropy
       |  FROM c GROUP BY doc_id, lang
       |)
       |SELECT lang, count(*) AS n_docs,
       |       round(avg(entropy), 4) AS avg_entropy,
       |       round(min(entropy), 4) AS min_entropy,
       |       round(max(entropy), 4) AS max_entropy
       |FROM e GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q57: connected dedup components ---------------------------------

  /** Near-dup clusters: connected components over the q50 winnowing pair
    * graph. The oracle computes the same transitive closure with a
    * recursive CTE — DuckDB's fixpoint semantics against Spark's
    * iterative min-label propagation.
    */
  def q57DedupComponents(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Components.componentSizes(
        winnowPairGraph(spark, dir).select("id_a", "id_b"))
      .orderBy("component")

  val q57Oracle: String =
    s"""WITH RECURSIVE ${PipelineQueries.docsAugSql},
       |docs AS (SELECT doc_id, text FROM docs_aug),
       |${winnowSql("docs")},
       |flat AS (SELECT doc_id, unnest(fp_set) AS fp FROM fps),
       |rare AS (
       |  SELECT fp FROM (SELECT fp, count(*) AS df FROM flat GROUP BY fp)
       |  WHERE df <= 20
       |),
       |kept AS (SELECT flat.* FROM flat JOIN rare USING (fp)),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM kept a JOIN kept b USING (fp)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 5
       |),
       |e AS (SELECT id_a AS a, id_b AS b FROM pairs
       |      UNION SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT a AS id, a AS r FROM e
       |  UNION
       |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a
       |),
       |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
       |SELECT component, count(*) AS n_members
       |FROM comp GROUP BY component ORDER BY component""".stripMargin

  // ---- q73: best-quality representative per near-dup cluster ------------

  /** Keep-best dedup over the q50/q57 pair graph: each component's
    * representative is its LONGEST member (char length; lowest id breaks
    * ties) — the industry rule that a truncated near-duplicate should
    * lose to the full copy, vs q57's arbitrary keep-lowest-id. The
    * oracle replays the same recursive closure plus a rank-one pick.
    */
  def q73ClusterRepresentatives(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusClean.clusterRepresentatives(
        PipelineQueries.docsAug(spark, dir)
          .withColumn("len", length(col("text")).cast("long")),
        "doc_id", "len",
        winnowPairGraph(spark, dir).select("id_a", "id_b"))
      .orderBy("id")

  val q73Oracle: String =
    s"""WITH RECURSIVE ${PipelineQueries.docsAugSql},
       |docs AS (SELECT doc_id, text FROM docs_aug),
       |${winnowSql("docs")},
       |flat AS (SELECT doc_id, unnest(fp_set) AS fp FROM fps),
       |rare AS (
       |  SELECT fp FROM (SELECT fp, count(*) AS df FROM flat GROUP BY fp)
       |  WHERE df <= 20
       |),
       |kept AS (SELECT flat.* FROM flat JOIN rare USING (fp)),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM kept a JOIN kept b USING (fp)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 5
       |),
       |e AS (SELECT id_a AS a, id_b AS b FROM pairs
       |      UNION SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT a AS id, a AS r FROM e
       |  UNION
       |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a
       |),
       |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
       |scored AS (
       |  SELECT c.id, c.component, length(d.text) AS len
       |  FROM comp c JOIN docs d ON c.id = d.doc_id
       |),
       |ranked AS (
       |  SELECT id, component,
       |         row_number() OVER (PARTITION BY component
       |                            ORDER BY len DESC, id ASC) AS rn
       |  FROM scored
       |),
       |best AS (SELECT component, id AS keep_id FROM ranked WHERE rn = 1)
       |SELECT s.id, s.component, b.keep_id
       |FROM scored s JOIN best b USING (component)
       |ORDER BY s.id""".stripMargin

  // ---- q58: TF-IDF weights ---------------------------------------------

  def q58TfIdfWeights(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.TfIdf.weights(
        Tables.documents(spark, dir), "doc_id", "text", maxDocFreq = 1000)
      .groupBy("token")
      .agg(
        first("df_count").as("df"),
        round(sum("weight"), 4).as("sum_weight"),
        round(avg("weight"), 4).as("avg_weight"))
      .orderBy("token")

  val q58Oracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         unnest(string_split(${PipelineQueries.normSql}, ' ')) AS token
       |  FROM documents
       |),
       |tf AS (SELECT doc_id, token, count(*) AS tf
       |       FROM tok GROUP BY doc_id, token),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token
       |       HAVING count(*) <= 1000),
       |w AS (
       |  SELECT tf.doc_id, tf.token, df.df,
       |         tf.tf * ln((SELECT count(*) FROM documents) / df.df)
       |           AS weight
       |  FROM tf JOIN df USING (token)
       |)
       |SELECT token, df,
       |       round(sum(weight), 4) AS sum_weight,
       |       round(avg(weight), 4) AS avg_weight
       |FROM w GROUP BY token, df ORDER BY token""".stripMargin

  // ---- q61: bigram language-model fluency score ------------------------

  def q61BigramLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.select("doc_id", "lang")
      .join(TextProfile.bigramLmScores(docs, "doc_id", "text"), Seq("doc_id"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("lm_logprob"), 4).as("avg_lm"),
        round(min("lm_logprob"), 4).as("min_lm"),
        round(max("lm_logprob"), 4).as("max_lm"))
      .orderBy("lang")
  }

  val q61Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |         string_split(${PipelineQueries.normSql}, ' ') AS w
       |  FROM documents
       |),
       |gr AS (
       |  SELECT doc_id, lang,
       |         unnest(list_transform(range(1, len(w)),
       |                               i -> w[i] || ' ' || w[i+1])) AS g
       |  FROM t
       |),
       |cb AS (SELECT g, count(*) AS c2 FROM gr GROUP BY g),
       |cu AS (SELECT split_part(g, ' ', 1) AS w1, count(*) AS c1
       |       FROM gr GROUP BY w1),
       |d AS (
       |  SELECT gr.doc_id, gr.lang,
       |         avg(ln(CAST(cb.c2 AS DOUBLE) / cu.c1)) AS lm
       |  FROM gr
       |  JOIN cb USING (g)
       |  JOIN cu ON split_part(gr.g, ' ', 1) = cu.w1
       |  GROUP BY gr.doc_id, gr.lang
       |)
       |SELECT lang, count(*) AS n_docs,
       |       round(avg(lm), 4) AS avg_lm,
       |       round(min(lm), 4) AS min_lm,
       |       round(max(lm), 4) AS max_lm
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q100: interpolated Kneser-Ney bigram fluency score -------------

  /** [[graft.pipeline.TextProfile.knBigramLmScores]] per lang — q61's
    * smoothed upgrade. The oracle refits every KN quantity (bigram type
    * counts, continuation counts, distinct-type total) and replays the
    * discount/back-off arithmetic in the same IEEE evaluation order, so
    * a wrong discount clamp, continuation denominator, or interpolation
    * weight shifts every document's score and flips the row.
    */
  def q100KneserNeyLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.select("doc_id", "lang")
      .join(TextProfile.knBigramLmScores(docs, "doc_id", "text"),
        Seq("doc_id"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("kn_logprob"), 4).as("avg_kn"),
        round(min("kn_logprob"), 4).as("min_kn"),
        round(max("kn_logprob"), 4).as("max_kn"))
      .orderBy("lang")
  }

  val q100Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |         string_split(${PipelineQueries.normSql}, ' ') AS w
       |  FROM documents
       |),
       |gr AS (
       |  SELECT doc_id, lang,
       |         unnest(list_transform(range(1, len(w)),
       |                               i -> w[i] || ' ' || w[i+1])) AS g
       |  FROM t
       |),
       |cb AS (SELECT g, count(*) AS c2 FROM gr GROUP BY g),
       |byw1 AS (SELECT split_part(g, ' ', 1) AS w1,
       |                sum(c2) AS c1, count(*) AS n1f
       |         FROM cb GROUP BY w1),
       |byw2 AS (SELECT split_part(g, ' ', 2) AS w2, count(*) AS n1p
       |         FROM cb GROUP BY w2),
       |tot AS (SELECT count(*) AS b FROM cb),
       |p AS (
       |  SELECT cb.g,
       |         greatest(CAST(cb.c2 AS DOUBLE) - 0.75, 0.0) / byw1.c1
       |           + (0.75 * byw1.n1f / byw1.c1)
       |             * (CAST(byw2.n1p AS DOUBLE) / tot.b) AS pr
       |  FROM cb
       |  JOIN byw1 ON split_part(cb.g, ' ', 1) = byw1.w1
       |  JOIN byw2 ON split_part(cb.g, ' ', 2) = byw2.w2
       |  CROSS JOIN tot
       |),
       |d AS (
       |  SELECT gr.doc_id, gr.lang, avg(ln(p.pr)) AS lm
       |  FROM gr JOIN p ON gr.g = p.g
       |  GROUP BY gr.doc_id, gr.lang
       |)
       |SELECT lang, count(*) AS n_docs,
       |       round(avg(lm), 4) AS avg_kn,
       |       round(min(lm), 4) AS min_kn,
       |       round(max(lm), 4) AS max_kn
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q92: leakage-safe (group-aware) train/val/test split -----------

  /** [[graft.pipeline.Curation.groupAwareSplit]] over the shared winnow
    * pair graph: membership hashes the near-dup COMPONENT id, so a
    * duplicate cluster can never straddle train/test (eval leakage).
    * Output pins, per (split, lang): document counts and how many came
    * from multi-member clusters — the oracle replays the recursive
    * closure (q57's contract) plus the md5-fraction split on the
    * component id.
    */
  def q92GroupAwareSplit(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation.groupAwareSplit(
        PipelineQueries.docsAug(spark, dir).select("doc_id", "text"),
        "doc_id",
        winnowPairGraph(spark, dir).select("id_a", "id_b"))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("group_id")).as("n_groups"),
        sum(when(col("group_id") =!= col("doc_id"), 1L).otherwise(0L))
          .as("n_nonrep_members"))
      .orderBy("split")

  val q92Oracle: String =
    s"""WITH RECURSIVE ${PipelineQueries.docsAugSql},
       |docs AS (SELECT doc_id, text FROM docs_aug),
       |${winnowSql("docs")},
       |flat AS (SELECT doc_id, unnest(fp_set) AS fp FROM fps),
       |rare AS (
       |  SELECT fp FROM (SELECT fp, count(*) AS df FROM flat GROUP BY fp)
       |  WHERE df <= 20
       |),
       |kept AS (SELECT flat.* FROM flat JOIN rare USING (fp)),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM kept a JOIN kept b USING (fp)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 5
       |),
       |e AS (SELECT id_a AS a, id_b AS b FROM pairs
       |      UNION SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT a AS id, a AS r FROM e
       |  UNION
       |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a
       |),
       |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
       |g AS (
       |  SELECT d.doc_id,
       |         coalesce(comp.component, d.doc_id) AS group_id
       |  FROM docs_aug d LEFT JOIN comp ON comp.id = d.doc_id
       |),
       |f AS (
       |  SELECT doc_id, group_id,
       |         ('0x' || substr(md5('split|' || CAST(group_id AS VARCHAR)), 1, 4))::INT
       |           / 65536.0 AS frac
       |  FROM g
       |)
       |SELECT CASE WHEN frac < 0.8 THEN 'train'
       |            WHEN frac < 0.9 THEN 'val'
       |            ELSE 'test' END AS split,
       |       count(*) AS n_docs,
       |       count(DISTINCT group_id) AS n_groups,
       |       CAST(sum(CASE WHEN group_id <> doc_id THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_nonrep_members
       |FROM f GROUP BY split ORDER BY split""".stripMargin

  // ---- q95: BM25 retrieval ranking ------------------------------------

  private val Bm25K = 5

  /** Okapi BM25 top-k ([[graft.pipeline.TfIdf.bm25TopK]]): every 97th
    * document donates tokens 5..8 as a keyword query; the oracle replays
    * the Lucene-form idf and length-normalized tf term by term. Ranking
    * runs on the 4-rounded score (doc-id ties), so the top-k SET is
    * engine-reproducible.
    */
  def q95Bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        array_join(slice(graft.pipeline.TextAnalysis.tokens(col("text")),
          5, 4), " ").as("qtext"))
    graft.pipeline.TfIdf.bm25TopK(
        docs, "doc_id", "text", queries, "qid", "qtext", k = Bm25K)
      .orderBy("query_id", "rank")
  }

  /** BM25 CTE chain (`q`..`r`) shared by the q95 oracle and q121's
    * lexical leg; `r` holds every (query, doc, score, rank).
    */
  private val bm25CtesSql: String = {
    val normSql = PipelineQueries.normSql
    s"""q AS (
       |  SELECT doc_id AS query_id,
       |         list_slice(string_split($normSql, ' '), 5, 8) AS qtok
       |  FROM documents WHERE doc_id % 97 = 0
       |),
       |qt AS (
       |  SELECT query_id, unnest(list_distinct(qtok)) AS token FROM q
       |),
       |tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS token
       |  FROM documents
       |),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
       |       GROUP BY doc_id, token),
       |dl AS (SELECT doc_id,
       |              CAST(len(string_split($normSql, ' ')) AS DOUBLE) AS dl
       |       FROM documents),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |              avg(len(string_split($normSql, ' '))) AS avgdl
       |       FROM documents),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       |sc AS (
       |  SELECT qt.query_id, tf.doc_id,
       |         round(sum(
       |           ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
       |           * tf.tf * (1.2 + 1)
       |             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))
       |         ), 4) AS score
       |  FROM tf
       |  JOIN qt USING (token)
       |  JOIN df USING (token)
       |  JOIN dl ON dl.doc_id = tf.doc_id, st
       |  GROUP BY qt.query_id, tf.doc_id
       |),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, doc_id) AS rank
       |  FROM sc
       |)""".stripMargin
  }

  val q95Oracle: String =
    s"""WITH $bm25CtesSql
       |SELECT query_id, doc_id, score, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= $Bm25K
       |ORDER BY query_id, rank""".stripMargin

  // ---- q121: hybrid retrieval via Reciprocal Rank Fusion --------------

  /** Hybrid lexical+vector retrieval ([[graft.pipeline.Retrieval.rrfFuse]]):
    * the q95 keyword queries rank documents by BM25, the SAME query ids
    * rank the doc-aligned prefix of the embeddings table by cosine, and
    * RRF (c=60) fuses the two top-10 lists — the uncalibrated
    * rank-combination every hybrid RAG stack runs. The oracle replays
    * both legs (BM25 term arithmetic, dot-product ranking) AND the
    * 1/(60+rank) fusion, so a rank shift in either leg or a fusion
    * tie-break drift reorders the output.
    */
  def q121HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        array_join(slice(graft.pipeline.TextAnalysis.tokens(col("text")),
          5, 4), " ").as("qtext"))
    val lex = graft.pipeline.TfIdf.bm25TopK(
        docs, "doc_id", "text", queries, "qid", "qtext", k = 10)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val emb = Tables.embeddings(spark, dir).filter(col("vec_id") < nDocs)
    val vec = graft.pipeline.Similarity.bruteForceTopK(
        emb.select(col("vec_id").as("doc_id"), col("embedding")),
        emb.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("doc_id"), col("embedding")),
        "doc_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    graft.pipeline.Retrieval.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy("query_id", "rank")
  }

  val q121Oracle: String =
    s"""WITH $bm25CtesSql,
       |lex AS (SELECT query_id, doc_id, rank FROM r WHERE rank <= 10),
       |nd AS (SELECT count(*) AS n FROM documents),
       |vq AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings, nd WHERE vec_id % 97 = 0 AND vec_id < nd.n
       |),
       |vc AS (
       |  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS cv
       |  FROM embeddings, nd WHERE vec_id < nd.n
       |),
       |vs AS (
       |  SELECT query_id, doc_id,
       |         round(list_dot_product(qv, cv), 4) AS sim
       |  FROM vc, vq WHERE query_id <> doc_id
       |),
       |vr AS (
       |  SELECT query_id, doc_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY sim DESC, doc_id) AS rank
       |  FROM vs
       |),
       |vec AS (SELECT query_id, doc_id, rank FROM vr WHERE rank <= 10),
       |fused AS (
       |  SELECT query_id, doc_id, rank FROM lex
       |  UNION ALL SELECT query_id, doc_id, rank FROM vec
       |),
       |rrf AS (
       |  SELECT query_id, doc_id,
       |         round(sum(1.0 / (60 + rank)), 6) AS rrf_score
       |  FROM fused GROUP BY query_id, doc_id
       |),
       |fr AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY rrf_score DESC, doc_id) AS rank
       |  FROM rrf
       |)
       |SELECT query_id, doc_id, rrf_score, CAST(rank AS BIGINT) AS rank
       |FROM fr WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  // ---- q103: CCNet-style perplexity tiering ---------------------------

  /** [[graft.pipeline.Curation.perplexityTiers]]: per-language
    * percent_rank over the q100 Kneser-Ney scores, cut into
    * head/middle/tail thirds (Wenzek et al. 2020 §4.3 — the relative
    * per-language cut that keeps low-resource languages alive). The
    * oracle refits the whole KN pipeline AND replays the rank cut, so a
    * wrong window ordering, tie-break, or cut constant moves documents
    * across tiers and flips counts.
    */
  def q103PerplexityTiers(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation.perplexityTiers(
        Tables.documents(spark, dir).select("doc_id", "lang", "text"),
        "doc_id", "text", "lang")
      .groupBy("lang", "tier")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("kn_logprob"), 4).as("avg_kn"))
      .orderBy("lang", "tier")

  val q103Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |         string_split(${PipelineQueries.normSql}, ' ') AS w
       |  FROM documents
       |),
       |gr AS (
       |  SELECT doc_id, lang,
       |         unnest(list_transform(range(1, len(w)),
       |                               i -> w[i] || ' ' || w[i+1])) AS g
       |  FROM t
       |),
       |cb AS (SELECT g, count(*) AS c2 FROM gr GROUP BY g),
       |byw1 AS (SELECT split_part(g, ' ', 1) AS w1,
       |                sum(c2) AS c1, count(*) AS n1f
       |         FROM cb GROUP BY w1),
       |byw2 AS (SELECT split_part(g, ' ', 2) AS w2, count(*) AS n1p
       |         FROM cb GROUP BY w2),
       |tot AS (SELECT count(*) AS b FROM cb),
       |p AS (
       |  SELECT cb.g,
       |         greatest(CAST(cb.c2 AS DOUBLE) - 0.75, 0.0) / byw1.c1
       |           + (0.75 * byw1.n1f / byw1.c1)
       |             * (CAST(byw2.n1p AS DOUBLE) / tot.b) AS pr
       |  FROM cb
       |  JOIN byw1 ON split_part(cb.g, ' ', 1) = byw1.w1
       |  JOIN byw2 ON split_part(cb.g, ' ', 2) = byw2.w2
       |  CROSS JOIN tot
       |),
       |d AS (
       |  SELECT gr.doc_id, gr.lang, avg(ln(p.pr)) AS lm
       |  FROM gr JOIN p ON gr.g = p.g
       |  GROUP BY gr.doc_id, gr.lang
       |),
       |ranked AS (
       |  SELECT lang, lm,
       |         percent_rank() OVER (PARTITION BY lang
       |                              ORDER BY lm DESC, doc_id) AS pr
       |  FROM d
       |),
       |tiers AS (
       |  SELECT lang, lm,
       |         CASE WHEN pr < 1.0 / 3.0 THEN 'head'
       |              WHEN pr < 2.0 / 3.0 THEN 'middle'
       |              ELSE 'tail' END AS tier
       |  FROM ranked
       |)
       |SELECT lang, tier, count(*) AS n_docs, round(avg(lm), 4) AS avg_kn
       |FROM tiers GROUP BY lang, tier ORDER BY lang, tier""".stripMargin

  // ---- q105: PageRank over the near-dup graph -------------------------

  /** Power-iteration rounds for q105 and its oracle — fixed, so the
    * result is a pure function of the edge list in both engines.
    */
  private val PrIters = 5

  /** [[graft.pipeline.PageRank.pageRank]] over the shared winnow pair
    * graph, DIRECTED id_a→id_b: lower-id docs link to their higher-id
    * near-twins, so dst-only nodes are dangling and the oracle exercises
    * the dangling-mass redistribution every round. Emits the top-15
    * central nodes; every PageRank quantity (out-degrees, per-round
    * dangling mass, the (1−d)/N teleport) is replayed in the same
    * evaluation order by $PrIters unrolled CTE rounds.
    */
  /** Memoized contribution-join salt spread for q105: the pair graph is
    * static per (session, dir), so its skew profile is too — the
    * Misra–Gries probe runs once alongside the pair-graph memo instead
    * of once per pageRank call. Derivation is over the same (src
    * multiplicity, row count) the in-operator probe would see: the MG
    * key is src alone, and folding out-degrees onto distinct edges
    * changes neither.
    */
  private val prSaltMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Int]

  private def prContribSalt(spark: SparkSession, dir: String): Int =
    prSaltMemo.getOrElseUpdate((spark, dir),
      graft.operators.Skew.adaptiveSaltBuckets(
        winnowPairGraph(spark, dir)
          .select(col("id_a").as("src"), col("id_b").as("dst")).distinct(),
        Seq("src")))

  /** Bench-only: run the once-per-JVM Misra–Gries salt probe untimed —
    * otherwise its jobs land inside q105's FIRST rep only, making that
    * rep's stage count disagree with later reps' (`stages: -2`).
    */
  private[graft] def warmPrSalt(spark: SparkSession, dir: String): Unit = {
    prContribSalt(spark, dir); ()
  }

  def q105PageRank(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.PageRank.pageRank(
        winnowPairGraph(spark, dir).select("id_a", "id_b"),
        damping = 0.85, iters = PrIters,
        saltBuckets = Some(prContribSalt(spark, dir)))
      .orderBy(col("rank").desc, col("node"))
      .limit(15)
      .select(col("node"), round(col("rank"), 6).as("pr_score"))

  val q105Oracle: String = {
    // every multi-referenced CTE is MATERIALIZED: DuckDB inlines
    // single-reference CTEs, and each round references its predecessor
    // twice — inlining would re-run the (md5-heavy) winnow prefix
    // 2^rounds times
    val rounds = (0 until PrIters).map { i =>
      s"""dang$i AS (
         |  SELECT coalesce(sum(r.r), 0.0) AS m
         |  FROM r$i r LEFT JOIN od ON r.node = od.node
         |  WHERE od.deg IS NULL
         |),
         |c$i AS (
         |  SELECT e.dst AS node, sum(r.r / od.deg) AS s
         |  FROM e JOIN r$i r ON e.src = r.node JOIN od ON od.node = e.src
         |  GROUP BY e.dst
         |),
         |r${i + 1} AS MATERIALIZED (
         |  SELECT nodes.node,
         |         (1.0 - 0.85) / nn.n
         |           + 0.85 * (coalesce(c.s, 0.0) + d.m / nn.n) AS r
         |  FROM nodes CROSS JOIN nn CROSS JOIN dang$i d
         |  LEFT JOIN c$i c ON c.node = nodes.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${PipelineQueries.docsAugSql},
       |docs AS (SELECT doc_id, text FROM docs_aug),
       |${winnowSql("docs")},
       |flat AS (SELECT doc_id, unnest(fp_set) AS fp FROM fps),
       |rare AS (
       |  SELECT fp FROM (SELECT fp, count(*) AS df FROM flat GROUP BY fp)
       |  WHERE df <= 20
       |),
       |kept AS (SELECT flat.* FROM flat JOIN rare USING (fp)),
       |e AS MATERIALIZED (
       |  SELECT a.doc_id AS src, b.doc_id AS dst
       |  FROM kept a JOIN kept b USING (fp)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 5
       |),
       |od AS MATERIALIZED (
       |  SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
       |nodes AS MATERIALIZED (
       |  SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS MATERIALIZED (
       |  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS MATERIALIZED (
       |  SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT node, round(r, 6) AS pr_score
       |FROM r$PrIters
       |ORDER BY r DESC, node
       |LIMIT 15""".stripMargin
  }

  // ---- q149: adaptive salt derivation + CC on a planted power-law graph

  /** Adaptive-salt derivation under the oracle gate: a PLANTED power-law
    * edge list (one edge per event; 70% of them hit the source user's
    * fixed hub — 3 hubs carry ~23% of all edges each — the rest fan out
    * to per-residue group nodes) drives both
    * [[graft.operators.Skew.adaptiveSaltBuckets]] and the salted
    * connected-components run on top of it.
    *
    * Row 1 pins the derivation to its analytic band: the Misra–Gries
    * estimate of the top key's share is bounded within
    * [true_share, true_share + 1/probeK], so the derived bucket count
    * must land in [ceil(ts·p), ceil((ts+1/64)·p)] (p = shuffle
    * partitions), both clamped to [1, 64] — computed Spark-side from
    * exact counts, oracle-expected true. Rows 2–4 are the component
    * count, max component size, and node count of the CC run, replayed
    * by a DuckDB recursive-CTE transitive closure.
    */
  def q149AdaptiveSaltCc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select("event_id", "user_id")
    val edges = ev.select(
      col("user_id").as("src"),
      when(col("event_id") % 10 < 7, lit(1000000L) + col("user_id") % 3)
        .otherwise(lit(2000000L) + (col("user_id") % 3) * 10000L +
          (col("user_id") / 12).cast("long"))
        .as("dst"))
    val b = graft.operators.Skew.adaptiveSaltBuckets(edges, Seq("dst"))
    val n = edges.count()
    val top = edges.groupBy("dst").count()
      .agg(max("count")).head().getLong(0)
    val ts = top.toDouble / n
    val p = spark.sessionState.conf.numShufflePartitions
    def clamp(x: Int) = math.max(1, math.min(64, x))
    val lo = clamp(math.ceil(ts * p).toInt)
    val hi = clamp(math.ceil((ts + 1.0 / 64) * p).toInt)
    val inBand = if (b >= lo && b <= hi) 1L else 0L
    val comps = graft.pipeline.Components.componentSizes(
      edges.distinct().select(col("src").as("id_a"), col("dst").as("id_b")))
    val a = comps.agg(count(lit(1)).cast("long"), max("n_members"),
      sum("n_members")).head()
    Seq(
      ("1_buckets_in_band", inBand),
      ("2_n_components", a.getLong(0)),
      ("3_max_component", a.getLong(1)),
      ("4_n_nodes", a.getLong(2)))
      .toDF("metric", "value")
      .orderBy("metric")
  }

  val q149Oracle: String =
    """WITH RECURSIVE ev AS (
      |  SELECT event_id, user_id FROM events
      |),
      |edges AS (
      |  SELECT user_id AS src,
      |         CASE WHEN event_id % 10 < 7 THEN 1000000 + user_id % 3
      |              ELSE 2000000 + (user_id % 3) * 10000 + user_id // 12
      |         END AS dst
      |  FROM ev
      |),
      |de AS (SELECT DISTINCT src, dst FROM edges),
      |e AS (SELECT src AS a, dst AS b FROM de
      |      UNION SELECT dst, src FROM de),
      |reach AS (
      |  SELECT a AS id, a AS r FROM e
      |  UNION
      |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a
      |),
      |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
      |sizes AS (SELECT component, count(*) AS n FROM comp GROUP BY component)
      |SELECT '1_buckets_in_band' AS metric, CAST(1 AS BIGINT) AS value
      |UNION ALL
      |SELECT '2_n_components', (SELECT CAST(count(*) AS BIGINT) FROM sizes)
      |UNION ALL
      |SELECT '3_max_component', (SELECT CAST(max(n) AS BIGINT) FROM sizes)
      |UNION ALL
      |SELECT '4_n_nodes', (SELECT CAST(sum(n) AS BIGINT) FROM sizes)
      |ORDER BY metric""".stripMargin

  // ---- q131: triangle counting over the near-dup graph ----------------

  /** Degree-oriented triangle counting ([[graft.pipeline.Triangles]])
    * over the shared winnow pair graph — the dup-cluster density
    * primitive. The oracle rebuilds the orientation (same
    * (degree, id) order) and the wedge-close join in SQL, so a
    * double-counted triangle, a dropped orientation tie-break, or a
    * skew-unsafe wedge enumeration shifts some node's count.
    */
  def q131TriangleCounts(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Triangles.perNode(
        winnowPairGraph(spark, dir).select("id_a", "id_b"))
      .orderBy("node")

  val q131Oracle: String =
    s"""WITH ${PipelineQueries.docsAugSql},
       |docs AS (SELECT doc_id, text FROM docs_aug),
       |${winnowSql("docs")},
       |flat AS (SELECT doc_id, unnest(fp_set) AS fp FROM fps),
       |rare AS (
       |  SELECT fp FROM (SELECT fp, count(*) AS df FROM flat GROUP BY fp)
       |  WHERE df <= 20
       |),
       |kept AS (SELECT flat.* FROM flat JOIN rare USING (fp)),
       |e AS MATERIALIZED (
       |  SELECT a.doc_id AS a, b.doc_id AS b
       |  FROM kept a JOIN kept b USING (fp)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 5
       |),
       |deg AS MATERIALIZED (
       |  SELECT node, count(*) AS d FROM (
       |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
       |  GROUP BY node
       |),
       |o AS MATERIALIZED (
       |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
       |              THEN e.a ELSE e.b END AS u,
       |         CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
       |              THEN e.b ELSE e.a END AS v
       |  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
       |),
       |tri AS (
       |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
       |  FROM o e1
       |  JOIN o e2 ON e1.v = e2.u
       |  JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
       |)
       |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
       |FROM (SELECT unnest([x, y, z]) AS node FROM tri)
       |GROUP BY node ORDER BY node""".stripMargin

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_winnow_profile" -> (q49WinnowProfile _),
    "q50_winnow_pairs" -> (q50WinnowPairs _),
    "q51_repetition" -> (q51Repetition _),
    "q52_token_entropy" -> (q52Entropy _),
    "q57_dedup_components" -> (q57DedupComponents _),
    "q73_cluster_representatives" -> (q73ClusterRepresentatives _),
    "q58_tfidf_weights" -> (q58TfIdfWeights _),
    "q61_bigram_lm" -> (q61BigramLm _),
    "q100_kneser_ney_lm" -> (q100KneserNeyLm _),
    "q92_group_aware_split" -> (q92GroupAwareSplit _),
    "q95_bm25_topk" -> (q95Bm25TopK _),
    "q121_hybrid_rrf" -> (q121HybridRrf _),
    "q103_perplexity_tiers" -> (q103PerplexityTiers _),
    "q105_pagerank" -> (q105PageRank _),
    "q131_triangle_counts" -> (q131TriangleCounts _),
    "q149_adaptive_salt_cc" -> (q149AdaptiveSaltCc _)
  )

  def oracles: Map[String, String] = Map(
    "q49_winnow_profile" -> q49Oracle,
    "q50_winnow_pairs" -> q50Oracle,
    "q51_repetition" -> q51Oracle,
    "q52_token_entropy" -> q52Oracle,
    "q57_dedup_components" -> q57Oracle,
    "q73_cluster_representatives" -> q73Oracle,
    "q58_tfidf_weights" -> q58Oracle,
    "q61_bigram_lm" -> q61Oracle,
    "q100_kneser_ney_lm" -> q100Oracle,
    "q92_group_aware_split" -> q92Oracle,
    "q95_bm25_topk" -> q95Oracle,
    "q121_hybrid_rrf" -> q121Oracle,
    "q103_perplexity_tiers" -> q103Oracle,
    "q105_pagerank" -> q105Oracle,
    "q131_triangle_counts" -> q131Oracle,
    "q149_adaptive_salt_cc" -> q149Oracle
  )
}
