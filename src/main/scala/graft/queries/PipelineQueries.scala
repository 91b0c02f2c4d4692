package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{Dedup, TextAnalysis}

/** Oracle-checked text-analysis and dedup queries over the `documents`
  * table. The DuckDB oracles mirror each formula verbatim (same
  * normalization, marker sets, hash construction); near-dup queries run
  * on `docs_aug`, which plants deterministic near-duplicates (a mutated
  * copy of every 37th document) via shared SQL so both engines see them.
  */
object PipelineQueries {

  /** Shared normalization fragments (DuckDB side). Spark side is
    * TextAnalysis — keep in sync.
    */
  private[queries] val normSql =
    "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
  private val bpeishRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  private val stopList = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  /** Planted near-duplicates: every 37th doc gets a mutated twin. */
  val docsAugSql: String =
    """docs_aug AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text || ' zqx' AS text
      |  FROM documents WHERE doc_id % 37 = 0
      |)""".stripMargin

  def docsAug(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    spark.sql(s"WITH $docsAugSql SELECT * FROM docs_aug")
  }

  // ---- q20: token statistics ------------------------------------------

  def q20TokenStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs
      .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      .withColumn("n_bpeish", TextAnalysis.bpeishTokenCount(col("text")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("sum_tokens"),
        round(avg("n_tok"), 4).as("avg_tokens"),
        sum("n_bpeish").as("sum_bpeish"))
      .orderBy("lang")
  }

  val q20Oracle: String =
    s"""WITH t AS (
       |  SELECT lang,
       |         len(string_split($normSql, ' ')) AS n_tok,
       |         len(regexp_extract_all(text, '$bpeishRe')) AS n_bpeish
       |  FROM documents
       |)
       |SELECT lang, count(*) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       |       round(avg(n_tok), 4) AS avg_tokens,
       |       CAST(sum(n_bpeish) AS BIGINT) AS sum_bpeish
       |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q21: quality scoring -------------------------------------------

  def q21Quality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .withColumn("punct", TextAnalysis.punctCount(col("text")))
      .withColumn("stop", TextAnalysis.stopwordCount(col("text")))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("q"), 4).as("avg_quality"),
        sum("punct").as("sum_punct"),
        sum("stop").as("sum_stop"))
      .orderBy("source")
  }

  val q21Oracle: String =
    s"""WITH t AS (
       |  SELECT source, $normSql AS norm,
       |         len(string_split($normSql, ' ')) AS n_tok,
       |         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
       |         len(list_filter(string_split($normSql, ' '),
       |                         x -> x IN ($stopList))) AS n_stop
       |  FROM documents
       |),
       |scored AS (
       |  SELECT source, n_punct, n_stop,
       |    0.25 * (
       |      least(1.0, n_tok / 100.0)
       |      + greatest(0.0, 1.0 - 5.0 * (CAST(n_punct AS DOUBLE) / len(norm)))
       |      + least(1.0, 5.0 * (CAST(n_stop AS DOUBLE) / n_tok))
       |      + greatest(0.0, 1.0 - abs((len(norm) - (n_tok - 1.0)) / n_tok - 5.0) / 5.0)
       |    ) AS q
       |  FROM t
       |)
       |SELECT source, count(*) AS n_docs, round(avg(q), 4) AS avg_quality,
       |       CAST(sum(n_punct) AS BIGINT) AS sum_punct,
       |       CAST(sum(n_stop) AS BIGINT) AS sum_stop
       |FROM scored GROUP BY source ORDER BY source""".stripMargin

  // ---- q22: language identification -----------------------------------

  def q22LangId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .withColumn("predicted", TextAnalysis.langIdFromTokens(col("w")))
      .groupBy(col("lang").as("labeled"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("labeled", "predicted")
  }

  val q22Oracle: String = {
    val scores = TextAnalysis.LangMarkers.map { case (l, markers) =>
      val set = markers.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(string_split($normSql, ' '), x -> x IN ($set))) AS s_$l"
    }.mkString(",\n         ")
    s"""WITH t AS (
       |  SELECT lang, $scores
       |  FROM documents
       |),
       |p AS (
       |  SELECT lang,
       |    CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       |         WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       |         WHEN s_es >= s_fr THEN 'es'
       |         ELSE 'fr' END AS predicted
       |  FROM t
       |)
       |SELECT lang AS labeled, predicted, count(*) AS n_docs
       |FROM p GROUP BY labeled, predicted ORDER BY labeled, predicted""".stripMargin
  }

  // ---- q23: exact-dup fingerprints ------------------------------------

  def q23Fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct("fp").as("n_unique"),
        min("fp").as("min_fp"))
      .orderBy("source")
  }

  val q23Oracle: String =
    s"""SELECT source, count(*) AS n_docs,
       |       count(DISTINCT md5($normSql)) AS n_unique,
       |       min(md5($normSql)) AS min_fp
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---- q24: n-gram Jaccard near-dup pairs ------------------------------

  /** Shared shingle CTEs over docs_aug (3-gram, distinct). */
  private val shingleSql =
    s"""toks AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS w FROM docs_aug
       |),
       |sh AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(list_transform(range(1, len(w) - 1),
       |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
       |  FROM toks
       |)""".stripMargin

  def q24JaccardPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(docsAug(spark, dir), "doc_id", "text",
        n = 3, minSim = 0.5, maxShingleDocFreq = 100)
      .orderBy("id_a", "id_b")

  val q24Oracle: String =
    s"""WITH $docsAugSql,
       |$shingleSql,
       |rare AS (
       |  SELECT doc_id, sh FROM (
       |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh
       |  ) WHERE df <= 100
       |),
       |-- sizes over the CAPPED space: intersection and union must use
       |-- the same (df-filtered) shingle set
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |)
       |SELECT id_a, id_b,
       |       round(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 4)
       |         AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = id_a
       |JOIN sizes sb ON sb.doc_id = id_b
       |WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  // ---- q25: MinHash + LSH near-dup pairs -------------------------------

  private val K = 8
  private val Bands = 4

  def q25MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(docsAug(spark, dir), "doc_id", "text",
        k = K, bands = Bands, minEstSim = 0.5)
      .orderBy("id_a", "id_b")

  val q25Oracle: String = {
    val comps = (0 until K)
      .map(i => s"min(md5('$i|' || sh)) AS mh$i").mkString(",\n         ")
    val r = K / Bands
    val bandRows = (0 until Bands).map { b =>
      val cat = (b * r until (b + 1) * r).map(i => s"mh$i").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL ")
    val matchSum = (0 until K)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $docsAugSql,
       |$shingleSql,
       |sig AS (
       |  SELECT doc_id,
       |         $comps
       |  FROM sh GROUP BY doc_id
       |),
       |bands AS (
       |  $bandRows
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a
       |  JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
       |              AND a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, CAST(($matchSum) AS DOUBLE) / $K AS est_sim
       |FROM cand
       |JOIN sig sa ON sa.doc_id = id_a
       |JOIN sig sb ON sb.doc_id = id_b
       |WHERE CAST(($matchSum) AS DOUBLE) / $K >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---- q26: SimHash fingerprints ---------------------------------------

  private val SimhashBits = 64

  /** DuckDB mirror of the 64-bit extraction in [[Dedup.simhash]]: nibble
    * n's value via strpos over the hex alphabet, bit b = bit (b%4) of
    * nibble (b/4); bit 63's weight is spelled as Long.MinValue so the
    * BIGINT sum never overflows.
    */
  private def simhashSigSql(filt: String): String = {
    val nibs = (0 until SimhashBits / 4)
      .map(n => s"strpos('0123456789abcdef', substr(h, ${n + 1}, 1)) - 1 AS n$n")
      .mkString(",\n         ")
    val sums = (0 until SimhashBits)
      .map(b => s"sum(CASE WHEN (n${b / 4} >> ${b % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n         ")
    val fp = (0 until SimhashBits).map { b =>
      if (b == 63) "CASE WHEN s63 > 0 THEN -9223372036854775807 - 1 ELSE 0 END"
      else s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, md5(unnest(string_split($normSql, ' '))) AS h
       |  FROM docs_aug WHERE $filt
       |),
       |nib AS (
       |  SELECT doc_id,
       |         $nibs
       |  FROM tok
       |),
       |s AS (
       |  SELECT doc_id,
       |         $sums
       |  FROM nib GROUP BY doc_id
       |),
       |sig AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM s)""".stripMargin
  }

  def q26Simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(
        docsAug(spark, dir).filter(col("doc_id") % 17 === 0),
        "doc_id", "text", bits = SimhashBits)
      .orderBy("doc_id")

  val q26Oracle: String =
    s"""WITH $docsAugSql,
       |${simhashSigSql("doc_id % 17 = 0")}
       |SELECT doc_id, simhash
       |FROM sig ORDER BY doc_id""".stripMargin

  // ---- q48: token-length quantiles ------------------------------------

  /** Exact interpolated percentiles of the token-length distribution per
    * language — the corpus-profiling aggregate behind length filters.
    * Spark's `percentile` and DuckDB's `quantile_cont` share the
    * (p * (n-1)) linear-interpolation definition, so values match to
    * rounding.
    */
  def q48LengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs
      .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(expr("percentile(n_tok, 0.25D)"), 4).as("p25"),
        round(expr("percentile(n_tok, 0.5D)"), 4).as("p50"),
        round(expr("percentile(n_tok, 0.9D)"), 4).as("p90"))
      .orderBy("lang")
  }

  val q48Oracle: String =
    s"""WITH t AS (
       |  SELECT lang, len(string_split($normSql, ' ')) AS n_tok
       |  FROM documents
       |)
       |SELECT lang, count(*) AS n_docs,
       |       round(quantile_cont(n_tok, 0.25), 4) AS p25,
       |       round(quantile_cont(n_tok, 0.5), 4) AS p50,
       |       round(quantile_cont(n_tok, 0.9), 4) AS p90
       |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q70: approximate quantiles under an exact error gate ------------

  /** The 100 TB quantile path: `approx_percentile` (Greenwald-Khanna
    * style mergeable sketch, one map-side-combinable agg — no global
    * sort) gated against the exact interpolated percentiles. With
    * accuracy A the sketch guarantees rank error <= 1/A, so each
    * estimate must land inside the exact value envelope at p +- 3/A —
    * the same estimate-plus-proven-bound shape as q38's HLL gate. The
    * oracle states the exact values and the (therefore provable) flags.
    */
  def q70ApproxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val eps3 = 0.03 // 3 / accuracy
    def within(p: Double): org.apache.spark.sql.Column = {
      val lo = expr(s"percentile(n_tok, ${math.max(0.0, p - eps3)}D)")
      val hi = expr(s"percentile(n_tok, ${math.min(1.0, p + eps3)}D)")
      val ap = expr(s"approx_percentile(n_tok, ${p}D, 100)")
      (ap >= lo && ap <= hi).as(s"ok_p${(p * 100).toInt}")
    }
    docs
      .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(expr("percentile(n_tok, 0.5D)"), 4).as("p50"),
        round(expr("percentile(n_tok, 0.9D)"), 4).as("p90"),
        within(0.5), within(0.9))
      .orderBy("lang")
  }

  val q70Oracle: String =
    s"""WITH t AS (
       |  SELECT lang, len(string_split($normSql, ' ')) AS n_tok
       |  FROM documents
       |)
       |SELECT lang, count(*) AS n_docs,
       |       round(quantile_cont(n_tok, 0.5), 4) AS p50,
       |       round(quantile_cont(n_tok, 0.9), 4) AS p90,
       |       true AS ok_p50, true AS ok_p90
       |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q47: SimHash near-dup pairs (banded hamming join) ---------------

  /** doc_id % 2 keeps the planted twins together (their offset 1000000
    * is even), so the pair join has real near-dups to find; at 64-bit
    * entropy only genuine near-duplicates land within hamming 3, so the
    * fixture needs the wider slice to surface enough of them.
    */
  def q47SimhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(
        docsAug(spark, dir).filter(col("doc_id") % 2 === 0),
        "doc_id", "text", bits = SimhashBits, maxHamming = 3,
        maxBucketDocs = 1000)
      .orderBy("id_a", "id_b")

  val q47Oracle: String =
    s"""WITH $docsAugSql,
       |${simhashSigSql("doc_id % 2 = 0")},
       |bands AS (
       |  SELECT doc_id, bi, (simhash >> (bi * 16)) & 65535 AS bv
       |  FROM sig, unnest(range(0, 4)) AS u(bi)
       |  QUALIFY count(*) OVER (PARTITION BY bi, bv) <= 1000
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x
       |  JOIN bands y ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id
       |)
       |SELECT id_a, id_b,
       |       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
       |FROM cand
       |JOIN sig sa ON sa.doc_id = id_a
       |JOIN sig sb ON sb.doc_id = id_b
       |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  // ---- q40: composed cleaning funnel -----------------------------------

  /** docs_aug plus planted EXACT twins (every 43rd doc) so stage 2 has
    * real work; stage 3 then removes the mutated twins.
    */
  val docsCleanSql: String =
    s"""$docsAugSql,
       |docs_clean AS (
       |  SELECT doc_id, text FROM docs_aug
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS doc_id, text
       |  FROM documents WHERE doc_id % 43 = 0
       |)""".stripMargin

  /** docs_clean with planted shared paragraphs (rotating headers on
    * every 4th doc, footers on every 5th — q72's fixture shape) so the
    * funnel's paragraph stage has real cross-document work. The SQL is
    * dialect-neutral: it parses in Spark SQL (builds the input frame)
    * AND DuckDB (the oracle).
    */
  val docsFunnelSql: String =
    s"""$docsCleanSql,
       |docs_funnel AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 4 = 0
       |         THEN 'shared quote ' || CAST(doc_id % 7 AS STRING) || chr(10)
       |         ELSE '' END ||
       |    text ||
       |    CASE WHEN doc_id % 5 = 0
       |         THEN chr(10) || 'footer note ' || CAST(doc_id % 3 AS STRING)
       |         ELSE '' END AS text
       |  FROM docs_clean
       |)""".stripMargin

  def q40CleaningFunnel(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    val input = spark.sql(s"WITH $docsFunnelSql SELECT * FROM docs_funnel")
    val result = graft.pipeline.CorpusClean.clean(
      input, "doc_id", "text", minQuality = 0.6, paragraphDedup = true)
    graft.pipeline.CorpusClean.report(spark, result)
  }

  val q40Oracle: String = {
    val comps = (0 until K)
      .map(i => s"min(md5('$i|' || sh)) AS mh$i").mkString(",\n         ")
    val r = K / Bands
    val bandRows = (0 until Bands).map { b =>
      val cat = (b * r until (b + 1) * r).map(i => s"mh$i").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS band_hash FROM sig2"
    }.mkString("\n  UNION ALL ")
    val matchSum = (0 until K)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $docsFunnelSql,
       |qual AS (
       |  SELECT doc_id, text,
       |    0.25 * (
       |      least(1.0, n_tok / 100.0)
       |      + greatest(0.0, 1.0 - 5.0 * (CAST(n_punct AS DOUBLE) / len(norm)))
       |      + least(1.0, 5.0 * (CAST(n_stop AS DOUBLE) / n_tok))
       |      + greatest(0.0, 1.0 - abs((len(norm) - (n_tok - 1.0)) / n_tok - 5.0) / 5.0)
       |    ) AS q
       |  FROM (
       |    SELECT doc_id, text, $normSql AS norm,
       |           len(string_split($normSql, ' ')) AS n_tok,
       |           len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
       |           len(list_filter(string_split($normSql, ' '),
       |                           x -> x IN ($stopList))) AS n_stop
       |    FROM docs_funnel)
       |),
       |s1 AS (SELECT doc_id, text FROM qual WHERE q >= 0.6),
       |paras AS (
       |  SELECT doc_id,
       |         unnest(string_split(text, chr(10))) AS para,
       |         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
       |  FROM s1
       |),
       |firsts AS (
       |  SELECT doc_id, pos, para,
       |         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
       |  FROM paras
       |),
       |pd AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_after,
       |         string_agg(para, chr(10) ORDER BY pos) AS text_clean
       |  FROM firsts WHERE rn = 1 GROUP BY doc_id
       |),
       |s1b AS (
       |  SELECT s1.doc_id, coalesce(pd.text_clean, '') AS text
       |  FROM s1 LEFT JOIN pd USING (doc_id)
       |),
       |paras_dropped AS (
       |  SELECT CAST(coalesce(sum(
       |           len(string_split(s1.text, chr(10))) - coalesce(pd.n_after, 0)
       |         ), 0) AS BIGINT) AS n
       |  FROM s1 LEFT JOIN pd USING (doc_id)
       |),
       |s2 AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |           min(doc_id) OVER (PARTITION BY md5($normSql)) AS keep
       |    FROM s1b) WHERE doc_id = keep
       |),
       |toks2 AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM s2),
       |sh2 AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(list_transform(range(1, len(w) - 1),
       |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
       |  FROM toks2
       |),
       |sig2 AS (
       |  SELECT doc_id,
       |         $comps
       |  FROM sh2 GROUP BY doc_id
       |),
       |bands2 AS (
       |  $bandRows
       |),
       |cand2 AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands2 a
       |  JOIN bands2 b ON a.band = b.band AND a.band_hash = b.band_hash
       |              AND a.doc_id < b.doc_id
       |),
       |removed AS (
       |  SELECT DISTINCT id_b FROM cand2
       |  JOIN sig2 sa ON sa.doc_id = id_a
       |  JOIN sig2 sb ON sb.doc_id = id_b
       |  WHERE CAST(($matchSum) AS DOUBLE) / $K >= 0.5
       |),
       |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT id_b FROM removed))
       |SELECT (SELECT count(*) FROM docs_funnel) AS n_raw,
       |       (SELECT count(*) FROM s1) AS n_after_quality,
       |       (SELECT n FROM paras_dropped) AS n_paras_dropped,
       |       (SELECT count(*) FROM s2) AS n_after_exact,
       |       (SELECT count(*) FROM s3) AS n_after_near""".stripMargin
  }

  // ---- q62: boilerplate line removal ------------------------------------

  /** Fixture: the corpus has no newlines, so per-source boilerplate is
    * planted deterministically — a subscribe banner on every 3rd doc, a
    * copyright footer on every 2nd — and [[Boilerplate.stripBoilerplate]]
    * must remove exactly those (per-source df >= 5) while reassembling
    * the body lines untouched.
    */
  private def docsLines(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      concat(
        when(col("doc_id") % 3 === 0,
          concat(lit("subscribe to the "), col("source"), lit(" newsletter\n")))
          .otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 2 === 0,
          concat(lit("\nall rights reserved by "), col("source")))
          .otherwise(lit(""))).as("text"))

  private val docsLinesSql: String =
    """docs_lines AS (
      |  SELECT doc_id, source,
      |         CASE WHEN doc_id % 3 = 0
      |              THEN 'subscribe to the ' || source || ' newsletter' || chr(10)
      |              ELSE '' END ||
      |         text ||
      |         CASE WHEN doc_id % 2 = 0
      |              THEN chr(10) || 'all rights reserved by ' || source
      |              ELSE '' END AS text
      |  FROM documents
      |)""".stripMargin

  def q62Boilerplate(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Boilerplate
      .stripBoilerplate(docsLines(spark, dir), "doc_id", "text", "source",
        minDf = 5)
      .filter(col("doc_id") % 5 === 0)
      .orderBy("doc_id")

  val q62Oracle: String =
    s"""WITH $docsLinesSql,
       |lines AS (
       |  SELECT doc_id, source,
       |         unnest(string_split(text, chr(10))) AS line,
       |         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
       |  FROM docs_lines
       |),
       |boiler AS (
       |  SELECT source, line FROM lines
       |  GROUP BY source, line HAVING count(DISTINCT doc_id) >= 5
       |),
       |kept AS (
       |  SELECT l.* FROM lines l
       |  ANTI JOIN boiler b ON l.source = b.source AND l.line = b.line
       |),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_after,
       |         string_agg(line, chr(10) ORDER BY pos) AS text_clean
       |  FROM kept GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines_before,
       |       coalesce(a.n_lines_after, 0) AS n_lines_after,
       |       coalesce(a.text_clean, '') AS text_clean
       |FROM docs_lines d LEFT JOIN agg a USING (doc_id)
       |WHERE d.doc_id % 5 = 0
       |ORDER BY d.doc_id""".stripMargin

  // ---- q72: corpus-wide paragraph dedup (keep first occurrence) ---------

  /** Fixture: the corpus is single-line, so shared paragraphs are
    * planted — 7 rotating "shared quote" headers on every 4th doc, 3
    * rotating footers on every 5th. [[ParagraphDedup.dedupParagraphs]]
    * must keep exactly the first (doc, pos) occurrence of each and drop
    * every later one, while the unique body lines all survive.
    */
  private def docsParas(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      concat(
        when(col("doc_id") % 4 === 0,
          concat(lit("shared quote "), (col("doc_id") % 7).cast("string"),
            lit("\n"))).otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit("\nfooter note "), (col("doc_id") % 3).cast("string")))
          .otherwise(lit(""))).as("text"))

  def q72ParagraphDedup(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.ParagraphDedup
      .dedupParagraphs(docsParas(spark, dir), "doc_id", "text")
      .filter(col("doc_id") % 5 === 0)
      .orderBy("doc_id")

  val q72Oracle: String =
    """WITH docs_paras AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0
      |         THEN 'shared quote ' || (doc_id % 7) || chr(10) ELSE '' END ||
      |    text ||
      |    CASE WHEN doc_id % 5 = 0
      |         THEN chr(10) || 'footer note ' || (doc_id % 3) ELSE '' END AS text
      |  FROM documents
      |),
      |paras AS (
      |  SELECT doc_id,
      |         unnest(string_split(text, chr(10))) AS para,
      |         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      |  FROM docs_paras
      |),
      |ranked AS (
      |  SELECT doc_id, pos, para,
      |         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
      |  FROM paras
      |),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras_after,
      |         string_agg(para, chr(10) ORDER BY pos) AS text_clean
      |  FROM ranked WHERE rn = 1 GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_paras_before,
      |       coalesce(a.n_paras_after, 0) AS n_paras_after,
      |       coalesce(a.text_clean, '') AS text_clean
      |FROM docs_paras d LEFT JOIN agg a USING (doc_id)
      |WHERE d.doc_id % 5 = 0
      |ORDER BY d.doc_id""".stripMargin

  // ---- q75: exact substring dedup (Lee et al. 2021) ----------------------

  private val SubstrL = 8

  /** Fixture: a shared 10-token span is planted on every 6th doc, so its
    * 3 interior `l=8` windows repeat corpus-wide; the boundary windows
    * mix with each doc's own tail and stay unique. The lowest planted
    * doc_id must keep the span; every later one must lose exactly those
    * 10 tokens ([[graft.pipeline.SubstringDedup]] keep-first), and
    * organic within-corpus window repeats dedup the same way.
    */
  private val docsSpansSql: String =
    """docs_spans AS (
      |  SELECT doc_id,
      |    text || CASE WHEN doc_id % 6 = 0
      |      THEN ' alpha beta gamma delta epsilon zeta eta theta iota kappa'
      |      ELSE '' END AS text
      |  FROM documents
      |)""".stripMargin

  def q75SubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    val input = spark.sql(s"WITH $docsSpansSql SELECT * FROM docs_spans")
    graft.pipeline.SubstringDedup
      .dedupSubstrings(input, "doc_id", "text", l = SubstrL)
      .filter(col("doc_id") % 3 === 0)
      .orderBy("doc_id")
  }

  val q75Oracle: String = {
    val l = SubstrL
    s"""WITH $docsSpansSql,
       |toks AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM docs_spans),
       |occ AS (
       |  SELECT doc_id, w,
       |         unnest(range(1, greatest(len(w) - $l + 2, 1))) AS o
       |  FROM toks
       |),
       |grams AS (
       |  SELECT doc_id, o,
       |         array_to_string(list_slice(w, o, o + $l - 1), ' ') AS gram
       |  FROM occ
       |),
       |ranked AS (
       |  SELECT doc_id, o,
       |         row_number() OVER (PARTITION BY gram ORDER BY doc_id, o) AS rn
       |  FROM grams
       |),
       |covered AS (
       |  SELECT DISTINCT doc_id, unnest(range(o, o + $l)) AS pos
       |  FROM ranked WHERE rn > 1
       |),
       |tokpos AS (
       |  SELECT doc_id, unnest(w) AS tok,
       |         unnest(range(1, len(w) + 1)) AS pos
       |  FROM toks
       |),
       |kept AS (
       |  SELECT t.doc_id, t.tok, t.pos FROM tokpos t
       |  ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
       |),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_after,
       |         string_agg(tok, ' ' ORDER BY pos) AS text_dedup
       |  FROM kept GROUP BY doc_id
       |)
       |SELECT t.doc_id,
       |       CAST(len(t.w) AS BIGINT) AS n_tokens_before,
       |       coalesce(a.n_tokens_after, 0) AS n_tokens_after,
       |       coalesce(a.text_dedup, '') AS text_dedup
       |FROM toks t LEFT JOIN agg a USING (doc_id)
       |WHERE t.doc_id % 3 = 0
       |ORDER BY t.doc_id""".stripMargin
  }

  // ---- q76: DSIR importance weights -------------------------------------

  private val DsirB = 2048
  private val DsirTopK = 100

  /** DSIR data selection with target = the English slice of the corpus,
    * raw = the whole corpus: per-doc hashed-unigram+bigram log importance
    * weight plus a top-`DsirTopK` selection flag. The oracle refits both
    * distributions and replays the add-one-smoothed log-ratio sum; the
    * weight is rounded ONCE (6 dp) on both sides and selection ranks on
    * the rounded weight with a doc_id tiebreak, so the flag is stable
    * under summation-order ulps.
    */
  def q76DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // one-pass fit (target is a slice of raw), and the scored frame is
    // materialized so the md5-heavy scoring projection runs exactly once
    // — it feeds both the top-k and the flag join
    val ratios = graft.pipeline.Dsir.fitLogRatiosFlagged(
      docs, col("lang") === "en", "text", DsirB)
    val scored = graft.pipeline.Dsir.score(docs, "doc_id", "text", ratios)
      .localCheckpoint()
    val top = graft.pipeline.Dsir.selectTopK(scored, "doc_id", DsirTopK)
      .select(col("doc_id"), lit(1).as("selected"))
    scored.join(broadcast(top), Seq("doc_id"), "left")
      .withColumn("selected", coalesce(col("selected"), lit(0)))
      .orderBy("doc_id")
  }

  val q76Oracle: String = {
    val b = DsirB
    s"""WITH t AS (
       |  SELECT doc_id, lang, string_split($normSql, ' ') AS w FROM documents
       |),
       |g AS (
       |  SELECT doc_id, lang, list_concat(w,
       |    CASE WHEN len(w) >= 2
       |      THEN list_transform(range(1, len(w)), i -> w[i] || '_' || w[i+1])
       |      ELSE [] END) AS gs
       |  FROM t
       |),
       |occ AS (
       |  SELECT doc_id, lang,
       |         ('0x' || substr(md5(gm), 1, 14))::BIGINT % $b AS b
       |  FROM (SELECT doc_id, lang, unnest(gs) AS gm FROM g)
       |),
       |raw AS (SELECT b, count(*) AS c FROM occ GROUP BY b),
       |tgt AS (SELECT b, count(*) AS c FROM occ WHERE lang = 'en' GROUP BY b),
       |tot AS (SELECT (SELECT sum(c) FROM raw) + $b AS rtot,
       |               (SELECT sum(c) FROM tgt) + $b AS ttot),
       |wdoc AS (
       |  SELECT o.doc_id, count(*) AS n_grams,
       |         sum(ln((coalesce(tg.c, 0) + 1)::DOUBLE / tot.ttot)
       |           - ln((coalesce(rw.c, 0) + 1)::DOUBLE / tot.rtot)) AS lw
       |  FROM occ o
       |  LEFT JOIN raw rw ON o.b = rw.b
       |  LEFT JOIN tgt tg ON o.b = tg.b
       |  CROSS JOIN tot
       |  GROUP BY o.doc_id
       |),
       |r AS (SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       |             round(lw, 6) AS weight FROM wdoc),
       |sel AS (SELECT doc_id FROM r ORDER BY weight DESC, doc_id LIMIT $DsirTopK)
       |SELECT r.doc_id, r.n_grams, r.weight,
       |       CAST(r.doc_id IN (SELECT doc_id FROM sel) AS INT) AS selected
       |FROM r ORDER BY r.doc_id""".stripMargin
  }

  // ---- q77: product-quantized ANN (ADC scan + exact rerank) --------------

  private val PqM = 8
  private val PqK = 16
  private val PqTopK = 10

  /** PQ over the embeddings table with deterministic md5-sampled
    * codebooks: encode → exhaustive ADC top-10 per query → exact rerank
    * column. The oracle resamples the codebooks, re-encodes, and replays
    * the ADC arithmetic in the same summation order; every dot product
    * is sequential on both sides, scores round once (4 dp, the q27
    * precision), and all ranks tie-break on ids.
    */
  def q77PqAdcTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cb = graft.pipeline.Pq.sampleCodebooks(
      emb, "vec_id", "embedding", m = PqM, k = PqK)
    val enc = graft.pipeline.Pq.encode(emb, "vec_id", "embedding", cb)
    graft.pipeline.Pq.adcTopK(
        enc, emb, emb.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", cb, k = PqTopK)
      .orderBy("query_id", "rnk")
  }

  /** Shared oracle prefix replaying the PQ pipeline bit for bit:
    * md5-sampled codebooks, per-subspace argmin encode. Ends with the
    * `codes` CTE; compose further CTEs after it.
    */
  private def pqCtes(m: Int, k: Int): String =
    s"""emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |dims AS (SELECT CAST(len(v) / $m AS INT) AS dsub FROM emb LIMIT 1),
       |ss AS (SELECT unnest(range(0, $m)) AS s),
       |sub AS (
       |  SELECT e.vec_id, ss.s,
       |         list_slice(e.v, ss.s * d.dsub + 1, ss.s * d.dsub + d.dsub) AS xs
       |  FROM emb e CROSS JOIN ss CROSS JOIN dims d
       |),
       |rk AS (
       |  SELECT s, vec_id,
       |         ('0x' || substr(md5(s::VARCHAR || ':' || vec_id::VARCHAR),
       |                         1, 14))::BIGINT AS r
       |  FROM sub
       |),
       |seeds AS (
       |  SELECT s, vec_id,
       |         row_number() OVER (PARTITION BY s ORDER BY r, vec_id) - 1 AS j
       |  FROM rk
       |  QUALIFY j < $k
       |),
       |cb AS (
       |  SELECT sd.s, sd.j, sb.xs AS c,
       |         list_dot_product(sb.xs, sb.xs) AS cc
       |  FROM seeds sd JOIN sub sb ON sb.vec_id = sd.vec_id AND sb.s = sd.s
       |),
       |enc AS (
       |  SELECT sb.vec_id, sb.s, cb.j,
       |         round(list_dot_product(sb.xs, sb.xs)
       |               - 2.0 * list_dot_product(sb.xs, cb.c) + cb.cc, 6) AS d
       |  FROM sub sb JOIN cb ON cb.s = sb.s
       |),
       |codes AS (
       |  SELECT vec_id, s, j FROM enc
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) = 1
       |)""".stripMargin

  val q77Oracle: String = {
    val topk = PqTopK
    s"""WITH ${pqCtes(PqM, PqK)},
       |q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id % 100 = 0),
       |parts AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id, c.s,
       |         list_dot_product(
       |           list_slice(q.qv, c.s * d.dsub + 1, c.s * d.dsub + d.dsub),
       |           cb.c) AS p
       |  FROM codes c
       |  JOIN cb ON cb.s = c.s AND cb.j = c.j
       |  CROSS JOIN q CROSS JOIN dims d
       |  WHERE c.vec_id <> q.query_id
       |),
       |adc AS (
       |  SELECT query_id, neighbor_id,
       |         round(list_reduce(list(p ORDER BY s), (a, b) -> a + b), 4)
       |           AS adc_sim
       |  FROM parts GROUP BY query_id, neighbor_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adc_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_sim DESC, neighbor_id) AS rnk
       |  FROM adc QUALIFY rnk <= $topk
       |)
       |SELECT r.query_id, r.neighbor_id, r.adc_sim,
       |       round(list_dot_product(q.qv, e.v), 4) AS exact_sim,
       |       CAST(r.rnk AS BIGINT) AS rnk
       |FROM ranked r
       |JOIN q ON q.query_id = r.query_id
       |JOIN emb e ON e.vec_id = r.neighbor_id
       |ORDER BY r.query_id, r.rnk""".stripMargin
  }

  private val IvfPqCentroids = 16
  private val IvfPqProbe = 4

  /** IVF-PQ — the production ANN index composition (coarse lists → ADC
    * over m-byte codes → exact rerank of the shortlist). The oracle
    * splices the q35 list-assignment replay onto the shared PQ prefix:
    * every stage — codebook sample, encode, probe selection, candidate
    * restriction, ADC sum, rerank — is value-checked cross-engine; `cid`
    * in the output pins list membership itself.
    */
  def q84IvfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cbooks = graft.pipeline.Pq.sampleCodebooks(
      emb, "vec_id", "embedding", m = PqM, k = PqK)
    graft.pipeline.Pq.ivfPqTopK(
        emb, emb.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", cbooks, k = PqTopK,
        nCentroids = IvfPqCentroids, nProbe = IvfPqProbe)
      .orderBy("query_id", "rnk")
  }

  val q84Oracle: String = {
    val (nc, np, topk) = (IvfPqCentroids, IvfPqProbe, PqTopK)
    s"""WITH ${pqCtes(PqM, PqK)},
       |cents AS (
       |  SELECT vec_id AS cid, v AS centroid FROM emb ORDER BY vec_id LIMIT $nc
       |),
       |cvec AS (SELECT vec_id AS neighbor_id, v AS cv FROM emb),
       |assign0 AS (
       |  SELECT neighbor_id, cid,
       |         row_number() OVER (PARTITION BY neighbor_id
       |           ORDER BY round(list_dot_product(cv, centroid), 6) DESC, cid)
       |           AS rn
       |  FROM cvec, cents
       |),
       |assigned AS (SELECT neighbor_id, cid FROM assign0 WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id % 100 = 0),
       |probes0 AS (
       |  SELECT query_id, qv, cid,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY round(list_dot_product(qv, centroid), 6) DESC, cid)
       |           AS pr
       |  FROM q, cents
       |),
       |probes AS (SELECT query_id, cid FROM probes0 WHERE pr <= $np),
       |cand AS (
       |  SELECT p.query_id, a.neighbor_id, a.cid
       |  FROM assigned a JOIN probes p USING (cid)
       |  WHERE p.query_id <> a.neighbor_id
       |),
       |parts AS (
       |  SELECT cd.query_id, cd.neighbor_id, cd.cid, c.s,
       |         list_dot_product(
       |           list_slice(q.qv, c.s * d.dsub + 1, c.s * d.dsub + d.dsub),
       |           cb.c) AS p
       |  FROM cand cd
       |  JOIN codes c ON c.vec_id = cd.neighbor_id
       |  JOIN cb ON cb.s = c.s AND cb.j = c.j
       |  JOIN q ON q.query_id = cd.query_id
       |  CROSS JOIN dims d
       |),
       |adc AS (
       |  SELECT query_id, neighbor_id, cid,
       |         round(list_reduce(list(p ORDER BY s), (a, b) -> a + b), 4)
       |           AS adc_sim
       |  FROM parts GROUP BY query_id, neighbor_id, cid
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cid, adc_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_sim DESC, neighbor_id) AS rnk
       |  FROM adc QUALIFY rnk <= $topk
       |)
       |SELECT r.query_id, r.neighbor_id, CAST(r.cid AS BIGINT) AS cid,
       |       r.adc_sim,
       |       round(list_dot_product(q.qv, e.v), 4) AS exact_sim,
       |       CAST(r.rnk AS BIGINT) AS rnk
       |FROM ranked r
       |JOIN q ON q.query_id = r.query_id
       |JOIN emb e ON e.vec_id = r.neighbor_id
       |ORDER BY r.query_id, r.rnk""".stripMargin
  }

  // ---- q63: benchmark decontamination -----------------------------------

  private val DecontamN = 8

  /** Fixture: every 53rd document donates a 16-token excerpt (tokens
    * 3..18 of its normalized text) as a "benchmark sample", so those
    * documents — and any exact duplicates of them — must surface as
    * contaminated via shared 8-grams.
    */
  private def benchSamples(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 53 === 0)
      .select(array_join(
        slice(TextAnalysis.tokens(col("text")), 3, 16), " ").as("btext"))

  def q63Decontaminate(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Decontaminate
      .contaminationReport(
        Tables.documents(spark, dir), "doc_id", "text",
        benchSamples(spark, dir), "btext", n = DecontamN)
      .orderBy("doc_id")

  val q63Oracle: String = {
    val n = DecontamN
    s"""WITH w AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS w FROM documents
       |),
       |dg AS (
       |  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
       |         unnest(grams) AS gram
       |  FROM (
       |    SELECT doc_id,
       |           list_distinct(list_transform(
       |             range(1, greatest(len(w) - $n + 2, 1)),
       |             i -> array_to_string(list_slice(w, i, i + ${n - 1}), ' ')))
       |             AS grams
       |    FROM w)
       |),
       |bg AS (
       |  SELECT DISTINCT unnest(list_transform(
       |           range(1, greatest(len(bw) - $n + 2, 1)),
       |           i -> array_to_string(list_slice(bw, i, i + ${n - 1}), ' ')))
       |           AS gram
       |  FROM (
       |    SELECT list_slice(string_split($normSql, ' '), 3, 18) AS bw
       |    FROM documents WHERE doc_id % 53 = 0)
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched, n_grams,
       |       round(count(*)::DOUBLE / n_grams, 4) AS overlap_frac
       |FROM dg JOIN bg USING (gram)
       |GROUP BY doc_id, n_grams
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q90/q91: BPE tokenizer training + corpus encoding --------------

  private val BpeMergeCount = 6

  /** The shared oracle ladder: w0 = word counts with char-spaced symbol
    * spellings (the one corpus-scale step), then per round i: pair
    * counts over the vocab → argmax (count desc, lexicographic ties) →
    * literal-replace merge. Returns the CTE chain text up to
    * `w$BpeMergeCount` / `b1..b$BpeMergeCount`; q90 reads the b-rows,
    * q91 re-encodes the corpus against the final vocab.
    */
  private def bpeLadderSql: String = {
    val w0 =
      s"""w0 AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS f,
         |         trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym
         |  FROM (SELECT unnest(string_split($normSql, ' ')) AS word
         |        FROM documents)
         |  WHERE word <> '' GROUP BY word
         |)""".stripMargin
    val rounds = (1 to BpeMergeCount).map { i =>
      s"""p$i AS (
         |  SELECT s.t[u.i] AS l_sym, s.t[u.i + 1] AS r_sym,
         |         CAST(sum(s.f) AS BIGINT) AS c
         |  FROM (SELECT f, string_split(sym, ' ') AS t FROM w${i - 1}) s,
         |       unnest(range(1, len(s.t))) AS u(i)
         |  GROUP BY l_sym, r_sym
         |),
         |b$i AS (SELECT l_sym, r_sym, c FROM p$i
         |        ORDER BY c DESC, l_sym, r_sym LIMIT 1),
         |-- greedy left-to-right merge (subword-nmt pairing): fold over
         |-- the symbol list, trailing token = pending; a literal replace
         |-- would skip adjacent occurrences sharing the delimiter space
         |w$i AS (
         |  SELECT word, f,
         |         list_reduce(string_split(w.sym, ' '), (acc, x) ->
         |           CASE WHEN (acc = b.l_sym
         |                      OR ends_with(acc, concat(' ', b.l_sym)))
         |                     AND x = b.r_sym
         |                THEN concat(left(acc, len(acc) - len(b.l_sym)),
         |                            b.l_sym, b.r_sym)
         |                ELSE concat(acc, ' ', x) END) AS sym
         |  FROM w${i - 1} w, b$i b
         |)""".stripMargin
    }
    (w0 +: rounds).mkString(",\n")
  }

  /** BPE merge learning ([[graft.pipeline.Bpe]]): the 6 highest-count
    * symbol merges with their selection-time weighted frequencies. The
    * oracle unrolls every round in SQL (the q66 k-means contract) — a
    * divergent pair count, tie-break, or replace semantics in ANY round
    * cascades into every later row.
    */
  def q90BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = graft.pipeline.Bpe
      .wordCounts(Tables.documents(spark, dir), "text")
    graft.pipeline.Bpe.learnMerges(spark, words, BpeMergeCount)
      .toDF()
      .select(col("rank").cast("long").as("rank"), col("l_sym"),
        col("r_sym"), col("pair_count"))
      .orderBy("rank")
  }

  val q90Oracle: String = {
    val rows = (1 to BpeMergeCount).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rank, l_sym, r_sym, c AS pair_count FROM b$i")
    s"""WITH $bpeLadderSql
       |${rows.mkString("", "\nUNION ALL\n", "")}
       |ORDER BY rank""".stripMargin
  }

  /** Corpus encoding with the learned tokenizer: per-source document,
    * word, and encoded-symbol totals. The Spark side is a pure row-local
    * projection (the merge ladder runs inside one codegen'd expression,
    * [[graft.functions.BpeEncodedCount]] — the one-pass 100 TB
    * tokenization shape); the oracle instead joins each word to its
    * FINAL vocab spelling, so the projection must agree with the vocab
    * fixpoint word by word.
    */
  def q91BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = graft.pipeline.Bpe.learnMerges(
      spark, graft.pipeline.Bpe.wordCounts(docs, "text"), BpeMergeCount)
    docs
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(filter(TextAnalysis.tokens(col("text")),
          w => w =!= lit(""))).cast("long")).as("n_words"),
        sum(graft.pipeline.Bpe.encodedSymbolCount(col("text"), merges))
          .as("n_sym"))
      .orderBy("source")
  }

  val q91Oracle: String =
    s"""WITH $bpeLadderSql,
       |dw AS (
       |  SELECT source, word
       |  FROM (SELECT source, unnest(string_split($normSql, ' ')) AS word
       |        FROM documents)
       |  WHERE word <> ''
       |),
       |enc AS (
       |  SELECT dw.source, count(*) AS n_words,
       |         CAST(sum(len(string_split(v.sym, ' '))) AS BIGINT) AS n_sym
       |  FROM dw JOIN w$BpeMergeCount v ON v.word = dw.word
       |  GROUP BY dw.source
       |)
       |SELECT d.source, count(*) AS n_docs,
       |       coalesce(any_value(enc.n_words), 0) AS n_words,
       |       coalesce(any_value(enc.n_sym), 0) AS n_sym
       |FROM documents d LEFT JOIN enc ON enc.source = d.source
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** Piece-level encoding check, word by word: every distinct corpus
    * word encoded by [[graft.functions.BpeEncodePieces]] (the native
    * kernel [[q91BpeEncode]] counts through) against the oracle's vocab
    * FIXPOINT spelling `w6` — the arrays themselves are value-compared,
    * so a kernel that merged in the wrong order, dropped a piece, or
    * mis-spelled a supplementary character fails here even when its
    * counts happen to agree.
    *
    * The registered surface emits the pieces as ONE space-joined string
    * per word (`concat_ws(" ", pieces)`): pieces never contain spaces
    * (words are whitespace-split upstream), so the string determines the
    * array and carries full value strength, while staying hashable by
    * any flat row comparer. PipelineSpec keeps the array-level check.
    */
  def q154BpePieces(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = graft.pipeline.Bpe.learnMerges(
      spark, graft.pipeline.Bpe.wordCounts(docs, "text"), BpeMergeCount)
    graft.pipeline.Bpe.wordCounts(docs, "text")
      .select(col("word"),
        graft.functions.VectorFunctions.bpePieces(array(col("word")),
          merges.map(m => (m.l_sym, m.r_sym))).as("pieces_arr"))
      .select(col("word"),
        concat_ws(" ", col("pieces_arr")).as("pieces"),
        size(col("pieces_arr")).cast("long").as("n_pieces"))
      .orderBy("word")
  }

  val q154Oracle: String =
    s"""WITH $bpeLadderSql
       |SELECT word, sym AS pieces,
       |       CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_pieces
       |FROM w$BpeMergeCount
       |ORDER BY word""".stripMargin

  // ---- q151: batched BPE training at vocabulary scale ------------------

  private val BatchedBpeMerges = 256
  private val BatchedBpeWindow = 256
  // empirical round count at sf0.01 is 12; a 2x overshoot keeps the
  // oracle ahead of the Spark loop under fixture drift or short tail
  // batches — extra rounds are harmless (their selections sort after
  // rank 256 and fall to the final LIMIT; an exhausted round's empty
  // merge list leaves w_i = w_{i-1})
  private val BatchedBpeOracleRounds = 24

  /** Batched BPE training ([[graft.pipeline.Bpe.learnMergesBatched]]) on
    * word-bigram units: 256 merges in ~12 rounds instead of 256
    * sequential driver round-trips — the O(numMerges/batch)-jobs shape a
    * production 32k-merge vocabulary needs. The oracle unrolls every
    * round: pair counts → top-256 candidates → a recursive-CTE greedy
    * scan keeping each candidate whose {l, r, l||r} triple is disjoint
    * from all earlier keeps → the round's merges applied as one nested
    * fold (outer: merge list in batch order; inner: the q90 greedy
    * left-to-right pairing). CTEs are MATERIALIZED: each w_i is consumed
    * twice, and inlining would re-derive the chain exponentially.
    */
  def q151BpeBatched(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val units = graft.pipeline.Bpe
      .bigramUnitCounts(Tables.documents(spark, dir), "text")
    graft.pipeline.Bpe
      .learnMergesBatched(spark, units, BatchedBpeMerges, BatchedBpeWindow)
      .toDF()
      .select(col("rank").cast("long").as("rank"),
        col("round").cast("long").as("round"),
        col("l_sym"), col("r_sym"), col("pair_count"))
      .orderBy("rank")
  }

  val q151Oracle: String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT u, CAST(count(*) AS BIGINT) AS f,
         |         trim(regexp_replace(u, '(.)', '\\1 ', 'g')) AS sym
         |  FROM (
         |    SELECT t[i] || '_' || t[i+1] AS u
         |    FROM (SELECT string_split($normSql, ' ') AS t FROM documents) s,
         |         unnest(range(1, len(t))) AS x(i))
         |  GROUP BY u
         |)""".stripMargin
    val rounds = (1 to BatchedBpeOracleRounds).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT s.t[u.i] AS l_sym, s.t[u.i + 1] AS r_sym,
         |         CAST(sum(s.f) AS BIGINT) AS c
         |  FROM (SELECT f, string_split(sym, ' ') AS t FROM w${i - 1}) s,
         |       unnest(range(1, len(s.t))) AS u(i)
         |  GROUP BY l_sym, r_sym
         |),
         |r$i AS MATERIALIZED (
         |  SELECT l_sym, r_sym, c,
         |         row_number() OVER (ORDER BY c DESC, l_sym, r_sym) AS rn
         |  FROM p$i QUALIFY rn <= $BatchedBpeWindow
         |),
         |g$i(rn, seen, sel, l_sym, r_sym, c) AS (
         |  SELECT CAST(0 AS BIGINT), []::VARCHAR[], false, '', '',
         |         CAST(0 AS BIGINT)
         |  UNION ALL
         |  SELECT r.rn,
         |         CASE WHEN NOT list_has_any(g.seen,
         |                [r.l_sym, r.r_sym, r.l_sym || r.r_sym])
         |              THEN g.seen || [r.l_sym, r.r_sym, r.l_sym || r.r_sym]
         |              ELSE g.seen END,
         |         NOT list_has_any(g.seen, [r.l_sym, r.r_sym,
         |                                   r.l_sym || r.r_sym]),
         |         r.l_sym, r.r_sym, r.c
         |  FROM g$i g JOIN r$i r ON r.rn = g.rn + 1
         |),
         |s$i AS MATERIALIZED (
         |  SELECT l_sym, r_sym, c, row_number() OVER (ORDER BY rn) AS k
         |  FROM g$i WHERE sel
         |),
         |m$i AS MATERIALIZED (
         |  SELECT coalesce(list(l_sym || chr(31) || r_sym ORDER BY k), [])
         |         AS ms
         |  FROM s$i
         |),
         |w$i AS MATERIALIZED (
         |  SELECT w.u, w.f,
         |         list_reduce(list_prepend(w.sym, m.ms), (acc, x) ->
         |           list_reduce(string_split(acc, ' '), (a, t) ->
         |             CASE WHEN (a = split_part(x, chr(31), 1)
         |                        OR ends_with(a,
         |                             ' ' || split_part(x, chr(31), 1)))
         |                       AND t = split_part(x, chr(31), 2)
         |                  THEN concat(
         |                    left(a, len(a) - len(split_part(x, chr(31), 1))),
         |                    split_part(x, chr(31), 1),
         |                    split_part(x, chr(31), 2))
         |                  ELSE a || ' ' || t END)) AS sym
         |  FROM w${i - 1} w, m$i m
         |)""".stripMargin
    }
    val selUnion = (1 to BatchedBpeOracleRounds)
      .map(i =>
        s"SELECT CAST($i AS BIGINT) AS round, k, l_sym, r_sym, c FROM s$i")
      .mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE $w0,
       |${rounds.mkString(",\n")},
       |allsel AS ($selUnion)
       |SELECT row_number() OVER (ORDER BY round, k) AS rank, round, l_sym,
       |       r_sym, c AS pair_count
       |FROM allsel ORDER BY round, k LIMIT $BatchedBpeMerges""".stripMargin
  }

  // ---- q87: bloom-prefiltered decontamination -------------------------

  private val BloomDecontamN = 6

  /** q63's exact check through the bloom-prefilter path
    * ([[graft.pipeline.Decontaminate.contaminationReportBloom]]): the
    * benchmark grams fold into one serialized bloom filter probed inside
    * the corpus scan; only admitted grams reach the exact confirm join.
    * No false negatives → the oracle is the same exact SQL as q63's
    * shape (different fixture: every 31st doc donates, 6-grams).
    */
  private def bloomBenchSamples(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 31 === 0)
      .select(array_join(
        slice(TextAnalysis.tokens(col("text")), 3, 16), " ").as("btext"))

  def q87BloomDecontaminate(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Decontaminate
      .contaminationReportBloom(
        Tables.documents(spark, dir), "doc_id", "text",
        bloomBenchSamples(spark, dir), "btext", n = BloomDecontamN,
        fpp = 0.01)
      .orderBy("doc_id")

  val q87Oracle: String = {
    val n = BloomDecontamN
    s"""WITH w AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS w FROM documents
       |),
       |dg AS (
       |  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
       |         unnest(grams) AS gram
       |  FROM (
       |    SELECT doc_id,
       |           list_distinct(list_transform(
       |             range(1, greatest(len(w) - $n + 2, 1)),
       |             i -> array_to_string(list_slice(w, i, i + ${n - 1}), ' ')))
       |             AS grams
       |    FROM w)
       |),
       |bg AS (
       |  SELECT DISTINCT unnest(list_transform(
       |           range(1, greatest(len(bw) - $n + 2, 1)),
       |           i -> array_to_string(list_slice(bw, i, i + ${n - 1}), ' ')))
       |           AS gram
       |  FROM (
       |    SELECT list_slice(string_split($normSql, ' '), 3, 18) AS bw
       |    FROM documents WHERE doc_id % 31 = 0)
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched, n_grams,
       |       round(count(*)::DOUBLE / n_grams, 4) AS overlap_frac
       |FROM dg JOIN bg USING (gram)
       |GROUP BY doc_id, n_grams
       |ORDER BY doc_id""".stripMargin
  }

  /** Hashed linear quality classifier (fastText-style): one codegen'd
    * projection — tokenize, hash to feature slot, md5-derived weight,
    * sigmoid of the mean. The oracle regenerates the same hashing trick
    * with list_reduce (fold from 0.0 in token order = Spark's aggregate),
    * so scores are bit-comparable at 4 decimals.
    */
  def q68QualityClassifier(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        graft.pipeline.TextAnalysis
          .hashedLinearScore(col("text"), buckets = 4096, seed = "qc")
          .as("score"))
      .withColumn("keep", (col("score") >= 0.5).cast("int"))
      .orderBy("doc_id")

  val q68Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents
       |),
       |s AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(toks, tk ->
       |      ('0x' || substr(md5('qc:' ||
       |         (('0x' || substr(md5(tk), 1, 14))::BIGINT % 4096)::VARCHAR),
       |         1, 14))::BIGINT / 72057594037927936.0 - 0.5)),
       |      (a, x) -> a + x) / len(toks) AS z
       |  FROM t
       |)
       |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS score,
       |       CAST(round(1.0 / (1.0 + exp(-z)), 4) >= 0.5 AS INT) AS keep
       |FROM s ORDER BY doc_id""".stripMargin

  // ---- q109: unicode NFC canonicalization -----------------------------

  /** [[graft.functions.NfcNormalize]] — the custom codegen'd Catalyst
    * expression for Unicode canonical composition (Spark has no builtin;
    * a UDF would break whole-stage codegen). Every 13th document gets a
    * DECOMPOSED suffix planted (e + combining acute, i + combining
    * diaeresis — the "same text, different bytes" situation crawls
    * produce); the output pins the codepoint-length contraction and the
    * md5 of the normalized bytes, so the oracle's `nfc_normalize`
    * (utf8proc) must agree with the JDK normalizer character for
    * character.
    */
  def q109NfcNormalize(spark: SparkSession, dir: String): DataFrame = {
    // decomposed on purpose: 'e' + U+0301, 'i' + U+0308 — NFC
    // composes both, contracting the codepoint length by 2
    val suffix = " cafe\u0301 nai\u0308ve"
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 13 === 0)
      .select(col("doc_id"), concat(col("text"), lit(suffix)).as("t2"))
      .select(
        col("doc_id"),
        length(col("t2")).cast("long").as("len_raw"),
        length(graft.functions.VectorFunctions.nfcNormalize(col("t2")))
          .cast("long").as("len_nfc"),
        md5(graft.functions.VectorFunctions.nfcNormalize(col("t2"))
          .cast("binary")).as("nfc_md5"))
      .orderBy("doc_id")
  }

  val q109Oracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         text || ' caf' || chr(101) || chr(769)
      |              || ' na' || chr(105) || chr(776) || 've' AS t2
      |  FROM documents WHERE doc_id % 13 = 0
      |)
      |SELECT doc_id,
      |       length(t2) AS len_raw,
      |       length(nfc_normalize(t2)) AS len_nfc,
      |       md5(nfc_normalize(t2)) AS nfc_md5
      |FROM t ORDER BY doc_id""".stripMargin

  // ---- q111: corrupt-JSONL ingest (schema-on-read robustness) ---------

  /** Shared CTE (valid in BOTH dialects): each document rendered as a
    * JSONL line, every 17th truncated mid-string — the malformed-line
    * reality of any crawled JSONL feed.
    */
  val jsonLinesSql: String =
    """j AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 17 = 0
      |              THEN substr('{"id":' || doc_id || ',"lang":"' || lang
      |                     || '","nc":' || n_chars || '}', 1, 9)
      |              ELSE '{"id":' || doc_id || ',"lang":"' || lang
      |                     || '","nc":' || n_chars || '}' END AS line
      |  FROM documents
      |)""".stripMargin

  /** Schema-on-read JSONL ingest with dead-letter accounting:
    * `from_json` under PERMISSIVE semantics nulls the struct for a
    * malformed line instead of failing the job — corrupt lines land in
    * the NULL-lang bucket with `n_ok = 0`, clean lines must parse every
    * field exactly (the per-lang `sum_nc` pins the extracted values,
    * not just the counts). The oracle replays the same lines through
    * DuckDB's `json_valid`/`json_extract`.
    */
  def q111JsonlIngest(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    val lines = spark.sql(s"WITH $jsonLinesSql SELECT * FROM j")
    val parsed = lines.withColumn("p",
      from_json(col("line"), org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, lang STRING, nc BIGINT")))
    parsed
      .groupBy(col("p.lang").as("lang"))
      .agg(
        count(lit(1)).as("n"),
        // PERMISSIVE from_json yields an all-null-FIELDS struct for a
        // malformed line (not a null struct) — probe a field every
        // valid line carries
        sum(when(col("p.id").isNotNull, 1L).otherwise(0L)).as("n_ok"),
        sum(coalesce(col("p.nc"), lit(0L))).as("sum_nc"))
      .orderBy(asc_nulls_first("lang"))
  }

  // concatenated, NOT re-interpolated under another stripMargin: the
  // CTE's continuation lines start with `||`, which a second strip
  // would truncate to `|` (the q14 lesson)
  val q111Oracle: String =
    "WITH " + jsonLinesSql + "\n" +
      """SELECT CASE WHEN json_valid(line)
        |            THEN json_extract_string(line, '$.lang') END AS lang,
        |       count(*) AS n,
        |       CAST(sum(CASE WHEN json_valid(line) THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_ok,
        |       CAST(sum(CASE WHEN json_valid(line)
        |                     THEN CAST(json_extract(line, '$.nc') AS BIGINT)
        |                     ELSE 0 END) AS BIGINT) AS sum_nc
        |FROM j GROUP BY 1 ORDER BY lang NULLS FIRST""".stripMargin

  // ---- q112: Aho–Corasick blocklist phrase scan -----------------------

  /** Overlap-heavy on purpose: prefixes of each other and shared
    * suffixes, so a failure-link or output-inheritance bug changes
    * counts.
    */
  private val Blocklist =
    Seq("an", "and", "nd", "the", "data", "of the", "tion", "zqx")

  /** [[graft.functions.CountPhrases]] — distinct blocklist phrases per
    * document in ONE byte-level Aho–Corasick pass (O(|text|) per row
    * regardless of dictionary size; the naive `filter(dict, contains)`
    * spelling scans the text once per phrase with an interpreted
    * lambda). Value-level per document: the oracle recomputes every
    * count with per-phrase `contains`, so any automaton bug shifts
    * rows.
    */
  def q112PhraseScan(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.VectorFunctions
          .countPhrases(lower(col("text")), Blocklist).as("n_terms"))
      .orderBy("doc_id")

  val q112Oracle: String = {
    val list = Blocklist.map(p => s"'$p'").mkString(", ")
    s"""SELECT doc_id,
       |       CAST(len(list_filter([$list],
       |                            p -> contains(lower(text), p)))
       |            AS INT) AS n_terms
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cleaning_funnel" -> (q40CleaningFunnel _),
    "q68_quality_classifier" -> (q68QualityClassifier _),
    "q109_nfc_normalize" -> (q109NfcNormalize _),
    "q111_jsonl_ingest" -> (q111JsonlIngest _),
    "q112_phrase_scan" -> (q112PhraseScan _),
    "q62_boilerplate_lines" -> (q62Boilerplate _),
    "q63_decontaminate" -> (q63Decontaminate _),
    "q87_bloom_decontaminate" -> (q87BloomDecontaminate _),
    "q90_bpe_merges" -> (q90BpeMerges _),
    "q91_bpe_encode" -> (q91BpeEncode _),
    "q154_bpe_pieces" -> (q154BpePieces _),
    "q151_bpe_batched" -> (q151BpeBatched _),
    "q72_paragraph_dedup" -> (q72ParagraphDedup _),
    "q75_substring_dedup" -> (q75SubstringDedup _),
    "q76_dsir_weights" -> (q76DsirWeights _),
    "q77_pq_adc_topk" -> (q77PqAdcTopK _),
    "q84_ivfpq_topk" -> (q84IvfPqTopK _),
    "q20_token_stats" -> (q20TokenStats _),
    "q21_quality_score" -> (q21Quality _),
    "q22_lang_id" -> (q22LangId _),
    "q23_fingerprint_dedup" -> (q23Fingerprints _),
    "q24_ngram_jaccard_pairs" -> (q24JaccardPairs _),
    "q25_minhash_lsh_pairs" -> (q25MinhashLsh _),
    "q26_simhash" -> (q26Simhash _),
    "q47_simhash_pairs" -> (q47SimhashPairs _),
    "q48_length_quantiles" -> (q48LengthQuantiles _),
    "q70_approx_quantiles" -> (q70ApproxQuantiles _)
  )

  def oracles: Map[String, String] = Map(
    "q40_cleaning_funnel" -> q40Oracle,
    "q68_quality_classifier" -> q68Oracle,
    "q109_nfc_normalize" -> q109Oracle,
    "q111_jsonl_ingest" -> q111Oracle,
    "q112_phrase_scan" -> q112Oracle,
    "q62_boilerplate_lines" -> q62Oracle,
    "q63_decontaminate" -> q63Oracle,
    "q87_bloom_decontaminate" -> q87Oracle,
    "q90_bpe_merges" -> q90Oracle,
    "q91_bpe_encode" -> q91Oracle,
    "q154_bpe_pieces" -> q154Oracle,
    "q151_bpe_batched" -> q151Oracle,
    "q72_paragraph_dedup" -> q72Oracle,
    "q75_substring_dedup" -> q75Oracle,
    "q76_dsir_weights" -> q76Oracle,
    "q77_pq_adc_topk" -> q77Oracle,
    "q84_ivfpq_topk" -> q84Oracle,
    "q20_token_stats" -> q20Oracle,
    "q21_quality_score" -> q21Oracle,
    "q22_lang_id" -> q22Oracle,
    "q23_fingerprint_dedup" -> q23Oracle,
    "q24_ngram_jaccard_pairs" -> q24Oracle,
    "q25_minhash_lsh_pairs" -> q25Oracle,
    "q26_simhash" -> q26Oracle,
    "q47_simhash_pairs" -> q47Oracle,
    "q48_length_quantiles" -> q48Oracle,
    "q70_approx_quantiles" -> q70Oracle
  )
}
