package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis.tokens

/** TF-IDF sparse document vectors and cosine similarity over them — the
  * SPARSE counterpart to the dense-embedding path in [[Similarity]]:
  * no model, vocabulary-sized dimensions, exact.
  *
  * Pair generation follows the inverted-index shape, never all-pairs:
  * documents meet only through tokens they share (self-join keyed on the
  * token), tokens shared by more than `maxDocFreq` documents are dropped
  * first (they carry ~zero idf weight AND would drive the join
  * quadratic), and every aggregation is map-side combinable. This is the
  * linear sparse-similarity plan that survives corpus-scale inputs.
  */
object TfIdf {

  /** One row per (id, token) with the term/document frequencies, the
    * tf-idf weight, and the document's L2 norm over its weights.
    * tf = in-document count, idf = ln(N / df) (natural log, no
    * smoothing — mirrored by the DuckDB oracle).
    */
  def weights(
      docs: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Long): DataFrame = {
    // N enters the plan as a broadcast one-row aggregate, not an eager
    // docs.count() — building the DataFrame must not run a Spark job,
    // and the corpus is scanned once per branch, not once extra
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") <= maxDocFreq)
    val w = tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("weight", col("tf") * log(col("__n") / col("df_count")))
      .drop("__n")
    val norm = Window.partitionBy(idCol)
    w.withColumn("doc_norm", sqrt(sum(col("weight") * col("weight")).over(norm)))
      .select(col(idCol), col("token"), col("tf"), col("df_count"),
        col("weight"), col("doc_norm"))
  }

  /** Okapi BM25 retrieval scores (Robertson/Sparck Jones; the lexical
    * ranking behind RAG retrieval and search-index curation) for a small
    * query set against the corpus:
    *
    *   score(d, q) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
    *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (the Lucene form)
    *
    * Scale shape: an inverted-index equi-join — corpus (id, token, tf)
    * rows meet the BROADCAST exploded query terms on the token, followed
    * by one map-side-combinable sum per (query, doc). N/avgdl enter as a
    * broadcast one-row aggregate; nothing all-pairs, nothing collected.
    * Top-k per query via the rank window (WindowGroupLimit bounds state
    * map-side).
    *
    * `queries` needs (queryIdCol, queryTextCol); tokenization matches the
    * corpus side. Scores are rounded to 4 before ranking so the ranking
    * is engine-reproducible (ties break on doc id).
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // pinned: consumed twice below (qTokens restriction + the scored
    // join) — each broadcast build otherwise re-scans the query source
    // (a corpus slice in the registered queries)
    val qTerms = graft.util.CacheSlots.rotateOne("tfidf.bm25QTerms",
      queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(tokens(col(queryTextCol)))).as("token")))
    val qTokens = qTerms.select("token").distinct()
    // restrict the inverted index to query tokens BEFORE any aggregation:
    // df over the restricted rows still counts every document containing
    // the token (restriction is on the token, not the doc), so both the
    // tf rows and the df table stay query-vocabulary-sized — the full
    // corpus vocabulary never aggregates or joins.
    //
    // ONE corpus tokenize pass (r16): `dl` rides the exploded rows
    // (first() per group — constant per document) instead of a separate
    // size(tokens) frame joined on the id, which cost a second corpus
    // tokenize AND an id-keyed exchange of both sides. tokens() of the
    // empty normalized string is [""] (split semantics, mirrored by the
    // oracle), so dl here equals the old size(tokens) for every doc.
    // Pinned: the df build and the scored join both consume tf; uncached
    // each would re-run the corpus scan + tokenize + explode.
    val tf = graft.util.CacheSlots.rotateOne("tfidf.bm25Tf",
      docs
        .select(col(idCol), tokens(col(textCol)).as("__w"))
        .select(col(idCol), size(col("__w")).cast("double").as("dl"),
          explode(col("__w")).as("token"))
        .join(broadcast(qTokens), Seq("token"))
        .groupBy(idCol, "token")
        .agg(count(lit(1)).as("tf"), first("dl").as("dl")))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(size(tokens(col(textCol)))).as("__avgdl"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df_count"))
    val idf = log(lit(1.0) +
      (col("__n") - col("df_count") + 0.5) / (col("df_count") + 0.5))
    val tfNorm = (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("__avgdl")))
    val scored = tf
      .join(broadcast(qTerms), Seq("token"))
      .join(broadcast(df), Seq("token"))
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(idf * tfNorm), 4).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score"),
        col("rank").cast("long").as("rank"))
  }

  /** Cosine-similar document pairs above `minSim`: inverted-index
    * self-join on the token, one pair-keyed aggregation.
    */
  def cosinePairs(
      docs: DataFrame, idCol: String, textCol: String,
      minSim: Double, maxDocFreq: Long = 100): DataFrame = {
    val w = weights(docs, idCol, textCol, maxDocFreq)
    val a = w.select(col("token"), col(idCol).as("id_a"),
      col("weight").as("w_a"), col("doc_norm").as("n_a"))
    val b = w.select(col("token"), col(idCol).as("id_b"),
      col("weight").as("w_b"), col("doc_norm").as("n_b"))
    a.join(b, Seq("token"))
      .filter(col("id_a") < col("id_b"))
      // a zero-norm document (every kept token at df = N ⇒ weight 0)
      // is similar to nothing; without the filter the ratio is an ANSI
      // DIVIDE_BY_ZERO crash, not a NaN
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .groupBy("id_a", "id_b")
      .agg((sum(col("w_a") * col("w_b")) /
        (first("n_a") * first("n_b"))).as("sim"))
      .filter(col("sim") >= minSim)
  }
}
