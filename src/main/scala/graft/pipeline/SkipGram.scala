package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skip-gram training-pair generation with deterministic negative
  * sampling — the word2vec/StarSpace data-prep stage (Mikolov 2013):
  * every (center, context) pair within a ±`window` token offset becomes
  * a positive example, and each positive draws `k` "negative" vocabulary
  * ids from an md5 hash of (center, context, draw) — no RNG state, so
  * the emitted training set is reproducible run-to-run and replayable by
  * an oracle (the same determinism argument as the corpus hash-split).
  *
  * Scale shape: pair fan-out is a row-local higher-order projection over
  * one tokenization (posexplode of per-position context slices — no
  * self-join of the token table on doc id, which would shuffle the
  * corpus); the vocabulary is one distinct + row_number pass whose
  * result is broadcast back for negative-id resolution. Corpus text is
  * scanned once.
  */
object SkipGram {

  /** Deterministic vocabulary: distinct tokens of the corpus, ids
    * assigned in lexicographic order (1-based).
    *
    * Ids come from `zipWithIndex` over the range-partitioned sort — a
    * partition-local count pass plus offset arithmetic — NOT from
    * `row_number` over a global (partitionBy-less) window, which would
    * move the entire distinct-token table through ONE task: a
    * corpus-scale vocabulary is hundreds of millions of tokens, and the
    * single-partition sort is exactly the spill/OOM this file's "corpus
    * text is scanned once" contract forbids.
    */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .distinct()
      .orderBy("token")
      .as[String].rdd
      .zipWithIndex()
      .map { case (t, i) => (t, i + 1L) }
      .toDF("token", "vocab_id")
  }

  /** (center, context) positives within ±`window`, order-preserving.
    * Pure row-local fan-out over ONE tokenization (Let-bound): per
    * position, the in-bounds offsets become structs and a single explode
    * emits the pairs — no self-join of an exploded token table (which
    * would shuffle the corpus on doc id). Emits
    * (doc col, center, context, offset).
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val offsets = (-window to window).filter(_ != 0)
    val pairsOf = graft.functions.Let.let(
      TextAnalysis.tokens(col(textCol)), t =>
        flatten(transform(sequence(lit(1), size(t)), i =>
          filter(
            transform(array(offsets.map(lit): _*), o =>
              when(i + o >= 1 && i + o <= size(t),
                struct(
                  element_at(t, i).as("center"),
                  element_at(t, i + o).as("context"),
                  o.as("offset")))
                .otherwise(lit(null))),
            x => x.isNotNull))))
    docs
      .select(col(idCol), explode(pairsOf).as("p"))
      .select(col(idCol), col("p.center"), col("p.context"), col("p.offset"))
  }

  /** `k` deterministic negative vocab ids per positive:
    * `1 + md5(center|context|j) mod |V|` — resolved against the
    * broadcast vocabulary. Output adds (draw, neg_id).
    */
  def withNegatives(positives: DataFrame, vocab: DataFrame,
      k: Int): DataFrame = {
    val vSize = vocab.count()
    positives
      .withColumn("draw", explode(array((0 until k).map(lit): _*)))
      .withColumn("neg_id",
        (conv(substring(md5(concat_ws("|",
          col("center"), col("context"), col("draw"))), 1, 14), 16, 10)
          .cast("long") % vSize) + 1)
  }
}
