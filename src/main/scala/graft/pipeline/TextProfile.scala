package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis.{dupNgramFrac, tokens, wordNgrams}

/** Corpus profiling operators that need a corpus-level aggregation (the
  * Column-only signals live in [[TextAnalysis]]): intra-document
  * repetition and token entropy. Both follow the explode → hash-aggregate
  * shape — map-side combinable, one shuffle keyed on (doc, gram), linear
  * in total token count — rather than per-row O(n^2) lambda scans.
  */
object TextProfile {

  /** Per-document repetition profile: `dup_trigram_frac` (fraction of
    * word 3-grams that repeat an earlier one) and `top_bigram_frac`
    * (share of the most frequent word 2-gram among all 2-grams) — the
    * Gopher-style degenerate-text signals. Documents with fewer than
    * `minTokens` tokens are skipped (their fractions are noise).
    */
  def repetitionProfile(
      docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10): DataFrame = {
    // two branches joined on the id, NOT one select carrying the scalar
    // through the explode: Catalyst relocates scalar projections across
    // Generate, so a dup3 column computed "before" an explode in the
    // same select chain re-evaluates PER BIGRAM ROW (measured 16x worse
    // corpus-wide). The price here is re-tokenizing once per branch —
    // O(rows), not O(exploded rows).
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= minTokens)
    val top = base
      .select(col(idCol), explode(wordNgrams(col("__w"), 2)).as("__g"))
      .groupBy(idCol, "__g").agg(count(lit(1)).as("__c"))
      .groupBy(idCol).agg(
        max(col("__c")).as("__mx"), sum(col("__c")).as("__tot"))
    base.withColumn("dup_trigram_frac", dupNgramFrac(col("__w"), 3))
      .join(top, Seq(idCol))
      .select(col(idCol),
        col("dup_trigram_frac"),
        (col("__mx").cast("double") / col("__tot")).as("top_bigram_frac"))
  }

  /** Per-document bigram language-model score — the CCNet-style fluency
    * filter: train bigram statistics on the corpus itself
    * (`P(w2|w1) = c(w1 w2) / c(w1 ·)`) and score each document by the
    * mean log-probability of its bigrams. Repetitive or formulaic text
    * scores high, out-of-distribution gibberish low; both tails are
    * filter candidates. Documents with fewer than two tokens produce no
    * bigrams and no row.
    *
    * Shapes: one bigram explode feeding two map-side-combinable count
    * aggregations, then an inverted-index equi-join of the doc bigrams
    * back to the counts — linear in total bigram count, no all-pairs
    * stage, the same join discipline as [[TfIdf]].
    */
  def bigramLmScores(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(wordNgrams(tokens(col(textCol)), 2)).as("__g"))
    val cb = grams.groupBy("__g").agg(count(lit(1)).as("__c2"))
    val cu = grams
      .select(substring_index(col("__g"), " ", 1).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__c1"))
    grams
      .withColumn("__w1", substring_index(col("__g"), " ", 1))
      .join(cb, Seq("__g")).join(cu, Seq("__w1"))
      .groupBy(idCol)
      .agg(
        avg(log(col("__c2").cast("double") / col("__c1"))).as("lm_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Per-document INTERPOLATED KNESER-NEY bigram score — the smoothed
    * upgrade of [[bigramLmScores]] (CCNet's actual filter is a smoothed
    * KenLM model; raw MLE assigns unseen-context bigrams probability
    * zero and over-trusts hapax counts). Absolute discounting with
    * continuation back-off:
    *
    *   P_KN(w2|w1) = max(c(w1 w2) − D, 0) / c(w1 ·)
    *               + (D · N1+(w1 ·) / c(w1 ·)) · (N1+(· w2) / B)
    *
    * where N1+(w1 ·) counts distinct continuations of w1, N1+(· w2)
    * counts distinct contexts w2 follows (the "how many places has this
    * word appeared" continuation probability), and B is the number of
    * distinct bigram types. Every quantity is a map-side-combinable
    * count over the bigram-type table (itself one combinable agg over
    * the exploded grams), so the whole fit is three hash aggregations +
    * one single-row broadcast — linear in corpus token count, no
    * windows, no all-pairs. Docs with fewer than two tokens emit no row.
    */
  def knBigramLmScores(
      docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(wordNgrams(tokens(col(textCol)), 2)).as("__g"))
    val cb = grams.groupBy("__g").agg(count(lit(1)).as("__c2"))
      .withColumn("__w1", substring_index(col("__g"), " ", 1))
      .withColumn("__w2", substring_index(col("__g"), " ", -1))
    val byW1 = cb.groupBy("__w1")
      .agg(sum("__c2").as("__c1"), count(lit(1)).as("__n1f"))
    val byW2 = cb.groupBy("__w2").agg(count(lit(1)).as("__n1p"))
    val tot = cb.agg(count(lit(1)).as("__B"))
    val probs = cb
      .join(byW1, Seq("__w1")).join(byW2, Seq("__w2"))
      .crossJoin(broadcast(tot))
      .select(col("__g"),
        (greatest(col("__c2").cast("double") - discount, lit(0.0))
            / col("__c1")
          + (lit(discount) * col("__n1f") / col("__c1"))
            * (col("__n1p").cast("double") / col("__B"))).as("__p"))
    grams.join(probs, Seq("__g"))
      .groupBy(idCol)
      .agg(
        avg(log(col("__p"))).as("kn_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Per-document Shannon entropy (bits/token) over the token frequency
    * distribution: `log2(n) - sum(c*log2(c))/n`. Low entropy = looping
    * or template text; pairs with [[repetitionProfile]] as a quality
    * gate.
    */
  def tokenEntropy(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .groupBy(idCol, "__t").agg(count(lit(1)).as("__c"))
      .groupBy(idCol).agg(
        sum("__c").as("n_tokens"),
        (log2(sum("__c")) -
          sum(col("__c") * log2(col("__c"))) / sum("__c")).as("entropy"))
}
