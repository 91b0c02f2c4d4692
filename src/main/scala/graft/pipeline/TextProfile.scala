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
      minTokens: Int = 10): DataFrame =
    // one scan: the per-doc trigram fraction is carried through the
    // bigram explode (constant within the group, recovered with first())
    // instead of re-tokenizing in a second branch and joining back
    docs
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= minTokens)
      .select(col(idCol), dupNgramFrac(col("__w"), 3).as("__dup3"),
        explode(wordNgrams(col("__w"), 2)).as("__g"))
      .groupBy(idCol, "__g")
      .agg(count(lit(1)).as("__c"), first("__dup3").as("__d"))
      .groupBy(idCol)
      .agg(max(col("__c")).as("__mx"), sum(col("__c")).as("__tot"),
        first("__d").as("dup_trigram_frac"))
      .select(col(idCol),
        col("dup_trigram_frac"),
        (col("__mx").cast("double") / col("__tot")).as("top_bigram_frac"))

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
