package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide exact substring deduplication (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better": remove
  * long token spans that occur more than once in the corpus, keeping one
  * copy). The reference implementation builds a corpus suffix array —
  * inherently single-machine; the standard distributed approximation is
  * fixed-length window matching: a token is a duplicate iff it is
  * covered by some length-`l` token window whose content occurs earlier
  * in the corpus (an exact-substring repeat of length >= l always
  * contains such a window, so recall on >=l-token repeats is total;
  * spans shorter than l are below the dedup threshold by definition).
  *
  * Keep-first semantics match [[ParagraphDedup]]: of all occurrences of
  * a repeated window, the minimum (doc, offset) survives — exactly one
  * copy of each repeated span remains in the corpus.
  *
  * Shape at 100 TB: window digests are built row-local (one 16-byte md5
  * per token position — the [[ParagraphDedup]] digest trade-off, 2^64
  * birthday bound); keep-first is a map-side-combinable
  * `min(struct(doc, off))` agg on the digest — NOT a window function, so
  * a span repeated 10M times collapses inside partial aggregation; the
  * join-back is an equi-join on the digest (AQE skew-split handles hot
  * digests); coverage expansion and token reassembly shuffle once each
  * on doc id. Nothing sorts the corpus globally and nothing is
  * quadratic.
  */
object SubstringDedup {

  /** Remove every token covered by a non-first occurrence of a repeated
    * `l`-token window; surviving tokens reassemble in order.
    *
    * Returns one row per input document:
    * (idCol, n_tokens_before, n_tokens_after, text_dedup).
    */
  def dedupSubstrings(
      docs: DataFrame, idCol: String, textCol: String, l: Int = 50): DataFrame = {
    require(l >= 2, s"window length must be >= 2, got $l")
    val toks = docs.select(
      col(idCol).as("__sd_doc"),
      TextAnalysis.tokens(col(textCol)).as("__sd_w"))

    // one digest per window start (0-based), row-local
    val wins = when(size(col("__sd_w")) >= l,
      transform(sequence(lit(0), size(col("__sd_w")) - l),
        i => md5(array_join(slice(col("__sd_w"), i + 1, lit(l)), " "))))
      .otherwise(array().cast("array<string>"))
    val occ = toks.select(
      col("__sd_doc"), posexplode(wins).as(Seq("__sd_off", "__sd_g")))

    // keep-first: combinable min over (doc, off) per digest
    val firsts = occ.groupBy("__sd_g")
      .agg(min(struct(col("__sd_doc").as("d"), col("__sd_off").as("o")))
        .as("__sd_first"))

    // later occurrences expand to their covered token positions
    val covered = occ.join(firsts, Seq("__sd_g"))
      .filter(struct(col("__sd_doc").as("d"), col("__sd_off").as("o"))
        =!= col("__sd_first"))
      .select(col("__sd_doc"),
        explode(sequence(col("__sd_off"), col("__sd_off") + (l - 1)))
          .as("__sd_pos"))
      .distinct()

    val tokPos = toks.select(
      col("__sd_doc"), posexplode(col("__sd_w")).as(Seq("__sd_pos", "__sd_tok")))
    val rebuilt = tokPos
      .join(covered, Seq("__sd_doc", "__sd_pos"), "left_anti")
      .groupBy("__sd_doc")
      .agg(
        count(lit(1)).as("n_tokens_after"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__sd_pos"), col("__sd_tok")))),
            x => x("__sd_tok")),
          " ").as("text_dedup"))

    // left join keeps documents whose every token was a later duplicate
    docs
      .select(col(idCol).as("__sd_doc"),
        size(TextAnalysis.tokens(col(textCol))).cast("long")
          .as("n_tokens_before"))
      .join(rebuilt, Seq("__sd_doc"), "left")
      .select(
        col("__sd_doc").as(idCol),
        col("n_tokens_before"),
        coalesce(col("n_tokens_after"), lit(0L)).as("n_tokens_after"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }
}
