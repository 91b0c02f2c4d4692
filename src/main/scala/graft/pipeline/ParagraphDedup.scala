package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide exact paragraph deduplication (the RefinedWeb / Dolma
  * "exact duplicated paragraph" step): every paragraph that occurs more
  * than once in the corpus keeps ONLY its first occurrence in corpus
  * order — (doc id, position) lexicographic — and every later occurrence
  * is dropped from its document; surviving paragraphs reassemble in
  * their original order.
  *
  * Contrast with [[Boilerplate]]: boilerplate removal strips a high-df
  * line EVERYWHERE (first occurrence included) and thresholds per
  * source; this is order-aware global dedup — exactly one survivor per
  * distinct paragraph, no frequency threshold.
  *
  * Shape at 100 TB: posexplode, then a map-side-combinable
  * min(struct(doc, pos)) aggregate grouped on a 128-bit paragraph
  * digest — NOT a row_number window: a paragraph duplicated 10M times
  * collapses to one row per map task inside the partial aggregate,
  * where a window would sort all 10M occurrences in one partition.
  * The digest keeps the agg and the join-back keys narrow (16 bytes
  * instead of the paragraph text); the exploded side shuffles once for
  * the join and once for the reassembly groupBy. Hot keys (the
  * duplicated paragraphs) exist only inside the combinable agg and as
  * probe-side join keys — AQE's skew split handles the join residue.
  */
object ParagraphDedup {

  /** Drop every non-first occurrence of each duplicated paragraph.
    * Paragraphs shorter than `minChars` are exempt (always kept):
    * production pipelines don't dedup "", list bullets, or one-word
    * lines, whose global collision rate is semantic noise.
    *
    * `sep` is a LITERAL separator (quoted before the regex split, so a
    * metacharacter separator like "." or "|" splits and reassembles with
    * identical semantics). Keying on a 128-bit md5 digest accepts the
    * standard 2^64 birthday bound: a digest collision would merge two
    * distinct paragraphs — the industry trade-off every digest-keyed
    * dedup makes.
    *
    * Returns one row per input document:
    * (idCol, n_paras_before, n_paras_after, text_clean).
    */
  def dedupParagraphs(
      docs: DataFrame, idCol: String, textCol: String,
      minChars: Int = 0, sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val paras = docs.select(
      col(idCol).as("__pd_doc"),
      posexplode(split(col(textCol), sepRe)).as(Seq("__pd_pos", "__pd_para")))

    val dedupable = paras.filter(length(col("__pd_para")) >= minChars)
    val firsts = dedupable
      .groupBy(md5(col("__pd_para")).as("__pd_key"))
      .agg(min(struct(col("__pd_doc"), col("__pd_pos"))).as("__pd_first"))

    // exempt (short) paragraphs skip the join entirely — they carry no
    // key and always survive
    val kept = paras
      .join(firsts, md5(col("__pd_para")) === col("__pd_key"), "left")
      .filter(col("__pd_key").isNull ||
        struct(col("__pd_doc"), col("__pd_pos")) === col("__pd_first"))

    val reassembled = kept
      .groupBy("__pd_doc")
      .agg(
        count(lit(1)).as("n_paras_after"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pd_pos"), col("__pd_para")))),
            x => x("__pd_para")),
          sep).as("text_clean"))

    // n_paras_before is a projection off the input; the left join keeps
    // documents whose every paragraph was a later duplicate
    docs
      .select(col(idCol).as("__pd_doc"),
        size(split(col(textCol), sepRe)).cast("long").as("n_paras_before"))
      .join(reassembled, Seq("__pd_doc"), "left")
      .select(
        col("__pd_doc").as(idCol),
        col("n_paras_before"),
        coalesce(col("n_paras_after"), lit(0L)).as("n_paras_after"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
