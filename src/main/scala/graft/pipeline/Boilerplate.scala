package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (the CCNet / RefinedWeb preprocessing
  * step): a line that recurs across many documents of the same source —
  * navigation menus, cookie banners, subscribe prompts, copyright
  * footers — carries no training signal and is stripped from every
  * document, preserving the remaining lines in their original order.
  *
  * Shape at 100 TB: one `posexplode` over lines, a map-side-combinable
  * document-frequency aggregate on (source, line), an anti-join back,
  * and one final aggregate on doc_id to reassemble. The boilerplate set
  * is df-filtered and SMALL RELATIVE TO THE CORPUS, but it is not
  * bounded by construction — it grows with the number of sources (every
  * site's nav/footer/banner lines), so the join is deliberately left to
  * size-based planning: Spark broadcasts it while it fits and falls back
  * to a shuffled anti-join when a web-scale source population pushes it
  * past the broadcast limit (a forced broadcast() hint here would
  * override that judgment and die on the 8 GB broadcast ceiling /
  * driver OOM exactly on real corpora). Nothing quadratic, no skew
  * exposure: the hot keys (the boilerplate lines themselves) live only
  * inside the combinable count.
  */
object Boilerplate {

  /** Strip lines whose per-source document frequency reaches `minDf`.
    * Returns one row per input document:
    * (idCol, n_lines_before, n_lines_after, text_clean).
    */
  def stripBoilerplate(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      minDf: Int = 5): DataFrame = {
    val lines = docs.select(
      col(idCol).as("doc_id"), col(sourceCol).as("source"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))

    val boiler = lines
      .groupBy("source", "line")
      .agg(countDistinct("doc_id").as("line_df"))
      .filter(col("line_df") >= minDf)
      .select("source", "line")

    val kept = lines
      .join(boiler, Seq("source", "line"), "left_anti")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines_after"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x("line")),
          "\n").as("text_clean"))

    // n_lines_before is a pure projection (no extra pass over the
    // exploded frame); left join keeps documents that were ALL boilerplate
    docs
      .select(col(idCol).as("doc_id"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines_before"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id").as(idCol),
        col("n_lines_before"),
        coalesce(col("n_lines_after"), lit(0L)).as("n_lines_after"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
