package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion. Reciprocal Rank Fusion (Cormack,
  * Clarke & Büttcher, SIGIR 2009): given per-system top-k rankings,
  * `rrf(d) = Σ_systems 1 / (c + rank_s(d))` — the standard way RAG
  * stacks combine a lexical (BM25) and a vector (cosine ANN) ranking
  * without score calibration, since only RANKS enter.
  *
  * Scale shape: inputs are already top-k-per-query frames (k·|queries|
  * rows, not corpus-sized); the fuse is one combinable groupBy over
  * their union plus one per-query window whose partitions hold at most
  * systems·k rows — WindowGroupLimit keeps the top-k selection map-side.
  * Scores round to 6dp BEFORE ranking (doc-id ties) so the fused
  * ranking is engine-reproducible.
  */
object Retrieval {

  /** Fuse rankings (each `(query_id, doc_id, rank)`) into a top-`k`
    * RRF ranking per query.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val u = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val scored = u.groupBy("query_id", "doc_id")
      .agg(round(sum(lit(1.0) / (lit(c) + col("rank"))), 6).as("rrf_score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf_score"),
        col("rank").cast("long").as("rank"))
  }
}
