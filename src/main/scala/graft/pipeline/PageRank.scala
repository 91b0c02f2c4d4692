package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the crawl-frontier /
  * source-ranking primitive of web-scale corpus curation (Common Crawl
  * ranks its seed list by harmonic centrality / PageRank; curation
  * pipelines reuse the same scores to weight domains). Also useful over
  * the NEAR-DUP graph: rank documents by centrality inside their
  * duplicate cluster to pick the canonical copy.
  *
  * Power iteration with a FIXED round count (no convergence test): rank
  * updates are
  *
  *   r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/outdeg(u)  +  dangling/N )
  *
  * where `dangling` is the total rank mass sitting on nodes with no
  * out-edges (redistributed uniformly — the standard stochastic-matrix
  * completion, Page et al. 1999 §2.6). A fixed round count keeps the
  * result a pure function of the edge list, which is what makes it
  * exactly replayable by the SQL oracle (one unrolled CTE per round).
  *
  * Scale shape per round: one equi-join of the edge list against the
  * current ranks (both shuffled on node id — the partitioning is reused
  * across all rounds), one map-side-combinable sum per destination, and
  * one driver-scalar aggregate for the dangling mass. Rounds are
  * `localCheckpoint`ed like [[Components]] — iterated self-referential
  * plans must be flattened per round or plan depth (and any cache miss)
  * grows with the iteration count.
  */
object PageRank {

  /** @param edges directed edges; the first two columns are (src, dst).
    *              Duplicate edges are collapsed (a link counts once).
    * @param saltBuckets contribution-join salt spread; None derives it
    *   from the edge list (one Misra–Gries probe). Callers ranking a
    *   STATIC graph repeatedly should derive once and pass it — the
    *   probe is a full pass over the edge list, and the graph's skew
    *   does not change between runs (the q105 memo contract).
    * @return (node, rank) for every node appearing as src or dst; ranks
    *         sum to 1 up to float error.
    */
  def pageRank(
      edges: DataFrame, damping: Double = 0.85, iters: Int = 10,
      saltBuckets: Option[Int] = None): DataFrame = {
    require(damping > 0 && damping < 1, "damping in (0, 1)")
    require(iters >= 0, "iters must be nonnegative")
    require(saltBuckets.forall(_ >= 1), "saltBuckets must be >= 1")
    val e = edges
      .select(col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst"))
      .distinct()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // fold the out-degree INTO the edge list once — every round's
    // contribution join then touches exactly two relations, not three
    val e2 = e.join(outDeg, Seq("src")).localCheckpoint()
    // the contribution join's hot key is an out-degree hub's src: its
    // edge rows all hash to one reducer, and — like Components' rounds —
    // the localCheckpoint'd (RDD-path) inputs never get an AQE re-plan,
    // so the spread must be decided at plan time. Derived ONCE from the
    // static edge list (Misra–Gries probe); uniform graphs derive 1 and
    // pay nothing. The per-dst SUM after the join was never the problem
    // (map-side combinable).
    val contribSalt = saltBuckets.getOrElse(
      graft.operators.Skew.adaptiveSaltBuckets(e2, Seq("src")))
    // carry a has_out flag on the node table: the per-round dangling
    // mass becomes a shuffle-free filter+agg over the checkpointed rank
    // partitions instead of a per-round anti-join
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(outDeg.select(col("src").as("node"), lit(true).as("has_out")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("has_out"), lit(false)).as("has_out"))
      .localCheckpoint()
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      // rank mass on dangling nodes (no out-edges): a driver scalar —
      // one cheap per-round action over the checkpointed ranks
      val dangling = ranks.filter(!col("has_out"))
        .agg(coalesce(sum("rank"), lit(0.0))).head.getDouble(0)
      val rankSrc = ranks.select(col("node").as("src"), col("rank"))
      val contribs = (if (contribSalt <= 1) e2.join(rankSrc, Seq("src"))
        else graft.operators.Skew
          .saltedJoin(e2, rankSrc, Seq("src"), contribSalt))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("in_mass"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"), col("has_out"),
          (lit((1.0 - damping) / n)
            + lit(damping) * (coalesce(col("in_mass"), lit(0.0))
              + lit(dangling / n))).as("rank"))
        .localCheckpoint()
    }
    ranks.select("node", "rank")
  }
}
