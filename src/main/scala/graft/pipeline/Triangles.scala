package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree orientation (Schank 2007 /
  * Suri–Vassilvitskii MapReduce form) — the clustering-coefficient
  * primitive for near-dup graph analysis (a dup CLUSTER is
  * triangle-dense; a chain of borderline matches is not — counting
  * triangles separates the two before choosing canonical copies).
  *
  * Each undirected edge orients from its (degree, id)-smaller endpoint
  * to the larger; wedges are enumerated only from the oriented lists, so
  * per-node fan-out is bounded by O(sqrt(m)) on any graph (arboricity
  * bound) — the skew guard that makes the self-join survive power-law
  * degree distributions at corpus scale. Each triangle is counted
  * exactly once (the orientation is acyclic).
  */
object Triangles {

  /** Per-node triangle participation counts over an undirected edge list
    * (first two columns = endpoints; duplicates/self-loops ignored).
    * Nodes in no triangle are omitted.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val cols = edges.columns
    val und = edges
      .select(col(cols(0)).cast("long").as("x"),
        col(cols(1)).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val o = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val triangles = o.alias("e1")
      .join(o.alias("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
      .join(o.alias("e3"),
        col("x") === col("e3.u") && col("z") === col("e3.v"), "left_semi")
    triangles
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
