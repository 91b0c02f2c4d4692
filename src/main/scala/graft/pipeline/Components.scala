package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the operator
  * that turns pairwise similarity hits into dedup CLUSTERS. Pair lists
  * are not enough at scale: near-duplication is transitive in practice
  * (A~B, B~C ⇒ keep one of {A,B,C}), and greedy pair-removal keeps two
  * transitive twins whenever the connecting pair is missing.
  *
  * Implementation: iterative min-label propagation with pointer jumping
  * (the Hash-Min + shortcutting scheme of the large-star/small-star
  * family). Each round every node adopts the minimum label among itself
  * and its neighbors (`label(v) ← min(label(N(v) ∪ v))`), then jumps
  * through its current holder (`label(v) ← label(label(v))`). The jump
  * halves label-chains, so rounds are O(log diameter), not O(diameter) —
  * on a driver-overhead-bound local run and a straggler-bound cluster
  * alike, round COUNT is the cost that matters. Every round is two
  * equi-joins + one map-side-combinable min aggregation, all shuffled on
  * node id.
  *
  * Each round's result is `localCheckpoint`ed, NOT cached: the round
  * contains a self-join of its intermediate, and if the previous round's
  * cache lookup misses (canonicalization of iterated self-join plans
  * under AQE is fragile), the duplicated branches recompute the entire
  * history — measured exponential round times (9 s → 14 s → 99 s).
  * Checkpointing makes every round's input a flat LogicalRDD: constant
  * plan depth, no cache-matching dependence, constant round cost
  * (measured ~1 s/round at sf0.1).
  */
object Components {

  /** @param pairs two-column DataFrame of undirected edges (any names;
    *              the first two columns are used).
    * @return (id, component) — component = min node id reachable; every
    *         node appearing in any edge gets a row.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = pairs.select(
      col(pairs.columns(0)).as("a"), col(pairs.columns(1)).as("b"))
    // symmetric edge list, materialized once (checkpoint: every round
    // joins against it, and a flat LogicalRDD can never silently
    // recompute the upstream pair generation)
    val edges = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    // convergence is observed via an accumulator incremented INSIDE the
    // checkpoint-materialization job, so each round runs exactly one
    // action instead of checkpoint + a second count() scan. Task retries
    // can only inflate the value, never zero it, and all we branch on is
    // "changed == 0" — so over-count is harmless.
    // salt spread derived from the DATA, once (the edge list is static
    // across rounds): a Misra–Gries probe of the adjacency key
    // distribution sizes the scatter to the actual hub mass — a
    // 99%-degree-mass hub spreads across every reducer, a uniform graph
    // derives 1 and pays zero label replication (Skew.adaptiveSaltBuckets).
    val adjSalt = graft.operators.Skew.adaptiveSaltBuckets(
      edges.select(col("a").as("id")), Seq("id"))
    // the jump join's hot key is the giant COMPONENT's label — unknown
    // until convergence and always at least as concentrated as the
    // degree distribution suggests, so keep a healthy floor there
    val jumpSalt = math.max(8, adjSalt)
    val acc = pairs.sparkSession.sparkContext.longAccumulator("graft.cc.changed")
    val markChanged = udf { (c: Boolean) => { if (c) acc.add(1L); c } }
      .asNondeterministic() // keep the side effect from being elided/duplicated
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // neighbor minimum: min label over the adjacency of each node.
      // The adjacency join is SALTED: a power-law hub's edge rows all
      // carry one join key, and because every round materializes through
      // the RDD path (localCheckpoint), AQE never re-plans these
      // fragments — its skew split does not fire here (measured), so the
      // hot key must be spread at plan time. Salting scatters the hub's
      // rows across `saltBuckets` reducers for a saltBuckets× replication
      // of the (node-sized, two-column) label table — the deterministic
      // trade documented in [[graft.operators.Skew]]. The min aggregation
      // after it is map-side combinable, so the hub's DOWNSTREAM
      // aggregation was never the problem.
      val nbrMin = graft.operators.Skew
        .saltedJoin(edges.withColumnRenamed("a", "id"), labels, Seq("id"),
          saltBuckets = adjSalt)
        .groupBy(col("b").as("id"))
        .agg(min("component").as("nbr"))
      // materialize: `stepped` embeds the round's dominant cost (the
      // salted adjacency join + neighbor-min) and is consumed THREE
      // times below (holders, the distinct jump lookup, and the jump
      // join's left side) — without pinning, that plan re-executes per
      // consumer, tripling the round's shuffle volume
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("component").as("old"),
          least(col("component"), coalesce(col("nbr"), col("component")))
            .as("c1"))
        .localCheckpoint()
      // pointer jump: adopt the label of the current label-holder (a
      // label is always itself a node id, so the self-join resolves).
      // Resolving label(label) needs ONE row per DISTINCT current label,
      // so collapse to that lookup first: the distinct is
      // map-side-combinable (a 50%-mass hub label reaches the reduce
      // side as one row per map partition, never as raw node rows), and
      // the collapsed lookup is component-count-sized — which is what
      // makes the salted join below cheap to replicate.
      val holders = stepped.select(col("id").as("c1"), col("c1").as("c2"))
      val jumps = stepped.select(col("c1")).distinct()
        .join(holders, Seq("c1"))
      acc.reset()
      // the jump join is salted for the same reason as the adjacency
      // join (rdd-path rounds get no AQE re-plan): all members of a
      // large component share c1, the textbook hot key. jumps is
      // component-count-sized, so its saltBuckets× replication is the
      // cheap side of the trade by construction.
      val next = graft.operators.Skew
        .saltedJoin(stepped, jumps, Seq("c1"), saltBuckets = jumpSalt,
          joinType = "left")
        .select(col("id"), col("old"),
          least(col("c1"), coalesce(col("c2"), col("c1"))).as("component"))
        .withColumn("chg", markChanged(col("component") =!= col("old")))
        .select("id", "component", "chg")
        .localCheckpoint()
      changed = acc.value
      graft.util.Checkpoints.release(stepped) // next is materialized; free now
      labels = next.select("id", "component")
      iter += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge within $maxIter rounds " +
        "(log-diameter exceeds the bound) — raise maxIter")
    labels
  }

  /** Cluster summary: one row per component with its size. */
  def componentSizes(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .groupBy("component").agg(count(lit(1)).as("n_members"))
}
