package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Curation, PageRank}

/** PageRank + the rank-based curation operators built this round:
  * perplexity tiering and weighted sampling.
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side power-iteration replay, same update order as the op. */
  private def replay(
      edges: Seq[(Long, Long)], d: Double, iters: Int): Map[Long, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / out(s) }.sum
      }
      r = nodes.map { v =>
        v -> ((1.0 - d) / n + d * (in.getOrElse(v, 0.0) + dangling / n))
      }.toMap
    }
    r
  }

  test("pagerank matches a driver-side power-iteration replay (with dangling)") {
    // 5 has no out-edges → dangling mass exercised every round
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (3L, 5L))
    val got = PageRank.pageRank(edges.toDF("src", "dst"), 0.85, 8)
      .as[(Long, Double)].collect().toMap
    val want = replay(edges, 0.85, 8)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"node $v: $r vs ${want(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "ranks sum to 1")
  }

  test("pagerank on a directed ring is exactly uniform") {
    val n = 6
    val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val got = PageRank.pageRank(ring.toDF("src", "dst"), 0.85, 5)
      .as[(Long, Double)].collect().toMap
    got.values.foreach(r => assert(math.abs(r - 1.0 / n) < 1e-12))
  }

  test("pagerank ranks the hub cycle above plain spokes") {
    // 1↔100 form a 2-cycle whose rank oscillates with iteration parity,
    // so assert the pair dominates, not their relative order
    val star = (1L to 8L).map(i => (i, 100L)) :+ ((100L, 1L))
    val got = PageRank.pageRank(star.toDF("src", "dst"), 0.85, 10)
      .as[(Long, Double)].collect().toMap
    assert(got(100L) > got(2L) && got(1L) > got(2L),
      "hub and reciprocated spoke both above plain spokes")
    assert((2L to 8L).forall(i => math.abs(got(i) - got(2L)) < 1e-12),
      "plain spokes are exactly symmetric")
  }

  test("pagerank matches the replay on random digraphs (seeded)") {
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val nNodes = 20 + rnd.nextInt(30)
      val edges = Seq.fill(3 * nNodes)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }.distinct
      val got = PageRank.pageRank(edges.toDF("src", "dst"), 0.85, 6)
        .as[(Long, Double)].collect().toMap
      val want = replay(edges, 0.85, 6)
      assert(got.keySet === want.keySet, s"seed $seed node set")
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-9, s"seed $seed node $v")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9, s"seed $seed mass")
    }
  }

  test("perplexityTiers partitions each language and orders tiers by score") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "lang", "text")
    val tiers = Curation.perplexityTiers(docs, "doc_id", "text", "lang")
      .select("doc_id", "lang", "kn_logprob", "tier")
      .as[(Long, String, Double, String)].collect()
    assert(tiers.nonEmpty)
    tiers.groupBy(_._2).foreach { case (lang, rows) =>
      val byTier = rows.groupBy(_._4)
      assert(byTier.keySet.subsetOf(Set("head", "middle", "tail")))
      assert(byTier.values.map(_.length).sum === rows.length)
      // thirds: tier sizes differ by at most 1 from n/3 rounding
      byTier.values.foreach(t =>
        assert(math.abs(t.length - rows.length / 3.0) <= 1.0,
          s"$lang tier sizes ${byTier.view.mapValues(_.length).toMap}"))
      // every head score >= every middle score >= every tail score
      def scores(t: String) =
        byTier.getOrElse(t, Array.empty).map(_._3)
      if (scores("head").nonEmpty && scores("middle").nonEmpty)
        assert(scores("head").min >= scores("middle").max)
      if (scores("middle").nonEmpty && scores("tail").nonEmpty)
        assert(scores("middle").min >= scores("tail").max)
    }
  }

  test("weightedSample keeps exactly k rows, deterministically, by key order") {
    val df = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), (lit(0.1) + lit(1.0)).as("w"))
    val k = 10
    val take1 = Curation.weightedSample(df, "doc_id", col("w"), k)
      .select("doc_id", "es_key").as[(Long, Double)].collect()
    val take2 = Curation.weightedSample(df, "doc_id", col("w"), k)
      .select("doc_id", "es_key").as[(Long, Double)].collect()
    assert(take1.length === k)
    assert(take1.sortBy(_._1).sameElements(take2.sortBy(_._1)),
      "deterministic across runs")
    // the kept keys dominate every excluded key
    val all = Curation.weightedSample(df, "doc_id", col("w"), 1000000)
      .select("doc_id", "es_key").as[(Long, Double)].collect()
    val keptMin = take1.map(_._2).min
    val excluded = all.filterNot(r => take1.exists(_._1 == r._1))
    assert(excluded.forall(_._2 <= keptMin))
  }
}
