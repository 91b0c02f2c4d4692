package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Components, CorpusClean, TfIdf}

/** Coverage for connected-components dedup clustering and TF-IDF sparse
  * similarity.
  */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connected components: chains, diamonds, and isolates of the pair graph") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val comp = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
    assert(comp.size === 9)
  }

  test("components agree with brute-force union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(80)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val expected = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical label = min node id of the component
      nodes.groupBy(find).flatMap { case (_, ns) =>
        ns.map(_ -> ns.min)
      }
    }
    val got = Components.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("components refuse to return unconverged labels") {
    // a 12-node chain cannot settle in one round even with the jump
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("transitive removal collapses chains greedy removal splits") {
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    // {1~3, 2~3}: greedy drops 3 only; components keep just 1 (and the
    // untouched 9)
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = CorpusClean
      .removeNearDupsTransitive(docs, "doc_id", pairs)
      .as[Long].collect().toSet
    assert(kept === Set(1L, 9L))
  }

  test("count-min sketch: partition-invariant, matches a local reference, never undercounts") {
    import graft.functions.{CountMinSketch, VectorFunctions}
    val (d, w) = (4, 16)
    val values = (0 until 500).map(i => (i % 37).toString)
    def sketchOf(parts: Int): Array[Long] =
      values.toDF("v").repartition(parts)
        .agg(VectorFunctions.countMinMd5(col("v"), d, w))
        .head().getSeq[Long](0).toArray
    val s1 = sketchOf(1)
    val s13 = sketchOf(13)
    // merge is associative+commutative: partitioning must not matter
    assert(s1.toSeq === s13.toSeq)
    // local reference sketch built with the same bucketing
    val ref = new Array[Long](d * w)
    values.foreach(v => (0 until d).foreach(r =>
      ref(r * w + CountMinSketch.bucket(r, v, w)) += 1))
    assert(s1.toSeq === ref.toSeq)
    // estimates never undercount the exact frequency
    val exact = values.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (v, n) =>
      assert(CountMinSketch.estimate(s1, d, w, v) >= n)
    }
  }

  test("tf-idf weights: rare terms outweigh common ones; norms consistent") {
    val docs = Seq(
      (1L, "shared shared rare1"),
      (2L, "shared unique2"),
      (3L, "shared filler words")
    ).toDF("doc_id", "text")
    val w = TfIdf.weights(docs, "doc_id", "text", maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // df=3 for 'shared' -> idf = ln(1) = 0; rare terms carry ln(3)
    assert(w((1L, "shared"))._2 === 0.0)
    assert(math.abs(w((1L, "rare1"))._2 - math.log(3.0)) < 1e-12)
    // doc 1 norm = sqrt(0^2*... + ln(3)^2) = ln(3)
    assert(math.abs(w((1L, "rare1"))._3 - math.log(3.0)) < 1e-12)
  }

  test("tf-idf cosine pairs match dense brute force on a rare-vocab corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"),
      (3L, "zeta eta theta iota"),
      (4L, "zeta eta theta kappa")
    ).toDF("doc_id", "text")
    val got = TfIdf.cosinePairs(docs, "doc_id", "text",
        minSim = 0.1, maxDocFreq = 3)
      .select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    // brute force over the same tf-idf vectors
    val texts = Map(
      1L -> Seq("alpha", "beta", "gamma", "delta"),
      2L -> Seq("alpha", "beta", "gamma", "epsilon"),
      3L -> Seq("zeta", "eta", "theta", "iota"),
      4L -> Seq("zeta", "eta", "theta", "kappa"))
    val n = texts.size.toDouble
    val dfm = texts.values.flatten.toSeq.distinct
      .map(t => t -> texts.values.count(_.contains(t))).toMap
    def vec(id: Long): Map[String, Double] =
      texts(id).groupBy(identity).map { case (t, o) =>
        t -> o.size * math.log(n / dfm(t))
      }
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vec(a), vec(b))
      val dot = va.keySet.intersect(vb.keySet).toSeq
        .map(t => va(t) * vb(t)).sum
      val na = math.sqrt(va.values.map(x => x * x).sum)
      val nb = math.sqrt(vb.values.map(x => x * x).sum)
      dot / (na * nb)
    }
    val expected = (for {
      a <- texts.keys; b <- texts.keys if a < b && cos(a, b) >= 0.1
    } yield (a, b)).toSet
    assert(got === expected)
    assert(got.contains((1L, 2L)) && got.contains((3L, 4L)))
  }
}
