package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Curation, Similarity, TextProfile, Winnowing}

/** Coverage for the round-3 profiling operators: winnowing fingerprints,
  * repetition/entropy signals, stratified sampling, vector
  * normalize/quantize.
  */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 8
  private val w = 4

  test("winnowing: identical text -> identical fingerprints; short -> empty") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (2L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (3L, "tiny")
    ).toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"),
        Winnowing.fingerprintSet(col("text"), k, w).as("fps"))
      .as[(Long, Seq[String])].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L).nonEmpty)
    assert(fp(3L).isEmpty) // < k+w-1 stripped chars
  }

  test("winnowing guarantee: long shared substring -> shared fingerprint") {
    // matches of length >= w+k-1 guarantee at least one common selected
    // hash (Schleimer et al., theorem 1)
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789"
    val docs = Seq(
      (1L, s"prefix one $shared"),
      (2L, s"completely different head $shared and tail")
    ).toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"),
        Winnowing.fingerprintSet(col("text"), k, w).as("fps"))
      .as[(Long, Seq[String])].collect().toMap
    assert(fp(1L).toSet.intersect(fp(2L).toSet).nonEmpty)
  }

  test("native winnow expression equals the pure-builtin HOF reference") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val both = docs.select(
      Winnowing.fingerprintSet(col("text"), k, w).as("fast"),
      Winnowing.fingerprintSetHof(col("text"), k, w).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() === 0)
    assert(both.count() > 0)
  }

  test("winnowing pairs surface planted near-duplicates") {
    val base = (0L until 40L).map(i =>
      (i, (1 to 15).map(j => s"w${(i * 31 + j * 7) % 997}x").mkString(" ")))
    val twin = Seq((1000L, base(5)._2 + " tail"))
    val pairs = Winnowing.pairs((base ++ twin).toDF("doc_id", "text"),
        "doc_id", "text", k, w, minShared = 3, maxDocFreq = 10)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 === 5L && p._2 === 1000L))
  }

  test("capped collect holds full groups under the cap, truncates over it") {
    // 40 partitions force partial-aggregation merges, so the cap
    // invariant is exercised across the merge tree, not just update()
    val rows = (0L until 30L).map(i => ("hot", i)) ++
      (0L until 4L).map(i => ("cold", 100L + i))
    val got = rows.toDF("g", "id").repartition(40)
      .groupBy("g")
      .agg(graft.functions.VectorFunctions
        .cappedCollect(col("id"), 10).as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("hot").size === 10) // truncated AT the cap, never above
    assert(got("hot").toSet.subsetOf((0L until 30L).toSet))
    assert(got("cold").toSet === Set(100L, 101L, 102L, 103L)) // complete
  }

  test("group-then-combine pairs equal the df-cap self-join reference") {
    // the r16 pair shape (one capped aggregation + combination explode)
    // must produce EXACTLY the reference pair multiset: df-capped
    // inverted-index self-join, the previous spelling
    val docs = Tables.documents(spark, TestSpark.sf)
    val fps = Winnowing.fingerprints(docs, "doc_id", "text", k, w)
    val maxDocFreq = 20L
    val minShared = 3L
    val dfCap = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq).select("fp")
    val kept = fps.join(dfCap, Seq("fp"))
    val ref = kept.select(col("fp"), col("doc_id").as("id_a"))
      .join(kept.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .as[(Long, Long, Long)].collect().toSet
    val got = Winnowing.pairs(docs, "doc_id", "text", k, w,
        minShared = minShared, maxDocFreq = maxDocFreq)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === ref)
    assert(got.nonEmpty)
  }

  test("repetition profile flags looping text") {
    val docs = Seq(
      (1L, Seq.fill(30)("spam ham").mkString(" ")),
      (2L, (1 to 60).map(i => s"tok$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = TextProfile.repetitionProfile(docs, "doc_id", "text")
      .as[(Long, Double, Double)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    assert(r(1L)._1 > 0.9) // all trigrams repeat
    assert(r(2L)._1 === 0.0)
    assert(r(1L)._2 > 0.4) // "ham spam"/"spam ham" dominate bigrams
    assert(r(2L)._2 < 0.05)
  }

  test("bigram LM: deterministic text scores ln(1), unique bigrams score low") {
    val docs = Seq(
      (1L, "a b a b a b a b"),   // every bigram fully predicted by corpus
      (2L, "c d e f g h i j"),   // each bigram unique
      (3L, "x")                  // no bigrams -> no row
    ).toDF("doc_id", "text")
    val s = TextProfile.bigramLmScores(docs, "doc_id", "text")
      .select("doc_id", "lm_logprob")
      .as[(Long, Double)].collect().toMap
    // doc 1: P(b|a)=4/4, P(a|b)=3/3 -> every bigram ln(1)=0
    assert(math.abs(s(1L)) < 1e-12)
    // doc 2: c2=1 and each w1 occurs once -> ln(1/1)=0 too; mix in a doc
    // that shares first-words to force fractional probabilities
    assert(!s.contains(3L))
    val mixed = Seq(
      (1L, "a b"), (2L, "a c")) // P(b|a)=P(c|a)=1/2
      .toDF("doc_id", "text")
    val m = TextProfile.bigramLmScores(mixed, "doc_id", "text")
      .select("doc_id", "lm_logprob")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(m(1L) - math.log(0.5)) < 1e-12)
    assert(math.abs(m(2L) - math.log(0.5)) < 1e-12)
  }

  test("Kneser-Ney LM: closed forms, smoothing beats MLE on rare bigrams") {
    // corpus {"a b", "a c"}: c(ab)=c(ac)=1, c(a.)=2, N1+(a.)=2,
    // N1+(.b)=N1+(.c)=1, B=2 ->
    // P(b|a) = max(1-0.75,0)/2 + (0.75*2/2)*(1/2) = 0.125 + 0.375 = 0.5
    val mixed = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val m = TextProfile.knBigramLmScores(mixed, "doc_id", "text")
      .select("doc_id", "kn_logprob")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(m(1L) - math.log(0.5)) < 1e-12)
    assert(math.abs(m(2L) - math.log(0.5)) < 1e-12)
    // hapax bigram in a corpus with a dominant context: KN discounts the
    // MLE estimate (P_KN < P_MLE for the rare bigram with a common w2
    // continuation elsewhere... ) and every probability is in (0, 1]
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"),
      (4L, "zq cat")).toDF("doc_id", "text")
    val kn = TextProfile.knBigramLmScores(corpus, "doc_id", "text")
      .select("doc_id", "kn_logprob").as[(Long, Double)].collect().toMap
    assert(kn.values.forall(v => v <= 1e-12), "ln P must be <= 0")
    assert(kn.values.forall(_.isFinite), "smoothing keeps every P > 0")
    // docs with no bigrams emit no row
    val single = Seq((9L, "x")).toDF("doc_id", "text")
    assert(TextProfile.knBigramLmScores(single, "doc_id", "text")
      .count() === 0L)
  }

  test("token entropy: constant tokens -> 0, distinct tokens -> log2(n)") {
    val docs = Seq(
      (1L, Seq.fill(16)("x").mkString(" ")),
      (2L, (1 to 16).map(i => s"t$i").mkString(" "))
    ).toDF("doc_id", "text")
    val e = TextProfile.tokenEntropy(docs, "doc_id", "text")
      .select("doc_id", "entropy")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(e(1L)) < 1e-12)
    assert(math.abs(e(2L) - 4.0) < 1e-12)
  }

  test("stratified sample: rates honored, membership deterministic") {
    val docs = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    val s = Curation.stratifiedSample(
      docs, "doc_id", "lang", Map("en" -> 0.5), defaultRate = 0.1)
    val counts = s.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("en") / 1000.0 - 0.5) < 0.1)
    assert(math.abs(counts("de") / 1000.0 - 0.1) < 0.05)
    // deterministic: same membership on re-evaluation
    assert(s.exceptAll(Curation.stratifiedSample(
      docs, "doc_id", "lang", Map("en" -> 0.5), 0.1)).isEmpty)
  }

  test("sequence packing: bins bounded by budget + one doc, contiguous, deterministic") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val budget = 256L
    val packed = Curation.packSequences(docs, "doc_id", "text",
      budgetTokens = budget, buckets = 4)
    assert(packed.count() === docs.count(), "every doc assigned")
    val bins = packed.groupBy("bucket", "bin")
      .agg(sum("n_tok").as("tot"), max("n_tok").as("mx"))
      .as[(Int, Long, Long, Long)].collect()
    // next-fit shelf bound: a bin's total never exceeds budget + the
    // overflow of its last-placed document
    bins.foreach { case (bk, bin, tot, mx) =>
      assert(tot <= budget + mx, s"bucket $bk bin $bin total $tot")
    }
    // bins are contiguous from 0 within each bucket
    bins.groupBy(_._1).foreach { case (_, bs) =>
      val ids = bs.map(_._2).sorted
      assert(ids === (0L until ids.length).toArray)
    }
    val again = Curation.packSequences(docs, "doc_id", "text",
      budgetTokens = budget, buckets = 4)
    assert(packed.exceptAll(again).isEmpty)
  }

  test("l2Normalize yields unit vectors; quantizeInt8 peaks at +-127") {
    val vecs = Seq(
      (1L, Array(3.0f, 4.0f, 0.0f)),
      (2L, Array(-2.0f, 1.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val out = vecs.select(
        col("vec_id"),
        Similarity.l2Normalize(col("embedding")).as("u"),
        Similarity.quantizeInt8(col("embedding")).as("q"))
      .as[(Long, Seq[Double], Seq[Int])].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    val n1 = math.sqrt(out(1L)._1.map(x => x * x).sum)
    assert(math.abs(n1 - 1.0) < 1e-12)
    assert(out(1L)._2 === Seq(95, 127, 0))   // round(3/4*127)=95
    assert(out(2L)._2 === Seq(-127, 64, 127)) // round(1/2*127)=64 (HALF_UP)
  }
}
