package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.queries.{PipelineQueries, SimilarityQueries}

/** Property tests for the training-data pipeline operators: planted
  * near-duplicates must be found, LSH candidates must agree with exact
  * scores, ANN recall must beat a floor against the brute-force baseline.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docsAug = PipelineQueries.docsAug(spark, TestSpark.sf).cache()

  test("unigram trainer: segmentation coverage, pruning, and a known merge") {
    import graft.pipeline.Unigram
    // 'abab' dominates: after one EM round the 4-char piece wins whole
    val docs = (Seq.fill(50)("abab") ++ Seq.fill(3)("ac")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val vocab = Unigram.train(spark, docs, "text",
      maxPieceLen = 4, minSeedCount = 2, rounds = 2)
    val byPiece = vocab.map(p => p.piece -> p).toMap
    assert(byPiece.contains("abab") && byPiece("abab").usage == 50L,
      s"dominant word should tokenize as one piece: $vocab")
    // every single char survives (coverage), even barely-used ones
    assert(Seq("a", "b", "c").forall(byPiece.contains))
    // segmentation under the final scores covers every word exactly
    val scores = vocab.map(p => p.piece -> p.score).toMap
    for (w <- Seq("abab", "ac", "abac", "cab"))
      assert(Unigram.segment(w, scores, 4).mkString("") == w)
    // usage mass balances: total piece usage ≥ corpus words (each word
    // contributes ≥1 piece), and scores are log-probabilities (< 0)
    assert(vocab.map(_.usage).sum >= 53L)
    assert(vocab.forall(_.score < 0))
  }

  test("unigram seed relation drops the hapax tail executor-side (100:1)") {
    import graft.pipeline.Unigram
    // A wide-alphabet corpus (3000-symbol CJK range) where multi-char
    // substrings are almost all globally unique: the hapax tail
    // outnumbers the kept vocabulary >100:1, and the in-plan
    // minSeedCount filter must keep only the vocabulary-sized head.
    // An exact driver-side count model cross-checks the relation.
    val rnd = new scala.util.Random(7)
    val alpha = 3000
    val words = (0 until 8000).map { _ =>
      ((0 until 30).map(_ => (0x4E00 + rnd.nextInt(alpha)).toChar).mkString, 1L)
    }
    val counts = new scala.collection.mutable.HashMap[String, Long]
    for ((w, f) <- words; i <- 0 until w.length;
         l <- 1 to math.min(4, w.length - i))
      counts.updateWith(w.substring(i, i + l))(c => Some(c.getOrElse(0L) + f))
    val hapax = counts.valuesIterator.count(_ == 1L).toLong
    val keptModel = counts.iterator.count { case (p, c) =>
      c >= 2L || p.length == 1
    }.toLong
    assert(hapax > 100L * keptModel,
      s"fixture contract: hapax=$hapax kept=$keptModel")
    // the relation that reaches the driver is exactly the kept head —
    // the tail (>100x larger) was dropped executor-side
    val kept = Unigram.seedRelation(spark, words.toDS(), 4, 2L).count()
    assert(kept == keptModel, s"kept=$kept model=$keptModel")
  }

  test("validation: same-named checks count independently (keyed by position)") {
    import graft.pipeline.Validation._
    val df = Seq((Option(1L), -2.0), (None, 3.0), (None, -4.0))
      .toDF("fk", "v")
    // two Satisfies rendered with ONE label, plus a duplicated NotNull:
    // each row must report ITS OWN violation count, not the last one's
    val rows = validate(df, Seq(
      Satisfies("lbl", col("v") > 0),      // 2 violations
      Satisfies("lbl", col("fk").isNotNull), // 2 violations (different rows)
      NotNull("fk"), NotNull("fk")))       // 2 each
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.length == 4)
    assert(rows.map(_._3).toSeq == Seq(2L, 2L, 2L, 2L), rows.mkString(", "))
    // and genuinely different counts under one label stay distinct
    val rows2 = validate(df, Seq(
      Satisfies("x", col("v") > -3.0),   // 1 violation (-4.0)
      Satisfies("x", col("v") > 100.0))) // 3 violations
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows2.map(_._3).toSeq == Seq(1L, 3L), rows2.mkString(", "))
  }

  test("validation counts each violation class exactly; clean data passes") {
    import graft.pipeline.Validation._
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val dirty = Seq(
      (1L, Option(1L), 10.0),   // clean
      (1L, Option(2L), 20.0),   // duplicate key
      (2L, None, 30.0),         // null fk
      (3L, Option(9L), -5.0),   // orphan fk + out of range
      (4L, Option(3L), 40.0)    // clean
    ).toDF("k", "fk", "v")
    val got = validate(dirty, Seq(
      NotNull("fk"), Unique(Seq("k")), InRange("v", 0.0, 100.0),
      ForeignKey(Seq("fk"), ref, Seq("rk")),
      Satisfies("v_positive", col("v") > 0)))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(got("not_null(fk)") == ((1L, false)))
    assert(got("unique(k)") == ((1L, false)))
    assert(got("in_range(v,0.0,100.0)") == ((1L, false)))
    assert(got("foreign_key(fk)") == ((1L, false)))
    assert(got("v_positive") == ((1L, false)))
    val clean = validate(ref, Seq(NotNull("rk"), Unique(Seq("rk"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(clean.forall(_._4), clean.mkString(","))
  }

  test("psi terms are zero for identical halves, positive under shift") {
    import graft.pipeline.Drift
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val same = Drift.psiTerms(a, a, Drift.numericBin(col("v"), 0, 100, 5), "v")
      .agg(sum(abs(col("psi_term")))).head().getDouble(0)
    assert(same == 0.0, s"identical distributions must give PSI 0, got $same")
    val b = (1 to 100).map(i => (i % 50 + 50).toDouble).toDF("v")
    val shifted = Drift.psiTerms(a, b, Drift.numericBin(col("v"), 0, 100, 5), "v")
      .agg(sum(col("psi_term"))).head().getDouble(0)
    assert(shifted > 0.2, s"shifted distribution must flag drift, got $shifted")
  }

  test("heavy hitters: exact and partition-invariant on adversarial keys") {
    val rows = (1 to 1000).map(i => s"u$i") ++ Seq.fill(150)("hotA") ++
      Seq.fill(160)("hotB") ++ Seq.fill(141)("nearMiss")
    val k = 10
    val n = rows.size
    val expected = rows.groupBy(identity).view
      .mapValues(_.size.toLong).filter(_._2 * k > n).toMap
    assert(expected.keySet == Set("hotA", "hotB"),
      s"fixture must straddle the threshold: $expected")
    for (p <- Seq(1, 7, 32)) {
      val df = rows.toDF("k").repartition(p)
      val got = graft.pipeline.HeavyHitters.exact(df, col("k"), k)
        .as[(String, Long)].collect().toMap
      assert(got == expected, s"partitions=$p")
    }
  }

  test("misra-gries buffer is bounded by k and keeps the majority item") {
    val rows = Seq.fill(600)("maj") ++ (1 to 400).map(i => s"t$i")
    val m = rows.toDF("k").repartition(11)
      .agg(graft.functions.VectorFunctions.misraGries(col("k"), 5))
      .head().getMap[String, Long](0)
    assert(m.size <= 5, s"summary overflowed: $m")
    assert(m.contains("maj"), s"majority item evicted: $m")
  }

  test("gopher rules: closed-form metrics on a hand-built document") {
    val text = "the cat sat on the mat with that have be to of and\n" +
      "- b1\n- b2\ndup\ndup\nend..."
    val row = Seq((1L, text)).toDF("doc_id", "text")
      .select(TextAnalysis.gopherRules(col("text")).as("g"))
      .select("g.*").head()
    assert(row.getAs[Int]("n_words") == 20)
    assert(row.getAs[Int]("stop_hits") == 8)
    assert(row.getAs[Double]("bullet_frac") == math.rint(2.0 / 6 * 1e4) / 1e4)
    assert(row.getAs[Double]("ellipsis_frac") == math.rint(1.0 / 6 * 1e4) / 1e4)
    assert(row.getAs[Double]("dup_line_frac") == math.rint(1.0 / 6 * 1e4) / 1e4)
    assert(row.getAs[Double]("sym_ratio") == math.rint(1.0 / 20 * 1e4) / 1e4)
    assert(row.getAs[Double]("alpha_frac") == math.rint(18.0 / 20 * 1e4) / 1e4)
    assert(row.getAs[Double]("mean_word_len") == math.rint(56.0 / 20 * 1e4) / 1e4)
    // fails: word count below the paper's 50 minimum, bullets over 10%
    assert(!row.getAs[Boolean]("passes"))
    // the same doc inflated past the word floor with clean prose passes
    val padded = text.replace("\n- b1", " " +
      Seq.fill(40)("plain words flow here").mkString(" ") + "\n- b1")
    val row2 = Seq((1L, padded)).toDF("doc_id", "text")
      .select(TextAnalysis.gopherRules(col("text"), minWords = 20).as("g"))
      .select("g.*").head()
    assert(row2.getAs[Int]("n_words") == 180)
    assert(!row2.getAs[Boolean]("passes"), "bullet fraction still fails")
  }

  test("exact dedup finds identical texts and only them") {
    val docs = Seq((1L, "same text here"), (2L, "same   TEXT  here"),
      (3L, "different")).toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(docs, "doc_id", "text")
      .filter(col("group_size") > 1).collect()
    // normalization makes 1 and 2 identical
    assert(groups.length == 1 && groups.head.getAs[Long]("canonical_id") == 1L)
  }

  test("ngram jaccard finds every planted near-dup pair") {
    val pairs = Dedup.jaccardPairs(docsAug, "doc_id", "text", minSim = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = docsAug.filter(col("doc_id") >= 1000000)
      .select((col("doc_id") - 1000000).as("a"), col("doc_id").as("b"))
      .as[(Long, Long)].collect().toSet
    assert(planted.nonEmpty)
    assert(planted.subsetOf(pairs),
      s"missing ${(planted -- pairs).take(3)} of ${planted.size}")
  }

  test("minhash-LSH finds most planted pairs and never fabricates high scores") {
    val pairs = Dedup.minhashPairs(docsAug, "doc_id", "text",
        k = 8, bands = 4, minEstSim = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = docsAug.filter(col("doc_id") >= 1000000)
      .select((col("doc_id") - 1000000).as("a"), col("doc_id").as("b"))
      .as[(Long, Long)].collect().toSet
    // probabilistic: with k=8/4 bands a twin differing by one token can
    // slip every band, but most must be recovered
    val recall = (planted & pairs).size.toDouble / planted.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("simhash: identical texts collide, mutated twin stays close in hamming") {
    val sample = docsAug.filter(col("doc_id") % 37 === 0 && col("doc_id") < 1000000)
    val both = Dedup.simhash(
      sample.union(sample.withColumn("doc_id", col("doc_id") + 2000000)),
      "doc_id", "text")
    val m = both.as[(Long, Long)].collect().toMap
    m.keys.filter(_ < 1000000).foreach { id =>
      assert(m(id) == m(id + 2000000), "identical text, identical simhash")
    }
    val twins = Dedup.simhash(docsAug, "doc_id", "text").as[(Long, Long)]
      .collect().toMap
    val dists = twins.keys.filter(_ >= 1000000).toSeq.map { id =>
      java.lang.Long.bitCount(twins(id) ^ twins(id - 1000000))
    }
    // a one-token append flips only near-tie bits; at 64 bits that lands
    // most twins within 4 flips and all far inside a quarter of the width
    assert(dists.nonEmpty && dists.count(_ <= 4).toDouble / dists.size >= 0.7,
      s"hamming distances: ${dists.sorted.takeRight(5)}")
    assert(dists.max <= 16, s"twin drifted to hamming ${dists.max}")
  }

  test("brute-force topk ranks the planted twin first with sim 1.0") {
    val emb = SimilarityQueries.embAug(spark, TestSpark.sf)
    val twins = emb.filter(col("vec_id") >= 1000000)
    val top = Similarity.bruteForceTopK(emb, twins, "vec_id", "embedding", 1)
      .collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 1000000)
      assert(r.getAs[Double]("sim") == 1.0)
    }
  }

  test("LSH ANN: twin lands in the same bucket; recall floor vs brute force") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 3,
        planes = 4, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 16 buckets, multi-probe hamming-1 → ~5/16 of the corpus scanned
    assert(recall >= 0.3, s"recall $recall")
    // planted exact twins always share a bucket (identical signature)
    val embA = SimilarityQueries.embAug(spark, TestSpark.sf)
    val twinTop = Similarity.lshTopK(embA,
        embA.filter(col("vec_id") >= 1000000), "vec_id", "embedding", 1,
        planes = 4, dim = 64).collect()
    twinTop.foreach(r =>
      assert(r.getAs[Double]("sim") == 1.0))
  }

  test("IVF ANN: deterministic, beats a recall floor, twin stays findable") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 3,
        nCentroids = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall") // 4/16 lists probed
    // the k-means-trained quantizer must clear the same floor
    val ivfKm = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 3,
        nCentroids = 16, nProbe = 4, refineIters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recallKm = (exact & ivfKm).size.toDouble / exact.size
    assert(recallKm >= 0.3, s"refined recall $recallKm")
    // identical twin shares the nearest list with its original
    val embA = SimilarityQueries.embAug(spark, TestSpark.sf)
    val twinTop = Similarity.ivfTopK(embA,
      embA.filter(col("vec_id") >= 1000000), "vec_id", "embedding", 1,
      nCentroids = 16, nProbe = 1).collect()
    twinTop.foreach(r => assert(r.getAs[Double]("sim") == 1.0))
  }

  test("custom DotProduct expression matches the builtin fold bit-for-bit") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .select(
        Similarity.dot(col("a.v"), col("b.v")).as("fast"),
        Similarity.dotHof(col("a.v"), col("b.v")).as("ref"))
    assert(pairs.filter(col("fast") =!= col("ref")).count() == 0)
    // and usable from SQL text via the registry
    graft.functions.VectorFunctions.register(spark)
    emb.createOrReplaceTempView("vt")
    val n = spark.sql(
      "SELECT vec_dot(v, v) AS d FROM vt").filter(col("d") > 0).count()
    assert(n == 50)
  }

  test("multimodal: feature extraction and frame sampling plumbing") {
    val media = Multimodal.mediaFromDocuments(
      Tables.documents(spark, TestSpark.sf).limit(50))
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.n_bytes > 0 && f.byte_mean > 0 && f.feature.length == 8)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3, "histogram normalized")
    }
    val frames = Multimodal.sampleFrames(Array.fill[Byte](1000)(7), 4)
    assert(frames.length == 4 && frames.forall(_.length == 250))
    assert(Multimodal.sampleFrames(Array.emptyByteArray, 4).isEmpty)
  }

  test("substring dedup keeps the first occurrence of a repeated span only") {
    val span = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val docs = Seq(
      (1L, s"unique one two three $span tail1 end1"),
      (2L, s"other words here before $span tail2 end2"),
      (3L, "totally distinct text with no repeats at all"),
      (4L, "tiny doc") // shorter than the window: always exempt
    ).toDF("doc_id", "text")
    val r = pipeline.SubstringDedup.dedupSubstrings(docs, "doc_id", "text", l = 8)
      .collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getString(3)))
      .toMap
    // the first (lowest doc, offset) occurrence keeps every token
    assert(r(1L)._1 == r(1L)._2 && r(1L)._3.contains("a1 a2"))
    // the later occurrence loses EXACTLY the 10 span tokens: the span's
    // three interior windows repeat, their union covers the span, and
    // the boundary windows (mixed with doc-local context) stay unique
    assert(r(2L)._1 - r(2L)._2 == 10, r(2L).toString)
    assert(!r(2L)._3.contains("a5"))
    assert(r(2L)._3.startsWith("other words here before") &&
      r(2L)._3.endsWith("tail2 end2"))
    // untouched and sub-window documents survive whole
    assert(r(3L)._1 == r(3L)._2 && r(4L)._1 == r(4L)._2)
  }

  test("dsir: target-vocabulary docs outrank raw-only docs and win top-k") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha"), // pure target vocabulary
      (2L, "alpha beta gamma delta"),
      (3L, "omega psi chi phi"), // vocabulary absent from the target
      (4L, "omega psi omega psi")
    ).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") <= 2)
    val ratios = pipeline.Dsir.fitLogRatios(target, docs, "text", buckets = 64)
    assert(ratios.length == 64)
    // the one-pass flagged fit is exactly the two-scan fit
    val flagged = pipeline.Dsir.fitLogRatiosFlagged(
      docs, col("doc_id") <= 2, "text", buckets = 64)
    assert(flagged.sameElements(ratios))
    val scored = pipeline.Dsir.score(docs, "doc_id", "text", ratios)
    val m = scored.collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // n_grams = unigrams + bigrams
    assert(m(1L)._1 == 9 && m(3L)._1 == 7)
    // per-gram importance: in-target vocabulary > never-in-target
    assert(m(1L)._2 / m(1L)._1 > m(3L)._2 / m(3L)._1)
    assert(m(3L)._2 < 0.0, "raw-only doc must score below zero")
    val top = pipeline.Dsir.selectTopK(scored, "doc_id", 2)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(1L, 2L), s"top-2 was $top")
  }

  test("pq: twins share codes, adc keeps clusters apart, rerank is exact") {
    // two tight clusters at +1 and -1 in every dimension; id 2 is an
    // exact twin of id 1
    def vec(base: Float, jitter: Float): Seq[Float] =
      Seq.tabulate(16)(i => base + jitter * ((i % 3) - 1))
    val rows = Seq(
      1L -> vec(1f, 0.01f), 2L -> vec(1f, 0.01f),
      3L -> vec(1f, 0.02f), 4L -> vec(1f, 0.03f), 5L -> vec(1f, 0.04f),
      6L -> vec(-1f, 0.01f), 7L -> vec(-1f, 0.02f), 8L -> vec(-1f, 0.03f),
      9L -> vec(-1f, 0.04f), 10L -> vec(-1f, 0.05f))
    val corpus = rows.toDF("vec_id", "embedding")
    val cb = pipeline.Pq.sampleCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    assert(cb.m == 4 && cb.dsub == 4 && cb.codes.forall(_.length == 4))
    val enc = pipeline.Pq.encode(corpus, "vec_id", "embedding", cb)
    val codes = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1L) == codes(2L), "exact twins must share all codes")
    assert(codes.values.forall(_.forall(c => c >= 0 && c < 4)))
    val top = pipeline.Pq.adcTopK(
        enc, corpus, corpus.filter(col("vec_id") === 1), "vec_id",
        "embedding", cb, k = 3)
      .orderBy("rnk").collect()
    assert(top.length == 3)
    // cross-cluster ADC is ~-16 vs +16: the shortlist stays in-cluster
    assert(top.forall(r => Set(2L, 3L, 4L, 5L).contains(r.getLong(1))),
      top.map(_.getLong(1)).mkString(","))
    // rerank column is the true dot product: the twin's is the self-dot
    val twin = top.find(_.getLong(1) == 2L)
    twin.foreach { r =>
      val selfDot = rows.head._2.map(x => x.toDouble * x.toDouble).sum
      assert(math.abs(r.getDouble(3) - selfDot) < 1e-3)
    }
  }

  test("cleaning funnel: monotone, removes exact twins at stage 2 and mutated at stage 3") {
    Tables.documents(spark, TestSpark.sf).createOrReplaceTempView("documents")
    val input = spark.sql(
      s"WITH ${PipelineQueries.docsCleanSql} SELECT * FROM docs_clean")
    val r = graft.pipeline.CorpusClean.clean(input, "doc_id", "text", minQuality = 0.6)
    assert(r.nRaw >= r.nAfterQuality && r.nAfterQuality >= r.nAfterExact &&
      r.nAfterExact >= r.nAfterNear)
    assert(r.nAfterQuality < r.nRaw, "quality gate removes something")
    val survivors = r.survivors.select("doc_id").as[Long].collect().toSet
    // exact twins (+2000000) never survive if their original passed quality
    val exactTwins = survivors.filter(_ >= 2000000)
    assert(exactTwins.forall(t => !survivors.contains(t - 2000000)),
      "an exact twin may only survive if its original was quality-dropped")
    // surviving mutated twins (+1000000) imply their original is gone too
    val mutated = survivors.filter(id => id >= 1000000 && id < 2000000)
    assert(mutated.count(t => survivors.contains(t - 1000000)) == 0 ||
      r.nAfterExact == r.nAfterNear, "near-dup stage separates mutated twins")
  }

  test("approx distinct stays within the requested error of exact") {
    val ev = Tables.events(spark, TestSpark.sf)
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("u"))
      .select("event_type", "u").as[(String, Long)].collect().toMap
    exact.foreach { case (t, e) =>
      val a = approx(t)
      assert(math.abs(a - e).toDouble / e <= 0.1, s"$t: approx $a exact $e")
    }
    // the hashed q38 surface asserts the same bound as a boolean column
    val gated = queries.StreamQueries.q38ApproxDistinct(spark, TestSpark.sf)
      .filter(!col("approx_within_3rse")).count()
    assert(gated == 0, "q38 bound column must be all-true")
  }

  test("CountInSet equals the interpreted lambda count") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(300)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
    val set = TextAnalysis.Stopwords
    val both = docs.select(
      col("doc_id"),
      functions.VectorFunctions.countInSet(col("w"), set).as("fast"),
      size(filter(col("w"), t => t.isin(set.map(x => x: Any): _*))).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
    // null array → null count, matching the lambda spelling
    val nullRow = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("w")
      .select(functions.VectorFunctions.countInSet(col("w"), set).as("c"))
      .as[Option[Int]].head()
    assert(nullRow.isEmpty)
  }

  test("banded simhash pairs equal the brute-force hamming join") {
    val docs = queries.PipelineQueries.docsAug(spark, TestSpark.sf)
      .filter(col("doc_id") % 2 === 0)
    val banded = pipeline.Dedup
      .simhashPairs(docs, "doc_id", "text", bits = 64, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val fp = pipeline.Dedup.simhash(docs, "doc_id", "text", bits = 64)
    val brute = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("bigint"))
      .as[(Long, Long, Long)].collect().filter(_._3 <= 3).toSet
    assert(banded == brute,
      s"pigeonhole banding must be exhaustive: missing ${(brute -- banded).take(3)}")
    assert(banded.nonEmpty, "planted twins should yield at least one pair")
  }

  test("embedding dup pairs: one dominant label keeps candidates bounded") {
    // 300 vectors pile into one hot block (~45k pairs uncapped); the cap
    // drops that block and keeps the balanced one, so the join stays
    // linear when clustering is degenerate
    val hot = (1L to 300L).map(i => (i, "hot", Array(1.0f, 0.0f)))
    val cold = Seq((9001L, "cold", Array(0.0f, 1.0f)),
                   (9002L, "cold", Array(0.0f, 1.0f)))
    val emb = (hot ++ cold).toDF("vec_id", "label", "embedding")
    val pairs = Similarity.embeddingDupPairs(
        emb, "vec_id", "embedding", "label", minSim = 0.9, maxBlockDocs = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((9001L, 9002L)),
      s"hot block must drop, cold pair must survive: $pairs")
  }

  test("simhash bucket cap bounds a degenerate corpus (all-identical docs)") {
    // 200 identical docs: every band bucket holds all 200, so an uncapped
    // join would emit ~4 * C(200,2) = 79,600 candidate rows. With the cap
    // the degenerate buckets drop and candidates are zero — exact dedup
    // owns identical texts, not simhash.
    val degenerate = (1L to 200L).map(i => (i, "the same boilerplate text"))
      .toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(degenerate, "doc_id", "text",
      maxBucketDocs = 50)
    assert(capped.count() == 0, "degenerate buckets must be dropped")
    // and a mixed corpus keeps its under-cap pairs while the hot bucket
    // drops: the owl twins share a 2-doc bucket (hamming 0), well under 50
    val mixed = degenerate.union(
      Seq((9001L, "a perfectly unique sentence about owls"),
          (9002L, "a perfectly unique sentence about owls"))
        .toDF("doc_id", "text"))
    val pairs = Dedup.simhashPairs(mixed, "doc_id", "text", maxBucketDocs = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((9001L, 9002L)),
      s"cap must drop only the degenerate bucket, got $pairs")
  }

  test("boilerplate: repeated lines stripped per source, body order kept") {
    val docs = Seq(
      (1L, "s", "banner\nalpha one\nfooter"),
      (2L, "s", "banner\nbeta two\nfooter"),
      (3L, "s", "banner\ngamma three\nfooter"),
      (4L, "s", "banner\nfooter"), // nothing but boilerplate
      (5L, "t", "banner\ndelta four") // same line, different source: df=1
    ).toDF("doc_id", "source", "text")
    val out = pipeline.Boilerplate
      .stripBoilerplate(docs, "doc_id", "text", "source", minDf = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 1L, "alpha one")))
    assert(out(4L) == ((4L, 2L, 0L, "")), "all-boilerplate doc must empty")
    assert(out(5L) == ((5L, 2L, 2L, "banner\ndelta four")),
      "df is per-source; a foreign source's unique lines survive")
    // multi-line body reassembles in original order
    val ordered = pipeline.Boilerplate.stripBoilerplate(
        Seq((9L, "s", "keep one\nkeep two\nkeep three")).toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", minDf = 2)
      .select("text_clean").as[String].head()
    assert(ordered == "keep one\nkeep two\nkeep three")
  }

  test("paragraph dedup keeps exactly the first occurrence in corpus order") {
    val docs = Seq(
      (1L, "quote\nalpha one"),
      (2L, "quote\nbeta two\nquote"), // later copies of quote, incl. in-doc
      (3L, "quote"),                  // nothing but a later duplicate
      (4L, "beta two\ngamma")         // "beta two" is a LINE dup of doc 2's
    ).toDF("doc_id", "text")
    val out = pipeline.ParagraphDedup
      .dedupParagraphs(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 2L, "quote\nalpha one")),
      "first occurrence survives with its document intact")
    assert(out(2L) == ((2L, 3L, 1L, "beta two")),
      "both later copies drop — cross-doc and within-doc")
    assert(out(3L) == ((3L, 1L, 0L, "")), "all-duplicate doc must empty")
    assert(out(4L) == ((4L, 2L, 1L, "gamma")),
      "keep-first is corpus-wide, ordered by (doc, pos)")
  }

  test("paragraph dedup: short paragraphs are exempt below minChars") {
    val docs = Seq(
      (1L, "ok\nlong paragraph body"),
      (2L, "ok\nlong paragraph body")
    ).toDF("doc_id", "text")
    val out = pipeline.ParagraphDedup
      .dedupParagraphs(docs, "doc_id", "text", minChars = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(2L) == ((2L, 2L, 1L, "ok")),
      "the short line survives everywhere; only the long body dedups")
  }

  test("boilerplate reassembly is the identity when nothing is stripped") {
    // an unreachable threshold strips no lines, so split + anti-join +
    // ordered reassembly must reconstruct every document byte-for-byte
    // (the invariant that makes the operator safe to run at any minDf)
    val docs = PipelineQueries.docsAug(spark, TestSpark.sf)
      .limit(200)
      .withColumn("source", (col("doc_id") % 5).cast("string"))
    val out = pipeline.Boilerplate
      .stripBoilerplate(docs, "doc_id", "text", "source", minDf = Int.MaxValue)
    val diff = out.join(docs, Seq("doc_id"))
      .filter(col("text_clean") =!= col("text"))
      .count()
    assert(diff == 0, s"$diff documents were not reconstructed exactly")
  }

  test("cluster representatives: longest member wins, lowest id breaks ties") {
    val pairs = Seq((1L, 3L), (3L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val docs = Seq((1L, 10L), (3L, 99L), (5L, 99L), (7L, 4L), (8L, 4L), (9L, 1L))
      .toDF("doc_id", "len")
    val reps = pipeline.CorpusClean
      .clusterRepresentatives(docs, "doc_id", "len", pairs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // chain {1,3,5}: 3 and 5 tie on score, lowest id 3 represents —
    // NOT keep-lowest-id overall (that would pick 1, the shortest)
    assert(Seq(1L, 3L, 5L).forall(reps(_)._3 == 3L))
    assert(Seq(7L, 8L).forall(reps(_)._3 == 7L))
    assert(!reps.contains(9L), "unclustered docs never enter the decision")
    val surv = pipeline.CorpusClean
      .keepBestPerCluster(docs, "doc_id", "len", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(surv == Set(3L, 7L, 9L),
      "survivors = representatives + unclustered docs")
  }

  test("decontamination flags exactly the docs sharing a benchmark n-gram") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // holds the bench 8-gram at offset 1
      (2L, "totally different words here with no overlap at all present"),
      (3L, "x a b c d e f g h i") // holds it at the tail
    ).toDF("doc_id", "text")
    val bench = Seq("b c d e f g h i").toDF("btext")
    val rep = pipeline.Decontaminate
      .contaminationReport(docs, "doc_id", "text", bench, "btext", n = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // 10 tokens -> 3 distinct 8-grams, 1 matched
    assert(rep.keySet == Set(1L, 3L))
    assert(rep(1L) == ((1L, 1L, 3L, 0.3333)))
    assert(rep(3L) == ((3L, 1L, 3L, 0.3333)))
    // short docs (< n tokens) can never match and never divide by zero
    val short = pipeline.Decontaminate.contaminationReport(
      Seq((7L, "too short")).toDF("doc_id", "text"), "doc_id", "text",
      bench, "btext", n = 8)
    assert(short.count() == 0)
  }

  test("temperature mix flattens the domain distribution, capped at 1") {
    // one fat domain, two thin: z = sqrt(400) + 2*sqrt(50) ~ 34.14;
    // thin rate = 250*7.07/34.14/50 ~ 1.04 -> capped, everything kept;
    // fat rate = 250*20/34.14/400 ~ 0.366 -> downsampled
    val docs = ((1L to 400L).map(i => (i, "fat")) ++
      (401L to 450L).map(i => (i, "thin1")) ++
      (451L to 500L).map(i => (i, "thin2"))).toDF("doc_id", "domain")
    val out = pipeline.Curation
      .temperatureMix(docs, "doc_id", "domain", alpha = 0.5, budget = 250)
    val n = out.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(n("thin1") == 50 && n("thin2") == 50,
      s"thin domains keep everything under the rate cap: $n")
    assert(n("fat") > 100 && n("fat") < 200,
      s"fat domain samples near its 0.366 rate: $n")
    // deterministic: same rows, not just same counts
    val again = pipeline.Curation
      .temperatureMix(docs, "doc_id", "domain", alpha = 0.5, budget = 250)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
    // alpha = 1 degenerates to uniform proportional sampling: one shared
    // rate (budget/corpus), so expectations stay proportional to size
    val prop = pipeline.Curation
      .temperatureMix(docs, "doc_id", "domain", alpha = 1.0, budget = 250)
      .groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(prop("fat").toDouble / 400 > prop.getOrElse("thin1", 0L).toDouble / 50 - 0.2,
      s"alpha=1 keeps domains proportional: $prop")
  }

  test("hash split: deterministic, exhaustive, near the requested weights") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val a = pipeline.Curation.hashSplit(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val b = pipeline.Curation.hashSplit(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a == b, "re-run must assign identically")
    val total = a.values.sum
    assert(a.keySet == Set("train", "val", "test"))
    assert(math.abs(a("train").toDouble / total - 0.8) < 0.05, s"train ${a("train")}")
    // membership stable under corpus growth: a doc's split never depends
    // on other rows
    val half = pipeline.Curation.hashSplit(
      docs.filter(col("doc_id") % 2 === 0), "doc_id")
    val full = pipeline.Curation.hashSplit(docs, "doc_id")
      .filter(col("doc_id") % 2 === 0)
    assert(half.select("doc_id", "split").except(
      full.select("doc_id", "split")).count() == 0)
  }

  test("pii redaction scrubs planted spans and leaves clean text alone") {
    val piiDoc = Seq((1L, "reach me at jane.doe@corp.io or 555-123-4567 from 10.0.0.7"))
      .toDF("id", "text")
    val red = piiDoc.select(TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].head()
    assert(red == "reach me at [EMAIL] or [PHONE] from [IP]", red)
    val clean = Seq((2L, "no contact details here")).toDF("id", "text")
      .select(TextAnalysis.redactPii(col("text")).as("r")).as[String].head()
    assert(clean == "no contact details here")
  }

  test("vocabulary: df-ordered, min-df filtered, k-bounded") {
    val vocab = pipeline.Curation.vocabulary(
      Tables.documents(spark, TestSpark.sf), "text", minDf = 5, topK = 25)
      .as[(String, Long, Long)].collect()
    assert(vocab.length <= 25)
    assert(vocab.forall(_._2 >= 5), "min-df respected")
    assert(vocab.sortBy(t => (-t._2, t._1)).toSeq == vocab.toSeq, "df-desc order")
    assert(vocab.map(_._3).toSeq == (1L to vocab.length).toSeq, "dense ranks")
  }

  test("label centroids: unit-dominated norms and full label coverage") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val cents = pipeline.Similarity.labelCentroids(emb, "label", "embedding")
    val rows = cents.select("label", "n_vectors", "centroid_norm")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == emb.select("label").distinct().count())
    assert(rows.map(_._2).sum == emb.count(), "every vector counted once")
    // vectors are unit-norm; a mean of unit vectors has norm in (0, 1]
    assert(rows.forall(r => r._3 > 0 && r._3 <= 1.0001), rows.take(3).toSeq)
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    val width = cents.select(size(col("centroid"))).distinct().as[Int].collect()
    assert(width.toSeq == Seq(dim), "centroid has the corpus dimensionality")
  }

  test("null text is dropped at the quality gate; null ids land in the last split") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then some more " * 8),
      (2L, null.asInstanceOf[String]),
      (3L, "a solid document with enough words to pass the quality gate " * 10))
      .toDF("doc_id", "text")
    val r = pipeline.CorpusClean.clean(docs, "doc_id", "text", minQuality = 0.1)
    val kept = r.survivors.select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(2L), "null text must not survive the quality gate")
    assert(r.nRaw == 3 && r.nAfterQuality == 2)

    val ids = Seq(Some(1L), None, Some(3L)).toDF("id")
    val splits = pipeline.Curation.hashSplit(ids, "id")
      .as[(Option[Long], String)].collect().toMap
    assert(splits(None) == "test", "null id lands deterministically in the last split")

    // null text must predict null language, not fall through to 'fr'
    val lang = Seq((1L, null.asInstanceOf[String]), (2L, "le la les des est"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, Option[String])].collect().toMap
    assert(lang(1L).isEmpty && lang(2L).contains("fr"), lang.toString)
  }

  test("quality score stays in [0,1]; langId picks a marker language") {
    val scored = Tables.documents(spark, TestSpark.sf)
      .select(TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.langId(col("text")).as("l"))
    val bad = scored.filter(col("q") < 0 || col("q") > 1).count()
    assert(bad == 0)
    val langs = scored.select("l").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr")))
  }

  test("kmeans: exhaustive assignment, deterministic, twin co-location") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val asg = Similarity.kmeansAssign(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    val rows = asg.select("id", "cid").as[(Long, Long)].collect()
    // every vector assigned exactly once, to a surviving cluster
    assert(rows.length.toLong == emb.count())
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.map(_._2).distinct.length > 1, "clustering must split")
    // deterministic: a re-run reproduces the identical assignment
    val rerun = Similarity.kmeansAssign(emb, "vec_id", "embedding",
        k = 8, iters = 2)
      .select("id", "cid").as[(Long, Long)].collect()
    assert(rerun.sortBy(_._1).sameElements(rows.sortBy(_._1)))
    // identical twins always co-locate: identical vectors get identical
    // rounded sims against every centroid, so the argmax cannot diverge
    val planted = SimilarityQueries.embAug(spark, TestSpark.sf)
    val m = Similarity.kmeansAssign(planted, "vec_id", "embedding",
        k = 8, iters = 2)
      .select("id", "cid").as[(Long, Long)].collect().toMap
    m.keys.filter(_ >= 1000000).foreach { id =>
      assert(m(id) == m(id - 1000000),
        "identical twin must land in the identical cluster")
    }
  }

  test("kmeans large-k: broadcast-join assignment matches the literal argmax") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    // identical k forced through both physical shapes must agree exactly
    // (same rounded sims, same csim-desc/cid-asc tie-break)
    val viaLiteral = Similarity.kmeansAssign(emb, "vec_id", "embedding",
        k = 8, iters = 2, maxLiteralK = Int.MaxValue)
      .select("id", "cid", "sim").as[(Long, Long, Double)].collect().sortBy(_._1)
    val viaJoin = Similarity.kmeansAssign(emb, "vec_id", "embedding",
        k = 8, iters = 2, maxLiteralK = 0)
      .select("id", "cid", "sim").as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(viaJoin.sameElements(viaLiteral))

    // production-sized k routes through the join path by default
    // (k > LiteralAssignMaxK), clear of the codegen 64 KB method ceiling
    // the literal form would hit
    assert(Similarity.LiteralAssignMaxK < 512)
    val big = (0 until 600).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val rows = Similarity.kmeansAssign(big, "vec_id", "embedding",
        k = 512, iters = 1)
      .select("id", "cid").as[(Long, Long)].collect()
    assert(rows.length == 600, "every vector assigned")
    assert(rows.map(_._1).distinct.length == 600, "assigned exactly once")
    assert(rows.map(_._2).distinct.length > 100, "large-k split must hold")
  }

  test("semantic dedup removes every planted twin and keeps all originals") {
    val planted = SimilarityQueries.embAug(spark, TestSpark.sf)
    val removed = Similarity.semanticDupRemovals(planted,
        "vec_id", "embedding", k = 8, iters = 2, minSim = 0.95)
      .select("id").as[Long].collect().toSet
    val twins = planted.filter(col("vec_id") >= 1000000)
      .select("vec_id").as[Long].collect().toSet
    assert(twins.nonEmpty)
    // greedy keep-lowest-id: the planted twin (higher id) goes, its
    // original stays. Exact twins always share a cluster (identical
    // rounded sims, identical tie-break) so blocking cannot hide them,
    // and the raw corpus has no 0.95+ pairs (max within-label cosine
    // ~0.47) so nothing else may be removed.
    assert(removed == twins,
      s"missed ${(twins -- removed).take(3)}, extra ${(removed -- twins).take(3)}")
  }

  test("hashed linear classifier: deterministic, bounded, matches manual md5") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "Gamma!"))
      .toDF("doc_id", "text")
    val scored = docs.select(col("doc_id"),
        TextAnalysis.hashedLinearScore(col("text"), 4096, "qc").as("s"))
      .as[(Long, Double)].collect().toMap
    assert(scored(1L) == scored(2L), "same text, same score")
    assert(scored.values.forall(s => s > 0.0 && s < 1.0))
    // replicate the hashing trick on the driver for one document
    def h14(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(7).map("%02x".format(_)).mkString,
      16)
    val z = Seq("alpha", "beta")
      .map(t => h14(s"qc:${h14(t) % 4096}") / math.pow(16, 14) - 0.5)
      .foldLeft(0.0)(_ + _) / 2
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored(1L) == expected, s"got ${scored(1L)}, want $expected")
  }

  test("bloom-prefiltered decontamination equals the exact report") {
    import graft.pipeline.Decontaminate
    val docs = Tables.documents(spark, TestSpark.sf)
    val bench = docs.filter(col("doc_id") % 31 === 0)
      .select(array_join(
        slice(TextAnalysis.tokens(col("text")), 3, 16), " ").as("btext"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_matched", "n_grams", "overlap_frac")
        .as[(Long, Long, Long, Double)].collect().toSet
    val exact = rows(Decontaminate.contaminationReport(
      docs, "doc_id", "text", bench, "btext", n = 6))
    val bloomed = rows(Decontaminate.contaminationReportBloom(
      docs, "doc_id", "text", bench, "btext", n = 6, fpp = 0.01))
    // no false negatives + exact confirm join → identical result sets
    assert(exact.nonEmpty && bloomed === exact)
  }

  test("ANN semantic decontamination: full probe equals exact; " +
    "partial probe is a subset with bounded recall") {
    import graft.pipeline.Decontaminate
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val bench = emb.filter(col("vec_id") % 23 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("bench_vec_id"), col("max_sim"))
        .as[(Long, Long, Double)].collect().toSet
    val exact = rows(Decontaminate.semanticContaminationReport(
      emb, "vec_id", "embedding", bench, "vec_id", "embedding",
      minSim = 0.25))
    assert(exact.nonEmpty, "fixture must flag contaminated vectors")
    // nProbe = nCentroids: every inverted list is probed, so every
    // (corpus, bench) pair is scored — identical to the exact crossJoin
    val full = rows(Decontaminate.semanticContaminationReportAnn(
      emb, "vec_id", "embedding", bench, "vec_id", "embedding",
      minSim = 0.25, nCentroids = 8, nProbe = 8))
    assert(full === exact, "full-probe ANN must equal the exact report")
    // partial probe: flagged ids are a subset of the exact report's
    // (routing can only DROP candidate pairs, never invent similarity),
    // and recall stays above a floor on this fixture
    val part = rows(Decontaminate.semanticContaminationReportAnn(
      emb, "vec_id", "embedding", bench, "vec_id", "embedding",
      minSim = 0.25, nCentroids = 8, nProbe = 2))
    val exactIds = exact.map(_._1)
    val partIds = part.map(_._1)
    assert(partIds.subsetOf(exactIds),
      s"ANN flagged ids absent from exact: ${(partIds -- exactIds).take(3)}")
    // every partial hit's similarity is ≤ the exact max for that id
    val exactBest = exact.map(t => t._1 -> t._3).toMap
    assert(part.forall { case (id, _, s) => s <= exactBest(id) })
    val recall = partIds.size.toDouble / exactIds.size
    assert(recall >= 0.5, s"2-of-8-probe recall $recall below floor")
    // large-quantizer route (nCentroids past the codegen ceiling —
    // forced here via maxLiteralK = 0): the window-ranked probe router
    // must equal the exact report at full probe and the literal route
    // bit-for-bit at partial probe (same ranking, same tie-break)
    val fullBig = rows(Decontaminate.semanticContaminationReportAnn(
      emb, "vec_id", "embedding", bench, "vec_id", "embedding",
      minSim = 0.25, nCentroids = 8, nProbe = 8, maxLiteralK = 0))
    assert(fullBig === exact, "window-routed full probe diverged from exact")
    val partBig = rows(Decontaminate.semanticContaminationReportAnn(
      emb, "vec_id", "embedding", bench, "vec_id", "embedding",
      minSim = 0.25, nCentroids = 8, nProbe = 2, maxLiteralK = 0))
    assert(partBig === part, "window and literal probe routes diverged")
    // and a GENUINE past-the-ceiling quantizer (300 > LiteralAssignMaxK
    // = 256, bench = the full embedding table): both the probe router
    // and the bench-side inversion take their large-k arms at real
    // size — no codegen blowup, still exact at full probe
    val exactAll = rows(Decontaminate.semanticContaminationReport(
      emb, "vec_id", "embedding", emb, "vec_id", "embedding",
      minSim = 0.25))
    val annAll = rows(Decontaminate.semanticContaminationReportAnn(
      emb, "vec_id", "embedding", emb, "vec_id", "embedding",
      minSim = 0.25, nCentroids = 300, nProbe = 300))
    assert(annAll === exactAll, "300-list full probe diverged from exact")
    // DUPLICATE corpus ids with DIFFERENT vectors: the literal route
    // probes per row, so the window route must rank per (id, vector)
    // too — id-only partitioning starved one duplicate's nearest lists
    // and could lower its reported max similarity
    val dup = emb.unionByName(
      emb.withColumn("embedding", reverse(col("embedding"))))
    val partDupLit = rows(Decontaminate.semanticContaminationReportAnn(
      dup, "vec_id", "embedding", bench, "vec_id", "embedding",
      minSim = 0.25, nCentroids = 8, nProbe = 2))
    val partDupWin = rows(Decontaminate.semanticContaminationReportAnn(
      dup, "vec_id", "embedding", bench, "vec_id", "embedding",
      minSim = 0.25, nCentroids = 8, nProbe = 2, maxLiteralK = 0))
    assert(partDupWin === partDupLit,
      "probe routes diverged on duplicate corpus ids")
  }

  test("JL random projection: deterministic, norm distortion bounded") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val d = col("embedding").cast("array<double>")
    def ratios(seed: String) = emb
      .filter(Similarity.norm(d) > 0.1)
      .select(col("vec_id"),
        (graft.functions.Let.let(
          Similarity.randomProjection(col("embedding"), dim, 16, seed),
          p => Similarity.norm(p)) / Similarity.norm(d)).as("r"))
      .as[(Long, Double)].collect().toMap
    val r1 = ratios("jl")
    assert(ratios("jl") === r1, "seeded matrix is deterministic")
    // JL with k=16: distortion concentrates around 1; bound loosely and
    // require the MEAN to sit tight (per-vector variance ~1/sqrt(k))
    assert(r1.values.forall(r => r > 0.25 && r < 2.5))
    val mean = r1.values.sum / r1.size
    assert(math.abs(mean - 1.0) < 0.2, s"mean ratio $mean")
    // a different seed gives a genuinely different matrix
    val r2 = ratios("jl2")
    assert(r1.keys.exists(k => math.abs(r1(k) - r2(k)) > 1e-6))
  }

  test("zero vectors survive cosine, normalize, and quantize (ANSI mode)") {
    // Spark 4's default ANSI mode throws DIVIDE_BY_ZERO even for DOUBLE
    // division — one zero vector in a corpus must not crash the job
    val df = Seq(
        (1L, Array(0.0f, 0.0f, 0.0f)),
        (2L, Array(3.0f, 0.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val d = col("embedding").cast("array<double>")
    val row = df.select(
        Similarity.cosine(d, d).as("self_cos"),
        Similarity.norm(Similarity.l2Normalize(col("embedding"))).as("nn"),
        Similarity.quantizeInt8(col("embedding")).as("q"))
      .orderBy("self_cos")
      .collect()
    // zero vector: cosine 0 (similar to nothing), unchanged by
    // normalize, quantizes to all zeros
    assert(row(0).getDouble(0) == 0.0 && row(0).getDouble(1) == 0.0)
    assert(row(0).getSeq[Int](2) == Seq(0, 0, 0))
    // nonzero vector: self-cosine 1, unit norm, max component at 127
    assert(math.abs(row(1).getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(row(1).getDouble(1) - 1.0) < 1e-9)
    assert(row(1).getSeq[Int](2).max == 127)
  }

  test("span corruption: coverage bounds and the density target") {
    import graft.pipeline.Curation
    val rows = Curation.spanCorruptionPlan(
        Tables.documents(spark, TestSpark.sf), "doc_id", "text",
        density = 0.15, spanLen = 3)
      .select("n_tok", "n_spans", "n_masked")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((nTok, nSpans, nMasked) <- rows) {
      assert(nMasked <= nTok)
      // merged coverage: at least one token per span, at most spanLen
      assert(nSpans == 0 || (nMasked >= nSpans && nMasked <= 3 * nSpans))
    }
    // corpus-level masked fraction lands near the requested density
    val frac = rows.map(_._3).sum.toDouble / rows.map(_._1).sum
    assert(frac > 0.10 && frac < 0.20, s"masked fraction $frac")
  }

  test("hard negatives: cross-label only, and the exact label-filtered top-k") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter(col("vec_id") % 100 === 0)
    val negs = Similarity.hardNegatives(emb, q, "vec_id", "embedding",
        "label", k = 3)
      .select("query_id", "query_label", "neighbor_id", "neighbor_label",
        "sim", "rank")
      .as[(Long, Int, Long, Int, Double, Int)].collect()
    assert(negs.nonEmpty)
    assert(negs.forall { case (_, ql, _, nl, _, _) => ql != nl })
    // agrees with brute-force ranking restricted to other labels
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val full = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
        k = emb.count().toInt)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    val expected = full
      .filter { case (qid, nid, _) => labels(qid) != labels(nid) }
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, nid, sim), i) => (qid, nid, sim, i + 1) }
      }.toSet
    val got = negs.map { case (qid, _, nid, _, sim, r) => (qid, nid, sim, r) }
      .toSet
    assert(got === expected)
  }

  test("group-aware split never strands near-dup pairs across splits") {
    import graft.pipeline.{Curation, Winnowing}
    val pairs = Winnowing.pairs(docsAug, "doc_id", "text",
      8, 4, minShared = 5, maxDocFreq = 20).select("id_a", "id_b")
    assert(pairs.count() > 0, "fixture must contain near-dup pairs")
    val split = Curation
      .groupAwareSplit(docsAug.select("doc_id", "text"), "doc_id", pairs)
      .select(col("doc_id"), col("split"))
    val byId = split.as[(Long, String)].collect().toMap
    // every planted near-dup pair shares a split
    val straddling = pairs.as[(Long, Long)].collect()
      .filter { case (a, b) => byId(a) != byId(b) }
    assert(straddling.isEmpty, s"straddling pairs: ${straddling.take(3).toSeq}")
    // and the plain hash split DOES strand at least one pair on this
    // fixture — the property is not vacuous
    val naive = Curation.hashSplit(docsAug.select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), col("split"))
      .as[(Long, String)].collect().toMap
    assert(pairs.as[(Long, Long)].collect()
      .exists { case (a, b) => naive(a) != naive(b) })
  }

  test("BPE merge learning matches the closed-form low/lower example") {
    import graft.pipeline.Bpe
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.learnMerges(spark, Bpe.wordCounts(docs, "text"), 4)
    // pairs round 1: (l,o)=7 ties (o,w)=7 → lexicographic → (l,o)
    // round 2: (lo,w)=7; round 3: (e,r)=2 ties (low,e)=2 → (e,r)
    // round 4: (low,er)=2
    assert(merges.map(m => (m.l_sym, m.r_sym, m.pair_count)) == Seq(
      ("l", "o", 7L), ("lo", "w", 7L), ("e", "r", 2L), ("low", "er", 2L)))
    // encoding with the learned ladder: merge 4 folds low+er, so BOTH
    // words end fully merged — 1 symbol each
    val enc = docs.select(
        Bpe.encodedSymbolCount(col("text"), merges).as("n"))
      .as[Long].collect()
    assert(enc.sum == 5 * 1 + 2 * 1)
    // and with only the first 3 merges, "lower" stays (low, er) = 2
    val enc3 = docs.select(
        Bpe.encodedSymbolCount(col("text"), merges.take(3)).as("n"))
      .as[Long].collect()
    assert(enc3.sum == 5 * 1 + 2 * 2)
    // merge exhaustion stops early instead of looping
    assert(Bpe.learnMerges(spark, Bpe.wordCounts(docs, "text"), 50)
      .size < 50)
  }

  test("batched BPE training: window=1 degenerates to sequential; " +
    "batches are mutually disjoint; job count is O(rounds)") {
    import graft.pipeline.Bpe
    val docs = (Seq.fill(5)("low slow") ++ Seq.fill(3)("lower glow") ++
      Seq.fill(2)("newest widest"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val units = Bpe.bigramUnitCounts(docs, "text")
    // window=1 is per-round top-1 → must replay learnMerges exactly
    // (same argmax, same tie-break, same merge application)
    val seqM = Bpe.learnMerges(spark, units.withColumnRenamed("u", "word"), 8)
    val b1 = Bpe.learnMergesBatched(spark, units, 8, window = 1)
    assert(b1.map(m => (m.rank, m.l_sym, m.r_sym, m.pair_count)) ===
      seqM.map(m => (m.rank, m.l_sym, m.r_sym, m.pair_count)))
    assert(b1.forall(m => m.round == m.rank), "window=1 → one merge/round")
    // wide window: every round's batch is mutually disjoint on
    // {l, r, l+r} triples (the invariant that makes within-batch
    // application order-free and each selection's count truthful)
    val wide = Bpe.learnMergesBatched(spark, units, 20, window = 16)
    assert(wide.size == 20)
    assert(wide.map(_.rank) == (1 to 20), "dense global ranks")
    wide.groupBy(_.round).foreach { case (round, batch) =>
      val triples = batch.map(m => Set(m.l_sym, m.r_sym, m.l_sym + m.r_sym))
      for (i <- triples.indices; j <- 0 until i)
        assert(triples(i).intersect(triples(j)).isEmpty,
          s"round $round: overlapping merges ${batch(i)} / ${batch(j)}")
      // within a round, batch order follows the candidate ranking
      assert(batch.sortBy(_.rank) == batch.sortBy(m => (-m.pair_count,
        m.l_sym, m.r_sym)) || batch.size <= 1 ||
        // ties across equal counts keep lexicographic candidate order
        batch.map(_.rank).zip(batch.map(_.rank).sorted).forall(p => p._1 == p._2))
    }
    // batching must compress rounds: 20 merges in far fewer than 20
    assert(wide.map(_.round).max < 10,
      s"expected <10 rounds, got ${wide.map(_.round).max}")
    // exhaustion stops cleanly
    assert(Bpe.learnMergesBatched(spark, units, 500, window = 16)
      .size < 500)
    // the driver-local fast path (default) and the distributed loop
    // (forced via driverVocabLimit = 0) are the same algorithm — byte
    // identical output, including round assignment
    val dist = Bpe.learnMergesBatched(spark, units, 20, window = 16,
      driverVocabLimit = 0)
    assert(dist === wide, "local and distributed batched training diverged")
  }

  test("codegen'd BPE encode equals the fold form on adversarial " +
    "spellings") {
    import graft.pipeline.Bpe
    // runs sharing the delimiter space, cascading ladders (aa then
    // aa+a), multi-char symbols, a supplementary character, empties
    val supp = new String(Character.toChars(0x10000))
    val merges = Seq(
      Bpe.Merge(1, "a", "a", 0L), Bpe.Merge(2, "aa", "a", 0L),
      Bpe.Merge(3, "b", "c", 0L), Bpe.Merge(4, "bc", "bc", 0L),
      Bpe.Merge(5, supp, "x", 0L))
    val words = Seq("aaaa", "aaaaaaa", "a", "", "bcbcbc", "abcabcb",
      s"${supp}x${supp}xa", "xyzzy", "aaabc")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "w")
    // fold form: k chained applyMerge folds over the spaced spelling
    val foldN = df.select(col("id"), graft.functions.Let.let(
        merges.foldLeft(trim(regexp_replace(col("w"), "(.)", "$1 "))
          : org.apache.spark.sql.Column) {
          case (acc, m) => Bpe.applyMerge(acc, m.l_sym, m.r_sym)
        },
        enc => when(col("w") === "", 0L)
          .otherwise(size(split(enc, " ")).cast("long"))).as("n"))
      .as[(Long, Long)].collect().toMap
    val exprN = df.select(col("id"),
        graft.functions.VectorFunctions.bpeCount(array(col("w")), merges
          .map(m => (m.l_sym, m.r_sym))).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(exprN === foldN, "expression and fold forms diverged")
    // closed-form spot checks: aaaa → (aa)(aa) → (aaa)a? no — greedy
    // l-t-r: a a a a → aa aa (merge 1), then aa+a never matches (both
    // tokens are 'aa') → 2; aaaaaaa (7) → aa aa aa a → aaa? merge 2
    // rewrites (aa,a): aa aa (aa a→aaa) → wait, trailing-only pairing:
    // merge1: aa aa aa a; merge2 (aa,a): last pair (aa,a) → aa aa aaa
    // = 3 tokens
    assert(exprN(0L) == 2L && exprN(1L) == 3L && exprN(3L) == 0L)
    // empty ladder: pure code-point count (array() cast path)
    val zero = df.select(col("id"),
        graft.functions.VectorFunctions
          .bpeCount(array(col("w")), Seq.empty).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(zero(0L) == 4L && zero(6L) == 5L && zero(3L) == 0L)
    // the pieces twin shares the kernel: its arrays must concatenate
    // back to the word and its sizes must equal the count form on the
    // same adversarial spellings
    val pieces = df.select(col("id"), col("w"),
        graft.functions.VectorFunctions.bpePieces(array(col("w")),
          merges.map(m => (m.l_sym, m.r_sym))).as("p"))
      .as[(Long, String, Seq[String])].collect()
    pieces.foreach { case (id, w, p) =>
      assert(p.size.toLong == exprN(id),
        s"pieces size vs count diverged for '$w': $p")
      assert(p.mkString == w, s"pieces must respell '$w', got $p")
    }
    // closed-form: aaaaaaa → [aa, aa, aaa] (merge2 rewrites the
    // trailing (aa, a) pair only)
    assert(pieces.find(_._1 == 1L).get._3 == Seq("aa", "aa", "aaa"))
    // multi-word document: pieces flatten in word order
    val doc = Seq((0L, Seq("aaaa", "bcbc"))).toDF("id", "ws")
    val flat = doc.select(graft.functions.VectorFunctions.bpePieces(
        col("ws"), merges.map(m => (m.l_sym, m.r_sym))).as("p"))
      .as[Seq[String]].head()
    assert(flat == Seq("aa", "aa", "bcbc"),
      s"flattened document pieces wrong: $flat")
  }

  test("batched BPE local path tie-breaks by UTF-8 bytes like the " +
    "distributed path") {
    import graft.pipeline.Bpe
    // U+FFFD (UTF-8 EF BF BD) vs U+10000 (UTF-8 F0 90 80 80): UTF-16
    // code-unit order says U+10000 < U+FFFD (D800 < FFFD) — the exact
    // divergence the byte comparator closes
    val hi = new String(Character.toChars(0x10000))
    assert(Bpe.utf8Compare("\uFFFD", hi) < 0 && "\uFFFD".compareTo(hi) > 0)
    val units = Seq(
      ("\uFFFDz", 5L, "\uFFFD z"),
      (hi + "z", 5L, s"$hi z")).toDF("u", "f", "sym")
    val local = Bpe.learnMergesBatched(spark, units, 2, window = 1)
    val dist = Bpe.learnMergesBatched(spark, units, 2, window = 1,
      driverVocabLimit = 0)
    assert(local === dist, "tie-break diverged between paths")
    assert(local.head.l_sym == "\uFFFD", "UTF-8 byte order must win ties")
  }

  test("chunking covers every token with the declared overlap") {
    import graft.pipeline.Curation
    val docs = Tables.documents(spark, TestSpark.sf)
    val chunk = 64; val stride = 48
    val rows = Curation
      .chunkDocuments(docs, "doc_id", "text", chunk, stride)
      .select("doc_id", "chunk_idx", "chunk_tok")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val nTok = docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(rows.nonEmpty && rows.keySet === nTok.keySet)
    for ((id, cs) <- rows) {
      val sorted = cs.sortBy(_._2)
      // contiguous indexes from 0; each chunk is exactly the window the
      // contract slices (full-size until the document end truncates it)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq)
      assert(sorted.forall { case (_, i, t) =>
        t == math.min(chunk.toLong, nTok(id) - i * stride)
      }, s"doc $id chunk size mismatch")
      // last chunk ends exactly at the document end → full coverage
      val last = sorted.last
      assert(last._2 * stride + last._3 == nTok(id), s"doc $id tail gap")
    }
  }

  test("budget selection keeps the best-quality prefix within budget") {
    import graft.pipeline.Curation
    val docs = Tables.documents(spark, TestSpark.sf)
    val budget = 2000L
    val kept = Curation
      .budgetSelect(docs, "doc_id", "text", "source", budget)
      .select("doc_id", "source", "n_tok", "quality")
      .as[(Long, String, Long, Double)].collect()
      .groupBy(_._2)
    val all = docs.select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, String, Long, Double)].collect()
      .groupBy(_._2)
    assert(kept.nonEmpty)
    for ((domain, ks) <- kept) {
      // overshoot bounded by one document
      val sum = ks.map(_._3).sum
      assert(sum - ks.map(_._3).max < budget, s"$domain sum=$sum")
      // kept set is exactly the greedy prefix of the quality ordering
      val ordered = all(domain).sortBy(t => (-t._4, t._1))
      val prefix = ordered
        .scanLeft(0L)(_ + _._3).zip(ordered)
        .takeWhile { case (cumBefore, _) => cumBefore < budget }
        .map(_._2._1).toSet
      assert(ks.map(_._1).toSet === prefix, s"$domain prefix mismatch")
    }
  }

  test("exportShards: hive layout, one data file per shard, stable re-export") {
    import graft.pipeline.Export
    val tmp = java.nio.file.Files.createTempDirectory("graft-exp").toString
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id", "lang")
    val m1 = Export.exportShards(docs, "doc_id", s"$tmp/s", 4)
      .orderBy("shard").collect().toSeq
    val root = new java.io.File(s"$tmp/s")
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("shard=")))
    // repartition-by-shard means one writer task per shard → one file
    dirs.foreach { d =>
      val parts = new java.io.File(root, d).listFiles()
        .filter(f => f.getName.startsWith("part-"))
      assert(parts.length === 1, s"$d has ${parts.length} part files")
    }
    // re-export of the unchanged corpus is bit-stable (manifest equal,
    // INCLUDING each shard's order-invariant content digest)
    val m2 = Export.exportShards(docs, "doc_id", s"$tmp/s2", 4)
      .orderBy("shard").collect().toSeq
    assert(m1 === m2)
    // no row dropped or duplicated by the writer
    assert(m1.map(_.getLong(1)).sum === docs.count())

    // TAMPER: rewrite one shard with a single value changed — counts and
    // id bounds cannot see it; the content digest must flip, and only
    // the tampered shard's
    val tampered = spark.read.parquet(s"$tmp/s")
      .withColumn("lang",
        when(col("shard") === 1 &&
            col("doc_id") === min(col("doc_id"))
              .over(org.apache.spark.sql.expressions.Window
                .partitionBy("shard")),
          concat(col("lang"), lit("X"))).otherwise(col("lang")))
    tampered.repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(s"$tmp/st")
    val m3 = Export.manifest(spark, s"$tmp/st", "doc_id")
      .orderBy("shard").collect().toSeq
    m1.zip(m3).foreach { case (a, b) =>
      val shard = a.getInt(0)
      assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2),
        s"tamper must be invisible to counts/bounds (shard $shard)")
      if (shard == 1)
        assert(a.getLong(4) != b.getLong(4),
          "tampered shard's content digest must flip")
      else
        assert(a.getLong(4) == b.getLong(4),
          s"untampered shard $shard's digest must not move")
    }
  }

  test("count_phrases equals brute-force contains on adversarial strings") {
    import graft.functions.VectorFunctions.countPhrases
    // heavy overlap: prefixes of each other, self-overlapping, shared
    // suffixes — the cases where failure links and output inheritance
    // can silently go wrong
    val dict = Seq("a", "ab", "aba", "bb", "bab", "abab", "aaa", "ba")
    val rnd = new scala.util.Random(5)
    val texts = Seq.fill(80)(
      Seq.fill(rnd.nextInt(30))("ab".charAt(rnd.nextInt(2))).mkString) ++
      Seq("", "ababab", "aaaa", "bbbb", "xyz")
    val got = texts.toDF("t")
      .select(countPhrases(col("t"), dict)).as[Int].collect().toSeq
    val want = texts.map(t => dict.count(p => t.contains(p)))
    assert(got === want)
  }

  test("count_phrases on multi-byte UTF-8 phrases and via SQL registry") {
    import graft.functions.VectorFunctions
    val dict = Seq("naïve", "café", "é na")
    val got = Seq("the café naïve one", "plain", "")
      .toDF("t")
      .select(VectorFunctions.countPhrases(col("t"), dict))
      .as[Int].collect().toSeq
    assert(got === Seq(3, 0, 0))
    VectorFunctions.register(spark)
    assert(spark.sql(
      "SELECT count_phrases('xabay', array('ab', 'ba', 'zz')) AS c")
      .as[Int].head() === 2)
  }

  test("nfc_normalize composes decomposed sequences; identity on NFC text") {
    import graft.functions.VectorFunctions.nfcNormalize
    val rows = Seq(
      ("café", "café"), // e + combining acute → é
      ("naïve", "naïve"), // i + combining diaeresis → ï
      ("plain ascii", "plain ascii"),
      ("café", "café") // already NFC: unchanged
    ).toDF("raw", "want")
    val got = rows.select(nfcNormalize(col("raw")).as("got"), col("want"))
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g === w) }
    // idempotent, and usable from SQL text (registry path)
    graft.functions.VectorFunctions.register(spark)
    val twice = spark.sql(
      "SELECT nfc_normalize(nfc_normalize('café')) AS x")
      .as[String].head()
    assert(twice === "café")
    // null-safe
    val n = rows.select(nfcNormalize(lit(null).cast("string"))).head().isNullAt(0)
    assert(n)
  }
}
