package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.pipeline.{Curation, TextAnalysis}

/** Property-based invariants for the curation operators: these must hold
  * for ANY corpus, not just the fixture tables.
  */
class CurationProps extends Properties("curation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each case runs Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genIds: Gen[List[Long]] = for {
    n <- Gen.choose(50, 300)
    ids <- Gen.listOfN(n, Gen.choose(0L, 1000000L))
  } yield ids.distinct

  property("hashSplit partitions exhaustively and independently of corpus") =
    Prop.forAll(genIds) { ids =>
      val df = ids.toDF("id")
      val assigned = Curation.hashSplit(df, "id")
        .as[(Long, String)].collect().toMap
      val half = Curation.hashSplit(ids.take(ids.size / 2).toDF("id"), "id")
        .as[(Long, String)].collect().toMap
      // every row assigned exactly one of the three splits
      val exhaustive = assigned.size == ids.size &&
        assigned.values.forall(Set("train", "val", "test"))
      // membership is a pure function of the id — subsets agree
      val independent = half.forall { case (id, s) => assigned(id) == s }
      exhaustive && independent
    }

  private val genText: Gen[String] = for {
    words <- Gen.listOf(Gen.oneOf(
      "alpha", "beta", "x1", "reach", "me", "at",
      "a.user@mail.example.org", "555-123-4567", "10.20.30.40",
      "punct!", "end."))
  } yield words.mkString(" ")

  property("redactPii is idempotent and leaves no pattern behind") =
    Prop.forAll(Gen.listOfN(20, genText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val once = df.select(col("id"),
        TextAnalysis.redactPii(col("text")).as("r"))
      val twice = once.select(col("id"),
        TextAnalysis.redactPii(col("r")).as("r"))
      val stable = once.as[(Long, String)].collect().toMap ==
        twice.as[(Long, String)].collect().toMap
      val leftovers = once
        .filter(
          TextAnalysis.piiEmailCount(col("r")) +
            TextAnalysis.piiPhoneCount(col("r")) +
            TextAnalysis.piiIpCount(col("r")) > 0)
        .count()
      stable && leftovers == 0
    }

  property("vocabulary ranks are dense, df-sorted, and min-df bounded") =
    Prop.forAll(Gen.listOfN(60, genText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val vocab = Curation.vocabulary(df, "text", minDf = 2, topK = 10)
        .as[(String, Long, Long)].collect().toSeq
      vocab.forall(_._2 >= 2) &&
        vocab.map(_._3) == (1L to vocab.size) &&
        vocab.sortBy(t => (-t._2, t._1)) == vocab
    }

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(20, 80)
    texts <- Gen.listOfN(n, genText)
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("chunking reassembles every document exactly") =
    Prop.forAll(genDocs, Gen.choose(2, 10), Gen.choose(1, 10)) {
      (docs, chunk, stride0) =>
        val stride = math.min(stride0, chunk) // overlap or tiling, never gaps
        val df = docs.toDF("id", "text")
        val got = Curation.chunkDocuments(df, "id", "text", chunk, stride)
          .select("id", "chunk_idx", "chunk_tok", "chunk_hash")
          .as[(Long, Long, Long, String)].collect()
          .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
        def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        docs.forall { case (id, text) =>
          val w = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
          val expect = (0 to (w.length - 1) / stride).map { i =>
            val ck = w.slice(i * stride, i * stride + chunk)
            (id, i.toLong, ck.length.toLong, md5(ck.mkString(" ")))
          }
          got(id).toSeq == expect
        }
    }

  property("budgetSelect: per-domain overshoot is at most one document") =
    Prop.forAll(genDocs, Gen.choose(5L, 200L)) { (docs, budget) =>
      val df = docs.toDF("id", "text")
        .withColumn("dom", (col("id") % 3).cast("string"))
      val kept = Curation.budgetSelect(df, "id", "text", "dom", budget)
        .select("dom", "n_tok")
        .as[(String, Long)].collect().groupBy(_._1)
      kept.values.forall { rows =>
        val sum = rows.map(_._2).sum
        sum - rows.map(_._2).max < budget
      }
    }

  property("BPE encode agrees with a driver-side replay on any corpus") =
    Prop.forAll(genDocs, Gen.choose(1, 5)) { (docs, k) =>
      import graft.pipeline.Bpe
      val df = docs.toDF("id", "text")
      val merges = Bpe.learnMerges(spark, Bpe.wordCounts(df, "text"), k)
      val got = df.select(col("id"),
          Bpe.encodedSymbolCount(col("text"), merges).as("n"))
        .as[(Long, Long)].collect().toMap
      // replay the merge ladder per word on the driver with the same
      // padded literal-replace semantics (String.replace scans the
      // original left-to-right, like Spark's)
      def encode(word: String): Long = {
        val init = " " + word.trim.map(c => s"$c ").mkString.trim + " "
        val done = merges.foldLeft(init) { (s, m) =>
          s.replace(s" ${m.l_sym} ${m.r_sym} ", s" ${m.l_sym}${m.r_sym} ")
        }
        done.trim.split(" ", -1).length.toLong
      }
      docs.forall { case (id, text) =>
        val words = text.trim.toLowerCase.replaceAll("\\s+", " ")
          .split(" ", -1).filter(_.nonEmpty)
        got(id) == words.map(encode).sum
      }
    }

  property("spanCorruptionPlan masks within bounds for any density knob") =
    Prop.forAll(genDocs, Gen.choose(1, 5)) { (docs, spanLen) =>
      val rows = Curation.spanCorruptionPlan(
          docs.toDF("id", "text"), "id", "text",
          density = 0.3, spanLen = spanLen)
        .select("n_tok", "n_spans", "n_masked")
        .as[(Long, Long, Long)].collect()
      rows.forall { case (nTok, nSpans, nMasked) =>
        nMasked <= nTok &&
          (nSpans == 0 && nMasked == 0 ||
            (nMasked >= nSpans && nMasked <= spanLen.toLong * nSpans))
      }
    }
}
