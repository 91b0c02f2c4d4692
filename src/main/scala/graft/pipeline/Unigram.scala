package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training, hard-EM form
  * (Kudo 2018): seed a candidate vocabulary from weighted substring
  * counts, then alternate Viterbi segmentation of the word table under
  * the current piece scores (E) with score re-estimation from piece
  * usage (M), pruning pieces the corpus stopped using. Differences from
  * the paper, chosen for engine-reproducibility: hard-EM (Viterbi
  * counts, not forward–backward expectations), scores rounded to 6dp
  * before use (cross-engine ln parity — the q66/q35 contract), and a
  * fully deterministic segmentation tie-break (on equal path score,
  * prefer the longer LAST piece, then recurse leftward — the natural
  * backtrack order of the DP).
  *
  * Scale shape (the BPE q90 contract, one step further): the corpus is
  * touched ONCE (word counts — combinable agg over the tokenization);
  * every EM round runs over the DISTINCT-WORD table, which is
  * vocabulary-sized, not corpus-sized, with the piece scores a broadcast
  * map; segmentation is per-word imperative DP inside the executors
  * (genuine per-partition logic — the mapPartitions escape hatch used as
  * intended). Nothing shuffles more than (piece, count) rows.
  */
object Unigram {

  final case class Piece(piece: String, usage: Long, score: Double)

  /** Distinct words with frequencies (whitespace pre-tokenization,
    * words longer than `maxWordLen` excluded from training — both the
    * trainer and its oracle apply the same cap).
    */
  def wordCounts(docs: DataFrame, textCol: String,
      maxWordLen: Int = 16): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")).between(1, maxWordLen))
      .groupBy("word").agg(count(lit(1)).as("f"))

  /** Viterbi segmentation of one word under `score` (max-sum DP, pieces
    * up to `maxPieceLen`). Tie-break: strictly-greater replacement with
    * ascending split points keeps the SMALLEST j per position — the
    * longest last piece — matching the oracle's path ordering.
    */
  def segment(word: String, score: collection.Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val choice = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          score.get(word.substring(j, i)) match {
            case Some(sc) =>
              val t = best(j) + sc
              if (t > best(i)) { best(i) = t; choice(i) = j }
            case None =>
          }
        }
        j += 1
      }
      i += 1
    }
    require(choice(n) >= 0 || n == 0, s"unsegmentable word: $word")
    var out = List.empty[String]
    var pos = n
    while (pos > 0) {
      val j = choice(pos)
      out = word.substring(j, pos) :: out
      pos = j
    }
    out
  }

  /** Candidate-seed relation: weighted substring counts with the
    * `cnt >= minSeedCount OR length(piece) = 1` keep-predicate applied
    * in-plan (a Filter above the final HashAggregate), so only the kept
    * vocabulary crosses to the driver. Exposed so PlanSpec can pin the
    * filter's presence as a plan-shape gate.
    */
  def seedRelation(spark: SparkSession, words: org.apache.spark.sql.Dataset[(String, Long)],
      maxPieceLen: Int, minSeedCount: Long): DataFrame = {
    import spark.implicits._
    words.flatMap { case (w, f) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(maxPieceLen, w.length - i)
      } yield (w.substring(i, i + l), f)
    }.toDF("piece", "f").groupBy("piece").agg(sum("f").as("cnt"))
      .filter(col("cnt") >= minSeedCount || length(col("piece")) === 1)
  }

  /** Train `rounds` hard-EM rounds; returns the final vocabulary with
    * round-`rounds` usage counts and the scores that produced them.
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, minSeedCount: Long = 2,
      rounds: Int = 2, maxWordLen: Int = 16): Seq[Piece] = {
    import spark.implicits._
    val words = wordCounts(docs, textCol, maxWordLen)
      .as[(String, Long)].cache()
    try {
      // seed: weighted substring occurrence counts (row-local fan-out).
      // The minSeedCount filter runs INSIDE the plan, after the combinable
      // sum — the hapax tail (the overwhelming bulk of the distinct
      // substring table over a large corpus) is dropped executor-side and
      // never reaches the driver; the collect is vocab-bounded. Length-1
      // pieces always survive (coverage guarantee), so the character set
      // falls out of the same filtered relation.
      val seedKept = seedRelation(spark, words, maxPieceLen, minSeedCount)
        .as[(String, Long)].collect().toMap
      val chars = seedKept.keySet.filter(_.length == 1)
      // HALF_UP at 6dp — the same rounding SQL round() applies, so the
      // oracle's ln(c/total) lands on the identical double
      def round6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def toScores(counts: Map[String, Long]): Map[String, Double] = {
        val total = counts.values.sum.toDouble
        counts.map { case (p, c) => p -> round6(math.log(c / total)) }
      }
      var scores = toScores(seedKept)
      var usage = Map.empty[String, Long]
      var r = 0
      while (r < rounds) {
        val bc = spark.sparkContext.broadcast(scores)
        val L = maxPieceLen
        usage = words.flatMap { case (w, f) =>
          segment(w, bc.value, L).map(p => (p, f))
        }.toDF("piece", "f").groupBy("piece").agg(sum("f").as("u"))
          .as[(String, Long)].collect().toMap
        r += 1
        if (r < rounds) {
          // M-step: prune unused non-char pieces; characters survive
          // with a floor count of 1 (coverage guarantee)
          val kept = usage ++ chars.map(c => c -> math.max(usage.getOrElse(c, 0L), 1L))
          scores = toScores(kept)
        }
      }
      val finalVocab = scores.keySet
      finalVocab.toSeq.sorted.map { p =>
        Piece(p, usage.getOrElse(p, 0L), scores(p))
      }
    } finally words.unpersist()
  }
}
