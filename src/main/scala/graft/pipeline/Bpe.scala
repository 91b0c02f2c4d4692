package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis.tokens

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) — the
  * tokenizer-side operator of a training-data pipeline.
  *
  * Scale shape: BPE trains on the WORD-FREQUENCY table, not the corpus —
  * the only corpus-scale pass is one map-side-combinable word count.
  * Merge learning then iterates over the (distinct-words-sized) vocab:
  * each round is one pair-count aggregation + one driver-small argmax +
  * one merge projection. At 100 TB the corpus pass dominates and is a
  * single shuffle; the rounds touch only the vocab.
  *
  * Engine-reproducible by construction: symbols are space-joined inside
  * a word (init via `regexp_replace(word, '(.)', '$1 ')`), a merge is a
  * literal string replace of " l r " with " lr " over the padded symbol
  * string, and ties in the pair argmax break lexicographically — every
  * step is integer/string arithmetic both Spark and the DuckDB oracle
  * compute identically (the q66 k-means contract, applied to BPE).
  */
object Bpe {

  /** One learned merge: rank (1-based), the two symbols, and the pair's
    * weighted frequency at selection time.
    */
  final case class Merge(rank: Int, l_sym: String, r_sym: String,
      pair_count: Long)

  /** Corpus-scale step: word frequencies with the initial symbol
    * spelling (every character space-separated). One combinable agg.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("f"))
      .withColumn("sym", trim(regexp_replace(col("word"), "(.)", "$1 ")))

  /** Adjacent symbol pairs of the vocab, weighted by word frequency —
    * the per-round aggregation. Input needs (f, sym).
    */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val t = split(col("sym"), " ")
    vocab
      .select(col("f"),
        when(size(t) >= 2,
          arrays_zip(
            slice(t, lit(1), size(t) - 1).as("l_sym"),
            slice(t, lit(2), size(t) - 1).as("r_sym")))
          .otherwise(array().cast("array<struct<l_sym:string,r_sym:string>>"))
          .as("ps"))
      .select(col("f"), explode(col("ps")).as("p"))
      .groupBy(col("p.l_sym").as("l_sym"), col("p.r_sym").as("r_sym"))
      .agg(sum("f").as("c"))
  }

  /** Learn `numMerges` merges. Each round: pair-count agg over the vocab,
    * argmax (count desc, then lexicographic — deterministic), then the
    * literal-replace merge projection. Returns the merges in rank order;
    * stops early if the vocab runs out of pairs.
    */
  def learnMerges(
      spark: SparkSession, words: DataFrame, numMerges: Int): Seq[Merge] = {
    require(numMerges > 0, "at least one merge")
    var vocab = words.select("word", "f", "sym").localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("c").desc, col("l_sym"), col("r_sym"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, c)
        val next = vocab
          .withColumn("sym", applyMerge(col("sym"), l, r))
          .localCheckpoint()
        vocab.unpersist()
        vocab = next
        rank += 1
      }
    }
    vocab.unpersist()
    merges.result()
  }

  /** One BPE merge (l, r) applied to a space-separated symbol spelling,
    * with subword-nmt's greedy LEFT-TO-RIGHT pairing: a fold whose
    * accumulator is the output string and whose TRAILING token is the
    * pending symbol — when it equals `l` and the next token is `r`, the
    * trailing token is rewritten to `lr` (a merged token never cascades
    * as `l` within the same pass: `lr != l` unless r is empty). A
    * non-overlapping literal replace of " l r " cannot express this:
    * adjacent occurrences share the delimiting space, so a run like
    * "a a a a" came out "aa a a" instead of "aa aa" — wrong pair
    * statistics for every later round and a non-BPE encode on any text
    * with character runs. The oracle replays the identical fold with
    * DuckDB's `list_reduce`.
    */
  private[graft] def applyMerge(
      sym: org.apache.spark.sql.Column, l: String, r: String)
      : org.apache.spark.sql.Column = {
    val toks = split(sym, " ")
    aggregate(
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      element_at(toks, 1),
      (acc, x) =>
        when((acc === lit(l) || acc.endsWith(s" $l")) && x === lit(r),
          concat(substr(acc, lit(1), length(acc) - lit(l.length)), lit(l + r)))
          .otherwise(concat(acc, lit(" "), x)))
  }

  /** Apply learned merges to a corpus: the per-document symbol count
    * after encoding — a pure row-local projection (the merge ladder is
    * k greedy folds compiled into the expression; no join, no
    * shuffle). This is the corpus-scale consumer of the learned
    * tokenizer: the shape that tokenizes 100 TB in one pass.
    */
  def encodedSymbolCount(textCol: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column = {
    // empty "words" (the normalize of an empty text) carry no symbols
    val words = filter(tokens(textCol), w => w =!= lit(""))
    // per word: init spelling, fold the merges, count symbols
    val perWord = transform(words, w =>
      graft.functions.Let.let(
        merges.foldLeft(
          trim(regexp_replace(w, "(.)", "$1 ")): org.apache.spark.sql.Column) {
          case (acc, m) => applyMerge(acc, m.l_sym, m.r_sym)
        },
        enc => size(split(enc, " "))))
    aggregate(perWord, lit(0L), (acc, n) => acc + n)
  }
}
