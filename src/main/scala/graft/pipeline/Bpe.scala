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

  /** One merge learned by the batched trainer: global rank, the round it
    * was selected in, and its position within the round's batch.
    */
  final case class BatchedMerge(rank: Int, round: Int, l_sym: String,
      r_sym: String, pair_count: Long)

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

  /** Word-BIGRAM training units (SentencePiece-style: an explicit `_`
    * boundary marker between the two words), for vocabularies richer than
    * the per-word symbol space supports. Same scale shape as
    * [[wordCounts]]: one corpus pass, and the training table is bounded
    * by |word vocab|^2 — still vocab-scale, never corpus-scale.
    */
  def bigramUnitCounts(docs: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    docs
      .select(
        when(size(t) >= 2,
          arrays_zip(
            slice(t, lit(1), size(t) - 1).as("l"),
            slice(t, lit(2), size(t) - 1).as("r")))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))
          .as("ps"))
      .select(explode(col("ps")).as("p"))
      .select(concat(col("p.l"), lit("_"), col("p.r")).as("u"))
      .groupBy("u").agg(count(lit(1)).as("f"))
      .withColumn("sym", trim(regexp_replace(col("u"), "(.)", "$1 ")))
  }

  /** Batched merge learning: per round, ONE pair-count aggregation feeds a
    * top-`window` candidate list (distributed TopK — no global sort), and
    * a driver-side greedy scan selects every candidate that shares no
    * symbol — raw or newly-concatenated — with an earlier selection
    * (candidate i is kept iff {l,r,l+r} is disjoint from the union of the
    * kept candidates' triples, scanning in (count desc, l, r) order).
    * Mutually-disjoint merges neither create nor destroy each other's
    * pair occurrences, so applying the whole batch preserves each
    * selection's measured count — the standard practical relaxation of
    * sequential BPE. Jobs are O(numMerges / batch), not O(numMerges):
    * `learnMerges` at a production 32k vocabulary is 32k sequential
    * driver round-trips; this runs ~32k/|batch| rounds of the same
    * vocab-sized work.
    */
  def learnMergesBatched(spark: SparkSession, units: DataFrame,
      numMerges: Int, window: Int = 256,
      driverVocabLimit: Int = 1 << 20): Seq[BatchedMerge] = {
    require(numMerges > 0, "at least one merge")
    require(window > 0, "positive candidate window")
    // Hybrid execution: the CORPUS pass (bigramUnitCounts/wordCounts) is
    // always distributed; the merge-learning loop only touches the
    // vocab-sized unit table. When that table fits the driver (it almost
    // always does — a 32k-merge production trainer sees ~10^6 word
    // types), looping locally avoids per-round scheduler overhead
    // entirely; past the limit, the distributed batched loop below keeps
    // the same O(numMerges/batch)-jobs shape. Both paths run the
    // IDENTICAL candidate ranking and greedy disjoint selection (the
    // local sort compares by UTF-8 bytes — Spark's UTF8String binary
    // order — so supplementary characters tie-break identically),
    // pinned against each other in PipelineSpec.
    // Materialize the unit table once (the corpus pass), then decide:
    // the count probe and the keep-path collect both read the
    // checkpointed blocks, so the over-limit path never materializes
    // vocab rows on the driver just to discard them (take(limit+1) did
    // exactly that), and the keep path still costs ONE corpus pass —
    // a bare limit().count() probe on the un-materialized frame re-ran
    // the whole corpus aggregation a second time (~2x on q151).
    val mat = units.select("u", "f", "sym").localCheckpoint()
    if (mat.limit(driverVocabLimit + 1).count() <= driverVocabLimit) {
      val rows = mat.collect()
      mat.unpersist()
      return learnMergesLocal(rows.map(r =>
        (r.getString(2).split(" "), r.getLong(1))), numMerges, window)
    }
    var vocab = mat
    // lazy-checkpointed vocab of the PREVIOUS round: its blocks feed the
    // current vocab's first materialization (lineage is truncated), so it
    // is only safe to unpersist after this round's collect ran
    var prev: DataFrame = null
    val out = Seq.newBuilder[BatchedMerge]
    var done = 0
    var round = 0
    var exhausted = false
    while (done < numMerges && !exhausted) {
      val cand = pairCounts(vocab)
        .orderBy(col("c").desc, col("l_sym"), col("r_sym"))
        .limit(window).collect()
      if (prev != null) { prev.unpersist(); prev = null }
      if (cand.isEmpty) exhausted = true
      else {
        round += 1
        // greedy disjoint selection over the candidate window, in rank
        // order — deterministic, and replayed verbatim by the oracle's
        // per-round recursive CTE
        val seen = scala.collection.mutable.Set.empty[String]
        val selected = cand.iterator.flatMap { r =>
          val (l, rr, c) = (r.getString(0), r.getString(1), r.getLong(2))
          val triple = Seq(l, rr, l + rr)
          if (triple.exists(seen)) None
          else { seen ++= triple; Some((l, rr, c)) }
        }.toVector
        val use = selected.take(numMerges - done)
        use.foreach { case (l, r, c) =>
          done += 1
          out += BatchedMerge(done, round, l, r, c)
        }
        // the batch is mutually disjoint on {l, r, l+r}, so at any
        // (trailing-token, next-token) position AT MOST ONE rule matches
        // and no rule can match a token another rule just created — one
        // combined left-to-right pass equals the sequential application
        // the oracle replays, at 1/|batch| the expression size
        // LAZY checkpoint: the next round's TopK materializes it — one
        // Spark job per round instead of two
        val next = vocab
          .withColumn("sym",
            applyMergeBatch(col("sym"), use.map { case (l, r, _) => (l, r) }))
          .localCheckpoint(eager = false)
        prev = vocab
        vocab = next
      }
    }
    if (prev != null) prev.unpersist()
    vocab.unpersist()
    out.result()
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
    // CODE-POINT length of l: Spark's length()/substr() count code
    // points, Java's String.length counts UTF-16 units — mixing them
    // chopped one unit short per supplementary character in l
    val lCp = l.codePointCount(0, l.length)
    aggregate(
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      element_at(toks, 1),
      (acc, x) =>
        when((acc === lit(l) || acc.endsWith(s" $l")) && x === lit(r),
          concat(substr(acc, lit(1), length(acc) - lit(lCp)), lit(l + r)))
          .otherwise(concat(acc, lit(" "), x)))
  }

  /** Unsigned lexicographic compare of the UTF-8 encodings — Spark's
    * UTF8String binary order. The local path ranks candidates with this
    * instead of Scala's String order (UTF-16 code units): the two
    * diverge on supplementary characters, and the driver-local vs
    * distributed decision is a SIZE heuristic — the same corpus must
    * learn the same merge table on either path.
    */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Driver-local replay of the batched loop for vocab tables under the
    * collect budget: same pair counting, same (count desc, l, r)
    * candidate ranking (l/r compared by UTF-8 bytes, see
    * [[utf8Compare]]), same greedy triple-disjoint selection, same
    * one-pass batch application (sound for the same disjointness
    * reason).
    */
  private def learnMergesLocal(vocab0: Array[(Array[String], Long)],
      numMerges: Int, window: Int): Seq[BatchedMerge] = {
    var vocab = vocab0
    val out = Seq.newBuilder[BatchedMerge]
    var done = 0
    var round = 0
    var exhausted = false
    while (done < numMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        round += 1
        val cand = pc.toArray
          .sortWith { case (((l1, r1), c1), ((l2, r2), c2)) =>
            if (c1 != c2) c1 > c2
            else {
              val dl = utf8Compare(l1, l2)
              if (dl != 0) dl < 0 else utf8Compare(r1, r2) < 0
            }
          }
          .take(window)
        val seen = scala.collection.mutable.Set.empty[String]
        val selected = cand.iterator.flatMap { case ((l, r), c) =>
          val triple = Seq(l, r, l + r)
          if (triple.exists(seen)) None
          else { seen ++= triple; Some((l, r, c)) }
        }.toVector
        val use = selected.take(numMerges - done)
        use.foreach { case (l, r, c) =>
          done += 1
          out += BatchedMerge(done, round, l, r, c)
        }
        val rules = use.map { case (l, r, _) => (l, r) }.toSet
        vocab = vocab.map { case (syms, f) =>
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (b.nonEmpty && rules.contains((b.last, x)))
              b(b.length - 1) = b.last + x
            else b += x
          }
          (b.toArray, f)
        }
      }
    }
    out.result()
  }

  /** One combined pass applying a MUTUALLY-DISJOINT batch of merges:
    * the same greedy left-to-right fold as [[applyMerge]], but each step
    * tries every rule of the batch (a when-chain — unambiguous because
    * disjointness guarantees at most one rule matches a position, and no
    * rule matches a token another rule of the batch creates). Equivalent
    * to folding [[applyMerge]] once per rule, without |batch| nested
    * re-splits of the intermediate string.
    */
  private[graft] def applyMergeBatch(
      sym: org.apache.spark.sql.Column, merges: Seq[(String, String)])
      : org.apache.spark.sql.Column = {
    require(merges.nonEmpty, "empty merge batch")
    val toks = split(sym, " ")
    aggregate(
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      element_at(toks, 1),
      (acc, x) => {
        val merged = merges.map { case (l, r) =>
          // code-point length, not UTF-16 units (see applyMerge)
          val lCp = l.codePointCount(0, l.length)
          ((acc === lit(l) || acc.endsWith(s" $l")) && x === lit(r),
            concat(substr(acc, lit(1), length(acc) - lit(lCp)),
              lit(l + r)))
        }
        merged.tail
          .foldLeft(when(merged.head._1, merged.head._2)) {
            case (w, (cond, value)) => w.when(cond, value)
          }
          .otherwise(concat(acc, lit(" "), x))
      })
  }

  /** Apply learned merges to a corpus: the per-document symbol count
    * after encoding — a pure row-local projection (no join, no
    * shuffle). This is the corpus-scale consumer of the learned
    * tokenizer: the shape that tokenizes 100 TB in one pass. The merge
    * ladder runs inside [[graft.functions.BpeEncodedCount]], a native
    * whole-stage-codegen'd expression: expressing it as k chained
    * [[applyMerge]] folds is semantically identical but each fold is a
    * higher-order function the expression interpreter evaluates per
    * token per merge (CodegenFallback — it also severs the surrounding
    * codegen span), which doubled this query's wall time; the fold form
    * remains the TRAINING-loop shape where the input is vocab-sized.
    * Equality of the two forms (runs, multi-char symbols, ladder
    * cascades) is pinned in PipelineSpec. Empty words (the normalize of
    * an empty text) carry no symbols in both forms.
    */
  def encodedSymbolCount(textCol: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column =
    graft.functions.VectorFunctions.bpeCount(
      tokens(textCol), merges.map(m => (m.l_sym, m.r_sym)))

  /** [[encodedSymbolCount]]'s serving twin: the encoded PIECES of a
    * document under the learned merges, flattened in word order — what a
    * packing/serving step ships to the trainer. Same native codegen'd
    * kernel ([[graft.functions.BpeEncodePieces]]), same row-local
    * one-pass shape.
    */
  def encodedPieces(textCol: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column =
    graft.functions.VectorFunctions.bpePieces(
      tokens(textCol), merges.map(m => (m.l_sym, m.r_sym)))
}
