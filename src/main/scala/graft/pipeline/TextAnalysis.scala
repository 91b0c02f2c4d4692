package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All pure
  * codegen'd `functions._` expressions — no UDFs — so they stay inside
  * whole-stage codegen and scale linearly over a document scan with zero
  * shuffles.
  *
  * Every formula is mirrored verbatim by a DuckDB oracle (PipelineQueries)
  * — keep the two in sync when editing.
  */
object TextAnalysis {

  /** Lowercase, trim, collapse runs of whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: letter runs, digit runs, and single
    * punctuation marks each count as one token — the shape of a
    * byte-pair-encoder's pre-tokenizer.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Codegen'd set-membership count ([[graft.functions.CountInSet]]) —
    * the lambda spelling `size(filter(w, _.isin(set)))` interprets per
    * element and dominated the language-ID scan (4 marker sets per row).
    */
  private def countIn(w: Column, set: Seq[String]): Column =
    graft.functions.VectorFunctions.countInSet(w, set)

  def stopwordCount(text: Column): Column = countIn(tokens(text), Stopwords)

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  /** Composite quality score in [0,1]: length, punctuation density,
    * stopword density, mean word length. Deterministic double arithmetic;
    * round before comparing across engines.
    *
    * Prefer [[qualityScoreFromParts]] over materialized norm/token
    * columns in hot paths: this convenience form re-evaluates the
    * normalize/split subtree at each of its reference sites.
    */
  def qualityScore(text: Column): Column =
    qualityScoreFromParts(text, normalize(text), tokens(text))

  /** Same score over pre-materialized parts (`norm` = [[normalize]],
    * `w` = [[tokens]]).
    *
    * Null text scores 0.0 explicitly: Spark's `greatest`/`least` IGNORE
    * null arguments, so without the guard a null document would score a
    * mid-range 0.5 (greatest(0.0, null) = 0.0, least(1.0, null) = 1.0)
    * and sail through quality gates. EMPTY/whitespace-only text also
    * scores 0.0 explicitly: its normalized length is 0, and the punct
    * ratio's division by it is a runtime DIVIDE_BY_ZERO under ANSI mode
    * (Spark 4's default) — found by the budgetSelect ScalaCheck
    * property, one empty document would crash a corpus-scale scoring
    * job. (The DuckDB oracle needs no twin guard — the fixture corpus
    * has no null or empty text.)
    */
  def qualityScoreFromParts(text: Column, norm: Column, w: Column): Column = {
    val nTok = size(w).cast("double")
    val nChars = length(norm).cast("double")
    val lenScore = least(lit(1.0), nTok / 100.0)
    val punctScore = greatest(lit(0.0),
      lit(1.0) - lit(5.0) * (punctCount(text).cast("double") / nChars))
    val stopScore = least(lit(1.0),
      lit(5.0) * (countIn(w, Stopwords).cast("double") / nTok))
    val meanWordLen = (nChars - (nTok - 1)) / nTok
    val wlScore = greatest(lit(0.0), lit(1.0) - abs(meanWordLen - 5.0) / 5.0)
    when(text.isNull.or(length(norm) === 0), lit(0.0))
      .otherwise((lenScore + punctScore + stopScore + wlScore) * 0.25)
  }

  /** Marker-token language scores. Synthetic corpora won't carry real
    * language signal; what matters is the operator shape: one scan,
    * k marker-set membership counts, an argmax.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "les", "des", "est")
  )

  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreFromTokens(tokens(text), markers)

  def langScoreFromTokens(w: Column, markers: Seq[String]): Column =
    countIn(w, markers)

  /** Predicted language: highest marker score, ties to the
    * alphabetically-first language (deterministic across engines).
    * Prefer [[langIdFromTokens]] over a materialized token column in hot
    * paths — the four marker filters would each re-tokenize otherwise
    * (lambda arguments are not CSE'd).
    */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  def langIdFromTokens(w: Column): Column = {
    val s = LangMarkers.map { case (l, m) => l -> langScoreFromTokens(w, m) }.toMap
    // null token array → null prediction (every score comparison is null,
    // so without the guard the when-chain would fall through to 'fr')
    when(w.isNull, lit(null).cast("string"))
      .when(s("de") >= s("en") && s("de") >= s("es") && s("de") >= s("fr"), "de")
      .when(s("en") >= s("es") && s("en") >= s("fr"), "en")
      .when(s("es") >= s("fr"), "es")
      .otherwise("fr")
  }

  /** Content fingerprint: md5 of the normalized text — the exact-dedup
    * key (whitespace/case-insensitive).
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Word n-grams of a token array, joined with single spaces. Pure
    * higher-order projection (no explode, no shuffle). Fewer than n
    * tokens → empty array (guarded: `sequence(1, m)` with m < 1 counts
    * DOWN). The token array is [[graft.functions.Let]]-bound so a
    * `tokens(text)` argument is evaluated once, not per gram.
    */
  def wordNgrams(w: Column, n: Int): Column =
    graft.functions.Let.let(w, t => {
      val grams = transform(
        sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
        i => concat_ws(" ", (0 until n).map(o => element_at(t, i + o)): _*))
      when(size(t) >= n, grams).otherwise(array().cast("array<string>"))
    })

  /** Fraction of word n-grams that are repeats of an earlier one —
    * the Gopher-style intra-document repetition signal (high values mark
    * degenerate boilerplate/looping text). Empty gram set → 0.0.
    */
  def dupNgramFrac(w: Column, n: Int): Column =
    graft.functions.Let.let(wordNgrams(w, n), g =>
      when(size(g) > 0,
          (size(g) - size(array_distinct(g))).cast("double") / size(g))
        .otherwise(lit(0.0)))

  /** PII-shaped patterns, written to the RE2 ∩ java.util.regex common
    * subset so the DuckDB oracle runs the identical strings. Replacement
    * order is email → phone → IP (disjoint matches; placeholders carry
    * no digits, so later passes never match inside earlier ones).
    */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhone = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
  val PiiIp = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  def piiEmailCount(text: Column): Column = regexp_count(text, lit(PiiEmail))
  def piiPhoneCount(text: Column): Column = regexp_count(text, lit(PiiPhone))
  def piiIpCount(text: Column): Column = regexp_count(text, lit(PiiIp))

  /** Scrub PII-shaped spans with typed placeholders — the pre-training
    * redaction pass, as three chained codegen'd regexp_replaces (one
    * scan, no shuffle).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmail, "[EMAIL]"),
        PiiPhone, "[PHONE]"),
      PiiIp, "[IP]")

  /** Gopher stopword list (Rae et al. 2021, App. A1.1: "contains at
    * least 2 of the following English words").
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality-rule bundle (Rae et al. 2021, App. A1.1) — the
    * standard hand-written pre-filter that runs BEFORE model-based
    * quality scoring in most published pipelines (Gopher, MassiveText,
    * RefinedWeb, Dolma). One row-local struct projection per document:
    * word-count bounds, mean word length, symbol (#/…) to word ratio,
    * bullet-started and ellipsis-ended line fractions, alphabetic-word
    * fraction, stopword presence, duplicate-line fraction, and the
    * conjunction verdict. Word-count bounds are parameters (the paper's
    * 50..100k; tests use tighter bounds so the synthetic corpus splits).
    *
    * All metrics ride on ONE evaluation of the normalize/split subtrees
    * ([[graft.functions.Let]]); the per-word regex in the alphabetic
    * fraction is an interpreted HOF lambda — fine off the hot path, and
    * the thresholds dominate wall time nowhere (the scan is linear,
    * shuffle-free). `passes` compares UNROUNDED values; the struct's
    * reported metrics are rounded to 4dp for cross-engine comparison.
    */
  def gopherRules(text: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column =
    graft.functions.Let.let(normalize(text), norm =>
      graft.functions.Let.let(split(norm, " "), w =>
        graft.functions.Let.let(split(text, "\n"), lines => {
          val nW = size(w).cast("double")
          val nL = size(lines).cast("double")
          val mwl = (length(norm) - (size(w) - 1)).cast("double") / nW
          val sym = (regexp_count(text, lit("#")) +
            regexp_count(text, lit("\\.\\.\\."))).cast("double") / nW
          val bullet =
            regexp_count(text, lit("(^|\n)[-*•]")).cast("double") / nL
          val ell =
            regexp_count(text, lit("\\.\\.\\.(\n|$)")).cast("double") / nL
          val alpha =
            size(filter(w, x => x.rlike("[a-z]"))).cast("double") / nW
          val stops = GopherStopwords
            .map(s => when(array_contains(w, s), 1).otherwise(0))
            .reduce(_ + _)
          val dup =
            (size(lines) - size(array_distinct(lines))).cast("double") / nL
          val passes = size(w).between(minWords, maxWords) &&
            mwl.between(3.0, 10.0) && sym <= 0.1 && bullet <= 0.1 &&
            ell <= 0.3 && alpha >= 0.8 && stops >= 2 && dup <= 0.3
          struct(
            size(w).as("n_words"),
            round(mwl, 4).as("mean_word_len"),
            round(sym, 4).as("sym_ratio"),
            round(bullet, 4).as("bullet_frac"),
            round(ell, 4).as("ellipsis_frac"),
            round(alpha, 4).as("alpha_frac"),
            stops.as("stop_hits"),
            round(dup, 4).as("dup_line_frac"),
            passes.as("passes"))
        })))

  /** Deterministic feature-hashed text embedding (the hashing-trick
    * twin of a learned sentence encoder): each token contributes ±1 to
    * one of `dims` buckets (bucket and sign both md5-derived — no model
    * artifact, no RNG), scaled by 1/√n_tokens. The geometry is the
    * signed-random-projection of the bag-of-words, so cosine between
    * these vectors approximates token-set overlap — good enough to
    * drive the ANN/dedup machinery end-to-end from raw text when no
    * trained encoder is present, and exactly replayable by an oracle.
    *
    * One row-local projection: per-token (bucket, sign) pairs evaluate
    * ONCE (Let-bound), then a dims-length transform folds them — md5
    * cost is O(tokens), not O(dims · tokens).
    */
  def hashedEmbedding(text: Column, dims: Int): Column = {
    def bucket(t: Column): Column =
      conv(substring(md5(t), 1, 14), 16, 10).cast("long") % dims
    def sign(t: Column): Column =
      (conv(substring(md5(t), 15, 1), 16, 10).cast("long") % 2 * 2 - 1)
        .cast("double")
    graft.functions.Let.let(
      transform(tokens(text), t => struct(bucket(t).as("b"), sign(t).as("s"))),
      bs => {
        val n = size(bs).cast("double")
        transform(sequence(lit(0), lit(dims - 1)), d =>
          aggregate(bs, lit(0.0), (acc, x) =>
            acc + when(x.getField("b") === d, x.getField("s"))
              .otherwise(0.0)) / sqrt(n))
      })
  }

  /** fastText-style hashed linear quality classifier: each token hashes
    * into one of `buckets` feature slots (hashing trick), the slot's
    * weight is an md5-derived deterministic stand-in for a trained
    * coefficient (the env ships no model artifacts; swapping in real
    * weights is a broadcast-map change, the plan shape is identical), and
    * the document score is the sigmoid of the mean token weight — the
    * linear bag-of-features architecture of fastText (Joulin et al. 2017)
    * and the CCNet/Gopher quality-filter stage.
    *
    * Entirely row-local — tokenize, transform, fold, sigmoid — so the
    * classifier is one projection over the corpus scan: zero shuffles,
    * zero joins, linear at 100 TB (the HOF lambdas are interpreted, not
    * codegen'd, but the md5 calls dominate either way; a native
    * Expression à la [[graft.functions.WinnowFingerprints]] is the
    * escape hatch if this ever shows up hot). The fold starts at 0.0 and
    * sums in token order, bit-identical to the oracle's list_reduce.
    */
  def hashedLinearScore(
      text: Column, buckets: Int, seed: String): Column = {
    def bucket(t: Column): Column =
      conv(substring(md5(t), 1, 14), 16, 10).cast("long") % buckets
    def weight(b: Column): Column =
      conv(substring(md5(concat_ws(":", lit(seed), b.cast("string"))),
        1, 14), 16, 10).cast("long") / lit(math.pow(16, 14)) - 0.5
    graft.functions.Let.let(
      transform(tokens(text), t => weight(bucket(t))), ws =>
        round(lit(1.0) / (lit(1.0) +
          exp(-(aggregate(ws, lit(0.0), (a, x) => a + x) / size(ws)))), 4))
  }
}
