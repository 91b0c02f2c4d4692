package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis.{fingerprint, tokens}

/** Deduplication operators for training-data pipelines, all built from
  * codegen'd expressions + hash-partitioned joins/aggregations — the
  * shapes that survive a 100 TB corpus:
  *
  *  - exact dedup: one hash-aggregate on a text fingerprint;
  *  - n-gram Jaccard: shingle-explode + self-join on shingle (bounded by
  *    a document-frequency cap that drops stop-shingles — the classic
  *    fanout guard);
  *  - MinHash + LSH: k md5-min signature components (portable string
  *    mins, engine-independent), banded into buckets so candidate
  *    generation is an equi-join on (band, band_hash) instead of a
  *    quadratic cross join;
  *  - SimHash: bit-majority fingerprint, one aggregation per document.
  *
  * Every hash is md5-hex-string based so a SQL oracle (DuckDB) can
  * reproduce results byte-for-byte.
  */
object Dedup {

  /** Distinct word n-gram shingles from an already-materialized token
    * array. The token array MUST be a plain column reference here: inside
    * a higher-order function's lambda Catalyst does not share common
    * subexpressions, so passing the tokenization expression itself would
    * re-run regex-normalize + split for every element_at — a >10x
    * constant factor at corpus scale.
    */
  def shinglesFromTokens(w: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(w) - lit(n - 1)),
      i => concat_ws(" ",
        (0 until n).map(j => element_at(w, (i + lit(j)).cast("int"))): _*))
    array_distinct(when(size(w) >= n, grams).otherwise(array()))
  }

  /** Distinct word n-gram shingles of the normalized text. Let-bound so
    * the tokenization runs once, honoring the contract above.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.Let.let(tokens(text), w => shinglesFromTokens(w, n))

  /** (doc_id, shingle) rows with tokenization materialized once. */
  private def shingleRows(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleRowsFromTokens(
      docs.select(col(idCol), tokens(col(textCol)).as("__tok")), idCol, "__tok", n)

  /** (doc_id, shingle) rows from an already-tokenized column — lets a
    * composed pipeline (CorpusClean) tokenize once and reuse across
    * stages instead of re-running normalize+split per stage.
    */
  private def shingleRowsFromTokens(
      docs: DataFrame, idCol: String, tokCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(tokCol).as("w"))
      .select(col("doc_id"), explode(shinglesFromTokens(col("w"), n)).as("sh"))

  /** Exact-duplicate groups: fingerprint → (canonical doc, group size).
    * One map-side-combinable aggregation; no join.
    */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fp", fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("group_size"))

  /** Document pairs with n-gram Jaccard similarity >= minSim.
    *
    * Shingles occurring in more than `maxShingleDocFreq` documents are
    * dropped before the self-join: they are stop-shingles that contribute
    * little discrimination but dominate join fanout (at 100 TB this cap
    * is the difference between a linear and a quadratic stage).
    */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minSim: Double = 0.5,
      maxShingleDocFreq: Long = 100): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n)
    // document-frequency cap via the OVER-CAP key set: the groupBy count
    // is map-side combinable (a boilerplate shingle shared by a billion
    // docs reaches the reduce side as one row per map partition), the
    // over-cap set is bounded by construction (|hot| <= corpus
    // shingles / cap), and the broadcast anti-join removes hot shingles
    // without ever concentrating their rows. The two rejected shapes: a
    // count-over-partition WINDOW shuffles and sorts the hottest
    // shingle's entire row set in ONE task — the degenerate input the
    // cap exists to guard against stalls the guard itself — and a
    // full-count sort-merge join re-shuffles sh against a
    // too-wide-to-broadcast distinct-shingle side (measured ~65% slower
    // at test scale back when the window was the keeper).
    val hotSh = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDocFreq).select("sh")
    val rare = sh.join(broadcast(hotSh), Seq("sh"), "left_anti")
    // pinned for the multi-consumer plan below; one generation per
    // operator — a re-invocation unpersists these (CacheSlots)
    graft.util.CacheSlots.rotate("dedup.jaccardPairs", sh, rare)
    // sizes over the CAPPED shingle space: the df-cap removes
    // non-discriminative shingles from the similarity space, so both the
    // intersection AND the union must be over the filtered set — an
    // uncapped denominator systematically underestimates Jaccard
    // (two identical boilerplate-heavy docs: inter is capped, union is
    // not, and an exact duplicate pair can fall below the threshold —
    // precisely the pair the operator exists to find)
    val sizes = rare.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = rare.as("a")
      .join(rare.as("b"), col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minSim)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash component i of a shingle: md5 over a seeded prefix; the
    * signature takes the lexicographic MIN of the hex strings — portable
    * across engines, unlike numeric murmur hashes.
    */
  def minhashComponent(sh: Column, seed: Int): Column =
    md5(concat(lit(s"$seed|"), sh))

  /** Per-document k-component MinHash signature (columns mh0..mh{k-1}). */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, n: Int = 3): DataFrame =
    signaturesFromShingleRows(shingleRows(docs, idCol, textCol, n), k)

  private def signaturesFromShingleRows(sh: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(i => min(minhashComponent(col("sh"), i)).as(s"mh$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: k components split into `bands` bands of k/bands rows;
    * band hash = md5 of the joined components. Output: (doc_id, band,
    * band_hash) — bucket join key.
    */
  def lshBands(signatures: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|",
          (b * r until (b + 1) * r).map(i => col(s"mh$i")): _*)).as("band_hash"))
    }
    signatures
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band"), col("bh.band_hash"))
  }

  /** MinHash-LSH near-duplicate pairs: bucket-join candidates, then score
    * by the fraction of matching signature components (the MinHash
    * Jaccard estimator), keeping pairs >= minEstSim.
    */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, bands: Int = 4, minEstSim: Double = 0.5,
      n: Int = 3): DataFrame =
    minhashPairsFromShingles(shingleRows(docs, idCol, textCol, n), k, bands, minEstSim)

  /** [[minhashPairs]] over an already-tokenized column (no re-normalize). */
  def minhashPairsFromTokens(
      docs: DataFrame, idCol: String, tokCol: String,
      k: Int = 8, bands: Int = 4, minEstSim: Double = 0.5,
      n: Int = 3): DataFrame =
    minhashPairsFromShingles(
      shingleRowsFromTokens(docs, idCol, tokCol, n), k, bands, minEstSim)

  private def minhashPairsFromShingles(
      sh: DataFrame, k: Int, bands: Int, minEstSim: Double): DataFrame = {
    val sigs = graft.util.CacheSlots.rotateOne("dedup.minhashPairs",
      signaturesFromShingleRows(sh, k))
    val bandsDf = lshBands(sigs, k, bands)
    val cand = bandsDf.as("a")
      .join(bandsDf.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sa = sigs.columns.filter(_.startsWith("mh"))
      .foldLeft(sigs)((d, c) => d.withColumnRenamed(c, c + "_a"))
      .withColumnRenamed("doc_id", "id_a")
    val sb = sigs.columns.filter(_.startsWith("mh"))
      .foldLeft(sigs)((d, c) => d.withColumnRenamed(c, c + "_b"))
      .withColumnRenamed("doc_id", "id_b")
    val matches = (0 until k)
      .map(i => when(col(s"mh${i}_a") === col(s"mh${i}_b"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .withColumn("est_sim", matches.cast("double") / k)
      .filter(col("est_sim") >= minEstSim)
      .select("id_a", "id_b", "est_sim")
  }

  /** SimHash fingerprint over `bits` bits (max 64, default 64 — the
    * canonical Manku et al. WWW'07 configuration). Bit b is the majority
    * vote over tokens of bit b of md5(token), where bit b is bit (b mod 4)
    * of hex nibble (b / 4) — every nibble contributes all four of its
    * bits, so a 64-bit fingerprint draws 64 independent bits from the
    * first 16 nibbles of the digest (the previous high-bit-per-nibble
    * trick topped out at 32 low-entropy bits and made wide bands
    * impossible; see the banding note on [[simhashPairs]]).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 64): DataFrame = {
    require(bits >= 1 && bits <= 64, "fingerprint is a single 64-bit long")
    val nNibbles = (bits + 3) / 4
    val tok = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("t"))
      .withColumn("h", md5(col("t")))
    // materialize each nibble's integer value once; the 4 bit tests per
    // nibble below then reuse it instead of re-running conv() per bit
    val nibbled = (0 until nNibbles).foldLeft(tok) { (d, n) =>
      d.withColumn(s"n$n", conv(substring(col("h"), n + 1, 1), 16, 10).cast("int"))
    }
    val bitSums = (0 until bits).map { b =>
      val bit = shiftright(col(s"n${b / 4}"), b % 4).bitwiseAND(lit(1))
      sum(when(bit === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val agg = nibbled.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    // left-fold keeps intermediates in [0, 2^63-1] before the final
    // Long.MinValue term for bit 63 lands, so ANSI overflow never fires
    val fp = (0 until bits)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), fp.cast("long").as("simhash"))
  }

  /** SimHash near-duplicate pairs within `maxHamming` bit flips, with
    * banded candidate generation: the fingerprint splits into
    * `maxHamming + 1` bands, and by pigeonhole any pair within the
    * distance agrees on at least one whole band — so candidates come
    * from an equi-join on (band index, band value), never a cross join,
    * and the exact `bit_count(xor)` filter runs only on bucket-mates.
    *
    * Two guards make this survive 100 TB:
    *
    *  - **band entropy**: the 64/4 default gives 16-bit bands (65536
    *    bucket values per band); narrow bands degenerate — at 4 bits a
    *    band has 16 values and the bucket join is ~n²/16 per band.
    *  - **bucket cap**: buckets holding more than `maxBucketDocs`
    *    documents are dropped before the join (the window count shuffles
    *    on the same (band, bv) key the join needs, so it adds no extra
    *    exchange). A degenerate bucket is almost always an exact-dup or
    *    boilerplate cluster — exact dedup ([[exactDupGroups]]) owns
    *    those; letting them through would turn one hot bucket into a
    *    quadratic candidate set.
    *
    * Exhaustiveness: no pair within the threshold is missed *among docs
    * whose shared buckets are under the cap* (verified against the
    * brute-force join in PipelineSpec; the degenerate-corpus case is
    * spec'd to stay bounded instead).
    */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 64, maxHamming: Int = 3,
      maxBucketDocs: Long = 1000): DataFrame =
    hammingPairs(
      graft.util.CacheSlots.rotateOne("dedup.simhashPairs",
        simhash(docs, idCol, textCol, bits)),
      "doc_id", "simhash", bits, maxHamming, maxBucketDocs)

  /** Banded hamming-distance pairs over ANY precomputed 64-bit
    * fingerprint column — the candidate-generation core shared by
    * [[simhashPairs]] (text) and [[ImageDedup.dhashPairs]] (images).
    * Pigeonhole banding: `maxHamming + 1` bands, an equi-join on
    * (band index, band value) — never a cross join — then the exact
    * `bit_count(xor)` filter on bucket-mates only. The band-entropy and
    * hot-bucket guards documented on [[simhashPairs]] apply unchanged.
    */
  def hammingPairs(
      fp: DataFrame, idCol: String, hashCol: String,
      bits: Int, maxHamming: Int, maxBucketDocs: Long): DataFrame = {
    val nBands = maxHamming + 1
    val width = (bits + nBands - 1) / nBands
    val mask = if (width >= 64) -1L else (1L << width) - 1
    // keyed is consumed three times (banding below + the two
    // fingerprint re-attach joins at the end), so CALLERS must hand in
    // a pinned fp frame when its upstream is expensive —
    // [[simhashPairs]] and [[ImageDedup.dhashPairs]] both do (an
    // unconditional pin here measured a q47 regression: fp there is
    // already cached, and stacking a second cache on it costs more
    // than the two cheap re-reads it saves)
    val keyed = fp.select(col(idCol).as("doc_id"), col(hashCol).as("__fp"))
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("__fp"), b * width).bitwiseAND(lit(mask)).as("bv"))
    }
    // cached BEFORE both consumers (the cap aggregation and the
    // anti-join feeding the self-join)
    val banded0 = graft.util.CacheSlots.rotateOne("dedup.hammingPairs",
      keyed
        .select(col("doc_id"), explode(array(bandCols: _*)).as("x"))
        .select(col("doc_id"), col("x.band"), col("x.bv")))
    // over-cap buckets removed via combinable count + broadcast
    // anti-join (|hot| <= rows / cap by construction) — a
    // count-over-partition window would sort the hottest bucket's whole
    // row set in one task, stalling on exactly the degenerate input
    // (a billion byte-identical docs) this cap guards against
    val hotBv = banded0.groupBy("band", "bv").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucketDocs).select("band", "bv")
    val banded = banded0.join(broadcast(hotBv), Seq("band", "bv"), "left_anti")
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(keyed.select(col("doc_id").as("id_a"), col("__fp").as("sh_a")),
        Seq("id_a"))
      .join(keyed.select(col("doc_id").as("id_b"), col("__fp").as("sh_b")),
        Seq("id_b"))
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
