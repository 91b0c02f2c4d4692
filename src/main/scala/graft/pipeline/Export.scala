package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The last step of every curation run: ship the training set as
  * deterministic shards. Downstream trainers want (a) a FIXED shard
  * count with stable membership — re-exporting an unchanged corpus must
  * produce identical shards, or data loaders lose their resume points —
  * and (b) a manifest that reflects what is ON DISK, not what the
  * writer intended.
  *
  * Sharding is the md5 hash fraction ([[Curation.splitFraction]]) scaled
  * to `nShards`: a pure projection, no global sort, no RNG — the same
  * determinism contract as the split/sample/mix operators, extended to
  * the output layout. The write repartitions BY the shard column first
  * (one shuffle), so each shard's rows land in one task and the layout
  * is `shard=K/part-*.parquet` hive dirs with one file per shard —
  * without it, every upstream task writes a sliver of every shard and
  * the export produces tasks × shards small files.
  *
  * The manifest is computed by READING BACK the written tree: a row the
  * writer dropped or duplicated shows up as a manifest drift against
  * the source-side oracle, which is exactly the check an export step
  * owes its consumers.
  */
object Export {

  /** Write `df` hash-sharded under `path`; return the on-disk manifest:
    * one row per shard with row count, the min/max id (the boundsfile a
    * training loader uses to address shards), and an order-invariant
    * content digest.
    */
  def exportShards(
      df: DataFrame, idCol: String, path: String, nShards: Int,
      rowDigest: Option[Column] = None): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    df
      .withColumn("shard",
        floor(Curation.saltedFraction("shard", col(idCol)) * nShards).cast("int"))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    manifest(spark, path, idCol, rowDigest)
  }

  /** Manifest from the files on disk (usable on any prior export).
    *
    * `content_digest` is the XOR of a per-row 64-bit hash over each
    * shard — order-invariant (parquet row order inside a shard is a
    * write artifact, not content), so a re-export of an unchanged corpus
    * proves byte-stability by digest equality, and any tampered, lost,
    * or duplicated row flips the shard's digest (an exact duplicated
    * PAIR would cancel in XOR, but rows carry the unique `idCol` and a
    * duplicate-id row is already a count drift). Default row hash:
    * `xxhash64` over all non-shard columns in sorted-name order (schema
    * evolution reorders columns; the digest must not care). Callers can
    * supply `rowDigest` to pin a different 64-bit row hash — e.g. an
    * md5-prefix form an external auditor can replay.
    */
  def manifest(
      spark: SparkSession, path: String, idCol: String,
      rowDigest: Option[Column] = None): DataFrame = {
    val back = spark.read.parquet(path)
    val digest = rowDigest.getOrElse(
      xxhash64(back.columns.filterNot(_ == "shard").sorted.map(col): _*))
    back
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(idCol)).as("id_min"),
        max(col(idCol)).as("id_max"),
        bit_xor(digest).as("content_digest"))
  }
}
