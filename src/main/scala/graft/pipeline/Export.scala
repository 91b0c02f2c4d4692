package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * one row per shard with row count and the min/max id — the
    * boundsfile a training loader uses to address shards.
    */
  def exportShards(
      df: DataFrame, idCol: String, path: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    df
      .withColumn("shard",
        floor(Curation.saltedFraction("shard", col(idCol)) * nShards).cast("int"))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    manifest(spark, path, idCol)
  }

  /** Manifest from the files on disk (usable on any prior export). */
  def manifest(
      spark: SparkSession, path: String, idCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(idCol)).as("id_min"),
        max(col(idCol)).as("id_max"))
}
