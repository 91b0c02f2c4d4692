package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed catalog layout for the consolidated table — the co-location
  * path for 100 TB: bucketing by `database_name` (the key every restore
  * query groups/windows on — the reference's covering-index prefix,
  * sql:35-37) pre-hashes the table into a fixed number of files per
  * partition, so per-key aggregations, windows and self-joins read
  * bucket-aligned data and skip their shuffle entirely; sorting buckets
  * by `last_lsn` additionally serves the rank-one-stripes windows.
  *
  * Parquet path tables cannot carry bucket metadata, so this variant
  * goes through the session catalog (`saveAsTable`).
  */
object BucketedStore {

  def create(
      spark: SparkSession,
      table: String,
      data: DataFrame,
      buckets: Int = 16): Unit =
    data.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "database_name")
      .sortBy("database_name", "last_lsn")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
