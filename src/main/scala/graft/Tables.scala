package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables
  * (`/root/testdata/sf*`, see TESTDATA.md). All queries take an sfDir so
  * the same code runs at any scale factor — and, on a real cluster,
  * against any object-store prefix.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet's `ts` physical type has varied across driver data
    * generations: parquet TIMESTAMP(NANOS) (which Spark 4 refuses to read
    * natively — the legacy conf surfaces it as nanos-since-epoch long) and
    * plain TIMESTAMP(MICROS) without UTC adjustment (read as
    * TIMESTAMP_NTZ). Normalize either layout to a session-UTC
    * TimestampType so every downstream query sees one schema. The test
    * data carries no sub-microsecond components, so the nanos truncation
    * is lossless; the NTZ cast reinterprets wall time in the session zone
    * (UTC everywhere in this project), preserving the instant.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, d, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
      case _ => org.apache.spark.sql.functions.col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
