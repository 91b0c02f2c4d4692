package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

import graft.model.{Schemas, SourceServerWatermark}

/** The reference's control table `Utility.SQLBackupHistorySourceServers`
  * (sql:42-51): one `(ServerName, LastETLDatetime)` row per source. It is
  * O(#servers) — driver-sized — so reads collect and advances rewrite the
  * whole tiny table (the Spark analog of the point UPDATE in
  * `Update-LastETLDateTimeForServer.ps1:33-53`).
  */
object WatermarkStore {

  def read(spark: SparkSession, path: String): Map[String, Timestamp] =
    if (!StorePath.exists(spark, path)) Map.empty
    else spark.read.parquet(path).collect()
      .map(r => r.getString(r.fieldIndex("ServerName")) ->
        r.getTimestamp(r.fieldIndex("LastETLDatetime"))).toMap

  def write(spark: SparkSession, path: String, wm: Map[String, Timestamp]): Unit = {
    val rows = wm.toSeq.sortBy(_._1).map { case (s, t) => Row(s, t) }
    spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), Schemas.sourceServers)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Advance one server's watermark (write-after-load ordering is the
    * caller's job — `Invoke-SQLBackupHistoryETL.ps1:52-65`).
    */
  def advance(spark: SparkSession, path: String, server: String,
      newWatermark: Timestamp): Unit =
    write(spark, path, read(spark, path) + (server -> newWatermark))

  def toDf(spark: SparkSession, wm: Map[String, Timestamp]): DataFrame = {
    import spark.implicits._
    wm.toSeq.sortBy(_._1)
      .map { case (s, t) => SourceServerWatermark(s, t) }.toDF()
  }
}
