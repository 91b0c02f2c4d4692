package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem-agnostic path existence, resolved through the Hadoop
  * FileSystem API so object-store URIs (s3a://, hdfs://, abfss://) work
  * the same as local paths — `java.io.File.exists` is always false for
  * those, which would silently treat an existing remote table as empty.
  */
object StorePath {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p)
  }
}
