package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = queries.PipelineQueries
      .entries("q24_ngram_jaccard_pairs")(spark, "/root/testdata/sf0.01")
    println("=== EXECUTED ===")
    df.count()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
