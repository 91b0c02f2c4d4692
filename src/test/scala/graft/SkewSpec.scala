package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted joins must be result-identical to the plain join while
  * spreading hot keys across reducers.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join on a 90%-hot-key distribution") {
    // 9000 rows on key 0, a long tail on 1..99
    val skewed = spark.range(10000)
      .select(
        when(col("id") < 9000, 0L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val dim = spark.range(100)
      .select(col("id").as("k"), concat(lit("d"), col("id")).as("attr"))

    val plain = skewed.join(dim, Seq("k"))
      .select("k", "payload", "attr").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltBuckets = 8)
      .select("k", "payload", "attr").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted == plain, "salting must not change join results")

    // the join key actually carries the salt: hot key 0's rows land in
    // multiple partitions of the shuffle
    val parts = Skew.saltedJoin(skewed, dim, Seq("k"), saltBuckets = 8)
      .filter(col("k") === 0)
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().count()
    assert(parts > 1, s"hot key must spread over >1 partition, got $parts")
  }

  test("salted join handles empty and salt=1 degenerate cases") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "payload")
    val dim = Seq((0L, "d")).toDF("k", "attr")
    assert(Skew.saltedJoin(empty, dim, Seq("k")).count() == 0)
    val one = Seq((0L, 1L), (0L, 2L)).toDF("k", "payload")
    val r = Skew.saltedJoin(one, dim, Seq("k"), saltBuckets = 1)
      .select("payload").as[Long].collect().sorted.toSeq
    assert(r == Seq(1L, 2L))
  }
}
