package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity
import graft.plans.GraftExtensions

/** The session-extension surface: the optimizer rule must rewrite the
  * idiomatic higher-order-function dot product into the codegen'd
  * expression without changing results, and must leave non-matching
  * aggregates alone.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HOF dot-product shape is rewritten to the codegen'd DotProduct") {
    GraftExtensions.install(spark)
    GraftExtensions.install(spark) // idempotent
    assert(spark.experimental.extraOptimizations
      .count(_ == graft.plans.RewriteHofDotProduct) == 1)

    val emb = Tables.embeddings(spark, TestSpark.sf).limit(64)
    val v = col("embedding").cast("array<double>")
    val hof = emb.select(col("vec_id"), Similarity.dotHof(v, v).as("d"))
    val opt = hof.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("dotproduct"), s"rewrite missing:\n${opt.take(600)}")
    assert(!opt.contains("aggregate(zip_with"), "builtin shape must be gone")

    // bit-identical results (same sequential summation)
    val native = emb.select(col("vec_id"), Similarity.dot(v, v).as("d"))
    assert(hof.as[(Long, Double)].collect().toMap ==
      native.as[(Long, Double)].collect().toMap)
  }

  test("non-dot-product aggregates are left untouched") {
    GraftExtensions.install(spark)
    val df = Seq((1L, Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("id", "a", "b")
    // sum of sums, not a product fold — must NOT become DotProduct
    val other = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, x) => acc + x).as("s"))
    val opt = other.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!opt.contains("dotproduct"), opt.take(400))
    assert(other.as[Double].head() == 10.0)
  }

  test("extensions class registers vec_dot for SQL on new sessions") {
    // the injectFunction path is exercised via the live-session registry
    // (builder-level extensions need a fresh context); SQL resolution is
    // the contract either way
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(r == 11.0)
  }
}
