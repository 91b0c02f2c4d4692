package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.store.{ConsolidatedStore, StoreMeta}

/** The sidecar's one non-negotiable invariant: zone-map pruning must
  * NEVER drop a true duplicate. For any sequence of (overlapping,
  * null-carrying) batches, the pruned append and the full-scan append
  * must leave byte-identical stores — the sidecar is a cache, not a
  * semantics change.
  */
class StoreProps extends Properties("store") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each case replays appends on two stores

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-storeprops").toString + "/t"

  // a deliberately tiny key space: collisions across batches (including
  // NULL devices, the NULLs-are-equal index case) are the common case,
  // not the edge case
  private final case class K(db: String, lsn: Int, dev: Option[String])

  private val genRow: Gen[K] = for {
    db <- Gen.oneOf("dbA", "dbC", "dbE", "dbZ")
    lsn <- Gen.choose(1, 25)
    dev <- Gen.oneOf(Some("d1"), Some("d2"), None)
  } yield K(db, lsn, dev)

  private val genBatches: Gen[List[List[K]]] = for {
    nb <- Gen.choose(2, 4)
    batches <- Gen.listOfN(nb, Gen.choose(4, 30).flatMap(Gen.listOfN(_, genRow)))
  } yield batches

  private def frame(rows: List[K]): DataFrame =
    rows.map(k => (k.db, k.dev.orNull, s"2024-01-0${(k.lsn % 9) + 1} 00:00:00",
        k.lsn.toLong * 100, k.lsn.toLong * 100 + 99))
      .toDF("database_name", "physical_device_name", "t_s", "first_l", "last_l")
      .withColumn("backup_start_date", col("t_s").cast("timestamp"))
      .withColumn("backup_finish_date", col("t_s").cast("timestamp"))
      .withColumn("first_lsn", col("first_l").cast("decimal(25,0)"))
      .withColumn("last_lsn", col("last_l").cast("decimal(25,0)"))
      .drop("t_s", "first_l", "last_l")

  private def contents(path: String): Seq[String] =
    spark.read.parquet(path)
      .select(ConsolidatedStore.dedupKey.map(col): _*)
      .collect().map(_.toString).sorted.toSeq

  property("appendPruned ≡ appendFullScan row-for-row, any batch sequence") =
    Prop.forAll(genBatches) { batches =>
      val pruned = tmp(); val full = tmp()
      batches.foreach { b =>
        val df = frame(b)
        // public append resolves to the sidecar-pruned path on flat stores
        ConsolidatedStore.append(spark, pruned, df)
        ConsolidatedStore.appendFullScan(spark, full, df,
          partitionBy = Nil, sortWithin = Seq("database_name", "last_lsn"))
      }
      val p = contents(pruned)
      val f = contents(full)
      val sane = // and both stores really deduped: unique null-safe keys
        p.distinct.size == p.size && f.distinct.size == f.size
      val consistent = !StoreMeta.load(spark, pruned).get.dirty
      Prop(p == f && sane && consistent) :| s"pruned=${p.size} full=${f.size}"
    }
}
