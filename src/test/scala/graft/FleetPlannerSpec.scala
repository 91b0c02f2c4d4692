package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.BackupHistoryDerivation
import graft.script.{FleetRestorePlanner, RestoreScriptGenerator, RestoreScriptOptions}

/** The fleet-wide planner must produce, for each (db, server), exactly
  * the chain the scalar planner produces for that pair.
  */
class FleetPlannerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = Timestamp.valueOf("2024-01-20 00:00:00")

  test("fleet plan slice equals the scalar planner for every pair") {
    val bh = BackupHistoryDerivation.canonicalFrame(spark, TestSpark.sf)
    val fleet = FleetRestorePlanner.planAll(bh, "server_name", T)
      .select("database_name", "key", "restore_id", "backup_type",
        "last_lsn", "from_clause", "stopat")
      .as[(String, String, Long, String, BigDecimal, String, Boolean)]
      .collect()
      .groupBy(r => (r._1, r._2))

    val pairs = bh.select("database_name", "server_name").distinct()
      .as[(String, String)].collect()

    assert(fleet.nonEmpty && pairs.nonEmpty)
    pairs.foreach { case (db, srv) =>
      val scalar =
        try Some(RestoreScriptGenerator.generate(spark, bh,
          RestoreScriptOptions(sourceDb = db, sourceServer = Some(srv),
            restoreToTime = Some(T))))
        catch { case _: IllegalStateException => None } // no full before T
      val fleetSteps = fleet.getOrElse((db, srv), Array.empty)
        .sortBy(_._3)
        .map(r => (r._3, r._4, r._5, r._6, r._7)).toSeq
      scalar match {
        case None => assert(fleetSteps.isEmpty, s"$db/$srv: fleet has steps but scalar none")
        case Some(plan) =>
          val scalarSteps = plan.steps.map(s =>
            (s.RestoreID, s.BackupType, s.last_lsn, s.from_clause,
              s.stop_at.isDefined))
          assert(fleetSteps == scalarSteps, s"$db/$srv mismatch")
      }
    }
  }
}
