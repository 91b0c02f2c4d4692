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

  /** Job-group-filtered task metrics: max shuffle-read records of any
    * task launched by `body`'s jobs (runs in its own job group so
    * concurrently-running suites don't pollute the measurement).
    */
  private def maxTaskShuffleRead(s: org.apache.spark.sql.SparkSession)(
      body: => Unit): Long = {
    import org.apache.spark.scheduler._
    val group = s"graft-skew-gate-${System.nanoTime()}"
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val maxRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (group == j.properties.getProperty("spark.jobGroup.id"))
          j.stageIds.foreach(id => stages.add(id))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (stages.contains(t.stageId) && t.taskMetrics != null)
          maxRead.getAndUpdate(m =>
            math.max(m, t.taskMetrics.shuffleReadMetrics.recordsRead))
    }
    s.sparkContext.addSparkListener(listener)
    try {
      s.sparkContext.setJobGroup(group, "skew gate", interruptOnCancel = false)
      body
      // listener bus is async (and its drain API is private): poll until
      // the observed max is non-zero and stable
      val deadline = System.nanoTime() + 10_000_000_000L
      var last = -1L
      while (System.nanoTime() < deadline &&
        (maxRead.get() == 0L || maxRead.get() != last)) {
        last = maxRead.get()
        Thread.sleep(200L)
      }
    } finally {
      s.sparkContext.clearJobGroup()
      s.sparkContext.removeSparkListener(listener)
    }
    maxRead.get()
  }

  /** Own-session conf (shared context, isolated SQLConf): broadcast off
    * so the iterated joins shuffle, AQE skew-split thresholds scaled to
    * test bytes so the 100 TB mechanism actually fires at spec scale.
    */
  private def skewSession(): org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    // static broadcast off (fixtures are statically-sized local
    // relations); AQE's DYNAMIC broadcast stays on with a scaled-down
    // threshold so the jumps-collapse → broadcast crossover is exercised
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "512k")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    // parallelismFirst ignores the advisory size and coalesces this
    // little data into ONE partition, masking everything (measured)
    s.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8k")
    // enough reducers that the salt replication (N·salt/P rows per task)
    // stays visibly below the hub degree — the cluster-realistic regime
    s.conf.set("spark.sql.shuffle.partitions", "32")
    s
  }

  test("connected components: a 50%-mass hub is salt-scattered, result exact") {
    // mechanism on the CC path: EXPLICIT SALTING (Skew.saltedJoin) on
    // both iterated joins + a distinct-collapse of the jump lookup.
    // AQE's skew split is NOT available to CC: every round materializes
    // via localCheckpoint (the RDD path), whose plan fragments AQE never
    // re-optimizes — measured here before the salt landed (the hub key's
    // full edge list arrived at one task, conf-insensitive).
    // star: hub 0 ↔ 1..H (over half of all edge mass on one join key)
    // plus disjoint 3-node chains — the planted power-law worst case
    val s = skewSession()
    import s.implicits._
    val hubN = 20000
    val star = (1 to hubN).map(i => (0L, i.toLong))
    val chains = (0 until 3000).flatMap { c =>
      val b = hubN + 1 + 3 * c.toLong
      Seq((b, b + 1), (b + 1, b + 2))
    }
    val pairs = (star ++ chains).toDF("a", "b")
    var cc: Map[Long, Long] = null
    val maxRead = maxTaskShuffleRead(s) {
      cc = graft.pipeline.Components.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
    }
    // exact result: star collapses to component 0, each chain to its min
    assert(cc(0L) == 0L && (1 to hubN).forall(i => cc(i.toLong) == 0L))
    assert((0 until 3000).forall { c =>
      val b = hubN + 1 + 3 * c.toLong
      cc(b) == b && cc(b + 1) == b && cc(b + 2) == b
    })
    // the hub key's ~2x20000 symmetric edge rows would land in ONE
    // reduce task without the salt; with it every task's input is
    // bounded by uniform spread + the documented N*salt/P replication
    assert(maxRead > 0L, "listener must observe the gated stages")
    assert(maxRead < hubN,
      s"per-task shuffle input must be bounded by the salted joins; " +
        s"max task read $maxRead rows >= hub degree $hubN")
  }

  test("pagerank: hub-dominated edge list completes with bounded task input") {
    // mechanism on the PageRank path: the hub's DOWNSTREAM aggregation
    // is map-side-combinable (groupBy(dst) partial min/sum), and the
    // contribution join's hot partition stays bounded under the scaled
    // AQE thresholds — no salt needed (asserted here so a regression to
    // an unbounded shape fails the gate, whichever mechanism degrades)
    val s = skewSession()
    import s.implicits._
    val hubN = 20000
    // hub -> everyone AND everyone -> hub: both join sides carry the
    // hot key through the per-round contribution join
    val edges = ((1 to hubN).map(i => (0L, i.toLong)) ++
      (1 to hubN).map(i => (i.toLong, 0L))).toDF("src", "dst")
    var ranks: Map[Long, Double] = null
    val maxRead = maxTaskShuffleRead(s) {
      ranks = graft.pipeline.PageRank.pageRank(edges, iters = 3)
        .as[(Long, Double)].collect().toMap
    }
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6, "ranks sum to 1")
    assert(ranks(0L) > ranks(1L) * 100, "hub must dominate")
    // leaf ranks are all equal by symmetry
    assert(math.abs(ranks(1L) - ranks(hubN.toLong)) < 1e-12)
    assert(maxRead > 0L, "listener must observe the gated stages")
    assert(maxRead < hubN,
      s"per-task shuffle input must be bounded by the AQE skew split; " +
        s"max task read $maxRead rows >= hub degree $hubN")
  }

  test("salt is a pure function of the row: re-evaluation never re-salts") {
    // the SPARK-23207 insurance, pinned: a fetch-failure recomputation
    // is just another evaluation of the salt expression, so the same
    // row must land in the same bucket EVERY time. A future "improve
    // the spread" edit that sneaks rand()/monotonically_increasing_id
    // back in fails here immediately.
    val skewed = spark.range(5000)
      .select(
        when(col("id") < 4000, 0L).otherwise(col("id") % 50).as("k"),
        (col("id") * 31 % 997).as("payload"))
    def assignment(): Map[(Long, Long), Int] =
      skewed.withColumn("__salt", Skew.saltColumn(skewed, 8))
        .select("k", "payload", "__salt").as[(Long, Long, Int)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
    val a1 = assignment()
    val a2 = assignment()
    assert(a1 == a2, "salt assignment must be identical across evaluations")
    assert(a1.values.toSet.size > 1, "the hot key must actually spread")
    // the property is not vacuous: a rand()-based salt (the bug the
    // deterministic hash replaced) changes assignment between
    // evaluations on this same input
    def randAssignment(): Map[(Long, Long), Int] =
      skewed.withColumn("__salt",
          pmod((rand() * 1e9).cast("long"), lit(8L)).cast("int"))
        .select("k", "payload", "__salt").as[(Long, Long, Int)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(randAssignment() != randAssignment(),
      "canary: a nondeterministic salt must fail the invariant")
    // end-to-end rerun equality on the planted hub: two full runs of
    // the adaptive salted join are byte-identical
    val dim = spark.range(50)
      .select(col("id").as("k"), concat(lit("d"), col("id")).as("attr"))
    def run() = Skew.adaptiveSaltedJoin(skewed, dim, Seq("k"))
      .select("k", "payload", "attr").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(run() == run(), "salted join reruns must be identical")
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

  test("adaptive salt: a 90%-mass hub derives a wide spread, uniform keys derive 1") {
    val s = skewSession() // 32 shuffle partitions — the derivation target
    import s.implicits._
    val n = 20000
    // 90% of the mass on key 0, the rest uniform over 1..999
    val hub = s.range(n).select(
      when(col("id") < n * 9 / 10, 0L).otherwise(col("id") % 999 + 1).as("k"),
      col("id").as("payload"))
    val bHub = Skew.adaptiveSaltBuckets(hub, Seq("k"))
    // share ~0.9 over a 1/32 target → ~29 buckets (±MG error margin)
    assert(bHub >= 24 && bHub <= 32, s"90% hub on 32 reducers: got $bHub")

    val uniform = s.range(n).select((col("id") % 5000).as("k"),
      col("id").as("payload"))
    assert(Skew.adaptiveSaltBuckets(uniform, Seq("k")) == 1,
      "uniform keys must pay zero replication")

    // bounded per-task input at the derived count: join the hub side
    // against a small dim and gate the max task's shuffle-read records
    val dim = s.range(1000).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("attr"))
    val hubDegree = n * 9 / 10
    var rows = 0L
    val maxRead = maxTaskShuffleRead(s) {
      rows = Skew.adaptiveSaltedJoin(hub, dim, Seq("k")).count()
    }
    assert(rows == n, "inner join against a complete dim keeps every row")
    assert(maxRead > 0L, "listener must observe the gated stages")
    // AQE coalesces the salted partitions by BYTES (several salt buckets
    // per task is fine — no single KEY pins a reducer anymore), so the
    // gate is "well below the un-salted hub degree", not the ideal
    // degree/buckets
    assert(maxRead < hubDegree / 2,
      s"derived spread must bound per-task input well below the hub " +
        s"degree: max task read $maxRead rows, hub $hubDegree")

    // and the adaptive join is result-identical to the plain one
    val plain = hub.join(dim, Seq("k"))
      .select("k", "payload", "attr").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val adaptive = Skew.adaptiveSaltedJoin(hub, dim, Seq("k"))
      .select("k", "payload", "attr").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(adaptive == plain)
  }
}
