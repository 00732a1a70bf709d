package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Harness-contract tests: Bench must be failure-honest (a broken query can
  * never improve the headline number) and the session-lifetime caches must have
  * a real release path (round-2 audit items #2 and #1). */
class HarnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Bench.jsonLine: a failed query surfaces as \"err\" and is excluded from the total") {
    val line = Bench.jsonLine(
      Seq("good" -> Right(Seq(1.5)), "broken" -> Left("err"), "also_good" -> Right(Seq(0.25))),
      "/some/sf", "4")
    assert(line.contains("\"broken\":\"err\""))
    assert(line.contains("\"value\":1.750")) // 1.5 + 0.25, NOT including the failure
    assert(line.contains("\"errors\":1"))
  }

  test("Bench.jsonLine: best-of-reps scored, every rep emitted, contention self-identifying") {
    // cold rep-1 cliff (1.7 → 0.3): normal, must NOT trip the flag
    val cold = Seq("q" -> (Right(Seq(1.7, 0.3)): Either[String, Seq[Double]]))
    val coldLine = Bench.jsonLine(cold, "/sf", "32", reps = 2, load1Start = 0.5, load1End = 30.0)
    assert(coldLine.contains("\"q\":0.300") && coldLine.contains("\"q\":[1.700,0.300]"))
    assert(coldLine.contains("\"contended\":false"),
      "a slow FIRST rep is the cold-path cliff, not contention")
    // a slower LATER rep beyond 2× best — the round-4 driver-outlier signature
    val late = Seq("q" -> (Right(Seq(4.0, 95.0)): Either[String, Seq[Double]]))
    assert(Bench.jsonLine(late, "/sf", "32", reps = 2, load1Start = 0.5)
      .contains("\"contended\":true"))
    // pre-run external load above cpus/4 flags even with clean rep spread
    val calm = Seq("q" -> (Right(Seq(1.0, 1.0)): Either[String, Seq[Double]]))
    assert(Bench.jsonLine(calm, "/sf", "32", reps = 2, load1Start = 20.0)
      .contains("\"contended\":true"))
    assert(Bench.jsonLine(calm, "/sf", "32", reps = 2, load1Start = 0.5)
      .contains("\"contended\":false"))
  }

  test("Bench.run: unknown query names fail fast instead of silently shrinking the set") {
    val e = intercept[IllegalArgumentException] {
      Bench.run(spark, "/root/testdata/sf0.001", Seq("q1_agg", "no_such_query"))
    }
    assert(e.getMessage.contains("no_such_query"))
  }

  test("Bench.run: a throwing query yields Left, not a fast wall-time") {
    val res = Bench.run(spark, "/nonexistent-sf-dir", Seq("q1_agg")).toMap
    assert(res("q1_agg").isLeft)
  }

  test("q3_join plans pushdown, pruning, and the dim broadcast (the 100 TB star-join shape)") {
    val df = SparkEntry.queries("q3_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the selective date predicate must reach the orders parquet scan
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      "date filter not pushed to the scan")
    assert(plan.split('\n').exists(l =>
        l.contains("PushedFilters") && l.contains("o_orderdate") &&
        (l.contains("GreaterThanOrEqual") || l.contains("Gte"))),
      s"range predicate missing from PushedFilters")
    // the 25-row nation dim must broadcast, not shuffle
    assert(plan.contains("BroadcastHashJoin"), "nation join is not a broadcast hash join")
    // column pruning: the lineitem scan must read only the 3 needed columns
    val lineSchema = plan.split('\n').filter(l => l.contains("ReadSchema") && l.contains("l_orderkey"))
    assert(lineSchema.nonEmpty && lineSchema.forall(!_.contains("l_shipdate")),
      "lineitem scan reads columns the query never uses")
  }

  test("CacheTracker bounds per-session tracked persists (evicts oldest, never grows unbounded)") {
    val s = spark.newSession()
    import s.implicits._
    val dfs = (0 until CacheTracker.maxTrackedPerSession + 5).map { i =>
      CacheTracker.persist(Seq(i).toDF("x"))
    }
    assert(CacheTracker.trackedCount(s) === CacheTracker.maxTrackedPerSession)
    assert(dfs.head.storageLevel === StorageLevel.NONE, "oldest entry must be evicted AND unpersisted")
    assert(dfs.last.storageLevel !== StorageLevel.NONE)
    CacheTracker.release(s)
    assert(CacheTracker.trackedCount(s) === 0)
    assert(dfs.forall(_.storageLevel === StorageLevel.NONE))
  }

  test("SparkEntry.releaseCaches unpersists the memoized edge tables") {
    val dir = "/root/testdata/sf0.001"
    val edges = SparkEntry.queries("edges_events")(spark, dir)
    val oriented = SparkEntry.queries("oriented_edges")(spark, dir)
    assert(edges.storageLevel !== StorageLevel.NONE, "memoized canonical must be persisted")
    assert(oriented.storageLevel !== StorageLevel.NONE, "memoized orientation must be persisted")
    SparkEntry.releaseCaches(spark)
    assert(edges.storageLevel === StorageLevel.NONE)
    assert(oriented.storageLevel === StorageLevel.NONE)
    assert(CacheTracker.trackedCount(spark) === 0)
    // and the memo rebuilds cleanly after release
    val again = SparkEntry.queries("edges_events")(spark, dir)
    assert(again.storageLevel !== StorageLevel.NONE)
    assert(again.count() > 0)
  }
}
