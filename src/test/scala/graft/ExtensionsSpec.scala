package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GraftExtensions, IntersectionNonEmptyToOverlap}

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("driver contract: every oracleSql key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("driver contract: every query is oracled — no waivers left") {
    // round 6 closed the last waiver: pagerank_converged's stopping iteration
    // is a measured constant (k* = 4 at both sf scales, IterativeKernelsSpec
    // pins it), so its oracle is pagerankFixed(4)
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracle: $missing")
  }

  test("CacheTracker: operator-internal persists are released per session") {
    import spark.implicits._
    val docs = Seq(0L -> "alpha beta gamma delta epsilon", 1L -> "alpha beta gamma delta zeta")
      .toDF("doc_id", "text")
    graft.docs.Dedup.minhashLshPairs(docs, k = 3, threshold = 0.1).collect()
    assert(CacheTracker.trackedCount(spark) > 0, "operator must have tracked a persist")
    CacheTracker.release(spark)
    assert(CacheTracker.trackedCount(spark) === 0)
  }

  test("overlap rule rewrites size(array_intersect) emptiness tests, results unchanged") {
    val s = spark.newSession() // isolated sessionState → isolated optimizer
    s.experimental.extraOptimizations = Seq(IntersectionNonEmptyToOverlap)
    import s.implicits._
    // parquet round-trip (a LocalRelation would be constant-folded straight through
    // the filter), then arrays built from non-nullable expressions — parquet scans
    // come back with containsNull=true, while real adjacency arrays
    // (sort_array(collect_list)) are containsNull=false, the shape the rule targets
    val dir = java.nio.file.Files.createTempDirectory("graft-ext").resolve("t.parquet")
    Seq((1L, 2L), (3L, 4L), (5L, 5L)).toDF("x", "y")
      .write.mode("overwrite").parquet(dir.toString)
    val df = s.read.parquet(dir.toString)
      .select(
        array(coalesce($"x", lit(0L)), lit(2L)).as("a"),
        array(coalesce($"y", lit(0L))).as("b"))
    val q = df.where(size(array_intersect($"a", $"b")) > 0)
    assert(q.queryExecution.optimizedPlan.toString.contains("arrays_overlap"),
      s"rule must fire:\n${q.queryExecution.optimizedPlan}")
    assert(q.count() === 2) // (1,2)∩(2) and (5,2)∩(5); (3,2)∩(4) empty
    val qn = df.where(size(array_intersect($"a", $"b")) <= 0)
    assert(qn.queryExecution.optimizedPlan.toString.contains("arrays_overlap"))
    assert(qn.count() === 1)
  }

  test("overlap rule does NOT fire on nullable elements (null-vs-false semantics)") {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(IntersectionNonEmptyToOverlap)
    import s.implicits._
    val df = Seq((Seq(Option(1L), None), Seq(Option(1L)))).toDF("a", "b")
    val q = df.where(size(array_intersect($"a", $"b")) > 0)
    assert(!q.queryExecution.optimizedPlan.toString.contains("arrays_overlap"))
    assert(q.count() === 1) // and the unrewritten form still evaluates correctly
  }

  test("overlap rule does NOT fire under spark.sql.legacy.sizeOfNull=true") {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(IntersectionNonEmptyToOverlap)
    // the legacy flag only takes effect with ANSI mode off (Spark 4 default on)
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try {
      import s.implicits._
      // under the legacy flag size(null array) is -1, so `<= 0` on a null input
      // is TRUE while Not(arrays_overlap) would be null — the rewrite is unsound
      val dir = java.nio.file.Files.createTempDirectory("graft-ext3").resolve("t.parquet")
      Seq((1L, 2L)).toDF("x", "y").write.mode("overwrite").parquet(dir.toString)
      val df = s.read.parquet(dir.toString)
        .select(array(coalesce($"x", lit(0L)), lit(2L)).as("a"),
          array(coalesce($"y", lit(0L))).as("b"))
      val q = df.where(size(array_intersect($"a", $"b")) > 0)
      assert(!q.queryExecution.optimizedPlan.toString.contains("arrays_overlap"),
        s"rule must NOT fire under legacy sizeOfNull:\n${q.queryExecution.optimizedPlan}")
      assert(q.count() === 1)
    } finally {
      s.conf.set("spark.sql.legacy.sizeOfNull", "false")
      s.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("GraftExtensions installs function + rule at session build (deployment path)") {
    val prevA = SparkSession.getActiveSession
    val prevD = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]").appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val c = s2.sql(
        "SELECT sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS c")
        .collect().head.getLong(0)
      assert(c === 2L)
      // zero vector → every projection +0.0 → all `planes` bits set per band
      val sigs = s2.sql(
        "SELECT graft_hyperplane_bands(array(0.0D, 0.0D, 0.0D), 3, 4, 2) AS s")
        .collect().head.getSeq[Long](0)
      assert(sigs === Seq(15L, 15L))
      // the round-6 text-hash kernels ride the same injection path
      val th = s2.sql(
        "SELECT graft_rolling_hash('ab') AS h, graft_simhash64(array('', 'ab')) AS sh")
        .collect().head
      assert(th.getLong(0) === 3105L) // (97*31 + 98) mod 1e9+7
      assert(th.getLong(1) !== 0L)
      // the row-local minhash kernels too: "ab" with k=2 has ONE shingle whose
      // combined hash is (97*31+98 mod 1e9+7)·(1e9+9) + (97*131+98 mod 1e9+9)
      val mh = s2.sql(
        """SELECT graft_shingle_set('ab', 2) AS xs,
          |       graft_minhash_sig(array(5L, 3L), 1) AS sig""".stripMargin)
        .collect().head
      assert(mh.getSeq[Long](0) === Seq(3105L * 1000000009L + 12805L))
      assert(mh.getSeq[Long](1).length === 1)
      import s2.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-ext2").resolve("t.parquet")
      Seq((1L, 1L)).toDF("x", "y").write.mode("overwrite").parquet(dir.toString)
      val q = s2.read.parquet(dir.toString)
        .select(array(coalesce($"x", lit(0L))).as("a"), array(coalesce($"y", lit(0L))).as("b"))
        .where(size(array_intersect($"a", $"b")) > 0)
      assert(q.queryExecution.optimizedPlan.toString.contains("arrays_overlap"))
    } finally {
      prevD.foreach(SparkSession.setDefaultSession)
      prevA.foreach(SparkSession.setActiveSession)
    }
  }
}
