package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import TestSpark.fixtures

class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("transcript fixture isomorphic to tri1 reproduces golden count 1 end-to-end") {
    val edges = Ingest.edgesFromTranscripts(Transcripts.fixture(spark, fixtures.tri1).toDF())
    assert(TriangleCount.countPairs(edges).first().getLong(0) === 1L)
  }

  test("transcript fixture isomorphic to nvgraph8 reproduces golden count 3 end-to-end") {
    val edges = Ingest.edgesFromTranscripts(Transcripts.fixture(spark, fixtures.nvgraph8).toDF())
    assert(TriangleCount.countPairs(edges).first().getLong(0) === 3L)
    assert(TriangleCount.countPairsAdjacency(spark, edges).first().getLong(0) === 3L)
  }

  test("sessionize: gap threshold splits sessions per user; boundary gap stays in-session") {
    val s0 = spark
    import s0.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val ev = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(100)), (3L, 10L, ts(2000)), // 1900s gap → new session
      (4L, 20L, ts(0)), (5L, 20L, ts(1800)) // exactly 1800s: NOT > gap → same session
    ).toDF("event_id", "user_id", "ts")
    val got = Ingest.sessionize(ev, gapSeconds = 1800).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("sessionizeScalable: bucketed stitch equals the single-window sessionize") {
    val s0 = spark
    import s0.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    // hand-built boundary zoo (gap 1800s, buckets 3600s):
    //  user 10: one session SPANNING three buckets (every gap < 1800 but events
    //           straddle bucket edges), then a real split
    //  user 20: session ends exactly at a bucket edge; next starts > gap later
    //  user 30: boundary gap exactly == gapSeconds (stays merged)
    val ev = Seq(
      (1L, 10L, ts(3000)), (2L, 10L, ts(4000)), (3L, 10L, ts(5500)),
      (4L, 10L, ts(7100)), (5L, 10L, ts(8000)), (6L, 10L, ts(12000)),
      (7L, 20L, ts(3599)), (8L, 20L, ts(3600)), (9L, 20L, ts(9999)),
      (10L, 30L, ts(3000)), (11L, 30L, ts(4800))
    ).toDF("event_id", "user_id", "ts")
    val single = Ingest.sessionize(ev, gapSeconds = 1800).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bucketed = Ingest.sessionizeScalable(ev, gapSeconds = 1800, bucketSeconds = 3600)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bucketed === single)
    CacheTracker.release(spark)
  }

  test("sessionizeScalable equals sessionize on the sf0.01 events table at 1-hour buckets") {
    val ev = Ingest.table(spark, "/root/testdata/sf0.01", "events")
    val single = Ingest.sessionize(ev, gapSeconds = 1800).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bucketed = Ingest.sessionizeScalable(ev, gapSeconds = 1800, bucketSeconds = 3600)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(bucketed.size === single.size)
    assert(bucketed === single)
    CacheTracker.release(spark)
  }

  test("edgesFromEventsScalable equals edgesFromEvents on sf0.01 at 1-hour buckets") {
    val single = Ingest.edgesFromEvents(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Ingest.edgesFromEventsScalable(spark, "/root/testdata/sf0.01", 3600)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === single)
    assert(single.nonEmpty)
    // and with pathologically tiny buckets (every event pair crosses a border)
    val tiny = Ingest.edgesFromEventsScalable(spark, "/root/testdata/sf0.01", 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiny === single)
  }

  test("per-turn text equality under stable (conv_id, turn_idx) ordering round-trip (input_hint invariant)") {
    val t = Transcripts.synth(spark, 50, 20)
    val dir = java.nio.file.Files.createTempDirectory("graft-transcripts").toString
    t.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val a = t.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val b = back.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(a.sameElements(b))
    Checkpoint.deleteRecursively(dir)
  }

  test("synth transcripts: schema, dense turn_idx, monotone ts within conversation, deterministic regen") {
    val t = Transcripts.synth(spark, 20, 10)
    assert(t.schema.map(f => (f.name, f.dataType.simpleString)) === Seq(
      "conv_id" -> "string", "turn_idx" -> "int", "role" -> "string",
      "text" -> "string", "tool" -> "string", "ts" -> "timestamp"))
    val perConv = t.groupBy("conv_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("turn_idx")).as("d"),
        (max(col("ts")) > min(col("ts"))).as("mono"))
      .collect()
    assert(perConv.length === 20)
    perConv.foreach { r => assert(r.getLong(1) === 10L && r.getLong(2) === 10L && r.getBoolean(3)) }
    // bit-identical regeneration
    val again = Transcripts.synth(spark, 20, 10)
    assert(t.collect().toSet === again.collect().toSet)
  }

  test("conversationStats: per-conv turn counts, positive span, null tools skipped") {
    val t = Transcripts.synth(spark, 20, 10).toDF()
    val got = Ingest.conversationStats(t)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size === 20)
    got.values.foreach { case (turns, roles, tools, span, chars) =>
      assert(turns === 10L && roles >= 1L && span > 0L && chars > 0L)
      assert(tools <= turns) // countDistinct skips null tools
    }
  }

  test("transcript edges: no self loops, canonical, participants co-occur") {
    val edges = Ingest.edgesFromTranscripts(Transcripts.synth(spark, 30, 12).toDF())
    val rows = edges.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("events edge derivation is deterministic and canonical on sf0.001") {
    val e1 = Ingest.edgesFromEvents(spark, "/root/testdata/sf0.001")
    val e2 = Ingest.edgesFromEvents(spark, "/root/testdata/sf0.001")
    val a = e1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.nonEmpty && a.forall(p => p._1 < p._2))
    assert(a === e2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}

class SortedIntersectCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("matches array_intersect size on sorted deduped random arrays (interpreted + codegen)") {
    val s = spark
    import s.implicits._
    graft.expr.SortedIntersectCount.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      rnd.shuffle((0L to 100L).toVector).take(rnd.nextInt(30)).sorted.toArray,
      rnd.shuffle((0L to 100L).toVector).take(rnd.nextInt(30)).sorted.toArray))
    val df = rows.toDF("a", "b")
      .select(
        call_function("sorted_intersect_count", col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("want"))
    assert(df.where(col("got") =!= col("want")).count() === 0L)
    assert(df.count() === 200L)
  }

  test("empty and null inputs") {
    val s = spark
    import s.implicits._
    graft.expr.SortedIntersectCount.register(spark)
    val df = Seq(
      (Array.empty[Long], Array(1L, 2L)),
      (Array(1L, 2L), Array.empty[Long])).toDF("a", "b")
    assert(df.select(call_function("sorted_intersect_count", col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq === Seq(0L, 0L))
  }
}

class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("equals the sequential aggregate fold bit-for-bit on random vectors") {
    val s = spark
    import s.implicits._
    graft.expr.DotProduct.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(300)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b").select(
      call_function(graft.expr.DotProduct.name, col("a"), col("b")).as("got"),
      aggregate(sequence(lit(0), size(col("a")) - 1), lit(0.0),
        (acc, j) => acc + element_at(col("a"), j.cast("int") + 1) *
          element_at(col("b"), j.cast("int") + 1)).as("want"))
    // bit-for-bit: the codegen loop accumulates in the same left-to-right order
    assert(df.where(col("got") =!= col("want")).count() === 0L)
    assert(df.count() === 300L)
  }

  test("null array element poisons the dot product to NULL (fold parity)") {
    val s = spark
    import s.implicits._
    graft.expr.DotProduct.register(spark)
    val df = Seq(
      (Seq(Option(1.0), None, Option(3.0)), Seq(Option(1.0), Option(2.0), Option(3.0))),
      (Seq(Option(1.0), Option(2.0)), Seq(Option(4.0), Option(5.0))))
      .toDF("a", "b")
      .select(call_function(graft.expr.DotProduct.name, col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0), "null element must yield NULL, not a fabricated score")
    assert(rows(1).getDouble(0) === 14.0)
  }

  test("empty arrays dot to 0.0; length mismatch is a hard error") {
    val s = spark
    import s.implicits._
    graft.expr.DotProduct.register(spark)
    val z = Seq((Array.empty[Double], Array.empty[Double])).toDF("a", "b")
      .select(call_function(graft.expr.DotProduct.name, col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(z === 0.0)
    val bad = Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
      .select(call_function(graft.expr.DotProduct.name, col("a"), col("b")))
    val e = intercept[Exception] { bad.collect() }
    assert(e.toString.contains("length mismatch") ||
      Option(e.getCause).exists(_.toString.contains("length mismatch")))
  }
}
