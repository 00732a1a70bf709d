package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Write a batch of synth transcripts as the stream source dir. */
  private def stageTranscripts(nConvs: Int, turns: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Transcripts.synth(spark, nConvs, turns).write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed participant activity: streaming result equals the batch computation") {
    val dir = stageTranscripts(30, 10)
    val q = StreamingIngest.participantActivity(StreamingIngest.readTranscripts(spark, dir))
      .writeStream.format("memory").queryName("activity").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode only emits windows the watermark has passed; feed a second
      // batch far in the future to flush, then compare the flushed windows
      Transcripts.synth(spark, 1, 1, seed = 99L)
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("activity")
        .where(col("window_start") < "2029-01-01")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = {
        val t = spark.read.parquet(dir).where(col("ts") < "2029-01-01")
        val p = t.select(col("ts"), col("role").as("p"))
          .unionAll(t.where(col("tool").isNotNull).select(col("ts"), col("tool").as("p")))
        p.groupBy(window(col("ts"), "1 minute"), col("p")).agg(count(lit(1)).as("n"))
          .select(col("window.start"), col("p"), col("n"))
          .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      }
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup: one emitted row per normalized text, matches batch dedup") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-docs").toString
    val spark0 = spark
    import spark0.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    Seq(
      (0L, "alpha beta gamma", ts(0)),
      (1L, "ALPHA  beta gamma", ts(1)), // dup of 0 after normalization
      (2L, "something else entirely", ts(2)),
      (3L, "alpha beta gamma", ts(3)), // dup of 0 verbatim
      (4L, "fourth unique doc", ts(4)))
      .toDF("doc_id", "text", "ts")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = StreamingIngest.dedupDocuments(
        spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("dedup_docs").outputMode("append").start()
    try {
      q.processAllAvailable()
      val norms = spark.table("dedup_docs")
        .select(graft.docs.TextOps.normalized(col("text")).as("n")).collect().map(_.getString(0))
      assert(norms.length === 3, s"expected 3 first-seen docs, got ${norms.toSeq}")
      assert(norms.toSet.size === 3, "exactly one row per normalized text")
      val batchNorms = spark.read.parquet(dir)
        .select(graft.docs.TextOps.normalized(col("text")).as("n")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(norms.toSet === batchNorms)
    } finally q.stop()
  }

  test("streaming sessionization equals the batch sessionize-derived session windows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sess").toString
    val spark0 = spark
    import spark0.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // user 1: two sessions split by a 45-min gap; user 2: one session
    Seq(
      (10L, 1L, ts(0)), (11L, 1L, ts(10)), (12L, 1L, ts(20)),
      (13L, 1L, ts(65)), (14L, 1L, ts(70)),
      (20L, 2L, ts(5)), (21L, 2L, ts(6)))
      .toDF("event_id", "user_id", "ts")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = StreamingIngest.sessionizeEvents(
        spark.readStream.schema(schema).parquet(dir), gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      q.processAllAvailable()
      // flush: a far-future event advances the watermark past every session end
      Seq((99L, 9L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
        .toDF("event_id", "user_id", "ts").write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("sessions")
        .where(col("session_start") < "2029-01-01")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)) -> r.getLong(3)).toMap
      // batch twin: session windows derived from the oracled gap sessionize
      val batch = Ingest.sessionize(
          spark.read.parquet(dir).where(col("ts") < "2029-01-01"), gapSeconds = 1800)
        .join(spark.read.parquet(dir).select(col("event_id"), col("ts")), "event_id")
        .groupBy(col("user_id"), col("session_idx"))
        .agg(min(col("ts")).as("s"),
          (max(col("ts")) + expr("INTERVAL 30 MINUTES")).as("e"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3)) -> r.getLong(4)).toMap
      assert(streamed.size === 3)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("daily edge stream equals the batch day-keyed derivation (two days, two micro-batches)") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ev").toString
    val ts = (x: String) => java.sql.Timestamp.valueOf(x)
    // same two-day shape as the batch fixture: day-1 triangle, day-2 path; the
    // day-boundary pair (1,4) must not appear. Second chunk arrives later
    // IN ORDER (the sequential-pairing contract) and repeats an edge (dedup).
    val chunk1 = Seq(
      (10L, ts("2026-03-01 10:00:00"), 1L, "t"),
      (11L, ts("2026-03-01 10:01:00"), 2L, "t"),
      (12L, ts("2026-03-01 10:02:00"), 3L, "t"))
    val chunk2 = Seq(
      (13L, ts("2026-03-01 10:03:00"), 1L, "t"),
      (14L, ts("2026-03-01 10:04:00"), 2L, "t"), // repeats edge (1,2) → no re-emit
      (20L, ts("2026-03-02 09:00:00"), 4L, "t"),
      (21L, ts("2026-03-02 09:01:00"), 5L, "t"),
      (22L, ts("2026-03-02 09:02:00"), 6L, "t"))
    // layout matches Ingest.table(dir, "events") so the batch twin reads the
    // exact same files the stream consumes
    chunk1.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING")
      .parquet(s"$dir/events.parquet")
    val q = StreamingIngest.dailyEdgeStream(spark, stream)
      .toDF()
      .writeStream.format("memory").queryName("daily_edges").outputMode("append").start()
    try {
      q.processAllAvailable()
      chunk2.toDF("event_id", "ts", "user_id", "event_type")
        .write.mode("append").parquet(s"$dir/events.parquet")
      q.processAllAvailable()
      val streamed = spark.table("daily_edges")
        .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
      val batch = Ingest.edgesFromEventsDaily(spark, dir)
        .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed === Set(
        ("2026-03-01", 1L, 2L), ("2026-03-01", 2L, 3L), ("2026-03-01", 1L, 3L),
        ("2026-03-02", 4L, 5L), ("2026-03-02", 5L, 6L)))
    } finally q.stop()
  }

  test("daily edge stream: a contract-violating late row is dropped and counted, never mis-paired") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-late").toString
    val ts = (x: String) => java.sql.Timestamp.valueOf(x)
    val chunk1 = Seq(
      (10L, ts("2026-03-01 10:00:00"), 1L, "t"),
      (11L, ts("2026-03-01 10:01:00"), 2L, "t"))
    // event 9 is WITHIN the watermark but BEHIND the state's last processed
    // event — the in-order contract violation. Pairing it against lastUser=2
    // would emit the bogus (2,7); it must be dropped and counted instead.
    val chunk2 = Seq(
      (9L, ts("2026-03-01 10:00:30"), 7L, "t"),
      (12L, ts("2026-03-01 10:02:00"), 3L, "t"))
    chunk1.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING")
      .parquet(s"$dir/events.parquet")
    val acc = spark.sparkContext.longAccumulator("test.lateDrops")
    val q = StreamingIngest.dailyEdgeStream(spark, stream, lateDropsAcc = Some(acc))
      .toDF()
      .writeStream.format("memory").queryName("daily_edges_late").outputMode("append").start()
    try {
      q.processAllAvailable()
      chunk2.toDF("event_id", "ts", "user_id", "event_type")
        .write.mode("append").parquet(s"$dir/events.parquet")
      q.processAllAvailable()
      val streamed = spark.table("daily_edges_late")
        .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
      // exactly the in-order subsequence's edges: 1-2 then 2-3; user 7 nowhere
      assert(streamed === Set(("2026-03-01", 1L, 2L), ("2026-03-01", 2L, 3L)))
      assert(acc.value === 1L, "the contract violation must be observable")
    } finally q.stop()
  }

  test("conversation progress: running state counts turns and participants per conversation") {
    val dir = stageTranscripts(10, 6)
    val q = StreamingIngest.conversationProgress(spark,
        StreamingIngest.readTranscripts(spark, dir))
      .toDF()
      .writeStream.format("memory").queryName("convs").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("convs")
        .groupBy("conv_id").agg(max("turns").as("turns"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got.size === 10)
      assert(got.values.forall(_ === 6))
    } finally q.stop()
  }
}
