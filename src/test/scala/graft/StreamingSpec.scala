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
