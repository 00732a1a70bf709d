package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Turn

/** Structured Streaming surface over the transcripts table: incremental ingest of
  * the same (conv_id, turn_idx, role, text, tool, ts) schema the batch path reads.
  *
  * The reference is strictly batch (SURVEY.md §2.10) — this is the engine's
  * incremental-ingest addition: new transcript files landing in a directory are
  * micro-batched, watermarked on event time `ts`, and folded into (a) windowed
  * participant activity aggregates and (b) per-conversation running state via
  * `flatMapGroupsWithState` (the custom-state path for conversation-level features
  * that pure windowed aggs can't express).
  *
  * State scale: conversation state is keyed by conv_id and evicted by event-time
  * timeout after the watermark passes — state size tracks *active* conversations,
  * not history, which is what makes it viable at 10^12-turn scale.
  */
object StreamingIngest {

  val turnSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Turn].schema

  /** Open a file-based transcript stream (parquet files arriving under `dir`). */
  def readTranscripts(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(turnSchema).parquet(dir)

  /** Windowed participant activity: turns per (1-minute window, participant), where
    * participant = role or tool. Watermark 10 minutes — late turns beyond it are
    * dropped deterministically. Append-mode compatible. */
  def participantActivity(transcripts: DataFrame): DataFrame = {
    val participants = transcripts.select(col("ts"), col("role").as("p"))
      .unionAll(transcripts.where(col("tool").isNotNull).select(col("ts"), col("tool").as("p")))
    participants
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("p"))
      .agg(count(lit(1)).as("turns"))
      .select(col("window.start").as("window_start"), col("p"), col("turns"))
  }

  /** Streaming exact dedup over a documents stream (doc_id, text, ts): emits only
    * the first-seen document per 128-bit normalized-content hash (the streaming
    * twin of [[graft.docs.Dedup.exact]], same two-seed xxhash64 key — never the
    * full text as state). State is evicted by the watermark
    * (`dropDuplicatesWithinWatermark`): duplicates arriving later than the delay
    * count as new — the standard streaming-dedup contract that keeps state
    * proportional to the watermark window's distinct docs, not to history. */
  def dedupDocuments(docs: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .select(col("doc_id"), col("ts"), col("text"),
        graft.docs.TextOps.normalized(col("text")).as("norm"))
      .select(col("doc_id"), col("ts"), col("text"),
        xxhash64(col("norm")).as("h1"),
        xxhash64(lit("graft.dedup.exact/2"), col("norm")).as("h2"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("h1", "h2")
      .select(col("doc_id"), col("ts"), col("text"))

  /** Streaming gap-based sessionization of an events stream (event_id, user_id,
    * ts) — the incremental twin of the oracled batch [[graft.Ingest.sessionize]],
    * via Spark's native `session_window` (the idiomatic streaming form: dynamic
    * event-time windows that extend while events arrive within `gap` and close
    * once the watermark passes end-of-session). One row per CLOSED session:
    * (user_id, session_start, session_end, n_events) with
    * session_end = last event + gap, the standard session-window contract.
    * State tracks open sessions only — not history — so it holds at stream
    * scale for the same reason [[dedupDocuments]] does. */
  def sessionizeEvents(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  final case class ConvState(turns: Int, participants: Set[String], lastTs: Long)
  final case class ConvUpdate(conv_id: String, turns: Int, n_participants: Int, closed: Boolean)

  /** Per-conversation running state: turn count + distinct participant set, emitted
    * on every update; marked closed when the conversation times out (no event within
    * `timeoutMs` of event time, gated by the watermark). */
  /** One `events` row, with the day pre-derived by Catalyst (`ts::date` under
    * the session timezone — NOT JVM-default-zone arithmetic). */
  case class EvRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, day: java.sql.Date)

  /** Per-(event_type, day) sequencing state: the last event seen and the set
    * of already-emitted canonical pairs (the streaming stand-in for the batch
    * form's trailing `distinct`). Bounded by the day's distinct pair count for
    * one stream, evicted by event-time timeout after the day goes quiet. */
  case class DailyEdgeState(lastTs: Long, lastEventId: Long, lastUser: Long,
      emitted: Set[(Long, Long)])

  case class DailyEdge(day: java.sql.Date, src: Long, dst: Long)

  /** Name of the [[dailyEdgeStream]] contract-violation accumulator. */
  val lateDropsAccName = "graft.dailyEdgeStream.lateDrops"

  /** Streaming twin of [[graft.Ingest.edgesFromEventsDaily]]: consecutive-user
    * co-occurrence within each (event_type, day) stream, derived incrementally
    * with `flatMapGroupsWithState` — the carried state is the last event plus
    * the emitted-pair set, so each canonical edge is emitted exactly once, as
    * soon as it first occurs. Streams reset at day boundaries because the day
    * is part of the group key (exactly the batch window's partition spec).
    *
    * Contract: within a group, events must arrive in event-time order across
    * micro-batches (each batch is sorted internally) — the standard caveat for
    * any sequential-pairing state; the watermark bounds how late data may be.
    * A row that VIOLATES the contract — (ts, event_id) behind the state's last
    * processed event, i.e. admitted by the watermark but arriving in a later
    * micro-batch — is DROPPED and counted in the `lateDropsAcc` accumulator
    * (round-4 advice: pairing it against the newer lastUser would silently
    * diverge from the batch twin; dropping keeps every emitted edge one the
    * batch derivation also emits, and the count makes violation observable).
    * Stream==batch differential + late-drop test in StreamingSpec. */
  def dailyEdgeStream(
      spark: SparkSession,
      events: DataFrame,
      watermarkDelay: String = "10 minutes",
      timeoutMs: Long = 24L * 3600 * 1000,
      lateDropsAcc: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[DailyEdge] = {
    import spark.implicits._
    val lateDrops = lateDropsAcc.getOrElse(spark.sparkContext.longAccumulator(lateDropsAccName))
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("ts").cast("date").as("day"))
      .as[EvRow]
      .groupByKey(e => (e.event_type, e.day.toString))
      .flatMapGroupsWithState[DailyEdgeState, DailyEdge](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (String, String), rows: Iterator[EvRow], state: GroupState[DailyEdgeState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption
              .getOrElse(DailyEdgeState(Long.MinValue, Long.MinValue, Long.MinValue, Set.empty))
            val (batch, late) = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
              .partition(e => e.ts.getTime > st.lastTs ||
                (e.ts.getTime == st.lastTs && e.event_id >= st.lastEventId))
            if (late.nonEmpty) lateDrops.add(late.size.toLong)
            var last = if (st.lastTs == Long.MinValue) None else Some(st.lastUser)
            var emitted = st.emitted
            val out = Seq.newBuilder[DailyEdge]
            batch.foreach { e =>
              last.foreach { prev =>
                if (prev != e.user_id) {
                  val p = (math.min(prev, e.user_id), math.max(prev, e.user_id))
                  if (!emitted(p)) {
                    emitted += p
                    out += DailyEdge(e.day, p._1, p._2)
                  }
                }
              }
              last = Some(e.user_id)
            }
            batch.lastOption.foreach { lastEv =>
              state.update(DailyEdgeState(lastEv.ts.getTime, lastEv.event_id,
                lastEv.user_id, emitted))
              state.setTimeoutTimestamp(lastEv.ts.getTime + timeoutMs)
            }
            out.result().iterator
          }
      }
  }

  def conversationProgress(
      spark: SparkSession,
      transcripts: DataFrame,
      timeoutMs: Long = 60 * 60 * 1000L): Dataset[ConvUpdate] = {
    import spark.implicits._
    transcripts
      .withWatermark("ts", "10 minutes")
      .as[Turn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, ConvUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (convId: String, turns: Iterator[Turn], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ConvUpdate(convId, s.turns, s.participants.size, closed = true))
          } else {
            val prev = state.getOption.getOrElse(ConvState(0, Set.empty, 0L))
            val batch = turns.toSeq
            val ps = batch.flatMap(t => Option(t.tool).toSeq :+ t.role).toSet
            val next = ConvState(
              prev.turns + batch.size,
              prev.participants ++ ps,
              math.max(prev.lastTs, batch.map(_.ts.getTime).max))
            state.update(next)
            state.setTimeoutTimestamp(next.lastTs + timeoutMs)
            Iterator.single(ConvUpdate(convId, next.turns, next.participants.size, closed = false))
          }
      }
  }
}
