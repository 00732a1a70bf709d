package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edge-table derivation — the engine's source layer.
  *
  * The reference's only source is a headerless binary edge file
  * (`/root/reference/nvtc/TrCountingGraph.cpp:48-53`). Our engine derives edges from
  * relational tables instead (BASELINE.json input_hint):
  *
  *  - [[edgesFromTranscripts]]: the production path — participant co-occurrence
  *    within a conversation over the transcripts table
  *    (conv_id, turn_idx, role, text, tool, ts).
  *  - [[edgesFromEvents]]: the oracle path over the driver's deterministic `events`
  *    parquet — temporal co-occurrence (consecutive actors within an event_type
  *    stream), exactly expressible in ANSI SQL for the DuckDB oracle.
  *
  * Both produce the canonical undirected simple-edge schema (src: long, dst: long,
  * src < dst) via [[GraphCore.clean]].
  */
object Ingest {

  /** Read one of the driver's parquet tables under `sfDir`. Filters and column
    * pruning push down to the parquet scan. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Format seam for the transcripts source (SURVEY.md §7.3): a catalog table name
    * (`catalog.db.transcripts` — the Iceberg deployment path; no Iceberg jar ships
    * in this sandbox) or a parquet path/glob. Schema is identical either way; every
    * downstream operator is source-agnostic. */
  def transcripts(spark: SparkSession, ref: String): DataFrame =
    if (ref.contains("/") || ref.endsWith(".parquet")) spark.read.parquet(ref)
    else spark.read.table(ref)

  /** Canonical edges from the `events` table: within each `event_type` stream ordered
    * by (ts, event_id), each event links its user to the previous event's user.
    * Deterministic, sparse (≤ one raw pair per event), and 1:1 expressible in DuckDB
    * SQL — see [[OracleSql.edgesCte]]. */
  def edgesFromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val events = table(spark, sfDir, "events")
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("event_type"), col("ts"), col("event_id"), col("user_id"))
      .withColumn("prev", lag(col("user_id"), 1).over(w))
      .select(col("user_id").as("src"), col("prev").as("dst"))
    GraphCore.clean(pairs)
  }

  /** Canonical participant co-occurrence edges from a transcripts table.
    *
    * Participants of a conversation = its distinct `role` values ∪ its distinct
    * non-null `tool` values, each hashed to a stable Long id with `xxhash64`
    * (sparse ids; the reference's dense int32 space is not assumed — SURVEY.md §1.5).
    * An edge joins every pair of participants that co-occur in the same `conv_id`.
    *
    * Scale shape: `conv_id → collect_set(participant)` is one map-side-combined
    * shuffle keyed by conversation; the pair explosion is quadratic only in the
    * participant count *per conversation* (small by construction — roles + tools of
    * one conversation), never in global cardinality. At 10^12 turns this is one scan
    * + one shuffle of |convs| rows.
    */
  def edgesFromTranscripts(transcripts: DataFrame): DataFrame = {
    val participants = transcripts
      .select(col("conv_id"), col("role").as("p"))
      .unionAll(
        transcripts.where(col("tool").isNotNull)
          .select(col("conv_id"), col("tool").as("p")))
      .groupBy("conv_id")
      .agg(sort_array(collect_set(xxhash64(col("p")))).as("ps"))
    // All ordered pairs (i < j) from each conversation's sorted participant array.
    participants
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x as src, y as dst))))"
      )).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
  }

  /** Stable participant id used by [[edgesFromTranscripts]], exposed so tests and
    * downstream lookups can reverse the mapping via a dimension table. */
  def participantId(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(name)

  /** The reference's own input format: a headerless binary file of little-endian
    * uint32 pairs, edge count = file_size/8 with a trailing partial record silently
    * dropped (TrCountingGraph.cpp:48-53 — documented reference semantics, asserted
    * by our malformed-input test). Accepts a glob so a directory of shards scans in
    * parallel. Output: raw (src, dst) pairs — feed through [[GraphCore.clean]]. */
  def edgesFromBinary(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val m = bytes.length / 8
        val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (0 until m.toInt).iterator.map { i =>
          Edge(buf.getInt(i * 8) & 0xFFFFFFFFL, buf.getInt(i * 8 + 4) & 0xFFFFFFFFL)
        }
      }
      .toDF()
  }
}
