package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of transcript tables in the BASELINE.json input_hint shape
  * `(conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp)`.
  *
  * Everything is a pure function of row index (seeded by mixing through `xxhash64`) —
  * no wall clock, no RNG state — so any scale regenerates bit-identically, which is
  * what the per-turn text-equality invariant tests rely on. Generated distributed via
  * `spark.range` (no driver-side materialization), so the same generator scales to
  * bench sizes.
  */
object Transcripts {

  private val epoch = 1704067200L // 2024-01-01T00:00:00Z

  private val vocab = array(Seq(
    "plan", "scan", "join", "agg", "shuffle", "filter", "sort", "hash",
    "merge", "batch", "stream", "vector", "column", "row", "key", "value",
    "graph", "edge", "vertex", "triangle", "rank", "label", "component", "degree",
    "read", "write", "spill", "broadcast", "partition", "skew", "salt", "codegen"
  ).map(lit): _*)

  /** `nConvs` conversations × `turnsPerConv` turns, alternating user/assistant roles;
    * roughly a third of assistant turns carry a deterministic tool out of a universe
    * of `nTools` names. Tool popularity is skewed (Zipf-ish via pow(u, `skew`)) so
    * the derived co-occurrence graph has the hot-vertex structure of real agent
    * traffic — the case the engine's orientation/salting/AQE story must handle. */
  def synth(
      spark: SparkSession,
      nConvs: Long,
      turnsPerConv: Int,
      seed: Long = 42L,
      nTools: Int = 4,
      skew: Double = 1.0): Dataset[Turn] = {
    import spark.implicits._
    val h = xxhash64(lit(seed), col("conv"), col("turn_idx"))
    // uniform in [0,1) from the hash, then skewed: floor(nTools * u^skew)
    val u = pmod(h, lit(1000000L)).cast("double") / 1000000.0
    val toolIdx = floor(pow(u, skew) * nTools).cast("int")
    spark.range(nConvs * turnsPerConv)
      .select(
        (col("id") / turnsPerConv).cast("long").as("conv"),
        pmod(col("id"), lit(turnsPerConv)).cast("int").as("turn_idx"))
      .select(
        concat(lit("conv-"), lpad(col("conv").cast("string"), 8, "0")).as("conv_id"),
        col("turn_idx"),
        when(pmod(col("turn_idx"), lit(2)) === 0, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        concat_ws(" ", transform(
          sequence(lit(0), pmod(h, lit(16)).cast("int") + lit(4)),
          i => element_at(vocab, pmod(h + i * lit(2654435761L), lit(32)).cast("int") + 1)
        )).as("text"),
        when(
          pmod(col("turn_idx"), lit(2)) === 1 && pmod(h, lit(3)) === 0,
          concat(lit("tool-"), toolIdx.cast("string"))
        ).otherwise(lit(null).cast("string")).as("tool"),
        timestamp_seconds(lit(epoch) + col("conv") * 3600 + col("turn_idx") * 7).as("ts"))
      .as[Turn]
  }

  /** Deterministic transcripts table derived from the driver's `documents` parquet
    * (same input_hint shape as [[synth]]): doc i becomes turn (i div 40) of
    * conversation (i mod 40), with 5 rotating roles and a skewed tool on every
    * third turn. Exists so the full transcripts→edges ingest path has a
    * parquet-rooted DuckDB oracle ([[OracleSql.transcriptEdges]]) — [[synth]]
    * itself mixes through xxhash64, which has no DuckDB twin. */
  def fromDocuments(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(
      concat(lit("conv-"), pmod(col("doc_id"), lit(40L)).cast("string")).as("conv_id"),
      floor(col("doc_id") / 40).cast("int").as("turn_idx"),
      concat(lit("role-"),
        pmod(floor(col("doc_id") / 40).cast("long"), lit(5L)).cast("string")).as("role"),
      col("text"),
      when(pmod(col("doc_id"), lit(3L)) === 0,
        concat(lit("tool-"),
          pmod(pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L), lit(1000000007L)),
            lit(13L)).cast("string")))
        .otherwise(lit(null).cast("string")).as("tool"),
      timestamp_seconds(lit(epoch) + col("doc_id")).as("ts"))

  /** A transcripts table whose derived participant graph
    * ([[Ingest.edgesFromTranscripts]]) is isomorphic to the given edge list: one
    * two-turn conversation per edge, participants named `p<u>` / `p<v>` as roles.
    * Used to reproduce the reference fixture goldens end-to-end from ingest. */
  def fixture(spark: SparkSession, edges: Seq[(Long, Long)]): Dataset[Turn] = {
    import spark.implicits._
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq(
        Turn(f"fix-$i%04d", 0, s"p$u", s"edge $i from p$u", null,
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(epoch + i * 60L))),
        Turn(f"fix-$i%04d", 1, s"p$v", s"edge $i to p$v", null,
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(epoch + i * 60L + 7))))
    }.toDS()
  }
}
