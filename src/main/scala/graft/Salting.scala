package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (BASELINE.json north_star: "explicit repartitioning,
  * salting, and AQE skew handling for hot vertices").
  *
  * Where skew actually bites in this engine, and what covers it:
  *  - algebraic aggregations (degree counts, PageRank contribution sums, LPA label
  *    counts) — covered for free by partial (map-side) aggregation: the shuffle
  *    carries one row per (key, upstream-partition), never per edge;
  *  - joins on skewed keys — covered by AQE skew-join splitting at runtime
  *    (sort-merge paths) and by broadcast joins (degree/adjacency tables);
  *  - NON-algebraic aggregations (collect_list / collect_set), where one hot key
  *    would funnel its entire group through a single reducer — THIS is the case
  *    needing explicit salting, provided here.
  *
  * [[saltedCollectSorted]] runs collect_list in two phases: phase 1 groups by
  * (key, salt) — the hot key's values spread over `salts` reducers — phase 2 merges
  * the per-salt arrays with `flatten` + one final sort. Equivalent output to
  * `sort_array(collect_list(...))`, bounded per-task memory.
  */
object Salting {

  /** Deterministic salt in [0, salts) derived from the value column — same rows
    * always land in the same salt bucket (reproducibility under retries matters;
    * `rand()` would break it). */
  def saltOf(value: Column, salts: Int): Column = pmod(xxhash64(value), lit(salts))

  /** Skew-safe equivalent of
    * `df.groupBy(key).agg(sort_array(collect_list(value)) as alias)`. */
  def saltedCollectSorted(
      df: DataFrame, key: String, value: String, alias: String, salts: Int = 16): DataFrame =
    df
      .groupBy(col(key), saltOf(col(value), salts).as("_salt"))
      .agg(collect_list(col(value)).as("_part"))
      .groupBy(col(key))
      .agg(array_sort(flatten(collect_list(col("_part")))).as(alias))

  /** Skew-safe equivalent of
    * `df.groupBy(key).agg(sort_array(collect_set(value)) as alias)`: phase 1
    * groups by (key, salt-of-value) — a hot key's values spread over `salts`
    * reducers, and the per-salt sets are DISJOINT because the salt is a
    * function of the value — phase 2 flattens and sorts. Wired into the
    * production transcript ingest ([[Ingest.edgesFromTranscripts]]): a
    * conversation with millions of turns would otherwise funnel every row
    * through the one reducer owning its conv_id. */
  def saltedCollectSetSorted(
      df: DataFrame, key: String, value: String, alias: String, salts: Int = 16): DataFrame =
    df
      .groupBy(col(key), saltOf(col(value), salts).as("_salt"))
      .agg(collect_set(col(value)).as("_part"))
      .groupBy(col(key))
      .agg(sort_array(flatten(collect_list(col("_part")))).as(alias))

  /** Skew-safe inner equi-join of a large skewed table against a small table:
    * the small side is replicated `salts`× (one copy per salt), the big side joins
    * on (key, deterministic salt) — a hot key's rows spread across `salts` tasks.
    * Use when AQE skew-join can't apply (e.g. the join must stay shuffled-hash). */
  def saltedJoinSmall(
      big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val smallSalted = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    bigSalted.join(smallSalted, Seq(key, "_salt")).drop("_salt")
  }
}
