package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph normalization pipeline: arbitrary pair table → canonical undirected edges →
  * degrees → degree-ordered orientation → per-vertex sorted adjacency.
  *
  * This reproduces, as declarative Catalyst plans, the four ingest "rounds" of the
  * reference (`/root/reference/nvtc/TrCountingGraph.cpp:65-274`):
  *   - self-loop drop (TrCountingGraph.cpp:298) → `filter(src =!= dst)`
  *   - duplicate-edge dedup via INTMAX sentinels (TrCountingGraph.cpp:252-268)
  *     → `dropDuplicates` on the canonicalized pair (no sentinel dance)
  *   - degree counting (TrCountingGraph.cpp:101-132; we use exact counts where the
  *     reference sampled — orientation choice never changes the triangle total,
  *     SURVEY.md §7.6)
  *   - low-degree→high-degree edge orientation with id tie-break
  *     (report.md:7, TrCountingGraph.cpp:285-326)
  *   - CSR adjacency build + per-segment sort (TrCountingGraph.cpp:328-363, :276-281)
  *     → `groupBy(src).agg(sort_array(collect_list(dst)))`
  *
  * Scale notes (100 TB / 1000-executor design):
  *   - `clean` is one shuffle (the `distinct`); canonicalization happens map-side so
  *     the dedup shuffle also co-locates both directions of each undirected edge.
  *   - `degrees` is a partial-aggregated (map-side combined) count — the shuffle
  *     carries one row per (vertex, partition), not per edge.
  *   - the degree table has one row per vertex (≪ edges); AQE turns the orientation
  *     joins into broadcast joins whenever it fits, shuffled hash join otherwise.
  *   - orientation bounds out-degree at O(√m) (report.md:9), which is what keeps the
  *     `collect_list` adjacency segments and the downstream intersection balanced —
  *     hot vertices in a power-law graph land on the *in*-neighbor side, never as a
  *     grouping key with a huge list.
  */
object GraphCore {

  /** Arbitrary (src, dst) pair table → canonical undirected simple edges with
    * `src < dst`: self-loops dropped, nulls dropped, multi-edges deduplicated. */
  def clean(pairs: DataFrame): DataFrame =
    pairs
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()

  /** Exact per-vertex degree of the canonical undirected edge set.
    * One row per vertex: (v, deg). */
  def degrees(canonical: DataFrame): DataFrame =
    canonical
      .select(col("src").as("v"))
      .unionAll(canonical.select(col("dst").as("v")))
      .groupBy("v")
      .agg(count(lit(1)).as("deg"))

  /** All distinct vertices of the canonical edge set. */
  def vertices(canonical: DataFrame): DataFrame =
    canonical
      .select(col("src").as("v"))
      .unionAll(canonical.select(col("dst").as("v")))
      .distinct()

  /** Degree-ordered orientation: each undirected edge becomes one directed edge
    * pointing low-degree → high-degree, ties broken by smaller id first
    * (reference rule at report.md:7). Output schema (src, dst); every input edge
    * appears exactly once. */
  def orient(canonical: DataFrame, deg: DataFrame): DataFrame = {
    val du = deg.select(col("v").as("src"), col("deg").as("deg_src"))
    val dv = deg.select(col("v").as("dst"), col("deg").as("deg_dst"))
    val keep = col("deg_src") < col("deg_dst") ||
      (col("deg_src") === col("deg_dst") && col("src") < col("dst"))
    canonical
      .join(du, "src")
      .join(dv, "dst")
      .select(
        when(keep, col("src")).otherwise(col("dst")).as("src"),
        when(keep, col("dst")).otherwise(col("src")).as("dst"))
  }

  /** Convenience: clean + degrees + orient in one call. */
  def orientClean(pairs: DataFrame): DataFrame = {
    val canonical = clean(pairs)
    orient(canonical, degrees(canonical))
  }

  /** Per-vertex sorted out-adjacency of the oriented edge set — the CSR analog.
    * Output (v, deg, nbrs: array<long> sorted ascending). Out-degree is O(√m) by
    * the orientation invariant, so no single group can blow an executor. */
  def adjacency(oriented: DataFrame): DataFrame =
    oriented
      .groupBy(col("src").as("v"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .select(col("v"), size(col("nbrs")).cast("long").as("deg"), col("nbrs"))

  /** Symmetrized (both-direction) view of a canonical edge set, for kernels that
    * need full neighborhoods (PageRank / CC / LPA). Schema (src, dst). */
  def symmetric(canonical: DataFrame): DataFrame =
    canonical.unionAll(
      canonical.select(col("dst").as("src"), col("src").as("dst")))

  /** Per-partition CSR-style layout (north_star): adjacency rows range-partitioned
    * by vertex id and sorted within each partition, so each partition is a
    * contiguous, ordered CSR block — the Spark analog of the reference's
    * node-aligned balanced splits (`get_split_v2`, TrCountingGraph.cpp:365-380).
    * Range partitioning balances by ROW count (sampled), and since orientation
    * bounds every row's array at O(√m), row balance ≈ byte balance. */
  def csrPartitioned(adjacency: DataFrame, numPartitions: Int): DataFrame =
    adjacency
      .repartitionByRange(numPartitions, col("v"))
      .sortWithinPartitions(col("v"))
}
