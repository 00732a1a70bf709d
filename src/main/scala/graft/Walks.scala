package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic random walks — the sequence-corpus prep for walk-based
  * embedding training (DeepWalk / node2vec): each sampled start vertex emits a
  * fixed-length vertex sequence, and the "random" neighbor choice is a pure
  * function of (walk id, current vertex, step) via the engine's portable
  * affine-remix hash — so walks are reproducible across retries, engines, and
  * cluster sizes, and the whole corpus is DuckDB-oracle-checkable. The walk id
  * is part of the hash so two walks that MEET at the same vertex at the same
  * step still continue independently — without it, walks merge on contact and
  * a DeepWalk corpus collapses to suffix-shared sequences (round-4 verdict).
  *
  * Neighborhoods are CAPPED at `maxNeighbors` (sorted, first k) — the standard
  * neighbor-sampling bound of walk/GNN data prep (GraphSAGE-style), and what
  * keeps the per-row adjacency payload bounded at 100 TB: a 10⁸-degree hub
  * contributes one `maxNeighbors`-sized row, not an unbounded array. The cap
  * is applied BEFORE any unbounded per-key state exists: phase 1 groups by
  * (vertex, salt-of-neighbor) and keeps at most `maxNeighbors` smallest per
  * salt — a hub's neighborhood spreads over `salts` reducers, each holding
  * ~deg/salts values — phase 2 merges the (disjoint, because the salt is a
  * function of the neighbor) per-salt arrays and slices the global k smallest.
  * Any global top-k element is in its salt's top-k, so the two-phase form is
  * exactly `slice(sort_array(collect_set(dst)), 1, k)` with bounded state.
  *
  * Scale shape: the capped adjacency is built once and persisted; each step is
  * one vertex-keyed equi-join of the walk frontier (start-sample-sized, only
  * it moves) against that table plus per-row index arithmetic — the PageRank
  * "only the small table moves" discipline with `element_at` in place of the
  * rank sum.
  */
object Walks {

  private val P = 1000000007L
  private val A = 2654435761L
  private val B = 40503L
  private val C = 69069L

  /** Capped sorted adjacency (av, nbrs): the `maxNeighbors` SMALLEST distinct
    * neighbors per vertex, built with the two-phase salted collect described
    * above — no aggregation buffer ever holds an uncapped hub neighborhood. */
  private[graft] def cappedAdjacency(
      canonical: DataFrame, maxNeighbors: Int, salts: Int = 16): DataFrame =
    GraphCore.symmetric(canonical)
      .groupBy(col("src").as("av"), Salting.saltOf(col("dst"), salts).as("_salt"))
      .agg(slice(sort_array(collect_set(col("dst"))), 1, maxNeighbors).as("_part"))
      .groupBy(col("av"))
      .agg(slice(array_sort(flatten(collect_list(col("_part")))), 1, maxNeighbors)
        .as("nbrs"))

  /** Walks of `steps` hops from every vertex with `v ≡ 0 (mod startMod)`.
    * Output (walk_id, step, v): (steps+1) rows per start, step 0 = the start
    * itself. Neighbor choice at step s of walk g standing on vertex v: index
    * `((v mod P)·A + s·B + (g mod P)·C) mod P mod |N_cap(v)|` into the sorted
    * capped neighbor list (mirrored in [[OracleSql.deterministicWalks]]). */
  def deterministicWalks(
      canonical: DataFrame,
      steps: Int,
      startMod: Int,
      maxNeighbors: Int = 1024): DataFrame = {
    require(steps >= 0 && startMod > 0 && maxNeighbors > 0)
    val adj = CacheTracker.persist(cappedAdjacency(canonical, maxNeighbors))
    def pick(v: Column, step: Int): Column = {
      val h = pmod(
        pmod(v, lit(P)) * lit(A) + lit(step.toLong * B) + pmod(col("walk_id"), lit(P)) * lit(C),
        lit(P))
      element_at(col("nbrs"), (h % size(col("nbrs")) + 1).cast("int"))
    }
    var cur = GraphCore.vertices(canonical)
      .where(pmod(col("v"), lit(startMod.toLong)) === 0)
      .select(col("v").as("walk_id"), lit(0L).as("step"), col("v"))
    var acc = cur
    for (s <- 1 to steps) {
      cur = cur
        .join(adj, cur("v") === adj("av"))
        .select(col("walk_id"), lit(s.toLong).as("step"), pick(col("v"), s).as("v"))
        // LAZY checkpoint per step (round-7): without it the final union's
        // branch for step s re-executed the whole s-join chain from the start
        // sample — Σ s = steps(steps+1)/2 join executions instead of `steps`
        // (nothing shares the un-cached subtrees; exchange reuse cannot help a
        // broadcast-join chain). Cached per step, each join runs once and the
        // union reads the cached frontiers.
        .localCheckpoint(false)
      acc = acc.unionAll(cur)
    }
    acc
  }
}
