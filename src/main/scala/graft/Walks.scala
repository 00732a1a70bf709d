package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic random walks — the sequence-corpus prep for walk-based
  * embedding training (DeepWalk / node2vec): each sampled start vertex emits a
  * fixed-length vertex sequence, and the "random" neighbor choice is a pure
  * function of (current vertex, step) via the engine's portable affine-remix
  * hash — so walks are reproducible across retries, engines, and cluster
  * sizes, and the whole corpus is DuckDB-oracle-checkable.
  *
  * Neighborhoods are CAPPED at `maxNeighbors` (sorted, first k) — the standard
  * neighbor-sampling bound of walk/GNN data prep (GraphSAGE-style), and what
  * keeps the per-row adjacency payload bounded at 100 TB: a 10⁸-degree hub
  * contributes one `maxNeighbors`-sized row, not an unbounded array.
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

  /** Walks of `steps` hops from every vertex with `v ≡ 0 (mod startMod)`.
    * Output (walk_id, step, v): (steps+1) rows per start, step 0 = the start
    * itself. Neighbor choice at step s from vertex v: index
    * `((v mod P)·A + s·B) mod P mod |N_cap(v)|` into the sorted capped
    * neighbor list. */
  def deterministicWalks(
      canonical: DataFrame,
      steps: Int,
      startMod: Int,
      maxNeighbors: Int = 1024): DataFrame = {
    require(steps >= 0 && startMod > 0 && maxNeighbors > 0)
    val adj = CacheTracker.persist(
      GraphCore.symmetric(canonical)
        .groupBy(col("src").as("av"))
        .agg(slice(sort_array(collect_set(col("dst"))), 1, maxNeighbors).as("nbrs")))
    def pick(v: Column, step: Int): Column = {
      val h = pmod(pmod(v, lit(P)) * lit(A) + lit(step.toLong * B), lit(P))
      element_at(col("nbrs"), (h % size(col("nbrs")) + 1).cast("int"))
    }
    var cur = GraphCore.vertices(canonical)
      .where(pmod(col("v"), lit(startMod.toLong)) === 0)
      .select(col("v").as("walk_id"), col("v"), lit(0L).as("step"))
    var acc = cur
    for (s <- 1 to steps) {
      cur = cur
        .join(adj, cur("v") === adj("av"))
        .select(col("walk_id"), pick(col("v"), s).as("v"), lit(s.toLong).as("step"))
      acc = acc.unionAll(cur)
    }
    acc
  }
}
