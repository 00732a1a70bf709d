package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.SortedIntersectCount

/** Exact triangle counting — the headline kernel, matching the reference's
  * forward/compact-forward semantics (`/root/reference/report.md:5-9`) bit-for-bit on
  * its test graphs: orient edges low-degree→high-degree, then for every oriented edge
  * (u,v) count |N⁺(u) ∩ N⁺(v)|; each triangle is counted exactly once.
  *
  * Two physical shapes, identical results:
  *
  *  - [[globalRelational]]: a pure 3-way equi self-join on the oriented edge table —
  *    fully declarative, Catalyst plans the join order/strategies, and it is directly
  *    oracle-checkable in ANSI SQL. Wedge fan-out is bounded by the orientation
  *    invariant (out-degree ≤ O(√m), report.md:9) → O(m^1.5) worst-case work, the
  *    same bound as the reference kernel.
  *
  *  - [[globalAdjacency]]: the reference's actual physical shape — the CSR-style
  *    adjacency is BROADCAST (every reference rank holds the full graph), the
  *    oriented edge stream hash-probes it twice (src and dst sides) and runs the
  *    two-pointer sorted merge ([[graft.expr.SortedIntersectCount]], a codegen'd
  *    Catalyst expression) per edge inside the same stage, then one partial+final
  *    sum (the Spark analog of OpenMP `reduction(+:sum)` at
  *    TrCountingGraph.cpp:389 and `thrust::reduce` at gpu-thrust.cu:24-27).
  *    Neighbor arrays never enter a shuffle or sort — the round-1 shuffled-join
  *    variant shipped BOTH arrays with every edge row and spilled ~0.3 TB on a
  *    32M-edge input. When the adjacency exceeds executor memory
  *    (`broadcastAdj = false` escape hatch), shard the edge set and broadcast per
  *    shard — the reference's multi-GPU chunk split (main.cpp:87-120).
  */
object TriangleCount {

  /** Global triangle count via 3-way self-join of the oriented edge table.
    * Output: single row (triangles: long). */
  def globalRelational(oriented: DataFrame): DataFrame =
    trianglesRelational(oriented).agg(count(lit(1)).as("triangles"))

  /** All triangles as (a, b, c) rows in orientation order (a→b, b→c, a→c). */
  def trianglesRelational(oriented: DataFrame): DataFrame = {
    val e1 = oriented.select(col("src").as("a"), col("dst").as("b"))
    val e2 = oriented.select(col("src").as("b2"), col("dst").as("c"))
    val e3 = oriented.select(col("src").as("a3"), col("dst").as("c3"))
    e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-vertex triangle participation counts, including zero rows for vertices in
    * no triangle. Output (v, tri_cnt) — one row per vertex of the canonical set. */
  def perVertex(canonical: DataFrame, oriented: DataFrame): DataFrame = {
    val tris = trianglesRelational(oriented)
    val corners = tris.select(col("a").as("v"))
      .unionAll(tris.select(col("b").as("v")))
      .unionAll(tris.select(col("c").as("v")))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    GraphCore.vertices(canonical)
      .join(corners, Seq("v"), "left")
      .select(col("v"), coalesce(col("cnt"), lit(0L)).as("tri_cnt"))
  }

  /** Per-vertex counts in the adjacency (scale-path) form: for each oriented edge
    * (u,v), every w ∈ N⁺(u) ∩ N⁺(v) closes one triangle {u,v,w} — u, v and w each
    * get one credit. Materializes only the actual intersection elements (O(#triangles)
    * rows), never the O(m^1.5) wedge set of the relational form. Results identical
    * to [[perVertex]]. */
  def perVertexAdjacency(
      canonical: DataFrame,
      oriented: DataFrame,
      adj: DataFrame,
      broadcastAdj: Boolean = true): DataFrame = {
    // broadcast by default for the same reason as [[globalAdjacency]]
    def side(a: DataFrame) = if (broadcastAdj) broadcast(a) else a
    val adjU = side(adj.select(col("v").as("src"), col("nbrs").as("nbrs_u")))
    val adjV = side(adj.select(col("v").as("dst"), col("nbrs").as("nbrs_v")))
    val withW = oriented
      .join(adjU, "src")
      .join(adjV, "dst")
      .select(col("src"), col("dst"),
        array_intersect(col("nbrs_u"), col("nbrs_v")).as("ws"))
      .where(size(col("ws")) > 0)
      .transform(graft.CacheTracker.persist)
    val endpointCredits = withW
      .select(col("src").as("v"), size(col("ws")).cast("long").as("c"))
      .unionAll(withW.select(col("dst").as("v"), size(col("ws")).cast("long").as("c")))
    val witnessCredits = withW
      .select(explode(col("ws")).as("v"), lit(1L).as("c"))
    val corners = endpointCredits.unionAll(witnessCredits)
      .groupBy("v").agg(sum("c").as("cnt"))
    GraphCore.vertices(canonical)
      .join(corners, Seq("v"), "left")
      .select(col("v"), coalesce(col("cnt"), lit(0L)).as("tri_cnt"))
  }

  /** Global triangle count via adjacency-list intersection (the reference's physical
    * shape). `adj` must be [[GraphCore.adjacency]] of `oriented`.
    *
    * With `broadcastAdj = true` (default — the reference-faithful layout: every
    * MPI rank holds the FULL graph, main.cpp/TrCountingGraph replicate the CSR
    * per rank) the adjacency is broadcast and the edge stream flows through two
    * broadcast hash joins + the merge count inside ONE codegen stage — neighbor
    * arrays never enter a shuffle or sort. The shuffled-join alternative
    * (`broadcastAdj = false`) ships BOTH arrays with every edge row through a
    * sort-merge join: measured on a 32M-edge graph that materializes ~0.3 TB of
    * sort spill and exhausts local disk. Use false only when the adjacency
    * exceeds executor memory — at that point shard the edge set and broadcast
    * per-shard instead (the reference's multi-GPU split). */
  def globalAdjacency(
      spark: SparkSession,
      oriented: DataFrame,
      adj: DataFrame,
      broadcastAdj: Boolean = true): DataFrame = {
    SortedIntersectCount.register(spark)
    def side(a: DataFrame) = if (broadcastAdj) broadcast(a) else a
    val adjU = side(adj.select(col("v").as("src"), col("nbrs").as("nbrs_u")))
    val adjV = side(adj.select(col("v").as("dst"), col("nbrs").as("nbrs_v")))
    oriented
      .join(adjU, "src")
      .join(adjV, "dst")
      .select(call_function(SortedIntersectCount.name, col("nbrs_u"), col("nbrs_v")).as("cnt"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("triangles"))
  }

  /** End-to-end: arbitrary pair table → cleaned → oriented → global count
    * (relational form). */
  def countPairs(pairs: DataFrame): DataFrame =
    globalRelational(GraphCore.orientClean(pairs))

  /** End-to-end global count via the adjacency/merge form. */
  def countPairsAdjacency(spark: SparkSession, pairs: DataFrame): DataFrame = {
    val oriented = GraphCore.orientClean(pairs)
    globalAdjacency(spark, oriented, GraphCore.adjacency(oriented))
  }
}
