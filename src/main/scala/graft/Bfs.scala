package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source breadth-first distances — the shortest-path primitive the
  * other kernels don't cover (PageRank measures proximity by walk mass; this
  * measures it in hops). Synchronous min-plus relaxation: dist⁰ = 0 on the
  * source set, distᵏ⁺¹(v) = min(distᵏ(v), 1 + min over neighbors distᵏ(u)).
  * A fixed round budget R yields exact distances for every vertex within R
  * hops of a source; relaxing a fixpoint changes nothing (the same budget
  * idempotence as the k-core/k-truss peels), so the registered query is
  * expressible as unrolled non-recursive oracle SQL.
  *
  * Scale shape per round: the edge table (partitioned once by `src`, reused
  * every round) joins the current distance table — only the vertex-sized
  * distance rows move — then one map-side-combined `min` aggregate;
  * `localCheckpoint` truncates lineage. This is the [[PageRank]] iteration
  * discipline with (min, +1) in place of (sum, ·damping/deg). Unreached
  * vertices carry no row (a frontier that hasn't arrived is absence, not a
  * sentinel — no ∞ constant to overflow or leak).
  */
object Bfs {

  /** Hop distances from the source set selected by the per-row `isSource`
    * predicate (same predicate-not-table contract as
    * [[PageRank.personalizedFixedIterations]], and for the same reason: no
    * per-round vertex join). Output (v, dist) for vertices reached within
    * `rounds` hops; on a connected graph with rounds ≥ diameter this is every
    * vertex. */
  def distances(
      canonical: DataFrame,
      isSource: Column => Column,
      rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val sym = GraphCore.symmetric(canonical)
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = GraphCore.vertices(canonical)
      .where(isSource(col("v")))
      .select(col("v"), lit(0L).as("dist"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      dist = dist
        .unionAll(
          sym.join(dist.withColumnRenamed("v", "src"), "src")
            .select(col("dst").as("v"), (col("dist") + lit(1L)).as("dist")))
        .groupBy("v")
        .agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
    }
    sym.unpersist()
    dist
  }
}
