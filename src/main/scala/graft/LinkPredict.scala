package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link-prediction scores — the standard "which non-edges
  * are likely edges" consumer of the same adjacency structure the triangle
  * kernel intersects (a wedge (u, z, w) with u–w absent is exactly an OPEN
  * triangle; the reference's closed-triangle count and these open-triangle
  * scores are two reads of one wedge set).
  *
  * For every non-adjacent pair {u, w} at distance 2 we emit the three classic
  * scores over the common-neighbor set CN(u, w):
  *   - `cn`  — |CN(u, w)| (common neighbors),
  *   - `aa`  — Adamic–Adar Σ_{z ∈ CN} 1/ln(deg z) (hub middles discounted),
  *   - `jac` — Jaccard |CN| / |N(u) ∪ N(w)|.
  *
  * Scale shape: wedges come from the symmetric edge set self-joined on the
  * middle vertex — output size Σ_z C(deg z, 2) is inherent to wedge semantics
  * (the same Σ the reference's transitivity denominator counts), and the
  * group-by that follows is map-side combinable, so the shuffle after the
  * explosion carries one row per (u, w, partition), not per wedge. A hub
  * middle z concentrates its C(deg z, 2) wedge rows in one join task; the
  * standard mitigations compose here — degree-cap the middles (hubs contribute
  * ~0 to `aa` anyway: 1/ln(10⁸) ≈ 0.05) or salt the self-join with
  * [[Salting]]. The per-vertex degree table (one row per
  * vertex, ≪ edges) joins un-hinted — AQE broadcasts it while it fits and
  * falls back to shuffled-hash beyond that (the [[GraphCore.orient]] rule).
  */
object LinkPredict {

  /** Scores for every non-adjacent distance-2 pair of the canonical undirected
    * edge set. Output (u, w, cn, aa, jac) with u < w, one row per candidate
    * pair; doubles rounded to 6 decimals (the repo-wide oracle contract for
    * float-summed columns).
    *
    * `maxMiddleDegree` (optional) drops wedge middles above a degree cap —
    * the documented hub mitigation; the default Long.MaxValue keeps exact
    * semantics (and is what the registered oracle query uses). */
  def scores(canonical: DataFrame, maxMiddleDegree: Long = Long.MaxValue): DataFrame = {
    val ud = CacheTracker.persist(GraphCore.symmetric(canonical))
    val deg = CacheTracker.persist(GraphCore.degrees(canonical))
    val dz = deg.where(col("deg") <= maxMiddleDegree)
      .select(col("v").as("z"), col("deg").as("deg_z"))
    // wedges (u, z, w): z adjacent to both u and w, endpoints canonicalized.
    // The middle-degree join lands on ONE leg BEFORE the self-join, so a capped
    // hub never reaches the explosion (and deg_z rides along for free).
    val wedges = ud.select(col("src").as("z"), col("dst").as("u"))
      .join(dz, "z")
      .join(ud.select(col("src").as("z"), col("dst").as("w")), "z")
      .where(col("u") < col("w"))
    val agg = wedges.groupBy("u", "w").agg(
      count(lit(1)).as("cn"),
      sum(lit(1.0) / log(col("deg_z").cast("double"))).as("aa_raw"))
    // distance exactly 2: drop pairs that are already edges (canonical src < dst
    // matches the u < w wedge canonicalization, so one anti-join suffices)
    val cand = agg.join(
      canonical.select(col("src").as("u"), col("dst").as("w")), Seq("u", "w"), "left_anti")
    cand
      .join(deg.select(col("v").as("u"), col("deg").as("deg_u")), "u")
      .join(deg.select(col("v").as("w"), col("deg").as("deg_w")), "w")
      .select(col("u"), col("w"), col("cn"),
        round(col("aa_raw"), 6).as("aa"),
        round(col("cn").cast("double") / (col("deg_u") + col("deg_w") - col("cn")), 6)
          .as("jac"))
  }

  /** Per-vertex top-k structurally-similar vertices: the [[scores]] candidates
    * symmetrized and ranked per vertex by (jaccard desc, neighbor asc) — the
    * "users like this user" query. Output (v, nbr, jac, rnk).
    *
    * Scale shape: [[scores]]' wedge aggregation plus one row_number window
    * over the candidate-pair table partitioned by vertex — candidates are
    * distance-2 pairs (bounded by the wedge count), not the corpus. */
  def similarTopK(canonical: DataFrame, k: Int = 3, maxMiddleDegree: Long = Long.MaxValue): DataFrame = {
    val s = scores(canonical, maxMiddleDegree)
    // ONE explode pass instead of a 2-way unionAll of (u,w)/(w,u) selects: the
    // union form replicated the whole unpersisted wedge-aggregation subtree
    // into both branches, executing it twice per query (the round-7
    // triangles_per_vertex finding, same fix — identical rows)
    val sym = s.select(explode(array(
        struct(col("u").as("v"), col("w").as("nbr"), col("jac")),
        struct(col("w").as("v"), col("u").as("nbr"), col("jac")))).as("e"))
      .select(col("e.v").as("v"), col("e.nbr").as("nbr"), col("e.jac").as("jac"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v")).orderBy(col("jac").desc, col("nbr").asc)
    sym.withColumn("rnk", row_number().over(w).cast("long")).where(col("rnk") <= k)
  }
}
