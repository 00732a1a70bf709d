package graft.docs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.DotProduct

/** Lloyd k-means over the `embeddings` table — the curation primitive behind
  * diversity sampling, topic balancing, and IVF coarse quantizers (the
  * [[Similarity.ivfCosineTopK]] assignment step is one Lloyd half-step; this is
  * the full loop).
  *
  * Everything is deterministic so results reproduce across engines and
  * parallelism levels:
  *  - seeding: the k lowest `vec_id`s become centroids 0..k-1 (no RNG);
  *  - assignment: argmin squared-L2 distance, computed as
  *    `x·x + c·c − 2·x·c` through the codegen [[graft.expr.DotProduct]]
  *    (same left-to-right IEEE accumulation as DuckDB's list folds), rounded
  *    to 6 before the argmin, ties → lowest cluster id;
  *  - update: element-wise mean rounded to 7 decimals — `avg` over doubles is
  *    the one accumulation-order-sensitive step (Spark's partial-aggregate
  *    merge order varies with partitioning), and the ~1e-14 jitter is crushed
  *    by the rounding, which both engines apply identically. A cluster that
  *    loses all members simply drops out (standard Lloyd degeneracy).
  *
  * Scale shape: the centroid table is k rows — broadcast by construction — so
  * each iteration is one broadcast nested-loop over the vectors plus two
  * map-side-combinable aggregations ((cluster, pos) mean, then per-cluster
  * array rebuild over k·dim rows). The vector table is scanned once per
  * iteration from its persisted projection; no windows over the corpus, no
  * driver-side loops over data (only the `iters` plan-building loop).
  */
object Clustering {

  /** `iters` full Lloyd rounds (assign + recenter), then a final assignment.
    * Output (vec_id, cluster, d) — d = squared-L2 distance to the winning
    * centroid, rounded to 6. */
  def kmeansAssign(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    DotProduct.register(embeddings.sparkSession)
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      call_function(DotProduct.name, a, b)
    val x = graft.CacheTracker.persist(
      embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("x")))

    // seed: k lowest vec_ids → clusters 0..k-1 (k-row frame, the window is free)
    val w0 = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    var cent = x.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(w0) - 1).cast("long").as("cluster"), col("x").as("c"))

    def assigned(cent: DataFrame): DataFrame =
      x.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("x"), col("cluster"),
          // + 0.0 normalizes IEEE negative zero (x ≈ c cancels to a tiny
          // negative that rounds to -0.0 in DuckDB, +0.0 here)
          (round(dot(col("x"), col("x")) + dot(col("c"), col("c"))
            - lit(2.0) * dot(col("x"), col("c")), 6) + lit(0.0)).as("d"))
        .groupBy(col("vec_id"))
        .agg(min_by(struct(col("cluster"), col("x"), col("d")),
          struct(col("d"), col("cluster"))).as("s"))
        .select(col("vec_id"), col("s.cluster").as("cluster"),
          col("s.x").as("x"), col("s.d").as("d"))

    for (_ <- 1 to iters) {
      cent = assigned(cent)
        .select(col("cluster"), posexplode(col("x")).as(Seq("pos", "xi")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(avg(col("xi")), 7).as("m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c"))
    }
    assigned(cent).select(col("vec_id"), col("cluster"), col("d"))
  }

  /** Per-cluster quality summary of [[kmeansAssign]]: member count and inertia
    * (sum of the rounded squared distances, re-rounded at 6 — the jitter from
    * Spark's partial-aggregate merge order is ~1e-13 against 1e-6 rounding).
    * The balance/tightness dashboard for the clustering. Output
    * (cluster, n, inertia). */
  def kmeansStats(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    kmeansAssign(embeddings, k, iters)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), round(sum(col("d")), 6).as("inertia"))
}
