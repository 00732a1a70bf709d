package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiling main (test scope, not shipped): old-vs-new minhash pipeline
  * race in one JVM at a given sf dir. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session("32")
    val docsT = Ingest.table(spark, sf, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warm scan")(docsT.foreach(_ => ()))

    // ---- OLD pipeline, reconstructed verbatim (pre-round-6 aggregate forms)
    def oldPairs(): DataFrame = {
      val (k, perms, bands, threshold) = (5, 64, 16, 0.35)
      val rows = perms / bands
      graft.expr.SortedIntersectCount.register(spark)
      val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val hashed = docs.Dedup.shingleHashes(docsT, k)
      val sets = hashed.groupBy("doc_id")
        .agg(sort_array(collect_set(col("x"))).as("xs")).persist(level)
      val rehashed = sets.select(col("doc_id"), explode(col("xs")).as("x"))
      val bs = docs.Dedup.minhashOffsets(perms)
      val minCols = (0 until perms).map(i =>
        min(pmod(col("xp") * lit(2L * i + 1) + lit(bs(i)), lit(1000000007L))).as(s"_m$i"))
      val sigs = rehashed
        .withColumn("xp", pmod(col("x"), lit(1000000007L)))
        .groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
        .select(col("doc_id"), array((0 until perms).map(i => col(s"_m$i")): _*).as("sig"))
      def bandHash(b: Int): org.apache.spark.sql.Column =
        (0 until rows).foldLeft(lit(b.toLong): org.apache.spark.sql.Column)((acc, r) =>
          pmod(acc * lit(1000003L) + element_at(col("sig"), b * rows + r + 1), lit(1000000007L)))
      val banded = sigs
        .select(col("doc_id"), posexplode(array((0 until bands).map(bandHash): _*)))
        .select(col("doc_id"), col("pos").as("band"), col("col").as("bh")).persist(level)
      val candidates = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      candidates
        .join(sets.select(col("doc_id").as("a"), col("xs").as("xa")), "a")
        .join(sets.select(col("doc_id").as("b"), col("xs").as("xb")), "b")
        .select(col("a"), col("b"),
          call_function(graft.expr.SortedIntersectCount.name, col("xa"), col("xb")).as("i"),
          size(col("xa")).cast("long").as("na"), size(col("xb")).cast("long").as("nb"))
        .select(col("a"), col("b"),
          round(col("i") / (col("na") + col("nb") - col("i")), 6).as("jac"))
        .where(col("jac") >= 0.35)
    }

    // bench regime: caches released between reps — every rep re-runs the full
    // pipeline from the (OS-warm) parquet; headline is best-of-reps
    for (r <- 1 to 3) {
      time(s"OLD full rep$r")(oldPairs().foreach(_ => ()))
      spark.sharedState.cacheManager.clearCache()
    }
    for (r <- 1 to 3) {
      time(s"NEW full rep$r")(
        docs.Dedup.minhashLshPairs(docsT, 5, 64, 16, 0.35).foreach(_ => ()))
      CacheTracker.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
