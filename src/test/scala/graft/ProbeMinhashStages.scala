package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (test scope, not shipped): per-stage breakdown of the
  * CURRENT minhash_lsh_pairs pipeline — where do the ~3.3 s at sf0.1 go?
  * Reconstructs the pipeline stages (the banding internals are private) the
  * way ProbeMinhash reconstructs the legacy pipeline. */
object ProbeMinhashStages {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val (k, perms, bands, threshold) = (5, 64, 16, 0.35)
    val rows = perms / bands
    graft.expr.SortedIntersectCount.register(spark)
    val docsT = Ingest.table(spark, sf, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warm scan")(Bench.materialize(docsT))
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def bandHash(b: Int): org.apache.spark.sql.Column =
      (0 until rows).foldLeft(lit(b.toLong): org.apache.spark.sql.Column)((acc, r) =>
        pmod(acc * lit(1000003L) + element_at(col("sig"), b * rows + r + 1), lit(1000000007L)))
    for (rep <- 1 to 3) {
      System.err.println(s"--- rep $rep")
      val nShuffle = spark.sessionState.conf.numShufflePartitions
      val fanned =
        if (docsT.rdd.getNumPartitions < nShuffle) docsT.repartition(nShuffle) else docsT
      val sets = CacheTracker.persist(docs.Dedup.shingleSets(fanned, k), level)
      val banded = CacheTracker.persist(docs.Dedup.minhashSignatures(fanned, k, perms)
        .select(col("doc_id"), posexplode(array((0 until bands).map(bandHash): _*)))
        .select(col("doc_id"), col("pos").as("band"), col("col").as("bh")), level)
      time("prep: sets+banded materialize")(banded.count() + sets.count())
      val candidates = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      val nC = time("candidates (band join + distinct, count)")(candidates.count())
      System.err.println(s"[probe] candidate pairs: $nC")
      val verified = candidates
        .join(sets.select(col("doc_id").as("a"), col("xs").as("xa")), "a")
        .join(sets.select(col("doc_id").as("b"), col("xs").as("xb")), "b")
        .select(col("a"), col("b"),
          call_function(graft.expr.SortedIntersectCount.name, col("xa"), col("xb")).as("i"),
          size(col("xa")).cast("long").as("na"), size(col("xb")).cast("long").as("nb"))
        .select(col("a"), col("b"),
          round(col("i") / (col("na") + col("nb") - col("i")), 6).as("jac"))
        .where(col("jac") >= threshold)
      time("verify joins + intersect (noop)")(Bench.materialize(verified))
      CacheTracker.release(spark)
    }
    spark.stop()
  }
}
