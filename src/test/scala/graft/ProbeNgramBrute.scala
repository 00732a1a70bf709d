package graft

import org.apache.spark.sql.functions._

/** Scratch A/B main (test scope, not shipped): the ngram_jaccard_pairs
  * restructure candidate — per-pair intersection of the per-doc DISTINCT
  * shingle-string sets over the all-pairs broadcast join (the
  * embed_neardup_pairs anchor shape) vs the shipped
  * pairs-sharing-a-shingle join + count. Same abstract function (intersection
  * cardinality of distinct string sets == co-occurrence row count per pair);
  * this measures both forms and diffs their outputs row-exactly. */
object ProbeNgramBrute {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docsT = Ingest.table(spark, sf, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val (k, threshold) = (5, 0.35)
    time("warm scan")(Bench.materialize(docsT))

    graft.expr.SortedIntersectCount.register(spark)
    def brute() = {
      // row-local compiled shingle-hash sets (sorted long arrays) + two-pointer
      // intersect — the minhash verify kernel shape over ALL pairs
      val nShuffle = spark.sessionState.conf.numShufflePartitions
      val fanned =
        if (docsT.rdd.getNumPartitions < nShuffle) docsT.repartition(nShuffle) else docsT
      val sets = docs.Dedup.shingleSets(fanned, k)
        .select(col("doc_id"), col("xs"), size(col("xs")).cast("long").as("n"))
      val a = sets.select(col("doc_id").as("a"), col("xs").as("xa"), col("n").as("na"))
      val b = sets.select(col("doc_id").as("b"), col("xs").as("xb"), col("n").as("nb"))
      broadcast(a).join(b, col("a") < col("b"))
        .select(col("a"), col("b"),
          call_function(graft.expr.SortedIntersectCount.name, col("xa"), col("xb")).as("i"),
          col("na"), col("nb"))
        .select(col("a"), col("b"),
          round(col("i") / (col("na") + col("nb") - col("i")), 6).as("jac"))
        .where(col("jac") >= threshold)
    }

    def bruteStrings() = {
      // string-exact twin: per-doc sorted distinct shingle STRING sets +
      // array_intersect — today's abstract computation verbatim, no hash
      val nShuffle = spark.sessionState.conf.numShufflePartitions
      val fanned =
        if (docsT.rdd.getNumPartitions < nShuffle) docsT.repartition(nShuffle) else docsT
      val sets = docs.Dedup.shingles(fanned, k)
        .groupBy("doc_id")
        .agg(sort_array(collect_set(col("sh"))).as("xs"))
        .select(col("doc_id"), col("xs"), size(col("xs")).cast("long").as("n"))
      val a = sets.select(col("doc_id").as("a"), col("xs").as("xa"), col("n").as("na"))
      val b = sets.select(col("doc_id").as("b"), col("xs").as("xb"), col("n").as("nb"))
      broadcast(a).join(b, col("a") < col("b"))
        .select(col("a"), col("b"),
          size(array_intersect(col("xa"), col("xb"))).cast("long").as("i"),
          col("na"), col("nb"))
        .select(col("a"), col("b"),
          round(col("i") / (col("na") + col("nb") - col("i")), 6).as("jac"))
        .where(col("jac") >= threshold)
    }

    for (rep <- 1 to 2) {
      System.err.println(s"--- rep $rep")
      time("brute all-pairs + sorted-intersect")(Bench.materialize(brute()))
      CacheTracker.release(spark)
      time("brute all-pairs + string array_intersect")(Bench.materialize(bruteStrings()))
      CacheTracker.release(spark)
    }
    // hash-vs-string distinctness: identical outputs need the hash map to be
    // injective on this corpus's shingle universe (per-doc set sizes AND every
    // pairwise intersection count are then equal by construction)
    val uni = docs.Dedup.shingles(docsT, k).select(col("sh")).distinct()
    val nStr = uni.count()
    val nHash = docs.Dedup.shingleHashes(docsT, k).select(col("x")).distinct().count()
    println(s"[probe] distinct shingle strings=$nStr distinct hashes=$nHash collisionFree=${nStr == nHash}")
    // (row-exact diff vs the shipped form ran in the first probe version:
    // shipped=258 brute=258 equal=true at sf0.1)
    spark.stop()
  }
}
