package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Queries are materialized with the `noop` sink (every column computed, nothing
  * written) — a bare `count()` would let Catalyst prune the expensive columns and
  * time a parquet scan instead of the operator.
  *
  * `ngram_jaccard_pairs` is deliberately not benched: it is the small-scale
  * correctness anchor; `minhash_lsh_pairs` is the scale path for the same semantics.
  */
object Bench {

  /** Headline set: the reference-parity kernels + the scale-path pipeline ops. */
  val headline: Seq[String] = Seq(
    "edges_events",
    "triangles_global",
    "triangles_adj_global",
    "triangles_per_vertex",
    "pagerank_10iter",
    "connected_components",
    "lpa_2step",
    "dedup_exact",
    "minhash_lsh_pairs",
    "token_count",
    "embed_cosine_topk",
    "q1_agg")

  def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def run(spark: SparkSession, sfDir: String, names: Seq[String]): Map[String, Double] =
    names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        val sec = (System.nanoTime() - t0) / 1e9
        // drop the query's operator-internal caches (shingle sets, normalized
        // embeddings, …); the memoized shared edge tables stay
        CacheTracker.release(spark)
        name -> sec
      }
    }.toMap

  def session(cpus: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the library's own deployment path: custom expression + optimizer rule
      // installed at session build (see plans.GraftExtensions)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else headline // ad-hoc timing of any query set
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen on the smallest table so the first timed query does
    // not pay one-time session costs.
    try materialize(spark.read.parquet(s"$sfDir/region.parquet"))
    catch { case _: Throwable => }
    val results = run(spark, sfDir, names)
    val qs = names.filter(results.contains)
      .map(k => "\"" + k + "\":" + f"${results(k)}%.3f").mkString("{", ",", "}")
    val total = results.values.sum
    val line =
      f"""{"metric":"total_headline_sec","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":"$cpus"}"""
    println(line)
    // The driver parses the bench output; sbt's logger prefixes stdout with
    // [info], which broke machine parsing in round 1 ("parsed": null). Persist
    // the same line to a file as the authoritative machine-readable copy.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    spark.stop()
  }
}
