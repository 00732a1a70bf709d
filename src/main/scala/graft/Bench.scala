package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Queries are materialized with the `noop` sink (every column computed, nothing
  * written) — a bare `count()` would let Catalyst prune the expensive columns and
  * time a parquet scan instead of the operator.
  *
  * Round-5 contention telemetry (round-4 verdict #1: the driver's r4 file
  * recorded 123.8 s on a contended host while the identical harness measured
  * ~21 s solo, and nothing in the JSON let a reader tell them apart): the JSON
  * now carries `/proc/loadavg` sampled BEFORE the harness creates any load and
  * again at the end, every per-rep time per query, and a `contended` flag.
  * The flag fires when (a) the pre-run 1-minute load average exceeds cpus/4 —
  * load that cannot be ours — or (b) any query's non-first rep exceeds 2× its
  * best rep (a SLOWER LATER rep is the contention signature; rep 1 being slow
  * is the normal cold-path cliff and deliberately does not trip the flag).
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

  /** 1-minute load average from `/proc/loadavg` (Linux); -1 if unreadable. */
  def loadAvg1(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Per-query wall times for ALL reps (chronological), or Left(error) — a
    * throwing query must surface as `"err"` in the JSON and contribute NOTHING
    * to the headline total (a broken query would otherwise *improve* the
    * bench — round-2 audit). Unknown names are rejected up front rather than
    * silently skipped.
    *
    * The headline still scores best-of-reps (round-3 verdict: first-touch
    * parquet I/O, codegen compilation, and host contention land on whichever
    * rep hits them; the minimum is the reproducible number) — but every rep is
    * now returned and emitted, so a contended run is self-identifying instead
    * of invisible (round-4 verdict #1/#3). Operator-internal caches are
    * released between reps, so every rep re-runs the full operator pipeline —
    * only session-lifetime state (JIT, shared edge tables) is excluded,
    * exactly what [[main]]'s warm-up pre-pays. */
  def run(spark: SparkSession, sfDir: String, names: Seq[String], reps: Int = 2): Seq[(String, Either[String, Seq[Double]])] = {
    require(reps >= 1, "reps must be positive")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).flatMap { rep =>
        val t0 = System.nanoTime()
        val res =
          try { materialize(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name rep $rep failed: $e")
            None
          }
        // drop the query's operator-internal caches (shingle sets, normalized
        // embeddings, …); the memoized shared edge tables stay
        CacheTracker.release(spark)
        res
      }
      // err only if EVERY rep failed
      if (times.nonEmpty)
        System.err.println(f"[bench] $name reps: ${times.map(t => f"$t%.3f").mkString(" ")}")
      name -> (if (times.isEmpty) Left("err") else Right(times.toSeq))
    }
  }

  /** True when some query's non-first rep exceeds `spreadFactor` × its best
    * rep — a LATER rep being the slow one is contention, not cold-start. */
  private[graft] def repSpreadContended(
      results: Seq[(String, Either[String, Seq[Double]])], spreadFactor: Double = 2.0): Boolean =
    results.exists {
      case (_, Right(ts)) if ts.length >= 2 => ts.drop(1).max > spreadFactor * ts.min
      case _ => false
    }

  /** The ONE JSON line the driver parses: per-query best-of-reps seconds (or
    * `"err"`), total over the successful queries only, plus the telemetry that
    * makes a polluted run self-identifying: per-rep times (`rep_sec`), host
    * load average before/after, the `contended` flag, the CacheTracker
    * eviction count (> 0 means an operator pipeline lost a persisted
    * intermediate mid-run) and the cumulative tracked-persist size estimate. */
  def jsonLine(results: Seq[(String, Either[String, Seq[Double]])], sfDir: String, cpus: String,
      reps: Int = 1, cacheEvictions: Long = 0L,
      load1Start: Double = -1.0, load1End: Double = -1.0,
      persistedBytesEst: Long = 0L): String = {
    val qs = results.map {
      case (k, Right(ts)) => "\"" + k + "\":" + f"${ts.min}%.3f"
      case (k, Left(_)) => "\"" + k + "\":\"err\""
    }.mkString("{", ",", "}")
    val repSec = results.map {
      case (k, Right(ts)) => "\"" + k + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
      case (k, Left(_)) => "\"" + k + "\":[]"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(ts)) => ts.min }.sum
    val nErr = results.count(_._2.isLeft)
    val nCpus = try cpus.toInt catch { case _: Throwable => 32 }
    val contended = (load1Start >= 0 && load1Start > nCpus / 4.0) || repSpreadContended(results)
    f"""{"metric":"total_headline_sec","value":$total%.3f,"unit":"sec","queries":$qs,"rep_sec":$repSec,"errors":$nErr,"reps":$reps,"cache_evictions":$cacheEvictions,"persisted_bytes_est":$persistedBytesEst,"load1_start":$load1Start%.2f,"load1_end":$load1End%.2f,"contended":$contended,"sf":"$sfDir","cpus":"$cpus"}"""
  }

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
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // sample the host load BEFORE creating any of our own: a high value here is
    // attributable to co-tenants, which is exactly what `contended` must catch
    val load1Start = loadAvg1()
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Warm up session-lifetime state the queries should NOT be charged for:
    // first-touch parquet scans of every input table (footer reads, page cache),
    // and the memoized canonical/oriented edge caches (round-3: the driver bench
    // charged the edge-cache materialization to the first edge query).
    val t0 = System.nanoTime()
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings").foreach { t =>
      try materialize(spark.read.parquet(s"$sfDir/$t.parquet"))
      catch { case _: Throwable => }
    }
    try SparkEntry.warm(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] warm-up failed: $e") }
    System.err.println(f"[bench] warm-up ${(System.nanoTime() - t0) / 1e9}%.1fs (load1_start=$load1Start%.2f)")
    val results = run(spark, sfDir, names, reps)
    val line = jsonLine(results, sfDir, cpus, reps, CacheTracker.evictionCount(spark),
      load1Start, loadAvg1(), CacheTracker.persistedBytesEstimate(spark))
    println(line)
    // The driver parses the bench output; sbt's logger prefixes stdout with
    // [info], which broke machine parsing in round 1 ("parsed": null). Persist
    // the same line to a file as the authoritative machine-readable copy.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    SparkEntry.releaseCaches(spark) // harness teardown: memoized edge tables too
    spark.stop()
  }
}
