package graft

import org.apache.spark.sql.SparkSession

/** Command-line entry point — the Spark analog of the reference's
  * `./nvtc-variant -f graph.bin` (`/root/reference/nvtc/main.cpp:25-50`):
  * derive the edge table and run one kernel.
  *
  * Usage: `graft.Cli <kernel> <input> [n]` — the third positional arg is the
  * kernel's budget knob: iterations (pagerank/lpa), rounds (bfs/harmonic),
  * steps (walks), or K the coreness threshold (kcore). See [[usage]].
  * input: a testdata dir (events.parquet edge derivation), or a `.bin` path — the
  * reference's own little-endian uint32 pair format (the `-f graph.bin` path).
  * The `-daily`/`drift` kernels need event timestamps, so they reject `.bin` input.
  */
object Cli {
  /** One source of truth for the accepted kernels — the usage string is
    * rendered from this set (round-4 advice: the hand-written usage line had
    * drifted behind the dispatch). */
  val known: Set[String] = Set("triangles", "triangles-adj", "pervertex", "pagerank", "pagerank-w",
    "components", "lpa", "lpa-w", "degrees", "kcore", "bfs", "linkpred", "assortativity",
    "walks", "harmonic", "triangles-daily", "pagerank-daily", "components-daily", "drift")

  def usage: String =
    s"""usage: graft.Cli <kernel> <input> [n]
       |kernels: ${known.toSeq.sorted.mkString(" | ")}
       |  [n] (default 20) is the kernel's budget knob: max iterations for
       |  pagerank/pagerank-w/lpa/lpa-w/*-daily, rounds for bfs/harmonic,
       |  steps for walks — and K for kcore (the coreness threshold).
       |input: a testdata dir (events.parquet derivation) or a .bin path
       |  (the reference's little-endian uint32 pair format);
       |  *-daily/drift need timestamps and reject .bin input.""".stripMargin

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(usage)
      sys.exit(2)
    }
    val kernel = args(0)
    if (!known(kernel)) {
      System.err.println(s"unknown kernel: $kernel\n$usage")
      sys.exit(2)
    }
    val sfDir = args(1)
    val maxIter = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-$kernel")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val raw =
      if (sfDir.endsWith(".bin")) Ingest.edgesFromBinary(spark, sfDir)
      else Ingest.edgesFromEvents(spark, sfDir)
    val canonical = GraphCore.clean(raw).localCheckpoint(true)
    val edgeCount = canonical.count()
    val out = kernel match {
      case "triangles" =>
        TriangleCount.globalRelational(
          GraphCore.orient(canonical, GraphCore.degrees(canonical)))
      case "triangles-adj" =>
        val oriented = GraphCore.orient(canonical, GraphCore.degrees(canonical)).persist()
        TriangleCount.globalAdjacency(spark, oriented, GraphCore.adjacency(oriented).persist())
      case "pervertex" =>
        TriangleCount.perVertex(canonical,
          GraphCore.orient(canonical, GraphCore.degrees(canonical)))
      case "pagerank" => PageRank.run(canonical, maxIter)
      case "components" => Components.run(canonical)
      case "lpa" => LabelProp.run(canonical, maxIter)
      case "degrees" => GraphCore.degrees(canonical)
      // weighted kernels re-derive multiplicity weights from the raw pairs
      // (clean's distinct has already discarded them on `canonical`)
      case "pagerank-w" =>
        PageRank.weightedFixedIterations(GraphCore.cleanWeighted(raw), maxIter)
      case "lpa-w" => LabelProp.runWeighted(GraphCore.cleanWeighted(raw), maxIter)
      case "kcore" => GraphCore.kcoreVertices(canonical, k = maxIter)
      case "bfs" =>
        import org.apache.spark.sql.functions.{lit, pmod}
        Bfs.distances(canonical, v => pmod(v, lit(31L)) === 0L, rounds = maxIter)
      case "linkpred" => LinkPredict.scores(canonical)
      case "assortativity" => GraphCore.assortativity(canonical)
      case "walks" => Walks.deterministicWalks(canonical, steps = maxIter, startMod = 31)
      case "harmonic" =>
        import org.apache.spark.sql.functions.{lit, pmod}
        Bfs.harmonicCentrality(canonical, v => pmod(v, lit(31L)) === 0L, rounds = maxIter)
      case daily @ ("triangles-daily" | "pagerank-daily" | "components-daily" | "drift") =>
        require(!sfDir.endsWith(".bin"), s"$daily needs event timestamps — not available in .bin input")
        val dailyEdges = Ingest.edgesFromEventsDaily(spark, sfDir).persist()
        daily match {
          case "triangles-daily" => TriangleCount.globalPerKey(dailyEdges)
          case "pagerank-daily" => PageRank.fixedIterationsKeyed(dailyEdges, maxIter)
          case "components-daily" => Components.runKeyed(dailyEdges)
          case _ => Temporal.edgeDriftDaily(dailyEdges)
        }
      case other =>
        System.err.println(s"unknown kernel: $other"); sys.exit(2); null
    }
    val rows = out.count()
    val sec = (System.nanoTime() - t0) / 1e9
    out.show(10, truncate = false)
    // single-cell results (the global triangle count) carry the value in the
    // JSON line so differential harnesses compare mechanically
    val scalar =
      if (rows == 1 && out.schema.length == 1 && out.schema.head.dataType ==
        org.apache.spark.sql.types.LongType)
        s""","value":${out.first().getLong(0)}"""
      else ""
    println(f"""{"kernel":"$kernel","sf_dir":"$sfDir","edges":$edgeCount,"rows":$rows,"sec":$sec%.3f,"edges_per_sec":${edgeCount / sec}%.1f$scalar}""")
    spark.stop()
  }
}
