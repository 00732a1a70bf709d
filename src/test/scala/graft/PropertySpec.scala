package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import TestSpark.edgeDF

/** Property-based invariants (SURVEY.md §5): orientation and triangle-count
  * invariants under permutation/duplication/direction flips, differential equality
  * of the physical forms, and a hub-skew stress graph.
  *
  * Uses raw ScalaCheck generators with explicit seeds (the scalatest-scalacheck
  * bridge artifact is not in the offline dependency cache) — deterministic and
  * reproducible by seed.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val params = Gen.Parameters.default

  private val edgeListGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(5, 40).flatMap { n =>
      Gen.listOfN(60,
        Gen.zip(Gen.chooseNum(0L, n.toLong), Gen.chooseNum(0L, n.toLong)))
    }

  private def cases(seeds: Range): Seq[List[(Long, Long)]] =
    seeds.map(s => edgeListGen.pureApply(params, Seed(s.toLong)))

  /** In-memory exact triangle counter (node-iterator over cleaned edges). */
  private def goldenTriangles(edges: Seq[(Long, Long)]): Long = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nbrs = canon.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    canon.toSeq.map { case (u, v) => (nbrs(u) & nbrs(v)).count(_ > v) }.sum
  }

  test("triangle count: relational == adjacency == in-memory golden, invariant " +
      "under shuffle/dup/flip (8 seeded random graphs)") {
    cases(1 to 8).foreach { edges =>
      val want = goldenTriangles(edges)
      val variants = Seq(
        edges,
        scala.util.Random.shuffle(edges) ++ edges.take(5), // dups
        edges.map { case (u, v) => (v, u) }) // flipped
      variants.foreach { es =>
        assert(TriangleCount.countPairs(edgeDF(es)).first().getLong(0) === want)
      }
      assert(TriangleCount.countPairsAdjacency(spark, edgeDF(edges))
        .first().getLong(0) === want)
    }
  }

  test("csrBlocks: distributed two-level scan equals sequential prefix sum; " +
      "blocks edge-balanced (8 seeds)") {
    cases(21 to 28).foreach { edges =>
      val oriented = GraphCore.orientClean(edgeDF(edges))
      val adj = GraphCore.adjacency(oriented)
      val k = 4
      val got = GraphCore.csrBlocks(adj, k, buckets = 3) // tiny buckets → multi-level path
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      // sequential golden
      val rows = adj.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var cum = 0L
      val total = rows.map(_._2).sum
      rows.zip(got).foreach { case ((v, deg), (gv, gdeg, goff, gblock)) =>
        assert(gv === v && gdeg === deg && goff === cum)
        assert(gblock === math.floor(cum.toDouble * k / total).toLong)
        cum += deg
      }
      // every block's edge total is within one max-degree of total/k
      val maxDeg = rows.map(_._2).max
      val perBlock = got.groupBy(_._4).view.mapValues(_.map(_._2).sum)
      perBlock.foreach { case (_, s) =>
        assert(s <= total / k + maxDeg + 1, s"block too heavy: $s vs ${total / k}")
      }
    }
  }

  test("orientation: bijective on cleaned edges, acyclic by (deg, id) order (8 seeds)") {
    cases(11 to 18).foreach { edges =>
      val canonical = GraphCore.clean(edgeDF(edges))
      val deg = GraphCore.degrees(canonical)
      val oriented = GraphCore.orient(canonical, deg)
      val d = deg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val o = oriented.collect().map(r => (r.getLong(0), r.getLong(1)))
      val c = canonical.collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1)))).toSet
      assert(o.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet === c)
      assert(o.length === c.size)
      o.foreach { case (u, v) =>
        assert(d(u) < d(v) || (d(u) == d(v) && u < v),
          s"orientation violates (deg,id) order on ($u,$v)")
      }
    }
  }

  test("components: star algorithm == min-propagation (4 seeds)") {
    cases(21 to 24).foreach { edges =>
      val canonical = GraphCore.clean(edgeDF(edges)).localCheckpoint(true)
      val fast = Components.run(canonical).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val slow = Components.minPropagation(canonical).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast === slow)
    }
  }

  test("per-vertex: adjacency scale-path form equals relational form on a hub-skew graph") {
    // one hub joined to everyone + random edges: the skew case orientation must absorb
    val rnd = new scala.util.Random(5)
    val hub = (1L to 60L).map(v => (0L, v))
    val rest = Seq.fill(200)((rnd.nextInt(60).toLong + 1, rnd.nextInt(60).toLong + 1))
    val canonical = GraphCore.clean(edgeDF(hub ++ rest)).localCheckpoint(true)
    val oriented = GraphCore.orient(canonical, GraphCore.degrees(canonical)).localCheckpoint(true)
    val adj = GraphCore.adjacency(oriented)
    val rel = TriangleCount.perVertex(canonical, oriented).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adjForm = TriangleCount.perVertexAdjacency(canonical, oriented, adj).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adjForm === rel)
    assert(TriangleCount.globalRelational(oriented).first().getLong(0) ===
      TriangleCount.globalAdjacency(spark, oriented, adj).first().getLong(0))
  }

  test("two-level stitches equal their single-window twins on random streams (4 seeds × 3 bucket sizes)") {
    val s0 = spark
    import s0.implicits._
    for (seed <- 31 to 34) {
      val rnd = new scala.util.Random(seed)
      val t0 = java.sql.Timestamp.valueOf("2026-03-01 00:00:00").getTime
      // clustered timestamps (bursts + gaps) so sessions and bucket borders interact;
      // duplicate timestamps exercise the (ts, event_id) tie-break across borders
      var cur = 0L
      val rows = (1L to 400L).map { id =>
        cur += (if (rnd.nextDouble() < 0.15) rnd.nextInt(7200).toLong else rnd.nextInt(600).toLong)
        val ts = new java.sql.Timestamp(t0 + (cur - (cur % (if (rnd.nextDouble() < 0.1) 60L else 1L))) * 1000L)
        (id, rnd.nextInt(5).toLong, ts, s"type-${rnd.nextInt(3)}")
      }
      val ev = rows.map(r => (r._1, r._2, r._3)).toDF("event_id", "user_id", "ts")
      val single = Ingest.sessionize(ev, gapSeconds = 900).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      for (bucketSec <- Seq(60L, 1800L, 86400L)) {
        val got = Ingest.sessionizeScalable(ev, gapSeconds = 900, bucketSeconds = bucketSec)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        assert(got === single, s"sessionize seed=$seed bucket=$bucketSec")
      }
      // events-derivation twin on the same stream (event_type column as the stream key)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-prop-ev$seed")
      rows.map(r => (r._1, r._2, r._3, r._4))
        .toDF("event_id", "user_id", "ts", "event_type")
        .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
      val sfDir = dir.toString
      val singleE = Ingest.edgesFromEvents(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (bucketSec <- Seq(60L, 3600L)) {
        val gotE = Ingest.edgesFromEventsScalable(spark, sfDir, bucketSec).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(gotE === singleE, s"edges seed=$seed bucket=$bucketSec")
      }
      CacheTracker.release(spark)
    }
  }

  test("transcript ingest: edge derivation is row-order-insensitive") {
    (2 to 10 by 4).foreach { nConvs =>
      val t = Transcripts.synth(spark, nConvs.toLong, 8, nTools = 16)
      val a = Ingest.edgesFromTranscripts(t.toDF()).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = Ingest.edgesFromTranscripts(
          t.orderBy(org.apache.spark.sql.functions.rand(7)).toDF())
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a === b)
    }
  }

  test("keyed kernels: per-key results equal per-subgraph runs on random keyed graphs (3 seeds)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    cases(40 until 43).foreach { es =>
      // split one random edge list across 3 keys deterministically
      val keyed = GraphCore.clean(edgeDF(es))
        .withColumn("day", org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(col("src"), col("dst")), lit(3L)))
        .select(col("day"), col("src"), col("dst"))
      val tri = TriangleCount.globalPerKey(keyed)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val cc = Components.runKeyed(keyed)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      for (k <- tri.keys) {
        val sub = keyed.where(col("day") === k).select("src", "dst")
        val wantTri = TriangleCount.countPairs(sub).first().getLong(0)
        assert(tri(k) === wantTri, s"triangles key=$k")
        val wantCc = Components.run(sub)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(wantCc === cc.collect { case ((kk, v), c) if kk == k => v -> c },
          s"components key=$k")
      }
    }
  }

  test("modularity: Q of any partition is within [-0.5, 1]; finer-than-components never beats it trivially") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    cases(50 until 53).foreach { es =>
      val c = GraphCore.clean(edgeDF(es))
      if (c.count() > 0) {
        // partition 1: connected components (guaranteed valid communities)
        val comp = Components.run(c).select(col("v"), col("component").as("label"))
        val q = LabelProp.communityModularity(c, comp)
          .agg(org.apache.spark.sql.functions.sum(col("q_contrib"))).first().getDouble(0)
        assert(q >= -0.5 - 1e-9 && q <= 1.0 + 1e-9, s"Q=$q out of range")
        // component partitions have zero inter-community edges → every
        // contribution is e_c/m − (d_c/2m)² with Σe_c = m ⇒ Q ≥ 0 here
        assert(q >= -1e-9, s"component partition scored negative Q=$q")
      }
    }
  }
}
