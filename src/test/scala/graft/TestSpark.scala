package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local SparkSession for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def edgeDF(edges: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    edges.toDF("src", "dst")
  }

  /** Reference fixture graphs and goldens — see FIXTURES.md / BASELINE.md.
    * Cites: /root/reference/graph_generator.py:8-16, test.cpp:16-28. */
  object fixtures {
    val tri1: Seq[(Long, Long)] = Seq((0L, 1L), (2L, 0L), (1L, 2L))
    val nvgraph8: Seq[(Long, Long)] =
      Seq((1L, 0L), (2L, 1L), (3L, 1L), (3L, 2L), (4L, 2L), (4L, 3L), (5L, 4L), (5L, 3L))
    val dupEdges: Seq[(Long, Long)] = Seq((0L, 1L), (2L, 0L), (1L, 2L), (2L, 0L), (2L, 0L))
    val selfLoop: Seq[(Long, Long)] = Seq((0L, 0L), (0L, 1L), (1L, 2L), (2L, 0L))
    val goldenTriangles = Map("tri1" -> 1L, "nvgraph8" -> 3L, "dupEdges" -> 1L, "selfLoop" -> 1L)
  }
}
