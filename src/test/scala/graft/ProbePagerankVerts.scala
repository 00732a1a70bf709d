package graft

import org.apache.spark.sql.functions._

/** Scratch plan-evidence main (test scope, not shipped): the round-7 PageRank
  * vertex-set derivation. The registered pagerank plans truncate at the rank
  * chain's localCheckpoint, so the prep-stage plan change (the union+distinct
  * exchange over the raw endpoints vs the exchange-free distinct over the
  * persisted hash(src)-partitioned links table) is dumped here — backs
  * plans/r07/pagerank_init_verts_{before,after}.txt. */
object ProbePagerankVerts {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val canonical = Ingest.edgesFromEvents(spark, sf).persist()
    canonical.count()
    val sym = GraphCore.symmetric(canonical)
    val deg = GraphCore.degrees(canonical).withColumnRenamed("v", "src")
    val links = sym.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    links.count() // materialize so the after-plan reads the InMemoryRelation
    println("===================== verts BEFORE (round 6: vertices(canonical)) =====================")
    println(GraphCore.vertices(canonical).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("===================== verts AFTER (round 7: links-derived) =====================")
    println(links.select(col("src").as("v")).distinct().queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
