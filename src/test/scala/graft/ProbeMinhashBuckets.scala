package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostic (test scope, not shipped): minhash LSH band-bucket
  * histogram + candidate cardinality on a docs parquet — the minhash twin of
  * [[ProbeSimhash]]. */
object ProbeMinhashBuckets {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/docs_500k")
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val (perms, bands) = (64, 16)
    val rows = perms / bands
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(path)
    def bandHash(b: Int): org.apache.spark.sql.Column =
      (0 until rows).foldLeft(lit(b.toLong): org.apache.spark.sql.Column)((acc, r) =>
        pmod(acc * lit(1000003L) + element_at(col("sig"), b * rows + r + 1), lit(1000000007L)))
    val banded = graft.docs.Dedup.minhashSignatures(docs, k, perms)
      .select(col("doc_id"), posexplode(array((0 until bands).map(bandHash): _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bh"))
    val buckets = banded.groupBy("band", "bh").count().persist()
    val stats = buckets.agg(
      count(lit(1)).as("n_buckets"),
      max(col("count")).as("max_bucket"),
      sum(col("count") * (col("count") - 1) / 2).as("candidate_rows")).first()
    println(s"n_buckets=${stats.get(0)} max_bucket=${stats.get(1)} candidate_rows_pre_distinct=${stats.get(2)}")
    buckets.orderBy(col("count").desc).limit(10).collect()
      .foreach(r => println(s"  band=${r.get(0)} bh=${r.get(1)} size=${r.get(2)}"))
    spark.stop()
  }
}
