package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostic (test scope, not shipped): band-bucket histogram and
  * candidate-pair cardinality of the simhash pigeonhole banding at a given
  * corpus + maxHamming — run when a banding configuration behaves
  * unexpectedly at scale, to see whether the cost is bucket skew (non-uniform
  * simhash bits) or sheer candidate volume. */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/docs_500k")
    val maxHamming = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(path)
    val nBands = maxHamming + 1
    val base = 64 / nBands
    val widths = Seq.tabulate(nBands)(j => if (j < 64 % nBands) base + 1 else base)
    val lows = widths.scanLeft(0)(_ + _).init
    val h = graft.docs.Dedup.simhash(docs).persist()
    println(s"docs=${h.count()}")
    val bandCols = (0 until nBands).map { j =>
      struct(lit(j).as("band"),
        shiftright(col("simhash"), lows(j)).bitwiseAND(lit((1L << widths(j)) - 1)).as("bv"))
    }
    val buckets = h.select(explode(array(bandCols: _*)).as("e"))
      .groupBy(col("e.band").as("band"), col("e.bv").as("bv")).count()
      .persist()
    val stats = buckets.agg(
      count(lit(1)).as("n_buckets"),
      max(col("count")).as("max_bucket"),
      sum(col("count") * (col("count") - 1) / 2).as("candidate_pairs")).first()
    println(s"maxHamming=$maxHamming bands=$nBands widths=$widths")
    println(s"n_buckets=${stats.get(0)} max_bucket=${stats.get(1)} candidate_pairs=${stats.get(2)}")
    buckets.orderBy(col("count").desc).limit(20).collect()
      .foreach(r => println(s"  band=${r.get(0)} bv=${r.get(1)} size=${r.get(2)}"))
    // bit balance: a fair simhash has each bit ~50% set
    val bits = (0 until 64).map(b =>
      avg(shiftright(col("simhash"), b).bitwiseAND(lit(1L))).as(s"b$b"))
    val bal = h.agg(bits.head, bits.tail: _*).first()
    val skewed = (0 until 64).map(b => b -> bal.getDouble(b)).filter(x => math.abs(x._2 - 0.5) > 0.2)
    println(s"bits with |p(set)-0.5| > 0.2: ${skewed.mkString(", ")}")
    spark.stop()
  }
}
