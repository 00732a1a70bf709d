package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedCollectSorted equals plain sort_array(collect_list) including a hot key") {
    val rows = (0L until 2000L).map(i => (if (i < 1500) 1L else i % 7, i)) // key 1 is hot
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k").agg(sort_array(collect_list(col("v"))).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val salted = Salting.saltedCollectSorted(df, "k", "v", "vs", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(salted === plain)
  }

  test("saltedCollectSetSorted equals plain sort_array(collect_set) including a hot key") {
    import spark.implicits._
    val rows = (0L until 2000L).map(i => ("hot", i % 37)) ++ // heavy key, duplicate values
      (0L until 50L).map(i => (s"k${i % 7}", i))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy(col("k")).agg(sort_array(collect_set(col("v"))).as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val salted = Salting.saltedCollectSetSorted(df, "k", "v", "vs", salts = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(salted === plain)
  }

  test("saltedJoinSmall equals plain inner join on a skewed key") {
    val big = (0L until 3000L).map(i => (if (i % 10 < 9) 42L else i % 5, i)).toDF("k", "payload")
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plain = big.join(small, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Salting.saltedJoinSmall(big, small, "k", salts = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
  }

  test("salts actually spread a hot key across buckets") {
    val df = (0L until 1000L).map(i => (1L, i)).toDF("k", "v")
    val buckets = df.select(Salting.saltOf(col("v"), 8).as("s"))
      .groupBy("s").count().collect()
    assert(buckets.length === 8)
    assert(buckets.map(_.getLong(1)).max < 400) // no bucket holds most of the key
  }
}
