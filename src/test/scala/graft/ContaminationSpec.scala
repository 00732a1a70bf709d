package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.docs.Contamination

class ContaminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // eval set = even doc_ids throughout
  private val isEval = pmod(col("doc_id"), lit(2)) === 0

  private def scan(texts: (Long, String)*) =
    Contamination.ngramOverlap(texts.toDF("doc_id", "text"), isEval, k = 5, threshold = 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap

  test("verbatim copy of an eval doc is fully contaminated; disjoint text is clean") {
    val got = scan(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown fox jumps over the lazy dog", // copy of eval doc 0
      3L -> "zygomorphic quartz veins underpin basalt")    // shares no 5-gram
    assert(got.keySet === Set(1L, 3L), "eval docs themselves are excluded")
    val (n1, hit1, ov1, c1) = got(1L)
    assert(n1 === hit1 && ov1 === 1.0 && c1, "verbatim copy must be 100% overlap")
    val (_, hit3, ov3, c3) = got(3L)
    assert(hit3 === 0L && ov3 === 0.0 && !c3)
  }

  test("partial overlap lands strictly between 0 and 1 and respects the threshold") {
    val evalText = "alpha beta gamma delta"
    val got = scan(
      2L -> evalText,
      5L -> (evalText + " qqqqq wwwww eeeee rrrrr ttttt yyyyy uuuuu iiiii"))
    val (n, hit, ov, contaminated) = got(5L)
    assert(hit > 0L && hit < n)
    assert(ov > 0.0 && ov < 1.0)
    assert(contaminated === (hit.toDouble / n >= 0.5))
  }

  test("documents shorter than k produce no row; empty eval set flags nothing") {
    val got = scan(1L -> "abc", 2L -> "a benchmark eval document")
    assert(!got.contains(1L))
    val noEval = Contamination.ngramOverlap(
        Seq(1L -> "some training text here").toDF("doc_id", "text"),
        evalPred = lit(false), k = 5, threshold = 0.5)
      .collect()
    assert(noEval.length === 1 && noEval.head.getLong(2) === 0L
      && !noEval.head.getBoolean(4))
  }

  test("eval hash side plans as a broadcast join (the tiny-benchmark contract)") {
    val df = Contamination.ngramOverlap(
      Seq(0L -> "eval text body here", 1L -> "train text body here").toDF("doc_id", "text"),
      isEval, k = 5, threshold = 0.5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the eval-hash probe to broadcast, got:\n$plan")
  }
}
