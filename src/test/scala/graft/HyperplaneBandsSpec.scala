package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{DotProduct, HyperplaneBands}

/** The compiled banding kernel: drop-in equivalence with the unrolled
  * `when(graft_dot(emb, literal-plane) >= 0, …)` form it replaced, interpreted ==
  * codegen, survival INSIDE codegen at the production (5, 40, 64) shape that made
  * the unrolled form overflow Janino's 64 KB method limit, and the null/shape
  * contract. */
class HyperplaneBandsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 64

  /** Deterministic signed pseudo-random embeddings (no RNG seed drift). */
  private def embRows(n: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map { j =>
        (((i * 1315423911L + j * 2654435761L) % 1000L + 1000L) % 1000L) / 500.0 - 1.0
      })
    }

  private def bandsCol(embName: String, planes: Int, bands: Int) =
    call_function(HyperplaneBands.name, col(embName), lit(dim), lit(planes), lit(bands))

  /** The pre-round-6 construction, verbatim: one DotProduct per plane against its
    * literal matrix row, `when(>= 0)` bit, sum — the equivalence anchor. */
  private def unrolledSignature(embName: String, from: Int, count: Int) =
    (0 until count).map { b =>
      val plane = typedLit((0 until dim).map(j => HyperplaneBands.planeSign(from + b, j)))
      when(call_function(DotProduct.name, col(embName), plane) >= 0, lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  test("equivalent to the unrolled DotProduct form at the production (5, 40) shape") {
    val s = spark
    import s.implicits._
    DotProduct.register(s)
    HyperplaneBands.register(s)
    val (planes, bands) = (5, 40)
    val df = embRows(50).toDF("vec_id", "emb")
      .select($"vec_id", $"emb".cast("array<double>").as("emb"))
    // the unrolled anchor overflows Janino at this shape and runs interpreted —
    // the very defect under test; its VALUES are still the ground truth
    val expected = df.select(
        ($"vec_id" +: (0 until bands).map(b =>
          unrolledSignature("emb", b * planes, planes).as(s"b$b"))): _*)
      .collect().map(r => r.getLong(0) -> (1 to bands).map(r.getLong).toSeq).toMap
    val got = df.select($"vec_id", bandsCol("emb", planes, bands).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, sigs) =>
      assert(sigs === expected(id), s"band signatures diverge for vec $id")
    }
  }

  test("codegen == interpreted (factoryMode differential, production shape)") {
    val s2 = spark.newSession()
    import s2.implicits._
    HyperplaneBands.register(s2)
    val df = embRows(40).toDF("vec_id", "emb")
      .select($"vec_id", $"emb".cast("array<double>").as("emb"))
    def run(mode: String): Map[Long, Seq[Long]] = {
      s2.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select($"vec_id", bandsCol("emb", 5, 40).as("sigs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      finally s2.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("stays inside codegen at (5, 40, 64) — the shape that broke the unrolled form") {
    // fallback=false turns a whole-stage Janino failure into a hard error instead
    // of the silent interpreted downgrade the round-6 audit caught; CODEGEN_ONLY
    // does the same for expression-level projections
    val s2 = spark.newSession()
    import s2.implicits._
    HyperplaneBands.register(s2)
    s2.conf.set("spark.sql.codegen.fallback", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = embRows(30).toDF("vec_id", "emb")
        .select($"vec_id", $"emb".cast("array<double>").as("emb"))
      val n = df.select(posexplode(bandsCol("emb", 5, 40))).count()
      assert(n === 30L * 40)
    } finally {
      s2.conf.unset("spark.sql.codegen.fallback")
      s2.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null array and null element produce all-zero signatures, never null") {
    val s = spark
    import s.implicits._
    HyperplaneBands.register(s)
    val rows = Seq(
      (0L, Some(Seq.fill(dim)(Option(1.0)))),                          // clean
      (1L, None),                                                      // null array
      (2L, Some(Seq.tabulate(dim)(j => if (j == 7) None else Some(1.0)))) // null elem
    ).toDF("vec_id", "emb")
      .select($"vec_id", $"emb".cast("array<double>").as("emb"))
    val got = rows.select($"vec_id", bandsCol("emb", 3, 4).as("sigs"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(got(1L) === Some(Seq(0L, 0L, 0L, 0L)), "null array → zeros (when/otherwise parity)")
    assert(got(2L) === Some(Seq(0L, 0L, 0L, 0L)), "null element poisons every projection to bit 0")
    assert(got(0L).get.forall(_ >= 0L) && got(0L).get.length === 4)
  }

  test("zero vector: every projection is +0.0 → every bit set (>= 0 parity)") {
    val s = spark
    import s.implicits._
    HyperplaneBands.register(s)
    val got = Seq((0L, Seq.fill(dim)(0.0))).toDF("vec_id", "emb")
      .select(bandsCol("emb", 5, 2).as("sigs"))
      .collect().head.getSeq[Long](0)
    assert(got === Seq(31L, 31L))
  }

  test("length mismatch is a hard error, matching graft_dot") {
    val s = spark
    import s.implicits._
    HyperplaneBands.register(s)
    val df = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "emb")
    val ex = intercept[Exception] {
      df.select(bandsCol("emb", 4, 2)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null && c.getMessage.contains("expected 64 elements")))
  }

  test("registry rejects non-literal shape arguments") {
    val s = spark
    import s.implicits._
    HyperplaneBands.register(s)
    val df = Seq((2, Seq(1.0))).toDF("n", "emb")
    val ex = intercept[Exception] {
      df.select(call_function(HyperplaneBands.name, $"emb", $"n", lit(1), lit(1))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      c.getMessage != null && c.getMessage.contains("integer literal")))
  }
}
