package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{RollingHash, SimHash64}

/** The compiled text-hash kernels: bit-for-bit equivalence with the interpreted
  * HOF folds they replaced (reconstructed verbatim as ground truth), null/empty
  * contracts, and a real-corpus differential. */
class TextHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The pre-round-6 fingerprint fold, verbatim. */
  private def oldFingerprint = when(length(col("text")) === 0, lit(0L)).otherwise(
    aggregate(
      transform(split(col("text"), ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L))

  /** The pre-round-6 simhash two-level fold, verbatim. */
  private def oldSimhash = {
    val rs = expr(
      """transform(
        |  filter(split(lower(text), ' '), x -> x != ''),
        |  t -> aggregate(split(t, ''), cast(0 as bigint),
        |         (acc, c) -> pmod(acc * 31 + ascii(c), 1000000007)))""".stripMargin)
    val fold = (arr: org.apache.spark.sql.Column) => aggregate(
      zip_with(
        aggregate(arr,
          transform(sequence(lit(0), lit(63)), i => lit(0L)),
          (acc, r) => zip_with(acc, sequence(lit(0), lit(63)), (a, i) =>
            a + when(pmod(pmod(r * (lit(2) * i + 1) + pmod(i * lit(2654435761L), lit(1000000007L)),
              lit(1000000007L)), lit(2)) === 1, lit(1L)).otherwise(lit(-1L)))),
        sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (a, x) => a + x)
    fold(rs)
  }

  private val adversarial = Seq(
    (0L, Some("hello world")),
    (1L, Some("")),                              // empty text
    (2L, Some("   leading  double   spaces ")),  // empty tokens everywhere
    (3L, Some("MIXED case And Punct!!, ok?")),
    (4L, Some("naïve café déjà-vu")),            // non-ASCII BMP
    (5L, Some("emoji 😀 pair")),       // surrogate pair = one code point
    (6L, None),                                  // null text
    (7L, Some("a")),
    (8L, Some((1 to 200).map(i => s"tok$i").mkString(" "))))

  test("rolling hash == the interpreted fingerprint fold (adversarial strings)") {
    val s = spark
    import s.implicits._
    RollingHash.register(s)
    val df = adversarial.toDF("doc_id", "text")
    val rows = df.select(col("doc_id"), oldFingerprint.as("old"),
        call_function(RollingHash.name, col("text")).as("neo"))
      .collect()
    rows.foreach { r =>
      val (o, n) = (if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))
      assert(o === n, s"fingerprint diverges for doc ${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 1L).get.getLong(2) === 0L, "'' → 0")
    assert(rows.find(_.getLong(0) == 6L).get.isNullAt(2), "null → null")
  }

  test("simhash64 == the interpreted two-level fold (adversarial strings)") {
    val s = spark
    import s.implicits._
    SimHash64.register(s)
    val df = adversarial.toDF("doc_id", "text")
    val rows = df.select(col("doc_id"), oldSimhash.as("old"),
        call_function(SimHash64.name, split(lower(col("text")), " ")).as("neo"))
      .collect()
    rows.foreach { r =>
      val (o, n) = (if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))
      assert(o === n, s"simhash diverges for doc ${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 1L).get.getLong(2) === 0L, "no tokens → 0 bits")
    assert(rows.find(_.getLong(0) == 6L).get.isNullAt(2), "null → null")
  }

  test("real-corpus differential at sf0.001: both kernels equal the old folds on every doc") {
    val s = spark
    RollingHash.register(s)
    SimHash64.register(s)
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        oldFingerprint.as("fo"),
        call_function(RollingHash.name, col("text")).as("fn"),
        oldSimhash.as("so"),
        call_function(SimHash64.name, split(lower(col("text")), " ")).as("sn"))
      .where(not(col("fo") <=> col("fn")) || not(col("so") <=> col("sn")))
      .count()
    assert(diff === 0L)
  }

  test("property: kernels == old folds on 64 seeded random unicode strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    RollingHash.register(s)
    SimHash64.register(s)
    // mixed code-point soup: ASCII, punctuation, latin-1, BMP CJK, supplementary
    // plane (astral — two chars in UTF-16), plus spaces/tabs so tokenization and
    // empty-token filtering are exercised
    val cpGen: Gen[Int] = Gen.frequency(
      8 -> Gen.chooseNum(0x20, 0x7e),
      2 -> Gen.chooseNum(0xa0, 0xff),
      2 -> Gen.chooseNum(0x4e00, 0x4eff),
      1 -> Gen.chooseNum(0x1f300, 0x1f6ff), // surrogate pairs
      2 -> Gen.oneOf(' '.toInt, ' '.toInt, '\t'.toInt))
    val strGen: Gen[String] = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, cpGen).map(cps =>
        new String(cps.toArray.flatMap(Character.toChars), 0,
          cps.map(Character.charCount).sum)))
    val params = Gen.Parameters.default
    val docs = (1 to 64).map(i =>
      (i.toLong, strGen.pureApply(params, Seed(i.toLong)))).toDF("doc_id", "text")
    val diff = docs.select(
        oldFingerprint.as("fo"),
        call_function(RollingHash.name, col("text")).as("fn"),
        oldSimhash.as("so"),
        call_function(SimHash64.name, split(lower(col("text")), " ")).as("sn"))
      .where(not(col("fo") <=> col("fn")) || not(col("so") <=> col("sn")))
      .count()
    assert(diff === 0L)
  }

  test("codegen == interpreted (factoryMode differential)") {
    val s2 = spark.newSession()
    import s2.implicits._
    RollingHash.register(s2)
    SimHash64.register(s2)
    val df = adversarial.toDF("doc_id", "text")
    def run(mode: String): Seq[(Long, Option[Long], Option[Long])] = {
      s2.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(col("doc_id"),
          call_function(RollingHash.name, col("text")).as("f"),
          call_function(SimHash64.name, split(lower(col("text")), " ")).as("h"))
        .collect().toSeq.map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(_._1)
      finally s2.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("SQL surface via GraftExtensions names") {
    val s = spark
    RollingHash.register(s)
    SimHash64.register(s)
    val r = s.sql(
      "SELECT graft_rolling_hash('ab') AS h, graft_simhash64(array('', 'ab')) AS sh")
      .collect().head
    // 'a'=97, 'b'=98 → (97*31 + 98) mod p = 3105
    assert(r.getLong(0) === 3105L)
    // single-token simhash: every bit's vote is ±1, bits set where parity odd
    assert(r.getLong(1) !== 0L)
  }
}
