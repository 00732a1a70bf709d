package graft.docs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table: exact (normalized-hash
  * group-by), exact n-gram Jaccard (the correctness anchor), MinHash+LSH (the 100 TB
  * scale path — candidate generation without the all-pairs join), and SimHash.
  *
  * Scale notes: the exact Jaccard pair join explodes on common shingles — it is the
  * small-scale oracle. At 100 TB the path is [[minhashLshPairs]]: per-document
  * signatures (one map-side-combined shuffle keyed by (doc, perm)), banding, and a
  * bucket equi-join that only pairs documents sharing a band — candidate count tracks
  * true-duplicate count, not |docs|². Verified candidates then get the exact Jaccard
  * on a join restricted to candidates.
  */
object Dedup {

  /** Exact dedup on whitespace-normalized lowercase text. Output one row per doc:
    * (doc_id, canonical_id, is_dup) where canonical_id = min doc_id of the group. */
  def exact(docs: DataFrame): DataFrame = {
    val byNorm = Window.partitionBy(col("norm"))
    docs
      .select(col("doc_id"), TextOps.normalized(col("text")).as("norm"))
      .withColumn("canonical_id", min(col("doc_id")).over(byNorm))
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
  }

  /** Distinct k-character shingles per document: (doc_id, sh). Documents shorter
    * than k contribute nothing (mirrors the oracle's length guard; also keeps
    * Spark's `sequence` from generating a descending range). */
  def shingles(docs: DataFrame, k: Int = 5): DataFrame =
    docs
      .where(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), length(col("text")) - lit(k - 1)),
          i => substring(col("text"), i, lit(k))))).as("sh"))

  /** Exact n-gram Jaccard similarity for all pairs at or above `threshold`.
    * Output (a, b, jac) with a < b, jac rounded to 6. O(pairs sharing a shingle) —
    * the small-scale correctness anchor for [[minhashLshPairs]]. */
  def ngramJaccardPairs(docs: DataFrame, k: Int = 5, threshold: Double = 0.35): DataFrame = {
    // persisted: referenced three times (both self-join sides + sizes) — without it
    // the shingle explode runs three times per query
    val sh = shingles(docs, k).persist()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        round(col("i") / (col("na") + col("nb") - col("i")), 6).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** MinHash signatures: `perms` permutation-min hashes per document.
    * h_i(s) = (a_i·x + b_i) mod p over x = xxhash64(shingle), a_i = 2i+1 odd,
    * p = 1e9+7 (keeps a_i·x ≪ 2^63 — no ANSI overflow).
    * Output (doc_id, sig: array<long> of length `perms`).
    *
    * One shuffle (shingle-hash collect per doc), then the perms×shingles fold runs
    * entirely inside codegen via nested higher-order functions — no
    * shingles×perms row explosion (a 64× blow-up that dominated the LSH
    * pipeline's time before). */
  def minhashSignatures(docs: DataFrame, k: Int = 5, perms: Int = 64): DataFrame = {
    val p = 1000000007L
    val h = shingles(docs, k)
      .select(col("doc_id"), pmod(xxhash64(col("sh")), lit(p)).as("x"))
    h.groupBy("doc_id")
      .agg(collect_set(col("x")).as("xs"))
      .select(col("doc_id"), expr(
        s"""transform(sequence(0, ${perms - 1}), i ->
           |  aggregate(xs, cast($p as bigint),
           |    (mn, x) -> least(mn, pmod(x * (i * 2 + 1) + pmod(xxhash64(i), $p), $p))))"""
          .stripMargin).as("sig"))
  }

  /** LSH candidate pairs from banded MinHash signatures, verified with exact
    * Jaccard. Output (a, b, jac) with jac ≥ `threshold` — same shape as
    * [[ngramJaccardPairs]], but reached without the all-pairs shingle join.
    * bands×rows must equal the signature length. */
  def minhashLshPairs(
      docs: DataFrame,
      k: Int = 5,
      perms: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.35): DataFrame = {
    require(perms % bands == 0, "bands must divide perms")
    val rows = perms / bands
    val sigs = minhashSignatures(docs, k, perms)
      .persist() // referenced by every band
    val banded = sigs.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(b, slice(col("sig"), b * lit(rows) + lit(1), lit(rows))).as("bh")))).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bh"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    // exact-verify only the candidates
    val sh = shingles(docs, k).persist()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    candidates
      .join(sh.select(col("doc_id").as("a"), col("sh")), "a")
      .join(sh.select(col("doc_id").as("b"), col("sh").as("sh2")), "b")
      .where(col("sh") === col("sh2"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("i"))
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        round(col("i") / (col("na") + col("nb") - col("i")), 6).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens (unit weights): per-bit ±1 votes summed
    * across token hashes, sign → bit. Output (doc_id, simhash). Pure higher-order
    * expressions — the per-doc fold runs inside codegen, no shuffle beyond the
    * token collect. */
  def simhash(docs: DataFrame): DataFrame = {
    val tokens = docs.select(col("doc_id"),
      filter(split(lower(col("text")), " "), _ =!= "").as("toks"))
    tokens.select(
      col("doc_id"),
      expr(
        """aggregate(
          |  sequence(0, 63),
          |  cast(0 as bigint),
          |  (acc, i) -> acc + if(
          |    aggregate(toks, cast(0 as bigint),
          |      (s, t) -> s + if(((xxhash64(t) >> i) & 1) = 1, 1, -1)) > 0,
          |    shiftleft(cast(1 as bigint), i), cast(0 as bigint)))""".stripMargin)
        .as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints (for near-dup query on
    * simhashes). */
  def hamming64(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    bit_count(a.bitwiseXOR(b))
}
