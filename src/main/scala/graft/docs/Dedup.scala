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
    * (doc_id, canonical_id, is_dup) where canonical_id = min doc_id of the group.
    *
    * The group key is a 128-bit content hash (two independently-seeded xxhash64 of
    * the normalized text), NOT the text itself: at 100 TB the window's shuffle key
    * must be 16 bytes, not a whole document (round-1 audit finding). Collision odds
    * across P candidate pairs are P/2^128 — the same equality-by-hash contract as
    * content-addressed stores; a byte-exact within-group verify would require
    * shuffling the full text, which is exactly the cost this removes. */
  def exact(docs: DataFrame): DataFrame = {
    val keyed = docs
      .select(col("doc_id"), TextOps.normalized(col("text")).as("norm"))
      .select(
        col("doc_id"),
        xxhash64(col("norm")).as("h1"),
        xxhash64(lit("graft.dedup.exact/2"), col("norm")).as("h2"))
    val byKey = Window.partitionBy(col("h1"), col("h2"))
    keyed
      .withColumn("canonical_id", min(col("doc_id")).over(byKey))
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
    val sh = graft.CacheTracker.persist(shingles(docs, k))
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

  /** Per-document sorted shingle-hash set: (doc_id, xs: array<long> ascending),
    * xs = sorted distinct xxhash64(shingle). ONE map-side-combined shuffle keyed
    * by doc — the single shared input of the MinHash signature fold AND the
    * candidate verification (round 1 built and persisted the shingle table twice).
    * Full 64-bit hashes: |hash set| = |shingle set| up to ~2^-64 collision odds,
    * so hash-set Jaccard equals exact shingle Jaccard. */
  def shingleSets(docs: DataFrame, k: Int = 5): DataFrame =
    shingles(docs, k)
      .select(col("doc_id"), xxhash64(col("sh")).as("x"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("x"))).as("xs"))

  /** MinHash signatures from a [[shingleSets]] table: `perms` permutation-min
    * hashes per document. h_i(s) = (a_i·(x mod p) + b_i) mod p, a_i = 2i+1 odd,
    * b_i = xxhash64(i) mod p, p = 1e9+7 (keeps a_i·x ≪ 2^63 — no ANSI overflow).
    * Output (doc_id, sig: array<long> of length `perms`).
    *
    * Fold shape matters (interpreted higher-order functions): element-major over
    * a once-per-row pre-reduced `pmod(x, p)` array, with the permutation offsets
    * b_i evaluated ONCE on the driver (same Catalyst xxhash64, identical values)
    * and shipped as a constant-folded literal — the permutation-major form
    * re-evaluated `xxhash64(i)` and `pmod(x, p)` per (element × permutation),
    * dominating the LSH pipeline's CPU. No shingles×perms row explosion either
    * way. */
  def minhashSignaturesFromSets(sets: DataFrame, perms: Int = 64): DataFrame = {
    val p = 1000000007L
    val bs = (0 until perms).map { i =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(i)), 42L)
        .eval(null).asInstanceOf[Long]
      ((h % p) + p) % p
    }
    val bLit = bs.mkString("array(", "L, ", "L)")
    sets.select(col("doc_id"), expr(
      s"""aggregate(
         |  transform(xs, x -> pmod(x, $p)),
         |  transform(sequence(0, ${perms - 1}), i -> cast($p as bigint)),
         |  (acc, xp) -> zip_with(acc, sequence(0, ${perms - 1}), (mn, i) ->
         |    least(mn, pmod(xp * (i * 2 + 1) + element_at($bLit, i + 1), $p))))"""
        .stripMargin).as("sig"))
  }

  def minhashSignatures(docs: DataFrame, k: Int = 5, perms: Int = 64): DataFrame =
    minhashSignaturesFromSets(shingleSets(docs, k), perms)

  /** LSH candidate pairs from banded MinHash signatures, verified with exact
    * Jaccard. Output (a, b, jac) with jac ≥ `threshold` — same shape as
    * [[ngramJaccardPairs]], but reached without the all-pairs shingle join.
    * bands×rows must equal the signature length.
    *
    * Scale shape: one shuffle builds the shared [[shingleSets]] table (persisted —
    * signature and verify stages both read it); banding + bucket equi-join yields
    * candidates proportional to true-duplicate density; verification intersects
    * the two per-doc SORTED hash arrays with the codegen'd two-pointer merge
    * ([[graft.expr.SortedIntersectCount]]) — no re-explosion of shingles into a
    * row-per-(candidate, shingle) join as in round 1. */
  def minhashLshPairs(
      docs: DataFrame,
      k: Int = 5,
      perms: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.35): DataFrame = {
    require(perms % bands == 0, "bands must divide perms")
    val rows = perms / bands
    graft.expr.SortedIntersectCount.register(docs.sparkSession)
    val sets = graft.CacheTracker.persist(shingleSets(docs, k))
    val banded = minhashSignaturesFromSets(sets, perms)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(b, slice(col("sig"), b * lit(rows) + lit(1), lit(rows))).as("bh")))).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bh"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    candidates
      .join(sets.select(col("doc_id").as("a"), col("xs").as("xa")), "a")
      .join(sets.select(col("doc_id").as("b"), col("xs").as("xb")), "b")
      .select(col("a"), col("b"),
        call_function(graft.expr.SortedIntersectCount.name, col("xa"), col("xb")).as("i"),
        size(col("xa")).cast("long").as("na"), size(col("xb")).cast("long").as("nb"))
      .select(col("a"), col("b"),
        round(col("i") / (col("na") + col("nb") - col("i")), 6).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens (unit weights): per-bit ±1 votes summed
    * across token hashes, sign → bit. Output (doc_id, simhash).
    *
    * The token hash is the same polynomial rolling hash (mod 1e9+7) as
    * [[TextOps.fingerprint]] — DuckDB-reproducible, so both simhash queries are
    * oracle-checkable (round 1 used xxhash64, which has no DuckDB twin). Bit i's
    * per-token vote is the parity of an affine re-mix of the token hash
    * (r·(2i+1) + i·2654435761 mod p). Pure higher-order expressions — each token
    * is hashed once, then the 64-bit fold runs inside codegen; the only shuffle is
    * none at all (per-row computation). */
  def simhash(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr(
        """transform(
          |  filter(split(lower(text), ' '), x -> x != ''),
          |  t -> aggregate(split(t, ''), cast(0 as bigint),
          |         (acc, c) -> pmod(acc * 31 + ascii(c), 1000000007)))""".stripMargin)
        .as("rs"))
      .select(
        col("doc_id"),
        // token-major loop order: `rs` (the token-hash array) is the INPUT of the
        // fold and thus evaluated once per row; a bit-major outer loop would
        // re-evaluate the whole token-hashing transform 64× per document (measured
        // 23 s → ~2 s at sf0.1). The accumulator is the 64-long vote vector.
        expr(
          """aggregate(
            |  zip_with(
            |    aggregate(rs,
            |      transform(sequence(0, 63), i -> cast(0 as bigint)),
            |      (acc, r) -> zip_with(acc, sequence(0, 63), (a, i) ->
            |        a + if(pmod(pmod(r * (2 * i + 1) + pmod(i * 2654435761L, 1000000007),
            |                        1000000007), 2) = 1, 1, -1))),
            |    sequence(0, 63),
            |    (v, i) -> if(v > 0, shiftleft(cast(1 as bigint), i), cast(0 as bigint))),
            |  cast(0 as bigint),
            |  (a, x) -> a + x)""".stripMargin)
          .as("simhash"))

  /** SimHash near-duplicate pairs with hamming distance ≤ `maxHamming`, WITHOUT the
    * all-pairs join (round 1's scale-killer): pigeonhole banding. Split the 64 bits
    * into `maxHamming + 1` bands — two hashes within hamming `maxHamming` differ in
    * at most `maxHamming` bands, so at least one band is bit-identical; an equi-join
    * on (band, band_bits) yields every qualifying pair as a candidate, then the
    * exact hamming filter verifies. Candidate volume tracks near-duplicate density
    * (band-bucket sizes), never |docs|². Output (a, b, hamming), a < b — identical
    * rows to the brute-force form by construction (banding is lossless here). */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 8): DataFrame = {
    val nBands = maxHamming + 1
    val base = 64 / nBands
    val widths = Seq.tabulate(nBands)(j => if (j < 64 % nBands) base + 1 else base)
    val lows = widths.scanLeft(0)(_ + _).init
    val h = graft.CacheTracker.persist(simhash(docs)) // both sides of the candidate self-join
    val bandCols = (0 until nBands).map { j =>
      // mask after the arithmetic shift → exact logical band extraction, sign-safe
      struct(lit(j).as("band"),
        shiftright(col("simhash"), lows(j)).bitwiseAND(lit((1L << widths(j)) - 1)).as("bv"))
    }
    val banded = h.select(col("doc_id"), col("simhash").as("h"),
        explode(array(bandCols: _*)).as("e"))
      .select(col("doc_id"), col("h"), col("e.band").as("band"), col("e.bv").as("bv"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        hamming64(col("x.h"), col("y.h")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Brute-force twin of [[simhashNearDupPairs]] — the O(n²) correctness anchor,
    * for differential tests only (never registered as a scale path). */
  private[graft] def simhashNearDupPairsBrute(docs: DataFrame, maxHamming: Int = 8): DataFrame = {
    val h = graft.CacheTracker.persist(simhash(docs))
    val a = h.select(col("doc_id").as("a"), col("simhash").as("ha"))
    val b = h.select(col("doc_id").as("b"), col("simhash").as("hb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), hamming64(col("ha"), col("hb")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Hamming distance between two 64-bit fingerprints (for near-dup query on
    * simhashes). */
  def hamming64(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    bit_count(a.bitwiseXOR(b))
}
