package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination scan — the training-data curation step that flags
  * corpus documents overlapping an evaluation set, so eval data can be held
  * out of training. Standard practice measures n-gram overlap: a training
  * document whose shingles largely appear in ANY eval document is
  * contaminated (the same character-shingle machinery as [[Dedup]], reused —
  * one hash definition engine-wide, so the DuckDB oracle shares it too).
  *
  * Scale shape (the reason this is its own operator and not a self-join):
  * eval benchmarks are tiny (MBs) against a 100 TB corpus, so the eval
  * shingle-hash set is built once, deduplicated, and BROADCAST — the corpus
  * side is one scan producing (doc_id, shingle-hash) rows, a broadcast-hash
  * semi-probe per row, and a map-side-combined per-doc count. No shuffle ever
  * carries text, and no corpus×corpus pair step exists (contrast
  * [[Dedup.minhashLshPairs]], which is for WITHIN-corpus duplication).
  */
object Contamination {

  /** Per-training-document n-gram overlap against the eval subset selected by
    * `evalPred`. Output (doc_id, n_shingles, n_hit, overlap, contaminated) —
    * one row per NON-eval document with ≥ 1 shingle (length ≥ k), where
    * `overlap` = fraction of the doc's distinct shingle hashes appearing in
    * any eval doc, rounded to 6 decimals; the flag compares the unrounded
    * ratio against `threshold`. */
  def ngramOverlap(
      docs: DataFrame,
      evalPred: Column,
      k: Int = 5,
      threshold: Double = 0.5): DataFrame = {
    // Split the corpus BY PREDICATE before shingling (round-7): the previous
    // form shingle-exploded the WHOLE corpus once, then carved out the eval
    // side with an id join and the train side with an anti-join — the
    // unpersisted explode subtree executed twice and both joins shipped the
    // full per-shingle row set. Filtering first runs the explode once per
    // (disjoint) side — the expensive train side only over non-eval docs —
    // and the joins disappear. `!coalesce(pred, false)` reproduces the
    // anti-join's null semantics exactly: a null predicate row is NOT eval.
    val evalHashes = broadcast(
      Dedup.shingleHashes(docs.where(evalPred), k).select(col("x")).distinct()
        .withColumn("hit", lit(1)))
    val train = Dedup.shingleHashes(docs.where(!coalesce(evalPred, lit(false))), k)
      .distinct() // per-doc distinct shingles — overlap is a set ratio
    val ratio = col("n_hit").cast("double") / col("n_shingles")
    train
      .join(evalHashes, Seq("x"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hit"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        round(ratio, 6).as("overlap"),
        (ratio >= threshold).as("contaminated"))
  }
}
