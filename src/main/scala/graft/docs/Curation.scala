package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators: the sampling / packing steps a training-data
  * pipeline runs after cleaning and dedup.
  *
  * Both are fully deterministic (hash / prefix-sum arithmetic, no `rand()`), so
  * they are reproducible under task retries — a hard requirement for lineage —
  * and value-exact oracle-checkable in DuckDB.
  */
object Curation {

  /** Deterministic per-stratum downsampling: keep a document iff
    * `hash(doc_id) mod 100 < rate(lang)` — the standard language-rebalancing
    * step (cap dominant languages, keep the tail). The hash is the portable
    * affine re-mix `(doc_id mod p)·2654435761 mod p` (p = 1e9+7), NOT `rand()`:
    * the kept set is a pure function of the data, identical across retries,
    * engines, and cluster sizes. Output (doc_id, lang_pred, keep) — one row per
    * input doc so the decision itself is auditable (filter on `keep` to apply).
    *
    * Scale shape: langId is per-row arithmetic, the hash is per-row arithmetic —
    * no shuffle at all beyond langId's none. */
  def stratifiedSample(docs: DataFrame, rates: Seq[(String, Int)], defaultRate: Int = 100): DataFrame = {
    require((rates.map(_._2) :+ defaultRate).forall(r => r >= 0 && r <= 100),
      "rates are percentages in [0, 100]")
    val p = 1000000007L
    val bucket = pmod(pmod(col("doc_id"), lit(p)) * lit(2654435761L), lit(p)) % lit(100L)
    require(rates.map(_._1).distinct.size == rates.size, "duplicate language in rates")
    // foldRight: FIRST entry wins on (disallowed) duplicates — the same
    // precedence as the oracle's nested CASE, so the two can never diverge
    val rate = rates.foldRight(lit(defaultRate): Column) { case ((lang, r), acc) =>
      when(col("lang_pred") === lang, lit(r)).otherwise(acc)
    }
    TextOps.langId(docs)
      .select(col("doc_id"), col("lang_pred"), (bucket < rate).as("keep"))
  }

  /** Greedy sequential packing of documents into token-budgeted shards, per
    * language stratum: docs ordered by doc_id, shard(d) = floor(prefix-sum of
    * tokens BEFORE d / budget) — the standard "fill shards to ~budget tokens"
    * prep for sequence-packing training runs. A document larger than the budget
    * still gets its own shard (the floor jumps past it), never splits.
    * Output (doc_id, lang_pred, n_tokens, shard).
    *
    * Scale note: the per-stratum window is a single sorted pass per language —
    * the same two-level-scan mitigation as [[graft.GraphCore.csrBlocks]]
    * applies verbatim when one stratum outgrows a task (bucket by id range,
    * local prefix sums, broadcast bucket offsets). */
  def tokenPackShards(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val toks = TextOps.tokenCount(docs)
    val byLang = Window.partitionBy(col("lang_pred")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    TextOps.langId(docs).select(col("doc_id"), col("lang_pred"))
      .join(toks, "doc_id")
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        floor(coalesce(sum(col("n_tokens")).over(byLang), lit(0L)) / budget).as("shard"))
  }
}
