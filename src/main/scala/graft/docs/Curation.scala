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

  /** (doc_id, lang_pred, n_tokens) in ONE projection over one scan of the text —
    * the shared input of both packing forms. The round-3 form joined the langId
    * output with the tokenCount output on doc_id: two full text scans plus a
    * join where a single map suffices. */
  private[graft] def langTokens(docs: DataFrame): DataFrame = {
    val (lang, _) = TextOps.langPredCols(col("text"))
    docs.select(col("doc_id"), lang.as("lang_pred"),
      TextOps.tokenCountCol(col("text")).as("n_tokens"))
  }

  /** Greedy sequential packing of documents into token-budgeted shards, per
    * language stratum: docs ordered by doc_id, shard(d) = floor(prefix-sum of
    * tokens BEFORE d / budget) — the standard "fill shards to ~budget tokens"
    * prep for sequence-packing training runs. A document larger than the budget
    * still gets its own shard (the floor jumps past it), never splits.
    * Output (doc_id, lang_pred, n_tokens, shard).
    *
    * This form is the small-scale anchor: the per-stratum window is a single
    * sorted pass per language, so a dominant-language stratum (often >50% of a
    * corpus) is one task. [[tokenPackShardsScalable]] is the same contract with
    * the two-level split. */
  def tokenPackShards(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val byLang = Window.partitionBy(col("lang_pred")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    langTokens(docs)
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        floor(coalesce(sum(col("n_tokens")).over(byLang), lit(0L)) / budget).as("shard"))
  }

  /** Two-level twin of [[tokenPackShards]] — identical output (same oracle), no
    * per-stratum whole-data window anywhere in the plan. Same two-level-scan
    * family as [[graft.GraphCore.csrBlocks]] / `Ingest.sessionizeScalable`:
    *
    *  1. docs bucket by contiguous doc_id range (`doc_id div bucketSize` —
    *     integral, order-preserving); the token prefix sum runs inside each
    *     (lang, bucket) window in parallel — no task ever sorts more than one
    *     stratum-bucket;
    *  2. a per-(lang, bucket) token total (ONE row per bucket) gets a per-lang
    *     prefix sum over bucket order — a window over the tiny summary table;
    *  3. the summary joins back: global prefix = bucket base + local prefix,
    *     shard = floor(prefix / budget). Prefix sums decompose exactly, so the
    *     result is bit-identical to the single-window form (differential test
    *     in DocsSpec). */
  def tokenPackShardsScalable(docs: DataFrame, budget: Long, bucketSize: Long = 1L << 20): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(bucketSize > 0, "bucketSize must be positive")
    // integral truncating division: monotone in doc_id, so buckets are
    // contiguous id ranges and bucket order extends the in-bucket doc_id order
    val bkt = call_function("div", col("doc_id"), lit(bucketSize)).as("bkt")
    val byLangBkt = Window.partitionBy(col("lang_pred"), col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = langTokens(docs)
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"), bkt)
      .withColumn("loc", coalesce(sum(col("n_tokens")).over(byLangBkt), lit(0L)))
      .transform(graft.CacheTracker.persist) // read twice: summary + re-base join
    val byLang = Window.partitionBy(col("lang_pred")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = local.groupBy("lang_pred", "bkt")
      .agg(sum(col("n_tokens")).as("tot"))
      .select(col("lang_pred"), col("bkt"),
        coalesce(sum(col("tot")).over(byLang), lit(0L)).as("base"))
    local.join(bases, Seq("lang_pred", "bkt"))
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        floor((col("base") + col("loc")) / budget).as("shard"))
  }

  /** Deterministic train/val/test assignment: bucket = affine re-mix of doc_id
    * mod 100 (same portable-hash family as [[stratifiedSample]] but a DIFFERENT
    * multiplier, so sampling and splitting stay uncorrelated); bucket < trainPct
    * → train, < trainPct+valPct → val, else test. A pure function of the data —
    * identical across retries, engines, and cluster sizes, which is what makes
    * the split auditable and rerunnable. Output (doc_id, lang_pred, split), one
    * row per doc. Compose AFTER dedup ([[Dedup.clusterCanonicalLsh]]) — hash
    * splitting alone does not stop near-duplicate leakage across splits.
    *
    * Scale shape: per-row arithmetic only, no shuffle. */
  def datasetSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must satisfy 0 < trainPct, 0 <= valPct, trainPct+valPct <= 100")
    val p = 1000000007L
    val bucket = pmod(pmod(col("doc_id"), lit(p)) * lit(2246822519L), lit(p)) % lit(100L)
    TextOps.langId(docs).select(col("doc_id"), col("lang_pred"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }
}
