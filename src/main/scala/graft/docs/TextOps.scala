package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the training-data-pipeline
  * layer (not in the reference, which computes on raw ints only; required by the
  * builder brief as first-class operators). Everything is pure Catalyst
  * (`functions._` + higher-order array functions), codegen-friendly, no UDFs, and
  * each operator has an exact DuckDB twin in [[graft.OracleSql]].
  */
object TextOps {

  /** Fan an under-split scan out to the session's shuffle width (the
    * single-small-file rescue case — the minhashLshPairs gating, round 7):
    * a production multi-split scan keeps its partitioning (no text shuffle,
    * no parallelism collapse when splits exceed the setting); a single-file
    * local input stops serializing a heavy per-row map stage on one core.
    * Only worth the gate check for the HEAVY per-row operators (n-gram
    * building, full-vocabulary explode) — the cheap per-row scans finish in
    * well under a second even single-task. */
  private[graft] def fanned(docs: DataFrame): DataFrame = {
    val nShuffle = docs.sparkSession.sessionState.conf.numShufflePartitions
    if (docs.rdd.getNumPartitions < nShuffle) docs.repartition(nShuffle) else docs
  }

  /** Whitespace token count: split on single space, drop empties. */
  def tokenCountCol(text: Column): Column =
    size(filter(split(text, " "), _ =!= "")).cast("long")

  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokenCountCol(col("text")).as("n_tokens"))

  /** BPE-ish subword-boundary token count: alphabetic runs, digit runs, and single
    * non-alphanumeric marks each count as one token (the pre-tokenization split
    * most BPE vocabularies start from). Simple char classes only, so the regex
    * means the same thing in Spark (Java) and DuckDB (RE2). */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def tokenCountBpe(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(lower(col("text")), lit(bpePattern)).cast("long").as("n_bpe_tokens"))

  /** Occurrences of literal `marker` in space-padded text (counts non-overlapping
    * matches via length difference — identical semantics in Spark and DuckDB). */
  def markerCount(text: Column, marker: String): Column =
    (length(text) - length(replace(text, lit(marker), lit("")))) / lit(marker.length)

  /** Language → stopword markers for the n-gram-heuristic language id. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " que "),
    "fr" -> Seq(" le ", " les ", " des "),
    "zh" -> Seq(" shi ", " bu ", " wo "))

  /** Per-language marker scores of a text column, in ascending language order. */
  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langMarkers.map { case (lang, markers) =>
      lang -> markers.map(m => markerCount(padded, m)).reduce(_ + _)
    }.sortBy(_._1)
  }

  /** (lang_pred, score) columns: argmax over [[langScores]] with (score desc,
    * lang asc) tie-break — `greatest` + a first-match `when` chain in ascending
    * language order, all per-row arithmetic. */
  def langPredCols(text: Column): (Column, Column) = {
    val scored = langScores(text)
    val best = greatest(scored.map(_._2): _*)
    val lang = coalesce(scored.map { case (l, s) => when(s === best, lit(l)) }: _*)
    (lang, best)
  }

  /** Heuristic language id: per-language stopword-marker counts, argmax with
    * (score desc, lang asc) tie-break. Output (doc_id, lang_pred, score).
    *
    * One per-row projection — no union, no shuffle, no window (the round-3 form
    * unioned 5 scans of the text and ran a per-doc `row_number` window; the
    * argmax is per-row arithmetic, so at 100 TB this is now a pure map). */
  def langId(docs: DataFrame): DataFrame = {
    val (lang, best) = langPredCols(col("text"))
    docs.select(col("doc_id"), lang.as("lang_pred"), best.as("score"))
  }

  /** Quality score in [0,1]: alphabetic-character ratio, capped token count, capped
    * stopword count. Deterministic, documented formula (mirrored in the oracle).
    * Output (doc_id, n_chars, n_tokens, quality). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val t = lower(col("text"))
    val nChars = length(col("text")).cast("long")
    val alphaRatio = length(regexp_replace(t, "[^a-z]", "")) /
      greatest(length(col("text")), lit(1))
    val nTokens = tokenCountCol(col("text"))
    val padded = concat(lit(" "), t, lit(" "))
    val stops = Seq(" the ", " and ", " of ").map(m => markerCount(padded, m)).reduce(_ + _)
    docs.select(
      col("doc_id"),
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      round(
        lit(0.4) * alphaRatio +
          lit(0.3) * least(nTokens / lit(50.0), lit(1.0)) +
          lit(0.3) * least(stops / lit(10.0), lit(1.0)),
        4).as("quality"))
  }

  /** Deterministic document fingerprint: polynomial rolling hash of the character
    * stream, mod 1e9+7 (stays far from int64 overflow under ANSI mode) — the
    * compiled [[graft.expr.RollingHash]] kernel (round 6; was an interpreted
    * per-character `aggregate`/`transform`/`split('')` HOF fold; "" → 0 and
    * null → null exactly as the fold behaved). Output (doc_id, fp). */
  def fingerprint(docs: DataFrame): DataFrame = {
    graft.expr.RollingHash.register(docs.sparkSession)
    docs.select(
      col("doc_id"),
      call_function(graft.expr.RollingHash.name, col("text")).as("fp"))
  }

  /** Whitespace-normalized lowercase text — the exact-dedup key. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Gopher-style repetition signal: the fraction of duplicate word `n`-grams
    * (Rae et al. 2021 use duplicate n-gram fractions as a core quality rule —
    * templated/spammy documents repeat themselves). All per-row array
    * arithmetic; the only exchange is the GATED under-split fan-out
    * ([[fanned]] — a no-op on a production multi-split scan). Grams are
    * built with `sequence`+`transform`
    * (interpreted HOF — acceptable here because the work is embarrassingly
    * parallel scalar text prep, not a hot shuffled inner loop) and deduped with
    * `array_distinct`. Docs with fewer than `n` tokens score 0.
    * Output (doc_id, n_grams, n_unique_grams, rep_ratio). */
  def repetitionRatio(docs: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 1, "n must be positive")
    val toks = filter(split(col("text"), " "), _ =!= "")
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
    fanned(docs)
      .select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_distinct(col("grams"))).cast("long").as("n_unique_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_unique_grams"),
        when(col("n_grams") > 0,
          round(lit(1.0) - col("n_unique_grams") / col("n_grams"), 6))
          .otherwise(lit(0.0)).as("rep_ratio"))
  }

  /** PII patterns — simple char-class regexes that mean the same thing in Java
    * (Spark) and RE2 (DuckDB): no backrefs, no lookaround. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  val ipRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII scrubbing (the standard pre-training redaction pass): counts per
    * pattern on the ORIGINAL text (independent counts), plus the redacted text
    * with emails → `<EMAIL>`, then phones → `<PHONE>`, then IPs → `<IP>` —
    * phones before IPs so a dotted phone number is not half-eaten by the IP
    * pattern. Pure per-row regex work, no shuffle.
    * Output (doc_id, n_emails, n_phones, n_ips, redacted). */
  /** Per-language top-k vocabulary: whitespace tokens counted per
    * (lang_pred, token), top `k` by (count desc, token asc). The corpus
    * statistic behind tokenizer training and domain drift monitoring.
    * Output (lang_pred, token, n, rnk).
    *
    * Scale shape: the explode + count is one map-side-combinable aggregation
    * over (lang, token); the top-k window then runs over the vocabulary-sized
    * count table (tokens are Zipf — the count table is orders of magnitude
    * smaller than the corpus), partitioned by language. At an extreme
    * vocabulary a pre-filter on a per-partition candidate top-k would bound
    * the window input further; not needed at any realistic vocab size. */
  def topTokens(docs: DataFrame, k: Int = 10): DataFrame = {
    val (lang, _) = langPredCols(col("text"))
    val counts = fanned(docs)
      .select(lang.as("lang_pred"), explode(filter(split(col("text"), " "), _ =!= "")).as("token"))
      .groupBy(col("lang_pred"), col("token"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang_pred")).orderBy(col("n").desc, col("token").asc)
    counts
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"),
      regexp_count(col("text"), lit(ipRe)).cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"),
        ipRe, "<IP>").as("redacted"))
}
