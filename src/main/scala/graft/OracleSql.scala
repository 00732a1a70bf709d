package graft

/** DuckDB-dialect oracle SQL, one string per entry in [[SparkEntry.oracleSql]].
  *
  * Every query here is the exact relational semantics of the corresponding Spark
  * pipeline, over the driver's parquet tables (registered in DuckDB under their bare
  * stem names — `events`, `lineitem`, `documents`, `embeddings`, …). Column aliases
  * MUST match the Spark side: the driver sorts columns by name before hashing.
  *
  * The edge table is derived from `events` as temporal co-occurrence: within each
  * `event_type` stream ordered by (ts, event_id), each event links its user to the
  * previous event's user; self-pairs dropped, pairs canonicalized (src < dst) and
  * deduplicated — mirroring [[Ingest.edgesFromEvents]] + [[GraphCore.clean]].
  */
object OracleSql {

  /** Shared CTE bodies (no WITH keyword): canonical edges `e(src, dst)`. */
  val edgesCte: String =
    """lagd AS (
      |  SELECT user_id AS cur,
      |         lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev
      |  FROM events),
      |e AS (
      |  SELECT DISTINCT least(cur, prev) AS src, greatest(cur, prev) AS dst
      |  FROM lagd WHERE prev IS NOT NULL AND prev <> cur)""".stripMargin

  /** + symmetric view `ud(u, w)`, vertices `verts(v)`, degrees `deg(v, deg)`. */
  val graphCtes: String = edgesCte +
    """,
      |ud AS (SELECT src AS u, dst AS w FROM e UNION ALL SELECT dst AS u, src AS w FROM e),
      |verts AS (SELECT DISTINCT u AS v FROM ud),
      |deg AS (SELECT u AS v, count(*) AS deg FROM ud GROUP BY u)""".stripMargin

  val edges: String = s"WITH $edgesCte SELECT src, dst FROM e"

  val degrees: String = s"WITH $graphCtes SELECT v, deg FROM deg"

  /** Degree-ordered orientation (low→high, id tie-break) — report.md:7 rule. */
  val orientedCte: String = graphCtes +
    """,
      |oriented AS (
      |  SELECT CASE WHEN ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)
      |              THEN e.src ELSE e.dst END AS src,
      |         CASE WHEN ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)
      |              THEN e.dst ELSE e.src END AS dst
      |  FROM e
      |  JOIN deg ds ON ds.v = e.src
      |  JOIN deg dd ON dd.v = e.dst)""".stripMargin

  val oriented: String = s"WITH $orientedCte SELECT src, dst FROM oriented"

  /** Per-edge triangle support over the degree-oriented edges: for edge (u,v),
    * the number of w with v→w and u→w — exactly |N⁺(u) ∩ N⁺(v)|; edges closing
    * no triangle keep a 0 row. */
  val edgeSupport: String =
    s"""WITH $orientedCte,
       |sup AS (
       |  SELECT e1.src, e1.dst, count(*) AS c
       |  FROM oriented e1
       |  JOIN oriented e2 ON e2.src = e1.dst
       |  JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
       |  GROUP BY e1.src, e1.dst)
       |SELECT o.src, o.dst, coalesce(sup.c, 0) AS support
       |FROM oriented o
       |LEFT JOIN sup ON sup.src = o.src AND sup.dst = o.dst""".stripMargin

  /** Twin of [[graft.TriangleCount.ktrussEdges]] with a fixed round budget:
    * `rounds` unrolled peel steps over the degree-oriented edges — each step
    * keeps edges in ≥ k−2 triangles of the CURRENT subgraph (membership =
    * every triangle credits its three edges). Peeling a fixpoint is a no-op,
    * so a converged graph gives identical rows for any extra unrolled round. */
  def ktrussPeel(k: Int, rounds: Int): String = {
    require(k >= 3 && rounds >= 1)
    val sb = new StringBuilder(s"WITH $orientedCte")
    sb.append(",\ne0 AS (SELECT src, dst FROM oriented)")
    for (r <- 0 until rounds) {
      sb.append(s""",
         |tri$r AS (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM e$r e1
         |  JOIN e$r e2 ON e2.src = e1.dst
         |  JOIN e$r e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |mem$r AS (
         |  SELECT src, dst, count(*) AS c FROM (
         |    SELECT a AS src, b AS dst FROM tri$r
         |    UNION ALL SELECT a AS src, c AS dst FROM tri$r
         |    UNION ALL SELECT b AS src, c AS dst FROM tri$r)
         |  GROUP BY src, dst),
         |e${r + 1} AS (SELECT src, dst FROM mem$r WHERE c >= ${k - 2})""".stripMargin)
    }
    sb.append(s"\nSELECT src, dst FROM e$rounds").toString
  }

  val adjacencyCsv: String =
    s"""WITH $orientedCte
       |SELECT src AS v, count(*) AS deg,
       |       string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS nbrs_csv
       |FROM oriented GROUP BY src""".stripMargin

  /** Global triangle count. The oracle uses the id-ordered (src < dst) 3-way join —
    * provably the same total as the degree-oriented plan (each triangle counted once
    * under any acyclic orientation). */
  val trianglesGlobal: String =
    s"""WITH $edgesCte
       |SELECT count(*) AS triangles
       |FROM e e1
       |JOIN e e2 ON e2.src = e1.dst
       |JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin

  val trianglesPerVertex: String =
    s"""WITH $graphCtes,
       |tri AS (
       |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |  FROM e e1
       |  JOIN e e2 ON e2.src = e1.dst
       |  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
       |corners AS (
       |  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
       |cnt AS (SELECT v, count(*) AS n FROM corners GROUP BY v)
       |SELECT verts.v AS v, coalesce(cnt.n, 0) AS tri_cnt
       |FROM verts LEFT JOIN cnt ON cnt.v = verts.v""".stripMargin

  /** Exact min-id component labels via transitive closure (fine at oracle scale;
    * the engine itself uses O(log n)-round large/small-star instead). */
  val connectedComponents: String =
    s"""WITH RECURSIVE $graphCtes,
       |r(v, l) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT ud.w, r.l FROM r JOIN ud ON ud.u = r.v)
       |SELECT v, min(l) AS component FROM r GROUP BY v""".stripMargin

  /** PageRank at exactly `iters` synchronous iterations, unrolled (no recursion —
    * DuckDB recursive CTEs cannot aggregate in the recursive term). */
  def pagerankFixed(iters: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH ").append(graphCtes).append(",\n")
    sb.append("n AS (SELECT count(*) AS n FROM verts),\n")
    sb.append("r0 AS (SELECT verts.v AS v, 1.0 / n.n AS pr FROM verts CROSS JOIN n)")
    for (i <- 1 to iters) {
      sb.append(s""",
        |s$i AS (
        |  SELECT ud.w AS v, sum(r${i - 1}.pr / deg.deg) AS s
        |  FROM ud
        |  JOIN r${i - 1} ON r${i - 1}.v = ud.u
        |  JOIN deg ON deg.v = ud.u
        |  GROUP BY ud.w),
        |r$i AS (
        |  SELECT verts.v AS v, 0.15 / n.n + 0.85 * coalesce(s$i.s, 0) AS pr
        |  FROM verts CROSS JOIN n LEFT JOIN s$i ON s$i.v = verts.v)""".stripMargin)
    }
    sb.append(s"\nSELECT v, round(pr, 6) AS pr FROM r$iters")
    sb.toString
  }

  /** Twin of [[graft.PageRank.weightedFixedIterations]] over the multiplicity-
    * weighted event co-occurrence edges, unrolled like [[pagerankFixed]];
    * contributions are `pr * wt / wdeg` evaluated left-to-right — the exact
    * association the Spark side mirrors. */
  def pagerankWeightedFixed(iters: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH ").append(edgesCte).append(",\n")
    sb.append(
      """we AS (
        |  SELECT least(cur, prev) AS src, greatest(cur, prev) AS dst, count(*) AS wt
        |  FROM lagd WHERE prev IS NOT NULL AND prev <> cur
        |  GROUP BY 1, 2),
        |wud AS (SELECT src AS u, dst AS t, wt FROM we UNION ALL SELECT dst AS u, src AS t, wt FROM we),
        |wdeg AS (SELECT u, sum(wt) AS wdeg FROM wud GROUP BY u),
        |wverts AS (SELECT DISTINCT u AS v FROM wud),
        |n AS (SELECT count(*) AS n FROM wverts),
        |w0 AS (SELECT wverts.v AS v, 1.0 / n.n AS pr FROM wverts CROSS JOIN n)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
        |ws$i AS (
        |  SELECT wud.t AS v, sum(w${i - 1}.pr * wud.wt / wdeg.wdeg) AS s
        |  FROM wud
        |  JOIN w${i - 1} ON w${i - 1}.v = wud.u
        |  JOIN wdeg ON wdeg.u = wud.u
        |  GROUP BY wud.t),
        |w$i AS (
        |  SELECT wverts.v AS v, 0.15 / n.n + 0.85 * coalesce(ws$i.s, 0) AS pr
        |  FROM wverts CROSS JOIN n LEFT JOIN ws$i ON ws$i.v = wverts.v)""".stripMargin)
    }
    sb.append(s"\nSELECT v, round(pr, 6) AS pr FROM w$iters")
    sb.toString
  }

  /** Twin of [[graft.PageRank.personalizedFixedIterations]] with source set
    * v ≡ 0 (mod `srcMod`), unrolled like [[pagerankFixed]]; the teleport term
    * is the same per-row CASE the Spark side evaluates. */
  def pagerankPersonalizedFixed(iters: Int, srcMod: Int): String = {
    def isSrc(ref: String) = s"(($ref % $srcMod) + $srcMod) % $srcMod = 0"
    val sb = new StringBuilder
    sb.append("WITH ").append(graphCtes).append(",\n")
    sb.append(s"""ns AS (SELECT count(*) AS ns FROM verts WHERE ${isSrc("v")}),
      |p0 AS (
      |  SELECT verts.v AS v, CASE WHEN ${isSrc("verts.v")} THEN 1.0 / ns.ns ELSE 0 END AS pr
      |  FROM verts CROSS JOIN ns)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
        |ps$i AS (
        |  SELECT ud.w AS v, sum(p${i - 1}.pr / deg.deg) AS s
        |  FROM ud
        |  JOIN p${i - 1} ON p${i - 1}.v = ud.u
        |  JOIN deg ON deg.v = ud.u
        |  GROUP BY ud.w),
        |p$i AS (
        |  SELECT verts.v AS v,
        |         CASE WHEN ${isSrc("verts.v")} THEN 0.15 / ns.ns ELSE 0 END + 0.85 * coalesce(ps$i.s, 0) AS pr
        |  FROM verts CROSS JOIN ns LEFT JOIN ps$i ON ps$i.v = verts.v)""".stripMargin)
    }
    sb.append(s"\nSELECT v, round(pr, 6) AS pr FROM p$iters")
    sb.toString
  }

  /** Synchronous label propagation at exactly `iters` steps, unrolled. Tie-break:
    * highest neighbor-label count, then smallest label. */
  /** The unrolled LPA label chain `l0..l{iters}` on top of [[graphCtes]] —
    * shared by [[lpaFixed]] and [[communityModularity]] so the two queries
    * cannot drift on label semantics. */
  private def lpaChain(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(graphCtes).append(",\n")
    sb.append("l0 AS (SELECT v, v AS label FROM verts)")
    for (i <- 1 to iters) {
      sb.append(s""",
        |c$i AS (
        |  SELECT ud.w AS v, l${i - 1}.label AS lbl, count(*) AS n
        |  FROM ud JOIN l${i - 1} ON l${i - 1}.v = ud.u
        |  GROUP BY ud.w, l${i - 1}.label),
        |l$i AS (
        |  SELECT v, lbl AS label FROM (
        |    SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY n DESC, lbl ASC) AS rn
        |    FROM c$i) t
        |  WHERE rn = 1)""".stripMargin)
    }
    sb.toString
  }

  def lpaFixed(iters: Int): String =
    s"WITH ${lpaChain(iters)}\nSELECT v, label FROM l$iters"

  /** Twin of [[graft.LabelProp.communityModularity]] over the `iters`-step LPA
    * partition: per-community Newman modularity contributions. All-integer
    * arithmetic into IEEE doubles — bit-identical across engines, rounding is
    * the display contract. */
  def communityModularity(iters: Int): String =
    s"""WITH ${lpaChain(iters)},
       |lbl AS (SELECT v, label FROM l$iters),
       |m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM e),
       |bl AS (
       |  SELECT lbl.label, count(*) AS n_vertices, CAST(sum(deg.deg) AS BIGINT) AS deg_sum
       |  FROM deg JOIN lbl ON lbl.v = deg.v GROUP BY lbl.label),
       |intra AS (
       |  SELECT ls.label, count(*) AS intra_edges
       |  FROM e JOIN lbl ls ON ls.v = e.src JOIN lbl ld ON ld.v = e.dst
       |  WHERE ls.label = ld.label GROUP BY ls.label)
       |SELECT bl.label, bl.n_vertices,
       |       coalesce(intra.intra_edges, 0) AS intra_edges, bl.deg_sum,
       |       round(coalesce(intra.intra_edges, 0) / m.m
       |             - pow(bl.deg_sum / (2 * m.m), 2), 6) + 0.0 AS q_contrib
       |FROM bl CROSS JOIN m LEFT JOIN intra ON intra.label = bl.label""".stripMargin

  /** Twin of [[graft.LabelProp.runWeighted]]: neighbor votes weighted by the
    * co-occurrence multiplicity, same (weight desc, label asc) tie-break. */
  def lpaWeightedFixed(iters: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH ").append(edgesCte).append(",\n")
    sb.append(
      """we AS (
        |  SELECT least(cur, prev) AS src, greatest(cur, prev) AS dst, count(*) AS wt
        |  FROM lagd WHERE prev IS NOT NULL AND prev <> cur
        |  GROUP BY 1, 2),
        |wud AS (SELECT src AS u, dst AS t, wt FROM we UNION ALL SELECT dst AS u, src AS t, wt FROM we),
        |wl0 AS (SELECT DISTINCT u AS v, u AS label FROM wud)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
        |wc$i AS (
        |  SELECT wud.t AS v, wl${i - 1}.label AS lbl, sum(wud.wt) AS n
        |  FROM wud JOIN wl${i - 1} ON wl${i - 1}.v = wud.u
        |  GROUP BY wud.t, wl${i - 1}.label),
        |wl$i AS (
        |  SELECT v, lbl AS label FROM (
        |    SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY n DESC, lbl ASC) AS rn
        |    FROM wc$i) t
        |  WHERE rn = 1)""".stripMargin)
    }
    sb.append(s"\nSELECT v, label FROM wl$iters")
    sb.toString
  }

  /** Twin of the `q3_join` star-join query (same rounding as [[q1Agg]]). */
  val q3Join: String =
    """SELECT n_name,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON n_nationkey = c_nationkey
      |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
      |GROUP BY n_name""".stripMargin

  val q1Agg: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 4) AS sum_qty,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ===== documents / embeddings (training-data-pipeline operators) =============

  val tokenCount: String =
    """SELECT doc_id,
      |       CAST(len(list_filter(string_split("text", ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      |FROM documents""".stripMargin

  val tokenCountBpe: String =
    s"""SELECT doc_id,
       |       CAST(len(regexp_extract_all(lower("text"), '${graft.docs.TextOps.bpePattern}')) AS BIGINT) AS n_bpe_tokens
       |FROM documents""".stripMargin

  private def duckMarkerCount(padded: String, m: String): String =
    s"(length($padded) - length(replace($padded, '$m', ''))) / ${m.length}"

  /** Generated from the SAME marker table as the Spark side
    * ([[graft.docs.TextOps.langMarkers]]) — no drift possible. */
  val langId: String = {
    val perLang = graft.docs.TextOps.langMarkers.map { case (lang, markers) =>
      val score = markers.map(m => duckMarkerCount("p", m)).mkString(" + ")
      s"SELECT doc_id, '$lang' AS lang_pred, $score AS score FROM padded"
    }.mkString("\nUNION ALL\n")
    s"""WITH padded AS (SELECT doc_id, ' ' || lower("text") || ' ' AS p FROM documents),
       |scores AS (
       |$perLang)
       |SELECT doc_id, lang_pred, score FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang_pred ASC) AS rn
       |  FROM scores) t
       |WHERE rn = 1""".stripMargin
  }

  val qualityScore: String = {
    val stops = Seq(" the ", " and ", " of ").map(m => duckMarkerCount("p", m)).mkString(" + ")
    s"""WITH base AS (
       |  SELECT doc_id, "text" AS t, ' ' || lower("text") || ' ' AS p FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         CAST(length(t) AS BIGINT) AS n_chars,
       |         CAST(len(list_filter(string_split(t, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
       |         length(regexp_replace(lower(t), '[^a-z]', '', 'g')) / greatest(length(t), 1) AS alpha_ratio,
       |         $stops AS stops
       |  FROM base)
       |SELECT doc_id, n_chars, n_tokens,
       |       round(0.4 * alpha_ratio + 0.3 * least(n_tokens / 50.0, 1.0)
       |             + 0.3 * least(stops / 10.0, 1.0), 4) AS quality
       |FROM m""".stripMargin
  }

  val docFingerprint: String =
    """SELECT doc_id,
      |       CASE WHEN length("text") = 0 THEN 0
      |            ELSE list_reduce(
      |              list_prepend(0::BIGINT, [CAST(unicode(c) AS BIGINT) for c in string_split("text", '')]),
      |              (acc, x) -> (acc * 31 + x) % 1000000007)
      |       END AS fp
      |FROM documents""".stripMargin

  val dedupExact: String =
    """WITH n AS (
      |  SELECT doc_id, trim(regexp_replace(lower("text"), '\s+', ' ', 'g')) AS norm
      |  FROM documents)
      |SELECT doc_id,
      |       min(doc_id) OVER (PARTITION BY norm) AS canonical_id,
      |       doc_id <> min(doc_id) OVER (PARTITION BY norm) AS is_dup
      |FROM n""".stripMargin

  def ngramJaccardPairs(k: Int, threshold: Double): String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, substr("text", u, $k) AS sh
       |  FROM (SELECT doc_id, "text", unnest(range(1, length("text") - ${k - 2})) AS u
       |        FROM documents WHERE length("text") >= $k)),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
       |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |jac AS (
       |  SELECT a, b, round(i / (sa.n + sb.n - i), 6) AS jac
       |  FROM inter
       |  JOIN sz sa ON sa.doc_id = a
       |  JOIN sz sb ON sb.doc_id = b)
       |SELECT a, b, jac FROM jac WHERE jac >= $threshold""".stripMargin

  /** Twin of [[graft.docs.Dedup.minhashLshPairs]] — the FULL banded pipeline
    * (portable 60-bit shingle hashes → per-doc sets → permutation-min
    * signatures → rolling band hashes → bucket candidates → exact hash-set
    * Jaccard verify). The permutation offsets b_i come from the SAME driver
    * literal table the Spark side ships ([[graft.docs.Dedup.minhashOffsets]])
    * — one source of truth, no drift possible. Candidate pairs with zero
    * common hash drop out of the inner `inter` join; the Spark side computes
    * jac = 0 for them and the threshold filters — identical rows. */
  /** Shared shingle-hash CTE bodies (no WITH): `shing(doc_id, sh)` distinct
    * k-char shingles, `hx(doc_id, x)` the portable 60-bit rolling double hash —
    * the DuckDB twin of [[graft.docs.Dedup.shingleHashes]], shared by every
    * shingle-consuming oracle (MinHash, cluster dedup, contamination) so the
    * hash definition has exactly one SQL rendering. NOTE `hx`'s DISTINCT is
    * over (doc_id, x) — the HASH, not the shingle string — deliberately: the
    * engine's per-doc sets are sets of hashes, so two shingles colliding to
    * one hash count once on BOTH sides (bit-exact parity even under a
    * ~2^-60-probability collision). */
  def shingleHashCtes(k: Int): String =
    s"""shing AS (
       |  SELECT DISTINCT doc_id, substr("text", u, $k) AS sh
       |  FROM (SELECT doc_id, "text", unnest(range(1, length("text") - ${k - 2})) AS u
       |        FROM documents WHERE length("text") >= $k)),
       |hx AS (
       |  SELECT DISTINCT doc_id,
       |         list_reduce(list_prepend(0::BIGINT, cs), (a, c) -> (a * 31 + c) % 1000000007) * 1000000009
       |         + list_reduce(list_prepend(0::BIGINT, cs), (a, c) -> (a * 131 + c) % 1000000009) AS x
       |  FROM (SELECT doc_id, [CAST(unicode(c) AS BIGINT) for c in string_split(sh, '')] AS cs
       |        FROM shing))""".stripMargin

  def minhashLshPairs(k: Int, perms: Int, bands: Int, threshold: Double): String = {
    val rows = perms / bands
    val bs = graft.docs.Dedup.minhashOffsets(perms).mkString("[", ", ", "]")
    s"""WITH ${shingleHashCtes(k)},
       |sets AS (SELECT doc_id, list(x) AS xs, count(*) AS n FROM hx GROUP BY doc_id),
       |bsl AS (SELECT $bs::BIGINT[] AS bs),
       |sig AS (
       |  SELECT doc_id,
       |         list_transform(range(0, $perms), i ->
       |           list_min(list_transform(xs, x ->
       |             ((x % 1000000007) * (2 * i + 1) + bs[i + 1]) % 1000000007))) AS sig
       |  FROM sets, bsl),
       |banded AS (
       |  SELECT doc_id, band,
       |         list_reduce(
       |           list_prepend(CAST(band AS BIGINT),
       |             list_transform(range(0, $rows), r -> sig[band * $rows + r + 1])),
       |           (a, s) -> (a * 1000003 + s) % 1000000007) AS bh
       |  FROM sig, (SELECT unnest(range(0, $bands)) AS band) b),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM banded x JOIN banded y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
       |  FROM hx x JOIN hx y ON x.x = y.x AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT c.a, c.b, round(i.i / (sa.n + sb.n - i.i), 6) AS jac
       |FROM cand c
       |JOIN inter i ON i.a = c.a AND i.b = c.b
       |JOIN sets sa ON sa.doc_id = c.a
       |JOIN sets sb ON sb.doc_id = c.b
       |WHERE round(i.i / (sa.n + sb.n - i.i), 6) >= $threshold""".stripMargin
  }

  /** Scale-path twin of [[dedupClusterCanonical]]: transitive closure over the
    * [[minhashLshPairs]] edge set (embedded as a MATERIALIZED subquery — one
    * source of truth, evaluated once), min doc_id per cluster, singletons map
    * to themselves. The closure is `rounds` UNROLLED min-label propagation
    * steps (l ← min(l, min over neighbors)) rather than a recursive CTE —
    * DuckDB's recursive union spilled at sf0.1 (round-4 verdict #4), while the
    * bounded form is a fixed join pipeline. Correct as long as `rounds` covers
    * every cluster's min-vertex eccentricity; near-dup clusters are
    * template-duplicate near-cliques with tiny diameters, and DocsSpec asserts
    * round `rounds` is a fixpoint (== exact Components closure) at BOTH
    * sf0.01 and sf0.1, so the budget is pinned, not assumed. */
  def dedupClusterCanonicalLsh(
      k: Int, perms: Int, bands: Int, threshold: Double, rounds: Int = 8): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH p AS MATERIALIZED (${minhashLshPairs(k, perms, bands, threshold)}),
         |pud AS MATERIALIZED (
         |  SELECT a AS u, b AS w FROM p UNION ALL SELECT b AS u, a AS w FROM p),
         |l0 AS (SELECT u AS v, u AS l FROM (SELECT DISTINCT u FROM pud))""".stripMargin)
    for (r <- 0 to rounds) {
      // each round references the previous one TWICE — MATERIALIZED is load-
      // bearing (plain CTEs inline, doubling the plan per round: 2^rounds
      // copies by round 8, the very spill this form exists to remove).
      // One round PAST the budget (l${rounds+1}) exists only for the guard.
      sb.append(s""",
        |l${r + 1} AS MATERIALIZED (
        |  SELECT v, min(l) AS l FROM (
        |    SELECT v, l FROM l$r
        |    UNION ALL
        |    SELECT pud.w AS v, l$r.l FROM l$r JOIN pud ON pud.u = l$r.v)
        |  GROUP BY v)""".stripMargin)
    }
    // Budget guard (round-5 advice): the `rounds` budget is pinned empirically;
    // a future corpus with an LSH cluster of min-vertex eccentricity > rounds
    // would make the oracle itself under-merge and misattribute the mismatch to
    // the engine. One extra unrolled round + this fixpoint check turns that
    // into a LOUD 'oracle budget exceeded' error instead of an engine diff.
    sb.append(s""",
       |budget_guard AS (
       |  SELECT CASE WHEN (SELECT count(*) FROM l$rounds a
       |                    JOIN l${rounds + 1} b ON a.v = b.v AND a.l <> b.l) = 0
       |         THEN 1
       |         ELSE error('oracle min-label budget exceeded: $rounds rounds is not a fixpoint')
       |         END AS ok)""".stripMargin)
    sb.append(s"""
       |SELECT d.doc_id, coalesce(m.l, d.doc_id) AS canonical_id
       |FROM documents d CROSS JOIN budget_guard g
       |LEFT JOIN l$rounds m ON m.v = d.doc_id
       |WHERE g.ok = 1""".stripMargin)
    sb.toString
  }

  /** Per-document 64-bit SimHash CTE — twin of [[graft.docs.Dedup.simhash]] (same
    * rolling token hash and affine per-bit re-mix). Bit 63 cannot be built as
    * `1 << 63` in DuckDB (bigint overflow error); it is added as the signed
    * two's-complement offset instead. */
  val simhashCte: String = {
    def vote(i: String) =
      s"""coalesce(list_sum(list_transform(rs, r ->
         |             CASE WHEN ((r * (2 * $i + 1) + ($i * 2654435761) % 1000000007)
         |                        % 1000000007) % 2 = 1 THEN 1 ELSE -1 END)), 0)""".stripMargin
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split(lower("text"), ' '), x -> x <> '') AS ts
       |  FROM documents),
       |rsl AS (
       |  SELECT doc_id, list_transform(ts, t ->
       |    list_reduce(
       |      list_prepend(0::BIGINT, [CAST(unicode(c) AS BIGINT) for c in string_split(t, '')]),
       |      (acc, x) -> (acc * 31 + x) % 1000000007)) AS rs
       |  FROM toks),
       |sh AS (
       |  SELECT doc_id,
       |         CAST(coalesce(list_sum(list_transform(range(0, 63), i ->
       |           CASE WHEN ${vote("i")} > 0
       |                THEN (1::BIGINT << i) ELSE 0::BIGINT END)), 0) AS BIGINT)
       |         + CASE WHEN ${vote("63")} > 0
       |                THEN -9223372036854775807 - 1 ELSE 0 END AS simhash
       |  FROM rsl)""".stripMargin
  }

  val simhash64: String = s"WITH $simhashCte SELECT doc_id, simhash FROM sh"

  /** Brute-force pair form at oracle scale; the engine reaches the identical row
    * set through pigeonhole banding ([[graft.docs.Dedup.simhashNearDupPairs]]). */
  def simhashNearDupPairs(maxHamming: Int): String =
    s"""WITH $simhashCte
       |SELECT a.doc_id AS a, b.doc_id AS b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin

  /** Twin of the transcripts→edges ingest path over the deterministic
    * documents-derived transcripts table ([[graft.Transcripts.fromDocuments]]):
    * participant co-occurrence within a conversation, participant ids via the
    * portable rolling hash ([[graft.Ingest.participantIdPortable]]). */
  val transcriptEdges: String =
    """WITH t AS (
      |  SELECT 'conv-' || CAST(doc_id % 40 AS VARCHAR) AS conv_id,
      |         'role-' || CAST(CAST(floor(doc_id / 40) AS BIGINT) % 5 AS VARCHAR) AS role,
      |         CASE WHEN doc_id % 3 = 0 THEN
      |           'tool-' || CAST(((doc_id % 1000003) * 2654435761) % 1000000007 % 13 AS VARCHAR)
      |         END AS tool
      |  FROM documents),
      |parts AS (
      |  SELECT DISTINCT conv_id, role AS p FROM t
      |  UNION
      |  SELECT DISTINCT conv_id, tool AS p FROM t WHERE tool IS NOT NULL),
      |ids AS (
      |  SELECT DISTINCT conv_id,
      |         list_reduce(list_prepend(0::BIGINT,
      |           [CAST(unicode(c) AS BIGINT) for c in string_split(p, '')]),
      |           (acc, x) -> (acc * 31 + x) % 1000000007) AS pid
      |  FROM parts)
      |SELECT DISTINCT a.pid AS src, b.pid AS dst
      |FROM ids a JOIN ids b ON a.conv_id = b.conv_id AND a.pid < b.pid""".stripMargin

  /** Twin of [[graft.Ingest.conversationStats]] over
    * [[graft.Transcripts.fromDocuments]] (same derivation CTE family as
    * [[transcriptEdges]]; ts = 1704067200 + doc_id seconds, integral). */
  val conversationStats: String =
    """WITH t AS (
      |  SELECT 'conv-' || CAST(doc_id % 40 AS VARCHAR) AS conv_id,
      |         'role-' || CAST(CAST(floor(doc_id / 40) AS BIGINT) % 5 AS VARCHAR) AS role,
      |         CASE WHEN doc_id % 3 = 0 THEN
      |           'tool-' || CAST(((doc_id % 1000003) * 2654435761) % 1000000007 % 13 AS VARCHAR)
      |         END AS tool,
      |         "text",
      |         1704067200 + doc_id AS ts_s
      |  FROM documents)
      |SELECT conv_id, count(*) AS n_turns,
      |       count(DISTINCT role) AS n_roles,
      |       count(DISTINCT tool) AS n_tools,
      |       max(ts_s) - min(ts_s) AS span_s,
      |       CAST(sum(length("text")) AS BIGINT) AS n_chars
      |FROM t GROUP BY conv_id""".stripMargin

  /** Twin of the near-dup clustering query: transitive closure over the
    * [[ngramJaccardPairs]] edge set (embedded as a subquery — one source of
    * truth), min doc_id per cluster, singletons map to themselves. */
  def dedupClusterCanonical(k: Int, threshold: Double): String =
    s"""WITH RECURSIVE p AS (SELECT * FROM (${ngramJaccardPairs(k, threshold)}) t),
       |ud AS (SELECT a AS u, b AS w FROM p UNION ALL SELECT b AS u, a AS w FROM p),
       |r(v, l) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM ud)
       |  UNION
       |  SELECT ud.w, r.l FROM r JOIN ud ON ud.u = r.v),
       |m AS (SELECT v, min(l) AS c FROM r GROUP BY v)
       |SELECT d.doc_id, coalesce(m.c, d.doc_id) AS canonical_id
       |FROM documents d LEFT JOIN m ON m.v = d.doc_id""".stripMargin

  /** Twin of [[graft.docs.Curation.stratifiedSample]]: the deterministic
    * per-stratum keep decision over the [[langId]] oracle (embedded — one
    * source of truth), same affine hash arithmetic. */
  def stratifiedSample(rates: Seq[(String, Int)], defaultRate: Int): String = {
    val rateCase = rates.foldRight(defaultRate.toString) { case ((lang, r), acc) =>
      s"CASE WHEN lang_pred = '$lang' THEN $r ELSE $acc END"
    }
    s"""WITH l AS ($langId)
       |SELECT doc_id, lang_pred,
       |       ((((doc_id % 1000000007) + 1000000007) % 1000000007) * 2654435761)
       |         % 1000000007 % 100 < ($rateCase) AS keep
       |FROM l""".stripMargin
  }

  /** Twin of [[graft.docs.Curation.tokenPackShards]]: greedy prefix-sum packing
    * over the [[langId]] + [[tokenCount]] oracles. */
  def tokenPackShards(budget: Long): String =
    s"""WITH l AS ($langId), t AS ($tokenCount)
       |SELECT l.doc_id, l.lang_pred, t.n_tokens,
       |       CAST(floor(CAST(coalesce(sum(t.n_tokens) OVER (
       |         PARTITION BY l.lang_pred ORDER BY l.doc_id
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |         / $budget.0) AS BIGINT) AS shard
       |FROM l JOIN t ON t.doc_id = l.doc_id""".stripMargin

  /** Local clustering coefficient per vertex: 2·T(v) / (d(v)·(d(v)−1)). */
  val clusteringCoeff: String =
    s"""WITH $graphCtes,
       |tri AS (
       |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |  FROM e e1
       |  JOIN e e2 ON e2.src = e1.dst
       |  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
       |corners AS (
       |  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
       |cnt AS (SELECT v, count(*) AS n FROM corners GROUP BY v)
       |SELECT verts.v AS v, deg.deg AS deg, coalesce(cnt.n, 0) AS tri_cnt,
       |       round(CASE WHEN deg.deg >= 2
       |                  THEN 2.0 * coalesce(cnt.n, 0) / (deg.deg * (deg.deg - 1))
       |                  ELSE 0.0 END, 6) AS lcc
       |FROM verts
       |JOIN deg ON deg.v = verts.v
       |LEFT JOIN cnt ON cnt.v = verts.v""".stripMargin

  val degreeHistogram: String =
    s"WITH $graphCtes SELECT deg, count(*) AS n_vertices FROM deg GROUP BY deg"

  /** Twin of [[graft.Ingest.sessionize]]: integer-microsecond gap compare. */
  def sessionize(gapSeconds: Long): String =
    s"""WITH lagd AS (
       |  SELECT event_id, user_id, ts,
       |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |  FROM events)
       |SELECT event_id, user_id,
       |       CAST(sum(CASE WHEN prev_us IS NULL
       |                       OR epoch_us(ts) - prev_us > ${gapSeconds * 1000000L}
       |                     THEN 1 ELSE 0 END)
       |         OVER (PARTITION BY user_id ORDER BY ts, event_id
       |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |FROM lagd""".stripMargin

  /** Twin of [[graft.docs.TextOps.repetitionRatio]]: duplicate word n-gram
    * fraction via scalar list ops (generate_series in scalar context is a
    * list in DuckDB). */
  def repetitionRatio(n: Int): String = {
    val gram = (0 until n).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |         CASE WHEN len(toks) >= $n
       |              THEN list_transform(generate_series(1, len(toks) - ${n - 1}),
       |                                  i -> $gram)
       |              ELSE []::VARCHAR[] END AS grams
       |  FROM t)
       |SELECT doc_id,
       |       CAST(len(grams) AS BIGINT) AS n_grams,
       |       CAST(len(list_distinct(grams)) AS BIGINT) AS n_unique_grams,
       |       CASE WHEN len(grams) > 0
       |            THEN round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
       |            ELSE 0.0 END AS rep_ratio
       |FROM g""".stripMargin
  }

  /** Twin of [[graft.docs.TextOps.piiScrub]] — same three RE2/Java-portable
    * patterns, same replacement order (emails, phones, then IPs). */
  val piiScrub: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
    val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    s"""SELECT doc_id,
       |       CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phones,
       |       CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
       |       regexp_replace(
       |         regexp_replace(
       |           regexp_replace(text, '$email', '<EMAIL>', 'g'),
       |           '$phone', '<PHONE>', 'g'),
       |         '$ip', '<IP>', 'g') AS redacted
       |FROM documents""".stripMargin
  }

  /** Twin of the STREAMING sessionization contract replayed in batch
    * ([[graft.streaming.StreamingIngest.sessionizeEvents]] via Spark's native
    * `session_window`): one row per session with start = first event,
    * end = last event + gap. NOTE the boundary semantics deliberately mirror
    * `session_window`, which starts a NEW session when the inter-event gap is
    * `>= gap` (windows [ts, ts+gap) merge only on strict overlap) — whereas
    * [[sessionize]]'s lag rule keeps the session at exactly-gap (`> gap`
    * splits). Both are documented contracts; the oracle pins each. */
  def sessionWindowAgg(gapSeconds: Long): String = {
    val gapUs = gapSeconds * 1000000L
    s"""WITH lagd AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS us,
       |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |  FROM events),
       |s AS (
       |  SELECT user_id, us,
       |         CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us >= $gapUs
       |                       THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY user_id ORDER BY us, event_id
       |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
       |  FROM lagd)
       |SELECT user_id, min(us) AS start_us, max(us) + $gapUs AS end_us,
       |       count(*) AS n_events
       |FROM s GROUP BY user_id, sess""".stripMargin
  }

  /** Global clustering coefficient (transitivity): 3·T / Σ C(deg, 2). */
  val transitivity: String =
    s"""WITH $graphCtes,
       |t AS (
       |  SELECT count(*) AS triangles
       |  FROM e e1
       |  JOIN e e2 ON e2.src = e1.dst
       |  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
       |w AS (SELECT CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS wedges FROM deg)
       |SELECT CASE WHEN w.wedges > 0 THEN round(3.0 * t.triangles / w.wedges, 6)
       |            ELSE 0.0 END AS transitivity,
       |       t.triangles, w.wedges
       |FROM t, w""".stripMargin

  /** End-to-end cleaning-pipeline stats: composes the [[dedupExact]],
    * [[qualityScore]] and [[langId]] oracles as subqueries (one source of truth
    * per stage — no duplicated SQL to drift). */
  val corpusCleanStats: String =
    s"""WITH dd AS ($dedupExact),
       |qq AS ($qualityScore),
       |ll AS ($langId)
       |SELECT ll.lang_pred,
       |       count(*) AS n_docs,
       |       CAST(sum(qq.n_tokens) AS BIGINT) AS total_tokens,
       |       round(sum(qq.quality), 4) AS sum_quality
       |FROM dd
       |JOIN qq ON qq.doc_id = dd.doc_id
       |JOIN ll ON ll.doc_id = dd.doc_id
       |WHERE NOT dd.is_dup AND qq.quality >= 0.5
       |GROUP BY ll.lang_pred""".stripMargin

  /** CSR offsets (exclusive prefix sum of oriented out-degree in vertex order) and
    * edge-count-balanced block of `k` splits — get_split_v2 semantics. The engine
    * computes the same numbers with a two-level distributed scan; the oracle's
    * single sequential window is the semantic definition. */
  def csrBlocks(k: Int): String =
    s"""WITH $orientedCte,
       |adj AS (SELECT src AS v, count(*) AS deg FROM oriented GROUP BY src),
       |tot AS (SELECT CAST(sum(deg) AS BIGINT) AS total FROM adj),
       |off AS (
       |  SELECT v, deg,
       |         CAST(sum(deg) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - deg AS BIGINT) AS off
       |  FROM adj)
       |SELECT off.v AS v, off.deg AS deg, off.off AS off,
       |       CAST(floor(off.off * $k / tot.total) AS BIGINT) AS block
       |FROM off, tot""".stripMargin

  def embedNearDupPairs(threshold: Double): String =
    s"""WITH n AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |  WHERE sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0)
       |SELECT a.vec_id AS a, b.vec_id AS b,
       |       round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS score
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) >= $threshold""".stripMargin

  /** Twin of the multimodal feature-extract stub: the synthetic payload is the
    * UTF-8 text bytes, and the driver's documents are pure ASCII, so byte values
    * equal `unicode(c)` per character — same trick as [[docFingerprint]]. */
  val multimodalFeatures: String = {
    val fCols = (0 until 8).map { i =>
      s"round(coalesce(len(list_filter(cs, x -> x % 8 = $i)), 0) / greatest(n_bytes, 1), 6) AS f$i"
    }.mkString(",\n       ")
    s"""WITH b AS (
       |  SELECT doc_id,
       |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
       |              WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
       |         CAST(octet_length(encode("text")) AS BIGINT) AS n_bytes,
       |         [CAST(unicode(c) AS BIGINT) for c in string_split("text", '')] AS cs
       |  FROM documents)
       |SELECT doc_id, mime, n_bytes,
       |       CASE WHEN n_bytes = 0 THEN 0
       |            ELSE list_reduce(list_prepend(0::BIGINT, cs),
       |                             (acc, x) -> (acc * 31 + x) % 1000000007)
       |       END AS checksum,
       |       $fCols
       |FROM b""".stripMargin
  }

  /** Twin of [[graft.docs.Multimodal.frameSample]] restricted to frame *lengths*
    * (the binary frame itself is length-checked, not value-checked — its bytes are
    * a substring of the payload by construction). */
  def frameSample(n: Int): String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
       |              WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
       |         CAST(octet_length(encode("text")) AS BIGINT) AS len
       |  FROM documents),
       |f AS (SELECT doc_id, mime, len,
       |             greatest(CAST(floor(len / $n) AS BIGINT), 1) AS flen FROM m)
       |SELECT doc_id, mime, CAST(u AS BIGINT) AS frame_idx,
       |       CAST(greatest(least(flen, len - flen * u), 0) AS BIGINT) AS frame_bytes
       |FROM f, unnest(range(0, $n)) AS t(u)""".stripMargin

  /** Twin of [[graft.docs.Similarity.lshCosineTopK]]: the hyperplane matrix is the
    * SAME ±1 literal table the Spark side ships (generated from one source,
    * [[graft.expr.HyperplaneBands.planeSign]] — no drift possible), and both engines
    * fold the projection sequentially from 0.0, so the bucket bits are
    * bit-identical. */
  def embedLshTopK(dim: Int, k: Int, queryMod: Int, planes: Int): String = {
    val h = (0 until planes).flatMap(b => (0 until dim).map(j =>
      graft.expr.HyperplaneBands.planeSign(b, j))).mkString("[", ", ", "]")
    s"""WITH m AS (SELECT $h::DOUBLE[] AS h),
       |n AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |  WHERE sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0),
       |sig AS (
       |  SELECT vec_id, emb, nrm,
       |         CAST(list_reduce(list_prepend(0::BIGINT, list_transform(range(0, $planes), b ->
       |           CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0, $dim), j ->
       |                  emb[j + 1] * m.h[b * $dim + j + 1])), (a, x) -> a + x) >= 0
       |                THEN (1::BIGINT << b) ELSE 0::BIGINT END)), (a, x) -> a + x) AS BIGINT) AS bucket
       |  FROM n, m),
       |q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn, bucket
       |      FROM sig WHERE vec_id % $queryMod = 0),
       |s AS (
       |  SELECT q.q_id, sig.vec_id AS nbr_id,
       |         round(list_dot_product(q.qe, sig.emb) / (q.qn * sig.nrm), 6) AS score
       |  FROM q JOIN sig ON sig.bucket = q.bucket AND sig.vec_id <> q.q_id),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, nbr_id ASC) AS rnk
       |  FROM s)
       |SELECT q_id, nbr_id, score, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= $k""".stripMargin
  }

  /** Twin of [[graft.docs.Similarity.lshNearDupPairs]] — full banded pipeline
    * (candidates from any shared (band, bucket), exact cosine verify), same
    * literal ±1 plane matrix as the engine. */
  def embedLshNearDupPairs(dim: Int, threshold: Double, planes: Int, bands: Int): String = {
    val h = (0 until bands * planes).flatMap(b => (0 until dim).map(j =>
      graft.expr.HyperplaneBands.planeSign(b, j))).mkString("[", ", ", "]")
    s"""WITH m AS (SELECT $h::DOUBLE[] AS h),
       |n AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |  WHERE sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0),
       |banded AS (
       |  SELECT vec_id, band,
       |         CAST(list_reduce(list_prepend(0::BIGINT, list_transform(range(0, $planes), p ->
       |           CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0, $dim), j ->
       |                  emb[j + 1] * m.h[(band * $planes + p) * $dim + j + 1])), (a, x) -> a + x) >= 0
       |                THEN (1::BIGINT << p) ELSE 0::BIGINT END)), (a, x) -> a + x) AS BIGINT) AS bv
       |  FROM n, m, (SELECT unnest(range(0, $bands)) AS band) b),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.bv = y.bv AND x.vec_id < y.vec_id)
       |SELECT cand.a, cand.b,
       |       round(list_dot_product(na.emb, nb.emb) / (na.nrm * nb.nrm), 6) AS score
       |FROM cand
       |JOIN n na ON na.vec_id = cand.a
       |JOIN n nb ON nb.vec_id = cand.b
       |WHERE round(list_dot_product(na.emb, nb.emb) / (na.nrm * nb.nrm), 6) >= $threshold""".stripMargin
  }

  /** Twin of the embedding-space cluster dedup: transitive closure over the
    * [[embedLshNearDupPairs]] edge set (embedded as a subquery — one source of
    * truth), min vec_id per cluster, singletons map to themselves. */
  def embedClusterCanonical(dim: Int, threshold: Double, planes: Int, bands: Int): String =
    s"""WITH RECURSIVE p AS (SELECT * FROM (${embedLshNearDupPairs(dim, threshold, planes, bands)}) t),
       |ud AS (SELECT a AS u, b AS w FROM p UNION ALL SELECT b AS u, a AS w FROM p),
       |r(v, l) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM ud)
       |  UNION
       |  SELECT ud.w, r.l FROM r JOIN ud ON ud.u = r.v),
       |m AS (SELECT v, min(l) AS c FROM r GROUP BY v)
       |SELECT e.vec_id, coalesce(m.c, e.vec_id) AS canonical_id
       |FROM embeddings e LEFT JOIN m ON m.v = e.vec_id""".stripMargin

  /** Twin of [[graft.docs.Similarity.ivfCosineTopK]]. The centroid assignment
    * compares UNROUNDED cosines, so every float op mirrors the Spark side's
    * sequential folds bit-for-bit (list_reduce over list_transform = the same
    * IEEE add sequence as Spark's aggregate fold) — argmax ties then break on
    * centroid id in both engines. */
  def embedIvfTopK(dim: Int, k: Int, queryMod: Int, centMod: Int, nProbe: Int): String = {
    def dotseq(a: String, b: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0, $dim), j -> $a[j + 1] * $b[j + 1])), (s, x) -> s + x)"
    s"""WITH n0 AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb,
       |         sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |           list_transform(embedding::DOUBLE[], x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM embeddings),
       |n AS (SELECT * FROM n0 WHERE nrm > 0),
       |cents AS (SELECT vec_id AS c_id, emb AS ce, nrm AS cn FROM n WHERE vec_id % $centMod = 0),
       |assigned AS (
       |  SELECT vec_id, emb, nrm, c_id FROM (
       |    SELECT n.vec_id, n.emb, n.nrm, c.c_id,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${dotseq("n.emb", "c.ce")} / (n.nrm * c.cn) DESC, c.c_id ASC) AS rn
       |    FROM n, cents c) t
       |  WHERE rn = 1),
       |probed AS (
       |  SELECT q_id, qe, qn, c_id FROM (
       |    SELECT n.vec_id AS q_id, n.emb AS qe, n.nrm AS qn, c.c_id,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${dotseq("n.emb", "c.ce")} / (n.nrm * c.cn) DESC, c.c_id ASC) AS rn
       |    FROM n, cents c WHERE n.vec_id % $queryMod = 0) t
       |  WHERE rn <= $nProbe),
       |s AS (
       |  SELECT probed.q_id, assigned.vec_id AS nbr_id,
       |         round(${dotseq("probed.qe", "assigned.emb")} / (probed.qn * assigned.nrm), 6) AS score
       |  FROM probed JOIN assigned
       |    ON assigned.c_id = probed.c_id AND assigned.vec_id <> probed.q_id),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, nbr_id ASC) AS rnk
       |  FROM s)
       |SELECT q_id, nbr_id, score, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= $k""".stripMargin
  }

  def embedCosineTopK(k: Int, queryMod: Int): String =
    s"""WITH n AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |  WHERE sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0),
       |q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn FROM n WHERE vec_id % $queryMod = 0),
       |s AS (
       |  SELECT q.q_id, n.vec_id AS nbr_id,
       |         round(list_dot_product(q.qe, n.emb) / (q.qn * n.nrm), 6) AS score
       |  FROM q JOIN n ON n.vec_id <> q.q_id),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, nbr_id ASC) AS rnk
       |  FROM s)
       |SELECT q_id, nbr_id, score, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= $k""".stripMargin

  /** Day-keyed edge CTE — twin of [[graft.Ingest.edgesFromEventsDaily]] (lag
    * streams reset at day boundaries). Shared by [[trianglesDaily]] and
    * [[edgeDriftDaily]] so the two cannot drift on edge semantics. */
  val dailyEdgesCte: String =
    """lagd AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id AS cur,
      |         lag(user_id) OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |                            ORDER BY ts, event_id) AS prev
      |  FROM events),
      |de AS (
      |  SELECT DISTINCT day, least(cur, prev) AS src, greatest(cur, prev) AS dst
      |  FROM lagd WHERE prev IS NOT NULL AND prev <> cur)""".stripMargin

  /** Twin of [[graft.Ingest.edgesFromEventsDaily]] itself. */
  val edgesDaily: String = s"WITH $dailyEdgesCte SELECT day, src, dst FROM de"

  /** Twin of [[graft.TriangleCount.globalPerKey]] over the daily edges:
    * per-day 3-way join, zero rows kept. */
  val trianglesDaily: String =
    s"""WITH $dailyEdgesCte,
      |cnt AS (
      |  SELECT e1.day, count(*) AS t
      |  FROM de e1
      |  JOIN de e2 ON e2.day = e1.day AND e2.src = e1.dst
      |  JOIN de e3 ON e3.day = e1.day AND e3.src = e1.src AND e3.dst = e2.dst
      |  GROUP BY e1.day)
      |SELECT d.day, coalesce(cnt.t, 0) AS triangles
      |FROM (SELECT DISTINCT day FROM de) d
      |LEFT JOIN cnt ON cnt.day = d.day""".stripMargin

  /** Twin of [[graft.Temporal.edgeDriftDaily]]: day-over-day edge-set Jaccard. */
  val edgeDriftDaily: String =
    s"""WITH $dailyEdgesCte,
      |sz AS (SELECT day, count(*) AS n FROM de GROUP BY day),
      |iv AS (
      |  SELECT a.day, count(*) AS common
      |  FROM de a JOIN de b ON b.day = a.day + 1 AND b.src = a.src AND b.dst = a.dst
      |  GROUP BY a.day)
      |SELECT a.day, b.day AS next_day, a.n AS edges, b.n AS next_edges,
      |       coalesce(iv.common, 0) AS common,
      |       round(coalesce(iv.common, 0) /
      |             CAST(a.n + b.n - coalesce(iv.common, 0) AS DOUBLE), 6) AS jaccard
      |FROM sz a
      |JOIN sz b ON b.day = a.day + 1
      |LEFT JOIN iv ON iv.day = a.day""".stripMargin

  /** Twin of [[graft.Components.runKeyed]] over the daily edges: exact min-id
    * component labels per day via day-keyed transitive closure (the engine
    * converges all days inside one shared large/small-star loop instead). */
  val componentsDaily: String =
    s"""WITH RECURSIVE $dailyEdgesCte,
       |dud AS (SELECT day, src AS u, dst AS w FROM de
       |        UNION ALL SELECT day, dst AS u, src AS w FROM de),
       |dverts AS (SELECT DISTINCT day, u AS v FROM dud),
       |r(day, v, l) AS (
       |  SELECT day, v, v FROM dverts
       |  UNION
       |  SELECT dud.day, dud.w, r.l FROM r JOIN dud ON dud.day = r.day AND dud.u = r.v)
       |SELECT day, v, min(l) AS component FROM r GROUP BY day, v""".stripMargin

  /** Twin of [[graft.PageRank.fixedIterationsKeyed]] over the daily edges:
    * PageRank unrolled with the day key in every join and group key. */
  def pagerankDaily(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(s"WITH $dailyEdgesCte,\n")
    sb.append(
      """sym AS (SELECT day, src AS u, dst AS w FROM de
        |         UNION ALL SELECT day, dst AS u, src AS w FROM de),
        |verts AS (SELECT DISTINCT day, u AS v FROM sym),
        |dg AS (SELECT day, u, count(*) AS deg FROM sym GROUP BY day, u),
        |n AS (SELECT day, count(*) AS n FROM verts GROUP BY day),
        |r0 AS (SELECT verts.day, verts.v, 1.0 / n.n AS pr
        |       FROM verts JOIN n ON n.day = verts.day)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
        |s$i AS (
        |  SELECT sym.day, sym.w AS v, sum(r.pr / dg.deg) AS s
        |  FROM sym
        |  JOIN r${i - 1} r ON r.day = sym.day AND r.v = sym.u
        |  JOIN dg ON dg.day = sym.day AND dg.u = sym.u
        |  GROUP BY sym.day, sym.w),
        |r$i AS (
        |  SELECT verts.day, verts.v, 0.15 / n.n + 0.85 * coalesce(s.s, 0) AS pr
        |  FROM verts JOIN n ON n.day = verts.day
        |  LEFT JOIN s$i s ON s.day = verts.day AND s.v = verts.v)""".stripMargin)
    }
    sb.append(s"\nSELECT day, v, round(pr, 6) AS pr FROM r$iters")
    sb.toString
  }

  /** Twin of the `degree_percentiles` query: DuckDB's `quantile_cont` uses the
    * same (n−1)·p linear interpolation as Spark's exact `percentile`. */
  def degreePercentiles(ps: Seq[Double]): String = {
    val arr = ps.mkString("[", ", ", "]")
    s"""WITH $graphCtes,
       |q AS (SELECT quantile_cont(deg, $arr) AS qs FROM deg)
       |SELECT ($arr)[t.u + 1] AS p, round(qs[t.u + 1], 6) AS deg_p
       |FROM q, unnest(range(0, ${ps.size})) AS t(u)""".stripMargin
  }

  /** Twin of [[graft.Temporal.userActivityDrift]]. */
  val userActivityDrift: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
      |sz AS (SELECT user_id, day, count(*) AS n FROM ud GROUP BY user_id, day),
      |iv AS (
      |  SELECT a.user_id, a.day, count(*) AS common
      |  FROM ud a JOIN ud b ON b.user_id = a.user_id AND b.day = a.day + 1
      |                     AND b.event_type = a.event_type
      |  GROUP BY a.user_id, a.day)
      |SELECT a.day, b.day AS next_day, a.user_id,
      |       coalesce(iv.common, 0) AS common,
      |       a.n AS n_types, b.n AS next_n_types,
      |       round(coalesce(iv.common, 0) /
      |             CAST(a.n + b.n - coalesce(iv.common, 0) AS DOUBLE), 6) AS jaccard
      |FROM sz a
      |JOIN sz b ON b.user_id = a.user_id AND b.day = a.day + 1
      |LEFT JOIN iv ON iv.user_id = a.user_id AND iv.day = a.day""".stripMargin

  /** Twin of [[graft.Temporal.moversDaily]] over [[pagerankDaily]]: day-over-day
    * top-k rank gainers, same (delta desc, v asc) tie-break. */
  def pagerankMoversDaily(iters: Int, k: Int): String =
    s"""WITH pr AS (${pagerankDaily(iters)}),
       |j AS (
       |  SELECT a.day, b.day AS next_day, a.v, a.pr, b.pr AS pr_next,
       |         round(b.pr - a.pr, 6) + 0.0 AS delta
       |  FROM pr a JOIN pr b ON b.day = a.day + 1 AND b.v = a.v)
       |SELECT day, next_day, v, pr, pr_next, delta, rnk FROM (
       |  SELECT j.*, CAST(row_number() OVER (
       |    PARTITION BY day ORDER BY delta DESC, v ASC) AS BIGINT) AS rnk
       |  FROM j) t WHERE rnk <= $k""".stripMargin

  /** Twin of [[graft.docs.Curation.datasetSplit]]: the same affine re-mix
    * bucket (pmod sign-mirrored), thresholded into train/val/test. */
  def datasetSplit(trainPct: Int, valPct: Int): String =
    s"""WITH l AS ($langId)
       |SELECT doc_id, lang_pred,
       |       CASE WHEN b < $trainPct THEN 'train'
       |            WHEN b < ${trainPct + valPct} THEN 'val'
       |            ELSE 'test' END AS split
       |FROM (SELECT doc_id, lang_pred,
       |        ((((doc_id % 1000000007) + 1000000007) % 1000000007) * 2246822519)
       |          % 1000000007 % 100 AS b
       |      FROM l) t""".stripMargin

  /** Twin of [[graft.docs.TextOps.topTokens]]: per-language top-k vocabulary
    * with the same (count desc, token asc) tie-break. */
  def topTokens(k: Int): String =
    s"""WITH l AS ($langId),
       |tok AS (
       |  SELECT l.lang_pred, unnest(list_filter(string_split(d."text", ' '), x -> x <> '')) AS token
       |  FROM documents d JOIN l ON l.doc_id = d.doc_id),
       |cnt AS (SELECT lang_pred, token, count(*) AS n FROM tok GROUP BY lang_pred, token)
       |SELECT lang_pred, token, n, rnk FROM (
       |  SELECT lang_pred, token, n,
       |    CAST(row_number() OVER (PARTITION BY lang_pred ORDER BY n DESC, token ASC) AS BIGINT) AS rnk
       |  FROM cnt) t WHERE rnk <= $k""".stripMargin

  /** Twin of [[graft.docs.Clustering.kmeansAssign]]: the identical deterministic
    * Lloyd rounds, unrolled. Distances through `list_dot_product` (same
    * left-to-right fold as the codegen DotProduct), centroid means rounded to 7
    * exactly like the engine — the cross-engine determinism contract. */
  def kmeansAssign(k: Int, iters: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH x AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster, x AS c
         |  FROM (SELECT vec_id, x FROM x ORDER BY vec_id LIMIT $k))""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
        |a$i AS (
        |  SELECT vec_id, x, cluster,
        |    round(list_dot_product(x, x) + list_dot_product(c, c)
        |          - 2 * list_dot_product(x, c), 6) + 0.0 AS d
        |  FROM x CROSS JOIN c${i - 1}),
        |g$i AS (
        |  SELECT vec_id, x, cluster FROM (
        |    SELECT vec_id, x, cluster,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cluster ASC) AS rn
        |    FROM a$i) t WHERE rn = 1),
        |m$i AS (
        |  SELECT cluster, t.p AS pos, round(avg(x[t.p + 1]), 7) AS m
        |  FROM g$i, unnest(range(0, $dim)) AS t(p)
        |  GROUP BY cluster, t.p),
        |c$i AS (SELECT cluster, list(m ORDER BY pos) AS c FROM m$i GROUP BY cluster)""".stripMargin)
    }
    sb.append(s""",
      |af AS (
      |  SELECT vec_id, cluster,
      |    round(list_dot_product(x, x) + list_dot_product(c, c)
      |          - 2 * list_dot_product(x, c), 6) + 0.0 AS d
      |  FROM x CROSS JOIN c$iters)
      |SELECT vec_id, cluster, d FROM (
      |  SELECT vec_id, cluster, d,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cluster ASC) AS rn
      |  FROM af) t WHERE rn = 1""".stripMargin)
    sb.toString
  }

  /** Twin of [[graft.TriangleCount.globalSampled]]: the same deterministic
    * data-keyed coin (pmod spelled out — sign-mirrored like the
    * stratified-sample oracle), exact count on the sample, integral rescale. */
  def trianglesSampled(ratePct: Int): String = {
    require(ratePct > 0 && ratePct <= 100 && 100 % ratePct == 0)
    val scale = { val f = 100L / ratePct; f * f * f }
    def leg(p: Long, mult: Long): String =
      s"(((((src % $p) + $p) % $p) * $mult + (((dst % $p) + $p) % $p)) % $p * 2654435761) % $p"
    s"""WITH $edgesCte,
       |samp AS (
       |  SELECT src, dst FROM e
       |  WHERE (${leg(1000000007L, 31L)} + ${leg(1000000009L, 131L)}) % 100 < $ratePct),
       |cnt AS (
       |  SELECT count(*) AS c
       |  FROM samp e1
       |  JOIN samp e2 ON e2.src = e1.dst
       |  JOIN samp e3 ON e3.src = e1.src AND e3.dst = e2.dst)
       |SELECT c AS sampled_triangles, c * $scale AS estimate FROM cnt""".stripMargin
  }

  /** Twin of [[graft.GraphCore.kcoreVertices]] with a fixed round budget:
    * `rounds` unrolled synchronous peels (drop every vertex under degree k,
    * with its edges, per round) — the degree-only sibling of [[ktrussPeel]];
    * peeling a fixpoint is a no-op, so a converged graph gives identical rows
    * for any extra unrolled round. Output: surviving (v, deg) in-core degrees. */
  def kcorePeel(k: Int, rounds: Int): String = {
    require(k >= 1 && rounds >= 1)
    val sb = new StringBuilder(s"WITH $edgesCte")
    sb.append(",\nk0 AS (SELECT src, dst FROM e)")
    for (r <- 0 until rounds) {
      sb.append(s""",
         |d$r AS (
         |  SELECT u AS v, count(*) AS c FROM (
         |    SELECT src AS u FROM k$r UNION ALL SELECT dst AS u FROM k$r)
         |  GROUP BY u),
         |low$r AS (SELECT v FROM d$r WHERE c < $k),
         |k${r + 1} AS (
         |  SELECT src, dst FROM k$r
         |  WHERE src NOT IN (SELECT v FROM low$r)
         |    AND dst NOT IN (SELECT v FROM low$r))""".stripMargin)
    }
    sb.append(s"""
       |SELECT u AS v, count(*) AS deg FROM (
       |  SELECT src AS u FROM k$rounds UNION ALL SELECT dst AS u FROM k$rounds)
       |GROUP BY u""".stripMargin).toString
  }

  /** Twin of [[graft.LinkPredict.scores]]: wedge enumeration through each
    * middle vertex, existing edges anti-joined out. `cap` (None = exact)
    * mirrors `maxMiddleDegree` — the hub mitigation the registered
    * `link_prediction_scalable` twin runs with. */
  def linkPredictionSql(cap: Option[Long]): String =
    s"""WITH $graphCtes,
       |wed AS (
       |  SELECT l.w AS u, r.w AS w, d.deg AS deg_z
       |  FROM ud l
       |  JOIN ud r ON r.u = l.u AND l.w < r.w
       |  JOIN deg d ON d.v = l.u${cap.map(c => s" AND d.deg <= $c").getOrElse("")}),
       |agg AS (
       |  SELECT u, w, count(*) AS cn, sum(1.0 / ln(deg_z)) AS aa_raw
       |  FROM wed GROUP BY u, w),
       |cand AS (
       |  SELECT a.u, a.w, a.cn, a.aa_raw
       |  FROM agg a LEFT JOIN e ON e.src = a.u AND e.dst = a.w
       |  WHERE e.src IS NULL)
       |SELECT c.u, c.w, c.cn, round(c.aa_raw, 6) AS aa,
       |       round(CAST(c.cn AS DOUBLE) / (du.deg + dw.deg - c.cn), 6) AS jac
       |FROM cand c
       |JOIN deg du ON du.v = c.u
       |JOIN deg dw ON dw.v = c.w""".stripMargin

  val linkPrediction: String = linkPredictionSql(None)

  /** Twin of [[graft.LinkPredict.similarTopK]]: the [[linkPrediction]] pairs
    * symmetrized, ranked per vertex with the same (jac desc, nbr asc)
    * tie-break. */
  def similarTopK(k: Int): String =
    s"""WITH lp AS ($linkPrediction),
       |sym AS (SELECT u AS v, w AS nbr, jac FROM lp
       |        UNION ALL SELECT w AS v, u AS nbr, jac FROM lp)
       |SELECT v, nbr, jac, rnk FROM (
       |  SELECT v, nbr, jac,
       |    CAST(row_number() OVER (PARTITION BY v ORDER BY jac DESC, nbr ASC) AS BIGINT) AS rnk
       |  FROM sym) t WHERE rnk <= $k""".stripMargin

  /** Twin of [[graft.Temporal.graphSummaryDaily]]. */
  val graphSummaryDaily: String =
    s"""WITH $dailyEdgesCte,
       |dv AS (
       |  SELECT day, count(*) AS n_vertices FROM (
       |    SELECT DISTINCT day, src AS v FROM de
       |    UNION SELECT DISTINCT day, dst AS v FROM de) t GROUP BY day),
       |dn AS (SELECT day, count(*) AS n_edges FROM de GROUP BY day)
       |SELECT dv.day, dv.n_vertices, dn.n_edges,
       |       round(2.0 * dn.n_edges / dv.n_vertices, 6) AS avg_degree,
       |       round(CASE WHEN dv.n_vertices > 1
       |             THEN 2.0 * dn.n_edges / (dv.n_vertices * (dv.n_vertices - 1))
       |             ELSE 0.0 END, 6) AS density
       |FROM dv JOIN dn ON dn.day = dv.day""".stripMargin

  /** Twin of [[graft.docs.Clustering.kmeansStats]] over [[kmeansAssign]]. */
  def kmeansStats(k: Int, iters: Int, dim: Int): String =
    s"""WITH ka AS (${kmeansAssign(k, iters, dim)})
       |SELECT cluster, count(*) AS n, round(sum(d), 6) AS inertia
       |FROM ka GROUP BY cluster""".stripMargin

  /** Twin of [[graft.GraphCore.assortativity]]: exact integer sufficient
    * statistics, double combination in the same association. */
  val assortativity: String =
    s"""WITH $graphCtes,
       |dd AS (
       |  SELECT du.deg AS dx, dw.deg AS dy
       |  FROM ud JOIN deg du ON du.v = ud.u JOIN deg dw ON dw.v = ud.w),
       |s AS (
       |  SELECT count(*) AS m, sum(dx) AS sx, sum(dy) AS sy,
       |         sum(dx * dy) AS sxy, sum(dx * dx) AS sxx, sum(dy * dy) AS syy
       |  FROM dd)
       |SELECT round(
       |  CASE WHEN (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
       |            (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) = 0 THEN NULL
       |       ELSE (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
       |            sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
       |                 (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
       |  END, 6) AS assortativity
       |FROM s""".stripMargin

  /** Component size histogram over the exact min-id labels. */
  val componentSizes: String =
    s"""WITH comp AS ($connectedComponents)
       |SELECT component, count(*) AS size FROM comp GROUP BY component""".stripMargin

  /** Twin of [[graft.Bfs.distances]] with source set v ≡ 0 (mod `srcMod`):
    * `rounds` unrolled min-plus relaxations. */
  def bfsDistances(rounds: Int, srcMod: Int): String = {
    require(rounds >= 0)
    val sb = new StringBuilder
    sb.append("WITH ").append(graphCtes).append(",\n")
    sb.append(s"b0 AS (SELECT v, CAST(0 AS BIGINT) AS dist FROM verts " +
      s"WHERE ((v % $srcMod) + $srcMod) % $srcMod = 0)")
    for (i <- 1 to rounds) {
      sb.append(s""",
        |b$i AS (
        |  SELECT v, min(dist) AS dist FROM (
        |    SELECT v, dist FROM b${i - 1}
        |    UNION ALL
        |    SELECT ud.w AS v, b${i - 1}.dist + 1 AS dist
        |    FROM ud JOIN b${i - 1} ON b${i - 1}.v = ud.u)
        |  GROUP BY v)""".stripMargin)
    }
    sb.append(s"\nSELECT v, dist FROM b$rounds")
    sb.toString
  }

  /** Twin of [[graft.Bfs.harmonicCentrality]]: per-source min-plus unrolled
    * `rounds` times with the source id in every group key, then the truncated
    * harmonic sum. */
  def harmonicCentrality(rounds: Int, srcMod: Int): String = {
    require(rounds >= 0)
    val sb = new StringBuilder
    sb.append("WITH ").append(graphCtes).append(",\n")
    sb.append(s"h0 AS (SELECT v AS s, v, CAST(0 AS BIGINT) AS dist FROM verts " +
      s"WHERE ((v % $srcMod) + $srcMod) % $srcMod = 0)")
    for (i <- 1 to rounds) {
      sb.append(s""",
        |h$i AS (
        |  SELECT s, v, min(dist) AS dist FROM (
        |    SELECT s, v, dist FROM h${i - 1}
        |    UNION ALL
        |    SELECT h${i - 1}.s, ud.w AS v, h${i - 1}.dist + 1 AS dist
        |    FROM ud JOIN h${i - 1} ON h${i - 1}.v = ud.u)
        |  GROUP BY s, v)""".stripMargin)
    }
    sb.append(s"""
      |SELECT s AS v, round(sum(1.0 / dist), 6) AS harmonic, count(*) AS n_reached
      |FROM h$rounds WHERE dist > 0 GROUP BY s""".stripMargin)
    sb.toString
  }

  /** Twin of [[graft.Walks.deterministicWalks]]: the identical affine-remix
    * neighbor pick (walk_id included — distinct walks never merge on contact)
    * over the sorted capped neighbor list, unrolled per step. */
  def deterministicWalks(steps: Int, startMod: Int, maxNeighbors: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH ").append(graphCtes).append(",\n")
    sb.append(
      s"""al AS (
         |  SELECT u AS av, list_slice(list(w ORDER BY w), 1, $maxNeighbors) AS nbrs
         |  FROM ud GROUP BY u),
         |w0 AS (SELECT v AS walk_id, v, CAST(0 AS BIGINT) AS step FROM verts
         |       WHERE ((v % $startMod) + $startMod) % $startMod = 0)""".stripMargin)
    for (s <- 1 to steps) {
      sb.append(s""",
        |w$s AS (
        |  SELECT w.walk_id,
        |    al.nbrs[CAST(((((w.v % 1000000007) + 1000000007) % 1000000007
        |      * 2654435761 + ${s.toLong * 40503L}
        |      + ((w.walk_id % 1000000007) + 1000000007) % 1000000007 * 69069)
        |      % 1000000007) % len(al.nbrs) + 1 AS BIGINT)] AS v,
        |    CAST($s AS BIGINT) AS step
        |  FROM w${s - 1} w JOIN al ON al.av = w.v)""".stripMargin)
    }
    sb.append("\nSELECT walk_id, step, v FROM (")
    sb.append((0 to steps).map(s => s"SELECT walk_id, step, v FROM w$s").mkString(" UNION ALL "))
    sb.append(") t")
    sb.toString
  }

  /** Shared bipartite incidence CTE: user × UTC-hour activity membership. */
  private val hourlyMembershipCte: String =
    """mem AS (
      |  SELECT DISTINCT user_id AS u,
      |         CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hr
      |  FROM events)""".stripMargin

  /** Twin of [[graft.Bipartite.butterflyCount]] over the hourly membership. */
  val butterfliesGlobal: String =
    s"""WITH $hourlyMembershipCte,
       |cn AS (
       |  SELECT l.u AS a, r.u AS b, count(*) AS cn
       |  FROM mem l JOIN mem r ON r.hr = l.hr AND l.u < r.u
       |  GROUP BY 1, 2)
       |SELECT CAST(coalesce(sum(cn * (cn - 1)), 0) // 2 AS BIGINT) AS butterflies FROM cn""".stripMargin

  /** Twin of [[graft.Bipartite.butterflyPerVertex]]: per-user participation. */
  val butterfliesPerUser: String =
    s"""WITH $hourlyMembershipCte,
       |cn AS (
       |  SELECT l.u AS a, r.u AS b, count(*) AS cn
       |  FROM mem l JOIN mem r ON r.hr = l.hr AND l.u < r.u
       |  GROUP BY 1, 2),
       |credit AS (
       |  SELECT v, CAST(sum(c2) // 2 AS BIGINT) AS bf FROM (
       |    SELECT a AS v, cn * (cn - 1) AS c2 FROM cn
       |    UNION ALL SELECT b AS v, cn * (cn - 1) AS c2 FROM cn)
       |  GROUP BY v)
       |SELECT m.v, coalesce(credit.bf, 0) AS butterflies
       |FROM (SELECT DISTINCT u AS v FROM mem) m
       |LEFT JOIN credit ON credit.v = m.v""".stripMargin

  /** Twin of [[graft.docs.Contamination.ngramOverlap]] — shares
    * [[shingleHashCtes]] with the MinHash oracles (one hash rendering). */
  def contamination(k: Int, evalMod: Int, threshold: Double): String =
    s"""WITH ${shingleHashCtes(k)},
       |ev AS (SELECT doc_id FROM documents WHERE ((doc_id % $evalMod) + $evalMod) % $evalMod = 0),
       |eh AS (SELECT DISTINCT x FROM hx JOIN ev USING (doc_id)),
       |tr AS (
       |  SELECT h.doc_id, h.x FROM hx h
       |  LEFT JOIN ev ON ev.doc_id = h.doc_id
       |  WHERE ev.doc_id IS NULL)
       |SELECT tr.doc_id, count(*) AS n_shingles, count(eh.x) AS n_hit,
       |       round(CAST(count(eh.x) AS DOUBLE) / count(*), 6) AS overlap,
       |       CAST(count(eh.x) AS DOUBLE) / count(*) >= $threshold AS contaminated
       |FROM tr LEFT JOIN eh ON eh.x = tr.x
       |GROUP BY tr.doc_id""".stripMargin
}
