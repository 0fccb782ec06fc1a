package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo.{Absorbing, ConnectedComponents, LabelPropagation, PageRank, TriangleCount}
import graft.graph.GraphOps
import graft.measures.Measures

/** Driver-gate graph queries + their DuckDB oracle SQL.
  *
  * The graph under test is derived deterministically from the provided
  * TPC-H-style tables: `src = l_orderkey % 300`, `dst = l_partkey % 300`
  * (first line item per order), self-loops dropped, symmetrized — a
  * bounded 300-vertex id space at every scale factor so the iterative
  * oracles (recursive CTE closure, unrolled supersteps) stay tractable in
  * DuckDB while the Spark side exercises the full engine. Float outputs
  * are rounded to integers (×1e6) before hashing so cross-engine
  * summation-order noise (~1e-15) cannot flip the compare.
  */
object GraphQueries {

  val NodeSpace = 300

  /** Shared CTE prefix: raw pairs → symmetrized dedup'd slots → vertices.
    * Mirrors GraphOps.symmetrize ∘ dropSelfLoops. Dedup is an explicit
    * DISTINCT (not bare UNION): inside a DuckDB `WITH RECURSIVE` block a
    * non-recursive CTE's UNION loses its duplicate elimination.
    */
  val cte: String =
    s"""raw AS (
       |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
       |  FROM lineitem WHERE l_linenumber = 1
       |), e0 AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM raw WHERE src <> dst
       |    UNION ALL
       |    SELECT dst, src FROM raw WHERE src <> dst) u
       |), verts AS (SELECT DISTINCT src AS id FROM e0)""".stripMargin

  /** Recursive connected-components labeling (min reachable id). */
  val ccCte: String =
    """reach(id, lab) AS (
      |  SELECT id, id FROM verts
      |  UNION
      |  SELECT e0.dst, reach.lab FROM reach JOIN e0 ON e0.src = reach.id
      |), cclab AS (SELECT id, min(lab) AS label FROM reach GROUP BY id)""".stripMargin

  /** Weighted demo graph: same vertex space, integer weights derived from
    * l_quantity; parallel edges aggregated by weight sum, symmetrized by
    * summing both directions (⇒ weight(u,v) == weight(v,u)).
    */
  def demoWeightedEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_linenumber") === 1)
    val raw = li.select(
        (col("l_orderkey") % NodeSpace).as("src"),
        (col("l_partkey") % NodeSpace).as("dst"),
        (col("l_quantity").cast("long") % 5 + 1).as("w"))
      .filter(col("src") =!= col("dst"))
    val agg = raw.groupBy("src", "dst").agg(sum(col("w")).as("w"))
    agg.select(col("src"), col("dst"), col("w"))
      .union(agg.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy("src", "dst").agg(sum(col("w")).cast("long").as("weight"))
  }

  def demoEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_linenumber") === 1)
    val raw = li.select(
      (col("l_orderkey") % NodeSpace).as("src"),
      (col("l_partkey") % NodeSpace).as("dst"))
    GraphOps.symmetrize(GraphOps.dropSelfLoops(raw))
  }

  /** Sparse demo graph for the coreness gate: a wider id space (900) over
    * a third of the order keys, so the average degree stays low enough
    * that the fixed peel schedule (maxK=8 × 3 rounds) actually
    * discriminates — on the dense 300-node demo graph every vertex
    * survives k ≤ 8 and the gate would be vacuous.
    */
  val SparseNodeSpace = 900

  def sparseDemoEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_linenumber") === 1 && col("l_orderkey") % 3 === 0)
    val raw = li.select(
      (col("l_orderkey") % SparseNodeSpace).as("src"),
      (col("l_partkey") % SparseNodeSpace).as("dst"))
    GraphOps.symmetrize(GraphOps.dropSelfLoops(raw))
  }

  /** Unrolled balanced-LP sharding CTEs mirroring
    * [[graft.graph.Partition.balancedLp]] (capNum/capDen = 11/10): a0 is
    * the hash layout, each iteration is census → per-vertex argmax →
    * quota-ranked admission → reassignment, ending at a{iters}.
    */
  private def balancedLpCtes(k: Int, iters: Int): String = {
    val steps = (1 to iters).map { i =>
      val prev = s"a${i - 1}"
      s"""sz$i AS (SELECT shard, count(*) AS sz FROM $prev GROUP BY 1),
         |nb$i AS (SELECT e0.src AS id, a.shard AS s_nbr, count(*) AS cnt
         |        FROM e0 JOIN $prev a ON e0.dst = a.id GROUP BY 1, 2),
         |bs$i AS (SELECT id, s_nbr AS target, cnt AS tcnt FROM (
         |          SELECT *, row_number() OVER (PARTITION BY id
         |            ORDER BY cnt DESC, s_nbr) AS rn FROM nb$i) t
         |        WHERE rn = 1),
         |cc$i AS (SELECT a.id, a.shard, COALESCE(nb$i.cnt, 0) AS ccnt
         |        FROM $prev a LEFT JOIN nb$i
         |          ON nb$i.id = a.id AND nb$i.s_nbr = a.shard),
         |cd$i AS (SELECT cc$i.id, cc$i.shard, bs$i.target,
         |          bs$i.tcnt - cc$i.ccnt AS gain
         |        FROM cc$i JOIN bs$i ON bs$i.id = cc$i.id
         |        WHERE bs$i.target <> cc$i.shard AND bs$i.tcnt > cc$i.ccnt),
         |ad$i AS (SELECT id, target FROM (
         |          SELECT cd$i.*, sz$i.sz, row_number() OVER (
         |            PARTITION BY cd$i.target
         |            ORDER BY gain DESC, id) AS rn
         |          FROM cd$i LEFT JOIN sz$i ON sz$i.shard = cd$i.target) t
         |        WHERE rn <= (SELECT count(*) * 11 // (${k} * 10) FROM verts)
         |          - COALESCE(sz, 0)),
         |a$i AS MATERIALIZED (SELECT a.id,
         |          COALESCE(ad$i.target, a.shard) AS shard
         |        FROM $prev a LEFT JOIN ad$i ON ad$i.id = a.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""a0 AS (SELECT id, id % $k AS shard FROM verts),
       |$steps""".stripMargin
  }

  /** Oracle CTE prefix mirroring [[sparseDemoEdges]]. */
  val sparseCte: String =
    s"""sraw AS (
       |  SELECT l_orderkey % $SparseNodeSpace AS src,
       |         l_partkey % $SparseNodeSpace AS dst
       |  FROM lineitem WHERE l_linenumber = 1 AND l_orderkey % 3 = 0
       |), se0 AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM sraw WHERE src <> dst
       |    UNION ALL
       |    SELECT dst, src FROM sraw WHERE src <> dst) u
       |), sverts AS (SELECT DISTINCT src AS id FROM se0)""".stripMargin

  /** Deterministic url-level link pairs for the host-graph gates: urls
    * built from lineitem keys by pure string concatenation and mirrored
    * verbatim in the oracle SQL (mixed-case scheme/host and a fragment on
    * the target side exercise [[HostGraph.hostOf]]'s normalization). src
    * hosts span host0..host88, dst hosts host0..host96 — hosts 89..96 are
    * link-targets only, i.e. DANGLING vertices in the PageRank gate.
    */
  def hostPairs(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.select(
      concat(lit("https://host"), (col("l_orderkey") % 89).cast("string"),
        lit(".example/o/"), col("l_orderkey").cast("string")).as("src_url"),
      concat(lit("HTTPS://HOST"), (col("l_partkey") % 97).cast("string"),
        lit(".EXAMPLE/p/"), col("l_partkey").cast("string"), lit("#ref"))
        .as("dst_url"))
  }

  /** Pages-shaped rows assembled from lineitem keys for the anchor gate:
    * two anchors per page (a part link with a fragment + mixed-case
    * scheme/host, and a supplier link), so the extraction has to pair
    * hrefs with their anchor texts positionally AND normalize. The oracle
    * derives the expected rows straight from the keys — it never runs a
    * regex, making it fully independent of the extraction path.
    */
  def anchorPages(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_linenumber") === 1)
    li.select(
      concat(lit("https://host"), (col("l_orderkey") % 89).cast("string"),
        lit(".example/o/"), col("l_orderkey").cast("string")).as("url"),
      encode(concat(
        lit("<html><body><a href=\"HTTPS://HOST"),
        (col("l_partkey") % 97).cast("string"),
        lit(".EXAMPLE/p/"), col("l_partkey").cast("string"),
        lit("#x\">part "), col("l_partkey").cast("string"),
        lit("</a><p>filler</p><a href=\"https://s"),
        (col("l_suppkey") % 13).cast("string"),
        lit(".example/\">supplier "), (col("l_suppkey") % 13).cast("string"),
        lit("</a></body></html>")), "UTF-8").as("html"))
  }

  /** Oracle CTE replaying [[hostPairs]] ∘ [[HostGraph.contract]]. */
  val hostCte: String =
    """hp AS (
      |  SELECT
      |    lower(regexp_extract(
      |      'https://host' || CAST(l_orderkey % 89 AS VARCHAR)
      |        || '.example/o/' || CAST(l_orderkey AS VARCHAR),
      |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]*)', 1)) AS sh,
      |    lower(regexp_extract(
      |      'HTTPS://HOST' || CAST(l_partkey % 97 AS VARCHAR)
      |        || '.EXAMPLE/p/' || CAST(l_partkey AS VARCHAR) || '#ref',
      |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]*)', 1)) AS dh
      |  FROM lineitem
      |), he AS (
      |  SELECT sh AS src_host, dh AS dst_host, count(*) AS weight
      |  FROM hp WHERE sh <> dh AND sh <> '' AND dh <> ''
      |  GROUP BY 1, 2)""".stripMargin

  private def oneRow(spark: SparkSession, name: String, v: Long): DataFrame = {
    import spark.implicits._
    Seq(v).toDF(name)
  }

  /** Reference-format fixtures for the reader gates: tiny, deterministic,
    * and mirrored verbatim into the oracle SQL as VALUES literals.
    * txt: a comment, a blank line, tab-separated pairs, one duplicated
    * multi-edge (kept by the txt reader, `Graph.cu:234`).
    */
  private val TxtFixture =
    "# demo fixture\nb\ta\na\tc\nb\tc\nb\tc\nc\td\n\n"

  /** Pajek: header section, `*Edges` marker, space-separated `i j cost`,
    * one duplicated pair with differing costs (dedup keeps min).
    */
  private val NetFixture =
    "*Vertices 4\n1 \"n1\"\n2 \"n2\"\n3 \"n3\"\n4 \"n4\"\n" +
      "*Edges\n1 2 1.5\n2 3 2.0\n1 2 0.5\n3 4 1.0\n"

  /** Ground truth: comment, first-occurrence-wins duplicate for node a. */
  private val GtFixture =
    "# gt\na\tx\nb\ty\na\tz\nc\tx\nd\ty\n"

  /** Fixture graph for the COLORED semisync gate (`g_lp_semisync_colored`)
    * — SF-independent (like the reader fixtures) because the oracle embeds
    * a literal transcription of the Jones–Plassmann coloring, which is a
    * per-graph artifact: two overlapping 4-cliques sharing vertex 3, a
    * 6-ring through 0, and two chords, 11 vertices / 15 undirected pairs.
    */
  private[graft] val ColorFixturePairs: Seq[(Int, Int)] = Seq(
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (3, 4), (3, 5), (3, 6), (4, 5), (4, 6), (5, 6),
    (6, 7), (7, 8), (8, 9), (9, 10), (10, 0),
    (2, 8), (4, 9))

  /** The engine's Jones–Plassmann coloring of [[ColorFixturePairs]]
    * (id-priority, mex assignment — [[graft.algo.SemiSyncLP.greedyColoring]]),
    * transcribed as data so the DuckDB oracle can replay the SAME class
    * schedule. The gate recomputes the coloring with the real operator and
    * hard-fails if it diverges from this transcription, so the driver row
    * covers the actual coloring, not a stand-in (VERDICT r3 task 5).
    */
  private[graft] val ColorFixtureColoring: Seq[(Int, Int)] = Seq(
    (0, 0), (1, 1), (2, 2), (3, 3), (4, 0), (5, 1),
    (6, 2), (7, 0), (8, 1), (9, 2), (10, 1))

  /** Unrolled semisync LP over the color fixture: same machinery as
    * [[semisyncSql]] with the edge list and the class table inlined as
    * VALUES literals (BIGINT-cast to match the Spark schema).
    */
  def semisyncColoredSql(sweeps: Int): String = {
    val k = ColorFixtureColoring.map(_._2).max + 1
    val pairVals = ColorFixturePairs.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    val clsVals = ColorFixtureColoring.map { case (v, c) => s"($v, $c)" }.mkString(", ")
    val steps = (1 to k * sweeps).map { t =>
      val cls = (t - 1) % k
      s"""c$t AS (
         |  SELECT e0.src AS id, p.label, count(*) AS cnt
         |  FROM e0 JOIN s${t - 1} p ON e0.dst = p.id
         |  JOIN cls cl ON cl.id = e0.src AND cl.cls = $cls
         |  GROUP BY 1, 2
         |), w$t AS (
         |  SELECT id, label FROM (
         |    SELECT id, label,
         |           row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
         |    FROM c$t) t WHERE rn = 1
         |), s$t AS MATERIALIZED (
         |  SELECT p.id, coalesce(w.label, p.label) AS label
         |  FROM s${t - 1} p LEFT JOIN w$t w ON p.id = w.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs(sa, sb) AS (VALUES $pairVals),
       |e0 AS (SELECT DISTINCT src, dst FROM (
       |  SELECT CAST(sa AS BIGINT) AS src, CAST(sb AS BIGINT) AS dst
       |  FROM pairs WHERE sa <> sb
       |  UNION ALL
       |  SELECT CAST(sb AS BIGINT), CAST(sa AS BIGINT)
       |  FROM pairs WHERE sa <> sb) u),
       |verts AS (SELECT DISTINCT src AS id FROM e0),
       |cls(id, cls) AS (VALUES $clsVals),
       |s0 AS MATERIALIZED (SELECT id, id AS label FROM verts),
       |$steps
       |SELECT id, label FROM s${k * sweeps}""".stripMargin
  }

  /** Write a reader fixture to a deterministic local temp path (driver-side
    * test-input creation, not engine I/O).
    */
  private def writeFixture(relName: String, content: String): String = {
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_fixtures")
    java.nio.file.Files.createDirectories(dir)
    val p = dir.resolve(relName)
    java.nio.file.Files.writeString(p, content)
    p.toString
  }

  /** Unrolled synchronous LP superstep SQL for `t` steps — the engine's
    * join/count/argmax plan transcribed to ANSI SQL, tie-break pinned to
    * (max count, min label) via the window ordering.
    */
  /** The unrolled LP superstep CTEs alone (s0 … s`t`), for composition
    * into larger oracle statements.
    */
  def lpStepsSql(t: Int): String = {
    val steps = (1 to t).map { k =>
      s"""c$k AS (
         |  SELECT e0.src AS id, p.label, count(*) AS cnt
         |  FROM e0 JOIN s${k - 1} p ON e0.dst = p.id GROUP BY 1, 2
         |), w$k AS (
         |  SELECT id, label FROM (
         |    SELECT id, label,
         |           row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
         |    FROM c$k) t WHERE rn = 1
         |), s$k AS (
         |  SELECT p.id, coalesce(w.label, p.label) AS label
         |  FROM s${k - 1} p LEFT JOIN w$k w ON p.id = w.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""s0 AS (SELECT id, id AS label FROM verts),
       |$steps""".stripMargin
  }

  def lpSql(t: Int): String =
    s"""WITH $cte,
       |${lpStepsSql(t)}
       |SELECT id, label FROM s$t""".stripMargin

  /** Unrolled semi-synchronous (Gauss–Seidel class-sweep) LP SQL:
    * `sweeps` sweeps over `k` modulo classes (`cls = id % k`), each
    * sub-step updating only its class's vertices against the CURRENT
    * labels — the schedule of [[graft.algo.SemiSyncLP.sweepByClasses]]
    * with a class assignment both engines can express. Every state CTE is
    * MATERIALIZED: it is referenced twice per sub-step (gather + merge),
    * and DuckDB's default inlining would double the plan per sub-step —
    * the same 2^n blow-up the engine avoids with eager checkpoints.
    */
  def semisyncSql(k: Int, sweeps: Int): String = {
    val steps = (1 to k * sweeps).map { t =>
      val cls = (t - 1) % k
      s"""c$t AS (
         |  SELECT e0.src AS id, p.label, count(*) AS cnt
         |  FROM e0 JOIN s${t - 1} p ON e0.dst = p.id
         |  WHERE e0.src % $k = $cls GROUP BY 1, 2
         |), w$t AS (
         |  SELECT id, label FROM (
         |    SELECT id, label,
         |           row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
         |    FROM c$t) t WHERE rn = 1
         |), s$t AS MATERIALIZED (
         |  SELECT p.id, coalesce(w.label, p.label) AS label
         |  FROM s${t - 1} p LEFT JOIN w$t w ON p.id = w.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $cte,
       |s0 AS MATERIALIZED (SELECT id, id AS label FROM verts),
       |$steps
       |SELECT id, label FROM s${k * sweeps}""".stripMargin
  }

  /** σ/δ unroll bound for the Brandes oracle, shared with the engine query
    * (`Betweenness.run(maxDepth = BcUnrollDepth)`): both sides truncate
    * the BFS DAG at the same level, so the gate compares identical
    * semantics. The demo graph's eccentricity from the sampled sources is
    * 7 at sf0.001 and 2 at sf0.01/0.1 (measured) — 12 is never binding.
    */
  val BcUnrollDepth = 12

  /** Full Brandes betweenness oracle (closes round 2's only `no_oracle`
    * row): shortest-path dists from the bounded recursive closure, then σ
    * unrolled forward over levels (σ(v) = Σ σ(pred)) and δ unrolled
    * backward (δ(u) = Σ σ(u)/σ(v)·(1+δ(v))), exactly Brandes' two passes
    * (`algorithms.h:29-117`) with the per-level loop expanded to
    * [[BcUnrollDepth]] CTEs. Level tables are MATERIALIZED — each is
    * referenced by the next level AND the final union.
    */
  def bcSql(srcWhere: String = "id % 10 = 0"): String =
    s"""${bcCtes(srcWhere)}
       |SELECT d.id, CAST(ROUND(sum(coalesce(dl.delta, 0)) * 1000) AS BIGINT) AS bc_e3
       |FROM dist d LEFT JOIN del dl ON dl.source = d.source AND dl.id = d.id
       |WHERE d.source <> d.id
       |GROUP BY d.id""".stripMargin

  /** Edge-betweenness oracle final: per directed slot, Σ over sources of
    * σ(u)/σ(v)·(1+δ(v)) across the pred DAG — the same CTE chain as
    * [[bcSql]] aggregated per edge (each vertex has ONE δ row: it is
    * computed in full at its own BFS level).
    */
  def bcEdgeSql(srcWhere: String = "id % 10 = 0"): String =
    s"""${bcCtes(srcWhere)}
       |SELECT e0.src, e0.dst,
       |       CAST(FLOOR(coalesce(s.c, 0) * 1000 + 0.5 + 0.00000001)
       |            AS BIGINT) AS eb_e3
       |FROM e0 LEFT JOIN (
       |  SELECT p.u AS src, p.v AS dst,
       |         sum(su.sigma / sv.sigma * (1 + coalesce(dl.delta, 0))) AS c
       |  FROM pred p
       |  JOIN sig su ON su.source = p.source AND su.id = p.u
       |  JOIN sig sv ON sv.source = p.source AND sv.id = p.v
       |  LEFT JOIN del dl ON dl.source = p.source AND dl.id = p.v
       |  GROUP BY 1, 2) s ON s.src = e0.src AND s.dst = e0.dst""".stripMargin

  private def bcCtes(srcWhere: String): String = {
    val d = BcUnrollDepth
    val sigs = (1 to d).map { k =>
      s"""sig$k AS MATERIALIZED (
         |  SELECT p.source, p.v AS id, sum(s.sigma) AS sigma
         |  FROM pred p JOIN sig${k - 1} s ON s.source = p.source AND s.id = p.u
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val sigUnion = (0 to d).map(k => s"SELECT * FROM sig$k").mkString("\n  UNION ALL ")
    val dels = (d - 1 to 0 by -1).map { k =>
      val tail =
        if (k == d - 1) "" // topmost level has no deeper δ to pull from
        else s"\n  LEFT JOIN del${k + 1} dd ON dd.source = p.source AND dd.id = p.v"
      val deltaTerm = if (k == d - 1) "1" else "1 + coalesce(dd.delta, 0)"
      s"""del$k AS MATERIALIZED (
         |  SELECT p.source, p.u AS id,
         |         sum(su.sigma / sv.sigma * ($deltaTerm)) AS delta
         |  FROM pred p
         |  JOIN sig su ON su.source = p.source AND su.id = p.u
         |  JOIN sig sv ON sv.source = p.source AND sv.id = p.v$tail
         |  WHERE p.lev = $k
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val delUnion = (0 until d).map(k => s"SELECT * FROM del$k").mkString("\n  UNION ALL ")
    s"""WITH RECURSIVE $cte,
       |srcs AS (SELECT id FROM verts WHERE $srcWhere),
       |reach(source, id, dist) AS (
       |  SELECT id, id, 0 FROM srcs
       |  UNION
       |  SELECT r.source, e0.dst, r.dist + 1
       |  FROM reach r JOIN e0 ON e0.src = r.id
       |  WHERE r.dist < $d),
       |dist AS MATERIALIZED (
       |  SELECT source, id, min(dist) AS dist FROM reach GROUP BY 1, 2),
       |pred AS MATERIALIZED (
       |  SELECT du.source, du.id AS u, dv.id AS v, du.dist AS lev
       |  FROM dist du JOIN e0 ON e0.src = du.id
       |  JOIN dist dv ON dv.source = du.source AND dv.id = e0.dst
       |  WHERE dv.dist = du.dist + 1),
       |sig0 AS MATERIALIZED (
       |  SELECT source, source AS id, CAST(1 AS DOUBLE) AS sigma
       |  FROM (SELECT DISTINCT source FROM dist) s0),
       |$sigs,
       |sig AS MATERIALIZED (
       |  $sigUnion),
       |$dels,
       |del AS MATERIALIZED (
       |  $delUnion)""".stripMargin
  }

  /** Unrolled PageRank SQL for `t` iterations (graph is symmetrized ⇒ no
    * dangling mass), ranks rounded ×1e6.
    */
  /** Epoch seconds of 2024-02-01T00:00:00Z — the fixed staleness horizon
    * for the crawl-frontier gate (events end 2024-01-30).
    */
  val FrontierHorizonSec = 1706745600L

  def prSql(t: Int): String = {
    val steps = (1 to t).map { k =>
      s"""x$k AS (
         |  SELECT e0.dst AS id, sum(p.r / d.od) AS s
         |  FROM e0 JOIN r${k - 1} p ON e0.src = p.id JOIN deg d ON e0.src = d.id
         |  GROUP BY 1
         |), r$k AS (
         |  SELECT v.id, 0.15 / (SELECT count(*) FROM verts)
         |         + 0.85 * coalesce(x.s, 0) AS r
         |  FROM verts v LEFT JOIN x$k x ON v.id = x.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $cte,
       |deg AS (SELECT src AS id, count(*) AS od FROM e0 GROUP BY 1),
       |r0 AS (SELECT id, 1.0 / (SELECT count(*) FROM verts) AS r FROM verts),
       |$steps
       |SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_e6 FROM r$t""".stripMargin
  }

  /** Personalized-PageRank CTE chain (deg/srcs/rst/r0..rt) over e0 with
    * the id%10 teleport set — shared by the PPR gate and the sweep cut.
    */
  private def pprStepsSql(t: Int): String = {
    val steps = (1 to t).map { k =>
      s"""x$k AS (
         |  SELECT e0.dst AS id, sum(p.r / d.od) AS s
         |  FROM e0 JOIN r${k - 1} p ON e0.src = p.id JOIN deg d ON e0.src = d.id
         |  GROUP BY 1
         |), r$k AS (
         |  SELECT v.id, (1.0 - 0.85) * v.reset + 0.85 * coalesce(x.s, 0) AS r
         |  FROM rst v LEFT JOIN x$k x ON v.id = x.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""deg AS (SELECT src AS id, count(*) AS od FROM e0 GROUP BY 1),
       |srcs AS (SELECT id FROM verts WHERE id % 10 = 0),
       |rst AS (
       |  SELECT v.id,
       |    CASE WHEN s.id IS NULL THEN 0.0
       |         ELSE 1.0 / (SELECT count(*) FROM srcs) END AS reset
       |  FROM verts v LEFT JOIN srcs s ON v.id = s.id),
       |r0 AS (SELECT id, reset AS r FROM rst),
       |$steps""".stripMargin
  }

  /** Name-prefixed PageRank chain over an arbitrary symmetric edge CTE —
    * the [[prSql]] recurrence, reusable several times in one statement.
    */
  private def prChainSql(p: String, et: String, t: Int): String = {
    val steps = (1 to t).map { k =>
      s"""${p}x$k AS (
         |  SELECT $et.dst AS id, sum(q.r / d.od) AS s
         |  FROM $et JOIN ${p}r${k - 1} q ON $et.src = q.id
         |  JOIN ${p}deg d ON $et.src = d.id
         |  GROUP BY 1
         |), ${p}r$k AS (
         |  SELECT v.id, 0.15 / (SELECT count(*) FROM ${p}verts)
         |         + 0.85 * coalesce(x.s, 0) AS r
         |  FROM ${p}verts v LEFT JOIN ${p}x$k x ON v.id = x.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""${p}verts AS (SELECT DISTINCT src AS id FROM $et),
       |${p}deg AS (SELECT src AS id, count(*) AS od FROM $et GROUP BY 1),
       |${p}r0 AS (SELECT id, 1.0 / (SELECT count(*) FROM ${p}verts) AS r
       |           FROM ${p}verts),
       |$steps""".stripMargin
  }

  /** [[prChainSql]] on the line-1 and line≤2 snapshots + shift top-10. */
  private def prShiftSql(t: Int): String = {
    def snapSql(name: String, maxLine: Int) =
      s"""${name}0 AS (
         |  SELECT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= $maxLine
         |), $name AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM ${name}0 WHERE src <> dst
         |    UNION ALL
         |    SELECT dst, src FROM ${name}0 WHERE src <> dst) u
         |)""".stripMargin
    s"""WITH ${snapSql("ea", 1)},
       |${snapSql("eb", 2)},
       |${prChainSql("a", "ea", t)},
       |${prChainSql("b", "eb", t)},
       |fa AS (SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS ro
       |       FROM ar$t),
       |fb AS (SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS rn2
       |       FROM br$t),
       |j AS (SELECT coalesce(fa.id, fb.id) AS id,
       |             coalesce(fa.ro, 0) AS rank_e6_old,
       |             coalesce(fb.rn2, 0) AS rank_e6_new
       |      FROM fa FULL OUTER JOIN fb ON fa.id = fb.id)
       |SELECT id, rank_e6_old, rank_e6_new,
       |       rank_e6_new - rank_e6_old AS shift_e6
       |FROM j ORDER BY abs(rank_e6_new - rank_e6_old) DESC, id ASC
       |LIMIT 10""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_edges" -> ((s, dir) => demoEdges(s, dir)),

    // one-row graph DESCRIBE panel: counts, degree envelope, density
    "g_graph_summary" -> ((s, dir) =>
      Measures.graphSummary(demoEdges(s, dir))),

    // degree-inequality Gini from the degree HISTOGRAM (never a global
    // vertex sort) — hub-concentration summary of the crawl
    "g_degree_gini" -> ((s, dir) =>
      Measures.degreeGini(demoEdges(s, dir))),

    // triadic-closure rate of the crawl delta: new line-2 pairs closing
    // an open wedge of the line-1 snapshot (symmetrized, canonical a<b)
    "g_wedge_closure" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def snap(maxLine: Int) = GraphOps.symmetrize(
        li.filter(col("l_linenumber") <= maxLine)
          .select((col("l_orderkey") % NodeSpace).as("src"),
            (col("l_partkey") % NodeSpace).as("dst"))
          .filter(col("src") =!= col("dst")))
      GraphOps.wedgeClosure(snap(1), snap(2))
    }),

    "g_degrees" -> ((s, dir) => GraphOps.degrees(demoEdges(s, dir))),

    // circuit rank m − n + c (independent-cycle count) — CC labels shared
    // from the alternating path, counts are 1-row folds
    "g_circuit_rank" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      Measures.circuitRank(e, ConnectedComponents.runAlternating(e))
    }),

    // crawl-drift panel: pair/vertex Jaccard between the line-1 and
    // line<=2 symmetrized snapshots
    "g_snapshot_drift" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def snap(maxLine: Int) = GraphOps.symmetrize(
        li.filter(col("l_linenumber") <= maxLine)
          .select((col("l_orderkey") % NodeSpace).as("src"),
            (col("l_partkey") % NodeSpace).as("dst"))
          .filter(col("src") =!= col("dst")))
      GraphOps.snapshotDrift(snap(1), snap(2))
    }),

    // host outlink-profile similarity: Jaccard of target-host sets over
    // the banded pairing join (link-structure mirror detection)
    "g_host_similarity" -> ((s, dir) =>
      graft.sources.HostGraph.hostLinkSimilarity(hostPairs(s, dir))),

    // degree percentile panel from the histogram (exact ceil-convention
    // order statistics, cross-multiplied — no float quantile)
    "g_degree_percentiles" -> ((s, dir) =>
      Measures.degreePercentiles(demoEdges(s, dir))),

    // preferential-attachment lift of the crawl delta: mean old degree
    // of new-pair endpoints vs the overall mean (BA rich-get-richer test)
    "g_attachment_lift" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def snap(maxLine: Int) = GraphOps.symmetrize(
        li.filter(col("l_linenumber") <= maxLine)
          .select((col("l_orderkey") % NodeSpace).as("src"),
            (col("l_partkey") % NodeSpace).as("dst"))
          .filter(col("src") =!= col("dst")))
      GraphOps.attachmentLift(snap(1), snap(2))
    }),

    // raw-dump hygiene audit on the UNNORMALIZED directed projection
    // (line<=2, self-loops and multi-edges kept): the ingest QA row
    "g_edge_audit" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      GraphOps.edgeAudit(li.filter(col("l_linenumber") <= 2)
        .select((col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst")))
    }),

    // degrees over the BUCKETED storage layout: write-once hash layout,
    // exchange-free src aggregations on read-back (plan asserted in the
    // Layout spec); values must equal the plain-path degrees
    "g_bucketed_degrees" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft_bucketed").toString
      graft.graph.Layout.writeBucketed(e, "graft_gate_bucketed", path, 8)
      GraphOps.degrees(graft.graph.Layout.readBucketed(s, "graft_gate_bucketed"))
    }),

    // degree-histogram L1 drift between the line-1 and line<=2 snapshots
    // — the distribution-level crawl-drift companion of g_snapshot_drift
    "g_degdist_drift" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def snap(maxLine: Int) = GraphOps.symmetrize(
        li.filter(col("l_linenumber") <= maxLine)
          .select((col("l_orderkey") % NodeSpace).as("src"),
            (col("l_partkey") % NodeSpace).as("dst"))
          .filter(col("src") =!= col("dst")))
      Measures.degreeHistDrift(snap(1), snap(2))
    }),

    // LP change frontier: vertices still flipping between supersteps 2
    // and 3, profiled BY DEGREE — is convergence down to the low-degree
    // periphery (healthy) or still churning hubs (structural trouble)?
    "g_lp_frontier_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val s2 = LabelPropagation.runFixed(e, 2, symmetric = true)
        .select(col("id"), col("label").as("l2"))
      val s3 = LabelPropagation.runFixed(e, 3, symmetric = true)
        .select(col("id"), col("label").as("l3"))
      val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
      s2.join(s3, "id").filter(col("l2") =!= col("l3"))
        .join(deg, "id")
        .groupBy(col("d")).agg(count(lit(1)).as("n_changed"))
    }),

    // LP quality curve: modularity of the labeling after supersteps 1-3
    // — the quality-vs-iteration telemetry next to g_lp_metrics' raw
    // change counts (is another superstep still buying structure?)
    "g_lp_quality_curve" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val rows = (1 to 3).map { t =>
        val lab = LabelPropagation.runFixed(e, t, symmetric = true)
        (t.toLong, math.round(Measures.modularity(e, lab) * 1000000))
      }
      import s.implicits._
      rows.toDF("iter", "q_e6")
    }),

    // PageRank mass per LP(3) community: where the importance lives —
    // per-vertex ranks e6-rounded BEFORE the per-community sum so the
    // aggregate is order-free (the g_comm_top_pages composition, folded)
    "g_pr_mass_comm" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val labels = LabelPropagation.runFixed(e, 3, symmetric = true)
      val pr = PageRank.runFixed(e, 5)
        .select(col("id").as("pid"),
          round(col("rank") * 1000000).cast("long").as("rank_e6"))
      labels.join(pr, labels("id") === col("pid"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_pages"),
          sum(col("rank_e6")).cast("long").as("rank_mass_e6"))
    }),

    "g_cc" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val n = GraphOps.vertices(e).count()
      ConnectedComponents.run(e, n).labels
    }),

    // the O(log n) large-star/small-star contraction path — labels equal
    // the component minimum at convergence, identical contract to g_cc's
    // min-propagation, so the same recursive-closure oracle gates BOTH
    // algorithms (the alternating path was sbt-only through round 3)
    "g_cc_star" -> ((s, dir) =>
      ConnectedComponents.runAlternating(demoEdges(s, dir))),

    // WARM-START (incremental) CC on the crawl delta: min-propagation on
    // the line≤2 snapshot seeded from the line-1 snapshot's labels (new
    // vertices keep their own id) — edge additions only, so the warm
    // fixpoint equals from-scratch (proof in ConnectedComponents.run
    // scaladoc); the re-label a crawler runs per delta
    "g_cc_warm" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def snap(maxLine: Int) = GraphOps.symmetrize(GraphOps.dropSelfLoops(
        li.filter(col("l_linenumber") <= maxLine)
          .select((col("l_orderkey") % NodeSpace).as("src"),
            (col("l_partkey") % NodeSpace).as("dst"))))
      val old = ConnectedComponents.runAlternating(snap(1))
      val eNew = snap(2)
      val vNew = GraphOps.vertices(eNew)
      val init = vNew
        .join(old.withColumnRenamed("label", "ol"), Seq("id"), "left")
        .select(col("id"), coalesce(col("ol"), col("id")).as("label"))
      ConnectedComponents.run(eNew, vNew.count(),
        initLabels = Some(init)).labels
    }),

    // INCREMENTAL triangle census on the crawl delta: triangles closed
    // by the line-2 edge additions, counted by scanning ONLY the delta
    // (each new triangle weighted 1/k per delta edge, summed in exact
    // sixths) — never a wedge census of the union graph
    "g_tri_delta" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def snap(maxLine: Int) = GraphOps.symmetrize(GraphOps.dropSelfLoops(
        li.filter(col("l_linenumber") <= maxLine)
          .select((col("l_orderkey") % NodeSpace).as("src"),
            (col("l_partkey") % NodeSpace).as("dst"))))
      TriangleCount.deltaTriangles(snap(2), snap(1))
    }),

    // Spearman rank agreement between cheap in-degree and PageRank-5 on
    // the e6 integer scale — the "can the frontier use in-degree as the
    // PR proxy?" diagnostic; ranks over the pinned (score desc, id asc)
    // order via the distributed sort-zipWithIndex, no global window
    "g_rank_corr" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val indeg = GraphOps.degrees(e)
        .select(col("id"), col("degree").cast("long").as("score"))
      val pr = PageRank.runFixed(e, 5)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("score"))
      Measures.spearman(indeg, pr)
    }),

    // bounded-horizon absorbing hit probability toward the id%50 target
    // set — 4 uniform-walk steps, targets absorbing at 1; the spam-reach
    // quarantine diagnostic (PageRank gather skeleton, lazy chain)
    "g_hitting_t4" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val targets = GraphOps.vertices(e).filter(col("id") % 50 === 0)
      Absorbing.hitProbabilityFixed(e, targets, steps = 4)
        .select(col("id"),
          round(col("p") * 1000000).cast("long").as("p_e6"))
    }),

    // anti-TrustRank: PPR from the id%9 spam seed set on the REVERSED
    // directed demo graph — pages feeding the spam neighborhood score high
    "g_antitrust_t4" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      val spam = GraphOps.vertices(directed).filter(col("id") % 9 === 0)
      PageRank.antiTrust(directed, spam, iterations = 4)
        .select(col("id"),
          round(col("antitrust") * 1000000).cast("long").as("antitrust_e6"))
    }),

    // egonet density (OddBall): ego_edges = deg + tri per vertex, density
    // vs the full clique on deg+1 vertices — the link-farm signature
    "g_egonet" -> ((s, dir) =>
      TriangleCount.egonetDensity(demoEdges(s, dir))),

    "g_lp_t3" -> ((s, dir) => LabelPropagation.runFixed(demoEdges(s, dir), 3, symmetric = true)),

    // SCAN structural clustering at eps=0.25, mu=2 — neighborhood-
    // agreement communities with explicit core/border/outlier roles;
    // the sqrt-free integer comparison replays exactly in the oracle
    "g_scan_t2" -> ((s, dir) =>
      graft.algo.Scan.structuralClusters(demoEdges(s, dir),
        epsE3 = 250L, mu = 2L)),

    // average best-match community F1: the 3-superstep LP labeling
    // scored against the id%7 attribute partition (the g_nmi pairing)
    "g_comm_f1" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val pred = LabelPropagation.runFixed(e, 3, symmetric = true)
      val truth = GraphOps.vertices(e)
        .select(col("id"), (col("id") % 7).as("label"))
      Measures.communityF1(pred, truth)
    }),

    // LP convergence stability: best-match F1 between supersteps 2 and 3
    // — how much the partition still moves per superstep, the community-
    // level convergence diagnostic next to g_lp_metrics' change counts
    "g_lp_stability_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      Measures.communityF1(
        LabelPropagation.runFixed(e, 2, symmetric = true),
        LabelPropagation.runFixed(e, 3, symmetric = true))
    }),

    // superstep convergence telemetry (iter, changes, communities) of the
    // driven 3-superstep LP loop — the per-iteration scalars Superstep.run
    // extracts in its ONE aggregation job per superstep, i.e. what an
    // operator watches at 100 TB (VERDICT r4 task 6). plateau/earlyStop
    // off so the loop runs exactly 3 supersteps like the unrolled oracle.
    "g_lp_metrics_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val verts = GraphOps.vertices(e)
      val n = verts.count()
      val res = graft.engine.Superstep.run("lp",
        LabelPropagation.initLabels(verts),
        prev => LabelPropagation.superstep(e, prev, symmetric = true),
        n, earlyStop = false, plateau = false, maxIter = Some(3))
      import s.implicits._
      res.metrics.map(m => (m.iteration.toLong, m.changes, m.communities))
        .toDF("iter", "changes", "communities")
    }),

    // seed-constrained LP: ids % 25 == 0 carry fixed labels id % 3; the
    // frontier advances 3 hops, unreached vertices stay NULL
    "g_lp_seeded_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val seeds = GraphOps.vertices(e).filter(col("id") % 25 === 0)
        .select(col("id"), (col("id") % 3).as("label"))
      LabelPropagation.runSeededFixed(e, seeds, supersteps = 3)
    }),

    // weighted LP (argmax over summed incident edge weights per label),
    // 2 fixed supersteps on the weighted demo graph
    "g_lp_weighted_t2" -> ((s, dir) => {
      val e = demoWeightedEdges(s, dir)
      var labels = LabelPropagation.initLabels(
        GraphOps.vertices(e.select(col("src"), col("dst"))))
      // derive the weighted packed-argmax budget ONCE, not per superstep
      val packed = Some(LabelPropagation.packedBudgetOkWeighted(e))
      var i = 0
      while (i < 2) {
        i += 1
        labels = LabelPropagation.superstepWeighted(e, labels, symmetric = true,
          packedArgmax = packed)
      }
      labels
    }),

    "g_pagerank_t5" -> ((s, dir) =>
      PageRank.runFixed(demoEdges(s, dir), 5)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("rank_e6"))),

    // PageRank roughness: per-vertex Dirichlet energy of the e6 rank
    // signal — the local-smoothness spam fingerprint
    "g_rank_roughness_t5" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val pr = PageRank.runFixed(e, 5)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("score_e6"))
      Measures.signalRoughness(e, pr)
    }),

    // PageRank convergence telemetry: per-iteration L1 rank movement
    // Σ|r_k − r_{k−1}| — the residual curve an operator watches to pick
    // the iteration budget at 100 TB; per-vertex deltas rounded to e12
    // integers BEFORE the sum so the aggregate is order-free
    "g_pr_delta_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val verts = GraphOps.vertices(e)
      val n = verts.count()
      val chain: Seq[DataFrame] =
        verts.select(col("id"), lit(1.0 / n).as("rank")) +:
          (1 to 3).map(k => PageRank.runFixed(e, k))
      (1 to 3).map { k =>
        chain(k).select(col("id"), col("rank").as("rk"))
          .join(chain(k - 1).select(col("id"), col("rank").as("rp")), "id")
          .agg(sum(round(abs(col("rk") - col("rp")) * 1000000000000L)
            .cast("long")).cast("long").as("delta_e12"))
          .select(lit(k.toLong).as("iter"), col("delta_e12"))
      }.reduce(_ union _)
    }),

    // global top-10 by rank (integer-scaled, id tie-break): plans as
    // TakeOrderedAndProject — per-partition k-row reduction, no global
    // sort — the "give me the most important pages" staple
    "g_pr_top10" -> ((s, dir) =>
      PageRank.runFixed(demoEdges(s, dir), 3)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("rank_e6"))
        .orderBy(col("rank_e6").desc, col("id").asc)
        .limit(10)),

    // spam-mass estimate (Gyöngyi et al.): uniform-reset PageRank minus
    // trusted-set personalized PageRank, same 5-iteration schedule; the
    // relative-mass rounding mirrors the oracle's operand order exactly
    "g_spam_mass_t5" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val trusted = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      PageRank.spamMass(e, trusted, iterations = 5)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("rank_e6"),
          round(col("trust") * 1000000).cast("long").as("trust_e6"),
          round((col("rank") - col("trust")) * lit(1000000.0) / col("rank"))
            .cast("long").as("relmass_e6"))
    }),

    // SALSA, 3 fixed iterations on the directed demo graph (same table
    // as g_hits_t3) — degree-normalized gathers, L1 per half-step
    "g_salsa_t3" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.algo.Salsa.runFixed(directed, iterations = 3)
        .select(col("id"),
          round(col("auth") * 1000000).cast("long").as("auth_e6"),
          round(col("hub") * 1000000).cast("long").as("hub_e6"))
    }),

    // Katz centrality, 3 fixed iterations, α=1/200 β=1 — exact integer
    // iterate (z_k = 200^k·x_k), one deterministic division at the end
    "g_katz_t3" -> ((s, dir) =>
      graft.algo.Spectral.katzWalkSums(demoEdges(s, dir), iterations = 3,
          invAlpha = 200L)
        .select(col("id"),
          round(col("z") * lit(1000000.0) / lit(8000000.0))
            .cast("long").as("katz_e6"))),

    // eigenvector-centrality power iterate after 3 steps: exact integer
    // walk counts plus the single final L1 normalization, with the
    // normalization's operand order mirrored verbatim in the oracle
    "g_eigen_t3" -> ((s, dir) => {
      val w = graft.algo.Spectral.eigenvectorWalkCounts(demoEdges(s, dir), 3)
      val tot = w.agg(sum(col("walks")).as("_t"))
      w.crossJoin(tot)
        .select(col("id"), col("walks"),
          round(col("walks") * lit(1000000.0) / col("_t"))
            .cast("long").as("score_e6"))
    }),

    // full coreness decomposition on the fixed schedule (k=1..8, 3 peel
    // rounds per level) over the SPARSE demo graph
    "g_coreness" -> ((s, dir) =>
      graft.algo.KCore.corenessFixed(sparseDemoEdges(s, dir),
        maxK = 8, roundsPerK = 3)),

    // onion decomposition on the same fixed (k=1..8, 3 rounds/level)
    // schedule: layer = index of the peel step that removed the vertex
    "g_onion_layers" -> ((s, dir) =>
      graft.algo.KCore.onionLayersFixed(sparseDemoEdges(s, dir),
        maxK = 8, roundsPerK = 3)),

    // joint degree distribution (degree-mixing matrix): slot counts per
    // (k_src, k_dst) degree pair — the 2-D structure assortativity
    // collapses to one number
    "g_joint_degree" -> ((s, dir) =>
      graft.measures.Measures.jointDegreeDistribution(demoEdges(s, dir))),

    // average neighbor degree (exact integer numerator/denominator,
    // single final division mirrored by the oracle)
    "g_annd" -> ((s, dir) =>
      graft.measures.Measures.avgNeighborDegree(demoEdges(s, dir))
        .select(col("id"), col("deg"), col("sum_nbr_deg"),
          round(col("sum_nbr_deg") * lit(1000000.0) / col("deg"))
            .cast("long").as("annd_e6"))),

    // rich-club coefficient φ(k), k = 1..16
    "g_richclub" -> ((s, dir) =>
      graft.measures.Measures.richClub(demoEdges(s, dir), maxK = 16)),

    "g_triangles" -> ((s, dir) =>
      oneRow(s, "triangles", TriangleCount.countTriangles(demoEdges(s, dir)))),

    "g_tri_per_vertex" -> ((s, dir) => TriangleCount.perVertex(demoEdges(s, dir))),

    // 4-truss, 2 fixed peel rounds: every original canonical edge with a
    // flag for surviving both support>=2 filters
    "g_truss_t2" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val surv = graft.algo.Truss.peelFixed(e, k = 4, rounds = 2)
        .withColumn("in_truss", lit(1L))
      GraphOps.canonical(e).join(surv, Seq("src", "dst"), "left")
        .select(col("src"), col("dst"),
          coalesce(col("in_truss"), lit(0L)).as("in_truss"))
    }),

    // full truss decomposition, fixed schedule (k = 3..5 × 2 rounds):
    // max k whose survivor set keeps the edge, 2 = in no level
    "g_trussness" -> ((s, dir) =>
      graft.algo.Truss.trussnessFixed(demoEdges(s, dir),
        maxK = 5, roundsPerK = 2)),

    // weighted triangle census: bottleneck (min) weight + total weight
    // per triangle, exact longs over the weighted demo graph
    "g_tri_weighted" -> ((s, dir) =>
      TriangleCount.weightedTriangles(demoWeightedEdges(s, dir))),

    // size-constrained balanced LP sharding, k=4, 2 fixed supersteps
    "g_partition_t2" -> ((s, dir) =>
      graft.graph.Partition.balancedLp(demoEdges(s, dir), k = 4, iters = 2)),

    // layout audit of that sharding: edge-cut fraction + balance
    "g_partition_cut" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      graft.graph.Partition.cutQuality(e,
        graft.graph.Partition.balancedLp(e, k = 4, iters = 2))
    }),

    // PowerGraph vertex-cut baseline: md5 edge hashing to 8 shards,
    // replication factor = mean shards per vertex
    "g_vertex_cut" -> ((s, dir) =>
      graft.graph.Partition.vertexCutStats(demoEdges(s, dir), k = 8)),

    // GraphX EdgePartition2D layout: 4x4 grid, replication bounded at
    // rows + cols - 1 per vertex regardless of degree
    "g_grid_cut" -> ((s, dir) =>
      graft.graph.Partition.grid2dStats(demoEdges(s, dir), rows = 4,
        cols = 4)),

    // community quotient graph over a deterministic 7-label partition
    // (the conductance gate's labeling) — graph summarization
    "g_quotient" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      graft.graph.Partition.quotient(e,
        GraphOps.vertices(e).select(col("id"), (col("id") % 7).as("label")))
    }),

    // Hill/MLE power-law exponent of the degree distribution (e6)
    "g_powerlaw" -> ((s, dir) =>
      Measures.powerLawAlpha(demoEdges(s, dir), dMin = 2L)),

    // per-edge embeddedness: common neighbors, Onnela neighborhood
    // overlap, local-bridge flag (common = 0 — Granovetter's weak tie);
    // the per-edge feature a link-spam classifier starts from
    "g_embeddedness" -> ((s, dir) =>
      graft.algo.Truss.edgeEmbeddedness(demoEdges(s, dir))),

    // augmented Forman–Ricci curvature per edge: 4 − du − dv + 3·support
    // — exact-integer bridge-vs-backbone fingerprint
    "g_forman" -> ((s, dir) =>
      graft.algo.Truss.formanCurvature(demoEdges(s, dir))),

    // non-backtracking walk counts (Hashimoto power iteration, 3 steps):
    // hub-echo-free spectral centrality; cap above the demo max degree
    // so the gate certifies the exact semantics
    "g_nonbacktrack_t3" -> ((s, dir) =>
      graft.algo.Spectral.nonBacktracking(demoEdges(s, dir), iterations = 3)),

    // closed-walk counts (subgraph-centrality iterates): deg, 2·tri,
    // deg² + Σ cn² — exact A^k diagonals, cap above the demo max degree
    "g_closed_walks" -> ((s, dir) =>
      graft.algo.Spectral.closedWalkCounts(demoEdges(s, dir))),

    // one-level map-equation codelength of the id%7 partition (the
    // g_conductance pairing) — the Infomap objective in bits, e6-rounded
    "g_map_equation" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val labels = GraphOps.vertices(e)
        .select(col("id"), (col("id") % 7).as("label"))
      oneRow(s, "map_e6",
        math.round(Measures.mapEquation(e, labels) * 1000000))
    }),

    // Borgatti–Everett discrete core–periphery fit with the k-core as
    // the discrete core (k = floor(avg degree), the g_kcore_t3 schedule)
    "g_coreperiphery_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val k = e.count() / GraphOps.vertices(e).count()
      Measures.corePeriphery(e, k, rounds = 3)
    }),

    // exact closeness/harmonic centrality: every vertex a source at the
    // shared depth cap — closes the sampled variant's exactness gap the
    // way g_bc_exact closed Brandes'
    "g_harmonic_exact" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      graft.algo.Centrality.sampledCloseness(e, GraphOps.vertices(e))
        .select(col("id"), col("reached"),
          round(col("harmonic") * 1000000).cast("long").as("harmonic_e6"),
          round(col("closeness") * 1000000).cast("long").as("closeness_e6"))
    }),

    // small-world sigma: measured (C, L) against the configuration-null
    // C and the ER-expected L — the clustered-yet-short-paths panel
    "g_small_world" -> ((s, dir) =>
      Measures.smallWorldSigma(demoEdges(s, dir))),

    // C(k) hierarchy curve (Ravasz–Barabási): mean local clustering per
    // degree value — 1/k decay = hierarchical modularity, flat = link
    // blocks; per-vertex LCC e6-rounded before the per-degree mean
    "g_ck_curve" -> ((s, dir) =>
      TriangleCount.clusteringByDegree(demoEdges(s, dir))),

    // per-community modularity ledger over the LP-3 labeling: Q_c sums
    // to g_modularity's Q (same i≠j slot conventions) — which
    // communities carry the structure, which are merge/split candidates
    "g_comm_modularity" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      Measures.perCommunityModularity(e,
        LabelPropagation.runFixed(e, 3, symmetric = true))
    }),

    // Leiden-style connectivity refinement of the LP-3 labeling: every
    // internally-disconnected community splits into its connected parts
    // (CC over the intra-community subgraph), singletons kept explicit
    "g_refine_connected" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      graft.algo.Louvain.refineConnected(e,
        LabelPropagation.runFixed(e, 3, symmetric = true))
    }),

    // CheiRank: PageRank over the TRANSPOSED directed graph — ranks
    // pages by how communicatively they LINK OUT (hub-ness), the dual
    // axis to PageRank's authority on the 2D rank plane used in web
    // spam taxonomy; dangling mass refolded per step by runFixed
    "g_cheirank_t3" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      PageRank.runFixed(
          directed.select(col("dst").as("src"), col("src").as("dst")),
          iterations = 3)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("cheirank_e6"))
    }),

    // partition coverage + performance (Fortunato) of the 3-superstep
    // LP labeling — the two community-quality scalars beside modularity
    "g_part_quality" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      Measures.partitionQuality(e,
        LabelPropagation.runFixed(e, 3, symmetric = true))
    }),

    // OPIC crawl-ordering importance (Abiteboul): un-damped cash
    // propagation with uniform dangling refold + accumulated history,
    // 3 synchronous steps on the directed demo graph
    "g_opic_t3" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      PageRank.opicFixed(directed, iterations = 3)
        .select(col("id"),
          round(col("cash") * 1000000).cast("long").as("cash_e6"),
          round(col("hist") * 1000000).cast("long").as("hist_e6"))
    }),

    // global motif census — wedges / triangles / squares (4-cycles) /
    // transitivity; exact integer counts (each 4-cycle counted via its
    // two diagonal common-neighbor pairs, sum provably even)
    "g_motifs" -> ((s, dir) =>
      TriangleCount.motifCensus(demoEdges(s, dir))
        .select(col("wedges"), col("triangles"), col("squares"),
          round(col("transitivity") * 1000000).cast("long")
            .as("transitivity_e6"))),

    // small-world diagnostic: measured transitivity against the
    // configuration-model null C_null = (S2−S1)²/S1³ (Newman) — a ratio
    // >> 1 is real community structure, ≈ 1 is what random wiring with
    // the same degrees already gives; integer moments, scalar divides
    "g_null_clustering" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val cActual = TriangleCount.motifCensus(e)
        .select(col("transitivity").as("ca"))
      val m = Measures.degreeMoments(e)
        .select(col("n_slots").cast("double").as("s1"),
          col("sum_d2").cast("double").as("s2"))
      m.crossJoin(cActual)
        .select(
          round(col("ca") * 1000000).cast("long").as("c_actual_e6"),
          round((col("s2") - col("s1")) * (col("s2") - col("s1"))
            / (col("s1") * col("s1") * col("s1")) * 1000000)
            .cast("long").as("c_null_e6"),
          round(col("ca") * (col("s1") * col("s1") * col("s1"))
            / ((col("s2") - col("s1")) * (col("s2") - col("s1"))) * 1000)
            .cast("long").as("ratio_e3"))
    }),

    // rank-mass concentration: Shannon entropy of the 3-iteration
    // PageRank distribution, per-vertex terms −r·ln r rounded to e12
    // integers BEFORE the sum (order-free), plus H/ln(n) normalization —
    // the "how centralized is the web graph" scalar next to ev_gini
    // top-20 PageRank mass share: importance concentration at the head
    // (complements g_pr_entropy/gini with the serving-cache question:
    // how much of the mass does a 20-page cache cover?)
    "g_pr_mass_topk" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val r = PageRank.runFixed(e, 5)
        .select(col("id"), round(col("rank") * 1000000).cast("long")
          .as("rank_e6"))
      r.orderBy(col("rank_e6").desc, col("id").asc).limit(20)
        .agg(sum(col("rank_e6")).cast("long").as("mass_e6"))
        .select(lit(20L).as("k"), col("mass_e6"))
    }),

    // PageRank top-k stability: Jaccard of the top-20 at iteration 3 vs
    // iteration 5 — the top-of-ranking view converges before the scores
    // do, and THIS is the signal that picks a serving iteration budget
    "g_pr_topk_overlap" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      def top(iters: Int) = PageRank.runFixed(e, iters)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("r"))
        .orderBy(col("r").desc, col("id").asc).limit(20)
        .select(col("id"))
      top(3).join(top(5), Seq("id"))
        .agg(count(lit(1)).as("n_common"))
        .select(lit(20L).as("k"), col("n_common"),
          round(col("n_common").cast("double") * 1000000
            / (lit(40L) - col("n_common"))).cast("long").as("jaccard_e6"))
    }),

    // per-community triangle census: cohesion per LP(3) community (the
    // triangle-level refinement of g_comm_connectivity's intra-edge
    // counts); canonical a<b<c enumeration, labels joined on all three
    "g_comm_triangles" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val lab = LabelPropagation.runFixed(e, 3, symmetric = true)
      val canon = e.filter(col("src") < col("dst"))
      val tri = canon.select(col("src").as("a"), col("dst").as("b"))
        .join(canon.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
        .join(canon.select(col("src").as("a"), col("dst").as("c")),
          Seq("a", "c"))
      tri.join(lab.select(col("id").as("a"), col("label").as("la")), "a")
        .join(lab.select(col("id").as("b"), col("label").as("lb")), "b")
        .join(lab.select(col("id").as("c"), col("label").as("lc")), "c")
        .filter(col("la") === col("lb") && col("lb") === col("lc"))
        .groupBy(col("la").as("label")).agg(count(lit(1)).as("n_triangles"))
    }),

    // entropy of the LP(3) community-size distribution — one number for
    // "one giant blob vs balanced structure", the labeling-side sibling
    // of g_pr_entropy (same order-free e12-term contract)
    "g_comm_entropy" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sizes = LabelPropagation.runFixed(e, 3, symmetric = true)
        .groupBy(col("label")).agg(count(lit(1)).as("sz"))
      val tot = sizes.agg(sum(col("sz")).as("n"),
        count(lit(1)).as("n_communities"))
      sizes.crossJoin(tot)
        .select(col("n"), col("n_communities"),
          round(-(col("sz").cast("double") / col("n"))
            * log(col("sz").cast("double") / col("n")) * 1000000000000L)
            .cast("long").as("t"))
        .groupBy(col("n").cast("long").as("n_vertices"),
          col("n_communities"))
        .agg(sum(col("t")).cast("long").as("h_e12"))
    }),

    "g_pr_entropy" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val r = PageRank.runFixed(e, 3)
      r.agg(count(lit(1)).as("n"),
          sum(round(-col("rank") * log(col("rank")) * 1000000000000L)
            .cast("long")).cast("long").as("h_e12"))
        .select(col("n").cast("long").as("n_vertices"), col("h_e12"),
          round(col("h_e12") / (log(col("n").cast("double")) * 1000000.0))
            .cast("long").as("norm_e6"))
    }),

    "g_modularity" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val n = GraphOps.vertices(e).count()
      val lab = ConnectedComponents.run(e, n).labels
      oneRow(s, "q_e6", math.round(Measures.modularity(e, lab) * 1000000))
    }),

    // weighted modularity of the CC partition over the weighted demo graph
    "g_modularity_weighted" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val ew = demoWeightedEdges(s, dir)
      val n = GraphOps.vertices(e).count()
      val lab = ConnectedComponents.run(e, n).labels
      oneRow(s, "qw_e6",
        math.round(Measures.modularityWeighted(ew, lab) * 1000000))
    }),

    "g_community_count" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val n = GraphOps.vertices(e).count()
      oneRow(s, "communities",
        Measures.communityCount(ConnectedComponents.run(e, n).labels))
    }),

    "g_nmi" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val n = GraphOps.vertices(e).count()
      val cc = ConnectedComponents.run(e, n).labels
      val attr = GraphOps.vertices(e).select(col("id"), (col("id") % 7).as("label"))
      oneRow(s, "nmi_e6", math.round(Measures.nmi(attr, cc) * 1000000))
    }),

    // lexicographic dictionary encode (std::map id-assignment parity,
    // Graph.cu:284-292) over a real string column
    "g_dict_encode" -> ((s, dir) => {
      val names = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_mktsegment").as("name"))
      GraphOps.dictionaryEncode(names)
    }),

    // degree-ascending re-encode (`sorted=1`, Graph.cu:254-282)
    "g_degree_reorder" -> ((s, dir) =>
      GraphOps.degreeReorder(demoEdges(s, dir))
        .select(col("id"), col("newId").as("new_id"))),

    // Brandes betweenness, sampled sources — full DuckDB oracle since
    // round 3 ([[bcSql]]): σ/δ unrolled to the SHARED depth bound, so the
    // engine runs with the same `maxDepth` the oracle unrolls to
    "g_bc_sampled" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sources = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      graft.algo.Betweenness.run(e, sources, maxDepth = BcUnrollDepth)
        .select(col("id"), round(col("bc") * 1000).cast("long").as("bc_e3"))
    }),

    // EXACT Brandes (every vertex a source) at the same shared unroll
    // depth — closes the last sbt-only algorithm variant (VERDICT r4
    // task 8); the sampled gate above stays the scale-shaped default
    "g_bc_exact" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      graft.algo.Betweenness.run(e, GraphOps.vertices(e),
          maxDepth = BcUnrollDepth)
        .select(col("id"), round(col("bc") * 1000).cast("long").as("bc_e3"))
    }),

    // EDGE betweenness (Girvan–Newman primitive), sampled sources at the
    // shared unroll depth: the same backward pass aggregated per directed
    // slot; every slot appears (0 off all shortest-path DAGs).
    // Quantization is an epsilon-shifted half-up floor, NOT round(): true
    // edge scores are σ-ratio rationals that land EXACTLY on k+0.5
    // permille (e.g. 27/80 → 337.5), where each engine's float-sum order
    // puts it on a different side of the tie; shifting the boundary 1e-8
    // below the tie makes both engines agree (float noise is ~1e-10 at
    // this magnitude, true values never sit within 1e-8 of the shifted
    // boundary on denominators this small)
    "g_edge_bc" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sources = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      graft.algo.Betweenness.runEdges(e, sources, maxDepth = BcUnrollDepth)
        .select(col("src"), col("dst"),
          floor(col("eb") * 1000 + 0.5 + 1e-8).cast("long").as("eb_e3"))
    }),

    // double-sweep diameter lower bound: BFS from min id, BFS again from
    // the farthest vertex found — the 2-BFS estimator vs the exact sweep
    "g_double_sweep" -> ((s, dir) =>
      graft.algo.Centrality.doubleSweep(demoEdges(s, dir))),

    // 3 fixed supersteps over the CSR-blocked adjacency form — gates
    // [[LabelPropagation.superstepCsr]] (+ csrBlocks/cooFromCsr) against
    // the SAME unrolled-superstep SQL as the COO plan: the storage form
    // must not change the semantics
    "g_lp_csr_t3" -> ((s, dir) => {
      val blocks = GraphOps.csrBlocks(demoEdges(s, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var labels = LabelPropagation.initLabels(blocks.select(col("id")))
      // derive the packed-argmax budget ONCE, not per superstep
      val packed = Some(LabelPropagation.packedBudgetOk(GraphOps.cooFromCsr(blocks)))
      var i = 0
      while (i < 3) {
        i += 1
        labels = LabelPropagation.superstepCsr(blocks, labels, packedArgmax = packed)
      }
      labels
    }),

    // 3 fixed supersteps through the hot/cold skew plan (broadcast gather
    // for high-in-degree vertices) — the engine's main custom physical
    // routing, gated label-exact against the plain-plan oracle. The low
    // threshold forces a real hot slice on the demo graph (avg degree ~50)
    "g_lp_skew_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val plan = GraphOps.planSkew(e, threshold = 40, partitions = 8)
      var labels = LabelPropagation.initLabels(GraphOps.vertices(e))
      var i = 0
      while (i < 3) { i += 1; labels = LabelPropagation.superstepSkewAware(plan, labels) }
      labels
    }),

    // 3 fixed supersteps through the AUTO-DERIVED skew plan (threshold
    // from the in-degree distribution, GraphOps.planSkewAuto — SURVEY
    // §7.4's "computed from the degree distribution at load"): lenient
    // quantile/floor + high partition count so the near-uniform demo
    // graph still derives a real hot slice at every SF; labels must be
    // routing-invariant, so the oracle is the same plain-plan lpSql(3).
    // If no hot set derives (tiny SF), the fallback is the plain
    // superstep — same labels either way, which is exactly the contract
    // under test.
    "g_lp_autoskew_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val plan = GraphOps.planSkewAuto(e, partitions = 256,
        quantile = 0.6, floorFactor = 1.0)
      var labels = LabelPropagation.initLabels(GraphOps.vertices(e))
      var i = 0
      plan match {
        case Some(p) =>
          while (i < 3) { i += 1
            labels = LabelPropagation.superstepSkewAware(p, labels) }
        case None =>
          while (i < 3) { i += 1
            labels = LabelPropagation.superstep(e, labels, symmetric = true) }
      }
      plan.foreach(GraphOps.unpersistSkew)
      labels
    }),

    // 2 Gauss–Seidel sweeps over 4 modulo classes — gates
    // [[graft.algo.SemiSyncLP.sweepByClasses]], the schedule machinery
    // shared by semi-sync LP and the async emulation, with a class
    // assignment (id % 4) both engines can express ([[semisyncSql]])
    "g_lp_semisync_t2" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val classes = GraphOps.vertices(e).select(col("id"), (col("id") % 4).as("cls"))
      val n = GraphOps.vertices(e).count()
      graft.algo.SemiSyncLP.sweepByClasses(e, classes, 4L, n,
        maxSweeps = Some(2))._1
    }),

    // multi-source BFS shortest-path levels (the forward pass of Brandes,
    // oracled via a depth-bounded recursive closure)
    "g_bfs_levels" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sources = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      graft.algo.Betweenness.bfsLevels(e, sources)
    }),

    // legacy reference-format reader gates: the query materializes a tiny
    // deterministic fixture file, reads it back through GraphReaders, and
    // the oracle recomputes from an inline VALUES literal of the same
    // fixture — end-to-end coverage of the §2.1 scan+encode semantics
    // (comments/blank lines skipped, undirected doubling, multi-edge keep
    // for txt / dedup+min-cost for Pajek, lexicographic dictionary ids,
    // first-wins ground truth)
    "g_read_txt" -> ((s, dir) => {
      val path = writeFixture("edges.txt", TxtFixture)
      graft.sources.GraphReaders.readEdgeListTxt(s, path, directed = false)._1
    }),

    "g_read_net" -> ((s, dir) => {
      val path = writeFixture("graph.net", NetFixture)
      val (edges, _) = graft.sources.GraphReaders.readPajekNet(s, path)
      edges.select(col("src"), col("dst"),
        round(col("weight") * 1000).cast("long").as("w_e3"))
    }),

    "g_read_gt" -> ((s, dir) => {
      val tpath = writeFixture("edges.txt", TxtFixture)
      val gpath = writeFixture("gt.txt", GtFixture)
      val (_, dict) = graft.sources.GraphReaders.readEdgeListTxt(s, tpath, directed = false)
      graft.sources.GraphReaders.readGroundTruth(s, gpath, dict)
    }),

    // communities sink (reference saveCommunitiesinFile, Graph.cu:175-194):
    // write the ground-truth labels through the name\tlabel sink and read
    // them back — closes the last §2.1 operator without a driver gate
    // (VERDICT r3 task 6); oracled by the same VALUES dictionary as
    // g_read_gt, emitting names instead of ids
    "g_write_comm" -> ((s, dir) => {
      val tpath = writeFixture("edges.txt", TxtFixture)
      val gpath = writeFixture("gt.txt", GtFixture)
      val (_, dict) = graft.sources.GraphReaders.readEdgeListTxt(s, tpath, directed = false)
      val labels = graft.sources.GraphReaders.readGroundTruth(s, gpath, dict)
      val sink = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_fixtures", "comm_sink").toString
      graft.sources.GraphReaders.writeCommunities(labels, dict, sink)
      s.read.option("sep", "\t").schema("name STRING, label BIGINT").csv(sink)
    }),

    // semi-sync LP driven by the REAL Jones–Plassmann coloring (not the
    // modulo stand-in of g_lp_semisync_t2): the oracle replays a literal
    // transcription of the coloring, and the query hard-fails if the
    // computed coloring ever diverges from it — so a green row certifies
    // the actual coloring schedule (VERDICT r3 task 5). Fixture graph,
    // SF-independent (a transcription cannot track per-SF demo graphs).
    "g_lp_semisync_colored" -> ((s, dir) => {
      import s.implicits._
      val pairs = ColorFixturePairs.map { case (a, b) => (a.toLong, b.toLong) }
        .toDF("src", "dst")
      val e = GraphOps.symmetrize(GraphOps.dropSelfLoops(pairs))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val colors = graft.algo.SemiSyncLP.greedyColoring(e)
      val got = colors.collect().map(r => r.getLong(0).toInt -> r.getInt(1)).toMap
      require(got == ColorFixtureColoring.toMap,
        s"Jones–Plassmann coloring diverged from the oracle transcription: $got")
      val cls = colors.select(col("id"), col("color").cast("long").as("cls"))
      val n = GraphOps.vertices(e).count()
      val k = ColorFixtureColoring.map(_._2).max + 1
      val out = graft.algo.SemiSyncLP.sweepByClasses(e, cls, k.toLong, n,
        maxSweeps = Some(2))._1
      e.unpersist(blocking = false)
      out
    }),

    // adjacency test (reference getAij, set form): which of the probe
    // pairs (i, i+1) are edges — a left-semi existence join
    "g_adjacent" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val pairs = s.range(0, NodeSpace.toLong)
        .select(col("id").as("src"), ((col("id") + 1) % NodeSpace).as("dst"))
      GraphOps.adjacent(e, pairs)
    }),

    // neighborhood slice of one vertex (reference getEdgesEdpoints) — a
    // pushed-down point lookup
    "g_neighbors" -> ((s, dir) =>
      GraphOps.neighbors(demoEdges(s, dir), 42L)),

    // local clustering coefficient (Watts–Strogatz) — every vertex, 0 for
    // degree < 2 or triangle-free
    "g_lcc" -> ((s, dir) =>
      graft.algo.TriangleCount.localClustering(demoEdges(s, dir))
        .select(col("id"),
          round(col("lcc") * 1000000).cast("long").as("lcc_e6"))),

    // harmonic + closeness centrality over the sampled source set (the
    // same sources as g_bfs_levels; one extra aggregation over the BFS)
    "g_centrality_sampled" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sources = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      graft.algo.Centrality.sampledCloseness(e, sources)
        .select(col("id"), col("reached"),
          round(col("harmonic") * 1000000).cast("long").as("harmonic_e6"),
          round(col("closeness") * 1000000).cast("long").as("closeness_e6"))
    }),

    // weighted multi-source shortest paths, 4 fixed Bellman–Ford rounds
    // on the weighted demo graph (integer distances ⇒ unrounded compare)
    "g_sssp_t4" -> ((s, dir) => {
      val ew = demoWeightedEdges(s, dir)
      val sources = GraphOps.vertices(ew.select(col("src"), col("dst")))
        .filter(col("id") % 100 === 0)
      graft.algo.ShortestPaths.runFixed(ew, sources, rounds = 4)
    }),

    // 3 peel rounds toward the k-core at k = floor(avg degree) — every
    // vertex emitted with its survival flag so the row count is stable at
    // any scale factor even when the cascade empties the core
    "g_kcore_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val verts = GraphOps.vertices(e)
      val k = e.count() / verts.count() // floor(avg degree), mirrored in SQL
      val core = graft.algo.KCore.peelFixed(e, k, rounds = 3)
      verts.join(core.select(col("id").as("cid")), col("id") === col("cid"), "left")
        .select(col("id"),
          when(col("cid").isNotNull, lit(1L)).otherwise(lit(0L)).as("in_core"))
    }),

    // weighted (s-)core, 3 peel rounds at s = floor(total weight / n) —
    // strength = exact integer sum of incident weights to live neighbors
    "g_wcore_t3" -> ((s, dir) => {
      val we = demoWeightedEdges(s, dir)
      val verts = GraphOps.vertices(we)
      val thr = we.agg(sum(col("weight")).cast("long")).first().getLong(0) /
        verts.count() // floor(avg strength), mirrored in SQL
      val core = graft.algo.KCore.weightedCoreFixed(we, thr, rounds = 3)
      verts.join(core.select(col("id").as("cid")), col("id") === col("cid"), "left")
        .select(col("id"),
          when(col("cid").isNotNull, lit(1L)).otherwise(lit(0L)).as("in_core"))
    }),

    // deterministic random walks (DeepWalk-corpus shape), 4 steps from
    // the sampled starts; step choice = LCG mix mod degree, replayable
    // by the oracle
    "g_walks_l4" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val starts = GraphOps.vertices(e).filter(col("id") % 100 === 0)
      graft.algo.RandomWalks.walks(e, starts, length = 4)
    }),

    // walk-corpus coverage: visit-count histogram of the l=4 walk corpus
    // INCLUDING the zero-visit mass — the embedding-corpus quality audit
    // (unvisited vertices get no training signal at all)
    "g_walk_coverage" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val starts = GraphOps.vertices(e).filter(col("id") % 100 === 0)
      val w = graft.algo.RandomWalks.walks(e, starts, length = 4)
      val visits = w.groupBy(col("vertex").as("id"))
        .agg(count(lit(1)).as("visits"))
      val hist = visits.groupBy(col("visits"))
        .agg(count(lit(1)).as("n_vertices"))
      val cov = visits.agg(count(lit(1)).as("cov"))
      val tot = GraphOps.vertices(e).agg(count(lit(1)).as("n"))
      hist.select(col("visits").cast("long").as("visits"),
          col("n_vertices"))
        .union(cov.crossJoin(tot).select(lit(0L).as("visits"),
          (col("n") - col("cov")).cast("long").as("n_vertices")))
    }),

    // word2vec-SGNS training pairs from the same walk corpus, window 2
    "g_walk_pairs" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val starts = GraphOps.vertices(e).filter(col("id") % 100 === 0)
      graft.algo.RandomWalks.skipGramPairs(
        graft.algo.RandomWalks.walks(e, starts, length = 4), window = 2)
    }),

    // PMI association scores of the walk-pair corpus (the matrix SGNS
    // implicitly factorizes)
    "g_sgns_pmi" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val starts = GraphOps.vertices(e).filter(col("id") % 100 === 0)
      graft.algo.SkipGram.pmiScores(
        graft.algo.RandomWalks.skipGramPairs(
          graft.algo.RandomWalks.walks(e, starts, length = 4), window = 2))
    }),

    // deterministic unigram^(3/4) negative sampling, 3 draws per pair
    "g_sgns_neg" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val starts = GraphOps.vertices(e).filter(col("id") % 100 === 0)
      graft.algo.SkipGram.negativeSamples(e,
        graft.algo.RandomWalks.skipGramPairs(
          graft.algo.RandomWalks.walks(e, starts, length = 4), window = 2),
        k = 3)
    }),

    // terminal SGNS artifact: pairs + packed draw-ordered negatives
    "g_sgns_examples" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val starts = GraphOps.vertices(e).filter(col("id") % 100 === 0)
      val pairs = graft.algo.RandomWalks.skipGramPairs(
        graft.algo.RandomWalks.walks(e, starts, length = 4), window = 2)
      graft.algo.SkipGram.trainingExamples(pairs,
        graft.algo.SkipGram.negativeSamples(e, pairs, k = 3))
    }),

    // GraphSAGE-style 2-layer sampled computation graph, fanouts (3, 2)
    "g_sage_sample" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val seeds = GraphOps.vertices(e).filter(col("id") % 100 === 0)
      graft.algo.RandomWalks.neighborSample(e, seeds, Seq(3, 2))
    }),

    // three Luby MIS rounds over seeded md5 priorities
    "g_mis_t3" -> ((s, dir) =>
      graft.algo.Mis.misFixed(demoEdges(s, dir), seed = 7L, rounds = 3)),

    // node2vec-style second-order biased walks, 3 steps, integer weights
    // (return 1, shared neighbor 2, far 4) — exact integer selection
    "g_walks_biased_l3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val starts = GraphOps.vertices(e).filter(col("id") % 20 === 0)
      graft.algo.RandomWalks.walksBiased(e, starts, length = 3)
    }),

    // degree assortativity (Newman) of the demo graph — exact integer
    // sums, one final double division, bit-reproducible in the oracle
    "g_assortativity" -> ((s, dir) =>
      oneRow(s, "r_e6", math.round(
        Measures.degreeAssortativity(demoEdges(s, dir)) * 1000000))),

    // link-prediction scores (common neighbors + Adamic–Adar) for the
    // probe pairs (i, i+2) — every pair emitted, zero for disjoint
    // neighborhoods
    "g_linkpred" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val pairs = s.range(0, NodeSpace.toLong)
        .select(col("id").as("src"), ((col("id") + 2) % NodeSpace).as("dst"))
      graft.algo.LinkPrediction.scores(e, pairs)
        .select(col("src"), col("dst"), col("common"),
          round(col("aa") * 1000000).cast("long").as("aa_e6"),
          round(col("jaccard") * 1000000).cast("long").as("jaccard_e6"),
          col("pa"))
    }),

    // HITS hubs/authorities, 3 fixed iterations — the one gate that runs
    // on the raw DIRECTED edge set (hub and authority collapse to the
    // same vector on a symmetrized graph)
    // crawl-health degree-balance row over the DIRECTED demo graph:
    // dangling/orphan counts + in/out-degree Pearson
    "g_inout_profile" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      Measures.inOutProfile(directed)
    }),

    // flow-hierarchy profile: forward/backward/level edge census under
    // the indeg−outdeg score — no global ordering, scores equi-join
    // onto the edge list
    "g_hierarchy" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      Measures.hierarchy(directed)
    }),

    "g_hits_t3" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.algo.Hits.runFixed(directed, iterations = 3)
        .select(col("id"),
          round(col("auth") * 1000000).cast("long").as("auth_e6"),
          round(col("hub") * 1000000).cast("long").as("hub_e6"))
    }),

    // weighted PageRank, 3 fixed iterations over the weighted demo graph
    // (rank flows proportionally to edge-weight share of out-weight)
    "g_pagerank_w_t3" -> ((s, dir) =>
      PageRank.runFixedWeighted(demoWeightedEdges(s, dir), iterations = 3)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("rank_e6"))),

    // batch topic-sensitive PageRank (Haveliwala): TWO personalization
    // vectors in one long-format (topic, id, rank) loop — the shuffle
    // count is k-independent, the portfolio shape a ranking stack runs
    "g_ppr_topics_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val v = GraphOps.vertices(e)
      val seeds = v.filter(col("id") % 50 === 0)
        .select(lit(0L).as("topic"), col("id"))
        .union(v.filter(col("id") % 50 === 25)
          .select(lit(1L).as("topic"), col("id")))
      PageRank.runTopicsFixed(e, seeds, iterations = 3)
        .select(col("topic"), col("id"),
          round(col("rank") * 1000000).cast("long").as("rank_e6"))
    }),

    // personalized PageRank, 5 fixed iterations, teleport mass pinned to
    // the sampled source set
    "g_ppr_t5" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sources = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      PageRank.runPersonalizedFixed(e, sources, iterations = 5)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("rank_e6"))
    }),

    // SybilRank: 3 steps of teleport-free degree-normalized trust from
    // the %10 seed set, ranked by trust/deg (low = suspicious region)
    "g_sybilrank_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val seeds = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      PageRank.sybilRankFixed(e, seeds, iterations = 3)
        .select(col("id"),
          round(col("trust") * 1000000).cast("long").as("trust_e6"),
          round(col("score") * 1000000000).cast("long").as("score_e9"))
    }),

    // ACL sweep cut over the PPR ordering: conductance of every top-64
    // prefix — the certified local-community extractor around the seeds
    "g_ppr_sweep_t5" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sources = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      val scores = PageRank.runPersonalizedFixed(e, sources, iterations = 5)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("score_e6"))
      graft.algo.SweepCut.conductanceSweep(e, scores, m = 64)
    }),

    // 2 synchronous Louvain move rounds (modularity-ascent community
    // detection) on the unit-weight demo graph — the gain argmax is exact
    // integer arithmetic (2m·k_id − k_i·Σtot') with the pinned move rules
    // (strict improvement, direction alternation by round parity, min
    // community id), so the oracle replays it bit-for-bit
    "g_louvain_t2" -> ((s, dir) =>
      graft.algo.Louvain.moveFixed(
        demoEdges(s, dir).withColumn("weight", lit(1L)), rounds = 2)),

    // degree-distribution histogram — the summary the auto-skew threshold
    // derives from, as a user-facing operator
    "g_degree_hist" -> ((s, dir) =>
      GraphOps.degreeHistogram(demoEdges(s, dir))),

    // strongly connected components of the DIRECTED demo graph (the same
    // directed table as g_hits_t3) — canonical min-member labels, so the
    // peeling-order-free oracle is plain mutual reachability
    "g_scc" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.algo.StronglyConnected.run(directed)._1
    }),

    // co-citation pairs over the directed demo graph (same table as
    // g_scc): shared-citer counts with the out-degree-≤20 hub cap (avg
    // out-degree is ~27, so the cap path genuinely filters) and the
    // n ≥ 2 tail prune
    "g_cocitation" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.algo.CoCitation.coCitation(directed, maxOutDeg = 20, minCount = 2)
    }),

    // bibliographic coupling on the same table: shared-cited counts with
    // the mirror-image in-degree cap
    "g_coupling" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.algo.CoCitation.coupling(directed, maxInDeg = 20, minCount = 2)
    }),

    // minimum spanning forest (Boruvka) over a clustered weighted graph
    // (intra-cluster lineitem edges, weights made UNIQUE by packing the
    // canonical pair into the low digits — so the MSF is unique and the
    // oracle can use the minimax-path characterization instead of
    // replaying the hooking schedule: e=(a,b,w) is in the unique MSF iff
    // w equals the minimal-over-paths maximum edge weight between a and b)
    "g_msf" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val pairs = li.select(
          (col("l_orderkey") % NodeSpace).as("x"),
          (col("l_partkey") % NodeSpace).as("y"),
          col("l_quantity").cast("long").as("q"))
        .filter(col("x") =!= col("y"))
        .filter((col("x") - col("x") % 5) === (col("y") - col("y") % 5))
        .select(col("x").as("src"), col("y").as("dst"),
          ((col("q") % 7 + 1) * 100000
            + least(col("x"), col("y")) * NodeSpace
            + greatest(col("x"), col("y"))).as("weight"))
      graft.algo.SpanningForest.boruvka(pairs)
    }),

    // deterministic R-MAT generation, 2000 edges at scale 8: every edge
    // recomputed bit-for-bit by the oracle from its index (input tables
    // unused — the generator IS the operator under test)
    "g_rmat" -> ((s, dir) =>
      graft.sources.Rmat.edges(s, nEdges = 2000, scale = 8, seed = 42L)),

    // crawl-frontier priority: rank × staleness — 3-iteration PageRank
    // joined with each page's last-seen time from the events stream
    // (user_id keys the demo page space), staleness in whole hours
    // against a fixed horizon on truncated epoch seconds (exact integer
    // on both engines), never-seen pages pinned to 9999 h; priority is
    // the exact integer product, so the ranking replays bit-for-bit
    "g_frontier" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val pr = PageRank.runFixed(e, 3)
        .select(col("id"),
          round(col("rank") * 1000000).cast("long").as("rank_e6"))
      val seen = s.read.parquet(s"$dir/events.parquet")
        .select((col("user_id") % NodeSpace).as("id"),
          // ts is TIMESTAMP_NTZ: hop through TIMESTAMP (session tz is
          // pinned UTC) to truncated epoch seconds = DuckDB's
          // date_part('epoch') on the naive value
          col("ts").cast("timestamp").cast("long").as("sec"))
        .groupBy("id").agg(max(col("sec")).as("seen_sec"))
      pr.join(seen, Seq("id"), "left")
        .select(col("id"), col("rank_e6"),
          coalesce(expr(s"($FrontierHorizonSec - seen_sec) DIV 3600"),
            lit(9999L)).as("stale_h"))
        .select(col("id"), col("rank_e6"), col("stale_h"),
          (col("rank_e6") * col("stale_h")).as("priority"))
    }),

    // Doulion approximate triangle census: keep each canonical edge at
    // p = 1/2 by a deterministic md5 coin, count exactly on the sample,
    // scale by 8 — the oracle replays the identical coin and join
    "g_tri_approx" -> ((s, dir) =>
      TriangleCount.approxTriangles(demoEdges(s, dir), permille = 500,
        seed = 7L)),

    // hash-sampled vertex-induced subgraph (40% of vertices, seed 11)
    "g_sample_induced" -> ((s, dir) =>
      GraphOps.sampleInduced(demoEdges(s, dir), permille = 400, seed = 11L)),

    // single-linkage clustering at threshold τ, computed THE CHEAP WAY:
    // connected components over the already-built MSF's edges with
    // w ≤ τ — by the single-linkage/MSF equivalence this equals CC of the
    // FULL graph restricted to w ≤ τ, which is exactly what the oracle
    // computes (an independent characterization, like g_msf's minimax)
    "g_single_linkage" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val pairs = li.select(
          (col("l_orderkey") % NodeSpace).as("x"),
          (col("l_partkey") % NodeSpace).as("y"),
          col("l_quantity").cast("long").as("q"))
        .filter(col("x") =!= col("y"))
        .filter((col("x") - col("x") % 5) === (col("y") - col("y") % 5))
        .select(col("x").as("src"), col("y").as("dst"),
          ((col("q") % 7 + 1) * 100000
            + least(col("x"), col("y")) * NodeSpace
            + greatest(col("x"), col("y"))).as("weight"))
      val msf = graft.algo.SpanningForest.boruvka(pairs)
      val kept = msf.filter(col("w") <= 350000)
        .select(col("a").as("src"), col("b").as("dst"))
      val lab = ConnectedComponents.runAlternating(kept)
      val verts = pairs.select(col("src").as("id"))
        .union(pairs.select(col("dst"))).distinct()
      verts.join(lab, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("cluster"))
    }),

    // resilience under targeted attack: remove the 10 highest-degree
    // hubs (degree desc, id asc tie-break) from the demo graph and
    // report the surviving vertices' components
    "g_hub_removal" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val hubs = GraphOps.degrees(e)
        .orderBy(col("degree").desc, col("id").asc).limit(10)
        .select(col("id"))
      val rest = e
        .join(broadcast(hubs.select(col("id").as("h1"))),
          col("src") === col("h1"), "left_anti")
        .join(broadcast(hubs.select(col("id").as("h2"))),
          col("dst") === col("h2"), "left_anti")
        .select(col("src"), col("dst"))
      ConnectedComponents.runAlternating(rest)
    }),

    // targeted-attack robustness curve: remove the top-k hubs for
    // k in {0,5,10} (degree desc, id asc — the g_hub_removal selection)
    // and report surviving component structure per level — the
    // resilience profile dual to g_percolation's random-failure curve.
    // Hub set is tiny (broadcast anti-join); each level is one CC run
    "g_attack_curve" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val deg = GraphOps.degrees(e)
      Seq(0, 5, 10).map { k =>
        val hubs = deg.orderBy(col("degree").desc, col("id").asc)
          .limit(k).select(col("id"))
        val rest = e
          .join(broadcast(hubs.select(col("id").as("h1"))),
            col("src") === col("h1"), "left_anti")
          .join(broadcast(hubs.select(col("id").as("h2"))),
            col("dst") === col("h2"), "left_anti")
          .select(col("src"), col("dst"))
        val comps = ConnectedComponents.runAlternating(rest)
          .groupBy("label").agg(count(lit(1)).as("sz"))
        comps.agg(sum(col("sz")).cast("long").as("n_vertices"),
            count(lit(1)).as("n_components"),
            max(col("sz")).as("giant_size"))
          .select(lit(k.toLong).as("k_removed"), col("n_vertices"),
            col("n_components"), col("giant_size"))
      }.reduce(_ union _)
    }),

    // related-pages top-2 per page: the co-citation pairs of
    // g_cocitation expanded to both directions and ranked per page
    // (count desc, id asc) — the user-facing "related" API shape
    "g_related_top2" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.algo.CoCitation.relatedTopK(directed, k = 2,
        maxOutDeg = 20, minCount = 2)
    }),

    // redirect-chain resolution by pointer doubling: a deterministic
    // functional redirect table (u → 7u+13 mod 300 for u % 3 ≠ 0;
    // u % 3 = 0 are terminals), 4 doublings = 16 steps — long enough to
    // resolve every acyclic chain here, so unresolved rows are exactly
    // the redirect cycles
    "g_redirects" -> ((s, dir) => {
      val f = s.range(NodeSpace).filter(col("id") % 3 =!= 0)
        .select(col("id").as("src"),
          ((col("id") * 7 + 13) % NodeSpace).as("dst"))
      graft.algo.Redirects.resolve(f, doublings = 4)
    }),

    // condensation DAG + longest-path levels, end to end, on a layered
    // composite graph: lineitem-derived forward edges restricted to
    // residue jumps of +2/+3 (mod-10 classes) unioned with a
    // deterministic +10 ring that closes each residue class into one
    // 30-vertex cycle — so the SCCs are the 10 classes and the
    // condensation is a real multi-level DAG, unlike the demo graph's
    // single giant SCC. Output: every vertex with its SCC label and its
    // component's topological depth (isolated components are sources,
    // level 0 via the coalesce)
    "g_condense_dag" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val fwd = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("dst") % 10 - col("src") % 10 === 2 ||
          col("dst") % 10 - col("src") % 10 === 3)
        .distinct()
      val ring = s.range(NodeSpace)
        .select(col("id").as("src"), ((col("id") + 10) % NodeSpace).as("dst"))
      val (labels, compEdges) =
        graft.algo.StronglyConnected.condense(fwd.union(ring))
      val levels = graft.algo.StronglyConnected.dagLevels(compEdges)
      labels.join(levels.withColumnRenamed("comp", "scc"), Seq("scc"), "left")
        .select(col("id"), col("scc"),
          coalesce(col("level"), lit(0L)).as("level"))
    }),

    // source-flow path counts on the same condensation DAG: how many
    // distinct ≤3-hop paths from IN-tier sources reach each component
    "g_dag_paths_t3" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val fwd = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("dst") % 10 - col("src") % 10 === 2 ||
          col("dst") % 10 - col("src") % 10 === 3)
        .distinct()
      val ring = s.range(NodeSpace)
        .select(col("id").as("src"), ((col("id") + 10) % NodeSpace).as("dst"))
      val (_, compEdges) =
        graft.algo.StronglyConnected.condense(fwd.union(ring))
      graft.algo.StronglyConnected.dagPathCounts(compEdges, rounds = 3)
    }),

    // distance histogram over the sampled BFS (same sources as
    // g_bfs_levels): reached ordered pairs per positive distance
    "g_dist_hist" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sources = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      graft.algo.Centrality.distanceHistogram(
        graft.algo.Betweenness.bfsLevels(e, sources))
    }),

    // 0.9-effective diameter + mean distance from the same sampled BFS —
    // the integer threshold rule (cum·10 ≥ total·9) replays bit-for-bit
    "g_eff_diameter" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sources = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      graft.algo.Centrality.effectiveDiameter(
          graft.algo.Betweenness.bfsLevels(e, sources))
        .select(col("eff_diameter"), col("reached_pairs"),
          round(col("mean_dist") * 1000000).cast("long").as("mean_dist_e6"))
    }),

    // inbound anchor-text aggregation over deterministically assembled
    // html — positional href/text pairing + url normalization end-to-end
    "g_anchors" -> ((s, dir) =>
      graft.sources.TextExtract.inboundAnchors(anchorPages(s, dir))),

    // host-graph contraction of a deterministic url-level link table —
    // the weighted DIRECTED host graph (intra-host links dropped, hosts
    // normalized: lowercased, port/path/fragment stripped)
    "g_host_edges" -> ((s, dir) =>
      graft.sources.HostGraph.contract(hostPairs(s, dir))),

    // host-level weighted PageRank, 3 fixed iterations, over the directed
    // host graph — hosts 89..96 are link-targets only, so the gate
    // exercises the dangling-mass redistribution path with STRING vertex
    // ids (no dictionary pass at the contracted scale)
    "g_host_pagerank_t3" -> ((s, dir) =>
      graft.sources.HostGraph.hostPageRank(
          graft.sources.HostGraph.contract(hostPairs(s, dir)), iterations = 3)
        .select(col("host"),
          round(col("rank") * 1000000).cast("long").as("rank_e6"))),

    // per-host outlink leakage: intra vs inter link counts + ratio —
    // near-0 = walled garden, near-1 = link farm/redirector
    "g_host_leakage" -> ((s, dir) =>
      graft.sources.HostGraph.leakage(hostPairs(s, dir))),

    // community exemplars: top-2 pages per LP(3) community by PR(5) —
    // the per-community audit listing (rank rounded before the ordering
    // so the tie-break is engine-independent)
    "g_comm_top_pages" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val labels = LabelPropagation.runFixed(e, 3, symmetric = true)
      val pr = PageRank.runFixed(e, 5)
        .select(col("id").as("pid"),
          round(col("rank") * 1000000).cast("long").as("rank_e6"))
      val sc = labels.join(pr, labels("id") === col("pid"))
        .select(col("label"), col("id"), col("rank_e6"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("label").orderBy(col("rank_e6").desc, col("id").asc)
      sc.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
    }),

    // spectral radius estimate: total length-4 walks over length-3 walks
    // (exact integer sums, one divide) — the epidemic-threshold monitor
    "g_spectral_radius" -> ((s, dir) =>
      graft.algo.Spectral.spectralRadius(demoEdges(s, dir), iterations = 4)
        .select(col("w_prev"), col("w_next"),
          round(col("lambda") * 1000000).cast("long").as("lambda_e6"))),

    // seeded vertex permutation with explicit positions — the md5 sort
    // key makes the exact ordering cross-engine-replayable
    "g_permutation" -> ((s, dir) =>
      GraphOps.permutationRanked(GraphOps.vertices(demoEdges(s, dir)), seed = 7L)),

    // bow-tie decomposition of the directed demo graph (same table as
    // g_scc): largest SCC = core (tie-break smallest label), in = reaches
    // the core, out = reached from it, other = the rest
    "g_bowtie" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.algo.BowTie.classify(directed)
    }),

    // crawl-delta: edges added/removed between the line-1 snapshot and
    // the line<=2 snapshot of the directed link table
    "g_edge_diff" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def snap(maxLine: Int) = li.filter(col("l_linenumber") <= maxLine)
        .select((col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst"))
      GraphOps.edgeDiff(snap(1), snap(2))
    }),

    // link-prediction precision@20 against the crawl delta: CN top-20
    // non-adjacent wedge pairs of snapshot 1, hit-flagged by snapshot 2
    "g_linkpred_eval" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def snap(maxLine: Int) = GraphOps.symmetrize(GraphOps.dropSelfLoops(
        li.filter(col("l_linenumber") <= maxLine)
          .select((col("l_orderkey") % NodeSpace).as("src"),
            (col("l_partkey") % NodeSpace).as("dst"))))
      graft.algo.LinkPrediction.evalPrecision(snap(1), snap(2), k = 20)
    }),

    // community-size histogram of the CC labeling
    "g_comm_size_hist" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val n = GraphOps.vertices(e).count()
      Measures.communitySizeHistogram(ConnectedComponents.run(e, n).labels)
    }),

    // directed-edge reciprocity of the raw (pre-symmetrization) link table
    "g_reciprocity" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
        (col("l_orderkey") % NodeSpace).as("src"),
        (col("l_partkey") % NodeSpace).as("dst"))
      Measures.reciprocity(directed)
        .select(col("mutual"), col("total"),
          round(col("reciprocity") * 1000000).cast("long")
            .as("reciprocity_e6"))
    }),

    // per-community conductance of the id%7 attribute partition (the same
    // partition the confusion gate uses)
    "g_conductance" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val labels = GraphOps.vertices(e)
        .select(col("id"), (col("id") % 7).as("label"))
      Measures.conductance(e, labels)
        .select(col("label"), col("cut"), col("vol"),
          round(col("conductance") * 1000000).cast("long")
            .as("conductance_e6"))
    }),

    "g_confusion" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val n = GraphOps.vertices(e).count()
      val cc = ConnectedComponents.run(e, n).labels
      val attr = GraphOps.vertices(e).select(col("id"), (col("id") % 7).as("label"))
      Measures.confusionMatrix(attr, cc)
        .select(col("trueLabel").as("attr_label"),
          col("predLabel").as("cc_label"), col("n"))
    }),

    // Adjusted Rand Index + purity between the id%7 attribute partition
    // and the single-linkage clusters of the 5-block weighted graph (a
    // genuinely multi-cluster prediction — whole-graph CC is one giant
    // component, and hub removal doesn't disconnect the demo graph
    // either). Exercises the MSF → threshold-CC path end to end; the
    // exact pair-count integers are hashed alongside the final ratio,
    // which is cleared of the /2 (×2 both sides) so no integer division
    // happens before the one double divide.
    "g_ari" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val pairs = li.select(
          (col("l_orderkey") % NodeSpace).as("x"),
          (col("l_partkey") % NodeSpace).as("y"),
          col("l_quantity").cast("long").as("q"))
        .filter(col("x") =!= col("y"))
        .filter((col("x") - col("x") % 5) === (col("y") - col("y") % 5))
        .select(col("x").as("src"), col("y").as("dst"),
          ((col("q") % 7 + 1) * 100000
            + least(col("x"), col("y")) * NodeSpace
            + greatest(col("x"), col("y"))).as("weight"))
      val msf = graft.algo.SpanningForest.boruvka(pairs)
      val kept = msf.filter(col("w") <= 350000)
        .select(col("a").as("src"), col("b").as("dst"))
      val lab = ConnectedComponents.runAlternating(kept)
      val verts = pairs.select(col("src").as("id"))
        .union(pairs.select(col("dst"))).distinct()
      val pred = verts.join(lab, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
      val attr = verts.select(col("id"), (col("id") % 7).as("label"))
      val num = (col("all_pairs") * col("index")
        - col("row_pairs") * col("col_pairs")) * 2
      val den = col("all_pairs") * (col("row_pairs") + col("col_pairs")) -
        col("row_pairs") * col("col_pairs") * 2
      Measures.pairCounts(attr, pred)
        .crossJoin(Measures.purityCounts(attr, pred).select(col("purity_num")))
        .select(col("index").as("pair_index"), col("row_pairs"),
          col("col_pairs"), col("all_pairs"), col("n_total"), col("purity_num"),
          round(num.cast("double") * 1000000 / den.cast("double"))
            .cast("long").as("ari_e6"))
    }),

    // per-edge neighborhood overlap (embeddedness / weak-tie strength)
    "g_edge_overlap" -> ((s, dir) =>
      TriangleCount.edgeOverlap(demoEdges(s, dir))
        .select(col("src"), col("dst"), col("common"), col("union_size"),
          round(col("overlap") * 1000000).cast("long").as("overlap_e6"))),

    // sampled eccentricity per source (max BFS distance + reached count)
    // — radius/diameter estimation from the shared bfsLevels pass
    "g_eccentricity" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sources = GraphOps.vertices(e).filter(col("id") % 10 === 0)
      graft.algo.Betweenness.bfsLevels(e, sources)
        .groupBy("source")
        .agg(max(col("dist")).as("ecc"), count(lit(1)).as("n_reached"))
    }),

    // community-connectivity audit (the Leiden well-connectedness check):
    // are LP-3 communities internally connected? n_parts = number of
    // connected pieces each community's induced subgraph falls into
    "g_comm_connectivity" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val lab = LabelPropagation.runFixed(e, 3, symmetric = true)
      val intra = e
        .join(lab.select(col("id").as("src"), col("label").as("la")), "src")
        .join(lab.select(col("id").as("dst"), col("label").as("lb")), "dst")
        .filter(col("la") === col("lb"))
        .select(col("src"), col("dst"))
      val sub = ConnectedComponents.runAlternating(intra)
        .withColumnRenamed("label", "sub")
      lab.join(sub, Seq("id"), "left")
        .select(col("label").as("community"), col("id"),
          coalesce(col("sub"), col("id")).as("sub"))
        .groupBy("community")
        .agg(count(lit(1)).as("n_members"),
          countDistinct(col("sub")).as("n_parts"))
    }),

    // deterministic BFS spanning tree: min-id parent on the previous
    // level, roots self-parented (sources id % 30 keep the join light)
    "g_bfs_parents" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val sources = GraphOps.vertices(e).filter(col("id") % 30 === 0)
      graft.algo.Betweenness.bfsParents(e, sources)
    }),

    // Weisfeiler–Lehman color refinement, 2 sweeps: structural-role
    // fingerprints; byte-exact md5 chain
    "g_wl_t2" -> ((s, dir) =>
      graft.algo.WlRefinement.refine(demoEdges(s, dir), rounds = 2)),

    // time-respecting earliest arrival over the behavioral temporal graph
    // (user → item contacts stamped with the event time), 4 relax rounds
    // from the id%50 sources — "when could a change first reach v"
    "g_temporal_t4" -> ((s, dir) => {
      val te = s.read.parquet(s"$dir/events.parquet")
        .select((col("user_id") % NodeSpace).as("src"),
          (get_json_object(col("props"), "$.k").cast("long") % NodeSpace)
            .as("dst"),
          col("ts").cast("timestamp").cast("long").as("t"))
        .filter(col("dst").isNotNull && col("src") =!= col("dst"))
      val sources = te.select(col("src").as("id"))
        .union(te.select(col("dst"))).distinct()
        .filter(col("id") % 50 === 0)
      graft.algo.ShortestPaths.earliestArrival(te, sources, rounds = 4)
    }),

    // SimRank, 2 integer-scaled iterations over a sparse DIRECTED slice
    // (every 20th supplier key) so the related-page measure is exercised
    // on in-neighbor semantics without symmetrization
    "g_simrank_t2" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val e = li.filter(col("l_suppkey") % 20 === 0)
        .select((col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.algo.SimRank.simRankT2(e)
        .select(col("a"), col("b"), col("cn"), col("s1"), col("s2"))
    }),

    // adjacency compressibility: per-source Elias-gamma delta-gap cost,
    // natural ids vs the degree-ascending re-encode — the WebGraph
    // storage objective id-reordering minimizes (exact integer bits)
    "g_gamma_bits" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val nat = graft.graph.Compress.gammaGapCost(e)
      val re = graft.graph.Compress
        .gammaGapCostReordered(e, GraphOps.degreeReorder(e))
        .select(col("id"), col("gamma_bits_reord"))
      nat.join(re, Seq("id"))
        .select(col("id"), col("degree"), col("gamma_bits"),
          col("gamma_bits_reord"))
    }),

    // 4-clique census: oriented-triangle extension down the same
    // degree-ordered DAG (kClist shape) — link-farm density diagnostic
    "g_cliques4" -> ((s, dir) =>
      TriangleCount.cliqueCensus4(demoEdges(s, dir))),

    // densest-subgraph greedy peel, 4 batched rounds — every density
    // comparison an exact integer (deg·n ≤ slots), bit-replayable
    "g_densest" -> ((s, dir) =>
      graft.algo.Dense.peelRounds(demoEdges(s, dir), rounds = 4)),

    // SLPA-style label memory: labels held across the first 3 sync
    // supersteps with rounds-held counts — overlapping memberships
    "g_lp_memory_t3" -> ((s, dir) =>
      LabelPropagation.labelMemory(demoEdges(s, dir), 3, symmetric = true)),

    // greedy maximal matching, 3 local-minima rounds over md5 edge
    // priorities (Luby on the line graph)
    "g_matching_t3" -> ((s, dir) =>
      graft.algo.Matching.greedyRounds(demoEdges(s, dir), rounds = 3,
        seed = 7L)),

    // Gavril 2-approx vertex cover from the 3-round matching, residual
    // both-endpoint fallback keeps the cover valid at any round budget
    "g_vertex_cover_t3" -> ((s, dir) =>
      graft.algo.Matching.vertexCover(demoEdges(s, dir), rounds = 3,
        seed = 7L)),

    // heavy-edge (weight-priority) matching on the weighted demo graph —
    // the METIS coarsening heuristic, heaviest links matched first
    "g_matching_heavy_t2" -> ((s, dir) =>
      graft.algo.Matching.greedyRoundsWeighted(demoWeightedEdges(s, dir),
        rounds = 2, seed = 7L)),

    // strength assortativity: do heavy vertices link to heavy vertices?
    // exact integer moments + one e6 correlate
    "g_assort_strength" -> ((s, dir) =>
      Measures.strengthAssortativity(demoWeightedEdges(s, dir))),

    // heavy-matching coarsening step over the weighted demo graph —
    // weight-sum contraction keeps inter-cluster mass exact
    "g_coarsen_heavy_t2" -> ((s, dir) => {
      val ew = demoWeightedEdges(s, dir)
      val m = graft.algo.Matching.greedyRoundsWeighted(ew, rounds = 2,
        seed = 7L)
      graft.algo.Matching.contractWeighted(ew, m)
    }),

    // weighted conductance of the id%7 partition over the weighted demo
    // graph (host-graph edition: leakage priced by link multiplicity;
    // the g_conductance labeling, so cuts are non-trivial)
    "g_conductance_weighted" -> ((s, dir) => {
      val ew = demoWeightedEdges(s, dir)
      val lab = GraphOps.vertices(demoEdges(s, dir))
        .select(col("id"), (col("id") % 7).as("label"))
      Measures.conductanceWeighted(ew, lab)
    }),

    // directed triad census: 3-cycles vs transitive triangles on the
    // directed projection (Fagiolo orientation decomposition)
    "g_directed_triads" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.algo.TriangleCount.directedTriads(directed)
    }),

    // one multilevel-coarsening step: contract the 3-round matching,
    // parallel slots aggregate into integer weights
    "g_coarsen_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      graft.algo.Matching.contract(e,
        graft.algo.Matching.greedyRounds(e, rounds = 3, seed = 7L))
    }),

    // exact 2-hop ball sizes — neighborhood-growth baseline (the
    // sketched ANF path serves hub-heavy graphs)
    "g_ball2" -> ((s, dir) => GraphOps.ballSizes2(demoEdges(s, dir))),

    // per-component bipartiteness (odd-cycle detection by BFS parity) on
    // the sparse demo graph, whose small components include real trees
    "g_bipartite" -> ((s, dir) =>
      graft.algo.Bipartite.check(sparseDemoEdges(s, dir))),

    // L-Spar edge sparsification: per-vertex top-2 nominations by
    // common-neighbor count, union of nominations
    "g_sparsify_top2" -> ((s, dir) =>
      TriangleCount.sparsifyTopOverlap(demoEdges(s, dir), k = 2)),

    // degree moments + Molloy–Reed κ = Σd²/Σd (giant-component /
    // hub-fragility criterion; exact integer sums, one divide)
    "g_degree_moments" -> ((s, dir) =>
      Measures.degreeMoments(demoEdges(s, dir))),

    // attribute assortativity: Newman's r over the id%7 attribute —
    // exact integer mixing-matrix sums, one divide
    "g_label_assort" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      Measures.labelAssortativity(e,
        GraphOps.vertices(e).select(col("id"), (col("id") % 7).as("label")))
    }),

    // bond-percolation resilience curve: keep 30/60/90% of undirected
    // edges by a seeded md5 draw, CC per level, giant-component stats
    "g_percolation" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      Seq(300, 600, 900).map { p =>
        val kept = GraphOps.percolate(e, p, seed = 11L)
        val comps = ConnectedComponents.runAlternating(kept)
          .groupBy("label").agg(count(lit(1)).as("sz"))
        comps.agg(sum(col("sz")).cast("long").as("n_vertices"),
            count(lit(1)).as("n_components"),
            max(col("sz")).as("giant_size"))
          .select(lit(p.toLong).as("permille"), col("n_vertices"),
            col("n_components"), col("giant_size"))
      }.reduce(_ union _)
    }),

    // crawl-freshness: top-10 PageRank shifts between the line-1 and
    // line≤2 link-graph snapshots, 3 fixed iterations each — integer-
    // scaled ranks so the TakeOrdered ranking is exact
    // WARM-START (incremental) PageRank: rank the line≤2 crawl snapshot
    // for 2 iterations starting FROM the line-1 snapshot's 3-iteration
    // ranks (new vertices seeded uniform) — the re-rank a production
    // crawler runs per delta instead of iterating from scratch; at 100 TB
    // warm starts converge in a few iterations because most mass is
    // already in place
    "g_pr_warm_t2" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def snap(maxLine: Int) = GraphOps.symmetrize(GraphOps.dropSelfLoops(
        li.filter(col("l_linenumber") <= maxLine)
          .select((col("l_orderkey") % NodeSpace).as("src"),
            (col("l_partkey") % NodeSpace).as("dst"))))
      val old = PageRank.runFixed(snap(1), 3)
      val eNew = snap(2)
      val vNew = GraphOps.vertices(eNew)
      val nNew = vNew.count()
      val init = vNew
        .join(old.select(col("id"), col("rank").as("r0")), Seq("id"), "left")
        .select(col("id"), coalesce(col("r0"), lit(1.0 / nNew)).as("rank"))
      PageRank.run(eNew, eps = 0.0, maxIter = 2, initRanks = Some(init),
          autoSkew = false)
        .ranks
        .select(col("id"), round(col("rank") * 1000000).cast("long").as("rank_e6"))
    }),

    // collective influence CI₁ (Morone–Makse optimal percolation): the
    // dismantling score — exact integer (deg−1)·Σ neighbor-excess
    "g_collective_influence" -> ((s, dir) =>
      Measures.collectiveInfluence(demoEdges(s, dir))),

    // 3-node graphlet orbit vector per vertex: wedge-end / wedge-center /
    // triangle counts derived from the triangle census + degrees alone
    "g_orbits" -> ((s, dir) =>
      TriangleCount.orbitCounts(demoEdges(s, dir))),

    // second link-prediction family over the (id, id+3) probe pairs:
    // resource allocation, Salton cosine, Leicht–Holme–Newman
    "g_linkpred_ra" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val pairs = s.range(0, NodeSpace.toLong)
        .select(col("id").as("src"), ((col("id") + 3) % NodeSpace).as("dst"))
      graft.algo.LinkPrediction.scoresExtended(e, pairs)
        .select(col("src"), col("dst"), col("common"),
          round(col("ra") * 1000000).cast("long").as("ra_e6"),
          round(col("cosine") * 1000000).cast("long").as("cos_e6"),
          round(col("lhn") * 1000000).cast("long").as("lhn_e6"))
    }),

    // structural-balance triad census: signs derived deterministically
    // from the unordered pair ((src+dst)%3==0 → −1), triangles bucketed
    // by negative-edge count — balanced = n_neg ∈ {0, 2}
    "g_signed_triads" -> ((s, dir) => {
      val signed = demoEdges(s, dir).withColumn("sign",
        when((col("src") + col("dst")) % 3 === 0, lit(-1)).otherwise(lit(1)))
      TriangleCount.signedTriads(signed)
    }),

    // continuous label spreading, α=0.5, 3 supersteps, seeds id%25==0
    // with class (id div 25) % 2 — fractional class mass per vertex
    "g_label_spreading_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val seeds = GraphOps.vertices(e).filter(col("id") % 25 === 0)
        .select(col("id"), expr("(id div 25) % 2").as("cls"))
      graft.algo.LabelSpreading.run(e, seeds, alpha = 0.5, supersteps = 3)
        .select(col("id"), col("cls"),
          round(col("f") * 1000000).cast("long").as("f_e6"))
    }),

    // landmark distance oracle: 4 landmarks (id%75==0), probe pairs
    // (id, id+7) — min-over-landmarks triangle upper bound per pair
    "g_landmark_dist" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val landmarks = GraphOps.vertices(e).filter(col("id") % 75 === 0)
      val pairs = s.range(0, NodeSpace.toLong)
        .select(col("id").as("src"), ((col("id") + 7) % NodeSpace).as("dst"))
      graft.algo.Centrality.landmarkDistances(e, landmarks, pairs)
    }),

    // Holland–Leinhardt dyad census on the raw DIRECTED edge set (the
    // HITS graph): mutual / asymmetric / null unordered pairs
    "g_dyad_census" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") === 1)
      val directed = li.select(
          (col("l_orderkey") % NodeSpace).as("src"),
          (col("l_partkey") % NodeSpace).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      Measures.dyadCensus(directed)
    }),

    // structural-equivalence twin classes: identical neighbor sets
    // collapse to (rep = min id, class_size) via a sorted-list md5
    "g_twins" -> ((s, dir) =>
      GraphOps.structuralTwins(demoEdges(s, dir))),

    // weighted closeness from 4 per-source Bellman–Ford rounds, sources
    // id%75 — the Dijkstra-family counterpart of g_centrality_sampled
    "g_closeness_weighted" -> ((s, dir) => {
      val ew = demoWeightedEdges(s, dir)
      val sources = GraphOps.vertices(ew.select(col("src"), col("dst")))
        .filter(col("id") % 75 === 0)
      graft.algo.ShortestPaths.weightedCloseness(ew, sources, rounds = 4)
    }),

    // weighted harmonic centrality from the same per-source relaxation —
    // per-term e9 rounding keeps the sum exact-integer
    "g_harmonic_weighted" -> ((s, dir) => {
      val ew = demoWeightedEdges(s, dir)
      val sources = GraphOps.vertices(ew.select(col("src"), col("dst")))
        .filter(col("id") % 75 === 0)
      graft.algo.ShortestPaths.weightedHarmonic(ew, sources, rounds = 4)
    }),

    // weight-proportional deterministic walks (starts id%100, length 3):
    // node2vec's interval selection with the edge weight as the bias
    "g_walks_weighted_l3" -> ((s, dir) => {
      val we = demoWeightedEdges(s, dir)
      val starts = GraphOps.vertices(we.select(col("src"), col("dst")))
        .filter(col("id") % 100 === 0)
      graft.algo.RandomWalks.walksWeighted(we, starts, length = 3)
    }),

    // VoteRank spreader selection, k=3: e6-integer voting abilities,
    // δ = ⌊10⁶/⟨k⟩⌉ neighbor discount, (score desc, id asc) tie-break
    "g_voterank_t3" -> ((s, dir) =>
      graft.algo.Influence.voteRank(demoEdges(s, dir), k = 3)),

    // deterministic linear-threshold cascade, 3 rounds: seeds id%37==0,
    // θ(v) = ((31v mod 97)+1)/98 — activation test cross-multiplied to
    // pure integers
    "g_lt_cascade_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val verts = GraphOps.vertices(e)
      val seeds = verts.filter(col("id") % 37 === 0)
      val th = verts.select(col("id"),
        ((col("id") * 31) % 97 + 1).as("tnum"))
      graft.algo.Influence.ltCascade(e, seeds, th, tden = 98, rounds = 3)
    }),

    // independent cascade (live-edge BFS, p = 0.6 md5 coins, 3 rounds)
    // from the g_lt_cascade seed set — the submodular-influence sibling
    "g_ic_cascade_t3" -> ((s, dir) => {
      val e = demoEdges(s, dir)
      val seeds = GraphOps.vertices(e).filter(col("id") % 37 === 0)
      graft.algo.Influence.icCascade(e, seeds, permille = 600, rounds = 3)
    }),

    "g_pr_shift_top10" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def snap(maxLine: Int) = GraphOps.symmetrize(GraphOps.dropSelfLoops(
        li.filter(col("l_linenumber") <= maxLine)
          .select((col("l_orderkey") % NodeSpace).as("src"),
            (col("l_partkey") % NodeSpace).as("dst"))))
      def pr(e: org.apache.spark.sql.DataFrame, name: String) =
        PageRank.runFixed(e, 3)
          .select(col("id"), round(col("rank") * 1000000).cast("long").as(name))
      pr(snap(1), "r_old").join(pr(snap(2), "r_new"), Seq("id"), "full_outer")
        .select(col("id"),
          coalesce(col("r_old"), lit(0L)).as("rank_e6_old"),
          coalesce(col("r_new"), lit(0L)).as("rank_e6_new"))
        .withColumn("shift_e6", col("rank_e6_new") - col("rank_e6_old"))
        .orderBy(abs(col("shift_e6")).desc, col("id").asc)
        .limit(10)
    }))

  /** Deterministic-walk replay (starts id % 100, length 4) — shared by
    * the walks gate and the skip-gram pair gate built on top of it.
    */
  private val walksL4Sql: String = {
    val steps = (1 to 4).map { t =>
      s"""w$t AS (
         |  SELECT w.walk_id, CAST($t AS BIGINT) AS step, n.dst AS cur
         |  FROM w${t - 1} w
         |  JOIN dg d ON w.cur = d.id
         |  JOIN nbr n ON n.src = w.cur
         |   AND n.idx = (w.cur * ${graft.algo.RandomWalks.StepMixA}
         |                + w.walk_id * ${graft.algo.RandomWalks.StepMixB}
         |                + $t) % d.d)""".stripMargin
    }.mkString(",\n")
    val union = (0 to 4).map(t => s"SELECT * FROM w$t").mkString("\n  UNION ALL ")
    s"""WITH $cte,
       |dg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1),
       |nbr AS (SELECT src, dst,
       |          CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
       |               AS BIGINT) AS idx
       |        FROM e0),
       |w0 AS (SELECT id AS walk_id, CAST(0 AS BIGINT) AS step, id AS cur
       |       FROM verts WHERE id % 100 = 0),
       |$steps
       |SELECT walk_id, step, cur AS vertex FROM (
       |  $union) u""".stripMargin
  }

  /** Walk corpus → windowed skip-gram pair counts (`wkp`), shared by the
    * pair gate and the PMI / negative-sampling gates built on it.
    */
  private val walkPairsSql: String =
    s"""wk AS (
       |$walksL4Sql
       |),
       |wkp AS (
       |  SELECT a.vertex AS center, b.vertex AS context, count(*) AS n
       |  FROM wk a JOIN wk b ON a.walk_id = b.walk_id
       |   AND a.step <> b.step AND abs(a.step - b.step) <= 2
       |  GROUP BY 1, 2)""".stripMargin

  /** Deterministic SGNS negative draws over the walk-pair corpus (`ng`),
    * appended after [[walkPairsSql]]: noise weight floor((deg³)^(1/4))
    * (multiply and sqrt are IEEE-correctly-rounded on both engines, so
    * the floors agree bit-for-bit), prefix intervals in id order, LCG
    * draw modulo the total weight, positive-context collisions dropped —
    * mirrors `SkipGram.negativeSamples` (the engine's two-level prefix
    * sum and weight-block equi-join reduce to the same intervals).
    */
  private val sgnsNegSql: String =
    s"""dgw AS (
       |  WITH $cte
       |  SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1
       |),
       |nwt AS (SELECT id, greatest(1, CAST(floor(sqrt(sqrt(
       |          CAST(d AS DOUBLE) * d * d))) AS BIGINT)) AS w
       |        FROM dgw),
       |cw AS (SELECT id, w, sum(w) OVER (ORDER BY id) - w AS lo FROM nwt),
       |tt AS (SELECT sum(w) AS tw FROM nwt),
       |dr AS (
       |  SELECT p.center, p.context, g.j,
       |         (p.center * ${graft.algo.RandomWalks.StepMixA}
       |          + p.context * ${graft.algo.RandomWalks.StepMixB}
       |          + g.j * ${graft.algo.SkipGram.StepMixC}) % tt.tw AS r
       |  FROM (SELECT DISTINCT center, context FROM wkp) p
       |  CROSS JOIN generate_series(0, 2) AS g(j)
       |  CROSS JOIN tt),
       |ng AS (SELECT d.center, d.context, d.j, c.id AS neg
       |       FROM dr d JOIN cw c ON d.r >= c.lo AND d.r < c.lo + c.w
       |       WHERE c.id <> d.context)""".stripMargin

  /** One unrolled Luby MIS round: undecided×undecided edge restriction,
    * lexicographic (priority, id) neighbor minimum via the two-aggregate
    * trick (min priority, then min id among that priority), winners /
    * dropped-neighbors status fold. Mirrors `Mis.run` exactly — the
    * engine's struct-min IS the (mp, mid) pair.
    */
  private def misRoundSql(r: Int): String =
    s"""u$r AS (SELECT id, prio FROM ms${r - 1} WHERE status = 'und'),
       |nm$r AS (
       |  SELECT e.src AS id, min(d.prio) AS mp
       |  FROM e0 e JOIN u$r s ON e.src = s.id JOIN u$r d ON e.dst = d.id
       |  GROUP BY 1),
       |nm2_$r AS (
       |  SELECT e.src AS id, min(e.dst) AS mid
       |  FROM e0 e JOIN u$r s ON e.src = s.id JOIN u$r d ON e.dst = d.id
       |  JOIN nm$r n ON n.id = e.src AND d.prio = n.mp
       |  GROUP BY 1),
       |wi$r AS (
       |  SELECT u.id FROM u$r u
       |  LEFT JOIN nm$r n ON u.id = n.id
       |  LEFT JOIN nm2_$r n2 ON u.id = n2.id
       |  WHERE n.id IS NULL OR u.prio < n.mp
       |     OR (u.prio = n.mp AND u.id < n2.mid)),
       |lo$r AS (
       |  SELECT DISTINCT e.dst AS id
       |  FROM e0 e JOIN wi$r w ON e.src = w.id),
       |ms$r AS (
       |  SELECT s.id, s.prio,
       |         CASE WHEN s.status <> 'und' THEN s.status
       |              WHEN w.id IS NOT NULL THEN 'in'
       |              WHEN l.id IS NOT NULL THEN 'out'
       |              ELSE 'und' END AS status
       |  FROM ms${r - 1} s
       |  LEFT JOIN wi$r w ON s.id = w.id
       |  LEFT JOIN lo$r l ON s.id = l.id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "g_edges" -> s"WITH $cte SELECT src, dst FROM e0",

    "g_graph_summary" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1)
         |SELECT count(*) AS n_vertices, CAST(sum(d) AS BIGINT) AS n_slots,
         |       CAST(min(d) AS BIGINT) AS min_deg,
         |       CAST(max(d) AS BIGINT) AS max_deg,
         |       CAST(ROUND(CAST(sum(d) AS DOUBLE) * 1000000
         |            / count(*)) AS BIGINT) AS avg_deg_e6,
         |       CAST(ROUND(CAST(sum(d) AS DOUBLE) * 1000000
         |            / (count(*) * (count(*) - 1))) AS BIGINT) AS density_e6
         |FROM deg""".stripMargin,

    "g_degree_gini" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1),
         |hist AS (SELECT d, count(*) AS c FROM deg GROUP BY 1),
         |mad AS (SELECT CAST(sum(a.c * b.c * abs(a.d - b.d)) AS BIGINT)
         |          AS mad_num FROM hist a, hist b),
         |tot AS (SELECT count(*) AS n_vertices,
         |          CAST(sum(d) AS BIGINT) AS sum_deg FROM deg)
         |SELECT n_vertices, sum_deg, mad_num,
         |       CAST(ROUND(CAST(mad_num AS DOUBLE) * 1000000
         |            / (CAST(n_vertices AS DOUBLE) * 2.0 * sum_deg))
         |         AS BIGINT) AS gini_e6
         |FROM tot, mad""".stripMargin,

    "g_wedge_closure" ->
      s"""WITH s1r AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |s1 AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM s1r UNION ALL SELECT dst, src FROM s1r) u),
         |s2r AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 2
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |s2 AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM s2r UNION ALL SELECT dst, src FROM s2r) u),
         |np AS (
         |  SELECT src AS a, dst AS b FROM s2 WHERE src < dst
         |  AND NOT EXISTS (SELECT 1 FROM s1
         |                  WHERE s1.src = s2.src AND s1.dst = s2.dst)),
         |cl AS (
         |  SELECT a, b FROM np WHERE EXISTS (
         |    SELECT 1 FROM s1 x JOIN s1 y ON x.dst = y.src
         |    WHERE x.src = np.a AND y.dst = np.b)),
         |nn AS (SELECT count(*) AS n_new FROM np),
         |nc AS (SELECT count(*) AS n_closing FROM cl)
         |SELECT n_new, n_closing,
         |       CASE WHEN n_new = 0 THEN 0
         |            ELSE CAST(ROUND(CAST(n_closing AS DOUBLE) * 1000000
         |                 / n_new) AS BIGINT) END AS closure_pct_e6
         |FROM nn, nc""".stripMargin,

    "g_degrees" ->
      s"WITH $cte SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1",

    "g_circuit_rank" ->
      s"""WITH RECURSIVE $cte, $ccCte,
         |em AS (SELECT count(*) AS n_edges FROM (
         |  SELECT DISTINCT src, dst FROM e0 WHERE src < dst) t),
         |vc AS (SELECT count(*) AS n_vertices,
         |         count(DISTINCT label) AS n_components FROM cclab)
         |SELECT n_vertices, n_edges, n_components,
         |       CAST(n_edges - n_vertices + n_components AS BIGINT)
         |         AS circuit_rank
         |FROM vc, em""".stripMargin,

    "g_snapshot_drift" ->
      s"""WITH s1r AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |s1 AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM s1r UNION ALL SELECT dst, src FROM s1r) u),
         |s2r AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 2
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |s2 AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM s2r UNION ALL SELECT dst, src FROM s2r) u),
         |po AS (SELECT DISTINCT src AS a, dst AS b FROM s1 WHERE src < dst),
         |pn AS (SELECT DISTINCT src AS a, dst AS b FROM s2 WHERE src < dst),
         |vo AS (SELECT DISTINCT src AS id FROM s1),
         |vn AS (SELECT DISTINCT src AS id FROM s2),
         |pc AS (SELECT count(*) AS pairs_common
         |       FROM po JOIN pn ON po.a = pn.a AND po.b = pn.b),
         |vc AS (SELECT count(*) AS verts_common
         |       FROM vo JOIN vn ON vo.id = vn.id),
         |c AS (SELECT (SELECT count(*) FROM po) AS pairs_old,
         |             (SELECT count(*) FROM pn) AS pairs_new,
         |             (SELECT pairs_common FROM pc) AS pairs_common,
         |             (SELECT count(*) FROM vo) AS verts_old,
         |             (SELECT count(*) FROM vn) AS verts_new,
         |             (SELECT verts_common FROM vc) AS verts_common)
         |SELECT pairs_old, pairs_new, pairs_common,
         |       CAST(ROUND(CAST(pairs_common AS DOUBLE) * 1000000
         |         / (pairs_old + pairs_new - pairs_common)) AS BIGINT)
         |         AS pair_jaccard_e6,
         |       verts_old, verts_new, verts_common,
         |       CAST(ROUND(CAST(verts_common AS DOUBLE) * 1000000
         |         / (verts_old + verts_new - verts_common)) AS BIGINT)
         |         AS vert_jaccard_e6
         |FROM c""".stripMargin,

    "g_bucketed_degrees" ->
      s"WITH $cte SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1",

    "g_attachment_lift" ->
      s"""WITH s1r AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |s1 AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM s1r UNION ALL SELECT dst, src FROM s1r) u),
         |s2r AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 2
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |s2 AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM s2r UNION ALL SELECT dst, src FROM s2r) u),
         |deg AS (SELECT src AS id, count(*) AS d FROM s1 GROUP BY 1),
         |np AS (
         |  SELECT src AS a, dst AS b FROM s2 WHERE src < dst
         |  AND NOT EXISTS (SELECT 1 FROM s1
         |                  WHERE s1.src = s2.src AND s1.dst = s2.dst)),
         |en AS (SELECT count(*) AS n_endpoints,
         |         CAST(coalesce(sum(d), 0) AS BIGINT) AS sum_deg_endpoints
         |       FROM (SELECT a AS id FROM np
         |             UNION ALL SELECT b FROM np) e
         |       JOIN deg ON e.id = deg.id),
         |ba AS (SELECT count(*) AS n_vertices,
         |         CAST(sum(d) AS BIGINT) AS sum_deg FROM deg)
         |SELECT n_endpoints, sum_deg_endpoints, n_vertices, sum_deg,
         |  CASE WHEN n_endpoints = 0 THEN 0
         |       ELSE CAST(ROUND(CAST(sum_deg_endpoints AS DOUBLE) * 1000000
         |            / n_endpoints) AS BIGINT) END AS mean_endpoint_deg_e6,
         |  CAST(ROUND(CAST(sum_deg AS DOUBLE) * 1000000 / n_vertices)
         |    AS BIGINT) AS mean_deg_e6,
         |  CASE WHEN n_endpoints = 0 THEN 0
         |       ELSE CAST(ROUND(CAST(sum_deg_endpoints AS DOUBLE)
         |            * n_vertices * 1000000 / (n_endpoints * sum_deg))
         |            AS BIGINT) END AS lift_e6
         |FROM en, ba""".stripMargin,

    "g_degree_percentiles" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1),
         |hist AS (SELECT d, count(*) AS c FROM deg GROUP BY 1),
         |cm AS (SELECT d, sum(c) OVER (ORDER BY d ASC
         |         ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         |tot AS (SELECT count(*) AS n_vertices,
         |          CAST(max(d) AS BIGINT) AS max_deg FROM deg),
         |p AS (SELECT
         |    CAST(min(CASE WHEN cum * 2 >= n_vertices THEN d END)
         |      AS BIGINT) AS p50,
         |    CAST(min(CASE WHEN cum * 10 >= n_vertices * 9 THEN d END)
         |      AS BIGINT) AS p90,
         |    CAST(min(CASE WHEN cum * 100 >= n_vertices * 99 THEN d END)
         |      AS BIGINT) AS p99,
         |    CAST(min(CASE WHEN cum * 1000 >= n_vertices * 999 THEN d END)
         |      AS BIGINT) AS p999
         |  FROM cm, tot)
         |SELECT n_vertices, p50, p90, p99, p999, max_deg
         |FROM tot, p""".stripMargin,

    "g_edge_audit" ->
      s"""WITH r AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 2),
         |b AS (SELECT count(*) AS n_rows,
         |        CAST(sum(CASE WHEN src = dst THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_self,
         |        count(DISTINCT src) AS n_srcs FROM r),
         |p AS (SELECT count(*) AS n_pairs FROM (
         |  SELECT DISTINCT src, dst FROM r WHERE src <> dst) t)
         |SELECT n_rows, n_self, n_pairs,
         |       CAST(n_rows - n_self - n_pairs AS BIGINT) AS n_multi,
         |       n_srcs
         |FROM b, p""".stripMargin,

    // outlink-profile Jaccard oracle: distinct (host, target) pairs,
    // banded pairing on the target, sizes in the banded space
    "g_host_similarity" ->
      (s"WITH $hostCte,\n" +
        """hset AS (SELECT DISTINCT sh AS host, dh AS target FROM hp
          |         WHERE sh <> '' AND dh <> '' AND sh <> dh),
          |banded AS (SELECT host, target FROM hset WHERE target IN (
          |  SELECT target FROM hset GROUP BY target
          |  HAVING count(*) <= 1000)),
          |sz AS (SELECT host, count(*) AS n_out FROM banded GROUP BY 1),
          |sh2 AS (SELECT a.host AS host_a, b.host AS host_b,
          |          count(*) AS n_shared
          |        FROM banded a JOIN banded b ON a.target = b.target
          |          AND a.host < b.host
          |        GROUP BY 1, 2)
          |SELECT host_a, host_b, n_shared,
          |       CAST(ROUND(CAST(n_shared AS DOUBLE) * 1000000
          |         / (x.n_out + y.n_out - n_shared)) AS BIGINT)
          |         AS jaccard_e6
          |FROM sh2 JOIN sz x ON sh2.host_a = x.host
          |JOIN sz y ON sh2.host_b = y.host""".stripMargin),

    "g_degdist_drift" ->
      s"""WITH s1r AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |s1 AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM s1r UNION ALL SELECT dst, src FROM s1r) u),
         |s2r AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 2
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |s2 AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM s2r UNION ALL SELECT dst, src FROM s2r) u),
         |h1 AS (SELECT d, count(*) AS c1 FROM (
         |  SELECT src, count(*) AS d FROM s1 GROUP BY 1) t GROUP BY 1),
         |h2 AS (SELECT d, count(*) AS c2 FROM (
         |  SELECT src, count(*) AS d FROM s2 GROUP BY 1) t GROUP BY 1),
         |j AS (SELECT coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
         |      FROM h1 FULL OUTER JOIN h2 ON h1.d = h2.d),
         |a AS (SELECT CAST(sum(c1) AS BIGINT) AS n_old,
         |             CAST(sum(c2) AS BIGINT) AS n_new,
         |             CAST(sum(abs(c1 - c2)) AS BIGINT) AS l1_diff FROM j)
         |SELECT n_old, n_new, l1_diff,
         |       CAST(ROUND(CAST(l1_diff AS DOUBLE) * 1000000
         |         / (n_old + n_new)) AS BIGINT) AS drift_e6
         |FROM a""".stripMargin,

    "g_pr_mass_topk" -> {
      val prSteps = (1 to 5).map { k =>
        s"""qx$k AS (
           |  SELECT e0.dst AS id, sum(p.r / d.od) AS s
           |  FROM e0 JOIN qr${k - 1} p ON e0.src = p.id
           |  JOIN qdeg d ON e0.src = d.id
           |  GROUP BY 1
           |), qr$k AS (
           |  SELECT v.id, 0.15 / (SELECT count(*) FROM verts)
           |         + 0.85 * coalesce(x.s, 0) AS r
           |  FROM verts v LEFT JOIN qx$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |qdeg AS (SELECT src AS id, count(*) AS od FROM e0 GROUP BY 1),
         |qr0 AS (SELECT id, 1.0 / (SELECT count(*) FROM verts) AS r
         |        FROM verts),
         |$prSteps,
         |rk AS (SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_e6
         |       FROM qr5),
         |top AS (SELECT rank_e6 FROM (
         |  SELECT rank_e6, row_number() OVER (ORDER BY rank_e6 DESC, id ASC)
         |    AS rn FROM rk) t WHERE rn <= 20)
         |SELECT CAST(20 AS BIGINT) AS k,
         |       CAST(sum(rank_e6) AS BIGINT) AS mass_e6
         |FROM top""".stripMargin
    },

    "g_pr_topk_overlap" -> {
      val prSteps = (1 to 5).map { k =>
        s"""qx$k AS (
           |  SELECT e0.dst AS id, sum(p.r / d.od) AS s
           |  FROM e0 JOIN qr${k - 1} p ON e0.src = p.id
           |  JOIN qdeg d ON e0.src = d.id
           |  GROUP BY 1
           |), qr$k AS (
           |  SELECT v.id, 0.15 / (SELECT count(*) FROM verts)
           |         + 0.85 * coalesce(x.s, 0) AS r
           |  FROM verts v LEFT JOIN qx$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |qdeg AS (SELECT src AS id, count(*) AS od FROM e0 GROUP BY 1),
         |qr0 AS (SELECT id, 1.0 / (SELECT count(*) FROM verts) AS r
         |        FROM verts),
         |$prSteps,
         |t3 AS (SELECT id FROM (
         |  SELECT id, row_number() OVER (ORDER BY
         |    CAST(ROUND(r * 1000000) AS BIGINT) DESC, id ASC) AS rk
         |  FROM qr3) t WHERE rk <= 20),
         |t5 AS (SELECT id FROM (
         |  SELECT id, row_number() OVER (ORDER BY
         |    CAST(ROUND(r * 1000000) AS BIGINT) DESC, id ASC) AS rk
         |  FROM qr5) t WHERE rk <= 20),
         |cm AS (SELECT count(*) AS n_common
         |       FROM t3 JOIN t5 ON t3.id = t5.id)
         |SELECT CAST(20 AS BIGINT) AS k, n_common,
         |       CAST(ROUND(CAST(n_common AS DOUBLE) * 1000000
         |         / (40 - n_common)) AS BIGINT) AS jaccard_e6
         |FROM cm""".stripMargin
    },

    "g_comm_triangles" ->
      s"""WITH $cte,
         |${lpStepsSql(3)},
         |canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |        FROM canon e1
         |        JOIN canon e2 ON e1.dst = e2.src
         |        JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst)
         |SELECT la.label, count(*) AS n_triangles
         |FROM tri
         |JOIN s3 la ON tri.a = la.id
         |JOIN s3 lb ON tri.b = lb.id
         |JOIN s3 lc ON tri.c = lc.id
         |WHERE la.label = lb.label AND lb.label = lc.label
         |GROUP BY 1""".stripMargin,

    "g_comm_entropy" ->
      s"""WITH $cte,
         |${lpStepsSql(3)},
         |sz AS (SELECT label, count(*) AS sz FROM s3 GROUP BY 1),
         |tt AS (SELECT CAST(sum(sz) AS BIGINT) AS n,
         |         count(*) AS n_communities FROM sz)
         |SELECT n AS n_vertices, n_communities,
         |       CAST(sum(CAST(ROUND(-(CAST(sz AS DOUBLE) / n)
         |         * ln(CAST(sz AS DOUBLE) / n) * 1000000000000)
         |         AS BIGINT)) AS BIGINT) AS h_e12
         |FROM sz, tt GROUP BY 1, 2""".stripMargin,

    "g_lp_frontier_t3" ->
      s"""WITH $cte,
         |${lpStepsSql(3)},
         |qdeg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1)
         |SELECT d.d, count(*) AS n_changed
         |FROM s2 JOIN s3 ON s2.id = s3.id AND s2.label <> s3.label
         |JOIN qdeg d ON d.id = s2.id
         |GROUP BY 1""".stripMargin,

    "g_lp_quality_curve" -> {
      val mods = (1 to 3).map { k =>
        s"""ein$k AS (
           |  SELECT count(*)::DOUBLE AS v FROM e0
           |  JOIN s$k a ON e0.src = a.id
           |  JOIN s$k b ON e0.dst = b.id
           |  WHERE a.label = b.label AND e0.src <> e0.dst),
           |per$k AS (
           |  SELECT sum(ks * ks - ksq)::DOUBLE AS v FROM (
           |    SELECT l.label, sum(coalesce(d.k, 0)) AS ks,
           |           sum(coalesce(d.k, 0) * coalesce(d.k, 0)) AS ksq
           |    FROM s$k l LEFT JOIN qdeg d ON l.id = d.id GROUP BY 1) g)""".stripMargin
      }.mkString(",\n")
      val rows = (1 to 3).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS iter,
           |  CAST(ROUND((ein$k.v - per$k.v / m2.v) / m2.v * 1000000)
           |    AS BIGINT) AS q_e6
           |FROM ein$k, per$k, m2""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $cte,
         |${lpStepsSql(3)},
         |m2 AS (SELECT count(*)::DOUBLE AS v FROM e0),
         |qdeg AS (SELECT src AS id, count(*) AS k FROM e0 GROUP BY 1),
         |$mods
         |$rows""".stripMargin
    },

    "g_pr_mass_comm" -> {
      val prSteps = (1 to 5).map { k =>
        s"""qx$k AS (
           |  SELECT e0.dst AS id, sum(p.r / d.od) AS s
           |  FROM e0 JOIN qr${k - 1} p ON e0.src = p.id
           |  JOIN qdeg d ON e0.src = d.id
           |  GROUP BY 1
           |), qr$k AS (
           |  SELECT v.id, 0.15 / (SELECT count(*) FROM verts)
           |         + 0.85 * coalesce(x.s, 0) AS r
           |  FROM verts v LEFT JOIN qx$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |${lpStepsSql(3)},
         |qdeg AS (SELECT src AS id, count(*) AS od FROM e0 GROUP BY 1),
         |qr0 AS (SELECT id, 1.0 / (SELECT count(*) FROM verts) AS r
         |        FROM verts),
         |$prSteps
         |SELECT s3.label, count(*) AS n_pages,
         |       CAST(sum(CAST(ROUND(r.r * 1000000) AS BIGINT)) AS BIGINT)
         |         AS rank_mass_e6
         |FROM s3 JOIN qr5 r ON s3.id = r.id
         |GROUP BY 1""".stripMargin
    },

    "g_cc" -> s"WITH RECURSIVE $cte, $ccCte SELECT id, label FROM cclab",
    "g_cc_star" -> s"WITH RECURSIVE $cte, $ccCte SELECT id, label FROM cclab",

    // warm-start CC oracle: the from-scratch closure on the NEW snapshot
    // (the whole claim under test is warm == scratch)
    "g_cc_warm" ->
      s"""WITH RECURSIVE nraw AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 2),
         |ne0 AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM nraw WHERE src <> dst
         |    UNION ALL
         |    SELECT dst, src FROM nraw WHERE src <> dst) u),
         |nverts AS (SELECT DISTINCT src AS id FROM ne0),
         |reachw(id, lab) AS (
         |  SELECT id, id FROM nverts
         |  UNION
         |  SELECT ne0.dst, reachw.lab FROM reachw
         |  JOIN ne0 ON ne0.src = reachw.id)
         |SELECT id, min(lab) AS label FROM reachw GROUP BY id""".stripMargin,

    // delta-triangles oracle: the difference of two full censuses (the
    // whole claim under test is incremental == census difference), plus
    // the canonical-pair anti-join for the delta size
    "g_tri_delta" ->
      s"""WITH r1 AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 1),
         |r2 AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 2),
         |c1 AS (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
         |       FROM r1 WHERE src <> dst),
         |c2 AS (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
         |       FROM r2 WHERE src <> dst),
         |t1 AS (SELECT count(*) AS t FROM c1 e1
         |       JOIN c1 e2 ON e1.dst = e2.src
         |       JOIN c1 e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |t2 AS (SELECT count(*) AS t FROM c2 e1
         |       JOIN c2 e2 ON e1.dst = e2.src
         |       JOIN c2 e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |d AS (SELECT c2.src, c2.dst FROM c2 WHERE NOT EXISTS (
         |        SELECT 1 FROM c1 WHERE c1.src = c2.src AND c1.dst = c2.dst))
         |SELECT (SELECT count(*) FROM d) AS delta_edges,
         |       t2.t - t1.t AS new_triangles
         |FROM t1, t2""".stripMargin,

    // Spearman oracle: the same PR-5 chain (e6 rounding) + degree table,
    // row_number over the identical pinned order, one Σd² aggregate
    "g_rank_corr" ->
      s"""WITH $cte,
         |${prChainSql("p", "e0", 5)},
         |prs AS (SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS score
         |        FROM pr5),
         |dg AS (SELECT src AS id, count(*) AS score FROM e0 GROUP BY 1),
         |ra AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rnk
         |       FROM dg),
         |rb AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rnk
         |       FROM prs),
         |ag AS (SELECT count(*) AS n,
         |              CAST(sum((ra.rnk - rb.rnk) * (ra.rnk - rb.rnk))
         |                AS BIGINT) AS sum_d2
         |       FROM ra JOIN rb ON ra.id = rb.id)
         |SELECT n, sum_d2,
         |       1 - 6.0 * sum_d2 / (CAST(n AS DOUBLE) * n * n - n) AS rho
         |FROM ag""".stripMargin,

    // absorbing-walk oracle: the same 4-step chain — gather sum over
    // neighbors, divide by degree, targets pinned to 1 each step
    "g_hitting_t4" -> {
      val steps = (1 to 4).map { k =>
        s"""hx$k AS (
           |  SELECT e0.src AS id, sum(h.h) AS s
           |  FROM e0 JOIN h${k - 1} h ON e0.dst = h.id GROUP BY 1
           |), h$k AS (
           |  SELECT v.id,
           |         CASE WHEN t.id IS NOT NULL THEN 1.0
           |              ELSE coalesce(x.s, 0) / d.d END AS h
           |  FROM verts v
           |  LEFT JOIN htgt t ON v.id = t.id
           |  LEFT JOIN hx$k x ON v.id = x.id
           |  JOIN hdeg d ON v.id = d.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |htgt AS (SELECT id FROM verts WHERE id % 50 = 0),
         |hdeg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1),
         |h0 AS (SELECT v.id,
         |              CASE WHEN t.id IS NOT NULL THEN 1.0 ELSE 0.0 END AS h
         |       FROM verts v LEFT JOIN htgt t ON v.id = t.id),
         |$steps
         |SELECT id, CAST(ROUND(h * 1000000) AS BIGINT) AS p_e6
         |FROM h4""".stripMargin
    },

    // anti-trust oracle: the PPR recurrence on the transposed directed
    // edges, dangling mass re-folded into the reset each step exactly as
    // runPersonalizedFixed does: r_k = ((1-d) + d*m_k)*reset + d*gather
    "g_antitrust_t4" -> {
      val steps = (1 to 4).map { k =>
        s"""adm$k AS (
           |  SELECT coalesce(sum(p.r), 0) AS m FROM ar${k - 1} p
           |  LEFT JOIN tdeg d ON p.id = d.id WHERE d.id IS NULL
           |), ax$k AS (
           |  SELECT tre.dst AS id, sum(p.r / d.od) AS s
           |  FROM tre JOIN ar${k - 1} p ON tre.src = p.id
           |  JOIN tdeg d ON tre.src = d.id
           |  GROUP BY 1
           |), ar$k AS (
           |  SELECT v.id,
           |         ((1.0 - 0.85) + 0.85 * (SELECT m FROM adm$k)) * v.reset
           |           + 0.85 * coalesce(x.s, 0) AS r
           |  FROM trst v LEFT JOIN ax$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |vd AS (SELECT src AS id FROM rawd UNION SELECT dst FROM rawd),
         |tre AS (SELECT dst AS src, src AS dst FROM rawd),
         |tdeg AS (SELECT src AS id, count(*) AS od FROM tre GROUP BY 1),
         |spam AS (SELECT id FROM vd WHERE id % 9 = 0),
         |trst AS (
         |  SELECT v.id,
         |    CASE WHEN s.id IS NULL THEN 0.0
         |         ELSE 1.0 / (SELECT count(*) FROM spam) END AS reset
         |  FROM vd v LEFT JOIN spam s ON v.id = s.id),
         |ar0 AS (SELECT id, reset AS r FROM trst),
         |$steps
         |SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS antitrust_e6
         |FROM ar4""".stripMargin
    },

    // egonet oracle: the tri-per-vertex census left-joined onto degrees
    "g_egonet" ->
      s"""WITH $cte, canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |tri AS (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM canon e1
         |  JOIN canon e2 ON e1.dst = e2.src
         |  JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |pv AS (SELECT id, count(*) AS triangles FROM (
         |  SELECT a AS id FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri) u GROUP BY id),
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1)
         |SELECT d.id, d.degree, coalesce(pv.triangles, 0) AS triangles,
         |       d.degree + coalesce(pv.triangles, 0) AS ego_edges,
         |       CAST(ROUND((d.degree + coalesce(pv.triangles, 0)) * 2000000.0
         |         / ((d.degree + 1) * d.degree)) AS BIGINT) AS density_e6
         |FROM deg d LEFT JOIN pv ON d.id = pv.id""".stripMargin,

    "g_lp_t3" -> lpSql(3),

    // SCAN oracle: wedge-count common neighbors per canonical edge, the
    // same sqrt-free eps comparison (eps_e3 = 250 → 62500), core =
    // eps-degree >= 2, closure over core-core eps-edges, borders by min
    // core cluster
    "g_scan_t2" ->
      s"""WITH RECURSIVE $cte,
         |sdeg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1),
         |sce AS (SELECT src, dst FROM e0 WHERE src < dst),
         |scm AS (SELECT sce.src, sce.dst, count(*) AS cm
         |        FROM sce
         |        JOIN e0 a ON a.src = sce.src
         |        JOIN e0 b ON b.src = sce.dst AND b.dst = a.dst
         |        GROUP BY 1, 2),
         |seps AS (SELECT sce.src, sce.dst FROM sce
         |         LEFT JOIN scm ON scm.src = sce.src AND scm.dst = sce.dst
         |         JOIN sdeg du ON du.id = sce.src
         |         JOIN sdeg dv ON dv.id = sce.dst
         |         WHERE (coalesce(cm, 0) + 2) * (coalesce(cm, 0) + 2)
         |                 * 1000000
         |               >= 62500 * (du.d + 1) * (dv.d + 1)),
         |sboth AS (SELECT src, dst FROM seps
         |          UNION ALL SELECT dst, src FROM seps),
         |score AS (SELECT src AS id FROM sboth
         |          GROUP BY 1 HAVING count(*) >= 2),
         |scedge AS (SELECT s.src, s.dst FROM seps s
         |           JOIN score a ON a.id = s.src
         |           JOIN score b ON b.id = s.dst),
         |scboth AS (SELECT src, dst FROM scedge
         |           UNION ALL SELECT dst, src FROM scedge),
         |sreach(id, lab) AS (
         |  SELECT id, id FROM score
         |  UNION
         |  SELECT scboth.dst, sreach.lab FROM sreach
         |  JOIN scboth ON scboth.src = sreach.id),
         |sclus AS (SELECT id, min(lab) AS cluster FROM sreach GROUP BY id),
         |sbord AS (SELECT b.src AS id, min(c.cluster) AS cluster
         |          FROM sboth b JOIN sclus c ON c.id = b.dst
         |          WHERE b.src NOT IN (SELECT id FROM score)
         |          GROUP BY 1)
         |SELECT v.id,
         |  CAST(CASE WHEN c.id IS NOT NULL THEN 2
         |            WHEN b.id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS role,
         |  coalesce(c.cluster, b.cluster, -1) AS cluster
         |FROM verts v
         |LEFT JOIN sclus c ON v.id = c.id
         |LEFT JOIN sbord b ON v.id = b.id""".stripMargin,

    // best-match F1 oracle: confusion counts + marginals, per-direction
    // argmax windows over the label tables, e9-rounded bests averaged
    "g_comm_f1" ->
      s"""WITH $cte,
         |${lpStepsSql(3)},
         |fj AS (SELECT s3.label AS p, v.id % 7 AS g, count(*) AS i
         |       FROM s3 JOIN verts v ON s3.id = v.id GROUP BY 1, 2),
         |$f1TailSql""".stripMargin,

    // LP stability oracle: the same F1 machinery over supersteps 2 vs 3
    "g_lp_stability_t3" ->
      s"""WITH $cte,
         |${lpStepsSql(3)},
         |fj AS (SELECT a.label AS p, b.label AS g, count(*) AS i
         |       FROM s2 a JOIN s3 b ON a.id = b.id GROUP BY 1, 2),
         |$f1TailSql""".stripMargin,

    // telemetry oracle: the same unrolled chain aggregated per step —
    // changes_k = |{v : s_k(v) ≠ s_{k−1}(v)}|, communities_k = |s_k labels|
    "g_lp_metrics_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS iter,
           |  (SELECT CAST(coalesce(sum(CASE WHEN a.label <> b.label
           |       THEN 1 ELSE 0 END), 0) AS BIGINT)
           |   FROM s$k a JOIN s${k - 1} b ON a.id = b.id) AS changes,
           |  (SELECT count(DISTINCT label) FROM s$k) AS communities""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $cte,
         |${lpStepsSql(3)}
         |$steps""".stripMargin
    },

    "g_lp_seeded_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""k$k AS (SELECT e0.src AS id, p.label, count(*) AS cnt
           |       FROM e0 JOIN s${k - 1} p ON e0.dst = p.id
           |       WHERE p.label IS NOT NULL GROUP BY 1, 2),
           |x$k AS (SELECT id, label FROM (
           |         SELECT id, label, row_number() OVER (PARTITION BY id
           |           ORDER BY cnt DESC, label ASC) AS rn FROM k$k) t
           |       WHERE rn = 1),
           |s$k AS (SELECT s.id,
           |         CASE WHEN sd.id IS NOT NULL THEN s.label
           |              ELSE coalesce(x.label, s.label) END AS label
           |       FROM s${k - 1} s
           |       LEFT JOIN seeds sd ON s.id = sd.id
           |       LEFT JOIN x$k x ON s.id = x.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |seeds AS (SELECT id, id % 3 AS label FROM verts WHERE id % 25 = 0),
         |s0 AS (SELECT v.id, sd.label FROM verts v
         |       LEFT JOIN seeds sd ON v.id = sd.id),
         |$steps
         |SELECT id, label FROM s3""".stripMargin
    },

    // same unrolled-superstep SQL: the CSR storage form and the skew-plan
    // physical routing must be label-identical to the plain COO plan
    "g_lp_csr_t3" -> lpSql(3),
    "g_lp_skew_t3" -> lpSql(3),
    "g_lp_autoskew_t3" -> lpSql(3),

    "g_lp_semisync_t2" -> semisyncSql(4, 2),
    "g_lp_semisync_colored" -> semisyncColoredSql(sweeps = 2),

    "g_bc_sampled" -> bcSql(),

    // exact-Brandes oracle: the same σ/δ unroll with EVERY vertex a source
    "g_bc_exact" -> bcSql("TRUE"),

    // edge-betweenness oracle: same CTE chain, per-slot aggregation
    "g_edge_bc" -> bcEdgeSql(),

    // topic-sensitive PPR oracle: the pprStepsSql recurrence with a topic
    // dimension threaded through every CTE
    "g_ppr_topics_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""x$k AS (
           |  SELECT p.topic, e0.dst AS id, sum(p.r / d.od) AS s
           |  FROM e0 JOIN r${k - 1} p ON e0.src = p.id
           |  JOIN deg d ON e0.src = d.id
           |  GROUP BY 1, 2
           |), r$k AS (
           |  SELECT v.topic, v.id,
           |    (1.0 - 0.85) * v.reset + 0.85 * coalesce(x.s, 0) AS r
           |  FROM rst v LEFT JOIN x$k x ON x.topic = v.topic AND x.id = v.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS od FROM e0 GROUP BY 1),
         |seeds AS (SELECT CAST(0 AS BIGINT) AS topic, id FROM verts
         |            WHERE id % 50 = 0
         |          UNION ALL
         |          SELECT CAST(1 AS BIGINT), id FROM verts
         |            WHERE id % 50 = 25),
         |sz AS (SELECT topic, count(*) AS ns FROM seeds GROUP BY 1),
         |rst AS (SELECT sz.topic, v.id,
         |          CASE WHEN s.id IS NULL THEN 0.0
         |               ELSE 1.0 / sz.ns END AS reset
         |        FROM sz CROSS JOIN verts v
         |        LEFT JOIN seeds s ON s.topic = sz.topic AND s.id = v.id),
         |r0 AS (SELECT topic, id, reset AS r FROM rst),
         |$steps
         |SELECT topic, id, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_e6
         |FROM r3""".stripMargin
    },

    // double-sweep oracle: two bounded recursive closures, the same
    // (dist desc, id asc) far-vertex pick
    "g_double_sweep" ->
      s"""WITH RECURSIVE $cte,
         |st AS (SELECT min(id) AS id FROM verts),
         |r1(id, dist) AS (
         |  SELECT id, 0 FROM st
         |  UNION
         |  SELECT e0.dst, r1.dist + 1 FROM r1 JOIN e0 ON e0.src = r1.id
         |  WHERE r1.dist < ${graft.algo.Betweenness.DepthCap}),
         |l1 AS (SELECT id, min(dist) AS dist FROM r1 GROUP BY 1),
         |far AS (SELECT id FROM l1 ORDER BY dist DESC, id ASC LIMIT 1),
         |r2(id, dist) AS (
         |  SELECT id, 0 FROM far
         |  UNION
         |  SELECT e0.dst, r2.dist + 1 FROM r2 JOIN e0 ON e0.src = r2.id
         |  WHERE r2.dist < ${graft.algo.Betweenness.DepthCap}),
         |l2 AS (SELECT id, min(dist) AS dist FROM r2 GROUP BY 1)
         |SELECT (SELECT id FROM st) AS start_id,
         |       (SELECT id FROM far) AS far_id,
         |       (SELECT CAST(max(dist) AS BIGINT) FROM l2) AS lb_diameter"""
        .stripMargin,

    "g_lp_weighted_t2" ->
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |vw AS (SELECT DISTINCT src AS id FROM ew),
         |t0 AS (SELECT id, id AS label FROM vw),
         |k1 AS (SELECT ew.src AS id, p.label, sum(ew.weight) AS cnt
         |       FROM ew JOIN t0 p ON ew.dst = p.id GROUP BY 1, 2),
         |x1 AS (SELECT id, label FROM (
         |         SELECT id, label, row_number() OVER (PARTITION BY id
         |           ORDER BY cnt DESC, label ASC) AS rn FROM k1) t WHERE rn = 1),
         |k2 AS (SELECT ew.src AS id, p.label, sum(ew.weight) AS cnt
         |       FROM ew JOIN x1 p ON ew.dst = p.id GROUP BY 1, 2),
         |x2 AS (SELECT id, label FROM (
         |         SELECT id, label, row_number() OVER (PARTITION BY id
         |           ORDER BY cnt DESC, label ASC) AS rn FROM k2) t WHERE rn = 1)
         |SELECT id, label FROM x2""".stripMargin,

    // derived straight from the keys — no regex: normalizeUrl lowercases
    // scheme+host and strips the fragment, so the part link's expected
    // form is the all-lowercase url without '#x'
    "g_anchors" ->
      s"""WITH li AS (SELECT l_partkey AS p, l_suppkey % 13 AS s
         |           FROM lineitem WHERE l_linenumber = 1),
         |pairs AS (
         |  SELECT 'https://host' || CAST(p % 97 AS VARCHAR) || '.example/p/'
         |           || CAST(p AS VARCHAR) AS dst_url,
         |         'part ' || CAST(p AS VARCHAR) AS anchor
         |  FROM li
         |  UNION ALL
         |  SELECT 'https://s' || CAST(s AS VARCHAR) || '.example/',
         |         'supplier ' || CAST(s AS VARCHAR)
         |  FROM li)
         |SELECT dst_url, anchor, count(*) AS n
         |FROM pairs GROUP BY 1, 2""".stripMargin,

    "g_host_edges" -> s"WITH $hostCte\nSELECT src_host, dst_host, weight FROM he",

    // leakage oracle: the same host extraction WITHOUT the intra-host
    // drop, one grouped CASE count
    "g_host_leakage" ->
      // hostCte is interpolated pre-stripped (its own continuation lines
      // START with "||"), so this template must NOT re-stripMargin it
      (s"WITH $hostCte\n" +
        """SELECT sh AS host, count(*) AS n_links,
          |  CAST(sum(CASE WHEN sh = dh THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_intra,
          |  count(*) - CAST(sum(CASE WHEN sh = dh THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_inter,
          |  CAST(ROUND((count(*)
          |      - CAST(sum(CASE WHEN sh = dh THEN 1 ELSE 0 END) AS BIGINT))
          |    * 1000000.0 / count(*)) AS BIGINT) AS leakage_e6
          |FROM hp WHERE sh <> '' AND dh <> ''
          |GROUP BY 1""".stripMargin),

    // community exemplars oracle: LP(3) chain × PR(5) chain, rank rounded
    // to e6 BEFORE the per-community ordering (engine-independent ties)
    "g_comm_top_pages" -> {
      val prSteps = (1 to 5).map { k =>
        s"""qx$k AS (
           |  SELECT e0.dst AS id, sum(p.r / d.od) AS s
           |  FROM e0 JOIN qr${k - 1} p ON e0.src = p.id
           |  JOIN qdeg d ON e0.src = d.id
           |  GROUP BY 1
           |), qr$k AS (
           |  SELECT v.id, 0.15 / (SELECT count(*) FROM verts)
           |         + 0.85 * coalesce(x.s, 0) AS r
           |  FROM verts v LEFT JOIN qx$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |${lpStepsSql(3)},
         |qdeg AS (SELECT src AS id, count(*) AS od FROM e0 GROUP BY 1),
         |qr0 AS (SELECT id, 1.0 / (SELECT count(*) FROM verts) AS r
         |        FROM verts),
         |$prSteps,
         |sc AS (
         |  SELECT s3.label, s3.id,
         |         CAST(ROUND(r.r * 1000000) AS BIGINT) AS rank_e6
         |  FROM s3 JOIN qr5 r ON s3.id = r.id)
         |SELECT label, id, rank_e6, CAST(rn AS BIGINT) AS rn FROM (
         |  SELECT *, row_number() OVER (PARTITION BY label
         |    ORDER BY rank_e6 DESC, id ASC) AS rn FROM sc) t
         |WHERE rn <= 2""".stripMargin
    },

    // spectral radius oracle: the unrolled integer walk-count chain,
    // sums at steps 3 and 4
    "g_spectral_radius" -> {
      val steps = (1 to 4).map { k =>
        s"""ww$k AS (
           |  SELECT v.id, coalesce(x.s, 0) AS w
           |  FROM verts v LEFT JOIN (
           |    SELECT e0.dst AS id, sum(p.w) AS s
           |    FROM e0 JOIN ww${k - 1} p ON e0.src = p.id GROUP BY 1) x
           |  ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |ww0 AS (SELECT id, CAST(1 AS BIGINT) AS w FROM verts),
         |$steps
         |SELECT CAST((SELECT sum(w) FROM ww3) AS BIGINT) AS w_prev,
         |       CAST((SELECT sum(w) FROM ww4) AS BIGINT) AS w_next,
         |       CAST(ROUND(CAST((SELECT sum(w) FROM ww4) AS DOUBLE)
         |         / (SELECT sum(w) FROM ww3) * 1000000) AS BIGINT)
         |         AS lambda_e6""".stripMargin
    },

    // weighted power iteration over the host graph with the per-step
    // dangling-mass scalar (hosts never seen as a link SOURCE), mirroring
    // PageRank.runFixedWeighted's arithmetic order exactly
    "g_host_pagerank_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""dm$k AS (
           |  SELECT coalesce(sum(r), 0) AS dm FROM r${k - 1}
           |  WHERE id NOT IN (SELECT id FROM wout)
           |), x$k AS (
           |  SELECT he.dst_host AS id, sum(p.r * he.weight / w.wout) AS s
           |  FROM he JOIN r${k - 1} p ON he.src_host = p.id
           |  JOIN wout w ON he.src_host = w.id
           |  GROUP BY 1
           |), r$k AS (
           |  SELECT v.id, 0.15 / (SELECT count(*) FROM vh)
           |    + 0.85 * (coalesce(x.s, 0)
           |              + (SELECT dm FROM dm$k) / (SELECT count(*) FROM vh)) AS r
           |  FROM vh v LEFT JOIN x$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      // assembled by concatenation: an outer stripMargin would also strip
      // the first `|` of `||` concatenations at line starts inside the
      // interpolated hostCte
      val setup =
        """vh AS (SELECT src_host AS id FROM he
          |       UNION SELECT dst_host FROM he),
          |wout AS (SELECT src_host AS id, CAST(sum(weight) AS BIGINT) AS wout
          |         FROM he GROUP BY 1),
          |r0 AS (SELECT id, 1.0 / (SELECT count(*) FROM vh) AS r FROM vh),""".stripMargin
      s"WITH $hostCte,\n$setup\n$steps\n" +
        "SELECT id AS host, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_e6 FROM r3"
    },

    "g_pagerank_t5" -> prSql(5),

    // roughness oracle: the prSql(5) chain as a subquery feeding the
    // squared-difference tag join
    "g_rank_roughness_t5" ->
      s"""WITH $cte,
         |pr AS (${prSql(5)})
         |SELECT e0.src AS id, CAST(count(*) AS BIGINT) AS deg,
         |  CAST(sum((a.rank_e6 - b.rank_e6) * (a.rank_e6 - b.rank_e6))
         |    AS BIGINT) AS energy
         |FROM e0 JOIN pr a ON a.id = e0.src JOIN pr b ON b.id = e0.dst
         |GROUP BY 1""".stripMargin,

    // PR residual-curve oracle: the shared rank chain, per-vertex e12
    // rounding before each per-iteration sum (order-free aggregation)
    "g_pr_delta_t3" -> {
      val deltas = (1 to 3).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS iter,
           |  CAST(sum(CAST(ROUND(abs(a.r - b.r) * 1000000000000.0)
           |    AS BIGINT)) AS BIGINT) AS delta_e12
           |FROM pr$k a JOIN pr${k - 1} b ON a.id = b.id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $cte,
         |${prChainSql("p", "e0", 3)}
         |$deltas""".stripMargin
    },

    "g_pr_top10" ->
      s"""WITH pq AS (
         |${prSql(3)}
         |)
         |SELECT id, rank_e6 FROM pq
         |ORDER BY rank_e6 DESC, id ASC LIMIT 10""".stripMargin,

    // spam mass: prSql(5)'s uniform-reset chain (p*) and g_ppr_t5's
    // trusted-reset chain (t*) run side by side, then one join — the
    // exact composition the engine performs
    "g_spam_mass_t5" -> {
      val pSteps = (1 to 5).map { k =>
        s"""px$k AS (
           |  SELECT e0.dst AS id, sum(p.r / d.od) AS s
           |  FROM e0 JOIN p${k - 1} p ON e0.src = p.id JOIN deg d ON e0.src = d.id
           |  GROUP BY 1
           |), p$k AS (
           |  SELECT v.id, 0.15 / (SELECT count(*) FROM verts)
           |         + 0.85 * coalesce(x.s, 0) AS r
           |  FROM verts v LEFT JOIN px$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      val tSteps = (1 to 5).map { k =>
        s"""tx$k AS (
           |  SELECT e0.dst AS id, sum(p.r / d.od) AS s
           |  FROM e0 JOIN t${k - 1} p ON e0.src = p.id JOIN deg d ON e0.src = d.id
           |  GROUP BY 1
           |), t$k AS (
           |  SELECT v.id, (1.0 - 0.85) * v.reset + 0.85 * coalesce(x.s, 0) AS r
           |  FROM rst v LEFT JOIN tx$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS od FROM e0 GROUP BY 1),
         |p0 AS (SELECT id, 1.0 / (SELECT count(*) FROM verts) AS r FROM verts),
         |$pSteps,
         |srcs AS (SELECT id FROM verts WHERE id % 10 = 0),
         |rst AS (
         |  SELECT v.id,
         |    CASE WHEN s.id IS NULL THEN 0.0
         |         ELSE 1.0 / (SELECT count(*) FROM srcs) END AS reset
         |  FROM verts v LEFT JOIN srcs s ON v.id = s.id),
         |t0 AS (SELECT id, reset AS r FROM rst),
         |$tSteps
         |SELECT p.id,
         |  CAST(ROUND(p.r * 1000000) AS BIGINT) AS rank_e6,
         |  CAST(ROUND(t.r * 1000000) AS BIGINT) AS trust_e6,
         |  CAST(ROUND((p.r - t.r) * 1000000.0 / p.r) AS BIGINT) AS relmass_e6
         |FROM p5 p JOIN t5 t ON p.id = t.id""".stripMargin
    },

    // SALSA: the HITS unroll with every gather term divided by the far
    // side's degree (outdeg on the authority gather, indeg on the hub
    // gather), divisions INSIDE the sums exactly as the engine computes
    "g_salsa_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""ar$k AS (
           |  SELECT r.dst AS id, sum(p.hub / o.od) AS a
           |  FROM rawd r JOIN s${k - 1} p ON r.src = p.id
           |  JOIN odeg o ON r.src = o.id GROUP BY 1),
           |aj$k AS MATERIALIZED (
           |  SELECT v.id, coalesce(ar.a, 0) AS a
           |  FROM vd v LEFT JOIN ar$k ar ON v.id = ar.id),
           |an$k AS MATERIALIZED (
           |  SELECT id, a / (SELECT sum(a) FROM aj$k) AS auth FROM aj$k),
           |hr$k AS (
           |  SELECT r.src AS id, sum(an.auth / i.ind) AS h
           |  FROM rawd r JOIN an$k an ON r.dst = an.id
           |  JOIN ideg i ON r.dst = i.id GROUP BY 1),
           |hj$k AS MATERIALIZED (
           |  SELECT v.id, coalesce(hr.h, 0) AS h
           |  FROM vd v LEFT JOIN hr$k hr ON v.id = hr.id),
           |s$k AS MATERIALIZED (
           |  SELECT an.id, an.auth, hj.h / (SELECT sum(h) FROM hj$k) AS hub
           |  FROM an$k an JOIN hj$k hj ON an.id = hj.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |vd AS (SELECT src AS id FROM rawd UNION SELECT dst FROM rawd),
         |odeg AS (SELECT src AS id, count(*) AS od FROM rawd GROUP BY 1),
         |ideg AS (SELECT dst AS id, count(*) AS ind FROM rawd GROUP BY 1),
         |s0 AS MATERIALIZED (
         |  SELECT id, 1.0 / (SELECT count(*) FROM vd) AS auth,
         |         1.0 / (SELECT count(*) FROM vd) AS hub FROM vd),
         |$steps
         |SELECT id, CAST(ROUND(auth * 1000000) AS BIGINT) AS auth_e6,
         |       CAST(ROUND(hub * 1000000) AS BIGINT) AS hub_e6
         |FROM s3""".stripMargin
    },

    // Katz with α=1/200 as the exact integer recurrence
    // z_k = 200^k + Σ_{u→v} z_{k-1}(u); katz_e6 = round(z_3·1e6 / 200^3)
    "g_katz_t3" -> {
      val steps = (1 to 3).map { k =>
        val scale = math.pow(200.0, k).toLong
        s"""kx$k AS (
           |  SELECT e0.dst AS id, CAST(sum(p.z) AS BIGINT) AS s
           |  FROM e0 JOIN k${k - 1} p ON e0.src = p.id GROUP BY 1
           |), k$k AS (
           |  SELECT v.id, CAST($scale + coalesce(x.s, 0) AS BIGINT) AS z
           |  FROM verts v LEFT JOIN kx$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |k0 AS (SELECT id, CAST(1 AS BIGINT) AS z FROM verts),
         |$steps
         |SELECT id, CAST(ROUND(z * 1000000.0 / 8000000.0) AS BIGINT) AS katz_e6
         |FROM k3""".stripMargin
    },

    // eigenvector power iterate: exact integer walk counts (BIGINT all
    // the way), one final L1 normalization with identical operand order
    "g_eigen_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""w$k AS (
           |  SELECT v.id, CAST(coalesce(x.s, 0) AS BIGINT) AS w
           |  FROM verts v LEFT JOIN (
           |    SELECT e0.dst AS id, CAST(sum(p.w) AS BIGINT) AS s
           |    FROM e0 JOIN w${k - 1} p ON e0.src = p.id GROUP BY 1) x
           |  ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |w0 AS (SELECT id, CAST(1 AS BIGINT) AS w FROM verts),
         |$steps,
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM w3)
         |SELECT id, w AS walks,
         |  CAST(ROUND(w * 1000000.0 / (SELECT t FROM tot)) AS BIGINT) AS score_e6
         |FROM w3""".stripMargin
    },

    // coreness: the engine's fixed schedule replayed literally — levels
    // k=1..8, three degree-filter rounds each, every level starting from
    // the previous level's survivors; coreness = max surviving level
    "g_coreness" -> {
      val levels = (1 to 8).map { k =>
        val rounds = (1 to 3).map { r =>
          val prev = if (r == 1) s"c${k - 1}" else s"a${k}_${r - 1}"
          s"""a${k}_$r AS MATERIALIZED (
             |  SELECT se0.src AS id
             |  FROM se0
             |  JOIN $prev x ON se0.src = x.id
             |  JOIN $prev y ON se0.dst = y.id
             |  GROUP BY 1 HAVING count(*) >= $k)""".stripMargin
        }.mkString(",\n")
        s"""$rounds,
           |c$k AS MATERIALIZED (SELECT id FROM a${k}_3)""".stripMargin
      }.mkString(",\n")
      val mem = (1 to 8).map(k =>
        s"SELECT id, CAST($k AS BIGINT) AS k FROM c$k").mkString("\n  UNION ALL ")
      s"""WITH $sparseCte,
         |c0 AS (SELECT id FROM sverts),
         |$levels,
         |mem AS (
         |  $mem)
         |SELECT v.id, CAST(coalesce(max(m.k), 0) AS BIGINT) AS coreness
         |FROM sverts v LEFT JOIN mem m ON v.id = m.id
         |GROUP BY 1""".stripMargin
    },

    // onion layers: the identical (k=1..8, 3 rounds/level) peel grid;
    // the removal table at (k, r) is the diff of consecutive survivor
    // sets, survivors of the whole schedule land in layer 8*3+1
    "g_onion_layers" -> {
      val levels = (1 to 8).map { k =>
        val rounds = (1 to 3).map { r =>
          val prev = if (r == 1) s"c${k - 1}" else s"a${k}_${r - 1}"
          s"""a${k}_$r AS MATERIALIZED (
             |  SELECT se0.src AS id
             |  FROM se0
             |  JOIN $prev x ON se0.src = x.id
             |  JOIN $prev y ON se0.dst = y.id
             |  GROUP BY 1 HAVING count(*) >= $k)""".stripMargin
        }.mkString(",\n")
        s"""$rounds,
           |c$k AS MATERIALIZED (SELECT id FROM a${k}_3)""".stripMargin
      }.mkString(",\n")
      val removals = (1 to 8).flatMap { k =>
        (1 to 3).map { r =>
          val prev = if (r == 1) s"c${k - 1}" else s"a${k}_${r - 1}"
          val layer = (k - 1) * 3 + r
          s"""SELECT id, CAST($layer AS BIGINT) AS layer FROM
             |  (SELECT id FROM $prev EXCEPT SELECT id FROM a${k}_$r)""".stripMargin
        }
      }.mkString("\n  UNION ALL ")
      s"""WITH $sparseCte,
         |c0 AS (SELECT id FROM sverts),
         |$levels
         |$removals
         |  UNION ALL SELECT id, CAST(25 AS BIGINT) AS layer FROM c8""".stripMargin
    },

    // joint degree distribution: the same two-join degree gather as
    // g_annd, aggregated to the (k_src, k_dst) histogram
    "g_joint_degree" ->
      s"""WITH $cte,
         |dg AS (SELECT src AS id, count(*) AS k FROM e0 GROUP BY 1)
         |SELECT ds.k AS k_src, dd.k AS k_dst, count(*) AS n_slots
         |FROM e0 JOIN dg ds ON e0.src = ds.id JOIN dg dd ON e0.dst = dd.id
         |GROUP BY 1, 2""".stripMargin,

    // average neighbor degree: integer sums, one mirrored division
    "g_annd" ->
      s"""WITH $cte,
         |dg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1)
         |SELECT e0.src AS id, CAST(count(*) AS BIGINT) AS deg,
         |  CAST(sum(dg.d) AS BIGINT) AS sum_nbr_deg,
         |  CAST(ROUND(CAST(sum(dg.d) AS BIGINT) * 1000000.0 / count(*))
         |       AS BIGINT) AS annd_e6
         |FROM e0 JOIN dg ON e0.dst = dg.id
         |GROUP BY 1""".stripMargin,

    // rich club: degree / min-endpoint-degree histograms, then the
    // constant k-range theta-joined against the histograms only
    "g_richclub" ->
      s"""WITH $cte,
         |dg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1),
         |sm AS (
         |  SELECT least(ds.d, dd.d) AS mind
         |  FROM e0 JOIN dg ds ON e0.src = ds.id JOIN dg dd ON e0.dst = dd.id),
         |dh AS (SELECT d, count(*) AS nodes FROM dg GROUP BY 1),
         |mh AS (SELECT mind, count(*) AS slots FROM sm GROUP BY 1),
         |ks AS (SELECT range AS k FROM range(1, 17)),
         |nk AS (SELECT k, CAST(sum(nodes) AS BIGINT) AS n_k
         |       FROM ks JOIN dh ON dh.d > ks.k GROUP BY 1),
         |ek AS (SELECT k, CAST(sum(slots) AS BIGINT) AS e_k
         |       FROM ks JOIN mh ON mh.mind > ks.k GROUP BY 1)
         |SELECT nk.k, nk.n_k, CAST(coalesce(ek.e_k, 0) AS BIGINT) AS e_k,
         |  CAST(ROUND(CAST(coalesce(ek.e_k, 0) AS BIGINT) * 1000000.0
         |       / (nk.n_k * (nk.n_k - 1))) AS BIGINT) AS phi_e6
         |FROM nk LEFT JOIN ek ON nk.k = ek.k
         |WHERE nk.n_k >= 2""".stripMargin,

    "g_triangles" ->
      s"""WITH $cte, canon AS (SELECT src, dst FROM e0 WHERE src < dst)
         |SELECT count(*) AS triangles
         |FROM canon e1
         |JOIN canon e2 ON e1.dst = e2.src
         |JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin,

    // 2 unrolled 4-truss peel rounds: per-round triangle enumeration over
    // the surviving canonical edges, support grouped per edge, filter at
    // support >= k-2 = 2
    "g_truss_t2" -> {
      val rounds = (1 to 2).map { r =>
        s"""t$r AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
           |       FROM c${r - 1} e1 JOIN c${r - 1} e2 ON e1.dst = e2.src
           |       JOIN c${r - 1} e3 ON e3.src = e1.src AND e3.dst = e2.dst),
           |s$r AS (SELECT src, dst, count(*) AS s FROM (
           |         SELECT a AS src, b AS dst FROM t$r
           |         UNION ALL SELECT b, c FROM t$r
           |         UNION ALL SELECT a, c FROM t$r) u GROUP BY 1, 2),
           |c$r AS (SELECT c.src, c.dst FROM c${r - 1} c
           |       JOIN s$r s ON s.src = c.src AND s.dst = c.dst
           |       WHERE s.s >= 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |c0 AS (SELECT src, dst FROM e0 WHERE src < dst),
         |$rounds
         |SELECT c0.src, c0.dst,
         |  CAST(CASE WHEN c2.src IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |    AS in_truss
         |FROM c0 LEFT JOIN c2 ON c0.src = c2.src AND c0.dst = c2.dst""".stripMargin
    },

    "g_trussness" -> {
      val maxK = 5; val roundsPerK = 2
      val levels = (3 to maxK).map { k =>
        val rounds = (1 to roundsPerK).map { r =>
          val prev = if (r == 1) s"c${k - 1}f" else s"c${k}_${r - 1}"
          s"""t${k}_$r AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
             |  FROM $prev e1 JOIN $prev e2 ON e1.dst = e2.src
             |  JOIN $prev e3 ON e3.src = e1.src AND e3.dst = e2.dst),
             |s${k}_$r AS (SELECT src, dst, count(*) AS s FROM (
             |  SELECT a AS src, b AS dst FROM t${k}_$r
             |  UNION ALL SELECT b, c FROM t${k}_$r
             |  UNION ALL SELECT a, c FROM t${k}_$r) u GROUP BY 1, 2),
             |c${k}_$r AS MATERIALIZED (SELECT c.src, c.dst FROM $prev c
             |  JOIN s${k}_$r s ON s.src = c.src AND s.dst = c.dst
             |  WHERE s.s >= ${k - 2})""".stripMargin
        }.mkString(",\n")
        s"""$rounds,
           |c${k}f AS MATERIALIZED (SELECT src, dst FROM c${k}_$roundsPerK)"""
          .stripMargin
      }.mkString(",\n")
      val caseArm = (maxK to 3 by -1).map { k =>
        s"WHEN k$k.src IS NOT NULL THEN $k"
      }.mkString(" ")
      val joins = (3 to maxK).map { k =>
        s"LEFT JOIN c${k}f k$k ON b.src = k$k.src AND b.dst = k$k.dst"
      }.mkString("\n")
      s"""WITH $cte,
         |c2f AS MATERIALIZED (SELECT src, dst FROM e0 WHERE src < dst),
         |$levels
         |SELECT b.src, b.dst,
         |  CAST(CASE $caseArm ELSE 2 END AS BIGINT) AS trussness
         |FROM c2f b
         |$joins""".stripMargin
    },

    "g_partition_t2" -> {
      s"""WITH $cte,
         |${balancedLpCtes(k = 4, iters = 2)}
         |SELECT id, CAST(shard AS BIGINT) AS shard FROM a2""".stripMargin
    },

    "g_partition_cut" -> {
      s"""WITH $cte,
         |${balancedLpCtes(k = 4, iters = 2)},
         |lab AS (SELECT a.shard AS ss, b.shard AS ds FROM e0
         |        JOIN a2 a ON e0.src = a.id JOIN a2 b ON e0.dst = b.id),
         |cut AS (SELECT count(*) AS n_edges,
         |          CAST(sum(CASE WHEN ss <> ds THEN 1 ELSE 0 END)
         |            AS BIGINT) AS cut_edges
         |        FROM lab),
         |bal AS (SELECT max(sz) AS max_sz, CAST(sum(sz) AS BIGINT)
         |            AS n_vertices, count(*) AS kk
         |        FROM (SELECT shard, count(*) AS sz FROM a2 GROUP BY 1))
         |SELECT n_vertices, n_edges, cut_edges,
         |  cut_edges * 1000000 // n_edges AS cut_e6,
         |  max_sz * kk * 1000000 // n_vertices AS balance_e6
         |FROM cut, bal""".stripMargin
    },

    "g_grid_cut" ->
      s"""WITH $cte,
         |sh AS (SELECT src, dst, (src % 4) * 4 + dst % 4 AS eshard FROM e0),
         |r AS (SELECT DISTINCT id, eshard FROM (
         |        SELECT src AS id, eshard FROM sh
         |        UNION ALL SELECT dst AS id, eshard FROM sh) u)
         |SELECT CAST(16 AS BIGINT) AS k,
         |  CAST(count(DISTINCT id) AS BIGINT) AS n_vertices,
         |  CAST(count(*) AS BIGINT) AS n_replicas,
         |  count(*) * 1000000 // count(DISTINCT id) AS rf_e6
         |FROM r""".stripMargin,

    "g_quotient" ->
      s"""WITH $cte,
         |lab AS (SELECT id, id % 7 AS label FROM verts)
         |SELECT a.label AS src_label, b.label AS dst_label,
         |  count(*) AS weight
         |FROM e0 JOIN lab a ON e0.src = a.id JOIN lab b ON e0.dst = b.id
         |GROUP BY 1, 2""".stripMargin,

    "g_vertex_cut" ->
      s"""WITH $cte,
         |sh AS (SELECT src, dst,
         |         ('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR),
         |           1, 15))::BIGINT % 8 AS eshard
         |       FROM e0),
         |r AS (SELECT DISTINCT id, eshard FROM (
         |        SELECT src AS id, eshard FROM sh
         |        UNION ALL SELECT dst AS id, eshard FROM sh) u)
         |SELECT CAST(8 AS BIGINT) AS k,
         |  CAST(count(DISTINCT id) AS BIGINT) AS n_vertices,
         |  CAST(count(*) AS BIGINT) AS n_replicas,
         |  count(*) * 1000000 // count(DISTINCT id) AS rf_e6
         |FROM r""".stripMargin,

    // exact-centrality oracle: the sampled-closeness closure with every
    // vertex a source (same depth cap, same recurrence)
    "g_harmonic_exact" ->
      s"""WITH RECURSIVE $cte,
         |reach(source, id, dist) AS (
         |  SELECT id, id, 0 FROM verts
         |  UNION
         |  SELECT r.source, e0.dst, r.dist + 1
         |  FROM reach r JOIN e0 ON e0.src = r.id
         |  WHERE r.dist < ${graft.algo.Betweenness.DepthCap}),
         |d AS (SELECT source, id, min(dist) AS dist FROM reach GROUP BY 1, 2),
         |agg AS (
         |  SELECT source AS id, count(*) AS reached,
         |         sum(1.0 / dist) AS harm, sum(dist) AS sd
         |  FROM d WHERE dist > 0 GROUP BY 1)
         |SELECT v.id,
         |  coalesce(a.reached, 0) AS reached,
         |  CAST(ROUND(coalesce(a.harm, 0) * 1000000) AS BIGINT) AS harmonic_e6,
         |  CAST(ROUND(coalesce(a.reached / a.sd, 0) * 1000000) AS BIGINT)
         |    AS closeness_e6
         |FROM verts v LEFT JOIN agg a ON v.id = a.id""".stripMargin,

    // small-world oracle: integer census + double moments + all-pairs
    // depth-capped min distances, every ratio the engine's expression
    "g_small_world" ->
      s"""WITH RECURSIVE $cte,
         |ndeg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |nm AS (SELECT CAST(sum(degree) AS DOUBLE) AS s1,
         |         CAST(sum(degree * degree) AS DOUBLE) AS s2,
         |         CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS wedges
         |       FROM ndeg),
         |canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |tri AS (SELECT count(*) AS triangles
         |        FROM canon e1
         |        JOIN canon e2 ON e1.dst = e2.src
         |        JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |reach(source, id, dist) AS (
         |  SELECT id, id, 0 FROM verts
         |  UNION
         |  SELECT r.source, e0.dst, r.dist + 1
         |  FROM reach r JOIN e0 ON e0.src = r.id
         |  WHERE r.dist < ${graft.algo.Betweenness.DepthCap}),
         |d AS (SELECT source, id, min(dist) AS dist FROM reach GROUP BY 1, 2),
         |lpp AS (SELECT CAST(sum(dist) AS BIGINT) AS sum_dist,
         |          count(*) AS pairs FROM d WHERE dist > 0),
         |nv AS (SELECT count(*) AS n FROM verts)
         |SELECT
         |  CAST(ROUND((CASE WHEN m.wedges = 0 THEN 0.0
         |    ELSE 3.0 * t.triangles / m.wedges END) * 1000000) AS BIGINT)
         |    AS c_e6,
         |  CAST(ROUND((m.s2 - m.s1) * (m.s2 - m.s1)
         |    / (m.s1 * m.s1 * m.s1) * 1000000) AS BIGINT) AS c_null_e6,
         |  CAST(ROUND(l.sum_dist / l.pairs * 1000000) AS BIGINT) AS l_e6,
         |  CAST(ROUND(ln(v.n) / ln(m.s1 / v.n) * 1000000) AS BIGINT)
         |    AS l_null_e6,
         |  CAST(ROUND(((CASE WHEN m.wedges = 0 THEN 0.0
         |      ELSE 3.0 * t.triangles / m.wedges END)
         |      / ((m.s2 - m.s1) * (m.s2 - m.s1) / (m.s1 * m.s1 * m.s1)))
         |    / ((l.sum_dist / l.pairs) / (ln(v.n) / ln(m.s1 / v.n)))
         |    * 1000) AS BIGINT) AS sigma_e3
         |FROM nm m, tri t, lpp l, nv v""".stripMargin,

    // per-community modularity oracle: LP-3 labels, intra census + the
    // (vol² − Σk²)/2m correction per label, identical double expression
    "g_comm_modularity" ->
      s"""WITH $cte,
         |${lpStepsSql(3)},
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM e0),
         |cdeg AS (SELECT src AS id, count(*) AS k FROM e0 GROUP BY 1),
         |com AS (SELECT s3.label, count(*) AS n_vertices,
         |          CAST(sum(coalesce(cdeg.k, 0)) AS BIGINT) AS vol,
         |          CAST(sum(coalesce(cdeg.k, 0) * coalesce(cdeg.k, 0))
         |            AS BIGINT) AS ksq
         |        FROM s3 LEFT JOIN cdeg ON cdeg.id = s3.id
         |        GROUP BY 1),
         |intra AS (SELECT a.label, count(*) AS intra_slots
         |          FROM e0
         |          JOIN s3 a ON a.id = e0.src
         |          JOIN s3 b ON b.id = e0.dst
         |          WHERE a.label = b.label AND e0.src <> e0.dst
         |          GROUP BY 1)
         |SELECT c.label, c.n_vertices,
         |  CAST(coalesce(i.intra_slots, 0) AS BIGINT) AS intra_slots, c.vol,
         |  CAST(ROUND((coalesce(i.intra_slots, 0)
         |    - (c.vol * c.vol - c.ksq) / (SELECT m2 FROM mm))
         |    / (SELECT m2 FROM mm) * 1000000000) AS BIGINT) AS q_e9
         |FROM com c LEFT JOIN intra i ON i.label = c.label""".stripMargin,

    // C(k)-curve oracle: the per-vertex triangle census (as g_egonet),
    // per-vertex e6 LCC, then the per-degree integer mean
    "g_ck_curve" ->
      s"""WITH $cte, canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |tri AS (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM canon e1
         |  JOIN canon e2 ON e1.dst = e2.src
         |  JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |pv AS (SELECT id, count(*) AS triangles FROM (
         |  SELECT a AS id FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri) u GROUP BY id),
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |per AS (
         |  SELECT d.degree,
         |    CAST(ROUND(coalesce(pv.triangles, 0) * 2000000.0
         |      / (d.degree * (d.degree - 1))) AS BIGINT) AS lcc_e6
         |  FROM deg d LEFT JOIN pv ON pv.id = d.id
         |  WHERE d.degree >= 2)
         |SELECT degree, count(*) AS n,
         |  CAST(ROUND(CAST(sum(lcc_e6) AS BIGINT) / count(*)) AS BIGINT)
         |    AS mean_lcc_e6
         |FROM per GROUP BY degree""".stripMargin,

    // connectivity-refinement oracle: LP-3 labels, intra-community edge
    // subgraph, recursive min-id closure over it, singletons to own id
    "g_refine_connected" ->
      s"""WITH RECURSIVE $cte,
         |${lpStepsSql(3)},
         |intra AS (
         |  SELECT e0.src, e0.dst FROM e0
         |  JOIN s3 a ON a.id = e0.src
         |  JOIN s3 b ON b.id = e0.dst
         |  WHERE a.label = b.label),
         |ireach(id, lab) AS (
         |  SELECT src, src FROM intra
         |  UNION
         |  SELECT intra.dst, ireach.lab
         |  FROM ireach JOIN intra ON intra.src = ireach.id
         |), icomp AS (SELECT id, min(lab) AS comp FROM ireach GROUP BY id)
         |SELECT s3.id, s3.label, coalesce(icomp.comp, s3.id) AS refined
         |FROM s3 LEFT JOIN icomp ON icomp.id = s3.id""".stripMargin,

    // embeddedness oracle: common neighbors per canonical edge via the
    // two-neighborhood join on the symmetrized slots (self-loop-free, so
    // the shared neighbor can never be an endpoint), Onnela overlap at
    // e6 with the identical double expression, local bridge = common 0
    "g_embeddedness" ->
      s"""WITH $cte, canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |sup AS (
         |  SELECT c.src, c.dst, count(*) AS common
         |  FROM canon c
         |  JOIN e0 n1 ON n1.src = c.src
         |  JOIN e0 n2 ON n2.src = c.dst AND n2.dst = n1.dst
         |  GROUP BY 1, 2)
         |SELECT c.src, c.dst,
         |  CAST(coalesce(sup.common, 0) AS BIGINT) AS common,
         |  CASE WHEN du.degree + dv.degree - 2 - coalesce(sup.common, 0) <= 0
         |       THEN 0
         |       ELSE CAST(ROUND(coalesce(sup.common, 0) * 1000000.0
         |         / (du.degree + dv.degree - 2 - coalesce(sup.common, 0)))
         |         AS BIGINT) END AS overlap_e6,
         |  CASE WHEN coalesce(sup.common, 0) = 0
         |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
         |    AS local_bridge
         |FROM canon c
         |LEFT JOIN sup ON sup.src = c.src AND sup.dst = c.dst
         |JOIN deg du ON du.id = c.src
         |JOIN deg dv ON dv.id = c.dst""".stripMargin,

    // Forman curvature oracle: the embeddedness support/degree joins
    // with the 4 − du − dv + 3·common integer formula
    "g_forman" ->
      s"""WITH $cte, canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |sup AS (
         |  SELECT c.src, c.dst, count(*) AS common
         |  FROM canon c
         |  JOIN e0 n1 ON n1.src = c.src
         |  JOIN e0 n2 ON n2.src = c.dst AND n2.dst = n1.dst
         |  GROUP BY 1, 2)
         |SELECT c.src, c.dst,
         |  CAST(4 - du.degree - dv.degree + 3 * coalesce(sup.common, 0)
         |    AS BIGINT) AS curvature
         |FROM canon c
         |LEFT JOIN sup ON sup.src = c.src AND sup.dst = c.dst
         |JOIN deg du ON du.id = c.src
         |JOIN deg dv ON dv.id = c.dst""".stripMargin,

    // non-backtracking oracle: unrolled Hashimoto steps — extend each
    // directed-edge walk along the head vertex, forbidding immediate
    // reversal, then sum incoming counts per vertex
    "g_nonbacktrack_t3" -> {
      val steps = (1 to 3).map { t =>
        s"""nb$t AS MATERIALIZED (
           |  SELECT p.dst AS src, e.dst AS dst, CAST(sum(p.c) AS BIGINT) AS c
           |  FROM nb${t - 1} p JOIN e0 e ON e.src = p.dst
           |  WHERE e.dst <> p.src
           |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |nb0 AS (SELECT src, dst, CAST(1 AS BIGINT) AS c FROM e0),
         |$steps
         |SELECT dst AS id, CAST(sum(c) AS BIGINT) AS nb_count
         |FROM nb3 GROUP BY 1""".stripMargin
    },

    // closed-walks oracle: degree, triangle, and wedge-pair CTEs — the
    // A²/A³/A⁴ diagonal identities verbatim
    "g_closed_walks" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS deg FROM e0 GROUP BY 1),
         |tri AS (
         |  SELECT id, count(*) AS t FROM (
         |    SELECT a.src AS id FROM e0 a
         |    JOIN e0 b ON b.src = a.dst AND b.dst > a.dst
         |    JOIN e0 c ON c.src = a.src AND c.dst = b.dst
         |    WHERE a.dst > a.src) x GROUP BY 1
         |  UNION ALL
         |  SELECT id, count(*) AS t FROM (
         |    SELECT a.dst AS id FROM e0 a
         |    JOIN e0 b ON b.src = a.dst AND b.dst > a.dst
         |    JOIN e0 c ON c.src = a.src AND c.dst = b.dst
         |    WHERE a.dst > a.src) x GROUP BY 1
         |  UNION ALL
         |  SELECT id, count(*) AS t FROM (
         |    SELECT b.dst AS id FROM e0 a
         |    JOIN e0 b ON b.src = a.dst AND b.dst > a.dst
         |    JOIN e0 c ON c.src = a.src AND c.dst = b.dst
         |    WHERE a.dst > a.src) x GROUP BY 1),
         |triv AS (SELECT id, CAST(sum(t) AS BIGINT) AS t FROM tri GROUP BY 1),
         |cnsq AS (
         |  SELECT a AS id, CAST(sum(cn * cn) AS BIGINT) AS cn_sq FROM (
         |    SELECT x.dst AS a, y.dst AS b, count(*) AS cn
         |    FROM e0 x JOIN e0 y ON x.src = y.src AND x.dst <> y.dst
         |    GROUP BY 1, 2) p GROUP BY 1)
         |SELECT d.id, CAST(d.deg AS BIGINT) AS walks2,
         |  CAST(2 * coalesce(tv.t, 0) AS BIGINT) AS walks3,
         |  CAST(d.deg * d.deg + coalesce(c.cn_sq, 0) AS BIGINT) AS walks4
         |FROM deg d
         |LEFT JOIN triv tv ON tv.id = d.id
         |LEFT JOIN cnsq c ON c.id = d.id""".stripMargin,

    // map-equation oracle: the conductance (cut, vol) algebra plus the
    // degree table, combined with the same plogp(base-2) terms
    "g_map_equation" ->
      s"""WITH $cte,
         |lab AS (SELECT id, id % 7 AS label FROM verts),
         |tag AS (SELECT a.label AS ls, b.label AS ld
         |        FROM e0 JOIN lab a ON e0.src = a.id
         |        JOIN lab b ON e0.dst = b.id),
         |m2 AS (SELECT CAST(count(*) AS DOUBLE) AS m2 FROM e0),
         |pm AS (SELECT ls AS label,
         |         CAST(sum(CASE WHEN ls <> ld THEN 1 ELSE 0 END) AS BIGINT)
         |           AS cut,
         |         count(*) AS vol
         |       FROM tag GROUP BY 1),
         |ma AS (SELECT sum(cut) AS qsum,
         |    sum(CASE WHEN cut > 0
         |        THEN (cut / m2.m2) * log2(cut / m2.m2) ELSE 0 END) AS hq,
         |    sum(((cut + vol) / m2.m2) * log2((cut + vol) / m2.m2)) AS hqp
         |  FROM pm, m2),
         |hv AS (SELECT sum((deg / m2.m2) * log2(deg / m2.m2)) AS hv
         |       FROM (SELECT src, count(*) AS deg FROM e0 GROUP BY 1) d, m2)
         |SELECT CAST(ROUND((CASE WHEN ma.qsum > 0
         |    THEN (ma.qsum / m2.m2) * log2(ma.qsum / m2.m2) ELSE 0 END
         |  - ma.hq - hv.hv + ma.hqp) * 1000000) AS BIGINT) AS map_e6
         |FROM ma, hv, m2""".stripMargin,

    // core–periphery oracle: the g_kcore_t3 peel feeding the
    // Borgatti–Everett agreement algebra over canonical edges
    "g_coreperiphery_t3" -> {
      val peels = (1 to 3).map { t =>
        s"""s$t AS MATERIALIZED (
           |  SELECT e0.src AS id, count(*) AS deg
           |  FROM e0
           |  JOIN v${t - 1} a ON e0.src = a.id
           |  JOIN v${t - 1} b ON e0.dst = b.id
           |  GROUP BY 1),
           |v$t AS MATERIALIZED (
           |  SELECT id FROM s$t, kk WHERE deg >= kk.k)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |kk AS (SELECT CAST(FLOOR(
         |         (SELECT count(*) FROM e0) / (SELECT count(*) FROM verts))
         |       AS BIGINT) AS k),
         |v0 AS (SELECT id FROM verts),
         |$peels,
         |canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |flags AS (
         |  SELECT (CASE WHEN cs.id IS NULL THEN 0 ELSE 1 END
         |        + CASE WHEN cd.id IS NULL THEN 0 ELSE 1 END) AS nc
         |  FROM canon c
         |  LEFT JOIN v3 cs ON cs.id = c.src
         |  LEFT JOIN v3 cd ON cd.id = c.dst),
         |cnt AS (
         |  SELECT CAST(sum(CASE WHEN nc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS e_cc,
         |         CAST(sum(CASE WHEN nc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS e_cp,
         |         CAST(sum(CASE WHEN nc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS e_pp
         |  FROM flags),
         |nn AS (
         |  SELECT (SELECT count(*) FROM v3) AS n_core,
         |         (SELECT count(*) FROM verts) - (SELECT count(*) FROM v3)
         |           AS n_periph)
         |SELECT kk.k, CAST(nn.n_core AS BIGINT) AS n_core,
         |  CAST(nn.n_periph AS BIGINT) AS n_periph,
         |  cnt.e_cc, cnt.e_cp, cnt.e_pp,
         |  CAST(CASE WHEN (nn.n_core * (nn.n_core - 1)) // 2
         |              + (nn.n_periph * (nn.n_periph - 1)) // 2 > 0
         |    THEN ((cnt.e_cc + (nn.n_periph * (nn.n_periph - 1)) // 2
         |            - cnt.e_pp) * 1000000)
         |         // ((nn.n_core * (nn.n_core - 1)) // 2
         |            + (nn.n_periph * (nn.n_periph - 1)) // 2)
         |    ELSE 0 END AS BIGINT) AS agreement_e6
         |FROM kk, cnt, nn""".stripMargin
    },

    // CheiRank oracle: the runFixed recurrence on the TRANSPOSED
    // directed edges with dangling mass refolded uniformly each step —
    // r_k = 0.15/n + 0.85*(gather + m_k/n), exactly the engine order
    "g_cheirank_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""cdm$k AS (
           |  SELECT coalesce(sum(p.r), 0) AS m FROM cr${k - 1} p
           |  LEFT JOIN cdeg d ON p.id = d.id WHERE d.id IS NULL
           |), cx$k AS (
           |  SELECT tre.dst AS id, sum(p.r / d.od) AS s
           |  FROM tre JOIN cr${k - 1} p ON tre.src = p.id
           |  JOIN cdeg d ON tre.src = d.id
           |  GROUP BY 1
           |), cr$k AS (
           |  SELECT v.id,
           |         0.15 / (SELECT count(*) FROM vd)
           |           + 0.85 * (coalesce(x.s, 0)
           |             + (SELECT m FROM cdm$k) / (SELECT count(*) FROM vd))
           |           AS r
           |  FROM vd v LEFT JOIN cx$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |vd AS (SELECT src AS id FROM rawd UNION SELECT dst FROM rawd),
         |tre AS (SELECT dst AS src, src AS dst FROM rawd),
         |cdeg AS (SELECT src AS id, count(*) AS od FROM tre GROUP BY 1),
         |cr0 AS (SELECT id, 1.0 / (SELECT count(*) FROM vd) AS r FROM vd),
         |$steps
         |SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS cheirank_e6
         |FROM cr3""".stripMargin
    },

    // partition-quality oracle over the 3-superstep LP labels: intra
    // census on canonical edges, doubled pair totals kept integer, the
    // two e6 ratios with identical double expressions
    "g_part_quality" ->
      s"""WITH $cte,
         |${lpStepsSql(3)},
         |canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |lab AS (SELECT id, label FROM s3),
         |es AS (SELECT count(*) AS m,
         |         sum(CASE WHEN a.label = b.label THEN 1 ELSE 0 END) AS intra
         |       FROM canon c
         |       JOIN lab a ON a.id = c.src JOIN lab b ON b.id = c.dst),
         |nn AS (SELECT count(*) AS n FROM lab),
         |ip AS (SELECT coalesce(sum(c * (c - 1)), 0) AS intra2x FROM (
         |         SELECT count(*) AS c FROM lab GROUP BY label) t)
         |SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
         |  CAST(intra AS BIGINT) AS intra_edges,
         |  CAST(ROUND(intra * 1000000.0 / m) AS BIGINT) AS coverage_e6,
         |  CAST(ROUND((2 * intra + (n * (n - 1) - intra2x)
         |    - 2 * (m - intra)) * 1000000.0 / (n * (n - 1))) AS BIGINT)
         |    AS performance_e6
         |FROM es, nn, ip""".stripMargin,

    // OPIC oracle: un-damped cash conservation with uniform dangling
    // refold, history accumulated in the engine's addition order
    // (h_k = h_{k-1} + c_k)
    "g_opic_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""odm$k AS (
           |  SELECT coalesce(sum(p.c), 0) AS m FROM oc${k - 1} p
           |  LEFT JOIN odeg d ON p.id = d.id WHERE d.id IS NULL
           |), ox$k AS (
           |  SELECT rawd.dst AS id, sum(p.c / d.od) AS s
           |  FROM rawd JOIN oc${k - 1} p ON rawd.src = p.id
           |  JOIN odeg d ON rawd.src = d.id
           |  GROUP BY 1
           |), oc$k AS (
           |  SELECT v.id,
           |         coalesce(x.s, 0)
           |           + (SELECT m FROM odm$k) / (SELECT count(*) FROM vd)
           |           AS c,
           |         v.h + (coalesce(x.s, 0)
           |           + (SELECT m FROM odm$k) / (SELECT count(*) FROM vd))
           |           AS h
           |  FROM oc${k - 1} v LEFT JOIN ox$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |vd AS (SELECT src AS id FROM rawd UNION SELECT dst FROM rawd),
         |odeg AS (SELECT src AS id, count(*) AS od FROM rawd GROUP BY 1),
         |oc0 AS (SELECT id, 1.0 / (SELECT count(*) FROM vd) AS c,
         |               1.0 / (SELECT count(*) FROM vd) AS h FROM vd),
         |$steps
         |SELECT id, CAST(ROUND(c * 1000000) AS BIGINT) AS cash_e6,
         |       CAST(ROUND(h * 1000000) AS BIGINT) AS hist_e6
         |FROM oc3""".stripMargin
    },

    // weighted triangles enumerated canonically (a<b<c): min weight is
    // the bottleneck, totals exact BIGINT
    "g_tri_weighted" ->
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |c AS (SELECT src, dst, weight FROM ew WHERE src < dst),
         |t AS (SELECT e1.weight AS w1, e2.weight AS w2, e3.weight AS w3
         |      FROM c e1 JOIN c e2 ON e1.dst = e2.src
         |      JOIN c e3 ON e3.src = e1.src AND e3.dst = e2.dst)
         |SELECT CAST(count(*) AS BIGINT) AS n_triangles,
         |  CAST(COALESCE(sum(least(w1, w2, w3)), 0) AS BIGINT) AS sum_min_w,
         |  CAST(COALESCE(sum(w1 + w2 + w3), 0) AS BIGINT) AS sum_w
         |FROM t""".stripMargin,

    // Hill estimator: alpha = 1 + n / sum ln(d / dmin) over the d >= 2
    // tail of the undirected degree table
    "g_powerlaw" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |t AS (SELECT degree FROM deg WHERE degree >= 2),
         |a AS (SELECT count(*) AS n_tail,
         |        sum(ln(CAST(degree AS DOUBLE) / 2)) AS s FROM t)
         |SELECT CAST(n_tail AS BIGINT) AS n_tail,
         |  CAST(2 AS BIGINT) AS d_min,
         |  CASE WHEN s > 0
         |    THEN CAST(ROUND((1 + n_tail / s) * 1000000) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS alpha_e6
         |FROM a""".stripMargin,

    "g_motifs" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |wed AS (SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT)
         |          AS wedges FROM deg),
         |canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |tri AS (SELECT count(*) AS triangles
         |        FROM canon e1
         |        JOIN canon e2 ON e1.dst = e2.src
         |        JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |cn AS (SELECT a.src AS u, b.src AS w, count(*) AS c
         |       FROM e0 a JOIN e0 b ON a.dst = b.dst AND a.src < b.src
         |       GROUP BY 1, 2),
         |sq AS (SELECT CAST(sum(c * (c - 1) // 2) // 2 AS BIGINT)
         |         AS squares FROM cn)
         |SELECT w.wedges, t.triangles, s.squares,
         |  CAST(ROUND(3.0 * t.triangles / w.wedges * 1000000) AS BIGINT)
         |    AS transitivity_e6
         |FROM wed w, tri t, sq s""".stripMargin,

    // null-model oracle: same wedge/triangle census + the integer degree
    // moments, identical expression order for every scalar divide
    "g_null_clustering" ->
      s"""WITH $cte,
         |ndeg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |nm AS (SELECT CAST(sum(degree) AS DOUBLE) AS s1,
         |         CAST(sum(degree * degree) AS DOUBLE) AS s2,
         |         CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS wedges
         |       FROM ndeg),
         |canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |tri AS (SELECT count(*) AS triangles
         |        FROM canon e1
         |        JOIN canon e2 ON e1.dst = e2.src
         |        JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst)
         |SELECT
         |  CAST(ROUND(3.0 * t.triangles / m.wedges * 1000000) AS BIGINT)
         |    AS c_actual_e6,
         |  CAST(ROUND((m.s2 - m.s1) * (m.s2 - m.s1)
         |    / (m.s1 * m.s1 * m.s1) * 1000000) AS BIGINT) AS c_null_e6,
         |  CAST(ROUND((3.0 * t.triangles / m.wedges)
         |    * (m.s1 * m.s1 * m.s1)
         |    / ((m.s2 - m.s1) * (m.s2 - m.s1)) * 1000) AS BIGINT)
         |    AS ratio_e3
         |FROM nm m, tri t""".stripMargin,

    // entropy oracle: the shared rank chain, per-vertex e12 rounding
    // before the sum, normalization by ln(n)
    "g_pr_entropy" ->
      s"""WITH $cte,
         |${prChainSql("p", "e0", 3)}
         |SELECT CAST(count(*) AS BIGINT) AS n_vertices,
         |  CAST(sum(CAST(ROUND(-r * ln(r) * 1000000000000.0) AS BIGINT))
         |    AS BIGINT) AS h_e12,
         |  CAST(ROUND(sum(CAST(ROUND(-r * ln(r) * 1000000000000.0)
         |      AS BIGINT)) / (ln(count(*)) * 1000000.0)) AS BIGINT)
         |    AS norm_e6
         |FROM pr3""".stripMargin,

    "g_tri_per_vertex" ->
      s"""WITH $cte, canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |tri AS (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM canon e1
         |  JOIN canon e2 ON e1.dst = e2.src
         |  JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst)
         |SELECT id, count(*) AS triangles FROM (
         |  SELECT a AS id FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri) u
         |GROUP BY id""".stripMargin,

    "g_modularity" ->
      s"""WITH RECURSIVE $cte, $ccCte,
         |m2 AS (SELECT count(*)::DOUBLE AS v FROM e0),
         |ein AS (
         |  SELECT count(*)::DOUBLE AS v FROM e0
         |  JOIN cclab a ON e0.src = a.id
         |  JOIN cclab b ON e0.dst = b.id
         |  WHERE a.label = b.label AND e0.src <> e0.dst),
         |deg AS (SELECT src AS id, count(*) AS k FROM e0 GROUP BY 1),
         |per AS (
         |  SELECT sum(ks * ks - ksq)::DOUBLE AS v FROM (
         |    SELECT l.label, sum(coalesce(d.k, 0)) AS ks,
         |           sum(coalesce(d.k, 0) * coalesce(d.k, 0)) AS ksq
         |    FROM cclab l LEFT JOIN deg d ON l.id = d.id GROUP BY 1) g)
         |SELECT CAST(ROUND((ein.v - per.v / m2.v) / m2.v * 1000000) AS BIGINT) AS q_e6
         |FROM ein, per, m2""".stripMargin,

    "g_modularity_weighted" ->
      s"""WITH RECURSIVE $cte, $ccCte,
         |rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |w2 AS (SELECT sum(weight)::DOUBLE AS v FROM ew),
         |ein AS (
         |  SELECT sum(ew.weight)::DOUBLE AS v FROM ew
         |  JOIN cclab a ON ew.src = a.id
         |  JOIN cclab b ON ew.dst = b.id
         |  WHERE a.label = b.label AND ew.src <> ew.dst),
         |st AS (SELECT src AS id, sum(weight) AS s FROM ew GROUP BY 1),
         |per AS (
         |  SELECT sum(ss * ss - ssq)::DOUBLE AS v FROM (
         |    SELECT l.label, sum(coalesce(st.s, 0)) AS ss,
         |           sum(coalesce(st.s, 0) * coalesce(st.s, 0)) AS ssq
         |    FROM cclab l LEFT JOIN st ON l.id = st.id GROUP BY 1) g)
         |SELECT CAST(ROUND((ein.v - per.v / w2.v) / w2.v * 1000000) AS BIGINT)
         |       AS qw_e6
         |FROM ein, per, w2""".stripMargin,

    "g_community_count" ->
      s"WITH RECURSIVE $cte, $ccCte SELECT count(DISTINCT label) AS communities FROM cclab",

    "g_nmi" ->
      s"""WITH RECURSIVE $cte, $ccCte,
         |t AS (SELECT id, id % 7 AS tl FROM verts),
         |p AS (SELECT id, label AS pl FROM cclab),
         |cm AS (SELECT t.tl, p.pl, count(*)::DOUBLE AS n
         |       FROM t JOIN p ON t.id = p.id GROUP BY 1, 2),
         |tot AS (SELECT sum(n) AS v FROM cm),
         |rm AS (SELECT tl, sum(n) AS ni FROM cm GROUP BY 1),
         |colm AS (SELECT pl, sum(n) AS nj FROM cm GROUP BY 1),
         |num AS (
         |  SELECT sum(cm.n * ln(cm.n * tot.v / (rm.ni * colm.nj))) AS v
         |  FROM cm JOIN rm ON cm.tl = rm.tl JOIN colm ON cm.pl = colm.pl, tot),
         |den AS (
         |  SELECT (SELECT sum(ni * ln(ni / tot.v)) FROM rm, tot)
         |       + (SELECT sum(nj * ln(nj / tot.v)) FROM colm, tot) AS v)
         |SELECT CAST(ROUND(-2.0 * num.v / den.v * 1000000) AS BIGINT) AS nmi_e6
         |FROM num, den""".stripMargin,

    "g_confusion" ->
      s"""WITH RECURSIVE $cte, $ccCte
         |SELECT v.id % 7 AS attr_label, c.label AS cc_label, count(*) AS n
         |FROM verts v JOIN cclab c ON v.id = c.id
         |GROUP BY 1, 2""".stripMargin,

    // ARI/purity oracle: prediction = CC of the τ-thresholded 5-block
    // weighted graph (≡ single-linkage clusters over the MSF — the same
    // equivalence g_single_linkage certifies); every pair count is
    // exact-integer (x*(x-1)//2 — the product of consecutive integers is
    // even, so // is exact)
    "g_ari" ->
      s"""WITH RECURSIVE ed AS (
         |  SELECT least(l_orderkey % $NodeSpace, l_partkey % $NodeSpace) AS a,
         |         greatest(l_orderkey % $NodeSpace, l_partkey % $NodeSpace) AS b,
         |         min((CAST(l_quantity AS BIGINT) % 7 + 1) * 100000
         |             + least(l_orderkey % $NodeSpace, l_partkey % $NodeSpace) * $NodeSpace
         |             + greatest(l_orderkey % $NodeSpace, l_partkey % $NodeSpace)) AS w
         |  FROM lineitem
         |  WHERE l_orderkey % $NodeSpace <> l_partkey % $NodeSpace
         |    AND (l_orderkey % $NodeSpace) // 5 = (l_partkey % $NodeSpace) // 5
         |  GROUP BY 1, 2),
         |sverts AS (SELECT DISTINCT a AS id FROM
         |  (SELECT a FROM ed UNION ALL SELECT b FROM ed) u(a)),
         |keep AS (SELECT DISTINCT u, v FROM (
         |   SELECT a AS u, b AS v FROM ed WHERE w <= 350000
         |   UNION ALL SELECT b, a FROM ed WHERE w <= 350000) t),
         |reach(id, lab) AS (
         |  SELECT id, id FROM sverts
         |  UNION
         |  SELECT keep.v, reach.lab FROM reach JOIN keep ON keep.u = reach.id),
         |pred AS (SELECT id, min(lab) AS pl FROM reach GROUP BY id),
         |cm AS (SELECT v.id % 7 AS tl, p.pl, count(*) AS n
         |       FROM sverts v JOIN pred p ON v.id = p.id GROUP BY 1, 2),
         |cells AS (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS idx,
         |                 CAST(sum(n) AS BIGINT) AS nt FROM cm),
         |rm AS (SELECT CAST(sum(a * (a - 1) // 2) AS BIGINT) AS rp FROM
         |       (SELECT sum(n) AS a FROM cm GROUP BY tl) t),
         |colm AS (SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) AS cp FROM
         |       (SELECT sum(n) AS b FROM cm GROUP BY pl) t),
         |pur AS (SELECT CAST(sum(mx) AS BIGINT) AS purity_num FROM
         |       (SELECT max(n) AS mx FROM cm GROUP BY pl) t)
         |SELECT cells.idx AS pair_index, rm.rp AS row_pairs, colm.cp AS col_pairs,
         |       nt * (nt - 1) // 2 AS all_pairs, cells.nt AS n_total,
         |       pur.purity_num,
         |       CAST(ROUND(CAST((nt * (nt - 1) // 2) * idx - rp * cp AS DOUBLE)
         |            * 2 * 1000000
         |            / ((nt * (nt - 1) // 2) * (rp + cp) - rp * cp * 2))
         |         AS BIGINT) AS ari_e6
         |FROM cells, rm, colm, pur""".stripMargin,

    "g_eccentricity" ->
      s"""WITH RECURSIVE $cte,
         |srcs AS (SELECT id FROM verts WHERE id % 10 = 0),
         |reach(source, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.source, e0.dst, r.dist + 1
         |  FROM reach r JOIN e0 ON e0.src = r.id
         |  WHERE r.dist < ${graft.algo.Betweenness.DepthCap}),
         |lv AS (SELECT source, id, min(dist) AS dist FROM reach GROUP BY 1, 2)
         |SELECT source, CAST(max(dist) AS BIGINT) AS ecc,
         |       count(*) AS n_reached
         |FROM lv GROUP BY 1""".stripMargin,

    // connectivity audit oracle: LP-3 labels via the shared unrolled
    // steps, intra-community restriction, then the recursive closure of
    // the restricted edge set
    "g_comm_connectivity" ->
      s"""WITH RECURSIVE $cte,
         |${lpStepsSql(3)},
         |lab AS (SELECT id, label FROM s3),
         |intra AS (SELECT e0.src, e0.dst FROM e0
         |          JOIN lab a ON a.id = e0.src
         |          JOIN lab b ON b.id = e0.dst
         |          WHERE a.label = b.label),
         |reach2(id, lab2) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT intra.dst, reach2.lab2
         |  FROM reach2 JOIN intra ON intra.src = reach2.id),
         |sub AS (SELECT id, min(lab2) AS sub FROM reach2 GROUP BY id)
         |SELECT lab.label AS community, count(*) AS n_members,
         |       count(DISTINCT sub.sub) AS n_parts
         |FROM lab JOIN sub ON sub.id = lab.id
         |GROUP BY 1""".stripMargin,

    // BFS-tree oracle: levels via the recursive closure, then the same
    // min-id-parent-on-previous-level derivation
    "g_bfs_parents" ->
      s"""WITH RECURSIVE $cte,
         |srcs AS (SELECT id FROM verts WHERE id % 30 = 0),
         |reach(source, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.source, e0.dst, r.dist + 1
         |  FROM reach r JOIN e0 ON e0.src = r.id
         |  WHERE r.dist < ${graft.algo.Betweenness.DepthCap}),
         |lv AS (SELECT source, id, CAST(min(dist) AS BIGINT) AS dist
         |       FROM reach GROUP BY 1, 2),
         |par AS (SELECT c.source, c.id, c.dist, min(e0.src) AS parent
         |        FROM lv c
         |        JOIN e0 ON e0.dst = c.id
         |        JOIN lv p ON p.source = c.source AND p.id = e0.src
         |                 AND p.dist = c.dist - 1
         |        WHERE c.dist > 0
         |        GROUP BY 1, 2, 3)
         |SELECT source, id, dist, id AS parent FROM lv WHERE dist = 0
         |UNION ALL
         |SELECT source, id, dist, parent FROM par""".stripMargin,

    // WL oracle: the same md5 chain over (color, count)-pair signatures —
    // per-(vertex, color) counts, then "color:count" pairs ordered by
    // color (the engine's hub-safe default form)
    "g_wl_t2" ->
      s"""WITH $cte,
         |c0 AS (SELECT src AS id,
         |         md5('d:' || count(*)::VARCHAR) AS color
         |       FROM e0 GROUP BY src),
         |p1 AS (SELECT e0.dst AS id, c0.color AS nc, count(*) AS cnt
         |       FROM e0 JOIN c0 ON c0.id = e0.src GROUP BY 1, 2),
         |n1 AS (SELECT id,
         |         string_agg(nc || ':' || cnt::VARCHAR, ',' ORDER BY nc)
         |           AS sig
         |       FROM p1 GROUP BY 1),
         |c1 AS (SELECT c0.id,
         |         md5(c0.color || '|' || coalesce(n1.sig, '')) AS color
         |       FROM c0 LEFT JOIN n1 ON n1.id = c0.id),
         |p2 AS (SELECT e0.dst AS id, c1.color AS nc, count(*) AS cnt
         |       FROM e0 JOIN c1 ON c1.id = e0.src GROUP BY 1, 2),
         |n2 AS (SELECT id,
         |         string_agg(nc || ':' || cnt::VARCHAR, ',' ORDER BY nc)
         |           AS sig
         |       FROM p2 GROUP BY 1),
         |c2 AS (SELECT c1.id,
         |         md5(c1.color || '|' || coalesce(n2.sig, '')) AS color
         |       FROM c1 LEFT JOIN n2 ON n2.id = c1.id)
         |SELECT id, color FROM c2""".stripMargin,

    // earliest-arrival oracle: the relax recurrence unrolled to the same
    // 4 rounds — candidates are edge timestamps admitted by the
    // time-window filter, merged by per-vertex min
    "g_temporal_t4" -> {
      val levels = (1 to 4).map { t =>
        s"""a$t AS (SELECT id, min(arr) AS arr FROM (
           |  SELECT id, arr FROM a${t - 1}
           |  UNION ALL
           |  SELECT te.dst AS id, te.t AS arr
           |  FROM a${t - 1} JOIN te ON te.src = a${t - 1}.id
           |   AND te.t >= a${t - 1}.arr) u
           |GROUP BY id)""".stripMargin
      }.mkString(",\n")
      s"""WITH te AS (
         |  SELECT user_id % $NodeSpace AS src,
         |         CAST(props->>'k' AS BIGINT) % $NodeSpace AS dst,
         |         epoch_us(ts) // 1000000 AS t
         |  FROM events
         |  WHERE props->>'k' IS NOT NULL
         |    AND user_id % $NodeSpace <> CAST(props->>'k' AS BIGINT) % $NodeSpace),
         |tverts AS (SELECT DISTINCT src AS id FROM
         |  (SELECT src FROM te UNION ALL SELECT dst FROM te) u(src)),
         |a0 AS (SELECT id, CAST(0 AS BIGINT) AS arr FROM tverts WHERE id % 50 = 0),
         |$levels
         |SELECT id, arr FROM a4""".stripMargin
    },

    // SimRank oracle: the same exact-integer two-iteration replay —
    // co-in-neighbor counts, one floor-div per iteration (// on BIGINT ==
    // Spark's `div` for the all-positive operands here)
    "g_simrank_t2" ->
      s"""WITH sed AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_suppkey % 20 = 0
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |dg AS (SELECT dst AS id, count(*) AS d FROM sed GROUP BY 1),
         |cnp AS (SELECT a.dst AS a, b.dst AS b, count(*) AS cn
         |        FROM sed a JOIN sed b ON a.src = b.src AND a.dst <> b.dst
         |        GROUP BY 1, 2),
         |s1 AS (SELECT cnp.a, cnp.b,
         |          (4 * 1000000 * cnp.cn) // (5 * da.d * db.d) AS s1
         |       FROM cnp JOIN dg da ON da.id = cnp.a
         |                JOIN dg db ON db.id = cnp.b),
         |off AS (SELECT ea.dst AS a, eb.dst AS b,
         |               CAST(sum(s1.s1) AS BIGINT) AS t_off
         |        FROM s1 JOIN sed ea ON ea.src = s1.a
         |                JOIN sed eb ON eb.src = s1.b
         |        WHERE s1.s1 > 0 AND ea.dst <> eb.dst
         |        GROUP BY 1, 2),
         |m AS (SELECT coalesce(cnp.a, off.a) AS a, coalesce(cnp.b, off.b) AS b,
         |        coalesce(cnp.cn, 0) AS cn, coalesce(off.t_off, 0) AS t_off
         |      FROM cnp FULL OUTER JOIN off ON cnp.a = off.a AND cnp.b = off.b)
         |SELECT m.a, m.b, m.cn,
         |  (4 * 1000000 * m.cn) // (5 * da.d * db.d) AS s1,
         |  (4 * (m.cn * 1000000 + m.t_off)) // (5 * da.d * db.d) AS s2
         |FROM m JOIN dg da ON da.id = m.a JOIN dg db ON db.id = m.b
         |WHERE m.a < m.b
         |  AND (4 * (m.cn * 1000000 + m.t_off)) // (5 * da.d * db.d) > 0""".stripMargin,

    // per-edge overlap oracle: common neighbors by a two-leg slot join,
    // union size by inclusion–exclusion over the slot degrees
    "g_edge_overlap" ->
      s"""WITH $cte,
         |canon AS (SELECT src AS u, dst AS v FROM e0 WHERE src < dst),
         |deg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1),
         |com AS (SELECT c.u, c.v, count(*) AS cn
         |        FROM canon c
         |        JOIN e0 a ON a.src = c.u
         |        JOIN e0 b ON b.src = c.v AND b.dst = a.dst
         |        GROUP BY 1, 2)
         |SELECT c.u AS src, c.v AS dst,
         |       coalesce(com.cn, 0) AS common,
         |       du.d + dv.d - 2 - coalesce(com.cn, 0) AS union_size,
         |       CAST(ROUND(CASE
         |           WHEN du.d + dv.d - 2 - coalesce(com.cn, 0) = 0 THEN 1000000
         |           ELSE coalesce(com.cn, 0) * 1000000.0
         |                / (du.d + dv.d - 2 - coalesce(com.cn, 0)) END)
         |         AS BIGINT) AS overlap_e6
         |FROM canon c
         |LEFT JOIN com ON com.u = c.u AND com.v = c.v
         |JOIN deg du ON du.id = c.u
         |JOIN deg dv ON dv.id = c.v""".stripMargin,

    "g_permutation" ->
      s"""WITH $cte
         |SELECT id, CAST(row_number() OVER (
         |    ORDER BY md5(CAST(id AS VARCHAR) || ':7')) AS BIGINT) AS pos
         |FROM verts""".stripMargin,

    "g_edge_diff" ->
      s"""WITH s1 AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |s2 AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber <= 2
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace)
         |SELECT src, dst, 'added' AS change FROM s2 a
         |WHERE NOT EXISTS (SELECT 1 FROM s1
         |                  WHERE s1.src = a.src AND s1.dst = a.dst)
         |UNION ALL
         |SELECT src, dst, 'removed' FROM s1 r
         |WHERE NOT EXISTS (SELECT 1 FROM s2
         |                  WHERE s2.src = r.src AND s2.dst = r.dst)""".stripMargin,

    "g_comm_size_hist" ->
      s"""WITH RECURSIVE $cte, $ccCte,
         |sz AS (SELECT label, count(*) AS size FROM cclab GROUP BY 1)
         |SELECT size, count(*) AS n_communities FROM sz GROUP BY 1""".stripMargin,

    // bow-tie: the g_scc mutual-reachability labeling picks the core
    // (size DESC, label ASC); membership tests go through the core's
    // minimum member — the core is an SCC, so reaching one member is
    // reaching all
    "g_bowtie" ->
      s"""WITH RECURSIVE rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |vd AS (SELECT DISTINCT id FROM (
         |  SELECT src AS id FROM rawd
         |  UNION ALL SELECT dst FROM rawd) u),
         |reach(src, dst) AS (
         |  SELECT id, id FROM vd
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN rawd e ON e.src = r.dst),
         |lab AS (
         |  SELECT a.src AS id, CAST(min(a.dst) AS BIGINT) AS scc
         |  FROM reach a JOIN reach b ON b.src = a.dst AND b.dst = a.src
         |  GROUP BY 1),
         |core AS (SELECT scc FROM lab GROUP BY scc
         |         ORDER BY count(*) DESC, scc ASC LIMIT 1),
         |cmem AS (SELECT id FROM lab WHERE scc = (SELECT scc FROM core)),
         |c0 AS (SELECT min(id) AS id FROM cmem)
         |SELECT v.id,
         |  CASE WHEN v.id IN (SELECT id FROM cmem) THEN 'core'
         |       WHEN EXISTS (SELECT 1 FROM reach r
         |                    WHERE r.src = v.id
         |                      AND r.dst = (SELECT id FROM c0)) THEN 'in'
         |       WHEN EXISTS (SELECT 1 FROM reach r
         |                    WHERE r.src = (SELECT id FROM c0)
         |                      AND r.dst = v.id) THEN 'out'
         |       ELSE 'other' END AS bowtie
         |FROM vd v""".stripMargin,

    "g_reciprocity" ->
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |mut AS (SELECT count(*) AS mutual FROM rawd a
         |        WHERE EXISTS (SELECT 1 FROM rawd b
         |                      WHERE b.src = a.dst AND b.dst = a.src)),
         |tot AS (SELECT count(*) AS total FROM rawd)
         |SELECT m.mutual, t.total,
         |  CAST(ROUND(CAST(m.mutual AS DOUBLE) / t.total * 1000000) AS BIGINT)
         |    AS reciprocity_e6
         |FROM mut m, tot t""".stripMargin,

    "g_conductance" ->
      s"""WITH $cte,
         |lab AS (SELECT id, id % 7 AS label FROM verts),
         |tag AS (SELECT a.label AS ls, b.label AS ld
         |        FROM e0 JOIN lab a ON e0.src = a.id
         |        JOIN lab b ON e0.dst = b.id),
         |pl AS (SELECT ls AS label,
         |         CAST(sum(CASE WHEN ls <> ld THEN 1 ELSE 0 END) AS BIGINT)
         |           AS cut,
         |         count(*) AS vol
         |       FROM tag GROUP BY 1),
         |m2 AS (SELECT count(*) AS m2 FROM e0)
         |SELECT pl.label, pl.cut, pl.vol,
         |  CAST(ROUND(CAST(pl.cut AS DOUBLE)
         |    / least(pl.vol, m.m2 - pl.vol) * 1000000) AS BIGINT)
         |    AS conductance_e6
         |FROM pl, m2 m""".stripMargin,

    "g_dict_encode" ->
      """SELECT name, CAST(row_number() OVER (ORDER BY name) - 1 AS BIGINT) AS id
        |FROM (SELECT DISTINCT c_mktsegment AS name FROM customer) n""".stripMargin,

    // depth bound = Betweenness.DepthCap, the SAME constant the engine's
    // bfsLevels truncates at (ADVICE r2: the bounds must not diverge)
    "g_bfs_levels" ->
      s"""WITH RECURSIVE $cte,
         |srcs AS (SELECT id FROM verts WHERE id % 10 = 0),
         |reach(source, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.source, e0.dst, r.dist + 1
         |  FROM reach r JOIN e0 ON e0.src = r.id
         |  WHERE r.dist < ${graft.algo.Betweenness.DepthCap})
         |SELECT source, id, CAST(min(dist) AS BIGINT) AS dist
         |FROM reach GROUP BY 1, 2""".stripMargin,

    "g_dist_hist" ->
      s"""WITH RECURSIVE $cte,
         |srcs AS (SELECT id FROM verts WHERE id % 10 = 0),
         |reach(source, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.source, e0.dst, r.dist + 1
         |  FROM reach r JOIN e0 ON e0.src = r.id
         |  WHERE r.dist < ${graft.algo.Betweenness.DepthCap}),
         |d AS (SELECT source, id, CAST(min(dist) AS BIGINT) AS dist
         |      FROM reach GROUP BY 1, 2)
         |SELECT dist, count(*) AS pairs FROM d WHERE dist > 0
         |GROUP BY 1""".stripMargin,

    "g_eff_diameter" ->
      s"""WITH RECURSIVE $cte,
         |srcs AS (SELECT id FROM verts WHERE id % 10 = 0),
         |reach(source, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.source, e0.dst, r.dist + 1
         |  FROM reach r JOIN e0 ON e0.src = r.id
         |  WHERE r.dist < ${graft.algo.Betweenness.DepthCap}),
         |d AS (SELECT source, id, CAST(min(dist) AS BIGINT) AS dist
         |      FROM reach GROUP BY 1, 2),
         |h AS (SELECT dist, count(*) AS pairs FROM d WHERE dist > 0
         |      GROUP BY 1),
         |tot AS (SELECT CAST(sum(pairs) AS BIGINT) AS total,
         |               CAST(sum(dist * pairs) AS BIGINT) AS distsum FROM h),
         |c AS (SELECT dist,
         |             CAST(sum(pairs) OVER (ORDER BY dist) AS BIGINT) AS cum
         |      FROM h)
         |SELECT c.dist AS eff_diameter, t.total AS reached_pairs,
         |       CAST(ROUND(CAST(t.distsum AS DOUBLE) / t.total * 1000000)
         |         AS BIGINT) AS mean_dist_e6
         |FROM c, tot t WHERE c.cum * 10 >= t.total * 9
         |ORDER BY c.dist LIMIT 1""".stripMargin,

    "g_adjacent" ->
      s"""WITH $cte,
         |probe AS (SELECT range AS src, (range + 1) % $NodeSpace AS dst
         |          FROM range($NodeSpace))
         |SELECT p.src, p.dst FROM probe p
         |WHERE EXISTS (SELECT 1 FROM e0
         |              WHERE e0.src = p.src AND e0.dst = p.dst)""".stripMargin,

    "g_neighbors" ->
      s"WITH $cte SELECT dst FROM e0 WHERE src = 42",

    "g_lcc" ->
      s"""WITH $cte, canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |tri AS (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM canon e1
         |  JOIN canon e2 ON e1.dst = e2.src
         |  JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |tcnt AS (
         |  SELECT id, count(*) AS tri FROM (
         |    SELECT a AS id FROM tri
         |    UNION ALL SELECT b FROM tri
         |    UNION ALL SELECT c FROM tri) u
         |  GROUP BY id),
         |deg AS (
         |  SELECT id, count(*) AS deg FROM (
         |    SELECT src AS id FROM canon
         |    UNION ALL SELECT dst FROM canon) u
         |  GROUP BY id)
         |SELECT d.id, CAST(ROUND(
         |  CASE WHEN d.deg < 2 THEN 0.0
         |       ELSE 2.0 * coalesce(t.tri, 0) / (d.deg * (d.deg - 1)) END
         |  * 1000000) AS BIGINT) AS lcc_e6
         |FROM deg d LEFT JOIN tcnt t ON d.id = t.id""".stripMargin,

    "g_centrality_sampled" ->
      s"""WITH RECURSIVE $cte,
         |srcs AS (SELECT id FROM verts WHERE id % 10 = 0),
         |reach(source, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.source, e0.dst, r.dist + 1
         |  FROM reach r JOIN e0 ON e0.src = r.id
         |  WHERE r.dist < ${graft.algo.Betweenness.DepthCap}),
         |d AS (SELECT source, id, min(dist) AS dist FROM reach GROUP BY 1, 2),
         |agg AS (
         |  SELECT source AS id, count(*) AS reached,
         |         sum(1.0 / dist) AS harm, sum(dist) AS sd
         |  FROM d WHERE dist > 0 GROUP BY 1)
         |SELECT s.id,
         |  coalesce(a.reached, 0) AS reached,
         |  CAST(ROUND(coalesce(a.harm, 0) * 1000000) AS BIGINT) AS harmonic_e6,
         |  CAST(ROUND(coalesce(a.reached / a.sd, 0) * 1000000) AS BIGINT)
         |    AS closeness_e6
         |FROM srcs s LEFT JOIN agg a ON s.id = a.id""".stripMargin,

    // 4 unrolled Bellman–Ford rounds over the weighted graph; every round
    // table is MATERIALIZED (referenced by the relax join AND the merge)
    "g_sssp_t4" -> {
      val rounds = (1 to 4).map { t =>
        s"""d$t AS MATERIALIZED (
           |  SELECT coalesce(p.id, c.id) AS id,
           |         least(coalesce(p.dist, 9223372036854775807),
           |               coalesce(c.cand, 9223372036854775807)) AS dist
           |  FROM d${t - 1} p FULL JOIN (
           |    SELECT ew.dst AS id, min(p.dist + ew.weight) AS cand
           |    FROM ew JOIN d${t - 1} p ON ew.src = p.id GROUP BY 1) c
           |  ON p.id = c.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |vw AS (SELECT DISTINCT src AS id FROM ew),
         |d0 AS MATERIALIZED (
         |  SELECT id, CAST(0 AS BIGINT) AS dist FROM vw WHERE id % 100 = 0),
         |$rounds
         |SELECT id, dist FROM d4""".stripMargin
    },

    "g_kcore_t3" -> {
      val peels = (1 to 3).map { t =>
        s"""s$t AS MATERIALIZED (
           |  SELECT e0.src AS id, count(*) AS deg
           |  FROM e0
           |  JOIN v${t - 1} a ON e0.src = a.id
           |  JOIN v${t - 1} b ON e0.dst = b.id
           |  GROUP BY 1),
           |v$t AS MATERIALIZED (
           |  SELECT id FROM s$t, kk WHERE deg >= kk.k)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |kk AS (SELECT CAST(FLOOR(
         |         (SELECT count(*) FROM e0) / (SELECT count(*) FROM verts))
         |       AS BIGINT) AS k),
         |v0 AS (SELECT id FROM verts),
         |$peels
         |SELECT v.id,
         |  CAST(CASE WHEN c.id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_core
         |FROM verts v LEFT JOIN v3 c ON v.id = c.id""".stripMargin
    },

    // s-core oracle: the kcore peel with strength sums over the weighted
    // symmetric edge table (ew, as in g_modularity_weighted)
    "g_wcore_t3" -> {
      val peels = (1 to 3).map { t =>
        s"""ws$t AS MATERIALIZED (
           |  SELECT ew.src AS id, CAST(sum(ew.weight) AS BIGINT) AS st
           |  FROM ew
           |  JOIN wv${t - 1} a ON ew.src = a.id
           |  JOIN wv${t - 1} b ON ew.dst = b.id
           |  GROUP BY 1),
           |wv$t AS MATERIALIZED (
           |  SELECT id FROM ws$t, ss WHERE st >= ss.s)""".stripMargin
      }.mkString(",\n")
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |wverts AS (SELECT DISTINCT src AS id FROM ew),
         |ss AS (SELECT CAST(FLOOR(
         |         (SELECT sum(weight) FROM ew) / (SELECT count(*) FROM wverts))
         |       AS BIGINT) AS s),
         |wv0 AS (SELECT id FROM wverts),
         |$peels
         |SELECT v.id,
         |  CAST(CASE WHEN c.id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_core
         |FROM wverts v LEFT JOIN wv3 c ON v.id = c.id""".stripMargin
    },

    // step-mix constants mirror RandomWalks.StepMixA/B exactly — small
    // enough that the mix never overflows signed 64-bit inside the 2^40-id
    // envelope on either engine (VERDICT r3 #1)
    "g_walks_l4" -> walksL4Sql,

    "g_walk_coverage" ->
      s"""WITH wk AS ($walksL4Sql),
         |vis AS (SELECT vertex AS id, count(*) AS visits FROM wk GROUP BY 1),
         |hist AS (SELECT CAST(visits AS BIGINT) AS visits,
         |           count(*) AS n_vertices FROM vis GROUP BY 1),
         |raw2 AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber = 1),
         |vt AS (SELECT count(DISTINCT v) AS n FROM (
         |  SELECT src AS v FROM raw2 WHERE src <> dst
         |  UNION ALL SELECT dst FROM raw2 WHERE src <> dst) yy),
         |cv AS (SELECT count(*) AS cov FROM vis)
         |SELECT visits, n_vertices FROM hist
         |UNION ALL
         |SELECT CAST(0 AS BIGINT), CAST(n - cov AS BIGINT) FROM vt, cv""".stripMargin,

    // skip-gram pairs: nested replay of the walk corpus + the windowed
    // self-join — pair counts, not walk rows, are what word2vec trains on
    "g_walk_pairs" ->
      s"""WITH $walkPairsSql
         |SELECT center, context, n FROM wkp""".stripMargin,

    // PMI vs the corpus marginals; DuckDB's ln and the engine's log
    // agree far inside the 1e-9 compare rounding
    "g_sgns_pmi" ->
      s"""WITH $walkPairsSql,
         |pc AS (SELECT center, sum(n) AS ncen FROM wkp GROUP BY 1),
         |px AS (SELECT context, sum(n) AS nctx FROM wkp GROUP BY 1),
         |tt AS (SELECT sum(n) AS nn FROM wkp)
         |SELECT p.center, p.context, p.n,
         |       CAST(ROUND(ln(CAST(p.n AS DOUBLE) * tt.nn /
         |                     (CAST(pc.ncen AS DOUBLE) * px.nctx))
         |                  * 1000000) AS BIGINT) AS pmi_e6
         |FROM wkp p
         |JOIN pc ON p.center = pc.center
         |JOIN px ON p.context = px.context
         |CROSS JOIN tt""".stripMargin,

    // negative draws: noise weight floor((deg^3)^(1/4)) (multiply and
    // sqrt are IEEE-correctly-rounded on both engines, so the floors
    // agree bit-for-bit), prefix intervals in id order, LCG draw modulo
    // the total weight, positive-context collisions dropped — mirrors
    // SkipGram.negativeSamples (the engine's two-level prefix sum and
    // weight-block equi-join reduce to the same intervals)
    "g_sgns_neg" ->
      s"""WITH $walkPairsSql,
         |$sgnsNegSql
         |SELECT center, context, j, neg FROM ng""".stripMargin,

    // terminal SGNS artifact: pair + draw-ordered packed negatives
    "g_sgns_examples" ->
      s"""WITH $walkPairsSql,
         |$sgnsNegSql
         |SELECT p.center, p.context, p.n,
         |       coalesce(string_agg(CAST(nn.neg AS VARCHAR), ','
         |                           ORDER BY nn.j), '') AS negs
         |FROM wkp p
         |LEFT JOIN ng nn ON p.center = nn.center AND p.context = nn.context
         |GROUP BY p.center, p.context, p.n""".stripMargin,

    // three unrolled Luby MIS rounds, md5 priorities seeded ':7'
    "g_mis_t3" ->
      s"""WITH $cte,
         |ms0 AS (SELECT id,
         |          ('0x' || substr(md5(id::VARCHAR || ':7'), 1, 15))::BIGINT
         |            AS prio,
         |          'und' AS status
         |        FROM verts),
         |${(1 to 3).map(misRoundSql).mkString(",\n")}
         |SELECT id, status FROM ms3""".stripMargin,

    // layered neighbor sampling: per-layer with-replacement draws into
    // the row-numbered adjacency, frontier = distinct sampled targets
    "g_sage_sample" ->
      s"""WITH $cte,
         |dg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1),
         |nbr AS (SELECT src, dst,
         |          CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
         |               AS BIGINT) AS idx
         |        FROM e0),
         |f0 AS (SELECT id AS v FROM verts WHERE id % 100 = 0),
         |s1 AS (SELECT DISTINCT CAST(1 AS BIGINT) AS layer, f.v AS src, n.dst
         |       FROM f0 f
         |       JOIN dg d ON f.v = d.id
         |       CROSS JOIN generate_series(0, 2) AS g(i)
         |       JOIN nbr n ON n.src = f.v
         |        AND n.idx = (f.v * ${graft.algo.RandomWalks.StepMixA}
         |                     + g.i * ${graft.algo.RandomWalks.StepMixB}
         |                     + 1) % d.d),
         |f1 AS (SELECT DISTINCT dst AS v FROM s1),
         |s2 AS (SELECT DISTINCT CAST(2 AS BIGINT) AS layer, f.v AS src, n.dst
         |       FROM f1 f
         |       JOIN dg d ON f.v = d.id
         |       CROSS JOIN generate_series(0, 1) AS g(i)
         |       JOIN nbr n ON n.src = f.v
         |        AND n.idx = (f.v * ${graft.algo.RandomWalks.StepMixA}
         |                     + g.i * ${graft.algo.RandomWalks.StepMixB}
         |                     + 2) % d.d)
         |SELECT layer, src, dst FROM s1
         |UNION ALL SELECT layer, src, dst FROM s2""".stripMargin,

    "g_walks_biased_l3" -> {
      val A = graft.algo.RandomWalks.StepMixA
      val B = graft.algo.RandomWalks.StepMixB
      val steps = (2 to 3).map { t =>
        s"""cand$t AS (
           |  SELECT s.walk_id, s.cur, s.prev, a.dst AS x,
           |    CASE WHEN a.dst = s.prev THEN 1
           |         WHEN EXISTS (SELECT 1 FROM e0 p
           |                      WHERE p.src = s.prev AND p.dst = a.dst) THEN 2
           |         ELSE 4 END AS w
           |  FROM s${t - 1} s JOIN e0 a ON a.src = s.cur),
           |cum$t AS (
           |  SELECT walk_id, cur, prev, x, w,
           |    sum(w) OVER (PARTITION BY walk_id ORDER BY x) AS cw,
           |    sum(w) OVER (PARTITION BY walk_id) AS tw
           |  FROM cand$t),
           |s$t AS (
           |  SELECT walk_id, x AS cur, cur AS prev FROM cum$t
           |  WHERE (cur * $A + walk_id * $B + $t) % tw >= cw - w
           |    AND (cur * $A + walk_id * $B + $t) % tw < cw)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |dg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1),
         |nbr AS (SELECT src, dst,
         |          CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
         |               AS BIGINT) AS idx
         |        FROM e0),
         |w0 AS (SELECT id AS walk_id, id AS cur
         |       FROM verts WHERE id % 20 = 0),
         |s1 AS (SELECT w.walk_id, n.dst AS cur, w.cur AS prev
         |       FROM w0 w JOIN dg d ON w.cur = d.id
         |       JOIN nbr n ON n.src = w.cur
         |        AND n.idx = (w.cur * $A + w.walk_id * $B + 1) % d.d),
         |$steps
         |SELECT walk_id, CAST(0 AS BIGINT) AS step, walk_id AS vertex FROM w0
         |UNION ALL SELECT walk_id, CAST(1 AS BIGINT), cur FROM s1
         |UNION ALL SELECT walk_id, CAST(2 AS BIGINT), cur FROM s2
         |UNION ALL SELECT walk_id, CAST(3 AS BIGINT), cur FROM s3""".stripMargin
    },

    "g_assortativity" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |jn AS (SELECT dx.degree AS x, dy.degree AS y FROM e0
         |       JOIN deg dx ON e0.src = dx.id
         |       JOIN deg dy ON e0.dst = dy.id),
         |s AS (SELECT count(*) AS m,
         |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(x * y) AS BIGINT) AS sxy,
         |        CAST(sum(x * x) AS BIGINT) AS sxx,
         |        CAST(sum(y * y) AS BIGINT) AS syy
         |      FROM jn)
         |SELECT CAST(ROUND(CASE
         |  WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0 THEN 0.0
         |  ELSE (m * sxy - sx * sy)
         |       / sqrt(CAST(m * sxx - sx * sx AS DOUBLE) * (m * syy - sy * sy))
         |  END * 1000000) AS BIGINT) AS r_e6
         |FROM s""".stripMargin,

    "g_linkpred" ->
      s"""WITH $cte,
         |probe AS (SELECT range AS u, (range + 2) % $NodeSpace AS v
         |          FROM range($NodeSpace)),
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |ov AS (
         |  SELECT p.u, p.v, count(*) AS cn, sum(1.0 / ln(d.degree)) AS aa
         |  FROM probe p
         |  JOIN e0 a ON a.src = p.u
         |  JOIN e0 b ON b.src = p.v AND b.dst = a.dst
         |  JOIN deg d ON d.id = a.dst
         |  GROUP BY 1, 2)
         |SELECT p.u AS src, p.v AS dst,
         |  coalesce(ov.cn, 0) AS common,
         |  CAST(ROUND(coalesce(ov.aa, 0) * 1000000) AS BIGINT) AS aa_e6,
         |  CAST(ROUND(CASE
         |    WHEN coalesce(du.degree, 0) + coalesce(dv.degree, 0)
         |         - coalesce(ov.cn, 0) > 0
         |    THEN CAST(coalesce(ov.cn, 0) AS DOUBLE)
         |         / (coalesce(du.degree, 0) + coalesce(dv.degree, 0)
         |            - coalesce(ov.cn, 0))
         |    ELSE 0.0 END * 1000000) AS BIGINT) AS jaccard_e6,
         |  coalesce(du.degree, 0) * coalesce(dv.degree, 0) AS pa
         |FROM probe p
         |LEFT JOIN ov ON ov.u = p.u AND ov.v = p.v
         |LEFT JOIN deg du ON du.id = p.u
         |LEFT JOIN deg dv ON dv.id = p.v""".stripMargin,

    "g_linkpred_ra" ->
      s"""WITH $cte,
         |probe AS (SELECT range AS u, (range + 3) % $NodeSpace AS v
         |          FROM range($NodeSpace)),
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |ov AS (
         |  SELECT p.u, p.v, count(*) AS cn, sum(1.0 / d.degree) AS ra
         |  FROM probe p
         |  JOIN e0 a ON a.src = p.u
         |  JOIN e0 b ON b.src = p.v AND b.dst = a.dst
         |  JOIN deg d ON d.id = a.dst
         |  GROUP BY 1, 2)
         |SELECT p.u AS src, p.v AS dst,
         |  coalesce(ov.cn, 0) AS common,
         |  CAST(ROUND(coalesce(ov.ra, 0) * 1000000) AS BIGINT) AS ra_e6,
         |  CAST(ROUND(CASE
         |    WHEN coalesce(du.degree, 0) * coalesce(dv.degree, 0) > 0
         |    THEN CAST(coalesce(ov.cn, 0) AS DOUBLE)
         |         / sqrt(CAST(coalesce(du.degree, 0) * coalesce(dv.degree, 0)
         |                AS DOUBLE))
         |    ELSE 0.0 END * 1000000) AS BIGINT) AS cos_e6,
         |  CAST(ROUND(CASE
         |    WHEN coalesce(du.degree, 0) * coalesce(dv.degree, 0) > 0
         |    THEN CAST(coalesce(ov.cn, 0) AS DOUBLE)
         |         / (coalesce(du.degree, 0) * coalesce(dv.degree, 0))
         |    ELSE 0.0 END * 1000000) AS BIGINT) AS lhn_e6
         |FROM probe p
         |LEFT JOIN ov ON ov.u = p.u AND ov.v = p.v
         |LEFT JOIN deg du ON du.id = p.u
         |LEFT JOIN deg dv ON dv.id = p.v""".stripMargin,

    "g_collective_influence" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |nx AS (
         |  SELECT e0.src AS id, sum(d.degree - 1) AS nxv
         |  FROM e0 JOIN deg d ON d.id = e0.dst
         |  GROUP BY 1)
         |SELECT deg.id, deg.degree,
         |  CAST((deg.degree - 1) * nx.nxv AS BIGINT) AS ci
         |FROM deg JOIN nx ON nx.id = deg.id""".stripMargin,

    "g_orbits" ->
      s"""WITH $cte, canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |tri AS (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM canon e1
         |  JOIN canon e2 ON e1.dst = e2.src
         |  JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |pv AS (SELECT id, count(*) AS t FROM (
         |  SELECT a AS id FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri) u GROUP BY id),
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |nx AS (
         |  SELECT e0.src AS id, sum(d.degree - 1) AS nxv
         |  FROM e0 JOIN deg d ON d.id = e0.dst
         |  GROUP BY 1)
         |SELECT deg.id, deg.degree,
         |  CAST(nx.nxv - 2 * coalesce(pv.t, 0) AS BIGINT) AS wedge_end,
         |  CAST(deg.degree * (deg.degree - 1) // 2 - coalesce(pv.t, 0)
         |    AS BIGINT) AS wedge_center,
         |  CAST(coalesce(pv.t, 0) AS BIGINT) AS triangles
         |FROM deg
         |JOIN nx ON nx.id = deg.id
         |LEFT JOIN pv ON pv.id = deg.id""".stripMargin,

    "g_signed_triads" ->
      s"""WITH $cte, canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |tri AS (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM canon e1
         |  JOIN canon e2 ON e1.dst = e2.src
         |  JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst)
         |SELECT CAST(n_neg AS BIGINT) AS n_neg, count(*) AS n_triangles
         |FROM (
         |  SELECT (CASE WHEN (a + b) % 3 = 0 THEN 1 ELSE 0 END
         |        + CASE WHEN (b + c) % 3 = 0 THEN 1 ELSE 0 END
         |        + CASE WHEN (a + c) % 3 = 0 THEN 1 ELSE 0 END) AS n_neg
         |  FROM tri) s
         |GROUP BY 1""".stripMargin,

    "g_label_spreading_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""g$k AS (
           |  SELECT e0.src AS id, f.cls, sum(f.f) AS s
           |  FROM e0 JOIN f${k - 1} f ON f.id = e0.dst
           |  GROUP BY 1, 2),
           |f$k AS (
           |  SELECT coalesce(g.id, sd.id) AS id,
           |         coalesce(g.cls, sd.cls) AS cls,
           |         coalesce(0.5 * g.s / d.degree, 0) + 0.5 * coalesce(sd.y, 0)
           |           AS f
           |  FROM g$k g
           |  FULL OUTER JOIN seeds sd ON sd.id = g.id AND sd.cls = g.cls
           |  JOIN deg d ON d.id = coalesce(g.id, sd.id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |seeds AS (SELECT id, (id // 25) % 2 AS cls, 1.0 AS y
         |          FROM verts WHERE id % 25 = 0),
         |f0 AS (SELECT id, cls, y AS f FROM seeds),
         |$steps
         |SELECT id, cls, CAST(ROUND(f * 1000000) AS BIGINT) AS f_e6
         |FROM f3 WHERE f > 0""".stripMargin
    },

    "g_dyad_census" ->
      s"""WITH d0 AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |pr AS (
         |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         |         count(*) AS arcs
         |  FROM d0 GROUP BY 1, 2),
         |nv AS (SELECT count(*) AS n FROM (
         |  SELECT src AS id FROM d0 UNION SELECT dst FROM d0) u)
         |SELECT CAST(nv.n AS BIGINT) AS n_vertices,
         |  CAST(sum(CASE WHEN arcs = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS mutual,
         |  CAST(sum(CASE WHEN arcs = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS asym,
         |  CAST(nv.n * (nv.n - 1) // 2
         |    - sum(CASE WHEN arcs = 2 THEN 1 ELSE 0 END)
         |    - sum(CASE WHEN arcs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nulls
         |FROM pr, nv GROUP BY nv.n""".stripMargin,

    "g_twins" ->
      s"""WITH $cte,
         |sig AS (
         |  SELECT src AS id,
         |    md5(string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst)) AS sg
         |  FROM e0 GROUP BY 1),
         |cls AS (SELECT sg, min(id) AS rep, count(*) AS class_size
         |        FROM sig GROUP BY 1)
         |SELECT sig.id, cls.rep, cls.class_size
         |FROM sig JOIN cls ON cls.sg = sig.sg""".stripMargin,

    "g_closeness_weighted" -> {
      val rounds = (1 to 4).map { t =>
        s"""d$t AS MATERIALIZED (
           |  SELECT coalesce(p.source, c.source) AS source,
           |         coalesce(p.id, c.id) AS id,
           |         least(coalesce(p.dist, 9223372036854775807),
           |               coalesce(c.cand, 9223372036854775807)) AS dist
           |  FROM d${t - 1} p FULL JOIN (
           |    SELECT p.source, ew.dst AS id, min(p.dist + ew.weight) AS cand
           |    FROM ew JOIN d${t - 1} p ON ew.src = p.id GROUP BY 1, 2) c
           |  ON p.source = c.source AND p.id = c.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |vw AS (SELECT DISTINCT src AS id FROM ew),
         |d0 AS MATERIALIZED (
         |  SELECT id AS source, id, CAST(0 AS BIGINT) AS dist
         |  FROM vw WHERE id % 75 = 0),
         |$rounds,
         |ag2 AS (SELECT source,
         |    CAST(sum(CASE WHEN id <> source THEN 1 ELSE 0 END) AS BIGINT)
         |      AS reached,
         |    CAST(sum(CASE WHEN id <> source THEN dist ELSE 0 END) AS BIGINT)
         |      AS sum_dist
         |  FROM d4 GROUP BY 1)
         |SELECT source, reached, sum_dist,
         |  CASE WHEN sum_dist > 0
         |    THEN CAST(ROUND(reached * 1000000000 / sum_dist) AS BIGINT)
         |    ELSE 0 END AS closeness_e9
         |FROM ag2""".stripMargin
    },

    "g_harmonic_weighted" -> {
      val rounds = (1 to 4).map { t =>
        s"""d$t AS MATERIALIZED (
           |  SELECT coalesce(p.source, c.source) AS source,
           |         coalesce(p.id, c.id) AS id,
           |         least(coalesce(p.dist, 9223372036854775807),
           |               coalesce(c.cand, 9223372036854775807)) AS dist
           |  FROM d${t - 1} p FULL JOIN (
           |    SELECT p.source, ew.dst AS id, min(p.dist + ew.weight) AS cand
           |    FROM ew JOIN d${t - 1} p ON ew.src = p.id GROUP BY 1, 2) c
           |  ON p.source = c.source AND p.id = c.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |vw AS (SELECT DISTINCT src AS id FROM ew),
         |d0 AS MATERIALIZED (
         |  SELECT id AS source, id, CAST(0 AS BIGINT) AS dist
         |  FROM vw WHERE id % 75 = 0),
         |$rounds
         |SELECT source, CAST(count(*) AS BIGINT) AS reached,
         |  CAST(sum(CAST(ROUND(1000000000 / dist) AS BIGINT)) AS BIGINT)
         |    AS harmonic_e9
         |FROM d4 WHERE id <> source GROUP BY 1""".stripMargin
    },

    "g_walks_weighted_l3" -> {
      val steps = (1 to 3).map { t =>
        s"""w$t AS (
           |  SELECT w.walk_id, CAST($t AS BIGINT) AS step, n.dst AS cur
           |  FROM w${t - 1} w
           |  JOIN twt d ON w.cur = d.src
           |  JOIN nbrw n ON n.src = w.cur
           |   AND (w.cur * ${graft.algo.RandomWalks.StepMixA}
           |        + w.walk_id * ${graft.algo.RandomWalks.StepMixB}
           |        + $t) % d.tw >= n.cw - n.weight
           |   AND (w.cur * ${graft.algo.RandomWalks.StepMixA}
           |        + w.walk_id * ${graft.algo.RandomWalks.StepMixB}
           |        + $t) % d.tw < n.cw)""".stripMargin
      }.mkString(",\n")
      val union = (0 to 3).map(t => s"SELECT * FROM w$t")
        .mkString("\n  UNION ALL ")
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |twt AS (SELECT src, CAST(sum(weight) AS BIGINT) AS tw
         |        FROM ew GROUP BY 1),
         |nbrw AS (SELECT src, dst, weight,
         |           CAST(sum(weight) OVER (PARTITION BY src ORDER BY dst)
         |             AS BIGINT) AS cw
         |         FROM ew),
         |verts AS (SELECT DISTINCT src AS id FROM ew),
         |w0 AS (SELECT id AS walk_id, CAST(0 AS BIGINT) AS step, id AS cur
         |       FROM verts WHERE id % 100 = 0),
         |$steps
         |SELECT walk_id, step, cur AS vertex FROM (
         |  $union) u""".stripMargin
    },

    "g_voterank_t3" -> {
      def round(k: Int): String = {
        val prevSel =
          if (k == 1) ""
          else "WHERE s.id NOT IN (" +
            (1 until k).map(i => s"SELECT id FROM w$i").mkString(" UNION ") +
            ")"
        s"""s$k AS (
           |  SELECT e0.src AS id, sum(v.va) AS score
           |  FROM e0 JOIN va${k - 1} v ON v.id = e0.dst
           |  GROUP BY 1),
           |w$k AS (SELECT s.id, s.score FROM s$k s
           |        $prevSel
           |        ORDER BY s.score DESC, s.id ASC LIMIT 1),
           |va$k AS (
           |  SELECT v.id,
           |    CASE WHEN v.id = (SELECT id FROM w$k) THEN 0
           |         WHEN EXISTS (SELECT 1 FROM e0
           |                      WHERE e0.src = (SELECT id FROM w$k)
           |                        AND e0.dst = v.id)
           |           THEN greatest(v.va - (SELECT d FROM dl), 0)
           |         ELSE v.va END AS va
           |  FROM va${k - 1} v)""".stripMargin
      }
      s"""WITH $cte,
         |sc AS (SELECT count(*) AS slots FROM e0),
         |nv AS (SELECT count(*) AS n FROM verts),
         |dl AS (SELECT CAST(ROUND(1000000.0 * nv.n / sc.slots) AS BIGINT)
         |         AS d FROM sc, nv),
         |va0 AS (SELECT id, CAST(1000000 AS BIGINT) AS va FROM verts),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT CAST(1 AS BIGINT) AS rank, id, CAST(score AS BIGINT)
         |  AS score_e6 FROM w1
         |UNION ALL SELECT 2, id, CAST(score AS BIGINT) FROM w2
         |UNION ALL SELECT 3, id, CAST(score AS BIGINT) FROM w3""".stripMargin
    },

    "g_lt_cascade_t3" -> {
      val steps = (1 to 3).map { r =>
        s"""g$r AS (
           |  SELECT e0.src AS id, count(*) AS na
           |  FROM e0 JOIN a${r - 1} a ON a.id = e0.dst
           |  GROUP BY 1),
           |f$r AS (
           |  SELECT g.id, CAST($r AS BIGINT) AS round
           |  FROM g$r g
           |  JOIN deg ON deg.id = g.id
           |  JOIN th ON th.id = g.id
           |  WHERE g.id NOT IN (SELECT id FROM a${r - 1})
           |    AND g.na * 98 >= th.tnum * deg.degree),
           |a$r AS (SELECT * FROM a${r - 1} UNION ALL SELECT * FROM f$r)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |th AS (SELECT id, (id * 31) % 97 + 1 AS tnum FROM verts),
         |a0 AS (SELECT id, CAST(0 AS BIGINT) AS round FROM verts
         |       WHERE id % 37 = 0),
         |$steps
         |SELECT id, round FROM a3""".stripMargin
    },

    // IC oracle: the md5 live-edge filter + 3 unrolled BFS rounds over
    // the surviving slots (the live-edge reachability identity verbatim)
    "g_ic_cascade_t3" -> {
      val steps = (1 to 3).map { r =>
        s"""f$r AS (
           |  SELECT DISTINCT live.src AS id, CAST($r AS BIGINT) AS round
           |  FROM live JOIN a${r - 1} a ON a.id = live.dst
           |  WHERE live.src NOT IN (SELECT id FROM a${r - 1})),
           |a$r AS (SELECT * FROM a${r - 1} UNION ALL SELECT * FROM f$r)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |live AS (SELECT src, dst FROM e0
         |  WHERE ('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR),
         |    1, 15))::BIGINT % 1000 < 600),
         |a0 AS (SELECT id, CAST(0 AS BIGINT) AS round FROM verts
         |       WHERE id % 37 = 0),
         |$steps
         |SELECT id, round FROM a3""".stripMargin
    },

    "g_landmark_dist" ->
      s"""WITH RECURSIVE $cte,
         |lmk AS (SELECT id FROM verts WHERE id % 75 = 0),
         |reach(source, id, dist) AS (
         |  SELECT id, id, 0 FROM lmk
         |  UNION
         |  SELECT r.source, e0.dst, r.dist + 1
         |  FROM reach r JOIN e0 ON e0.src = r.id
         |  WHERE r.dist < ${graft.algo.Betweenness.DepthCap}),
         |lv AS (SELECT source, id, min(dist) AS dist FROM reach GROUP BY 1, 2),
         |probe AS (SELECT range AS src, (range + 7) % $NodeSpace AS dst
         |          FROM range($NodeSpace)),
         |est AS (
         |  SELECT p.src, p.dst, count(*) AS n_landmarks,
         |         min(u.dist + v.dist) AS est_dist
         |  FROM probe p
         |  JOIN lv u ON u.id = p.src
         |  JOIN lv v ON v.source = u.source AND v.id = p.dst
         |  GROUP BY 1, 2)
         |SELECT p.src, p.dst,
         |  CAST(coalesce(e.n_landmarks, 0) AS BIGINT) AS n_landmarks,
         |  CAST(e.est_dist AS BIGINT) AS est_dist
         |FROM probe p
         |LEFT JOIN est e ON e.src = p.src AND e.dst = p.dst""".stripMargin,

    // HITS: unrolled alternating hub/authority aggregations over the
    // directed edge set, L1-normalized per half-step via scalar
    // subqueries; every state CTE MATERIALIZED (referenced by the next
    // half-step AND its own normalizer)
    // degree-balance oracle: same directed table, exact integer moments,
    // identical expression order in the final Pearson divide
    "g_inout_profile" ->
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |vd AS (SELECT src AS id FROM rawd UNION SELECT dst FROM rawd),
         |odt AS (SELECT src AS id, count(*) AS od FROM rawd GROUP BY 1),
         |idt AS (SELECT dst AS id, count(*) AS indeg FROM rawd GROUP BY 1),
         |prof AS (SELECT CAST(coalesce(o.od, 0) AS BIGINT) AS x,
         |                CAST(coalesce(i.indeg, 0) AS BIGINT) AS y
         |         FROM vd v LEFT JOIN odt o ON v.id = o.id
         |         LEFT JOIN idt i ON v.id = i.id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |          AS nd,
         |        CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |          AS no,
         |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(x * y) AS BIGINT) AS sxy,
         |        CAST(sum(x * x) AS BIGINT) AS sxx,
         |        CAST(sum(y * y) AS BIGINT) AS syy
         |      FROM prof)
         |SELECT n AS n_pages, nd AS n_dangling, no AS n_orphan,
         |  CAST(ROUND(nd * 1000000.0 / n) AS BIGINT) AS dangling_e6,
         |  CAST(ROUND((n * sxy - sx * sy) * 1000000.0
         |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
         |      * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
         |    AS inout_r_e6
         |FROM m""".stripMargin,

    // hierarchy oracle: same indeg−outdeg score, same edge census,
    // same integer e6 floor division (DuckDB //)
    "g_hierarchy" ->
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |vd AS (SELECT src AS id FROM rawd UNION SELECT dst FROM rawd),
         |odt AS (SELECT src AS id, count(*) AS od FROM rawd GROUP BY 1),
         |idt AS (SELECT dst AS id, count(*) AS indeg FROM rawd GROUP BY 1),
         |sc AS (SELECT v.id,
         |         CAST(coalesce(i.indeg, 0) - coalesce(o.od, 0) AS BIGINT)
         |           AS s
         |       FROM vd v LEFT JOIN odt o ON v.id = o.id
         |       LEFT JOIN idt i ON v.id = i.id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
         |        CAST(sum(CASE WHEN a.s < b.s THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_forward,
         |        CAST(sum(CASE WHEN a.s > b.s THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_backward,
         |        CAST(sum(CASE WHEN a.s = b.s THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_level
         |      FROM rawd r JOIN sc a ON r.src = a.id
         |      JOIN sc b ON r.dst = b.id)
         |SELECT n_edges, n_forward, n_backward, n_level,
         |       n_forward * 1000000 // n_edges AS forward_e6
         |FROM m""".stripMargin,

    "g_hits_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""ar$k AS (
           |  SELECT r.dst AS id, sum(p.hub) AS a
           |  FROM rawd r JOIN s${k - 1} p ON r.src = p.id GROUP BY 1),
           |aj$k AS MATERIALIZED (
           |  SELECT v.id, coalesce(ar.a, 0) AS a
           |  FROM vd v LEFT JOIN ar$k ar ON v.id = ar.id),
           |an$k AS MATERIALIZED (
           |  SELECT id, a / (SELECT sum(a) FROM aj$k) AS auth FROM aj$k),
           |hr$k AS (
           |  SELECT r.src AS id, sum(an.auth) AS h
           |  FROM rawd r JOIN an$k an ON r.dst = an.id GROUP BY 1),
           |hj$k AS MATERIALIZED (
           |  SELECT v.id, coalesce(hr.h, 0) AS h
           |  FROM vd v LEFT JOIN hr$k hr ON v.id = hr.id),
           |s$k AS MATERIALIZED (
           |  SELECT an.id, an.auth, hj.h / (SELECT sum(h) FROM hj$k) AS hub
           |  FROM an$k an JOIN hj$k hj ON an.id = hj.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |vd AS (SELECT src AS id FROM rawd UNION SELECT dst FROM rawd),
         |s0 AS MATERIALIZED (
         |  SELECT id, 1.0 / (SELECT count(*) FROM vd) AS auth,
         |         1.0 / (SELECT count(*) FROM vd) AS hub FROM vd),
         |$steps
         |SELECT id, CAST(ROUND(auth * 1000000) AS BIGINT) AS auth_e6,
         |       CAST(ROUND(hub * 1000000) AS BIGINT) AS hub_e6
         |FROM s3""".stripMargin
    },

    // weighted PageRank: prSql's power iteration with rank split by
    // weight share of out-weight (symmetrized weighted graph ⇒ no
    // dangling term); arithmetic order mirrors the engine exactly
    "g_pagerank_w_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""x$k AS (
           |  SELECT ew.dst AS id, sum(p.r * ew.weight / d.wout) AS s
           |  FROM ew JOIN r${k - 1} p ON ew.src = p.id
           |  JOIN wout d ON ew.src = d.id
           |  GROUP BY 1
           |), r$k AS (
           |  SELECT v.id, 0.15 / (SELECT count(*) FROM vw)
           |         + 0.85 * coalesce(x.s, 0) AS r
           |  FROM vw v LEFT JOIN x$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |vw AS (SELECT DISTINCT src AS id FROM ew),
         |wout AS (SELECT src AS id, CAST(sum(weight) AS BIGINT) AS wout
         |         FROM ew GROUP BY 1),
         |r0 AS (SELECT id, 1.0 / (SELECT count(*) FROM vw) AS r FROM vw),
         |$steps
         |SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_e6 FROM r3""".stripMargin
    },

    // personalized PageRank: prSql's power iteration with the teleport
    // mass routed to the sampled source set (graph is symmetrized ⇒ no
    // dangling term)
    "g_ppr_t5" ->
      s"""WITH $cte,
         |${pprStepsSql(5)}
         |SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_e6 FROM r5""".stripMargin,

    // SybilRank oracle: 3 unrolled teleport-free degree-normalized trust
    // steps from the %10 seeds, final score = trust/deg
    "g_sybilrank_t3" -> {
      val steps = (1 to 3).map { k =>
        s"""sy$k AS (
           |  SELECT v.id, coalesce(x.s, 0) AS r
           |  FROM verts v LEFT JOIN (
           |    SELECT e0.dst AS id, sum(p.r / d.od) AS s
           |    FROM e0 JOIN sy${k - 1} p ON e0.src = p.id
           |    JOIN sydeg d ON e0.src = d.id
           |    GROUP BY 1) x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |sydeg AS (SELECT src AS id, count(*) AS od FROM e0 GROUP BY 1),
         |sysrc AS (SELECT id FROM verts WHERE id % 10 = 0),
         |sy0 AS (
         |  SELECT v.id, CASE WHEN s.id IS NULL THEN 0.0
         |    ELSE 1.0 / (SELECT count(*) FROM sysrc) END AS r
         |  FROM verts v LEFT JOIN sysrc s ON v.id = s.id),
         |$steps
         |SELECT sy3.id, CAST(ROUND(r * 1000000) AS BIGINT) AS trust_e6,
         |  CAST(ROUND(r / d.od * 1000000000) AS BIGINT) AS score_e9
         |FROM sy3 JOIN sydeg d ON sy3.id = d.id""".stripMargin
    },

    // sweep-cut oracle: the shared PPR chain, top-64 prefix ranking,
    // max-rank internal-edge grouping, cumulative windows
    "g_ppr_sweep_t5" ->
      s"""WITH $cte,
         |${pprStepsSql(5)},
         |sc AS (SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS score_e6
         |       FROM r5),
         |top AS (SELECT id, score_e6, CAST(k AS BIGINT) AS k FROM (
         |  SELECT id, score_e6, row_number() OVER (
         |    ORDER BY score_e6 DESC, id ASC) AS k FROM sc) t
         |  WHERE k <= 64),
         |dg AS (SELECT src AS id, count(*) AS dd FROM e0 GROUP BY 1),
         |rk AS (SELECT top.id, top.score_e6, top.k, dg.dd
         |       FROM top JOIN dg ON dg.id = top.id),
         |ie AS (SELECT greatest(a.k, b.k) AS k, count(*) AS ne
         |       FROM e0 JOIN rk a ON a.id = e0.src
         |       JOIN rk b ON b.id = e0.dst
         |       WHERE e0.src < e0.dst GROUP BY 1),
         |tt AS (SELECT count(*) AS t FROM e0),
         |sw AS (SELECT rk.k, rk.id, rk.score_e6,
         |         CAST(sum(rk.dd) OVER (ORDER BY rk.k) AS BIGINT) AS vol,
         |         CAST(sum(coalesce(ie.ne, 0)) OVER (ORDER BY rk.k)
         |              AS BIGINT) AS intern
         |       FROM rk LEFT JOIN ie ON ie.k = rk.k)
         |SELECT k, id, score_e6, vol, vol - 2 * intern AS cut,
         |  CASE WHEN least(vol, t - vol) = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE CAST(ROUND(CAST(vol - 2 * intern AS DOUBLE) * 1000000
         |              / least(vol, t - vol)) AS BIGINT)
         |  END AS cond_e6
         |FROM sw, tt""".stripMargin,

    "g_read_txt" ->
      """WITH fx(sn, dn) AS (VALUES
        |  ('b','a'), ('a','c'), ('b','c'), ('b','c'), ('c','d')),
        |names AS (SELECT DISTINCT sn AS name FROM fx
        |          UNION SELECT DISTINCT dn FROM fx),
        |dict AS (SELECT name,
        |           CAST(row_number() OVER (ORDER BY name) - 1 AS BIGINT) AS id
        |         FROM names),
        |ids AS (SELECT ds.id AS src, dd.id AS dst
        |        FROM fx JOIN dict ds ON fx.sn = ds.name
        |        JOIN dict dd ON fx.dn = dd.name)
        |SELECT src, dst FROM ids
        |UNION ALL SELECT dst, src FROM ids""".stripMargin,

    "g_read_net" ->
      """WITH fx(sn, dn, w) AS (VALUES
        |  ('1','2',1.5), ('2','3',2.0), ('1','2',0.5), ('3','4',1.0)),
        |names AS (SELECT DISTINCT sn AS name FROM fx
        |          UNION SELECT DISTINCT dn FROM fx),
        |dict AS (SELECT name,
        |           CAST(row_number() OVER (ORDER BY name) - 1 AS BIGINT) AS id
        |         FROM names),
        |ids AS (SELECT ds.id AS src, dd.id AS dst, w
        |        FROM fx JOIN dict ds ON fx.sn = ds.name
        |        JOIN dict dd ON fx.dn = dd.name),
        |sym AS (SELECT src, dst, w FROM ids
        |        UNION ALL SELECT dst AS src, src AS dst, w FROM ids),
        |agg AS (SELECT src, dst, min(w) AS w FROM sym GROUP BY 1, 2)
        |SELECT src, dst, CAST(ROUND(w * 1000) AS BIGINT) AS w_e3 FROM agg""".stripMargin,

    "g_read_gt" ->
      """WITH gt(name, lab, ln) AS (VALUES
        |  ('a','x',1), ('b','y',2), ('a','z',3), ('c','x',4), ('d','y',5)),
        |fw AS (SELECT name, lab FROM (
        |         SELECT name, lab,
        |                row_number() OVER (PARTITION BY name ORDER BY ln) AS rn
        |         FROM gt) t WHERE rn = 1),
        |fx(sn, dn) AS (VALUES
        |  ('b','a'), ('a','c'), ('b','c'), ('b','c'), ('c','d')),
        |names AS (SELECT DISTINCT sn AS name FROM fx
        |          UNION SELECT DISTINCT dn FROM fx),
        |dict AS (SELECT name,
        |           CAST(row_number() OVER (ORDER BY name) - 1 AS BIGINT) AS id
        |         FROM names),
        |ldict AS (SELECT lab,
        |            CAST(row_number() OVER (ORDER BY lab) - 1 AS BIGINT) AS label
        |          FROM (SELECT DISTINCT lab FROM fw) u)
        |SELECT d.id, l.label
        |FROM fw JOIN dict d ON fw.name = d.name
        |JOIN ldict l ON fw.lab = l.lab""".stripMargin,

    // unrolled synchronous Louvain move rounds: per round Σtot per
    // community, k_{i,d} gather, candidate set = neighbor communities ∪
    // own, exact-integer score argmax with (score DESC, com ASC) pinning —
    // the engine's moveRound transcribed
    "g_louvain_t2" -> {
      val steps = (1 to 2).map { t =>
        val dir = if (t % 2 == 1) "com < own" else "com > own"
        s"""tot$t AS (SELECT a.com, CAST(sum(d.k) AS BIGINT) AS tot
           |  FROM a${t - 1} a JOIN deg d ON a.id = d.id GROUP BY 1),
           |kid$t AS (SELECT e0.src AS id, a.com, CAST(count(*) AS BIGINT) AS kid
           |  FROM e0 JOIN a${t - 1} a ON e0.dst = a.id
           |  WHERE e0.src <> e0.dst GROUP BY 1, 2),
           |cand$t AS (SELECT id, com, CAST(sum(kid) AS BIGINT) AS kid FROM (
           |    SELECT id, com, kid FROM kid$t
           |    UNION ALL SELECT id, com, CAST(0 AS BIGINT) FROM a${t - 1}) u
           |  GROUP BY 1, 2),
           |sc$t AS (SELECT c.id, c.com, a.com AS own,
           |    mm.m2 * c.kid
           |      - d.k * (CASE WHEN c.com = a.com THEN t.tot - d.k
           |               ELSE t.tot END) AS score
           |  FROM cand$t c
           |  JOIN tot$t t ON c.com = t.com
           |  JOIN deg d ON c.id = d.id
           |  JOIN a${t - 1} a ON c.id = a.id, mm),
           |adm$t AS (SELECT * FROM sc$t WHERE com = own OR $dir),
           |a$t AS MATERIALIZED (SELECT id, com FROM (
           |    SELECT id, com,
           |           row_number() OVER (PARTITION BY id
           |             ORDER BY score DESC,
           |                      CASE WHEN com = own THEN 0 ELSE 1 END,
           |                      com ASC) AS rn
           |    FROM adm$t) x WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cte,
         |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS k
         |        FROM e0 GROUP BY 1),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM e0),
         |a0 AS MATERIALIZED (SELECT id, id AS com FROM verts),
         |$steps
         |SELECT id, com FROM a2""".stripMargin
    },

    // mutual-reachability SCC oracle: v and w strongly connected iff both
    // (v,w) and (w,v) are in the reflexive-transitive closure; label =
    // min of the mutual set (reach includes (v,v), so every vertex labels)
    "g_scc" ->
      s"""WITH RECURSIVE rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |vd AS (SELECT src AS id FROM rawd UNION SELECT dst FROM rawd),
         |reach(src, dst) AS (
         |  SELECT id, id FROM vd
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN rawd e ON e.src = r.dst)
         |SELECT a.src AS id, CAST(min(a.dst) AS BIGINT) AS scc
         |FROM reach a JOIN reach b ON b.src = a.dst AND b.dst = a.src
         |GROUP BY 1""".stripMargin,

    // shared-citer pair counts under the identical out-degree-≤20 cap
    "g_cocitation" ->
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |kc AS (SELECT src FROM rawd GROUP BY src HAVING count(*) <= 20),
         |k AS (SELECT src, dst FROM rawd WHERE src IN (SELECT src FROM kc))
         |SELECT a.dst AS u, b.dst AS v, count(*) AS n
         |FROM k a JOIN k b ON a.src = b.src AND a.dst < b.dst
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    "g_coupling" ->
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |kc AS (SELECT dst FROM rawd GROUP BY dst HAVING count(*) <= 20),
         |k AS (SELECT src, dst FROM rawd WHERE dst IN (SELECT dst FROM kc))
         |SELECT a.src AS u, b.src AS v, count(*) AS n
         |FROM k a JOIN k b ON a.dst = b.dst AND a.src < b.src
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    // R-MAT oracle: the identical modular draw and bit assembly per
    // level, as a list comprehension over the level range
    "g_rmat" ->
      s"""WITH idx AS (SELECT CAST(i AS BIGINT) AS i FROM range(2000) t(i)),
         |r AS (SELECT i,
         |  [((i * (${graft.sources.Rmat.MixA} + ${graft.sources.Rmat.MixStep} * l)
         |     + 42) % ${graft.sources.Rmat.MixM}) % 1000
         |   for l in range(8)] AS d
         |  FROM idx)
         |SELECT i,
         |  CAST(list_sum([CASE WHEN d[l+1] >= ${graft.sources.Rmat.ThreshC}
         |                 THEN 1 << l ELSE 0 END for l in range(8)]) AS BIGINT) AS src,
         |  CAST(list_sum([CASE WHEN (d[l+1] >= ${graft.sources.Rmat.ThreshB}
         |                       AND d[l+1] < ${graft.sources.Rmat.ThreshC})
         |                   OR d[l+1] >= ${graft.sources.Rmat.ThreshD}
         |                 THEN 1 << l ELSE 0 END for l in range(8)]) AS BIGINT) AS dst
         |FROM r""".stripMargin,

    // frontier oracle: prSql(3) nested as a CTE + last-seen time in
    // EXACT integer microseconds (epoch_us — date_part('epoch') keeps a
    // fractional part whose double // neither floors nor casts like
    // Spark's truncating long cast), then the same floor-divided
    // staleness and integer product
    "g_frontier" ->
      s"""WITH pr AS (
         |${prSql(3)}
         |),
         |seen AS (SELECT user_id % $NodeSpace AS id,
         |           max(epoch_us(ts)) AS us
         |         FROM events GROUP BY 1),
         |st AS (SELECT pr.id, pr.rank_e6,
         |         CAST(coalesce(
         |           ($FrontierHorizonSec - seen.us // 1000000) // 3600,
         |           9999) AS BIGINT) AS stale_h
         |       FROM pr LEFT JOIN seen ON pr.id = seen.id)
         |SELECT id, rank_e6, stale_h, rank_e6 * stale_h AS priority
         |FROM st""".stripMargin,

    // Doulion oracle: identical md5 coin on the canonical edge set,
    // exact triangle join on the survivors, integer ×8 scale-up
    "g_tri_approx" ->
      s"""WITH $cte,
         |canon AS (SELECT src, dst FROM e0 WHERE src < dst),
         |kept AS (SELECT src, dst FROM canon
         |  WHERE ('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR
         |          || ':7'), 1, 15))::BIGINT % 1000 < 500)
         |SELECT (SELECT count(*) FROM kept) AS sampled_edges,
         |       (SELECT count(*) FROM kept e1
         |        JOIN kept e2 ON e1.dst = e2.src
         |        JOIN kept e3 ON e3.src = e1.src AND e3.dst = e2.dst)
         |         AS sampled_triangles,
         |       (SELECT count(*) FROM kept e1
         |        JOIN kept e2 ON e1.dst = e2.src
         |        JOIN kept e3 ON e3.src = e1.src AND e3.dst = e2.dst) * 8
         |         AS est_triangles""".stripMargin,

    "g_sample_induced" ->
      s"""WITH $cte,
         |keep AS (SELECT id FROM verts
         |  WHERE ('0x' || substr(md5(id::VARCHAR || ':11'), 1, 15))::BIGINT
         |        % 1000 < 400)
         |SELECT e0.src, e0.dst FROM e0
         |JOIN keep a ON e0.src = a.id
         |JOIN keep b ON e0.dst = b.id""".stripMargin,

    // single-linkage oracle: CC (min reachable id) of the FULL clustered
    // graph restricted to weight ≤ τ — equal to the engine's
    // MSF-restricted CC by the single-linkage equivalence
    "g_single_linkage" ->
      s"""WITH RECURSIVE ed AS (
         |  SELECT least(l_orderkey % $NodeSpace, l_partkey % $NodeSpace) AS a,
         |         greatest(l_orderkey % $NodeSpace, l_partkey % $NodeSpace) AS b,
         |         min((CAST(l_quantity AS BIGINT) % 7 + 1) * 100000
         |             + least(l_orderkey % $NodeSpace, l_partkey % $NodeSpace) * $NodeSpace
         |             + greatest(l_orderkey % $NodeSpace, l_partkey % $NodeSpace)) AS w
         |  FROM lineitem
         |  WHERE l_orderkey % $NodeSpace <> l_partkey % $NodeSpace
         |    AND (l_orderkey % $NodeSpace) // 5 = (l_partkey % $NodeSpace) // 5
         |  GROUP BY 1, 2),
         |verts AS (SELECT DISTINCT id FROM
         |  (SELECT a AS id FROM ed UNION ALL SELECT b FROM ed) u),
         |keep AS (SELECT DISTINCT u, v FROM
         |  (SELECT a AS u, b AS v FROM ed WHERE w <= 350000
         |   UNION ALL SELECT b, a FROM ed WHERE w <= 350000) t),
         |reach(id, lab) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT keep.v, reach.lab FROM reach JOIN keep ON keep.u = reach.id)
         |SELECT id, min(lab) AS cluster FROM reach GROUP BY id""".stripMargin,

    // hub-removal oracle: same top-10-by-(degree desc, id asc) selection
    // over the symmetrized slot table, then CC of the surviving subgraph
    "g_hub_removal" ->
      s"""WITH RECURSIVE $cte,
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |hubs AS (SELECT id FROM (
         |    SELECT id, row_number() OVER (ORDER BY degree DESC, id ASC) AS rn
         |    FROM deg) t WHERE rn <= 10),
         |rest AS (SELECT src, dst FROM e0
         |         WHERE src NOT IN (SELECT id FROM hubs)
         |           AND dst NOT IN (SELECT id FROM hubs)),
         |rverts AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM rest UNION ALL SELECT dst FROM rest) u),
         |reach(id, lab) AS (
         |  SELECT id, id FROM rverts
         |  UNION
         |  SELECT rest.dst, reach.lab FROM reach JOIN rest ON rest.src = reach.id)
         |SELECT id, min(lab) AS label FROM reach GROUP BY id""".stripMargin,

    // minimax-path MSF oracle — an INDEPENDENT characterization of the
    // same unique forest: enumerate path-bottleneck states (u, v, bw)
    // to the fixpoint (finite: pairs × distinct weights, and edges never
    // cross the 5-node clusters), take the per-pair minimum, and keep
    // exactly the edges whose own weight attains it
    "g_msf" ->
      s"""WITH RECURSIVE ed AS (
         |  SELECT least(l_orderkey % $NodeSpace, l_partkey % $NodeSpace) AS a,
         |         greatest(l_orderkey % $NodeSpace, l_partkey % $NodeSpace) AS b,
         |         min((CAST(l_quantity AS BIGINT) % 7 + 1) * 100000
         |             + least(l_orderkey % $NodeSpace, l_partkey % $NodeSpace) * $NodeSpace
         |             + greatest(l_orderkey % $NodeSpace, l_partkey % $NodeSpace)) AS w
         |  FROM lineitem
         |  WHERE l_orderkey % $NodeSpace <> l_partkey % $NodeSpace
         |    AND (l_orderkey % $NodeSpace) // 5 = (l_partkey % $NodeSpace) // 5
         |  GROUP BY 1, 2),
         |dir AS (SELECT a AS u, b AS v, w FROM ed
         |        UNION ALL SELECT b, a, w FROM ed),
         |walk(u, v, bw) AS (
         |  SELECT u, v, w FROM dir
         |  UNION
         |  SELECT wk.u, d.v, greatest(wk.bw, d.w)
         |  FROM walk wk JOIN dir d ON d.u = wk.v),
         |mm AS (SELECT u, v, min(bw) AS mm FROM walk WHERE u <> v GROUP BY 1, 2)
         |SELECT ed.a, ed.b, ed.w FROM ed
         |JOIN mm ON mm.u = ed.a AND mm.v = ed.b
         |WHERE mm.mm = ed.w""".stripMargin,

    "g_related_top2" ->
      s"""WITH rawd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |kc AS (SELECT src FROM rawd GROUP BY src HAVING count(*) <= 20),
         |k AS (SELECT src, dst FROM rawd WHERE src IN (SELECT src FROM kc)),
         |pairs AS (
         |  SELECT a.dst AS u, b.dst AS v, count(*) AS n
         |  FROM k a JOIN k b ON a.src = b.src AND a.dst < b.dst
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |bd AS (SELECT u AS page, v AS related, n FROM pairs
         |       UNION ALL SELECT v, u, n FROM pairs),
         |rk AS (SELECT page, related, n,
         |         CAST(row_number() OVER (PARTITION BY page
         |           ORDER BY n DESC, related ASC) AS BIGINT) AS rn
         |       FROM bd)
         |SELECT page, related, n, rn FROM rk WHERE rn <= 2""".stripMargin,

    // 16 explicit single steps of the same extended-with-identity
    // redirect function the engine reaches in 4 pointer doublings
    "g_redirects" ->
      s"""WITH RECURSIVE f AS (
         |  SELECT i AS src, (i * 7 + 13) % $NodeSpace AS dst
         |  FROM range($NodeSpace) t(i) WHERE i % 3 <> 0),
         |walk(u, cur, step) AS (
         |  SELECT src, src, 0 FROM f
         |  UNION ALL
         |  SELECT w.u, coalesce(f.dst, w.cur), w.step + 1
         |  FROM walk w LEFT JOIN f ON f.src = w.cur
         |  WHERE w.step < 16)
         |SELECT u AS id, CAST(cur AS BIGINT) AS target,
         |  cur NOT IN (SELECT src FROM f) AS resolved
         |FROM walk WHERE step = 16""".stripMargin,

    // condensation + levels oracle: mutual-reachability SCC labels on the
    // layered composite graph, component edges from the labels, then
    // longest-path depth as max over the (source-seeded) recursive path
    // relation — the two recursive CTEs keep UNION (set) semantics; every
    // NON-recursive CTE in the clause spells DISTINCT/UNION ALL explicitly
    // (DuckDB drops plain-UNION dedup for them inside WITH RECURSIVE)
    "g_condense_dag" ->
      s"""WITH RECURSIVE fwd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND ((l_partkey % $NodeSpace) % 10) - ((l_orderkey % $NodeSpace) % 10)
         |        IN (2, 3)),
         |ring AS (SELECT i AS src, (i + 10) % $NodeSpace AS dst
         |         FROM range($NodeSpace) t(i)),
         |ed AS (SELECT DISTINCT src, dst FROM
         |        (SELECT src, dst FROM fwd
         |         UNION ALL SELECT src, dst FROM ring) u),
         |vd AS (SELECT DISTINCT id FROM
         |        (SELECT src AS id FROM ed
         |         UNION ALL SELECT dst FROM ed) u),
         |reach(src, dst) AS (
         |  SELECT id, id FROM vd
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN ed e ON e.src = r.dst),
         |lab AS (SELECT a.src AS id, CAST(min(a.dst) AS BIGINT) AS scc
         |        FROM reach a JOIN reach b ON b.src = a.dst AND b.dst = a.src
         |        GROUP BY 1),
         |ce AS (SELECT DISTINCT ls.scc AS csrc, ld.scc AS cdst
         |       FROM ed JOIN lab ls ON ed.src = ls.id
         |               JOIN lab ld ON ed.dst = ld.id
         |       WHERE ls.scc <> ld.scc),
         |lv(comp, d) AS (
         |  SELECT comp, 0 FROM (SELECT DISTINCT comp FROM
         |          (SELECT csrc AS comp FROM ce
         |           UNION ALL SELECT cdst FROM ce) u) c
         |  WHERE comp NOT IN (SELECT cdst FROM ce)
         |  UNION
         |  SELECT e.cdst, l.d + 1 FROM lv l JOIN ce e ON e.csrc = l.comp),
         |lvm AS (SELECT comp, CAST(max(d) AS BIGINT) AS level
         |        FROM lv GROUP BY 1)
         |SELECT lab.id, lab.scc, coalesce(lvm.level, 0) AS level
         |FROM lab LEFT JOIN lvm ON lab.scc = lvm.comp""".stripMargin,

    // DAG path-count oracle: the g_condense_dag chain through ce, then
    // the 3 unrolled walk-length DP steps + the ≤3 total
    "g_dag_paths_t3" ->
      s"""WITH RECURSIVE fwd AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem
         |  WHERE l_linenumber = 1
         |    AND ((l_partkey % $NodeSpace) % 10) - ((l_orderkey % $NodeSpace) % 10)
         |        IN (2, 3)),
         |ring AS (SELECT i AS src, (i + 10) % $NodeSpace AS dst
         |         FROM range($NodeSpace) t(i)),
         |ed AS (SELECT DISTINCT src, dst FROM
         |        (SELECT src, dst FROM fwd
         |         UNION ALL SELECT src, dst FROM ring) u),
         |vd AS (SELECT DISTINCT id FROM
         |        (SELECT src AS id FROM ed
         |         UNION ALL SELECT dst FROM ed) u),
         |reach(src, dst) AS (
         |  SELECT id, id FROM vd
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN ed e ON e.src = r.dst),
         |lab AS (SELECT a.src AS id, CAST(min(a.dst) AS BIGINT) AS scc
         |        FROM reach a JOIN reach b ON b.src = a.dst AND b.dst = a.src
         |        GROUP BY 1),
         |ce AS (SELECT DISTINCT ls.scc AS csrc, ld.scc AS cdst
         |       FROM ed JOIN lab ls ON ed.src = ls.id
         |               JOIN lab ld ON ed.dst = ld.id
         |       WHERE ls.scc <> ld.scc),
         |cv AS (SELECT DISTINCT comp FROM
         |        (SELECT csrc AS comp FROM ce
         |         UNION ALL SELECT cdst FROM ce) u),
         |p0 AS (SELECT comp, CAST(1 AS BIGINT) AS w FROM cv
         |       WHERE comp NOT IN (SELECT cdst FROM ce)),
         |p1 AS (SELECT ce.cdst AS comp, CAST(sum(p.w) AS BIGINT) AS w
         |       FROM p0 p JOIN ce ON ce.csrc = p.comp GROUP BY 1),
         |p2 AS (SELECT ce.cdst AS comp, CAST(sum(p.w) AS BIGINT) AS w
         |       FROM p1 p JOIN ce ON ce.csrc = p.comp GROUP BY 1),
         |p3 AS (SELECT ce.cdst AS comp, CAST(sum(p.w) AS BIGINT) AS w
         |       FROM p2 p JOIN ce ON ce.csrc = p.comp GROUP BY 1),
         |tt AS (SELECT comp, CAST(sum(w) AS BIGINT) AS paths FROM (
         |         SELECT * FROM p0 UNION ALL SELECT * FROM p1
         |         UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3) u
         |       GROUP BY 1)
         |SELECT cv.comp, coalesce(tt.paths, 0) AS paths
         |FROM cv LEFT JOIN tt ON tt.comp = cv.comp""".stripMargin,

    // linkpred-eval oracle: snapshot-1 wedge CN ranking + snapshot-2
    // canonical added-edge membership
    "g_linkpred_eval" ->
      s"""WITH $cte,
         |raw2 AS (SELECT l_orderkey % $NodeSpace AS src,
         |                l_partkey % $NodeSpace AS dst
         |         FROM lineitem WHERE l_linenumber <= 2),
         |e2 AS (SELECT DISTINCT src, dst FROM (
         |         SELECT src, dst FROM raw2 WHERE src <> dst
         |         UNION ALL
         |         SELECT dst, src FROM raw2 WHERE src <> dst) u),
         |wedge AS (SELECT x.dst AS a, y.dst AS b, count(*) AS common
         |          FROM e0 x JOIN e0 y ON x.src = y.src AND x.dst < y.dst
         |          GROUP BY 1, 2),
         |nonadj AS (SELECT w.a, w.b, w.common FROM wedge w
         |           WHERE NOT EXISTS (SELECT 1 FROM e0
         |             WHERE e0.src = w.a AND e0.dst = w.b)),
         |top AS (SELECT * FROM (
         |    SELECT a, b, common, row_number() OVER (
         |      ORDER BY common DESC, a ASC, b ASC) AS rank FROM nonadj) t
         |  WHERE rank <= 20),
         |added AS (SELECT DISTINCT src AS a, dst AS b FROM e2
         |          WHERE src < dst AND NOT EXISTS (SELECT 1 FROM e0
         |            WHERE e0.src = e2.src AND e0.dst = e2.dst))
         |SELECT CAST(top.rank AS BIGINT) AS rank, top.a AS src,
         |  top.b AS dst, top.common,
         |  CAST(CASE WHEN added.a IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |    AS hit
         |FROM top LEFT JOIN added
         |  ON added.a = top.a AND added.b = top.b""".stripMargin,

    "g_degree_hist" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1)
         |SELECT degree, count(*) AS n_vertices FROM deg GROUP BY 1""".stripMargin,

    // same VALUES machinery as g_read_gt, but emitting the NAME column —
    // exactly what the communities sink writes per vertex
    "g_write_comm" ->
      """WITH gt(name, lab, ln) AS (VALUES
        |  ('a','x',1), ('b','y',2), ('a','z',3), ('c','x',4), ('d','y',5)),
        |fw AS (SELECT name, lab FROM (
        |         SELECT name, lab,
        |                row_number() OVER (PARTITION BY name ORDER BY ln) AS rn
        |         FROM gt) t WHERE rn = 1),
        |fx(sn, dn) AS (VALUES
        |  ('b','a'), ('a','c'), ('b','c'), ('b','c'), ('c','d')),
        |names AS (SELECT DISTINCT sn AS name FROM fx
        |          UNION SELECT DISTINCT dn FROM fx),
        |dict AS (SELECT name,
        |           CAST(row_number() OVER (ORDER BY name) - 1 AS BIGINT) AS id
        |         FROM names),
        |ldict AS (SELECT lab,
        |            CAST(row_number() OVER (ORDER BY lab) - 1 AS BIGINT) AS label
        |          FROM (SELECT DISTINCT lab FROM fw) u)
        |SELECT d.name, l.label
        |FROM fw JOIN dict d ON fw.name = d.name
        |JOIN ldict l ON fw.lab = l.lab""".stripMargin,

    "g_degree_reorder" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1)
         |SELECT v.id,
         |  CAST(row_number() OVER (ORDER BY coalesce(d.degree, 0), v.id) - 1
         |       AS BIGINT) AS new_id
         |FROM verts v LEFT JOIN deg d ON v.id = d.id""".stripMargin,

    // gamma-gap compressibility oracle: identical delta-gap + bin-length
    // arithmetic (DuckDB's bin() is zero-stripped like Spark's), reorder
    // mirrors GraphOps.degreeReorder's (degree, id) rank
    "g_gamma_bits" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
         |gnat AS (SELECT src AS id,
         |    CAST(sum(2 * (length(bin(gap)) - 1) + 1) AS BIGINT) AS gamma_bits
         |  FROM (SELECT src, coalesce(dst - lag(dst)
         |          OVER (PARTITION BY src ORDER BY dst), dst + 1) AS gap
         |        FROM e0) g GROUP BY 1),
         |ord AS (SELECT id,
         |    CAST(row_number() OVER (ORDER BY degree, id) - 1 AS BIGINT) AS nid
         |  FROM deg),
         |re AS (SELECT a.nid AS src, b.nid AS dst FROM e0
         |       JOIN ord a ON a.id = e0.src JOIN ord b ON b.id = e0.dst),
         |gre AS (SELECT src AS nid,
         |    CAST(sum(2 * (length(bin(gap)) - 1) + 1) AS BIGINT)
         |      AS gamma_bits_reord
         |  FROM (SELECT src, coalesce(dst - lag(dst)
         |          OVER (PARTITION BY src ORDER BY dst), dst + 1) AS gap
         |        FROM re) g GROUP BY 1)
         |SELECT deg.id, deg.degree, gnat.gamma_bits, gre.gamma_bits_reord
         |FROM deg JOIN gnat ON gnat.id = deg.id
         |JOIN ord ON ord.id = deg.id
         |JOIN gre ON gre.nid = ord.nid""".stripMargin,

    // 4-clique oracle: direct canonical 6-edge join with a<b<c<d —
    // order-free count, independent of the engine's degree orientation
    "g_cliques4" ->
      s"""WITH $cte,
         |c AS (SELECT src AS a, dst AS b FROM e0 WHERE src < dst),
         |tri AS (SELECT e1.a, e1.b, e2.b AS c3 FROM c e1
         |        JOIN c e2 ON e1.b = e2.a
         |        JOIN c e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT (SELECT count(*) FROM tri) AS n_triangles,
         |       (SELECT count(*) FROM tri t
         |        JOIN c x ON x.a = t.a
         |        JOIN c y ON y.a = t.b AND y.b = x.b
         |        JOIN c z ON z.a = t.c3 AND z.b = x.b) AS n_cliques4""".stripMargin,

    // densest-peel oracle: the same integer rule (deg·n ≤ slots) unrolled
    // four rounds over the shrinking symmetric slot table
    "g_densest" -> densestSql(4),

    // label-memory oracle: the shared unrolled LP steps, union of the
    // three per-step label tables, rounds-held counts
    "g_lp_memory_t3" ->
      s"""WITH $cte,
         |${lpStepsSql(3)}
         |SELECT id, label, count(*) AS n_rounds FROM (
         |  SELECT id, label FROM s1
         |  UNION ALL SELECT id, label FROM s2
         |  UNION ALL SELECT id, label FROM s3) u
         |GROUP BY 1, 2""".stripMargin,

    // matching oracle: identical md5 edge priorities and local-minima
    // selection, unrolled; MATERIALIZED per-round CTEs (repeated refs)
    "g_matching_t3" -> matchingSql(3, 7L),

    "g_assort_strength" ->
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |st AS (SELECT src AS id, CAST(sum(weight) AS BIGINT) AS s
         |       FROM ew GROUP BY 1),
         |j AS (SELECT a.s AS x, b.s AS y FROM ew
         |      JOIN st a ON ew.src = a.id JOIN st b ON ew.dst = b.id),
         |mo AS (SELECT count(*) AS m,
         |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |         CAST(sum(x * y) AS BIGINT) AS sxy,
         |         CAST(sum(x * x) AS BIGINT) AS sxx,
         |         CAST(sum(y * y) AS BIGINT) AS syy
         |       FROM j)
         |SELECT m, sx, sy, sxy, sxx, syy,
         |       CASE WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0
         |            THEN 0
         |            ELSE CAST(ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
         |                 * 1000000
         |                 / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
         |                   * CAST(m * syy - sy * sy AS DOUBLE)))
         |              AS BIGINT)
         |       END AS r_e6
         |FROM mo""".stripMargin,

    "g_coarsen_heavy_t2" -> {
      val steps = (1 to 2).map { r =>
        val mp = s"hm${r - 1}"
        s"""hvm$r AS MATERIALIZED (SELECT v, min(prio) AS pmin FROM (
           |    SELECT src AS v, prio FROM $mp
           |    UNION ALL SELECT dst, prio FROM $mp) i GROUP BY 1),
           |hsel$r AS MATERIALIZED (SELECT m.src, m.dst FROM $mp m
           |    JOIN hvm$r a ON a.v = m.src JOIN hvm$r b ON b.v = m.dst
           |    WHERE m.prio = a.pmin AND m.prio = b.pmin),
           |hmv$r AS MATERIALIZED (SELECT DISTINCT v FROM (
           |    SELECT src AS v FROM hsel$r
           |    UNION ALL SELECT dst FROM hsel$r) u),
           |hm$r AS MATERIALIZED (SELECT src, dst, weight, prio FROM $mp
           |    WHERE src NOT IN (SELECT v FROM hmv$r)
           |      AND dst NOT IN (SELECT v FROM hmv$r))""".stripMargin
      }.mkString(",\n")
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |hm0 AS MATERIALIZED (SELECT src, dst, weight,
         |    lpad(CAST(1000000000 - weight AS VARCHAR), 10, '0')
         |      || md5(CAST(src AS VARCHAR) || ':' ||
         |             CAST(dst AS VARCHAR) || ':' || '7') AS prio
         |  FROM (SELECT src, dst, max(weight) AS weight FROM ew
         |        WHERE src < dst GROUP BY 1, 2) c),
         |$steps,
         |mp AS (SELECT dst AS id, src AS rep FROM (
         |  SELECT src, dst FROM hsel1 UNION ALL SELECT src, dst FROM hsel2) a),
         |ce AS (SELECT coalesce(ms.rep, ew.src) AS src,
         |              coalesce(md.rep, ew.dst) AS dst, ew.weight
         |       FROM ew LEFT JOIN mp ms ON ms.id = ew.src
         |       LEFT JOIN mp md ON md.id = ew.dst)
         |SELECT src, dst, CAST(sum(weight) AS BIGINT) AS weight FROM ce
         |WHERE src <> dst GROUP BY 1, 2""".stripMargin
    },

    "g_conductance_weighted" ->
      s"""WITH $cte,
         |rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |tg AS (SELECT ew.src % 7 AS ls, ew.dst % 7 AS ld, ew.weight
         |       FROM ew),
         |pl AS (SELECT ls AS label,
         |         CAST(sum(CASE WHEN ls <> ld THEN weight ELSE 0 END)
         |           AS BIGINT) AS cut_w,
         |         CAST(sum(weight) AS BIGINT) AS vol_w
         |       FROM tg GROUP BY 1),
         |w2 AS (SELECT CAST(sum(weight) AS BIGINT) AS w2 FROM ew)
         |SELECT label, cut_w, vol_w,
         |       CASE WHEN LEAST(vol_w, w2 - vol_w) = 0 THEN 0
         |            ELSE CAST(ROUND(CAST(cut_w AS DOUBLE) * 1000000
         |                 / LEAST(vol_w, w2 - vol_w)) AS BIGINT)
         |       END AS conductance_e6
         |FROM pl, w2""".stripMargin,

    "g_directed_triads" ->
      s"""WITH de AS (
         |  SELECT DISTINCT l_orderkey % $NodeSpace AS src,
         |         l_partkey % $NodeSpace AS dst
         |  FROM lineitem WHERE l_linenumber = 1
         |    AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace),
         |outd AS (SELECT src AS v, count(*) AS od FROM de GROUP BY 1),
         |ind AS (SELECT dst AS v, count(*) AS id FROM de GROUP BY 1),
         |keep AS (SELECT coalesce(o.v, i.v) AS v
         |         FROM outd o FULL OUTER JOIN ind i ON o.v = i.v
         |         WHERE coalesce(o.od, 0) <= 10000
         |           AND coalesce(i.id, 0) <= 10000),
         |ek AS (SELECT src, dst FROM de
         |       WHERE src IN (SELECT v FROM keep)
         |         AND dst IN (SELECT v FROM keep)),
         |wed AS (SELECT a.src AS u, a.dst AS v, b.dst AS w
         |        FROM ek a JOIN ek b ON a.dst = b.src
         |        WHERE a.src <> b.dst),
         |cyc AS (SELECT CAST(count(*) // 3 AS BIGINT) AS n_cyclic
         |        FROM wed JOIN ek c ON c.src = wed.w AND c.dst = wed.u),
         |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_transitive
         |       FROM wed JOIN ek c ON c.src = wed.u AND c.dst = wed.w)
         |SELECT n_cyclic, n_transitive FROM cyc, tr""".stripMargin,

    "g_matching_heavy_t2" -> {
      val steps = (1 to 2).map { r =>
        val mp = s"hm${r - 1}"
        s"""hvm$r AS MATERIALIZED (SELECT v, min(prio) AS pmin FROM (
           |    SELECT src AS v, prio FROM $mp
           |    UNION ALL SELECT dst, prio FROM $mp) i GROUP BY 1),
           |hsel$r AS MATERIALIZED (SELECT m.src, m.dst, m.weight FROM $mp m
           |    JOIN hvm$r a ON a.v = m.src JOIN hvm$r b ON b.v = m.dst
           |    WHERE m.prio = a.pmin AND m.prio = b.pmin),
           |hmv$r AS MATERIALIZED (SELECT DISTINCT v FROM (
           |    SELECT src AS v FROM hsel$r
           |    UNION ALL SELECT dst FROM hsel$r) u),
           |hm$r AS MATERIALIZED (SELECT src, dst, weight, prio FROM $mp
           |    WHERE src NOT IN (SELECT v FROM hmv$r)
           |      AND dst NOT IN (SELECT v FROM hmv$r))""".stripMargin
      }.mkString(",\n")
      val out = (1 to 2).map(r =>
        s"SELECT src, dst, weight, CAST($r AS BIGINT) AS round FROM hsel$r")
        .mkString("\nUNION ALL\n")
      s"""WITH rawp AS (
         |  SELECT l_orderkey % $NodeSpace AS src, l_partkey % $NodeSpace AS dst,
         |         CAST(l_quantity AS BIGINT) % 5 + 1 AS w
         |  FROM lineitem WHERE l_linenumber = 1),
         |agg AS (SELECT src, dst, sum(w) AS w FROM rawp
         |        WHERE src <> dst GROUP BY 1, 2),
         |ew AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS weight FROM (
         |         SELECT src, dst, w FROM agg
         |         UNION ALL SELECT dst, src, w FROM agg) u
         |       GROUP BY 1, 2),
         |hm0 AS MATERIALIZED (SELECT src, dst, weight,
         |    lpad(CAST(1000000000 - weight AS VARCHAR), 10, '0')
         |      || md5(CAST(src AS VARCHAR) || ':' ||
         |             CAST(dst AS VARCHAR) || ':' || '7') AS prio
         |  FROM (SELECT src, dst, max(weight) AS weight FROM ew
         |        WHERE src < dst GROUP BY 1, 2) c),
         |$steps
         |$out""".stripMargin
    },

    "g_vertex_cover_t3" -> {
      val me = (1 to 3).map(r =>
        s"SELECT src AS id FROM sel$r UNION ALL SELECT dst FROM sel$r")
        .mkString(" UNION ALL ")
      s"""WITH $cte,
         |${matchingStepsSql(3, 7L)},
         |me AS ($me),
         |re AS (SELECT src AS id FROM m3 UNION ALL SELECT dst FROM m3),
         |u AS (SELECT id, 'matched' AS via FROM me
         |      UNION ALL SELECT id, 'residual' FROM re)
         |SELECT id, min(via) AS via FROM u GROUP BY 1""".stripMargin
    },

    // coarsening oracle: the same matching unroll, matched dst → src
    // mapping, weight = surviving slot multiplicity
    "g_coarsen_t3" -> coarsenSql(3, 7L),

    // 2-hop ball oracle: wedge join + explicit DISTINCT union
    "g_ball2" ->
      s"""WITH $cte,
         |h2 AS (SELECT a.src AS id, b.dst AS m
         |       FROM e0 a JOIN e0 b ON a.dst = b.src),
         |u AS (SELECT DISTINCT id, m FROM (
         |  SELECT id, id AS m FROM verts
         |  UNION ALL SELECT src, dst FROM e0
         |  UNION ALL SELECT id, m FROM h2) x)
         |SELECT id, count(*) AS ball2 FROM u GROUP BY 1""".stripMargin,

    // sparsification oracle: common-neighbor support per canonical edge
    // (0-support edges kept), both-direction nominations, same window
    "g_sparsify_top2" ->
      s"""WITH $cte,
         |c AS (SELECT src AS a, dst AS b FROM e0 WHERE src < dst),
         |sup0 AS (SELECT c.a, c.b, count(*) AS common FROM c
         |         JOIN e0 x ON x.src = c.a
         |         JOIN e0 y ON y.src = c.b AND y.dst = x.dst
         |         GROUP BY 1, 2),
         |sup AS (SELECT c.a, c.b,
         |          CAST(coalesce(s.common, 0) AS BIGINT) AS common
         |        FROM c LEFT JOIN sup0 s ON s.a = c.a AND s.b = c.b),
         |bo AS (SELECT a AS v, b AS u, common FROM sup
         |       UNION ALL SELECT b, a, common FROM sup),
         |rk AS (SELECT v, u, common, row_number() OVER (
         |         PARTITION BY v ORDER BY common DESC, u ASC) AS rn
         |       FROM bo)
         |SELECT DISTINCT least(v, u) AS src, greatest(v, u) AS dst, common
         |FROM rk WHERE rn <= 2""".stripMargin,

    // degree-moment oracle: identical exact sums + the one κ divide
    "g_degree_moments" ->
      s"""WITH $cte,
         |deg AS (SELECT src AS id, count(*) AS d FROM e0 GROUP BY 1)
         |SELECT count(*) AS n_vertices, CAST(sum(d) AS BIGINT) AS n_slots,
         |       CAST(sum(d * d) AS BIGINT) AS sum_d2,
         |       CAST(sum(d * d * d) AS BIGINT) AS sum_d3,
         |       CAST(ROUND(CAST(sum(d * d) AS DOUBLE) * 1000000
         |            / CAST(sum(d) AS BIGINT)) AS BIGINT) AS kappa_e6
         |FROM deg""".stripMargin,

    // PageRank-shift oracle: two snapshot chains side by side, integer-
    // scaled ranks, full outer join, exact TakeOrdered ranking
    "g_pr_shift_top10" -> prShiftSql(3),

    // warm-start oracle: the line-1 chain (3 steps, prChainSql) feeds w0
    // over the line≤2 snapshot (uniform for new vertices), 2 warm steps
    "g_pr_warm_t2" -> {
      val warmSteps = (1 to 2).map { k =>
        s"""wx$k AS (
           |  SELECT ne0.dst AS id, sum(q.r / d.od) AS s
           |  FROM ne0 JOIN w${k - 1} q ON ne0.src = q.id
           |  JOIN ndeg d ON ne0.src = d.id
           |  GROUP BY 1
           |), w$k AS (
           |  SELECT v.id, (1.0 - 0.85) / (SELECT count(*) FROM nverts)
           |         + 0.85 * coalesce(x.s, 0) AS r
           |  FROM nverts v LEFT JOIN wx$k x ON v.id = x.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH oe0 AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT l_orderkey % $NodeSpace AS src,
         |           l_partkey % $NodeSpace AS dst
         |    FROM lineitem WHERE l_linenumber = 1
         |      AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace
         |    UNION ALL
         |    SELECT l_partkey % $NodeSpace, l_orderkey % $NodeSpace
         |    FROM lineitem WHERE l_linenumber = 1
         |      AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace) u),
         |${prChainSql("og", "oe0", 3)},
         |ne0 AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT l_orderkey % $NodeSpace AS src,
         |           l_partkey % $NodeSpace AS dst
         |    FROM lineitem WHERE l_linenumber <= 2
         |      AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace
         |    UNION ALL
         |    SELECT l_partkey % $NodeSpace, l_orderkey % $NodeSpace
         |    FROM lineitem WHERE l_linenumber <= 2
         |      AND l_orderkey % $NodeSpace <> l_partkey % $NodeSpace) u),
         |nverts AS (SELECT DISTINCT src AS id FROM ne0),
         |ndeg AS (SELECT src AS id, count(*) AS od FROM ne0 GROUP BY 1),
         |w0 AS (SELECT v.id,
         |         coalesce(o.r, 1.0 / (SELECT count(*) FROM nverts)) AS r
         |       FROM nverts v LEFT JOIN ogr3 o ON o.id = v.id),
         |$warmSteps
         |SELECT id, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_e6
         |FROM w2""".stripMargin
    },

    // assortativity oracle: identical integer mixing sums + one divide
    "g_label_assort" ->
      s"""WITH $cte,
         |lab AS (SELECT src % 7 AS la, dst % 7 AS lb FROM e0),
         |tt AS (SELECT count(*) AS t,
         |         CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
         |           AS intra
         |       FROM lab),
         |aa AS (SELECT CAST(sum(a * a) AS BIGINT) AS s FROM (
         |         SELECT count(*) AS a FROM lab GROUP BY la) x)
         |SELECT t AS n_slots, intra AS intra_slots, s AS sum_a2,
         |  CASE WHEN t * t - s = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE CAST(ROUND(CAST(t * intra - s AS DOUBLE) * 1000000
         |              / CAST(t * t - s AS DOUBLE)) AS BIGINT)
         |  END AS r_e6
         |FROM tt, aa""".stripMargin,

    // percolation oracle: the same md5 edge draw per level, recursive
    // closure per surviving subgraph
    "g_percolation" -> percolationSql(Seq(300, 600, 900), 11L),

    // targeted-attack oracle: hub top-k per level + closure per level
    "g_attack_curve" -> attackSql(Seq(0, 5, 10)),

    // bipartite oracle: CC closure for roots, recursive BFS layers,
    // same-parity edge count per component
    "g_bipartite" ->
      s"""WITH RECURSIVE $sparseCte,
         |reachc(id, lab) AS (
         |  SELECT id, id FROM sverts
         |  UNION
         |  SELECT se0.dst, reachc.lab FROM reachc
         |  JOIN se0 ON se0.src = reachc.id),
         |cclab AS (SELECT id, min(lab) AS label FROM reachc GROUP BY id),
         |srcs AS (SELECT DISTINCT label AS id FROM cclab),
         |reachb(source, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.source, se0.dst, r.dist + 1 FROM reachb r
         |  JOIN se0 ON se0.src = r.id
         |  WHERE r.dist < ${graft.algo.Betweenness.DepthCap}),
         |lvb AS (SELECT source, id, min(dist) AS dist FROM reachb
         |        GROUP BY 1, 2),
         |own AS (SELECT c.label AS component, c.id, lvb.dist % 2 AS p
         |        FROM cclab c JOIN lvb ON lvb.source = c.label
         |                             AND lvb.id = c.id),
         |odd AS (SELECT a.component, count(*) // 2 AS n_odd
         |        FROM se0 JOIN own a ON a.id = se0.src
         |        JOIN own b ON b.id = se0.dst AND b.component = a.component
         |        WHERE a.p = b.p GROUP BY 1),
         |lay AS (SELECT component, count(*) AS n_layered FROM own
         |        GROUP BY 1),
         |sz AS (SELECT label AS component, count(*) AS n_vertices
         |       FROM cclab GROUP BY 1)
         |SELECT sz.component, sz.n_vertices,
         |       CAST(coalesce(lay.n_layered, 0) AS BIGINT) AS n_layered,
         |       CAST(coalesce(odd.n_odd, 0) AS BIGINT) AS n_odd_edges,
         |       CAST(CASE WHEN coalesce(odd.n_odd, 0) = 0 THEN 1 ELSE 0 END
         |            AS BIGINT) AS bipartite
         |FROM sz LEFT JOIN lay ON lay.component = sz.component
         |        LEFT JOIN odd ON odd.component = sz.component""".stripMargin)

  /** Per-level percolation + CC closure mirroring the engine's
    * md5Uniform(least:greatest:seed) draw.
    */
  private def percolationSql(levels: Seq[Int], seed: Long): String = {
    val blocks = levels.map { p =>
      s"""k$p AS (SELECT src, dst FROM e0 WHERE
         |  ('0x' || substr(md5(CAST(least(src, dst) AS VARCHAR) || ':' ||
         |     CAST(greatest(src, dst) AS VARCHAR) || ':' || '$seed'),
         |     1, 15))::BIGINT % 1000 < $p),
         |v$p AS (SELECT DISTINCT src AS id FROM k$p),
         |reach$p(id, lab) AS (
         |  SELECT id, id FROM v$p
         |  UNION
         |  SELECT k$p.dst, reach$p.lab FROM reach$p
         |  JOIN k$p ON k$p.src = reach$p.id),
         |cc$p AS (SELECT id, min(lab) AS label FROM reach$p GROUP BY id),
         |sz$p AS (SELECT label, count(*) AS sz FROM cc$p GROUP BY 1),
         |out$p AS (SELECT CAST($p AS BIGINT) AS permille,
         |            CAST(sum(sz) AS BIGINT) AS n_vertices,
         |            count(*) AS n_components,
         |            CAST(max(sz) AS BIGINT) AS giant_size
         |          FROM sz$p)""".stripMargin
    }.mkString(",\n")
    val out = levels.map(p => s"SELECT * FROM out$p").mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE $cte,
       |$blocks
       |$out""".stripMargin
  }

  /** Best-match-F1 oracle tail: expects a CTE `fj(p, g, i)` of joint
    * label counts; emits the [[graft.measures.Measures.communityF1]]
    * output row (e9-rounded bests, size-unweighted direction averages).
    */
  private def f1TailSql: String =
    """fsp AS (SELECT p, sum(i) AS np FROM fj GROUP BY 1),
      |fst AS (SELECT g, sum(i) AS ng FROM fj GROUP BY 1),
      |f1 AS (SELECT fj.p, fj.g,
      |         CAST(ROUND(fj.i * 2000000000.0 / (np + ng)) AS BIGINT)
      |           AS f1_e9
      |       FROM fj JOIN fsp ON fj.p = fsp.p JOIN fst ON fj.g = fst.g),
      |bp AS (SELECT count(*) AS n_pred, sum(f1_e9) AS sp FROM (
      |    SELECT p, f1_e9, row_number() OVER (PARTITION BY p
      |      ORDER BY f1_e9 DESC, g ASC) AS rn FROM f1) t WHERE rn = 1),
      |bt AS (SELECT count(*) AS n_true, sum(f1_e9) AS st FROM (
      |    SELECT g, f1_e9, row_number() OVER (PARTITION BY g
      |      ORDER BY f1_e9 DESC, p ASC) AS rn FROM f1) t WHERE rn = 1)
      |SELECT CAST(n_pred AS BIGINT) AS n_pred,
      |  CAST(n_true AS BIGINT) AS n_true,
      |  CAST(ROUND(sp / n_pred / 1000.0) AS BIGINT) AS pred_f1_e6,
      |  CAST(ROUND(st / n_true / 1000.0) AS BIGINT) AS true_f1_e6,
      |  CAST(ROUND((sp / n_pred + st / n_true) / 2000.0) AS BIGINT)
      |    AS f1_e6
      |FROM bp, bt""".stripMargin

  /** Targeted-attack oracle: per k, drop the top-k (degree desc, id asc)
    * hubs from the symmetric slot table and close the survivors.
    * Mirrors the g_hub_removal hub selection; k = 0 keeps everything
    * (NOT IN over an empty hub set is vacuously true).
    */
  private def attackSql(ks: Seq[Int]): String = {
    val blocks = ks.map { k =>
      s"""h$k AS (SELECT id FROM (
         |  SELECT id, row_number() OVER (ORDER BY degree DESC, id ASC) AS rn
         |  FROM adeg) t WHERE rn <= $k),
         |r$k AS (SELECT src, dst FROM e0
         |        WHERE src NOT IN (SELECT id FROM h$k)
         |          AND dst NOT IN (SELECT id FROM h$k)),
         |rv$k AS (SELECT DISTINCT src AS id FROM r$k),
         |are$k(id, lab) AS (
         |  SELECT id, id FROM rv$k
         |  UNION
         |  SELECT r$k.dst, are$k.lab FROM are$k JOIN r$k ON r$k.src = are$k.id),
         |acc$k AS (SELECT id, min(lab) AS label FROM are$k GROUP BY id),
         |asz$k AS (SELECT label, count(*) AS sz FROM acc$k GROUP BY 1),
         |aout$k AS (SELECT CAST($k AS BIGINT) AS k_removed,
         |             CAST(sum(sz) AS BIGINT) AS n_vertices,
         |             count(*) AS n_components,
         |             CAST(max(sz) AS BIGINT) AS giant_size
         |           FROM asz$k)""".stripMargin
    }.mkString(",\n")
    val out = ks.map(k => s"SELECT * FROM aout$k").mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE $cte,
       |adeg AS (SELECT src AS id, count(*) AS degree FROM e0 GROUP BY 1),
       |$blocks
       |$out""".stripMargin
  }

  /** Shared matching unroll prefix (m0 + per-round CTEs) mirroring
    * [[graft.algo.Matching.greedyRounds]].
    */
  private def matchingStepsSql(rounds: Int, seed: Long): String = {
    val steps = (1 to rounds).map { r =>
      val mp = s"m${r - 1}"
      s"""vm$r AS MATERIALIZED (SELECT v, min(prio) AS pmin FROM (
         |    SELECT src AS v, prio FROM $mp
         |    UNION ALL SELECT dst, prio FROM $mp) i GROUP BY 1),
         |sel$r AS MATERIALIZED (SELECT m.src, m.dst FROM $mp m
         |    JOIN vm$r a ON a.v = m.src JOIN vm$r b ON b.v = m.dst
         |    WHERE m.prio = a.pmin AND m.prio = b.pmin),
         |mv$r AS MATERIALIZED (SELECT DISTINCT v FROM (
         |    SELECT src AS v FROM sel$r
         |    UNION ALL SELECT dst FROM sel$r) u),
         |m$r AS MATERIALIZED (SELECT src, dst, prio FROM $mp
         |    WHERE src NOT IN (SELECT v FROM mv$r)
         |      AND dst NOT IN (SELECT v FROM mv$r))""".stripMargin
    }.mkString(",\n")
    // no continuation line may START with "||": this block is embedded
    // into outer .stripMargin templates, which would eat the first bar
    s"""m0 AS MATERIALIZED (SELECT src, dst,
       |    md5(CAST(src AS VARCHAR) || ':' ||
       |        CAST(dst AS VARCHAR) || ':' || '$seed') AS prio
       |  FROM e0 WHERE src < dst),
       |$steps""".stripMargin
  }

  /** Chained-CTE unroll of [[graft.algo.Matching.greedyRounds]]. */
  private def matchingSql(rounds: Int, seed: Long): String = {
    val out = (1 to rounds)
      .map(r => s"SELECT src, dst, CAST($r AS BIGINT) AS round FROM sel$r")
      .mkString("\nUNION ALL\n")
    s"""WITH $cte,
       |${matchingStepsSql(rounds, seed)}
       |$out""".stripMargin
  }

  /** [[graft.algo.Matching.contract]] over the unrolled matching. */
  private def coarsenSql(rounds: Int, seed: Long): String = {
    val allSel = (1 to rounds)
      .map(r => s"SELECT src, dst FROM sel$r").mkString(" UNION ALL ")
    s"""WITH $cte,
       |${matchingStepsSql(rounds, seed)},
       |mp AS (SELECT dst AS id, src AS rep FROM ($allSel) a),
       |ce AS (SELECT coalesce(ms.rep, e0.src) AS src,
       |              coalesce(md.rep, e0.dst) AS dst
       |       FROM e0 LEFT JOIN mp ms ON ms.id = e0.src
       |       LEFT JOIN mp md ON md.id = e0.dst)
       |SELECT src, dst, count(*) AS weight FROM ce
       |WHERE src <> dst GROUP BY 1, 2""".stripMargin
  }

  /** Chained-CTE unroll of [[graft.algo.Dense.peelRounds]]: round r
    * removes ids with deg·n ≤ slots over the surviving slot table. Every
    * per-round CTE is referenced several times downstream, so each is
    * MATERIALIZED — DuckDB inlines plain CTEs per reference, and the
    * chained rounds would re-evaluate exponentially otherwise (the SQL
    * edition of the engine's own eager-truncation rule).
    */
  private def densestSql(rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      val (ap, sp) = (s"a${r - 1}", s"s${r - 1}")
      s"""n$r AS MATERIALIZED (SELECT count(*) AS n FROM $ap),
         |t$r AS MATERIALIZED (SELECT count(*) AS t FROM $sp),
         |d$r AS MATERIALIZED (SELECT a.id, count(s.dst) AS d FROM $ap a
         |        LEFT JOIN $sp s ON s.src = a.id GROUP BY 1),
         |r$r AS MATERIALIZED (SELECT d$r.id FROM d$r, n$r, t$r
         |        WHERE d * n <= t),
         |a$r AS MATERIALIZED (SELECT id FROM $ap
         |        WHERE id NOT IN (SELECT id FROM r$r)),
         |s$r AS MATERIALIZED (SELECT s.src, s.dst FROM $sp s
         |        WHERE s.src IN (SELECT id FROM a$r)
         |          AND s.dst IN (SELECT id FROM a$r))""".stripMargin
    }.mkString(",\n")
    val out = (1 to rounds)
      .map(r => s"SELECT id, CAST($r AS BIGINT) AS peel_round FROM r$r")
      .mkString("\nUNION ALL\n")
    s"""WITH $cte,
       |a0 AS MATERIALIZED (SELECT id FROM verts),
       |s0 AS MATERIALIZED (SELECT src, dst FROM e0),
       |$steps
       |$out
       |UNION ALL
       |SELECT id, CAST(${rounds + 1} AS BIGINT) AS peel_round FROM a$rounds""".stripMargin
  }
}
