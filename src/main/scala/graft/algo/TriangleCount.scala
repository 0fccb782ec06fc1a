package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphOps

/** Triangle counting (north_rule algorithm; SURVEY.md §2.8).
  *
  * Plan: orient each undirected edge from its lower-(degree, id) endpoint
  * to its higher one, enumerate wedges by self-joining the oriented edge
  * table on its middle vertex, and close them with a third join. The
  * degree orientation bounds every vertex's oriented out-degree by
  * O(sqrt(E)) on any graph, which caps the wedge blow-up on power-law
  * graphs — the textbook (Schank–Wagner / "compact-forward") trick and the
  * difference between "works on 60k rows" and "works on 100 TB". All three
  * joins are plain equi-joins, so Catalyst plans shuffle hash/SMJ with
  * partial aggregation and AQE skew splitting.
  */
object TriangleCount {

  /** Degree-ordered orientation of the canonical edge set. The two
    * degree-attach joins build a shuffled hash on the (vertex-sized)
    * degree table — stats-less aggregation outputs otherwise plan as
    * sort-merge and sort the full canonical edge set twice (guide §3.1;
    * plan-verified on the r6 bench graph).
    */
  def oriented(edges: DataFrame): DataFrame = {
    val canon = GraphOps.canonical(edges) // src<dst, one row per pair
    val deg = canon
      .select(col("src").as("id")).union(canon.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg")
        .hint("shuffle_hash"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg")
        .hint("shuffle_hash"), "dst")
    withDeg.select(
      when(struct(col("sdeg").as("d"), col("src").as("i")) <
             struct(col("ddeg").as("d"), col("dst").as("i")),
        struct(col("src").as("u"), col("dst").as("v")))
        .otherwise(struct(col("dst").as("u"), col("src").as("v")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
  }

  /** Global triangle count. */
  def countTriangles(edges: DataFrame): Long =
    triangles(edges).count()

  /** One row (a, b, c) per triangle, in oriented order. The wedge and
    * closure joins hash-build on the oriented edge table: its per-partition
    * slice is E/P rows of 16 bytes (partition counts scale with E), and the
    * orientation caps the wedge fan-out, so the build side is always the
    * bounded one — sort-merge would instead sort the wedge stream, whose
    * row count is Σ in·out over middles.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val o = oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val e1 = o.select(col("u").as("a"), col("v").as("b"))
    val e2 = o.select(col("u").as("b2"), col("v").as("c"))
    val e3 = o.select(col("u").as("a3"), col("v").as("c3"))
    e1.join(e2.hint("shuffle_hash"), col("b") === col("b2"))
      .join(e3.hint("shuffle_hash"),
        col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
  }

  /** 4-clique census by extending each oriented triangle one step down
    * the same degree-ordered DAG: a 4-clique {a,b,c,d} in orientation
    * order has all six edges oriented low→high, so joining the triangle
    * table to the oriented edges on (a,d), (b,d), (c,d) counts every
    * 4-clique exactly once. Both extension joins are equi-joins on
    * composite keys, and the oriented out-degree stays O(√E)-capped, so
    * the blow-up bound of the triangle pass carries over one level — the
    * standard kClist/ordering argument. Returns one row
    * (n_triangles, n_cliques4).
    */
  def cliqueCensus4(edges: DataFrame): DataFrame = {
    val o = oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val e1 = o.select(col("u").as("a"), col("v").as("b"))
    val e2 = o.select(col("u").as("b2"), col("v").as("c"))
    val e3 = o.select(col("u").as("a3"), col("v").as("c3"))
    val tri = e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val oa = o.select(col("u").as("a"), col("v").as("d"))
    val ob = o.select(col("u").as("b"), col("v").as("d"))
    val oc = o.select(col("u").as("c"), col("v").as("d"))
    val c4 = tri.join(oa, Seq("a"))
      .join(ob, Seq("b", "d"))
      .join(oc, Seq("c", "d"))
      .count()
    val t3 = tri.count()
    tri.unpersist(blocking = false)
    o.unpersist(blocking = false)
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((t3, c4)).toDF("n_triangles", "n_cliques4")
  }

  /** Per-vertex triangle participation counts (vertices in no triangle are
    * absent; join with the vertex table and fill 0 if totals are needed).
    */
  def perVertex(edges: DataFrame): DataFrame = {
    val t = triangles(edges)
    t.select(col("a").as("id"))
      .union(t.select(col("b").as("id")))
      .union(t.select(col("c").as("id")))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }

  /** Per-vertex 3-node graphlet orbit counts (the Pržulj graphlet-degree
    * vector restricted to graphlets G₁/G₂ — the 4 orbits every larger
    * GDV builds on): for each vertex v with degree k and triangle count
    * t = tri(v),
    *
    *   wedge_end(v)    = Σ_{u ∈ N(v)} (deg(u) − 1) − 2·t   (orbit 1)
    *   wedge_center(v) = C(k, 2) − t                        (orbit 2)
    *   triangles(v)    = t                                  (orbit 3)
    *
    * — every 2-path through a neighbor either closes into a triangle
    * (each triangle at v closes exactly two of them) or leaves v at a
    * wedge end; every neighbor pair is either a closed triangle or an
    * open wedge centered at v. So the full orbit vector needs NO new
    * enumeration beyond the triangle census: one degree join + one
    * gather aggregation on top of [[perVertex]] — identical scale shape
    * to the LP superstep. Role-similarity / graphlet-kernel features at
    * link-graph scale. Returns (id, degree, wedge_end, wedge_center,
    * triangles), one row per vertex (zero-orbit vertices included).
    *
    * Input must be symmetrized and self-loop-free.
    */
  def orbitCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
    val nbrExcess = e
      .join(deg.select(col("id").as("did"), col("degree").as("d")),
        col("dst") === col("did"))
      .groupBy(col("src").as("id"))
      .agg(sum(col("d") - 1).cast("long").as("nx"))
    val tri = perVertex(e)
    deg.join(nbrExcess, Seq("id"))
      .join(tri.select(col("id"), col("triangles").as("t")), Seq("id"), "left")
      .select(col("id"), col("degree"),
        (col("nx") - lit(2L) * coalesce(col("t"), lit(0L))).as("wedge_end"),
        (expr("degree * (degree - 1) div 2") -
          coalesce(col("t"), lit(0L))).as("wedge_center"),
        coalesce(col("t"), lit(0L)).as("triangles"))
  }

  /** Structural-balance triad census over a signed graph (Cartwright–
    * Harary): count triangles by their negative-edge count. Balanced
    * triangles (0 or 2 negative edges — "the friend of my friend" /
    * "the enemy of my enemy") vs unbalanced (1 or 3) is the classic
    * trust/distrust diagnostic; on a web link graph signs come from an
    * upstream classifier (endorsement vs spam-report links).
    *
    * Input: a SYMMETRIZED edge table with a `sign` column that is a
    * function of the unordered pair (sign(u,v) == sign(v,u) — the
    * caller's contract, trivially true for any hash-of-canonical-pair
    * derivation). The census enumerates each triangle once on the
    * degree-oriented DAG exactly like [[triangles]], carrying the three
    * signs through the two equi-joins — same O(√E) wedge cap, plus a
    * 4-row output aggregation. Returns (n_neg, n_triangles) for
    * n_neg ∈ {0,1,2,3} (present rows only).
    */
  def signedTriads(signedEdges: DataFrame): DataFrame = {
    val canonSign = signedEdges
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"), col("sign"))
    val o = oriented(signedEdges.select(col("src"), col("dst")))
      .join(canonSign,
        least(col("u"), col("v")) === col("src") &&
          greatest(col("u"), col("v")) === col("dst"))
      .select(col("u"), col("v"), col("sign"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e1 = o.select(col("u").as("a"), col("v").as("b"), col("sign").as("s1"))
    val e2 = o.select(col("u").as("b2"), col("v").as("c"), col("sign").as("s2"))
    val e3 = o.select(col("u").as("a3"), col("v").as("c3"), col("sign").as("s3"))
    e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select((when(col("s1") < 0, 1).otherwise(0) +
        when(col("s2") < 0, 1).otherwise(0) +
        when(col("s3") < 0, 1).otherwise(0)).cast("long").as("n_neg"))
      .groupBy("n_neg").agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-vertex egonet density (the OddBall link-farm signal): for the
    * egonet of v — v plus its neighbors — the edge count is
    *
    *   ego_edges(v) = deg(v) + tri(v)
    *
    * (the deg(v) star edges plus one edge per triangle through v, which
    * is exactly the neighbor-neighbor edge count), so no egonet is ever
    * materialized: the whole operator is the [[perVertex]] census plus a
    * degree aggregation and one vertex-sized join. density_e6 =
    * ⌊ego_edges / C(deg+1, 2) · 10⁶⌉ — near-clique egonets (density → 1
    * at high degree) are the OddBall paper's link-farm / spam-cluster
    * signature, near-star egonets (density → 2/deg) its telemarketer
    * shape. Integer inputs, one multiply + one divide, both
    * IEEE-replayable.
    *
    * Input must be symmetrized and self-loop-free (the [[perVertex]]
    * contract); every vertex appears (deg ≥ 1 by membership).
    */
  def egonetDensity(edges: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(edges)
    val tri = perVertex(edges)
    deg.join(tri, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .select(col("id"), col("degree"), col("triangles"),
        (col("degree") + col("triangles")).as("ego_edges"))
      .withColumn("density_e6",
        round(col("ego_edges") * lit(2000000.0) /
          ((col("degree") + 1) * col("degree"))).cast("long"))
  }

  /** Local clustering coefficient per vertex (Watts–Strogatz):
    *
    *   lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),  0 when deg(v) < 2
    *
    * over the canonical (deduplicated, undirected) adjacency — the wedge
    * closure rate that separates organically-linked pages from link farms.
    * Cost: [[perVertex]] plus one degree aggregation and a broadcast-able
    * join; every vertex appears in the output.
    */
  /** Global motif census over the symmetrized edge slots: wedges
    * (length-2 paths), triangles, squares (4-cycles), and global
    * transitivity 3·triangles/wedges — the link-farm / bipartite-core
    * diagnostics of the web-graph literature (squares dominate on link
    * exchanges; transitivity separates organic clustering from random
    * graphs of equal density).
    *
    * Exact integer counts: wedges = Σ_v C(deg v, 2);
    * squares = ½ Σ_{u<w} C(codeg(u,w), 2) — every 4-cycle is counted by
    * exactly its two diagonal pairs, and the sum is therefore always even.
    *
    * Scale shape: wedges is degree-table arithmetic; triangles reuse the
    * degree-oriented join. The square count enumerates wedges through
    * their CENTER (cost Σ_v C(deg v, 2) rows before the partial-aggregated
    * codeg groupBy) — the degree-orientation cap does not apply, because
    * codeg needs every common-neighbor pair once per common neighbor. On
    * a hub-heavy raw web graph run the census after host contraction or
    * hot-vertex removal; all three aggregates are single-row map-side
    * combines.
    */
  /** Weighted triangle census — the cohesion strength the unweighted
    * count can't see on a link graph whose edges carry link
    * multiplicities: per triangle the MIN edge weight (the bottleneck,
    * the standard weighted-clustering numerator) and the weight total,
    * both exact longs.
    *
    * Scale shape: the same degree-(id-tie) orientation as [[oriented]]
    * with the weight column carried through, so the wedge blow-up stays
    * capped at O(√E) out-degree per vertex; one final scalar agg.
    *
    * @param wEdges symmetrized weighted slots (src, dst, weight) with
    *               weight(u,v) == weight(v,u)
    * @return one row (n_triangles, sum_min_w, sum_w)
    */
  def weightedTriangles(wEdges: DataFrame): DataFrame = {
    val canon = wEdges.filter(col("src") < col("dst"))
      .select(col("src"), col("dst"), col("weight"))
    val deg = canon.select(col("src").as("id"))
      .union(canon.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val o = canon
      .join(deg.withColumnRenamed("id", "src")
        .withColumnRenamed("deg", "sdeg"), "src")
      .join(deg.withColumnRenamed("id", "dst")
        .withColumnRenamed("deg", "ddeg"), "dst")
      .select(
        when(struct(col("sdeg").as("d"), col("src").as("i")) <
               struct(col("ddeg").as("d"), col("dst").as("i")),
          struct(col("src").as("u"), col("dst").as("v")))
          .otherwise(struct(col("dst").as("u"), col("src").as("v"))).as("e"),
        col("weight"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("weight"))
    val e1 = o.select(col("u").as("a"), col("v").as("b"), col("weight").as("w1"))
    val e2 = o.select(col("u").as("b2"), col("v").as("c"), col("weight").as("w2"))
    val e3 = o.select(col("u").as("a3"), col("v").as("c3"), col("weight").as("w3"))
    e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"),
        coalesce(sum(least(col("w1"), col("w2"), col("w3"))), lit(0L))
          .as("sum_min_w"),
        coalesce(sum(col("w1") + col("w2") + col("w3")), lit(0L)).as("sum_w"))
  }

  /** Degree-conditioned clustering curve C(k) (Ravasz–Barabási): mean
    * local clustering coefficient per degree value — C(k) ∝ 1/k is the
    * signature of hierarchical modularity (tight small modules under
    * sparse hubs, the organic-web shape); a flat C(k) says the hubs are
    * as clustered as the leaves, which on a link graph usually means
    * templated/mirrored link blocks. Degree < 2 vertices are excluded
    * (LCC undefined).
    *
    * Per-vertex LCC is rounded to an e6 INTEGER before the per-degree
    * mean (order-free; one final divide) — the ratios replay exactly
    * cross-engine from the integer triangle census. Cost: one
    * [[perVertex]] census + a degree-keyed hash agg (output ≤ max
    * degree rows).
    *
    * @return (degree, n, mean_lcc_e6)
    */
  def clusteringByDegree(edges: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(edges)
    val per = deg.join(perVertex(edges), Seq("id"), "left")
      .filter(col("degree") >= 2)
      .select(col("degree"),
        round(coalesce(col("triangles"), lit(0L)) * lit(2000000.0)
          / (col("degree") * (col("degree") - 1))).cast("long").as("lcc_e6"))
    per.groupBy("degree")
      .agg(count(lit(1)).as("n"), sum(col("lcc_e6")).as("s"))
      .select(col("degree"), col("n"),
        round(col("s") / col("n")).cast("long").as("mean_lcc_e6"))
  }

  def motifCensus(edges: DataFrame): DataFrame = {
    // coalesce: sums over an empty degree/pair table are NULL, and the
    // census contract is zeros (the transitivity guard needs wedges = 0,
    // not NULL, and CLI consumers read the longs directly)
    val wedges = GraphOps.degrees(edges)
      .agg(coalesce(sum(expr("degree * (degree - 1) div 2")), lit(0L))
        .cast("long").as("wedges"))
    val tris = triangles(edges).agg(count(lit(1)).as("triangles"))
    val a = edges.select(col("src").as("u"), col("dst").as("v"))
    val b = edges.select(col("src").as("w"), col("dst").as("v2"))
    val squares = a.join(b, col("v") === col("v2") && col("u") < col("w"))
      .groupBy("u", "w").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L))
        .cast("long").as("sq2"))
      .select(expr("sq2 div 2").cast("long").as("squares"))
    wedges.crossJoin(tris).crossJoin(squares)
      .select(col("wedges"), col("triangles"), col("squares"),
        when(col("wedges") === 0, lit(0.0))
          .otherwise(lit(3.0) * col("triangles") / col("wedges"))
          .as("transitivity"))
  }

  /** Doulion-style approximate global triangle count by deterministic
    * edge sparsification (Tsourakakis et al., KDD'09).
    *
    * Each canonical edge survives iff a 60-bit md5 hash of
    * "src:dst:seed" lands below `permille`/1000 — a stateless,
    * rerun-stable coin flip that any ANSI engine replays bit-for-bit.
    * Triangles are then counted EXACTLY on the sparsified graph and
    * scaled by (1000/permille)^3 (each triangle survives with
    * probability p^3). `permille` must divide 1000 so the estimate is an
    * exact integer product, free of cross-engine float noise.
    *
    * The scale story: exact triangle counting's wedge join costs
    * O(E^1.5) in the worst case; sparsifying at p first cuts that by
    * ~1/p^2..1/p^3 while the estimator stays unbiased — at 100 TB this
    * is the difference between a feasible census and an infeasible one,
    * and the hash-based coin means no RNG state is shipped to executors.
    */
  def approxTriangles(edges: DataFrame, permille: Int, seed: Long): DataFrame = {
    require(permille >= 1 && permille <= 1000 && 1000 % permille == 0,
      s"permille must divide 1000, got $permille")
    val factor = 1000L / permille
    val kept = GraphOps.canonical(edges).filter(
      conv(substring(md5(concat_ws(":",
        col("src"), col("dst"), lit(seed))), 1, 15), 16, 10)
        .cast("long") % 1000L < permille)
    val nKept = kept.agg(count(lit(1)).as("sampled_edges"))
    val tris = triangles(kept).agg(count(lit(1)).as("sampled_triangles"))
    nKept.crossJoin(tris) // two 1-row aggregates — constant-size join
      .select(col("sampled_edges"), col("sampled_triangles"),
        (col("sampled_triangles") * lit(factor * factor * factor))
          .as("est_triangles"))
  }

  /** Incremental triangle count over a crawl delta: the number of
    * triangles in `unionEdges` that do NOT exist in `oldEdges`, computed
    * WITHOUT a census of the union graph — the companion to warm-start
    * CC/PageRank for the only-edges-added re-crawl.
    *
    * Every new triangle contains ≥1 delta edge, so it is found by
    * scanning the delta: for each delta pair (u,v) (canonical), each
    * common neighbor w in the union closes a triangle. A triangle with
    * k ∈ {1,2,3} new edges is found once per its delta edges, so each
    * (delta-edge, w) hit is weighted 1/k with
    * k = 1 + isNew(u,w) + isNew(v,w); summing in SIXTHS (6/k ∈ {6,3,2})
    * keeps the arithmetic integer-exact — no float enters the count.
    *
    * Scale shape: two equi-joins keyed on the delta's endpoints — the
    * candidate row count is Σ_{(u,v)∈Δ} deg_U(u), i.e. proportional to
    * the DELTA size × average degree, never the union's O(E^1.5) wedge
    * census. The flagged canonical table is built once (one anti-ish
    * left join) and persisted for its two probe sides. A hub endpoint
    * inside Δ contributes its full degree (common neighbors cannot be
    * orientation-pruned); at web scale cap or defer hub deltas the same
    * way CoCitation caps citers.
    *
    * Returns one row (delta_edges, new_triangles).
    */
  def deltaTriangles(unionEdges: DataFrame, oldEdges: DataFrame): DataFrame = {
    val cu = GraphOps.canonical(unionEdges)
    val co = GraphOps.canonical(oldEdges).withColumn("old", lit(1))
    val flagged = cu.join(co, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        when(col("old").isNull, lit(1)).otherwise(lit(0)).as("f"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val adj = flagged.select(col("src").as("x"), col("dst").as("w"), col("f"))
      .union(flagged.select(col("dst").as("x"), col("src").as("w"), col("f")))
    val delta = flagged.filter(col("f") === 1)
      .select(col("src").as("u"), col("dst").as("v"))
    val cand = delta
      .join(adj.select(col("x").as("u"), col("w"), col("f").as("f1")), Seq("u"))
      .join(adj.select(col("x").as("v"), col("w"), col("f").as("f2")),
        Seq("v", "w"))
    val sixths = cand
      .agg(coalesce(sum(expr("6 div (1 + f1 + f2)")), lit(0L))
        .cast("long").as("w6"))
    val nDelta = delta.agg(count(lit(1)).as("delta_edges"))
    val out = nDelta.crossJoin(sixths) // two 1-row aggregates
      .select(col("delta_edges"),
        expr("w6 div 6").cast("long").as("new_triangles"))
    val materialized = out.cache()
    materialized.count()
    flagged.unpersist(blocking = false)
    materialized
  }

  def localClustering(edges: DataFrame): DataFrame = {
    val canon = GraphOps.canonical(edges)
    val deg = canon
      .select(col("src").as("id")).union(canon.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    deg.join(perVertex(edges).withColumnRenamed("triangles", "tri"),
        Seq("id"), "left")
      .select(col("id"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("tri"), lit(0L)) /
            (col("deg") * (col("deg") - 1)))
          .as("lcc"))
  }

  /** Per-edge neighborhood overlap (Granovetter embeddedness): for each
    * canonical edge (u,v), the common-neighbor count and the Jaccard
    * overlap |N(u)∩N(v)| / (|N(u)∪N(v)| − 2), the strength-of-weak-ties
    * signal (overlap 0 = local bridge). The intersection is the edge's
    * triangle support, so this reuses [[Truss.edgeSupport]]'s
    * degree-oriented enumeration — same O(√E) wedge cap — plus one degree
    * join; the union size follows by inclusion–exclusion, no second
    * neighborhood pass. Exact integers until the one final division.
    */
  def edgeOverlap(edges: DataFrame): DataFrame = {
    val canon = GraphOps.canonical(edges)
    val deg = canon
      .select(col("src").as("id")).union(canon.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    canon
      .join(Truss.edgeSupport(canon), Seq("src", "dst"), "left")
      .join(deg.select(col("id").as("src"), col("deg").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dv")), "dst")
      .select(col("src"), col("dst"),
        coalesce(col("support"), lit(0L)).as("common"),
        (col("du") + col("dv") - 2 - coalesce(col("support"), lit(0L)))
          .as("union_size"))
      .select(col("src"), col("dst"), col("common"), col("union_size"),
        when(col("union_size") === 0, lit(1.0))
          .otherwise(col("common").cast("double") / col("union_size"))
          .as("overlap"))
  }

  /** Local-similarity edge sparsification (L-Spar, Satuluri–Parthasarathy
    * –Ruan): every vertex nominates its top-k incident edges by common-
    * neighbor count (ties: lower neighbor id), and an edge survives if
    * EITHER endpoint nominates it. Keeps intra-community structure while
    * cutting |E| to ≤ k·|V| — the standard pre-filter that makes
    * community detection on a 10¹²-edge crawl graph tractable. Cost: one
    * edge-support pass (degree-oriented, O(√E)-capped) + one per-vertex
    * window (partition-local). Returns surviving canonical edges with
    * their support.
    */
  def sparsifyTopOverlap(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val ov = edgeOverlap(edges).select(col("src"), col("dst"), col("common"))
    val both = ov.select(col("src").as("v"), col("dst").as("u"), col("common"))
      .union(ov.select(col("dst").as("v"), col("src").as("u"), col("common")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("v").orderBy(col("common").desc, col("u").asc)
    both.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(least(col("v"), col("u")).as("src"),
        greatest(col("v"), col("u")).as("dst"), col("common"))
      .distinct()
  }

  /** Directed triangle census by orientation (Fagiolo's decomposition,
    * the length-3 completion of the dyad census): every directed 3-cycle
    * u→v→w→u and every transitive triangle {u→v, v→w, u→w}, counted from
    * the DISTINCT directed edge set with reciprocal pairs INCLUDED (each
    * pattern instance counts once per ordered edge triple matching it;
    * cycles are reported divided by 3 — each cycle matches 3 rotations —
    * so both outputs are instance counts). Cycle-heavy regions are
    * mutual-exchange communities; transitive-heavy ones are hierarchy
    * (feed→aggregator→reader). The wedge join u→v→w costs Σ in(v)·out(v),
    * hub-capped by `maxDeg` on BOTH in- and out-degree (the
    * closedWalkCounts/SimRank capped-semantics contract); the closure
    * probes are equi-joins on both keys.
    *
    * @return one row (n_cyclic, n_transitive)
    */
  def directedTriads(directed: DataFrame, maxDeg: Long = 10000L): DataFrame = {
    val e = directed.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    val outD = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("od"))
    val inD = e.groupBy(col("dst").as("v")).agg(count(lit(1)).as("id"))
    val keep = outD.join(inD, Seq("v"), "full_outer")
      .filter(coalesce(col("od"), lit(0L)) <= maxDeg
        && coalesce(col("id"), lit(0L)) <= maxDeg)
      .select(col("v"))
    val ek = e.join(keep.select(col("v").as("src")), Seq("src"), "left_semi")
      .join(keep.select(col("v").as("dst")), Seq("dst"), "left_semi")
    val wedges = ek.select(col("src").as("u"), col("dst").as("v"))
      .join(ek.select(col("src").as("v"), col("dst").as("w")), Seq("v"))
      .filter(col("u") =!= col("w"))
    val cyc = wedges.join(ek.select(col("src").as("w"), col("dst").as("u")),
        Seq("w", "u"))
      .agg(count(lit(1)).as("c3"))
      .select(expr("c3 div 3").cast("long").as("n_cyclic"))
    val trans = wedges.join(ek.select(col("src").as("u"), col("dst").as("w")),
        Seq("u", "w"))
      .agg(count(lit(1)).cast("long").as("n_transitive"))
    cyc.crossJoin(trans)
  }

  /** Butterfly (2×2 biclique) census of a BIPARTITE edge table (src =
    * left class, dst = right class) — the triangle analogue for
    * user×item / host×resource graphs, where triangles cannot exist and
    * butterflies are the cohesion primitive (Sanei-Mehri et al., KDD'18):
    * butterflies = Σ over right-pairs C(co-wedge count, 2), computed
    * from the same capped co-cited-pair counts the co-visitation
    * operator builds. The `maxLeftDeg` cap is the CoCitation hub guard —
    * a left vertex of degree d mints C(d,2) wedges, so one unbounded
    * power user would dominate both cost and count; capped semantics are
    * part of the contract (count over the capped graph). Integer-exact:
    * c·(c−1) is even, halved by integer division after the sum.
    *
    * @return one row (butterflies, n_copairs, n_wedges)
    */
  def butterflies(bipartite: DataFrame, maxLeftDeg: Long = 1000L): DataFrame = {
    val e = bipartite.select(col("src"), col("dst")).distinct()
    val keep = e.groupBy("src").agg(count(lit(1)).as("d"))
      .filter(col("d") <= maxLeftDeg).select("src")
    val b = e.join(keep, Seq("src"), "left_semi")
    val pairs = b.select(col("src"), col("dst").as("r1"))
      .join(b.select(col("src"), col("dst").as("r2")), Seq("src"))
      .filter(col("r1") < col("r2"))
      .groupBy("r1", "r2").agg(count(lit(1)).as("c"))
    pairs.agg(sum(col("c") * (col("c") - 1)).cast("long").as("w2"),
        count(lit(1)).as("n_copairs"),
        sum(col("c")).cast("long").as("n_wedges"))
      .select(expr("w2 div 2").cast("long").as("butterflies"),
        col("n_copairs"), col("n_wedges"))
  }
}
