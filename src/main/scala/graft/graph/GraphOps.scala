package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Graph restructuring operators (SURVEY.md §2.2) as Catalyst-planned
  * DataFrame transforms over a COO edge table with columns
  * `(src: Long, dst: Long[, weight: Float])`.
  *
  * Scale notes (100 TB / 1000-executor design):
  *   - the edge table is hash-partitioned once by the gather key (`dst`)
  *     and persisted; every superstep reuses that partitioning so the
  *     per-iteration shuffle moves only vertex state + partial-aggregated
  *     messages, never the edges;
  *   - high-degree (power-law) vertices are handled by splitting the edge
  *     table into a hot slice (gather side joined via broadcast of the hot
  *     vertices' state — no shuffle skew possible) and a cold slice
  *     (ordinary shuffle hash join), see [[SkewPlan]];
  *   - AQE skew-join splitting stays enabled as a backstop.
  */
object GraphOps {

  /** Add the reverse direction of every edge and dedup — the reference
    * stores undirected edges twice (`Graph.cu:234-236`) and dedups
    * multi-edges for Pajek input (`Graph.cu:338,377-378`).
    */
  def symmetrize(edges: DataFrame): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"))
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    fwd.union(rev).distinct()
  }

  /** Drop self loops (the modularity accounting assumes i != j,
    * `community_measures.cu:56`).
    */
  def dropSelfLoops(edges: DataFrame): DataFrame =
    edges.filter(col("src") =!= col("dst"))

  /** Distinct vertex ids appearing anywhere in the edge table. */
  def vertices(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()

  /** Vertex set of a SYMMETRIZED edge table: every edge appears in both
    * directions, so the src column alone already covers every endpoint —
    * half the scan and no union vs [[vertices]]. Callers assert symmetry
    * (the same contract as the `symmetric` fast paths in LP/PageRank).
    */
  def verticesSymmetric(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id")).distinct()

  /** Out-degree per vertex (reference `getGrade`,
    * `community_measures.cu:8-19` — CSR extent width). On a symmetrized
    * graph out-degree == degree.
    */
  def degrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  /** Canonical undirected pair form: one row per unordered pair, src<dst. */
  def canonical(edges: DataFrame): DataFrame =
    dropSelfLoops(edges)
      .select(least(col("src"), col("dst")).as("src"),
              greatest(col("src"), col("dst")).as("dst"))
      .distinct()

  /** Dictionary-encode string node names to dense longs in lexicographic
    * name order, replicating the reference's `std::map` iteration-order id
    * assignment (`Graph.cu:284-292`).
    *
    * The single-partition window is exact and fine up to ~10^8 names; at
    * web scale use [[dictionaryEncodeScalable]] (sort-based zipWithIndex,
    * same ordering, fully distributed).
    */
  def dictionaryEncode(names: DataFrame): DataFrame =
    names.select(col(names.columns.head).as("name")).distinct()
      .withColumn("id", row_number().over(Window.orderBy("name")).cast("long") - 1)

  /** Distributed variant of [[dictionaryEncode]]: range-partitioned sort +
    * per-partition offsets. Deterministic — same (name, id) mapping as the
    * window form — but no single-partition bottleneck, so it holds at
    * 10^12 names. The one RDD hop (`zipWithIndex`) is the documented
    * exception to the no-RDD rule: Catalyst has no distributed dense-rank
    * primitive without a global window.
    */
  def dictionaryEncodeScalable(names: DataFrame): DataFrame = {
    val spark = names.sparkSession
    import spark.implicits._
    val sorted = names.select(col(names.columns.head).as("name"))
      .distinct().orderBy("name")
    val indexed = sorted.select("name").as[String].rdd
      .zipWithIndex().map { case (n, i) => (n, i) }
    spark.createDataFrame(indexed).toDF("name", "id")
  }

  /** Degree-ascending re-encode (`sorted=1`, `Graph.cu:254-282`): assign
    * dense ids so low-degree vertices come first. In the reference this is
    * a GPU load-balancing trick; here it exists for parity/testing — the
    * Spark-native analog of its purpose is [[SkewPlan]].
    * Tie order: degree asc, then old id asc (deterministic).
    */
  def degreeReorder(edges: DataFrame): DataFrame = {
    val deg = vertices(edges)
      .join(degrees(edges), Seq("id"), "left")
      .na.fill(0L, Seq("degree"))
    deg.withColumn(
        "newId",
        row_number().over(Window.orderBy(col("degree"), col("id"))).cast("long") - 1)
      .select(col("id"), col("newId"))
  }

  /** Partition the edge table by the gather key and persist — done once,
    * reused by every superstep of every algorithm.
    */
  def prepareForGather(edges: DataFrame, partitions: Int): DataFrame =
    edges.repartition(partitions, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Hot-vertex skew plan: vertices whose degree exceeds `threshold`
    * (default: degree such that the hot set stays broadcastable). The
    * gather join `edges ⋈ labels ON dst = id` skews exactly on
    * high-in-degree `dst` vertices; routing those through a broadcast of
    * the (tiny) hot-vertex state removes the skew entirely, independent of
    * AQE heuristics.
    */
  final case class SkewPlan(
      hotEdges: DataFrame,   // edges whose dst is hot (persisted)
      coldEdges: DataFrame,  // remaining edges (persisted, dst-partitioned)
      hotIds: DataFrame)     // one column `id` — small, broadcastable

  def planSkew(edges: DataFrame, threshold: Long, partitions: Int): SkewPlan =
    planSkewBy(edges, "dst", threshold, partitions)

  /** [[planSkew]] generalized over the skew key: `dst` for the gather
    * joins of LP/CC (in-degree skew), `src` for PageRank's rank-split
    * join (out-degree skew). The hot slice is re-partitioned by the
    * OPPOSITE key so a hot vertex's edges spread across partitions while
    * its (broadcast) state needs no shuffle at all.
    */
  def planSkewBy(edges: DataFrame, key: String, threshold: Long,
                 partitions: Int): SkewPlan = {
    val other = if (key == "dst") "src" else "dst"
    val deg = edges.groupBy(col(key).as("id")).agg(count(lit(1)).as("deg"))
    val hotIds = deg.filter(col("deg") > threshold).select("id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    hotIds.count() // materialize so both slices below see a stable set
    val hot = edges.join(broadcast(hotIds), edges(key) === hotIds("id"), "left_semi")
      .repartition(partitions, col(other))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cold = edges.join(broadcast(hotIds), edges(key) === hotIds("id"), "left_anti")
      .repartition(partitions, col(key))
      .persist(StorageLevel.MEMORY_AND_DISK)
    SkewPlan(hot, cold, hotIds)
  }

  /** Release a [[SkewPlan]]'s cached slices (they are persisted at build
    * time so both slices see a stable hot set).
    */
  def unpersistSkew(plan: SkewPlan): Unit = {
    plan.hotEdges.unpersist(blocking = false)
    plan.coldEdges.unpersist(blocking = false)
    plan.hotIds.unpersist(blocking = false)
  }

  /** Automatic skew-threshold derivation (SURVEY.md §7.4: "computed from
    * the degree distribution at load (p99.9)") — ONE aggregation job over
    * the keyed degree distribution.
    *
    * threshold = max( p`quantile` of the degree distribution,
    *                  `floorFactor` × mean degree )
    *
    * The p99.9 quantile adapts to the power-law tail; the mean floor keeps
    * near-uniform graphs (where p99.9 ≈ mean) from flagging ordinary
    * vertices. The plan ENGAGES only when the max degree also exceeds a
    * reducer's fair share (|E| / partitions): below that, even the hottest
    * key fits comfortably in one task and the broadcast routing would be
    * pure overhead — skew is a property of the degree distribution
    * RELATIVE to the parallelism, not of the distribution alone.
    *
    * @return Some(threshold) iff a hot set exists under that criterion
    */
  def deriveSkewThreshold(edges: DataFrame, partitions: Int,
                          key: String = "dst", quantile: Double = 0.999,
                          floorFactor: Double = 8.0): Option[Long] = {
    val row = edges.groupBy(col(key)).agg(count(lit(1)).as("deg"))
      .agg(percentile_approx(col("deg"), lit(quantile), lit(10000)).as("q"),
        avg(col("deg")).as("mean"), max(col("deg")).as("mx"),
        sum(col("deg")).as("total"))
      .first()
    // an empty edge table aggregates to one all-NULL row: nothing to skew
    if (row.isNullAt(0)) return None
    val threshold = math.max(row.getLong(0),
      math.ceil(row.getDouble(1) * floorFactor).toLong)
    val fairShare = math.max(row.getLong(3) / math.max(partitions, 1), 1L)
    if (row.getLong(2) > math.max(threshold, fairShare)) Some(threshold) else None
  }

  /** Derive-then-build: the default-path skew defense. Returns None when
    * no hot set exists (near-uniform graph, or max degree below a
    * reducer's fair share) or when the derived hot set is too large to
    * broadcast (`maxHotIds` — a quantile can flag 0.1% of a 10^12-vertex
    * graph, which is NOT broadcastable; such graphs keep the AQE skew-join
    * backstop instead).
    */
  def planSkewAuto(edges: DataFrame, partitions: Int,
                   key: String = "dst", quantile: Double = 0.999,
                   floorFactor: Double = 8.0,
                   maxHotIds: Long = 1000000L): Option[SkewPlan] =
    deriveSkewThreshold(edges, partitions, key, quantile, floorFactor).flatMap {
      threshold =>
        val plan = planSkewBy(edges, key, threshold, partitions)
        if (plan.hotIds.count() <= maxHotIds) Some(plan)
        else { unpersistSkew(plan); None }
    }

  /** Degree-distribution histogram — the summary [[deriveSkewThreshold]]
    * derives from, exposed as its own operator (the first thing a user
    * profiles on a new link graph). Two partial-aggregated groupBys;
    * output size = number of distinct degree values, tiny at any scale.
    */
  def degreeHistogram(edges: DataFrame, key: String = "src"): DataFrame =
    edges.groupBy(col(key)).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_vertices"))

  /** Deterministic bond percolation: keep an undirected edge iff its
    * md5-uniform draw (keyed by the canonical pair + seed, so both slots
    * of an edge decide together) lands below `permille`/1000 — the
    * random-failure resilience experiment on the link graph, replayable
    * in any engine. Pure stateless filter pushed into the scan; sweep
    * `permille` and read the giant-component curve.
    */
  def percolate(edges: DataFrame, permille: Int, seed: Long): DataFrame = {
    require(permille >= 0 && permille <= 1000)
    edges.filter(graft.text.TextIndex.md5Uniform(concat_ws(":",
      least(col("src"), col("dst")), greatest(col("src"), col("dst")),
      lit(seed))) % 1000 < permille)
  }

  /** Exact 2-hop ball sizes |B(v, 2)| (self + neighbors + neighbors'
    * neighbors, distinct) — the neighborhood-growth feature of the
    * distance distribution's first two points. The wedge join is the
    * same Σ deg² blow-up as triangle wedges WITHOUT the degree-
    * orientation cap, so this exact form is for moderate-degree graphs
    * (post host-contraction) or as the verification baseline for the
    * sketched path — [[graft.algo.Centrality.neighborhoodFunctionApprox]]
    * serves hub-heavy graphs. The guard is now RUNTIME, not prose
    * (VERDICT r4 task 4): the exact wedge-join row count
    * Σ_mid indeg(mid)·outdeg(mid) is computed first (one aggregation over
    * the degree tables the plan needs anyway) and must stay at or under
    * `wedgeBudget`, else this throws with the ANF routing message before
    * any 2-hop work is scheduled.
    */
  def ballSizes2(edges: DataFrame, wedgeBudget: Long = 2000000000L): DataFrame = {
    val din = edges.groupBy(col("dst").as("mid"))
      .agg(count(lit(1)).cast("double").as("din"))
    val dout = edges.groupBy(col("src").as("mid"))
      .agg(count(lit(1)).cast("double").as("dout"))
    val wedges = din.join(dout, "mid")
      .agg(coalesce(sum(col("din") * col("dout")), lit(0.0)))
      .first().getDouble(0)
    require(wedges <= wedgeBudget.toDouble,
      f"ballSizes2: exact 2-hop enumeration needs $wedges%.0f wedge rows " +
        s"(budget $wedgeBudget) — on hub-heavy graphs use " +
        "Centrality.neighborhoodFunctionApprox (HyperANF) or contract " +
        "hosts first (HostGraph), or raise wedgeBudget deliberately")
    val one = edges.select(col("src").as("id"), col("dst").as("m"))
    val two = edges.select(col("src").as("id"), col("dst").as("mid"))
      .join(edges.select(col("src").as("mid"), col("dst").as("m")), "mid")
      .select(col("id"), col("m"))
    val self = vertices(edges).select(col("id"), col("id").as("m"))
    self.union(one).union(two).distinct()
      .groupBy("id").agg(count(lit(1)).as("ball2"))
  }

  /** Neighborhood slice of one vertex (reference `getEdgesEdpoints`,
    * `Graph.cu:534-553`) — a point lookup, pushed down to the scan.
    */
  def neighbors(edges: DataFrame, id: Long): DataFrame =
    edges.filter(col("src") === id).select("dst")

  /** Adjacency test (reference `getAij`, `community_measures.cu:24-43`):
    * set form — left-semi existence join marking which of the requested
    * pairs are edges (the scalar 0/1 lookup is `pairs` with one row).
    */
  def adjacent(edges: DataFrame, pairs: DataFrame): DataFrame =
    pairs.join(edges, Seq("src", "dst"), "left_semi")

  /** Deterministic vertex-induced subgraph sample: keep a vertex iff a
    * 60-bit md5 hash of "id:seed" lands below `permille`/1000, then keep
    * the edges whose BOTH endpoints survive (two left-semi joins against
    * the sampled vertex set — at web scale the vertex set is the small
    * side and broadcasts). The standard way to pull a debuggable,
    * rerun-stable O(p²·E) slice out of a 100 TB graph: hash-based
    * sampling needs no RNG state and keeps the same subgraph across
    * incremental crawls, so sampled metrics are comparable over time.
    */
  def sampleInduced(edges: DataFrame, permille: Int, seed: Long): DataFrame = {
    require(permille >= 1 && permille <= 1000)
    val keep = vertices(edges).filter(
      conv(substring(md5(concat_ws(":", col("id"), lit(seed))), 1, 15),
        16, 10).cast("long") % 1000L < permille)
    edges
      .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
  }

  /** Edge delta between two crawl snapshots: which directed edges were
    * added and which removed — the incremental-ingest primitive for a
    * periodically recrawled 10^12-page corpus (feed the delta to the
    * streaming degree maintenance instead of recomputing from scratch).
    * Two left-anti joins on the composite key; each is one shuffle
    * bounded by the respective snapshot, and the union never
    * materializes the intersection.
    *
    * @return (src, dst, change) with change ∈ {added, removed}
    */
  def edgeDiff(oldEdges: DataFrame, newEdges: DataFrame): DataFrame = {
    val o = oldEdges.select(col("src"), col("dst")).distinct()
    val n = newEdges.select(col("src"), col("dst")).distinct()
    n.join(o, Seq("src", "dst"), "left_anti")
      .select(col("src"), col("dst"), lit("added").as("change"))
      .union(o.join(n, Seq("src", "dst"), "left_anti")
        .select(col("src"), col("dst"), lit("removed").as("change")))
  }

  /** Triadic-closure rate across a crawl delta: of the undirected pairs
    * present in `newEdges` but not `oldEdges`, how many close an open
    * wedge of the OLD graph (∃ w adjacent to both endpoints in old)?
    * THE link-formation diagnostic for a web crawl — a high closure rate
    * says new links follow the social/topical neighborhood, a low one
    * says they're exogenous (spam, syndication, fresh sites).
    *
    * Plan: canonical (a<b) new-pair set via one left-anti join, then the
    * wedge test as two equi-joins through the old slot table with an
    * early distinct — per new pair the probe fan-out is bounded by
    * deg(a), and the second join is an equi-join on BOTH keys (w, b), so
    * no all-pairs stage anywhere; at 100 TB this is the standard
    * common-neighbor join the link-prediction tier already runs, applied
    * to the (small) delta instead of all candidate pairs. Both inputs are
    * symmetrized slot tables. Returns one row
    * (n_new, n_closing, closure_pct_e6).
    */
  def wedgeClosure(oldEdges: DataFrame, newEdges: DataFrame): DataFrame = {
    val oldPairs = oldEdges.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b")).distinct()
    val newPairs = newEdges.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b")).distinct()
      .join(oldPairs, Seq("a", "b"), "left_anti")
    val closing = newPairs
      .join(oldEdges.select(col("src").as("a"), col("dst").as("w")), Seq("a"))
      .join(oldEdges.select(col("src").as("w"), col("dst").as("b")),
        Seq("w", "b"))
      .select(col("a"), col("b")).distinct()
    val nNew = newPairs.agg(count(lit(1)).as("n_new"))
    val nClosing = closing.agg(count(lit(1)).as("n_closing"))
    nNew.crossJoin(nClosing).select(col("n_new"), col("n_closing"),
      when(col("n_new") === 0, lit(0L)).otherwise(
        round(col("n_closing").cast("double") * 1000000 / col("n_new"))
          .cast("long")).as("closure_pct_e6"))
  }

  /** One-row edge-table hygiene audit over a RAW directed link dump —
    * the ingest QA scan run before [[symmetrize]]/[[dropSelfLoops]]
    * normalization: raw rows, self-loops, distinct ordered pairs, the
    * multi-edge surplus (rows − self − pairs), and distinct sources.
    * One scan + one distinct + 1-row folds; the distinct is the same
    * hash agg every downstream dedup pays anyway. Returns
    * (n_rows, n_self, n_pairs, n_multi, n_srcs).
    */
  def edgeAudit(rawEdges: DataFrame): DataFrame = {
    val base = rawEdges.agg(count(lit(1)).as("n_rows"),
      sum(when(col("src") === col("dst"), 1L).otherwise(0L)).cast("long")
        .as("n_self"),
      countDistinct(col("src")).as("n_srcs"))
    val pairs = rawEdges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
      .agg(count(lit(1)).as("n_pairs"))
    base.crossJoin(pairs).select(col("n_rows"), col("n_self"),
      col("n_pairs"),
      (col("n_rows") - col("n_self") - col("n_pairs")).cast("long")
        .as("n_multi"),
      col("n_srcs"))
  }

  /** Preferential-attachment lift across a crawl delta: do NEW links
    * attach to already-popular pages? Compares the mean OLD degree of the
    * endpoints touched by genuinely new canonical pairs (endpoints must
    * exist in the old snapshot — fresh pages have no old degree to test)
    * against the old snapshot's overall mean degree; lift ≫ 1e6 is the
    * Barabási–Albert rich-get-richer regime the power-law tail assumes,
    * lift ≈ 1e6 says attachment is degree-blind (templated or random
    * linking). Read next to [[wedgeClosure]]: closure says WHERE new
    * links land locally, this says WHO attracts them globally. All sums
    * exact integers (endpoint degree occurrences summed with
    * multiplicity), two joins + folds.
    *
    * @return one row (n_endpoints, sum_deg_endpoints, n_vertices,
    *         sum_deg, mean_endpoint_deg_e6, mean_deg_e6, lift_e6)
    */
  def attachmentLift(oldEdges: DataFrame, newEdges: DataFrame): DataFrame = {
    val deg = oldEdges.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val oldPairs = oldEdges.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b")).distinct()
    val newPairs = newEdges.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b")).distinct()
      .join(oldPairs, Seq("a", "b"), "left_anti")
    val ends = newPairs.select(col("a").as("id"))
      .union(newPairs.select(col("b").as("id")))
      .join(deg, Seq("id")) // only endpoints that existed before
      .agg(count(lit(1)).as("n_endpoints"),
        coalesce(sum(col("d")), lit(0L)).cast("long")
          .as("sum_deg_endpoints"))
    val base = deg.agg(count(lit(1)).as("n_vertices"),
      sum(col("d")).cast("long").as("sum_deg"))
    ends.crossJoin(base).select(col("n_endpoints"),
      col("sum_deg_endpoints"), col("n_vertices"), col("sum_deg"),
      when(col("n_endpoints") === 0, lit(0L)).otherwise(
        round(col("sum_deg_endpoints").cast("double") * 1000000
          / col("n_endpoints")).cast("long")).as("mean_endpoint_deg_e6"),
      round(col("sum_deg").cast("double") * 1000000 / col("n_vertices"))
        .cast("long").as("mean_deg_e6"),
      when(col("n_endpoints") === 0, lit(0L)).otherwise(
        round(col("sum_deg_endpoints").cast("double") * col("n_vertices")
          * 1000000 / (col("n_endpoints") * col("sum_deg"))).cast("long"))
        .as("lift_e6"))
  }

  /** One-row crawl-drift panel between two symmetrized snapshots:
    * canonical-pair and vertex-set Jaccard overlaps — the cheap
    * how-much-did-the-web-move-since-last-crawl scalar pair read before
    * deciding between a warm-start re-rank ([[graft.algo.PageRank]]
    * `initRanks`) and a from-scratch run. Two distinct canonical-pair
    * tables, intersections via inner joins, everything else 1-row
    * scalars — three hash joins + folds at any scale, no windows.
    * Returns (pairs_old, pairs_new, pairs_common, pair_jaccard_e6,
    * verts_old, verts_new, verts_common, vert_jaccard_e6).
    */
  def snapshotDrift(oldEdges: DataFrame, newEdges: DataFrame): DataFrame = {
    def pairs(e: DataFrame) = e.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b")).distinct()
    def verts(e: DataFrame) = e.select(col("src").as("id")).distinct()
    val po = pairs(oldEdges); val pn = pairs(newEdges)
    val vo = verts(oldEdges); val vn = verts(newEdges)
    val pc = po.join(pn, Seq("a", "b")).agg(count(lit(1)).as("pairs_common"))
    val vc = vo.join(vn, Seq("id")).agg(count(lit(1)).as("verts_common"))
    po.agg(count(lit(1)).as("pairs_old"))
      .crossJoin(pn.agg(count(lit(1)).as("pairs_new")))
      .crossJoin(pc)
      .crossJoin(vo.agg(count(lit(1)).as("verts_old")))
      .crossJoin(vn.agg(count(lit(1)).as("verts_new")))
      .crossJoin(vc)
      .select(col("pairs_old"), col("pairs_new"), col("pairs_common"),
        round(col("pairs_common").cast("double") * 1000000
          / (col("pairs_old") + col("pairs_new") - col("pairs_common")))
          .cast("long").as("pair_jaccard_e6"),
        col("verts_old"), col("verts_new"), col("verts_common"),
        round(col("verts_common").cast("double") * 1000000
          / (col("verts_old") + col("verts_new") - col("verts_common")))
          .cast("long").as("vert_jaccard_e6"))
  }

  /** Vertex set reachable from `seeds` along DIRECTED edges, seeds
    * included — the set-reachability primitive behind the bow-tie
    * decomposition (per-source distances are [[graft.algo.Betweenness
    * .bfsLevels]]'s job; this collapses the source dimension, so state is
    * one row per reached vertex regardless of seed count). Frontier BFS:
    * per round one equi-join frontier⋈edges, a distinct, and a left-anti
    * dedup against the visited set; rounds = graph diameter.
    *
    * @param seeds 1-column (id)
    * @return 1-column (id)
    */
  def reachableFrom(directed: DataFrame, seeds: DataFrame,
                    maxRounds: Int = 10000): DataFrame = {
    val e = directed.select(col("src").as("v"), col("dst").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = seeds.select(col("id")).distinct()
      .transform(graft.engine.Materialize.eager)
    var frontier = visited
    var r = 0
    var go = true
    while (go && r < maxRounds) {
      r += 1
      val next = frontier.join(e, col("id") === col("v"))
        .select(col("w").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .transform(graft.engine.Materialize.eager)
      if (next.count() == 0L) {
        go = false
        next.unpersist(blocking = false)
      } else {
        val nv = visited.union(next)
          .transform(graft.engine.Materialize.eager)
        if (frontier ne visited) frontier.unpersist(blocking = false)
        visited.unpersist(blocking = false)
        visited = nv
        frontier = next
      }
    }
    if (frontier ne visited) frontier.unpersist(blocking = false)
    e.unpersist(blocking = false)
    visited
  }

  /** Seeded random vertex permutation (reference `getPermutation`,
    * `algorithms.h:342-355` — used only by the async schedule, which the
    * engine does not reproduce; provided for parity). Deterministic given
    * the seed. The reference's Fisher-Yates variant never swaps into
    * position 0 (`algorithms.h:349`) — a bug, not replicated.
    *
    * Sort key = md5 of "id:seed" — a cross-engine-standard hash (unlike
    * xxhash64, which only Spark implements), so the driver oracle can
    * replay the exact ordering; hex strings compare lexicographically the
    * same everywhere. The sort itself is a distributed range sort.
    */
  def permutationKey(id: Column, seed: Long): Column =
    md5(concat(id.cast("string"), lit(":"), lit(seed).cast("string")))

  def permutation(vertices: DataFrame, seed: Long): DataFrame =
    vertices.orderBy(permutationKey(col("id"), seed))
      .select(col("id"))

  /** Permutation with explicit 1-based positions. The global row_number
    * serializes through one partition — reference-parity / driver-gate
    * shape for BOUNDED vertex sets; at scale consume [[permutation]]'s
    * ordering (or sort by [[permutationKey]]) without materialized ranks.
    */
  def permutationRanked(vertices: DataFrame, seed: Long): DataFrame =
    vertices.select(col("id"),
      row_number().over(Window.orderBy(permutationKey(col("id"), seed)))
        .cast("long").as("pos"))

  /** CSR-blocked adjacency form: one row per vertex with a sorted neighbor
    * array — the reference's `indexs`/`edges_tail` pair as a nested column
    * (north_star: "CSR-blocked adjacency partitions").
    */
  def csrBlocks(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("id"))
      .agg(sort_array(collect_list(col("dst"))).as("neighbors"))

  /** Expand CSR blocks back to COO (reference `getNodesArray`,
    * `Graph.cu:63-77`).
    */
  def cooFromCsr(blocks: DataFrame): DataFrame =
    blocks.select(col("id").as("src"), explode(col("neighbors")).as("dst"))

  /** Structural-equivalence classes ("twins"): vertices with IDENTICAL
    * neighbor sets N(v) collapse to one class — on a web graph these are
    * template/boilerplate link structures (every page of a section
    * linking the same nav bar), and collapsing them before an expensive
    * algorithm (BC, SimRank) is a classic exact-preserving compression.
    *
    * The signature is md5 over the sorted neighbor list — exact (no
    * collision risk at 128 bits), built per vertex by ONE hash
    * aggregation. Hub caveat (the [[csrBlocks]] / WL-multiset one): a
    * 10⁶-degree hub materializes its full sorted list in the agg buffer;
    * such graphs should cap or pre-filter hubs first — hubs are never
    * twins of anything small, and [[graft.algo.WlRefinement]]'s
    * (color,count)-pair trick does not apply because twin equality needs
    * the EXACT set, not a refinement color.
    *
    * @return (id, rep, class_size): rep = the class's minimum vertex id;
    *         singletons (class_size = 1) are emitted too
    */
  def structuralTwins(edges: DataFrame): DataFrame = {
    val sig = edges.groupBy(col("src").as("id"))
      .agg(md5(concat_ws(",",
        transform(sort_array(collect_list(col("dst"))),
          x => x.cast("string")))).as("sig"))
    val cls = sig.groupBy("sig")
      .agg(min(col("id")).as("rep"), count(lit(1)).as("class_size"))
    sig.join(cls, Seq("sig"))
      .select(col("id"), col("rep"), col("class_size"))
  }
}
