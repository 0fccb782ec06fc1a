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

  def planSkew(edges: DataFrame, threshold: Long, partitions: Int): SkewPlan = {
    val inDeg = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("indeg"))
    val hotIds = inDeg.filter(col("indeg") > threshold).select("id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    hotIds.count() // materialize so both slices below see a stable set
    val hot = edges.join(broadcast(hotIds), edges("dst") === hotIds("id"), "left_semi")
      .repartition(partitions, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cold = edges.join(broadcast(hotIds), edges("dst") === hotIds("id"), "left_anti")
      .repartition(partitions, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    SkewPlan(hot, cold, hotIds)
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

  /** Seeded random vertex permutation (reference `getPermutation`,
    * `algorithms.h:342-355` — used only by the async schedule, which the
    * engine does not reproduce; provided for parity). Deterministic given
    * the seed. The reference's Fisher-Yates variant never swaps into
    * position 0 (`algorithms.h:349`) — a bug, not replicated.
    */
  def permutation(vertices: DataFrame, seed: Long): DataFrame =
    vertices.orderBy(xxhash64(col("id"), lit(seed)))
      .select(col("id"))

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
}
