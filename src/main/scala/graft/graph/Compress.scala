package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adjacency-list compressibility under delta-gap Elias-gamma coding —
  * the WebGraph cost model (Boldi–Vigna): each vertex's sorted neighbor
  * list is stored as first-id-plus-one followed by successive gaps, each
  * gap g coded in 2·⌊log₂ g⌋ + 1 bits. The total is the standard estimate
  * of how many bits/edge a compressed link-graph store would spend, and
  * the objective that id-reordering (BFS order, degree order, host
  * locality) minimizes — at 10¹²-document scale the difference between a
  * reordered and a random id space is several bits per edge, i.e.
  * terabytes of adjacency storage.
  *
  * Everything is exact integer arithmetic: ⌊log₂ g⌋ is derived from the
  * binary-string length (`length(bin(g)) − 1`), never a floating log, so
  * the cost replays bit-for-bit in any engine. The per-source window is
  * partition-local (partition by src), so the pass scales as one shuffle
  * by src regardless of graph size.
  */
object Compress {

  /** Per-source gamma-coding cost of the directed slot table
    * (src, dst): output (id, degree, gamma_bits). Input must be
    * duplicate-free per (src, dst) — gaps of 0 would break the gamma
    * model (the engine's symmetrize/canonical forms guarantee this).
    * First gap is dst+1 so id 0 stays codable.
    */
  def gammaGapCost(edges: DataFrame): DataFrame = {
    val w = Window.partitionBy("src").orderBy("dst")
    val gap = coalesce(col("dst") - lag(col("dst"), 1).over(w),
      col("dst") + 1)
    edges.select(col("src"), col("dst"))
      .withColumn("gap", gap)
      .select(col("src"),
        (lit(2) * (length(bin(col("gap"))) - 1) + 1).cast("long").as("bits"))
      .groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("degree"), sum(col("bits")).as("gamma_bits"))
  }

  /** Gamma cost of the same graph after re-encoding vertex ids with the
    * supplied mapping (id, newId) — e.g. [[GraphOps.degreeReorder]].
    * Output keyed by ORIGINAL id so callers can compare orderings
    * side by side. The mapping must be a bijection over the vertex set.
    */
  def gammaGapCostReordered(edges: DataFrame, mapping: DataFrame): DataFrame = {
    val ms = mapping.select(col("id").as("src"), col("newId").as("nsrc"))
    val md = mapping.select(col("id").as("dst"), col("newId").as("ndst"))
    val re = edges.join(ms, "src").join(md, "dst")
      .select(col("nsrc").as("src"), col("ndst").as("dst"))
    gammaGapCost(re)
      .join(mapping.select(col("newId").as("id"), col("id").as("origId")), "id")
      .select(col("origId").as("id"), col("degree"),
        col("gamma_bits").as("gamma_bits_reord"))
  }
}
