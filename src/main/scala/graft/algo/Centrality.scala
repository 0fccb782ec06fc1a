package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance-based centralities over the multi-source BFS levels that
  * betweenness already computes ([[Betweenness.bfsLevels]]) — the
  * operators a link-graph user reaches for right after PageRank/BC when
  * ranking pages by reachability rather than by citation mass.
  *
  * Both are defined per SOURCE over its reachable set (the standard
  * disconnected-graph formulations):
  *
  *   harmonic(s)  = Σ_{v≠s reached} 1 / d(s,v)      (Marchiori–Latora)
  *   closeness(s) = (|R(s)|−1) / Σ_{v≠s} d(s,v)     (Wasserman–Faust
  *                  within-component form)
  *
  * At web scale this runs on a sampled source set exactly like sampled
  * Brandes — the per-source cost is one row per (source, reached vertex),
  * and the aggregation is a single partial-aggregated groupBy(source), so
  * the whole operator adds ONE shuffle on top of the BFS itself.
  */
object Centrality {

  /** (id, reached, harmonic, closeness) per source vertex; `reached`
    * counts vertices at distance ≥ 1. Sources reaching nothing get 0s.
    */
  def sampledCloseness(edges: DataFrame, sources: DataFrame,
                       maxDepth: Int = Betweenness.DepthCap): DataFrame = {
    val lev = Betweenness.bfsLevels(edges, sources, maxDepth)
      .filter(col("dist") > 0)
    sources.select(col("id"))
      .join(
        lev.groupBy(col("source").as("id")).agg(
          count(lit(1)).as("reached"),
          sum(lit(1.0) / col("dist")).as("harmonic"),
          sum(col("dist")).as("sumDist")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("reached"), lit(0L)).as("reached"),
        coalesce(col("harmonic"), lit(0.0)).as("harmonic"),
        coalesce(
          (col("reached").cast("double")) / col("sumDist"), lit(0.0))
          .as("closeness"))
  }

  /** Distance histogram over sampled BFS levels (`(source, id, dist)` —
    * the [[Betweenness.bfsLevels]] schema): one row per positive distance
    * with the number of reached ordered (source, vertex) pairs. Self-pairs
    * (dist 0) are excluded — diameter statistics are about distinct pairs.
    * One partial-aggregated groupBy; output size ≤ the BFS depth cap.
    */
  def distanceHistogram(levels: DataFrame): DataFrame =
    levels.filter(col("dist") > 0)
      .groupBy("dist").agg(count(lit(1)).as("pairs"))

  /** q-effective diameter from sampled BFS — the standard web-graph
    * diagnostic (the "N degrees of separation" statistic of the ANF /
    * HyperANF literature, computed here from exact sampled BFS rather
    * than probabilistic counters): the smallest distance d whose
    * cumulative reached-pair count covers q of all reached pairs, plus
    * the pair total and the mean distance.
    *
    * q is the rational qNum/qDen so the threshold rule is pure integer
    * arithmetic (`cum·qDen ≥ total·qNum`) — no float compare at the
    * boundary, hence bit-replayable by the driver oracle. Integer rule,
    * no interpolation. The cumulative window runs over the ≤ depth-cap-row
    * HISTOGRAM, never over the data, so the single-partition window is
    * constant-size at any graph scale.
    *
    * @return one row: (eff_diameter, reached_pairs, mean_dist)
    */
  def effectiveDiameter(levels: DataFrame, qNum: Long = 9,
                        qDen: Long = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = distanceHistogram(levels)
    val tot = hist.agg(
      sum(col("pairs")).cast("long").as("total"),
      sum(col("dist") * col("pairs")).cast("long").as("distsum"))
    val cum = hist.select(col("dist"),
      sum(col("pairs")).over(Window.orderBy(col("dist"))).cast("long").as("cum"))
    cum.crossJoin(tot)
      .filter(col("cum") * lit(qDen) >= col("total") * lit(qNum))
      .orderBy(col("dist")).limit(1)
      .select(col("dist").as("eff_diameter"),
        col("total").as("reached_pairs"),
        (col("distsum").cast("double") / col("total")).as("mean_dist"))
  }
}
