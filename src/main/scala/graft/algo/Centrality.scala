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
}
