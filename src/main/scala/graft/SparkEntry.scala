package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.algo.LabelPropagation
import graft.graph.GraphOps
import graft.sources.{PagesSynth, TextExtract}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: synthesize a Common-Crawl-style pages table, extract the
    * url→outlink edge table, run synchronous label propagation to
    * convergence, return per-url community labels (north_star pipeline,
    * end to end, at smoke scale).
    */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PagesSynth.pages(spark, 2000L)
    val (raw, dict) = TextExtract.buildEdges(pages)
    val edges = GraphOps.prepareForGather(
      GraphOps.symmetrize(GraphOps.dropSelfLoops(raw)), 8)
    val n = GraphOps.vertices(edges).count()
    val labels = LabelPropagation.run(edges, n, symmetric = true).labels
    labels.join(dict, labels("id") === dict("id"))
      .select(dict("name").as("url"), labels("label").as("community"))
  }
  /** One entry per implemented operator from SURVEY.md §2 (graph engine)
    * plus the training-data pipeline operators.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GraphQueries.queries ++ graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.GraphQueries.oracleSql ++ graft.queries.PipelineQueries.oracleSql
}
