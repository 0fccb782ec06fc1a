package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Andersen–Chung–Lang sweep cut: order vertices by an integer-scaled
  * diffusion score (personalized PageRank), and for every prefix S_k of
  * the top-m report cut(S_k), vol(S_k), and conductance — the minimum
  * over k is the certified local community around the seed set. The
  * classic identity makes this one pass: an edge is internal to S_k iff
  * the LARGER of its endpoints' ranks is ≤ k, so grouping canonical
  * edges by max-rank and running one cumulative window yields every
  * prefix's internal-edge count at once; cut = vol − 2·internal.
  *
  * The sweep is truncated to the top `m` scores (TakeOrdered — no global
  * sort), so the two ranking windows run over a constant-size broadcast-
  * small table; the only corpus-scale work is one degree aggregation and
  * one semi-join of the edge table against the m-row prefix set. All
  * quantities are exact integers except the final conductance divide.
  */
object SweepCut {

  /** @param scores (id, score_e6) integer-scaled diffusion scores.
    * Returns (k, id, score_e6, vol, cut, cond_e6) for k = 1..m, ordered
    * sweep prefixes; cond_e6 = 10⁶ when the prefix swallows all volume.
    */
  def conductanceSweep(edges: DataFrame, scores: DataFrame,
                       m: Int): DataFrame = {
    require(m >= 1)
    val top = scores.orderBy(col("score_e6").desc, col("id").asc).limit(m)
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    val ranked = top.join(deg, Seq("id"))
      .withColumn("k", row_number().over(
        Window.orderBy(col("score_e6").desc, col("id").asc)).cast("long"))
    val ru = ranked.select(col("id").as("u"), col("k").as("ku"))
    val rv = ranked.select(col("id").as("v2"), col("k").as("kv"))
    val intern = GraphOps.canonical(edges)
      .join(ru, col("src") === col("u"))
      .join(rv, col("dst") === col("v2"))
      .select(greatest(col("ku"), col("kv")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("ne"))
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = edges.agg(count(lit(1)).cast("long").as("t"))
    val sweep = ranked.join(intern, Seq("k"), "left")
      .withColumn("vol", sum(col("deg")).over(w).cast("long"))
      .withColumn("intern",
        sum(coalesce(col("ne"), lit(0L))).over(w).cast("long"))
      .withColumn("cut", col("vol") - lit(2L) * col("intern"))
      .crossJoin(broadcast(total))
    val mn = least(col("vol"), col("t") - col("vol"))
    sweep.select(col("k"), col("id"), col("score_e6"), col("vol"),
      col("cut"),
      when(mn === 0, lit(1000000L)).otherwise(
        round(col("cut").cast("double") * 1000000 / mn).cast("long"))
        .as("cond_e6"))
  }
}
