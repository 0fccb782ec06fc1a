package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.graph.GraphOps

/** Co-citation and bibliographic coupling (Small 1973 / Kessler 1963) —
  * the two classic directed-link similarity generators behind "related
  * pages" on a web graph:
  *
  *   cocitation(u, v) = #{ w : w→u and w→v }   (shared CITERS)
  *   coupling(u, v)   = #{ w : u→w and v→w }   (shared CITED pages)
  *
  * Unlike [[LinkPrediction.scores]], which SCORES caller-supplied
  * candidate pairs, these GENERATE the pairs — so the scale story is the
  * fan-out bound, not the join: pairing the out-list (resp. in-list) of a
  * shared endpoint costs Σ deg(w)² over the shared side. A hub that
  * links everything asserts nothing about similarity (the inverse-
  * document-frequency argument), so both operators drop shared endpoints
  * above a degree cap BEFORE pairing, which bounds the blow-up at
  * |V|·cap² regardless of skew — the standard production guard, and the
  * oracle replays the identical cap. Everything is equi-join +
  * partial-aggregated count; `minCount` prunes the (huge, mostly-1) tail
  * before it ever hits the final shuffle's reducers via partial
  * aggregation on (u, v).
  */
object CoCitation {

  private def prepared(directed: DataFrame): DataFrame =
    GraphOps.dropSelfLoops(directed.select(col("src"), col("dst"))).distinct()

  /** (u, v, n) with u < v: the number of distinct pages citing both u and
    * v, over citers with out-degree ≤ `maxOutDeg`, kept when n ≥
    * `minCount`.
    */
  def coCitation(directed: DataFrame, maxOutDeg: Long = 64,
                 minCount: Long = 2): DataFrame = {
    require(maxOutDeg >= 1 && minCount >= 1)
    val e = prepared(directed)
    val keptCiters = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .filter(col("od") <= maxOutDeg).select(col("src"))
    val kept = e.join(keptCiters, Seq("src"), "left_semi")
    val a = kept.select(col("src").as("w"), col("dst").as("u"))
    val b = kept.select(col("src").as("w"), col("dst").as("v"))
    a.join(b, Seq("w")).filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** (u, v, n) with u < v: the number of distinct pages cited by both u
    * and v, over cited pages with in-degree ≤ `maxInDeg`, kept when n ≥
    * `minCount`.
    */
  def coupling(directed: DataFrame, maxInDeg: Long = 64,
               minCount: Long = 2): DataFrame = {
    require(maxInDeg >= 1 && minCount >= 1)
    val e = prepared(directed)
    val keptCited = e.groupBy(col("dst")).agg(count(lit(1)).as("id_"))
      .filter(col("id_") <= maxInDeg).select(col("dst"))
    val kept = e.join(keptCited, Seq("dst"), "left_semi")
    val a = kept.select(col("dst").as("w"), col("src").as("u"))
    val b = kept.select(col("dst").as("w"), col("src").as("v"))
    a.join(b, Seq("w")).filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** "Related pages": the top-`k` co-cited pages per page, ranked by
    * shared-citer count descending with the smaller page id breaking
    * ties. The canonical u<v pair table is expanded to both directions
    * first, and the ranking window PARTITIONS BY page — per-page top-k,
    * never a global sort, so ranking concentrates nothing.
    *
    * @return (page, related, n, rn) with rn in 1..k
    */
  def relatedTopK(directed: DataFrame, k: Int, maxOutDeg: Long = 64,
                  minCount: Long = 2): DataFrame = {
    require(k >= 1)
    val pairs = coCitation(directed, maxOutDeg, minCount)
    val both = pairs.select(col("u").as("page"), col("v").as("related"), col("n"))
      .union(pairs.select(col("v"), col("u"), col("n")))
    both.withColumn("rn", row_number().over(
        Window.partitionBy("page")
          .orderBy(col("n").desc, col("related").asc)))
      .filter(col("rn") <= k)
      .select(col("page"), col("related"), col("n"), col("rn").cast("long").as("rn"))
  }
}
