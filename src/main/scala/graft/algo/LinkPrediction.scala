package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Link-prediction scores over candidate pairs — the neighborhood-overlap
  * primitives used to propose missing or future edges in a link graph:
  *
  *   cn(u,v)      = |N(u) ∩ N(v)|                      (common neighbors)
  *   aa(u,v)      = Σ_{z ∈ N(u) ∩ N(v)} 1 / ln(deg(z)) (Adamic–Adar)
  *   jaccard(u,v) = cn / (deg(u) + deg(v) − cn)        (neighborhood Jaccard)
  *   pa(u,v)      = deg(u) · deg(v)                    (preferential attachment)
  *
  * Scored for an explicit `pairs` table, NOT all pairs: at web scale the
  * candidate set comes from a blocking stage (LSH buckets, same-domain
  * pairs, top-k ANN), so the operator is pairs ⋈ adjacency ⋈ adjacency ⋈
  * degrees — three equi-joins and one partial-aggregated groupBy, cost
  * bounded by Σ_{(u,v)} deg(u), never by n². On a symmetrized,
  * self-pair-free input a common neighbor z is adjacent to two DISTINCT
  * endpoints so deg(z) ≥ 2 and ln(deg(z)) > 0; but a caller-supplied
  * self-pair (u,u), or a directed edge table where z's only out-edge is
  * the common one, yields deg(z) = 1 and 1/ln(1) = ∞ — such degree-1
  * witnesses contribute 0 to Adamic–Adar instead (the standard
  * convention; ADVICE r3), keeping every score finite on any input.
  *
  * Every input pair is emitted (zero scores for disjoint neighborhoods),
  * keeping the output row count equal to the candidate count.
  */
object LinkPrediction {

  def scores(edges: DataFrame, pairs: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(edges)
    val e1 = edges.select(col("src").as("u1"), col("dst").as("z"))
    val e2 = edges.select(col("src").as("v2"), col("dst").as("z2"))
    val overlaps = pairs.select(col("src").as("u"), col("dst").as("v"))
      .join(e1, col("u") === col("u1"))
      .join(e2, col("v") === col("v2") && col("z") === col("z2"))
      .join(deg.select(col("id").as("zd"), col("degree")), col("z") === col("zd"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(when(col("degree") > 1, lit(1.0) / log(col("degree")))
          .otherwise(lit(0.0))).as("aaRaw"))
    pairs.select(col("src"), col("dst"))
      .join(overlaps.select(col("u").as("src"), col("v").as("dst"),
          col("cn"), col("aaRaw")),
        Seq("src", "dst"), "left")
      .join(deg.select(col("id").as("src"), col("degree").as("degU")),
        Seq("src"), "left")
      .join(deg.select(col("id").as("dst"), col("degree").as("degV")),
        Seq("dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("cn"), lit(0L)).as("common"),
        coalesce(col("aaRaw"), lit(0.0)).as("aa"),
        {
          val c = coalesce(col("cn"), lit(0L))
          val union = coalesce(col("degU"), lit(0L)) +
            coalesce(col("degV"), lit(0L)) - c
          when(union > 0, c.cast("double") / union).otherwise(lit(0.0))
            .as("jaccard")
        },
        (coalesce(col("degU"), lit(0L)) * coalesce(col("degV"), lit(0L)))
          .as("pa"))
  }

  /** The second classical index family over the same candidate-pair
    * contract as [[scores]]:
    *
    *   ra(u,v)  = Σ_{z ∈ N(u) ∩ N(v)} 1 / deg(z)   (resource allocation,
    *              Zhou–Lü–Zhang 2009 — AA with linear instead of log
    *              damping; the strongest of the local indices in their
    *              benchmark)
    *   cos(u,v) = cn / √(deg(u)·deg(v))             (Salton cosine)
    *   lhn(u,v) = cn / (deg(u)·deg(v))              (Leicht–Holme–Newman,
    *              common neighbors per expected-at-random)
    *
    * Identical plan shape to [[scores]] — three equi-joins + one
    * partial-aggregated groupBy, bounded by Σ deg(u) over the candidate
    * set. deg(z) ≥ 1 always (z is adjacent to u), so RA needs no guard.
    * Every input pair is emitted (zeros for disjoint neighborhoods).
    * Returns (src, dst, common, ra, cosine, lhn).
    */
  def scoresExtended(edges: DataFrame, pairs: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(edges)
    val e1 = edges.select(col("src").as("u1"), col("dst").as("z"))
    val e2 = edges.select(col("src").as("v2"), col("dst").as("z2"))
    val overlaps = pairs.select(col("src").as("u"), col("dst").as("v"))
      .join(e1, col("u") === col("u1"))
      .join(e2, col("v") === col("v2") && col("z") === col("z2"))
      .join(deg.select(col("id").as("zd"), col("degree")), col("z") === col("zd"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(lit(1.0) / col("degree")).as("raRaw"))
    pairs.select(col("src"), col("dst"))
      .join(overlaps.select(col("u").as("src"), col("v").as("dst"),
          col("cn"), col("raRaw")),
        Seq("src", "dst"), "left")
      .join(deg.select(col("id").as("src"), col("degree").as("degU")),
        Seq("src"), "left")
      .join(deg.select(col("id").as("dst"), col("degree").as("degV")),
        Seq("dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("cn"), lit(0L)).as("common"),
        coalesce(col("raRaw"), lit(0.0)).as("ra"),
        {
          val c = coalesce(col("cn"), lit(0L)).cast("double")
          val prod = (coalesce(col("degU"), lit(0L)) *
            coalesce(col("degV"), lit(0L))).cast("double")
          when(prod > 0, c / sqrt(prod)).otherwise(lit(0.0)).as("cosine")
        },
        {
          val c = coalesce(col("cn"), lit(0L)).cast("double")
          val prod = (coalesce(col("degU"), lit(0L)) *
            coalesce(col("degV"), lit(0L))).cast("double")
          when(prod > 0, c / prod).otherwise(lit(0.0)).as("lhn")
        })
  }

  /** Temporal link-prediction evaluation: score every non-adjacent
    * canonical wedge pair of the OLD snapshot by common-neighbor count,
    * take the global top-`k`, and flag which predictions materialized
    * as edges in the NEW snapshot — precision@k against the crawl
    * delta, the eval loop that decides whether a predictor earns its
    * place in frontier scheduling.
    *
    * Plan: wedge pairs come from the degree-bounded mid-vertex
    * self-join (the triangle/cocitation shape — at web scale cap hub
    * degrees first, same contract); the top-k is TakeOrderedAndProject;
    * the rank window runs over k rows only. New-edge membership is a
    * left join against the canonicalized added-edge set
    * ([[GraphOps.edgeDiff]]).
    *
    * @param oldEdges symmetric slots at time t
    * @param newEdges symmetric slots at time t+1
    * @return (rank, src, dst, common, hit) for the top-k predictions
    */
  def evalPrecision(oldEdges: DataFrame, newEdges: DataFrame,
                    k: Int): DataFrame = {
    require(k >= 1)
    val e = oldEdges.select(col("src"), col("dst"))
    val wedge = e.select(col("src").as("mid"), col("dst").as("a"))
      .join(e.select(col("src").as("mid"), col("dst").as("b")), Seq("mid"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    val nonAdj = wedge.join(
      e.select(col("src").as("a"), col("dst").as("b")),
      Seq("a", "b"), "left_anti")
    val top = nonAdj
      .orderBy(col("common").desc, col("a").asc, col("b").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("common").desc, col("a").asc, col("b").asc)))
    val added = GraphOps.edgeDiff(e, newEdges.select(col("src"), col("dst")))
      .filter(col("change") === "added")
      .filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"), lit(1L).as("hit0"))
      .distinct()
    top.join(added, Seq("a", "b"), "left")
      .select(col("rank").cast("long").as("rank"),
        col("a").as("src"), col("b").as("dst"), col("common"),
        coalesce(col("hit0"), lit(0L)).as("hit"))
  }
}
