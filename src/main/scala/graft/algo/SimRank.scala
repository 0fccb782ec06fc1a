package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimRank structural similarity (Jeh & Widom, KDD 2002): two pages are
  * similar when their in-neighbors are similar —
  *
  *   s(a,a) = 1
  *   s(a,b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j)
  *
  * the random-surfer-pair meeting probability, and the canonical
  * related-page measure on a link graph (two pages co-cited by similar
  * pages are similar, recursively — one level deeper than co-citation).
  *
  * This is the truncated 2-iteration form with every score an EXACT
  * scaled integer: C = cNum/cDen is kept rational and each iteration
  * floors once —
  *
  *   s1(a,b) = ⌊cNum·scale·cn(a,b) / (cDen·d(a)·d(b))⌋      (cn = |I(a)∩I(b)|)
  *   s2(a,b) = ⌊cNum·(cn(a,b)·scale + Σ_{i≠j} s1(i,j)) / (cDen·d(a)·d(b))⌋
  *
  * (the diagonal i=j contributes s(i,i)=scale exactly cn times). Integer
  * `div` on both engines makes the gate bit-exact — no floating point
  * anywhere.
  *
  * Plan shape: s1 is the co-citation pairing (one self-join on the shared
  * in-neighbor + one hash agg); s2 propagates s1 one step down both
  * edge legs (two equi-joins + one hash agg) and rejoins the diagonal by
  * a full outer merge. Nothing is ever all-pairs: the pair population is
  * bounded by Σ_i outdeg(i)² (s1) and Σ_(i,j)∈s1 outdeg(i)·outdeg(j)
  * (s2), so `maxOutDeg` pre-filters hub citers out of the graph exactly
  * like [[CoCitation.coCitation]] — one 10⁵-out-degree hub would
  * otherwise mint 10¹⁰ s1 pairs before the groupBy (VERDICT r4 task 2).
  * Dropping hubs is the standard SimRank pruning and barely moves the
  * scores: the mass a hub contributes to any pair is divided by
  * d(a)·d(b), so high-fan-out evidence is weak evidence by the measure's
  * own definition. Degrees are computed on the CAPPED graph (capped
  * semantics throughout, like CoCitation); with `maxOutDeg` at or above
  * the graph's maximum out-degree the result is exactly the uncapped
  * SimRank.
  *
  * Scores stay within Long while cn·scale·cNum < 2⁶³ — with the default
  * scale 10⁶ that allows common-neighbor counts up to ~2×10¹².
  */
object SimRank {

  /** Two SimRank iterations over the DIRECTED edge table; returns
    * canonical pairs (a < b) with both iterations' scaled scores,
    * s2 > 0 only.
    */
  def simRankT2(edges: DataFrame, scale: Long = 1000000L,
                cNum: Long = 4L, cDen: Long = 5L,
                maxOutDeg: Long = 4096L): DataFrame = {
    require(scale > 0 && cNum > 0 && cDen >= cNum && maxOutDeg >= 1)
    val e0 = edges.select(col("src"), col("dst")).distinct()
    // hub cap: drop citers whose fan-out exceeds maxOutDeg BEFORE any
    // pairing — bounds the s1 population at |kept| · maxOutDeg and the
    // s2 legs likewise (the CoCitation.coCitation shape)
    val keptCiters = e0.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .filter(col("od") <= maxOutDeg).select(col("src"))
    val e = e0.join(keptCiters, Seq("src"), "left_semi")
    val d = e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("d"))

    // ordered co-in-neighbor pairs (a ≠ b, both orientations kept so the
    // s2 propagation is one equi-join per leg)
    val cn = e.select(col("src").as("i"), col("dst").as("a"))
      .join(e.select(col("src").as("i"), col("dst").as("b")), "i")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))

    val withDeg = (df: DataFrame) => df
      .join(d.select(col("id").as("a"), col("d").as("da")), "a")
      .join(d.select(col("id").as("b"), col("d").as("db")), "b")

    val s1 = withDeg(cn).select(col("a"), col("b"),
      expr(s"($cNum * $scale * cn) div ($cDen * da * db)").as("s1"))

    // off-diagonal mass: push each s1(i,j) down one out-edge on each side
    val off = s1.filter(col("s1") > 0)
      .select(col("a").as("i"), col("b").as("j"), col("s1").as("v"))
      .join(e.select(col("src").as("i"), col("dst").as("oa")), "i")
      .join(e.select(col("src").as("j"), col("dst").as("ob")), "j")
      .filter(col("oa") =!= col("ob"))
      .groupBy(col("oa").as("a"), col("ob").as("b"))
      .agg(sum(col("v")).as("t_off"))

    val merged = cn.join(off, Seq("a", "b"), "full_outer")
      .select(col("a"), col("b"),
        coalesce(col("cn"), lit(0L)).as("cn"),
        coalesce(col("t_off"), lit(0L)).as("t_off"))

    withDeg(merged)
      .select(col("a"), col("b"), col("cn"),
        expr(s"($cNum * $scale * cn) div ($cDen * da * db)").as("s1"),
        expr(s"($cNum * (cn * $scale + t_off)) div ($cDen * da * db)").as("s2"))
      .filter(col("a") < col("b") && col("s2") > 0)
  }
}
