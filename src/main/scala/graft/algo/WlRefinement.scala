package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphOps

/** Weisfeiler–Lehman color refinement (1-WL): iteratively re-color every
  * vertex by hashing its own color together with the SORTED multiset of
  * its neighbors' colors —
  *
  *   c₀(v)   = md5("d:" ++ deg(v))
  *   c_t(v)  = md5(c_{t-1}(v) ++ "|" ++ sorted-join(c_{t-1}(N(v))))
  *
  * After k rounds two vertices share a color iff their depth-k rooted
  * neighborhood trees are isomorphic — the standard structural-role
  * fingerprint (graph dedup, role discovery, GNN expressiveness bound).
  * Every step is deterministic string hashing, so the driver gate is
  * byte-exact.
  *
  * Plan: per round one equi-join (colors gathered over the edge table)
  * + one hash aggregate building the per-vertex signature. The signature
  * is a degree-bounded sorted concat — fine up to moderate hub degrees;
  * at web-scale hubs, swap the multiset signature for a grouped
  * (color, count) pair list or a sum of per-color hashes in Decimal —
  * the round structure is unchanged. Color state is referenced twice per
  * round (own color + gather), so rounds materialize eagerly.
  */
object WlRefinement {

  /** `rounds` WL refinement sweeps over the symmetrized edge table;
    * returns (id, color) with color the final round's md5 hex.
    */
  def refine(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0)
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var colors = GraphOps.degrees(e)
      .select(col("id"),
        md5(concat(lit("d:"), col("degree").cast("string"))).as("color"))
      .transform(graft.engine.Materialize.eager)
    var r = 0
    while (r < rounds) {
      r += 1
      val sig = e
        .join(colors.select(col("id").as("src"), col("color").as("nc")), "src")
        .groupBy(col("dst").as("id"))
        .agg(concat_ws(",", sort_array(collect_list(col("nc")))).as("sig"))
      colors = colors
        .join(sig, Seq("id"), "left")
        .select(col("id"),
          md5(concat(col("color"), lit("|"), coalesce(col("sig"), lit(""))))
            .as("color"))
        .transform(graft.engine.Materialize.eager)
    }
    e.unpersist(blocking = false)
    colors
  }

  /** Color-class histogram after `rounds` sweeps: (color, n) — the
    * canonical-form summary two graphs must share to be 1-WL-equivalent.
    */
  def colorHistogram(edges: DataFrame, rounds: Int): DataFrame =
    refine(edges, rounds).groupBy("color").agg(count(lit(1)).as("n"))
}
