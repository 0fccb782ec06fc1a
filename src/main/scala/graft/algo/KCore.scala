package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphOps

/** k-core decomposition by distributed peeling — the standard
  * spam-farm / link-ring detector over a web link graph (a dense core
  * survives peeling; organic pages don't).
  *
  * One peel round removes every vertex whose CURRENT degree (within the
  * surviving subgraph) is below k:
  *
  *   V_t = { v ∈ V_{t-1} : deg_{G[V_{t-1}]}(v) ≥ k }
  *
  * Round cost: one semi-join restricting the edge table to surviving
  * endpoints (bounded by the surviving edge set, shrinking every round)
  * plus one partial-aggregated degree count — no all-pairs anything, so
  * the 100 TB shape is scan + 2 shuffles per round, on a monotonically
  * shrinking input. The fixed point (usually ≤ tens of rounds on web
  * graphs) is the exact k-core.
  *
  * The surviving-vertex state feeds two semi-joins per round, so each
  * round eagerly truncates lineage (twice-referenced state in a lazy
  * chain doubles the plan per round).
  */
object KCore {

  /** k must be ≥ 1: vertices whose surviving degree drops to 0 vanish
    * from the degree groupBy and are peeled unconditionally, so k ≤ 0
    * would silently return the 1-core instead of "all vertices" (and
    * isolated vertices are never in the vertex set to begin with —
    * vertices are edge endpoints). Guarded rather than patched: the
    * 0-core of an edge-defined graph is just `vertices(edges)`
    * (ADVICE r3).
    */
  private def requireValidK(k: Long): Unit =
    require(k >= 1, s"k-core requires k >= 1 (got $k); the 0-core is " +
      "GraphOps.vertices(edges) by definition")

  /** Exactly `rounds` peel rounds — the gate-able fixed-schedule form
    * (after convergence it equals the true k-core).
    */
  def peelFixed(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    requireValidK(k)
    val e = GraphOps.symmetrize(edges.select("src", "dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var alive = GraphOps.vertices(e)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var r = 0
    while (r < rounds) {
      r += 1
      val sub = e
        .join(alive.select(col("id").as("sid")), col("src") === col("sid"), "left_semi")
        .join(alive.select(col("id").as("did")), col("dst") === col("did"), "left_semi")
      val next = sub.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("id"))
        .localCheckpoint(eager = true)
      alive.unpersist(blocking = false)
      alive = next
    }
    e.unpersist(blocking = false)
    alive
  }

  /** Peel to the fixed point: the exact k-core vertex set. Returns
    * (core vertices, rounds run, converged).
    */
  def kCore(edges: DataFrame, k: Long,
            maxRounds: Int = 10000): (DataFrame, Int, Boolean) = {
    requireValidK(k)
    val e = GraphOps.symmetrize(edges.select("src", "dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var alive = GraphOps.vertices(e)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var n = alive.count()
    var r = 0
    var converged = false
    while (!converged && r < maxRounds && n > 0L) {
      r += 1
      val sub = e
        .join(alive.select(col("id").as("sid")), col("src") === col("sid"), "left_semi")
        .join(alive.select(col("id").as("did")), col("dst") === col("did"), "left_semi")
      val next = sub.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("id"))
        .localCheckpoint(eager = true)
      val m = next.count()
      // an unchanged survivor set is the fixed point — and so is an empty
      // one (the k-core does not exist; nothing left to peel)
      converged = m == n || m == 0L
      n = m
      alive.unpersist(blocking = false)
      alive = next
    }
    e.unpersist(blocking = false)
    (alive, r, converged)
  }
}
