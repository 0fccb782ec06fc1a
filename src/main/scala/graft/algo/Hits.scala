package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphOps

/** HITS (Kleinberg hubs & authorities) — the classic companion to
  * PageRank on a DIRECTED web graph: a good hub points at good
  * authorities, a good authority is pointed at by good hubs.
  *
  *   a_k(v) = Σ_{u→v} h_{k-1}(u)   then L1-normalize
  *   h_k(u) = Σ_{u→v} a_k(v)       then L1-normalize
  *
  * Each half-step is the PageRank skeleton run in one direction: an
  * equi-join against the score table on that direction's pre-partitioned
  * edge copy (edges never move after setup) plus one partial-aggregated
  * groupBy — per iteration only vertex-sized tables cross the wire. The
  * L1 norm is a scalar aggregate per half-step (the same driver-side
  * scalar PageRank pays for dangling mass); at 10^12 edges both
  * half-steps stay partial-aggregated and no stage holds more than the
  * vertex table.
  *
  * Unlike the engine's other demo-graph gates this one runs on the raw
  * DIRECTED edge set — hub and authority scores collapse to the same
  * vector on a symmetrized graph.
  */
object Hits {

  /** Fixed-iteration HITS. Returns (id, auth, hub) for every vertex of
    * the directed graph, L1-normalized (Σauth = Σhub = 1).
    */
  def runFixed(edges: DataFrame, iterations: Int,
               partitions: Int = 32): DataFrame = {
    // Each iteration gathers in BOTH directions: authorities join on src,
    // hubs join on dst. One copy of the edge table per gather key, each
    // partitioned once and never reshuffled — the "edges partitioned
    // once" rule applied twice (2× edge storage buys zero per-iteration
    // edge movement, the right trade at any scale).
    val eSrc = edges.select(col("src"), col("dst"))
      .repartition(partitions, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eDst = edges.select(col("src"), col("dst"))
      .repartition(partitions, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = GraphOps.vertices(eSrc).persist(StorageLevel.MEMORY_AND_DISK)
    val n = verts.count()

    var scores = verts.select(col("id"),
        lit(1.0 / n).as("auth"), lit(1.0 / n).as("hub"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    while (iter < iterations) {
      iter += 1
      // authority update: gather hub mass along edge direction
      val aRaw = eSrc.join(scores.select(col("id").as("hid"), col("hub")),
          col("src") === col("hid"))
        .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("a"))
      val aJoined = verts.join(aRaw, Seq("id"), "left")
        .select(col("id"), coalesce(col("a"), lit(0.0)).as("a"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val aSum = aJoined.agg(sum("a")).first().getDouble(0)
      val auth = aJoined.select(col("id"), (col("a") / aSum).as("auth"))
      // hub update: gather the NEW authority mass against edge direction
      val hRaw = eDst.join(auth.select(col("id").as("aid"), col("auth").as("av")),
          col("dst") === col("aid"))
        .groupBy(col("src").as("id")).agg(sum(col("av")).as("h"))
      val hJoined = verts.join(hRaw, Seq("id"), "left")
        .select(col("id"), coalesce(col("h"), lit(0.0)).as("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hSum = hJoined.agg(sum("h")).first().getDouble(0)
      val next = auth
        .join(hJoined.select(col("id").as("hid2"), (col("h") / hSum).as("hub")),
          col("id") === col("hid2"))
        .select(col("id"), col("auth"), col("hub"))
        .localCheckpoint(eager = true)
      aJoined.unpersist(blocking = false)
      hJoined.unpersist(blocking = false)
      scores.unpersist(blocking = false)
      scores = next
    }
    eSrc.unpersist(blocking = false)
    eDst.unpersist(blocking = false)
    verts.unpersist(blocking = false)
    scores
  }
}
