package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphOps

/** Strongly connected components of the DIRECTED link graph — the
  * operator behind the web's bow-tie decomposition (giant SCC, IN, OUT,
  * tendrils). Complements [[ConnectedComponents]] (undirected) the way
  * HITS complements PageRank: it is the second operator in the engine
  * that consumes the raw edge direction.
  *
  * Algorithm: the coloring / forward-max algorithm (Orzan's FB-coloring,
  * the standard Pregel-style SCC — Tarjan is inherently sequential):
  *
  *   repeat until no vertices remain:
  *     1. COLOR: propagate color(v) = max(v, max_{u→v} color(u)) to the
  *        fixpoint over the remaining subgraph — color(v) is the largest
  *        vertex id that forward-reaches v. Every color class c contains
  *        its root c (if some w > c reached c, everything c reaches would
  *        be colored ≥ w, contradiction).
  *     2. BACKWARD: multi-source BFS from all roots simultaneously along
  *        REVERSED edges, restricted to each root's own color class —
  *        the vertices that reach their root AND share its color are
  *        exactly the root's SCC (Orzan's theorem).
  *     3. Peel those SCCs off and repeat on the rest.
  *
  * Per outer round: one color fixpoint (O(longest remaining path)
  * supersteps of the CC skeleton with max instead of min) + one
  * multi-source backward BFS (O(SCC diameter) levels) — every step the
  * same gather join + partial-aggregated groupBy shape as LP/CC, nothing
  * ever touches edges². Web graphs finish in a handful of outer rounds
  * (one giant SCC plus trivial ones; each round removes at least every
  * current color root's SCC). Output labels are CANONICAL — each SCC is
  * labeled with its minimum member id — so results are independent of
  * the peeling order and directly comparable to a mutual-reachability
  * oracle.
  */
object StronglyConnected {

  /** (id, scc) for every vertex of the directed graph; scc = min member
    * id of the vertex's strongly connected component.
    */
  def run(edges: DataFrame, maxOuterRounds: Int = 100): (DataFrame, Int) = {
    val e0 = GraphOps.dropSelfLoops(edges.select(col("src"), col("dst")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var remaining = GraphOps.vertices(e0).persist(StorageLevel.MEMORY_AND_DISK)
    var nRemaining = remaining.count()
    val assigned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0
    while (nRemaining > 0L && outer < maxOuterRounds) {
      outer += 1
      // remaining subgraph (both endpoints alive)
      val sub = e0
        .join(remaining.select(col("id").as("sid")), col("src") === col("sid"), "left_semi")
        .join(remaining.select(col("id").as("did")), col("dst") === col("did"), "left_semi")
        .transform(graft.engine.Materialize.eager)
      // 1. forward max-color fixpoint
      var colors = remaining.select(col("id"), col("id").as("color"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      colors.count()
      var changed = 1L
      while (changed > 0L) {
        val gathered = sub
          .join(colors.select(col("id").as("cid"), col("color")), col("src") === col("cid"))
          .groupBy(col("dst").as("id")).agg(max(col("color")).as("inMax"))
        val next = colors.join(gathered, Seq("id"), "left")
          .select(col("id"),
            greatest(col("color"), coalesce(col("inMax"), col("color"))).as("color"))
          .localCheckpoint(eager = true)
        changed = next.join(colors.withColumnRenamed("color", "prev"), "id")
          .filter(col("color") =!= col("prev")).count()
        colors.unpersist(blocking = false)
        colors = next
      }
      // 2. backward BFS from every root within its own color class;
      //    visited(v) carries the root it reaches (= its color, so one
      //    column suffices)
      var visited = colors.filter(col("id") === col("color")).select(col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var frontier = visited
      var frontierN = frontier.count()
      while (frontierN > 0L) {
        // predecessors u of the frontier (edge u→v) with
        // color(u) == color(v) — the within-class restriction is safe:
        // every vertex on any v→root path of a same-color v is itself
        // colored by that root (the root reaches it, and a larger color
        // on it would contradict color(v) = root)
        val next = sub
          .join(frontier.select(col("id").as("fid")), col("dst") === col("fid"))
          .join(colors.select(col("id").as("fid2"), col("color").as("fcolor")),
            col("fid") === col("fid2"))
          .join(colors.select(col("id").as("uid"), col("color").as("ucolor")),
            col("src") === col("uid"))
          .filter(col("ucolor") === col("fcolor"))
          .select(col("src").as("id")).distinct()
          .join(visited, Seq("id"), "left_anti")
          .localCheckpoint(eager = true)
        frontierN = next.count()
        if (frontierN > 0L) {
          val newVisited = visited.union(next).distinct()
            .transform(graft.engine.Materialize.eager)
          visited.unpersist(blocking = false)
          visited = newVisited
        }
        frontier = next
      }
      // the visited set of this round: all vertices that backward-reach
      // their color root within the class → SCC membership keyed by color
      val sccs = visited.join(colors, Seq("id"))
        .select(col("id"), col("color").as("root"))
        .localCheckpoint(eager = true)
      assigned += sccs
      val newRemaining = remaining.join(sccs.select(col("id")), Seq("id"), "left_anti")
        .transform(graft.engine.Materialize.eager)
      remaining.unpersist(blocking = false)
      visited.unpersist(blocking = false)
      colors.unpersist(blocking = false)
      sub.unpersist(blocking = false)
      remaining = newRemaining
      nRemaining = remaining.count()
    }
    require(nRemaining == 0L,
      s"SCC peeling did not converge in $maxOuterRounds rounds")
    if (assigned.isEmpty) { // empty edge set: no vertices, no rounds
      e0.unpersist(blocking = false)
      return (edges.sparkSession.range(0)
        .select(col("id"), col("id").as("scc")), 0)
    }
    // canonical labels: scc = min member id per root
    val membership = assigned.reduce(_ union _)
    val canon = membership.groupBy(col("root")).agg(min(col("id")).as("scc"))
    val out = membership.join(canon, "root").select(col("id"), col("scc"))
    e0.unpersist(blocking = false)
    (out, outer)
  }
}
