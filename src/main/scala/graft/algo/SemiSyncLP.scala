package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.engine.Superstep
import graft.graph.GraphOps

/** Graph coloring + semi-synchronous label propagation (reference
  * `getGraphColors` `algorithms.h:476-539` and
  * `labelPropagationSemiSynchSeq` `algorithms.h:551-635` /
  * `LPParallelSemySynchronous` `algorithms.h:918-1071`).
  *
  * The reference colors greedily in sequential node order — inherently
  * serial. The engine uses Jones–Plassmann with vertex id as priority:
  * each round, every uncolored vertex that is the id-minimum among its
  * uncolored neighbors takes the smallest color absent from its
  * already-colored neighborhood. Deterministic, distributed, produces a
  * proper distance-1 coloring (not necessarily the reference's ordering —
  * any proper coloring yields the same semisync guarantee: no two
  * adjacent vertices update in the same sub-step).
  *
  * Semi-sync LP then sweeps color classes in ascending order, updating
  * one class per sub-step against the CURRENT labels (Gauss–Seidel
  * within a sweep) — with the engine's pinned tie-break this schedule is
  * fully deterministic, unlike the reference's.
  */
object SemiSyncLP {

  /** Proper distance-1 coloring: (id, color). */
  def greedyColoring(edges: DataFrame, maxRounds: Int = 200): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var state = GraphOps.vertices(edges)
      .select(col("id"), lit(null).cast("int").as("color"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var round = 0
    var remaining = state.filter(col("color").isNull).count()
    while (remaining > 0 && round < maxRounds) {
      round += 1
      val unc = state.filter(col("color").isNull).select(col("id"))
      val uncS = unc.select(col("id").as("usrc"))
      val uncD = unc.select(col("id").as("udst"))
      // id-minimum among uncolored neighbors → winner this round
      val uncEdges = e
        .join(uncS, e("src") === col("usrc"))
        .join(uncD, e("dst") === col("udst"))
        .select(col("usrc").as("uid"), col("udst").as("nb"))
      val minNb = uncEdges.groupBy("uid").agg(min("nb").as("minNb"))
      val winners = unc
        .join(minNb.select(col("uid").as("id"), col("minNb")), Seq("id"), "left")
        .filter(col("minNb").isNull || col("id") < col("minNb"))
        .select(col("id").as("wid"))
      // smallest color not used by colored neighbors
      val coloredNb = e
        .join(winners, e("src") === col("wid"))
        .join(state.filter(col("color").isNotNull)
          .select(col("id").as("cid"), col("color")), e("dst") === col("cid"))
        .groupBy(col("wid")).agg(collect_set(col("color")).as("used"))
      val assigned = winners
        .join(coloredNb, Seq("wid"), "left")
        .select(col("wid").as("id"),
          element_at(
            filter(sequence(lit(0), coalesce(size(col("used")), lit(0))),
              c => !array_contains(coalesce(col("used"), array()), c)),
            1).as("newColor"))
      val next = state
        .join(assigned, Seq("id"), "left")
        .select(col("id"), coalesce(col("color"), col("newColor")).as("color"))
        .persist(StorageLevel.MEMORY_AND_DISK).localCheckpoint(eager = true)
      state.unpersist(blocking = false)
      state = next
      remaining = state.filter(col("color").isNull).count()
    }
    require(remaining == 0, s"coloring did not converge in $maxRounds rounds")
    state
  }

  /** Semi-synchronous LP: color classes updated one per sub-step within a
    * sweep; convergence rules as the sync driver (changes==0 / plateau /
    * cap).
    */
  def run(edges: DataFrame, nNodes: Long, maxSweeps: Option[Int] = None)
      : (DataFrame, Int) = {
    val colors = greedyColoring(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val nColors = colors.agg(max("color")).first().getInt(0) + 1
    var labels = LabelPropagation.initLabels(GraphOps.vertices(edges))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cap = maxSweeps.getOrElse(Superstep.maxIterations(nNodes))
    var sweep = 0
    var converged = false
    while (sweep < cap && !converged) {
      sweep += 1
      val before = labels // kept persisted until the sweep's change count
      var c = 0
      while (c < nColors) {
        val classIds = colors.filter(col("color") === c).select(col("id").as("cid"))
        val winners = LabelPropagation.superstep(edges, labels, symmetric = true)
          .join(classIds, col("id") === col("cid"), "left_semi")
          .select(col("id").as("wid2"), col("label").as("newLabel"))
        val next = labels
          .join(winners, labels("id") === col("wid2"), "left")
          .select(labels("id"), coalesce(col("newLabel"), col("label")).as("label"))
          .persist(StorageLevel.MEMORY_AND_DISK).localCheckpoint(eager = true)
        if (labels ne before) labels.unpersist(blocking = false)
        labels = next
        c += 1
      }
      val changes = labels
        .join(before.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") =!= col("prev")).count()
      before.unpersist(blocking = false)
      converged = changes == 0L
    }
    (labels, sweep)
  }
}
