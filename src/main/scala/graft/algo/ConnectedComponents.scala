package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Checkpointer, Superstep}
import graft.graph.GraphOps

/** Connected components as min-label propagation (north_rule:
  * "min-label/mode-label updates"). Same gather/aggregate skeleton as
  * [[LabelPropagation]] with `min` replacing the mode-argmax; the update
  * is monotone, hence deterministic and exactly testable: at convergence
  * every vertex's label equals the minimum vertex id of its component.
  *
  * Scale: converges in O(diameter) supersteps on the dst-partitioned edge
  * table. For very-high-diameter graphs the classic large-star/small-star
  * contraction would cut iterations; web link graphs have small effective
  * diameter so plain min-propagation is the right default, and the
  * superstep metrics expose iteration counts to detect the exception.
  */
object ConnectedComponents {

  def superstep(edges: DataFrame, labels: DataFrame): DataFrame = {
    val msgs = edges.join(labels, edges("dst") === labels("id"))
      .select(edges("src").as("id"), labels("label"))
    val neighborMin = msgs.groupBy("id").agg(min(col("label")).as("nbMin"))
    labels.join(neighborMin, Seq("id"), "left")
      .select(col("id"),
        least(col("label"), coalesce(col("nbMin"), col("label"))).as("label"))
  }

  def run(
      edges: DataFrame,
      nNodes: Long,
      checkpointer: Option[Checkpointer] = None,
      checkpointEvery: Int = 5,
      maxIter: Option[Int] = None): Superstep.Result = {
    val init = LabelPropagation.initLabels(GraphOps.vertices(edges))
    // Early-stop/plateau heuristics are for LP's noisy community curve; CC
    // is monotone so only the exact changes==0 rule applies.
    Superstep.run("cc", init, labels => superstep(edges, labels), nNodes,
      earlyStop = false, plateau = false,
      checkpointer = checkpointer, checkpointEvery = checkpointEvery,
      maxIter = maxIter)
  }
}
