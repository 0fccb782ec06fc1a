package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the round-5 continuation operators — the
  * scale properties (bucketed joins only, broadcast-only small sides, no
  * cartesian blowups, bounded windows) pinned on executed plans.
  */
class Round5qPlanSpec extends GraftSuite {
  import spark.implicits._

  test("landmark distances never build a cartesian: landmark-sliced joins") {
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))))
    val pairs = Seq((2L, 4L), (1L, 5L)).toDF("src", "dst")
    val out = graft.algo.Centrality.landmarkDistances(
      e, Seq(1L, 3L).toDF("id"), pairs)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("SQ audit broadcasts the 64-row range table, no window anywhere") {
    val v = (1L to 30L).map(i => (i, Array(i.toFloat, (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val out = graft.functions.Similarity.scalarQuantAudit(v)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"the per-dim range table must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"SQ is scan+agg only:\n$plan")
  }

  test("media near-dup joins on (block, digest) buckets, never all pairs") {
    val m = (1L to 20L).map(i => (i, "x" * 40 + i.toString))
      .toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "UTF-8").as("bytes"))
    val out = graft.media.Media.nearDupBlocks(m)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"the candidate join must be an equi-join on (block, digest):\n$plan")
  }

  test("PQ ADC search touches no raw vectors after coding: hash join on codes") {
    val v = (0L to 40L).map(i => (i, Array.fill(8)((i % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val out = graft.functions.Similarity.pqTopK(
      v, v.filter(col("vec_id") % 10 === 0), k = 3, blocks = 4, dim = 8)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    // the codes ⋈ distance-table join is an equi-join on (block, code);
    // the only nested-loop joins are the two broadcast crossJoins that
    // BUILD the lookup table (queries × 64-row blocks × centroids)
    assert(!plan.contains("CartesianProduct"), plan)
    // per-query ranking window partitions by qid, never global
    assert(!plan.matches("(?s).*Window.*partitionBy=\\[\\].*"),
      s"ranking window must partition by qid:\n$plan")
  }

  test("label spreading state is gather-shaped: no window, no cartesian") {
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L))))
    val seeds = Seq((1L, 0L)).toDF("id", "cls")
    val out = graft.algo.LabelSpreading.run(e, seeds, 0.5, 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), s"spreading is join+agg only:\n$plan")
  }

  test("structural twins: one agg per vertex, class join keyed on signature") {
    val e = edgesDf(undirected(Seq((0L, 1L), (0L, 2L), (0L, 3L))))
    val out = graft.graph.GraphOps.structuralTwins(e)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
