package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the round-5 session-2 operators: the scale
  * properties (no cartesian, bounded windows, broadcast-only small sides)
  * asserted on executed plans so refactors cannot silently regress them.
  */
class Round5dPlanSpec extends GraftSuite {
  import spark.implicits._

  test("SCAN never materializes a cartesian or a per-vertex window") {
    val e = edgesDf(undirected(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L))))
    val out = graft.algo.Scan.structuralClusters(e, epsE3 = 500L, mu = 2L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"),
      s"SCAN must be join+agg only, no window:\n$plan")
  }

  test("sequence packing windows partition by source") {
    val docs = (1L to 40L).map(i => (i, "a b c d e", s"s${i % 4}"))
      .toDF("doc_id", "text", "source")
    val out = graft.text.CorpusClean.packSequences(docs, binTokens = 8L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("partitionBy" + "=[source]")
        || plan.matches("(?s).*Window.*\\[source.*"),
      s"the packing window must partition by source:\n$plan")
  }

  test("Gini computes without any per-user window") {
    val ev = (1L to 50L).map(i => (i % 7, i, i))
      .toDF("user_id", "event_id", "es")
      .select(col("user_id"), col("event_id"),
        col("es").cast("timestamp").as("ts"))
    val out = graft.streaming.Funnel.giniConcentration(ev)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    // the one window runs over distinct count VALUES, so its input is an
    // aggregate, never the raw per-user table
    assert(!plan.contains("partitionBy=[user_id]"),
      s"no user-keyed window allowed:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("Markov stationary state never touches the raw event table size") {
    val ev = (1L to 60L).map(i => (i % 5, i, i, s"t${i % 3}"))
      .toDF("user_id", "event_id", "es", "event_type")
      .select(col("user_id"), col("event_id"),
        col("es").cast("timestamp").as("ts"), col("event_type"))
    val out = graft.streaming.Funnel.markovStationary(ev, iters = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("minhash calibration joins only candidate pairs, never all docs") {
    // candidates come from band equality; the est/common joins key on
    // (a) and (b, ...) — assert no cartesian survives in the gate plan
    val out = graft.queries.PipelineQueries
      .queries("d_minhash_calib")(spark, "/root/testdata/sf0.001")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
