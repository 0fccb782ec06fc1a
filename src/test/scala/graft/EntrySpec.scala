package graft

import graft.engine.Convergence

/** Guards the driver's smoke gate (entry rows>0) and the convergence
  * estimator's behavior.
  */
class EntrySpec extends GraftSuite {

  test("flagship entry: pages → edges → LP → per-url communities, rows > 0") {
    val out = SparkEntry.entry(spark)
    assert(out.columns.toSeq === Seq("url", "community"))
    assert(out.count() > 0)
  }

  test("every query in SparkEntry.queries returns rows at sf0.001") {
    // d_ngram_jaccard legitimately returns 0 rows when no near-dups exist
    // at a scale; everything else must produce output
    val allowEmpty = Set("d_ngram_jaccard", "d_simhash_dups", "e_cos_dups",
      "d_dedup_pipeline")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(allowEmpty(name) || n > 0, s"$name returned 0 rows")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("curve-fit early stop: fires on a 1/x community curve, not on a flat noisy one") {
    val conv = new Convergence(earlyStop = true)
    // absolute RMSE (reference get_recm semantics): use an EXACT b/x curve
    // (27720 = lcm(1..12)) so the residual of the fitted curve is ~0
    val decay = (1 to 12).map(t => 27720L / t)
    assert(conv.curveFitRmse(decay) < 0.4)
    val noisy = Seq.fill(12)(500L).zipWithIndex.map { case (v, i) => v + (i % 2) * 400 }
    assert(conv.curveFitRmse(noisy) >= 0.4)
  }
}
