package graft

import org.apache.spark.sql.functions._
import graft.text.{CorpusClean, TextIndex, Winnow}

/** Plan-shape assertions for the round-4g operators: the properties that
  * decide whether each plan survives a 100× scale-up, asserted on the
  * executed plan so a refactor cannot silently regress them.
  */
class Round4gPlanSpec extends GraftSuite {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("chunking is a pure scan — zero exchanges in the plan") {
    val d = docsDf((1L to 50L).map(i => i -> s"a b c d e f g h $i"): _*)
    val ck = CorpusClean.chunk(d, window = 4, stride = 3)
    ck.collect()
    val plan = ck.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"chunking should not shuffle:\n$plan")
  }

  test("pq codebook attaches by broadcast, never a shuffled join") {
    val vecs = (0L until 60L)
      .map(i => (i, Array.tabulate(8)(j => (i * 7 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val pq = graft.functions.Similarity.pqCodes(vecs, blocks = 2, dim = 8,
      centStride = 10)
    pq.collect()
    val plan = pq.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"),
      s"pq codebook join must broadcast:\n$plan")
  }

  test("phrase-query top-1 plans as TakeOrdered, occurrences join broadcasts") {
    val d = docsDf((1L to 30L).map(i => i -> "the web graph the web"): _*)
    val ph = TextIndex.topBigramOccurrences(d)
    ph.collect()
    val plan = ph.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-1 bigram should plan as TakeOrdered:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("winnowing windows are doc-partitioned (no single-partition window)") {
    val d = docsDf((1L to 20L).map(i => i -> "a b c d e f g h i j"): _*)
    val plan = Winnow.fingerprints(d, k = 4, w = 4)
      .queryExecution.executedPlan.toString()
    // every Window in the plan carries a partition spec on doc_id
    val bad = plan.linesIterator.filter(_.contains("Window "))
      .exists(!_.contains("doc_id"))
    assert(!bad, s"winnowing window lost its doc partitioning:\n$plan")
  }

  test("sparsification ranking window partitions by vertex") {
    val e = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L))))
    val plan = graft.algo.TriangleCount.sparsifyTopOverlap(e, 2)
      .queryExecution.executedPlan.toString()
    val bad = plan.linesIterator.filter(_.contains("Window "))
      .exists(!_.contains("v#"))
    assert(!bad, s"sparsify window must partition by vertex v:\n$plan")
  }
}
