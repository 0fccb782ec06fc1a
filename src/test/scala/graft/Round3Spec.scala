package graft

import org.apache.spark.sql.functions._
import graft.algo.{Betweenness, LabelPropagation, PageRank}
import graft.engine.{Checkpointer, Superstep}
import graft.graph.GraphOps

/** Round-3 additions: storage-footprint bound for fixed-iteration
  * PageRank, Hadoop-FS checkpointer (file:-scheme paths + validated resume
  * point), weighted packed-argmax budget fallback, and the shared BFS
  * depth cap.
  */
class PageRankFootprintSpec extends GraftSuite {

  test("runFixed frees superseded rank tables (stable persistent-RDD count)") {
    val edges = GraphOps.prepareForGather(
      edgesDf(undirected(Fixtures.karatePairs)), 4)
    edges.count()
    val before = spark.sparkContext.getPersistentRDDs.size
    val ranks = PageRank.runFixed(edges, iterations = 12, partitions = 4)
    ranks.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // verts + edgesDeg + dangling + final ranks + at most one live
    // checkpoint — NOT one rank table per iteration (12 would leak here)
    assert(after - before <= 6,
      s"persistent RDDs grew by ${after - before}; superseded ranks leak")
    // and the values still match the convergent-run oracle shape
    val s = ranks.agg(sum("rank")).first().getDouble(0)
    assert(math.abs(s - 1.0) < 1e-6)
    edges.unpersist(blocking = false)
  }
}

class CheckpointerFsSpec extends GraftSuite {

  test("checkpointer works against an explicit file:-scheme Hadoop path") {
    val local = java.nio.file.Files.createTempDirectory("graft-fs").toString
    val cp = new Checkpointer(s"file:$local", spark)
    val edges = GraphOps.prepareForGather(
      edgesDf(undirected(Fixtures.karatePairs)), 4)
    val n = GraphOps.vertices(edges).count()
    val r = LabelPropagation.run(edges, n, checkpointer = Some(cp),
      checkpointEvery = 1, maxIter = Some(2), symmetric = true)
    assert(r.iterations === 2)
    // metrics round-trip through the Hadoop FileSystem API
    val metrics = cp.readMetrics("lp")
    assert(metrics.map(_.iteration) === Seq(1, 2))
    // latest + validatedLatest agree on a clean directory
    assert(cp.latest("lp").get._1 === 2)
    assert(cp.validatedLatest("lp").get._1 === 2)
    // pruneAbove deletes through the same API
    cp.pruneAbove("lp", 1)
    assert(cp.latest("lp").get._1 === 1)
    edges.unpersist(blocking = false)
  }

  test("validatedLatest skips snapshots without a metrics entry or _SUCCESS") {
    val local = java.nio.file.Files.createTempDirectory("graft-val").toString
    val cp = new Checkpointer(local, spark)
    val edges = GraphOps.prepareForGather(
      edgesDf(undirected(Fixtures.twoCliquesBridge)), 4)
    val n = GraphOps.vertices(edges).count()
    val r = LabelPropagation.run(edges, n, checkpointer = Some(cp),
      checkpointEvery = 1, maxIter = Some(2), symmetric = true)
    // a "farther-advanced" snapshot from a crashed run: parquet is
    // complete (_SUCCESS exists) but it never reached the metrics log
    r.labels.write.mode("overwrite").parquet(s"$local/lp/labels/iter=9")
    assert(cp.latest("lp").get._1 === 9)
    assert(cp.validatedLatest("lp").get._1 === 2)
    // a torn snapshot: directory exists, no _SUCCESS — also skipped even
    // if a matching metrics entry existed
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$local/lp/labels/iter=8"))
    assert(cp.validatedLatest("lp").get._1 === 2)
    // pruning relative to the VALIDATED point removes both stale dirs
    cp.pruneAbove("lp", cp.validatedLatest("lp").get._1)
    assert(cp.latest("lp").get._1 === 2)
    edges.unpersist(blocking = false)
  }
}

class WeightedBudgetSpec extends GraftSuite {

  private def weighted(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("src", "dst", "weight")
  }

  test("packedBudgetOkWeighted bounds per-vertex weight sums, not degree") {
    // degree 2 (fits 23 bits trivially) but weight sums of 2^24 — packed
    // argmax would corrupt the count field
    val heavy = weighted(Seq(
      (0L, 1L, 1L << 23), (0L, 2L, 1L << 23),
      (1L, 0L, 1L), (2L, 0L, 1L)))
    assert(!LabelPropagation.packedBudgetOkWeighted(heavy))
    val light = weighted(Seq((0L, 1L, 5L), (1L, 0L, 5L)))
    assert(LabelPropagation.packedBudgetOkWeighted(light))
  }

  test("superstepWeighted auto-falls back to the unpacked argmax and stays correct") {
    // vertex 0 hears label 1 with weight 2^23+2 and label 2 with weight
    // 2^23+1: a packed (cnt<<40 | ...) encoding overflows the count field;
    // the correct winner is label 1
    val big = (1L << 23)
    val e = weighted(Seq(
      (0L, 1L, big + 2), (0L, 2L, big + 1),
      (1L, 0L, 1L), (2L, 0L, 1L)))
    val init = LabelPropagation.initLabels(
      GraphOps.vertices(e.select(col("src"), col("dst"))))
    val out = labelsMap(LabelPropagation.superstepWeighted(e, init, symmetric = true))
    assert(out(0L) === 1L)
    // and it agrees with the explicitly-unpacked path
    val unpacked = labelsMap(LabelPropagation.superstepWeighted(e, init,
      symmetric = true, packedArgmax = Some(false)))
    assert(out === unpacked)
  }
}

class DepthCapSpec extends GraftSuite {

  test("bfsLevels truncates at maxDepth (shared with the oracle bound)") {
    // path 0-1-2-3-4-5, source 0: untruncated eccentricity 5
    val path = undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val e = edgesDf(path)
    val src = spark.range(1).select(lit(0L).as("id"))
    val full = Betweenness.bfsLevels(e, src)
    assert(full.agg(max("dist")).first().getLong(0) === 5L)
    val capped = Betweenness.bfsLevels(e, src, maxDepth = 2)
    assert(capped.agg(max("dist")).first().getLong(0) === 2L)
    assert(capped.count() === 3L) // dists 0,1,2 only
  }

  test("betweenness run honors maxDepth consistently with its forward pass") {
    val path = undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val e = edgesDf(path)
    val src = spark.range(1).select(lit(0L).as("id"))
    // depth 1: only vertex 1 is reached; no 2-hop paths ⇒ all deltas 0
    val bc = Betweenness.run(e, src, maxDepth = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bc.keySet === Set(1L))
    assert(bc(1L) === 0.0)
  }
}
