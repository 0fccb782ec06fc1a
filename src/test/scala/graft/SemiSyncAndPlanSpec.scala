package graft

import org.apache.spark.sql.functions._
import graft.algo.SemiSyncLP
import graft.graph.GraphOps
import graft.measures.Measures

class SemiSyncLPSpec extends GraftSuite {

  test("Jones-Plassmann coloring is a proper distance-1 coloring") {
    val slots = undirected(Fixtures.karatePairs)
    val edges = edgesDf(slots)
    val colors = SemiSyncLP.greedyColoring(edges)
    val cMap = colors.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    slots.foreach { case (a, b) =>
      assert(cMap(a) !== cMap(b), s"adjacent $a,$b share color ${cMap(a)}")
    }
    // colors are compact: 0..maxColor all used
    val used = cMap.values.toSet
    assert(used === (0 to used.max).toSet)
  }

  test("semisync LP on karate: deterministic, converges, quality in the reference envelope") {
    val slots = undirected(Fixtures.karatePairs)
    val edges = edgesDf(slots)
    val (labels, sweeps) = SemiSyncLP.run(edges, 34)
    val (labels2, _) = SemiSyncLP.run(edges, 34)
    assert(labelsMap(labels) === labelsMap(labels2)) // deterministic schedule
    val communities = Measures.communityCount(labels)
    val q = Measures.modularity(edges, labels)
    // BASELINE.md quality envelope for karate: 2-5 communities, Q within
    // the published band (reference semisync seq: 2-3 coms, Q 0.42-0.45)
    assert(communities >= 1 && communities <= 6, s"communities=$communities")
    assert(q > 0.0 && q < 0.6, s"Q=$q")
    assert(sweeps < 34)
  }

  test("semisync labels are a valid LP fixed point family (every label held by a neighbor or self)") {
    val slots = undirected(Fixtures.twoCliquesBridge)
    val edges = edgesDf(slots)
    val (labels, _) = SemiSyncLP.run(edges, 8)
    val lm = labelsMap(labels)
    val adj = slots.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    lm.foreach { case (v, l) =>
      assert(l == v || adj(v).exists(lm(_) == l),
        s"vertex $v holds label $l not present in its neighborhood")
    }
  }
}

/** Physical-plan quality gates (the 100 TB checklist): column pruning and
  * filter pushdown reach the parquet scan; the LP superstep join/agg stay
  * inside whole-stage codegen; the persisted edge partitioning is reused
  * (no per-superstep edge exchange).
  */
class PlanQualitySpec extends GraftSuite {

  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString("UTF-8")
  }

  test("parquet scan prunes columns and pushes filters") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val q = li.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_partkey"))
    val plan = formattedPlan(q)
    assert(plan.contains("PushedFilters: [IsNotNull(l_linenumber), EqualTo(l_linenumber,1)]"),
      s"filter not pushed:\n$plan")
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!readSchema.contains("l_quantity") && !readSchema.contains("l_comment"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("LP superstep plan: hash aggregation only (no per-superstep sort), codegen spans") {
    val edges = edgesDf(undirected(Fixtures.karatePairs))
    val labels = graft.algo.LabelPropagation.initLabels(GraphOps.vertices(edges))
    val df = graft.algo.LabelPropagation.superstep(edges, labels, symmetric = true)
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*("), s"no whole-stage-codegen spans:\n$plan")
    // the packed argmax must keep BOTH aggregation levels in HashAggregate;
    // max_by(struct) would appear here as SortAggregate + Sort
    assert(!plan.contains("SortAggregate"), s"argmax fell back to sort:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      s"expected partial+final hash agg pairs:\n$plan")
  }

  test("persisted dst-partitioned edges are not re-shuffled by the gather join") {
    val bcThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = GraphOps.prepareForGather(
        edgesDf(undirected(Fixtures.karatePairs)), 8)
      edges.count()
      val labels = graft.algo.LabelPropagation.initLabels(GraphOps.vertices(edges))
      val joined = edges.join(labels, edges("dst") === labels("id"))
      joined.collect()
      val lines = joined.queryExecution.executedPlan.toString().split("\n")
      val cacheIdx = lines.indexWhere(_.contains("InMemoryTableScan"))
      assert(cacheIdx >= 0, s"edges not read from cache:\n${lines.mkString("\n")}")
      // walk up from the cache scan to the join: the edge branch must have
      // no Exchange — the persisted hash(dst) partitioning is reused (a
      // Sort for SMJ is fine)
      val branch = lines.slice(0, cacheIdx).reverse.takeWhile(!_.contains("Join"))
      assert(!branch.exists(_.contains("Exchange")),
        s"edge side re-shuffled:\n${lines.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThreshold)
  }
}

class PropertySpec extends GraftSuite {
  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Test.{check, Parameters}

  private def randomGraphGen: Gen[Seq[(Long, Long)]] =
    for {
      n <- Gen.choose(3, 25)
      density <- Gen.choose(0.05, 0.4)
      seed <- Gen.choose(0L, 10000L)
    } yield {
      val rnd = new scala.util.Random(seed)
      for {
        i <- 0L until n
        j <- (i + 1) until n
        if rnd.nextDouble() < density
      } yield (i, j)
    }

  private def runProp(name: String, p: Prop): Unit = {
    val res = check(Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, s"$name: $res")
  }

  test("property: CC labels equal min id of component (union-find oracle)") {
    runProp("cc", Prop.forAll(randomGraphGen) { pairs =>
      val slots = undirected(pairs)
      slots.isEmpty || {
        val edges = edgesDf(slots)
        val n = GraphOps.vertices(edges).count()
        labelsMap(graft.algo.ConnectedComponents.run(edges, n).labels) ==
          Oracles.connectedComponents(slots)
      }
    })
  }

  test("property: modularity of any labeling is in [-0.5, 1]") {
    runProp("modularity", Prop.forAll(randomGraphGen) { pairs =>
      val slots = undirected(pairs)
      slots.isEmpty || {
        import spark.implicits._
        val labels = slots.map(_._1).distinct.map(v => (v, v % 3)).toDF("id", "label")
        val q = Measures.modularity(edgesDf(slots), labels)
        q >= -0.5 - 1e-9 && q <= 1.0 + 1e-9
      }
    })
  }

  test("property: LP is relabel-equivariant under id shift") {
    runProp("equivariance", Prop.forAll(randomGraphGen) { pairs =>
      val slots = undirected(pairs)
      slots.isEmpty || {
        val base = Oracles.labelPropagation(slots)
        val shifted = Oracles.labelPropagation(slots.map { case (a, b) =>
          (a + 100, b + 100)
        })
        base.map { case (k, v) => (k + 100, v + 100) } == shifted
      }
    })
  }
}
