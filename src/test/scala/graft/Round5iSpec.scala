package graft

import org.apache.spark.sql.functions._

/** Round-5 batch-16: edge embeddedness / local bridges, OPIC crawl
  * ordering, partition coverage + performance.
  */
class EmbeddednessSpec extends GraftSuite {
  import graft.algo.Truss

  test("triangle + pendant: overlap exact, pendant is the local bridge") {
    // triangle 1-2-3 with pendant 4 on vertex 3
    val e = edgesDf(undirected(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))))
    val rows = Truss.edgeEmbeddedness(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows((1L, 2L)) === ((1L, 1000000L, 0L))) // union = {3} alone
    assert(rows((1L, 3L)) === ((1L, 500000L, 0L)))  // union = {2, 4}
    assert(rows((2L, 3L)) === ((1L, 500000L, 0L)))
    assert(rows((3L, 4L)) === ((0L, 0L, 1L)))       // the weak tie
  }

  test("isolated dyad: empty neighborhood union reports overlap 0, bridge") {
    val e = edgesDf(undirected(Seq((7L, 8L))))
    val r = Truss.edgeEmbeddedness(e).first()
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((0L, 0L, 1L)))
  }
}

class OpicSpec extends GraftSuite {
  import graft.algo.PageRank

  test("3-cycle-ish directed graph: two hand-unrolled steps, cash conserved") {
    // 1->2, 2->1, 3->1 : no dangling, n = 3
    val e = edgesDf(Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    val r = PageRank.opicFixed(e, iterations = 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // step1 cash: (2/3, 1/3, 0); step2 cash: (1/3, 2/3, 0)
    assert(math.abs(r(1L)._1 - 1.0 / 3) < 1e-12)
    assert(math.abs(r(2L)._1 - 2.0 / 3) < 1e-12)
    assert(math.abs(r(3L)._1) < 1e-12)
    // hist: 1/3 + step1 + step2
    assert(math.abs(r(1L)._2 - 4.0 / 3) < 1e-12)
    assert(math.abs(r(2L)._2 - 4.0 / 3) < 1e-12)
    assert(math.abs(r(3L)._2 - 1.0 / 3) < 1e-12)
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-12)
  }

  test("dangling page refolds its cash uniformly; total stays 1 per step") {
    // 1->2 with 2 dangling, n = 2
    val e = edgesDf(Seq((1L, 2L)))
    val r = PageRank.opicFixed(e, iterations = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.25) < 1e-12)  // dm/n = 0.5/2
    assert(math.abs(r(2L) - 0.75) < 1e-12)  // 0.5 gathered + 0.25 refold
  }
}

class PartitionQualitySpec extends GraftSuite {
  import graft.measures.Measures

  // two 3-cliques joined by the bridge (3, 4)
  private def twoTriangles = edgesDf(undirected(
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L))))

  private def labels(f: Long => Long) = {
    import spark.implicits._
    (1L to 6L).map(id => (id, f(id))).toDF("id", "label")
  }

  test("the natural 2-clique partition: coverage 6/7, performance 14/15") {
    val r = Measures.partitionQuality(twoTriangles,
      labels(id => if (id <= 3) 0L else 1L)).first()
    assert(r.getLong(0) === 6L && r.getLong(1) === 7L && r.getLong(2) === 6L)
    assert(r.getLong(3) === math.round(6e6 / 7))
    // numer2x = 12 + (30 - 12) - 2 = 28 over total2x = 30
    assert(r.getLong(4) === math.round(28e6 / 30))
  }

  test("one giant community: coverage 1, performance = edge density") {
    val r = Measures.partitionQuality(twoTriangles, labels(_ => 0L)).first()
    assert(r.getLong(3) === 1000000L)
    // numer2x = 14 + (30 - 30) - 0 = 14 over 30
    assert(r.getLong(4) === math.round(14e6 / 30))
  }

  test("singletons: zero coverage, performance = non-edge fraction") {
    val r = Measures.partitionQuality(twoTriangles, labels(identity)).first()
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
    // numer2x = 0 + 30 - 14 = 16 over 30
    assert(r.getLong(4) === math.round(16e6 / 30))
  }
}

class CommModularitySpec extends GraftSuite {
  import graft.measures.Measures

  private def twoTriangles = edgesDf(undirected(
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))))

  private def labels(f: Long => Long) = {
    import spark.implicits._
    (1L to 6L).map(id => (id, f(id))).toDF("id", "label")
  }

  test("perfect partition of two triangles: Q_c = 1/3 each") {
    val r = Measures.perCommunityModularity(twoTriangles,
        labels(id => if (id <= 3) 0L else 1L)).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toMap
    assert(r(0L) === ((3L, 6L, 6L, 333333333L)))
    assert(r(1L) === ((3L, 6L, 6L, 333333333L)))
  }

  test("per-community contributions sum to the global modularity") {
    val e = edgesDf(undirected(Fixtures.karatePairs))
    val l = graft.graph.GraphOps.vertices(e)
      .select(org.apache.spark.sql.functions.col("id"),
        (org.apache.spark.sql.functions.col("id") % 4).as("label"))
    val sum = Measures.perCommunityModularity(e, l).collect()
      .map(_.getLong(4)).sum / 1e9
    val q = Measures.modularity(e, l)
    assert(math.abs(sum - q) < 1e-6)
  }
}

class UrlTemplateSpec extends GraftSuite {
  test("digit runs collapse to one template; counts and sample exact") {
    import spark.implicits._
    val u = Seq(
      (1L, "HTTP://WWW.A.EXAMPLE.com:80/p/12?utm_source=x"),
      (2L, "http://a.example.com/p/34/"),
      (3L, "http://a.example.com/x"))
      .toDF("doc_id", "url")
    val r = graft.text.UrlCanon.pathTemplates(u).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getString(3))).toMap
    assert(r(("a.example.com", "/p/N")) ===
      ((2L, "http://a.example.com/p/12")))
    assert(r(("a.example.com", "/x")) === ((1L, "http://a.example.com/x")))
  }
}

class CkCurveSpec extends GraftSuite {
  import graft.algo.TriangleCount

  test("triangle + pendant: exact per-degree means, degree-1 excluded") {
    val e = edgesDf(undirected(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))))
    val r = TriangleCount.clusteringByDegree(e).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r === Map(2L -> ((2L, 1000000L)), 3L -> ((1L, 333333L))))
  }
}

class SessionWindowNativeSpec extends GraftSuite {
  import org.apache.spark.sql.functions._

  test("an exact 1800 s gap MERGES; one microsecond past it breaks") {
    import spark.implicits._
    // gaps: exactly 1800 s (merges — closed boundary, same rule as the
    // custom ev_sessions state logic), then 1800 s + 1 us (breaks)
    val df = Seq((1L, 0L), (2L, 1800000000L), (3L, 3600000001L))
      .toDF("event_id", "us")
      .select(col("event_id"), lit(7L).as("user_id"),
        timestamp_micros(col("us")).as("ts"))
    val r = df.groupBy(col("user_id"),
        session_window(col("ts"), "1800 seconds").as("w"))
      .agg(count(lit(1)).as("events"))
      .select(unix_micros(col("w.start")), col("events"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(0L -> 2L, 3600000001L -> 1L))
  }
}

class HardNegativesSpec extends GraftSuite {
  import graft.functions.Similarity
  import org.apache.spark.sql.functions.col

  test("same-label vectors are never mined; ranks follow cosine") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), 7), (2L, Seq(1.0f, 0.0f), 7),
      (3L, Seq(0.9f, 0.1f), 8), (4L, Seq(0.0f, 1.0f), 8))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(vecs,
        vecs.filter(col("vec_id") === 1L), k = 3)
      .collect().map(x => x.getLong(2) -> x.getLong(1)).toMap
    // vec 2 shares label 7 with the query: excluded despite sim = 1
    assert(r === Map(1L -> 3L, 2L -> 4L))
  }
}

class CrossSourceDupSpec extends GraftSuite {
  test("identical docs across two sources surface as one canonical pair") {
    import spark.implicits._
    val txt = "alpha beta gamma delta epsilon zeta"
    val d = Seq((1L, txt, "web"), (2L, txt, "books"),
      (3L, "totally different words here entirely now", "web"))
      .toDF("doc_id", "text", "source")
    val p = graft.queries.PipelineQueries.minhashPairs(spark, d).collect()
    assert(p.length === 1)
    assert((p.head.getLong(0), p.head.getLong(1)) === ((1L, 2L)))
  }
}

class SmallWorldSpec extends GraftSuite {
  import graft.measures.Measures

  test("K4: every panel value hand-computable") {
    val k4 = edgesDf(
      for { x <- 1L to 4L; y <- 1L to 4L if x != y } yield (x, y))
    val r = Measures.smallWorldSigma(k4).first()
    assert(r.getLong(0) === 1000000L)              // C = 1
    assert(r.getLong(1) === 333333L)               // C_null = 1/3
    assert(r.getLong(2) === 1000000L)              // L = 1
    // L_null = ln 4 / ln 3; sigma = (C/C_null)/(L/L_null)
    val lNull = math.log(4) / math.log(3)
    assert(r.getLong(3) === math.round(lNull * 1e6))
    assert(r.getLong(4) === math.round((1.0 / (1.0 / 3)) / (1.0 / lNull) * 1e3))
  }
}

class RefineConnectedSpec extends GraftSuite {
  import graft.algo.Louvain

  test("a disconnected community splits; a lone-label vertex stays itself") {
    import spark.implicits._
    // two disjoint triangles forced into ONE community, plus vertex 7
    // linked to 1 but labeled alone
    val e = edgesDf(undirected(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (7L, 1L))))
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L),
      (6L, 0L), (7L, 9L)).toDF("id", "label")
    val r = Louvain.refineConnected(e, labels).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(Seq(1L, 2L, 3L).forall(r(_) === 1L))
    assert(Seq(4L, 5L, 6L).forall(r(_) === 4L))
    assert(r(7L) === 7L) // no intra-community neighbor: singleton
  }

  test("connected communities are untouched (refined = component min id)") {
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L))))
    import spark.implicits._
    val labels = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("id", "label")
    val r = Louvain.refineConnected(e, labels).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}

class DsirSpec extends GraftSuite {
  import graft.text.TextIndex
  import org.apache.spark.sql.functions.col

  test("hand-computed add-1 ratios: target doc positive, off-target negative") {
    import spark.implicits._
    // vocab {a, b}: cr = (2, 2), ct = (2, 0), totr 4, tott 2, V 2
    val d = Seq((1L, "a a", "en"), (2L, "b b", "de"))
      .toDF("doc_id", "text", "lang")
    val r = TextIndex.dsirWeights(d, col("lang") === "en").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // p_t(a)/p_r(a) = 0.75/0.5, p_t(b)/p_r(b) = 0.25/0.5
    assert(r(1L) === ((2L, math.round(math.log(1.5) * 1e6))))
    assert(r(2L) === ((2L, math.round(math.log(0.5) * 1e6))))
  }

  test("postings gamma cost: hand-coded gaps, sub-band terms dropped") {
    import spark.implicits._
    val d = Seq((1L, "x shared"), (3L, "x shared"), (7L, "x"), (9L, "solo"))
      .toDF("doc_id", "text")
    val r = TextIndex.postingsGammaCost(d, minDf = 2L, maxDf = 10L)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    // x: docs 1,3,7 -> gaps 2,2,4 -> bits 3+3+5
    assert(r("x") === ((3L, 11L)))
    // shared: docs 1,3 -> gaps 2,2 -> bits 6
    assert(r("shared") === ((2L, 6L)))
    assert(!r.contains("solo")) // df 1 < minDf
  }
}

class DimStatsSpec extends GraftSuite {
  import graft.functions.Similarity

  test("two 2-dim vectors: exact integer moments per dimension") {
    import spark.implicits._
    val v = Seq((1L, Seq(1.0f, 0.5f)), (2L, Seq(0.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.dimStats(v, dim = 2).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(0L) === ((2L, 1000000L, 500000L, 250000000000L)))
    assert(r(1L) === ((2L, 1000000L, 500000L, 0L)))
  }

  test("truncated-dim top-k equals full top-k when the tail dims are zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f, 0f)),
      (3L, Seq(0.0f, 1.0f, 0f, 0f)), (4L, Seq(0.2f, 0.8f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    def half(v: org.apache.spark.sql.DataFrame) = v.select(col("vec_id"),
      slice(col("embedding"), 1, 2).as("embedding"))
    val full = Similarity.bruteForceTopK(vecs, vecs, k = 2)
      .select("qid", "vec_id", "rank")
    val trunc = Similarity.bruteForceTopK(half(vecs), half(vecs), k = 2)
      .select("qid", "vec_id", "rank")
    assert(full.except(trunc).count() === 0L)
    assert(trunc.except(full).count() === 0L)
  }
}

class OnionLayerSpec extends GraftSuite {
  import graft.algo.KCore

  test("path of 5: endpoints peel first, the center last") {
    // k=1 removes nothing; k=2 strips the path inward one round at a
    // time — layers 4, 5, 6 are the (k=2, r=1..3) grid positions
    val e = edgesDf(undirected(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))))
    val r = KCore.onionLayersFixed(e, maxK = 2, roundsPerK = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 4L, 5L -> 4L, 2L -> 5L, 4L -> 5L, 3L -> 6L))
  }

  test("triangle survives the whole schedule in the deep-core layer") {
    val e = edgesDf(undirected(Seq((1L, 2L), (1L, 3L), (2L, 3L))))
    val r = KCore.onionLayersFixed(e, maxK = 2, roundsPerK = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 7L, 2L -> 7L, 3L -> 7L))
  }

  test("every vertex gets exactly one layer, inside its coreness shell") {
    val e = edgesDf(undirected(Fixtures.karatePairs))
    val onion = KCore.onionLayersFixed(e, maxK = 8, roundsPerK = 3)
    val core = KCore.corenessFixed(e, maxK = 8, roundsPerK = 3)
    val n = graft.graph.GraphOps.vertices(e).count()
    assert(onion.count() === n)
    assert(onion.select("id").distinct().count() === n)
    // same schedule: a coreness-c vertex is removed during level c+1,
    // i.e. layer ∈ [3c+1, 3c+3]; schedule survivors (layer 25) have
    // coreness 8 (the schedule cap)
    for (x <- onion.join(core, "id").select("layer", "coreness").collect()) {
      val (layer, c) = (x.getLong(0), x.getLong(1))
      if (layer == 25L) assert(c === 8L)
      else assert((layer - 1) / 3 === c)
    }
  }
}

class JointDegreeSpec extends GraftSuite {
  import graft.measures.Measures

  test("undirected star: the (3,1)/(1,3) wings, nothing on the diagonal") {
    val e = edgesDf(undirected(Seq((1L, 2L), (1L, 3L), (1L, 4L))))
    val r = Measures.jointDegreeDistribution(e).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r === Map((3L, 1L) -> 3L, (1L, 3L) -> 3L))
  }

  test("slot total and degree-weighted marginals match the edge table") {
    val e = edgesDf(undirected(Fixtures.karatePairs))
    val rows = Measures.jointDegreeDistribution(e).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(rows.map(_._3).sum === e.count())
    // symmetric graph: the matrix is symmetric
    val m = rows.map(t => (t._1, t._2) -> t._3).toMap
    for (((a, b), n) <- m) assert(m((b, a)) === n)
  }
}

class PplBucketSpec extends GraftSuite {
  import graft.text.NgramLm

  test("buckets are balanced per language and monotone in mean NLL") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cat sat on the mat"),
      (3L, "the dog ran in the fog"), (4L, "zx qv wk jh"),
      (5L, "the cat ran on the mat"), (6L, "qq zz vv"),
      (7L, "one"), // single token: no bigram, dropped
      (8L, "el gato y el perro y el sol"))
      .toDF("doc_id", "text")
    val langs = Seq((1L, "en"), (2L, "en"), (3L, "en"), (4L, "en"),
      (5L, "en"), (6L, "en"), (7L, "en"), (8L, "es"))
      .toDF("doc_id", "pred_lang")
    val r = NgramLm.perplexityBuckets(docs, langs).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r.length === 7) // doc 7 dropped (no bigram)
    val en = r.filter(_._2 == "en").sortBy(t => (t._3, t._1))
    assert(en.map(_._4).toSeq === Seq(1L, 1L, 2L, 2L, 3L, 3L))
    // ntile assigns non-decreasing buckets along the sort order
    assert(en.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
    assert(r.filter(_._2 == "es").map(_._4).toSeq === Seq(1L))
  }
}
