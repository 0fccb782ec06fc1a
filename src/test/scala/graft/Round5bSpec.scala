package graft

import org.apache.spark.sql.functions._

/** Round-5 batch-2 operators: the targeted-attack robustness curve,
  * embedding semantic clusters, and n-gram novelty.
  */
class AttackCurveSpec extends GraftSuite {
  private val dir = "/root/testdata/sf0.001"

  test("giant component and survivor count are non-increasing in k") {
    val rows = graft.queries.GraphQueries.queries("g_attack_curve")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0L, 5L, 10L))
    val survivors = rows.map(_._2)
    val giants = rows.map(_._3)
    assert(survivors.zip(survivors.tail).forall { case (a, b) => b <= a },
      s"survivors not monotone: ${survivors.toSeq}")
    assert(giants.zip(giants.tail).forall { case (a, b) => b <= a },
      s"giant sizes not monotone: ${giants.toSeq}")
  }

  test("the k=0 level is the unattacked graph's CC profile") {
    val full = graft.queries.GraphQueries.queries("g_cc")(spark, dir)
      .groupBy("label").agg(count(lit(1)).as("sz"))
      .agg(sum(col("sz")).cast("long"), count(lit(1)), max(col("sz")))
      .first()
    val k0 = graft.queries.GraphQueries.queries("g_attack_curve")(spark, dir)
      .filter(col("k_removed") === 0).first()
    assert(k0.getLong(1) === full.getLong(0))
    assert(k0.getLong(2) === full.getLong(1))
    assert(k0.getLong(3) === full.getLong(2))
  }
}

class SemanticClustersSpec extends GraftSuite {
  private val dir = "/root/testdata/sf0.001"

  test("every near-dup pair lands in one cluster; labels are cluster minima") {
    val pairs = graft.queries.PipelineQueries.queries("e_cos_dups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cl = graft.queries.PipelineQueries
      .queries("e_semantic_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(cl(a) === cl(b), s"pair ($a,$b) split across clusters")
    }
    // each cluster's label is its minimum member id
    cl.groupBy(_._2).foreach { case (lab, members) =>
      assert(members.keys.min === lab, s"cluster $lab not min-labeled")
    }
    // singletons keep their own id
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    cl.filterNot(kv => paired(kv._1)).foreach { case (id, lab) =>
      assert(id === lab)
    }
  }
}

class NgramNoveltySpec extends GraftSuite {
  private val dir = "/root/testdata/sf0.001"

  test("novelty is bounded and consistent with its own counters") {
    val rows = graft.queries.PipelineQueries
      .queries("d_ngram_novelty")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (ns, nv, e6) =>
      assert(nv <= ns)
      assert(e6 >= 0L && e6 <= 1000000L)
      if (ns == 0L) assert(e6 === 0L)
      else assert(e6 === math.round(nv * 1000000.0 / ns))
    }
  }

  test("novelty and boilerplate count disjoint shingle populations") {
    // a doc's novel shingles (df==1) can never also be boilerplate
    // (df>=5): per doc, n_novel + n_boiler <= n_shingles
    val nov = graft.queries.PipelineQueries
      .queries("d_ngram_novelty")(spark, dir)
      .select(col("doc_id"), col("n_shingles"), col("n_novel"))
    val boi = graft.queries.PipelineQueries
      .queries("d_boilerplate")(spark, dir)
      .select(col("doc_id"), col("n_boiler"))
    val bad = nov.join(boi, "doc_id")
      .filter(col("n_novel") + col("n_boiler") > col("n_shingles"))
      .count()
    assert(bad === 0L)
  }
}

class GiniConcentrationSpec extends GraftSuite {
  import spark.implicits._
  import graft.streaming.Funnel

  private def ev(userEvents: Seq[(Long, Int)]) =
    userEvents.flatMap { case (u, n) => Seq.fill(n)(u) }.zipWithIndex
      .map { case (u, i) => (u, i.toLong, i.toLong) }
      .toDF("user_id", "event_id", "es")
      .select(col("user_id"), col("event_id"),
        col("es").cast("timestamp").as("ts"))

  test("uniform activity has zero Gini") {
    val r = Funnel.giniConcentration(ev(Seq(1L -> 4, 2L -> 4, 3L -> 4)))
      .first()
    assert(r.getLong(0) === 3L && r.getLong(1) === 12L)
    assert(r.getLong(2) === 0L)
  }

  test("one dominant user concentrates the mass") {
    // counts (1, 1, 98): G = (2*297 - 4*100) / (3*100) = 0.646667
    val r = Funnel.giniConcentration(
      ev(Seq(1L -> 1, 2L -> 1, 3L -> 98))).first()
    assert(r.getLong(2) === 646667L)
  }

  test("rank-block identity matches the brute-force rank sum") {
    val counts = Seq(5, 2, 9, 2, 7, 1, 2, 9)
    val r = Funnel.giniConcentration(
      ev(counts.zipWithIndex.map { case (n, u) => (u.toLong, n) })).first()
    val sorted = counts.sorted
    val s = sorted.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    val n = counts.size.toLong
    val t = counts.sum.toLong
    val expect = math.round((2.0 * s - (n + 1) * t) * 1000000.0 / (n * t))
    assert(r.getLong(2) === expect)
  }
}

class GapHistogramSpec extends GraftSuite {
  import spark.implicits._
  import graft.streaming.Funnel

  test("gaps land in their log2 buckets") {
    // user 1 at t = 0,1,3,10 → gaps 1,2,7 → buckets 1,1,3
    // user 2 at t = 5,5 (tie broken by event_id) → gap 0 → bucket 0
    val df = Seq((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 3L), (1L, 4L, 10L),
      (2L, 5L, 5L), (2L, 6L, 5L))
      .toDF("user_id", "event_id", "es")
      .select(col("user_id"), col("event_id"),
        col("es").cast("timestamp").as("ts"))
    val m = Funnel.gapHistogram(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(0L -> 1L, 1L -> 2L, 3L -> 1L))
  }
}

class PackSequencesSpec extends GraftSuite {
  import spark.implicits._
  import graft.text.CorpusClean

  test("packs advance with the running token total per source") {
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "d e", "s1"), (3L, "f g h i", "s1"),
      (4L, "j", "s1"), (10L, "x y z w v u", "s2"), (11L, "q", "s2"))
      .toDF("doc_id", "text", "source")
    val m = CorpusClean.packSequences(docs, binTokens = 2L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // s1 starts: 0, 3, 5, 9 → packs 0, 1, 2, 4 ; s2 starts: 0, 6 → 0, 3
    assert(m(1L) === ((3L, 0L)) && m(2L) === ((2L, 1L)))
    assert(m(3L) === ((4L, 2L)) && m(4L) === ((1L, 4L)))
    assert(m(10L) === ((6L, 0L)) && m(11L) === ((1L, 3L)))
  }

  test("bin size must be positive") {
    val docs = Seq((1L, "a", "s")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException] {
      CorpusClean.packSequences(docs, binTokens = 0L)
    }
  }
}

class ConditionalEntropySpec extends GraftSuite {
  import spark.implicits._
  import graft.text.NgramLm

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("a deterministic chain has zero entropy rate") {
    val r = NgramLm.conditionalEntropy(docsOf("a b a b a b a b")).first()
    assert(r.getLong(2) === 0L)
  }

  test("a uniform 2-way branch costs ln 2 per bigram") {
    // contexts: after 'a' comes b or c equally often
    val r = NgramLm.conditionalEntropy(
      docsOf("a b", "a c", "a b", "a c")).first()
    assert(r.getLong(0) === 4L)
    assert(math.abs(r.getLong(2) - 693147L) <= 1L,
      s"expected ~ln2: ${r.getLong(2)}")
  }
}

class LifecycleSpec extends GraftSuite {
  import spark.implicits._
  import graft.streaming.Funnel

  test("new, retained, and churned users classify by day thresholds") {
    // max day = 20: user 1 first seen day 15 (new); user 2 spans 0..15
    // (retained); user 3 last seen day 2 (churned)
    val df = Seq((1L, 1L, 15L * 86400), (1L, 2L, 20L * 86400),
      (2L, 3L, 0L), (2L, 4L, 15L * 86400),
      (3L, 5L, 0L), (3L, 6L, 2L * 86400))
      .toDF("user_id", "event_id", "es")
      .select(col("user_id"), col("event_id"),
        col("es").cast("timestamp").as("ts"))
    val m = Funnel.lifecycle(df).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(m === Map(1L -> "new", 2L -> "retained", 3L -> "churned"))
  }
}

class InOutProfileSpec extends GraftSuite {
  import spark.implicits._
  import graft.measures.Measures

  test("dangling/orphan counts and a perfect-correlation chain") {
    // ring: every vertex has od = ind = 1 → r undefined-free? variance 0
    // use a graph where degrees vary together: 1→2, 1→3, 2→1, 3→1, 2→3?
    // simpler exact case: star out = star in per vertex
    val e = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val r = Measures.inOutProfile(e).first()
    assert(r.getLong(0) === 3L)       // pages
    assert(r.getLong(1) === 0L)       // no dangling (all emit)
    assert(r.getLong(2) === 0L)       // no orphan
    // degrees: v1 (2,2), v2 (1,1), v3 (1,1) → perfect correlation
    assert(r.getLong(4) === 1000000L)
  }

  test("a pure chain counts one dangling and one orphan") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Measures.inOutProfile(e).first()
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 1L)       // 3 never emits
    assert(r.getLong(2) === 1L)       // 1 never receives
    assert(r.getLong(3) === 333333L)
  }
}

class MediaShardSpec extends GraftSuite {
  import spark.implicits._
  import graft.media.Media

  test("shards advance with the per-kind running byte total") {
    val media = Seq(
      (1L, "image", Array.fill[Byte](3)(1)),
      (2L, "image", Array.fill[Byte](2)(1)),
      (3L, "image", Array.fill[Byte](4)(1)),
      (10L, "audio", Array.fill[Byte](6)(1)))
      .toDF("media_id", "kind", "bytes")
    val m = Media.shardAssign(media, maxBytes = 4L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // image starts: 0, 3, 5 → shards 0, 0, 1 ; audio: 0 → shard 0
    assert(m(1L) === ((3L, 0L)) && m(2L) === ((2L, 0L)))
    assert(m(3L) === ((4L, 1L)) && m(10L) === ((6L, 0L)))
  }
}
