package graft

import org.apache.spark.sql.functions._

/** Round-5 batch-3 operators: SCAN structural clustering, best-match
  * community F1, and the composed Gopher-style quality rules.
  */
class ScanSpec extends GraftSuite {
  import spark.implicits._
  import graft.algo.Scan

  private def run(pairs: Seq[(Long, Long)], epsE3: Long, mu: Long) =
    Scan.structuralClusters(edgesDf(undirected(pairs)), epsE3, mu)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("two triangles over a weak bridge split into two core clusters") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val m = run(pairs, epsE3 = 700L, mu = 2L)
    // bridge sigma = 2/4 = 0.5 < 0.7; intra-triangle >= 0.866
    assert(m(1L) === ((2L, 1L)) && m(2L) === ((2L, 1L)) && m(3L) === ((2L, 1L)))
    assert(m(4L) === ((2L, 4L)) && m(5L) === ((2L, 4L)) && m(6L) === ((2L, 4L)))
  }

  test("a triangle-free star is all outliers") {
    val pairs = (1L to 5L).map(v => (0L, v))
    val m = run(pairs, epsE3 = 700L, mu = 2L)
    assert(m.values.forall(_ == ((0L, -1L))))
  }

  test("a pendant on a core triangle becomes a border") {
    // sigma(1,7) = 2/sqrt(4*2) = 0.7071 >= 0.7 but 7 has eps-degree 1
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 7L))
    val m = run(pairs, epsE3 = 700L, mu = 2L)
    assert(m(1L)._1 === 2L && m(2L)._1 === 2L && m(3L)._1 === 2L)
    assert(m(7L) === ((1L, 1L)))
  }

  test("parameter guards") {
    val e = edgesDf(undirected(Seq((1L, 2L))))
    intercept[IllegalArgumentException] {
      Scan.structuralClusters(e, epsE3 = 0L, mu = 2L)
    }
    intercept[IllegalArgumentException] {
      Scan.structuralClusters(e, epsE3 = 500L, mu = 0L)
    }
  }
}

class CommunityF1Spec extends GraftSuite {
  import spark.implicits._
  import graft.measures.Measures

  test("identical labelings score a perfect 1.0") {
    val lab = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L))
      .toDF("id", "label")
    val r = Measures.communityF1(lab, lab).first()
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getLong(4) === 1000000L)
  }

  test("one blob against two equal halves scores 2/3") {
    val pred = (1L to 8L).map(i => (i, 0L)).toDF("id", "label")
    val truth = (1L to 8L).map(i => (i, i % 2)).toDF("id", "label")
    val r = Measures.communityF1(pred, truth).first()
    // every direction's best F1 = 2*4/(8+4) = 2/3
    assert(r.getLong(2) === 666667L)
    assert(r.getLong(3) === 666667L)
    assert(r.getLong(4) === 666667L)
  }
}

class GopherRulesSpec extends GraftSuite {
  import spark.implicits._

  private def runOn(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    docs.map { case (id, t) => (id, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.queries.PipelineQueries.queries("d_gopher_rules")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("rule bits fire independently and keep = no failed rule") {
    val good = ("the and of is " +
      (1 to 40).map(i =>
        s"${('a' + i % 26).toChar}${('a' + i / 26).toChar}x").mkString(" "))
    val short = "the and of is tiny"                    // bit 1 only
    val loop = (1 to 50).map(_ => "zz").mkString(" ")   // bits 8 + 16
    val m = runOn(Seq((1L, good), (2L, short), (3L, loop)))
    assert(m(1L) === ((0L, 1L)), s"good doc: ${m(1L)}")
    assert(m(2L) === ((1L, 0L)), s"short doc: ${m(2L)}")
    assert(m(3L) === ((24L, 0L)), s"loop doc: ${m(3L)}")
  }

  test("corpus invariants at sf0.001") {
    val rows = graft.queries.PipelineQueries
      .queries("d_gopher_rules")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (mask, keep) =>
      assert(mask >= 0L && mask <= 31L)
      assert(keep === (if (mask == 0L) 1L else 0L))
    }
  }
}

class MarkovStationarySpec extends GraftSuite {
  import spark.implicits._
  import graft.streaming.Funnel

  private def ev(seq: Seq[(Long, String)]) =
    seq.zipWithIndex.map { case ((u, t), i) => (u, i.toLong, i.toLong, t) }
      .toDF("user_id", "event_id", "es", "event_type")
      .select(col("user_id"), col("event_id"),
        col("es").cast("timestamp").as("ts"), col("event_type"))

  test("a 2-cycle keeps the uniform split") {
    val df = ev(Seq((1L, "a"), (1L, "b"), (1L, "a"), (1L, "b")))
    val m = Funnel.markovStationary(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("a" -> 500000000L, "b" -> 500000000L))
  }

  test("an absorbing state collects all mass") {
    val df = ev(Seq((1L, "a"), (1L, "b")))
    val m = Funnel.markovStationary(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("a" -> 0L, "b" -> 1000000000L))
  }

  test("iters guard") {
    intercept[IllegalArgumentException] {
      Funnel.markovStationary(ev(Seq((1L, "a"), (1L, "b"))), iters = 0)
    }
  }
}

class MinhashCalibSpec extends GraftSuite {
  import spark.implicits._

  test("identical documents calibrate to a perfect match") {
    val dir = java.nio.file.Files.createTempDirectory("calib").toString
    val text = (1 to 30).map(i =>
      s"${('a' + i % 26).toChar}${('a' + i / 26).toChar}q").mkString(" ")
    Seq((1L, text, "en", "s", text.length.toLong),
      (2L, text, "en", "s", text.length.toLong),
      (3L, "completely different words here now", "en", "s", 35L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.PipelineQueries
      .queries("d_minhash_calib")(spark, dir).collect()
    val r = rows.find(x => x.getLong(0) == 1L && x.getLong(1) == 2L)
    assert(r.isDefined, s"pair (1,2) not a candidate: ${rows.toSeq}")
    assert(r.get.getLong(2) === 8L)      // all 8 minhashes match
    assert(r.get.getLong(3) === 1000000L)
    assert(r.get.getLong(4) === 1000000L)
  }
}

class LangEntropySpec extends GraftSuite {
  import spark.implicits._

  test("pure and perfectly mixed marker profiles") {
    val dir = java.nio.file.Files.createTempDirectory("langent").toString
    Seq((1L, "the and of is", "en", "s", 13L),
      (2L, "the el und le", "xx", "s", 13L),
      (3L, "zz qq ww", "xx", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = graft.queries.PipelineQueries
      .queries("d_lang_entropy")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L) === ((4L, 0L)))            // all-en: zero entropy
    assert(m(2L) === ((4L, 1386294L)))      // 4-way uniform: ln 4
    assert(m(3L) === ((0L, 0L)))            // no markers at all
  }
}

class PrDeltaSpec extends GraftSuite {
  import org.apache.spark.sql.functions._
  private val dir = "/root/testdata/sf0.001"

  test("the L1 residual curve is positive and decreasing") {
    val rows = graft.queries.GraphQueries.queries("g_pr_delta_t3")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val d = rows.map(_._2)
    assert(d.forall(_ > 0L), s"degenerate deltas: ${d.toSeq}")
    assert(d(1) < d(0) && d(2) < d(1),
      s"residual not contracting: ${d.toSeq}")
  }
}

class AnnRecallSpec extends GraftSuite {
  import org.apache.spark.sql.functions._
  private val dir = "/root/testdata/sf0.001"

  test("recall is bounded and consistent with the two top-k tables") {
    val rows = graft.queries.PipelineQueries
      .queries("e_ann_recall")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, h, e6) =>
      assert(h >= 0L && h <= 5L)
      assert(e6 === h * 200000L)
    }
    // the LSH index should find SOMETHING on the demo embeddings
    assert(rows.map(_._2).sum > 0L)
  }
}

class PackStatsSpec extends GraftSuite {
  import org.apache.spark.sql.functions._
  private val dir = "/root/testdata/sf0.001"

  test("pack totals add back up to the corpus token count") {
    val packed = graft.queries.PipelineQueries
      .queries("d_pack_stats")(spark, dir)
    val total = packed.agg(sum(col("n_tokens"))).first().getLong(0)
    val direct = graft.text.CorpusClean
      .packSequences(
        spark.read.parquet(s"$dir/documents.parquet"), 512L)
      .agg(sum(col("n_tokens"))).first().getLong(0)
    assert(total === direct)
    // every non-final pack of a source holds at least one doc
    assert(packed.filter(col("n_docs") < 1).count() === 0L)
  }
}

class LpStabilitySpec extends GraftSuite {
  private val dir = "/root/testdata/sf0.001"

  test("stability score is bounded and matches the direct computation") {
    val r = graft.queries.GraphQueries
      .queries("g_lp_stability_t3")(spark, dir).first()
    assert(r.getLong(0) > 0L && r.getLong(1) > 0L)
    val f1 = r.getLong(4)
    assert(f1 > 0L && f1 <= 1000000L)
    // identical inputs would score exactly 1.0 — steps 2 vs 3 must not
    // (the sparse graph is still coarsening), so the gate discriminates
    assert(f1 < 1000000L, "gate degenerate: steps 2 and 3 identical")
  }
}

class ClusterPuritySpec extends GraftSuite {
  private val dir = "/root/testdata/sf0.001"

  test("label-bucketed near-dup clusters are perfectly pure") {
    // cosDupPairs only ever joins same-label vectors, so every cluster
    // is label-homogeneous by construction — purity must be exactly 1
    val r = graft.queries.PipelineQueries
      .queries("e_cluster_purity")(spark, dir).first()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(2) === 1000000L)
  }
}

class SourceMixSpec extends GraftSuite {
  import org.apache.spark.sql.functions._
  private val dir = "/root/testdata/sf0.001"

  test("shares are a near-partition of unity over sources") {
    val rows = graft.queries.PipelineQueries
      .queries("d_source_mix")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (nd, ntok, sh) =>
      assert(nd > 0L && ntok > 0L && sh > 0L)
    }
    val total = rows.map(_._3).sum
    assert(math.abs(total - 1000000L) <= rows.length,
      s"shares sum to $total")
  }
}

class NullClusteringSpec extends GraftSuite {
  private val dir = "/root/testdata/sf0.001"

  test("null model and ratio are consistent with the motif census") {
    val r = graft.queries.GraphQueries
      .queries("g_null_clustering")(spark, dir).first()
    val (ca, cn, ratio) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(ca > 0L && cn > 0L && ratio > 0L)
    // ratio_e3 should agree with the two e6 scalars to rounding slack
    val recomputed = math.round(ca.toDouble / cn * 1000)
    assert(math.abs(ratio - recomputed) <= 2L,
      s"ratio $ratio vs recomputed $recomputed")
  }
}

class PrEntropySpec extends GraftSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("uniform ranks on a cycle maximize entropy (norm = 1)") {
    // a 6-cycle is regular: PageRank stays exactly uniform, H = ln n
    val cyc = (0L to 5L).map(i => (i, (i + 1) % 6))
    val e = edgesDf(undirected(cyc))
    val r = graft.algo.PageRank.runFixed(e, 3)
    val h = r.agg(
      sum(round(-col("rank") * log(col("rank")) * 1000000000000L)
        .cast("long"))).first().getLong(0)
    val expect = math.round(math.log(6) * 1e12)
    assert(math.abs(h - expect) <= 6L, s"H=$h vs ln6=$expect")
  }

  test("demo-graph entropy is bounded by ln n") {
    val r = graft.queries.GraphQueries
      .queries("g_pr_entropy")(spark, "/root/testdata/sf0.001").first()
    assert(r.getLong(1) > 0L)
    assert(r.getLong(2) > 0L && r.getLong(2) <= 1000000L)
  }
}

class DupStatsSpec extends GraftSuite {
  import org.apache.spark.sql.functions._
  private val dir = "/root/testdata/sf0.001"

  test("the histogram re-aggregates the cluster assignment exactly") {
    val canon = graft.queries.PipelineQueries
      .queries("d_dedup_clusters")(spark, dir)
    val nDocs = canon.count()
    val hist = graft.queries.PipelineQueries
      .queries("d_dup_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hist.map(_._3).sum === nDocs)
    hist.foreach { case (sz, nc, nd) => assert(nd === sz * nc) }
  }
}

class IvfRecallSpec extends GraftSuite {
  private val dir = "/root/testdata/sf0.001"

  test("IVF recall is bounded and the probe finds real neighbors") {
    val rows = graft.queries.PipelineQueries
      .queries("e_ivf_recall")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (h, e6) =>
      assert(h >= 0L && h <= 5L)
      assert(e6 === h * 200000L)
    }
    assert(rows.map(_._1).sum > 0L)
  }
}
