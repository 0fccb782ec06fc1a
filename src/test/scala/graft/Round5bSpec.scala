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
