package graft

import org.apache.spark.sql.functions._

/** Round-5 batch j: SybilRank trust propagation, the embedding
  * covariance matrix, and per-language tokenizer fertility.
  */
class SybilRankSpec extends GraftSuite {
  import graft.algo.PageRank

  // Barbell: honest triangle {1,2,3} — seed 1 — attached to a sybil
  // triangle {4,5,6} through the single attack edge (3,4).
  private def barbell = edgesDf(undirected(Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))))

  test("trust is conserved and the sybil region scores low") {
    import spark.implicits._
    val seeds = Seq(1L).toDF("id")
    val r = PageRank.sybilRankFixed(barbell, seeds, iterations = 3)
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2)))
      .toMap
    // teleport-free propagation conserves total trust exactly (no sinks
    // on a symmetrized graph)
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-12)
    // every honest vertex outranks every sybil vertex on trust/deg
    val honest = Seq(1L, 2L, 3L).map(r(_)._2).min
    val sybil = Seq(4L, 5L, 6L).map(r(_)._2).max
    assert(honest > sybil)
    // the far sybils receive no trust at all within 3 steps... 5 and 6
    // are 3 hops out, reachable, but via the single cut edge only
    assert(r(5L)._1 < r(2L)._1 && r(6L)._1 < r(2L)._1)
  }

  test("hand-replayed two steps on a path with seed at one end") {
    import spark.implicits._
    // 1-2-3: deg(1)=deg(3)=1, deg(2)=2; seed {1}: t0=(1,0,0)
    // t1 = (0, 1, 0); t2 = (1/2, 0, 1/2)
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L))))
    val r = PageRank.sybilRankFixed(e, Seq(1L).toDF("id"), iterations = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.5) < 1e-12)
    assert(math.abs(r(2L) - 0.0) < 1e-12)
    assert(math.abs(r(3L) - 0.5) < 1e-12)
  }
}

class CovarianceSpec extends GraftSuite {
  import graft.functions.Similarity

  test("hand-computed 2-dim covariance, upper triangle only") {
    import spark.implicits._
    // vectors (1,2), (3,4), (5,0): means (3,2); cov(0,0)=8/3, var in
    // e12: E[x²]−E[x]² computed from e6 ints
    val v = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)),
      (3L, Array(5.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.covarianceMatrix(v).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(4))).toMap
    assert(r.keySet === Set((0L, 0L), (0L, 1L), (1L, 1L)))
    // cov(x,x) = (1+9+25)/3 − 9 = 8/3; e12 = 2666666666667 (rounded)
    assert(r((0L, 0L)) === ((3L, 2666666666667L)))
    // cov(x,y) = (2+12+0)/3 − 3·2 = −4/3
    assert(r((0L, 1L)) === ((3L, -1333333333333L)))
    // cov(y,y) = (4+16+0)/3 − 4 = 8/3
    assert(r((1L, 1L)) === ((3L, 2666666666667L)))
  }

  test("diagonal matches dimStats variances on real embeddings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val diag = Similarity.covarianceMatrix(emb)
      .filter(col("i") === col("j"))
      .select(col("i").as("dim"), col("cov_e12"))
    val vs = Similarity.dimStats(emb).select(col("dim"), col("var_e12"))
    val joined = diag.join(vs, "dim")
      .select(abs(col("cov_e12") - col("var_e12")).as("d")).collect()
    assert(joined.length === 64)
    // both are round()s of the same double expression — allow 1 ulp of
    // rounding split between the two formulations
    assert(joined.forall(_.getLong(0) <= 1L))
  }
}

class FertilitySpec extends GraftSuite {
  import graft.text.CorpusClean

  test("per-language sums and the e6 ratio are exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab cd", "aa", "s1", 5L),   // bpe tokens: "ab"," cd" = 2; 5 chars
      (2L, "a1b", "aa", "s1", 3L),     // "a","1","b" = 3; 3 chars
      (3L, "xyz", "bb", "s1", 3L))     // 1 token, 3 chars
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = CorpusClean.tokenizerFertility(docs).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r("aa") === ((2L, 5L, 8L, 625000L)))
    assert(r("bb") === ((1L, 1L, 3L, 333333L)))
  }
}
