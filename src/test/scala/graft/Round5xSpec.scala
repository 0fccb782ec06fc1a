package graft

import org.apache.spark.sql.functions._

/** Round-5 batch x: independent cascade, MMR diversified retrieval. */
class IcCascadeSpec extends GraftSuite {
  import graft.algo.Influence
  import graft.graph.GraphOps

  test("permille=1000: cascade is exactly BFS levels, capped by rounds") {
    import spark.implicits._
    val path = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst"))
    val seeds = Seq(1L).toDF("id")
    val r = Influence.icCascade(path, seeds, permille = 1000, rounds = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // rounds=2 stops before vertices 4 and 5
    assert(r === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("permille=0: nothing spreads beyond the seeds") {
    import spark.implicits._
    val path = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val r = Influence.icCascade(path, Seq(1L).toDF("id"),
      permille = 0, rounds = 3).collect()
    assert(r.map(_.getLong(0)).toSet === Set(1L))
  }

  test("live-edge determinism: two runs produce the identical set") {
    import spark.implicits._
    val e = GraphOps.symmetrize((1L to 30L).map(i =>
      (i, i % 7 + 31L)).toDF("src", "dst"))
    val seeds = Seq(31L).toDF("id")
    def run() = Influence.icCascade(e, seeds, permille = 500, rounds = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(run() === run())
  }
}

class MmrSpec extends GraftSuite {
  import graft.functions.Similarity

  private def pad(xs: Double*): Seq[Float] =
    (xs.map(_.toFloat) ++ Seq.fill(64 - xs.length)(0.0f))

  test("a duplicate result is displaced by a diverse one") {
    import spark.implicits._
    // qid 0 = (1,0,0); vec 1 ~ query; vec 2 duplicates vec 1; vec 3 is
    // farther from q but diverse. MMR rank 2 must be the diverse doc.
    val rows = Seq(
      (0L, pad(1.0, 0.0, 0.0)),
      (1L, pad(0.95, 0.31, 0.0)),
      (2L, pad(0.95, 0.31, 0.0)),
      (3L, pad(0.8, 0.0, 0.6))).toDF("vec_id", "embedding")
    val r = Similarity.mmrSelect(rows, cand = 3, k = 3).collect()
      .map(x => x.getAs[Long]("rank") -> x.getAs[Long]("vec_id")).toMap
    assert(r(1L) === 1L) // best sim, id tie-break over its duplicate
    assert(r(2L) === 3L) // diversity displaces the duplicate
    assert(r(3L) === 2L)
  }

  test("operator matches a driver-side greedy reference on 7 vectors") {
    import spark.implicits._
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      0L -> pad(1.0, 0.2, 0.1), 1L -> pad(0.9, 0.4, 0.0),
      2L -> pad(0.8, 0.5, 0.3), 3L -> pad(0.1, 0.9, 0.4),
      4L -> pad(0.4, 0.4, 0.8), 5L -> pad(0.95, 0.1, 0.2),
      6L -> pad(0.2, 0.3, 0.9))
    val df = vecs.toDF("vec_id", "embedding")
    def sim(a: Seq[Float], b: Seq[Float]): Long = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      math.round(dot / (na * nb) * 1000000)
    }
    val q = vecs.head._2
    val cands = vecs.tail.map { case (id, v) => (id, sim(q, v), v) }
      .sortBy { case (id, s, _) => (-s, id) }.take(5)
    var sel = List(cands.maxBy { case (id, s, _) => (s, -id) })
    (2 to 3).foreach { _ =>
      val rest = cands.filterNot(c => sel.exists(_._1 == c._1))
      val pick = rest.map { c =>
        val msel = sel.map(s => sim(c._3, s._3)).max
        (c, c._2 - msel)
      }.minBy { case (c, sc) => (-sc, c._1) }
      sel = sel :+ pick._1
    }
    val got = Similarity.mmrSelect(df, cand = 5, k = 3).collect()
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id")).toList
    assert(got === sel.map(_._1))
  }
}
