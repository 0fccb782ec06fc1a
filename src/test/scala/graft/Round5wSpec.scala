package graft

import org.apache.spark.sql.functions._

/** Round-5 batch w: map equation, binary sign recall, daily trend. */
class MapEquationSpec extends GraftSuite {
  import graft.graph.GraphOps
  import graft.measures.Measures

  private def plogp(x: Double): Double =
    if (x > 0) x * math.log(x) / math.log(2.0) else 0.0

  test("two triangles + bridge: hand-computed codelength") {
    import spark.implicits._
    val e = GraphOps.symmetrize(Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("src", "dst"))
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("id", "label")
    // m2 = 14; q_A = q_B = 1/14; vol_A = vol_B = 7; degs 2,2,3,3,2,2
    val expected = plogp(2.0 / 14) - 2 * plogp(1.0 / 14) -
      (4 * plogp(2.0 / 14) + 2 * plogp(3.0 / 14)) + 2 * plogp(8.0 / 14)
    assert(math.abs(Measures.mapEquation(e, labels) - expected) < 1e-9)
  }

  test("single module: L is the degree-distribution entropy") {
    import spark.implicits._
    val e = GraphOps.symmetrize(Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst"))
    val labels = Seq(1L, 2L, 3L, 4L).toDF("id")
      .select(col("id"), lit(0L).as("label"))
    // q = 0 everywhere: L = H(vol/m2) - sum H(p_v) = -sum H(p_v) (vol=m2)
    val expected = -(2 * plogp(2.0 / 8) + plogp(3.0 / 8) + plogp(1.0 / 8))
    assert(math.abs(Measures.mapEquation(e, labels) - expected) < 1e-9)
  }

  test("the planted partition beats a scrambled one") {
    import spark.implicits._
    val e = GraphOps.symmetrize(Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("src", "dst"))
    val planted = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("id", "label")
    val scrambled = planted.select(col("id"), (col("id") % 2).as("label"))
    assert(Measures.mapEquation(e, planted)
      < Measures.mapEquation(e, scrambled))
  }
}

class BinaryRecallSpec extends GraftSuite {
  import graft.functions.Similarity

  private def vec(negDims: Int): Array[Float] =
    Array.tabulate(64)(i => if (i < negDims) -1.0f else 1.0f)

  test("signPack: known component signs produce the exact words") {
    import spark.implicits._
    // dims 0 and 33 negative, everything else positive
    val v = Array.tabulate(64)(i =>
      if (i == 0 || i == 33) -0.5f else 0.5f)
    val df = Seq((0L, v.toSeq)).toDF("vec_id", "embedding")
    val r = Similarity.signPack(df).collect().head
    assert(r.getAs[Long]("lo") === (0xFFFFFFFFL & ~1L))
    assert(r.getAs[Long]("hi") === (0xFFFFFFFFL & ~2L))
  }

  test("monotone sign flips: Hamming and cosine rank identically") {
    import spark.implicits._
    // query (vec 0) all-positive; candidate i flips its first i dims,
    // so cosine DESC order == Hamming ASC order == vec_id order
    val rows = (0L to 6L).map(i => (i, vec(i.toInt).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val r = Similarity.binaryRecall(df, k = 5).collect()
    assert(r.length === 1 && r.head.getLong(0) === 0L)
    assert(r.head.getAs[Long]("n_hit") === 5L)
    assert(r.head.getAs[Long]("recall_e6") === 1000000L)
  }

  test("sign-invisible perturbations keep recall perfect") {
    import spark.implicits._
    // magnitudes differ but signs match vec 1's pattern: hamming top-5
    // still contains the cosine top-5
    val rows = (0L to 5L).map(i => (i, vec(i.toInt)
      .map(x => x * (1.0f + 0.01f * i)).toSeq))
    val r = Similarity.binaryRecall(rows.toDF("vec_id", "embedding"), 5)
      .collect()
    assert(r.head.getAs[Long]("n_hit") === 5L)
  }
}

class DailyTrendSpec extends GraftSuite {
  import graft.streaming.Funnel

  private def ts(day: Int, i: Int) = new java.sql.Timestamp(
    java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      + day * 86400000L + i * 1000L)

  test("counts 1,2,3 over three days: slope exactly 1") {
    import spark.implicits._
    val ev = (Seq((1L, ts(0, 0))) ++ (0 until 2).map(i => (2L, ts(1, i)))
      ++ (0 until 3).map(i => (3L, ts(2, i))))
      .map { case (id, t) => (id, "view", t) }
      .toDF("event_id", "event_type", "ts")
    val r = Funnel.dailyTrend(ev).collect().head
    // n=3 sx=3 sxx=5 sxy=8 sy=6: num = 24-18 = 6, den = 15-9 = 6
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Long]("sum_y") === 6L)
    assert(r.getAs[Long]("slope_num") === 6L)
    assert(r.getAs[Long]("slope_den") === 6L)
  }

  test("types are independent; declining type gets a negative numerator") {
    import spark.implicits._
    val ev = ((0 until 3).map(i => (10L + i, "a", ts(0, i)))
      ++ Seq((20L, "a", ts(1, 0)))
      ++ Seq((30L, "b", ts(0, 0)), (31L, "b", ts(1, 0))))
      .toDF("event_id", "event_type", "ts")
    val r = Funnel.dailyTrend(ev).collect()
      .map(x => x.getString(0) -> (x.getAs[Long]("slope_num"),
        x.getAs[Long]("slope_den"))).toMap
    // a: days x=0,1 y=3,1 -> num = 2*1 - 1*4 = -2, den = 2*1 - 1 = 1
    assert(r("a") === ((-2L, 1L)))
    // b: flat 1,1 -> num = 0
    assert(r("b") === ((0L, 1L)))
  }
}
