package graft

import org.apache.spark.sql.functions._

/** Round-5 batch l: temperature sampling mix, churn/RFM features, the
  * int8 scalar-quantization audit, and split-half centroid drift.
  */
class TemperatureMixSpec extends GraftSuite {
  import graft.text.DomainMix

  test("α=0.5 flattens: small groups boosted, large groups damped") {
    import spark.implicits._
    val c = Seq(("big", 900L), ("small", 100L)).toDF("grp", "n")
    val r = DomainMix.temperatureMix(c).collect()
      .map(x => x.getString(0) -> (x.getDouble(2), x.getDouble(3),
        x.getDouble(4))).toMap
    // q = √n / (√900 + √100) = 30/40, 10/40
    assert(math.abs(r("big")._2 - 0.75) < 1e-12)
    assert(math.abs(r("small")._2 - 0.25) < 1e-12)
    // boost = q/p: big 0.75/0.9 < 1, small 0.25/0.1 > 1
    assert(r("big")._3 < 1.0 && r("small")._3 > 1.0)
    assert(math.abs(r("small")._3 - 2.5) < 1e-12)
  }

  test("uniform corpus is a fixed point: every boost is exactly 1") {
    import spark.implicits._
    val c = Seq(("a", 7L), ("b", 7L), ("c", 7L)).toDF("grp", "n")
    val r = DomainMix.temperatureMix(c).collect()
    r.foreach(x => assert(math.abs(x.getDouble(4) - 1.0) < 1e-12))
  }
}

class ChurnFeaturesSpec extends GraftSuite {
  import graft.streaming.Funnel

  test("hand-built two-user timeline") {
    import spark.implicits._
    // u1: events at t=0s and t=200000s (different UTC days);
    // u2: one event at t=190000s. t_max = 200000.
    val ev = Seq(
      (1L, 1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0L))),
      (2L, 1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(200000L))),
      (3L, 2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(190000L))))
      .toDF("event_id", "user_id", "ts")
    val r = Funnel.churnFeatures(ev, recentSec = 20000L).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5))).toMap
    assert(r(1L) === ((2L, 2L, 200000L, 0L, 1L)))
    assert(r(2L) === ((1L, 1L, 0L, 10000L, 1L)))
  }
}

class ScalarQuantSpec extends GraftSuite {
  import graft.functions.Similarity

  test("endpoints code to 0/255 and reconstruct exactly") {
    import spark.implicits._
    // one dim spanning [0, 1]: codes 0 and 255 are lossless; the
    // midpoint 0.5 codes to 128 and lands 1 e6-unit off
    val v = Seq(
      (1L, Array(0.0f)), (2L, Array(1.0f)), (3L, Array(0.5f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.scalarQuantAudit(v).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) === ((0L, 0L)))
    assert(r(2L) === ((255L, 0L)))
    // q = round(255·0.5) = 128 (half-up); rec = round(128/255 · 1e6)
    //   = 501961; err = 500000 − 501961 = −1961
    assert(r(3L)._1 === 128L)
    assert(r(3L)._2 === 1961L * 1961L)
  }

  test("constant dimension codes to zero with zero error") {
    import spark.implicits._
    val v = Seq((1L, Array(2.5f)), (2L, Array(2.5f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.scalarQuantAudit(v).collect()
    r.foreach { x =>
      assert(x.getLong(1) === 0L)
      assert(x.getLong(2) === 0L)
    }
  }
}

class CentroidDriftSpec extends GraftSuite {
  import graft.functions.Similarity

  test("identical halves give cosine exactly 1e6") {
    import spark.implicits._
    // label 0: vec 0 (even half) and vec 1 (odd half) identical
    val v = Seq(
      (0L, Array(1.0f, 2.0f), 0), (1L, Array(1.0f, 2.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidDrift(v).collect().head
    assert(r.getLong(1) === 1L && r.getLong(2) === 1L)
    assert(r.getLong(3) === 1000000L)
  }

  test("orthogonal halves give cosine 0; single-half labels are omitted") {
    import spark.implicits._
    val v = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(1.0f, 1.0f), 7)) // label 7 has no odd-half vector
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidDrift(v).collect()
    assert(r.length === 1)
    assert(r.head.getLong(0) === 0L)
    assert(r.head.getLong(3) === 0L)
  }
}
