package graft

import org.apache.spark.sql.functions._

/** Round-5 batch u: Zipf slope, burstiness, mutual kNN, lateness audit. */
class ZipfSlopeSpec extends GraftSuite {
  import graft.text.TextIndex

  test("three-term 4/2/1 corpus: OLS slope matches the hand integers") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val r = TextIndex.zipfSlope(docs, topN = 3).collect().head
    assert(r.getLong(0) === 3L)
    // x = round(ln(rank)*1e3) = 0, 693, 1099; y = 1386, 693, 0
    val (sx, sy, sxx, sxy) = (1792L, 2079L, 1688050L, 480249L)
    val expected = -((sx * sy - 3L * sxy) * 1000000L) / (3L * sxx - sx * sx)
    assert(r.getLong(1) === expected)
  }

  test("flat frequencies give zero covariance, slope 0") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // all freqs 1: y constant 0 -> numerator 0
    assert(TextIndex.zipfSlope(docs, topN = 3).collect().head.getLong(1) === 0L)
  }
}

class BurstinessSpec extends GraftSuite {
  import graft.text.TextIndex

  test("tf 1 and 3 across two docs: mean 2, VMR exactly 1") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, "x x x")).toDF("doc_id", "text")
    val r = TextIndex.burstiness(docs, minDf = 2L).collect().head
    assert(r.getAs[Long]("df") === 2L)
    assert(r.getAs[Long]("tf_total") === 4L)
    assert(r.getAs[Long]("mean_e6") === 2000000L)
    // sample var = (2*10 - 16) / (1 * 4) per the div contract
    assert(r.getAs[Long]("vmr_e6") === 1000000L)
  }

  test("uniform tf has zero variance") {
    import spark.implicits._
    val docs = Seq((1L, "x x"), (2L, "x x")).toDF("doc_id", "text")
    val r = TextIndex.burstiness(docs, minDf = 2L).collect().head
    assert(r.getAs[Long]("vmr_e6") === 0L)
  }
}

class MutualKnnSpec extends GraftSuite {
  import graft.functions.Similarity

  test("one-sided admiration is filtered; reciprocal pair survives") {
    import spark.implicits._
    val v = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.mutualKnn(v, k = 1).collect()
    // v2's top-1 is v1, but v1's top-1 is v0: only (0,1) is mutual
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("a") === 0L && r.getAs[Long]("b") === 1L)
    assert(r.getAs[Long]("rank_ab") === 1L && r.getAs[Long]("rank_ba") === 1L)
  }
}

class LatenessAuditSpec extends GraftSuite {
  import graft.streaming.Funnel
  import graft.text.TextIndex

  test("well-separated in-order stream is never late") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000L)
    val ev = Seq((1L, ts(0), 7L), (2L, ts(1000), 7L), (3L, ts(2000), 7L))
      .toDF("event_id", "ts", "user_id")
    // jitter < 600 < inter-event gap: arrival order == event order
    val r = Funnel.latenessAudit(ev, watermarkSec = 120L).collect().head
    assert(r.getAs[Long]("n_events") === 3L)
    assert(r.getAs[Long]("n_late") === 0L)
    assert(r.getAs[Long]("max_disorder_s") === 0L)
  }

  test("disorder replays the md5 jitter definition exactly") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000L)
    // two events 10s apart: arrival order depends on the jitters
    val ids = Seq(101L, 102L)
    val t = Map(101L -> 0L, 102L -> 10L)
    val jit = ids.toDF("id")
      .select(col("id"), (TextIndex.md5Uniform(col("id").cast("string"))
        % 600L).as("j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val arrival = ids.map(i => i -> (t(i) + jit(i))).toMap
    val ordered = ids.sortBy(i => (arrival(i), i))
    // expected lateness under W=5 by direct definition
    var hwm = Long.MinValue
    var late = 0
    var maxDis = 0L
    ordered.foreach { i =>
      if (hwm != Long.MinValue && hwm - t(i) > 5L) late += 1
      if (hwm != Long.MinValue) maxDis = math.max(maxDis, hwm - t(i))
      hwm = math.max(hwm, t(i))
    }
    val ev = ids.map(i => (i, ts(t(i)), 9L)).toDF("event_id", "ts", "user_id")
    val r = Funnel.latenessAudit(ev, watermarkSec = 5L).collect().head
    assert(r.getAs[Long]("n_late") === late.toLong)
    assert(r.getAs[Long]("max_disorder_s") === math.max(maxDis, 0L))
  }
}
