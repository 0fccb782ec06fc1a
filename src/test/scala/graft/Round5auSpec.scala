package graft

import org.apache.spark.sql.functions._

/** Round-5 batch au: strength assortativity, event dispersion. */
class StrengthAssortSpec extends GraftSuite {
  import graft.measures.Measures

  private def wEdges(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("src", "dst", "weight")
    df.union(df.select(col("dst").as("src"), col("src").as("dst"),
      col("weight")))
  }

  test("strengthAssortativity: regular weights give zero variance guard") {
    // triangle, all weights 1: every strength 2 -> dx = 0 -> r = 0
    val e = wEdges(Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L)))
    val r = Measures.strengthAssortativity(e).collect().head
    assert(r.getAs[Long]("r_e6") === 0L)
  }

  test("strengthAssortativity: disassortative star is negative") {
    // star: center strength 3, leaves 1 each; slots pair 3 with 1 only
    val e = wEdges(Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L)))
    val r = Measures.strengthAssortativity(e).collect().head
    assert(r.getAs[Long]("m") === 6L)
    assert(r.getAs[Long]("r_e6") === -1000000L)
  }

  test("event dispersion identity on a hand distribution") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // minute buckets: minute 0 -> 3 events, minute 1 -> 1 event
    val ev = Seq((1L, ts(0L)), (2L, ts(10L)), (3L, ts(20L)), (4L, ts(60L)))
      .toDF("event_id", "ts")
    val epoch = col("ts").cast("timestamp").cast("long")
    val r = ev.select((epoch - epoch % 60).as("minute_epoch"))
      .groupBy("minute_epoch").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("sq")).collect().head
    // n=2, s=4, sq=10: mean 2, var (2*10-16)/4=1 -> vmr = 4/(2*4)... the
    // gate formula: (n*sq - s*s)*1e6/(n*s) = (20-16)*1e6/8 = 500000
    assert(r.getAs[Long]("n") === 2L)
    assert((r.getAs[Long]("n") * r.getAs[Long]("sq")
      - r.getAs[Long]("s") * r.getAs[Long]("s")) === 4L)
  }
}
