package graft

import org.apache.spark.sql.functions._

/** Round-5 batch be: smoothed DAU. */
class DauSmoothSpec extends GraftSuite {

  test("7-day trailing mean uses the actual trailing row count") {
    import spark.implicits._
    def ts(day: Int, u: Long) =
      (u, new java.sql.Timestamp((day * 86400L + 100L) * 1000L))
    // day 0: 2 users, day 1: 1 user -> ma at day 1 = (2+1)/2
    val ev = Seq(ts(0, 1L), ts(0, 2L), ts(1, 1L))
      .map { case (u, t) => (u, t, u) }
      .toDF("event_id", "ts", "user_id")
    val epoch = col("ts").cast("timestamp").cast("long")
    val dau = ev.select((epoch - epoch % 86400).as("day_epoch"),
        col("user_id")).distinct()
      .groupBy("day_epoch").agg(count(lit(1)).as("dau"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("day_epoch").asc).rowsBetween(-6, 0)
    val rows = dau.withColumn("ma7_e6",
        round(avg(col("dau")).over(w) * 1000000).cast("long"))
      .collect()
      .map(r => r.getAs[Long]("day_epoch") / 86400L ->
        (r.getAs[Long]("dau"), r.getAs[Long]("ma7_e6"))).toMap
    assert(rows === Map(0L -> ((2L, 2000000L)), 1L -> ((1L, 1500000L))))
  }
}
