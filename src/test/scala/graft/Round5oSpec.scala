package graft

import org.apache.spark.sql.functions._

/** Round-5 batch o: media chunk-hash near-dup and the A/B lift readout. */
class MediaNearDupSpec extends GraftSuite {
  import graft.media.Media

  test("changed-tail variant matches on 3 of 4 blocks; unrelated pair on 0") {
    import spark.implicits._
    val base = "a" * 40 + "b" * 40 + "c" * 40 + "d" * 40
    val tail = "a" * 40 + "b" * 40 + "c" * 40 + "x" * 40
    val other = "z" * 160
    val m = Seq((1L, base), (2L, tail), (3L, other))
      .toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "UTF-8").as("bytes"))
    val r = Media.nearDupBlocks(m).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3)))
      .toMap
    assert(r === Map((1L, 2L) -> ((3L, 750000L))))
  }

  test("short blobs cannot match on empty trailing blocks") {
    import spark.implicits._
    // n=2 → bs=1: blocks 2 and 3 are beyond the payload for both rows;
    // the two non-empty blocks differ, so NO pair may be emitted
    val m = Seq((1L, "ab"), (2L, "cd")).toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "UTF-8").as("bytes"))
    assert(Media.nearDupBlocks(m, minMatch = 1).collect().isEmpty)
  }
}

class AbLiftSpec extends GraftSuite {
  test("gate computes an exact integer lift on a hand-built split") {
    import spark.implicits._
    // users 0,2 (variant 0): one converts; users 1,3 (variant 1): both
    val ev = Seq(
      (0L, "purchase"), (2L, "view"),
      (1L, "purchase"), (3L, "purchase"))
      .toDF("user_id", "event_type")
    val u = ev.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select((col("user_id") % 2).as("variant"), col("conv"))
      .groupBy("variant")
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
    val a = u.filter(col("variant") === 0)
      .select(col("n_users").as("users_a"), col("n_conv").as("conv_a"))
    val b = u.filter(col("variant") === 1)
      .select(col("n_users").as("users_b"), col("n_conv").as("conv_b"))
    val r = a.crossJoin(b).select(
      expr("conv_a * 1000000 div users_a").as("cr_a"),
      expr("conv_b * 1000000 div users_b").as("cr_b"),
      expr("conv_b * users_a * 1000000 div (conv_a * users_b)").as("lift"))
      .collect().head
    assert(r.getLong(0) === 500000L)
    assert(r.getLong(1) === 1000000L)
    assert(r.getLong(2) === 2000000L)
  }
}
