package graft

import org.apache.spark.sql.functions._

/** Round-5 batch-13 operators: stream-stream attribution join, BM25F,
  * Heaps'-law fit.
  */
class AttributionSpec extends GraftSuite {
  import spark.implicits._
  import graft.streaming.EventStreams

  private def ev(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("event_id", "ets", "user_id", "event_type")
      .select(col("event_id"), col("ets").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))

  test("interval join credits in-window purchases only, boundary inclusive") {
    val t0 = "2024-01-01 00:00:00"
    val events = ev(Seq(
      (10L, t0, 1L, "view"),
      (20L, "2024-01-01 00:01:40", 1L, "purchase"), // +100 s: in
      (21L, "2024-01-01 06:00:00", 1L, "purchase"), // +21600 s: boundary in
      (22L, "2024-01-01 06:00:01", 1L, "purchase"), // +21601 s: out
      (23L, "2023-12-31 23:59:59", 1L, "purchase"), // before the view: out
      (30L, t0, 2L, "view")))                       // other user: no pair
    val got = EventStreams.attribution(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1L, 10L, 20L, 100000000L),
      (1L, 10L, 21L, 21600000000L)))
  }

  test("cross-batch pairing: view in batch 1 joins purchase in batch 2") {
    val dir = java.nio.file.Files.createTempDirectory("graft-attrib").toString
    def mk(rows: Seq[(Long, String, Long, String)], f: String): Unit =
      ev(rows).coalesce(1).write.parquet(s"$dir/$f")
    mk(Seq((1L, "2024-01-01 00:00:00", 7L, "view")), "f1")
    mk(Seq((2L, "2024-01-01 00:10:00", 7L, "purchase")), "f2")
    val files = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(files.length === 2)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-attrib-s")
    files.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath, streamDir.resolve(s"b$i.parquet"))
    }
    val got = EventStreams.runAttributionStream(spark, streamDir.toString,
        "attrib_xbatch", maxFilesPerTrigger = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((7L, 1L, 2L)))
  }

  test("stream attribution equals the batch plan on the events fixture") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val got = EventStreams.runAttributionStream(spark, path, "attrib_parity")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val exp = EventStreams.attribution(spark.read.parquet(path)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === exp && got.nonEmpty)
  }
}

class Bm25fSpec extends GraftSuite {
  import spark.implicits._
  import graft.text.Bm25

  test("with no anchors BM25F reduces exactly to BM25") {
    val docs = Seq(
      (1L, "alpha beta beta gamma"), (2L, "alpha alpha delta"),
      (3L, "beta gamma gamma gamma epsilon")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "anchor")
    val f = Bm25.scoreTopDfTermsF(docs, empty, qTerms = 2).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val b = Bm25.scoreTopDfTerms(docs, qTerms = 2).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(f === b && f.nonEmpty)
  }

  test("anchor hits count triple and out-of-corpus anchors are dropped") {
    val docs = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val anchors = Seq((1L, "z"), (99L, "z z")).toDF("doc_id", "anchor")
    val rows = Bm25.scoreTopDfTermsF(docs, anchors, qTerms = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows((1L, "z")) === 3L)  // anchor-only hit, weight 3
    assert(rows((2L, "z")) === 1L)  // body hit unchanged
    assert(!rows.keySet.exists(_._1 == 99L)) // outside the corpus
  }
}

class TrigramSpec extends GraftSuite {
  import spark.implicits._
  import graft.streaming.Funnel

  private def ev(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("event_id", "ets", "user_id", "event_type")
      .select(col("event_id"), col("ets").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))

  test("consecutive trigrams per user, event_id breaks same-second ties") {
    val events = ev(Seq(
      (1L, "2024-01-01 00:00:01", 1L, "a"),
      (2L, "2024-01-01 00:00:02", 1L, "b"),
      (3L, "2024-01-01 00:00:02", 1L, "c"), // same ts as b: id orders it
      (4L, "2024-01-01 00:00:03", 1L, "d"),
      (5L, "2024-01-01 00:00:01", 2L, "a"), // other user: 2 events only
      (6L, "2024-01-01 00:00:02", 2L, "b")))
    val got = Funnel.trigrams(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(got === Map(("a", "b", "c") -> 1L, ("b", "c", "d") -> 1L))
  }
}

class MediaDedupSpec extends GraftSuite {
  import spark.implicits._
  import graft.media.Media

  test("identical payloads collapse to the min media_id across kinds") {
    val media = Seq(
      (3L, "image", "same-bytes"), (7L, "audio", "same-bytes"),
      (5L, "video", "other")).toDF("media_id", "kind", "txt")
      .select(col("media_id"), col("kind"),
        encode(col("txt"), "UTF-8").as("bytes"))
    val got = Media.dedupExact(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(3L) === (3L, 0L))
    assert(got(7L) === (3L, 1L)) // dup of 3 despite a different kind
    assert(got(5L) === (5L, 0L))
  }
}

class PqDistortionSpec extends GraftSuite {
  import graft.functions.Similarity

  test("distortion audit re-aggregates the codes table exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val codes = Similarity.pqCodes(emb).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = codes.groupBy(_._1).map { case (b, rows) =>
      b -> (rows.length.toLong, rows.map(_._2).distinct.length.toLong,
        rows.map(_._3).sum)
    }
    val got = Similarity.pqDistortion(emb).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === exp.keySet)
    exp.foreach { case (b, (n, u, s)) =>
      assert(got(b) === (n, u, s, s / n), s"block $b")
    }
  }
}

class HeapsSpec extends GraftSuite {
  import spark.implicits._
  import graft.text.TextIndex

  test("an all-unique-token corpus fits beta = 1 exactly") {
    // every checkpoint has n_types == n_tokens, so y = x at all points
    val docs = (1L to 8L)
      .map(i => (i, s"t${i}a t${i}b")).toDF("doc_id", "text")
    val r = TextIndex.heapsFit(docs).first()
    assert(r.getLong(0) === 8L)
    assert(r.getLong(1) === 1000000L)
    assert(r.getLong(2) === 0L)
  }

  test("a fixed-vocabulary corpus fits beta = 0") {
    // same two types at every checkpoint: y constant, slope 0
    val docs = (1L to 8L).map(i => (i, "a b a b")).toDF("doc_id", "text")
    val r = TextIndex.heapsFit(docs).first()
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === math.round(math.log(2.0) * 1000000))
  }
}
