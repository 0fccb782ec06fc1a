package graft

import org.apache.spark.sql.functions._
import graft.functions.{SimHash64, Similarity}
import graft.media.Media
import graft.streaming.EventStreams
import graft.algo.Betweenness
import graft.graph.GraphOps

class StreamingSpec extends GraftSuite {
  import spark.implicits._

  test("streaming windowed counts equal the batch rollup (memory sink)") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = EventStreams.runStreamOnce(spark, path, "graft_stream_test")
      .select("hour_epoch", "event_type", "n", "sum_value_e3")
    val batch = EventStreams.hourlyRollup(spark.read.parquet(path))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() === 0L)
    assert(batch.except(streamed).count() === 0L)
  }

  test("sessionization closes sessions at the inactivity gap") {
    import java.sql.Timestamp
    val ev = Seq(
      EventStreams.Event(1, new Timestamp(0L), 7, "a", 1.0),
      EventStreams.Event(2, new Timestamp(60 * 1000L), 7, "a", 1.0),
      EventStreams.Event(3, new Timestamp(10000 * 1000L), 7, "a", 1.0),
      EventStreams.Event(4, new Timestamp(30 * 1000L), 8, "b", 1.0)
    ).toDS()
    val got = EventStreams.sessionize(ev, gapSec = 1800).collect()
      .map(s => (s.user_id, s.events, s.startEpoch, s.endEpoch)).toSet
    assert(got === Set((7L, 2L, 0L, 60L), (7L, 1L, 10000L, 10000L),
      (8L, 1L, 30L, 30L)))
  }
}

class SimHashSpec extends GraftSuite {
  import spark.implicits._

  private def simhashOf(tokens: Seq[String]*): Seq[Long] =
    tokens.toSeq.toDF("t")
      .select(SimHash64.simhash64(col("t")).as("h")).as[Long].collect().toSeq

  test("identical token sets hash identically; order-insensitive") {
    val Seq(a, b) = simhashOf(Seq("x", "y", "z"), Seq("z", "x", "y"))
    assert(a === b)
  }

  test("near-duplicate token sets are close in Hamming distance, unrelated far") {
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.updated(5, "CHANGED")
    val far = (1 to 60).map(i => s"other$i")
    val Seq(h1, h2, h3) = simhashOf(base, near, far)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h2) < 16, s"near dup hamming ${ham(h1, h2)}")
    assert(ham(h1, h3) > 16, s"unrelated hamming ${ham(h1, h3)}")
  }

  test("codegen and interpreted paths agree") {
    val df = Seq(Seq("p", "q"), Seq("r")).toDF("t")
    val viaExpr = df.select(SimHash64.simhash64(col("t"))).as[Long].collect()
    // interpreted: call eval through a fresh row-by-row evaluation
    val interpreted = df.collect().map { r =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        r.getSeq[String](0).map(org.apache.spark.unsafe.types.UTF8String.fromString))
      SimHash64.ofTokens(arr)
    }
    assert(viaExpr.toSeq === interpreted.toSeq)
  }

  test("simhash over document tokens finds the known near-dup pair") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val h = docs.select(col("doc_id"),
      SimHash64.simhash64(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
        .as("h"))
    val a = h.select(col("doc_id").as("a"), col("h").as("ha"))
    val b = h.select(col("doc_id").as("b"), col("h").as("hb"))
    val close = a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("ham", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("ham") <= 8)
    assert(close.count() >= 1) // the jaccard-0.97 pair must surface
  }
}

class MediaSpec extends GraftSuite {

  private lazy val media =
    Media.synthesize(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  test("schema: opaque binary payload + typed metadata struct") {
    val f = media.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("bytes") === "binary")
    assert(f("meta").startsWith("struct<width:int,height:int"))
  }

  test("batched decode produces deterministic features; batch amortization holds") {
    val feats = Media.decodeFeatures(media.repartition(4), batchSize = 16)
    val rows = feats.collect()
    assert(rows.length === media.count())
    assert(rows.forall(_.features.length === 8))
    // deterministic across runs and partitionings
    val again = Media.decodeFeatures(media.repartition(1), batchSize = 64)
      .collect().map(r => r.media_id -> r.features.toSeq).toMap
    rows.foreach(r => assert(again(r.media_id) === r.features.toSeq))
  }

  test("resize rewrites metadata, keeps payload contract") {
    val r = Media.resize(media, 224, 224)
    val one = r.select("meta.width", "meta.height").distinct().collect()
    assert(one.length === 1 && one(0).getInt(0) === 224)
  }

  test("frame sampling yields every k-th index within bounds") {
    val s = Media.sampleFrames(media, everyK = 7).collect()
    assert(s.nonEmpty)
    s.foreach { r =>
      val idx = r.getSeq[Int](1)
      assert(idx.head === 0 && idx.forall(_ % 7 === 0))
    }
  }
}

class SimilaritySpec extends GraftSuite {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)

  test("LSH top-k overlaps brute-force top-k (recall sanity) and is deterministic") {
    val exact = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, 5, nPlanes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall $recall")
    val approx2 = Similarity.lshTopK(emb, queries, 5, nPlanes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx === approx2)
  }

  test("LSH candidate set is much smaller than the cross product") {
    val v = emb.select(col("vec_id"),
      Similarity.lshSignature(col("embedding"), 4).as("sig"))
    val bucketSizes = v.groupBy("sig").count().agg(max("count")).first().getLong(0)
    assert(bucketSizes < emb.count()) // buckets actually partition the space
  }
}

class AlternatingCcSpec extends GraftSuite {
  import graft.algo.ConnectedComponents

  test("large-star/small-star CC equals min-propagation on random graphs") {
    val rnd = new scala.util.Random(19)
    for (_ <- 1 to 4) {
      val n = 5 + rnd.nextInt(30)
      val pairs = (0 until n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(p => p._1 != p._2)
      if (pairs.nonEmpty) {
        val slots = undirected(pairs)
        val got = labelsMap(ConnectedComponents.runAlternating(edgesDf(slots)))
        assert(got === Oracles.connectedComponents(slots))
      }
    }
  }

  test("high-diameter path: alternating CC converges in far fewer rounds than the diameter") {
    // 200-vertex path — min-propagation needs ~200 supersteps; the
    // alternating algorithm is O(log n)
    val pairs = (0L until 199L).map(i => (i, i + 1))
    val slots = undirected(pairs)
    val got = labelsMap(ConnectedComponents.runAlternating(edgesDf(slots), maxRounds = 20))
    assert(got === (0L until 200L).map(_ -> 0L).toMap)
  }

  test("simhash64 is callable from SQL after registration") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql("SELECT simhash64(array('a','b')) AS h").collect()(0).getLong(0)
    val viaCol = Seq(Seq("a", "b")).toDF("t")
      .select(graft.functions.SimHash64.simhash64(org.apache.spark.sql.functions.col("t")))
      .collect()(0).getLong(0)
    assert(r === viaCol)
  }
}

class BetweennessSpec extends GraftSuite {

  test("exact BC on karate matches in-memory Brandes") {
    val slots = undirected(Fixtures.karatePairs)
    val got = Betweenness.runExact(edgesDf(slots)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = brandesOracle(slots)
    want.foreach { case (v, bc) =>
      assert(math.abs(got.getOrElse(v, 0.0) - bc) < 1e-6, s"vertex $v")
    }
  }

  test("sampled sources: star center dominates") {
    import spark.implicits._
    val slots = undirected(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    val sources = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    val got = Betweenness.run(edgesDf(slots), sources).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) > 0 && got.getOrElse(1L, 0.0) === 0.0)
  }

  /** Textbook Brandes on the symmetrized slot list (unnormalized,
    * directed-pair accumulation — same convention as the engine).
    */
  private def brandesOracle(slots: Seq[(Long, Long)]): Map[Long, Double] = {
    val nodes = (slots.map(_._1) ++ slots.map(_._2)).distinct.sorted
    val adj = slots.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bc = scala.collection.mutable.Map(nodes.map(_ -> 0.0): _*)
    for (s <- nodes) {
      val stack = scala.collection.mutable.Stack[Long]()
      val pred = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
      val sigma = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      val dist = scala.collection.mutable.Map[Long, Int]().withDefaultValue(-1)
      sigma(s) = 1.0; dist(s) = 0
      val q = scala.collection.mutable.Queue(s)
      while (q.nonEmpty) {
        val v = q.dequeue()
        stack.push(v)
        adj.getOrElse(v, Nil).foreach { w =>
          if (dist(w) < 0) { q.enqueue(w); dist(w) = dist(v) + 1 }
          if (dist(w) == dist(v) + 1) { sigma(w) += sigma(v); pred(w) ::= v }
        }
      }
      val delta = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      while (stack.nonEmpty) {
        val w = stack.pop()
        pred(w).foreach { v => delta(v) += sigma(v) / sigma(w) * (1 + delta(w)) }
        if (w != s) bc(w) += delta(w)
      }
    }
    bc.toMap
  }
}
