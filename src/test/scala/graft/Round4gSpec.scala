package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.streaming.Funnel
import graft.text.{CorpusClean, TextIndex, Winnow}

/** Round-4 batch: phrase query, LM chunking, winnowing fingerprints,
  * ordered funnel.
  */
class Round4gSpec extends GraftSuite {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("topBigramOccurrences finds the hottest bigram and all its positions") {
    val d = docsDf(1L -> "a b a b c", 2L -> "a b x", 3L -> "z")
    val got = TextIndex.topBigramOccurrences(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSet
    assert(got === Set((1L, 0L, "a", "b", 3L), (1L, 2L, "a", "b", 3L),
      (2L, 0L, "a", "b", 3L)))
  }

  test("topBigramOccurrences breaks count ties lexicographically") {
    // (a b) and (b c) both occur once; (a, b) < (b, c)
    val d = docsDf(1L -> "a b", 2L -> "b c")
    val got = TextIndex.topBigramOccurrences(d).collect()
    assert(got.map(r => (r.getString(2), r.getString(3))).toSet ===
      Set(("a", "b")))
  }

  test("chunk covers every token with the window/stride closed form") {
    val words130 = (1 to 130).map(i => s"w$i").mkString(" ")
    val d = docsDf(1L -> words130, 2L -> "x y z", 3L -> "")
    val got = CorpusClean.chunk(d, window = 64, stride = 56).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 130 tokens -> 3 chunks: [0,64), [56,120), [112,130)
    assert(got === Map((1L, 0L) -> 64L, (1L, 1L) -> 64L, (1L, 2L) -> 18L,
      (2L, 0L) -> 3L, (3L, 0L) -> 0L))
    val h = CorpusClean.chunk(d, 64, 56)
      .filter(col("doc_id") === 1 && col("chunk_id") === 2)
      .select(col("chunk_hash")).collect()(0).getString(0)
    val expect = (113 to 130).map(i => s"w$i").mkString(" ")
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(expect.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h === hex)
  }

  /** Imperative winnowing replay: same 60-bit md5-prefix hash, window
    * min, rightmost tie-break.
    */
  private def winnowOracle(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val toks = "\\S+".r.findAllIn(text).toArray
    if (toks.length < k) return Set.empty
    val md = MessageDigest.getInstance("MD5")
    val hs = (0 to toks.length - k).map { i =>
      val g = toks.slice(i, i + k).mkString(" ")
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    (0 to hs.length - w).flatMap { p =>
      val win = hs.slice(p, p + w)
      val m = win.min
      val sel = p + win.lastIndexOf(m)
      Some((sel.toLong, m))
    }.toSet
  }

  test("winnowing fingerprints match the imperative replay") {
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "a b c d e f g h i j",
      3L -> "short one",
      4L -> "the quick brown fox jumps over the lazy dog again and again")
    val d = docsDf(texts: _*)
    val got = Winnow.fingerprints(d, k = 4, w = 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toSet
    val want = texts.flatMap { case (id, t) =>
      winnowOracle(t, 4, 4).map(fp => (id, fp))
    }.toSet
    assert(got === want)
    // identical documents share identical fingerprint sets
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byDoc(1L) === byDoc(4L))
    assert(!byDoc.contains(3L)) // < k + w - 1 tokens -> nothing
  }

  test("funnel stages respect event order per user") {
    val rows = Seq(
      // user 1: full ordered funnel
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 00:01:00"),
      (1L, "click", "2024-01-01 00:02:00"),
      (1L, "purchase", "2024-01-01 00:03:00"),
      // user 2: purchase BEFORE signup never advances past stage 1
      (2L, "purchase", "2024-01-01 00:00:00"),
      (2L, "signup", "2024-01-01 00:05:00"),
      // user 3: no signup -> stage 0 even with views
      (3L, "view", "2024-01-01 00:00:00"),
      // user 4: view at the exact signup second counts (>=)
      (4L, "signup", "2024-01-01 00:00:00"),
      (4L, "view", "2024-01-01 00:00:00"))
    val ev = rows.toDF("user_id", "event_type", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Funnel.stages(ev, Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 4L, 2L -> 1L, 3L -> 0L, 4L -> 2L))
  }

  test("transitions counts adjacent event-type pairs per user in ts order") {
    val rows = Seq(
      (1L, 10L, "a", "2024-01-01 00:00:00"),
      (1L, 11L, "b", "2024-01-01 00:01:00"),
      (1L, 12L, "a", "2024-01-01 00:02:00"),
      (2L, 13L, "a", "2024-01-01 00:00:00"),
      (2L, 14L, "b", "2024-01-01 00:01:00"))
    val ev = rows.toDF("user_id", "event_id", "event_type", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Funnel.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  test("retention builds the cohort triangle on epoch weeks") {
    def t(week: Long) = new java.sql.Timestamp(week * 604800L * 1000L)
    val rows = Seq( // users 1,2 start week 0; user 3 starts week 1
      (1L, t(0)), (1L, t(1)), (2L, t(0)), (3L, t(1)), (3L, t(2)), (1L, t(0)))
    val ev = rows.toDF("user_id", "ts")
    val got = Funnel.retention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, 0L) -> 2L, (0L, 1L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("collocations scores frequent adjacent pairs above independent ones") {
    // "x y" always adjacent (PMI > 0); fillers vary
    val d = docsDf(1L -> "x y a b", 2L -> "x y b a", 3L -> "a x y b",
      4L -> "b a x y")
    val got = TextIndex.collocations(d, minCount = 4L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(got.contains(("x", "y")))
    assert(got(("x", "y")) > 0L)
  }

  test("contract merges matched pairs and aggregates slot weights") {
    import graft.algo.Matching
    // path 0-1-2-3 with matching {(0,1),(2,3)} supplied explicitly
    val slots = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L))))
    val matched = Seq((0L, 1L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "round")
    val got = Matching.contract(slots, matched).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 1-2 slot becomes 0-2 (both directions), intra-pair slots drop
    assert(got === Map((0L, 2L) -> 1L, (2L, 0L) -> 1L))
  }

  test("ballSizes2 counts self + 1-hop + 2-hop distinct") {
    import graft.graph.GraphOps
    val e = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L))))
    val got = GraphOps.ballSizes2(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 1L -> 4L, 2L -> 4L, 3L -> 3L))
  }

  test("sparsifyTopOverlap keeps union of per-vertex nominations") {
    import graft.algo.TriangleCount
    // triangle 0-1-2 + pendant 3 on 0; k=1: vertex 0 nominates (0,1)
    // (common 1, lower neighbor), 1 and 2 nominate their 0-edges,
    // 3 nominates (0,3); (1,2) is nominated by nobody
    val e = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L))))
    val kept = TriangleCount.sparsifyTopOverlap(e, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept === Set((0L, 1L), (0L, 2L), (0L, 3L)))
  }

  test("degreeMoments computes exact sums and kappa") {
    import graft.measures.Measures
    val e = edgesDf(undirected(Seq((0L, 1L), (0L, 2L), (0L, 3L))))
    val r = Measures.degreeMoments(e).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((4L, 6L, 12L, 30L, 2000000L)))
  }

  test("hourlyAnomaly z-scores from exact integer moments") {
    def t(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq( // type a: hourly counts 1, 1, 4
      (1L, "a", t(0, 0)), (2L, "a", t(1, 0)),
      (3L, "a", t(2, 0)), (4L, "a", t(2, 1)),
      (5L, "a", t(2, 2)), (6L, "a", t(2, 3)),
      // type b: constant (zero variance) -> z = 0
      (7L, "b", t(0, 0)), (8L, "b", t(1, 0)))
    val ev = rows.toDF("event_id", "event_type", "ts")
    val got = Funnel.hourlyAnomaly(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    // H=3, S1=6, S2=18, var=18: z(4)=6/sqrt(18), z(1)=-3/sqrt(18)
    assert(got(("a", h0 + 7200)) === 1414214L)
    assert(got(("a", h0)) === -707107L)
    assert(got(("b", h0)) === 0L && got(("b", h0 + 3600)) === 0L)
  }

  test("labelAssortativity is 1 on pure clusters and drops with mixing") {
    import graft.measures.Measures
    def assort(pairs: Seq[(Long, Long)]) = {
      val e = edgesDf(undirected(pairs))
      val labels = e.select(col("src").as("id")).distinct()
        .select(col("id"), (col("id") / 2).cast("long").as("label"))
      Measures.labelAssortativity(e, labels).collect()(0).getLong(3)
    }
    assert(assort(Seq((0L, 1L), (2L, 3L))) === 1000000L)
    // cross edge 1-2: r = (6*4 - 18) / (36 - 18) = 1/3
    assert(assort(Seq((0L, 1L), (2L, 3L), (1L, 2L))) === 333333L)
  }

  test("percolate keeps everything at 1000 permille and nests monotonically") {
    import graft.graph.GraphOps
    val pairs = for { a <- 0L until 15L; b <- 0L until 15L if a < b } yield (a, b)
    val e = edgesDf(undirected(pairs))
    assert(GraphOps.percolate(e, 1000, 11L).count() === e.count())
    def kept(p: Int) = GraphOps.percolate(e, p, 11L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (k3, k6) = (kept(300), kept(600))
    assert(k3.subsetOf(k6))
    assert(k3.nonEmpty && k6.size < pairs.size * 2)
    // both slots of an undirected edge decide together
    assert(k6.forall { case (a, b) => k6.contains((b, a)) })
  }

  test("streaming transitions carry per-user state across micro-batches") {
    import graft.streaming.EventStreams
    val dir = java.nio.file.Files.createTempDirectory("graft-trans").toString
    def batch(rows: Seq[(Long, Long, String, String)], f: String): Unit =
      rows.toDF("event_id", "user_id", "event_type", "ts")
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("value", lit(1.0))
        .coalesce(1).write.parquet(s"$dir/$f")
    // file 1 = early events, file 2 = later events (time-ordered split)
    batch(Seq((1L, 1L, "a", "2024-01-01 00:00:00"),
      (2L, 2L, "x", "2024-01-01 00:01:00")), "f1")
    batch(Seq((3L, 1L, "b", "2024-01-01 00:05:00"),
      (4L, 2L, "y", "2024-01-01 00:06:00"),
      (5L, 1L, "c", "2024-01-01 00:07:00")), "f2")
    // point the stream at the parquet FILES (two batches of one file)
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
    val merged = s"$dir/all"
    new java.io.File(merged).mkdirs()
    files.foreach { d =>
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(merged, d.getName + ".parquet"))
      }
    }
    // the file source triggers oldest-first: pin modification times so
    // the early batch is guaranteed to run first
    new java.io.File(merged, "f1.parquet").setLastModified(1000000L)
    new java.io.File(merged, "f2.parquet").setLastModified(2000000L)
    val got = EventStreams.runTransitionStream(spark, merged,
        "graft_test_trans", maxFilesPerTrigger = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // (a,b) and (x,y) cross the batch boundary; (b,c) is within batch 2
    assert(got === Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("x", "y") -> 1L))
  }

  test("pqCodes picks the per-block nearest codeword") {
    import graft.functions.Similarity
    val vecs = Seq(
      (0L, Array(0f, 0f, 1f, 1f)),   // codeword (id % 2 == 0)
      (2L, Array(1f, 1f, 0f, 0f)),   // codeword
      (1L, Array(0.1f, 0f, 0.9f, 1f)),
      (3L, Array(0.9f, 1f, 0.1f, 0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.pqCodes(df, blocks = 2, dim = 4, centStride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 0L)) === 0L && got((1L, 1L)) === 0L)
    assert(got((3L, 0L)) === 2L && got((3L, 1L)) === 2L)
    // codewords code to themselves (d = 0, lowest cid wins exact ties)
    assert(got((0L, 0L)) === 0L && got((2L, 1L)) === 2L)
  }

  test("tokenStats: BPE-ish pre-tokens split digits and punctuation out") {
    val d = docsDf(1L -> "Window merge spark2 a,b")
    val r = CorpusClean.tokenStats(d).collect()(0)
    // ws: [Window, merge, spark2, a,b] = 4
    // bpe: [window, merge, spark, 2, a, ",", b] = 7
    assert((r.getLong(1), r.getLong(2)) === ((4L, 7L)))
  }

  test("spanMasks merges masked runs and numbers spans by start") {
    val text = (0 until 60).map(i => s"t$i").mkString(" ")
    val d = docsDf(9L -> text)
    val rows = CorpusClean.spanMasks(d, permille = 300, seed = 5L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // independent replay of the position draw
    val md = MessageDigest.getInstance("MD5")
    def h60(s: String) = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val masked = (0 until 60).filter(p => h60(s"9:$p:5") % 1000 < 300)
    // reconstruct runs
    val runs = masked.foldLeft(List.empty[(Int, Int)]) {
      case ((s0, l) :: rest, p) if p == s0 + l => (s0, l + 1) :: rest
      case (acc, p) => (p, 1) :: acc
    }.reverse
    assert(rows.map(r => (r._2.toInt, r._3.toInt)) === runs)
    assert(rows.map(_._1) === rows.indices.map(_.toLong))
  }

  test("featureHash maps terms by the md5 draw with the bit-4 sign") {
    val d = docsDf(1L -> "alpha alpha beta")
    val got = TextIndex.featureHash(d, dim = 16).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    val md = MessageDigest.getInstance("MD5")
    def h60(s: String) = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    def entry(t: String, n: Long) =
      (h60(t) % 16, if (h60(t) % 32 < 16) n else -n)
    val want = Seq(entry("alpha", 2L), entry("beta", 1L))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 != 0).toMap
    assert(got === want)
  }

  test("conductance sweep bottoms out at the planted community") {
    // two K4s joined by one bridge; scores order the seed K4 first
    def k4(off: Long) =
      for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a + off, b + off)
    val e = edgesDf(undirected(k4(0) ++ k4(4) :+ (3L, 4L)))
    val scores = (0L to 7L).map(i => (i, 1000L - i)).toDF("id", "score_e6")
    val sw = graft.algo.SweepCut.conductanceSweep(e, scores, m = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    // k=4 prefix = the seed K4: vol 13, cut 1 (the bridge)
    assert(sw(4L) === ((13L, 1L, 76923L)))
    assert(sw(3L) === ((9L, 3L, 333333L)))
    // the full prefix swallows all volume -> conventional 10^6
    assert(sw(8L)._3 === 1000000L)
    val best = sw.minBy { case (k, (_, _, c)) => (c, k) }._1
    assert(best === 4L)
  }

  test("bipartite check separates even cycles from odd") {
    import graft.algo.Bipartite
    val e = edgesDf(undirected(Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L),   // C4: bipartite
      (10L, 11L), (11L, 12L), (12L, 10L),       // triangle: odd cycle
      (20L, 21L))))                             // edge: bipartite
    // columns: component, n_vertices, n_layered (round 5), n_odd, bipartite
    val got = Bipartite.check(e).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(0L -> ((4L, 4L, 0L, 1L)), 10L -> ((3L, 3L, 1L, 0L)),
      20L -> ((2L, 2L, 0L, 1L))))
  }
}
