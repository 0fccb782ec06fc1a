package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps
import graft.algo.TriangleCount
import graft.text.TextIndex

/** Round-4 late additions, batch 3: corpus indexing (postings,
  * co-occurrence, weighted sampling) and deterministic graph sampling
  * (Doulion triangle estimate, induced subgraph). Brute-force oracles are
  * computed in plain Scala on inline fixtures.
  */
object TextFixtures {
  // (doc_id, text); vocabulary engineered so df/cap/band all bite:
  //   "alpha" df=5, "beta" df=4, "gamma" df=3, "delta" df=2, "rare" df=1
  val corpus: Seq[(Long, String)] = Seq(
    1L -> "alpha beta gamma alpha",
    2L -> "alpha beta gamma delta",
    3L -> "alpha beta gamma",
    4L -> "alpha beta delta",
    5L -> "alpha rare")

  def docsDf(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def terms(text: String): Set[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSet
}

class TextIndexSpec extends GraftSuite {
  import TextFixtures._

  test("postings: exact df, df floor applied, posting head capped and ascending") {
    val out = TextIndex.postings(docsDf(spark), minDf = 2L, cap = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // brute force
    val inverted = corpus
      .flatMap { case (id, t) => terms(t).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val want = inverted.collect {
      case (t, ids) if ids.size >= 2 =>
        t -> ((ids.size.toLong, ids.take(3).mkString(",")))
    }.toMap
    assert(out === want)
    assert(!out.contains("rare"))                    // df floor
    assert(out("alpha") === ((5L, "1,2,3")))         // df exact, head capped at 3
    assert(out("delta") === ((2L, "2,4")))           // below cap: full list
  }

  test("co-occurrence: df band excludes head and tail terms, counts exact") {
    // band [3,4]: vocabulary {beta(4), gamma(3)}; alpha(5) and delta(2) out
    val out = TextIndex.coOccurrence(docsDf(spark), minDf = 3L, maxDf = 4L,
        minPairs = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("beta", "gamma") -> 3L))
    // minPairs filter bites
    val none = TextIndex.coOccurrence(docsDf(spark), minDf = 3L, maxDf = 4L,
      minPairs = 4L).count()
    assert(none === 0L)
  }

  test("weighted sample: deterministic replay, p formula, maxP cap") {
    val d = docsDf(spark)
    val a = TextIndex.weightedSample(d, seed = 13L, mult = 40L, maxP = 900L)
    val b = TextIndex.weightedSample(d, seed = 13L, mult = 40L, maxP = 900L)
    assert(a.collect().toSeq.sortBy(_.getLong(0))
      === b.collect().toSeq.sortBy(_.getLong(0)))
    // p = min(maxP, n_chars*mult), exact per row
    a.collect().foreach { r =>
      assert(r.getLong(2) === math.min(900L, r.getLong(1) * 40L))
    }
    // mult large enough that p = maxP for all docs => keep rate ~90%;
    // with maxP = 1000 every doc is kept (md5 % 1000 < 1000 always)
    val all = TextIndex.weightedSample(d, seed = 13L, mult = 1000L, maxP = 1000L)
    assert(all.count() === corpus.size.toLong)
  }
}

class SkipGramSpec extends GraftSuite {
  import spark.implicits._

  test("skipGramPairs matches the brute-force windowed pair count") {
    // two walks: 10→11→12→13 and 20→21→20
    val walks = Seq(
      (10L, 0L, 10L), (10L, 1L, 11L), (10L, 2L, 12L), (10L, 3L, 13L),
      (20L, 0L, 20L), (20L, 1L, 21L), (20L, 2L, 20L))
      .toDF("walk_id", "step", "vertex")
    val got = graft.algo.RandomWalks.skipGramPairs(walks, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force over each walk's positions
    val seqs = Seq(Seq(10L, 11L, 12L, 13L), Seq(20L, 21L, 20L))
    val want = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (s <- seqs; i <- s.indices; j <- s.indices
         if i != j && math.abs(i - j) <= 2)
      want((s(i), s(j))) = want.getOrElse((s(i), s(j)), 0L) + 1L
    assert(got === want.toMap)
    // the revisit in walk 20 yields a (20,20) self-pair at distance 2 —
    // real corpora keep it (word2vec does); assert it is counted
    assert(got((20L, 20L)) === 2L)
  }

  test("skipGramPairs window=1 keeps only adjacent-step pairs") {
    val walks = Seq((1L, 0L, 5L), (1L, 1L, 6L), (1L, 2L, 7L))
      .toDF("walk_id", "step", "vertex")
    val got = graft.algo.RandomWalks.skipGramPairs(walks, window = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((5L, 6L), (6L, 5L), (6L, 7L), (7L, 6L)))
  }
}

class SgnsSpec extends GraftSuite {
  import spark.implicits._
  import graft.algo.{RandomWalks, SkipGram}

  private val slots = undirected(Fixtures.karatePairs)
  private def edges = edgesDf(slots)

  test("pmiScores matches the closed-form marginal computation") {
    val rows = Seq((1L, 2L, 3L), (2L, 1L, 3L), (1L, 3L, 1L),
      (3L, 1L, 1L), (2L, 3L, 2L))
    val got = SkipGram.pmiScores(rows.toDF("center", "context", "n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val bigN = rows.map(_._3).sum.toDouble
    val nc = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val nx = rows.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    assert(got.size === rows.size)
    for ((c, x, n) <- rows) {
      val want = math.round(
        math.log(n * bigN / (nc(c).toDouble * nx(x))) * 1e6)
      assert(got((c, x))._1 === n)
      assert(got((c, x))._2 === want)
    }
  }

  test("negativeSamples replays the sequential weighted draw") {
    val pairs = Seq((1L, 2L), (5L, 34L), (33L, 34L)).toDF("center", "context")
    val k = 4
    val got = SkipGram.negativeSamples(edges, pairs, k, buckets = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // brute-force replay: weights, prefix intervals in id order, draws
    val deg = slots.groupBy(_._1).map { case (s, es) => s -> es.size }
    val ids = deg.keys.toSeq.sorted
    val w = ids.map { id =>
      val d = deg(id).toDouble
      id -> math.max(1L, math.floor(math.sqrt(math.sqrt(d * d * d))).toLong)
    }.toMap
    val tw = ids.map(w).sum
    val lo = scala.collection.mutable.Map.empty[Long, Long]
    var acc = 0L
    for (id <- ids) { lo(id) = acc; acc += w(id) }
    var expected = 0
    for ((c, x) <- Seq((1L, 2L), (5L, 34L), (33L, 34L)); j <- 0L until k.toLong) {
      val r = (c * RandomWalks.StepMixA + x * RandomWalks.StepMixB
        + j * SkipGram.StepMixC) % tw
      val hit = ids.find(id => r >= lo(id) && r < lo(id) + w(id)).get
      if (hit != x) { assert(got((c, x, j)) === hit); expected += 1 }
      else assert(!got.contains((c, x, j)))
    }
    assert(got.size === expected)
  }

  test("trainingExamples packs negatives in draw order, empty when all collide") {
    val pairs = Seq((1L, 2L, 5L), (9L, 9L, 1L)).toDF("center", "context", "n")
    val negs = Seq((1L, 2L, 1L, 30L), (1L, 2L, 0L, 7L), (1L, 2L, 2L, 7L))
      .toDF("center", "context", "j", "neg")
    val got = SkipGram.trainingExamples(pairs, negs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(got((1L, 2L)) === ((5L, "7,30,7")))
    assert(got((9L, 9L)) === ((1L, "")))
  }

  test("neighborSample replays layered draws; frontier is shared per layer") {
    val seeds = Seq(1L, 34L).toDF("id")
    val fan = Seq(3, 2)
    val got = RandomWalks.neighborSample(edges, seeds, fan)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val adjm = slots.groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).sorted.toVector }
    var frontier = Set(1L, 34L)
    val want = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for ((f, li) <- fan.zipWithIndex) {
      val l = li + 1
      val next = scala.collection.mutable.Set.empty[Long]
      for (v <- frontier; i <- 0 until f) {
        val nb = adjm(v)
        val idx = ((v * RandomWalks.StepMixA + i * RandomWalks.StepMixB
          + l) % nb.size).toInt
        want += ((l.toLong, v, nb(idx)))
        next += nb(idx)
      }
      frontier = next.toSet
    }
    assert(got === want.toSet)
    // with-replacement duplicates collapse: ≤ fanout edges per (layer, src)
    got.groupBy(t => (t._1, t._2)).foreach { case ((l, _), es) =>
      assert(es.size <= fan(l.toInt - 1))
    }
  }
}

class TopKPlanSpec extends GraftSuite {

  test("topTerms matches brute force and plans as TakeOrderedAndProject") {
    val docs = TextFixtures.docsDf(spark)
    val out = TextIndex.topTerms(docs, k = 3)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortExec"), plan) // no global sort
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toList
    // brute force: df desc, term asc
    val df = TextFixtures.corpus
      .flatMap { case (id, t) => TextFixtures.terms(t).map(_ -> id) }
      .distinct.groupBy(_._1).map { case (t, xs) => t -> xs.size.toLong }
    val want = df.toList.sortBy { case (t, n) => (-n, t) }.take(3)
    assert(got === want)
  }
}

class SgnsPlanSpec extends GraftSuite {
  import spark.implicits._

  test("negativeSamples and neighborSample never plan a cartesian product") {
    val edges = edgesDf(undirected(Fixtures.karatePairs))
    val pairs = Seq((1L, 2L), (5L, 34L)).toDF("center", "context")
    val neg = graft.algo.SkipGram.negativeSamples(edges, pairs, k = 2,
      buckets = 4)
    neg.collect()
    // the only non-equi attachments are the documented 1-row scalar
    // crossJoins (max id / total weight) — those broadcast; the draw
    // lookup itself must stay a block equi-join
    assert(!neg.queryExecution.executedPlan.toString()
      .contains("CartesianProduct"))
    val sage = graft.algo.RandomWalks.neighborSample(edges,
      Seq(1L, 34L).toDF("id"), Seq(3, 2))
    sage.collect()
    assert(!sage.queryExecution.executedPlan.toString()
      .contains("CartesianProduct"))
  }
}

class MisSpec extends GraftSuite {

  private val slots = undirected(Fixtures.karatePairs)
  private def edges = edgesDf(slots)
  private val adj = slots.groupBy(_._1)
    .map { case (s, es) => s -> es.map(_._2).toSet }

  private def prio60(id: Long, seed: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$seed".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("mis fixpoint is the greedy (priority, id)-order MIS and is proper") {
    val got = graft.algo.Mis.mis(edges, seed = 7L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet === adj.keySet)
    assert(got.values.forall(s => s == "in" || s == "out"))
    val ins = got.filter(_._2 == "in").keySet
    for (v <- ins) assert(adj(v).intersect(ins).isEmpty) // independent
    for ((v, s) <- got if s == "out")
      assert(adj(v).intersect(ins).nonEmpty)             // maximal
    // lexicographically-first MIS of the priority order: sequential greedy
    val greedy = scala.collection.mutable.Set.empty[Long]
    for (v <- adj.keys.toSeq.sortBy(v => (prio60(v, 7L), v))
         if adj(v).intersect(greedy.toSet).isEmpty) greedy += v
    assert(ins === greedy.toSet)
  }

  test("misFixed statuses are monotone across round counts") {
    val r2 = graft.algo.Mis.misFixed(edges, seed = 7L, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val r3 = graft.algo.Mis.misFixed(edges, seed = 7L, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((v, s) <- r2 if s != "und") assert(r3(v) === s)
  }
}

class GraphSamplingSpec extends GraftSuite {

  private val pairs = Fixtures.karatePairs

  test("approxTriangles at permille=1000 reproduces the exact count") {
    val e = edgesDf(undirected(pairs))
    val exact = Oracles.triangles(undirected(pairs))
    val r = TriangleCount.approxTriangles(e, permille = 1000, seed = 7L).first()
    assert(r.getAs[Long]("sampled_triangles") === exact)
    assert(r.getAs[Long]("est_triangles") === exact)
    assert(r.getAs[Long]("sampled_edges") === pairs.size.toLong)
  }

  test("approxTriangles estimate is the sampled count scaled by (1000/p)^3") {
    val e = edgesDf(undirected(pairs))
    val r = TriangleCount.approxTriangles(e, permille = 500, seed = 7L).first()
    assert(r.getAs[Long]("est_triangles")
      === r.getAs[Long]("sampled_triangles") * 8L)
    assert(r.getAs[Long]("sampled_edges") < pairs.size.toLong)
  }

  test("approxTriangles rejects permille values that do not divide 1000") {
    intercept[IllegalArgumentException] {
      TriangleCount.approxTriangles(edgesDf(undirected(pairs)), 300, 1L)
    }
  }

  test("sampleInduced at permille=1000 is the identity on the slot set") {
    val e = edgesDf(undirected(pairs))
    val out = GraphOps.sampleInduced(e, permille = 1000, seed = 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === undirected(pairs).toSet)
  }

  test("sampleInduced keeps exactly the edges with both endpoints sampled") {
    val e = edgesDf(undirected(pairs))
    val out = GraphOps.sampleInduced(e, permille = 400, seed = 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.nonEmpty && out.size < undirected(pairs).size)
    // closure: the endpoint set of the output is a subset of the sampled
    // vertex set, i.e. no edge survives with an unsampled endpoint — and
    // every input edge whose both endpoints appear in the output's vertex
    // set must itself have survived (induced property)
    val vs = out.flatMap(p => Seq(p._1, p._2))
    undirected(pairs).foreach { case (a, b) =>
      if (vs(a) && vs(b)) assert(out((a, b)))
    }
    // determinism
    val again = GraphOps.sampleInduced(e, permille = 400, seed = 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === out)
  }
}
