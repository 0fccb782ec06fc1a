package graft

import org.apache.spark.sql.functions._

/** Round-5 batch aa: char entropy, signal roughness. */
class CharEntropySpec extends GraftSuite {
  import graft.text.CorpusClean

  test("uniform alphabets hit exact bit counts; constant hits zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),        // H = 0
      (2L, "ab"),          // H = 1 bit
      (3L, "abcd"),        // H = 2 bits
      (4L, "---"),         // nothing in-alphabet: dropped
      (5L, "a b! a b?")).toDF("doc_id", "text") // punctuation ignored
    val r = CorpusClean.charEntropy(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) === ((4L, 0L)))
    assert(r(2L) === ((2L, 1000000L)))
    assert(r(3L) === ((4L, 2000000L)))
    assert(!r.contains(4L))
    assert(r(5L) === ((4L, 1000000L)))
  }

  test("case folding: upper and lower case count together") {
    import spark.implicits._
    val docs = Seq((1L, "AaAa")).toDF("doc_id", "text")
    val r = CorpusClean.charEntropy(docs).collect().head
    assert(r.getLong(1) === 4L && r.getLong(2) === 0L)
  }
}

class SignalRoughnessSpec extends GraftSuite {
  import graft.measures.Measures
  import graft.graph.GraphOps

  test("path 1-2-3 with a spike at the center: hand energies") {
    import spark.implicits._
    val e = GraphOps.symmetrize(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val scores = Seq((1L, 0L), (2L, 10L), (3L, 0L))
      .toDF("id", "score_e6")
    val r = Measures.signalRoughness(e, scores).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r === Map(1L -> ((1L, 100L)), 2L -> ((2L, 200L)),
      3L -> ((1L, 100L))))
  }

  test("constant signal has zero energy everywhere") {
    import spark.implicits._
    val e = GraphOps.symmetrize(Seq((1L, 2L), (2L, 3L), (1L, 3L))
      .toDF("src", "dst"))
    val scores = Seq(1L, 2L, 3L).toDF("id")
      .select(col("id"), lit(7L).as("score_e6"))
    val r = Measures.signalRoughness(e, scores).collect()
    assert(r.forall(_.getLong(2) === 0L))
  }
}
