package graft

import org.apache.spark.sql.functions._
import graft.text.CorpusClean

/** Brute-force oracles for the corpus-hygiene operators. */
class CorpusCleanSpec extends GraftSuite {
  import spark.implicits._

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "a b c d e f g h i j",          // blocks: "a b c d e", "f g h i j"
    2L -> "a b c d e x y z w v",          // shares block 1 with doc 1
    3L -> "f g h i j a b c d e",          // shares both (order swapped)
    4L -> "one two three",                // short: no 5-block
    5L -> "a b c d e")                    // block 1 again
  private def docsDf = corpus.toDF("doc_id", "text")

  test("passageDedup finds exactly the repeated non-overlapping blocks") {
    val out = CorpusClean.passageDedup(docsDf, 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "a b c d e" -> ((4L, 4L)),
      "f g h i j" -> ((2L, 2L))))
  }

  test("passageDedup: trailing partial blocks are dropped, not merged") {
    val d = Seq(6L -> "a b c d e f g").toDF("doc_id", "text")
    assert(CorpusClean.passageDedup(d.union(d.withColumn("doc_id", lit(7L))), 5)
      .collect().map(_.getString(0)).toSeq === Seq("a b c d e"))
  }

  test("decontaminate flags non-bench docs by shared shingle count") {
    // bench = doc 1; doc 3 shares 6 distinct shingles with it, doc 2
    // shares 3 ("a b c","b c d","c d e"), doc 5 shares 3
    val out = CorpusClean.decontaminate(docsDf, col("doc_id") === 1, 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(3L -> 6L))
    val loose = CorpusClean.decontaminate(docsDf, col("doc_id") === 1, 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loose === Map(2L -> 3L, 3L -> 6L, 5L -> 3L))
    // bench members are never flagged
    assert(!loose.contains(1L))
  }

  test("redactPii counts and rewrites emails and phones") {
    val d = Seq(
      (1L, "mail me at alice.b-1@sub.example.com or call 555-0199 now"),
      (2L, "two mails x@a.io y%z@b.co.uk and 555-12345 has a phone prefix"),
      (3L, "no pii here")).toDF("doc_id", "text")
    val out = CorpusClean.redactPii(d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((1L, 1L, "mail me at <EMAIL> or call <PHONE> now")))
    // 555-12345: the regex matches its first 4 digits (narrow by design)
    assert(out(2L)._1 === 2L && out(2L)._2 === 1L)
    assert(out(2L)._3 === "two mails <EMAIL> <EMAIL> and <PHONE>5 has a phone prefix")
    assert(out(3L) === ((0L, 0L, "no pii here")))
  }
}
