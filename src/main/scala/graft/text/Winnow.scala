package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust winnowing fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
  * algorithm): hash every k-token gram, slide a w-gram window, and keep
  * the minimum hash of each window — rightmost position on ties. The
  * selected fingerprints are position-stable under edits (any substring
  * match of length ≥ w + k − 1 tokens shares a fingerprint), which is
  * what makes them the standard local-similarity / plagiarism primitive
  * where whole-document simhash/minhash are too coarse.
  *
  * The gram hash is the engine's replayable 60-bit md5 prefix
  * ([[TextIndex.md5Uniform]]), the window minimum is a doc-partitioned
  * frame (partition-local, no global sort), and the rightmost-on-tie
  * selection is an equi-join on (doc, window-min hash, coarse position
  * bucket ⌊pos/w⌋) — each window probes at most the two buckets its
  * position range spans, so the join itself bounds candidates to O(w)
  * per window even on a degenerate document whose minimum hash recurs in
  * every window (ADVICE r4: keying only on (doc, hash) made such
  * documents O(n²)). Per document O(n·w) candidate pairs, linear in the
  * corpus for fixed w. Everything replays bit-for-bit in ANSI SQL.
  */
object Winnow {

  private val tokensCol: Column =
    regexp_extract_all(col("text"), lit("\\S+"), lit(0))

  /** Distinct selected fingerprints (doc_id, pos, fp): `pos` is the
    * 0-based token position of the selected k-gram, `fp` its 60-bit
    * hash. Documents shorter than k + w − 1 tokens have no complete
    * window and yield no fingerprints.
    */
  def fingerprints(docs: DataFrame, k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"need k, w >= 1, got k=$k w=$w")
    val grams = docs.select(col("doc_id"), tokensCol.as("arr"))
      .filter(size(col("arr")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("arr")) - k),
          i => concat_ws(" ",
            (0 until k).map(j => element_at(col("arr"), i + j + 1)): _*)))
          .as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        TextIndex.md5Uniform(col("g")).as("h"))
    val frame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    val wins = grams
      .select(col("doc_id"), col("pos").as("wpos"),
        min(col("h")).over(frame).as("wm"),
        count(lit(1)).over(frame).as("wn"))
      .filter(col("wn") === w) // complete windows only
    // fresh key names on the lookup side: both legs derive from `grams`,
    // and Spark's ambiguous-self-join detector rejects reused references.
    // The ⌊pos/w⌋ bucket is part of the equi-join key: a window's range
    // [wpos, wpos+w−1] spans at most two buckets, enumerated on the
    // window side, so the hash-join build per (doc, hash, bucket) cell is
    // window-bounded regardless of how often the min hash recurs
    val g2 = grams.select(col("doc_id").as("doc2"), col("pos").as("gpos"),
      col("h").as("gh"), expr(s"pos div $w").as("gbk"))
    val winsB = wins.select(col("doc_id"), col("wpos"), col("wm"),
      explode(array_distinct(array(
        expr(s"wpos div $w"), expr(s"(wpos + ${w - 1}) div $w")))).as("bk"))
    winsB.join(g2,
        col("doc_id") === col("doc2") && col("gh") === col("wm") &&
          col("bk") === col("gbk") &&
          col("gpos") >= col("wpos") && col("gpos") <= col("wpos") + (w - 1))
      .groupBy(col("doc_id"), col("wpos"), col("wm"))
      .agg(max(col("gpos")).as("pos")) // rightmost min in the window
      .select(col("doc_id"), col("pos"), col("wm").as("fp"))
      .distinct()
  }
}
