package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked-retrieval scoring (Robertson–Spärck Jones, the Lucene
  * variant) — the relevance function a corpus-scale search/reranking
  * pass runs:
  *
  *   score(d, t) = idf(t) · tf·(k₁+1) / (tf + k₁·(1 − b + b·len/avgLen))
  *   idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5)) = ln((2N+2)/(2df+1))
  *
  * With k₁ = 6/5 and b = 3/4 the saturation factor reduces to ONE exact
  * integer ratio (multiply through by 10·total):
  *
  *   tf·(k₁+1) / (tf + k₁(1−b) + k₁·b·len·N/total)
  *     = 22·tf·total / (10·tf·total + 3·total + 9·len·N)
  *
  * so the whole score is ln(exact-int / exact-int) × (exact-int /
  * exact-int) — two IEEE divisions and one multiply in a fixed order,
  * bit-reproducible cross-engine (the NMI/PMI precedent for ln).
  *
  * Scores are emitted PER (doc, term) — no cross-term summation, so no
  * float-accumulation ordering enters the gate; a ranked retrieval sums
  * the per-term rows afterward. Plan: tokenize scan → tf hash agg → df
  * hash agg → broadcast the scalar (N, total) and the tiny query-term
  * table back — three aggregates and two broadcast joins, nothing
  * corpus-pairwise.
  *
  * Integer envelope (ADVICE r4, the labelAssortativity precedent): the
  * saturation terms 10·tf·total and 9·len·N stay inside int64 while
  * tf·total and len·N < ~9.2×10¹⁷, i.e. up to ~10¹⁴ total corpus tokens
  * at tf, len ≤ 10⁴ — comfortably past 100 TB of text, but NOT unbounded.
  * Past that, lift the two products to Decimal(38,0) (the ratio is
  * consumed as a double anyway, so the swap is local to this select);
  * the exact-integer form is kept because it is what makes the gate
  * bit-reproducible.
  */
object Bm25 {

  private val arrCol =
    regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))

  /** Score the `qTerms` highest-df terms (df desc, term asc — the
    * deterministic self-contained query) against every document
    * containing them. Returns (doc_id, term, tf, score_e6).
    */
  def scoreTopDfTerms(docs: DataFrame, qTerms: Int): DataFrame = {
    require(qTerms >= 1)
    val tok = docs.select(col("doc_id"), explode(arrCol).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val lens = docs.select(col("doc_id"), size(arrCol).cast("long").as("len"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scal = lens.agg(count(lit(1)).as("n"),
      sum(col("len")).cast("long").as("total"))
    val query = dfT.orderBy(col("df").desc, col("term").asc).limit(qTerms)
    tf.join(query, "term")
      .join(lens, "doc_id")
      .crossJoin(scal)
      .select(col("doc_id"), col("term"), col("tf"),
        round(
          log((lit(2) * col("n") + 2).cast("double") / (lit(2) * col("df") + 1)) *
            ((lit(22) * col("tf") * col("total")).cast("double") /
              (lit(10) * col("tf") * col("total") + lit(3) * col("total") +
                lit(9) * col("len") * col("n"))) * 1000000)
          .cast("long").as("score_e6"))
  }

  /** BM25F — the field-weighted web variant (Robertson–Zaragoza,
    * simplified form with shared normalization): anchor-text hits count
    * `wAnchor`× body hits, the classic web-ranking heuristic that makes
    * a page rank for what OTHERS call it. With integer field weights the
    * weighted pseudo-frequency wtf = tf_body + wAnchor·tf_anchor and
    * weighted length wlen = len_body + wAnchor·len_anchor are exact
    * longs, so the WHOLE BM25 algebra above applies verbatim with
    * tf→wtf, len→wlen — same integer ratio, same two-division ln form,
    * same envelope. df counts docs where wtf > 0 (either field hits).
    *
    * Plan: two tokenize scans (body corpus + the much smaller anchor
    * table), a full-outer (doc, term) merge of the two tf tables, then
    * the BM25 shape — hash aggs and broadcast joins only.
    *
    * @param anchors (doc_id, anchor) — inbound anchor text per doc
    *                ([[graft.sources.TextExtract]] anchor aggregation
    *                shape); docs absent here have empty anchor field
    * @return (doc_id, term, wtf, score_e6) for the `qTerms` top-df terms
    */
  def scoreTopDfTermsF(docs: DataFrame, anchors: DataFrame, qTerms: Int,
                       wAnchor: Long = 3L): DataFrame = {
    require(qTerms >= 1 && wAnchor >= 1)
    val anchArr =
      regexp_extract_all(lower(col("anchor")), lit("[a-z0-9]+"), lit(0))
    val tfB = docs.select(col("doc_id"), explode(arrCol).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tfb"))
    val tfA = anchors.select(col("doc_id"), explode(anchArr).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tfa"))
    val wtf = tfB.join(tfA, Seq("doc_id", "term"), "full_outer")
      .select(col("doc_id"), col("term"),
        (coalesce(col("tfb"), lit(0L)) +
          lit(wAnchor) * coalesce(col("tfa"), lit(0L))).as("wtf"))
      // anchors pointing outside the corpus score nothing and must not
      // inflate df — keep corpus docs only
      .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val lensB = docs.select(col("doc_id"), size(arrCol).cast("long").as("lb"))
    val lensA = anchors.select(col("doc_id"),
        size(anchArr).cast("long").as("la_raw"))
      .groupBy("doc_id").agg(sum(col("la_raw")).as("la"))
    val lens = lensB.join(lensA, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("lb") + lit(wAnchor) * coalesce(col("la"), lit(0L))).as("wlen"))
    val dfT = wtf.groupBy("term").agg(count(lit(1)).as("df"))
    val scal = lens.agg(count(lit(1)).as("n"),
      sum(col("wlen")).cast("long").as("total"))
    val query = dfT.orderBy(col("df").desc, col("term").asc).limit(qTerms)
    wtf.join(query, "term")
      .join(lens, "doc_id")
      .crossJoin(scal)
      .select(col("doc_id"), col("term"), col("wtf"),
        round(
          log((lit(2) * col("n") + 2).cast("double") / (lit(2) * col("df") + 1)) *
            ((lit(22) * col("wtf") * col("total")).cast("double") /
              (lit(10) * col("wtf") * col("total") + lit(3) * col("total") +
                lit(9) * col("wlen") * col("n"))) * 1000000)
          .cast("long").as("score_e6"))
  }
}
