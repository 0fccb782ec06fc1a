package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bigram language-model estimation over the corpus — interpolated
  * Kneser–Ney with absolute discount D = 3/4 (the standard smoothing for
  * count-based LMs; Chen & Goodman 1998):
  *
  *   p(w2|w1) = (c(w1,w2) − D)/c(w1·)  +  D·N1+(w1·)/c(w1·) · P_cont(w2)
  *   P_cont(w2) = N1+(·w2) / N1+(··)
  *
  * With D kept rational the whole probability is one exact fraction:
  *
  *   p = [ (4·c12 − 3)·np + 3·n1p·nl ] / (4·c1·np)
  *
  * (c12 ≥ 1 keeps the discounted term positive), emitted as the scaled
  * integer ⌊p·10⁹⌋ — a single floor division, bit-identical cross-engine.
  *
  * Plan shape: one corpus scan explodes adjacent-token pairs (constant
  * per-row fan-out), then everything is hash aggregates over the bigram
  * TYPE table (vocabulary-sized, not corpus-sized): context totals c1 and
  * follower diversity n1p per w1, continuation counts nl per w2, and the
  * scalar np broadcast back. The final per-context ranking windows by w1,
  * so no key concentrates beyond one context's follower set.
  *
  * Numerators stay within Long while c12·np·4·10⁹ < 2⁶³, i.e. bigram
  * occurrence × type counts below ~2.3×10⁹ combined — beyond that,
  * promote the two products to Decimal(38,0); the plan is unchanged.
  */
object NgramLm {

  /** Adjacent lowercase-token bigram occurrences, one row each. */
  def bigrams(docs: DataFrame): DataFrame = {
    val arr = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    docs.select(arr.as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(explode(zip_with(
        slice(col("arr"), lit(1), size(col("arr")) - 1),
        slice(col("arr"), lit(2), size(col("arr")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
  }

  /** The full KN probability table (w1, w2, c12, p_e9) for bigrams seen
    * at least `minCount` times — the model every scorer joins against.
    */
  def probabilities(docs: DataFrame, minCount: Long): DataFrame = {
    require(minCount >= 1)
    val c12 = bigrams(docs).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = c12.groupBy("w1")
      .agg(sum(col("c12")).cast("long").as("c1"), count(lit(1)).as("n1p"))
    val cont = c12.groupBy("w2").agg(count(lit(1)).as("nl"))
    val np = c12.agg(count(lit(1)).as("np"))
    c12.filter(col("c12") >= minCount)
      .join(ctx, "w1").join(cont, "w2").crossJoin(np)
      .select(col("w1"), col("w2"), col("c12"),
        expr("(((4 * c12 - 3) * np + 3 * n1p * nl) * 1000000000L)" +
          " div (4 * c1 * np)").as("p_e9"))
  }

  /** Interpolated-KN bigram probabilities, top `topK` continuations per
    * context among bigrams seen at least `minCount` times. Returns
    * (w1, w2, c12, p_e9, rn).
    */
  def kneserNey(docs: DataFrame, minCount: Long, topK: Int): DataFrame = {
    require(topK >= 1)
    val scored = probabilities(docs, minCount)
    val w = Window.partitionBy("w1").orderBy(col("p_e9").desc, col("w2").asc)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
  }

  /** Per-document LM negative log-likelihood under the corpus's own KN
    * bigram model — the "quality filter by LM score" pass a training-data
    * pipeline runs (low-perplexity ≈ fluent text, extreme values flag
    * boilerplate or garbage). Returns (doc_id, n_bigrams, nll_e6): the
    * per-bigram term is ROUND(−ln(p_e9/10⁹)·10⁶) — an INTEGER computed
    * from the exact integer probability, so the per-doc sum is
    * order-independent and the gate replays bit-for-bit (the edge-BC
    * lesson: never hash a float sum whose addend order the engine does
    * not pin). Plan: the bigram scan joined to the vocabulary-sized
    * model table + one doc-keyed hash aggregation; the model join is a
    * bigram-type-table join, never corpus × corpus.
    */
  def docNll(docs: DataFrame): DataFrame = {
    val arr = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val db = docs.select(col("doc_id"), arr.as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("arr"), lit(1), size(col("arr")) - 1),
        slice(col("arr"), lit(2), size(col("arr")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    // minCount 1 over the same corpus ⇒ every document bigram has a row
    val model = probabilities(docs, minCount = 1L)
      .select(col("w1"), col("w2"), greatest(col("p_e9"), lit(1L)).as("p_e9"))
    db.join(model, Seq("w1", "w2"))
      .select(col("doc_id"),
        round(-log(col("p_e9").cast("double") / 1e9) * 1000000)
          .cast("long").as("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("t")).cast("long").as("nll_e6"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): per-language
    * head/middle/tail terciles of the per-bigram mean NLL under the
    * corpus LM — the quality gate production web-text pipelines apply
    * before mixing (head = fluent, tail = boilerplate/garbage; CCNet
    * keeps head+middle for most languages). Mean NLL is the exact
    * integer ⌊nll_e6 / n_bigrams⌋ from [[docNll]]; buckets are ntile
    * over (mean asc, doc_id asc) within each language, so the split is
    * deterministic and replayable.
    *
    * Scale shape: docNll's corpus hash aggs plus one doc-table join;
    * the ntile window sorts each language partition globally — exact
    * and right for the gate, and at 100 TB the documented swap is the
    * same two-pass as the length-quantile operator: per-language
    * `approx_percentile` cut points broadcast back onto a scan, which
    * turns the sort into a stateless comparison.
    *
    * @param langs (doc_id, pred_lang) — e.g. the n-gram language-ID
    *              output; docs with < 2 tokens have no NLL and are
    *              dropped (no bigram evidence to score)
    * @return (doc_id, pred_lang, mean_nll_e6, bucket) — bucket in
    *         1..`buckets`, 1 = head (most fluent)
    */
  def perplexityBuckets(docs: DataFrame, langs: DataFrame,
                        buckets: Int = 3): DataFrame = {
    require(buckets >= 2)
    val mean = docNll(docs).select(col("doc_id"),
      floor(col("nll_e6") / col("n_bigrams")).cast("long").as("mean_nll_e6"))
    val w = Window.partitionBy("pred_lang")
      .orderBy(col("mean_nll_e6").asc, col("doc_id").asc)
    mean.join(langs, "doc_id")
      .select(col("doc_id"), col("pred_lang"), col("mean_nll_e6"),
        ntile(buckets).over(w).cast("long").as("bucket"))
  }

  /** Corpus entropy rate H(W₂|W₁) = −Σ (c₁₂/N)·ln(c₁₂/c₁) over the raw
    * bigram counts — the one-number predictability summary tracked next
    * to TTR and the Zipf slope (natural text ≈ 5–8 bits; templated or
    * looping corpora collapse toward 0). Each bigram TYPE contributes
    * one e6-rounded integer term c₁₂·ln(c₁/c₁₂), so the corpus sum is
    * order-free; two hash aggs + one join, all bigram-type-sized.
    */
  def conditionalEntropy(docs: DataFrame): DataFrame = {
    val c12 = bigrams(docs).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = c12.groupBy("w1").agg(sum(col("c12")).cast("long").as("c1"))
    c12.join(ctx, "w1")
      .select(col("c12"),
        round(col("c12") * log(col("c1").cast("double") / col("c12"))
          * 1000000).cast("long").as("t"))
      .agg(sum(col("c12")).cast("long").as("n_bigrams"),
        count(lit(1)).as("n_types"),
        sum(col("t")).cast("long").as("st"))
      .select(col("n_bigrams"), col("n_types"),
        round(col("st") / col("n_bigrams")).cast("long").as("h_e6"))
  }
}
