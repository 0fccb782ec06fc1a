package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixing budget allocation for training-data preparation: given
  * per-host token counts and a global token budget, cap every host at the
  * WATERFILLING level τ — the largest integer such that
  * Σ_h min(tokens_h, τ) ≤ budget — so over-represented domains are
  * truncated and the budget spreads across the long tail (the standard
  * per-domain cap a web-corpus mixing step applies before sampling).
  *
  * τ has a closed form over hosts sorted by token count ascending: walk
  * the prefix; the first host whose count exceeds the fair share of the
  * remaining budget pins τ = (budget − cumsum_before) div hosts_remaining.
  * Everything is integer arithmetic over the per-host aggregate, so the
  * result is bit-exact cross-engine.
  *
  * Plan shape: one hash aggregate corpus→host (the only corpus-sized
  * pass), then windows over the HOST table. The windows here are global
  * (single partition) which is fine while the host table fits one
  * executor — millions of hosts, not documents; beyond that the sorted
  * cumulative sum swaps to the two-level bucketed prefix-sum pattern of
  * [[graft.algo.SkipGram.negativeSamples]] unchanged.
  */
object DomainMix {

  /** Allocate `budget` tokens across hosts from a (host, tokens) table.
    * Returns every host with its raw count, the waterfilling level tau,
    * and its allocation min(tokens, tau).
    */
  def waterfill(hostTokens: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0)
    val w = Window.orderBy(col("tokens").asc, col("host").asc)
    val prevW = w.rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hostTokens
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prev", coalesce(sum(col("tokens")).over(prevW), lit(0L)))
    val totals = hostTokens.agg(
      count(lit(1)).as("n_hosts"), sum(col("tokens")).cast("long").as("total"))
    val cand = ranked.crossJoin(totals)
      .withColumn("cand",
        expr(s"(${budget}L - prev) div (n_hosts - rn + 1)"))
    // τ: the candidate at the first unfunded position, else max tokens
    val tau = cand
      .select(min(when(col("tokens") > col("cand"),
          struct(col("rn"), col("cand")))).as("pin"),
        max(col("tokens")).as("mx"))
      .select(coalesce(col("pin.cand"), col("mx")).as("tau"))
    cand.crossJoin(tau)
      .select(col("host"), col("tokens"), col("tau"),
        least(col("tokens"), col("tau")).as("alloc"))
  }

  /** Temperature-scaled sampling mix (the multilingual upsampling rule of
    * mT5/XLM-R: sample group g with probability ∝ p_g^α, α < 1 flattening
    * the head so low-resource groups are seen more than their corpus
    * share): given a (grp, n) count table,
    *
    *   p_g = n_g / N,   q_g = n_g^α / Σ_m n_m^α,   boost_g = q_g / p_g
    *
    * α is PINNED at 0.5 — not a parameter — because √ is the one power
    * IEEE-754 correctly rounds, so q is bit-replayable across engines
    * (pow(x, 0.3) is not); 0.5 is also squarely inside the α ∈ [0.2, 0.7]
    * band the multilingual-LM literature actually ships. boost > 1 =
    * upsampled (low-resource), boost < 1 = downsampled (head).
    *
    * Plan: one groupBy the caller already did (input IS the count table),
    * one broadcast 1-row scalar, group-count-sized output.
    *
    * @return (grp, n, p, q, boost)
    */
  def temperatureMix(groupCounts: DataFrame): DataFrame = {
    val tot = groupCounts.agg(
      sum(col("n")).cast("double").as("tn"),
      sum(sqrt(col("n").cast("double"))).as("ts"))
    groupCounts.crossJoin(tot)
      .select(col("grp"), col("n"),
        (col("n") / col("tn")).as("p"),
        (sqrt(col("n").cast("double")) / col("ts")).as("q"),
        (sqrt(col("n").cast("double")) / col("ts") * col("tn") / col("n"))
          .as("boost"))
  }
}
