package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-graph contraction: collapse the url-level link graph to the
  * weighted host graph (one vertex per host, edge weight = number of
  * url-level links between the hosts). The standard first reduction of a
  * web-scale link graph — Common-Crawl-style corpora publish exactly this
  * artifact next to the url-level edges — and the natural input for
  * host-level PageRank / community detection: it shrinks a 10^12-edge url
  * graph by orders of magnitude while preserving the inter-site link
  * structure.
  *
  * Scale shape: one codegen'd projection (regexp host extraction — no
  * UDFs) followed by a single partial-aggregated groupBy(src_host,
  * dst_host). Shuffle volume is bounded by the number of DISTINCT host
  * pairs per partition, not by the edge count, because map-side combine
  * collapses repeated pairs before the exchange — the contraction gets
  * CHEAPER per edge the more the corpus concentrates on popular sites.
  * No reference counterpart (the reference ingests pre-built edge lists);
  * SURVEY.md §2.9 web-pipeline family.
  */
object HostGraph {

  /** Host component of a url: the authority lowercased, with userinfo,
    * port, path, query and fragment stripped. Mirrors the scheme grammar
    * of [[TextExtract.normalizeUrl]]; pure built-in regexp, codegen'd.
    */
  def hostOf(u: Column): Column =
    lower(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]*)", 1))

  /** Contract url-level link pairs (`src_url`, `dst_url` — the
    * [[TextExtract.linkPairs]] schema) to the weighted DIRECTED host
    * graph. Intra-host links and urls with no extractable host (relative
    * links, mailto:, malformed) are dropped.
    *
    * @return (src_host, dst_host, weight) with weight = url-level link
    *         count for the pair
    */
  def contract(pairs: DataFrame): DataFrame =
    pairs.select(
        hostOf(col("src_url")).as("src_host"),
        hostOf(col("dst_url")).as("dst_host"))
      .filter(col("src_host") =!= col("dst_host") &&
        col("src_host") =!= "" && col("dst_host") =!= "")
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("weight"))

  /** Host graph straight from the pages table (input_hint schema). */
  def fromPages(pages: DataFrame): DataFrame =
    contract(TextExtract.linkPairs(pages))

  /** Per-host outlink leakage: of a host's url-level outlinks, how many
    * stay on the host (intra) vs leave it (inter), plus the leakage
    * ratio at e6. The site-structure diagnostic read next to the host
    * graph — near-0 leakage marks walled-garden/template sites whose
    * PageRank self-inflates, near-1 marks link farms and redirectors
    * that only point outward (TrustRank-era spam heuristics threshold
    * exactly this ratio). Unlike [[contract]], intra-host links are
    * KEPT — they are the numerator's complement. One projection + one
    * partial-aggregated groupBy(host); integer counts, one divide.
    *
    * @return (host, n_links, n_intra, n_inter, leakage_e6)
    */
  def leakage(pairs: DataFrame): DataFrame =
    pairs.select(
        hostOf(col("src_url")).as("host"),
        hostOf(col("dst_url")).as("dst_host"))
      .filter(col("host") =!= "" && col("dst_host") =!= "")
      .groupBy("host")
      .agg(count(lit(1)).as("n_links"),
        sum(when(col("host") === col("dst_host"), 1L).otherwise(0L))
          .cast("long").as("n_intra"))
      .select(col("host"), col("n_links"), col("n_intra"),
        (col("n_links") - col("n_intra")).as("n_inter"))
      .withColumn("leakage_e6",
        round(col("n_inter") * lit(1000000.0) / col("n_links")).cast("long"))

  /** Host-level weighted PageRank over the directed host graph: rank flows
    * proportionally to the url-link multiplicity between hosts; hosts that
    * are only ever linked TO (no crawled outlinks) contribute dangling
    * mass, redistributed uniformly by [[graft.algo.PageRank.runFixedWeighted]].
    * String host names are used as vertex ids directly — every join and
    * aggregation in the PageRank skeleton is type-agnostic, so no
    * dictionary pass is needed at this (already contracted) scale.
    *
    * @return (host, rank)
    */
  def hostPageRank(hostEdges: DataFrame, iterations: Int,
                   damping: Double = 0.85): DataFrame =
    graft.algo.PageRank.runFixedWeighted(
        hostEdges.select(
          col("src_host").as("src"), col("dst_host").as("dst"), col("weight")),
        iterations = iterations, damping = damping)
      .select(col("id").as("host"), col("rank"))

  /** Politeness-aware crawl scheduling: a crawler may hit a host at most
    * once per `delaySec`, so each host's frontier candidates are
    * serialized into fetch slots by descending priority (url ascending
    * on ties — a deterministic total order). slot k's earliest fetch
    * time is k·delaySec from the host's crawl start; the eta column is
    * what the fetch fleet sorts its global queue by.
    *
    * The window partitions BY HOST: per-task state is one host's
    * frontier slice, never the global frontier — exactly how a
    * 1000-executor scheduler shards (hosts hash across executors, each
    * host's queue is built locally). A pathological single mega-host
    * would skew one partition; real frontiers cap per-host candidates
    * upstream (the waterfilling budget in [[graft.text.DomainMix]]).
    *
    * @param frontier (host, url, priority) — higher priority first
    * @return (host, url, priority, slot, eta_sec)
    */
  def politenessSchedule(frontier: DataFrame, delaySec: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy(col("priority").desc, col("url").asc)
    frontier.select(col("host"), col("url"), col("priority"))
      .withColumn("slot", row_number().over(w).cast("long") - 1)
      .withColumn("eta_sec", col("slot") * lit(delaySec))
  }

  /** Robots-rules frontier filter — the admission step between frontier
    * prioritization (`g_frontier`) and fetch scheduling
    * ([[politenessSchedule]]): each url keeps the LONGEST-prefix-matching
    * rule of its host, Allow beating Disallow on equal prefix length
    * (the Googlebot tie rule), no matching rule = allowed (the robots
    * default). Deterministic total order inside a (host, url) group:
    * (prefix length desc, allow desc, prefix asc).
    *
    * Scale shape: one equi-join on host (rules-per-host is a small
    * constant in practice — broadcast the rules table when it fits) and
    * one window PARTITIONED BY (host, url) over those few matched rules
    * — per-task state is one url's rule matches, never a host's frontier
    * slice, so even a mega-host skews nothing here.
    *
    * @param frontier (host, url)
    * @param rules    (host, prefix, allow) — allow ∈ {0, 1}
    * @return (host, url, allowed, rule) — rule = matched prefix, '' if none
    */
  def robotsFilter(frontier: DataFrame, rules: DataFrame): DataFrame = {
    val f = frontier.select(col("host"), col("url"))
    val hits = f.join(rules.select(col("host"), col("prefix"), col("allow")),
        Seq("host"))
      .filter(col("url").startsWith(col("prefix")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host", "url")
      .orderBy(length(col("prefix")).desc, col("allow").desc,
        col("prefix").asc)
    val best = hits.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("host"), col("url"),
        col("allow").cast("long").as("allowed"), col("prefix").as("rule"))
    f.join(best, Seq("host", "url"), "left")
      .select(col("host"), col("url"),
        coalesce(col("allowed"), lit(1L)).as("allowed"),
        coalesce(col("rule"), lit("")).as("rule"))
  }

  /** Mirror-site detection: host pairs sharing many identical content
    * fingerprints — re-hosted archives, mirror farms, and scraped-copy
    * sites, which inflate every host-level statistic until they are
    * collapsed. `mirror_e6` = shared distinct fingerprints ÷ the SMALLER
    * host's distinct-content count (containment: a full mirror of a
    * small site scores 10⁶ even next to a huge host).
    *
    * Scale shape: the pairing is an equi-join ON THE FINGERPRINT, so
    * candidate pairs are Σ_fp C(hosts(fp), 2) — duplicate-cluster sized,
    * never all-host-pairs; `maxHostsPerFp` drops corpus-wide boilerplate
    * fingerprints first (the CoCitation hub cap), bounding any one
    * fingerprint's pair mint at C(cap, 2).
    *
    * @param docHosts (host, fp) — one row per hosted document content
    * @return (host_a, host_b, shared, mirror_e6), host_a < host_b
    */
  /** Host pairs with similar OUTLINK PROFILES: Jaccard overlap of the two
    * hosts' distinct target-host sets — the link-structure mirror/
    * syndication detector that complements [[mirrorPairs]]' content
    * fingerprints (a scraper site copies link panels even when it rewrites
    * text). The pairing equi-join runs ON THE TARGET with a
    * `maxHostsPerTarget` band (the CoCitation cap: a target every host
    * links to is evidence of nothing and would mint all-pairs), and the
    * profile sizes are measured in the SAME banded space so the Jaccard
    * is exact over it. Output bounded by Σ tin² over banded targets.
    *
    * @return (host_a, host_b, n_shared, jaccard_e6), canonical a < b
    */
  def hostLinkSimilarity(pairs: DataFrame,
                         maxHostsPerTarget: Long = 1000L): DataFrame = {
    val hp = pairs.select(
        hostOf(col("src_url")).as("host"), hostOf(col("dst_url")).as("target"))
      .filter(col("host") =!= "" && col("target") =!= ""
        && col("host") =!= col("target"))
      .distinct()
    val banded = hp.join(
      hp.groupBy("target").agg(count(lit(1)).as("tin"))
        .filter(col("tin") <= maxHostsPerTarget).select("target"),
      Seq("target"), "left_semi")
    val sizes = banded.groupBy("host").agg(count(lit(1)).as("n_out"))
    banded.select(col("target"), col("host").as("host_a"))
      .join(banded.select(col("target"), col("host").as("host_b")),
        Seq("target"))
      .filter(col("host_a") < col("host_b"))
      .groupBy("host_a", "host_b").agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("host").as("host_a"), col("n_out").as("na")),
        "host_a")
      .join(sizes.select(col("host").as("host_b"), col("n_out").as("nb")),
        "host_b")
      .select(col("host_a"), col("host_b"), col("n_shared"),
        round(col("n_shared").cast("double") * 1000000
          / (col("na") + col("nb") - col("n_shared"))).cast("long")
          .as("jaccard_e6"))
  }

  def mirrorPairs(docHosts: DataFrame, maxHostsPerFp: Int = 50): DataFrame = {
    require(maxHostsPerFp >= 2)
    val h = docHosts.select(col("host"), col("fp")).distinct()
    val spread = h.groupBy("fp").agg(count(lit(1)).as("nh"))
      .filter(col("nh") <= maxHostsPerFp).select(col("fp"))
    val kept = h.join(spread, Seq("fp"), "left_semi")
    val sizes = kept.groupBy("host").agg(count(lit(1)).as("sz"))
    val pairs = kept.select(col("fp"), col("host").as("host_a"))
      .join(kept.select(col("fp"), col("host").as("host_b")), "fp")
      .filter(col("host_a") < col("host_b"))
      .groupBy("host_a", "host_b").agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("host").as("host_a"), col("sz").as("sza")),
        "host_a")
      .join(sizes.select(col("host").as("host_b"), col("sz").as("szb")),
        "host_b")
      .select(col("host_a"), col("host_b"), col("shared"),
        expr("shared * 1000000 div least(sza, szb)").as("mirror_e6"))
  }

  /** Per-url crawl change-rate estimation over a snapshot history — the
    * signal a recrawl scheduler feeds back into frontier priority: pages
    * that changed in most observed intervals get refetched often, static
    * pages decay to archival cadence.
    *
    * `n_changes` counts consecutive-snapshot fingerprint flips in
    * snap_id order; `change_rate_e6` = n_changes·10⁶ / (n_snaps − 1)
    * (0 for single-snapshot urls — no evidence, callers treat as cold).
    *
    * Scale shape: one window PARTITIONED BY url over the per-url
    * snapshot history (bounded by the retained snapshot count, single
    * digits in practice) plus one hash agg — both partial-aggregated,
    * nothing global.
    *
    * @param snapshots (url, snap_id, fingerprint)
    * @return (url, n_snaps, n_changes, change_rate_e6)
    */
  def changeRate(snapshots: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("url").orderBy(col("snap_id").asc)
    snapshots.select(col("url"), col("snap_id"), col("fingerprint"))
      .withColumn("prev", lag(col("fingerprint"), 1).over(w))
      .groupBy("url")
      .agg(count(lit(1)).as("n_snaps"),
        sum(when(col("prev").isNotNull && col("prev") =!= col("fingerprint"),
          1L).otherwise(0L)).as("n_changes"))
      .select(col("url"), col("n_snaps"), col("n_changes"),
        when(col("n_snaps") > 1,
          expr("(n_changes * 1000000) div (n_snaps - 1)"))
          .otherwise(lit(0L)).as("change_rate_e6"))
  }
}
