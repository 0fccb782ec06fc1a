package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-side dedup key every web corpus
  * computes before anything else: the same page arrives as
  * `HTTP://WWW.Host.com:80/a/index.html?utm_source=x` and
  * `http://host.com/a`, and treating those as two documents double-counts
  * the whole frontier. Rules (the standard safe-normalization subset —
  * each preserves the resource identity per RFC 3986 §6):
  *
  *   - scheme and host lowercased (path case PRESERVED)
  *   - leading `www.` stripped from the host
  *   - default ports `:80`/`:443` stripped
  *   - fragment dropped
  *   - `/index.html` / `/index.htm` tail dropped, trailing slashes
  *     collapsed, empty path → `/`
  *   - tracking query parameters removed (`utm_*`, `fbclid`, `gclid`,
  *     `ref`, `sessionid`); remaining parameters keep their order
  *
  * Everything is codegen'd regexp/array built-ins on one scan — no UDF,
  * no shuffle — and every regex is RE2-safe (no lookaround), so the
  * driver oracle replays it verbatim.
  */
object UrlCanon {

  private val TrackingParam = "^(utm_[a-z0-9_]*|fbclid|gclid|ref|sessionid)="

  /** Canonical form of a well-formed absolute URL column. */
  def canonical(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        "^www\\.", ""),
      ":(80|443)$", "")
    val pathq = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val path0 = regexp_replace(
      regexp_replace(rawPath, "/index\\.html?$", "/"), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(pathq, "[?](.*)$", 1)
    val kept = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val q = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Canonical-URL dedup groups over `(doc_id, url)`:
    * (canon, n_urls, min_doc) — the keep-one-representative table the
    * frontier/dedup stage joins back against. One scan + one hash
    * aggregation keyed by the canonical string.
    */
  def dedupGroups(urls: DataFrame): DataFrame =
    urls.select(col("doc_id"), canonical(col("url")).as("canon"))
      .groupBy("canon")
      .agg(count(lit(1)).as("n_urls"), min(col("doc_id")).as("min_doc"))

  /** URL path-template mining — the crawler-trap / faceted-navigation
    * detector: canonical URLs grouped per host by their digit-collapsed
    * path template (`/product/12345` and `/product/99` both →
    * `/product/N`). A template whose URL count explodes relative to its
    * host's page count is an infinite URL space (calendars, session ids,
    * faceted filters) — the frontier caps or drops it before the crawler
    * drowns. One scan + one (host, template)-keyed hash aggregation.
    *
    * @return (host, template, n_urls, sample_url) — sample = min
    *         canonical URL, the row a crawl operator opens first
    */
  def pathTemplates(urls: DataFrame): DataFrame =
    urls.select(canonical(col("url")).as("canon"))
      .select(col("canon"),
        regexp_extract(col("canon"), "^[a-z]+://([^/?#]+)", 1).as("host"),
        regexp_replace(
          regexp_extract(col("canon"), "^[a-z]+://[^/?#]+([^?#]*)", 1),
          "[0-9]+", "N").as("template"))
      .groupBy("host", "template")
      .agg(count(lit(1)).as("n_urls"), min(col("canon")).as("sample_url"))
}
