package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesizer of the Common-Crawl-style pages table
  * (BASELINE.json `input_hint`: `url STRING, warc_ts TIMESTAMP,
  * html BINARY, text STRING, lang STRING`). No external data, no
  * wall-clock, no RNG objects — every column is a pure Catalyst expression
  * of the page id (hash-mixed with a fixed seed), so the same `n` yields
  * byte-identical rows at any parallelism level and the generator scales
  * linearly to any size (`spark.range` + codegen'd expressions, no driver
  * materialization).
  *
  * Link structure: out-degree 3..8, targets drawn by inverse-CDF from a
  * power law (u^alpha stretched over the id space), concentrating
  * in-degree on low page ids — realistic web skew that exercises the
  * hot-vertex gather path ([[graft.graph.GraphOps.planSkew]]).
  *
  * The `text` column is built INDEPENDENTLY of [[TextExtract]] (generator
  * assembles the expected extraction from parts; the extractor strips the
  * assembled html) — their byte-identity is the per-row invariant test
  * demanded by the input_hint.
  */
object PagesSynth {

  val Epoch2026: Long = 1767225600L // 2026-01-01T00:00:00Z
  val Hosts: Int = 97
  val ZipfAlpha: Double = 3.0
  val MaxExtraDegree: Int = 6 // out-degree in [3, 3+6)

  def urlOf(id: Column): Column =
    concat(lit("https://host"), (id % Hosts).cast("string"),
      lit(".example/p/"), id.cast("string"))

  /** k-th outlink target of page `id` over an `n`-page space. */
  private def target(id: Column, k: Column, n: Long): Column = {
    val u = pmod(xxhash64(id, k, lit(42L)), lit(1000000L)).cast("double") / 1000000.0
    least(floor(pow(u, ZipfAlpha) * n).cast("long"), lit(n - 1))
  }

  private def outDegree(id: Column): Column =
    lit(3) + pmod(xxhash64(id, lit(7L)), lit(MaxExtraDegree.toLong)).cast("int")

  private def bodyWords(id: Column): Column = {
    val nw = lit(5) + pmod(xxhash64(id, lit(13L)), lit(8L)).cast("int")
    array_join(
      transform(sequence(lit(0), nw - 1),
        j => concat(lit("w"), pmod(xxhash64(id, j, lit(99L)), lit(500L)).cast("string"))),
      " ")
  }

  /** Generate `n` pages. */
  def pages(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    val deg = outDegree(id)
    val targets = transform(sequence(lit(0), deg - 1), k => target(id, k, n))
    val anchors = array_join(
      transform(targets,
        (t, k) => concat(lit("<a href=\""), urlOf(t), lit("\">link"),
          k.cast("string"), lit("</a>"))),
      "")
    val linkTexts = array_join(
      transform(sequence(lit(0), deg - 1), k => concat(lit("link"), k.cast("string"))),
      " ")
    val title = concat(lit("Page "), id.cast("string"))
    val body = bodyWords(id)
    val html = concat(
      lit("<html><head><title>"), title, lit("</title></head><body><p>"),
      body, lit("</p>"), anchors, lit("</body></html>"))
    // expected extraction: tags → spaces, whitespace collapsed, trimmed
    val text = concat(title, lit(" "), body, lit(" "), linkTexts)
    spark.range(n).select(
      urlOf(id).as("url"),
      timestamp_seconds(lit(Epoch2026) + id).as("warc_ts"),
      encode(html, "UTF-8").as("html"),
      text.as("text"),
      element_at(array(lit("en"), lit("es"), lit("de"), lit("fr")),
        (id % 4).cast("int") + 1).as("lang"))
  }
}
