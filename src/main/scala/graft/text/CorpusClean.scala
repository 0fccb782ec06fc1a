package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus hygiene operators for LLM training-data preparation (SURVEY
  * §2.10): passage-level exact dedup, benchmark decontamination, and PII
  * redaction. All built from codegen'd built-ins — each is a scan plus at
  * most one hash shuffle, the only shape that survives 100 TB.
  */
object CorpusClean {

  private val tokensCol: Column =
    regexp_extract_all(col("text"), lit("\\S+"), lit(0))

  /** Exact duplicate PASSAGES across the corpus: split every document
    * into non-overlapping `blockWords`-word blocks and return each block
    * text occurring more than once, with its total occurrence count and
    * distinct-document count.
    *
    * This is the passage-granularity complement of document-level exact
    * dedup (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better"): boilerplate repeated inside otherwise-distinct
    * pages never surfaces at whole-document granularity. One explode +
    * one hash groupBy; at 100 TB the group key would be the block's hash
    * rather than its text, but the plan shape is identical and the
    * small-scale gate keeps the text so the oracle is byte-exact.
    */
  def passageDedup(docs: DataFrame, blockWords: Int): DataFrame = {
    require(blockWords >= 1)
    val blocks = docs
      .select(col("doc_id"), tokensCol.as("arr"))
      .filter(size(col("arr")) >= blockWords)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), (size(col("arr")) / blockWords).cast("int") - 1),
          i => concat_ws(" ",
            slice(col("arr"), i * blockWords + 1, lit(blockWords))))).as("blk"))
    blocks.groupBy("blk")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_occ") > 1)
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minHits` distinct word-3-gram shingles with a held-out benchmark
    * document set.
    *
    * `isBench` marks the benchmark members (they are exempt from
    * flagging). The benchmark shingle set is tiny next to the corpus, so
    * Catalyst broadcasts it and the flag pass stays a single corpus scan
    * — the standard eval-contamination sweep before training.
    */
  def decontaminate(docs: DataFrame, isBench: Column,
                    minHits: Long): DataFrame = {
    val sh = docs
      .select(col("doc_id"), isBench.as("bench"), tokensCol.as("arr"))
      .filter(size(col("arr")) >= 3)
      .select(col("doc_id"), col("bench"),
        explode(transform(sequence(lit(0), size(col("arr")) - 3),
          j => concat_ws(" ",
            element_at(col("arr"), j + 1),
            element_at(col("arr"), j + 2),
            element_at(col("arr"), j + 3)))).as("sh"))
      .distinct()
    val bench = sh.filter(col("bench")).select(col("sh")).distinct()
    sh.filter(!col("bench"))
      .join(bench, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Fixed-window training chunks with overlap: chunk c of a document
    * covers token positions [c·stride, c·stride + window); the number of
    * chunks is 1 + max(0, ⌈(n − window)/stride⌉), so every token is
    * covered, consecutive chunks overlap by window − stride tokens, and a
    * document at most `window` tokens long yields exactly one chunk —
    * the standard sliding-window packing that turns a cleaned corpus into
    * fixed-length LM training examples. Pure per-row arithmetic (one
    * explode, no shuffle); the chunk text hash makes the output
    * byte-verifiable without shipping the text twice.
    */
  def chunk(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val nChunks = lit(1) + greatest(lit(0),
      floor((size(col("arr")) - window + stride - 1).cast("double") / stride)
        .cast("int"))
    docs.select(col("doc_id"), tokensCol.as("arr"))
      .select(col("doc_id"), col("arr"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("arr"), col("chunk_id") * stride + 1, lit(window))
          .as("ck"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ck")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("ck"))).as("chunk_hash"))
  }

  /** Concat-and-chunk sequence packing: assign each document to a pack
    * of ~`binTokens` tokens by the running token total within its source
    * shard, in doc_id order — the deterministic batch-packing pass a
    * pretraining pipeline runs to fill fixed-length contexts (a document
    * STARTS in pack ⌊(cum − len)/B⌋; the trainer splits stragglers at
    * the boundary). The cumulative-sum window partitions by `source`, so
    * nothing concentrates beyond one shard's documents — at 100 TB the
    * shard key is (source, path-bucket) and the shape is unchanged.
    */
  def packSequences(docs: DataFrame, binTokens: Long): DataFrame = {
    require(binTokens >= 1, s"need binTokens >= 1, got $binTokens")
    val w = Window.partitionBy("source").orderBy(col("doc_id").asc)
    docs.select(col("doc_id"), col("source"),
        size(tokensCol).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")).cast("double") / binTokens)
          .cast("long").as("pack_id"))
  }

  /** GPT-2-style pre-tokenizer shape: letter runs, digit runs, and
    * punctuation runs, each optionally absorbing one leading space —
    * identical under Java regex (Spark) and RE2 (DuckDB), verified
    * character-for-character in the gate. The "BPE-ish" count tracks LM
    * token cost far better than whitespace words (digits and punctuation
    * split out), which is what token-budget accounting needs.
    */
  val BpeishRe = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+"

  /** Whitespace-word vs BPE-ish pre-token counts per document — the
    * token-budget accounting pass (pure scan, no shuffle).
    */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokensCol).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit(BpeishRe), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Tokenizer fertility per language — BPE-ish tokens emitted per
    * character, the cross-lingual cost metric multilingual tokenizer
    * studies track (a language whose fertility runs high pays more
    * sequence length per unit of content, so its effective context and
    * training share shrink; pipelines rebalance the mixture or the
    * tokenizer when the spread is large). Uses the same BPE-ish regex as
    * [[tokenStats]] so the two gates share one tokenizer definition.
    *
    * Scale shape: one scan (tokenize + length, both codegen'd) and one
    * language-keyed hash aggregation — output is languages-sized no
    * matter the corpus; all sums are exact integers, the single divide
    * is e6-rounded at the end.
    *
    * @return (lang, n_docs, n_bpe_tokens, n_chars, fertility_e6) with
    *         fertility = tokens per char; 0 on an empty language slice
    */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        size(regexp_extract_all(lower(col("text")), lit(BpeishRe), lit(0)))
          .cast("long").as("nb"),
        length(col("text")).cast("long").as("nc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nb")).cast("long").as("n_bpe_tokens"),
        sum(col("nc")).cast("long").as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_bpe_tokens"),
        col("n_chars"),
        when(col("n_chars") === 0, lit(0L))
          .otherwise(round(col("n_bpe_tokens") * lit(1000000.0)
            / col("n_chars")).cast("long")).as("fertility_e6"))

  /** Type–token ratio per document — the lexical-diversity filter signal
    * (Gopher-family pipelines drop the low-TTR tail: template output and
    * keyword stuffing repeat a tiny vocabulary). Pure scan — tokenize,
    * `array_distinct`, one integer divide at e6 — no shuffle, no UDF.
    * Empty documents report ttr 0 rather than dividing by zero.
    */
  def typeTokenRatio(docs: DataFrame): DataFrame = {
    val terms = graft.text.TextIndex.termsCol
    docs.select(col("doc_id"),
        size(terms).cast("long").as("n_tokens"),
        size(array_distinct(terms)).cast("long").as("n_types"))
      .withColumn("ttr_e6",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(round(col("n_types") * lit(1000000.0) / col("n_tokens"))
            .cast("long")))
  }

  /** T5-style span-corruption masks: each token position is masked by a
    * deterministic md5 draw (`permille`/1000 rate), and maximal runs of
    * masked positions merge into spans — emitted as (doc_id, span_id,
    * start, span_len) with spans numbered by start. The islands-and-gaps
    * trick (pos − row_number) finds the runs with one doc-partitioned
    * window; the draw replays in any engine, so the SAME spans can be
    * regenerated at training and at audit time — the property that
    * matters when the corpus is 100 TB and masks are never stored.
    */
  def spanMasks(docs: DataFrame, permille: Int, seed: Long): DataFrame = {
    require(permille >= 0 && permille <= 1000)
    val toks = docs.select(col("doc_id"),
      posexplode(tokensCol).as(Seq("pos", "tok")))
    val masked = toks.filter(
      TextIndex.md5Uniform(concat_ws(":", col("doc_id"), col("pos"),
        lit(seed))) % 1000 < permille)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val runs = masked
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("start"),
        count(lit(1)).as("span_len"))
    runs.select(col("doc_id"),
        (row_number().over(Window.partitionBy("doc_id")
          .orderBy("start")) - 1).cast("long").as("span_id"),
        col("start"), col("span_len"))
  }

  /** Email pattern — ASCII-only, identical under Java regex and RE2. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** North-American-style phone fragment; deliberately narrow (the 555
    * test prefix) so the gate's synthetic contact lines are matched
    * without false positives in surrounding prose.
    */
  val PhoneRe = "555-[0-9]{4}"

  /** Count and redact PII spans in a text column: emails → `<EMAIL>`,
    * phones → `<PHONE>`. Pure per-row scan (no shuffle at all) — the
    * redaction pass composes in front of any other corpus operator.
    * Counting runs on the ORIGINAL text, so a phone inside an email
    * local-part would be counted once as each kind; redaction applies the
    * email rule first, so such a span leaves as `<EMAIL>`.
    */
  def redactPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"),
      regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("redacted"))

  /** Character-distribution entropy per document over the [a-z0-9]
    * alphabet — the classic gibberish / binary-junk / key-mash filter
    * (natural language sits near the language's letter-frequency
    * entropy, ~4.1 bits for English; base64 blobs push toward the
    * uniform 5.17, repeated-character spam collapses toward 0).
    *
    * Alphabet-bounded plan: 36 `length − length(replace)` counts per
    * row (pure string ops, whole-stage codegen, no explode — the scan
    * never widens), then H = Σ_c round((n_c/n)·log2(n/n_c)·1e6) with
    * each TERM e6-rounded before the integer sum — the order-free
    * determinism contract shared with the bigram/user entropies.
    *
    * @return (doc_id, n_alpha, h_e6) — h in micro-bits per character
    */
  def charEntropy(docs: DataFrame): DataFrame = {
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789".map(_.toString)
    val low = lower(col("text"))
    val withCounts = docs.select(
      col("doc_id") +: alphabet.zipWithIndex.map { case (c, i) =>
        (length(low) - length(regexp_replace(low, java.util.regex.Pattern
          .quote(c), ""))).cast("long").as(s"c$i")
      }: _*)
    val total = alphabet.indices.map(i => col(s"c$i")).reduce(_ + _)
    val hTerms = alphabet.indices.map { i =>
      when(col(s"c$i") > 0,
        round((col(s"c$i").cast("double") / col("n"))
          * log2(col("n").cast("double") / col(s"c$i")) * 1000000)
          .cast("long"))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    withCounts.withColumn("n", total)
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n").as("n_alpha"),
        hTerms.cast("long").as("h_e6"))
  }

  /** Sentence-level duplication accounting (the CCNet/Dolma granularity:
    * paragraph/sentence dedup removes boilerplate that document-level
    * hashing and fixed-width shingles both miss — a footer repeated
    * verbatim across a site dominates at sentence grain while never
    * producing identical documents or aligned shingles).
    *
    * Sentences split on literal '.', trimmed, empties dropped. A
    * sentence OCCURRENCE is duplicated when its text appears in ≥ 2
    * distinct documents. Per doc: total occurrences, duplicated
    * occurrences, and the e6 dup ratio — rank by ratio to find the
    * template-heavy hosts before spending tokenizer budget on them.
    *
    * Plan: split scan → (doc, sentence) rows → sentence-key distinct-doc
    * hash agg → broadcast-shaped join back → doc hash agg. Two shuffles
    * on sentence text (hash-keyed; at 100 TB key on md5(sentence) so the
    * shuffle carries 16 bytes, not the text — same answer, disclosed
    * swap).
    *
    * @return (doc_id, n_sents, n_dup, dup_ratio_e6)
    */
  def sentenceDedup(docs: DataFrame): DataFrame = {
    val sents = docs.select(col("doc_id"),
        explode(split(col("text"), "\\.")).as("raw"))
      .select(col("doc_id"), trim(col("raw")).as("sent"))
      .filter(length(col("sent")) > 0)
    val df = sents.select(col("doc_id"), col("sent")).distinct()
      .groupBy("sent").agg(count(lit(1)).as("sdf"))
    sents.join(df, Seq("sent"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sents"),
        sum(when(col("sdf") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_sents"),
        col("n_dup").cast("long").as("n_dup"),
        expr("(n_dup * 1000000L) div n_sents").cast("long")
          .as("dup_ratio_e6"))
  }

  /** Shared-affix template mining: group documents by their first /
    * last `k` characters and surface affixes shared across ≥ `minDocs`
    * docs — the direct detector for injected headers and footers
    * (cookie banners, license blocks, nav chrome). Complements
    * [[sentenceDedup]]: an affix needn't end at a sentence boundary.
    *
    * One scan + one hash agg per side; the affix key is k-char bounded
    * so the shuffle is fixed-width regardless of document size.
    *
    * @return (kind 'prefix'|'suffix', affix, n_docs, n_sources)
    */
  def affixTemplates(docs: DataFrame, k: Int = 40,
                     minDocs: Long = 3L): DataFrame = {
    require(k >= 1 && minDocs >= 2)
    val pre = docs.select(lit("prefix").as("kind"),
      substring(col("text"), 1, k).as("affix"),
      col("doc_id"), col("source"))
    val suf = docs.select(lit("suffix").as("kind"),
      expr(s"substring(text, greatest(length(text) - ${k - 1}, 1))")
        .as("affix"),
      col("doc_id"), col("source"))
    pre.union(suf)
      .filter(length(col("affix")) >= k) // short docs can't carry a template
      .groupBy("kind", "affix")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("source")).as("n_sources"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Doc-length histogram at power-of-2 character buckets —
    * bucket = ⌊log₂(n_chars+1)⌋ via binary length (no float log, the
    * gamma-bits trick) — the one-glance corpus shape panel next to the
    * exact d_len_quantiles percentiles: truncation cliffs and spikes
    * show up as bucket anomalies before any quantile does. One scan +
    * one ≤ ~40-cell hash agg. Returns (bucket, n_docs).
    */
  def lengthHistogram(docs: DataFrame): DataFrame =
    docs.select((length(bin(col("n_chars") + 1)) - 1).cast("long")
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))

  /** Deterministic train/val/test split assignment: each doc lands in a
    * split by its 60-bit md5 hash mod 100 — rerun-stable, join-free, and
    * replayable in ANSI SQL (the md5Uniform contract), so the same doc is
    * in the same split on every engine that ever touches the corpus (the
    * property that makes leakage audits like d_decontam meaningful).
    * Default 90/5/5. One scan.
    *
    * @return (doc_id, bucket, split)
    */
  def splitAssign(docs: DataFrame, trainPct: Int = 90,
                  valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val h = graft.text.TextIndex.md5Uniform(col("doc_id").cast("string")) % 100
    docs.select(col("doc_id"), h.cast("long").as("bucket"),
      when(h < trainPct, "train")
        .when(h < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Corpus composition by language: docs, whitespace tokens, and each
    * language's token share — the language-mix table every corpus report
    * leads with and the input to any per-language sampling budget (the
    * lang-axis sibling of [[graft.text.DomainMix.waterfill]]'s host
    * budgets). One scan + one lang-keyed hash agg + a broadcast 1-row
    * total. Returns (lang, n_docs, n_tokens, token_share_e6).
    */
  def langMix(docs: DataFrame): DataFrame = {
    val toks = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
    val per = docs.select(col("lang"), toks.cast("long").as("tk"))
      .groupBy("lang").agg(count(lit(1)).as("n_docs"),
        sum(col("tk")).cast("long").as("n_tokens"))
    per.crossJoin(per.agg(sum(col("n_tokens")).as("tot")))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") * 1000000 / col("tot"))
          .cast("long").as("token_share_e6"))
  }

  /** Exact-duplicate mass per source: docs, distinct md5(text) contents,
    * and the duplicate fraction — WHICH feed is re-serving the same pages
    * (the per-source drill-down of [[corpusSummary]]'s corpus-level dup
    * forecast, read next to [[sourceQuality]]). One source-keyed hash agg
    * over 16-byte content keys. Returns
    * (source, n_docs, n_distinct, n_dups, dup_rate_e6).
    */
  def dupRateBySource(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        (col("n_docs") - col("n_distinct")).cast("long").as("n_dups"),
        round((col("n_docs") - col("n_distinct")).cast("double") * 1000000
          / col("n_docs")).cast("long").as("dup_rate_e6"))

  /** Per-source quality panel — the "which feed is garbage" table a
    * corpus triage starts from: per source, doc count, language spread,
    * mean char length and the mean of the shared composite quality score
    * (the d_quality alpha-ratio/token blend, each doc's score an e3
    * integer, so the per-source sums are exact and the means one rounded
    * divide each). One scan + one source-keyed hash agg.
    *
    * @return (source, n_docs, n_langs, mean_chars_e3, mean_quality_e3)
    */
  def sourceQuality(docs: DataFrame): DataFrame = {
    val alpha = length(regexp_replace(lower(col("text")), "[^a-z]", ""))
    val toks = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
    val q = docs.select(col("source"), col("lang"), col("n_chars"),
      round((alpha.cast("double") / length(col("text")) * 0.5 +
        least(toks, lit(50)).cast("double") / 50.0 * 0.5) * 1000)
        .cast("long").as("q_e3"))
    q.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("q_e3")).as("sum_q"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        round(col("sum_chars") * 1000 / col("n_docs")).cast("long")
          .as("mean_chars_e3"),
        round(col("sum_q") / col("n_docs")).cast("long")
          .as("mean_quality_e3"))
  }

  /** Identical content filed under MORE THAN ONE language tag — the
    * lang-ID-noise detector for per-language dedup: a pipeline that
    * dedups within language silently keeps every copy of a doc whose
    * copies were tagged differently, so this table is the leak audit run
    * before trusting a per-lang split. Content identity is md5(text)
    * (16-byte keys, the corpusSummary contract); one hash agg, having
    * filter on the group. Returns (content_hash, n_langs, n_docs,
    * min_doc_id).
    */
  def crossLangDups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(countDistinct(col("lang")).as("n_langs"),
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).cast("long").as("min_doc_id"))
      .filter(col("n_langs") >= 2)

  /** One-row corpus DESCRIBE panel — the first scan a pipeline runs on a
    * fresh document dump: doc/lang/source cardinalities, the char-length
    * envelope, and the distinct-content count (docs − distinct = the
    * exact-dup mass, the cheapest dedup forecast there is). Content
    * identity is md5(text) so the distinct runs over 16-byte keys, never
    * full documents — at 100 TB that is the difference between a hash agg
    * and a sort of the corpus. One scan, one 1-row fold; exact integers
    * except the ×1e6-rounded mean length.
    */
  def corpusSummary(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        max(col("n_chars")).cast("long").as("max_chars"))
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("n_distinct_texts"), col("total_chars"), col("max_chars"),
        round(col("total_chars").cast("double") * 1000000 / col("n_docs"))
          .cast("long").as("avg_chars_e6"))
}
