package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming link-graph ingestion — the seam a 100 TB pipeline feeds
  * through: crawl/event deltas arrive as micro-batches, the edge table
  * grows append-only, and cheap graph summaries (degrees) are maintained
  * incrementally instead of recomputed from the full table.
  *
  * The reference engine has no streaming surface (SURVEY.md §2.9); these
  * operators extend the engine's EventStreams batch/stream-parity pattern
  * to the GRAPH side: one plan definition serves `read` and `readStream`
  * inputs, and the driver gate (`ev_stream_degrees`) checks the streaming
  * result against a batch DuckDB oracle.
  */
object EdgeStreams {

  /** Deterministic edge stream derived from the events table (the same
    * bounded-id-space trick as the demo graph: actor → touched entity,
    * folded into 300 ids so iterative oracles stay tractable at any SF).
    * Works on batch and streaming inputs alike.
    */
  def eventEdges(events: DataFrame): DataFrame =
    events.select(
        (col("user_id") % 300).as("src"),
        (col("event_id") % 300).as("dst"))
      .filter(col("src") =!= col("dst"))

  /** Multigraph out-degree maintenance — a streaming-safe aggregation
    * (running count per source; in update/complete mode the state store
    * carries the counts across micro-batches).
    */
  def degreeCounts(edges: DataFrame): DataFrame =
    edges.groupBy("src").agg(count(lit(1)).as("out_degree"))

  /** The streaming file source lists a DIRECTORY; wrap a bare LOCAL file
    * in a temp dir (harness convenience for the single-file test fixtures
    * — remote paths are expected to already be directories).
    */
  private def wrapIfBareFile(path: String): String = {
    val f = new java.io.File(path)
    if (!f.isFile) path
    else {
      val d = java.nio.file.Files.createTempDirectory("graft-edge-stream")
      java.nio.file.Files.copy(f.toPath, d.resolve(f.getName))
      d.toString
    }
  }

  /** One-shot streaming run of the degree maintenance over a parquet
    * directory (memory sink, complete mode — a single finite batch).
    */
  def runDegreeStreamOnce(spark: SparkSession, path: String,
                          name: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(wrapIfBareFile(path))
    val q = degreeCounts(eventEdges(stream))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Incremental ingestion via foreachBatch: every micro-batch of events
    * appends its edges to `targetDir/edges` (append-only parquet — the
    * Iceberg-append seam) and merges its degree deltas into
    * `targetDir/degrees` (read summary + union + re-aggregate + promote —
    * state proportional to the VERTEX set, never the edge set, which is
    * what makes the summary maintainable at 10^12 edges). Returns the
    * number of micro-batches APPLIED by this invocation.
    *
    * Durability (ADVICE r3):
    *   - the source runs with a checkpointLocation (default
    *     `targetDir/_checkpoint`), so re-running against the same target
    *     resumes from the processed-file log instead of re-reading every
    *     source file and double-counting;
    *   - the applied micro-batch id is written INSIDE the new summary
    *     directory (`_applied_batch`, an `_`-prefixed file parquet scans
    *     ignore) BEFORE promotion, so "which batches are in this summary"
    *     travels atomically with the summary and a replayed batch
    *     (restart after a crash mid-commit) is detected and skipped
    *     rather than double-merged;
    *   - promotion is backup-then-swap (current → `degrees_prev`, next →
    *     `degrees`, drop backup; restore on failure), and every batch
    *     first runs a RECOVERY step: if the summary directory is missing,
    *     a completed `degrees_next` (its marker is written only after the
    *     parquet write finishes, so marker presence certifies
    *     completeness) is promoted, else the `degrees_prev` backup is
    *     restored — so a crash anywhere between the two renames loses
    *     nothing on restart;
    *   - the marker records the stream INSTANCE (a uuid minted once per
    *     checkpoint directory) next to the batch id, so a fresh or
    *     relocated checkpoint — whose batch numbering restarts at 0 —
    *     never has its genuinely new batches mistaken for replays of an
    *     older incarnation's batches.
    * Residual window, documented: a crash after the edges append but
    * before the summary promote replays the batch on restart and appends
    * its edges twice — closing it needs a transactional table format
    * (the engine's Iceberg seam, SURVEY §7.5).
    *
    * @param maxFilesPerTrigger bound source files per micro-batch (e.g. 1
    *        to force one batch per input file — the multi-batch test path)
    */
  def ingestOnce(spark: SparkSession, srcPath: String,
                 targetDir: String,
                 maxFilesPerTrigger: Option[Int] = None,
                 checkpointLocation: Option[String] = None): Long = {
    val schema = spark.read.parquet(srcPath).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(wrapIfBareFile(srcPath))
    val ckptDir = checkpointLocation.getOrElse(s"$targetDir/_checkpoint")
    // stream instance id: minted once per checkpoint directory, BEFORE the
    // query starts. Batch ids are meaningful only within one checkpoint's
    // numbering; a fresh/relocated checkpoint restarts them at 0, and its
    // new instance id keeps those batches from being skipped as replays.
    val hconf = spark.sparkContext.hadoopConfiguration
    val instance = {
      val p = new org.apache.hadoop.fs.Path(ckptDir, "_graft_instance")
      val cfs = p.getFileSystem(hconf)
      if (!cfs.exists(p)) {
        cfs.mkdirs(p.getParent)
        val out = cfs.create(p, false)
        try out.write(java.util.UUID.randomUUID().toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      val in = cfs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
    }
    var applied = 0L
    val q = eventEdges(stream).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ALL summary side-channel I/O goes through the Hadoop FileSystem
        // resolved from the path's own scheme, so an hdfs:// or s3a://
        // target merges correctly (a java.io existence check would be
        // always-false there and silently drop every prior batch — the
        // Checkpointer lesson from round 2)
        val degPath = s"$targetDir/degrees"
        val dst = new org.apache.hadoop.fs.Path(degPath)
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val markerName = "_applied_batch"
        val tmp = new org.apache.hadoop.fs.Path(s"$targetDir/degrees_next")
        val prev = new org.apache.hadoop.fs.Path(s"$targetDir/degrees_prev")
        // marker: "<instance>:<batchId>"; pre-instance markers (bare id)
        // parse with an empty instance and therefore never match — they
        // are treated as a foreign incarnation, which only ever APPLIES
        // more, never skips new data
        def markerIn(dir: org.apache.hadoop.fs.Path): (String, Long) = {
          val m = new org.apache.hadoop.fs.Path(dir, markerName)
          if (!fs.exists(m)) ("", -1L)
          else {
            val in = fs.open(m)
            val s = try new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8).trim
            finally in.close()
            s.split(":", 2) match {
              case Array(i, b) => (i, b.toLong)
              case _           => ("", s.toLong)
            }
          }
        }
        // RECOVERY: a crash between the promotion renames leaves the
        // summary missing but recoverable — a marker inside degrees_next
        // certifies a COMPLETE next summary (the marker is written only
        // after the parquet write), so promote it; otherwise restore the
        // backup. Runs before the skip check so a restarted query heals
        // the directory before reasoning about replays.
        if (!fs.exists(dst)) {
          if (fs.exists(new org.apache.hadoop.fs.Path(tmp, markerName))) {
            fs.rename(tmp, dst)
            if (fs.exists(prev)) fs.delete(prev, true)
          } else if (fs.exists(prev)) {
            fs.rename(prev, dst)
          }
        }
        val (mInst, mBatch) = markerIn(dst)
        if (fs.exists(dst) && mInst == instance && batchId <= mBatch) ()
        else {
          applied += 1
          batch.write.mode("append").parquet(s"$targetDir/edges")
          val delta = degreeCounts(batch)
          val merged =
            if (fs.exists(dst))
              spark.read.parquet(degPath).union(delta)
                .groupBy("src").agg(sum("out_degree").cast("long").as("out_degree"))
            else delta
          // write-new-then-promote: the summary read above must complete
          // before its directory is replaced
          merged.write.mode("overwrite").parquet(tmp.toString)
          val marker = fs.create(new org.apache.hadoop.fs.Path(tmp, markerName), true)
          try marker.write(s"$instance:$batchId"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally marker.close()
          if (fs.exists(prev)) fs.delete(prev, true)
          val hadOld = fs.exists(dst)
          if (hadOld) fs.rename(dst, prev)
          if (!fs.rename(tmp, dst)) {
            if (hadOld) fs.rename(prev, dst) // restore the backup
            sys.error(s"could not promote $tmp to $dst")
          }
          if (hadOld) fs.delete(prev, true)
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    applied
  }
}
