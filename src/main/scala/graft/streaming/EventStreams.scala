package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference engine is batch-iterative and has no streaming surface
  * (SURVEY.md §2.9); these operators exist for the engine's data-pipeline
  * role: incremental ingestion of new page/event batches feeding the
  * batch graph builds. Batch/stream parity: [[hourlyRollup]] is the same
  * plan as the `ev_hourly` driver-gate query, so one definition serves
  * both `read` and `readStream` inputs (tested for equality in
  * StreamingSpec).
  */
object EventStreams {

  /** Watermarked sliding-window rollup — works on batch or streaming
    * input alike (Catalyst plans the streaming aggregation + state store
    * when the source is a stream).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      // parquet TIMESTAMP_NTZ → TIMESTAMP: watermarks require an
      // instant-typed event time (values preserved, session TZ is UTC)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")) * 1000).cast("long").as("sum_value_e3"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("sum_value_e3"))

  /** Same rollup keyed by epoch instead of window struct — byte-equal to
    * the batch `ev_hourly` query.
    */
  def hourlyRollup(events: DataFrame): DataFrame = {
    // integer hour floor: TZ-independent, unlike date_trunc('hour') which
    // buckets in the session timezone (ADVICE r4)
    val epoch = col("ts").cast("timestamp").cast("long")
    events.groupBy(
        (epoch - epoch % 3600).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")) * 1000).cast("long").as("sum_value_e3"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(count: Long, first: Long, last: Long)
  final case class UserSession(user_id: Long, events: Long,
                               startEpoch: Long, endEpoch: Long)

  /** Stateful sessionization: per-user sessions closed after `gapSec` of
    * inactivity (custom state via flatMapGroupsWithState — the engine's
    * KeyValueGroupedDataset escape hatch for semantics windowed aggs can't
    * express).
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // Batch-mode semantics: all rows for the key arrive at once;
          // emit every closed session, keep the last one open in state.
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          var cur: Option[SessionState] = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000
            cur match {
              case Some(s) if t - s.last <= gapSec =>
                cur = Some(SessionState(s.count + 1, s.first, t))
              case Some(s) =>
                out += UserSession(user, s.count, s.first, s.last)
                cur = Some(SessionState(1, t, t))
              case None =>
                cur = Some(SessionState(1, t, t))
            }
          }
          cur.foreach(s => out += UserSession(user, s.count, s.first, s.last))
          if (state.exists) state.remove() // batch mode: nothing persists
          out.iterator
      }
  }

  final case class LastEvent(t: Long, eid: Long, etype: String)
  final case class Transition(user_id: Long, from_type: String,
                              to_type: String)

  /** Stateful streaming event-type transitions: per-user last event
    * carried in the state store across micro-batches, each batch's rows
    * replayed in (ts, event_id) order — so the emitted transition stream
    * equals the batch [[graft.streaming.Funnel.transitions]] whenever
    * batches respect per-user time order (the file-ingest contract:
    * sources deliver time-partitioned files in order). State is one
    * (ts, id, type) triple per user — bounded by the user set, not the
    * stream length.
    */
  def transitionEvents(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[LastEvent]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach(p => out += Transition(user, p.etype, e.event_type))
            prev = Some(LastEvent(e.ts.getTime, e.event_id, e.event_type))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** Drive [[transitionEvents]] over a parquet directory as a stream and
    * return the aggregated (from_type, to_type, n) counts of the emitted
    * transition stream. `maxFilesPerTrigger` forces multi-micro-batch
    * runs so the cross-batch state handoff is exercised.
    */
  def runTransitionStream(spark: SparkSession, path: String, name: String,
                          maxFilesPerTrigger: Int = 0): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(path).schema
    val dir = asStreamDir(path)
    val reader = spark.readStream.schema(schema)
    val configured =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader
    val ds = configured.parquet(dir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = transitionEvents(ds)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Streaming exact deduplication of the (user, item) interaction keys:
    * `dropDuplicates` over a watermarked stream keeps one state entry per
    * key seen inside the watermark horizon and emits only first
    * occurrences (append mode) — the streaming counterpart of the batch
    * `d_dedup_exact` gate, and the state-bounding idiom that makes exact
    * dedup viable on an unbounded 100 TB ingest: state size is the
    * distinct-key count within the horizon, not the stream length.
    */
  def dedupKeys(events: DataFrame): DataFrame =
    events.select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("ts").cast("timestamp").as("tts"))
      .filter(col("k").isNotNull)
      .withWatermark("tts", "1 hour")
      .dropDuplicates("user_id", "k")

  /** Drive [[dedupKeys]] over a parquet directory as a stream (append
    * mode — dedup emits first occurrences immediately, no watermark wait)
    * and return the deduplicated keys. `maxFilesPerTrigger` forces
    * multi-micro-batch execution so cross-batch duplicates exercise the
    * state store.
    */
  def runDedupStream(spark: SparkSession, path: String, name: String,
                     maxFilesPerTrigger: Int = 0): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val dir = asStreamDir(path)
    val reader = spark.readStream.schema(schema)
    val configured =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader
    val q = dedupKeys(configured.parquet(dir))
      .select(col("user_id"), col("k"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Any-touch view→purchase attribution: the stream-stream INTERVAL
    * join — every purchase credits every view by the same user in the
    * preceding `windowSec` seconds. The one Structured Streaming
    * operator class the rest of the surface doesn't exercise: two
    * watermarked streams joined on key + event-time range, with the
    * state store holding each side only until the watermark passes its
    * join horizon (views expire `windowSec` + watermark after their
    * event time; purchases at the watermark) — bounded state on an
    * unbounded ingest, the attribution shape every event pipeline ships.
    *
    * Identical plan on batch input (watermarks are no-ops): the
    * `ev_attrib` gate runs this very function batch-wise, and
    * AttributionStreamSpec asserts stream ≡ batch across micro-batch
    * splits. Lag is exact integer microseconds.
    *
    * @return (user_id, view_id, purchase_id, lag_us)
    */
  def attribution(events: DataFrame, windowSec: Long = 21600L): DataFrame = {
    require(windowSec > 0)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").cast("timestamp").as("vts"))
      .withWatermark("vts", "1 hour")
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").cast("timestamp").as("pts"))
      .withWatermark("pts", "1 hour")
    views.join(buys,
        col("user_id") === col("p_user") &&
          col("pts") >= col("vts") &&
          col("pts") <= col("vts") + expr(s"INTERVAL $windowSec SECOND"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("pts")) - unix_micros(col("vts"))).as("lag_us"))
  }

  /** Drive [[attribution]] over a parquet directory as a stream (append
    * mode — inner interval joins emit matches as both sides arrive).
    * `maxFilesPerTrigger` forces multi-micro-batch execution so
    * cross-batch view/purchase pairings exercise the join state store.
    */
  def runAttributionStream(spark: SparkSession, path: String, name: String,
                           maxFilesPerTrigger: Int = 0,
                           windowSec: Long = 21600L): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val dir = asStreamDir(path)
    val reader = spark.readStream.schema(schema)
    val configured =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader
    val q = attribution(configured.parquet(dir), windowSec)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Run a streaming query over a parquet directory with the memory sink —
    * the local smoke harness (one batch ≙ the directory's files).
    */
  /** The streaming file source lists a DIRECTORY; wrap a bare file. */
  private def asStreamDir(path: String): String = {
    val f = new java.io.File(path)
    if (f.isDirectory) path
    else {
      val d = java.nio.file.Files.createTempDirectory("graft-stream")
      java.nio.file.Files.copy(f.toPath, d.resolve(f.getName))
      d.toString
    }
  }

  def runStreamOnce(spark: SparkSession, path: String, name: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val dir = asStreamDir(path)
    val stream = spark.readStream.schema(schema).parquet(dir)
    // Complete mode: with a single finite batch the watermark never
    // advances past the windows, so Append would emit nothing.
    val q = windowedCounts(stream)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
