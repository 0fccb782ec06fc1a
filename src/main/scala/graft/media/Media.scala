package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video handled as opaque `binary`
  * payloads with typed metadata, plus batched decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The Spark-side plumbing — schema, partitioning, typed encoders, batch
  * shape — is real and tested. The codec step itself is a clearly marked
  * STUB: this container has no image/audio libraries, and the idiomatic
  * production form (vectorized Python workers via `mapInPandas`) is a
  * PySpark surface, so the Scala engine exposes the same batched
  * contract through `mapPartitions` with a deterministic fake decoder
  * where libjpeg/ffmpeg would be called. Swapping in a real codec touches
  * only [[MediaCodec.decodeStub]].
  */
object Media {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, frames: Int)
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                            meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 features: Array[Float])

  /** Deterministic synthetic media table derived from the documents table
    * (payload = UTF-8 text bytes standing in for encoded frames).
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (pmod(col("doc_id"), lit(100)) + 1).cast("int").as("frames")).as("meta"))

  /** Exact content deduplication over the BINARY payload — the
    * multimodal twin of the text pipeline's `d_dedup_exact`: identical
    * encoded bytes (re-hosted images, mirrored video segments) collapse
    * to the minimum media_id regardless of their metadata or kind. One
    * codegen'd md5 scan + one hash agg + one equi-join back; at 100 TB
    * the hash groupBy is the only shuffle and carries 16-byte digests,
    * not payloads.
    *
    * @return (media_id, kind, content_md5, canonical_id, is_dup)
    */
  def dedupExact(media: DataFrame): DataFrame = {
    val h = media.select(col("media_id"), col("kind"),
      md5(col("bytes")).as("content_md5"))
    val canon = h.groupBy("content_md5")
      .agg(min(col("media_id")).as("canonical_id"))
    h.join(canon, "content_md5")
      .select(col("media_id"), col("kind"), col("content_md5"),
        col("canonical_id"),
        (col("media_id") =!= col("canonical_id")).cast("long").as("is_dup"))
  }

  /** Chunk-hash near-duplicate candidates over the BINARY payload — the
    * multimodal analogue of banded MinHash: each blob is cut into 4
    * equal-width blocks (CDC-style content chunks), blocks are md5'd,
    * and two blobs become a candidate pair when ≥ `minMatch` block
    * digests agree AT THE SAME INDEX — re-hosted media with a changed
    * tail segment (re-muxed container, appended watermark) still share
    * their leading blocks, which exact dedup misses entirely.
    *
    * Plan: one block-hash scan (4 rows per blob, 16-byte digests), one
    * (block_idx, digest) equi-join — bucketed, never all-pairs — one
    * pair-keyed count agg. Empty trailing blocks (blob shorter than
    * 3·⌈n/4⌉) are dropped so two short blobs can't "match" on nothing.
    *
    * @return (a, b, matches, sim_e6) with a < b, sim = matches/4
    */
  def nearDupBlocks(media: DataFrame, minMatch: Int = 2): DataFrame = {
    require(minMatch >= 1 && minMatch <= 4)
    val blk = media
      .select(col("media_id"), col("bytes"),
        octet_length(col("bytes")).cast("long").as("n"))
      .withColumn("bs", expr("(n + 3) div 4"))
      .select(col("media_id"), col("n"), col("bs"), col("bytes"),
        explode(sequence(lit(0L), lit(3L))).as("bi"))
      .filter(col("bi") * col("bs") < col("n"))
      .select(col("media_id"), col("bi"),
        md5(expr("substr(bytes, cast(bi * bs + 1 as int), cast(bs as int))"))
          .as("h"))
    val l = blk.select(col("media_id").as("a"), col("bi"), col("h"))
    val r = blk.select(col("media_id").as("b"), col("bi").as("bi2"),
      col("h").as("h2"))
    l.join(r, col("bi") === col("bi2") && col("h") === col("h2") &&
        col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("matches"))
      .filter(col("matches") >= minMatch)
      .select(col("a"), col("b"), col("matches"),
        (col("matches") * 250000).as("sim_e6"))
  }

  /** Batched decode + feature extraction. Batches of `batchSize` rows per
    * call into the codec — the same batch contract `mapInPandas` gives
    * Python workers (amortizes codec init across rows).
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one codec init per batch, not per row
        val codec = MediaCodec.open()
        batch.map { r =>
          MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
            codec.decodeStub(r.bytes, r.meta))
        }
      }
    }
  }

  /** Resize: production = decode → scale → re-encode; stub keeps the
    * payload contract (binary out, metadata updated) deterministically.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      // STUB: real impl re-encodes pixels; payload passthrough keeps shape
      col("bytes"),
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.sampleRate").as("sampleRate"),
        col("meta.frames").as("frames")).as("meta"))

  /** Frame sampling for video rows: every k-th frame index, as an array
    * column (real impl would slice the container; indices are the
    * contract the trainer consumes).
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("meta.frames") - 1, lit(everyK)).as("frame_indices"))

  /** WebDataset-style shard assignment: each blob goes to the shard its
    * running byte total (per kind, media_id order) starts in — the
    * deterministic tar-shard packer for multimodal corpora. Same
    * concat-and-chunk shape as text sequence packing; the cumulative
    * window partitions by kind (at 100 TB the shard key adds a
    * path-bucket and the shape is unchanged).
    */
  def shardAssign(media: DataFrame, maxBytes: Long): DataFrame = {
    require(maxBytes >= 1, s"need maxBytes >= 1, got $maxBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("kind").orderBy(col("media_id").asc)
    media.select(col("media_id"), col("kind"),
        length(col("bytes")).cast("long").as("n_bytes"))
      .withColumn("cum", sum(col("n_bytes")).over(w))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        floor((col("cum") - col("n_bytes")).cast("double") / maxBytes)
          .cast("long").as("shard_id"))
  }
}

/** The codec seam. */
object MediaCodec {
  final class Handle private[MediaCodec] () {
    /** STUB decode: deterministic 8-dim feature vector from byte-stream
      * statistics (moments of the byte histogram). A real build replaces
      * this body with libjpeg/ffmpeg calls — signature and batching stay.
      */
    def decodeStub(bytes: Array[Byte], meta: Media.MediaMeta): Array[Float] = {
      var sum = 0L; var sumSq = 0L; var min = 255; var max = 0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b; sumSq += b.toLong * b
        if (b < min) min = b
        if (b > max) max = b
        i += 1
      }
      val n = math.max(bytes.length, 1)
      // moments accumulate in double and quantize to float LAST: double
      // division of exact integers is bit-identical across engines, so a
      // SQL oracle (CAST(sum/n AS REAL)) reproduces these features exactly
      val mean = (sum.toDouble / n).toFloat
      val variance = (sumSq.toDouble / n - (sum.toDouble / n) * (sum.toDouble / n)).toFloat
      Array(
        n.toFloat, mean, variance,
        min.toFloat, max.toFloat,
        meta.width.toFloat, meta.height.toFloat, meta.frames.toFloat)
    }
  }
  def open(): Handle = new Handle()
}
