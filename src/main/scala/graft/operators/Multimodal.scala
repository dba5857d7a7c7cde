package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column operators: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The container has no media codecs, so **decoding is a deterministic
  * stub** (clearly marked below): it "parses" fake dimensions out of the
  * leading payload bytes. Everything around the stub — the binary column
  * plumbing, schemas, typed Dataset + mapPartitions batch shape,
  * partitioning story — is real and oracle-checked. Swapping the stub for
  * a JNI/ffmpeg decoder changes one function.
  *
  * The `media` relation is derived deterministically from `documents`:
  * payload = 4-byte magic (by source id mod 3: IMG1/AUD1/VID1) ∥ UTF-8
  * text bytes. At 100 TB the payload column lives in its own parquet
  * column chunk — metadata-only queries never read it (column pruning),
  * and the decode stage is a narrow mapPartitions over payload batches.
  */
object Multimodal {

  /** The synthetic media table: doc_id, media_type, payload binary. */
  def media(spark: SparkSession, sfDir: String): DataFrame = {
    val magic = when(col("src_num") % 3 === 0, lit("IMG1"))
      .when(col("src_num") % 3 === 1, lit("AUD1"))
      .otherwise(lit("VID1"))
    Tables.documents(spark, sfDir)
      .withColumn("src_num",
        regexp_extract(col("source"), "(\\d+)", 1).cast("int"))
      .select(col("doc_id"),
        magic.as("media_type"),
        concat(magic.cast("binary"), col("text").cast("binary")).as("payload"))
  }

  /** Payload-level exact dedup — the multimodal face of `Dedup.exact`:
    * identical media BYTES collapse to one canonical row regardless of
    * which document carries them. Hashing happens per-row over the hex
    * form (engine-portable) and only (hash, doc_id) pairs shuffle — at
    * 100 TB the binary column never leaves its parquet column chunks
    * except to stream through the per-row hash.
    */
  def payloadDedup(spark: SparkSession, sfDir: String): DataFrame =
    media(spark, sfDir)
      .groupBy(md5(hex(col("payload"))).as("payload_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** Metadata extraction — never touches payload bytes beyond the header:
    * byte length, 4-byte magic (as 8 hex chars), media type decoded from
    * the magic.
    */
  def metadata(spark: SparkSession, sfDir: String): DataFrame =
    media(spark, sfDir).select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      substring(hex(col("payload")), 1, 8).as("header_hex"),
      when(substring(hex(col("payload")), 1, 8) === hex(lit("IMG1").cast("binary")), "image")
        .when(substring(hex(col("payload")), 1, 8) === hex(lit("AUD1").cast("binary")), "audio")
        .otherwise("video").as("kind"))

  /** STUB feature extraction (deterministic fake): 8 pseudo-features
    * derived from md5 of the payload hex. Real pipeline: replace the
    * arithmetic with a decoded-image embedding; the (doc_id, dim, value)
    * long-format output schema and the narrow per-row shape stay.
    */
  def featuresStub(spark: SparkSession, sfDir: String): DataFrame =
    media(spark, sfDir)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(7)), i =>
          conv(substring(md5(concat(i.cast("string"), hex(col("payload")))), 1, 4), 16, 10)
            .cast("int"))).as(Seq("dim", "value")))

  /** Frame sampling: up to 3 fixed-stride 16-byte "frames" after the
    * 4-byte header, fingerprinted. Models video frame extraction: a
    * narrow per-row explode; at scale frames fan out to the decode stage
    * without reshuffling the parent payload.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val hexp = hex(col("payload"))
    media(spark, sfDir)
      .select(col("doc_id"),
        posexplode(filter(
          transform(sequence(lit(0), lit(2)), f =>
            substring(hexp, f * 32 + 9, lit(32))),
          fr => length(fr) === 32)).as(Seq("frame_id", "frame_hex")))
      .withColumn("frame_md5", md5(col("frame_hex")))
  }

  // ---- typed decode path (mapPartitions, batch-shaped) ----

  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedMedia(doc_id: Long, media_type: String,
      width: Int, height: Int, n_bytes: Int)

  /** STUB decoder — deterministic fake standing in for a codec call:
    * width/height are "parsed" from payload bytes 5 and 6. The seam a
    * real decoder plugs into; must stay deterministic for the oracle.
    */
  private[operators] def decodeStub(r: MediaRecord): DecodedMedia = {
    val w = if (r.payload.length > 4) (r.payload(4) & 0x7f) + 1 else 1
    val h = if (r.payload.length > 5) (r.payload(5) & 0x7f) + 1 else 1
    DecodedMedia(r.doc_id, r.media_type, w, h, r.payload.length)
  }

  /** Decode stage: typed Dataset → mapPartitions in fixed-size batches —
    * the exact shape a vectorized/native decoder wants (amortized codec
    * init per batch, bounded memory per task, no shuffle).
    */
  def decode(spark: SparkSession, sfDir: String, batchSize: Int = 32): Dataset[DecodedMedia] = {
    import spark.implicits._
    media(spark, sfDir).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch: where a real impl would init/reuse the decoder
          batch.iterator.map(decodeStub)
        }
      }
  }

  case class ResizedMedia(doc_id: Long, media_type: String,
      width: Int, height: Int, target_w: Int, target_h: Int,
      resized_md5: String)

  /** STUB resampler — deterministic fake standing in for the pixel
    * resample: target dims fit the longer side to `maxDim` preserving
    * aspect ratio (integer arithmetic, floor), and the "resized bytes"
    * are fingerprinted deterministically. A real implementation swaps
    * the fingerprint line for the resampled buffer.
    */
  private[operators] def resizeStub(d: DecodedMedia, maxDim: Int): ResizedMedia = {
    val longer = math.max(d.width, d.height)
    val (tw, th) =
      if (longer <= maxDim) (d.width, d.height)
      else (math.max(1, d.width * maxDim / longer),
        math.max(1, d.height * maxDim / longer))
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(s"${d.doc_id}|$tw|$th"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = digest.map(b => f"$b%02x").mkString
    ResizedMedia(d.doc_id, d.media_type, d.width, d.height, tw, th, hex)
  }

  /** Resize stage: decode → batched mapPartitions resample — same batch
    * shape as decode, chained without a shuffle (both stages are narrow,
    * so Catalyst fuses them into one task pipeline).
    */
  def resize(spark: SparkSession, sfDir: String, maxDim: Int = 64,
      batchSize: Int = 32): Dataset[ResizedMedia] = {
    import spark.implicits._
    decode(spark, sfDir, batchSize)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map(resizeStub(_, maxDim))
        }
      }
  }
}
