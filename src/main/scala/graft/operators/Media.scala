package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns (SURVEY.md §2.6): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct.
  * The Spark-side plumbing — schema, per-partition batch processing,
  * chunking for frame-sampling — is real and tested; the actual codec
  * work is STUBBED deterministically (no image/audio libraries in this
  * container): `decodeStub` is a byte-level transform standing in for
  * a real decoder with the same signature and batch shape.
  *
  * At scale the pattern is: binary payloads stay columnar in parquet,
  * decode runs in `mapPartitions` (one codec context per partition,
  * not per row), and derived features land in normal columns where
  * Catalyst can prune/push down.
  */
object Media {

  /** Build the media table: payload as binary + typed metadata. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        expr("octet_length(text)").as("byte_len"),
        lit("text/plain").as("mime"),
        expr("substring(md5(cast(text as binary)), 1, 8)").as("sig")).as("meta"))

  /** STUB decoder: stands in for image/audio decode. Deterministic
    * byte map so tests are stable. A real deployment swaps the body
    * for the codec call; everything around it is unchanged. */
  def decodeStub(payload: Array[Byte]): Array[Byte] =
    payload.map(b => (b ^ 0x5a).toByte)

  /** Per-partition feature extraction: one "codec context" per
    * partition, batched over rows — the mapPartitions shape a real
    * decoder needs. Emits a 256-bin byte histogram as the feature. */
  def byteHistogram(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // expensive init (codec/model load) would happen once here
        rows.map { case (id, payload) =>
          val decoded = decodeStub(payload)
          val hist = new Array[Long](256)
          decoded.foreach(b => hist(b & 0xff) += 1)
          (id, hist)
        }
      }.toDF("doc_id", "hist")
  }

  /** Frame-sampling stub: split the payload into fixed-size chunks
    * ("frames") and keep every `stride`-th — the partition-preserving
    * explode a video pipeline uses. */
  def frameSample(spark: SparkSession, media: DataFrame,
    chunk: Int = 256, stride: Int = 2): DataFrame =
    media.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, greatest(cast(ceil(octet_length(payload) / $chunk.0) as int) - 1, 0)), i -> substring(payload, i * $chunk + 1, $chunk))"))
        .as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % stride === 0)

  /** Oracle-checkable metadata projection (q_media_meta). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"),
      col("meta.byte_len").as("byte_len"),
      col("meta.sig").as("sig"),
      expr("(meta.byte_len + 255) div 256").as("n_chunks"))
}
