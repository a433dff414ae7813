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

  /** Resize stub: decimate the payload by `factor` (keep every
    * factor-th byte) — the downsample shape of an image resize, run
    * per-partition like the decoder. Output stays a binary column. */
  def resize(spark: SparkSession, media: DataFrame, factor: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val out = new Array[Byte]((payload.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = payload(i * factor); i += 1 }
          (id, out)
        }
      }.toDF("doc_id", "resized")
  }

  /** Feature-extraction stub: decoded payload → L2-normalized 16-dim
    * embedding (nibble-bucket frequencies). The output column has the
    * exact shape the Similarity operators consume (`Array[Float]`), so
    * the media pipeline composes with ANN search end-to-end — a real
    * model swap changes only the function body. */
  def extractEmbedding(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // model/codec load would happen once per partition here
        rows.map { case (id, payload) =>
          val decoded = decodeStub(payload)
          val hist = new Array[Float](16)
          decoded.foreach(b => hist(b & 0xf) += 1f)
          val n = math.sqrt(hist.map(x => x.toDouble * x).sum).toFloat max 1e-9f
          (id, hist.map(_ / n))
        }
      }.toDF("vec_id", "embedding")
  }

  /** Oracle-checkable metadata projection (q_media_meta). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"),
      col("meta.byte_len").as("byte_len"),
      col("meta.sig").as("sig"),
      expr("(meta.byte_len + 255) div 256").as("n_chunks"))
}
