package graft.docs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / frame-sample operators.
  *
  * The actual media decode is a clearly-marked DETERMINISTIC STUB (`stubDecode`) —
  * codec libraries are not in this container. Everything around it is real and
  * tested: the schema, the `mapPartitions` batch shape (one iterator pass, no
  * per-row session state), the partitioning, and the frame-sampling expression
  * (pure Catalyst `substring` on binary — no data leaves codegen).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      checksum: Long,
      features: Array[Double])

  private val mimes = array(lit("image/png"), lit("audio/wav"), lit("video/mp4"))

  /** Deterministic synthetic media table derived from `documents`: the UTF-8 text
    * bytes stand in for an encoded media payload. Schema (doc_id, mime, payload,
    * meta: struct(width, height, duration_ms)). */
  def synthFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(mimes, pmod(col("doc_id"), lit(3)).cast("int") + 1).as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(xxhash64(col("doc_id")), lit(1024)) + 32).cast("int").as("width"),
        (pmod(xxhash64(col("doc_id"), lit(1)), lit(768)) + 32).cast("int").as("height"),
        (pmod(xxhash64(col("doc_id"), lit(2)), lit(60000)) + 1000).cast("int").as("duration_ms")
      ).as("meta"))

  /** ========== STUB ==========
    * Stands in for a real image/audio decoder (libjpeg/ffmpeg/…): produces a
    * deterministic 8-dim "embedding" from the payload bytes (byte histogram
    * moments). Real deployments swap ONLY this function; the surrounding
    * mapPartitions plumbing (batching, schema, partition preservation) is the
    * production shape. */
  private[docs] def stubDecode(payload: Array[Byte]): Array[Double] = {
    val counts = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xff) % 8) += 1L
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    counts.map(_.toDouble / n)
  }

  /** Decode + feature-extract over the media table: one `mapPartitions` pass
    * (iterator-to-iterator — constant memory per partition, the Spark analog of a
    * batched decode worker). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("mime"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          var checksum = 0L
          var i = 0
          while (i < r.payload.length) {
            checksum = (checksum * 31 + (r.payload(i) & 0xff)) % 1000000007L
            i += 1
          }
          MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, checksum,
            stubDecode(r.payload))
        }
      }
  }

  /** Frame sampling: slice the payload into `n` fixed-stride frames — pure Catalyst
    * (`substring` works on binary), no decode needed for this plumbing step.
    * Output (doc_id, mime, frame_idx, frame: binary). */
  def frameSample(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("flen", greatest(floor(length(col("payload")) / n).cast("int"), lit(1)))
      .select(col("doc_id"), col("mime"),
        posexplode(expr(
          s"transform(sequence(0, ${n - 1}), i -> substring(payload, flen * i + 1, flen))")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
}
