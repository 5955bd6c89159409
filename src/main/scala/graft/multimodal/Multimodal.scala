package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling.
  *
  * Design: media is an opaque `binary` column plus typed metadata — the
  * pattern used by large-scale multimodal training pipelines (and by
  * Spark's own `binaryFile` source). Decode / feature-extraction runs
  * per-partition so a real implementation can batch into a native decoder;
  * partitioning, schema, and batch shape here are real and tested, only the
  * codec call itself is STUBBED (no image/audio libraries in this
  * environment).
  *
  * At 100 TB: binary payloads dominate I/O, so the rules are (1) never
  * shuffle the bytes — derive features first, then drop/offload the blob;
  * (2) size partitions by bytes not rows (`maxPartitionBytes`); (3) keep
  * metadata in columnar form so pruned scans skip the payload entirely.
  */
object Multimodal {

  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte],
                      meta_width: Int, meta_height: Int)
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
                           checksum: Long, feat_mean: Double, frames_sampled: Int)

  /** Build a media table from any (id, text) corpus by treating the UTF-8
    * bytes as an opaque payload — a deterministic fake for plumbing tests.
    */
  def syntheticMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      // deterministic modality assignment
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("payload"),
      (pmod(col(idCol), lit(64)) * 16 + 16).cast("int").as("meta_width"),
      (pmod(col(idCol), lit(48)) * 16 + 16).cast("int").as("meta_height"))

  /** STUB decoder: a real pipeline would call an image/audio codec here
    * (e.g. JPEG decode → pixel tensor). Deterministic fake: byte stats.
    * The mapPartitions shape is the real contract — one decoder instance
    * per partition, streaming batches through it.
    */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Real impl: val decoder = NativeDecoder.open() — once per partition.
      rows.map { r =>
        val bytes = r.payload
        var crc = 7L
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          crc = (crc * 31 + (bytes(i) & 0xFF)) % 1000000007L
          sum += (bytes(i) & 0xFF)
          i += 1
        }
        val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
        val frames = r.modality match {
          case "video" => math.max(1, bytes.length / 256) // frame-sample stub
          case "audio" => math.max(1, bytes.length / 1024)
          case _       => 1
        }
        MediaFeatures(r.media_id, r.modality, bytes.length.toLong, crc,
          math.rint(mean * 10000) / 10000, frames)
      }
    }
  }

  /** STUB resize: a real pipeline would decode → scale → re-encode; the
    * deterministic fake keeps every (targetW·targetH / meta_w·meta_h)-th
    * byte, preserving the Spark-side contract — payload stays binary, new
    * dims land in metadata, work is per-partition with no shuffle of the
    * original bytes.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Real impl: one codec/scaler instance per partition.
      rows.map { r =>
        val inPixels = math.max(1L, r.meta_width.toLong * r.meta_height)
        val outPixels = targetW.toLong * targetH
        val stride = math.max(1L, inPixels / math.max(1L, outPixels)).toInt
        val out = r.payload.grouped(stride).map(_.head).toArray // ??? codec here
        MediaRow(r.media_id, r.modality, out, targetW, targetH)
      }
    }
  }

  /** End-to-end: synthesize → repartition by id (even payload spread) →
    * per-partition decode → features table, payload dropped before any
    * downstream shuffle.
    */
  def featuresPipeline(spark: SparkSession, docs: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val media = syntheticMediaTable(docs, idCol, textCol)
    val parts = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    decodeAndFeaturize(parts.as[MediaRow]).toDF()
  }
}
