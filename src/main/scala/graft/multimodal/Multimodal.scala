package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.US_ASCII
import graft.functions.Rounding.round4

/** Multimodal (image/audio/video) column handling.
  *
  * Design: media is an opaque `binary` column plus typed metadata — the
  * pattern used by large-scale multimodal training pipelines (and by
  * Spark's own `binaryFile` source). Decode / feature-extraction runs
  * per-partition so a real implementation can batch into a native decoder.
  *
  * The decode path is REAL: payloads are binary PPM (P6) images — a
  * genuine public image format parseable on a bare JVM — plus a
  * length-prefixed PCM byte format for audio and a PPM-frame container
  * for video. [[decodeAndFeaturize]] parses headers and pixel rows from
  * the bytes (it never peeks at how fixtures were synthesized), and
  * [[resize]] does true nearest-neighbor resampling, re-encoding the
  * result as PPM. Swapping in a JPEG/WAV codec changes only the
  * per-format branch, not the Spark plumbing.
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
                           width: Int, height: Int, mean_intensity: Double,
                           frames_sampled: Int)

  // ---- fixture synthesis -------------------------------------------------

  /** Deterministic payload synthesis (all formulas are functions of the id
    * alone, so the DuckDB oracle can recompute expected features the same
    * way the parser-roundtrip oracle recomputes parse ground truth):
    *   - image: PPM P6, w = 8+id%16, h = 8+id%12, pixel byte i =
    *     (id·7 + i·13) mod 256;
    *   - audio: `A8\n<n>\n` + n sample bytes, n = 200+id%800, sample i =
    *     (id·5 + i·11) mod 256;
    *   - video: `V\n<f>\n` + f PPM frames, f = 2+id%4, frame dims
    *     w = 8+id%8, h = 8+id%6, frame fr's pixel i =
    *     (id·7 + fr·17 + i·13) mod 256.
    */
  def syntheticMediaTable(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("media_id")).as[Long].map { id =>
      (id % 3) match {
        case 0 =>
          val (w, h) = (8 + (id % 16).toInt, 8 + (id % 12).toInt)
          MediaRow(id, "image", ppmBytes(w, h, i => ((id * 7 + i * 13) % 256).toByte), w, h)
        case 1 =>
          val n = 200 + (id % 800).toInt
          val header = s"A8\n$n\n".getBytes(US_ASCII)
          val out = new Array[Byte](header.length + n)
          System.arraycopy(header, 0, out, 0, header.length)
          var i = 0
          while (i < n) { out(header.length + i) = ((id * 5 + i * 11) % 256).toByte; i += 1 }
          MediaRow(id, "audio", out, 0, 0)
        case _ =>
          val f = 2 + (id % 4).toInt
          val (w, h) = (8 + (id % 8).toInt, 8 + (id % 6).toInt)
          val frames = (0 until f).map(fr =>
            ppmBytes(w, h, i => ((id * 7 + fr * 17 + i * 13) % 256).toByte))
          val header = s"V\n$f\n".getBytes(US_ASCII)
          MediaRow(id, "video", header ++ frames.flatten, w, h)
      }
    }.toDF()
  }

  private def ppmBytes(w: Int, h: Int, pixel: Int => Byte): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes(US_ASCII)
    val n = 3 * w * h
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) { out(header.length + i) = pixel(i); i += 1 }
    out
  }

  // ---- real decoders -----------------------------------------------------

  /** Whitespace-token scanner over an ASCII header region. */
  private final class ByteScanner(bytes: Array[Byte], var pos: Int) {
    def token(): String = {
      while (pos < bytes.length && Character.isWhitespace(bytes(pos))) pos += 1
      val s = pos
      while (pos < bytes.length && !Character.isWhitespace(bytes(pos))) pos += 1
      new String(bytes, s, pos - s, US_ASCII)
    }
  }

  /** Parse one binary PPM (P6) image at `off`: header `P6 <w> <h> <maxval>`
    * (whitespace-separated, single whitespace after maxval) then 3·w·h raw
    * RGB bytes. Returns (width, height, pixelSum, pixelOffset, endOffset).
    */
  private[multimodal] def decodePpm(bytes: Array[Byte], off: Int): (Int, Int, Long, Int, Int) = {
    val sc = new ByteScanner(bytes, off)
    val magic = sc.token()
    require(magic == "P6", s"not a P6 PPM at offset $off: '$magic'")
    val w = sc.token().toInt
    val h = sc.token().toInt
    // positive dims: w=0/h=0 passes the truncation check vacuously and a
    // later resize indexes past the payload; a negative dim makes n
    // negative, so the bound check proves nothing
    require(w > 0 && h > 0, s"invalid PPM dimensions ${w}x$h")
    require(sc.token() == "255", "unsupported maxval")
    val pixOff = sc.pos + 1 // exactly one whitespace byte after maxval
    val n = 3 * w * h
    require(pixOff + n <= bytes.length, "truncated PPM payload")
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(pixOff + i) & 0xFF; i += 1 }
    (w, h, sum, pixOff, pixOff + n)
  }

  /** Per-partition decode → features. Parses the actual bytes:
    *   - image: PPM header + pixel mean;
    *   - audio: `A8` header + sample mean, frames = max(1, n/1024) blocks;
    *   - video: container header, then every SECOND frame decoded (frame
    *     sampling — skipped frames are seeked over, not decoded); mean over
    *     sampled frames' pixels, dims from the first frame.
    * The mapPartitions shape is the contract: one decoder instance per
    * partition, payload never shuffled.
    */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // A real codec (JPEG/WAV) would be opened here, once per partition.
      rows.map { r =>
        val bytes = r.payload
        r.modality match {
          case "image" =>
            val (w, h, sum, _, _) = decodePpm(bytes, 0)
            MediaFeatures(r.media_id, r.modality, bytes.length.toLong, w, h,
              round4(sum.toDouble / (3 * w * h)), 1)
          case "audio" =>
            val sc = new ByteScanner(bytes, 0)
            require(sc.token() == "A8", "not an A8 audio payload")
            val n = sc.token().toInt
            val off = sc.pos + 1
            require(n > 0, "empty A8 payload")
            require(off + n <= bytes.length, "truncated A8 payload")
            var sum = 0L
            var i = 0
            while (i < n) { sum += bytes(off + i) & 0xFF; i += 1 }
            MediaFeatures(r.media_id, r.modality, bytes.length.toLong, 0, 0,
              round4(sum.toDouble / n), math.max(1, n / 1024))
          case other if other != "image" && other != "audio" && other != "video" =>
            throw new IllegalArgumentException(
              s"unknown modality '$other' for media ${r.media_id} — expected image|audio|video")
          case "video" =>
            val sc = new ByteScanner(bytes, 0)
            require(sc.token() == "V", "not a V video container")
            val f = sc.token().toInt
            var off = sc.pos + 1
            var fr = 0
            var sampled = 0
            var sum = 0L
            var pixels = 0L
            var dims = (0, 0)
            var frameLen = -1
            while (fr < f) {
              if (fr % 2 == 0) { // sample every second frame
                val (w, h, s, _, end) = decodePpm(bytes, off)
                if (sampled == 0) dims = (w, h)
                frameLen = end - off
                sum += s
                pixels += 3L * w * h
                sampled += 1
                off = end
              } else {
                off += frameLen // constant frame size in this container
              }
              fr += 1
            }
            MediaFeatures(r.media_id, r.modality, bytes.length.toLong,
              dims._1, dims._2, round4(sum.toDouble / pixels), sampled)
        }
      }
    }
  }

  /** Real nearest-neighbor resize for image payloads: decode the PPM,
    * resample pixels to (targetW, targetH), re-encode as PPM. Non-image
    * modalities pass through unchanged (resize is an image operation).
    * Per-partition, no shuffle of the original bytes.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.modality != "image") r
        else {
          val (w, h, _, pixOff, _) = decodePpm(r.payload, 0)
          val header = s"P6\n$targetW $targetH\n255\n".getBytes(US_ASCII)
          val out = new Array[Byte](header.length + 3 * targetW * targetH)
          System.arraycopy(header, 0, out, 0, header.length)
          var y = 0
          while (y < targetH) {
            val sy = y * h / targetH
            var x = 0
            while (x < targetW) {
              val sx = x * w / targetW
              val src = pixOff + 3 * (sy * w + sx)
              val dst = header.length + 3 * (y * targetW + x)
              out(dst) = r.payload(src)
              out(dst + 1) = r.payload(src + 1)
              out(dst + 2) = r.payload(src + 2)
              x += 1
            }
            y += 1
          }
          MediaRow(r.media_id, r.modality, out, targetW, targetH)
        }
      }
    }
  }

  /** End-to-end: synthesize → repartition by id (even payload spread) →
    * per-partition decode → features table, payload dropped before any
    * downstream shuffle.
    */
  def featuresPipeline(spark: SparkSession, docs: DataFrame,
                       idCol: String = "doc_id",
                       partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val media = syntheticMediaTable(docs, idCol)
    val parts = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    decodeAndFeaturize(parts.as[MediaRow]).toDF()
  }

  case class ImageHash(media_id: Long, ahash: Long)

  /** Perceptual average-hash (aHash — the classic pHash-family baseline)
    * over REAL decoded PPM pixels: the image is partitioned into a 4×4
    * block grid (block of pixel (x, y) = (x·4/w, y·4/h)), each block's
    * gray mass is the integer sum of its pixels' r+g+b, and bit j is set
    * iff block j's mean ≥ the global mean. The comparison is cross-
    * multiplied (`bsum·n_total ≥ tsum·n_block`) so the whole hash is
    * integer arithmetic end-to-end — bit-identical on any engine, which
    * is what lets the DuckDB oracle replay it from the synthesis formulas.
    *
    * Same scale contract as [[decodeAndFeaturize]]: one decoder pass per
    * partition, payload bytes never shuffle — only (id, 16-bit hash) pairs
    * leave the scan, and downstream dedup groups on the hash.
    */
  def imageAHashes(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "image").mapPartitions { it =>
      it.map { row =>
        val (w, h, _, pixOff, _) = decodePpm(row.payload, 0)
        val bsum = new Array[Long](16)
        val bn = new Array[Long](16)
        var p = 0
        val np = w * h
        while (p < np) {
          val base = pixOff + 3 * p
          val gray3 = (row.payload(base) & 0xFF) + (row.payload(base + 1) & 0xFF) +
            (row.payload(base + 2) & 0xFF)
          val blk = (p % w) * 4 / w + 4 * ((p / w) * 4 / h)
          bsum(blk) += gray3
          bn(blk) += 1
          p += 1
        }
        var tsum = 0L; var tn = 0L
        var j = 0
        while (j < 16) { tsum += bsum(j); tn += bn(j); j += 1 }
        var hash = 0L
        j = 0
        while (j < 16) {
          // empty blocks (w<4 or h<4 leaves grid cells unreachable) must
          // NOT set their bit: 0*tn >= tsum*0 is vacuously true, but the
          // oracle computes bits only over EXISTING (media_id, blk) rows —
          // an empty block contributes a cleared bit there
          if (bn(j) > 0 && bsum(j) * tn >= tsum * bn(j)) hash |= (1L << j)
          j += 1
        }
        ImageHash(row.media_id, hash)
      }
    }
  }
}
