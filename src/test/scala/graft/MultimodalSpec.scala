package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.US_ASCII

/** Multimodal: schema + partition shape, REAL PPM/PCM8 decode, real
  * nearest-neighbor resize.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "img"), (1L, "aud"), (2L, "vid"), (3L, "img2"), (4L, "aud2")
  ).toDF("doc_id", "text")

  test("syntheticMediaTable: binary payload + typed metadata") {
    val m = Multimodal.syntheticMediaTable(docs, "doc_id")
    assert(m.schema("payload").dataType.typeName == "binary")
    val mods = m.select("media_id", "modality").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mods == Map(0L -> "image", 1L -> "audio", 2L -> "video",
      3L -> "image", 4L -> "audio"))
  }

  test("decode parses a hand-built PPM, not the synthesis formula") {
    // 2x1 image: pixels (10,20,30), (40,50,60) -> mean 35.0
    val payload = "P6\n2 1\n255\n".getBytes(US_ASCII) ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val media = Seq(Multimodal.MediaRow(99L, "image", payload, 2, 1)).toDS()
    val f = Multimodal.decodeAndFeaturize(media).collect().head
    assert(f.width == 2 && f.height == 1)
    assert(f.mean_intensity == 35.0)
    assert(f.n_bytes == payload.length)
  }

  test("featuresPipeline: decoded dims and means match the synthesis formulas") {
    val f = Multimodal.featuresPipeline(spark, docs).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // image id=0: w=8, h=8, pixel i = (i*13)%256
    assert(f(0L).getAs[Int]("width") == 8 && f(0L).getAs[Int]("height") == 8)
    val expMean0 = (0 until 3 * 8 * 8).map(i => (i * 13) % 256).sum.toDouble / (3 * 8 * 8)
    assert(f(0L).getAs[Double]("mean_intensity") ==
      math.floor(expMean0 * 10000 + 0.5) / 10000)
    assert(f(0L).getAs[Int]("frames_sampled") == 1)
    // audio id=1: n = 201 samples, sample i = (5 + i*11)%256
    val expMean1 = (0 until 201).map(i => (5 + i * 11) % 256).sum.toDouble / 201
    assert(f(1L).getAs[Double]("mean_intensity") ==
      math.floor(expMean1 * 10000 + 0.5) / 10000)
    assert(f(1L).getAs[Int]("width") == 0)
    // video id=2: f = 4 frames, samples frames 0 and 2
    assert(f(2L).getAs[Int]("frames_sampled") == 2)
    assert(f(2L).getAs[Int]("width") == 8 + 2 % 8)
  }

  test("resize: true nearest-neighbor resample, re-encoded as PPM") {
    val media = Multimodal.syntheticMediaTable(docs, "doc_id")
      .as[Multimodal.MediaRow].filter(_.modality == "image")
    val out = Multimodal.resize(media, 4, 4).collect().map(r => r.media_id -> r).toMap
    assert(out.values.forall(r => r.meta_width == 4 && r.meta_height == 4))
    // decoding the resized payload yields the target dims
    val redecoded = Multimodal.decodeAndFeaturize(
      Seq(out(0L)).toDS()).collect().head
    assert(redecoded.width == 4 && redecoded.height == 4)
    // nearest-neighbor: resized pixel (0,0) is source pixel (0,0) of id=0,
    // whose RGB bytes are ((0*13)%256, (1*13)%256, (2*13)%256)
    val headerLen = "P6\n4 4\n255\n".getBytes(US_ASCII).length
    val px = out(0L).payload.slice(headerLen, headerLen + 3).map(_ & 0xFF)
    assert(px.toSeq == Seq(0, 13, 26))
    // and resized pixel (1,0) samples source x = 1*8/4 = 2: bytes at i=6,7,8
    val px2 = out(0L).payload.slice(headerLen + 3, headerLen + 6).map(_ & 0xFF)
    assert(px2.toSeq == Seq((6 * 13) % 256, (7 * 13) % 256, (8 * 13) % 256))
  }

  test("imageAHashes: hand-built light/dark halves set exactly the bright blocks' bits") {
    // 8x8 image, left half black (0,0,0), right half white (255,255,255):
    // 4x4 grid columns 0-1 dark (bits off), columns 2-3 bright (bits on).
    val px = Array.tabulate(8 * 8 * 3) { i => if ((i / 3) % 8 < 4) 0.toByte else 255.toByte }
    val payload = "P6\n8 8\n255\n".getBytes(US_ASCII) ++ px
    // identical twin must collide; the inverse image must not
    val inv = "P6\n8 8\n255\n".getBytes(US_ASCII) ++ px.map(b => (255 - (b & 0xFF)).toByte)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", payload, 8, 8),
      Multimodal.MediaRow(2L, "image", payload, 8, 8),
      Multimodal.MediaRow(3L, "image", inv, 8, 8),
      Multimodal.MediaRow(4L, "audio", Array[Byte](65, 56, 10, 49, 10, 0), 0, 0)).toDS()
    val hs = Multimodal.imageAHashes(media).collect().map(h => h.media_id -> h.ahash).toMap
    assert(hs.keySet == Set(1L, 2L, 3L), "non-images skipped")
    // bright blocks: grid columns 2,3 in every row -> bits {2,3,6,7,10,11,14,15}
    val expected = Seq(2, 3, 6, 7, 10, 11, 14, 15).map(1L << _).sum
    assert(hs(1L) == expected)
    assert(hs(1L) == hs(2L), "identical payloads collide")
    assert(hs(3L) != hs(1L), "inverse image hashes differently")
    // inverse: dark blocks were bright -> bits {0,1,4,5,8,9,12,13}
    assert(hs(3L) == Seq(0, 1, 4, 5, 8, 9, 12, 13).map(1L << _).sum)
  }
}
