package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, partition shape, decode/resize stubs. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "abcdefgh" * 32), (1L, "0123456789" * 20), (2L, "zz")
  ).toDF("doc_id", "text")

  test("syntheticMediaTable: binary payload + typed metadata") {
    val m = Multimodal.syntheticMediaTable(docs, "doc_id", "text")
    assert(m.schema("payload").dataType.typeName == "binary")
    val mods = m.select("media_id", "modality").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mods == Map(0L -> "image", 1L -> "audio", 2L -> "video"))
  }

  test("featuresPipeline: deterministic checksum and frame sampling") {
    val f = Multimodal.featuresPipeline(spark, docs).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(f(0L).getAs[Long]("n_bytes") == 256)
    assert(f(0L).getAs[Int]("frames_sampled") == 1) // image
    assert(f(2L).getAs[Int]("frames_sampled") == 1) // video, tiny payload
    // checksum matches the rolling-hash formula
    val expected = "abcdefgh".repeat(32).getBytes.foldLeft(7L)((a, b) => (a * 31 + (b & 0xFF)) % 1000000007L)
    assert(f(0L).getAs[Long]("checksum") == expected)
  }

  test("resize stub: payload shrinks, metadata carries new dims") {
    val media = Multimodal.syntheticMediaTable(docs, "doc_id", "text")
      .as[Multimodal.MediaRow]
    val out = Multimodal.resize(media, 4, 4).collect().map(r => r.media_id -> r).toMap
    assert(out.values.forall(r => r.meta_width == 4 && r.meta_height == 4))
    val orig = media.collect().map(r => r.media_id -> r.payload.length).toMap
    assert(out(0L).payload.length <= orig(0L))
    assert(out(0L).payload.length > 0)
  }
}
