package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def media = Multimodal.synthesizeMedia(
    Seq((1L, "hello world"), (2L, "a much longer payload body for frames"))
      .toDF("id", "text"), "id", "text")

  test("decodeMeta is deterministic and schema-typed") {
    val a = Multimodal.decodeMeta(spark, media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeMeta(spark, media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(m => m.n_bytes > 0 && m.width >= 16 && m.height >= 16))
    assert(a.map(_.kind).toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("frame sampling emits every stride-th fixed-size chunk") {
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 4, stride = 2)
      .collect().filter(_.media_id == 2L)
    // 38 bytes -> ceil(38/4)=10 chunks -> indices 0,2,4,6,8 kept
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.payload.length <= 4))
  }

  test("resizePayload truncates to the byte budget") {
    val out = Multimodal.resizePayload(media, 5).collect()
    out.foreach(r => assert(r.getAs[Array[Byte]]("payload_resized").length <= 5))
  }
}
