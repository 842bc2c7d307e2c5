package graft.ext

import graft.SparkFunSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val media = Multimodal.withSyntheticMedia(Tables.documents(spark, sf001))

  test("synthetic media is binary with cycling kind") {
    val row = media.filter($"doc_id" === 3L).head
    assert(row.getAs[Array[Byte]]("media").nonEmpty)
    assert(row.getString(2) == "image") // 3 % 3 == 0 → image
    assert(media.filter($"doc_id" === 4L).head.getString(2) == "audio")
  }

  test("mediaStats computes byte length and frame count in-plan") {
    val stats = Multimodal.mediaStats(media)
    val r = stats.filter($"doc_id" === 0L).head
    val len = r.getLong(2)
    assert(len > 0)
    assert(r.getInt(3) == math.ceil(len / 256.0).toInt)
  }

  test("sampleFrames slices FrameBytes-sized chunks with stride") {
    val bytes = Array.tabulate(600)(_.toByte)
    val df = Seq((1L, bytes)).toDF("doc_id", "media")
    val frames = Multimodal.sampleFrames(df, stride = 2)
      .head.getSeq[Array[Byte]](1)
    assert(frames.length == 2) // frames 0 and 2 of ceil(600/256)=3
    assert(frames(0).length == 256)
    assert(frames(0).toSeq == bytes.slice(0, 256).toSeq)
    assert(frames(1).toSeq == bytes.slice(512, 600).toSeq)
  }

  test("decodeFeatures runs batched per partition with deterministic stub output") {
    val out = Multimodal.decodeFeatures(spark, media)
    assert(out.count() == media.count())
    val f = out.filter(_.doc_id == 0L).head()
    assert(f.features.length == Multimodal.FakeCodec.FeatureDim)
    // deterministic: same input → same features
    val f2 = Multimodal.decodeFeatures(spark, media).filter(_.doc_id == 0L).head()
    assert(f.features.toSeq == f2.features.toSeq)
    assert(f.media_len > 0 && f.n_frames == math.ceil(f.media_len / 256.0).toInt)
  }

  test("FakeCodec.decode is a pure function of bytes") {
    val a = Multimodal.FakeCodec.decode("hello world".getBytes)
    val b = Multimodal.FakeCodec.decode("hello world".getBytes)
    val c = Multimodal.FakeCodec.decode("different bytes".getBytes)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(Multimodal.FakeCodec.decode(Array.empty).toSeq == Seq.fill(8)(0.0f))
  }
}
