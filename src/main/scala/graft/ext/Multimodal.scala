package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2b X5).
  *
  * Media (image/audio/video) is carried as an opaque `binary` column with
  * a typed metadata struct — native to parquet and Spark, splittable and
  * column-prunable like any other column. The Spark-side plumbing here is
  * real and tested: schema, per-partition batched processing, frame
  * slicing, feature extraction shape. The actual codec call is STUBBED
  * (this container has no image/audio libraries): [[FakeCodec.decode]] is
  * a deterministic stand-in with the same signature a real decoder (JNI /
  * FFI) would have — swap the body, keep the pipeline.
  *
  * Scale notes: decode runs in `mapPartitions`, so per-partition setup
  * (codec init, model load) is paid once per task, not per row — the same
  * batching contract as Arrow-batched UDFs. No shuffle anywhere: decode
  * and feature extraction are map-only over file splits.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)
  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      media_len: Long,
      n_frames: Int,
      features: Array[Float])

  /** STUB decoder — deterministic fake with a real decoder's shape.
    * A production build replaces the body with the actual codec call
    * (e.g. libjpeg / ffmpeg via FFI); everything around it is real.
    */
  object FakeCodec {
    val FrameBytes = 256
    val FeatureDim = 8

    /** "Decode" media bytes into a fixed-dim feature vector: per-stripe
      * byte statistics — deterministic, so tests can assert on it.
      * Accumulates in double and quantizes to float once at the end, so
      * a double-arithmetic engine (the DuckDB oracle) reproduces every
      * component exactly through a single float cast.
      */
    def decode(media: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      if (media.isEmpty) return f
      val acc = new Array[Double](FeatureDim)
      var i = 0
      while (i < media.length) {
        acc(i % FeatureDim) += (media(i) & 0xff) / 255.0
        i += 1
      }
      val stripe = math.max(1, media.length / FeatureDim)
      var j = 0
      while (j < FeatureDim) { f(j) = (acc(j) / stripe).toFloat; j += 1 }
      f
    }
  }

  /** Attach a synthetic media column derived from text (UTF-8 bytes) —
    * the stand-in corpus for plumbing tests; a real corpus would read
    * binary columns straight from parquet.
    */
  def withSyntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      // deterministic kind assignment: cycle by id
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"))

  /** Pure-column plumbing: length + frame count from binary media —
    * stays in whole-stage codegen, oracle-checkable.
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("kind"),
      octet_length(col("media")).cast("long").as("media_len"),
      ceil(octet_length(col("media")).cast("double") / FakeCodec.FrameBytes)
        .cast("int").as("n_frames"))

  /** Frame sampling as binary slicing: every `stride`-th FrameBytes-sized
    * chunk, via `substring` on binary (no decode needed for cheap
    * sampling passes).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("media")).cast("double") / FakeCodec.FrameBytes).cast("int")
    media.select(
      col("doc_id"),
      transform(
        sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
        i => substring(col("media"), i * FakeCodec.FrameBytes + 1, lit(FakeCodec.FrameBytes)))
        .as("frames"))
  }

  /** Batched decode: mapPartitions over typed rows; codec state would be
    * initialized once per partition here.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("kind")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec init would go here (once per task)
        rows.map { r =>
          val bytes = if (r.media == null) Array.empty[Byte] else r.media
          MediaFeatures(
            r.doc_id,
            r.kind,
            bytes.length.toLong,
            math.ceil(bytes.length.toDouble / FakeCodec.FrameBytes).toInt,
            FakeCodec.decode(bytes))
        }
      }
  }
}
