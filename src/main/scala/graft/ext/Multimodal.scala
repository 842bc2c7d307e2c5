package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2b X5).
  *
  * Media (image/audio/video) is carried as an opaque `binary` column with
  * a typed metadata struct — native to parquet and Spark, splittable and
  * column-prunable like any other column. As of round 7 the decode path
  * parses a REAL public format: RIFF/WAVE PCM ([[parseWav]] walks the
  * actual chunk structure — magic tags, little-endian sizes, word-aligned
  * chunk skipping, truncation checks — and extracts 16-bit samples), so
  * the first thing a real pipeline hits (malformed headers, truncated
  * frames) is genuinely exercised; [[withSyntheticWav]] synthesizes valid
  * WAV bytes from fixture text with codegen'd expressions, which is what
  * makes the decode oracle-checkable bit-for-bit.
  *
  * Scale notes: decode runs in `mapPartitions`, so per-partition setup
  * (codec init, model load) is paid once per task, not per row — the same
  * batching contract as Arrow-batched UDFs. No shuffle anywhere: decode
  * and feature extraction are map-only over file splits.
  */
object Multimodal {

  /** Frame granularity for the slicing/sampling passes. */
  val FrameBytes = 256

  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Parsed WAV summary: real header fields plus exact integer sample
    * statistics (bit-identical across engines — no float math).
    * Malformed input ⇒ `valid = false` with zeroed fields, never a
    * throw: at 100 TB a corrupt file must cost one flagged row, not the
    * job.
    */
  final case class WavFeatures(
      doc_id: Long,
      valid: Boolean,
      audio_format: Int,
      n_channels: Int,
      sample_rate: Long,
      bits_per_sample: Int,
      n_samples: Long,
      sum_sample: Long,
      min_sample: Long,
      max_sample: Long)

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

  /** Little-endian hex of the low `bytes` bytes of `n` — the RIFF size
    * field encoding, built from codegen'd string primitives.
    */
  private def leHex(n: Column, bytes: Int): Column =
    concat((0 until bytes).map(i =>
      lpad(hex(pmod(shiftright(n, i * 8), lit(256))), 2, "0")): _*)

  /** Valid RIFF/WAVE PCM bytes from a text column: mono, 16-bit,
    * 8 kHz; sample i = ascii(char i)·256 − 32768. Entirely codegen'd
    * expressions (hex assembly + one unhex), and arithmetic on ASCII
    * codes — which is exactly what lets the decode oracle recompute
    * every header field and sample statistic from the text in SQL.
    */
  def wavBytes(text: Column): Column = {
    val n = length(text).cast("long") // one 16-bit sample per character
    val dataSize = n * 2
    val sampleHex = when(n === 0, lit("")).otherwise(
      array_join(transform(split(text, ""), c =>
        // sample LE bytes: lo = 0x00, hi = (ascii − 128) & 0xff
        concat(lit("00"), lpad(hex(pmod(ascii(c) + 128, lit(256))), 2, "0"))), ""))
    unhex(concat(
      lit("52494646"), leHex(dataSize + 36, 4),     // "RIFF", riff size
      lit("57415645"),                              // "WAVE"
      lit("666D7420"), lit("10000000"),             // "fmt ", size 16
      lit("0100"), lit("0100"),                     // PCM, mono
      lit("401F0000"), lit("803E0000"),             // 8000 Hz, 16000 B/s
      lit("0200"), lit("1000"),                     // block align 2, 16 bit
      lit("64617461"), leHex(dataSize, 4),          // "data", data size
      sampleHex))
  }

  /** (doc_id, media): one synthetic WAV per document. */
  def withSyntheticWav(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), wavBytes(col("text")).as("media"))

  /** Pure-column plumbing: length + frame count from binary media —
    * stays in whole-stage codegen, oracle-checkable.
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("kind"),
      octet_length(col("media")).cast("long").as("media_len"),
      ceil(octet_length(col("media")).cast("double") / FrameBytes)
        .cast("int").as("n_frames"))

  /** Frame sampling as binary slicing: every `stride`-th FrameBytes-sized
    * chunk, via `substring` on binary (no decode needed for cheap
    * sampling passes).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("media")).cast("double") / FrameBytes).cast("int")
    media.select(
      col("doc_id"),
      transform(
        sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
        i => substring(col("media"), i * FrameBytes + 1, lit(FrameBytes)))
        .as("frames"))
  }

  /** The actual RIFF walker: validates magic tags and the riff size,
    * iterates chunks with little-endian sizes and the RIFF word-padding
    * rule, extracts fmt fields and 16-bit PCM samples. Any structural
    * damage — short header, wrong magic, chunk running past the buffer,
    * missing fmt/data, unsupported layout — yields the invalid row.
    */
  def parseWav(docId: Long, b: Array[Byte]): WavFeatures = {
    val invalid = WavFeatures(docId, valid = false, 0, 0, 0L, 0, 0L, 0L, 0L, 0L)
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b == null || b.length < 12) return invalid
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return invalid
    if (u32(4) != b.length - 8L) return invalid // truncated / over-long file
    var off = 12
    var fmt: Option[(Int, Int, Long, Int)] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= b.length) {
      val id = tag(off)
      val szL = u32(off + 4)
      if (szL > Int.MaxValue) return invalid
      val sz = szL.toInt
      val payload = off + 8
      // subtraction form: `payload + sz` could overflow Int on a corrupt
      // size near Int.MaxValue and wrap negative, skipping the guard
      if (sz > b.length - payload) return invalid // chunk runs off the end
      if (id == "fmt ") {
        if (sz < 16) return invalid
        fmt = Some((u16(payload), u16(payload + 2), u32(payload + 4), u16(payload + 14)))
      } else if (id == "data") {
        data = Some((payload, sz))
      }
      off = payload + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((af, ch, sr, bps)), Some((doff, dsz)))
          if af == 1 && ch == 1 && bps == 16 =>
        val n = dsz / 2
        var sum = 0L; var mn = 0L; var mx = 0L; var i = 0
        while (i < n) {
          // signed 16-bit LE: the high byte sign-extends
          val s = ((b(doff + 2 * i) & 0xff) | (b(doff + 2 * i + 1) << 8)).toLong
          sum += s
          if (i == 0) { mn = s; mx = s }
          else { if (s < mn) mn = s; if (s > mx) mx = s }
          i += 1
        }
        WavFeatures(docId, valid = true, af, ch, sr, bps, n.toLong, sum, mn, mx)
      case _ => invalid
    }
  }

  /** Batched decode: mapPartitions over typed rows — per-partition codec
    * state (for a heavier format: demuxer contexts, hardware decoders)
    * initializes once per task here.
    */
  def decodeWav(spark: SparkSession, media: DataFrame): Dataset[WavFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec init would go here (once per task)
        rows.map(r => parseWav(r.doc_id, r.media))
      }
  }
}
