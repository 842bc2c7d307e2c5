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

  /** Parsed PNG header summary (the SECOND real format, round 11):
    * big-endian layout + per-chunk CRC-32 verification — the two
    * failure axes RIFF/WAVE (little-endian, no checksums) cannot
    * exercise. Malformed input ⇒ invalid row, never a throw.
    */
  final case class PngFeatures(
      doc_id: Long,
      valid: Boolean,
      width: Long,
      height: Long,
      bit_depth: Int,
      color_type: Int,
      interlace: Int)

  /** Big-endian hex of the low `bytes` bytes of `n` — PNG's integer
    * encoding (network order), the mirror of [[leHex]].
    */
  private def beHex(n: Column, bytes: Int): Column =
    concat((0 until bytes).map(i =>
      lpad(hex(pmod(shiftright(n, (bytes - 1 - i) * 8), lit(256))), 2, "0")): _*)

  /** Valid PNG signature + IHDR + IEND from a text column: width =
    * character count, height = ascii of the first character, 8-bit
    * truecolor, no interlace. The IHDR CRC is computed with the
    * BUILT-IN `crc32` over the exact tag+body bytes — which is what
    * lets a deliberate CRC corruption be injected arithmetically
    * (`crcDelta` ≠ 0 breaks the checksum without touching the fields)
    * and the decode oracle recompute every field from the text.
    */
  def pngBytes(text: Column, crcDelta: Column): Column = {
    val bodyHex = concat(
      beHex(length(text).cast("long"), 4),          // width
      beHex(ascii(substring(text, 1, 1)).cast("long"), 4), // height
      lit("08"), lit("02"),                          // 8-bit, truecolor
      lit("00"), lit("00"), lit("00"))               // deflate, none, none
    val crc = crc32(unhex(concat(lit("49484452"), bodyHex))) + crcDelta
    unhex(concat(
      lit("89504E470D0A1A0A"),                       // signature
      lit("0000000D"), lit("49484452"), bodyHex,     // IHDR len + tag + body
      beHex(crc, 4),
      lit("00000000"), lit("49454E44"), lit("AE426082"))) // IEND
  }

  /** The actual PNG walker: 8-byte signature, IHDR-first rule,
    * big-endian lengths, per-chunk CRC-32 verification (java.util.zip
    * reference implementation), bounds checks, IEND-terminated walk.
    * Any damage — short buffer, bad magic, first chunk not IHDR, length
    * running past the buffer, checksum mismatch, missing IEND —
    * yields the invalid row.
    */
  def parsePng(docId: Long, b: Array[Byte]): PngFeatures = {
    val invalid = PngFeatures(docId, valid = false, 0L, 0L, 0, 0, 0)
    if (b == null || b.length < 8) return invalid
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != sig(i)) return invalid; i += 1 }
    def be32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def tag(o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var off = 8
    var ihdr: Option[(Long, Long, Int, Int, Int)] = None
    var sawEnd = false
    var first = true
    while (!sawEnd) {
      if (off + 12 > b.length) return invalid // len+tag+crc minimum
      val len = be32(off)
      if (len > Int.MaxValue || len > b.length - off - 12L) return invalid
      val id = tag(off + 4)
      if (first && id != "IHDR") return invalid // IHDR must come first
      first = false
      val payload = off + 8
      val crcOff = payload + len.toInt
      val crc = new java.util.zip.CRC32
      crc.update(b, off + 4, 4 + len.toInt) // tag + body, per the spec
      if (crc.getValue != be32(crcOff)) return invalid
      if (id == "IHDR") {
        if (len != 13L) return invalid
        val compression = b(payload + 10) & 0xff
        val filter = b(payload + 11) & 0xff
        if (compression != 0 || filter != 0) return invalid
        ihdr = Some((be32(payload), be32(payload + 4),
          b(payload + 8) & 0xff, b(payload + 9) & 0xff, b(payload + 12) & 0xff))
      } else if (id == "IEND") {
        if (len != 0L) return invalid
        sawEnd = true
      }
      off = crcOff + 4
    }
    ihdr match {
      case Some((w, h, depth, color, interlace)) =>
        PngFeatures(docId, valid = true, w, h, depth, color, interlace)
      case None => invalid
    }
  }

  /** Batched PNG decode — same mapPartitions contract as [[decodeWav]]. */
  def decodePng(spark: SparkSession, media: DataFrame): Dataset[PngFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions(rows => rows.map(r => parsePng(r.doc_id, r.media)))
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
