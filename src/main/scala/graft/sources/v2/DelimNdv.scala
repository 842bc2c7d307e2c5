package graft.sources.v2

/** Minimal HyperLogLog distinct-count sketch for the per-file column
  * NDV the manifest records (256 registers ≈ ±6.5% standard error —
  * plenty for the CBO's join-ORDERING decisions, which only need the
  * orders of magnitude right). Hashes the field's WRITTEN TEXT
  * (murmur3 over the String's chars — ZERO allocation on the write
  * hot path; the earlier getBytes(UTF_8) copy per field value was a
  * measured ~6% write tax at round 19), so the estimate is a property
  * of the landed text, not of any runtime type.
  *
  * The manifest stores only the ESTIMATE (one long per tracked column
  * per file, appended to the existing stats text) — sketch bytes never
  * touch the metadata envelope (STRESS §15). Table-level distinct
  * counts derive as min(Σ per-file ndv, row count): exact-ish for
  * keys (files partition the key space), an overestimate for
  * low-cardinality columns — a bound that preserves ordering, which
  * is what join reordering consumes.
  */
private[graft] final class DelimNdv {
  import DelimNdv._
  private val regs = new Array[Byte](M)
  private var touched = false

  def add(text: String): Unit = {
    touched = true
    val h1 = scala.util.hashing.MurmurHash3.stringHash(text, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(text, 0x85ebca6b)
    val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
    val idx = (h & (M - 1)).toInt
    val w = h >>> P // remaining 56 bits
    val rank = (java.lang.Long.numberOfLeadingZeros(w) - P + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
  }

  def estimate: Long = {
    if (!touched) return 0L
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += 1.0 / (1L << (regs(i) & 0xff)).toDouble
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M * M / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.max(1L, math.round(est))
  }
}

private[graft] object DelimNdv {
  val P = 8
  val M: Int = 1 << P // 256 registers
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)
}
