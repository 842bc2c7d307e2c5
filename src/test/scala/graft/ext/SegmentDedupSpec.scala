package graft.ext

import graft.SparkFunSuite

/** Invariants of the C4-style segment dedup that the corpus oracle
  * exercises only implicitly: identity when nothing is hot, exact
  * removal of planted boilerplate, and the distinct-DOC (not
  * occurrence) hotness rule.
  */
class SegmentDedupSpec extends SparkFunSuite {

  private val boiler = "subscribe to our newsletter"

  private def dedup(rows: Seq[(Long, String)], minDocs: Long) = {
    import spark.implicits._
    TextStats.segmentDedup(rows.toDF("doc_id", "text"),
        "doc_id", "text", segWords = 4, minDocs = minDocs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("identity when no segment reaches the doc threshold") {
    val rows = Seq(1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five six seven eight")
    val got = dedup(rows, minDocs = 2)
    for ((id, text) <- rows) {
      val (clean, nSeg, nDrop) = got(id)
      assert(clean == text && nDrop == 0L, s"doc $id: $clean")
      assert(nSeg == (text.split(" ").length - 1) / 4 + 1)
    }
  }

  test("planted boilerplate vanishes from every doc; unique tails survive") {
    // the 4-word boilerplate segment leads every doc, so segmentation
    // aligns it identically; tails are unique and must survive verbatim
    val rows = (1L to 5L).map(i =>
      i -> s"$boiler unique tail number$i padding word$i")
    val got = dedup(rows, minDocs = 3)
    for (i <- 1L to 5L) {
      val (clean, nSeg, nDrop) = got(i)
      assert(clean == s"unique tail number$i padding word$i", clean)
      // 9 words → segments of 4+4+1; only the boilerplate head drops
      assert(nDrop == 1L && nSeg == 3L)
    }
  }

  test("hotness counts DISTINCT docs, not occurrences") {
    // one doc repeating a segment 5 times must NOT make it hot (2 docs
    // < minDocs 3), even though it occurs 6 times overall
    val rep = (boiler + " ") * 5 + boiler
    val rows = Seq(1L -> rep, 2L -> (boiler + " something else entirely here"))
    val got = dedup(rows, minDocs = 3)
    assert(got(1L)._3 == 0L, "occurrence-counted hotness would have dropped these")
    assert(got(2L)._1.startsWith(boiler))
  }
}
