package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY.md §2b X4):
  * token counting, quality scoring, heuristic language ID, and content
  * fingerprinting. All built-in `functions._` — codegen'd end-to-end, and
  * every operator here is embarrassingly parallel (per-row map, no
  * shuffle), so it scales linearly with input splits.
  */
object TextStats {

  // Small stopword lists for the hit-count language heuristic. The
  // heuristic is deterministic (argmax with fixed tie-break order), which
  // is what makes it differentially testable against the SQL oracle.
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "a", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "que", "los", "una", "por", "como"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "pour", "une"))

  def tokenCount(text: Column): Column = size(Text.tokens(text))

  /** Mean token length: sum(len(token)) / n, null-safe on empty docs. */
  def avgTokenLen(text: Column): Column = {
    val ts = Text.tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
      .otherwise(lit(0.0d))
  }

  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(Text.tokens(text), t => array_contains(typedLit(stopwords), t)))

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val ts = Text.tokens(text)
    when(size(ts) > 0,
      stopwordHits(text, Stopwords.head._2).cast("double") / size(ts))
      .otherwise(lit(0.0d))
  }

  /** Composite quality score in [0,1]: length signal, stopword signal,
    * token-shape signal — the standard cheap pre-filter shape for corpus
    * curation (each component clamped, weights sum to 1).
    */
  def qualityScore(text: Column): Column = {
    val raw =
      lit(0.4) * least(lit(1.0), tokenCount(text).cast("double") / 100.0) +
      lit(0.3) * stopwordRatio(text) +
      lit(0.3) * least(lit(1.0), avgTokenLen(text) / 8.0)
    // 6-dp rounding as floor(x*1e6+0.5)/1e6: pure binary double ops,
    // bit-identical across engines — Spark's round() goes through
    // BigDecimal's decimal rendering and can flip the last digit vs
    // binary-rounding engines on boundary values
    floor(raw * 1e6 + lit(0.5d)) / 1e6
  }

  /** Heuristic language ID: stopword-hit argmax, ties broken by list
    * order (en, de, es, fr), "und" (undetermined) when nothing hits.
    */
  def langId(text: Column): Column = {
    val scores = Stopwords.map { case (lang, words) => lang -> stopwordHits(text, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lang).otherwise(acc)
    }
  }

  /** Content fingerprint: md5 of the raw text (exact-dup key; also the
    * DuckDB-checkable stand-in for a rolling hash).
    */
  def fingerprint(text: Column): Column = md5(text)

  /** Duplicate word-n-gram counts — the repetition quality signal (a doc
    * whose n-grams repeat heavily is boilerplate/spam; standard corpus
    * pre-filter alongside [[qualityScore]]). Returns (total n-grams,
    * repeated n-grams) as exact longs — integer outputs stay
    * bit-identical across engines, the ratio is the caller's division.
    * Short docs follow [[Text.shingles]]: fewer than n tokens → one
    * whole-sequence shingle → (1, 0). Map-only, no shuffle.
    */
  def ngramRepetition(text: Column, n: Int): (Column, Column) = {
    val sh = Text.shingles(text, n)
    (size(sh).cast("long"),
      (size(sh) - size(array_distinct(sh))).cast("long"))
  }

  /** Pattern scrub: (scrubbed text, number of matches removed) — the
    * PII/boilerplate-removal shape. Both sides are codegen'd built-ins
    * and map-only; at 100 TB this is pure scan bandwidth. The pattern is
    * Java-regex syntax; stick to the RE2-compatible subset (no
    * backrefs/lookaround) so the same pattern oracle-checks in other
    * engines.
    */
  def scrub(text: Column, pattern: String): (Column, Column) =
    (regexp_replace(text, pattern, ""), regexp_count(text, lit(pattern)))

  /** Vocabulary diversity per group in exact integers: total tokens,
    * sum of squared per-token counts, and distinct-token count. Simpson
    * concentration is sum_sq/total² and diversity 1 − that — left to the
    * caller so every emitted value is a bit-exact integer (a log-based
    * entropy would drift across engines; Simpson is the log-free
    * diversity index, the same trick as Curation's log-free idf).
    * Two partial-aggregated shuffles: (group, token) counts, then the
    * per-group rollup. Nothing is per-pair or per-document-squared.
    */
  def tokenDiversity(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs.select(col(groupCol), explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(sum(col("c")).as("total_tokens"),
        sum(col("c") * col("c")).as("sum_sq_counts"),
        count(lit(1)).as("n_distinct_tokens"))

  /** C4-style corpus-wide boilerplate removal at SEGMENT granularity:
    * each document is chunked into consecutive `segWords`-word segments
    * (the fixture's text has no line structure; a corpus with newlines
    * would chunk on those instead), any segment occurring in at least
    * `minDocs` DISTINCT documents is dropped from every document, and
    * the text is rebuilt from the surviving segments in order. This is
    * the "discard lines repeated across the corpus" dedup stage of C4
    * et al., the in-document complement to the cross-document near-dup
    * stack.
    *
    * Scale shape: segmentation is pure codegen'd array arithmetic
    * (`transform(sequence(...), slice)`) — no per-word explode; the hot
    * set is one partially-aggregated shuffle over (segment → distinct
    * docs); removal is a LEFT ANTI join (Spark broadcasts the hot side
    * when small — boilerplate vocabularies are tiny relative to the
    * corpus); the rebuild is one groupBy(doc) with an ordered
    * array fold. Nothing driver-side, nothing quadratic.
    *
    * Returns (idCol, clean_text, n_segments, n_dropped) — docs whose
    * every segment was dropped survive with empty clean_text.
    */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
      segWords: Int, minDocs: Long): DataFrame = {
    val segs = docs
      .withColumn("ws", split(col(textCol), " "))
      .withColumn("segs", expr(
        s"transform(sequence(0, (size(ws)-1) div $segWords), " +
          s"k -> array_join(slice(ws, k*$segWords+1, $segWords), ' '))"))
      .select(col(idCol), posexplode(col("segs")).as(Seq("seg_id", "segment")))
    val hot = segs.groupBy(col("segment"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("segment"))
    val kept = segs.join(hot, Seq("segment"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(
        array_join(expr("transform(array_sort(collect_list(" +
          "struct(seg_id, segment))), s -> s.segment)"), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol),
        expr(s"CAST((size(split(`$textCol`, ' ')) - 1) DIV $segWords + 1 " +
          "AS BIGINT)").as("n_segments"))
      .join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_segments"),
        (col("n_segments") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Per-language corpus stats in one aggregation. */
  def statsByLang(docs: DataFrame, langCol: String, textCol: String): DataFrame =
    docs.groupBy(col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        round(avg(tokenCount(col(textCol))), 2).as("avg_tokens"),
        round(avg(qualityScore(col(textCol))), 6).as("avg_quality"))
}
