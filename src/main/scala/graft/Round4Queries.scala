package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Text

/** Round-4 surface widening: the curation stages of an LLM training-data
  * pipeline that sit AROUND dedup/similarity (SURVEY.md §2b north star) —
  * benchmark-contamination screening, TF-IDF term profiling,
  * deterministic train/test splitting, stratified sampling, and
  * context-window token packing. All five are exact, seed-free
  * (determinism comes from md5 of the doc id, identical in every
  * engine), and DuckDB-oracle-checked.
  */
object Round4Queries {

  /** Shared deterministic per-doc hash — the "random" key for splits,
    * sampling, and packing order. md5 hex of the decimal id renders
    * identically in Spark and DuckDB, so every downstream ordering and
    * threshold is reproducible cross-engine (a seeded rand() is not).
    */
  private def docHash: org.apache.spark.sql.Column =
    md5(col("doc_id").cast("string"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark-contamination screen: does a training doc share any
    // 8-gram with the held-out benchmark corpus (here: source 'src0')?
    // The benchmark's distinct shingle set is tiny relative to the
    // corpus — it broadcasts, so the contamination join is map-side and
    // the only shuffle is the per-doc/per-source rollup. At 100 TB the
    // training side streams through unchanged; work scales with corpus
    // shingles, not pairs.
    "contamination_ngram" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val bench = docs.filter(col("source") === "src0")
        .select(explode(Text.shingleSet(col("text"), 8)).as("sh")).distinct()
      val cand = docs.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("source"),
          explode(Text.shingleSet(col("text"), 8)).as("sh"))
      cand.join(broadcast(bench), Seq("sh"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_shared"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_contaminated_docs"),
          sum(col("n_shared")).as("n_shared_shingles"))
    },
    // Per-source top-3 terms by TF-IDF. The idf is the log-free N/df
    // variant: tf, N and df are exact integers, so tf*(N/df) rounds
    // identically in every engine (ln() last-ulp differences across
    // libm implementations could flip a rank at a tie boundary).
    "tfidf_top_terms" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).cache()
      val nDocs = docs.count()
      val tf = docs
        .select(col("source"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = docs
        .select(col("doc_id"), explode(Text.tokenSet(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, Seq("term"))
        .withColumn("tfidf",
          floor(col("tf") * (lit(nDocs.toDouble) / col("df")) * 1e6 + 0.5) / 1e6)
      val w = Window.partitionBy(col("source"))
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("source"), col("term"), col("tfidf"), col("rnk"))
    },
    // Deterministic 80/20 train/test split: first md5 hex byte of the
    // doc id < 0xcc goes to train. Map-only decision — no shuffle until
    // the summary rollup; at 100 TB the split column is free.
    "train_test_split" -> { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("split",
          when(substring(docHash, 1, 2) < "cc", "train").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(Text.tokens(col("text"))).cast("long")).as("n_tokens"))
    },
    // Stratified sample: 20 docs per language, chosen by md5 order —
    // reproducible without a seed, and the per-stratum top-k plans as
    // WindowGroupLimit (k rows per group survive each partition, not
    // the whole stratum).
    "sample_stratified" -> { (s, dir) =>
      val w = Window.partitionBy(col("lang")).orderBy(docHash, col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 20)
    },
    // Context-window packing: docs are dealt into 256 buckets by md5
    // prefix, ordered deterministically within each bucket, and cut
    // into 2048-token shards by cumulative token count. The window is
    // PARTITIONED by bucket — 256-way parallel, no global sort — which
    // is the scale shape (a single global packing order would serialize
    // 100 TB through one window).
    "token_budget_pack" -> { (s, dir) =>
      val t = Tables.documents(s, dir).select(
        col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"),
        docHash.as("h"))
      val w = Window.partitionBy(substring(col("h"), 1, 2))
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.withColumn("bucket", substring(col("h"), 1, 2))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("shard", floor((col("cum") - 1) / 2048).cast("long"))
        .groupBy(col("bucket"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    }
  )

  private val TokensSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""

  /** 8-gram distinct shingle set in DuckDB (short docs collapse to one
    * whole-text shingle, matching [[Text.shingles]]).
    */
  private val ShinglesSql =
    s"""CASE WHEN len($TokensSql) >= 8
       |     THEN list_distinct(list_transform(range(len($TokensSql) - 7),
       |          i -> array_to_string(($TokensSql)[i + 1:i + 8], ' ')))
       |     ELSE [array_to_string($TokensSql, ' ')] END""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "contamination_ngram" ->
      s"""WITH sh AS (
         |  SELECT doc_id, source, $ShinglesSql AS shs FROM documents),
         |b AS (SELECT DISTINCT unnest(shs) AS s FROM sh WHERE source = 'src0'),
         |c AS (SELECT doc_id, source, unnest(shs) AS s FROM sh
         |      WHERE source <> 'src0'),
         |h AS (SELECT doc_id, source, count(*) AS n_shared
         |      FROM c JOIN b USING (s) GROUP BY 1, 2)
         |SELECT source, count(*) AS n_contaminated_docs,
         |       CAST(sum(n_shared) AS BIGINT) AS n_shared_shingles
         |FROM h GROUP BY 1""".stripMargin,
    "tfidf_top_terms" ->
      s"""WITH tfg AS (SELECT source, term, count(*) AS tf FROM (
         |  SELECT source, unnest($TokensSql) AS term FROM documents)
         |  GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM (
         |  SELECT DISTINCT doc_id, unnest($TokensSql) AS term FROM documents)
         |  GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tfg.source AS source, tfg.term AS term,
         |         floor(tf * (n_docs / df) * 1e6 + 0.5) / 1e6 AS tfidf
         |  FROM tfg, dfreq d, n WHERE tfg.term = d.term)
         |SELECT source, term, tfidf, rnk FROM (
         |  SELECT source, term, tfidf,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY tfidf DESC, term) AS rnk
         |  FROM scored)
         |WHERE rnk <= 3""".stripMargin,
    "train_test_split" ->
      s"""SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
         |            THEN 'train' ELSE 'test' END AS split,
         |       count(*) AS n_docs,
         |       CAST(sum(len($TokensSql)) AS BIGINT) AS n_tokens
         |FROM documents GROUP BY 1""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20""".stripMargin,
    "token_budget_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($TokensSql) AS BIGINT) AS n_tok,
         |         md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |p AS (
         |  SELECT substr(h, 1, 2) AS bucket, n_tok,
         |         sum(n_tok) OVER (PARTITION BY substr(h, 1, 2)
         |           ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT bucket, CAST(floor((cum - 1) / 2048) AS BIGINT) AS shard,
         |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM p GROUP BY 1, 2""".stripMargin
  )
}
