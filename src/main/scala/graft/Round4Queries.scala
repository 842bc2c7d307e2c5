package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Curation

/** Round-4 surface widening: the curation stages of an LLM training-data
  * pipeline that sit AROUND dedup/similarity (SURVEY.md §2b north star) —
  * benchmark-contamination screening, TF-IDF term profiling,
  * deterministic train/test splitting, stratified sampling, and
  * context-window token packing. All five are exact, seed-free
  * (determinism comes from md5 of the doc id, identical in every
  * engine), and DuckDB-oracle-checked.
  */
object Round4Queries {

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
      Curation.contaminationScreen(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 8, carry = Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_contaminated_docs"),
          sum(col("n_shared")).as("n_shared_shingles"))
    },
    // Per-source top-3 terms by TF-IDF. The idf is the log-free N/df
    // variant: tf, N and df are exact integers, so tf*(N/df) rounds
    // identically in every engine (ln() last-ulp differences across
    // libm implementations could flip a rank at a tie boundary).
    "tfidf_top_terms" -> { (s, dir) =>
      Curation.tfidfTopTerms(Tables.documents(s, dir),
        "doc_id", "text", "source", k = 3)
    },
    // Deterministic 80/20 train/test split: first md5 hex byte of the
    // doc id < 0xcc goes to train. Map-only decision — no shuffle until
    // the summary rollup; at 100 TB the split column is free.
    "train_test_split" -> { (s, dir) =>
      Curation.trainTestSplit(Tables.documents(s, dir), "doc_id", 0.8)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(graft.ext.Text.tokens(col("text"))).cast("long")).as("n_tokens"))
    },
    // Stratified sample: 20 docs per language, chosen by md5 order —
    // reproducible without a seed, and the per-stratum top-k plans as
    // WindowGroupLimit (k rows per group survive each partition, not
    // the whole stratum).
    "sample_stratified" -> { (s, dir) =>
      Curation.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang", 20)
    },
    // Context-window packing: docs are dealt into nBuckets buckets by
    // md5 of the id, ordered deterministically within each bucket, and
    // cut into 2048-token shards by cumulative token count. The window
    // is PARTITIONED by bucket — nBuckets-way parallel, no global sort —
    // which is the scale shape (a single global packing order would
    // serialize 100 TB through one window). The default 256 runs here;
    // token_budget_pack_wide pins a second width (4096) so the fan-out
    // parameter is oracle-certified, not just plumbed.
    "token_budget_pack" -> { (s, dir) =>
      Curation.packTokenBudget(Tables.documents(s, dir), "doc_id", "text", 2048L)
        .groupBy(col("bucket"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    },
    // Same packing at a 16x wider fan-out (4096 buckets): certifies that
    // the bucket-width parameter changes the deal without changing the
    // packing semantics (every bucket still cuts at the same budget).
    "token_budget_pack_wide" -> { (s, dir) =>
      Curation.packTokenBudget(Tables.documents(s, dir), "doc_id", "text",
          2048L, nBuckets = 4096)
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
    // CAST AS STRING (not VARCHAR): valid in BOTH DuckDB and Spark SQL,
    // so this oracle text doubles as the SqlSurfaceSpec differential
    "sample_stratified" ->
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20""".stripMargin,
    "token_budget_pack" -> packOracleSql(2048, 256),
    "token_budget_pack_wide" -> packOracleSql(2048, 4096)
  )

  /** Shared packing oracle, parameterized by budget and bucket width —
    * the bucket id is the first 15 md5 hex chars as an integer mod
    * nBuckets, matching [[graft.ext.Curation.packTokenBudget]].
    */
  private[graft] def packOracleSql(budget: Int, nBuckets: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(coalesce(len($TokensSql), 0) AS BIGINT) AS n_tok,
       |         md5(CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents),
       |p AS (
       |  SELECT CAST(('0x' || substr(h, 1, 15)) AS BIGINT) % $nBuckets AS bucket,
       |         n_tok,
       |         sum(n_tok) OVER (
       |           PARTITION BY CAST(('0x' || substr(h, 1, 15)) AS BIGINT) % $nBuckets
       |           ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t)
       |SELECT bucket, CAST(floor(greatest(cum - 1, 0) / $budget) AS BIGINT) AS shard,
       |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |FROM p GROUP BY 1, 2""".stripMargin
}
