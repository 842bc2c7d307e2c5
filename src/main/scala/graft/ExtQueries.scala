package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext._

/** North-star extension queries (SURVEY.md §2b): dedup, similarity
  * search, and text analysis over the documents/embeddings fixtures.
  *
  * Oracle notes:
  *  - LSH-based queries (minhash) get an exact-SQL oracle because the
  *    verification step makes output = { pairs with true jaccard >= t
  *    that were LSH candidates }, and at 16 bands × 2 rows the candidate
  *    recall at t=0.9 is 1 - (1-0.9²)^16 ≈ 1 - 3e-12 — deterministic data,
  *    so if it matches once at sf0.01 it matches every round.
  *  - Hash-native queries (simhash, ANN top-k) are engine-internal and
  *    have no SQL equivalent → rows-only checks; their correctness is
  *    unit-tested against in-engine exact baselines instead.
  */
object ExtQueries {

  private val TokensSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X1: exact dedup with lineage — one hash aggregation on the text key.
    "dedup_exact" -> { (s, dir) =>
      Dedup.exactByKey(Tables.documents(s, dir), "doc_id", "text")
    },
    // X2 (exact form): all-pairs n-gram Jaccard with size-ratio blocking.
    "dedup_ngram_jaccard" -> { (s, dir) =>
      Dedup.jaccardPairsExact(Tables.documents(s, dir), "doc_id", "text", 0.95)
    },
    // X2 (scale form): MinHash banding → bucket join → exact verification.
    "dedup_minhash" -> { (s, dir) =>
      Dedup.minhashNearDupPairs(Tables.documents(s, dir), "doc_id", "text", 0.9,
        Dedup.MinHashParams(numBands = 16, rowsPerBand = 2))
    },
    // X2 scale-path CERTIFICATION: identical semantics to dedup_minhash
    // with the small-N cutover disabled (bruteForceMaxDocs = 0), so the
    // banding join — the actual 100 TB code path — executes at every
    // fixture scale and is oracle-checked against the same exact-Jaccard
    // SQL. dedup_minhash keeps the adaptive cutover (the production
    // default); this query pins that both strategies produce the same
    // relation under the DuckDB oracle, not just under DedupSpec.
    // Corpus: the deterministic doc_id < 1000 prefix (= the whole corpus
    // at sf0.001/sf0.01; 36k true pairs at sf0.1). The full-corpus forced
    // run is intentionally NOT the bench shape: the fixture is
    // pathologically dense (965k true pairs among 5k docs = 7.7% of all
    // pairs), and banding re-enumerates every clique once per band — the
    // exact workload the adaptive cutover exists to route around
    // (MinHashParams.bruteForceMaxDocs doc). The subset certifies the
    // code path; the cutover keeps the production default fast.
    "dedup_minhash_lsh" -> { (s, dir) =>
      Dedup.minhashNearDupPairs(
        Tables.documents(s, dir).filter(col("doc_id") < 1000),
        "doc_id", "text", 0.9,
        Dedup.MinHashParams(numBands = 16, rowsPerBand = 2, bruteForceMaxDocs = 0))
    },
    // X2 (bit-sketch form): SimHash Hamming-ball pairs via pigeonhole
    // block joins; the sketch is a custom codegen'd Catalyst expression,
    // so the pair listing itself has no SQL equivalent. The query pins
    // the block path against an in-engine exact Hamming join
    // (the approx_distinct_users pattern) on the deterministic
    // doc_id < 100 lens — the similarity_ann_topk baseline pattern; a
    // full-corpus O(N²) baseline inside the production query billed
    // ~2.3 s of bench time to verification and would dominate at any
    // larger fixture. Round 15: the block path's INPUT is restricted to
    // the same lens too — a pair with both ids < 100 needs only corpus
    // rows < 100 on both join sides, so the filtered-pair output is
    // IDENTICAL while the full-corpus pair LISTING (pure certification
    // overhead here, measured 8.1 s of r14 driver bench) is gone; the
    // full-corpus sketch+block production path stays certified by
    // dedup_stream_ingest, whose incoming side is the corpus remainder
    // with exact subset+recall verdicts. Verdicts: every emitted pair
    // must be a true <=maxHamming pair (subset_ok — structural, the
    // block path verifies the bound inside the join) and the block path
    // must recover at least 75% of the lens's true pairs (recall_ok —
    // measured recall is 1.0 at both sf0.01 and sf0.1; the sub-1.0
    // bound is headroom for the skew guard, which may drop degenerate
    // hot blocks by design — blocks only shrink under the lens, so the
    // bound is if anything easier, never different in kind).
    "dedup_simhash" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
      val block = Dedup.simhashNearDupPairs(s, docs, "doc_id", "text", maxHamming = 3)
        .select(col("id_a"), col("id_b"))
      val exact = Dedup.simhashPairsExact(s, docs, "doc_id", "text", maxHamming = 3)
        .select(col("id_a"), col("id_b"))
      val nB = block.agg(count(lit(1)).as("n_block"))
      val nE = exact.agg(count(lit(1)).as("n_exact"))
      val nI = block.join(exact, Seq("id_a", "id_b")).agg(count(lit(1)).as("n_inter"))
      nB.crossJoin(nE).crossJoin(nI).select(
        (col("n_exact") > 0).as("nonempty"),
        (col("n_inter") === col("n_block")).as("subset_ok"),
        (col("n_inter").cast("double") >= col("n_exact") * 0.75).as("recall_ok"))
    },
    // X2 × X6: streaming-ingest dedup's batch twin — flag incoming docs
    // that are simhash-near an existing static corpus via the
    // stream-static block join (Dedup.streamSimhashMatches; the same
    // function runs streaming in StreamingReconcileSpec). The sketch is
    // engine-internal, so the oracle pins the engine's self-check
    // verdicts against an in-engine exact Hamming join: the ingest path
    // has NO skew cap (the corpus side is the bounded one), and every
    // <=3-Hamming pair shares a pigeonhole block, so both subset and
    // recall must hold EXACTLY — stricter than dedup_simhash's 0.75.
    "dedup_stream_ingest" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(col("doc_id") < 100)
      val incoming = docs.filter(col("doc_id") >= 100)
      val matches = Dedup
        .streamSimhashMatches(s, incoming, corpus, "doc_id", "text", maxHamming = 3)
        .select(col("in_id"), col("corpus_id"))
      val shIn = Dedup.simhashes(s, incoming, "doc_id", "text")
        .select(col("id").as("in_id"), col("simhash").as("sh_in"))
      val shC = Dedup.simhashes(s, corpus, "doc_id", "text")
        .select(col("id").as("corpus_id"), col("simhash").as("sh_c"))
      val exact = shIn.join(shC,
          bit_count(col("sh_in").bitwiseXOR(col("sh_c"))) <= 3)
        .select("in_id", "corpus_id")
      val nM = matches.agg(count(lit(1)).as("n_match"))
      val nE = exact.agg(count(lit(1)).as("n_exact"))
      val nI = matches.join(exact, Seq("in_id", "corpus_id"))
        .agg(count(lit(1)).as("n_inter"))
      nM.crossJoin(nE).crossJoin(nI).select(
        (col("n_exact") > 0).as("nonempty"),
        (col("n_inter") === col("n_match")).as("subset_ok"),
        (col("n_inter") === col("n_exact")).as("recall_ok"))
    },
    // X3 near-dup: exact cosine pairs at a dedup-grade threshold.
    "dedup_embedding_cosine" -> { (s, dir) =>
      SimSearch.cosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding", 0.45)
    },
    // X3 search: threshold similarity join (exact baseline path).
    "similarity_threshold" -> { (s, dir) =>
      SimSearch.cosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding", 0.4)
    },
    // X3 top-k: brute-force ranked neighbors (WindowGroupLimit top-k).
    "similarity_topk" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      SimSearch.topKBruteForce(e.filter(col("vec_id") < 100), e, "vec_id", "embedding", 3)
        .select("id_q", "neighbor_id", "rank")
    },
    // X3 ANN: random-hyperplane LSH buckets, exact scoring of
    // bucket-mates. Recall < 1 by construction, so the ranked listing
    // has no SQL oracle; the query instead pins recall@3 against the
    // in-engine exact top-k on the deterministic vec_id < 100 query
    // subset (whose exact count the oracle CAN compute — same SQL as
    // similarity_topk's). 32 bands x 4 bits (not the 16x6 default): the
    // fixture embeddings are near-orthogonal, so top-3 neighbors sit at
    // low cosine where 6-bit bands collide too rarely (recall 0.57-0.62
    // measured); 4-bit bands recall 0.99-1.00 at both SFs at the same
    // cost. recall_ok bound 0.9 leaves ~0.09 margin.
    "similarity_ann_topk" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      // rank only the verdict's query subset: the id_q predicate pushes
      // through the window (partition-key filter) into the scoring
      // joins, pruning ~95% of the ranking rows; the LSH index build is
      // unchanged. Median 1.9 -> 1.5 s at sf0.1 (same query-batch
      // economics as similarity_ivf_topk, smaller win because the index
      // build dominates this query).
      val ann = SimSearch.annTopK(e, "vec_id", "embedding", 3,
          numBands = 32, bitsPerBand = 4)
        .filter(col("id_q") < 100)
        .select(col("id_q"), col("neighbor_id"))
      val exact = SimSearch
        .topKBruteForce(e.filter(col("vec_id") < 100), e, "vec_id", "embedding", 3)
        .select(col("id_q"), col("neighbor_id"))
      val nE = exact.agg(count(lit(1)).as("n_exact"))
      val nH = ann.join(exact, Seq("id_q", "neighbor_id"))
        .agg(count(lit(1)).as("n_hit"))
      nE.crossJoin(nH).select(
        col("n_exact"),
        (col("n_hit").cast("double") >= col("n_exact") * 0.9).as("recall_ok"))
    },
    // X4: per-language corpus stats.
    "text_stats_by_lang" -> { (s, dir) =>
      TextStats.statsByLang(Tables.documents(s, dir), "lang", "text")
    },
    // X4: token totals per source (whitespace tokenizer).
    "text_token_counts" -> { (s, dir) =>
      Tables.documents(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextStats.tokenCount(col("text"))).as("n_tokens"))
    },
    // X4: heuristic language ID (stopword-hit argmax).
    "text_langid" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextStats.langId(col("text")).as("lang_pred"))
    },
    // X4: content fingerprint (md5 exact-dup key).
    "text_fingerprint" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
    }
  )

  def oracleSql: Map[String, String] = {
    val jaccardSql = (threshold: String, where: String) =>
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, unnest($TokensSql) AS tok FROM documents $where),
         |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, round(i / (sa.n + sb.n - i), 6) AS jaccard
         |FROM inter
         |JOIN sz sa ON sa.doc_id = id_a
         |JOIN sz sb ON sb.doc_id = id_b
         |WHERE i / (sa.n + sb.n - i) >= $threshold""".stripMargin
    Map(
      "dedup_exact" ->
        "SELECT min(doc_id) AS kept_doc_id, count(*) AS n_copies FROM documents GROUP BY text",
      // The simhash sketch is engine-internal (custom Catalyst
      // expression), so the oracle pins the engine's self-check verdicts:
      // the query computes subset/recall against the in-engine exact
      // Hamming join and must report all-true.
      "dedup_simhash" ->
        "SELECT true AS nonempty, true AS subset_ok, true AS recall_ok",
      // ingest-dedup twin: subset and recall are exact equalities (no
      // skew cap on this path; pigeonhole covers every in-ball pair)
      "dedup_stream_ingest" ->
        "SELECT true AS nonempty, true AS subset_ok, true AS recall_ok",
      // ANN recall check: the exact-side count is genuinely
      // oracle-computed (same ranking SQL as similarity_topk); the
      // recall verdict must be true.
      "similarity_ann_topk" ->
        """WITH s AS (
          |  SELECT q.vec_id AS id_q, c.vec_id AS neighbor_id,
          |         round(list_cosine_similarity(q.embedding, c.embedding), 6) AS cos
          |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
          |  WHERE q.vec_id < 100)
          |SELECT count(*) AS n_exact, true AS recall_ok FROM (
          |  SELECT row_number() OVER (PARTITION BY id_q
          |           ORDER BY cos DESC, neighbor_id) AS rank
          |  FROM s)
          |WHERE rank <= 3""".stripMargin,
      "dedup_ngram_jaccard" -> jaccardSql("0.95", ""),
      "dedup_minhash" -> jaccardSql("0.9", ""),
      // same oracle as dedup_minhash restricted to the certification
      // prefix: the forced-LSH path must produce the identical
      // exact-verified pair relation
      "dedup_minhash_lsh" -> jaccardSql("0.9", "WHERE doc_id < 1000"),
      "dedup_embedding_cosine" ->
        """SELECT a.vec_id AS id_a, b.vec_id AS id_b
          |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45""".stripMargin,
      "similarity_threshold" ->
        """SELECT a.vec_id AS id_a, b.vec_id AS id_b
          |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4""".stripMargin,
      "similarity_topk" ->
        """WITH s AS (
          |  SELECT q.vec_id AS id_q, c.vec_id AS neighbor_id,
          |         round(list_cosine_similarity(q.embedding, c.embedding), 6) AS cos
          |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
          |  WHERE q.vec_id < 100)
          |SELECT id_q, neighbor_id, rank FROM (
          |  SELECT id_q, neighbor_id,
          |         row_number() OVER (PARTITION BY id_q
          |           ORDER BY cos DESC, neighbor_id) AS rank
          |  FROM s)
          |WHERE rank <= 3""".stripMargin,
      "text_stats_by_lang" ->
        s"""WITH t AS (SELECT lang, n_chars, $TokensSql AS toks FROM documents),
           |q AS (SELECT lang, n_chars, len(toks) AS n,
           |  CASE WHEN len(toks) > 0
           |       THEN list_sum(list_transform(toks, x -> len(x))) / len(toks)
           |       ELSE 0.0 END AS avg_len,
           |  CASE WHEN len(toks) > 0
           |       THEN len(list_filter(toks, x -> list_contains(
           |            ['the','of','and','to','in','is','a','on','for','with'], x))) / len(toks)
           |       ELSE 0.0 END AS sw_ratio
           |  FROM t)
           |SELECT lang, count(*) AS n_docs,
           |       round(avg(n_chars), 2) AS avg_chars,
           |       round(avg(n), 2) AS avg_tokens,
           |       round(avg(floor((
           |         0.4 * least(1.0, n / 100.0) +
           |         0.3 * sw_ratio +
           |         0.3 * least(1.0, avg_len / 8.0)) * 1e6 + 0.5) / 1e6), 6) AS avg_quality
           |FROM q GROUP BY 1""".stripMargin,
      "text_token_counts" ->
        s"""SELECT source, count(*) AS n_docs,
           |       CAST(sum(len($TokensSql)) AS BIGINT) AS n_tokens
           |FROM documents GROUP BY 1""".stripMargin,
      "text_langid" ->
        s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
           |s AS (SELECT doc_id,
           |  len(list_filter(toks, x -> list_contains(['the','of','and','to','in','is','a','on','for','with'], x))) AS s_en,
           |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], x))) AS s_de,
           |  len(list_filter(toks, x -> list_contains(['el','la','que','los','una','por','como'], x))) AS s_es,
           |  len(list_filter(toks, x -> list_contains(['le','les','des','est','dans','pour','une'], x))) AS s_fr
           |  FROM t)
           |SELECT doc_id, CASE
           |  WHEN s_en > 0 AND s_en >= greatest(s_en, s_de, s_es, s_fr) THEN 'en'
           |  WHEN s_de > 0 AND s_de >= greatest(s_en, s_de, s_es, s_fr) THEN 'de'
           |  WHEN s_es > 0 AND s_es >= greatest(s_en, s_de, s_es, s_fr) THEN 'es'
           |  WHEN s_fr > 0 AND s_fr >= greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
           |  ELSE 'und' END AS lang_pred
           |FROM s""".stripMargin,
      "text_fingerprint" ->
        "SELECT doc_id, md5(text) AS fp FROM documents"
    )
  }
}
