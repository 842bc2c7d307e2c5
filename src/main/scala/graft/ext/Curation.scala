package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.CacheScope

/** Corpus-curation stages of a training-data pipeline (SURVEY.md §2b
  * north star, round-4 X7): benchmark-contamination screening, TF-IDF
  * term profiling, deterministic splitting/sampling, and context-window
  * token packing. These sit around the dedup ([[Dedup]]) and similarity
  * ([[SimSearch]]) cores in a real data-curation DAG.
  *
  * Determinism policy: every "random" choice (split membership, sample
  * order, packing order) is keyed on `md5` of the id column — stable
  * across runs, engines, partitionings, and cluster sizes, unlike a
  * seeded `rand()` whose draw order is partition-dependent.
  *
  * Scale notes (100 TB posture):
  *  - [[contaminationScreen]] broadcasts the BENCHMARK shingle set
  *    (benchmarks are small by construction); the corpus side streams
  *    map-side through the join — no corpus shuffle until the rollup.
  *  - [[trainTestSplit]] is a map-only column; [[stratifiedSample]]
  *    plans as WindowGroupLimit (k rows survive per partition, not the
  *    stratum); [[packTokenBudget]] windows are partitioned by a hash
  *    bucket — parallel, never a global sort.
  */
object Curation {

  /** md5 hex of an id column — the deterministic "random" key. */
  def detHash(id: Column): Column = md5(id.cast("string"))

  /** Docs sharing at least one word n-gram with a benchmark corpus:
    * (idCol, n_shared) — the decontamination pre-filter applied before
    * a corpus is trained on. `bench` should be the held-out benchmark
    * text table; its distinct shingle set is broadcast.
    */
  def contaminationScreen(
      docs: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      /** Extra doc columns carried through to the output (rides the
        * per-shingle rows — keep it to small attributes).
        */
      carry: Seq[String] = Nil): DataFrame = {
    val bsh = bench
      .select(explode(Text.shingleSet(col(textCol), n)).as("sh")).distinct()
    docs.select(col(idCol) +: carry.map(col) :+
        explode(Text.shingleSet(col(textCol), n)).as("sh"): _*)
      .join(broadcast(bsh), Seq("sh"))
      .groupBy(col(idCol) +: carry.map(col): _*)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-group top-k terms by TF-IDF: (groupCol, term, tfidf, rnk).
    * The idf is the log-free N/df variant — tf, N, df are exact
    * integers, so scores are bit-identical in every engine (ln()
    * last-ulp differences can flip ranks at tie boundaries).
    *
    * Cache lifecycle: the corpus is cached (three consumers: N, tf, df)
    * and stays cached until the caller's action completes — callers own
    * the flush (`spark.catalog.clearCache()`), as in [[Dedup]].
    */
  def tfidfTopTerms(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      k: Int = 3): DataFrame = {
    val d = CacheScope.cached(docs)
    val nDocs = d.count()
    val tf = d.select(col(groupCol), explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col(groupCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = d.select(col(idCol), explode(Text.tokenSet(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("tfidf",
        floor(col("tf") * (lit(nDocs.toDouble) / col("df")) * 1e6 + 0.5) / 1e6)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(groupCol), col("term"), col("tfidf"), col("rnk"))
  }

  /** Deterministic split column: 'train' when the first md5 hex byte of
    * the id sits under `trainFrac` of the 0x00-0xff range. Map-only.
    */
  def splitColumn(id: Column, trainFrac: Double = 0.8): Column = {
    // Degenerate fractions short-circuit: the hex-prefix comparison can
    // only express cuts at 1/256 granularity, so trainFrac >= 1 would
    // still route the 'ff' prefix (~1/256 of ids) to 'test'.
    if (trainFrac >= 1.0) lit("train")
    else if (trainFrac <= 0.0) lit("test")
    else {
      // floor, not round: 0.8 → 204 buckets of 256 → cut 'cc'
      val cut = f"${math.min(255, math.max(0, (trainFrac * 256).toInt))}%02x"
      when(substring(detHash(id), 1, 2) < cut, "train").otherwise("test")
    }
  }

  /** Corpus with a deterministic train/test split column attached. */
  def trainTestSplit(
      docs: DataFrame, idCol: String, trainFrac: Double = 0.8): DataFrame =
    docs.withColumn("split", splitColumn(col(idCol), trainFrac))

  /** k docs per stratum, chosen by md5 order: (idCol, stratumCol, rn).
    * Reproducible without a seed; plans as WindowGroupLimit.
    */
  def stratifiedSample(
      docs: DataFrame, idCol: String, stratumCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(detHash(col(idCol)), col(idCol))
    docs.select(col(idCol), col(stratumCol), row_number().over(w).as("rn"))
      .filter(col("rn") <= k)
  }

  /** Pack docs into ~`budget`-token shards: (idCol, bucket, shard).
    * Docs are dealt into `nBuckets` buckets by md5 of the id and cut by
    * cumulative token count within each bucket — the window is
    * bucket-partitioned, so packing is nBuckets-way parallel with no
    * global order. Size nBuckets to the corpus: each bucket's
    * cumulative-sum window runs on one task, so at 100 TB pick nBuckets
    * large enough that corpus_bytes / nBuckets fits a task comfortably
    * (the deal is uniform — md5 — so buckets stay balanced).
    *
    * The bucket id is the first 15 md5 hex chars parsed as an integer,
    * mod nBuckets — engine-independent (DuckDB: `('0x' || substr(h,1,15))
    * ::BIGINT % n`), unlike a seeded hash. Zero-token docs at a bucket
    * head land in shard 0 (`greatest(cum-1, 0)` — a raw cum=0 would
    * compute shard -1).
    */
  def packTokenBudget(
      docs: DataFrame, idCol: String, textCol: String,
      budget: Long = 2048L, nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val h = detHash(col(idCol))
    val bucket = pmod(conv(substring(col("h"), 1, 15), 16, 10).cast("long"),
      lit(nBuckets.toLong))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null text occupies no budget (coalesce, not null-cascade — a null
    // cum would silently route the doc into a null shard)
    docs.select(col(idCol),
        coalesce(size(Text.tokens(col(textCol))), lit(0))
          .cast("long").as("n_tok"), h.as("h"))
      .withColumn("bucket", bucket)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("shard",
        floor(greatest(col("cum") - 1, lit(0L)) / budget).cast("long"))
      .select(col(idCol), col("n_tok"), col("bucket"), col("shard"))
  }

  /** Shard manifest over [[packTokenBudget]] output (round-6 verdict ask
    * #6): one row per (bucket, shard) with a GLOBALLY unique dense shard
    * id and the totals a trainer's data loader reads — per-bucket shard
    * ids alone collide across buckets. The global id is a row_number
    * over (bucket, shard): an unpartitioned window, and deliberately so
    * — it runs over the POST-AGGREGATION manifest (one row per shard,
    * bounded by corpus_tokens / budget, not corpus rows), the same
    * "aggregate first, then a bounded global order is fine" shape as
    * orders_mom. Export it next to the shards and [[assignGlobalShards]]
    * maps docs to global ids with a broadcast join.
    */
  def shardManifest(packed: DataFrame): DataFrame = {
    val w = Window.orderBy(col("bucket"), col("shard"))
    packed.groupBy(col("bucket"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("global_shard", (row_number().over(w) - 1).cast("long"))
      .select(col("global_shard"), col("bucket"), col("shard"),
        col("n_docs"), col("n_tokens"))
  }

  /** Docs → globally unique shard id via the manifest (broadcast-sized:
    * one row per shard).
    */
  def assignGlobalShards(packed: DataFrame, manifest: DataFrame): DataFrame =
    packed.join(
        broadcast(manifest.select(col("bucket"), col("shard"), col("global_shard"))),
        Seq("bucket", "shard"))
      .select(packed.columns.map(col) :+ col("global_shard"): _*)
}
