package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's full job, end-to-end (SURVEY.md §3.1 + §3.2):
  * UC#1 row-count reconciliation feeding UC#2 sampled integrity checks,
  * with the three CSV reports.
  *
  * Reference shape: ~2 + 4·T + 2·P sequential `hive` CLI forks plus
  * driver-side diff/grep/md5sum over text files
  * (verizon_automation_script.sh:90-255). Engine shape: two grouped
  * aggregations (one per side), one full outer join, one digest join —
  * a fixed number of Spark jobs regardless of table/partition count, and
  * only count/digest records (never row data) ever leave the executors.
  *
  * @param tables (name, partitionColumns) — empty partitionColumns means
  *               whole-table reconciliation, like the reference's
  *               unpartitioned branch (:213).
  */
class ReconcilePipeline(
    spark: SparkSession,
    srcDir: String,
    tgtDir: String,
    tables: Seq[(String, Seq[String])],
    sampleSize: Int = 10) {

  /** UC#1: per-(table, partition) count reconciliation report. */
  lazy val report: DataFrame = {
    val src = PartitionCounts.forTables(spark, srcDir, tables)
    val tgt = PartitionCounts.forTables(spark, tgtDir, tables)
    CacheScope.cached(Reconcile.counts(src, tgt)) // reused by three report sinks + UC#2
  }

  /** UC#2: for tables whose counts matched, compare content digests.
    * The reference hashes a 10-row sample per matched (table, partition)
    * (verizon_automation_script.sh:219-243); here each matched table gets
    * a per-partition digest comparison in one job per table — and the
    * digest covers ALL rows, not a 10-row sample, because a distributed
    * fingerprint costs one scan either way. `sampleSize` is kept for the
    * faithful sampled variant.
    */
  def integrity(sampled: Boolean = false): DataFrame = {
    val matchedTables = Reconcile.matched(report)
      .select("table").distinct().collect().map(_.getString(0)) // ≤ T rows
    val checks = tables.filter { case (n, _) => matchedTables.contains(n) }
      .map { case (name, partCols) =>
        val s = Tables.load(spark, srcDir, name)
        val t = Tables.load(spark, tgtDir, name)
        val (sv, tv) =
          if (!sampled) (s, t)
          else (Sample.limitN(s, sampleSize), Sample.limitN(t, sampleSize))
        val cmp =
          if (partCols.nonEmpty) {
            val spec = concat_ws("/",
              partCols.map(c => concat_ws("=", lit(c), col(c).cast("string"))): _*)
            Fingerprint.compare(sv, tv, partCols)
              .select(lit(name).as("table"), spec.as("partition"),
                col("src_cnt"), col("tgt_cnt"), col("consistent"))
          } else {
            val sd = Fingerprint.table(sv, name)
              .select(col("table"), col("cnt").as("src_cnt"), col("digest").as("src_digest"))
            val td = Fingerprint.table(tv, name)
              .select(col("table"), col("cnt").as("tgt_cnt"), col("digest").as("tgt_digest"))
            sd.join(td, Seq("table"), "full_outer")
              .select(col("table"), lit(null).cast("string").as("partition"),
                col("src_cnt"), col("tgt_cnt"),
                (col("src_digest") <=> col("tgt_digest")).as("consistent"))
          }
        cmp
      }
    if (checks.isEmpty) emptyIntegrity else checks.reduce(_ unionByName _)
  }

  private def emptyIntegrity: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Long, Long, Boolean)]
      .toDF("table", "partition", "src_cnt", "tgt_cnt", "consistent")
  }

  /** Write the reference's three reports (K2): MatchedData,
    * TableMismatchedData, TableDataNotConsistent.
    */
  def writeReports(outDir: String): Unit = {
    Reports.writeCsv(Reconcile.matched(report), s"$outDir/MatchedData")
    Reports.writeCsv(Reconcile.mismatched(report), s"$outDir/TableMismatchedData")
    Reports.writeCsv(integrity().filter(!col("consistent")),
      s"$outDir/TableDataNotConsistent")
  }
}
