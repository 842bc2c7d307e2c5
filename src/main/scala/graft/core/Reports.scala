package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** CSV report sinks (SURVEY.md §2 K2/K3/K4).
  *
  * The reference builds its three reports by sed-injecting literal header
  * rows and normalizing delimiters in text files
  * (verizon_automation_script.sh:170-182,251-254). Here a report is a
  * DataFrame written as real CSV with a header row; `SaveMode.Overwrite`
  * reproduces the reference's rm-rf-then-mkdir workspace lifecycle (:24-36)
  * and `INSERT OVERWRITE` semantics (:219).
  *
  * `singleFile = true` coalesces to one partition — matching the
  * reference's single-file reports; report relations are tiny (per-table /
  * per-partition records), so a single writer task is fine even when the
  * inputs were 100 TB. Leave it false for large exports.
  */
object Reports {

  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** K3: sampled table export — `INSERT OVERWRITE LOCAL DIRECTORY ...
    * SELECT * from t [where p] limit n` (verizon_automation_script.sh:219-233),
    * with the deterministic-sample fix (SURVEY.md §7.4 #1).
    */
  def sampledExport(df: DataFrame, path: String, n: Int): Unit =
    writeCsv(Sample.limitN(df, n), path)
}
