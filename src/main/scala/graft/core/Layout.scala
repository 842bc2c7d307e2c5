package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan locality — the storage-side lever
  * that partition pruning can't provide when the filter column is too
  * high-cardinality to be a directory partition (user_id, order key).
  *
  * `clusterByRange` writes the table range-partitioned AND sorted on
  * the cluster columns, so each output file owns a contiguous key
  * range. A point/range predicate then (a) touches the few files whose
  * range overlaps — at 100 TB the difference between opening ~1 file
  * and opening every file of the table — and (b) inside each touched
  * file, parquet row-group min/max statistics (populated BECAUSE the
  * writer sorted) let the pushed-down predicate skip almost all pages.
  * Neither effect changes answers, so the certification is: clustered
  * read ≡ oracle, plus a measured files-touched gap vs the same data
  * written round-robin (see `layout_cluster_prune`).
  *
  * This is the one-column form of what lakehouse formats call
  * Z-ordering; for a single cluster key, plain range-sort IS the
  * optimal order (Z-curves only matter for multi-key tradeoffs).
  */
object Layout {

  /** Write `df` to `path` in `nFiles` range-partitioned, internally
    * sorted parquet files keyed on `cols`.
    */
  def clusterByRange(df: DataFrame, path: String, nFiles: Int,
                     cols: Column*): Unit =
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)

  /** Number of distinct files contributing rows to `df` — the measured
    * locality of a filtered read (a layout witness, not a row count).
    */
  def filesTouched(df: DataFrame): Long =
    df.select(input_file_name()).distinct().count()
}
