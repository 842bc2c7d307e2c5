package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: co-located joins without a shuffle
  * (100 TB posture — SURVEY.md §7.4 #5).
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key means every subsequent join between them is a zip of
  * matching buckets: no Exchange in the plan at all. At 100 TB this
  * converts the single largest cost of a fact-fact join (shuffling both
  * inputs) into a one-time layout cost at write time — the right call
  * for any join executed more than once.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table in the
    * session catalog. Overwrites both the catalog entry AND any orphaned
    * warehouse directory from a previous session — with a non-persistent
    * (in-memory) catalog, SaveMode.Overwrite alone throws
    * LOCATION_ALREADY_EXISTS when the location survived a restart the
    * catalog entry didn't.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two identically-bucketed tables on their bucket key. With
    * matching bucket counts Catalyst plans a sort-merge join with NO
    * shuffle on either side (asserted in BucketingSpec).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
