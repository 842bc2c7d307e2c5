package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Delimited-text scan and positional projection (SURVEY.md §2 S4/P1/T7).
  *
  * Replaces compare_tables.sh:3-9, which forks THREE awk subprocesses per
  * input row to split `|`-delimited lines into fields and re-emit them
  * space-separated. Here: one distributed scan, one codegen'd projection.
  *
  * Short rows (file.txt:1-2 have 1 field, :4 is empty) yield nulls for
  * missing fields — `get()` is used instead of `element_at` because the
  * latter throws on out-of-range under ANSI mode (Spark 4 default).
  */
object Delim {

  /** Read a delimited text file into (c1..cN) string columns. */
  def read(spark: SparkSession, path: String, delimiter: String = "|", nCols: Int = 3): DataFrame = {
    val schema = StructType((1 to nCols).map(i => StructField(s"c$i", StringType, nullable = true)))
    spark.read.option("delimiter", delimiter).schema(schema).csv(path)
  }

  /** Split an existing string column into positional fields c1..cN.
    * `awk -F\| '{print $N}'` semantics: missing fields → null.
    */
  def split3(line: Column, delimiter: String = "\\|", nCols: Int = 3): Seq[Column] = {
    val arr = split(line, delimiter)
    (0 until nCols).map(i => get(arr, lit(i)).as(s"c${i + 1}"))
  }

  /** The full compare_tables.sh pipeline over a string column: split into
    * 3 fields, re-project space-separated (`echo "$var1 $var2 $var3"`).
    * awk prints empty strings for missing fields, so nulls are rendered
    * as "" before the space-join (concat_ws would skip them and change
    * the spacing).
    */
  def scanAndProject(df: DataFrame, lineCol: String): DataFrame = {
    val fields = split3(col(lineCol))
    val rendered = fields.map(f => coalesce(f, lit("")))
    df.select(concat_ws(" ", rendered: _*).as("projected"))
  }
}
