package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string transforms T1–T7 (SURVEY.md §2a).
  *
  * The reference implements these with sed/awk over report files
  * (verizon_automation_script.sh:114,164-182,253-254). With typed columns
  * most become unnecessary at the engine layer — they exist as tested,
  * codegen-friendly Column helpers for the report edge and for fidelity
  * tests.
  */
object Transforms {

  /** T1: strip carriage returns (`sed "s/\r//g"`). */
  def stripCr(c: Column): Column = regexp_replace(c, "\r", "")

  /** T2: whitespace runs → comma (`sed 's/ \+/,/g'`). */
  def spacesToComma(c: Column): Column = regexp_replace(c, " +", ",")

  /** T3: colon runs → comma (`sed 's/:\+/,/g'`). */
  def colonsToComma(c: Column): Column = regexp_replace(c, ":+", ",")

  /** T4: wrap in single quotes (`sed "s/^/'/;s/$/'/"`). The reference uses
    * this to splice partition values into HiveQL text — a SQL-injection
    * hole this engine closes by never building SQL strings (predicates are
    * `col(k) === lit(v)`); kept for report-fidelity only.
    */
  def quoteWrap(c: Column): Column = concat(lit("'"), c, lit("'"))

  /** T5: remove the FIRST pipe only (`sed -i 's/\|//'` — unanchored,
    * first-match-per-line).
    */
  def stripFirstPipe(c: Column): Column = regexp_replace(c, "^([^|]*)\\|", "$1")

  /** T7: key=value rendering used for partition specs. */
  def kv(key: Column, value: Column): Column = concat(key, lit("="), value)
}
