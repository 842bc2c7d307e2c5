package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus amplification (round-6 verdict ask #1): build an
  * N×-volume view of a fixture table as a union of id-offset copies —
  * pure column arithmetic, no test-data regeneration, reproducible in
  * any engine. The scale-stress harness (tools/Stress, ScaleStressSpec,
  * STRESS.md) runs the forced 100 TB code paths on these views to turn
  * "would hold at scale" from extrapolation into measurement.
  *
  * Two text modes, because scaling VOLUME and scaling DENSITY are
  * different experiments:
  *  - [[documentsDisjoint]] suffixes every token with the copy index —
  *    copies share no vocabulary, so per-token document frequency, LSH
  *    bucket sizes, and near-dup cluster sizes all stay at their 1×
  *    values while row count grows ×n. This models a growing real
  *    corpus (density roughly constant) and is the mode under which
  *    "work scales linearly, s/row flat" is the correct expectation.
  *  - [[documentsSalted]] appends one copy-unique salt token — copies
  *    keep the fixture's vocabulary, so a near-dup cluster of size s
  *    becomes one cross-copy cluster of size ≈ n·s. This is the
  *    adversarial density mode: it stresses the connected-components
  *    loop with mega-components and the banding join with hot buckets
  *    (where the skew cap and drop audit earn their keep).
  */
object Amplify {

  /** Default id spacing between copies — far above any fixture id. */
  val IdOffset = 1000000000L

  /** n id-offset copies, vocabulary-disjoint (token "w" → "w_ck").
    * EVERY copy is suffixed, including copy 0: leaving copy 0 raw would
    * let a fixture token that already ends in "_c1" collide with copy
    * 1's suffixed form and silently break the disjointness invariant
    * ScaleStressSpec pins (the uniform rename keeps copy 0's pair
    * structure identical to the unsuffixed corpus — tokens are renamed
    * 1:1).
    */
  def documentsDisjoint(docs: DataFrame, n: Int, idOffset: Long = IdOffset): DataFrame =
    (0 until n).map { k =>
      docs.select(
        (col("doc_id") + lit(k * idOffset)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1_c$k").as("text"),
        col("lang"))
    }.reduce(_ unionByName _)

  /** n id-offset copies, shared vocabulary + per-copy salt token (every
    * copy salted, so cross-copy similarity is symmetric: any two copies
    * of a doc differ by exactly their two salt tokens).
    */
  def documentsSalted(docs: DataFrame, n: Int, idOffset: Long = IdOffset): DataFrame =
    (0 until n).map { k =>
      docs.select(
        (col("doc_id") + lit(k * idOffset)).as("doc_id"),
        concat(col("text"), lit(s" zzsalt$k")).as("text"),
        col("lang"))
    }.reduce(_ unionByName _)

  /** n user- and event-id-offset copies of the events table (timestamps
    * unchanged: n× the users over the same calendar — how traffic
    * actually grows).
    */
  def events(ev: DataFrame, n: Int, idOffset: Long = IdOffset): DataFrame =
    (0 until n).map { k =>
      ev.select(
        (col("event_id") + lit(k * idOffset)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k * idOffset)).as("user_id"),
        col("event_type"), col("value"))
    }.reduce(_ unionByName _)

  /** [[events]] ×n with a deterministic HOT KEY: after amplification,
    * every event whose BASE id falls in the lowest `hotPermille` ‰
    * residues is remapped to user −1 (no fixture user is negative), so
    * ONE user owns ~hotPermille/1000 of the whole amplified stream —
    * across every copy, every chunk, the full calendar. This is the
    * skew shape the uniform amp sweep can never produce: a per-user
    * stateful operator must funnel that user's entire per-trigger slice
    * through a single task.
    */
  def eventsHotKey(ev: DataFrame, n: Int, hotPermille: Int,
      idOffset: Long = IdOffset): DataFrame =
    events(ev, n, idOffset).withColumn("user_id",
      when(pmod(col("event_id") % lit(idOffset), lit(1000)) < hotPermille,
        lit(-1L)).otherwise(col("user_id")))
}
