package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY.md §7.4 #5; 100 TB posture).
  *
  * A shuffled join on a key with hot values puts every row of a hot key
  * into one reducer task — the classic long-tail straggler at scale.
  * Two mitigations, complementary:
  *
  *  - AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  *    on by default): splits oversized partitions AFTER the shuffle when
  *    sizes are observed. Handles moderate skew transparently.
  *  - [[saltedJoin]]: explicit salting for extreme/known skew — the
  *    fact side spreads each hot key over `nSalts` sub-keys, the
  *    (smaller) other side replicates each row `nSalts` times. Total
  *    shuffle volume: fact unchanged, dim ×nSalts — a good trade when
  *    dim ≪ fact, which is when skew hurts most.
  *
  * The salt must be DETERMINISTIC (retried/speculated tasks must produce
  * the same salt for the same row, or the join drops/duplicates rows):
  * it is derived by hashing the fact row's full column set, never from
  * rand() or a partition-local counter.
  */
object Skew {

  /** Inner equi-join of `fact` (large, possibly skewed on `key`) with
    * `dim` (smaller), spreading each fact key over `nSalts` reducers.
    * Result is identical to `fact.join(dim, key)` — verified in
    * SkewSpec — with the hot-key work split nSalts ways.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(nSalts)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(typedLit((0 until nSalts).toArray)))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
