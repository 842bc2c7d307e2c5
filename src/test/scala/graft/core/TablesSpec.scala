package graft.core

import org.apache.spark.sql.types._

import graft.SparkFunSuite

/** Fixture-drift tripwire. Round 8 went red because a driver-side
  * fixture regeneration silently changed events.ts's parquet flavor
  * (TIMESTAMP(NANOS) → TIMESTAMP_NTZ) and nothing pinned the loaded
  * schemas — the failure surfaced as 11 scattered analysis errors
  * instead of one named cause. This spec pins every table's loaded
  * (name, type) list, so the next regeneration that shifts a type
  * fails here first, naming the exact column.
  *
  * These are the LOADED types (post-normalization), not the raw
  * parquet types: events.ts must come out TimestampType whatever the
  * file stores; orders/lineitem date columns are read as-is (today's
  * fixtures store them TIMESTAMP_NTZ, which every consumer and oracle
  * handles — a drift to a new flavor should be a conscious decision
  * here, not a scattered breakage).
  */
class TablesSpec extends SparkFunSuite {

  private def loaded(name: String): Seq[(String, DataType)] =
    Tables.load(spark, sf001, name).schema.map(f => f.name -> f.dataType).toSeq

  test("dimension and fact table schemas match the fixture contract") {
    assert(loaded("region") == Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(loaded("nation") == Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assert(loaded("customer") == Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assert(loaded("supplier") == Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(loaded("part") == Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assert(loaded("orders") == Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
    assert(loaded("lineitem") == Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
  }

  test("pipeline table schemas match the fixture contract") {
    // events via the normalizing loader: ts MUST be TimestampType
    // regardless of the stored flavor
    assert(Tables.events(spark, sf001).schema
      .map(f => f.name -> f.dataType).toSeq == Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))
    assert(loaded("documents") == Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(loaded("embeddings") == Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }
}
