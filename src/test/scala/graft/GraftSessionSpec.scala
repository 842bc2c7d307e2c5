package graft

class GraftSessionSpec extends SparkFunSuite {

  test("attach registers warehouse views queryable from SQL") {
    val views = GraftSession.attach(spark, sf001)
    assert(views.contains("lineitem") && views.contains("events"))
    val n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()(0).getLong(0)
    assert(n == 6000L)
    // events view carries the normalized (non-nanos) timestamp
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts")
      .dataType.typeName == "timestamp")
  }

  test("events loader normalizes ts to TimestampType regardless of fixture flavor") {
    // the driver has regenerated events.ts across rounds as
    // TIMESTAMP(NANOS) and TIMESTAMP_NTZ; every downstream consumer
    // (withWatermark, unix_micros, Row.getTimestamp) requires plain
    // TimestampType — pin the loader's normalization against the next
    // fixture drift
    val ts = core.Tables.events(spark, sf001).schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType, s"got $ts")
  }

  test("custom kernels are callable from SQL after configure") {
    GraftSession.configure(spark)
    val d = spark.sql(
      "SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 11.0)
    val f = spark.sql(
      "SELECT graft_first_equal_index(array(1L, 5L, 7L), array(2L, 5L, 7L)) AS i")
      .collect()(0).getInt(0)
    assert(f == 1)
  }
}
