package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/** Remote-warehouse JDBC source — the last reference capability with no
  * engine path until round 13: the reference's job spec is two LIVE
  * warehouse connections (host/port/user/password per side,
  * `configuration.properties:2-8`, consumed by
  * `verizon_automation_script.sh:39-70`), not two directories. This
  * module gives the engine that front door:
  *
  *  - [[GraftHiveDialect]] — a `JdbcDialect` for `jdbc:hive2://`
  *    endpoints (HiveServer2 / Spark Thrift Server). Registration
  *    matters for CORRECTNESS, not just cosmetics: the default dialect
  *    quotes pushed-down identifiers with double quotes, which a
  *    SQL-warehouse endpoint parses as STRING LITERALS (so a pushed
  *    `WHERE "o_custkey" < 500` would be `WHERE 'o_custkey' < 500` —
  *    always-true garbage). Backtick quoting makes predicate pushdown
  *    sound, which is what keeps a 100 TB remote scan from shipping
  *    every row.
  *
  *  - [[ensureServer]] — an in-process HiveServer2 (Spark Thrift
  *    Server, `HiveThriftServer2.startWithContext`) so the JDBC path is
  *    exercised against a REAL network endpoint with host/port/user/
  *    password, offline and cluster-safe (executors connect over
  *    localhost TCP; nothing assumes shared JVM state). Tables are
  *    published as GLOBAL temp views — visible to every thrift session
  *    regardless of the server's session-isolation mode.
  *
  *  - [[readTable]] — the consumer side: `spark.read.jdbc` with
  *    stride partitioning (`partitionColumn`/`numPartitions`), so the
  *    remote scan lands as N parallel range-sliced queries instead of
  *    one single-threaded cursor — the difference between a nightly
  *    reconcile and a week-long one against a real warehouse.
  */
object JdbcWarehouse {

  /** Backtick-quoting dialect for HiveServer2-protocol endpoints. */
  object GraftHiveDialect extends JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:hive2")
    override def quoteIdentifier(colName: String): String =
      s"`${colName.replace("`", "``")}`"
  }

  @volatile private var registered = false
  private def registerDialect(): Unit = synchronized {
    if (!registered) { JdbcDialects.registerDialect(GraftHiveDialect); registered = true }
  }

  @volatile private var serverPort: Int = -1

  /** Start (once per JVM) the in-process HiveServer2 bound to a free
    * localhost port; returns the port. Idempotent and thread-safe; the
    * server lives for the JVM (the same lifecycle a real warehouse
    * endpoint has from the engine's point of view).
    */
  def ensureServer(spark: SparkSession): Int = synchronized {
    if (serverPort > 0) return serverPort
    registerDialect()
    val port = freePort()
    // conf reaches the server through the session's SQLConf → hadoopConf
    // propagation; bind explicitly to localhost (a test endpoint must
    // not listen on 0.0.0.0)
    spark.conf.set("hive.server2.thrift.port", port.toString)
    spark.conf.set("hive.server2.thrift.bind.host", "localhost")
    org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    awaitPort(port)
    serverPort = port
    port
  }

  private def freePort(): Int = {
    val ss = new java.net.ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }

  /** The thrift service binds asynchronously; poll until a JDBC
    * connection actually opens (bounded — a server that never comes up
    * must fail the query, not hang it).
    */
  private def awaitPort(port: Int, timeoutMs: Long = 30000): Unit = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var last: Throwable = null
    while (System.nanoTime() < deadline) {
      try {
        val c = DriverManager.getConnection(url(port), "graft", "graft")
        c.close(); return
      } catch {
        case e: Throwable => last = e; Thread.sleep(250)
      }
    }
    throw new IllegalStateException(
      s"thrift endpoint on port $port did not come up", last)
  }

  def url(port: Int): String = s"jdbc:hive2://localhost:$port/default"

  /** Publish a frame to the warehouse endpoint under `name` (a global
    * temp view — every thrift session resolves `global_temp.<name>`).
    */
  def publish(df: DataFrame, name: String): String = {
    df.createOrReplaceGlobalTempView(name)
    s"global_temp.$name"
  }

  /** Read `table` from the endpoint as a partitioned JDBC scan:
    * `numPartitions` range slices on `partitionColumn` between the
    * given bounds, each slice an independent remote query. user/
    * password mirror the reference's per-side connection spec
    * (`configuration.properties`: host, port, user, password).
    */
  def readTable(spark: SparkSession, port: Int, table: String,
                partitionColumn: String, lowerBound: Long, upperBound: Long,
                numPartitions: Int,
                user: String = "graft", password: String = "graft"): DataFrame = {
    registerDialect()
    spark.read.format("jdbc")
      .option("url", url(port))
      .option("driver", "org.apache.hive.jdbc.HiveDriver")
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()
  }
}
