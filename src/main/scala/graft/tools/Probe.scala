package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the library surface). `sbt "runMain graft.tools.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Can a SECOND in-process HiveServer2 start on another port in the
    // same JVM? (dual-endpoint reconcile feasibility)
    import java.sql.DriverManager
    def freePort(): Int = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    def startOn(port: Int): Unit = {
      spark.conf.set("hive.server2.thrift.port", port.toString)
      spark.conf.set("hive.server2.thrift.bind.host", "localhost")
      org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
        .startWithContext(spark.sqlContext)
    }
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    def tryConnect(port: Int, label: String): Boolean = {
      val deadline = System.nanoTime() + 30L * 1000000000L
      var ok = false
      while (!ok && System.nanoTime() < deadline) {
        try {
          val c = DriverManager.getConnection(
            s"jdbc:hive2://localhost:$port/default", "graft", "graft")
          val st = c.createStatement()
          val rs = st.executeQuery("SELECT 41 + 1")
          rs.next()
          println(s"$label: port=$port query=${rs.getInt(1)}")
          c.close(); ok = true
        } catch { case _: Throwable => Thread.sleep(250) }
      }
      if (!ok) println(s"$label: port=$port FAILED to connect")
      ok
    }
    val p1 = freePort()
    startOn(p1)
    tryConnect(p1, "server1")
    val p2 = freePort()
    try {
      startOn(p2)
      tryConnect(p2, "server2")
      tryConnect(p1, "server1-after-second")
    } catch {
      case e: Throwable => println(s"second server start FAILED: $e")
    }
    spark.stop()
  }
}
