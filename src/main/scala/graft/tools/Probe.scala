package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the verified surface).
  *
  * Current probe: graft-delim connector vs Spark CSV at sf0.1 on a
  * 16-column lineitem text corpus — (a) selective filter + narrow
  * projection (pushdown + pruned parse), (b) full-width scan, (c) the
  * early-column projection where the pruned parse stops at field 2.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val out = java.nio.file.Files.createTempDirectory("delimbench").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val cols = li.columns
    println(s"cols=${cols.mkString(",")} rows=${li.count()}")
    li.select(concat_ws("|", cols.map(c => col(c).cast("string")): _*).as("line"))
      .write.mode("overwrite").text(s"$out/li")
    val schemaDdl = cols.map { c =>
      val dt = li.schema(c).dataType.typeName match {
        case "long" => "BIGINT"
        case "double" => "DOUBLE"
        case _ => "STRING"
      }
      s"$c $dt"
    }.mkString(", ")

    def mine = spark.read.format("graft-delim").schema(schemaDdl).load(s"$out/li")
    def csv = spark.read.schema(schemaDdl).option("delimiter", "|").csv(s"$out/li")

    def time(label: String, reps: Int = 3)(body: => Long): Unit =
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = body
        println(f"TIME|$label|rep$i|rows=$n|secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      }

    // (a) selective filter + 2-col agg: pushdown + pruning both fire
    def narrow(df: org.apache.spark.sql.DataFrame): Long =
      df.filter($"l_quantity" > 49.0)
        .groupBy($"l_returnflag").agg(sum($"l_extendedprice")).count()
    // (b) full-width: every field parsed both ways
    def full(df: org.apache.spark.sql.DataFrame): Long = df.count()
    // (c) early-column projection: parse stops at field index 1
    def early(df: org.apache.spark.sql.DataFrame): Long =
      df.select($"l_orderkey").filter($"l_orderkey" % 1000 === 0).count()

    narrow(mine); narrow(csv) // warm JIT + page cache
    time("narrow_graft")(narrow(mine))
    time("narrow_csv")(narrow(csv))
    time("full_graft")(full(mine))
    time("full_csv")(full(csv))
    time("early_graft")(early(mine))
    time("early_csv")(early(csv))
    graft.core.Scratch.rmTree(out)
    spark.stop()
  }
}
