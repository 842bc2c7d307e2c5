package graft

import org.apache.spark.sql.SparkSession

import graft.core.Tables
import graft.functions.GraftFunctions

/** Library front door: one call gives a session with the engine's
  * recommended runtime settings, the custom Catalyst functions
  * registered (usable from SQL as `graft_dot`, `graft_minhash_sig`,
  * `graft_simhash64`, `graft_sorted_intersect_count`,
  * `graft_first_equal_index`, `graft_rhp_sig`), and — optionally — a
  * warehouse directory attached as queryable views.
  *
  * A user of the reference runs `configuration.properties` through
  * `config.JobConfig` and `core.ReconcilePipeline`; a SQL user attaches
  * a warehouse and writes `spark.sql` against the views; a DataFrame
  * user calls the operator objects directly. All three share this
  * session setup.
  */
object GraftSession {

  /** Build a new session with the engine's recommended configuration.
    * `cores` sizes both the local master and shuffle parallelism —
    * on a real cluster pass a master URL instead and size
    * `spark.sql.shuffle.partitions` to the cluster (2–3× total cores).
    */
  def create(master: String = "local[*]", shufflePartitions: Int = 0): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      // nanosecond parquet timestamps arrive as long micros-convertible
      // values instead of failing the read (see core.Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
    val withShuffle =
      if (shufflePartitions > 0)
        b.config("spark.sql.shuffle.partitions", shufflePartitions)
      else b
    configure(withShuffle.getOrCreate())
  }

  /** Register the engine's custom functions on an existing session and
    * return it (idempotent).
    */
  def configure(spark: SparkSession): SparkSession = {
    GraftFunctions.register(spark)
    spark
  }

  /** Attach every known table found under `dir` as a temp view (events
    * gets its timestamp normalization), so `spark.sql` works against the
    * warehouse exactly like the reference's Hive database. Returns the
    * view names created.
    */
  def attach(spark: SparkSession, dir: String): Seq[String] = {
    configure(spark)
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.filter { n =>
      val f = new java.io.File(s"$dir/$n.parquet")
      if (!f.exists()) false
      else {
        (if (n == "events") Tables.events(spark, dir)
         else Tables.load(spark, dir, n)).createOrReplaceTempView(n)
        true
      }
    }
  }
}
