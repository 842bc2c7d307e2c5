package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Dated-partition fingerprint store lifecycle: the layout the scaladoc
  * promises must actually land on disk, prior partitions must survive
  * appends untouched, dedupAgainstStore must read the partitioned layout,
  * and date-scoped audits must prune via PartitionFilters.
  */
class DedupStoreSpec extends SparkFunSuite {
  import spark.implicits._

  private def freshStore(): String =
    java.nio.file.Files.createTempDirectory("fp_store").toString + "/fp"

  test("appendFingerprints lands dated partition directories, append-only") {
    val store = freshStore()
    Dedup.appendFingerprints(Seq((1L, "aa"), (2L, "bb"), (3L, "aa"))
      .toDF("doc_id", "text"), "text", store, "2024-01-01")
    val d1Files = new java.io.File(s"$store/ingest_date=2024-01-01")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    Dedup.appendFingerprints(Seq((4L, "cc")).toDF("doc_id", "text"),
      "text", store, "2024-01-02")
    val dirs = new java.io.File(store).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("ingest_date=2024-01-01", "ingest_date=2024-01-02"))
    // the first partition's files are byte-identical after the append
    val d1After = new java.io.File(s"$store/ingest_date=2024-01-01")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(d1After == d1Files, "append must not rewrite prior partitions")
    // within-batch duplicate text stored once; read-back sees 3 distinct fps
    assert(spark.read.parquet(store).select("fp").distinct().count() == 3)
  }

  test("dedupAgainstStore reads the partitioned layout; audits prune by date") {
    val store = freshStore()
    Dedup.appendFingerprints(Seq((1L, "aa")).toDF("doc_id", "text"),
      "text", store, "2024-01-01")
    Dedup.appendFingerprints(Seq((2L, "bb")).toDF("doc_id", "text"),
      "text", store, "2024-01-02")
    val batch = Seq((10L, "aa"), (11L, "bb"), (12L, "zz")).toDF("doc_id", "text")
    val surv = Dedup.dedupAgainstStore(spark, batch, "text", store)
      .select("doc_id").as[Long].collect().toSet
    assert(surv == Set(12L))
    // a date-scoped audit resolves against directory metadata
    val p = spark.read.parquet(store)
      .filter(col("ingest_date") === "2024-01-01")
      .queryExecution.explainString(FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*ingest_date".r.findFirstIn(p).isDefined, p)
    assert(!"PushedFilters: \\[[^\\]]*ingest_date".r.findFirstIn(p).isDefined, p)
  }

  test("two-cycle lifecycle: cycle-2 survivors append, cycle 3 sees both") {
    val store = freshStore()
    // cycle 1 accepts {aa, bb}
    Dedup.appendFingerprints(Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text"),
      "text", store, "2024-01-01")
    // cycle 2: bb is a dup, cc survives and is appended
    val s2 = Dedup.dedupAgainstStore(spark,
      Seq((3L, "bb"), (4L, "cc")).toDF("doc_id", "text"), "text", store)
    assert(s2.select("doc_id").as[Long].collect().toSet == Set(4L))
    Dedup.appendFingerprints(s2, "text", store, "2024-01-02")
    // cycle 3 is deduped against BOTH partitions: aa (cycle 1) and cc
    // (cycle 2) are dups, dd survives
    val s3 = Dedup.dedupAgainstStore(spark,
      Seq((5L, "aa"), (6L, "cc"), (7L, "dd")).toDF("doc_id", "text"), "text", store)
    assert(s3.select("doc_id").as[Long].collect().toSet == Set(7L))
  }
}
