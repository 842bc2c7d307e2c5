package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stored MAINTENANCE procedures for graft-delim tables (`CALL
  * graft_cat.system.<proc>(...)` through Spark 4's connector
  * procedure API). Each is the SQL front door over an existing
  * table-format operation, so the reference's nightly-cron shell
  * loops (verizon_automation_script.sh:24-36) become one schedulable
  * statement; results come back as ONE summary row (a LocalScan), the
  * Iceberg `CALL` convention.
  *
  *  - `optimize(table, target_file_size, min_files)` — size-targeted
  *    bin-packed compaction (DelimCompact); 0 = whole-group merge.
  *  - `expire_snapshots(table, retain)` — tighten the retention
  *    window: commit a generation with the new policy, drop expired
  *    versioned manifests, and sweep data files no retained snapshot
  *    references.
  *  - `recover_manifest(table)` — roll a crashed commit's claimed
  *    generation forward (DelimV2.recoverManifest).
  */
private[v2] object GraftProcedures {

  val byName: Map[String, GraftCatalog => UnboundProcedure] = Map(
    "optimize" -> (cat => new OptimizeProcedure(cat)),
    "expire_snapshots" -> (cat => new ExpireSnapshotsProcedure(cat)),
    "recover_manifest" -> (cat => new RecoverManifestProcedure(cat)),
    "snapshots" -> (cat => new SnapshotsProcedure(cat)))

  /** One-row result relation for a maintenance call. */
  private[v2] final case class SummaryScan(
      schema: StructType, row: Array[Any]) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] =
      Array(new GenericInternalRow(row))
  }

  /** Multi-row result relation (snapshot history). */
  private[v2] final case class RowsScan(
      schema: StructType, data: Seq[Array[Any]]) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] =
      data.map(r => new GenericInternalRow(r): InternalRow).toArray
  }

  private[v2] def param(name: String, dt: DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  private[v2] def single(scan: Scan): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(scan).iterator()
}

private[v2] abstract class GraftProcedure(procName: String)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = procName
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // side-effecting maintenance
}

private[v2] class OptimizeProcedure(cat: GraftCatalog)
    extends GraftProcedure("optimize") {

  override def parameters(): Array[ProcedureParameter] = Array(
    GraftProcedures.param("table", StringType),
    GraftProcedures.param("target_file_size", LongType, Some("0")),
    GraftProcedures.param("min_files", IntegerType, Some("2")))

  override def description(): String =
    "Compact a graft-delim table's small files into size-targeted bins " +
      "(target_file_size=0 merges each (partition, layout) group whole)"

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val root = cat.tableRootOf(input.getUTF8String(0).toString)
    val target = if (input.isNullAt(1)) 0L else input.getLong(1)
    val minFiles = if (input.isNullAt(2)) 2 else input.getInt(2)
    val fs = root.getFileSystem(DelimV2.driverConf())
    val before = DelimV2.readManifest(fs, root).map(_.files.size).getOrElse(0)
    val gen = DelimCompact.compact(SparkSession.active, root.toString,
      minFilesPerGroup = minFiles, targetFileSize = target)
    val after = DelimV2.readManifest(fs, root).map(_.files.size).getOrElse(0)
    GraftProcedures.single(GraftProcedures.SummaryScan(
      StructType.fromDDL(
        "generation BIGINT, files_before INT, files_after INT"),
      Array(gen, before, after)))
  }
}

private[v2] class ExpireSnapshotsProcedure(cat: GraftCatalog)
    extends GraftProcedure("expire_snapshots") {

  override def parameters(): Array[ProcedureParameter] = Array(
    GraftProcedures.param("table", StringType),
    GraftProcedures.param("retain", IntegerType, Some("1")))

  override def description(): String =
    "Tighten a graft-delim table's snapshot retention: keep `retain` " +
      "generations, drop expired versioned manifests, sweep unreferenced files"

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val root = cat.tableRootOf(input.getUTF8String(0).toString)
    val retain = if (input.isNullAt(1)) 1 else input.getInt(1)
    require(retain >= 1,
      s"graft-delim: expire_snapshots retain must be >= 1, got $retain")
    val fs = root.getFileSystem(DelimV2.driverConf())
    val m = DelimV2.readManifest(fs, root).getOrElse(
      throw new IllegalArgumentException(
        s"graft-delim: no committed manifest at $root"))
    // the same files under a new generation with the new policy;
    // commitManifest prunes expired manifests and returns the
    // must-not-delete set, and the static-overwrite sweeper deletes
    // everything outside it (crash orphans included)
    val live = DelimV2.commitManifest(fs, root,
      m.copy(gen = m.gen + 1, retain = retain))
    val removed = DelimWrite.sweepDeadCount(fs, root, live)
    GraftProcedures.single(GraftProcedures.SummaryScan(
      StructType.fromDDL(
        "generation BIGINT, retained INT, deleted_files BIGINT"),
      Array(m.gen + 1, retain, removed)))
  }
}

private[v2] class SnapshotsProcedure(cat: GraftCatalog)
    extends GraftProcedure("snapshots") {

  override def parameters(): Array[ProcedureParameter] = Array(
    GraftProcedures.param("table", StringType))

  override def description(): String =
    "The table's retained snapshot history (DESCRIBE HISTORY): one row " +
      "per retained generation — commit time, file count, recorded row " +
      "count (null when any file lacks stats), live tombstones"

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val root = cat.tableRootOf(input.getUTF8String(0).toString)
    val fs = root.getFileSystem(DelimV2.driverConf())
    val gens = DelimV2.retainedVersions(fs, root)
    if (gens.isEmpty)
      throw new IllegalArgumentException(
        s"graft-delim: no retained snapshots at $root")
    val rows = gens.map { g =>
      val m = DelimV2.readManifestVersion(fs, root, g)
      val stats = m.files.map(e =>
        DelimV2.decodeStats(e.stats, m.schemas.get(e.gen)))
      val nRows: Any =
        if (m.files.nonEmpty && stats.forall(_.isDefined))
          stats.map(_.get.rows).sum
        else if (m.files.isEmpty) 0L
        else null
      Array[Any](g,
        if (m.ts > 0) m.ts * 1000L else null, // micros (TimestampType)
        m.files.size, nRows, m.tombstones.size,
        m.files.map(_.len).sum)
    }
    GraftProcedures.single(GraftProcedures.RowsScan(
      StructType.fromDDL(
        "generation BIGINT, committed_at TIMESTAMP, n_files INT, " +
          "n_rows BIGINT, n_tombstones INT, total_bytes BIGINT"),
      rows))
  }
}

private[v2] class RecoverManifestProcedure(cat: GraftCatalog)
    extends GraftProcedure("recover_manifest") {

  override def parameters(): Array[ProcedureParameter] = Array(
    GraftProcedures.param("table", StringType))

  override def description(): String =
    "Roll a crashed commit's claimed generation forward onto the " +
      "current-manifest pointer (safe once no writer is active)"

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val root = cat.tableRootOf(input.getUTF8String(0).toString)
    val fs = root.getFileSystem(DelimV2.driverConf())
    val recovered = DelimV2.recoverManifest(fs, root)
    GraftProcedures.single(GraftProcedures.SummaryScan(
      StructType.fromDDL("recovered_generation BIGINT"),
      Array(recovered.map(Long.box).orNull)))
  }
}
