package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Small-file COMPACTION (OPTIMIZE) for graft-delim tables — the
  * maintenance operation a landing directory needs once a streaming
  * sink has fed it for a while: each epoch commits one file per
  * (epoch, partition) (DelimWrite.toStreaming), so a partition
  * accumulates files forever and the 100 TB read cost shifts from
  * bytes to per-file open overhead. `compact` rewrites each
  * partition's accumulated files into ONE file per (partition,
  * generation) and swaps the manifest atomically through the same
  * claim-race-detected commit as every write, so readers planned
  * mid-compaction see the old file set or the new one, never a mix,
  * and a racing writer fails loudly instead of silently losing the
  * compaction (or its own commit).
  *
  * Grouping is per (partition directory, recorded field LAYOUT): the
  * format is newline-framed text, so compaction is a BYTE-LEVEL
  * concatenation — no parse, no typed row materialization — sound
  * exactly when the member files' writer layouts are equal (a
  * streaming sink's epochs are each their own generation but share one
  * layout, so they all compact together; generations on either side
  * of a schema evolution stay apart — mixing layouts in one file would
  * break the per-file schema mapping). The copy work
  * runs DISTRIBUTED (one task per group over the cluster); only the
  * per-group metadata returns to the driver, which promotes the files
  * and commits — the same bounded-metadata discipline as
  * ReconcilePipeline's driver collects.
  *
  * Compacted entries KEEP their source generation number (their bytes
  * still carry that generation's layout); the manifest itself advances
  * one generation, so inside a retention window `versionAsOf` still
  * reads the pre-compaction snapshot from the original small files.
  */
object DelimCompact {

  /** Compact every (partition, layout) group of at least
    * `minFilesPerGroup` files; returns the new manifest generation
    * (unchanged when nothing qualified). The table must carry a
    * committed manifest (compaction is a table-format operation).
    *
    * `targetFileSize` > 0 BIN-PACKS each group instead of merging it
    * into one file: members (in deterministic rel order) fill bins of
    * cumulative size <= target (one greedy pass; a single oversized
    * file is its own bin), one rewrite task per bin. This is the
    * 100 TB form — one-file-per-partition makes a hot partition a
    * single task streaming terabytes through one output stream, and
    * every future compaction of that partition rewrites everything
    * again; size-bounded bins keep tasks uniform and re-compaction
    * incremental (a bin already at target is a single file next time
    * and is left in place). 0 keeps the legacy whole-group merge.
    * Single-file bins are never rewritten — copying one file achieves
    * nothing but write amplification.
    */
  def compact(spark: SparkSession, tablePath: String,
      minFilesPerGroup: Int = 2, targetFileSize: Long = 0L): Long = {
    val target = new HPath(tablePath)
    val conf = DelimV2.driverConf()
    val fs = target.getFileSystem(conf)
    val m = DelimV2.readManifest(fs, target).getOrElse(
      throw new IllegalArgumentException(
        s"graft-delim: no committed manifest at $tablePath — " +
          "compaction operates on manifest-committed tables"))
    val newGen = m.gen + 1
    def parentOf(rel: String): String = {
      val i = rel.lastIndexOf('/')
      if (i < 0) "" else rel.substring(0, i)
    }
    // a compacted entry carries a REPRESENTATIVE generation of its
    // group (the newest member with that layout) so readers keep
    // resolving its fields through the same recorded schema; legacy
    // entries (no recorded schema) group together under gen 0
    // merged data-skipping stats: sound only when EVERY member carries
    // stats (min of mins, max of maxes, null/row sums over the columns
    // every member bounded) — any gap merges to "no stats"
    def mergeStats(entries: Seq[DelimV2.ManifestEntry],
        layout: Option[DelimV2.ManifestSchema]): String = {
      val decoded = entries.map(e => DelimV2.decodeStats(e.stats, layout))
      if (layout.isEmpty || decoded.exists(_.isEmpty)) return ""
      val all = decoded.map(_.get)
      val st = layout.get.struct
      val common = all.map(_.cols.keySet).reduce(_ intersect _)
      val cols = common.toSeq.sorted.map { c =>
        val dt = st(c).dataType
        val cs = all.map(_.cols(c))
        val mins = cs.map(_.min).filter(_ != null)
        val maxs = cs.map(_.max).filter(_ != null)
        val mn = if (mins.isEmpty) null
          else mins.reduce((a, b) => if (DelimV2.cmp(dt, a, b) <= 0) a else b)
        val mx = if (maxs.isEmpty) null
          else maxs.reduce((a, b) => if (DelimV2.cmp(dt, a, b) >= 0) a else b)
        (c, DelimV2.externalToText(mn, dt), DelimV2.externalToText(mx, dt),
          cs.map(_.nulls).sum)
      }
      DelimV2.encodeStats(all.map(_.rows).sum, cols)
    }
    // greedy size-bounded binning over the group's entries in
    // deterministic rel order; target <= 0 = one bin (legacy merge)
    def bins(entries: Seq[DelimV2.ManifestEntry])
        : Seq[Seq[DelimV2.ManifestEntry]] = {
      val sorted = entries.sortBy(_.rel)
      if (targetFileSize <= 0L) return Seq(sorted)
      val out = Seq.newBuilder[Seq[DelimV2.ManifestEntry]]
      var cur = Vector.empty[DelimV2.ManifestEntry]
      var curLen = 0L
      sorted.foreach { e =>
        if (cur.nonEmpty && curLen + e.len > targetFileSize) {
          out += cur; cur = Vector.empty; curLen = 0L
        }
        cur :+= e; curLen += e.len
      }
      if (cur.nonEmpty) out += cur
      out.result()
    }
    // group ALSO by the applicable delete-tombstone set: a tombstone
    // applies to files at or before its generation, and a compacted
    // entry carries ONE representative gen (the group max) — merging
    // files on opposite sides of a tombstone boundary would either
    // resurrect deleted rows (max side) or delete post-delete inserts
    // (min side). Equal signatures make the representative exact: every
    // signature tombstone has gen >= all members >= none outside it.
    val groups = m.files.groupBy(e => (parentOf(e.rel), m.schemas.get(e.gen),
        m.tombstones.filter(_._1 >= e.gen).toSet))
      .filter(_._2.size >= math.max(minFilesPerGroup, 2))
      .toSeq
      .flatMap { case ((sub, layout, _), entries) =>
        bins(entries)
          .filter(_.size >= 2) // rewriting a lone file is pure write amplification
          .map { bin =>
            (sub, if (layout.isDefined) bin.map(_.gen).max else 0L,
              bin.map(_.rel).sorted, mergeStats(bin, layout))
          }
      }
      .sortBy(t => (t._1, t._3.head))
    if (groups.isEmpty) return m.gen
    val stagingName = s"_staging_compact_$newGen"
    val staging = new HPath(target, stagingName)
    fs.mkdirs(staging)
    val confMap = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue)
      .filter { case (k, _) => k.startsWith("fs.") || k.startsWith("hadoop.") }
      .toMap
    val targetStr = target.toString
    val statsByIdx = groups.map(_._4).toArray
    val jobs = groups.zipWithIndex.map { case ((sub, gen, rels, _), i) =>
      (sub, gen, rels, i)
    }
    // one task per group; each concatenates its files byte-for-byte
    // (inserting a newline only after a file whose final line is
    // unterminated — legacy fixtures; the connector's own writers
    // always terminate) and returns ONLY metadata
    val compacted = spark.sparkContext
      .parallelize(jobs, math.min(jobs.size,
        math.max(1, spark.sparkContext.defaultParallelism)))
      .map { case (sub, gen, rels, i) =>
        val c = new Configuration(true)
        confMap.foreach { case (k, v) => c.set(k, v) }
        val root = new HPath(targetStr)
        val fsx = root.getFileSystem(c)
        val outName = f"compact-$newGen-$i%05d.txt"
        val outPath = new HPath(new HPath(root, stagingName), outName)
        val out = fsx.create(outPath, true)
        var total = 0L
        try {
          val buf = new Array[Byte](1 << 16)
          rels.foreach { rel =>
            val in = fsx.open(new HPath(root, rel))
            var last: Byte = '\n'
            try {
              var n = in.read(buf)
              while (n > 0) {
                out.write(buf, 0, n)
                total += n
                last = buf(n - 1)
                n = in.read(buf)
              }
            } finally in.close()
            if (last != '\n') { out.write('\n'); total += 1 }
          }
        } finally out.close()
        (sub, gen, rels, outName, total, i)
      }.collect() // bounded: one row of names/lengths per group
    val replaced = compacted.flatMap(_._3).toSet
    val newEntries = compacted.map { case (sub, gen, _, outName, len, gi) =>
      val dstDir = if (sub.isEmpty) target else new HPath(target, sub)
      if (sub.nonEmpty) fs.mkdirs(dstDir)
      if (!fs.rename(new HPath(staging, outName), new HPath(dstDir, outName)))
        throw new java.io.IOException(
          s"graft-delim: compaction promote failed for $outName")
      DelimV2.ManifestEntry(len, gen,
        if (sub.isEmpty) outName else s"$sub/$outName", statsByIdx(gi))
    }.toSeq
    val live =
      try DelimV2.commitManifest(fs, target, m.copy(
        files = m.files.filterNot(e => replaced.contains(e.rel)) ++ newEntries,
        gen = newGen))
      catch {
        case e: java.util.ConcurrentModificationException =>
          // a real writer won the race: roll back the compacted files —
          // the table keeps the writer's snapshot, nothing is lost
          newEntries.foreach(ne => fs.delete(new HPath(target, ne.rel), false))
          fs.delete(staging, true)
          throw e
      }
    replaced.filterNot(live).foreach { rel =>
      fs.delete(new HPath(target, rel), false)
    }
    fs.delete(staging, true)
    newGen
  }
}
