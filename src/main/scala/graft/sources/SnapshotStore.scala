package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.model.Util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.time.Instant
import scala.util.control.NonFatal

/** Snapshot-versioned dump store — the engine's answer to Oracle's
  * SCN semantics (SURVEY.md §4 "hard parts").
  *
  * Every versioned export appends a `_versions.json` ledger entry
  * `{version, timestamp, jobName}` and lands its data under
  * `root/v=<n>/…`. FLASHBACK_SCN(n) pins an exact version;
  * FLASHBACK_TIME(iso) resolves through `timestampToVersion` — the
  * analog of `dt_to_scn` (reference database.py:177-181, sql.py:90):
  * the greatest version whose commit timestamp is ≤ the requested
  * time. Immutable version dirs give snapshot-consistent reads
  * without coordination — the same contract Delta/Iceberg time travel
  * provides, expressed on plain parquet.
  */
object SnapshotStore {
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
  private val LedgerFile = "_versions.json"

  case class VersionEntry(version: Long, timestamp: String, jobName: String)
  case class Ledger(versions: Seq[VersionEntry])

  def versionDir(root: String, v: Long): String = s"$root/v=$v"

  def ledgerPath(root: String) = new Path(s"$root/$LedgerFile")

  def isVersioned(spark: SparkSession, root: String): Boolean = {
    val p = ledgerPath(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def readLedger(spark: SparkSession, root: String): Seq[VersionEntry] =
    synchronized {
      val p = ledgerPath(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) {
        // Local-FS rename is delete-then-rename (no atomic overwrite):
        // a crash in that window leaves only the temp file. Temps are
        // complete ledger copies, so recover the newest one rather than
        // silently restarting version numbering at 1.
        val tmps = try fs.globStatus(new Path(s"$root/.$LedgerFile.tmp-*"))
          catch { case NonFatal(_) => null }
        Option(tmps).filter(_.nonEmpty)
          .map(_.maxBy(_.getModificationTime).getPath)
          .map { t =>
            val in = fs.open(t)
            try mapper.readValue(
              in: java.io.InputStream, classOf[Ledger]).versions
            catch { case NonFatal(_) => Seq.empty[VersionEntry] }
            finally in.close()
          }.getOrElse(Nil)
      } else {
        val in = fs.open(p)
        try mapper.readValue(in: java.io.InputStream, classOf[Ledger]).versions
        catch { case NonFatal(_) => Nil }
        finally in.close()
      }
    }

  /** Register a new version; returns its number (monotone).
    *
    * Atomicity: the read-modify-write is serialized JVM-wide on this
    * object's monitor (shared with `readLedger`, so in-JVM readers can
    * never observe a mid-publish state), and the file is published via
    * write-to-temp + overwriting FileContext rename. On HDFS that
    * rename is one atomic step; on the local FS it delegates to
    * delete-then-rename, leaving a crash window with no ledger —
    * `readLedger` covers it by recovering the newest temp copy.
    * Cross-process writers on an object store would swap this for a
    * conditional-put/ETag loop.
    */
  def appendVersion(spark: SparkSession, root: String, jobName: String,
      at: Instant): Long = synchronized {
    val existing = readLedger(spark, root)
    val next = existing.map(_.version).maxOption.getOrElse(0L) + 1
    writeLedger(spark, root, Ledger(existing :+
      VersionEntry(next, Util.formatJobDate(at), jobName)))
    next
  }

  /** Publish a ledger via write-to-temp + overwriting rename (the
    * appendVersion atomicity contract, factored for vacuum). Caller
    * must hold this object's monitor. */
  private def writeLedger(spark: SparkSession, root: String,
      updated: Ledger): Unit = {
    val p = ledgerPath(root)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val tmp = new Path(
      s"$root/.$LedgerFile.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(updated)) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(p),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // drop stale temps from crashed writers so they can never shadow a
    // deliberately removed ledger in the recovery path above
    try fs.globStatus(new Path(s"$root/.$LedgerFile.tmp-*"))
      .foreach(s => fs.delete(s.getPath, false))
    catch { case NonFatal(_) => () }
  }

  /** VACUUM: retire every version except the newest `keepLast`,
    * returning the dropped version numbers — the retention sweep any
    * time-travel ledger needs once deliveries accumulate (a 100 TB
    * store cannot keep every snapshot forever; Delta/Iceberg expose
    * the same knob as VACUUM / expire_snapshots).
    *
    * Ordering is the safety argument, scoped precisely: the TRUNCATED
    * ledger publishes FIRST (same temp+rename as appendVersion), so a
    * resolvePin that runs AFTER the publish can never see a vacuumed
    * version — it fails with the explicit not-in-ledger error; only
    * then do the retired `v=<n>` dirs physically delete. A pin that
    * resolved just BEFORE the publish may still read a directory the
    * sweep is about to delete (the classic expire-snapshots TOCTOU —
    * Delta/Iceberg have the same window and close it operationally
    * with a retention grace period ≥ the longest reader); true
    * reader isolation would need reader registration or such a grace
    * window, which this store does not implement. Version numbering
    * stays monotone (the next append continues from the retained max,
    * never reuses a vacuumed number).
    */
  def vacuum(spark: SparkSession, root: String,
      keepLast: Int): Seq[Long] = synchronized {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val ledger = readLedger(spark, root)
    val retained = ledger.sortBy(-_.version).take(keepLast)
    val dropped = ledger.map(_.version).toSet -- retained.map(_.version).toSet
    if (dropped.isEmpty) return Nil
    writeLedger(spark, root, Ledger(retained.sortBy(_.version)))
    val conf = spark.sparkContext.hadoopConfiguration
    dropped.toSeq.sorted.map { v =>
      val dir = new Path(versionDir(root, v))
      val fs = dir.getFileSystem(conf)
      if (fs.exists(dir)) fs.delete(dir, true)
      v
    }
  }

  /** dt→SCN analog: greatest version committed at or before `asOf`. */
  def timestampToVersion(spark: SparkSession, root: String,
      asOf: Instant): Option[Long] = {
    val cutoff = Util.formatJobDate(asOf)
    readLedger(spark, root)
      .filter(_.timestamp <= cutoff) // lexicographic == chronological
      .map(_.version).maxOption
  }

  /** Resolve a snapshot pin against a versioned root:
    * all-digits pin = explicit version (FLASHBACK_SCN); ISO datetime
    * pin = timestamp resolution (FLASHBACK_TIME); yyyyMMdd…-format
    * pin (the auto job-date pin) likewise resolves by timestamp.
    */
  def resolvePin(spark: SparkSession, root: String,
      pin: Option[String]): Option[Long] = {
    if (!isVersioned(spark, root)) return None
    val ledger = readLedger(spark, root)
    if (ledger.isEmpty) return None
    pin match {
      case Some(v) if v.nonEmpty && v.length < 10 && v.forall(_.isDigit) =>
        val n = v.toLong
        require(ledger.exists(_.version == n),
          s"version $n not in ledger (have ${ledger.map(_.version)})")
        Some(n)
      case Some(v) if v.length == 20 && v.forall(_.isDigit) =>
        // auto job-date pin in ledger timestamp format
        Some(ledger.filter(_.timestamp <= v).map(_.version).maxOption
          .getOrElse(throw new IllegalArgumentException(
            s"no version at or before $v")))
      case Some(iso) =>
        Some(timestampToVersion(spark, root, Util.parseDt(iso))
          .getOrElse(throw new IllegalArgumentException(
            s"no version at or before $iso")))
      case None => ledger.map(_.version).maxOption
    }
  }
}
