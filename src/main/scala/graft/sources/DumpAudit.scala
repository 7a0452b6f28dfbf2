package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dump-set integrity audit — verify a landed export BEFORE an import
  * trusts it: every `dumpFiles` entry from the `_metadata.json`
  * sidecar must exist, be non-empty, and carry parquet's `PAR1` (or
  * Parquet-Modular-Encryption's `PARE`) magic at both ends of every
  * data file. The reference delegates dump integrity entirely to
  * Oracle's internal consistency; an engine landing plain parquet on
  * object storage owns this check itself — a truncated upload or a
  * partial multipart copy is exactly the corruption a 100 TB transfer
  * produces, and catching it at audit time beats a mid-import task
  * failure after hours of work.
  *
  * Scale note: the audit walks the MANIFEST (metadata-sized — one row
  * per exported table, a handful of files each) and reads 8 bytes per
  * data file, so the driver-side loop is file-COUNT-bound, never
  * data-bound; a store with millions of files would lift `checkFile`
  * into a `spark.parallelize(files)` map, which changes nothing about
  * the verdict columns.
  */
object DumpAudit {

  private val Magics = Set("PAR1", "PARE")

  private case class FileVerdict(bytes: Long, magicOk: Boolean)

  private def checkFile(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): FileVerdict = {
    val len = fs.getFileStatus(p).getLen
    if (len < 8) return FileVerdict(len, magicOk = false)
    val head = new Array[Byte](4)
    val tail = new Array[Byte](4)
    val in = fs.open(p)
    try {
      in.readFully(0L, head)
      in.readFully(len - 4, tail)
    } finally in.close()
    FileVerdict(len,
      Magics.contains(new String(head, "US-ASCII")) &&
        Magics.contains(new String(tail, "US-ASCII")))
  }

  /** Audit one dump root: a row per sidecar `dumpFiles` table dir with
    * file/byte counts and the two failure flags (`missing` — the dir
    * is gone or empty; `n_corrupt` — data files failing the magic
    * check). `ok` folds both. A dump with no sidecar yields an empty
    * frame (nothing to audit against — attach-level recovery applies).
    *
    * Paths REBASE onto `dumpDir`: the sidecar records the export-time
    * absolute target, but the whole point of the audit is checking a
    * dump WHERE IT LANDED — a set copied to another filesystem must
    * be checked at its new home, not silently against the (possibly
    * intact) originals the sidecar still names. Each entry keeps only
    * its `<schema>/<table>` suffix under the audited root; auditing
    * in place is the identity rebase.
    */
  def verify(spark: SparkSession, dumpDir: String): DataFrame = {
    import spark.implicits._
    val base = if (dumpDir.endsWith("/")) dumpDir.dropRight(1) else dumpDir
    val rows = graft.job.DataPumpJob.readSidecar(spark, dumpDir).toSeq
      .flatMap(_.dumpFiles).map { orig =>
        val rel = orig.split('/').filter(_.nonEmpty).takeRight(2)
          .mkString("/")
        val dir = s"$base/$rel"
        val p = new Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p))
          (dir, 0L, 0L, 0L, true, false)
        else {
          val files = fs.listStatus(p)
            .filter(_.getPath.getName.endsWith(".parquet"))
          val verdicts = files.map(st => checkFile(fs, st.getPath))
          val bad = verdicts.count(!_.magicOk).toLong
          (dir, files.length.toLong, verdicts.map(_.bytes).sum,
            bad, files.isEmpty, files.nonEmpty && bad == 0L)
        }
      }
    rows.toDF("table_dir", "n_files", "total_bytes", "n_corrupt",
      "missing", "ok").orderBy("table_dir")
  }
}
