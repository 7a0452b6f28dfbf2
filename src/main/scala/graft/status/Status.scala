package graft.status

import graft.model.{JobLogEntry, JobState}
import java.time.Instant
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Per-object (table) progress line — analog of the reference's
  * worker/object status rows (status.py:114-318).
  */
case class ObjectStatus(
    objectName: String,
    state: String,           // COMPLETED | FAILED | SKIPPED | ESTIMATED
    rows: Long,
    bytes: Long,
    elapsedSec: Double,
    error: Option[String])

/** Snapshot of a job's observable state — analog of JobStatusInfo
  * (status.py:240-318): state, percent done, per-worker detail, log.
  */
case class JobStatusInfo(
    jobName: String,
    jobOwner: String,
    operation: String,
    mode: String,
    state: JobState,
    percentDone: Double,
    objects: Seq[ObjectStatus],
    logEntries: Seq[JobLogEntry],
    startedAt: Instant,
    finishedAt: Option[Instant]) {
  def totalRows: Long = objects.map(_.rows).sum
  def totalBytes: Long = objects.map(_.bytes).sum
  def errors: Seq[String] = objects.flatMap(_.error)
}

/** Driver-side job registry — the analog of Oracle's master table +
  * `Job.attach` (job.py:330-349). Three-strategy status fetch mirrors
  * status.py:334-350: (1) registry probe (≈ dictionary probe, cheap),
  * (2) metadata-sidecar / log parse, (3) live listener — in our
  * single-process engine the registry is authoritative, the sidecar
  * covers cross-process attach.
  */
object JobRegistry {
  private val jobs = new ConcurrentHashMap[String, JobStatusInfo]()
  private val retained = ConcurrentHashMap.newKeySet[String]()

  def register(info: JobStatusInfo): Unit = jobs.put(info.jobName, info)
  def get(jobName: String): Option[JobStatusInfo] = Option(jobs.get(jobName))
  def list(): Seq[JobStatusInfo] = jobs.values().asScala.toSeq
  def clear(): Unit = { jobs.clear(); retained.clear() }

  /** KEEP_MASTER analog: mark a job's registry entry as retained so the
    * orphan GC leaves it (the reference only drops NOT_RUNNING masters
    * with no attached sessions — a KEEP_MASTER master survives). */
  def retain(jobName: String): Unit = retained.add(jobName)

  /** Drop terminal jobs with no retained checkpoint — analog of the
    * orphan master-table GC (sql.py:92-105). Returns names dropped. */
  def cleanupOrphans(): Seq[String] = {
    val orphans = jobs.asScala.collect {
      case (name, info)
          if info.state.isTerminal && !retained.contains(name) => name
    }.toSeq
    orphans.foreach(jobs.remove)
    orphans
  }
}

/** Log-parsing status fallback (status.py:458-521): extract ORA-style
  * error codes and completion lines from a job log.
  */
object LogParser {
  private val ErrorRe = raw"ORA-(\d+):?(.*)".r.unanchored
  private val CompletedRe =
    raw"""Job "([^"]+)"\."([^"]+)" successfully completed""".r.unanchored
  private val CompletedWithErrorsRe =
    raw"""Job "([^"]+)"\."([^"]+)" completed with (\d+) error""".r.unanchored

  def errorCodes(lines: Seq[String]): Seq[String] =
    lines.collect { case ErrorRe(code, _) => s"ORA-$code" }

  def finalState(lines: Seq[String]): JobState =
    lines.reverseIterator.collectFirst {
      case CompletedWithErrorsRe(_, _, _) => JobState.CompletedWithErrors
      case CompletedRe(_, _) => JobState.Completed
    }.getOrElse(JobState.Unknown)
}
