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
    error: Option[String],
    // Owning schema — (schema, table) is the object identity: two
    // schemas may carry the same table name in one multi-schema job.
    objectSchema: String = "")

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
  private val live = new ConcurrentHashMap[String, LiveProgress]()
  private val stops = ConcurrentHashMap.newKeySet[String]()

  def register(info: JobStatusInfo): Unit = jobs.put(info.jobName, info)

  /** Status fetch. While a job is EXECUTING with a live tier attached,
    * the returned percentDone is the max of the coarse objects-complete
    * snapshot and the listener's within-object bytes fraction — both
    * monotone, so a poller never sees progress move backwards. A job
    * with a pending stop request reports STOP_PENDING until terminal.
    */
  def get(jobName: String): Option[JobStatusInfo] =
    Option(jobs.get(jobName)).map { info =>
      val lp = live.get(jobName)
      val withLive =
        if (lp != null && info.state == JobState.Executing)
          info.copy(percentDone = math.max(info.percentDone, lp.percent))
        else info
      if (!withLive.state.isTerminal && stops.contains(jobName))
        withLive.copy(state = JobState.StopPending)
      else withLive
    }
  def list(): Seq[JobStatusInfo] = jobs.values().asScala.toSeq
  def clear(): Unit =
    { jobs.clear(); retained.clear(); live.clear(); stops.clear() }

  /** STOP_JOB bookkeeping: the flag survives progress re-registration
    * (which always writes EXECUTING) so the finishing job can tell it
    * was stopped rather than failed. */
  def requestStop(jobName: String): Unit = stops.add(jobName)
  def stopRequested(jobName: String): Boolean = stops.contains(jobName)
  def clearStop(jobName: String): Unit = stops.remove(jobName)

  /** Wire the live-listener tier for an executing job. */
  def attachLive(jobName: String, lp: LiveProgress): Unit =
    live.put(jobName, lp)
  def detachLive(jobName: String): Unit = live.remove(jobName)

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

/** The live-listener status tier — the reference's expensive-but-live
  * strategy 3 (status.py:334-350,391-399): while a job's Spark actions
  * run, task-level input metrics stream into a per-job accumulator so a
  * concurrent STATUS request sees progress move WITHIN an object, not
  * just at object boundaries. Scoped to one job group: only tasks whose
  * stage belongs to a Spark job submitted under `jobGroup` count.
  *
  * Percent is `bytesRead / expectedBytes` where expectedBytes is the
  * on-disk size of the selected sources (FS metadata, no scan). It is
  * capped below 100: the terminal snapshot, not the estimate, declares
  * completion. Monotone by construction (bytes only accumulate).
  */
final class LiveProgress(jobGroup: String, expectedBytes: Long)
    extends org.apache.spark.scheduler.SparkListener {
  import org.apache.spark.scheduler.{SparkListenerJobStart, SparkListenerTaskEnd}
  private val groupStages = ConcurrentHashMap.newKeySet[Int]()
  private val bytes = new java.util.concurrent.atomic.AtomicLong()
  private val rows = new java.util.concurrent.atomic.AtomicLong()

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    // SparkContext.SPARK_JOB_GROUP_ID is private[spark]; its stable
    // public-facing value (set by setJobGroup) is this property key.
    val grp = Option(js.properties)
      .map(_.getProperty("spark.jobGroup.id")).orNull
    if (grp == jobGroup)
      js.stageInfos.foreach(si => groupStages.add(si.stageId))
  }
  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    if (groupStages.contains(te.stageId) && te.taskMetrics != null) {
      bytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
      rows.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }

  def bytesRead: Long = bytes.get
  def recordsRead: Long = rows.get
  def percent: Double =
    if (expectedBytes <= 0L) 0.0
    else math.min(99.0, 100.0 * bytes.get / expectedBytes)
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
  private val StoppedRe =
    raw"""Job "([^"]+)"\."([^"]+)" stopped""".r.unanchored

  def errorCodes(lines: Seq[String]): Seq[String] =
    lines.collect { case ErrorRe(code, _) => s"ORA-$code" }

  def finalState(lines: Seq[String]): JobState =
    finalJob(lines).map(_._3).getOrElse(JobState.Unknown)

  /** The terminal line WITH its captured `"owner"."name"` — the whole
    * data source of the log-only attach fallback (registry and sidecar
    * both gone; job.py:330-349's get_status_handler degrade). */
  def finalJob(lines: Seq[String]): Option[(String, String, JobState)] =
    lines.reverseIterator.collectFirst {
      case CompletedWithErrorsRe(owner, name, _) =>
        (owner, name, JobState.CompletedWithErrors)
      case CompletedRe(owner, name) => (owner, name, JobState.Completed)
      case StoppedRe(owner, name) => (owner, name, JobState.Stopped)
    }
}
