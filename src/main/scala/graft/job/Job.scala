package graft.job

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.Tables
import graft.directives.{Directive, DirectiveCompiler, Effect}
import graft.model._
import graft.status.{JobRegistry, JobStatusInfo, ObjectStatus}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.time.Instant
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** Execution-time context handed to POST-stage directives
  * (reference Stage.POST application, job.py:288-295).
  */
case class JobContext(
    spark: SparkSession,
    jobName: String,
    sourceDir: String,
    targetDir: String,
    sourceFiles: Seq[String]) {
  /** DELETE_FILES post-action (directives.py:556-587): remove the
    * consumed dump set — "move" semantics for import. */
  def deleteSourceFiles(): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    sourceFiles.foreach { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}

/** A Data-Pump-style bulk ETL job, re-expressed as a Spark read→write
  * pipeline. Mirrors the reference lifecycle (job.py:195-308):
  * validate → name synthesis → open (registry entry) → metadata
  * assembly → file resolution → snapshot pin → staged directive
  * application → start (Spark action) → status → post actions.
  *
  * EXPORT: `sourceDir` tables → parquet dump set under
  * `targetDir/<schema>/<table>/` + `_metadata.json` sidecar.
  * IMPORT: dump set at `sourceDir` → `targetDir/<schema'>/<table'>/`
  * with remaps/save-mode semantics applied.
  *
  * Parallel-degree ↔ file-count coupling (files.py:794-885): PARALLEL n
  * ⇒ each table's dump set is written as n part files (repartition(n)) —
  * Spark's substitute for the `%U` substitution variable.
  */
case class DataPumpJob(
    operation: Operation,
    mode: JobMode,
    sourceDir: String,
    targetDir: String,
    directives: Seq[Directive] = Nil,
    schema: String = "main",
    tag: Option[String] = None,
    jobOwner: String = "spark",
    explicitJobName: Option[String] = None,
    versioned: Boolean = false) {

  private val mapper =
    new ObjectMapper().registerModule(DefaultScalaModule)

  def jobDate: Instant = Instant.now()

  /** Synchronous run. `wait=false` launches the action on a daemon
    * thread and returns an EXECUTING snapshot immediately
    * (job.py:297-304); attach via JobRegistry/sidecar later.
    */
  def run(spark: SparkSession, wait: Boolean = true): JobStatusInfo = {
    val date = jobDate
    val remap = directives.collectFirst { case graft.directives.RemapSchema(f, t) => (f, t) }
    val name = explicitJobName.getOrElse(Util.jobName(
      operation, date,
      schemas = if (operation == Operation.Export) Seq(schema.toUpperCase) else Nil,
      remapSchema = remap.map { case (f, t) => (f.toUpperCase, t.toUpperCase) },
      jobOwner = Some(jobOwner), tag = tag))

    def execute(): JobStatusInfo = {
      val started = Instant.now()
      val info =
        try runStages(spark, name, date, started)
        catch {
          case NonFatal(e) =>
            JobStatusInfo(name, jobOwner, operation.name, mode.name,
              JobState.Stopped, 0.0,
              Seq(ObjectStatus("job", "FAILED", 0, 0, 0.0,
                Some(e.toString))),
              Nil, started, Some(Instant.now()))
        }
      JobRegistry.register(info)
      info
    }

    if (wait) execute()
    else {
      val pending = JobStatusInfo(name, jobOwner, operation.name, mode.name,
        JobState.Executing, 0.0, Nil, Nil, Instant.now(), None)
      JobRegistry.register(pending)
      val t = new Thread(() => { execute(); () }, s"graft-job-$name")
      t.setDaemon(true)
      t.start()
      pending
    }
  }

  private def runStages(
      spark: SparkSession,
      name: String,
      date: Instant,
      started: Instant): JobStatusInfo = {
    val effects = directives.flatMap(DirectiveCompiler.compile)
    spark.sparkContext.setJobGroup(name, s"${operation.name} ${mode.name}")
    // events.parquet carries nanosecond timestamps (Spark 4 refuses
    // them natively); read as long nanos so FULL jobs can move them
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // ---- snapshot resolution (FLASHBACK_SCN/TIME -> version dir) ----
    val explicitPin = effects.collectFirst { case Effect.SnapshotPin(v) => v }
    val importSource: String = operation match {
      case Operation.Import
          if graft.sources.SnapshotStore.isVersioned(spark, sourceDir) =>
        val v = graft.sources.SnapshotStore
          .resolvePin(spark, sourceDir, explicitPin).get
        graft.sources.SnapshotStore.versionDir(sourceDir, v)
      case _ => sourceDir
    }
    val exportVersion: Option[Long] =
      if (versioned && operation != Operation.Import)
        Some(graft.sources.SnapshotStore.readLedger(spark, targetDir)
          .map(_.version).maxOption.getOrElse(0L) + 1)
      else None
    val effTarget = exportVersion
      .map(v => graft.sources.SnapshotStore.versionDir(targetDir, v))
      .getOrElse(targetDir)

    // ---- object enumeration (mode scoping + metadata filters) ----
    val available: Seq[String] = operation match {
      case Operation.Import => listDumpTables(spark, importSource)
      case _ => Tables.all.filter(t =>
        exists(spark, Tables.path(sourceDir, t)))
    }
    val modeScoped = mode match {
      case JobMode.Table =>
        val wanted = directives.collect {
          case graft.directives.IncludeTable(ts) => ts.map(_.toLowerCase)
        }.flatten.toSet
        if (wanted.isEmpty) available else available.filter(wanted)
      case _ => available
    }
    val selected = effects.foldLeft(modeScoped) {
      case (names, Effect.ObjectSelection(f)) => f(names)
      case (names, _) => names
    }

    // ---- effect resolution ----
    val parallel = effects.collectFirst { case Effect.SetParallel(n) => n }.getOrElse(1)
    val (saveMode, truncate) = effects.collectFirst {
      case Effect.SetSaveMode(m, t) => (m, t)
    }.getOrElse((SaveMode.ErrorIfExists, false))
    val writerOpts = effects.collect { case Effect.WriterOption(k, v) => k -> v }.toMap
    val readerOpts = effects.collect { case Effect.ReaderOption(k, v) => k -> v }.toMap
    val transforms = effects.collect { case Effect.PlanTransform(f) => f }
    val estimateOnly = effects.contains(Effect.EstimateOnly)
    val departition = effects.contains(Effect.Departition)
    val schemaRemap = effects.collectFirst {
      case Effect.IdentityRemap("SCHEMA", f, t) => (f, t)
    }
    val tableRemaps = effects.collect {
      case Effect.IdentityRemap("TABLE", f, t) => f.toLowerCase -> t.toLowerCase
    }.toMap
    val asOf = effects.collectFirst { case Effect.SnapshotPin(v) => v }
      .getOrElse(Util.formatJobDate(date)) // auto snapshot pin, job.py:261-269
    val includeMetadata = effects.collectFirst {
      case Effect.ContentSelection(_, md) => md
    }.getOrElse(true)

    val sourceSchema = operation match {
      case Operation.Import =>
        readSidecar(spark, sourceDir).map(_.jobName).flatMap(_ => None)
          .getOrElse(schema) // schema identity travels via constructor
      case _ => schema
    }
    val targetSchema = schemaRemap match {
      case Some((from, to)) if from.equalsIgnoreCase(sourceSchema) => to
      case Some((_, to)) => to
      case None => sourceSchema
    }

    // ---- per-object movement with error accumulation (tolerates
    //      partial failure → COMPLETED_WITH_ERRORS, status.py:38) ----
    // Registry gets a refreshed EXECUTING snapshot after every object —
    // what a concurrent STATUS/POLL request observes mid-job (the
    // reference's per-worker status rows, status.py:240-318).
    val results = ArrayBuffer.empty[ObjectStatus]
    def publishProgress(): Unit = JobRegistry.register(
      JobStatusInfo(name, jobOwner, operation.name, mode.name,
        JobState.Executing,
        percentDone =
          if (selected.isEmpty) 100.0
          else 100.0 * results.size / selected.size,
        objects = results.toSeq, logEntries = Nil,
        startedAt = started, finishedAt = None))
    selected.foreach { table =>
      val t0 = System.nanoTime()
      val targetTable = tableRemaps.getOrElse(table, table)
      val outPath = s"$effTarget/$targetSchema/$targetTable"
      try {
        val df0 = operation match {
          case Operation.Import =>
            spark.read.options(readerOpts)
              .parquet(s"$importSource/${dumpSubdir(table)}")
          case _ =>
            spark.read.options(readerOpts)
              .parquet(Tables.path(sourceDir, table))
        }
        val df = transforms.foldLeft(df0)((d, f) => f(d))
        if (estimateOnly || operation == Operation.SqlFile) {
          // ESTIMATE_ONLY (directives.py:304-305): stats, no movement.
          val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
          if (operation == Operation.SqlFile)
            writeString(spark, s"$effTarget/$targetSchema/$targetTable.sql",
              s"CREATE TABLE $targetSchema.$targetTable (${df.schema.toDDL});\n")
          results += ObjectStatus(table, "ESTIMATED", -1L,
            bytes.longValue, secsSince(t0), None)
        } else {
          if (departition && partitionColumnsOf(df).nonEmpty) {
            // DEPARTITION (directives.py:346-349): each source partition
            // becomes its own table `<table>_<col>_<value>`; values are
            // enumerated from the partition spec (small by definition)
            val pcols = partitionColumnsOf(df)
            val combos = df.select(pcols.map(
              org.apache.spark.sql.functions.col): _*).distinct().collect()
            combos.foreach { row =>
              val suffix = pcols.zipWithIndex
                .map { case (c, i) => s"${c}_${row.get(i)}" }.mkString("_")
              val part = pcols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
                d.filter(org.apache.spark.sql.functions.col(c) ===
                  org.apache.spark.sql.functions.lit(row.get(i)))
              }.drop(pcols: _*)
              part.repartition(parallel).write.mode(saveMode)
                .options(writerOpts)
                .parquet(s"$effTarget/$targetSchema/${targetTable}_$suffix")
            }
            val rows = df.count()
            results += ObjectStatus(table, "COMPLETED", rows,
              pathBytes(spark, s"$effTarget/$targetSchema"),
              secsSince(t0), None)
          } else if (saveMode == SaveMode.Ignore && exists(spark, outPath)) {
            results += ObjectStatus(table, "SKIPPED", 0, 0, secsSince(t0), None)
          } else {
            if (truncate && exists(spark, outPath)) {
              // TABLE_EXISTS_ACTION=TRUNCATE preserves target schema:
              // validate incoming schema equality before overwrite.
              val existing = spark.read.parquet(outPath).schema
              require(existing == df.schema,
                s"TRUNCATE requires identical schema for $table: " +
                  s"existing ${existing.simpleString} vs ${df.schema.simpleString}")
            }
            df.repartition(parallel) // %U dump-set layout: n part files
              .write.mode(saveMode).options(writerOpts).parquet(outPath)
            val written = spark.read.parquet(outPath)
            results += ObjectStatus(table, "COMPLETED", written.count(),
              pathBytes(spark, outPath), secsSince(t0), None)
          }
        }
      } catch {
        case NonFatal(e) =>
          results += ObjectStatus(table, "FAILED", 0, 0, secsSince(t0),
            Some(e.toString))
      }
      publishProgress()
    }
    spark.sparkContext.clearJobGroup()

    // ---- metadata sidecar (commands.py:234-244) ----
    val dumpFiles = results.filter(_.state == "COMPLETED")
      .map(r => s"$effTarget/$targetSchema/${tableRemaps.getOrElse(r.objectName, r.objectName)}").toSeq
    if (includeMetadata && !estimateOnly) {
      val meta = JobMetaData(name, jobOwner, operation.name, mode.name,
        Util.formatJobDate(date), selected,
        directives.map(d => Map("name" -> d.name, "value" -> d.valueRepr)),
        dumpFiles, Some(asOf), tag)
      writeString(spark, s"$effTarget/_metadata.json",
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta))
    }

    // ---- version ledger (snapshot-consistent export, job.py:261-269
    //      auto-pin parity: the committed version IS the snapshot) ----
    val anyCompleted = results.exists(r =>
      r.state == "COMPLETED" || r.state == "ESTIMATED")
    exportVersion.foreach { v =>
      if (anyCompleted)
        graft.sources.SnapshotStore.appendVersion(spark, targetDir, name, date)
    }

    // ---- POST-stage directives ----
    val ctx = JobContext(spark, name, importSource, effTarget,
      sourceFiles = if (operation == Operation.Import)
        selected.map(t => s"$importSource/${dumpSubdir(t)}") else Nil)
    effects.foreach {
      case Effect.PostAction(runPost) => runPost(ctx)
      case _ => ()
    }

    val failed = results.count(_.state == "FAILED")
    val state =
      if (failed == 0) JobState.Completed
      else if (failed < results.size) JobState.CompletedWithErrors
      else JobState.Stopped
    JobStatusInfo(name, jobOwner, operation.name, mode.name, state,
      percentDone = if (results.isEmpty) 100.0
        else 100.0 * (results.size - failed) / results.size,
      objects = results.toSeq,
      logEntries = results.zipWithIndex.map { case (r, i) =>
        JobLogEntry(i + 1L, s"${r.state} ${r.objectName} rows=${r.rows}")
      }.toSeq,
      startedAt = started, finishedAt = Some(Instant.now()))
  }

  // ---- dump-set helpers ----

  /** Import-side dump enumeration: a real FS can list directories, so
    * the reference's brute-force `%U` probing (files.py:810-857)
    * becomes a glob/listing.
    */
  private def listDumpTables(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    // layout: dir/<schema>/<table>/part-*.parquet
    fs.listStatus(p).filter(_.isDirectory).flatMap { schemaDir =>
      fs.listStatus(schemaDir.getPath).filter(_.isDirectory).map { td =>
        s"${schemaDir.getPath.getName}/${td.getPath.getName}"
      }
    }.toSeq.sorted.map(_.split("/").last).distinct
  }

  private def dumpSubdir(table: String): String = s"$schema/$table"

  private def readSidecar(spark: SparkSession, dir: String): Option[JobMetaData] = {
    val p = new Path(s"$dir/_metadata.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(mapper.readValue(in: java.io.InputStream, classOf[JobMetaData]))
      catch { case NonFatal(_) => None }
      finally in.close()
    }
  }

  /** Hive-style partition columns of a parquet-backed DataFrame,
    * discovered from its input paths (`k=v` segments). */
  private def partitionColumnsOf(df: DataFrame): Seq[String] = {
    val re = "/([A-Za-z_][A-Za-z0-9_]*)=[^/]+".r
    df.inputFiles.headOption.toSeq.flatMap(f =>
      re.findAllMatchIn(f).map(_.group(1)).toSeq).distinct
      .filter(c => df.columns.contains(c))
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def pathBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  private def writeString(spark: SparkSession, path: String, s: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def secsSince(t0: Long): Double = (System.nanoTime() - t0) / 1e9
}

object DataPumpJob {
  /** Attach to a job by name (job.py:330-349): registry probe first,
    * then sidecar recovery from a dump dir.
    */
  def attach(
      spark: SparkSession,
      jobName: String,
      dumpDir: Option[String] = None): Option[JobStatusInfo] =
    JobRegistry.get(jobName).orElse {
      dumpDir.flatMap { dir =>
        val p = new Path(s"$dir/_metadata.json")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) None
        else {
          val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
          val in = fs.open(p)
          val meta =
            try mapper.readValue(in: java.io.InputStream, classOf[JobMetaData])
            finally in.close()
          if (meta.jobName != jobName) None
          else Some(JobStatusInfo(meta.jobName, meta.jobOwner, meta.operation,
            meta.mode, JobState.Completed, 100.0, Nil, Nil,
            Instant.now(), Some(Instant.now())))
        }
      }
    }

  /** Sleep-loop completion poll (job.py:317-320,390-409). */
  def pollForCompletion(
      jobName: String,
      pollIntervalMs: Long = 1000,
      timeoutMs: Long = 120000): JobState = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      JobRegistry.get(jobName) match {
        case Some(info) if info.state.isTerminal => return info.state
        case _ => Thread.sleep(pollIntervalMs)
      }
    }
    JobState.Unknown
  }
}
