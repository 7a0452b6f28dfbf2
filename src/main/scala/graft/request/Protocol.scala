package graft.request

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.directives.{Directive, DirectiveCompiler}
import graft.job.DataPumpJob
import graft.model.{JobMode, JobState, Operation}
import graft.status.{JobRegistry, JobStatusInfo}
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** JSON request protocol — wire-compatible with the reference's
  * SUBMIT/STATUS/POLL surface (request.py:31-273) so clients are
  * portable:
  *
  * {{{
  * {"connection": {"source_dir": "...", "target_dir": "...", "schema": "..."},
  *  "request": "SUBMIT",
  *  "payload": {"operation": "EXPORT", "mode": "TABLE", "wait": true,
  *              "tag": null,
  *              "directives": [{"name": "INCLUDE_TABLE", "value": "nation"},
  *                             {"name": "REMAP_SCHEMA", "old_value": "A",
  *                              "value": "B"}]}}
  * }}}
  *
  * The reference's `connection` block carries Oracle SQL*Net
  * coordinates; ours carries the Spark-side source/target locations
  * (plus an optional JDBC url for production use). Handlers are a
  * registry keyed by request type, mirroring
  * `RequestHandler.__init_subclass__` (request.py:112-124).
  */
object Protocol {
  private val mapper = new ObjectMapper()

  case class Connection(sourceDir: String, targetDir: String,
      schema: String, jdbcUrl: Option[String])

  sealed trait Payload
  case class SubmitPayload(operation: Operation, mode: JobMode, waitDone: Boolean,
      dumpfiles: Seq[String], directives: Seq[Directive], tag: Option[String])
    extends Payload
  case class StatusPayload(jobName: String, jobOwner: String,
      statusType: String, includeDetail: Boolean) extends Payload
  case class PollPayload(jobName: String, jobOwner: String, rate: Int)
    extends Payload
  case class StopPayload(jobName: String, jobOwner: String) extends Payload

  case class Request(connection: Connection, requestType: String,
      payload: Payload)

  /** Status-verbosity bitmask — JobStatusMask (status.py:276-281):
    * each bit gates one section of the STATUS response. */
  object StatusMask {
    val Wip = 1     // work-in-progress log lines
    val Desc = 2    // job description (operation, mode)
    val Status = 4  // numeric status + per-object detail
    val Error = 8   // error log lines / failed objects
    val All: Int = Wip | Desc | Status | Error
  }

  case class Response(jobName: Option[String], state: String,
      detail: Option[JobStatusInfo], error: Option[String],
      mask: Int = StatusMask.All) {
    def toJson: String = {
      val root = mapper.createObjectNode()
      jobName.foreach(root.put("job_name", _))
      root.put("state", state)
      detail.foreach { d =>
        val det = root.putObject("detail")
        det.put("job_name", d.jobName)
        det.put("mask", mask)
        if ((mask & StatusMask.Desc) != 0) {
          det.put("operation", d.operation)
          det.put("mode", d.mode)
        }
        if ((mask & StatusMask.Status) != 0) {
          det.put("percent_done", d.percentDone)
          det.put("rows", d.totalRows)
          det.put("bytes", d.totalBytes)
        }
        if ((mask & (StatusMask.Status | StatusMask.Error)) != 0) {
          val objs = det.putArray("objects")
          d.objects.foreach { o =>
            val n = objs.addObject()
            n.put("name", o.objectName); n.put("state", o.state)
            if (o.objectSchema.nonEmpty) n.put("schema", o.objectSchema)
            n.put("rows", o.rows); n.put("bytes", o.bytes)
            o.error.foreach(n.put("error", _))
          }
        }
        if ((mask & StatusMask.Wip) != 0) {
          val wip = det.putArray("wip")
          d.logEntries.foreach(e => wip.add(e.logText))
        }
        if ((mask & StatusMask.Error) != 0) {
          val errs = det.putArray("errors")
          d.errors.foreach(errs.add)
        }
      }
      error.foreach(root.put("error", _))
      mapper.writeValueAsString(root)
    }
  }

  // ---- parsing ------------------------------------------------------

  private def textOpt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)

  private def req(n: JsonNode, field: String, ctx: String): JsonNode =
    Option(n.get(field)).filterNot(_.isNull).getOrElse(
      throw new graft.model.Exceptions.BadRequest(
        s"$ctx requires field '$field'"))

  def parse(json: String): Request = {
    val root = mapper.readTree(json)
    val connNode = req(root, "connection", "request")
    val conn = Connection(
      sourceDir = req(connNode, "source_dir", "connection").asText,
      targetDir = textOpt(connNode, "target_dir").getOrElse(""),
      schema = textOpt(connNode, "schema").getOrElse("main"),
      jdbcUrl = textOpt(connNode, "jdbc_url"))
    val requestType = req(root, "request", "request").asText.toUpperCase
    val payloadNode = req(root, "payload", "request")
    val payload = requestType match {
      case "SUBMIT" =>
        val directives = Option(payloadNode.get("directives"))
          .filterNot(_.isNull).map(_.elements().asScala.toSeq).getOrElse(Nil)
          .map { d =>
            DirectiveCompiler.fromJson(
              req(d, "name", "directive").asText,
              textOpt(d, "value"), textOpt(d, "old_value"))
          }
        SubmitPayload(
          operation = Operation.fromString(
            req(payloadNode, "operation", "SUBMIT payload").asText),
          mode = JobMode.fromString(
            req(payloadNode, "mode", "SUBMIT payload").asText),
          waitDone = Option(payloadNode.get("wait")).exists(_.asBoolean(false)),
          dumpfiles = Option(payloadNode.get("dumpfiles")).filterNot(_.isNull)
            .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil),
          directives = directives,
          tag = textOpt(payloadNode, "tag"))
      case "STATUS" =>
        StatusPayload(
          jobName = req(payloadNode, "job_name", "STATUS payload").asText,
          jobOwner = textOpt(payloadNode, "job_owner").getOrElse("spark"),
          statusType = textOpt(payloadNode, "type").getOrElse("ALL"),
          includeDetail = Option(payloadNode.get("include_detail"))
            .forall(_.asBoolean(true)))
      case "POLL" =>
        PollPayload(
          jobName = req(payloadNode, "job_name", "POLL payload").asText,
          jobOwner = textOpt(payloadNode, "job_owner").getOrElse("spark"),
          rate = Option(payloadNode.get("rate")).map(_.asInt(1)).getOrElse(1))
      case "STOP" =>
        StopPayload(
          jobName = req(payloadNode, "job_name", "STOP payload").asText,
          jobOwner = textOpt(payloadNode, "job_owner").getOrElse("spark"))
      case other =>
        throw new graft.model.Exceptions.BadRequest(
          s"Unknown request type '$other'; valid: SUBMIT, STATUS, POLL, STOP")
    }
    Request(conn, requestType, payload)
  }

  // ---- handlers (registry dispatch, request.py:112-243) ------------

  def handle(spark: SparkSession, json: String): Response =
    try {
      val r = parse(json)
      r.payload match {
        case p: SubmitPayload => handleSubmit(spark, r.connection, p)
        case p: StatusPayload => handleStatus(spark, r.connection, p)
        case p: PollPayload => handlePoll(p)
        case p: StopPayload => handleStop(spark, p)
      }
    } catch {
      case NonFatal(e) =>
        Response(None, JobState.Unknown.name, None, Some(e.toString))
    }

  private def handleSubmit(spark: SparkSession, conn: Connection,
      p: SubmitPayload): Response = {
    val sourceDir = p.operation match {
      case Operation.Import => p.dumpfiles.headOption.getOrElse(conn.sourceDir)
      case _ => conn.sourceDir
    }
    val job = DataPumpJob(p.operation, p.mode, sourceDir, conn.targetDir,
      directives = p.directives, schema = conn.schema, tag = p.tag)
    val info = job.run(spark, wait = p.waitDone)
    Response(Some(info.jobName), info.state.name,
      if (p.waitDone) Some(info) else None, None)
  }

  private def handleStatus(spark: SparkSession, conn: Connection,
      p: StatusPayload): Response =
    // registry probe first; cross-process attach recovers from the
    // metadata sidecar + logfile under the connection's source dir
    // (strategy 2 — the wire form of job.attach, job.py:330-349)
    JobRegistry.get(p.jobName)
      .orElse(DataPumpJob.attach(spark, p.jobName,
        Some(conn.sourceDir).filter(_.nonEmpty))) match {
      case Some(info) =>
        // Status-type → verbosity bitmask, exactly the reference's
        // JobStatusRequestType values (status.py:283-293): ALL=15,
        // STATUS=WIP|STATUS|ERROR=13, DESC=2, ERROR=8, LOG_STATUS=0
        // (state-only, the log-derived probe). A numeric type passes
        // the raw mask through — the DBMS_DATAPUMP.GET_STATUS `mask`
        // parameter on the wire.
        val mask = p.statusType.toUpperCase.trim match {
          case m if m.nonEmpty && m.forall(_.isDigit) =>
            m.toInt & StatusMask.All
          case "ALL" => StatusMask.All
          case "STATUS" =>
            StatusMask.Wip | StatusMask.Status | StatusMask.Error
          case "DESC" => StatusMask.Desc
          case "ERROR" => StatusMask.Error
          case "LOG_STATUS" => 0
          case other =>
            throw new graft.model.Exceptions.BadRequest(
              s"Unknown STATUS type '$other'; valid: ALL, STATUS, DESC, " +
                "ERROR, LOG_STATUS, or a numeric mask")
        }
        // The detail payload itself is filtered per bit so programmatic
        // clients see exactly what the JSON carries: STATUS keeps all
        // objects, ERROR alone keeps only failed ones, WIP keeps the
        // log lines, DESC the description.
        val masked = info.copy(
          operation = if ((mask & StatusMask.Desc) != 0) info.operation else "",
          mode = if ((mask & StatusMask.Desc) != 0) info.mode else "",
          percentDone =
            if ((mask & StatusMask.Status) != 0) info.percentDone else 0.0,
          objects =
            if ((mask & StatusMask.Status) != 0) info.objects
            else if ((mask & StatusMask.Error) != 0)
              info.objects.filter(_.error.nonEmpty)
            else Nil,
          logEntries =
            if ((mask & StatusMask.Wip) != 0) info.logEntries else Nil)
        val detail =
          if (!p.includeDetail || mask == 0) None else Some(masked)
        Response(Some(info.jobName), info.state.name, detail, None, mask)
      case None =>
        Response(Some(p.jobName), JobState.NotRunning.name, None,
          Some(s"Job ${p.jobName} not found"))
    }

  /** STOP_JOB: flag + cancel; the response reflects the post-request
    * view (STOP_PENDING while the job unwinds, the job's final state
    * once it is already terminal, NOT_RUNNING when unknown). */
  private def handleStop(spark: SparkSession, p: StopPayload): Response =
    JobRegistry.get(p.jobName) match {
      case Some(info) if !info.state.isTerminal =>
        DataPumpJob.stop(spark, p.jobName)
        val now = JobRegistry.get(p.jobName).map(_.state)
          .getOrElse(JobState.StopPending)
        Response(Some(p.jobName), now.name, None, None)
      case Some(info) =>
        Response(Some(p.jobName), info.state.name, None, None)
      case None =>
        Response(Some(p.jobName), JobState.NotRunning.name, None,
          Some(s"Job ${p.jobName} not found"))
    }

  private def handlePoll(p: PollPayload): Response = {
    val state = DataPumpJob.pollForCompletion(p.jobName,
      pollIntervalMs = math.max(1, p.rate) * 1000L)
    Response(Some(p.jobName), state.name, JobRegistry.get(p.jobName), None)
  }

  /** Base64 envelope decode (aws_lambda.py:141-148 analog): accepts a
    * base64-wrapped request body. */
  def handleBase64(spark: SparkSession, b64: String): Response =
    handle(spark, new String(
      java.util.Base64.getDecoder.decode(b64.trim), "UTF-8"))
}
