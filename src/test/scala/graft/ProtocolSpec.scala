package graft

import graft.model.JobState
import graft.request.Protocol
import graft.sources.DumpFileSet
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.time.LocalDate

class ProtocolSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def tmp(p: String) = graft.TempDirs.create(p)

  test("SUBMIT export -> STATUS -> import round-trip over the JSON protocol") {
    val dump = tmp("proto-dump"); val tgt = tmp("proto-tgt")
    val submit =
      s"""{"connection": {"source_dir": "$sf", "target_dir": "$dump", "schema": "hr"},
          "request": "SUBMIT",
          "payload": {"operation": "EXPORT", "mode": "TABLE", "wait": true,
            "directives": [
              {"name": "INCLUDE_TABLE", "value": "region,nation"},
              {"name": "PARALLEL", "value": "2"}]}}"""
    val r1 = Protocol.handle(spark, submit)
    assert(r1.error.isEmpty, r1.error)
    assert(r1.state == "COMPLETED")
    assert(r1.jobName.exists(_.startsWith("EXP-HR-")))
    assert(r1.detail.exists(_.totalRows == 30))

    val status =
      s"""{"connection": {"source_dir": "$sf"}, "request": "STATUS",
          "payload": {"job_name": "${r1.jobName.get}"}}"""
    val r2 = Protocol.handle(spark, status)
    assert(r2.state == "COMPLETED" && r2.detail.nonEmpty)

    val imp =
      s"""{"connection": {"source_dir": "$dump", "target_dir": "$tgt", "schema": "hr"},
          "request": "SUBMIT",
          "payload": {"operation": "IMPORT", "mode": "FULL", "wait": true,
            "directives": [
              {"name": "REMAP_SCHEMA", "old_value": "hr", "value": "hr2"},
              {"name": "TABLE_EXISTS_ACTION", "value": "REPLACE"}]}}"""
    val r3 = Protocol.handle(spark, imp)
    assert(r3.state == "COMPLETED", r3.toJson)
    assert(spark.read.parquet(s"$tgt/hr2/region").count() == 5)
    // response JSON is parseable and carries detail
    assert(r3.toJson.contains("\"state\":\"COMPLETED\""))
  }

  test("async SUBMIT returns EXECUTING; POLL reaches terminal state") {
    val dump = tmp("proto-async")
    val submit =
      s"""{"connection": {"source_dir": "$sf", "target_dir": "$dump"},
          "request": "SUBMIT",
          "payload": {"operation": "EXPORT", "mode": "TABLE", "wait": false,
            "directives": [{"name": "INCLUDE_TABLE", "value": "region"}]}}"""
    val r = Protocol.handle(spark, submit)
    assert(r.state == "EXECUTING")
    val poll =
      s"""{"connection": {"source_dir": "$sf"}, "request": "POLL",
          "payload": {"job_name": "${r.jobName.get}", "job_owner": "spark", "rate": 1}}"""
    val r2 = Protocol.handle(spark, poll)
    assert(r2.state == "COMPLETED")
  }

  test("malformed requests produce error responses, not exceptions") {
    assert(Protocol.handle(spark, "{}").error.nonEmpty)
    assert(Protocol.handle(spark,
      """{"connection": {"source_dir": "/x"}, "request": "FROB",
         "payload": {}}""").error.exists(_.contains("FROB")))
    assert(Protocol.handle(spark,
      """{"connection": {"source_dir": "/x"}, "request": "SUBMIT",
         "payload": {"operation": "EXPORT", "mode": "TABLE",
           "directives": [{"name": "NO_SUCH_DIRECTIVE", "value": "1"}]}}""")
      .error.exists(_.contains("NO_SUCH_DIRECTIVE")))
    // STATUS for unknown job: NOT_RUNNING, matching attach-fallback
    assert(Protocol.handle(spark,
      """{"connection": {"source_dir": "/x"}, "request": "STATUS",
         "payload": {"job_name": "NOPE"}}""").state == "NOT_RUNNING")
  }

  test("STATUS verbosity mask gates each response section per bit (status.py:276-293)") {
    val dump = tmp("proto-mask")
    val submit =
      s"""{"connection": {"source_dir": "$sf", "target_dir": "$dump"},
          "request": "SUBMIT",
          "payload": {"operation": "EXPORT", "mode": "TABLE", "wait": true,
            "directives": [{"name": "INCLUDE_TABLE", "value": "region"}]}}"""
    val job = Protocol.handle(spark, submit).jobName.get
    def status(tpe: String) = Protocol.handle(spark,
      s"""{"connection": {"source_dir": "$sf"}, "request": "STATUS",
          "payload": {"job_name": "$job", "type": "$tpe"}}""")

    // ALL = 15: every section present
    val all = status("ALL")
    assert(all.mask == 15 && all.detail.exists(_.objects.nonEmpty))
    assert(all.detail.exists(_.operation == "EXPORT"))
    val allJson = all.toJson
    assert(allJson.contains("\"wip\"") && allJson.contains("\"errors\"") &&
      allJson.contains("\"percent_done\"") && allJson.contains("\"mask\":15"))

    // DESC = 2: description only — no objects, no numeric status, no wip
    val desc = status("DESC")
    assert(desc.mask == 2)
    assert(desc.detail.exists(d => d.operation == "EXPORT" && d.objects.isEmpty
      && d.percentDone == 0.0 && d.logEntries.isEmpty))
    val descJson = desc.toJson
    assert(descJson.contains("\"operation\"") &&
      !descJson.contains("\"percent_done\"") && !descJson.contains("\"wip\""))

    // ERROR = 8: only failed objects + error lines (clean job → empty)
    val err = status("ERROR")
    assert(err.mask == 8)
    assert(err.detail.exists(d => d.operation.isEmpty && d.objects.isEmpty))
    assert(err.toJson.contains("\"errors\"") && !err.toJson.contains("\"wip\""))

    // STATUS = WIP|STATUS|ERROR = 13: numbers + objects, no description
    val st = status("STATUS")
    assert(st.mask == 13)
    assert(st.detail.exists(d => d.operation.isEmpty && d.objects.nonEmpty &&
      d.percentDone == 100.0))

    // LOG_STATUS = 0: state only, no detail payload
    val log = status("LOG_STATUS")
    assert(log.mask == 0 && log.detail.isEmpty && log.state == "COMPLETED")

    // raw numeric mask on the wire (GET_STATUS mask param): 4 = STATUS
    val raw = status("4")
    assert(raw.mask == 4)
    assert(raw.detail.exists(d => d.objects.nonEmpty && d.operation.isEmpty &&
      d.logEntries.isEmpty))

    // unknown type → error response, not an exception
    assert(status("FROBNICATE").error.exists(_.contains("FROBNICATE")))
  }

  test("base64-enveloped requests decode (Lambda body parity)") {
    val dump = tmp("proto-b64")
    val raw =
      s"""{"connection": {"source_dir": "$sf", "target_dir": "$dump"},
          "request": "SUBMIT",
          "payload": {"operation": "EXPORT", "mode": "TABLE", "wait": true,
            "directives": [{"name": "INCLUDE_TABLE", "value": "region"}]}}"""
    val b64 = java.util.Base64.getEncoder.encodeToString(raw.getBytes("UTF-8"))
    assert(Protocol.handleBase64(spark, b64).state == "COMPLETED")
  }

  test("CLI flags flatten to protocol directives (cli.py:152-226 parity)") {
    val (op, opts, dirs, wait) = Main.parseArgs(Array(
      "export", "--source-dir", sf, "--target-dir", "/tmp/x",
      "--table", "lineitem", "--parallel", "4",
      "--remap-schema", "a:b", "--estimate-only", "--no-wait"))
    assert(op == "export" && !wait)
    assert(opts("mode") == "TABLE")
    assert(dirs.contains(Map("name" -> "PARALLEL", "value" -> "4")))
    assert(dirs.contains(Map("name" -> "REMAP_SCHEMA", "old_value" -> "a",
      "value" -> "b")))
    assert(dirs.contains(Map("name" -> "ESTIMATE_ONLY", "value" -> "1")))
    val json = Main.buildRequestJson(op, opts, dirs, wait)
    val parsed = Protocol.parse(json)
    assert(parsed.requestType == "SUBMIT")
  }

  test("extended CLI flags reach the directive registry (cli.py:152-226 sweep)") {
    val (op, opts, dirs, wait) = Main.parseArgs(Array(
      "export", "--source-dir", sf, "--target-dir", "/tmp/x",
      "--full", "--flashback-scn", "7", "--compression", "NONE",
      "--keep-master", "--estimate", "BLOCKS", "--include-metadata", "0",
      "--query", "l_quantity > 10"))
    assert(op == "export" && wait)
    assert(dirs.contains(Map("name" -> "FLASHBACK_SCN", "value" -> "7")))
    assert(dirs.contains(Map("name" -> "COMPRESSION", "value" -> "NONE")))
    assert(dirs.contains(Map("name" -> "KEEP_MASTER", "value" -> "1")))
    assert(dirs.contains(Map("name" -> "ESTIMATE", "value" -> "BLOCKS")))
    assert(dirs.contains(Map("name" -> "INCLUDE_METADATA", "value" -> "0")))
    assert(dirs.contains(Map("name" -> "QUERY", "value" -> "l_quantity > 10")))
    // every flag round-trips through the JSON protocol's registry
    dirs.foreach { d =>
      graft.directives.DirectiveCompiler.fromJson(
        d("name"), d.get("value"), d.get("old_value"))
    }
    // --tablespace selects TABLESPACE mode + prefix directive
    val (_, opts2, dirs2, _) = Main.parseArgs(Array(
      "export", "--source-dir", sf, "--tablespace", "warm/hr"))
    assert(opts2("mode") == "TABLESPACE")
    assert(dirs2.contains(
      Map("name" -> "INCLUDE_TABLESPACE", "value" -> "warm/hr")))
    // expdp alias + generic --directive escape hatch
    val (op3, _, dirs3, _) = Main.parseArgs(Array(
      "expdp", "--source-dir", sf, "--full",
      "--directive", "DUMP_FORMAT:orc",
      "--directive", "REMAP_TABLE:old_t:new_t"))
    assert(op3 == "export")
    assert(dirs3.contains(Map("name" -> "DUMP_FORMAT", "value" -> "orc")))
    assert(dirs3.contains(Map("name" -> "REMAP_TABLE",
      "old_value" -> "old_t", "value" -> "new_t")))
    dirs3.foreach { d =>
      graft.directives.DirectiveCompiler.fromJson(
        d("name"), d.get("value"), d.get("old_value"))
    }
    // a non-REMAP --directive value keeps its colons verbatim: only
    // REMAP_* names take the OLD:NEW split (the old 3-way split chopped
    // timestamp-bearing QUERY predicates apart)
    val (_, _, dirs4, _) = Main.parseArgs(Array(
      "export", "--source-dir", sf, "--full",
      "--directive", "QUERY:ts >= '2020-01-01 00:30:00'"))
    assert(dirs4.contains(
      Map("name" -> "QUERY", "value" -> "ts >= '2020-01-01 00:30:00'")))
  }

  // ---- service envelope (entrypoints/aws_lambda.py analog) ----

  test("envelope handler unwraps base64 bodies and shapes HTTP responses") {
    val dump = tmp("env-sub")
    val raw =
      s"""{"connection": {"source_dir": "$sf", "target_dir": "$dump"},
          "request": "SUBMIT",
          "payload": {"operation": "EXPORT", "mode": "TABLE", "wait": true,
            "directives": [{"name": "INCLUDE_TABLE", "value": "region"}]}}"""
    val b64 = java.util.Base64.getEncoder.encodeToString(raw.getBytes("UTF-8"))
    val event = s"""{"isBase64Encoded": true, "body": ${
      new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(b64)}}"""
    val resp = graft.request.Envelope.handle(spark, event)
    assert(resp.statusCode == 200, resp.body)
    assert(resp.headers("Content-Type") == "application/json")
    assert(resp.body.contains("\"state\":\"COMPLETED\""))
    // raw (un-enveloped) requests fall through to direct validation
    val resp2 = graft.request.Envelope.handle(spark, raw)
    assert(resp2.statusCode == 200, resp2.body)
    // garbage → 400 carrying both validation error keys
    val bad = graft.request.Envelope.handle(spark, "{nope")
    assert(bad.statusCode == 400)
    assert(bad.body.contains("RawValidationException") &&
      bad.body.contains("EnvelopeValidationException"))
    // unknown job → 404; unknown directive → 400
    val status = graft.request.Envelope.handle(spark,
      s"""{"connection": {"source_dir": "$sf"}, "request": "STATUS",
           "payload": {"job_name": "NO-SUCH"}}""")
    assert(status.statusCode == 404, status.body)
    val badDir = graft.request.Envelope.handle(spark,
      s"""{"connection": {"source_dir": "$sf", "target_dir": "$dump"},
           "request": "SUBMIT",
           "payload": {"operation": "EXPORT", "mode": "TABLE",
             "directives": [{"name": "NOT_A_DIRECTIVE", "value": "x"}]}}""")
    assert(badDir.statusCode == 400, badDir.body)
  }

  test("connection secrets resolve through the pluggable registry") {
    val dump = tmp("env-secret")
    val withSecret =
      s"""{"connection": {"secret": "prod/graft", "target_dir": "$dump"},
          "request": "SUBMIT",
          "payload": {"operation": "EXPORT", "mode": "TABLE", "wait": true,
            "directives": [{"name": "INCLUDE_TABLE", "value": "region"}]}}"""
    // no resolver installed: the RESOLVE_SECRETS gate rejects it
    graft.request.Envelope.setSecretResolver(None)
    val rejected = graft.request.Envelope.handle(spark, withSecret)
    assert(rejected.statusCode == 400)
    assert(rejected.body.contains("no secret resolver"))
    // resolver installed: secret fields merge into the connection
    graft.request.Envelope.setSecretResolver(Some(
      new graft.request.Envelope.SecretResolver {
        def resolve(name: String): Map[String, String] = {
          assert(name == "prod/graft")
          Map("source_dir" -> sf)
        }
      }))
    try {
      val ok = graft.request.Envelope.handle(spark, withSecret)
      assert(ok.statusCode == 200, ok.body)
      assert(ok.body.contains("\"state\":\"COMPLETED\""))
    } finally graft.request.Envelope.setSecretResolver(None)
  }

  test("STATUS recovers a finished job cross-process via the sidecar") {
    val dump = tmp("proto-status-attach")
    val sub = Protocol.handle(spark,
      s"""{"connection": {"source_dir": "$sf", "target_dir": "$dump"},
           "request": "SUBMIT",
           "payload": {"operation": "EXPORT", "mode": "TABLE", "wait": true,
             "directives": [{"name": "INCLUDE_TABLE", "value": "region"}]}}""")
    assert(sub.state == "COMPLETED")
    // simulate a fresh process: registry gone, sidecar+logfile survive
    graft.status.JobRegistry.clear()
    val status = Protocol.handle(spark,
      s"""{"connection": {"source_dir": "$dump"},
           "request": "STATUS",
           "payload": {"job_name": "${sub.jobName.get}"}}""")
    assert(status.state == "COMPLETED", status.error)
    // unknown job still reports NOT_RUNNING
    val missing = Protocol.handle(spark,
      s"""{"connection": {"source_dir": "$dump"},
           "request": "STATUS", "payload": {"job_name": "NOPE"}}""")
    assert(missing.state == "NOT_RUNNING")
  }

  test("attach degrades to log-parse when registry AND sidecar are both gone") {
    // job.py:330-349 parity: attach swallows JobNotFound and falls
    // back to a bare status handler — here, the logfile's terminal
    // line. Without the fallback a surviving dump dir would read as
    // "job never existed".
    val dump = tmp("proto-attach-logonly")
    val sub = Protocol.handle(spark,
      s"""{"connection": {"source_dir": "$sf", "target_dir": "$dump"},
           "request": "SUBMIT",
           "payload": {"operation": "EXPORT", "mode": "TABLE", "wait": true,
             "directives": [{"name": "INCLUDE_TABLE", "value": "region"}]}}""")
    assert(sub.state == "COMPLETED")
    val name = sub.jobName.get
    graft.status.JobRegistry.clear()
    val sidecar = new java.io.File(s"$dump/_metadata.json")
    assert(sidecar.isFile, "expected a sidecar to delete")
    assert(sidecar.delete())
    // direct attach: state recovered from the log line, owner captured
    val info = graft.job.DataPumpJob.attach(spark, name, Some(dump))
    assert(info.nonEmpty, "attach must degrade to log-parse, not None")
    assert(info.get.state == graft.model.JobState.Completed)
    assert(info.get.operation == "UNKNOWN" && info.get.mode == "UNKNOWN")
    // protocol STATUS path sees the same degrade
    val status = Protocol.handle(spark,
      s"""{"connection": {"source_dir": "$dump"},
           "request": "STATUS", "payload": {"job_name": "$name"}}""")
    assert(status.state == "COMPLETED", status.error)
    // a log claiming a DIFFERENT job name must not satisfy this attach
    assert(graft.job.DataPumpJob.attach(spark, "OTHER_JOB", Some(dump)).isEmpty)
  }

  test("DataPump client facade mirrors the reference's public API") {
    import graft.client.DataPump
    val dump = tmp("client-facade")
    // submit an async export, poll it to completion via the protocol
    val sub = DataPump.submit(spark,
      s"""{"connection": {"source_dir": "$sf", "target_dir": "$dump"},
           "request": "SUBMIT",
           "payload": {"operation": "EXPORT", "mode": "TABLE", "wait": false,
             "directives": [{"name": "INCLUDE_TABLE", "value": "region"}]}}""")
    assert(sub.jobName.nonEmpty)
    val polled = DataPump.pollForCompletion(spark, sf, sub.jobName.get)
    assert(polled.state == "COMPLETED")
    // logfile + dumpfile info through the same facade
    val log = DataPump.getLogfile(spark, dump).get
    assert(log.contains("successfully completed"))
    val info = DataPump.getDumpfileInfo(spark, s"$dump/main/region")
    assert(info.numRows == 5)
    // text file round-trip (ora_open analog)
    val w = DataPump.openFileWrite(spark, s"$dump/note.txt")
    w.write("hello graft\n"); w.close()
    val r = DataPump.openFileRead(spark, s"$dump/note.txt")
    try assert(r.readLine() == "hello graft") finally r.close()
    // chunked binary open
    val st = DataPump.openFileChunked(spark, s"$dump/note.txt", chunkSize = 4)
    try {
      val chunks = st.chunks().toSeq
      assert(chunks.map(_.length).sum == 12 && chunks.forall(_.length <= 4))
    } finally st.close()
  }

  // ---- dump-file-set name algebra (files.py:982-1063) ----

  test("%U expands to the parallel degree with 2-digit sequences") {
    assert(DumpFileSet.resolveForExport(Seq("exp_%U.dmp"), 3) ==
      Seq("exp_01.dmp", "exp_02.dmp", "exp_03.dmp"))
    // no %U and fewer names than parallel: the concrete file is kept
    // and a _%U member is appended to fill the set (files.py:794-808)
    assert(DumpFileSet.resolveForExport(Seq("exp.dmp"), 2) ==
      Seq("exp.dmp", "exp_01.dmp"))
    // enough fixed names: kept as-is
    assert(DumpFileSet.resolveForExport(Seq("a.dmp", "b.dmp"), 2) ==
      Seq("a.dmp", "b.dmp"))
    intercept[IllegalArgumentException](
      DumpFileSet.resolveForExport(Seq("x_%U.dmp"), 100))
  }

  test("date substitution variables expand (%D %M %Y %T)") {
    val d = LocalDate.of(2023, 7, 4)
    assert(DumpFileSet.substituteDateVars("exp_%T.dmp", d) == "exp_20230704.dmp")
    assert(DumpFileSet.substituteDateVars("e_%Y-%M-%D.dmp", d) ==
      "e_2023-07-04.dmp")
  }

  test("getInfo reads parquet footer as dump-file header info") {
    val info = DumpFileSet.getInfo(spark,
      graft.Tables.path(sf, "nation"))
    assert(info.numRows == 25)
    assert(info.numRowGroups >= 1)
    assert(info.schemaDdl.contains("n_nationkey"))
    assert(info.fileSizeBytes > 0)
  }

  test("resolveForImport lists dump members via glob") {
    val dump = tmp("proto-glob")
    val job = graft.job.DataPumpJob(graft.model.Operation.Export,
      graft.model.JobMode.Table, sf, dump,
      directives = Seq(graft.directives.IncludeTable(Seq("region")),
        graft.directives.Parallel(2)))
    assert(job.run(spark).state == JobState.Completed)
    val members = DumpFileSet.resolveForImport(spark, s"$dump/main/region",
      "part-*")
    assert(members.size == 2)
  }

  test("JDBC option building injects AS OF SCN and parallel bounds") {
    import graft.sources.Jdbc
    assert(Jdbc.dbtableFor("HR.EMPLOYEES") == "HR.EMPLOYEES")
    assert(Jdbc.dbtableFor("HR.EMPLOYEES", asOfScn = Some(12345L)) ==
      "(SELECT * FROM HR.EMPLOYEES AS OF SCN 12345)")
    assert(Jdbc.dbtableFor("T", asOfTimestampIso = Some("2023-06-01T12:00:00Z"))
      .contains("AS OF TIMESTAMP TO_TIMESTAMP('2023-06-01 12:00:00'"))
    val opts = Jdbc.readOptions("jdbc:oracle:thin:@db:1521/svc", "HR.EMP",
      parallel = 4, partitionColumn = Some("EMPLOYEE_ID"),
      lowerBound = Some(1), upperBound = Some(10000),
      asOfScn = Some(777))
    assert(opts("numPartitions") == "4")
    assert(opts("partitionColumn") == "EMPLOYEE_ID")
    assert(opts("dbtable").contains("AS OF SCN 777"))
    intercept[IllegalArgumentException](
      Jdbc.readOptions("jdbc:x", "T", parallel = 2))
  }
}
