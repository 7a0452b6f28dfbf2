package graft.client

import graft.request.Protocol
import graft.sources.{DumpFileSet, RemoteFile}
import org.apache.spark.sql.SparkSession

import java.io.{BufferedReader, Writer}

/** The public client facade — mirrors the reference's `DataPump` class
  * (client.py:20-76) method-for-method so a reference user's call sites
  * translate directly:
  *
  * | reference                     | graft                    |
  * |-------------------------------|--------------------------|
  * | `DataPump.submit(json)`       | `DataPump.submit`        |
  * | `DataPump.open_file(f, mode)` | `openFileRead/Write`     |
  * | `DataPump.get_dumpfile_info`  | `getDumpfileInfo`        |
  * | `DataPump.get_logfile`        | `getLogfile`             |
  * | `DataPump.poll_for_completion`| `pollForCompletion`      |
  *
  * The reference's `connection` argument (SQL*Net coordinates) becomes
  * the SparkSession — the engine's own execution context.
  */
object DataPump {

  /** Submit a JSON protocol request (SUBMIT/STATUS/POLL/STOP). */
  def submit(spark: SparkSession, requestJson: String): Protocol.Response =
    Protocol.handle(spark, requestJson)

  /** `open_file(mode="r")`: buffered text reader over any registered
    * scheme (ora_open analog). */
  def openFileRead(spark: SparkSession, path: String,
      encoding: String = "UTF-8"): BufferedReader =
    RemoteFile.openText(spark, path, encoding)

  /** `open_file(mode="w")`. */
  def openFileWrite(spark: SparkSession, path: String,
      encoding: String = "UTF-8"): Writer =
    RemoteFile.createText(spark, path, encoding)

  /** `open_file(mode="rb")`: bounded-chunk LOB stream. */
  def openFileChunked(spark: SparkSession, path: String,
      chunkSize: Int = RemoteFile.DefaultChunkSize): RemoteFile.LobStream =
    RemoteFile.openChunked(spark, path, chunkSize)

  /** Dump-table header decode (get_dumpfile_info, client.py:46-53).
    * Accepts a part file, or a dump-table DIRECTORY (resolved to its
    * first part file — the reference takes concrete dumpfile names;
    * our dump tables are part-file sets). */
  def getDumpfileInfo(spark: SparkSession,
      path: String): DumpFileSet.DumpFileInfo = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target =
      if (fs.exists(p) && fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .find(_.getName.startsWith("part-"))
          .getOrElse(throw new IllegalArgumentException(
            s"no part files under $path"))
          .toString
      else path
    DumpFileSet.getInfo(spark, target)
  }

  /** Job logfile text from a dump dir (get_logfile, client.py:56-60). */
  def getLogfile(spark: SparkSession, dumpDir: String): Option[String] =
    graft.job.DataPumpJob.getLogfile(spark, dumpDir)

  /** Sleep-loop poll via the protocol (poll_for_completion,
    * client.py:62-76): same wire shape, same response envelope. */
  def pollForCompletion(spark: SparkSession, sourceDir: String,
      jobName: String, jobOwner: String = "spark",
      rate: Int = 1): Protocol.Response =
    submit(spark,
      s"""{"connection": {"source_dir": ${jsonStr(sourceDir)}},
           "request": "POLL",
           "payload": {"job_name": ${jsonStr(jobName)},
             "job_owner": ${jsonStr(jobOwner)}, "rate": $rate}}""")

  private def jsonStr(s: String): String =
    new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(s)
}
