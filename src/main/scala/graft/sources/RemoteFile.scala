package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, Writer}
import java.nio.charset.Charset

/** `open()`-style factory over engine-visible files — the analog of
  * the reference's remote Oracle file access (`ora_open`,
  * files.py:707-766; reader/writer, files.py:488-656). Oracle forced
  * 32 KB RPC chunks over UTL_FILE; the Hadoop FS API already streams
  * and buffers, so these wrappers only add the mode × text/binary
  * surface and encoding handling.
  */
object RemoteFile {

  sealed trait Mode
  case object Read extends Mode
  case object Write extends Mode

  def openBinary(spark: SparkSession, path: String): java.io.InputStream = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
  }

  def createBinary(spark: SparkSession, path: String,
      overwrite: Boolean = true): java.io.OutputStream = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, overwrite)
  }

  def openText(spark: SparkSession, path: String,
      encoding: String = "UTF-8"): BufferedReader =
    new BufferedReader(new InputStreamReader(
      openBinary(spark, path), Charset.forName(encoding)))

  def createText(spark: SparkSession, path: String,
      encoding: String = "UTF-8", overwrite: Boolean = true): Writer =
    new OutputStreamWriter(
      createBinary(spark, path, overwrite), Charset.forName(encoding))

  /** Read an entire text file (log/sidecar-sized). */
  def readAllText(spark: SparkSession, path: String,
      encoding: String = "UTF-8"): String = {
    val in = openBinary(spark, path)
    try new String(in.readAllBytes(), encoding) finally in.close()
  }

  /** Line iterator — the `readline` surface the log parser consumes. */
  def readLines(spark: SparkSession, path: String,
      encoding: String = "UTF-8"): Seq[String] = {
    val r = openText(spark, path, encoding)
    try Iterator.continually(r.readLine()).takeWhile(_ != null).toSeq
    finally r.close()
  }
}
