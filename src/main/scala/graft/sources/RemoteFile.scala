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
  *
  * Paths are dispatched by URI scheme through a pluggable handler
  * registry — the analog of the reference's scheme→FileHandler map
  * (handlers.py:114-135): `file:`/schemeless/anything-Hadoop-mounted
  * hits the default Hadoop handler; deployments register custom
  * schemes (e.g. an object-store SDK that bypasses Hadoop) without
  * touching call sites.
  */
object RemoteFile {

  sealed trait Mode
  case object Read extends Mode
  case object Write extends Mode

  /** One scheme's byte-level open/create surface. */
  trait FileHandler {
    def openBinary(spark: SparkSession, path: String): java.io.InputStream
    def createBinary(spark: SparkSession, path: String,
        overwrite: Boolean): java.io.OutputStream
  }

  /** Default: whatever filesystem Hadoop resolves for the path
    * (local, hdfs, s3a, …) — the registry's fallback. */
  object HadoopHandler extends FileHandler {
    def openBinary(spark: SparkSession, path: String): java.io.InputStream = {
      val p = new Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    }
    def createBinary(spark: SparkSession, path: String,
        overwrite: Boolean): java.io.OutputStream = {
      val p = new Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .create(p, overwrite)
    }
  }

  private val handlers =
    scala.collection.concurrent.TrieMap.empty[String, FileHandler]

  /** Register a handler for a URI scheme (case-insensitive). Returns
    * any handler it displaced. */
  def register(scheme: String, handler: FileHandler): Option[FileHandler] =
    handlers.put(scheme.toLowerCase, handler)

  def unregister(scheme: String): Option[FileHandler] =
    handlers.remove(scheme.toLowerCase)

  /** Scheme of a path string, if it has one (`s3a://x/y` → s3a). */
  def schemeOf(path: String): Option[String] = {
    val i = path.indexOf("://")
    if (i <= 0) None
    else {
      val s = path.substring(0, i)
      if (s.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
        Some(s.toLowerCase)
      else None
    }
  }

  /** Resolve the handler for a path: registered scheme first, Hadoop
    * fallback otherwise. */
  def handlerFor(path: String): FileHandler =
    schemeOf(path).flatMap(handlers.get).getOrElse(HadoopHandler)

  def openBinary(spark: SparkSession, path: String): java.io.InputStream =
    handlerFor(path).openBinary(spark, path)

  def createBinary(spark: SparkSession, path: String,
      overwrite: Boolean = true): java.io.OutputStream =
    handlerFor(path).createBinary(spark, path, overwrite)

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

  // ---- chunked LOB-analog streaming ---------------------------------

  /** Default chunk: Oracle LOBs stream in `getchunksize() × 8` fetches
    * (the reference's LobStreamer, files.py:1073-1110, with
    * LOB_FETCH_SIZE_MULT); 32 KB mirrors the UTL_FILE RPC ceiling. On
    * the Spark side the same knob is the JDBC reader's `fetchsize`
    * option (rows per round trip — BLOB columns arrive as BinaryType
    * cells, `Jdbc.readOptions`). */
  val DefaultChunkSize: Int = 32 * 1024

  /** Position-tracked chunked reader over a (possibly multi-GB) binary
    * payload — the LobStreamer analog: each `read()` returns at most
    * `chunkSize` bytes, `complete` flips when the source is drained,
    * and memory stays bounded by one chunk regardless of payload size.
    */
  final class LobStream(in: java.io.InputStream,
      val chunkSize: Int = DefaultChunkSize) extends AutoCloseable {
    private var pos = 0L
    private var done = false
    def position: Long = pos
    def complete: Boolean = done

    /** Next chunk, or None once the payload is drained. */
    def read(): Option[Array[Byte]] = {
      if (done) return None
      val chunk = in.readNBytes(chunkSize)
      pos += chunk.length
      if (chunk.length < chunkSize) done = true
      if (chunk.isEmpty) None else Some(chunk)
    }

    /** Iterator view — chunks stream lazily, nothing is accumulated. */
    def chunks(): Iterator[Array[Byte]] =
      Iterator.continually(read()).takeWhile(_.isDefined).map(_.get)

    def close(): Unit = in.close()
  }

  /** Open a chunked stream over a file payload. */
  def openChunked(spark: SparkSession, path: String,
      chunkSize: Int = DefaultChunkSize): LobStream =
    new LobStream(openBinary(spark, path), chunkSize)

  /** Write a payload from a chunk iterator; returns bytes written.
    * Memory is bounded by the largest chunk. */
  def writeChunks(spark: SparkSession, path: String,
      chunks: Iterator[Array[Byte]], overwrite: Boolean = true): Long = {
    val out = createBinary(spark, path, overwrite)
    var n = 0L
    try { chunks.foreach { c => out.write(c); n += c.length }; n }
    finally out.close()
  }

  /** Chunked copy (LOB movement without materializing the payload);
    * returns bytes copied. */
  def copyChunked(spark: SparkSession, src: String, dst: String,
      chunkSize: Int = DefaultChunkSize, overwrite: Boolean = true): Long = {
    val in = openChunked(spark, src, chunkSize)
    try writeChunks(spark, dst, in.chunks(), overwrite) finally in.close()
  }
}
