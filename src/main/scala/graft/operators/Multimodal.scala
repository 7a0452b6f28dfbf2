package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode/feature-extract
  * stages.
  *
  * The container has no codec libraries, so the *decode* kernel is a
  * clearly-marked deterministic fake; everything around it — schema,
  * batch shape, partition-parallel execution via mapPartitions, typed
  * output structs — is the real plumbing a production pipeline would
  * keep while swapping the kernel for libjpeg/ffmpeg bindings.
  */
object Multimodal {

  /** Synthesize a binary "media" column from document text (the
    * harness has no media tables; payload bytes are UTF-8 text, which
    * keeps every downstream byte-level op real). */
  def binarized(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))

  /** Byte-level metadata over binary payloads — size, content digest,
    * magic-prefix — the columnar part of media ingestion (fully
    * codegen'd, oracle-checkable). */
  def binaryMeta(spark: SparkSession, sf: String): DataFrame =
    binarized(spark, sf)
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        substring(col("payload"), 1, 4).cast("string").as("magic"))
      .orderBy(col("doc_id"))

  /** Output schema of the fake decoder: fixed-size feature vector +
    * dimensions — the shape a real image decode/resize/embed stage
    * produces. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(DoubleType))))

  /** STUB DECODER — deterministic fake standing in for
    * image/audio decode (no codec libs in this container). Derives a
    * 16-bin byte histogram "feature vector" and fake dimensions from
    * payload bytes. Swap this function body for a real decoder;
    * the mapPartitions batch shape stays.
    */
  private def fakeDecode(docId: Long, payload: Array[Byte]): Row = {
    val hist = new Array[Double](16)
    payload.foreach(b => hist((b & 0xFF) / 16) += 1.0)
    val n = math.max(payload.length, 1)
    Row(docId, 64 + (docId % 8).toInt * 16, 64 + (docId % 5).toInt * 16,
      hist.map(_ / n).toSeq)
  }

  /** Partition-parallel decode/feature-extract: mapPartitions keeps
    * per-partition batch semantics (a real decoder amortizes codec
    * init per partition, exactly here). */
  def decodeFeatures(spark: SparkSession, sf: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    binarized(spark, sf)
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // real pipeline: init codec once per partition here
        rows.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
      .orderBy(col("doc_id"))
  }

  /** Frame sampling over a binary "video" payload: take every k-th
    * byte window as a frame digest — the stride/window plumbing of
    * real frame extraction, column-only. */
  def frameSample(spark: SparkSession, sf: String, stride: Int = 64): DataFrame =
    binarized(spark, sf)
      .select(col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0),
              greatest(lit(0),
                floor((octet_length(col("payload")) - 1) / stride).cast("int"))),
            i => md5(col("payload").substr(i * stride + 1, lit(stride)))))
        .as(Seq("frame_idx", "frame_digest")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_digest"))
      .orderBy(col("doc_id"), col("frame_idx"))
}
