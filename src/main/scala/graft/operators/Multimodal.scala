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
    * produces. Features are exact integer counts (a 16-bin byte
    * histogram) so the downstream exploded form is oracle-checkable
    * bit-for-bit. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(LongType))))

  /** STUB DECODER — deterministic fake standing in for
    * image/audio decode (no codec libs in this container). Derives a
    * 16-bin byte histogram "feature vector" and fake dimensions from
    * payload bytes. Swap this function body for a real decoder;
    * the mapPartitions batch shape stays.
    */
  private def fakeDecode(docId: Long, payload: Array[Byte]): Row = {
    val hist = new Array[Long](16)
    payload.foreach(b => hist((b & 0xFF) / 16) += 1L)
    Row(docId, 64 + (docId % 8).toInt * 16, 64 + (docId % 5).toInt * 16,
      hist.toSeq)
  }

  /** Partition-parallel decode/feature-extract: mapPartitions keeps
    * per-partition batch semantics (a real decoder amortizes codec
    * init per partition, exactly here). The feature vector is exploded
    * to scalar (doc_id, bin_idx, n_in_bin) rows so the result is
    * sortable/hashable by any downstream comparator. */
  def decodeFeatures(spark: SparkSession, sf: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    binarized(spark, sf)
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // real pipeline: init codec once per partition here
        rows.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
      .select(col("doc_id"), col("width"), col("height"),
        posexplode(col("features")).as(Seq("bin_idx", "n_in_bin")))
      .select(col("doc_id"), col("width"), col("height"),
        col("bin_idx").cast("long").as("bin_idx"), col("n_in_bin"))
      .orderBy(col("doc_id"), col("bin_idx"))
  }

  /** Resize stage: area-pooling on the decoded features — the 16-bin
    * histogram downsamples to 4 coarse bins by EXACT integer summation
    * and the frame dimensions halve, the arithmetic shape of an image
    * resize. Runs on the decode output (kernel-swap point untouched)
    * and stays oracle-checkable bit-for-bit because pooling is integer
    * addition, not float interpolation. */
  def resizePool(spark: SparkSession, sf: String, factor: Int = 4): DataFrame =
    decodeFeatures(spark, sf)
      .groupBy(col("doc_id"), col("width"), col("height"),
        floor(col("bin_idx") / factor).cast("long").as("pool_idx"))
      .agg(sum(col("n_in_bin")).as("n_pooled"))
      .select(col("doc_id"),
        (col("width") / 2).cast("int").as("out_width"),
        (col("height") / 2).cast("int").as("out_height"),
        col("pool_idx"), col("n_pooled"))
      .orderBy(col("doc_id"), col("pool_idx"))

  /** Frame sampling over a binary "video" payload: take every k-th
    * byte window as a frame digest — the stride/window plumbing of
    * real frame extraction, column-only. */
  def frameSample(spark: SparkSession, sf: String, stride: Int = 64): DataFrame =
    binarized(spark, sf)
      // empty payloads have no frames — filtered on BOTH sides (the
      // DuckDB oracle's generate_series is empty for them; an unguarded
      // greatest(0, …) here would emit a phantom frame 0)
      .filter(octet_length(col("payload")) > 0)
      .select(col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0),
              floor((octet_length(col("payload")) - 1) / stride).cast("int")),
            i => md5(col("payload").substr(i * stride + 1, lit(stride)))))
        .as(Seq("frame_idx", "frame_digest")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_digest"))
      .orderBy(col("doc_id"), col("frame_idx"))
}
