package graft

import org.apache.spark.sql.SparkSession

/** Session-level compatibility settings the engine depends on.
  *
  * `spark.sql.legacy.parquet.nanosAsLong` has NO per-read datasource
  * option (ParquetOptions exposes only rebase/compression/mergeSchema),
  * so reading the nanosecond-timestamp `events` table requires a
  * session conf. Mutating a shared session from inside an operator is a
  * global side effect; every such set is therefore routed through this
  * single idempotent choke point, and the engine's own entry points
  * (Bench / Verify / Main / tests) apply it at session BUILD so the
  * operators' calls are no-ops there.
  */
object Sessions {
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Idempotently enable long-nanos parquet reads on this session. */
  def ensureEventTimestampCompat(spark: SparkSession): Unit =
    if (!spark.conf.getOption(NanosAsLongKey).contains("true"))
      spark.conf.set(NanosAsLongKey, "true")
}
