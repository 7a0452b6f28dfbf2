package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Membership probe against a NON-CONSTANT Bloom-filter column —
  * the piece Spark lacks for a SHARDED sketch: the built-in
  * `BloomFilterMightContain` requires its filter side to be a literal
  * or scalar subquery (the runtime-filter shape), which forces the
  * whole sketch through the driver as one artifact. Here the sketch
  * stays a distributed `(bucket, bf)` table: probe rows meet their
  * shard's filter through a bucket-equality join and this expression
  * evaluates `mightContainLong(hash)` against the joined bytes.
  *
  * Deserialization is cached per (task-local) expression instance,
  * keyed by the bucket id — each task touches only the shards its
  * partition holds, so cached filter memory per task is
  * sketch-bytes / parallelism, exactly the sharding win. The cache is
  * a ConcurrentHashMap for driver-side interpreted eval, where one
  * instance can serve several threads; generated code (per-task
  * deserialized references) sees no contention. A defensive bound
  * clears it should a plan ever route unboundedly many buckets
  * through one instance.
  *
  * Null semantics: a NULL filter means the probe's bucket has no
  * corpus shard (left-join miss) — nothing was inserted there, so the
  * answer is definitionally `false` (not seen), never NULL. The
  * result is therefore non-nullable, matching the exact twin's
  * `seen IS NULL` accounting.
  */
case class BloomProbeBucketed(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  private def bucket = first
  private def bf = second
  private def hash = third

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_probe_bucketed"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (bucket.dataType, bf.dataType, hash.dataType) match {
      case (LongType, BinaryType, LongType) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"bloom_probe_bucketed requires (bigint, binary, bigint), got $other")
    }
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, org.apache.spark.util.sketch.BloomFilter]()

  /** Codegen/eval entry point: deserialize-once-per-bucket probe. */
  def probe(bkt: Long, bytes: Array[Byte], h: Long): Boolean = {
    if (cache.size() > 4096) cache.clear() // defensive bound, see doc
    val filter = cache.computeIfAbsent(bkt, _ =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes)))
    filter.mightContainLong(h)
  }

  override def eval(input: InternalRow): Any = {
    val b = bucket.eval(input)
    val h = hash.eval(input)
    if (b == null || h == null) false
    else {
      val bytes = bf.eval(input)
      if (bytes == null) false
      else probe(b.asInstanceOf[Long], bytes.asInstanceOf[Array[Byte]],
        h.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomProbeSelf", this,
      classOf[BloomProbeBucketed].getName)
    val b = bucket.genCode(ctx)
    val f = bf.genCode(ctx)
    val h = hash.genCode(ctx)
    ev.copy(code = code"""
      ${b.code}
      ${f.code}
      ${h.code}
      boolean ${ev.value} = false;
      if (!${b.isNull} && !${f.isNull} && !${h.isNull}) {
        ${ev.value} = $self.probe(${b.value}, ${f.value}, ${h.value});
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BloomProbeBucketed =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BloomProbe {
  /** Column wrapper: probe `hash` against the `bf` shard of `bucket`.
    * NULL bf (bucket with no corpus shard) probes to false. */
  def bloom_probe_bucketed(bucket: Column, bf: Column, hash: Column): Column =
    Bridge.column(BloomProbeBucketed(Bridge.expression(bucket),
      Bridge.expression(bf), Bridge.expression(hash)))
}
