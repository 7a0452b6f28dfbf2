package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL-surface registration for the engine's custom Catalyst
  * expressions, in both forms Spark supports:
  *
  *  - `GraftExtensions` for `spark.sql.extensions=` /
  *    `.withExtensions(...)` at session build time;
  *  - `registerAll(spark)` for an existing session
  *    (createOrReplaceTempFunction).
  *
  * After registration, `SELECT dot_long(a, b)`, `minhash_sig(h)`,
  * `simhash_sig(h)`, `shingles(ws, 3)` work from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("dot_long"),
      info("dot_long", "dot_long(a, b) - integer dot product"),
      (es: Seq[Expression]) => DotLong(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("agree_count"),
      info("agree_count", "agree_count(a, b) - count of agreeing slots"),
      (es: Seq[Expression]) => AgreeCount(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("simhash_sig"),
      info("simhash_sig", "simhash_sig(hashes) - 64-bit simhash"),
      (es: Seq[Expression]) => SimHashSig(es(0))))
    ext.injectFunction((FunctionIdentifier("shingles"),
      info("shingles", "shingles(words, k) - distinct k-word shingles"),
      (es: Seq[Expression]) => Shingles(es(0),
        es(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("quantize_q"),
      info("quantize_q", "quantize_q(xs, scale) - floor(x*scale) as bigints"),
      (es: Seq[Expression]) => QuantizeQ(es(0),
        es(1).eval().toString.toDouble)))
    ext.injectFunction((FunctionIdentifier("sq_wdot"),
      info("sq_wdot", "sq_wdot(w, packed) - weighted dot over packed SQ8 codes"),
      (es: Seq[Expression]) => SqWdot(es(0), es(1))))
  }
}

object GraftExtensions {
  /** Register on a live session (temp functions). */
  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_long",
      (es: Seq[Expression]) => DotLong(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("agree_count",
      (es: Seq[Expression]) => AgreeCount(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash_sig",
      (es: Seq[Expression]) => SimHashSig(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("shingles",
      (es: Seq[Expression]) => Shingles(es(0),
        es(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"shingles k must be an integer literal, got $other")
        }), "scala_udf")
    reg.createOrReplaceTempFunction("quantize_q",
      (es: Seq[Expression]) => QuantizeQ(es(0),
        es(1).eval().toString.toDouble), "scala_udf")
    reg.createOrReplaceTempFunction("sq_wdot",
      (es: Seq[Expression]) => SqWdot(es(0), es(1)), "scala_udf")
  }
}
