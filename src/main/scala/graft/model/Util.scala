package graft.model

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDateTime, ZoneOffset, ZonedDateTime}

/** Pure utilities mirroring the reference's client-side helpers
  * (/root/reference/src/oracledb_datapump/util.py:16-37,67-73;
  * job.py:88-125; constants.py:4,17-18).
  */
object Util {
  val NameDelim = "-"
  val TagDelim = "#"
  /** yyyyMMddHHmmssSSSSSS — %Y%m%d%H%M%S%f (constants.py:4). */
  val DateFmt: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSSSSS")
  val JobNameMax = 128
  val IdentMax = 32

  /** k8s-style middle truncation preserving first/last char and embedding
    * the dropped-char count (semantics of util.py:16-37). Examples:
    * stringShortener("abcdefghij", 8) == "abcdef3j" is NOT the shape —
    * the embedded number counts dropped chars including its own digits.
    */
  def stringShortener(s: String, max: Int): String = {
    if (s == null || s.length <= max) return s
    if (max <= 2 || s.length <= 2) return s.take(max)
    val start = s.head
    val mid = s.substring(1, s.length - 1)
    val end = s.last
    val nOver = s.length - max
    val nDrop = nOver + nOver.toString.length
    val keep0 = if (nDrop >= mid.length) "" else mid.dropRight(nDrop)
    val over = digits10(nDrop) - digits10(nOver)
    val keep = if (over > 0) keep0.dropRight(over) else keep0
    val short = s"$start$keep$nDrop$end"
    if (short.length > max) stringShortener(short, max) else short
  }

  private def digits10(n: Int): Int = math.log10(n.toDouble).toInt

  /** ISO-8601 parse (util.py:67-73). Accepts date-time with optional
    * offset; returns an Instant (UTC) — naive strings are taken as UTC.
    */
  def parseDt(s: String): Instant =
    try ZonedDateTime.parse(s).toInstant
    catch {
      case _: Exception =>
        try LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)
        catch {
          case _: Exception =>
            throw new IllegalArgumentException(s"Invalid ISO datetime string: $s")
        }
    }

  def formatJobDate(i: Instant): String =
    LocalDateTime.ofInstant(i, ZoneOffset.UTC).format(DateFmt)

  /** Deterministic job-name synthesis (job.py:88-125):
    * `OP-IDENT-YYYYMMDDHHMMSSffffff` with optional `-#tag#` infix on the
    * ident; EXPORT ident = schema list, IMPORT-with-remap ident =
    * `A-TO-B`, else owner. Ident capped at 32, full name at 128.
    */
  def jobName(
      operation: Operation,
      jobDate: Instant,
      schemas: Seq[String] = Nil,
      remapSchema: Option[(String, String)] = None,
      jobOwner: Option[String] = None,
      tag: Option[String] = None): String = {
    val baseIdent = (operation, schemas, remapSchema) match {
      case (Operation.Export, ss, _) if ss.nonEmpty => ss.mkString(NameDelim)
      case (Operation.Import, _, Some((from, to))) =>
        Seq(from, "TO", to).mkString(NameDelim)
      case _ => jobOwner.map(_.toUpperCase).getOrElse("")
    }
    val ident = tag.fold(baseIdent)(t =>
      baseIdent + NameDelim + TagDelim + t + TagDelim)
    val abbrv = operation.name.take(3)
    stringShortener(
      Seq(abbrv, stringShortener(ident, IdentMax), formatJobDate(jobDate))
        .mkString(NameDelim),
      JobNameMax)
  }

  /** `"A:B"` → (A, B) (util.py:76-82, cli.py:178-209). */
  def parseColonDelimited(v: String): (String, String) = v.split(":", 2) match {
    case Array(a, b) => (a, b)
    case _ => throw new IllegalArgumentException(
      s"Arguments must be colon delimited! NAME:VALUE Received: $v")
  }
}
