package graft.model

/** Typed error hierarchy — parity with the reference's exceptions.py.
  * Each extends IllegalArgumentException (usage errors) or
  * RuntimeException (state errors) so existing catch sites and the
  * envelope's 400-vs-500 mapping keep working without special cases.
  */
object Exceptions {
  /** exceptions.py:4-11 — object type not valid for the job mode. */
  final class InvalidObjectType(msg: String)
      extends IllegalArgumentException(msg)

  /** exceptions.py:14-15 — caller misused the API. */
  final class UsageError(msg: String) extends IllegalArgumentException(msg)

  /** exceptions.py:18-19 — attach/status target does not exist. */
  final class JobNotFound(jobName: String)
      extends RuntimeException(s"Job $jobName not found")

  /** exceptions.py:22-23 — dump-file set used before prepare(). */
  final class FileNotPrepared(msg: String) extends IllegalStateException(msg)

  /** exceptions.py:26-27 — job finished, but objects failed. */
  final class DataPumpCompletedWithErrors(msg: String)
      extends RuntimeException(msg)

  /** exceptions.py:30-31 — malformed protocol request. */
  final class BadRequest(msg: String) extends IllegalArgumentException(msg)

  /** exceptions.py:34-35 — recognized but unsupported feature. */
  final class Unsupported(msg: String)
      extends UnsupportedOperationException(msg)
}
