package graft

/** Notification sink (SURVEY.md §2 O17). The reference POSTs JSON
  * `{"text": ...}` to a Slack webhook at every stage boundary
  * (`gule_test_job.py:77,102,110,188,198,215,220`). The engine keeps
  * the semantics (a fire-and-forget text message per event) behind a
  * trait: production would supply an HTTP implementation; this
  * zero-egress environment ships stdout and in-memory ones.
  *
  * Reference wrinkle kept: a FAILING notifier is never fatal to the
  * pipeline (`gule_test_job.py:195-199`) — callers use [[notifySafe]].
  */
trait Notifier {
  def notify(text: String): Unit

  /** Notification failures are logged, not propagated (O17's
    * "Slack-failure warning is non-fatal" branch).
    */
  final def notifySafe(text: String): Unit =
    try notify(text)
    catch {
      case e: Throwable =>
        System.err.println(s"[notifier] delivery failed (non-fatal): ${e.getMessage}")
    }
}

/** Default implementation: one line per message on stdout. */
final class StdoutNotifier extends Notifier {
  def notify(text: String): Unit = println(s"[notify] $text")
}

/** Test implementation: records every message. */
final class RecordingNotifier extends Notifier {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
  def notify(text: String): Unit = synchronized { buf += text }
  def messages: Seq[String] = synchronized(buf.toList)
}

/** Test implementation: always throws, to exercise the non-fatal
  * delivery-failure path.
  */
final class FailingNotifier extends Notifier {
  def notify(text: String): Unit =
    throw new RuntimeException("notification endpoint unreachable")
}
