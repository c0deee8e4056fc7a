package graft.dq

import graft.dq.AlertRenderer.AlertReport

/** Pluggable delivery for rendered alerts — the seam the reference's
  * SMTP send (005_send_alert_hourly.py:224-311) hangs on. The engine
  * renders [[AlertReport]] values; transports are injected so tests
  * capture in memory, batch jobs drop files, and a production deploy
  * plugs a real mailer behind the same trait without touching the
  * rendering path. */
trait AlertSink {
  def send(report: AlertReport): Unit
}

/** Test/assertion sink: keeps every report in order. */
final class InMemoryAlertSink extends AlertSink {
  private val buf = scala.collection.mutable.ListBuffer.empty[AlertReport]
  override def send(report: AlertReport): Unit = synchronized { buf += report; () }
  def sent: Seq[AlertReport] = synchronized(buf.toList)
}

/** Drops the email body and the attachment as files — the headless
  * delivery mode (report lands where a downstream mailer/notifier can
  * pick it up; also what CI archives). */
final class FileAlertSink(dir: String) extends AlertSink {
  override def send(report: AlertReport): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    def write(name: String, content: String): Unit = {
      val w = new java.io.PrintWriter(
        new java.io.File(d, name), "UTF-8")
      try w.write(content) finally w.close()
    }
    write("alert_body.html", report.body)
    write(report.attachmentName, report.attachment)
  }
}

/** SMTP-shaped sink: builds the RFC-822 multipart message (body +
  * HTML attachment) and hands it to `transport` — the last step a real
  * deployment implements with its mail client. Kept transport-agnostic
  * because the engine classpath ships no mail library; the message
  * construction (the testable part) is complete. */
final class SmtpAlertSink(from: String, to: Seq[String],
    transport: String => Unit) extends AlertSink {
  override def send(report: AlertReport): Unit = {
    val boundary = "----graft-alert-boundary"
    // assembled by concatenation, NOT stripMargin over interpolated
    // content (report text lines starting with '|' would be corrupted),
    // with RFC 5322 CRLF line endings
    val msg = Seq(
      s"From: $from",
      s"To: ${to.mkString(", ")}",
      s"Subject: ${report.subject}",
      "MIME-Version: 1.0",
      s"""Content-Type: multipart/mixed; boundary="$boundary"""",
      "",
      s"--$boundary",
      "Content-Type: text/html; charset=UTF-8",
      "",
      report.body,
      s"--$boundary",
      "Content-Type: text/html; charset=UTF-8",
      s"""Content-Disposition: attachment; filename="${report.attachmentName}"""",
      "",
      report.attachment,
      s"--$boundary--").mkString("\r\n")
    transport(msg)
  }
}
