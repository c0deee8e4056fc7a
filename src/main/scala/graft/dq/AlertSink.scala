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

/** Minimal SMTP client (RFC 5321) over a plain socket — the transport
  * a [[SmtpAlertSink]] plugs in where the reference calls its mail
  * client (005_send_alert_hourly.py:224-311). No mail library on the
  * classpath, none needed: HELO → MAIL FROM → RCPT TO → DATA with
  * dot-stuffing → QUIT is the whole protocol for a submission agent.
  * DqSpec round-trips it against an in-test server socket. */
object SmtpTransport {

  /** A transport bound to a server and envelope, suitable for
    * `new SmtpAlertSink(from, to, SmtpTransport(host, port, from, to))`. */
  def apply(host: String, port: Int, from: String,
      to: Seq[String]): String => Unit =
    msg => send(host, port, from, to, msg)

  def send(host: String, port: Int, from: String, to: Seq[String],
      msg: String): Unit = {
    val sock = new java.net.Socket(host, port)
    try {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      val out = new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8")
      def expect(codes: Set[Int]): Unit = {
        var line = in.readLine()
        // skip multiline-reply continuations ("250-...")
        while (line != null && line.length > 3 && line.charAt(3) == '-')
          line = in.readLine()
        require(line != null && line.length >= 3 &&
          codes.contains(line.substring(0, 3).toInt),
          s"SMTP: unexpected reply '$line' (wanted one of $codes)")
      }
      def cmd(c: String, codes: Set[Int]): Unit = {
        out.write(c + "\r\n"); out.flush(); expect(codes)
      }
      expect(Set(220))
      cmd("HELO graft", Set(250))
      cmd(s"MAIL FROM:<$from>", Set(250))
      to.foreach(r => cmd(s"RCPT TO:<$r>", Set(250, 251)))
      cmd("DATA", Set(354))
      // dot-stuffing: a payload line starting with '.' gets one
      // prepended, so the lone-dot terminator stays unambiguous
      val stuffed = msg.split("\r\n", -1)
        .map(l => if (l.startsWith(".")) "." + l else l)
        .mkString("\r\n")
      out.write(stuffed + "\r\n.\r\n"); out.flush(); expect(Set(250))
      cmd("QUIT", Set(221))
    } finally sock.close()
  }
}
