package graft.io

/** Mail delivery seam — the reference ships its Raptor report over SMTP
  * (`Raptor.py:675-683`, message assembly `Raptor.py:142-263`). The
  * transport is injectable exactly like [[Rest.Http]]: the engine
  * assembles the typed message; WHAT carries it (smtplib there, a JVM
  * mail client or relay here) is deployment plumbing. This sandbox has
  * zero egress and the JDK ships no SMTP client, so the shipped
  * transports are the zero-egress ones — a file spool (the classic
  * maildir-style drop a relay picks up) and an in-memory capture for
  * specs; a production build plugs a real SMTP `Mailer` in without
  * touching any call site.
  */
object Mail {

  /** One outbound HTML mail — the fields the reference's assembly fills
    * (`Raptor.py:142-263`: from, to-list, subject, HTML body). */
  final case class Message(from: String, to: Seq[String], subject: String,
                           htmlBody: String)

  /** The transport seam. Implementations must be effectively idempotent
    * per message (a DAG retry may deliver twice). */
  type Mailer = Message => Unit

  /** Zero-egress default: spool each message as an RFC-822-shaped `.eml`
    * file under `dir` (created if absent). Filename is a slug of the
    * subject — deterministic, so a retried delivery overwrites its own
    * spool entry instead of duplicating it. */
  def fileMailer(dir: String): Mailer = { msg =>
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val slug = msg.subject.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    java.nio.file.Files.write(d.resolve(s"$slug.eml"), render(msg)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** RFC-822-shaped rendering (headers + HTML body) used by the spool.
    * No field is ever interpolated into a stripMargin block (a value line
    * starting with whitespace + '|' would be truncated at the pipe), and
    * header VALUES are folded to a single line: a CR/LF inside a header
    * value is header injection against the RFC-822 surface, so it is
    * replaced with a space rather than emitted. The body is raw HTML —
    * newlines are content there. */
  def render(msg: Message): String = {
    def h(name: String, value: String): String =
      s"$name: ${value.replaceAll("[\r\n]+[ \t]*", " ")}"
    val headers = Seq(
      h("From", msg.from),
      h("To", msg.to.mkString(", ")),
      h("Subject", msg.subject),
      "MIME-Version: 1.0",
      "Content-Type: text/html; charset=utf-8")
    headers.mkString("", "\n", "\n\n") + msg.htmlBody + "\n"
  }
}
