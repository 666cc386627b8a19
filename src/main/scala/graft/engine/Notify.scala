package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.DataFrame

/** Outbound notifications: the Mandrill templated-email destination
  * (reference engine/mandrill_destination.go:12-122) and the Slack
  * log forwarder (reference engine/slack.go:29-141, docs cli.md "Logging
  * to Slack").
  *
  * Both POST JSON over HTTPS; the transport is injectable exactly like the
  * HTTP source's fetch, so the payload construction — the part with
  * reference semantics — is fully implemented and tested offline, and the
  * default transport does the real egress when the environment allows it.
  *
  * Scale note: an email or chat message is a human-scale sink (the
  * reference accumulates all rows into one message); rows collect on the
  * driver by design. Route bulk output to file/JDBC sinks.
  */
object Notify {

  /** POST `body` (JSON) to `url`. */
  type Post = (String, String) => Unit

  def defaultPost(url: String, body: String): Unit = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url))
      .header("Content-Type", "application/json; charset=utf-8")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    ()
  }

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------- mandrill

  final case class Principal(name: String, email: String)

  /** `NAME <EMAIL>[, NAME <EMAIL>…]` (reference
    * mandrill_destination.go:12,38-50 — same pattern, same error text).
    */
  private val RecipientRe =
    raw"^\s*([\w\s]+)\s*<\s*(\w[-._\w]*\w@\w[-._\w]*\w\.\w{2,3})\s*>\s*$$".r

  def parseRecipients(s: String): Seq[Principal] =
    s.split(",").toSeq.map { recip =>
      RecipientRe.findFirstMatchIn(recip) match {
        case Some(m) => Principal(m.group(1).trim, m.group(2))
        case None => throw new IllegalArgumentException(
          s"invalid syntax or email for recipient $recip. Expecting NAME <EMAIL>")
      }
    }

  val MandrillEndpoint =
    "https://mandrillapp.com/api/1.0/messages/send-template.json"

  /** Send the DataFrame through the Mandrill send-template API. SPLIT
    * truthy ⇒ one email per row with per-column merge vars; otherwise one
    * email whose `rows` merge var carries every row (reference
    * mandrill_destination.go:52-97). Returns the number of emails sent.
    */
  def sendTemplateEmails(
      df: DataFrame,
      option: String => Option[String],
      post: Post,
      connName: String): Long = {
    val apiKey = option("API_KEY").getOrElse(
      throw new IllegalArgumentException(
        s"connection $connName: API_KEY option required"))
    val template = option("TEMPLATE").getOrElse(
      throw new IllegalArgumentException(
        s"connection $connName: TEMPLATE option required"))
    val recipients = parseRecipients(option("RECIPIENTS").getOrElse(
      throw new IllegalArgumentException(
        s"connection $connName: RECIPIENTS option required")))
    val sender = option("SENDER").map { s =>
      val ps = parseRecipients(s)
      if (ps.length != 1) throw new IllegalArgumentException(
        s"there can only be one SENDER: $s")
      ps.head
    }
    val subject = option("SUBJECT")
    val split = option("SPLIT").exists(v => graft.aql.Ast.truthy(
      graft.aql.Ast.OptStr(v)))

    val cols = df.columns.toSeq
    def baseMsg(): ObjectNode = {
      val m = mapper.createObjectNode()
      subject.foreach(m.put("subject", _))
      sender.foreach { s =>
        m.put("from_name", s.name); m.put("from_email", s.email)
      }
      val to = m.putArray("to")
      recipients.foreach { r =>
        val t = to.addObject()
        t.put("email", r.email); t.put("name", r.name); t.put("type", "to")
      }
      m
    }
    def payload(message: ObjectNode): String = {
      val root = mapper.createObjectNode()
      root.put("key", apiKey)
      root.put("template_name", template)
      root.putArray("template_content")
      root.set[ObjectNode]("message", message)
      mapper.writeValueAsString(root)
    }
    def rowObj(row: org.apache.spark.sql.Row): ObjectNode = {
      val o = mapper.createObjectNode()
      cols.zip(row.toSeq).foreach { case (c, v) =>
        o.set[ObjectNode](c, toJson(v))
      }
      o
    }

    val rows = df.collect()
    if (split) {
      rows.foreach { row =>
        val m = baseMsg()
        val vars = m.putArray("global_merge_vars")
        cols.zip(row.toSeq).foreach { case (c, v) =>
          val gv = vars.addObject()
          gv.put("name", c); gv.set[ObjectNode]("content", toJson(v))
        }
        post(MandrillEndpoint, payload(m))
      }
      rows.length.toLong
    } else {
      val m = baseMsg()
      val vars = m.putArray("global_merge_vars")
      val gv = vars.addObject()
      gv.put("name", "rows")
      val arr = mapper.createArrayNode()
      rows.foreach(r => arr.add(rowObj(r)))
      gv.set[ObjectNode]("content", arr)
      post(MandrillEndpoint, payload(m))
      1L
    }
  }

  private def toJson(v: Any): com.fasterxml.jackson.databind.JsonNode = v match {
    case null => mapper.nullNode()
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case i: Int => mapper.getNodeFactory.numberNode(i.toLong)
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case d: Double => mapper.getNodeFactory.numberNode(d)
    case d: java.math.BigDecimal => mapper.getNodeFactory.numberNode(d)
    case other => mapper.getNodeFactory.textNode(other.toString)
  }

  // ---------------------------------------------------------------- slack

  /** Log levels in reference order (engine/api.go LogLevel). Shared with
    * the CLI's --v/--vv console logger (graft.Main) so the two can't
    * drift.
    */
  private[graft] val Levels = Seq("TRACE", "INFO", "WARNING", "ERROR")
  private[graft] def levelOrd(s: String): Int = {
    val i = Levels.indexOf(s.trim.toUpperCase)
    if (i < 0) throw new IllegalArgumentException(s"invalid level $s")
    i
  }

  /** Slack incoming-webhook forwarder (engine/slack.go:43-64,104-141).
    * Message format `<NAME>: SOURCE - LEVEL - MESSAGE` per docs cli.md.
    * Returns None when SLACK_WEBHOOK_URL is unset.
    */
  def slackLogger(option: String => Option[String], post: Post)
      : Option[(String, String, String) => Unit] =
    option("SLACK_WEBHOOK_URL").filter(_.nonEmpty).map { url =>
      val min = levelOrd(option("SLACK_LOG_LEVEL").getOrElse("ERROR"))
      val name = option("SLACK_NAME").getOrElse("Unnamed script")
      (level: String, source: String, message: String) =>
        if (levelOrd(level) >= min) {
          val p = mapper.createObjectNode()
          p.put("text", s"<$name>: $source - ${level.toUpperCase} - $message")
          option("SLACK_CHANNEL").foreach(p.put("channel", _))
          option("SLACK_USER").foreach(p.put("username", _))
          option("SLACK_EMOJI").foreach(p.put("icon_emoji", _))
          post(url, mapper.writeValueAsString(p))
        }
    }
}
