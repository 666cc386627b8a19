package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import scala.util.control.NonFatal

/** Minimal RFC 6455 websocket server on raw JDK sockets — carries the
  * reference's `/ws` channel (reference http/main.go:46-97, 134-140,
  * 188) with true frame semantics: the client sends
  * `{"type":"RUN"|"COMPILE","data":{"script":…}}` messages and receives
  * streamed `RESULT`/`LOG` frames while a script runs plus a final
  * `RUN`/`COMPILE` response frame `{success, error?}` —
  * the exact payloads of http/hooks.go and main.go receiveMessages.
  *
  * The JDK's built-in HTTP server cannot hijack a connection for an
  * upgrade, so the websocket endpoint listens on its own port (the one
  * divergence, documented in README): handshake = HTTP GET + `Upgrade:
  * websocket` answered with 101 and `Sec-WebSocket-Accept =
  * base64(sha1(key ++ RFC-GUID))`.
  *
  * Frame support: text (with continuation reassembly), ping→pong, close.
  * Client→server frames are masked per the RFC; server→client unmasked.
  * One daemon thread per connection — the control plane serves humans,
  * not row traffic, so thread-per-connection is the right simplicity.
  */
final class WsServer(handler: (WsConn, String) => Unit) {

  @volatile private var server: ServerSocket = _

  def start(port: Int): Int = {
    server = new ServerSocket(port)
    val acceptor = new Thread(() => acceptLoop(), "graft-ws-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = if (server != null) server.close()

  private def acceptLoop(): Unit =
    try while (true) {
      val sock = server.accept()
      val t = new Thread(() => serve(sock), "graft-ws-conn")
      t.setDaemon(true)
      t.start()
    } catch { case NonFatal(_) => () } // closed

  private def serve(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      val key = handshake(in, out)
      if (key == null) { sock.close(); return }
      val conn = new WsConn(out)
      // continuation reassembly in BYTES: a multi-byte UTF-8 sequence may
      // straddle a fragment boundary, so decoding per frame would corrupt
      // it into U+FFFD — decode once over the assembled message
      val pending = new java.io.ByteArrayOutputStream
      var open = true
      def tooBig(): Unit = { // 1009 close: declared size is untrusted input
        val reason = "message too big".getBytes(UTF_8)
        conn.sendRaw(0x8, Array[Byte](
          ((1009 >> 8) & 0xFF).toByte, (1009 & 0xFF).toByte) ++ reason)
        open = false
      }
      while (open) {
        try WsFrame.read(in) match {
          case null => open = false
          case f if f.opcode == 0x8 => // close: echo and drop
            conn.sendRaw(0x8, f.payload); open = false
          case f if f.opcode == 0x9 => conn.sendRaw(0xA, f.payload) // ping
          case f if f.opcode == 0xA => () // pong
          case f =>
            if (pending.size + f.payload.length > WsFrame.MaxMessageBytes)
              tooBig()
            else {
              pending.write(f.payload)
              if (f.fin) {
                val msg = new String(pending.toByteArray, UTF_8)
                pending.reset()
                try handler(conn, msg)
                catch { case NonFatal(_) => () }
              }
            }
        } catch { case WsFrame.FrameTooBig => tooBig() }
      }
    } catch { case NonFatal(_) => () }
    finally sock.close()
  }

  /** Reads the upgrade request; writes 101. Returns the ws key or null. */
  private def handshake(in: InputStream, out: OutputStream): String = {
    val req = new StringBuilder
    var prev = 0
    var done = false
    while (!done) {
      val c = in.read()
      if (c < 0) return null
      req.append(c.toChar)
      if (c == '\n' && prev == '\n') done = true
      else if (c != '\r') prev = c
    }
    val lines = req.toString.split("\r\n")
    val key = lines.collectFirst {
      case l if l.toLowerCase.startsWith("sec-websocket-key:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.orNull
    if (key == null || !lines.exists(_.toLowerCase.contains("upgrade: websocket")))
      return null
    val accept = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
    out.flush()
    key
  }
}

/** One live connection; `send` writes a text frame (thread-safe — run
  * hooks and the handler thread may interleave sends).
  */
final class WsConn(out: OutputStream) {
  def send(text: String): Unit = sendRaw(0x1, text.getBytes(UTF_8))

  private[server] def sendRaw(opcode: Int, payload: Array[Byte]): Unit =
    synchronized {
      out.write(0x80 | opcode) // FIN + opcode
      val n = payload.length
      if (n < 126) out.write(n)
      else if (n < 65536) {
        out.write(126); out.write(n >> 8); out.write(n & 0xFF)
      } else {
        out.write(127)
        var i = 7
        while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
      }
      out.write(payload)
      out.flush()
    }
}

/** The `/ws` message protocol (reference http/main.go:19-97): dispatches
  * `RUN`/`COMPILE` requests and streams `RESULT` (console output) and
  * `LOG` frames back over the same connection, each as
  * `{"type":…,"data":…}` with hook payloads `{"entry":…}`
  * (reference http/hooks.go websocketWriter).
  */
object WsChannel {

  /** `runScript(script, onConsoleEntry)` executes with a streaming
    * observer; `validate` is the compile-only path.
    */
  def handler(
      runScript: (String, String => Unit) => ExecResult,
      validate: String => Seq[String]): (WsConn, String) => Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    def frame(msgType: String, fill: com.fasterxml.jackson.databind.node.ObjectNode => Unit): String = {
      val m = mapper.createObjectNode()
      m.put("type", msgType)
      fill(m.putObject("data"))
      m.toString
    }

    (conn, text) => {
      val msg = mapper.readTree(text)
      val msgType = msg.path("type").asText("")
      val script = msg.path("data").path("script").asText("")
      msgType match {
        case "RUN" =>
          conn.send(frame("LOG", _.put("entry", "run started")))
          val r = runScript(script,
            entry => conn.send(frame("RESULT", _.put("entry", entry))))
          conn.send(frame("RUN", d => {
            d.put("success", r.success)
            if (!r.success) d.put("error", r.error)
          }))
        case "COMPILE" =>
          val errs = validate(script)
          conn.send(frame("COMPILE", d => {
            d.put("success", errs.isEmpty)
            if (errs.nonEmpty) d.put("error", errs.mkString("; "))
          }))
        case other =>
          conn.send(frame("LOG",
            _.put("entry", s"unknown message type $other")))
      }
    }
  }
}

private final case class WsFrame(fin: Boolean, opcode: Int, payload: Array[Byte])

private object WsFrame {
  /** Upper bound on one frame and one reassembled message: the channel
    * carries scripts and control JSON, never row traffic, so a few MB is
    * generous. The declared 64-bit length is attacker-controlled on an
    * unauthenticated socket — without the cap, `len.toInt` overflows at
    * 2^31 and any large value triggers an up-front multi-GB allocation.
    */
  val MaxMessageBytes: Int = 4 * 1024 * 1024
  case object FrameTooBig extends RuntimeException("frame too big")

  /** Blocking read of one client frame (masked per RFC); null on EOF. */
  def read(in: InputStream): WsFrame = {
    val b0 = in.read()
    if (b0 < 0) return null
    val b1 = in.read()
    if (b1 < 0) return null
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0F
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7F
    if (len == 126) len = (readN(in, 2): BigInt).toLong
    else if (len == 127) len = (readN(in, 8): BigInt).toLong
    if (len < 0 || len > MaxMessageBytes) throw FrameTooBig
    val mask = if (masked) readBytes(in, 4) else null
    val payload = readBytes(in, len.toInt)
    if (payload == null) return null
    if (masked) {
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1
      }
    }
    WsFrame(fin, opcode, payload)
  }

  private def readN(in: InputStream, n: Int): BigInt = {
    val bs = readBytes(in, n)
    if (bs == null) BigInt(0) else BigInt(1, bs)
  }

  private def readBytes(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) return null
      off += r
    }
    buf
  }
}
