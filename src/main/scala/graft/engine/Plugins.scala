package graft.engine

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.aql.Ast
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** TRANSFORM PLUGIN host: an external-process transform speaking the
  * reference's JSON-RPC-over-stdio protocol (reference plugins/api.go:40-65,
  * transform_rpc.go:41-78; e2e compiler_test.go:557-608 with
  * test_filter.py).
  *
  * Wire format is Go's net/rpc jsonrpc codec: one JSON object per line,
  * request `{"method":m,"params":[arg],"id":n}`, response
  * `{"id":n,"result":r,"error":e}` — so plugins written for the reference
  * work unchanged. Handshake order mirrors plugins/transform.go:111-166:
  * set_option per WITH option, set_sources / set_destinations,
  * set_input_columns per source, get_output_columns, then batches of
  * `receive(rows)` and a final `receive(null)` EOS.
  *
  * Scale note: a plugin is an arbitrary OS subprocess fed row-by-row over
  * a pipe — inherently a single-node stream in the reference's design too.
  * It is an extensibility escape hatch, not a scan path; the host runs it
  * driver-side and parallel work belongs in native operators. Output rows
  * land in a DataFrame via the same type-inference as literal sources.
  */
object Plugins {

  private val mapper = new ObjectMapper()

  final case class PluginError(msg: String) extends RuntimeException(msg)

  /** One plugin subprocess with the line-delimited JSON-RPC client.
    * `cwd` anchors relative Args paths (e.g. `./test_filter.py`,
    * reference example.aql:28) at the script's directory.
    */
  final class Rpc(executable: String, args: Seq[String],
      cwd: Option[java.nio.file.Path] = None) {
    private val proc =
      try {
        val pb = new ProcessBuilder((executable +: args).asJava)
          // pass plugin stderr through (reference pie.StartProviderCodec
          // wires os.Stderr); also prevents the child blocking on a full
          // stderr pipe that nobody drains
          .redirectError(ProcessBuilder.Redirect.INHERIT)
        cwd.foreach(d => pb.directory(d.toFile))
        pb.start()
      }
      catch { case e: Exception =>
        throw PluginError(s"cannot start plugin '$executable': ${e.getMessage}") }
    private val out = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, UTF_8))
    private val in = new BufferedReader(
      new InputStreamReader(proc.getInputStream, UTF_8))
    private var nextId = 0

    def call(method: String, param: JsonNode): JsonNode = {
      val req = mapper.createObjectNode()
      req.put("method", method)
      req.put("id", nextId)
      nextId += 1
      val params = mapper.createArrayNode()
      params.add(if (param == null) mapper.nullNode() else param)
      req.set[ObjectNode]("params", params)
      out.write(mapper.writeValueAsString(req)); out.write("\n"); out.flush()
      val line = in.readLine()
      if (line == null)
        throw PluginError(s"plugin '$executable' closed its stdout during $method")
      val resp = mapper.readTree(line)
      val err = resp.get("error")
      if (err != null && !err.isNull)
        throw PluginError(s"plugin '$executable' $method failed: $err")
      resp.get("result")
    }

    def close(): Unit = {
      try { out.close(); in.close() } catch { case _: Exception => () }
      if (!proc.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly()
    }
  }

  private def anyToJson(v: Any): JsonNode = v match {
    case null => mapper.nullNode()
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case i: Int => mapper.getNodeFactory.numberNode(i.toLong)
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case d: Double => mapper.getNodeFactory.numberNode(d)
    case f: Float => mapper.getNodeFactory.numberNode(f.toDouble)
    case d: java.math.BigDecimal => mapper.getNodeFactory.numberNode(d)
    case d: BigDecimal => mapper.getNodeFactory.numberNode(d.bigDecimal)
    case t: java.sql.Timestamp => mapper.getNodeFactory.textNode(
      java.time.OffsetDateTime.ofInstant(t.toInstant, java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME))
    case other => mapper.getNodeFactory.textNode(other.toString)
  }

  /** Parse the ARGS option: a JSON array of strings (reference
    * compiler.go scans `Args = '["./test_filter.py"]'`).
    */
  def parseArgs(json: String): Seq[String] = {
    val node = mapper.readTree(json)
    if (!node.isArray) throw PluginError(s"ARGS must be a JSON array: $json")
    node.elements().asScala.map(_.asText()).toSeq
  }

  /** Run a TRANSFORM PLUGIN block: feed every source DataFrame through the
    * subprocess, return the output rows as a DataFrame. Sources stream
    * sequentially in declaration order (MULTISOURCE_ORDER='Sequential' is
    * the only order a single pipe can honor deterministically).
    */
  def runTransform(
      spark: SparkSession,
      executable: String,
      args: Seq[String],
      options: Ast.Options,
      sources: Seq[(String, DataFrame)],
      destNames: Seq[String],
      batchSize: Int = 100,
      cwd: Option[java.nio.file.Path] = None): DataFrame = {
    val rpc = new Rpc(executable, args, cwd)
    try {
      // handshake (plugins/transform.go:144-166)
      options.foreach { case (k, v) =>
        val o = mapper.createObjectNode()
        o.put("name", k)
        v match {
          case Ast.OptNum(d) => o.put("value", d)
          case Ast.OptStr(s) => o.put("value", s)
        }
        rpc.call("set_option", o)
      }
      val srcNames = mapper.createArrayNode()
      sources.foreach { case (n, _) => srcNames.add(n) }
      rpc.call("set_sources", srcNames)
      val dsts = mapper.createArrayNode()
      destNames.foreach(dsts.add)
      rpc.call("set_destinations", dsts)
      sources.foreach { case (n, df) =>
        val o = mapper.createObjectNode()
        o.put("source", n)
        val cols = mapper.createArrayNode()
        df.columns.foreach(cols.add)
        o.set[ObjectNode]("columns", cols)
        rpc.call("set_input_columns", o)
      }
      val outColsNode = rpc.call("get_output_columns", null)
      if (outColsNode == null || !outColsNode.isObject)
        throw PluginError(s"plugin '$executable' returned no output columns")
      // "" keys the wildcard/all-destinations column set (test_filter.py)
      val outCols: Seq[String] = {
        val byDest = outColsNode.fields().asScala
          .map(e => e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq)
          .toMap
        byDest.get("").orElse(destNames.collectFirst {
          case d if byDest.contains(d) => byDest(d) })
          .orElse(byDest.headOption.map(_._2))
          .getOrElse(throw PluginError(
            s"plugin '$executable' returned empty output columns"))
      }

      val log = org.apache.logging.log4j.LogManager.getLogger("graft.plugin")
      val collected = mutable.ArrayBuffer.empty[Seq[Any]]
      def drain(result: JsonNode): Unit = if (result != null) {
        if (result.has("rows"))
          result.get("rows").elements().asScala.foreach { r =>
            collected += r.get("data").elements().asScala
              .map(jsonToAny).toSeq
          }
        if (result.has("logs")) // forward plugin log entries (api.go:20-24)
          result.get("logs").elements().asScala.foreach { l =>
            log.info(s"[$executable] ${l.path("level").asText("info")}: " +
              l.path("message").asText(""))
          }
      }

      // stream the sources through the pipe in batches; the reference
      // sends one row per call (transform.go:185 "TODO: Buffering") —
      // batching is protocol-compatible (Send takes []InputRow)
      sources.foreach { case (name, df) =>
        df.toLocalIterator().asScala.grouped(batchSize).foreach { batch =>
          val rows = mapper.createArrayNode()
          batch.foreach { row =>
            val r = mapper.createObjectNode()
            r.put("source", name)
            val data = mapper.createArrayNode()
            row.toSeq.foreach(v => data.add(anyToJson(v)))
            r.set[ObjectNode]("data", data)
            rows.add(r)
          }
          drain(rpc.call("receive", rows))
        }
      }
      drain(rpc.call("receive", null)) // EOS

      Connectors.fromRows(spark, collected.toSeq, outCols)
    } finally rpc.close()
  }

  private def jsonToAny(n: JsonNode): Any = n match {
    case null => null
    case _ if n.isNull => null
    case _ if n.isIntegralNumber => n.asLong()
    case _ if n.isNumber => n.asDouble()
    case _ if n.isBoolean => n.asBoolean()
    case _ => n.asText()
  }
}
