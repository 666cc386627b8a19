package graft

import graft.engine.Aql
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Runs the reference repo's own shipped example scripts VERBATIM
  * (byte-for-byte copies of /root/reference/example{,2,3}.aql) — the
  * strongest drop-in-compatibility statement the suite can make: a user's
  * existing .aql files run unmodified.
  *
  * example.aql needs two externalities the scripts reference by relative
  * path: a writable working directory (its Excel sink writes
  * ./output_transform.xlsx — the reference checkout is read-only here) and
  * a `test_filter.py` plugin executable. The reference's own test_filter.py
  * is Python 2 + an unavailable pip package (pyjsonrpc), so a stdlib-only
  * Python 3 drop-in with the same JSON-RPC wire behavior stands in — the
  * AQL scripts themselves are untouched.
  */
class ReferenceExamplesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val ref = Paths.get("/root/reference")

  private def stage(names: String*): Path = {
    val dir = Files.createTempDirectory("graft_ref_examples")
    names.foreach(n => Files.copy(ref.resolve(n), dir.resolve(n),
      StandardCopyOption.REPLACE_EXISTING))
    dir
  }

  private def runScript(dir: Path, name: String,
      params: Map[String, String] = Map.empty) =
    Aql.run(spark, Files.readString(dir.resolve(name)),
      cliParams = params, baseDir = dir)

  test("example.aql verbatim: GLOBAL slices -> python plugin -> Excel") {
    // reference example.aql (README "a simple example"): SQLite-dialect
    // aliases (AS 'Value'), TRANSFORM PLUGIN with Executable/Args,
    // Multisource_Order, Excel Range sink with Overwrite
    val dir = stage("example.aql")
    Files.writeString(dir.resolve("test_filter.py"),
      """#!/usr/bin/env python3
        |import sys, json
        |
        |def handle(method, arg):
        |    if method == "receive":
        |        if not arg:
        |            return {}  # EOS
        |        rows = [{"destination": "", "data": [r["data"][0]]}
        |                for r in arg if r["data"][0] > 0]
        |        return {"rows": rows} if rows else {}
        |    if method == "get_output_columns":
        |        return {"": ["Value"]}
        |    return ""
        |
        |for line in sys.stdin:
        |    req = json.loads(line)
        |    arg = req["params"][0] if req.get("params") else None
        |    out = {"id": req["id"], "result": handle(req["method"], arg),
        |           "error": None}
        |    sys.stdout.write(json.dumps(out) + "\n")
        |    sys.stdout.flush()
        |""".stripMargin)
    val r = runScript(dir, "example.aql")
    assert(r.outputs("FILTERNEGATIVES").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L, 10L, 11L)))
    // the sink the script names, where the script names it
    val xlsx = dir.resolve("output_transform.xlsx")
    assert(Files.exists(xlsx), "Excel sink not written at script-relative path")
    val (_, cells) = graft.engine.Excel.readTable(xlsx, "TestSheet",
      graft.engine.Excel.parseRange("A1:A*"), Some(Seq("Value")), None)
    assert(cells.map(_.head.asInstanceOf[Long]).sorted == Seq(1L, 2L, 10L, 11L))
  }

  test("example2.aql verbatim: GLOBAL timeseries -> ZOH resample -> console") {
    val dir = stage("example2.aql")
    val r = runScript(dir, "example2.aql")
    assert(r.console.size == 1)
    val rows = r.outputs("RESAMPLE").collect()
      .map(x => (x.getLong(0), x.getString(1)) -> x.getDouble(2)).toMap
    // hand-computed, same series as docs-src/docs/logic.md / AqlSpec ZOH
    assert(math.abs(rows((1L, "power")) - (10.0 * 781) / 1800) < 1e-6)
    assert(math.abs(rows((2L, "power")) - 120.0) < 1e-9)
    assert(math.abs(rows((3L, "power")) -
      (100.0 * 1200 + 50.0 * 600) / 1800) < 1e-9)
    assert(rows.contains((1L, "temperature")))
  }

  test("example3.aql verbatim: templated ZOH window via --params") {
    // docs-src/docs/logic.md drives this script from python with
    // {"Start":…,"Finish":…} — same contract here
    val dir = stage("example3.aql")
    val r = runScript(dir, "example3.aql", Map(
      "Start" -> "2017-12-01T12:00:00Z", "Finish" -> "2017-12-01T12:30:00Z"))
    val rows = r.outputs("RESAMPLE").collect()
      .map(x => (x.getLong(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(math.abs(rows((1L, "power")) - (10.0 * 781) / 1800) < 1e-6)
    assert(math.abs(rows((2L, "power")) - 120.0) < 1e-9)
  }
}
