package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper

/** Test-side DuckDB oracle: runs a batch of SQL statements through one
  * python3+duckdb subprocess — the same engine the driver's correctness
  * gate and the reference's own COPY execution use
  * (`/root/reference/universql/plugins/snow.py:420-437` renders COPY as
  * `INSERT INTO t SELECT * FROM read_csv([files], params...)`) — and
  * returns each statement's rows. Batched (one interpreter start per
  * call, not per case) so fuzz suites with hundreds of cases stay fast.
  *
  * Rows come back as '|'-joined python `str()` renderings of each
  * column (single-column queries are unchanged by the join); NULL is
  * the literal "NULL". Multi-statement SQL works (DuckDB executes
  * sequentially, the last statement's rows are returned), so callers
  * can prefix CREATE VIEW statements. Errors are captured per query,
  * not thrown, so differential harnesses can assert both-sides-error
  * cases.
  */
object DuckOracle {

  private val om = new ObjectMapper()

  /** @return id -> Right(rows in query order) | Left(error message) */
  def run(queries: Seq[(String, String)]): Map[String, Either[String, Seq[String]]] = {
    if (queries.isEmpty) return Map.empty
    val dir = java.nio.file.Files.createTempDirectory("graft_duckq")
    val manifest = dir.resolve("q.json")
    val arr = om.createArrayNode()
    queries.foreach { case (id, sql) =>
      val o = arr.addObject(); o.put("id", id); o.put("sql", sql)
    }
    java.nio.file.Files.writeString(manifest, om.writeValueAsString(arr))
    val outFile = dir.resolve("out.json")
    val script =
      """import json, sys, duckdb
        |qs = json.load(open(sys.argv[1]))
        |out = []
        |for q in qs:
        |    try:
        |        con = duckdb.connect()
        |        rows = con.execute(q["sql"]).fetchall()
        |        out.append({"id": q["id"],
        |                    "rows": ["|".join("NULL" if c is None else str(c)
        |                                      for c in r)
        |                             for r in rows]})
        |        con.close()
        |    except Exception as e:
        |        out.append({"id": q["id"], "error": str(e)})
        |json.dump(out, open(sys.argv[2], "w"))
        |""".stripMargin
    val scriptFile = dir.resolve("run.py")
    java.nio.file.Files.writeString(scriptFile, script)
    val pb = new ProcessBuilder("python3", scriptFile.toString,
      manifest.toString, outFile.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    require(rc == 0, s"duckdb oracle subprocess failed rc=$rc:\n$log")
    val node = om.readTree(outFile.toFile)
    import scala.jdk.CollectionConverters._
    node.elements().asScala.map { e =>
      val id = e.path("id").asText()
      if (e.has("error")) id -> Left(e.path("error").asText())
      else id -> Right(e.path("rows").elements().asScala
        .map(_.asText()).toSeq)
    }.toMap
  }

  /** Single-quoted SQL literal with '' doubling (DuckDB dialect). */
  def lit(s: String): String = "'" + s.replace("'", "''") + "'"
}
