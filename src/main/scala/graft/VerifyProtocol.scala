package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.protocol.SnowflakeServer
import org.apache.spark.sql.{Row, SparkSession}

import java.io.ByteArrayInputStream
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** Pack-scale differential validation of the HTTP protocol façade
  * (round-13 directive #3): every gate in [[SparkEntry.queries]] runs
  * once directly, its materialized result is served back through
  * login → /queries/v1/query-request → base64 Arrow IPC, the payload is
  * decoded with the RAW Arrow vector API (independent of Spark's own
  * ArrowConverters), and both sides are compared as canonically rendered
  * row multisets. This validates the wire typing the reference's clients
  * depend on — `{epoch, fraction}` timestamp structs, JSON-ified
  * ARRAY/OBJECT columns, decimal scale, date/boolean/binary encodings,
  * rowtype metadata — for every result schema the 175-gate pack
  * produces, not just the handful in SnowflakeServerSpec.
  *
  * Usage: runMain graft.VerifyProtocol <sfDir> [outJson]
  * Writes a per-gate match report (default probes/protocol_pack.json)
  * and exits non-zero on any mismatch.
  */
object VerifyProtocol {

  private val mapper = new ObjectMapper()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outJson = args.lift(1).getOrElse("probes/protocol_pack.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val server = new SnowflakeServer(spark, Some(sfDir))
    val port = server.start()
    val login = post(port, "/session/v1/login-request", "{}", None)
    require(login.path("success").asBoolean(), s"login failed: $login")
    val token = login.path("data").path("token").asText()

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    var matched = 0
    val results = selected.map { case (name, fn) =>
      val r = try {
        // 1. direct execution, result FROZEN into a local relation so
        // the wire side serves the identical rows (a lazy view over the
        // gate's plan would re-execute it — sequences/DML gates differ)
        val df = fn(spark, sfDir)
        val rows = df.collect()
        // the frozen result is staged INSIDE the server session's cloned
        // SparkSession (its temp-view catalog snapshots the parent
        // lazily, so a parent-side view would be invisible once the
        // session has run its first statement); unique per gate because
        // the session result-cache keys by SQL text
        val gs = server.sessionOf(token).get
        val frozen = gs.spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), df.schema)
        val view = s"proto_gate_$name"
        frozen.createOrReplaceTempView(view)
        // direct side rendered through the SAME wire normalization the
        // server applies (complex → JSON, timestamps → epoch/fraction)
        val direct = graft.engine.SnowflakeTypes.toSnowflakeWire(frozen)
          .collect().map(renderRow).sorted.toSeq

        // 2. wire side: through the façade, decoded with raw Arrow
        val resp = post(port, "/queries/v1/query-request",
          s"""{"sqlText":"SELECT * FROM $view"}""", Some(token))
        if (!resp.path("success").asBoolean())
          throw new RuntimeException(
            "query-request failed: " + resp.path("message").asText())
        val data = resp.path("data")
        val rowtype = data.path("rowtype")
        val rtNames = (0 until rowtype.size())
          .map(i => rowtype.get(i).path("name").asText())
        require(rtNames == df.schema.fieldNames.toSeq,
          s"rowtype names $rtNames != schema ${df.schema.fieldNames.toSeq}")
        val bytes = java.util.Base64.getDecoder.decode(
          data.path("rowsetBase64").asText())
        // large results come back as inline first chunk + addressable
        // chunk URLs, each a STANDALONE Arrow IPC stream — reassemble
        // exactly like a Snowflake client (with SPARK_GRAFT_WIRE_CHUNK_ROWS
        // small, every multi-row gate exercises this path — round-14
        // directive #1)
        val chunksNode = data.path("chunks")
        val restRows = (0 until chunksNode.size()).flatMap { i =>
          val url = chunksNode.get(i).path("url").asText()
          val declared = chunksNode.get(i).path("rowCount").asLong()
          val rows = decodeArrow(getBytes(port, url, token))
          require(rows.length.toLong == declared,
            s"chunk $i served ${rows.length} rows, declared $declared")
          rows
        }
        val nChunks = 1 + chunksNode.size()
        val wire = (decodeArrow(bytes) ++ restRows).sorted

        if (direct == wire) { matched += 1; ("true", rows.length, nChunks, "") }
        else {
          val diff = direct.zipAll(wire, "<missing>", "<missing>")
            .find { case (a, b) => a != b }
          ("false", rows.length, nChunks,
            diff.map { case (a, b) => s"direct=$a wire=$b" }.getOrElse(""))
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[proto] $name ERROR: ${e.getMessage}")
          ("false", -1, 0, Option(e.getMessage).getOrElse(e.toString))
      }
      System.err.println(
        s"[proto] $name match=${r._1} rows=${r._2} chunks=${r._3}")
      name -> r
    }

    post(port, "/session?delete=true", "{}", Some(token))
    server.stop()
    val multiChunk = results.count(_._2._3 > 1)
    val gates = results.map { case (n, (ok, rows, chunks, err)) =>
      s""""$n":{"match":$ok,"rows":$rows,"chunks":$chunks${
        if (err.isEmpty) "" else s""","err":${mapper.writeValueAsString(err)}"""}}"""
    }.mkString("{", ",", "}")
    val out =
      s"""{"what":"every gate served through the HTTP facade (login/query-request/base64 Arrow IPC), decoded with the raw Arrow vector API, chunk URLs fetched + reassembled like a Snowflake client, compared to the direct result as canonical row multisets","chunk_rows_env":${mapper.writeValueAsString(sys.env.getOrElse("SPARK_GRAFT_WIRE_CHUNK_ROWS", "default"))},"matched":$matched,"total":${results.size},"multi_chunk_gates":$multiChunk,"gates":$gates}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
      out + "\n")
    println(s"""{"protocol_pack_matched":$matched,"total":${results.size},"multi_chunk_gates":$multiChunk}""")
    spark.stop()
    if (matched != results.size) sys.exit(1)
  }

  // ── canonical rendering ──────────────────────────────────────────────

  /** Direct side: a Row from the wire-normalized projection. Timestamp
    * structs render as epoch.fraction; everything else mirrors the
    * Arrow-side renderer below. */
  private def renderRow(r: Row): String =
    (0 until r.length).map { i =>
      if (r.isNullAt(i)) "NULL"
      else r.get(i) match {
        case s: Row => // {epoch, fraction}; a NULL instant keeps the
          // struct non-null with null children on both sides
          s"${if (s.isNullAt(0)) "NULL" else s.get(0)}." +
            s"${if (s.isNullAt(1)) "NULL" else s.get(1)}"
        case d: java.sql.Date => d.toLocalDate.toString
        case d: java.time.LocalDate => d.toString
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case d: java.math.BigDecimal => d.toPlainString
        case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
        case other => other.toString
      }
    }.mkString("|")

  /** Wire side: decode the base64 Arrow IPC payload with the raw Arrow
    * vector API and render each row canonically. */
  private def decodeArrow(bytes: Array[Byte]): Seq[String] = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.StructVector
    def cell(v: FieldVector, i: Int): String =
      if (v.isNull(i)) "NULL"
      else v match {
        case sv: StructVector =>
          s"${cell(sv.getChild("epoch"), i)}.${cell(sv.getChild("fraction"), i)}"
        case d: DateDayVector =>
          java.time.LocalDate.ofEpochDay(d.get(i).toLong).toString
        case d: DecimalVector => d.getObject(i).toPlainString
        case b: VarBinaryVector =>
          b.getObject(i).map("%02x".format(_)).mkString
        case b: BitVector => (b.get(i) == 1).toString
        case other => String.valueOf(other.getObject(i))
      }
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new ByteArrayInputStream(bytes), alloc)
    try {
      val out = Seq.newBuilder[String]
      while (reader.loadNextBatch()) {
        val root = reader.getVectorSchemaRoot
        val vs = (0 until root.getFieldVectors.size())
          .map(root.getFieldVectors.get(_))
        (0 until root.getRowCount).foreach { i =>
          out += vs.map(cell(_, i)).mkString("|")
        }
      }
      out.result()
    } finally { reader.close(); alloc.close() }
  }

  /** Raw GET (chunk downloads are token-gated application/octet-stream). */
  private def getBytes(port: Int, path: String, token: String): Array[Byte] = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestProperty("Authorization", s"""Snowflake Token="$token"""")
    try conn.getInputStream.readAllBytes() finally conn.disconnect()
  }

  private def post(port: Int, path: String, body: String,
      token: Option[String]) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    token.foreach(t =>
      conn.setRequestProperty("Authorization", s"""Snowflake Token="$t""""))
    val os = conn.getOutputStream
    try os.write(body.getBytes(UTF_8)) finally os.close()
    val json = mapper.readTree(conn.getInputStream)
    conn.disconnect()
    json
  }
}
