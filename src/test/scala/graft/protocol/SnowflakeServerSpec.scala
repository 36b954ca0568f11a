package graft.protocol

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayInputStream
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

/** Wire-level test of the Snowflake V1 REST façade: login → query →
  * Arrow-decode the rowsetBase64 payload, the same round-trip the
  * reference's integration suite performs with the real Snowflake
  * connector (`tests/integration/utils.py:100-145`). */
class SnowflakeServerSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val mapper = new ObjectMapper()

  private def post(port: Int, path: String, body: String,
      token: Option[String] = None, gzip: Boolean = false) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    token.foreach(t =>
      conn.setRequestProperty("Authorization", s"""Snowflake Token="$t""""))
    val bytes =
      if (gzip) {
        conn.setRequestProperty("Content-Encoding", "gzip")
        val buf = new java.io.ByteArrayOutputStream()
        val gz = new GZIPOutputStream(buf)
        gz.write(body.getBytes(UTF_8)); gz.close()
        buf.toByteArray
      } else body.getBytes(UTF_8)
    val os = conn.getOutputStream
    try os.write(bytes) finally os.close()
    val json = mapper.readTree(conn.getInputStream)
    conn.disconnect()
    json
  }

  test("login, query, arrow result, session delete") {
    val server = new SnowflakeServer(spark, Some("/root/testdata/sf0.001"))
    val port = server.start()
    try {
      val login = post(port, "/session/v1/login-request?databaseName=GRAFT", "{}")
      assert(login.path("success").asBoolean())
      val token = login.path("data").path("token").asText()
      assert(token.nonEmpty)

      val resp = post(port, "/queries/v1/query-request",
        """{"sqlText":"SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1"}""",
        token = Some(token), gzip = true)
      assert(resp.path("success").asBoolean(), resp.toString)
      val data = resp.path("data")
      assert(data.path("queryResultFormat").asText() == "arrow")
      val rowtype = data.path("rowtype")
      assert(rowtype.get(0).path("name").asText() == "o_orderpriority")
      assert(rowtype.get(0).path("type").asText() == "text")
      assert(rowtype.get(1).path("type").asText() == "fixed")

      val bytes = java.util.Base64.getDecoder.decode(
        data.path("rowsetBase64").asText())
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new ByteArrayInputStream(bytes), alloc)
      try {
        var n = 0
        while (reader.loadNextBatch())
          n += reader.getVectorSchemaRoot.getRowCount
        assert(n == 5)
      } finally { reader.close(); alloc.close() }

      // errors come back success=false, not a 500
      val bad = post(port, "/queries/v1/query-request",
        """{"sqlText":"SELECT * FROM nonexistent_xyz"}""", token = Some(token))
      assert(!bad.path("success").asBoolean())

      val hb = post(port, "/session/heartbeat", "{}", token = Some(token))
      assert(hb.path("success").asBoolean())
      val del = post(port, "/session?delete=true", "{}", token = Some(token))
      assert(del.path("success").asBoolean())
      val afterDelete = post(port, "/queries/v1/query-request",
        """{"sqlText":"SELECT 1"}""", token = Some(token))
      assert(!afterDelete.path("success").asBoolean())
    } finally server.stop()
  }

  test("timestamps cross the wire as {epoch, fraction} structs with metadata") {
    val server = new SnowflakeServer(spark, Some("/root/testdata/sf0.001"))
    val port = server.start()
    try {
      val login = post(port, "/session/v1/login-request", "{}")
      val token = login.path("data").path("token").asText()
      // login returns the session-parameter set clients expect
      val pNames = (0 until login.path("data").path("parameters").size())
        .map(i => login.path("data").path("parameters").get(i)
          .path("name").asText()).toSet
      assert(pNames.contains("AUTOCOMMIT") &&
        pNames.contains("DATE_OUTPUT_FORMAT") && pNames.contains("TIMEZONE"))

      val resp = post(port, "/queries/v1/query-request",
        """{"sqlText":"SELECT TIMESTAMP '2024-03-01 12:34:56.789' AS ts, 1 AS n"}""",
        token = Some(token))
      assert(resp.path("success").asBoolean(), resp.toString)
      val data = resp.path("data")
      // rowtype still reports the LOGICAL type, not the struct encoding
      assert(data.path("rowtype").get(0).path("type").asText()
        .startsWith("timestamp"))

      val bytes = java.util.Base64.getDecoder.decode(
        data.path("rowsetBase64").asText())
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new ByteArrayInputStream(bytes), alloc)
      try {
        val schema = reader.getVectorSchemaRoot.getSchema
        val tsField = schema.getFields.get(0)
        // Snowflake's wire shape: struct{epoch: int64, fraction: int32}
        // with column metadata (universql/protocol/utils.py:173-220)
        assert(tsField.getType.isInstanceOf[
          org.apache.arrow.vector.types.pojo.ArrowType.Struct], tsField.toString)
        val children = tsField.getChildren
        assert(children.get(0).getName == "epoch")
        assert(children.get(1).getName == "fraction")
        val meta = tsField.getMetadata
        assert(meta.get("logicalType").startsWith("TIMESTAMP"))
        assert(meta.get("scale") == "9")
        assert(meta.get("physicalType") == "SB16")

        assert(reader.loadNextBatch())
        val root = reader.getVectorSchemaRoot
        val sv = root.getVector(0)
          .asInstanceOf[org.apache.arrow.vector.complex.StructVector]
        val epoch = sv.getChild("epoch")
          .asInstanceOf[org.apache.arrow.vector.BigIntVector].get(0)
        val fraction = sv.getChild("fraction")
          .asInstanceOf[org.apache.arrow.vector.IntVector].get(0)
        // 2024-03-01T12:34:56.789Z = 1709296496 s + 789_000_000 ns
        assert(epoch == 1709296496L, s"epoch $epoch")
        assert(fraction == 789000000, s"fraction $fraction")
        // plain columns keep native encoding + FIXED metadata
        val nField = schema.getFields.get(1)
        assert(nField.getMetadata.get("logicalType") == "FIXED")
      } finally { reader.close(); alloc.close() }
    } finally server.stop()
  }

  test("two sessions keep independent USE state") {
    val server = new SnowflakeServer(spark, Some("/root/testdata/sf0.001"))
    val port = server.start()
    try {
      val t1 = post(port, "/session/v1/login-request", "{}")
        .path("data").path("token").asText()
      val t2 = post(port, "/session/v1/login-request", "{}")
        .path("data").path("token").asText()
      post(port, "/queries/v1/query-request",
        """{"sqlText":"USE DATABASE otherdb"}""", token = Some(t1))
      val r1 = post(port, "/queries/v1/query-request",
        """{"sqlText":"SELECT 1 AS x"}""", token = Some(t1))
      val r2 = post(port, "/queries/v1/query-request",
        """{"sqlText":"SELECT count(*) AS n FROM orders"}""", token = Some(t2))
      assert(r1.path("data").path("finalDatabaseName").asText() == "OTHERDB")
      // session 2 still resolves the lake under GRAFT
      assert(r2.path("success").asBoolean(), r2.toString)
      assert(r2.path("data").path("finalDatabaseName").asText() == "GRAFT")
    } finally server.stop()
  }

  test("USE DATABASE from login params sticks to the session") {
    val server = new SnowflakeServer(spark, Some("/root/testdata/sf0.001"))
    val port = server.start()
    try {
      val login = post(port,
        "/session/v1/login-request?databaseName=GRAFT&schemaName=PUBLIC", "{}")
      val token = login.path("data").path("token").asText()
      assert(login.path("data").path("sessionInfo")
        .path("databaseName").asText() == "GRAFT")
      val resp = post(port, "/queries/v1/query-request",
        """{"sqlText":"SELECT count(*) AS n FROM public.orders"}""",
        token = Some(token))
      assert(resp.path("success").asBoolean(), resp.toString)
      assert(resp.path("data").path("finalSchemaName").asText() == "PUBLIC")
    } finally server.stop()
  }
}
