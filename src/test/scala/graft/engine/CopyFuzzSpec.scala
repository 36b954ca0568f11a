package graft.engine

import java.nio.file.{Files, Path}
import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized differential fuzz of the COPY INTO option
  * map — the eighth fuzz family (round-12 directive #3). The reference
  * executes COPY as `INSERT INTO t SELECT * FROM read_csv([files],
  * mapped_params)` (`universql/plugins/snow.py:420-437`, option map at
  * `:89-258`), so DuckDB's readers with independently hand-mapped
  * params ARE the reference semantics; this harness renders random
  * typed rows to files under random option subsets (format × delimiter
  * × enclosure/escape × SKIP_HEADER × NULL_IF × TRIM_SPACE ×
  * date/timestamp formats × gzip × multi-file/FILES pinning × edge rows
  * — embedded delimiters, quoted newlines, escaped quotes, null-marker
  * collisions), loads them through GraftSession's COPY INTO, and
  * compares the loaded table against DuckDB reading the same bytes.
  *
  * The DuckDB param mapping here is written from the reference tables
  * directly — it never consults CopyOptions — so a divergence in our
  * Snowflake→Spark translation (delimiter escapes, null lists, skip
  * semantics, quote/escape wiring) surfaces as a row mismatch.
  * Deviations from the REFERENCE (not Snowflake) encoded below:
  * TRIM_SPACE is honored here per Snowflake semantics (the reference
  * drops it, snow.py:139-141 maps it to None), so the oracle applies
  * TRIM() itself when set.
  */
class CopyFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val TS_FMT = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** One logical row: k is never null (order key). */
  private case class R(k: Long, v: Option[Double], s: Option[String],
      d: Option[LocalDate], t: Option[LocalDateTime])

  /** Snowflake string literal with backslash + quote escaping so the
    * engine's unescape round-trips control characters. */
  private def snowLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''")
      .replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r") + "'"

  /** Independent Snowflake→strptime datetime token translation (test
    * knowledge; never calls the engine's translator). */
  private def duckFmt(snow: String): String =
    snow.replace("YYYY", "%Y").replace("HH24", "%H").replace("MI", "%M")
      .replace("SS", "%S").replace("MM", "%m").replace("DD", "%d")

  private def fmtCell(x: Any): String = x match {
    case null => "NULL"
    case b: java.math.BigDecimal => b.toBigInteger.toString
    case d: java.lang.Double => String.format(Locale.ROOT, "%.2f", d)
    case s: String => s
    case dt: java.sql.Date => dt.toString
    case ld: LocalDate => ld.toString
    case ts: java.sql.Timestamp => ts.toLocalDateTime.format(TS_FMT)
    case ldt: LocalDateTime => ldt.format(TS_FMT)
    case other => other.toString
  }

  test("200+ random COPY INTO cases (csv/json/parquet x option map) match DuckDB") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260815").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")

    val engineRows = scala.collection.mutable.Map.empty[String, Either[String, Seq[String]]]
    val duckSql = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val caseDesc = scala.collection.mutable.Map.empty[String, String]

    def genRows(caseIdx: Int, n: Int, strGen: () => Option[String]): Seq[R] =
      (0 until n).map { i =>
        R(caseIdx * 1000000L + i,
          if (rnd.nextInt(6) == 0) None
          else Some(rnd.nextInt(40000) / 4.0),
          strGen(),
          if (rnd.nextInt(6) == 0) None
          else Some(LocalDate.of(2020, 1, 1).plusDays(rnd.nextInt(1500))),
          if (rnd.nextInt(6) == 0) None
          else Some(LocalDateTime.of(2020, 1, 1, 0, 0, 0)
            .plusSeconds(rnd.nextInt(100000000))))
      }

    /** Collect the engine-side table rendering; errors captured. */
    def engineSide(id: String, table: String): Unit =
      engineRows(id) =
        try Right(s.sql(s"SELECT k, v, s, d, t FROM $table ORDER BY k")
          .collect().toSeq.map(r =>
            (0 until 5).map(j => fmtCell(r.get(j))).mkString("|")))
        catch { case e: Throwable => Left(e.toString) }

    val duckProj =
      """coalesce(c0::VARCHAR,'NULL')||'|'||coalesce(printf('%.2f',c1),'NULL')||'|'||""" +
      """coalesce(%S%,'NULL')||'|'||coalesce(strftime(c3,'%Y-%m-%d'),'NULL')||'|'||""" +
      """coalesce(strftime(c4,'%Y-%m-%d %H:%M:%S'),'NULL')"""

    // ── CSV cases ─────────────────────────────────────────────────────────
    val nCsv = sys.env.get("GRAFT_COPYFUZZ_CSV").map(_.toInt).getOrElse(150)
    for (ci <- 0 until nCsv) {
      val id = s"csv_$ci"
      val delim = pick(Seq(",", "|", ";", "\t"))
      val quote = if (rnd.nextBoolean()) Some('"') else None
      val escape = quote.map(_ => pick(Seq('\\', '"')))
      val skip = pick(Seq(0, 0, 1, 1, 2))
      val gzip = rnd.nextInt(4) == 0
      val crlf = quote.isEmpty && !gzip && rnd.nextInt(5) == 0
      val allowNl = quote.isDefined && skip <= 1 && !crlf
      // DuckDB refuses an ESCAPE char that appears in nullstr ("ESCAPE
      // must not appear in the NULL specification"), so the oracle can't
      // pair escape='\' with the '\N' marker; the engine accepts it (as
      // Snowflake does) but the combination is untestable differentially.
      val nullIf: Seq[String] =
        pick(Seq(Nil, Nil, Seq("NULL"), Seq("\\N"), Seq("", "NA"),
          Seq("nil", "NULL"))
          .filterNot(_.exists(m => escape.exists(e => m.contains(e)))))
      val trimSpace = quote.isEmpty && rnd.nextInt(3) == 0
      val dateFmt = pick(Seq(None, None, Some("YYYY-MM-DD"), Some("MM/DD/YYYY")))
      val tsFmt = pick(Seq(None, Some("YYYY-MM-DD HH24:MI:SS")))
      val twoFiles = rnd.nextInt(3) == 0
      val pinFirst = twoFiles && rnd.nextInt(3) == 0
      caseDesc(id) = s"delim=${snowLit(delim)} quote=$quote escape=$escape " +
        s"skip=$skip gzip=$gzip crlf=$crlf nullIf=$nullIf trim=$trimSpace " +
        s"dateFmt=$dateFmt tsFmt=$tsFmt twoFiles=$twoFiles pin=$pinFirst"

      // string alphabet honoring the options
      val safe = "abcXY01 _-=:#@e9"
      def strGen(): Option[String] = {
        if (rnd.nextInt(6) == 0) return None
        val mode = rnd.nextInt(10)
        val v0 =
          if (mode == 0 && nullIf.exists(_.nonEmpty))
            pick(nullIf.filter(_.nonEmpty)) // exact null-marker collision
          else if (mode == 1 && quote.isDefined) s"a${delim}b${delim}c"
          else if (mode == 2 && quote.isDefined && escape.isDefined)
            "he said \"hi\" twice"
          else if (mode == 3 && allowNl) "line1\nline2"
          else if (mode == 4 && quote.isDefined) s"bs\\${delim}end"
          else (0 until 1 + rnd.nextInt(10))
            .map(_ => safe(rnd.nextInt(safe.length))).mkString
        val v = if (quote.isEmpty) v0.trim.replace("\"", "q") else v0
        if (v.isEmpty) None else Some(v)
      }

      val rows = genRows(ci, 12 + rnd.nextInt(20), () => strGen())
      val dFmtJ = dateFmt.getOrElse("YYYY-MM-DD")
      val tFmtJ = tsFmt.getOrElse("YYYY-MM-DD HH24:MI:SS")
      def renderDate(d: LocalDate): String =
        DateTimeFormatter.ofPattern(
          dFmtJ.replace("YYYY", "yyyy").replace("DD", "dd")).format(d)
      def renderTs(t: LocalDateTime): String =
        DateTimeFormatter.ofPattern(
          tFmtJ.replace("YYYY", "yyyy").replace("DD", "dd")
            .replace("HH24", "HH").replace("MI", "mm").replace("SS", "ss"))
          .format(t)
      val nullMarker = nullIf.headOption.getOrElse("")
      def cell(raw: Option[String], pad: Boolean): String = raw match {
        case None => nullMarker
        case Some(x) =>
          val padded =
            if (pad && trimSpace && !nullIf.contains(x.trim))
              (" " * rnd.nextInt(3)) + x + (" " * rnd.nextInt(3))
            else x
          quote match {
            case Some(q) =>
              val needs = padded.contains(delim) || padded.contains(q) ||
                padded.contains('\n') || padded.contains('\r') ||
                rnd.nextInt(4) == 0
              if (!needs) padded
              else {
                val e = escape.get
                val body =
                  if (e == q) padded.replace(q.toString, s"$q$q")
                  else padded.replace(e.toString, s"$e$e")
                    .replace(q.toString, s"$e$q")
                s"$q$body$q"
              }
            case None => padded
          }
      }
      def line(r: R): String = Seq(
        cell(Some(r.k.toString), pad = false),
        cell(r.v.map(d => String.format(Locale.ROOT, "%.2f", d)), pad = false),
        cell(r.s, pad = true),
        cell(r.d.map(renderDate), pad = false),
        cell(r.t.map(renderTs), pad = false)).mkString(delim)

      val dir = Files.createTempDirectory(s"graft_copyfuzz_$id")
      val eol = if (crlf) "\r\n" else "\n"
      val junk = (0 until skip).map(j => s"#junk header line $j")
      def writeFile(p: Path, rs: Seq[R]): Unit = {
        val text = (junk ++ rs.map(line)).mkString("", eol, eol)
        if (gzip) {
          val os = new java.util.zip.GZIPOutputStream(
            Files.newOutputStream(p))
          os.write(text.getBytes("UTF-8")); os.close()
        } else Files.writeString(p, text)
      }
      val ext = if (gzip) "csv.gz" else "csv"
      val (f1, f2) = (dir.resolve(s"a.$ext"), dir.resolve(s"b.$ext"))
      if (twoFiles) {
        val (r1, r2) = rows.splitAt(rows.length / 2)
        writeFile(f1, r1); writeFile(f2, r2)
      } else writeFile(f1, rows)

      val ffOpts = scala.collection.mutable.ArrayBuffer[String](
        "TYPE = CSV", s"FIELD_DELIMITER = ${snowLit(delim)}")
      quote.foreach(q => ffOpts +=
        s"FIELD_OPTIONALLY_ENCLOSED_BY = ${snowLit(q.toString)}")
      escape.foreach(e => ffOpts += s"ESCAPE = ${snowLit(e.toString)}")
      if (skip > 0) ffOpts += s"SKIP_HEADER = $skip"
      if (nullIf.nonEmpty) ffOpts +=
        s"NULL_IF = (${nullIf.map(snowLit).mkString(", ")})"
      if (trimSpace) ffOpts += "TRIM_SPACE = TRUE"
      dateFmt.foreach(f => ffOpts += s"DATE_FORMAT = ${snowLit(f)}")
      tsFmt.foreach(f => ffOpts += s"TIMESTAMP_FORMAT = ${snowLit(f)}")
      if (gzip) ffOpts += "COMPRESSION = GZIP"

      val filesClause =
        if (pinFirst) s" FILES = ('a.$ext')"
        else ""
      try {
        s.sql(s"CREATE OR REPLACE TABLE cfz_$ci " +
          "(k BIGINT, v DOUBLE, s VARCHAR, d DATE, t TIMESTAMP)")
        s.sql(s"CREATE STAGE cfz_stage_$ci URL='${dir.toString}'")
        s.sql(s"COPY INTO cfz_$ci FROM @cfz_stage_$ci$filesClause " +
          s"FILE_FORMAT = (${ffOpts.mkString(" ")})")
        engineSide(id, s"cfz_$ci")
      } catch { case e: Throwable => engineRows(id) = Left(e.toString) }

      val duckFiles =
        (if (pinFirst || !twoFiles) Seq(f1) else Seq(f1, f2))
          .map(p => DuckOracle.lit(p.toString)).mkString("[", ",", "]")
      val params = scala.collection.mutable.ArrayBuffer[String](
        "columns={'c0':'BIGINT','c1':'DOUBLE','c2':'VARCHAR','c3':'DATE','c4':'TIMESTAMP'}",
        "header=false", "auto_detect=false",
        s"delim=${DuckOracle.lit(delim)}")
      quote.foreach(q => params += s"quote=${DuckOracle.lit(q.toString)}")
      escape.foreach(e => params += s"escape=${DuckOracle.lit(e.toString)}")
      if (skip > 0) params += s"skip=$skip"
      if (nullIf.nonEmpty) params +=
        s"nullstr=[${nullIf.map(DuckOracle.lit).mkString(",")}]"
      dateFmt.foreach(f => params +=
        s"dateformat=${DuckOracle.lit(duckFmt(f))}")
      tsFmt.foreach(f => params +=
        s"timestampformat=${DuckOracle.lit(duckFmt(f))}")
      val proj = duckProj.replace("%S%", if (trimSpace) "trim(c2)" else "c2")
      duckSql += id ->
        s"SELECT $proj AS r FROM read_csv($duckFiles, ${params.mkString(", ")}) ORDER BY c0"
    }

    // ── JSON cases ────────────────────────────────────────────────────────
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val nJson = sys.env.get("GRAFT_COPYFUZZ_JSON").map(_.toInt).getOrElse(40)
    for (ji <- 0 until nJson) {
      val ci = 10000 + ji
      val id = s"json_$ji"
      val arrayMode = rnd.nextBoolean()
      caseDesc(id) = s"arrayMode=$arrayMode"
      val safe = "abcXY01 _-=:#@\"\\é"
      def strGen(): Option[String] =
        if (rnd.nextInt(6) == 0) None
        else Some((0 until 1 + rnd.nextInt(10))
          .map(_ => safe(rnd.nextInt(safe.length))).mkString)
      val rows = genRows(ci, 12 + rnd.nextInt(15), () => strGen())
      def obj(r: R, forceAll: Boolean): String = {
        val o = om.createObjectNode()
        o.put("k", r.k)
        // a missing key and an explicit null are both NULL after load
        def put[A](key: String, v: Option[A])(f: A => Unit): Unit =
          v match {
            case Some(x) => f(x)
            case None =>
              if (forceAll || rnd.nextBoolean()) o.putNull(key) else ()
          }
        put("v", r.v)(x => o.put("v", x))
        put("s", r.s)(x => o.put("s", x))
        put("d", r.d)(x => o.put("d", x.toString))
        put("t", r.t)(x => o.put("t", x.format(TS_FMT)))
        o.toString
      }
      // first row carries every key so schema inference + by-name
      // alignment always sees all five columns
      val objs = rows.zipWithIndex.map { case (r, i) => obj(r, i == 0) }
      val text =
        if (arrayMode) objs.mkString("[", ",\n", "]")
        else objs.mkString("", "\n", "\n")
      val dir = Files.createTempDirectory(s"graft_copyfuzz_$id")
      val f1 = dir.resolve("a.json")
      Files.writeString(f1, text)
      val ff = "TYPE = JSON" +
        (if (arrayMode) " STRIP_OUTER_ARRAY = TRUE" else "")
      try {
        s.sql(s"CREATE OR REPLACE TABLE cfz_$ci " +
          "(k BIGINT, v DOUBLE, s VARCHAR, d DATE, t TIMESTAMP)")
        s.sql(s"CREATE STAGE cfz_stage_$ci URL='${dir.toString}'")
        s.sql(s"COPY INTO cfz_$ci FROM @cfz_stage_$ci FILE_FORMAT = ($ff)")
        engineSide(id, s"cfz_$ci")
      } catch { case e: Throwable => engineRows(id) = Left(e.toString) }
      val fmt = if (arrayMode) "array" else "newline_delimited"
      val proj = duckProj.replace("%S%", "c2")
      duckSql += id -> (s"SELECT $proj AS r FROM read_json(" +
        s"[${DuckOracle.lit(f1.toString)}], format='$fmt', " +
        "columns={'k':'BIGINT','v':'DOUBLE','s':'VARCHAR','d':'DATE','t':'TIMESTAMP'}) " +
        "ORDER BY k").replace("c0", "k").replace("c1", "v")
        .replace("c2", "s").replace("c3", "d").replace("c4", "t")
    }

    // ── PARQUET cases (by-name, case-insensitive alignment) ──────────────
    val nPq = sys.env.get("GRAFT_COPYFUZZ_PQ").map(_.toInt).getOrElse(15)
    for (pi <- 0 until nPq) {
      val ci = 20000 + pi
      val id = s"pq_$pi"
      val upper = rnd.nextBoolean()
      caseDesc(id) = s"upperNames=$upper"
      val rows = genRows(ci, 12 + rnd.nextInt(15),
        () => if (rnd.nextInt(5) == 0) None else Some("s" + rnd.nextInt(1000)))
      import spark.implicits._
      val names = Seq("k", "v", "s", "d", "t")
        .map(n => if (upper) n.toUpperCase else n)
      val df = rows.map(r => (r.k, r.v, r.s,
          r.d.map(java.sql.Date.valueOf), r.t.map(_.format(TS_FMT))))
        .toDF(names: _*)
        .withColumn(names(4),
          org.apache.spark.sql.functions.col(names(4))
            .cast(org.apache.spark.sql.types.TimestampNTZType))
      val dir = Files.createTempDirectory(s"graft_copyfuzz_$id")
      df.coalesce(1).write.mode("overwrite").parquet(dir.resolve("p").toString)
      try {
        s.sql(s"CREATE OR REPLACE TABLE cfz_$ci " +
          "(k BIGINT, v DOUBLE, s VARCHAR, d DATE, t TIMESTAMP)")
        s.sql(s"CREATE STAGE cfz_stage_$ci URL='${dir.toString}'")
        s.sql(s"COPY INTO cfz_$ci FROM @cfz_stage_$ci/p " +
          "FILE_FORMAT = (TYPE = PARQUET)")
        engineSide(id, s"cfz_$ci")
      } catch { case e: Throwable => engineRows(id) = Left(e.toString) }
      def q(n: String) = "\"" + (if (upper) n.toUpperCase else n) + "\""
      val proj = duckProj.replace("%S%", q("s"))
        .replace("c0", q("k")).replace("c1", q("v"))
        .replace("c3", q("d")).replace("c4", q("t"))
      duckSql += id -> (s"SELECT $proj AS r FROM read_parquet(" +
        s"[${DuckOracle.lit(dir.resolve("p").toString + "/*.parquet")}]) " +
        s"ORDER BY ${q("k")}")
    }

    // ── one batched oracle run + compare ─────────────────────────────────
    val oracle = DuckOracle.run(duckSql.toSeq)
    var mismatches = 0
    val report = new StringBuilder
    duckSql.foreach { case (id, sql) =>
      (engineRows(id), oracle(id)) match {
        case (Right(got), Right(want)) =>
          if (got != want) {
            mismatches += 1
            val diffs = got.zipAll(want, "<missing>", "<missing>")
              .filter { case (g, w) => g != w }.take(3)
            report ++= s"\n== $id (${caseDesc(id)})\n  engine ${got.length} rows, " +
              s"duckdb ${want.length} rows; first diffs:\n" +
              diffs.map { case (g, w) => s"   got=$g\n  want=$w" }.mkString("\n") +
              s"\n  duck sql: $sql\n"
          }
        case (Left(ee), Left(_)) => () // both sides refused — agreement
        case (Left(ee), Right(_)) =>
          mismatches += 1
          report ++= s"\n== $id (${caseDesc(id)}) engine ERROR, duckdb ok: $ee\n"
        case (Right(_), Left(de)) =>
          mismatches += 1
          report ++= s"\n== $id (${caseDesc(id)}) duckdb ERROR, engine ok: $de\n"
      }
    }
    assert(duckSql.size >= 200,
      s"case budget shrank: ${duckSql.size} < 200")
    assert(mismatches == 0,
      s"seed=$seed: $mismatches/${duckSql.size} COPY cases diverged:$report")
  }

  /** Round-13 directive #4: the avro + unload gaps. AVRO loads are
    * self-oracled (this DuckDB build has no avro reader — the table
    * contents are compared against the generated rows the test wrote),
    * and unload→re-load cycles run format × compression × HEADER ×
    * SINGLE × OVERWRITE through COPY INTO @stage and back, with DuckDB
    * independently reading the unloaded bytes for every format it can
    * (csv/json/parquet) so a mis-mapped writer option surfaces as a
    * byte-level divergence, not just a self-consistent round trip. */
  test("100+ avro-load and unload/re-load COPY cases") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260815").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")

    def genRows(base: Long, n: Int, strGen: () => Option[String]): Seq[R] =
      (0 until n).map { i =>
        R(base + i,
          if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(40000) / 4.0),
          strGen(),
          if (rnd.nextInt(6) == 0) None
          else Some(LocalDate.of(2020, 1, 1).plusDays(rnd.nextInt(1500))),
          if (rnd.nextInt(6) == 0) None
          else Some(LocalDateTime.of(2020, 1, 1, 0, 0, 0)
            .plusSeconds(rnd.nextInt(100000000))))
      }
    def expectRender(rows: Seq[R]): Seq[String] = rows.map(r => Seq(
      r.k.toString,
      r.v.map(d => String.format(Locale.ROOT, "%.2f", d)).getOrElse("NULL"),
      r.s.getOrElse("NULL"),
      r.d.map(_.toString).getOrElse("NULL"),
      r.t.map(_.format(TS_FMT)).getOrElse("NULL")).mkString("|"))
    def tableRender(table: String): Seq[String] =
      s.sql(s"SELECT k, v, s, d, t FROM $table ORDER BY k")
        .collect().toSeq.map(r =>
          (0 until 5).map(j => fmtCell(r.get(j))).mkString("|"))

    val failures = new StringBuilder
    var nCases = 0
    def check(id: String, desc: String, got: => Seq[String],
        want: Seq[String]): Unit = {
      nCases += 1
      val g = try Right(got) catch { case e: Throwable => Left(e.toString) }
      g match {
        case Right(rows) if rows == want => ()
        case Right(rows) =>
          val diffs = rows.zipAll(want, "<missing>", "<missing>")
            .filter { case (a, b) => a != b }.take(3)
          failures ++= s"\n== $id ($desc) ${rows.length} vs ${want.length} rows:\n" +
            diffs.map { case (a, b) => s"   got=$a\n  want=$b" }.mkString("\n")
        case Left(err) =>
          failures ++= s"\n== $id ($desc) ERROR: $err"
      }
    }

    // ── AVRO loads: engine COPY over independently written avro files ──
    val nAvro = sys.env.get("GRAFT_COPYFUZZ_AVRO").map(_.toInt).getOrElse(30)
    for (ai <- 0 until nAvro) {
      val ci = 30000 + ai
      val id = s"avro_$ai"
      val upper = rnd.nextBoolean()
      val twoFiles = rnd.nextInt(3) == 0
      val rows = genRows(ci * 1000000L, 12 + rnd.nextInt(15),
        () => if (rnd.nextInt(5) == 0) None
              else Some("av" + rnd.nextInt(1000) + pick(Seq("", " x", "é"))))
      import spark.implicits._
      val names = Seq("k", "v", "s", "d", "t")
        .map(n => if (upper) n.toUpperCase else n)
      val df = rows.map(r => (r.k, r.v, r.s,
          r.d.map(java.sql.Date.valueOf), r.t.map(_.format(TS_FMT))))
        .toDF(names: _*)
        .withColumn(names(4),
          org.apache.spark.sql.functions.col(names(4))
            .cast(org.apache.spark.sql.types.TimestampNTZType))
      val dir = Files.createTempDirectory(s"graft_copyfuzz_$id")
      df.coalesce(if (twoFiles) 2 else 1).write.mode("overwrite")
        .format("org.apache.spark.sql.avro.AvroFileFormat")
        .save(dir.resolve("a").toString)
      s.sql(s"CREATE OR REPLACE TABLE cfa_$ci " +
        "(k BIGINT, v DOUBLE, s VARCHAR, d DATE, t TIMESTAMP)")
      s.sql(s"CREATE STAGE cfa_stage_$ci URL='${dir.toString}'")
      s.sql(s"COPY INTO cfa_$ci FROM @cfa_stage_$ci/a " +
        "FILE_FORMAT = (TYPE = AVRO)")
      check(id, s"upper=$upper twoFiles=$twoFiles",
        tableRender(s"cfa_$ci"), expectRender(rows))
    }

    // ── unload → re-load cycles ───────────────────────────────────────
    val duckSql = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val duckWant = scala.collection.mutable.Map.empty[String, Seq[String]]
    val duckDesc = scala.collection.mutable.Map.empty[String, String]
    val duckProj2 =
      """coalesce(k::VARCHAR,'NULL')||'|'||coalesce(printf('%.2f',v),'NULL')||'|'||""" +
      """coalesce(s,'NULL')||'|'||coalesce(strftime(d,'%Y-%m-%d'),'NULL')||'|'||""" +
      """coalesce(strftime(t,'%Y-%m-%d %H:%M:%S'),'NULL')"""
    val nUnload =
      sys.env.get("GRAFT_COPYFUZZ_UNLOAD").map(_.toInt).getOrElse(75)
    for (ui <- 0 until nUnload) {
      val ci = 40000 + ui
      val id = s"unload_$ui"
      val fmt = pick(Seq("CSV", "CSV", "CSV", "JSON", "PARQUET", "AVRO"))
      val delim = if (fmt == "CSV") pick(Seq(",", "|", ";")) else ","
      val gz = fmt != "PARQUET" && fmt != "AVRO" && rnd.nextInt(3) == 0
      val header = fmt == "CSV" && rnd.nextBoolean()
      val single = rnd.nextInt(3) == 0
      val rewrite = rnd.nextInt(4) == 0 // second unload with OVERWRITE
      val desc = s"fmt=$fmt delim=$delim gz=$gz header=$header " +
        s"single=$single rewrite=$rewrite"
      // strings exercise the writer's quoting: embedded delimiter and
      // quote chars (backslash left out — its round trip is covered by
      // the load family; here the WRITER picks the escapes)
      def strGen(): Option[String] =
        if (rnd.nextInt(6) == 0) None
        else Some(rnd.nextInt(8) match {
          case 0 => s"a${delim}b"
          case 1 => "he said \"hi\""
          case 2 => s"q\"${delim}\"q"
          case _ => "u" + rnd.nextInt(1000) + pick(Seq("", " tail", "é"))
        })
      val rows = genRows(ci * 1000000L, 12 + rnd.nextInt(12), () => strGen())
      def sqlLit(r: R): String = Seq(
        r.k.toString,
        r.v.map(d => String.format(Locale.ROOT, "%.2f", d)).getOrElse("NULL"),
        r.s.map(snowLit).getOrElse("NULL"),
        r.d.map(d => s"DATE '$d'").getOrElse("NULL"),
        r.t.map(t => s"TIMESTAMP '${t.format(TS_FMT)}'").getOrElse("NULL")
      ).mkString("(", ", ", ")")
      val dir = Files.createTempDirectory(s"graft_copyfuzz_$id")
      s.sql(s"CREATE OR REPLACE TABLE cfu_src_$ci " +
        "(k BIGINT, v DOUBLE, s VARCHAR, d DATE, t TIMESTAMP)")
      s.sql(s"INSERT INTO cfu_src_$ci VALUES " +
        rows.map(sqlLit).mkString(", "))
      s.sql(s"CREATE STAGE cfu_stage_$ci URL='${dir.toString}'")
      val ffW = scala.collection.mutable.ArrayBuffer[String](s"TYPE = $fmt")
      if (fmt == "CSV") {
        ffW += s"FIELD_DELIMITER = ${snowLit(delim)}"
        ffW += "FIELD_OPTIONALLY_ENCLOSED_BY = '\"'"
      }
      if (gz) ffW += "COMPRESSION = GZIP"
      val copyOpts = (if (header) " HEADER = TRUE" else "") +
        (if (single) " SINGLE = TRUE" else "") + " OVERWRITE = TRUE"
      def unload(): Unit =
        s.sql(s"COPY INTO @cfu_stage_$ci/out FROM cfu_src_$ci " +
          s"FILE_FORMAT = (${ffW.mkString(" ")})$copyOpts")
      unload()
      if (rewrite) unload() // OVERWRITE replaces, never appends
      else if (rnd.nextInt(5) == 0) {
        // without OVERWRITE a second unload to the same path must refuse
        val noOw = s"COPY INTO @cfu_stage_$ci/out FROM cfu_src_$ci " +
          s"FILE_FORMAT = (${ffW.mkString(" ")})" +
          (if (header) " HEADER = TRUE" else "")
        intercept[Exception] { s.sql(noOw) }
      }
      val ffR = scala.collection.mutable.ArrayBuffer[String](s"TYPE = $fmt")
      if (fmt == "CSV") {
        ffR += s"FIELD_DELIMITER = ${snowLit(delim)}"
        ffR += "FIELD_OPTIONALLY_ENCLOSED_BY = '\"'"
        if (header) ffR += "SKIP_HEADER = 1"
      }
      if (gz) ffR += "COMPRESSION = GZIP"
      s.sql(s"CREATE OR REPLACE TABLE cfu_dst_$ci " +
        "(k BIGINT, v DOUBLE, s VARCHAR, d DATE, t TIMESTAMP)")
      s.sql(s"COPY INTO cfu_dst_$ci FROM @cfu_stage_$ci/out " +
        s"FILE_FORMAT = (${ffR.mkString(" ")})")
      val srcRender = tableRender(s"cfu_src_$ci")
      check(id, desc, tableRender(s"cfu_dst_$ci"), srcRender)
      // independent read of the unloaded bytes where DuckDB can
      val glob = dir.resolve("out").toString + "/*"
      val duckRead = fmt match {
        case "CSV" =>
          val ext = if (gz) "*.csv.gz" else "*.csv"
          Some(s"read_csv([${DuckOracle.lit(dir.resolve("out").toString + "/" + ext)}], " +
            "columns={'k':'BIGINT','v':'DOUBLE','s':'VARCHAR','d':'DATE','t':'TIMESTAMP'}, " +
            s"header=$header, auto_detect=false, delim=${DuckOracle.lit(delim)}, " +
            "quote='\"', escape='\\')")
        case "JSON" =>
          val ext = if (gz) "*.json.gz" else "*.json"
          // unquoted identifiers normalize to UPPERCASE in the engine, so
          // the unloaded JSON keys are K/V/S/D/T — json keys are
          // case-sensitive data for DuckDB's columns map (identifier
          // references in the projection stay case-insensitive)
          Some(s"read_json([${DuckOracle.lit(dir.resolve("out").toString + "/" + ext)}], " +
            "format='newline_delimited', " +
            "columns={'K':'BIGINT','V':'DOUBLE','S':'VARCHAR','D':'DATE','T':'TIMESTAMP'})")
        case "PARQUET" =>
          Some(s"read_parquet([${DuckOracle.lit(dir.resolve("out").toString + "/*.parquet")}])")
        case _ => None // AVRO: no reader in this DuckDB build
      }
      duckRead.foreach { rd =>
        duckSql += id -> s"SELECT $duckProj2 AS r FROM $rd ORDER BY k"
        duckWant(id) = srcRender
        duckDesc(id) = desc
      }
    }
    val oracle = DuckOracle.run(duckSql.toSeq)
    duckSql.foreach { case (id, sql) =>
      nCases += 1
      oracle(id) match {
        case Right(got) if got == duckWant(id) => ()
        case Right(got) =>
          val diffs = got.zipAll(duckWant(id), "<missing>", "<missing>")
            .filter { case (a, b) => a != b }.take(3)
          failures ++= s"\n== $id/duck (${duckDesc(id)}):\n" +
            diffs.map { case (a, b) => s"   duck=$a\n  want=$b" }.mkString("\n") +
            s"\n  sql: $sql"
        case Left(err) =>
          failures ++= s"\n== $id/duck (${duckDesc(id)}) DUCKDB ERROR: $err\n  sql: $sql"
      }
    }
    assert(failures.isEmpty, s"seed=$seed:$failures")
    assert(nAvro + nUnload >= 100, s"case budget shrank: ${nAvro + nUnload}")
  }
}
