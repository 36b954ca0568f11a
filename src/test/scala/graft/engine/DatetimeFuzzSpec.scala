package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized DIFFERENTIAL fuzz of the DATETIME surface —
  * the tenth fuzz family: DATEDIFF boundary counting (all parts +
  * alias spellings), DATEADD, TO_CHAR format tokens, TO_DATE /
  * TO_TIMESTAMP format-string parsing, DATE_TRUNC, DATE_PART/EXTRACT,
  * LAST_DAY, DAYNAME/MONTHNAME — against DUCKDB, which is where the
  * reference executes these (universql routes queries to DuckDB;
  * sqlglot renders Snowflake DATEDIFF as DuckDB DATE_DIFF, TO_CHAR as
  * STRFTIME, TO_TIMESTAMP-with-format as STRPTIME).
  *
  * Protocol: every case is a PAIR of scalar expressions — the
  * Snowflake-dialect text (through GraftSession → SnowflakeRewriter →
  * Spark) and an independently hand-mapped DuckDB rendering (its own
  * token table below — it never consults the rewriter's map). Both
  * sides cast the result to VARCHAR; Spark's timestamp→string cast and
  * DuckDB's VARCHAR cast agree byte-for-byte (trailing fraction zeros
  * trimmed, no fraction when zero — probed), so the only comparator
  * normalization is DATE-vs-midnight-TIMESTAMP (DuckDB date_trunc
  * returns DATE at day+ granularity where Spark returns TIMESTAMP).
  *
  * Instants bias to boundaries (leap days, year/month/quarter/hour
  * flips, pre-epoch, .999999 fractions) because boundary COUNTING is
  * the semantic under test: Snowflake/DuckDB count part boundaries
  * crossed while Spark's timestampdiff counts complete intervals — the
  * divergence this family exists to guard (fixed in
  * SnowflakeRewriter.dateDiffBoundary).
  *
  * ≥400 cases per run, fixed seed (GRAFT_FUZZ_SEED env /
  * graft.fuzz.seed prop override); failures carry seed + both
  * renderings.
  */
class DatetimeFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** One scalar expression in both dialects. */
  private case class C(snow: String, duck: String)

  test("400+ random datetime expressions: engine == DuckDB") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260816").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

    import java.time.{LocalDate, LocalDateTime, YearMonth}
    import java.time.format.DateTimeFormatter

    // ── instants, boundary-biased ─────────────────────────────────────
    val edges = Seq(
      LocalDateTime.of(2024, 2, 29, 23, 59, 59, 999999000),
      LocalDateTime.of(2023, 12, 31, 23, 59, 59, 999999000),
      LocalDateTime.of(2024, 1, 1, 0, 0, 0, 0),
      LocalDateTime.of(2000, 2, 29, 12, 0, 0, 0),
      LocalDateTime.of(1900, 3, 1, 0, 0, 0, 0),
      LocalDateTime.of(1969, 12, 31, 23, 59, 59, 500000000),
      LocalDateTime.of(2024, 3, 31, 23, 59, 59, 0),
      LocalDateTime.of(2024, 6, 30, 23, 0, 0, 0))
    def randInstant(): LocalDateTime =
      if (rnd.nextInt(4) == 0) pick(edges)
      else {
        val y = 1905 + rnd.nextInt(194)
        val m = 1 + rnd.nextInt(12)
        val ym = YearMonth.of(y, m)
        val d = if (rnd.nextInt(3) == 0) ym.lengthOfMonth()
                else 1 + rnd.nextInt(28)
        val micros = pick(Seq(0L, 1L, 500000L, 999999L,
          rnd.nextInt(1000000).toLong))
        LocalDateTime.of(y, m, d, rnd.nextInt(24), rnd.nextInt(60),
          rnd.nextInt(60), micros.toInt * 1000)
      }
    val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    def tsLit(t: LocalDateTime): String = t.format(tsFmt)
    def dLit(t: LocalDateTime): String =
      t.toLocalDate.format(DateTimeFormatter.ISO_LOCAL_DATE)

    /** Second instant near the first, biased to straddle boundaries. */
    def near(a: LocalDateTime): LocalDateTime = {
      val deltaMicros = pick(Seq(1L, -1L, 1000L, -1000L, 999999L,
        1000000L, -1000000L, 59L * 1000000, 3600L * 1000000,
        -3600L * 1000000, 25L * 3600 * 1000000,
        6L * 86400 * 1000000, -8L * 86400 * 1000000,
        31L * 86400 * 1000000, 366L * 86400 * 1000000,
        -366L * 86400 * 1000000,
        (rnd.nextLong(10L * 366 * 86400) - 5L * 366 * 86400) * 1000000))
      a.plusNanos(deltaMicros * 1000)
    }

    // ── test-side (independent) alias and token tables ────────────────
    val aliasPool: Map[String, Seq[String]] = Map(
      "year" -> Seq("year", "yy", "yyyy", "yr", "years"),
      "quarter" -> Seq("quarter", "q", "qtr"),
      "month" -> Seq("month", "mm", "mon", "mons"),
      "week" -> Seq("week", "wk", "woy", "weeks"),
      "day" -> Seq("day", "d", "dd", "days"),
      "hour" -> Seq("hour", "hh", "hr"),
      "minute" -> Seq("minute", "mi", "min"),
      "second" -> Seq("second", "s", "sec"),
      "millisecond" -> Seq("millisecond", "ms"),
      "microsecond" -> Seq("microsecond", "us"))
    def spell(canon: String): String = {
      val w = pick(aliasPool(canon))
      if (rnd.nextBoolean()) s"'$w'" else w
    }

    // Snowflake TO_CHAR token → (duck strftime, java formatting pattern)
    val fmtTokens: Seq[(String, String, String)] = Seq(
      ("YYYY", "%Y", "yyyy"), ("YY", "%y", "yy"),
      ("MM", "%m", "MM"), ("MON", "%b", "MMM"), ("MMMM", "%B", "MMMM"),
      ("DD", "%d", "dd"), ("DY", "%a", "EEE"),
      ("HH24", "%H", "HH"), ("MI", "%M", "mm"), ("SS", "%S", "ss"),
      ("FF3", "%g", "SSS"), ("FF6", "%f", "SSSSSS"))
    val seps = Seq("-", "/", " ", ":", ".", ", ")

    // parse shapes: (snow fmt, duck strptime fmt, java pattern, dateOnly)
    val parseShapes = Seq(
      ("YYYY-MM-DD HH24:MI:SS", "%Y-%m-%d %H:%M:%S",
        "yyyy-MM-dd HH:mm:ss", false),
      ("DD/MM/YYYY HH24:MI", "%d/%m/%Y %H:%M", "dd/MM/yyyy HH:mm", false),
      ("YYYY.MM.DD HH24:MI:SS.FF3", "%Y.%m.%d %H:%M:%S.%g",
        "yyyy.MM.dd HH:mm:ss.SSS", false),
      ("DD MON YYYY HH12:MI AM", "%d %b %Y %I:%M %p",
        "dd MMM yyyy hh:mm a", false),
      ("MM-DD-YYYY", "%m-%d-%Y", "MM-dd-yyyy", true),
      ("YYYY/MM/DD", "%Y/%m/%d", "yyyy/MM/dd", true),
      ("DD MON YYYY", "%d %b %Y", "dd MMM yyyy", true))

    // ── case generators ───────────────────────────────────────────────
    val subDay = Set("hour", "minute", "second", "millisecond",
      "microsecond")

    def genDateDiff(): C = {
      val canon = pick(aliasPool.keys.toSeq)
      // DuckDB's sub-day date_diff truncates toward zero on PRE-EPOCH
      // timestamps (date_diff('second', 1900-… .000000, …+1µs) = 1 while
      // its own date_trunc('second') floors both to the same second) — a
      // negative-micros artifact inconsistent with Snowflake (and with
      // DuckDB's calendar parts). The engine floors everywhere, so
      // sub-day cases draw post-epoch instants where both agree.
      var a = randInstant()
      while (subDay(canon) && a.getYear < 1980) a = randInstant()
      val b = near(a)
      if (rnd.nextInt(5) == 0 &&
          canon != "millisecond" && canon != "microsecond") {
        C(s"DATEDIFF(${spell(canon)}, '${dLit(a)}'::date, '${dLit(b)}'::date)",
          s"date_diff('$canon', DATE '${dLit(a)}', DATE '${dLit(b)}')")
      } else
        C(s"DATEDIFF(${spell(canon)}, '${tsLit(a)}'::timestamp, " +
            s"'${tsLit(b)}'::timestamp)",
          s"date_diff('$canon', TIMESTAMP '${tsLit(a)}', " +
            s"TIMESTAMP '${tsLit(b)}')")
    }

    def genDateAdd(): C = {
      val canon = pick(aliasPool.keys.toSeq)
      val n = canon match {
        case "year" => rnd.nextInt(240) - 120
        case "quarter" | "month" => rnd.nextInt(500) - 250
        case _ => rnd.nextInt(5000) - 2500
      }
      val a = randInstant()
      C(s"DATEADD(${spell(canon)}, $n, '${tsLit(a)}'::timestamp)",
        s"TIMESTAMP '${tsLit(a)}' + ($n) * INTERVAL 1 ${canon.toUpperCase}")
    }

    def genToChar(): C = {
      val a = randInstant()
      val n = 2 + rnd.nextInt(4)
      val toks = Seq.fill(n)(pick(fmtTokens))
      val sep = pick(seps)
      val snowFmt = toks.map(_._1).mkString(sep)
      val duckFmt = toks.map(_._2).mkString(sep)
      C(s"TO_CHAR('${tsLit(a)}'::timestamp, '$snowFmt')",
        s"strftime(TIMESTAMP '${tsLit(a)}', '$duckFmt')")
    }

    def genParse(): C = {
      val (snowFmt, duckFmt, javaFmt, dateOnly) = pick(parseShapes)
      val a = randInstant().withNano(
        if (snowFmt.contains("FF3")) (rnd.nextInt(1000) * 1000000)
        else 0)
      val str = a.format(DateTimeFormatter.ofPattern(javaFmt,
        java.util.Locale.US))
      if (dateOnly && rnd.nextBoolean())
        C(s"TO_DATE('$str', '$snowFmt')",
          s"CAST(strptime('$str', '$duckFmt') AS DATE)")
      else
        C(s"TO_TIMESTAMP('$str', '$snowFmt')",
          s"strptime('$str', '$duckFmt')")
    }

    def genTryParse(): C = {
      val (snowFmt, duckFmt, javaFmt, dateOnly) = pick(parseShapes)
      val a = randInstant().withNano(
        if (snowFmt.contains("FF3")) (rnd.nextInt(1000) * 1000000) else 0)
      var str = a.format(DateTimeFormatter.ofPattern(javaFmt,
        java.util.Locale.US))
      // ~half the cases corrupt a field to a CLEARLY invalid value
      // (month 13+, day 32+, hour 25+, Feb 30) — both engines' strict
      // parsers must agree the case is NULL, and agree on the value
      // otherwise. Corruptions stay unambiguous: lenient-vs-strict
      // debatable strings (Apr 31) are the directed tests' business.
      if (rnd.nextBoolean()) {
        val bad = pick(Seq("13" -> "MM", "32" -> "DD", "25" -> "HH24"))
        if (snowFmt.contains(bad._2)) {
          val jtok = bad._2 match {
            case "MM" => "MM"; case "DD" => "dd"; case _ => "HH"
          }
          val good = a.format(DateTimeFormatter.ofPattern(jtok,
            java.util.Locale.US))
          str = str.replaceFirst(java.util.regex.Pattern.quote(good),
            bad._1)
        }
      }
      if (dateOnly)
        C(s"TRY_TO_DATE('$str', '$snowFmt')",
          s"CAST(try_strptime('$str', '$duckFmt') AS DATE)")
      else
        C(s"TRY_TO_TIMESTAMP('$str', '$snowFmt')",
          s"try_strptime('$str', '$duckFmt')")
    }

    def genAddMonths(): C = {
      // ADD_MONTHS passes through to Spark's add_months, which CLAMPS to
      // the target month's length (Feb 29 + 1 month = Mar 29) — exactly
      // DuckDB's + INTERVAL MONTH, which is where the reference executes
      // it. (Snowflake proper instead preserves "last day in, last day
      // out" → Mar 31; this engine documents reference/DuckDB parity.)
      val a = randInstant()
      val n = rnd.nextInt(100) - 50
      C(s"ADD_MONTHS('${dLit(a)}'::date, $n)",
        s"CAST(DATE '${dLit(a)}' + ($n) * INTERVAL 1 MONTH AS DATE)")
    }

    def genTrunc(): C = {
      val part = pick(Seq("year", "quarter", "month", "week", "day",
        "hour", "minute", "second"))
      val a = randInstant()
      C(s"DATE_TRUNC('$part', '${tsLit(a)}'::timestamp)",
        s"date_trunc('$part', TIMESTAMP '${tsLit(a)}')")
    }

    def genPart(): C = {
      // Snowflake spelling (incl. aliases Spark's extract rejects, and
      // the 0-based dayofweek family) → the duck part it must equal
      val (snowPart, duckPart) = pick(Seq(
        "year" -> "year", "yyyy" -> "year", "quarter" -> "quarter",
        "month" -> "month", "mons" -> "month", "day" -> "day",
        "dd" -> "day", "hour" -> "hour", "minute" -> "minute",
        "mi" -> "minute", "second" -> "second", "s" -> "second",
        "dayofweek" -> "dayofweek", "dow" -> "dayofweek",
        "dayofyear" -> "dayofyear", "doy" -> "dayofyear",
        "week" -> "week", "woy" -> "week", "yearofweek" -> "isoyear"))
      val a = randInstant()
      val viaExtract = rnd.nextBoolean()
      val snow =
        if (viaExtract) s"EXTRACT($snowPart FROM '${tsLit(a)}'::timestamp)"
        else s"DATE_PART($snowPart, '${tsLit(a)}'::timestamp)"
      C(snow, s"date_part('$duckPart', TIMESTAMP '${tsLit(a)}')")
    }

    def genMisc(): C = {
      val a = randInstant()
      rnd.nextInt(4) match {
        case 0 => C(s"LAST_DAY('${tsLit(a)}'::timestamp)",
          s"last_day(TIMESTAMP '${tsLit(a)}')")
        case 1 => C(s"DAYNAME('${dLit(a)}'::date)",
          s"strftime(DATE '${dLit(a)}', '%a')")
        case 2 => C(s"MONTHNAME('${dLit(a)}'::date)",
          s"strftime(DATE '${dLit(a)}', '%b')")
        case _ => C(s"YEAR('${tsLit(a)}'::timestamp) * 100 + " +
            s"MONTH('${tsLit(a)}'::timestamp)",
          s"year(TIMESTAMP '${tsLit(a)}') * 100 + " +
            s"month(TIMESTAMP '${tsLit(a)}')")
      }
    }

    val gens: Seq[() => C] = Seq(
      genDateDiff _, genDateDiff _, genDateDiff _, // weight the target
      genDateAdd _, genToChar _, genParse _, genTryParse _,
      genAddMonths _, genTrunc _, genPart _, genMisc _)
    val cases = Vector.fill(506)(pick(gens)())

    // ── execute in batches of 7 expressions per SELECT ────────────────
    val s = new GraftSession(spark)
    val batches = cases.grouped(7).toVector

    def canon(x: String): String = {
      var v = x
      if (v.matches("""\d{4}-\d{2}-\d{2} 00:00:00""")) v = v.take(10)
      v
    }

    val duckResults = DuckOracle.run(batches.zipWithIndex.map {
      case (b, i) =>
        s"b$i" -> b.zipWithIndex.map { case (c, j) =>
          s"CAST((${c.duck}) AS VARCHAR) AS c$j" }
          .mkString("SELECT ", ", ", "")
    })

    var checked = 0
    batches.zipWithIndex.foreach { case (b, i) =>
      val snowSql = b.zipWithIndex.map { case (c, j) =>
        s"(${c.snow})::varchar AS c$j" }.mkString("SELECT ", ", ", "")
      val got = s.sql(snowSql).collect()(0)
      val want = duckResults(s"b$i") match {
        case Right(rows) => rows.head.split("\\|", -1)
        case Left(err) => fail(s"duckdb failed (seed=$seed batch=$i): " +
          s"$err\n sql: ${b.map(_.duck).mkString("; ")}")
      }
      b.indices.foreach { j =>
        val g = if (got.isNullAt(j)) "NULL" else got.get(j).toString
        assert(canon(g) == canon(want(j)),
          s"datetime divergence (seed=$seed batch=$i col=$j)\n " +
            s"snow: ${b(j).snow}\n duck: ${b(j).duck}\n " +
            s"got:  $g\n want: ${want(j)}")
        checked += 1
      }
    }
    assert(checked >= 400, s"only $checked cases checked")
  }
}
