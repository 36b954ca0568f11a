package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized DIFFERENTIAL fuzz of the STRING-function
  * surface — the eleventh fuzz family — against DUCKDB, where the
  * reference executes these. The scalar fuzz (RewriterFuzzSpec) checks
  * the REWRITE against hand-written Spark; this family checks the
  * MAPPING'S SEMANTICS against the reference's executor: SUBSTR
  * negative/over-length positions, SPLIT_PART negative indexes and
  * empty fields, POSITION/CHARINDEX (incl. the 3-arg start form, which
  * DuckDB lacks — rendered independently via substr+strpos), LPAD/RPAD
  * truncation and cycling pads, REPEAT, TRANSLATE with duplicate
  * source chars, 2-arg TRIM/LTRIM/RTRIM char-set stripping, INSERT
  * (rendered in DuckDB as slice||repl||slice), STARTSWITH/ENDSWITH/
  * CONTAINS, REPLACE, ASCII/LENGTH/REVERSE/case, and NULL-propagating
  * `||` chains.
  *
  * Where Snowflake-proper and DuckDB themselves disagree, the
  * differential draws only the AGREED domain, and the engine's choice
  * on the disagreement set is pinned by the directed test below:
  *   - SUBSTR(s, 0, n): Snowflake treats position 0 as 1 (engine, via
  *     Spark, agrees); DuckDB's window semantics drop one char.
  *   - negative positions below -len(s): DuckDB clips the window;
  *     engine returns '' (Spark) — excluded.
  *   - LEFT/RIGHT with negative n: Snowflake/engine return '';
  *     DuckDB returns all-but-|n| — only n >= 0 drawn.
  *   - SPLIT_PART part 0: Snowflake treats it as part 1 (engine, via
  *     the rewriter's CASE guard; Spark's split_part throws on 0);
  *     DuckDB returns ''.
  *   - CONCAT(): Snowflake/engine propagate NULL; DuckDB's concat()
  *     skips NULLs — chains drawn as `||`, which both NULL-propagate.
  *
  * ≥450 cases per run, fixed seed (GRAFT_FUZZ_SEED env /
  * graft.fuzz.seed prop override); failures carry seed + both
  * renderings.
  */
class StringFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class C(snow: String, duck: String)

  test("450+ random string expressions: engine == DuckDB") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260816").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

    val alphabet = Seq("a", "b", "c", "x", "~", ",", " ")
    def randStr(): String =
      if (rnd.nextInt(5) == 0)
        pick(Seq("", "abc", "a,b,,c", "xxabcxx", "Hello World", "ab~cd",
          "aaa", "  pad  "))
      else Seq.fill(rnd.nextInt(9))(pick(alphabet)).mkString
    def lit(s: String): String = "'" + s.replace("'", "''") + "'"

    def genSubstr(): C = {
      val s = randStr(); val l = s.length
      val name = pick(Seq("SUBSTR", "SUBSTRING"))
      val pos =
        if (rnd.nextBoolean() || l == 0) 1 + rnd.nextInt(l + 2)
        else -(1 + rnd.nextInt(l)) // within [-len, -1]: agreed domain
      val lenArg = if (rnd.nextBoolean()) s", ${rnd.nextInt(6)}" else ""
      C(s"$name(${lit(s)}, $pos$lenArg)",
        s"substr(${lit(s)}, $pos$lenArg)")
    }

    def genLeftRight(): C = {
      val s = randStr(); val n = rnd.nextInt(s.length + 3)
      val f = pick(Seq("LEFT", "RIGHT"))
      C(s"$f(${lit(s)}, $n)", s"${f.toLowerCase}(${lit(s)}, $n)")
    }

    def genSplitPart(): C = {
      val s = pick(Seq("a,b,,c", "a~b~c", randStr(), ",lead", "trail,",
        ",,", "no-delim"))
      val d = pick(Seq(",", "~", "b"))
      val n = { val k = 1 + rnd.nextInt(4); if (rnd.nextBoolean()) k else -k }
      C(s"SPLIT_PART(${lit(s)}, ${lit(d)}, $n)",
        s"split_part(${lit(s)}, ${lit(d)}, $n)")
    }

    def genPosition(): C = {
      val s = randStr()
      val needle = pick(Seq("a", "bc", "", "zz", ",", "~"))
      if (rnd.nextBoolean() || needle.isEmpty)
        // empty needle stays in the 2-arg form, where every engine
        // agrees on 1; with a START offset Spark's locate still returns
        // 1 while a search-the-suffix reading yields the offset — no
        // reference ground truth exists (DuckDB has no 3-arg position)
        C(s"POSITION(${lit(needle)}, ${lit(s)})",
          s"strpos(${lit(s)}, ${lit(needle)})")
      else {
        val st = 1 + rnd.nextInt(s.length + 2)
        // DuckDB has no from-position search: search the suffix and
        // re-offset, preserving the 0 = not-found contract
        C(s"CHARINDEX(${lit(needle)}, ${lit(s)}, $st)",
          s"CASE WHEN strpos(substr(${lit(s)}, $st), ${lit(needle)}) = 0 " +
            s"THEN 0 ELSE strpos(substr(${lit(s)}, $st), ${lit(needle)}) " +
            s"+ $st - 1 END")
      }
    }

    def genPad(): C = {
      val s = randStr(); val n = rnd.nextInt(9)
      val p = pick(Seq("x", "xy", "*", "-="))
      val f = pick(Seq("LPAD", "RPAD"))
      C(s"$f(${lit(s)}, $n, ${lit(p)})",
        s"${f.toLowerCase}(${lit(s)}, $n, ${lit(p)})")
    }

    def genMisc(): C = {
      val s = randStr()
      rnd.nextInt(10) match {
        case 0 => val n = rnd.nextInt(5) - 1
          C(s"REPEAT(${lit(s)}, $n)", s"repeat(${lit(s)}, $n)")
        case 1 =>
          val from = pick(Seq("ab", "ba", "aab", "abc", "a,"))
          val to = pick(Seq("x", "xy", "xyz").filter(_.length <= from.length))
          C(s"TRANSLATE(${lit(s)}, ${lit(from)}, ${lit(to)})",
            s"translate(${lit(s)}, ${lit(from)}, ${lit(to)})")
        case 2 => C(s"REVERSE(${lit(s)})", s"reverse(${lit(s)})")
        case 3 => C(s"UPPER(${lit(s)}) || LOWER(${lit(s)})",
          s"upper(${lit(s)}) || lower(${lit(s)})")
        case 4 => C(s"LEN(${lit(s)}) * 100 + LENGTH(${lit(s)})",
          s"length(${lit(s)}) * 101")
        case 5 => C(s"ASCII(${lit(s)})", s"ascii(${lit(s)})")
        case 6 =>
          val a = pick(Seq("a", "bc", "", ",", "xx"))
          val b = pick(Seq("X", "", "~~"))
          C(s"REPLACE(${lit(s)}, ${lit(a)}, ${lit(b)})",
            s"replace(${lit(s)}, ${lit(a)}, ${lit(b)})")
        case 7 =>
          val chars = pick(Seq("x", "xc", "ab", " ", "xa"))
          val f = pick(Seq("TRIM", "LTRIM", "RTRIM"))
          C(s"$f(${lit(s)}, ${lit(chars)})",
            s"${f.toLowerCase}(${lit(s)}, ${lit(chars)})")
        case 8 =>
          val n = pick(Seq("a", "bc", "", "zz"))
          val f = pick(Seq("STARTSWITH" -> "starts_with",
            "ENDSWITH" -> "ends_with", "CONTAINS" -> "contains"))
          C(s"(${f._1}(${lit(s)}, ${lit(n)}))::varchar",
            s"CAST(${f._2}(${lit(s)}, ${lit(n)}) AS VARCHAR)")
        case _ =>
          if (rnd.nextBoolean())
            C(s"${lit(s)} || NULL || 'z'", s"${lit(s)} || NULL || 'z'")
          else {
            val t = randStr()
            C(s"${lit(s)} || '-' || ${lit(t)}",
              s"${lit(s)} || '-' || ${lit(t)}")
          }
      }
    }

    def genInsert(): C = {
      val s = randStr()
      val pos = 1 + rnd.nextInt(s.length + 1) // Snowflake: 1..len+1
      val dlen = rnd.nextInt(4)
      val repl = pick(Seq("XY", "", "*"))
      C(s"INSERT(${lit(s)}, $pos, $dlen, ${lit(repl)})",
        s"substr(${lit(s)}, 1, ${pos - 1}) || ${lit(repl)} || " +
          s"substr(${lit(s)}, ${pos + dlen})")
    }

    val gens: Seq[() => C] = Seq(genSubstr _, genSubstr _,
      genLeftRight _, genSplitPart _, genSplitPart _, genPosition _,
      genPad _, genMisc _, genMisc _, genInsert _)
    val cases = Vector.fill(455)(pick(gens)())

    val s = new GraftSession(spark)
    val batches = cases.grouped(7).toVector
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
        assert(g == want(j),
          s"string divergence (seed=$seed batch=$i col=$j)\n " +
            s"snow: ${b(j).snow}\n duck: ${b(j).duck}\n " +
            s"got:  $g\n want: ${want(j)}")
        checked += 1
      }
    }
    assert(checked >= 450, s"only $checked cases checked")
  }

  test("documented Snowflake-vs-DuckDB string disagreements: engine picks Snowflake") {
    val s = new GraftSession(spark)
    def one(sql: String): String = {
      val r = s.sql(s"SELECT ($sql)::varchar AS v").collect()(0)
      if (r.isNullAt(0)) "NULL" else r.getString(0)
    }
    // CONCAT propagates NULL (DuckDB's concat() skips NULLs)
    assert(one("CONCAT('a', NULL, 'b')") == "NULL")
    // LEFT/RIGHT with negative n return '' (DuckDB returns all-but-|n|)
    assert(one("LEFT('abcdef', -2)") == "")
    assert(one("RIGHT('abcdef', -2)") == "")
    // SUBSTR position 0 is treated as 1 (DuckDB's window drops a char)
    assert(one("SUBSTR('abcdef', 0, 3)") == "abc")
    // SPLIT_PART part 0 is part 1 (DuckDB returns ''; raw Spark throws)
    assert(one("SPLIT_PART('a,b,c', ',', 0)") == "a")
  }
}
