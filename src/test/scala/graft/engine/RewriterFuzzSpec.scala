package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized DIFFERENTIAL fuzz of the Snowflake-dialect
  * rewriter's scalar-function / cast / predicate surface.
  *
  * Each generator production emits a PAIR: the Snowflake-dialect text
  * (fed through GraftSession → SnowflakeRewriter → Spark) and an
  * independently hand-written Spark-native equivalent per the documented
  * mapping (fed straight to spark.sql over the same rows). The Spark
  * rendering is compositional test knowledge — it never consults the
  * rewriter — so divergences in precedence, parenthesization, argument
  * order, quoting, or nested rewrites surface as row mismatches.
  *
  * ≥1000 random expressions per run (fixed seed — failures reproduce;
  * the assertion message carries the seed, expression index, and both
  * renderings, which is the shrunk counterexample: expressions are
  * independent columns).
  */
class RewriterFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** One expression in both dialects. */
  private case class E(snow: String, sparkSql: String)

  private final class Gen(rnd: scala.util.Random) {
    private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    private def both(s: String): E = E(s, s)

    // terminals over the fz table: k BIGINT unique, c BIGINT,
    // pd DOUBLE, pdec DECIMAL(12,2), pr STRING, st STRING, od DATE
    def intT(d: Int): E =
      if (d <= 0) pick(Seq(both("k"), both("c"),
        both((rnd.nextInt(200) - 100).toString),
        E("\"C\"", "c")))
      else pick[Int => E](Seq(
        i => { val a = intT(i); E(s"(${a.snow})", s"(${a.sparkSql})") },
        i => { val (a, b) = (intT(i), intT(i))
          E(s"BITAND(${a.snow}, ${b.snow})",
            s"((${a.sparkSql}) & (${b.sparkSql}))") },
        i => { val (a, b) = (intT(i), intT(i))
          E(s"BITOR(${a.snow}, ${b.snow})",
            s"((${a.sparkSql}) | (${b.sparkSql}))") },
        i => { val a = strT(i)
          E(s"LEN(${a.snow})", s"length(${a.sparkSql})") },
        i => { val (a, b) = (strT(i), strT(i))
          E(s"CHARINDEX(${a.snow}, ${b.snow})",
            s"locate(${a.sparkSql}, ${b.sparkSql})") },
        i => { val (a, b) = (strT(i), strT(i))
          E(s"POSITION(${a.snow}, ${b.snow})",
            s"locate(${a.sparkSql}, ${b.sparkSql})") },
        i => { val a = strT(i)
          E(s"EDITDISTANCE(${a.snow}, 'URGENT')",
            s"levenshtein(${a.sparkSql}, 'URGENT')") },
        i => { val (a, b) = (intT(i), intT(i))
          val op = pick(Seq("+", "-", "*"))
          if (op == "*")
            // bound the factors: composed int products (MOD(pd,1e5) ×
            // year × weekofyear ≈ 1e10) overflow INT under ANSI — both
            // engines would throw, but whichever evaluates first fails
            // the differential harness (found at seed 1234)
            E(s"(MOD(${a.snow}, 1000) * MOD(${b.snow}, 1000))",
              s"(mod(${a.sparkSql}, 1000) * mod(${b.sparkSql}, 1000))")
          else
            E(s"(${a.snow} $op ${b.snow})",
              s"(${a.sparkSql} $op ${b.sparkSql})") },
        i => { val a = dateT(i)
          E(s"DATE_PART(year, ${a.snow})",
            s"CAST(date_part('YEAR', ${a.sparkSql}) AS INT)") },
        i => { val a = dateT(i)
          val u = pick(Seq("month", "day"))
          E(s"DATE_PART($u, ${a.snow})",
            s"CAST(date_part('${u.toUpperCase}', ${a.sparkSql}) AS INT)") },
        i => { val a = dateT(i)
          E(s"WEEKISO(${a.snow})", s"weekofyear(${a.sparkSql})") },
        i => { val (a, b) = (intT(i), intT(i))
          E(s"MOD(${a.snow}, NULLIFZERO(${b.snow}))",
            s"mod(${a.sparkSql}, nullif(${b.sparkSql}, 0))") },
        // Snowflake GREATEST returns NULL when ANY argument is NULL
        // (Spark's greatest ignores nulls) — the engine rewrites to the
        // null-propagating form; encode the same semantics here
        i => { val (a, b) = (intT(i), intT(i))
          E(s"GREATEST(${a.snow}, ${b.snow})",
            s"CASE WHEN (${a.sparkSql}) IS NULL OR (${b.sparkSql}) IS NULL " +
            s"THEN NULL ELSE greatest(${a.sparkSql}, ${b.sparkSql}) END") },
        i => { val (a, b) = (dateT(i), dateT(i))
          // Snowflake DATEDIFF counts boundaries; for 'day' that is the
          // number of midnights crossed == datediff of the DATE casts.
          E(s"DATEDIFF(day, ${a.snow}, ${b.snow})",
            s"CAST(datediff(CAST((${b.sparkSql}) AS DATE), " +
            s"CAST((${a.sparkSql}) AS DATE)) AS BIGINT)") },
        i => { val (a, b) = (intT(i), intT(i))
          E(s"BITXOR(${a.snow}, ${b.snow})",
            s"((${a.sparkSql}) ^ (${b.sparkSql}))") },
        i => { val a = intT(i); val n = rnd.nextInt(5)
          E(s"BITSHIFTLEFT(${a.snow}, $n)",
            s"shiftleft((${a.sparkSql}), $n)") },
        i => { val a = intT(i); val n = rnd.nextInt(5)
          E(s"BITSHIFTRIGHT(${a.snow}, $n)",
            s"shiftright((${a.sparkSql}), $n)") },
        i => { val a = intT(i)
          E(s"SIGN(${a.snow}) :: int", s"CAST(sign(${a.sparkSql}) AS INT)") },
        // MOD-bound the operand: numT products overflow INT casts under
        // ANSI mode (pd² ≈ 3e11), and overflow must not depend on which
        // dialect evaluates first
        i => { val a = numT(i)
          E(s"FLOOR(MOD(${a.snow}, 100000)) :: int",
            s"CAST(floor(mod(${a.sparkSql}, 100000)) AS INT)") },
        i => { val a = numT(i)
          E(s"CEIL(MOD(${a.snow}, 100000)) :: int",
            s"CAST(ceil(mod(${a.sparkSql}, 100000)) AS INT)") },
        i => { val a = strT(i)
          E(s"ARRAY_SIZE(SPLIT(${a.snow}, ' '))",
            s"size(split(${a.sparkSql}, ' '))") }
      ))(d - 1)

    def numT(d: Int): E =
      if (d <= 0) pick(Seq(both("pd"),
        both(f"${rnd.nextDouble() * 100 - 50}%.4f"),
        E("pdec :: double", "CAST(pdec AS DOUBLE)")))
      else pick[Int => E](Seq(
        i => { val (a, b) = (numT(i), numT(i))
          val op = pick(Seq("+", "-", "*"))
          E(s"(${a.snow} $op ${b.snow})", s"(${a.sparkSql} $op ${b.sparkSql})") },
        i => { val (a, b) = (numT(i), numT(i))
          // DIV0: 0 only when the divisor IS 0 — NULLs propagate
          E(s"DIV0(${a.snow}, ${b.snow})",
            s"CASE WHEN (${b.sparkSql}) = 0 THEN 0 " +
            s"ELSE (${a.sparkSql}) / (${b.sparkSql}) END") },
        i => { val a = numT(i)
          E(s"ZEROIFNULL(${a.snow})", s"coalesce((${a.sparkSql}), 0)") },
        i => { val a = numT(i)
          E(s"NULLIFZERO(${a.snow})", s"nullif((${a.sparkSql}), 0)") },
        i => { val a = numT(i)
          E(s"ABS(${a.snow})", s"abs(${a.sparkSql})") },
        i => { val a = numT(i)
          E(s"ROUND(${a.snow}, 2)", s"round(${a.sparkSql}, 2)") },
        i => { val a = numT(i)
          E(s"SQRT(ABS(${a.snow}))", s"sqrt(abs(${a.sparkSql}))") },
        i => { val (b, x, y) = (boolT(i), numT(i), numT(i))
          E(s"IFF(${b.snow}, ${x.snow}, ${y.snow})",
            s"if(${b.sparkSql}, ${x.sparkSql}, ${y.sparkSql})") },
        i => { val a = numT(i)
          E(s"(${a.snow}) :: double", s"CAST((${a.sparkSql}) AS DOUBLE)") },
        i => { val a = intT(i)
          E(s"TO_DOUBLE(${a.snow})", s"CAST(${a.sparkSql} AS DOUBLE)") }
      ))(d - 1)

    def strT(d: Int): E =
      if (d <= 0) pick(Seq(both("pr"), both("st"),
        both(s"'${pick(Seq("URGENT", "a b", "xyz", "", "5-LOW"))}'")))
      else pick[Int => E](Seq(
        i => { val (a, b) = (strT(i), strT(i))
          E(s"(${a.snow} || ${b.snow})",
            s"concat(${a.sparkSql}, ${b.sparkSql})") },
        i => { val a = strT(i)
          E(s"UPPER(${a.snow})", s"upper(${a.sparkSql})") },
        i => { val a = strT(i)
          E(s"LOWER(${a.snow})", s"lower(${a.sparkSql})") },
        i => { val a = strT(i)
          E(s"TRIM(${a.snow})", s"trim(${a.sparkSql})") },
        i => { val a = strT(i); val p = 1 + rnd.nextInt(3)
          E(s"SUBSTR(${a.snow}, $p, 4)", s"substr(${a.sparkSql}, $p, 4)") },
        i => { val a = strT(i)
          E(s"REVERSE(${a.snow})", s"reverse(${a.sparkSql})") },
        i => { val a = strT(i)
          E(s"REPLACE(${a.snow}, 'E', '_')",
            s"replace(${a.sparkSql}, 'E', '_')") },
        i => { val a = strT(i)
          E(s"NVL(NULLIF(${a.snow}, ''), 'empty')",
            s"coalesce(nullif(${a.sparkSql}, ''), 'empty')") },
        i => { val a = numT(i)
          E(s"TO_CHAR(ROUND(${a.snow}, 1))",
            s"CAST(round(${a.sparkSql}, 1) AS STRING)") },
        i => { val a = dateT(i)
          E(s"TO_CHAR(${a.snow}, 'YYYY-MM-DD')",
            s"date_format(${a.sparkSql}, 'yyyy-MM-dd')") },
        i => { val a = dateT(i)
          E(s"TO_CHAR(${a.snow}, 'DD Mon YYYY')",
            s"date_format(${a.sparkSql}, 'dd MMM yyyy')") },
        i => { val (b, x, y) = (boolT(i), strT(i), strT(i))
          E(s"IFF(${b.snow}, ${x.snow}, ${y.snow})",
            s"if(${b.sparkSql}, ${x.sparkSql}, ${y.sparkSql})") },
        i => { val a = strT(i)
          E(s"DECODE(${a.snow}, 'URGENT', 'u', 'xyz', 'x', 'other')",
            s"CASE WHEN (${a.sparkSql}) <=> ('URGENT') THEN 'u' " +
            s"WHEN (${a.sparkSql}) <=> ('xyz') THEN 'x' ELSE 'other' END") },
        i => { val a = strT(i)
          E(s"LPAD(${a.snow}, 8, '*')", s"lpad(${a.sparkSql}, 8, '*')") },
        i => { val a = strT(i)
          E(s"INITCAP(${a.snow})", s"initcap(${a.sparkSql})") },
        i => { val a = strT(i)
          E(s"TRANSLATE(${a.snow}, 'aE', '_#')",
            s"translate(${a.sparkSql}, 'aE', '_#')") },
        i => { val a = strT(i); val n = 1 + rnd.nextInt(3)
          E(s"REPEAT(${a.snow}, $n)", s"repeat(${a.sparkSql}, $n)") },
        i => { val a = strT(i); val n = 1 + rnd.nextInt(4)
          E(s"LEFT(${a.snow}, $n)", s"left(${a.sparkSql}, $n)") },
        i => { val a = strT(i); val n = 1 + rnd.nextInt(4)
          E(s"RIGHT(${a.snow}, $n)", s"right(${a.sparkSql}, $n)") },
        i => { val a = strT(i); val n = 1 + rnd.nextInt(3)
          E(s"SPLIT_PART(${a.snow}, ' ', $n)",
            s"split_part(${a.sparkSql}, ' ', $n)") }
      ))(d - 1)

    def boolT(d: Int): E =
      if (d <= 0) pick(Seq(both("(c % 2 = 0)"), both("(pd > 100)"),
        both("TRUE"), both("FALSE")))
      else pick[Int => E](Seq(
        i => { val (a, b) = (boolT(i), boolT(i))
          E(s"(${a.snow} AND ${b.snow})", s"(${a.sparkSql} AND ${b.sparkSql})") },
        i => { val (a, b) = (boolT(i), boolT(i))
          E(s"(${a.snow} OR ${b.snow})", s"(${a.sparkSql} OR ${b.sparkSql})") },
        i => { val a = boolT(i)
          E(s"(NOT ${a.snow})", s"(NOT ${a.sparkSql})") },
        i => { val (a, b) = (numT(i), numT(i))
          val op = pick(Seq("<", "<=", ">", ">=", "=", "<>"))
          E(s"(${a.snow} $op ${b.snow})", s"(${a.sparkSql} $op ${b.sparkSql})") },
        i => { val a = strT(i)
          E(s"(${a.snow} LIKE '%a%')", s"(${a.sparkSql} LIKE '%a%')") },
        i => { val a = strT(i)
          E(s"(${a.snow} IN ('URGENT', 'xyz', ''))",
            s"(${a.sparkSql} IN ('URGENT', 'xyz', ''))") },
        i => { val a = intT(i)
          E(s"(${a.snow} BETWEEN -10 AND 50)",
            s"(${a.sparkSql} BETWEEN -10 AND 50)") },
        i => { val a = strT(i)
          E(s"(NULLIF(${a.snow}, '') IS NULL)",
            s"(nullif(${a.sparkSql}, '') IS NULL)") },
        i => { val (b, x, y) = (boolT(i), boolT(i), boolT(i))
          E(s"IFF(${b.snow}, ${x.snow}, ${y.snow})",
            s"if(${b.sparkSql}, ${x.sparkSql}, ${y.sparkSql})") },
        i => { val a = strT(i)
          E(s"(${a.snow} ILIKE '%a%')", s"(${a.sparkSql} ILIKE '%a%')") },
        // Snowflake RLIKE matches the ENTIRE subject (documented mapping:
        // wrap in ^(?:…)$); encode the anchored semantics independently
        i => { val a = strT(i)
          E(s"RLIKE(${a.snow}, '[a-zU].*')",
            s"rlike(${a.sparkSql}, '^(?:[a-zU].*)$$')") },
        i => { val (a, b) = (intT(i), intT(i))
          E(s"(${a.snow} IS DISTINCT FROM ${b.snow})",
            s"(${a.sparkSql} IS DISTINCT FROM ${b.sparkSql})") }
      ))(d - 1)

    def dateT(d: Int): E =
      if (d <= 0) both("od")
      else pick[Int => E](Seq(
        i => { val a = dateT(i); val n = rnd.nextInt(60) - 30
          E(s"DATEADD(day, $n, ${a.snow}) :: date",
            s"CAST(timestampadd(DAY, $n, ${a.sparkSql}) AS DATE)") },
        i => { val a = dateT(i); val n = rnd.nextInt(25) - 12
          val u = pick(Seq("month", "year"))
          E(s"DATEADD($u, $n, ${a.snow}) :: date",
            s"CAST(timestampadd(${u.toUpperCase}, $n, ${a.sparkSql}) AS DATE)") },
        i => { val a = dateT(i)
          E(s"LAST_DAY(${a.snow})", s"last_day(${a.sparkSql})") },
        i => { val a = dateT(i); val n = rnd.nextInt(13) - 6
          E(s"ADD_MONTHS(${a.snow}, $n)",
            s"add_months(${a.sparkSql}, $n)") },
        i => { val a = dateT(i); val dow = pick(Seq("MO", "FR", "SU"))
          E(s"NEXT_DAY(${a.snow}, '$dow')",
            s"next_day(${a.sparkSql}, '$dow')") },
        i => { val a = dateT(i)
          E(s"(${a.snow}) :: date", s"CAST((${a.sparkSql}) AS DATE)") }
      ))(d - 1)

    def any(d: Int): E = pick(Seq[Int => E](intT, numT, strT, boolT, dateT))(d)
  }

  test("1000+ random scalar expressions agree with hand-translated Spark SQL") {
    // env first: sbt forks test JVMs, and the environment propagates
    // where -D flags need javaOptions plumbing
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260814").toLong
    val rnd = new scala.util.Random(seed)
    val gen = new Gen(rnd)
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")
    s.sql("""CREATE OR REPLACE TABLE fz AS SELECT
      o_orderkey AS k, o_custkey AS c,
      o_totalprice::double AS pd, o_totalprice::number(12,2) AS pdec,
      o_orderpriority AS pr, o_orderstatus AS st, o_orderdate::date AS od
      FROM orders WHERE o_orderkey <= 500""")
    // materialize the native copy: the session's temp-view sync drops
    // foreign views on its next statement, so the plan must not read
    // through any session view and the view re-registers per round
    val fzDf = s.sql("SELECT * FROM fz").localCheckpoint()

    val perQuery = 25
    val queries = 42 // 42 * 25 = 1050 expressions
    var total = 0
    for (q <- 1 to queries) {
      val exprs = Seq.fill(perQuery)(gen.any(1 + rnd.nextInt(3)))
      val snowSel = exprs.zipWithIndex
        .map { case (e, i) => s"(${e.snow}) AS v$i" }.mkString(", ")
      val sparkSel = exprs.zipWithIndex
        .map { case (e, i) => s"(${e.sparkSql}) AS v$i" }.mkString(", ")
      val got = s.sql(s"SELECT k, $snowSel FROM fz ORDER BY k").collect()
      // the session runs statements in a cloned SparkSession (conf
      // scoping) — register and query the native side on the clone
      fzDf.createOrReplaceTempView("fz_native")
      val want = fzDf.sparkSession
        .sql(s"SELECT k, $sparkSel FROM fz_native ORDER BY k").collect()
      assert(got.length == want.length, s"row count, query $q seed $seed")
      got.zip(want).foreach { case (g, w) =>
        (0 until w.length).foreach { ci =>
          val (gv, wv) = (g.get(ci), w.get(ci))
          val same = (gv, wv) match {
            case (null, null) => true
            case (null, _) | (_, null) => false
            case (a: Double, b: Double) =>
              (a.isNaN && b.isNaN) || math.abs(a - b) <=
                1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
            case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
              a.compareTo(b) == 0
            case (a, b) => a == b
          }
          assert(same, s"seed=$seed query=$q col=v${ci - 1} row k=${g.get(0)}" +
            s"\n got=$gv want=$wv" +
            s"\n snow:  ${if (ci > 0) exprs(ci - 1).snow else "k"}" +
            s"\n spark: ${if (ci > 0) exprs(ci - 1).sparkSql else "k"}")
        }
      }
      total += perQuery
    }
    assert(total >= 1000, s"only $total expressions generated")
    s.sql("DROP TABLE fz")
  }

  /** The main generator MOD-bounds integer products so a guaranteed
    * overflow can't fail the differential harness — but that removed
    * all coverage of overflow-behavior PARITY (round-11 ADVICE). This
    * test restores the unbounded shape under a both-sides-must-error-
    * or-agree contract, one expression per query so an overflow is
    * attributable: whichever way ANSI arithmetic lands (wrap, null, or
    * ArithmeticException), the rewritten dialect must land the same
    * way as the hand-translated Spark SQL. */
  test("unbounded integer products: both dialects agree or both error") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260814").toLong
    val rnd = new scala.util.Random(seed + 7)
    val gen = new Gen(rnd)
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")
    s.sql("""CREATE OR REPLACE TABLE fzo AS SELECT
      o_orderkey AS k, o_custkey AS c,
      o_totalprice::double AS pd, o_totalprice::number(12,2) AS pdec,
      o_orderpriority AS pr, o_orderstatus AS st, o_orderdate::date AS od
      FROM orders WHERE o_orderkey <= 200""")
    val fzDf = s.sql("SELECT * FROM fzo").localCheckpoint()
    def evalSide(run: => Array[org.apache.spark.sql.Row])
        : Either[String, Seq[String]] =
      try Right(run.map(r => String.valueOf(r.get(1))).toSeq)
      catch { case e: Throwable => Left(e.getClass.getSimpleName) }
    var overflowed = 0
    for (i <- 1 to 40) {
      val (a, b) = (gen.intT(1 + rnd.nextInt(2)), gen.intT(1 + rnd.nextInt(2)))
      // UNBOUNDED product — exactly the shape the main harness bounds
      val snow = s"((${a.snow}) * (${b.snow}) * 100000)"
      val native = s"((${a.sparkSql}) * (${b.sparkSql}) * 100000)"
      val got = evalSide(
        s.sql(s"SELECT k, ($snow) AS v FROM fzo ORDER BY k").collect())
      fzDf.createOrReplaceTempView("fzo_native")
      val want = evalSide(fzDf.sparkSession
        .sql(s"SELECT k, ($native) AS v FROM fzo_native ORDER BY k").collect())
      (got, want) match {
        case (Right(g), Right(w)) =>
          assert(g == w, s"seed=$seed case=$i values diverged" +
            s"\n snow:  $snow\n spark: $native" +
            s"\n got=${g.take(3)} want=${w.take(3)}")
        case (Left(_), Left(_)) => overflowed += 1 // agreement: both refuse
        case (g, w) =>
          fail(s"seed=$seed case=$i: one side errored, the other returned" +
            s" rows\n snow:  $snow → $g\n spark: $native → $w")
      }
    }
    // non-vacuity: the multiplier guarantees real overflows occur
    assert(overflowed > 0, s"no case overflowed — shape lost its teeth")
    s.sql("DROP TABLE fzo")
  }
}
