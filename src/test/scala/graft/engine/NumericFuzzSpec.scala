package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized DIFFERENTIAL fuzz of the NUMERIC-function
  * surface — the twelfth fuzz family — against DuckDB, where the
  * reference executes it: ROUND at positive/negative scales over
  * half-boundary values (both engines round half AWAY FROM ZERO —
  * Spark via HALF_UP BigDecimal, DuckDB natively; bankers' rounding
  * would diverge), numeric TRUNC/TRUNCATE toward zero (Spark has no
  * numeric trunc — the rewriter lowers to a sign-dispatched
  * floor/ceil; DuckDB's 1-arg trunc is the independent oracle, scaled
  * trunc is checked against the floor/ceil DEFINITION in DuckDB's own
  * evaluator), scaled CEIL/FLOOR (Spark's built-in scale form vs the
  * scale-up/scale-back formula), MOD sign-follows-dividend, DIV0 /
  * DIV0NULL NULL-propagation (0 only for a 0 — or, for DIV0NULL, NULL
  * — DIVISOR; a NULL dividend stays NULL: the bug this family's design
  * forced out of the old coalesce(try_divide(..), 0) lowering),
  * GREATEST/LEAST NULL propagation, and ABS/SIGN/SQRT plus
  * last-ulp-risky transcendentals (EXP/LN/LOG/POWER) compared at 6
  * rounded digits because libm and the JDK are not both
  * correctly-rounded.
  *
  * Every expression is rendered to DOUBLE then VARCHAR on both sides
  * (Java's Double.toString and Python's str agree through 1e7 — values
  * are bounded to stay under E-notation).
  *
  * ≥450 cases per run, fixed seed (GRAFT_FUZZ_SEED env /
  * graft.fuzz.seed prop override); failures carry seed + both
  * renderings.
  */
class NumericFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class C(snow: String, duck: String)

  test("450+ random numeric expressions: engine == DuckDB") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260816").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

    /** Decimal literal, half-boundary biased, |v| <= 1e6, <= 3 frac
      * digits (keeps every double rendering out of E-notation). */
    def num(): String = {
      if (rnd.nextInt(3) == 0)
        pick(Seq("2.5", "-2.5", "0.5", "-0.5", "1250", "-1250", "2.345",
          "-2.345", "0.005", "-0.005", "999.999", "-999.999", "0", "-1"))
      else {
        val k = rnd.nextInt(4)
        val raw = rnd.nextLong(2000000L) - 1000000L
        val s = BigDecimal(raw) / BigDecimal(10).pow(k)
        s.bigDecimal.toPlainString
      }
    }
    def scaleN(): Int = rnd.nextInt(7) - 3 // -3..3

    def genRound(): C = {
      val x = num()
      if (rnd.nextBoolean()) {
        val n = scaleN()
        if (n >= 0) C(s"ROUND($x, $n)", s"round($x, $n)")
        else
          // DuckDB 1.0's DECIMAL round at negative scales is
          // inconsistent with its own DOUBLE path (round(999.999, -3)
          // gives 0 as decimal, 1000 as double — the engine and the
          // double path agree on 1000), so negative scales compare on
          // doubles
          C(s"ROUND(($x)::double, $n)",
            s"round(CAST($x AS DOUBLE), $n)")
      } else C(s"ROUND($x)", s"round($x)")
    }

    /** Scale-up / scale-back suffixes in EXACT integer arithmetic —
      * DECIMAL stays decimal end to end (0.29 * 100 exact; the double
      * route gives 28.999… and floors wrong). */
    def scaleOps(n: Int): (String, String) = {
      val p = BigDecimal(10).pow(math.abs(n)).bigDecimal.toPlainString
      if (n >= 0) (s"* $p", s"/ $p") else (s"/ $p", s"* $p")
    }

    def genTrunc(): C = {
      val x = num()
      val name = pick(Seq("TRUNC", "TRUNCATE"))
      if (rnd.nextBoolean()) C(s"$name($x)", s"trunc($x)")
      else {
        val n = scaleN()
        val (up, back) = scaleOps(n)
        val xd = s"CAST($x AS DECIMAL(24,6))"
        C(s"$name($x, $n)",
          s"CASE WHEN ($x) >= 0 THEN floor($xd $up) $back " +
            s"ELSE ceil($xd $up) $back END")
      }
    }

    def genCeilFloor(): C = {
      val x = num()
      val f = pick(Seq("CEIL", "FLOOR"))
      if (rnd.nextBoolean()) C(s"$f($x)", s"${f.toLowerCase}($x)")
      else {
        val n = scaleN()
        val (up, back) = scaleOps(n)
        C(s"$f($x, $n)",
          s"${f.toLowerCase}(CAST($x AS DECIMAL(24,6)) $up) $back")
      }
    }

    def genModDiv(): C = {
      val a = pick(Seq(num(), "NULL"))
      rnd.nextInt(3) match {
        case 0 =>
          val b = pick(Seq("3", "-3", "2.5", "-7", "10"))
          C(s"MOD($a, $b)", s"mod($a, $b)")
        case 1 =>
          // double dividend on BOTH sides: the engine's decimal/decimal
          // division is Snowflake-typed (bounded scale) while the duck
          // oracle divides doubles — align on doubles so the quotient
          // is IEEE-identical
          val b = pick(Seq(num(), "0", "0", "NULL"))
          C(s"DIV0(($a)::double, $b)",
            s"CASE WHEN ($b) = 0 THEN 0 ELSE CAST($a AS DOUBLE) / ($b) END")
        case _ =>
          val b = pick(Seq(num(), "0", "NULL", "NULL"))
          C(s"DIV0NULL(($a)::double, $b)",
            s"CASE WHEN ($b) = 0 OR ($b) IS NULL THEN 0 " +
              s"ELSE CAST($a AS DOUBLE) / ($b) END")
      }
    }

    def genGreatest(): C = {
      val (a, b, c) = (pick(Seq(num(), "NULL")), num(), num())
      val f = pick(Seq("GREATEST", "LEAST"))
      C(s"$f($a, $b, $c)",
        s"CASE WHEN ($a) IS NULL OR ($b) IS NULL OR ($c) IS NULL THEN NULL " +
          s"ELSE ${f.toLowerCase}($a, $b, $c) END")
    }

    def genMath(): C = {
      val x = num()
      rnd.nextInt(6) match {
        case 0 => C(s"ABS($x)", s"abs($x)")
        case 1 => C(s"SIGN($x)", s"sign($x)")
        case 2 => C(s"SQRT(ABS($x))", s"sqrt(abs($x))")
        case 3 => C(s"ROUND(EXP(MOD($x, 7)), 6)",
          s"round(exp(CAST(mod($x, 7) AS DOUBLE)), 6)")
        case 4 => C(s"ROUND(LN(ABS($x) + 1), 6)",
          s"round(ln(CAST(abs($x) AS DOUBLE) + 1), 6)")
        case _ => val e = rnd.nextInt(4)
          C(s"ROUND(POWER(ABS($x) + 1, 0.$e), 6)",
            s"round(power(CAST(abs($x) AS DOUBLE) + 1, 0.$e), 6)")
      }
    }

    val gens: Seq[() => C] = Seq(genRound _, genRound _, genTrunc _,
      genTrunc _, genCeilFloor _, genModDiv _, genModDiv _,
      genGreatest _, genMath _)
    val cases = Vector.fill(455)(pick(gens)())

    val s = new GraftSession(spark)
    val batches = cases.grouped(7).toVector
    val duckResults = DuckOracle.run(batches.zipWithIndex.map {
      case (b, i) =>
        s"b$i" -> b.zipWithIndex.map { case (c, j) =>
          s"CAST(CAST((${c.duck}) AS DOUBLE) AS VARCHAR) AS c$j" }
          .mkString("SELECT ", ", ", "")
    })

    var checked = 0
    batches.zipWithIndex.foreach { case (b, i) =>
      val snowSql = b.zipWithIndex.map { case (c, j) =>
        s"(${c.snow})::double::varchar AS c$j" }
        .mkString("SELECT ", ", ", "")
      val got = s.sql(snowSql).collect()(0)
      val want = duckResults(s"b$i") match {
        case Right(rows) => rows.head.split("\\|", -1)
        case Left(err) => fail(s"duckdb failed (seed=$seed batch=$i): " +
          s"$err\n sql: ${b.map(_.duck).mkString("; ")}")
      }
      b.indices.foreach { j =>
        val g = if (got.isNullAt(j)) "NULL" else got.get(j).toString
        val w = want(j)
        // values must be numerically identical; parse both before
        // comparing because Java and Python pick E-notation at different
        // magnitudes, and -0.0 == 0.0 is a rendering artifact (DuckDB's
        // ceil(-0.x) keeps the sign; Spark's decimal ceil cannot)
        val same = g == w || (g != "NULL" && w != "NULL" && {
          (g.toDoubleOption, w.toDoubleOption) match {
            case (Some(x), Some(y)) =>
              java.lang.Double.compare(x, y) == 0 || (x == 0.0 && y == 0.0)
            case _ => false
          }
        })
        assert(same,
          s"numeric divergence (seed=$seed batch=$i col=$j)\n " +
            s"snow: ${b(j).snow}\n duck: ${b(j).duck}\n " +
            s"got:  $g\n want: $w")
        checked += 1
      }
    }
    assert(checked >= 450, s"only $checked cases checked")
  }
}
