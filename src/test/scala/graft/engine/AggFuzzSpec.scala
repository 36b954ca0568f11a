package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized DIFFERENTIAL fuzz of the AGGREGATE-function
  * surface — the third fuzz family (after the scalar RewriterFuzzSpec
  * and the semi-structured/window SemiWindowFuzzSpec): GROUP BY with the
  * Snowflake aggregate spellings (VARIANCE_SAMP/POP, SKEW, KURTOSIS,
  * BOOLAND_AGG/BOOLOR_AGG, COUNT_IF, MIN_BY/MAX_BY, MEDIAN, LISTAGG /
  * ARRAY_AGG WITHIN GROUP), Snowflake scalar functions nested INSIDE
  * aggregates, HAVING, DISTINCT aggregates, and ROLLUP.
  *
  * Protocol as in the sibling specs: each case is a PAIR — snow dialect
  * through GraftSession vs an independently hand-written Spark-native
  * rendering per the documented mapping. Determinism rules: every
  * ordered-set aggregate orders by a UNIQUE key (k), MIN_BY/MAX_BY rank
  * by k, and the result is fully ordered by the grouping key.
  */
class AggFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class E(snow: String, sparkSql: String)

  private final class Gen(rnd: scala.util.Random) {
    private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    private def both(s: String): E = E(s, s)

    /** Numeric input expression (NULL-bearing columns + snow scalars). */
    private def numIn(): E = pick(Seq(both("vl"), both("pd"), both("c"),
      E("ZEROIFNULL(vl)", "coalesce(vl, 0)"),
      E("IFF(c % 2 = 0, pd, vl)", "if(c % 2 = 0, pd, vl)"),
      E("NULLIFZERO(c % 5)", "nullif(c % 5, 0)")))

    /** One aggregate expression. */
    def aggE(): E = pick[() => E](Seq(
      () => { val x = numIn(); val f = pick(Seq("SUM", "AVG", "MIN", "MAX"))
        E(s"$f(${x.snow})", s"$f(${x.sparkSql})") },
      () => { val x = numIn()
        E(s"COUNT(${x.snow})", s"COUNT(${x.sparkSql})") },
      () => both("COUNT(*)"),
      () => { val x = numIn()
        E(s"COUNT(DISTINCT ${x.snow})", s"COUNT(DISTINCT ${x.sparkSql})") },
      () => E("COUNT_IF(pd > 1000)", "count_if(pd > 1000)"),
      () => { val x = numIn()
        val (s1, s2) = pick(Seq(
          ("STDDEV", "stddev"), ("STDDEV_POP", "stddev_pop"),
          ("STDDEV_SAMP", "stddev_samp"),
          ("VARIANCE_SAMP", "var_samp"), ("VARIANCE_POP", "var_pop")))
        E(s"$s1(${x.snow})", s"$s2(${x.sparkSql})") },
      () => { val x = numIn()
        E(s"SKEW(${x.snow})", s"skewness(${x.sparkSql})") },
      () => { val x = numIn()
        E(s"KURTOSIS(${x.snow})", s"kurtosis(${x.sparkSql})") },
      () => { val (x, y) = (numIn(), numIn())
        val f = pick(Seq("CORR", "COVAR_POP", "COVAR_SAMP"))
        E(s"$f(${x.snow}, ${y.snow})", s"$f(${x.sparkSql}, ${y.sparkSql})") },
      () => E("BOOLAND_AGG(c % 3 = 0)", "bool_and(c % 3 = 0)"),
      () => E("BOOLOR_AGG(pd > 5000)", "bool_or(pd > 5000)"),
      // unique rank key k → deterministic
      () => { val x = pick(Seq(both("pr"), both("c")))
        val f = pick(Seq("MIN_BY", "MAX_BY"))
        E(s"$f(${x.snow}, k)", s"$f(${x.sparkSql}, k)") },
      () => { val x = numIn()
        E(s"MEDIAN(${x.snow}) :: double",
          s"CAST(median(${x.sparkSql}) AS DOUBLE)") },
      // the native rendering avoids Spark's ListAgg node (its
      // withNewChildrenInternal breaks under expression-rewriting rules
      // spliced by sibling suites) — same documented semantics
      () => E("LISTAGG(pr, '|') WITHIN GROUP (ORDER BY k)",
        "array_join(transform(sort_array(collect_list(" +
        "named_struct('o', k, 'v', pr))), x -> x.v), '|')"),
      // Spark has no WITHIN GROUP on array_agg — the documented mapping
      // is collect-then-sort-by-key, encoded independently here
      () => E("ARRAY_AGG(c) WITHIN GROUP (ORDER BY k)",
        "transform(sort_array(collect_list(named_struct('o', k, 'v', c))), " +
        "x -> x.v)"),
      () => E("ANY_VALUE(g)", "any_value(g)"), // g is the grouping key
      () => { val (a, b) = (numIn(), numIn())
        E(s"DIV0(SUM(${a.snow}), SUM(${b.snow}))",
          s"CASE WHEN (SUM(${b.sparkSql})) = 0 THEN 0 " +
          s"ELSE (SUM(${a.sparkSql})) / (SUM(${b.sparkSql})) END") }
    ))()

    /** Grouping key expression — low cardinality, sometimes NULL. */
    def keyE(): E = pick(Seq(both("g"),
      E("IFF(c % 7 = 0, NULL, g)", "if(c % 7 = 0, NULL, g)"),
      E("NVL(NULLIF(pr, '1-URGENT'), 'other')",
        "coalesce(nullif(pr, '1-URGENT'), 'other')"),
      both("(c % 3)")))
  }

  private def sameVal(gv: Any, wv: Any): Boolean = (gv, wv) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (a: Double, b: Double) =>
      (a.isNaN && b.isNaN) || math.abs(a - b) <=
        1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
      a.compareTo(b) == 0
    case (a: Seq[_], b: Seq[_]) =>
      a.length == b.length && a.zip(b).forall { case (x, y) => sameVal(x, y) }
    case (a, b) => a == b
  }

  test("pinned: LISTAGG WITHIN GROUP coexists with DISTINCT aggregates") {
    // found by this fuzz: Spark 4.1's RewriteDistinctAggregates corrupts
    // ListAgg's SortOrder child when a COUNT(DISTINCT) shares the query
    // (ClassCastException) — the rewriter lowers LISTAGG WITHIN GROUP to
    // ordered collect_list + array_join so the node never appears
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")
    val rows = s.sql("""
      SELECT o_orderpriority AS p,
        COUNT(DISTINCT o_custkey) AS nd,
        LISTAGG(o_orderkey, ',') WITHIN GROUP (ORDER BY o_orderkey) AS ks
      FROM orders WHERE o_orderkey <= 64
      GROUP BY 1 ORDER BY 1""").collect()
    assert(rows.nonEmpty)
    // ordered, comma-joined, natural numeric order (not lexicographic)
    rows.foreach { r =>
      val ks = r.getString(2).split(",").map(_.toLong)
      assert(ks.sameElements(ks.sorted), r.getString(2))
    }
    assert(rows.map(_.getLong(1)).forall(_ > 0))
  }

  test("300+ aggregate-surface cases agree with hand-translated Spark SQL") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260815").toLong
    val rnd = new scala.util.Random(seed)
    val gen = new Gen(rnd)
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")
    s.sql("""CREATE OR REPLACE TABLE fz3 AS SELECT
      o_orderkey AS k, o_custkey % 4 AS g, o_custkey AS c,
      o_totalprice::double AS pd, o_orderpriority AS pr,
      CASE WHEN o_orderkey % 9 = 0 THEN NULL ELSE o_orderkey % 500 END AS vl
      FROM orders WHERE o_orderkey <= 2000""")
    val fzDf = s.sql("SELECT * FROM fz3").localCheckpoint()

    var total = 0
    for (q <- 1 to 30) {
      val key = gen.keyE()
      val exprs = Seq.fill(10)(gen.aggE())
      val shape = rnd.nextInt(4)
      def sel(d: E => String): String = exprs.zipWithIndex
        .map { case (e, i) => s"(${d(e)}) AS v$i" }.mkString(", ")
      val (snowQ, sparkQ) = shape match {
        case 0 => // plain GROUP BY
          (s"SELECT (${key.snow}) AS g0, ${sel(_.snow)} FROM fz3 " +
            "GROUP BY 1 ORDER BY g0",
            s"SELECT (${key.sparkSql}) AS g0, ${sel(_.sparkSql)} " +
            // Snowflake sorts NULLs highest; make it explicit Spark-side
            "FROM fz3_native GROUP BY 1 ORDER BY g0 NULLS LAST")
        case 1 => // HAVING
          (s"SELECT (${key.snow}) AS g0, ${sel(_.snow)} FROM fz3 " +
            "GROUP BY 1 HAVING COUNT(*) > 5 ORDER BY g0",
            s"SELECT (${key.sparkSql}) AS g0, ${sel(_.sparkSql)} " +
            "FROM fz3_native GROUP BY 1 HAVING COUNT(*) > 5 " +
            "ORDER BY g0 NULLS LAST")
        case 2 => // ROLLUP (Snowflake sorts NULLs highest — the engine
                  // appends NULLS LAST; state it on the Spark side too)
          (s"SELECT (${key.snow}) AS g0, (c % 2) AS g1, ${sel(_.snow)} " +
            "FROM fz3 GROUP BY ROLLUP(1, 2) ORDER BY g0, g1",
            s"SELECT (${key.sparkSql}) AS g0, (c % 2) AS g1, " +
            s"${sel(_.sparkSql)} FROM fz3_native GROUP BY ROLLUP(1, 2) " +
            "ORDER BY g0 NULLS LAST, g1 NULLS LAST")
        case _ => // global (no grouping)
          (s"SELECT ${sel(_.snow)} FROM fz3",
            s"SELECT ${sel(_.sparkSql)} FROM fz3_native")
      }
      val got = s.sql(snowQ).collect()
      fzDf.createOrReplaceTempView("fz3_native")
      val want = fzDf.sparkSession.sql(sparkQ).collect()
      assert(got.length == want.length,
        s"row count ${got.length} vs ${want.length}, query $q seed $seed" +
        s"\n snow:  $snowQ")
      got.zip(want).foreach { case (g, w) =>
        (0 until w.length).foreach { ci =>
          val off = w.length - exprs.length
          assert(sameVal(g.get(ci), w.get(ci)),
            s"seed=$seed query=$q col=$ci shape=$shape" +
            s"\n got=${g.get(ci)} want=${w.get(ci)}" +
            s"\n snow:  ${if (ci >= off) exprs(ci - off).snow else snowQ}" +
            s"\n spark: ${if (ci >= off) exprs(ci - off).sparkSql else sparkQ}")
        }
      }
      total += exprs.length
    }
    assert(total >= 300, s"only $total cases generated")
    s.sql("DROP TABLE fz3")
  }
}
