package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-context edges for the With-bound single-evaluation functions
  * (graft.functions.SingleEval): RewriteWithExpression historically
  * supported only Project/Filter/Aggregate — these pin the contexts the
  * gate pack doesn't hit head-on (window aggregate args, HAVING, JOIN
  * conditions, sort keys). */
class WithEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("single-eval functions work in window, HAVING, JOIN, ORDER BY") {
    val gs = new GraftSession(spark)
    val w = gs.sql("""
      WITH t AS (SELECT * FROM (VALUES (1, 10, 2), (1, 20, 0), (2, 30, 3))
        AS v(g, a, b))
      SELECT g, (sum(DIV0(a, b)) OVER (PARTITION BY g))::double AS w,
             TRUNC(a / 7.0, 1)::varchar AS tr
      FROM t ORDER BY g, tr""").collect()
    assert(w.length == 3)
    assert(w(0).getDouble(1) == 5.0 && w(2).getDouble(1) == 10.0, w.toSeq)
    val h = gs.sql("""
      WITH t AS (SELECT * FROM (VALUES (1, 10, 2), (2, 30, 3)) AS v(g, a, b))
      SELECT g, sum(DIV0(a, b))::double AS s FROM t GROUP BY g
      HAVING sum(DIV0(a, b)) > 4 ORDER BY g""").collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(1, 2), h.toSeq)
    val j = gs.sql("""
      WITH x AS (SELECT * FROM (VALUES (1, 4), (2, 0)) AS v(k, d)),
           y AS (SELECT * FROM (VALUES (2, 1), (1, 8)) AS v(k, n))
      SELECT x.k FROM x JOIN y ON DIV0(y.n, x.d) = 2 ORDER BY x.k""").collect()
    assert(j.map(_.getInt(0)).toSeq == Seq(1), j.toSeq)
    val o = gs.sql("""
      WITH t AS (SELECT * FROM (VALUES (9, 2), (8, 0), (30, 3)) AS v(a, b))
      SELECT a FROM t ORDER BY DIV0(a, b) DESC NULLS LAST, a""").collect()
    assert(o.map(_.getInt(0)).toSeq == Seq(30, 9, 8), o.toSeq)
  }

  test("numeric TRUNC with a NON-literal scale executes (power fallback)") {
    // regression: the first With-based lowering put power(10, n) in a
    // CommonExpressionDef, whose dataType is queried during analysis
    // before the UnresolvedFunction resolves -> UnresolvedException
    val gs = new GraftSession(spark)
    val r = gs.sql("""
      WITH t AS (SELECT * FROM (VALUES (12345.678, 2), (12345.678, -2),
        (12345.678, 0)) AS v(x, n))
      SELECT TRUNC(x, n)::varchar AS t FROM t ORDER BY n""").collect()
    assert(r.map(_.getString(0)).toSeq.map(BigDecimal(_)) ==
      Seq(BigDecimal(12300), BigDecimal(12345), BigDecimal("12345.67")),
      r.toSeq)
    // and the literal negative scale stays on the exact decimal path
    val d = gs.sql(
      "SELECT TRUNC(12345.678::number(9,3), -2) AS a").schema("a").dataType
    assert(d.isInstanceOf[org.apache.spark.sql.types.DecimalType], d)
  }
}
