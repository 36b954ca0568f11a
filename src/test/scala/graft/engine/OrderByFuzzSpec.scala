package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized DIFFERENTIAL fuzz of the ORDER BY
  * null-ordering compensation pass (`sortNullsCompensation`) — the
  * fourteenth fuzz family. The pass is a lexical scan over every ORDER
  * BY in the statement (top level, subqueries, window ORDER BY), and
  * exactly the kind of token-boundary code (parenthesized sort items,
  * CASE keys, frames, terminators, comments) that fuzzing catches.
  *
  * Snowflake's documented default sorts NULLs as the HIGHEST values
  * (ASC → NULLS LAST, DESC → NULLS FIRST); DuckDB's default is NULLS
  * LAST in both directions — so the DuckDB rendering spells the
  * SNOWFLAKE default out explicitly on every item the engine-side SQL
  * leaves implicit, and copies explicit NULLS FIRST/LAST verbatim.
  * Every query carries a unique `id` tie-breaker as the last sort item
  * (explicit on the DuckDB side) so row order is fully determined and
  * LIMIT/OFFSET row selection is decidable.
  *
  * Shapes drawn: 1–3 sort items from {column, parenthesized
  * arithmetic, CASE, coalesce (comma inside parens), positional
  * ordinal}, each ± ASC/DESC ± explicit NULLS; ± LIMIT/OFFSET;
  * ORDER-BY-under-LIMIT inside a subquery (row selection, not just
  * order); window ORDER BY with ± ROWS frame (compensation must land
  * BEFORE the frame keyword); and a comment between ORDER and BY.
  *
  * ≥140 cases per run, fixed seed (GRAFT_FUZZ_SEED env /
  * graft.fuzz.seed prop override); failures carry seed + both
  * renderings.
  */
class OrderByFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("140+ random ORDER BY shapes: engine == DuckDB with explicit NULLS") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260816").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

    // shared relation: ints and strings with NULLs and heavy ties
    // `last` is a column deliberately named like the NULLS-modifier
    // keyword: a sort key that is literally `last` (or `first`) must
    // parse as the key expression, not the modifier (r13 ADVICE #2)
    val rows = (1 to 36).map { id =>
      val g = id % 3
      val k = if (rnd.nextInt(4) == 0) "NULL" else rnd.nextInt(5).toString
      val v = if (rnd.nextInt(5) == 0) "NULL" else rnd.nextInt(7).toString
      val s = if (rnd.nextInt(4) == 0) "NULL"
              else "'" + pick(Seq("a", "b", "bb", "c", "")) + "'"
      val last = if (rnd.nextInt(6) == 0) "NULL" else rnd.nextInt(4).toString
      s"($id, $g, $k, $v, $s, $last)"
    }.mkString(", ")
    val cte =
      s"WITH t AS (SELECT * FROM (VALUES $rows) AS v0(id, g, k, v, s, last)) "

    // a sort item: (snowflake text, duckdb text, direction or "")
    case class Item(snow: String, duck: String)
    def genItem(allowOrdinal: Boolean): Item = {
      val key = rnd.nextInt(if (allowOrdinal) 6 else 5) match {
        case 0 => pick(Seq("k", "v", "s", "g", "last"))
        case 1 => "(k + v)"
        case 2 => "CASE WHEN k IS NULL THEN v ELSE k END"
        case 3 => "coalesce(k, v)"
        case 4 => "(k)"
        case _ => "1" // positional: the first select-list column
      }
      val dir = pick(Seq("", " ASC", " DESC"))
      val explicitNulls = pick(Seq("", "", " NULLS FIRST", " NULLS LAST"))
      val duckNulls =
        if (explicitNulls.nonEmpty) explicitNulls
        else if (dir == " DESC") " NULLS FIRST" // Snowflake default
        else " NULLS LAST"
      Item(s"$key$dir$explicitNulls", s"$key$dir$duckNulls")
    }

    case class C(snow: String, duck: String, selectsWindow: Boolean)

    def genTopLevel(): C = {
      val n = 1 + rnd.nextInt(3)
      val items = Vector.fill(n)(genItem(allowOrdinal = true))
      val orderKw = if (rnd.nextInt(6) == 0) "ORDER /*c*/ BY" else "ORDER BY"
      val limit = rnd.nextInt(3) match {
        case 0 => ""
        case 1 => s" LIMIT ${1 + rnd.nextInt(20)}"
        case _ => s" LIMIT ${1 + rnd.nextInt(12)} OFFSET ${rnd.nextInt(6)}"
      }
      C(cte + "SELECT CAST(id AS VARCHAR) AS r FROM t " +
          s"$orderKw ${items.map(_.snow).mkString(", ")}, id$limit",
        cte + "SELECT CAST(id AS VARCHAR) AS r FROM t " +
          s"ORDER BY ${items.map(_.duck).mkString(", ")}, " +
          s"id ASC NULLS LAST$limit",
        selectsWindow = false)
    }

    def genSubqueryLimit(): C = {
      // the inner ORDER BY + LIMIT SELECTS rows; the outer sort (by id,
      // explicit on both sides) only normalizes presentation order
      val items = Vector.fill(1 + rnd.nextInt(2))(genItem(allowOrdinal = false))
      val lim = 3 + rnd.nextInt(15)
      C(cte + "SELECT r FROM (SELECT CAST(id AS VARCHAR) AS r, id FROM t " +
          s"ORDER BY ${items.map(_.snow).mkString(", ")}, id LIMIT $lim) " +
          "sub ORDER BY id",
        cte + "SELECT r FROM (SELECT CAST(id AS VARCHAR) AS r, id FROM t " +
          s"ORDER BY ${items.map(_.duck).mkString(", ")}, " +
          s"id ASC NULLS LAST LIMIT $lim) sub ORDER BY id ASC NULLS LAST",
        selectsWindow = false)
    }

    def genWindow(): C = {
      val item = genItem(allowOrdinal = false)
      val frame = pick(Seq("",
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        " ROWS BETWEEN 1 PRECEDING AND CURRENT ROW"))
      val fn = pick(Seq("sum(v)", "count(k)", "row_number()"))
      val f = if (fn == "row_number()") "" else frame
      C(cte + s"SELECT CAST(id AS VARCHAR) AS r, CAST($fn OVER " +
          s"(PARTITION BY g ORDER BY ${item.snow}, id$f) AS VARCHAR) AS w " +
          "FROM t ORDER BY id",
        cte + s"SELECT CAST(id AS VARCHAR) AS r, CAST($fn OVER " +
          s"(PARTITION BY g ORDER BY ${item.duck}, id ASC NULLS LAST$f) " +
          "AS VARCHAR) AS w FROM t ORDER BY id ASC NULLS LAST",
        selectsWindow = true)
    }

    // one WITHIN GROUP sort key with its own per-key direction + NULLS
    // (Snowflake semantics) and the DuckDB rendering made explicit
    def wgKey(): Item = {
      val key = pick(Seq("k", "v", "last", "(k + v)", "coalesce(k, last)",
        "CASE WHEN k IS NULL THEN v ELSE k END", "(v * 2 - k)"))
      val desc = rnd.nextBoolean()
      val dir = if (desc) " DESC" else pick(Seq("", " ASC"))
      val explicitNulls = pick(Seq("", "", " NULLS FIRST", " NULLS LAST"))
      val duckNulls =
        if (explicitNulls.nonEmpty) explicitNulls
        else if (desc) " NULLS FIRST" else " NULLS LAST"
      Item(s"$key$dir$explicitNulls", s"$key$dir$duckNulls")
    }

    // LISTAGG delimiters incl. quote-escapes and empty (r13 dir. #6) —
    // identical SQL literal text on both sides
    def delim(): String =
      pick(Seq("','", "';'", "' '", "'~~'", "''", "''''", "'a''b'", "'|'"))

    def genWithinGroup(): C = {
      // LISTAGG(s, d) WITHIN GROUP (ORDER BY k1 …, k3 …, id) — 1-3 keys,
      // EACH with its own direction/NULLS draw (mixed directions force
      // the comparator path); the string the agg produces depends on
      // where NULL keys sort. NULL s values don't aggregate on either
      // engine, hence the coalesce payload.
      val keys = Vector.fill(1 + rnd.nextInt(3))(wgKey())
      val d = delim()
      val idDir = if (rnd.nextInt(3) == 0) " DESC NULLS FIRST" else ""
      val duckIdDir = if (idDir.nonEmpty) " DESC NULLS FIRST"
                      else " ASC NULLS LAST"
      C(cte + s"SELECT g, LISTAGG(coalesce(s, 'Ø'), $d) WITHIN GROUP " +
          s"(ORDER BY ${keys.map(_.snow).mkString(", ")}, id$idDir) AS agg " +
          "FROM t GROUP BY g ORDER BY g",
        cte + s"SELECT g, string_agg(coalesce(s, 'Ø'), $d " +
          s"ORDER BY ${keys.map(_.duck).mkString(", ")}, id$duckIdDir) " +
          "AS agg FROM t GROUP BY g ORDER BY g ASC NULLS LAST",
        selectsWindow = false)
    }

    def genDistinctAgg(): C = {
      // the DISTINCT forms constrain ORDER BY to the aggregated
      // expression itself (Snowflake rule; the mismatch error path is
      // pinned below). Engine lowers to array_sort(collect_set(x)) —
      // NULLs dropped — so the DuckDB side filters NULLs explicitly.
      val desc = rnd.nextBoolean()
      val dir = if (desc) " DESC" else pick(Seq("", " ASC"))
      val col = pick(Seq("k", "v", "s"))
      if (rnd.nextBoolean()) {
        val d = delim()
        C(cte + s"SELECT g, LISTAGG(DISTINCT $col, $d) WITHIN GROUP " +
            s"(ORDER BY $col$dir) AS agg FROM t GROUP BY g ORDER BY g",
          cte + s"SELECT g, string_agg(DISTINCT $col, $d " +
            s"ORDER BY $col$dir) AS agg FROM t GROUP BY g " +
            "ORDER BY g ASC NULLS LAST",
          selectsWindow = false)
      } else {
        val duckSort = if (desc) ", 'DESC'" else ""
        C(cte + "SELECT g, ARRAY_TO_STRING(ARRAY_AGG(DISTINCT " +
            s"$col) WITHIN GROUP (ORDER BY $col$dir), '/') AS agg " +
            "FROM t GROUP BY g ORDER BY g",
          cte + "SELECT g, array_to_string(list_sort(list(DISTINCT " +
            s"$col) FILTER (WHERE $col IS NOT NULL)$duckSort), '/') " +
            "AS agg FROM t GROUP BY g ORDER BY g ASC NULLS LAST",
          selectsWindow = false)
      }
    }

    val gens: Seq[() => C] =
      Seq(genTopLevel _, genTopLevel _, genTopLevel _,
        genSubqueryLimit _, genWindow _, genWithinGroup _,
        genWithinGroup _, genDistinctAgg _)
    val cases = Vector.fill(300)(pick(gens)())

    val duckResults = DuckOracle.run(cases.zipWithIndex.map {
      case (c, i) => s"c$i" -> c.duck
    })

    // pinned error path: DISTINCT constrains the WITHIN GROUP key to the
    // aggregated expression itself (Snowflake errors on a mismatch too)
    locally {
      val s = new GraftSession(spark)
      val e = intercept[Exception] {
        s.sql(cte + "SELECT g, ARRAY_AGG(DISTINCT k) WITHIN GROUP " +
          "(ORDER BY v) AS agg FROM t GROUP BY g").collect()
      }
      assert(e.getMessage.contains("ORDER BY"), e.getMessage)
    }

    val s = new GraftSession(spark)
    cases.zipWithIndex.foreach { case (c, i) =>
      val want = duckResults(s"c$i") match {
        case Right(r) => r
        case Left(err) =>
          fail(s"duckdb failed (seed=$seed case=$i): $err\n sql: ${c.duck}")
      }
      val got = s.sql(c.snow).collect().map { row =>
        (0 until row.length).map(j =>
          if (row.isNullAt(j)) "NULL" else row.get(j).toString)
          .mkString("|")
      }.toSeq
      assert(got == want,
        s"ORDER BY divergence (seed=$seed case=$i)\n snow: ${c.snow}\n " +
          s"duck: ${c.duck}\n got:  ${got.mkString(",")}\n " +
          s"want: ${want.mkString(",")}")
    }
  }
}
