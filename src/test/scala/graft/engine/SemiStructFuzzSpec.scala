package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized DIFFERENTIAL fuzz of the SEMI-STRUCTURED
  * surface — the thirteenth fuzz family — against DUCKDB's JSON
  * functions, which is the executor behind the reference's VARIANT
  * (universql stores VARIANT as JSON text and queries it on DuckDB).
  * The sibling SemiWindowFuzzSpec checks the REWRITE against
  * hand-written Spark; this family checks the MAPPING'S SEMANTICS
  * against the reference's executor: random JSON documents (objects /
  * arrays / scalars, depth ≤ 3) × random access paths through
  * `:`-paths, GET_PATH, JSON_EXTRACT_PATH_TEXT, STRIP_NULL_VALUE,
  * TYPEOF, and FLATTEN of int/varchar arrays.
  *
  * Two representation rules make the differential well-defined:
  *   - documents are generated CANONICAL (minified, no escapes,
  *     decimals with one nonzero fraction digit) because DuckDB's
  *     json_extract_string re-renders values (1.50 → 1.5) while
  *     Spark's get_json_object returns raw source text — on canonical
  *     docs both agree byte-for-byte;
  *   - a JSON null leaf reads back as the 4-char text 'null' through
  *     the engine's variant-as-JSON-text representation (that is why
  *     STRIP_NULL_VALUE exists) while DuckDB's json_extract_string
  *     yields SQL NULL — null-leaf accesses therefore go through
  *     STRIP_NULL_VALUE on the engine side, which is the documented
  *     equivalence.
  *
  * TYPEOF is checked against the GENERATOR's knowledge of the leaf
  * (construction-time oracle), not DuckDB — Snowflake's type names
  * (INTEGER/DECIMAL/VARCHAR/…) are not DuckDB's (BIGINT/DOUBLE/…).
  *
  * ≥350 cases per run, fixed seed (GRAFT_FUZZ_SEED env /
  * graft.fuzz.seed prop override); failures carry seed + both
  * renderings.
  */
class SemiStructFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ── tiny JSON model with a canonical serializer ────────────────────
  private sealed trait J { def ser: String }
  private case class JInt(v: Long) extends J { def ser = v.toString }
  private case class JDec(whole: Int, frac: Int) extends J {
    def ser = s"$whole.$frac" // frac 1..9: one nonzero digit, canonical
  }
  private case class JStr(v: String) extends J { def ser = "\"" + v + "\"" }
  private case class JBool(v: Boolean) extends J { def ser = v.toString }
  private case object JNull extends J { def ser = "null" }
  private case class JArr(xs: Vector[J]) extends J {
    def ser = xs.map(_.ser).mkString("[", ",", "]")
  }
  private case class JObj(kv: Vector[(String, J)]) extends J {
    def ser = kv.map { case (k, v) => "\"" + k + "\":" + v.ser }
      .mkString("{", ",", "}")
  }

  private case class C(snow: String, duck: String, label: String)

  test("350+ random semi-structured accesses: engine == DuckDB") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260816").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

    def leaf(): J = rnd.nextInt(5) match {
      case 0 => JInt(rnd.nextInt(100000) - 50000)
      case 1 => JDec(rnd.nextInt(2000) - 1000, 1 + rnd.nextInt(9))
      case 2 => JStr(Seq.fill(rnd.nextInt(7))(
        pick("abcxyz089_".toSeq)).mkString)
      case 3 => JBool(rnd.nextBoolean())
      case _ => JNull
    }
    def tree(depth: Int): J =
      if (depth <= 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => JObj(Vector.tabulate(1 + rnd.nextInt(3))(i =>
          s"k$i" -> tree(depth - 1)))
        case 1 => JArr(Vector.fill(rnd.nextInt(4))(tree(depth - 1)))
        case _ => leaf()
      }

    /** Random path INTO the doc; returns (snowPath, duckPath, node).
      * snowPath is the `:`-syntax suffix (`k0.k1[2]`). */
    def walk(j: J): (String, String, J) = {
      val snow = new StringBuilder
      val duck = new StringBuilder("$")
      var cur = j
      var continue = true
      while (continue) {
        cur match {
          case JObj(kv) if kv.nonEmpty && rnd.nextInt(4) > 0 =>
            val (k, v) = pick(kv)
            if (snow.nonEmpty) snow.append('.')
            snow.append(k); duck.append('.').append(k)
            cur = v
          case JArr(xs) if xs.nonEmpty && rnd.nextInt(4) > 0 =>
            val i = rnd.nextInt(xs.length)
            snow.append(s"[$i]"); duck.append(s"[$i]")
            cur = xs(i)
          case _ => continue = false
        }
      }
      (snow.toString, duck.toString, cur)
    }

    def lit(s: String): String = "'" + s.replace("'", "''") + "'"

    val cases = scala.collection.mutable.ArrayBuffer.empty[C]
    var guard = 0
    while (cases.length < 355 && guard < 5000) {
      guard += 1
      val doc = JObj(Vector.tabulate(2)(i => s"k$i" -> tree(2)))
      val (sp, dp, node) = walk(doc)
      if (sp.nonEmpty) {
        val d = lit(doc.ser)
        node match {
          case JNull =>
            // the documented equivalence for JSON null (see header)
            cases += C(s"STRIP_NULL_VALUE(PARSE_JSON($d):$sp)",
              s"json_extract_string($d, ${lit(dp)})", "null-leaf")
          case _: JObj | _: JArr =>
            cases += C(s"PARSE_JSON($d):$sp",
              s"json_extract_string($d, ${lit(dp)})", "nested")
          case _ =>
            rnd.nextInt(4) match {
              case 0 if !sp.contains('[') =>
                cases += C(
                  s"JSON_EXTRACT_PATH_TEXT($d, ${lit(sp)})",
                  s"json_extract_string($d, ${lit(dp)})", "jept")
              case 1 if (node match {
                // a string leaf whose TEXT parses as a number (or is
                // empty/bool-like) is indistinguishable from that
                // scalar once get_json_object strips the quotes — the
                // same variant-as-JSON-text ambiguity documented on
                // VariantToJson (r11 ADVICE); TYPEOF draws only
                // unambiguous strings
                case JStr(v) =>
                  v.nonEmpty && v.exists(c => c.isLetter || c == '_') &&
                    !Set("true", "false", "null")(v)
                case _ => true
              }) =>
                // TYPEOF against the construction-time oracle
                val want = node match {
                  case _: JInt => "INTEGER"
                  case _: JDec => "DECIMAL"
                  case _: JStr => "VARCHAR"
                  case _: JBool => "BOOLEAN"
                  case _ => "?"
                }
                cases += C(s"TYPEOF(PARSE_JSON($d):$sp)",
                  s"SELECT_LITERAL:$want", "typeof")
              case _ =>
                cases += C(s"PARSE_JSON($d):$sp",
                  s"json_extract_string($d, ${lit(dp)})", "scalar")
            }
        }
      }
      // a missing-key probe on every 10th doc
      if (guard % 10 == 0) {
        val d = lit(doc.ser)
        cases += C(s"PARSE_JSON($d):k0.zz_missing",
          s"json_extract_string($d, '$$.k0.zz_missing')", "missing")
      }
    }
    assert(cases.length >= 350)

    val s = new GraftSession(spark)
    val batches = cases.toVector.grouped(6).toVector
    val duckResults = DuckOracle.run(batches.zipWithIndex.flatMap {
      case (b, i) =>
        val real = b.zipWithIndex.filterNot(_._1.duck.startsWith(
          "SELECT_LITERAL:"))
        if (real.isEmpty) None
        else Some(s"b$i" -> real.map { case (c, j) =>
          s"CAST((${c.duck}) AS VARCHAR) AS c$j" }
          .mkString("SELECT ", ", ", ""))
    })

    var checked = 0
    batches.zipWithIndex.foreach { case (b, i) =>
      val snowSql = b.zipWithIndex.map { case (c, j) =>
        s"(${c.snow})::varchar AS c$j" }.mkString("SELECT ", ", ", "")
      val got = s.sql(snowSql).collect()(0)
      val wantByCol: Map[Int, String] = duckResults.get(s"b$i") match {
        case Some(Right(rows)) =>
          val real = b.zipWithIndex.filterNot(_._1.duck.startsWith(
            "SELECT_LITERAL:")).map(_._2)
          real.zip(rows.head.split("\\|", -1)).toMap
        case Some(Left(err)) => fail(
          s"duckdb failed (seed=$seed batch=$i): $err")
        case None => Map.empty
      }
      b.zipWithIndex.foreach { case (c, j) =>
        val g = if (got.isNullAt(j)) "NULL" else got.get(j).toString
        val w =
          if (c.duck.startsWith("SELECT_LITERAL:"))
            c.duck.stripPrefix("SELECT_LITERAL:")
          else wantByCol(j)
        assert(g == w,
          s"semi-structured divergence (seed=$seed batch=$i col=$j " +
            s"${c.label})\n snow: ${c.snow}\n duck: ${c.duck}\n " +
            s"got:  $g\n want: $w")
        checked += 1
      }
    }
    assert(checked >= 350, s"only $checked cases checked")
  }

  test("FLATTEN of int and varchar arrays == DuckDB unnest") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260816").toLong
    val rnd = new scala.util.Random(seed + 1)
    val s = new GraftSession(spark)
    for (round <- 1 to 12) {
      val ints = rnd.nextBoolean()
      val n = 1 + rnd.nextInt(6)
      val elems =
        if (ints) Vector.fill(n)((rnd.nextInt(2000) - 1000).toString)
        else Vector.fill(n)("\"s" + rnd.nextInt(100) + "\"")
      val arr = elems.mkString("[", ",", "]")
      val castT = if (ints) "int" else "varchar"
      val got = s.sql(
        s"""SELECT f.index AS i, f.value::$castT AS v
            FROM (SELECT 1 AS one) t,
              LATERAL FLATTEN(input => PARSE_JSON('$arr')) f
            ORDER BY i""").collect()
        .map(r => s"${r.get(0)}|${r.get(1)}").toSeq
      val duckT = if (ints) "INTEGER[]" else "VARCHAR[]"
      val want = DuckOracle.run(Seq("f" ->
        s"""SELECT CAST(generate_subscripts(l, 1) - 1 AS INT) AS i,
              unnest(l) AS v
            FROM (SELECT CAST('$arr'::JSON AS $duckT) AS l)
            ORDER BY i"""))("f") match {
        case Right(rows) => rows
        case Left(err) => fail(s"duckdb failed (seed=$seed r=$round): $err")
      }
      assert(got == want,
        s"flatten divergence (seed=$seed round=$round)\n arr: $arr\n " +
          s"got:  ${got.mkString(" ; ")}\n want: ${want.mkString(" ; ")}")
    }
  }
}
