package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial dialect inputs executed end-to-end through the session:
  * keywords inside strings, comments straddling rewrites, nested
  * subqueries mixing several rewriter passes at once. */
class RobustnessSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def newSession(): GraftSession = {
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")
    s
  }

  test("ASOF union+window emission ≡ correlated LATERAL on random data") {
    // Randomized differential test of the two ASOF JOIN lowerings: the
    // schema-resolved union+window form (what sessions run) against the
    // schema-free correlated-LATERAL fallback, over data with timestamp
    // ties, matchless left rows, and right rows nobody matches. Right
    // timestamps are unique per key so tie-breaking between equal right
    // rows can't differ between the forms (both would be free to pick
    // either).
    val s = newSession()
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      def ts(sec: Int) = f"TIMESTAMP '2024-03-01 ${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d'"
      val leftVals = (1 to 120).map { id =>
        s"($id, ${rnd.nextInt(5)}, ${rnd.nextInt(3)}, ${ts(rnd.nextInt(600))})"
      }.mkString(", ")
      // globally unique right seconds: the keyless (global) shape must
      // also be tie-free between right rows
      val used = scala.collection.mutable.Set.empty[Int]
      val rightVals = (1 to 90).map { rid =>
        val k1 = rnd.nextInt(5); val k2 = rnd.nextInt(3)
        val sec = Iterator.continually(rnd.nextInt(600))
          .find(t => !used(t)).get
        used += sec
        s"($rid, $k1, $k2, ${ts(sec)})"
      }.mkString(", ")
      s.sql(s"CREATE OR REPLACE TEMP TABLE asof_l AS SELECT * FROM (VALUES $leftVals) AS t(id, k1, k2, ts)")
      s.sql(s"CREATE OR REPLACE TEMP TABLE asof_r AS SELECT * FROM (VALUES $rightVals) AS t(rid, k1, k2, ts)")

      val shapes = Seq(
        // single key, inclusive
        "SELECT l.id, r.rid FROM asof_l l ASOF JOIN asof_r r " +
          "MATCH_CONDITION(l.ts >= r.ts) ON l.k1 = r.k1 ORDER BY l.id",
        // single key, strict (ties must NOT match)
        "SELECT l.id, r.rid FROM asof_l l ASOF JOIN asof_r r " +
          "MATCH_CONDITION(l.ts > r.ts) ON l.k1 = r.k1 ORDER BY l.id",
        // two keys
        "SELECT l.id, r.rid FROM asof_l l ASOF JOIN asof_r r " +
          "MATCH_CONDITION(l.ts >= r.ts) ON l.k1 = r.k1 AND l.k2 = r.k2 " +
          "ORDER BY l.id",
        // keyless (global as-of)
        "SELECT l.id, r.rid FROM asof_l l ASOF JOIN asof_r r " +
          "MATCH_CONDITION(l.ts >= r.ts) ORDER BY l.id, r.rid",
        // left-outer: matchless left rows survive with NULL rid
        "SELECT l.id, r.rid FROM asof_l l ASOF LEFT JOIN asof_r r " +
          "MATCH_CONDITION(l.ts >= r.ts) ON l.k1 = r.k1 ORDER BY l.id",
        // forward: first right at-or-AFTER the left row (DESC carry)
        "SELECT l.id, r.rid FROM asof_l l ASOF JOIN asof_r r " +
          "MATCH_CONDITION(l.ts <= r.ts) ON l.k1 = r.k1 ORDER BY l.id",
        // forward strict: equal-ts right rows must NOT match
        "SELECT l.id, r.rid FROM asof_l l ASOF JOIN asof_r r " +
          "MATCH_CONDITION(l.ts < r.ts) ON l.k1 = r.k1 ORDER BY l.id",
        // forward keyless + left-outer
        "SELECT l.id, r.rid FROM asof_l l ASOF JOIN asof_r r " +
          "MATCH_CONDITION(l.ts <= r.ts) ORDER BY l.id, r.rid",
        "SELECT l.id, r.rid FROM asof_l l ASOF LEFT JOIN asof_r r " +
          "MATCH_CONDITION(l.ts <= r.ts) ON l.k1 = r.k1 ORDER BY l.id",
        // arithmetic right-time expressions: the carry orders by the
        // SHIFTED value, which is monotone in r.ts, so the union+window
        // lowering stays exact ("r visible 2 minutes after its ts")
        "SELECT l.id, r.rid FROM asof_l l ASOF JOIN asof_r r " +
          "MATCH_CONDITION(l.ts >= r.ts + INTERVAL '2' MINUTE) " +
          "ON l.k1 = r.k1 ORDER BY l.id",
        "SELECT l.id, r.rid FROM asof_l l ASOF LEFT JOIN asof_r r " +
          "MATCH_CONDITION(l.ts < r.ts - INTERVAL '1' MINUTE) " +
          "ON l.k1 = r.k1 ORDER BY l.id")
      for (q <- shapes) {
        val viaUnionWindow = s.sql(q)
        assert(viaUnionWindow.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }.isEmpty, s"emitter did not engage for: $q")
        val lateral = SnowflakeRewriter.rewrite(q) // no resolver → LATERAL
        assert(lateral.toUpperCase.contains("LATERAL"))
        val viaLateral = s.spark.sql(
          TableResolver.resolveAndSubstitute(lateral, s))
        assert(viaUnionWindow.collect().toSeq == viaLateral.collect().toSeq,
          s"seed=$seed shape=$q")
      }
    }
  }

  test("ASOF emission matches LATERAL semantics on NULL keys/timestamps") {
    // SQL comparisons never match NULLs: NULL-keyed or NULL-ts rows on
    // either side must stay unmatched (dropped for inner, NULL-extended
    // for outer), and a matched right row's own NULL payload columns
    // must surface as NULL — not as stale values torn from older rows.
    // The correlated-LATERAL lowering inherits these semantics from
    // ordinary SQL, so it is the oracle.
    val s = newSession()
    for (seed <- Seq(3, 99)) {
      val rnd = new scala.util.Random(seed)
      def ts(sec: Int) = f"TIMESTAMP '2024-03-01 ${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d'"
      val leftVals = (1 to 80).map { id =>
        val k = if (rnd.nextInt(10) == 0) "NULL" else s"${rnd.nextInt(4)}"
        val t = if (rnd.nextInt(10) == 0) "NULL" else ts(rnd.nextInt(400))
        s"($id, $k, $t)"
      }.mkString(", ")
      val used = scala.collection.mutable.Set.empty[Int]
      val rightVals = (1 to 60).map { rid =>
        val k = if (rnd.nextInt(10) == 0) "NULL" else s"${rnd.nextInt(4)}"
        val t =
          if (rnd.nextInt(10) == 0) "NULL"
          else {
            val sec = Iterator.continually(rnd.nextInt(400))
              .find(x => !used(x)).get
            used += sec
            ts(sec)
          }
        // payload column v is NULL on a third of the rows — the torn-
        // carry detector: a stale non-NULL v from an older right row
        // would diverge from LATERAL
        val v = if (rnd.nextInt(3) == 0) "NULL" else s"${rid * 100}"
        s"($rid, $k, $t, $v)"
      }.mkString(", ")
      s.sql(s"CREATE OR REPLACE TEMP TABLE asofn_l AS SELECT * FROM (VALUES $leftVals) AS t(id, k1, ts)")
      s.sql(s"CREATE OR REPLACE TEMP TABLE asofn_r AS SELECT * FROM (VALUES $rightVals) AS t(rid, k1, ts, v)")
      val shapes = Seq(
        "SELECT l.id, r.rid, r.v FROM asofn_l l ASOF JOIN asofn_r r " +
          "MATCH_CONDITION(l.ts >= r.ts) ON l.k1 = r.k1 ORDER BY l.id",
        "SELECT l.id, r.rid, r.v FROM asofn_l l ASOF LEFT JOIN asofn_r r " +
          "MATCH_CONDITION(l.ts >= r.ts) ON l.k1 = r.k1 ORDER BY l.id",
        "SELECT l.id, r.rid, r.v FROM asofn_l l ASOF JOIN asofn_r r " +
          "MATCH_CONDITION(l.ts <= r.ts) ON l.k1 = r.k1 ORDER BY l.id",
        "SELECT l.id, r.rid, r.v FROM asofn_l l ASOF JOIN asofn_r r " +
          "MATCH_CONDITION(l.ts > r.ts) ORDER BY l.id")
      for (q <- shapes) {
        val viaUnionWindow = s.sql(q)
        assert(viaUnionWindow.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }.isEmpty, s"emitter did not engage for: $q")
        val lateral = SnowflakeRewriter.rewrite(q)
        val viaLateral = s.spark.sql(
          TableResolver.resolveAndSubstitute(lateral, s))
        assert(viaUnionWindow.collect().toSeq == viaLateral.collect().toSeq,
          s"seed=$seed shape=$q")
      }
    }
  }

  test("ASOF JOIN inside a CTE body: scoped schema probe and rewrite") {
    // the ASOF sits in CTE `j`, whose inputs are EARLIER CTEs — the
    // emitter must probe schemas against only the prefix before `j`, and
    // must not rewrite `v.`-qualified text outside j's body
    val s = newSession()
    val df = s.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts FROM events
                 WHERE event_type = 'view'),
           j AS (SELECT p.event_id AS eid, v.view_id AS vid
                 FROM p ASOF JOIN v MATCH_CONDITION(p.ts >= v.ts)
                   ON p.user_id = v.user_id)
      SELECT count(*) AS n, count(vid) AS matched FROM j""")
    val row = df.collect()(0)
    assert(row.getLong(0) > 0 && row.getLong(1) == row.getLong(0),
      "inner ASOF inside CTE must keep only matched rows")
    assert(df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "union+window emitter should engage inside the CTE")
  }

  test("ASOF qualifier rewrite stops at set-operation boundaries") {
    // the second UNION branch binds the SAME alias v (the CTE) in an
    // ordinary join — its v.view_id must NOT be rewritten to p.view_id
    val s = newSession()
    val df = s.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts FROM events
                 WHERE event_type = 'view')
      SELECT p.event_id AS eid, v.view_id AS vid
      FROM p ASOF JOIN v MATCH_CONDITION(p.ts >= v.ts) ON p.user_id = v.user_id
      UNION ALL
      SELECT e.event_id AS eid, v.view_id AS vid
      FROM events e JOIN v ON e.event_id = v.view_id""")
    assert(df.count() > 0)
  }

  test("ASOF JOIN with a subquery right side still takes the emitter") {
    val s = newSession()
    val df = s.sql("""
      SELECT p.event_id, v.view_id
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT event_id AS view_id, user_id, ts FROM events
                   WHERE event_type = 'view') v
        MATCH_CONDITION(p.ts >= v.ts) ON p.user_id = v.user_id
      ORDER BY p.event_id""")
    // subquery LEFT side resolves through the schema probe too (round 5)
    // — both parenthesized sides take the union+window emitter
    assert(df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "emitter should engage for subquery-left/subquery-right")
    assert(df.count() > 0)
    // right-subquery with a plain left table engages the emitter
    val df2 = s.sql("""
      SELECT e.event_id, v.view_id
      FROM events e
        ASOF JOIN (SELECT event_id AS view_id, user_id, ts AS vts FROM events
                   WHERE event_type = 'view') v
        MATCH_CONDITION(e.ts >= v.vts) ON e.user_id = v.user_id
      ORDER BY e.event_id LIMIT 50""")
    assert(df2.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "emitter should engage for table-left/subquery-right")
    assert(df2.count() == 50)
  }

  test("ASOF right-star expands through the emitter, values ≡ LATERAL") {
    val s = newSession()
    val q = """
      SELECT e.event_id, v.*
      FROM events e
        ASOF JOIN (SELECT event_id AS view_id, user_id AS vuid, ts AS vts
                   FROM events WHERE event_type = 'view') v
        MATCH_CONDITION(e.ts >= v.vts) ON e.user_id = v.vuid
      ORDER BY e.event_id"""
    val df = s.sql(q)
    assert(df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "emitter should engage for v.* expansion")
    assert(df.columns.toSeq == Seq("event_id", "view_id", "vuid", "vts"))
    val lateral = s.spark.sql(
      TableResolver.resolveAndSubstitute(SnowflakeRewriter.rewrite(q), s))
    assert(df.collect().map(_.toSeq).toSeq ==
      lateral.collect().map(_.toSeq).toSeq)
  }

  test("ASOF r.* with colliding right names keeps ORIGINAL names in output") {
    // Snowflake's r.* surfaces the right relation's own column names even
    // when they collide with left columns; the emitter's internal
    // collision renames (v_ts) must not leak into the output schema
    // (ADVICE r5). Values were always correct — this pins the names.
    val s = newSession()
    val q = """
      SELECT e.event_id, v.*
      FROM events e
        ASOF JOIN (SELECT user_id, ts FROM events
                   WHERE event_type = 'view') v
        MATCH_CONDITION(e.ts >= v.ts) ON e.user_id = v.user_id
      ORDER BY e.event_id"""
    val df = s.sql(q)
    assert(df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "emitter should engage")
    assert(df.columns.toSeq == Seq("event_id", "user_id", "ts"),
      s"r.* must expose original right names, got ${df.columns.toSeq}")
    val lateral = s.spark.sql(
      TableResolver.resolveAndSubstitute(SnowflakeRewriter.rewrite(q), s))
    assert(df.collect().map(_.toSeq).toSeq ==
      lateral.collect().map(_.toSeq).toSeq)
  }

  test("ASOF with a special-char right column takes the emitter, quote-rendered") {
    // A right column whose resolved name is not a plain identifier
    // ("View ID": space + exact case, as born from quoted DDL) used to
    // force the LATERAL nested-loop fallback; the emitter now renders
    // such names backtick-quoted and keeps the zero-join plan.
    val s = newSession()
    val dir = java.nio.file.Files.createTempDirectory("asof_weird").toString
    s.spark.range(0, 200)
      .selectExpr("id AS `View ID`", "CAST(id % 40 AS BIGINT) AS vuid",
        "TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, CAST(id * 7 % 600 AS INT)) AS vts")
      .write.mode("overwrite").parquet(s"$dir/weird.parquet")
    s.attachLake(dir, names = Seq("weird"))
    val q = """
      SELECT e.event_id, v.*
      FROM events e ASOF JOIN weird v
      MATCH_CONDITION(e.ts >= v.vts) ON e.user_id = v.vuid
      ORDER BY e.event_id"""
    val df = s.sql(q)
    assert(df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty,
      "emitter should engage for a special-char right column")
    assert(df.columns.toSeq == Seq("event_id", "View ID", "vuid", "vts"))
    val lateral = s.spark.sql(
      TableResolver.resolveAndSubstitute(SnowflakeRewriter.rewrite(q), s))
    assert(df.collect().map(_.toSeq).toSeq ==
      lateral.collect().map(_.toSeq).toSeq)
  }

  test("chained ASOF joins: both lower through the emitter, zero joins") {
    // the first lowering leaves a parenthesized derived table as the
    // left side; the second ASOF must still take the union+window path
    // (subquery-left support), so the whole plan stays join-free
    val s = newSession()
    val df = s.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts AS vts FROM events
                 WHERE event_type = 'view'),
           c AS (SELECT event_id AS click_id, user_id, ts AS cts FROM events
                 WHERE event_type = 'click')
      SELECT p.event_id, v.view_id, c.click_id
      FROM p
        ASOF JOIN v MATCH_CONDITION(p.ts >= v.vts) ON p.user_id = v.user_id
        ASOF JOIN c MATCH_CONDITION(p.ts >= c.cts) ON p.user_id = c.user_id
      ORDER BY p.event_id""")
    assert(df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, s"chained ASOF should stay join-free:\n${df.queryExecution.optimizedPlan}")
    // differential vs the double-LATERAL lowering
    val q = """
      WITH p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts AS vts FROM events
                 WHERE event_type = 'view'),
           c AS (SELECT event_id AS click_id, user_id, ts AS cts FROM events
                 WHERE event_type = 'click')
      SELECT p.event_id, v.view_id, c.click_id
      FROM p
        ASOF JOIN v MATCH_CONDITION(p.ts >= v.vts) ON p.user_id = v.user_id
        ASOF JOIN c MATCH_CONDITION(p.ts >= c.cts) ON p.user_id = c.user_id
      ORDER BY p.event_id"""
    val lateral = SnowflakeRewriter.rewrite(q)
    assert(lateral.toUpperCase.contains("LATERAL"))
    val viaLateral = s.spark.sql(TableResolver.resolveAndSubstitute(lateral, s))
    assert(df.collect().toSeq == viaLateral.collect().toSeq)
  }

  test("ASOF bails to LATERAL when the right alias is re-bound in scope") {
    // a scalar subquery inside the block re-binds `v` as a relation —
    // the emitter must not rewrite through the shadowing binding
    val s = newSession()
    val df = s.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts FROM events
                 WHERE event_type = 'view')
      SELECT p.event_id, v.view_id, (SELECT count(*) FROM v) AS all_views
      FROM p ASOF JOIN v MATCH_CONDITION(p.ts >= v.ts)
        ON p.user_id = v.user_id
      ORDER BY p.event_id""")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val expectedViews = s.sql(
      "SELECT count(*) FROM events WHERE event_type = 'view'")
      .collect()(0).getLong(0)
    assert(rows.forall(_.getLong(2) == expectedViews),
      "shadowed (SELECT count(*) FROM v) must count the CTE, not the ASOF exposure")
  }

  test("EXPLAIN passes through with resolved tables") {
    val s = newSession()
    val rows = s.sql("EXPLAIN SELECT count(*) FROM orders WHERE o_orderkey < 10")
      .collect()
    assert(rows.nonEmpty && rows(0).getString(0).contains("Physical Plan"))
  }

  test("keywords and cast syntax inside string literals stay literal") {
    val s = newSession()
    val r = s.sql(
      "SELECT 'SAMPLE (10 ROWS) FROM orders; QUALIFY x' AS a, 'b''s ::int' AS b")
      .collect()(0)
    assert(r.getString(0) == "SAMPLE (10 ROWS) FROM orders; QUALIFY x")
    assert(r.getString(1) == "b's ::int")
  }

  test("CURRENT_DATABASE() substitutes as a call but survives in literals") {
    val s = newSession()
    val r = s.sql(
      "SELECT CURRENT_DATABASE() AS db, 'CURRENT_DATABASE()' AS lit, " +
        "CURRENT_SCHEMA( /* c */ ) AS sch").collect()(0)
    assert(r.getString(0) == "GRAFT")
    assert(r.getString(1) == "CURRENT_DATABASE()") // literal untouched
    assert(r.getString(2) == "PUBLIC") // comments inside the call parens ok
    // session state changes are reflected
    s.sql("USE DATABASE otherdb")
    assert(s.sql("SELECT CURRENT_DATABASE() AS db").collect()(0)
      .getString(0) == "OTHERDB")
  }

  test("comments between rewritten tokens") {
    val s = newSession()
    val n = s.sql(
      """SELECT count(*) AS n FROM orders -- trailing comment with :: and SAMPLE
        | WHERE o_orderkey /* inline :: comment */ <= 100""".stripMargin)
      .collect()(0).getLong(0)
    assert(n == 101) // keys start at 0
  }

  test("QUALIFY inside a subquery plus outer aggregate") {
    val s = newSession()
    val df = s.sql(
      """SELECT o_orderpriority, count(*) AS n FROM (
        |  SELECT o_orderpriority, o_orderkey FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) <= 3
        |) GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(df.collect().forall(_.getLong(1) == 3))
  }

  test("chained casts, IFF, and variant path in one expression") {
    val s = newSession()
    val r = s.sql(
      """SELECT IFF(PARSE_JSON('{"a": {"b": 7}}'):a.b::int > 5,
        |           '1995-03-15'::date::varchar, NULL) AS v""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "1995-03-15")
  }

  test("DML with strings containing WHERE/SET keywords") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE rob_t AS SELECT o_orderkey AS k, o_orderstatus AS st FROM orders WHERE o_orderkey <= 50")
    s.sql("UPDATE rob_t SET st = 'WHERE SET = , MERGE' WHERE k <= 10")
    val n = s.sql("SELECT count(*) AS n FROM rob_t WHERE st = 'WHERE SET = , MERGE'")
      .collect()(0).getLong(0)
    assert(n == 11) // keys 0..10
    s.sql("DELETE FROM rob_t WHERE st = 'WHERE SET = , MERGE'")
    assert(s.sql("SELECT count(*) AS n FROM rob_t").collect()(0).getLong(0) == 40) // 51 - 11
    s.sql("DROP TABLE rob_t")
  }

  test("mixed-pass query: flatten + qualify + decode + sample-free") {
    val s = newSession()
    val df = s.sql(
      """SELECT doc_id, f.value::int AS v,
        |  DECODE(f.index, 0, 'first', 1, 'second', 'later') AS pos
        |FROM (SELECT doc_id, PARSE_JSON('[' || n_chars || ',2,3]') AS arr
        |      FROM documents WHERE doc_id < 5) t,
        |  LATERAL FLATTEN(input => arr) f
        |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY f.index) <= 2
        |ORDER BY doc_id, v""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.map(_.getString(2)).toSet == Set("first", "second"))
  }

  test("deeply nested subqueries with set ops and window") {
    val s = newSession()
    val n = s.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT k FROM (
        |    SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 100
        |    UNION ALL
        |    SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 101 AND 200
        |  ) u
        |  WHERE k IN (SELECT o_orderkey FROM orders WHERE o_orderkey <= 150)
        |)""".stripMargin).collect()(0).getLong(0)
    assert(n == 151) // keys 0..150
  }
}
