package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized DIFFERENTIAL fuzz of the JOIN surface — the
  * fourth fuzz family (after scalar, semi-structured/window, aggregate):
  * inner/left/right/full × equi/equi+theta conditions × NULL-bearing
  * keys × EQUAL_NULL × semi/anti (EXISTS / NOT EXISTS on the snow side
  * vs native LEFT SEMI / LEFT ANTI JOIN) × ASOF in all four
  * MATCH_CONDITION orientations (>=, >, <=, <, both inner and LEFT) ×
  * bucketed-vs-plain storage (CLUSTER BY … INTO n BUCKETS copies must
  * join identically to the plain tables).
  *
  * Protocol as in the sibling specs: each case is a PAIR — snow dialect
  * through GraftSession vs an independently hand-written Spark-native
  * rendering (ASOF renders as join + ROW_NUMBER pick, the documented
  * semantics, NOT the engine's union+window lowering — so the two sides
  * share no code path). Join outputs are compared through checksum
  * aggregates grouped by a small key (COUNT, SUMs of both sides' values
  * and id products — any row-set difference moves at least one), which
  * keeps collects small while staying sensitive. Determinism: right-side
  * (k, ts) pairs are unique, so every ASOF pick is unambiguous.
  */
class JoinFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sameVal(gv: Any, wv: Any): Boolean = (gv, wv) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (a: Double, b: Double) =>
      (a.isNaN && b.isNaN) || math.abs(a - b) <=
        1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
      a.compareTo(b) == 0
    case (a, b) => a == b
  }

  /** Checksum select list over a joined pair aliased l/r. Any row-set
    * difference (missing, duplicated, mis-joined row) moves ≥1 column. */
  private val checksums = Seq(
    "COUNT(*)",
    "COUNT(r.rid)",
    "SUM(l.vl)",
    "SUM(r.vr)",
    "SUM(l.uid * COALESCE(r.rid, -1))")

  test("300+ join-surface cases agree with hand-translated Spark SQL") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260815").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")
    // left: NULL-bearing key k, unique uid doubling as the ASOF time
    s.sql("""CREATE OR REPLACE TABLE fzl AS SELECT
      o_orderkey AS uid,
      CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey % 120 END AS k,
      o_custkey % 5 AS c,
      o_totalprice::double AS vl,
      o_orderkey AS ts
      FROM orders WHERE o_orderkey <= 1200""")
    // right: sparser (every 3rd key), its own NULL pattern, unique rid =
    // unique ts ⇒ (k, ts) unique ⇒ ASOF picks are deterministic
    s.sql("""CREATE OR REPLACE TABLE fzr AS SELECT
      o_orderkey AS rid,
      CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_custkey % 120 END AS k,
      o_totalprice::double / 2 AS vr,
      o_orderkey AS ts
      FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey <= 2400""")
    val lDf = s.sql("SELECT * FROM fzl").localCheckpoint()
    val rDf = s.sql("SELECT * FROM fzr").localCheckpoint()
    lDf.createOrReplaceTempView("fzl_native")
    rDf.createOrReplaceTempView("fzr_native")

    def run(snowQ: String, sparkQ: String, label: String): Int = {
      val got = s.sql(snowQ).collect()
      val want = lDf.sparkSession.sql(sparkQ).collect()
      assert(got.length == want.length,
        s"row count ${got.length} vs ${want.length} [$label] seed=$seed" +
          s"\n snow:  $snowQ\n spark: $sparkQ")
      var checked = 0
      got.zip(want).foreach { case (g, w) =>
        (0 until w.length).foreach { ci =>
          assert(sameVal(g.get(ci), w.get(ci)),
            s"[$label] seed=$seed col=$ci\n got=${g.get(ci)} want=${w.get(ci)}" +
              s"\n snow:  $snowQ\n spark: $sparkQ")
        }
        checked += w.length
      }
      math.max(checked, want.headOption.map(_.length).getOrElse(0))
    }

    var cases = 0

    // ── family 1: inner/left/right/full × condition shapes ─────────────
    val joinTypes = Seq("JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN")
    val conds = Seq[(String, String)](
      ("l.k = r.k", "l.k = r.k"),
      ("l.k = r.k AND l.vl < r.vr * 3", "l.k = r.k AND l.vl < r.vr * 3"),
      ("l.k = r.k AND r.rid % 2 = 0", "l.k = r.k AND r.rid % 2 = 0"),
      // NULL-safe equality: NULL keys MATCH each other here
      ("EQUAL_NULL(l.k, r.k) AND l.c = r.rid % 5",
        "l.k <=> r.k AND l.c = r.rid % 5"),
      ("l.k = r.k AND l.ts <> r.ts", "l.k = r.k AND l.ts <> r.ts"))
    for (_ <- 1 to 14) {
      val jt = pick(joinTypes)
      val (cs, cn) = pick(conds)
      val snowQ =
        s"""SELECT l.c AS g, ${checksums.mkString(", ")}
           FROM fzl l $jt fzr r ON $cs GROUP BY 1 ORDER BY g"""
      val sparkQ =
        s"""SELECT l.c AS g, ${checksums.mkString(", ")}
           FROM fzl_native l $jt fzr_native r ON $cn
           GROUP BY 1 ORDER BY g NULLS LAST"""
      // RIGHT/FULL: unmatched right rows have NULL l.c → group lands in
      // the NULL-g row, both sides identically. The engine sorts NULLs
      // HIGHEST (Snowflake default) — stated explicitly Spark-side.
      cases += run(snowQ, sparkQ, s"$jt/$cs")
    }

    // ── family 2: semi / anti (EXISTS on the snow side) ────────────────
    for (_ <- 1 to 8) {
      val neg = rnd.nextBoolean()
      val extra = pick(Seq("", " AND r.vr > l.vl / 4", " AND r.rid % 2 = 0"))
      val ex = if (neg) "NOT EXISTS" else "EXISTS"
      val jt = if (neg) "LEFT ANTI JOIN" else "LEFT SEMI JOIN"
      val snowQ =
        s"""SELECT l.c AS g, COUNT(*), SUM(l.vl), SUM(l.uid)
           FROM fzl l WHERE $ex (
             SELECT 1 FROM fzr r WHERE r.k = l.k$extra)
           GROUP BY 1 ORDER BY g"""
      val sparkQ =
        s"""SELECT l.c AS g, COUNT(*), SUM(l.vl), SUM(l.uid)
           FROM fzl_native l $jt fzr_native r ON r.k = l.k$extra
           GROUP BY 1 ORDER BY g NULLS LAST"""
      cases += run(snowQ, sparkQ, s"$ex$extra")
    }

    // ── family 3: ASOF, all four orientations × inner/LEFT ─────────────
    // native rendering: candidate join + ROW_NUMBER pick (the documented
    // semantics — most recent at-or-before / first at-or-after)
    for (_ <- 1 to 10) {
      val outer = rnd.nextBoolean()
      val (cmp, ord) = pick(Seq(
        (">=", "DESC"), (">", "DESC"), ("<=", "ASC"), ("<", "ASC")))
      val aj = if (outer) "ASOF LEFT JOIN" else "ASOF JOIN"
      val nj = if (outer) "LEFT JOIN" else "JOIN"
      val flip = Map(">=" -> "<=", ">" -> "<", "<=" -> ">=", "<" -> ">")
      // single- or multi-column ON equality (verified correct by
      // AsofMultiKeyChk; the emitter re-binds every key)
      val (onSnow, onSpark) =
        if (rnd.nextBoolean()) ("l.k = r.k", "l.k = r.k")
        else ("l.k = r.k AND l.c = r.rid % 5",
          "l.k = r.k AND l.c = r.rid % 5")
      val snowQ =
        s"""SELECT l.c AS g, COUNT(*), COUNT(r.rid), SUM(l.vl),
             SUM(COALESCE(r.vr, 0)), SUM(l.uid * COALESCE(r.rid, -1))
           FROM fzl l $aj fzr r MATCH_CONDITION(l.ts $cmp r.ts)
             ON $onSnow
           GROUP BY 1 ORDER BY g"""
      val sparkQ =
        s"""SELECT g, COUNT(*), COUNT(rid), SUM(vl), SUM(COALESCE(vr, 0)),
             SUM(uid * COALESCE(rid, -1))
           FROM (
             SELECT l.c AS g, l.vl, l.uid, r.rid, r.vr,
               ROW_NUMBER() OVER (PARTITION BY l.uid
                 ORDER BY r.ts $ord NULLS LAST) AS rn
             FROM fzl_native l $nj fzr_native r
               ON $onSpark AND r.ts ${flip(cmp)} l.ts)
           WHERE rn = 1 GROUP BY 1 ORDER BY g NULLS LAST"""
      cases += run(snowQ, sparkQ, s"$aj $cmp ON $onSnow")
    }

    // ── family 4: bucketed-vs-plain (CLUSTER BY storage lifecycle) ─────
    s.sql("""CREATE OR REPLACE TABLE fzl_b CLUSTER BY (k) INTO 4 BUCKETS
      AS SELECT * FROM fzl""")
    s.sql("""CREATE OR REPLACE TABLE fzr_b CLUSTER BY (k) INTO 4 BUCKETS
      AS SELECT * FROM fzr""")
    for (_ <- 1 to 4) {
      val jt = pick(joinTypes)
      val (cs, _) = conds(rnd.nextInt(3)) // equi-rooted shapes
      def q(lt: String, rt: String) =
        s"""SELECT l.c AS g, ${checksums.mkString(", ")}
           FROM $lt l $jt $rt r ON $cs GROUP BY 1 ORDER BY g"""
      val plain = s.sql(q("fzl", "fzr")).collect()
      val bucketed = s.sql(q("fzl_b", "fzr_b")).collect()
      assert(plain.length == bucketed.length, s"bucketed $jt/$cs seed=$seed")
      plain.zip(bucketed).foreach { case (p, b) =>
        (0 until p.length).foreach { ci =>
          assert(sameVal(p.get(ci), b.get(ci)),
            s"bucketed-vs-plain [$jt/$cs] seed=$seed col=$ci" +
              s"\n plain=${p.get(ci)} bucketed=${b.get(ci)}")
        }
      }
      cases += plain.length * plain.headOption.map(_.length).getOrElse(0)
    }

    assert(cases >= 300, s"only $cases cases compared")
    Seq("fzl", "fzr", "fzl_b", "fzr_b").foreach(t => s.sql(s"DROP TABLE $t"))
  }
}
