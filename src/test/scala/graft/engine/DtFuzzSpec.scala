package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized differential fuzz of DYNAMIC TABLE
  * maintenance — the fifth fuzz family (scalar, semi-structured/window,
  * aggregate, join): random defining queries (single-base aggregates
  * with decomposable + sidecar-state functions incl. COUNT(DISTINCT),
  * stateless filters, inner-join aggregates) × random mutation
  * sequences (append INSERTs, file-granular COW UPDATE/DELETE, empty
  * INSERTs, double REFRESH) — after every refresh the materialization
  * must equal a FROM-SCRATCH recompute of the defining query.
  *
  * Unlike the sibling fuzz families the oracle here is the engine
  * itself on the trivially-correct path (full recompute), which is
  * exactly the incremental-view-maintenance contract; the sidecar
  * state, retraction folds, and delta-file selection all hide behind
  * it. Aggregate inputs are decimals/longs so every compare is exact
  * (no float tolerance needed). The spec also asserts the refreshes
  * were not vacuously 'full': a healthy share must pick an incremental
  * mode, or the fuzz stops guarding the machinery it targets.
  */
class DtFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("30+ random DT definitions x mutation sequences: refresh == recompute") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260815").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")

    // dimension: one row per tag, stable across the run
    s.sql("""CREATE OR REPLACE TABLE fzdim AS
      SELECT DISTINCT 'tag_' || (o_custkey % 5)::string AS tag,
        (o_custkey % 5) * 10 AS weight
      FROM orders WHERE o_custkey % 5 >= 0""")

    val aggPool = Seq(
      "count(*) AS n",
      "sum(qty) AS sq",
      "sum(price) AS sp",
      "min(price) AS mn",
      "max(qty) AS mx",
      "avg(price) AS av",
      "count(DISTINCT k % 13) AS cd",
      "sum(price) + 1 AS spp",
      "sum(qty) / nullif(count(*), 0) AS ratio")
    val keyPool = Seq("k % 7", "tag", "k % 3")

    val modes = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    var refreshes = 0

    /** Round-12 directive #5: the recompute oracle above shares the
      * engine's lowering, so a bug common to refresh AND recompute
      * escapes it. At each round's sequence end, render the defining
      * query through DUCKDB over the mutated tables' parquet and compare
      * against the DT materialization. Numeric cells compare with a
      * small tolerance (Spark's decimal AVG rounds at scale+4; DuckDB's
      * is a double); rows align on the first column, unique by
      * construction (a GROUP BY key or the id column). */
    def duckCrossCheck(defSql: String, round: Int): Unit = {
      def path(t: String): String = s.registry.list()
        .find(_.fqn.table.equalsIgnoreCase(t))
        .flatMap(_.path).getOrElse(fail(s"no lake path for $t"))
      val pre =
        s"CREATE VIEW fzdt AS SELECT * FROM read_parquet('${path("fzdt")}/**/*.parquet'); " +
        s"CREATE VIEW fzdim AS SELECT * FROM read_parquet('${path("fzdim")}/**/*.parquet'); "
      val want = DuckOracle.run(Seq("dt" -> (pre + defSql)))("dt") match {
        case Right(rows) => rows
        case Left(err) => fail(s"duckdb oracle failed (seed=$seed " +
          s"round=$round): $err\n sql: $defSql")
      }
      val got = s.sql("SELECT * FROM fzdt_v").collect().toSeq.map(r =>
        (0 until r.length).map(i =>
          if (r.isNullAt(i)) "NULL" else r.get(i).toString).mkString("|"))
      def key(row: String) = row.takeWhile(_ != '|')
      val gotS = got.sortBy(key)
      val wantS = want.sortBy(key)
      assert(gotS.length == wantS.length,
        s"DT vs DuckDB row count ${gotS.length} != ${wantS.length} " +
          s"(seed=$seed round=$round)\n def: $defSql")
      def numEq(a: String, b: String): Boolean =
        (scala.util.Try(BigDecimal(a)).toOption,
         scala.util.Try(BigDecimal(b)).toOption) match {
          case (Some(x), Some(y)) =>
            (x - y).abs <= BigDecimal("0.00001").max(x.abs.max(y.abs) * 1e-9)
          case _ => a == b
        }
      gotS.zip(wantS).foreach { case (g, w) =>
        val (gc, wc) = (g.split("\\|", -1), w.split("\\|", -1))
        assert(gc.length == wc.length && gc.zip(wc).forall {
            case (a, b) => numEq(a, b) },
          s"DT diverged from DuckDB (seed=$seed round=$round)\n def: " +
            s"$defSql\n got:  $g\n want: $w")
      }
    }

    def assertSame(defSql: String, round: Int, step: String): Unit = {
      val got = s.sql("SELECT * FROM fzdt_v").collect()
        .map(_.toString).sorted
      val want = s.sql(defSql).collect().map(_.toString).sorted
      assert(got.sameElements(want),
        s"DT diverged from recompute (seed=$seed round=$round after $step," +
          s" mode=${DynamicTables.lastRefreshMode})\n def: $defSql" +
          s"\n got:  ${got.take(8).mkString(" | ")}" +
          s"\n want: ${want.take(8).mkString(" | ")}")
    }

    for (round <- 1 to 12) {
      // fresh base each round; three disjoint insert windows remain
      s.sql("""CREATE OR REPLACE TABLE fzdt AS
        SELECT o_orderkey AS id, o_custkey AS k,
          o_totalprice::number(12,2) AS price,
          (o_orderkey % 100)::int AS qty,
          'tag_' || (o_custkey % 5)::string AS tag
        FROM orders WHERE o_orderkey <= 1500""")

      val shape = rnd.nextInt(3)
      val retractPlanned = rnd.nextBoolean()
      val defSql = shape match {
        case 0 => // single-base aggregate (sidecar shapes included)
          val key = pick(keyPool)
          // MIN/MAX disqualify retract mode but must stay CORRECT under
          // deletes (degrade to full) — keep them in the pool always
          val aggs = rnd.shuffle(aggPool).take(2 + rnd.nextInt(4))
          s"SELECT ($key) AS g, ${aggs.mkString(", ")} FROM fzdt GROUP BY ($key)"
        case 1 => // stateless filter/project (append mode)
          val pred = pick(Seq("qty > 50", "k % 2 = 0", "price > 100000",
            "tag <> 'tag_3'"))
          s"SELECT id, k, price, qty FROM fzdt WHERE $pred"
        case _ => // inner-join aggregate over (fact, dim)
          val aggs = rnd.shuffle(aggPool.take(6)).take(2 + rnd.nextInt(3))
          "SELECT d.weight AS g, " + aggs.mkString(", ") +
            " FROM fzdt JOIN fzdim d ON fzdt.tag = d.tag GROUP BY d.weight"
      }
      s.sql(s"CREATE OR REPLACE DYNAMIC TABLE fzdt_v TARGET_LAG = '1 minute' AS $defSql")

      val steps = 2 + rnd.nextInt(2)
      var lo = 1500
      for (_ <- 1 to steps) {
        val stepKind = rnd.nextInt(
          if (retractPlanned && shape == 0) 5 else 3)
        val step = stepKind match {
          case 0 | 1 => // append window (possibly empty on the last one)
            val hi = lo + 300 + rnd.nextInt(900)
            val sql = s"""INSERT INTO fzdt
              SELECT o_orderkey, o_custkey, o_totalprice::number(12,2),
                (o_orderkey % 100)::int, 'tag_' || (o_custkey % 5)::string
              FROM orders WHERE o_orderkey > $lo AND o_orderkey <= $hi"""
            lo = hi
            s.sql(sql); s"insert($hi)"
          case 2 => // empty insert → the refresh must no-op correctly
            s.sql("""INSERT INTO fzdt
              SELECT o_orderkey, o_custkey, o_totalprice::number(12,2),
                (o_orderkey % 100)::int, 'tag_' || (o_custkey % 5)::string
              FROM orders WHERE o_orderkey < 0""")
            "insert(empty)"
          case 3 => // COW UPDATE (retract path when state is foldable)
            val m = 3 + rnd.nextInt(9)
            s.sql(s"UPDATE fzdt SET qty = qty + 7 WHERE k % $m = 1")
            s"update(k%$m)"
          case _ => // COW DELETE
            val m = 5 + rnd.nextInt(9)
            s.sql(s"DELETE FROM fzdt WHERE k % $m = 2")
            s"delete(k%$m)"
        }
        s.sql("ALTER DYNAMIC TABLE fzdt_v REFRESH")
        modes(DynamicTables.lastRefreshMode) += 1
        refreshes += 1
        assertSame(defSql, round, step)
        if (rnd.nextInt(4) == 0) { // immediate re-refresh must no-op
          s.sql("ALTER DYNAMIC TABLE fzdt_v REFRESH")
          modes(DynamicTables.lastRefreshMode) += 1
          refreshes += 1
          assertSame(defSql, round, step + "+norefresh")
        }
      }
      duckCrossCheck(defSql, round)
      s.sql("DROP DYNAMIC TABLE fzdt_v")
    }
    val incr = modes.collect {
      case (m, c) if m.startsWith("incremental") || m == "no-op" => c
    }.sum
    // guaranteed minimum: 12 rounds x >=2 steps (double-refresh is a coin)
    assert(refreshes >= 24, s"only $refreshes refreshes exercised")
    // non-vacuity: the incremental machinery (not blanket full-recompute)
    // must carry a healthy share of the refreshes
    assert(incr * 10 >= refreshes * 4,
      s"only $incr/$refreshes refreshes were incremental/no-op — " +
        s"modes=$modes seed=$seed")
    Seq("fzdt", "fzdim").foreach(t => s.sql(s"DROP TABLE $t"))
  }

  /** Randomized coverage of the PUBLISHED sidecar path — the
    * sign-partitioned single-write delta layout (__dtdelta_N/__sign=±1)
    * a downstream DT consumes: random base-DT shapes × random mutation
    * windows, including ones that touch ONLY brand-new groups (empty
    * del side → the __sign=-1 dir exists but holds no files) and
    * update-style windows that touch existing groups (both sides
    * populated). After every downstream refresh the materialization
    * must equal a from-scratch recompute, the refresh must have gone
    * through the dtdelta path (not full), and every delta file read
    * must come from the sign-partitioned layout. */
  test("sidecar chain fuzz: sign-partitioned delta layout feeds downstream") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260818").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")

    var dtdeltaRefreshes = 0
    for (round <- 1 to 6) {
      s.sql("""CREATE OR REPLACE TABLE fzct AS
        SELECT o_orderkey AS id, o_custkey AS k,
          o_totalprice::number(12,2) AS price
        FROM orders WHERE o_orderkey <= 1200""")
      // base DT: grouped aggregate (merge-refreshes and publishes)
      val grp = pick(Seq("k % 9", "k % 4", "k % 13"))
      s.sql(s"""CREATE OR REPLACE DYNAMIC TABLE fzca TARGET_LAG = '1 minute'
        AS SELECT ($grp) AS g, count(*) AS n, sum(price) AS total
        FROM fzct GROUP BY ($grp)""")
      // downstream: retractable aggregate OVER the base DT — consumes
      // the published signed delta
      val down = pick(Seq(
        "SELECT g % 3 AS gg, sum(n) AS sn, sum(total) AS st FROM fzca GROUP BY g % 3",
        "SELECT g % 2 AS gg, count(*) AS c, sum(n) AS sn FROM fzca GROUP BY g % 2"))
      s.sql(s"CREATE OR REPLACE DYNAMIC TABLE fzcb TARGET_LAG = '1 minute' AS $down")

      var lo = 1200
      for (step <- 1 to 2 + rnd.nextInt(2)) {
        rnd.nextInt(3) match {
          case 0 => // window over fresh ids: touched groups are a mix
            val hi = lo + 200 + rnd.nextInt(600)
            s.sql(s"""INSERT INTO fzct
              SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
              FROM orders WHERE o_orderkey > $lo AND o_orderkey <= $hi""")
            lo = hi
          case 1 => // brand-new group values only → empty del side
            s.sql(s"""INSERT INTO fzct
              SELECT id + 1000000, k + ${1000 * step * round}, price
              FROM fzct WHERE id <= 1205""")
          case _ => // empty window → no-op refreshes downstream
            s.sql("INSERT INTO fzct SELECT id, k, price FROM fzct WHERE id < 0")
        }
        s.sql("ALTER DYNAMIC TABLE fzca REFRESH")
        assert(DynamicTables.lastRefreshMode.startsWith("incremental") ||
          DynamicTables.lastRefreshMode == "no-op",
          s"base mode=${DynamicTables.lastRefreshMode} seed=$seed round=$round")
        s.sql("ALTER DYNAMIC TABLE fzcb REFRESH")
        val mode = DynamicTables.lastRefreshMode
        if (mode.startsWith("incremental-dtdelta")) {
          dtdeltaRefreshes += 1
          assert(DynamicTables.lastDeltaFiles.forall(p =>
            p.contains("__dtdelta_") && p.contains("__sign=")),
            s"delta files outside the sign-partitioned layout: " +
              DynamicTables.lastDeltaFiles.toString)
        }
        val got = s.sql("SELECT * FROM fzcb").collect().map(_.toString).sorted
        val want = s.sql(down.replace("fzca",
          s"(SELECT ($grp) AS g, count(*) AS n, sum(price) AS total " +
            s"FROM fzct GROUP BY ($grp))")).collect().map(_.toString).sorted
        assert(got.sameElements(want),
          s"downstream diverged (seed=$seed round=$round step=$step " +
            s"mode=$mode)\n got:  ${got.take(6).mkString(" | ")}" +
            s"\n want: ${want.take(6).mkString(" | ")}")
      }
      s.sql("DROP DYNAMIC TABLE fzcb"); s.sql("DROP DYNAMIC TABLE fzca")
    }
    assert(dtdeltaRefreshes >= 6,
      s"only $dtdeltaRefreshes downstream refreshes used the dtdelta " +
        "path - the fuzz stopped guarding the sidecar layout")
    s.sql("DROP TABLE fzct")
  }
}
