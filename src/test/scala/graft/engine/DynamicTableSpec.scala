package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** DYNAMIC TABLE lifecycle: create-materializes, refresh picks the
  * cheapest sound mode per refresh (no-op / incremental-append /
  * incremental-merge / full), incremental refreshes read ONLY the delta
  * files, deletes degrade exactly one refresh to full, and the
  * materialization always equals a from-scratch recompute. */
class DynamicTableSpec extends AnyFunSuite {

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

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      s"dynamic table diverged from recompute:\n got=${got.collect().toSeq}\nwant=${want.collect().toSeq}")
  }

  test("aggregate DT: incremental-merge refresh equals full recompute") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_base AS
      SELECT o_custkey AS k, o_totalprice::number(12,2) AS price
      FROM orders WHERE o_orderkey <= 4000""")
    s.sql("""CREATE DYNAMIC TABLE dyn_agg TARGET_LAG = '1 minute' AS
      SELECT k, count(*) AS n, sum(price) AS total, max(price) AS hi
      FROM dyn_base GROUP BY k""")
    s.sql("""INSERT INTO dyn_base
      SELECT o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 8000""")
    s.sql("ALTER DYNAMIC TABLE dyn_agg REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assert(DynamicTables.lastDeltaFiles.nonEmpty)
    assertSame(
      s.sql("SELECT * FROM dyn_agg"),
      s.sql("SELECT k, count(*) AS n, sum(price) AS total, max(price) AS hi FROM dyn_base GROUP BY k"))
    // schema must not drift across merge refreshes (decimal SUM widens)
    val sch1 = s.sql("SELECT * FROM dyn_agg").schema
    s.sql("INSERT INTO dyn_base SELECT o_custkey, o_totalprice::number(12,2) FROM orders WHERE o_orderkey > 8000 AND o_orderkey <= 9000")
    s.sql("ALTER DYNAMIC TABLE dyn_agg REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assert(s.sql("SELECT * FROM dyn_agg").schema == sch1)
    assertSame(
      s.sql("SELECT * FROM dyn_agg"),
      s.sql("SELECT k, count(*) AS n, sum(price) AS total, max(price) AS hi FROM dyn_base GROUP BY k"))
  }

  test("incremental refresh reads ONLY the files the INSERT added") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_b2 AS
      SELECT n_nationkey AS k, n_name AS name FROM nation""")
    s.sql("""CREATE DYNAMIC TABLE dyn_a2 AS
      SELECT name, count(*) AS n FROM dyn_b2 GROUP BY name""")
    s.sql("INSERT INTO dyn_b2 SELECT n_nationkey + 100, n_name FROM nation WHERE n_nationkey < 5")
    s.sql("ALTER DYNAMIC TABLE dyn_a2 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    // the delta file set is exactly the second write's files: a strict
    // subset of the base directory (the O(delta) refresh contract)
    val deltaFiles = DynamicTables.lastDeltaFiles.toSet
    val dir = java.nio.file.Paths.get(deltaFiles.head).getParent
    val all = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filterNot(p => { val n = java.nio.file.Paths.get(p).getFileName.toString
        n.startsWith("_") || n.startsWith(".") }).toSet
    assert(deltaFiles.subsetOf(all) && deltaFiles.size < all.size)
  }

  test("stateless DT: incremental-append; unchanged base: no-op") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_b3 AS
      SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS st
      FROM orders WHERE o_orderkey <= 500""")
    s.sql("""CREATE DYNAMIC TABLE dyn_f3 AS
      SELECT k, price * 2 AS p2 FROM dyn_b3 WHERE st = 'O'""")
    s.sql("ALTER DYNAMIC TABLE dyn_f3 REFRESH")
    assert(DynamicTables.lastRefreshMode == "no-op")
    s.sql("""INSERT INTO dyn_b3
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000""")
    s.sql("ALTER DYNAMIC TABLE dyn_f3 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-append")
    assertSame(
      s.sql("SELECT * FROM dyn_f3"),
      s.sql("SELECT k, price * 2 AS p2 FROM dyn_b3 WHERE st = 'O'"))
  }

  test("agg-over-join DT: fact append refreshes as incremental-join-merge") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_b4 AS
      SELECT n_nationkey AS k, n_regionkey AS rk FROM nation""")
    s.sql("""CREATE DYNAMIC TABLE dyn_j4 AS
      SELECT r.r_name AS region, count(*) AS n
      FROM dyn_b4 b JOIN region r ON b.rk = r.r_regionkey
      GROUP BY r.r_name""")
    s.sql("INSERT INTO dyn_b4 SELECT n_nationkey + 50, n_regionkey FROM nation")
    s.sql("ALTER DYNAMIC TABLE dyn_j4 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-merge")
    // the delta is the fact INSERT's files only — the dimension (region)
    // gained nothing and the old fact files are not in the delta set
    assert(DynamicTables.lastDeltaFiles.nonEmpty &&
      DynamicTables.lastDeltaFiles.forall(_.toUpperCase.contains("DYN_B4")))
    assertSame(
      s.sql("SELECT * FROM dyn_j4"),
      s.sql("""SELECT r.r_name AS region, count(*) AS n
        FROM dyn_b4 b JOIN region r ON b.rk = r.r_regionkey GROUP BY r.r_name"""))
  }

  test("stateless join DT: incremental-join-append; both-side appends stay exact") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_jf AS
      SELECT n_nationkey AS k, n_regionkey AS rk FROM nation WHERE n_nationkey < 20""")
    s.sql("""CREATE OR REPLACE TABLE dyn_jd AS
      SELECT r_regionkey AS rk, r_name AS rname FROM region WHERE r_regionkey < 4""")
    s.sql("""CREATE DYNAMIC TABLE dyn_jv AS
      SELECT f.k, d.rname FROM dyn_jf f JOIN dyn_jd d ON f.rk = d.rk""")
    def recompute() = s.sql(
      "SELECT f.k, d.rname FROM dyn_jf f JOIN dyn_jd d ON f.rk = d.rk")
    // fact-side append only
    s.sql("INSERT INTO dyn_jf SELECT n_nationkey + 100, n_regionkey FROM nation")
    s.sql("ALTER DYNAMIC TABLE dyn_jv REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-append")
    assertSame(s.sql("SELECT * FROM dyn_jv"), recompute())
    // BOTH sides append: Q(Δf, d_new) ∪ Q(f_old, Δd) — new fact rows join
    // the NEW dim rows too, and old fact rows pick up the new dim matches
    s.sql("INSERT INTO dyn_jf SELECT n_nationkey + 200, 4 FROM nation WHERE n_nationkey < 3")
    s.sql("INSERT INTO dyn_jd SELECT 4, 'NEWREGION'")
    s.sql("ALTER DYNAMIC TABLE dyn_jv REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-append")
    assertSame(s.sql("SELECT * FROM dyn_jv"), recompute())
    // dim-side-only append still incremental
    s.sql("INSERT INTO dyn_jd SELECT 5, 'R5'")
    s.sql("ALTER DYNAMIC TABLE dyn_jv REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-append")
    assertSame(s.sql("SELECT * FROM dyn_jv"), recompute())
  }

  test("join DT: DELETE on a base degrades ONE refresh to full, then resumes") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_jf2 AS
      SELECT n_nationkey AS k, n_regionkey AS rk FROM nation""")
    s.sql("""CREATE DYNAMIC TABLE dyn_jv2 AS
      SELECT r.r_name AS region, sum(f.k) AS total
      FROM dyn_jf2 f JOIN region r ON f.rk = r.r_regionkey
      GROUP BY r.r_name""")
    def recompute() = s.sql("""SELECT r.r_name AS region, sum(f.k) AS total
      FROM dyn_jf2 f JOIN region r ON f.rk = r.r_regionkey GROUP BY r.r_name""")
    s.sql("DELETE FROM dyn_jf2 WHERE k % 3 = 0")
    s.sql("ALTER DYNAMIC TABLE dyn_jv2 REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    assertSame(s.sql("SELECT * FROM dyn_jv2"), recompute())
    s.sql("INSERT INTO dyn_jf2 SELECT n_nationkey + 300, n_regionkey FROM nation WHERE n_nationkey < 5")
    s.sql("ALTER DYNAMIC TABLE dyn_jv2 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-merge")
    assertSame(s.sql("SELECT * FROM dyn_jv2"), recompute())
  }

  test("outer joins are not claimed incremental") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_jf3 AS SELECT n_nationkey AS k, n_regionkey AS rk FROM nation")
    // LEFT JOIN retracts its NULL-extension when a match appears — full
    s.sql("""CREATE DYNAMIC TABLE dyn_jl AS
      SELECT f.k, r.r_name FROM dyn_jf3 f LEFT JOIN region r ON f.rk = r.r_regionkey""")
    s.sql("INSERT INTO dyn_jf3 SELECT n_nationkey + 400, n_regionkey FROM nation WHERE n_nationkey < 3")
    s.sql("ALTER DYNAMIC TABLE dyn_jl REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    assertSame(
      s.sql("SELECT * FROM dyn_jl"),
      s.sql("SELECT f.k, r.r_name FROM dyn_jf3 f LEFT JOIN region r ON f.rk = r.r_regionkey"))
  }

  test("3-base join DT: telescoped incremental refresh, delta-only fact reads") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_f3 AS SELECT n_nationkey AS k, n_regionkey AS rk FROM nation")
    s.sql("CREATE OR REPLACE TABLE dyn_d3a AS SELECT r_regionkey, r_name FROM region")
    s.sql("CREATE OR REPLACE TABLE dyn_d3b AS SELECT n_nationkey, n_name FROM nation")
    def fullSql =
      """SELECT r.r_name, count(*) AS n, sum(f.k) AS sk FROM dyn_f3 f
         JOIN dyn_d3a r ON f.rk = r.r_regionkey
         JOIN dyn_d3b n ON f.k = n.n_nationkey
         GROUP BY r.r_name"""
    s.sql(s"CREATE DYNAMIC TABLE dyn_t3 AS $fullSql")
    // fact-side append → incremental-join-merge over the 3-base tree
    s.sql("INSERT INTO dyn_f3 SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey < 3")
    s.sql("ALTER DYNAMIC TABLE dyn_t3 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-merge",
      s"got ${DynamicTables.lastRefreshMode}")
    // the delta read was ONLY the appended fact files
    assert(DynamicTables.lastDeltaFiles.nonEmpty)
    assert(DynamicTables.lastDeltaFiles.forall(_.toUpperCase.contains("DYN_F3")),
      s"delta read non-fact files: ${DynamicTables.lastDeltaFiles}")
    assertSame(s.sql("SELECT * FROM dyn_t3"), s.sql(fullSql))
    // appends on MULTIPLE bases in one interval telescope exactly
    s.sql("INSERT INTO dyn_f3 VALUES (90, 0)")
    s.sql("INSERT INTO dyn_d3b VALUES (90, 'NEWLAND')")
    s.sql("ALTER DYNAMIC TABLE dyn_t3 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-merge")
    assertSame(s.sql("SELECT * FROM dyn_t3"), s.sql(fullSql))
    // stateless 3-base variant appends
    s.sql("""CREATE DYNAMIC TABLE dyn_t3s AS
      SELECT f.k, r.r_name, n.n_name FROM dyn_f3 f
      JOIN dyn_d3a r ON f.rk = r.r_regionkey
      JOIN dyn_d3b n ON f.k = n.n_nationkey""")
    s.sql("INSERT INTO dyn_f3 VALUES (91, 1)")
    s.sql("INSERT INTO dyn_d3b VALUES (91, 'NEWLAND2')")
    s.sql("ALTER DYNAMIC TABLE dyn_t3s REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-append")
    assertSame(
      s.sql("SELECT * FROM dyn_t3s"),
      s.sql("""SELECT f.k, r.r_name, n.n_name FROM dyn_f3 f
               JOIN dyn_d3a r ON f.rk = r.r_regionkey
               JOIN dyn_d3b n ON f.k = n.n_nationkey"""))
  }

  test("DT over DT with a join stays incremental off an append-mode parent") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_src AS SELECT n_nationkey AS k, n_regionkey AS rk FROM nation")
    // parent: stateless transform → refresh appends in place
    s.sql("CREATE DYNAMIC TABLE dyn_par AS SELECT k, rk FROM dyn_src WHERE k % 2 = 0")
    // child: join of the parent DT with a dimension table
    def childSql =
      """SELECT r.r_name, count(*) AS n FROM dyn_par p
         JOIN region r ON p.rk = r.r_regionkey GROUP BY r.r_name"""
    s.sql(s"CREATE DYNAMIC TABLE dyn_chi AS $childSql")
    s.sql("INSERT INTO dyn_src SELECT n_nationkey + 700, n_regionkey FROM nation WHERE n_nationkey < 4")
    s.sql("ALTER DYNAMIC TABLE dyn_par REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-append")
    s.sql("ALTER DYNAMIC TABLE dyn_chi REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-merge",
      s"got ${DynamicTables.lastRefreshMode}")
    assert(DynamicTables.lastDeltaFiles.forall(_.toUpperCase.contains("DYN_PAR")),
      s"delta read non-parent files: ${DynamicTables.lastDeltaFiles}")
    assertSame(s.sql("SELECT * FROM dyn_chi"), s.sql(childSql))
  }

  test("self-join over one base is not claimed incremental") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_sj AS SELECT n_nationkey AS k, n_regionkey AS rk FROM nation")
    s.sql("""CREATE DYNAMIC TABLE dyn_sjv AS
      SELECT a.k AS ak, b.k AS bk FROM dyn_sj a JOIN dyn_sj b ON a.rk = b.rk""")
    s.sql("INSERT INTO dyn_sj SELECT n_nationkey + 600, n_regionkey FROM nation WHERE n_nationkey < 2")
    s.sql("ALTER DYNAMIC TABLE dyn_sjv REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    assertSame(
      s.sql("SELECT * FROM dyn_sjv"),
      s.sql("SELECT a.k AS ak, b.k AS bk FROM dyn_sj a JOIN dyn_sj b ON a.rk = b.rk"))
  }

  test("DELETE on the base degrades ONE refresh to full, then resumes incremental") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_b5 AS
      SELECT n_nationkey AS k, n_regionkey AS rk FROM nation""")
    s.sql("""CREATE DYNAMIC TABLE dyn_a5 AS
      SELECT rk, count(*) AS n, min(k) AS lo FROM dyn_b5 GROUP BY rk""")
    s.sql("DELETE FROM dyn_b5 WHERE k % 2 = 0")
    s.sql("ALTER DYNAMIC TABLE dyn_a5 REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    assertSame(
      s.sql("SELECT * FROM dyn_a5"),
      s.sql("SELECT rk, count(*) AS n, min(k) AS lo FROM dyn_b5 GROUP BY rk"))
    s.sql("INSERT INTO dyn_b5 SELECT n_nationkey + 200, n_regionkey FROM nation WHERE n_nationkey < 4")
    s.sql("ALTER DYNAMIC TABLE dyn_a5 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assertSame(
      s.sql("SELECT * FROM dyn_a5"),
      s.sql("SELECT rk, count(*) AS n, min(k) AS lo FROM dyn_b5 GROUP BY rk"))
  }

  test("REFRESH_MODE = FULL opts out of incremental maintenance") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_b6 AS SELECT n_nationkey AS k FROM nation")
    s.sql("""CREATE DYNAMIC TABLE dyn_a6 REFRESH_MODE = FULL AS
      SELECT count(*) AS n FROM dyn_b6""")
    s.sql("INSERT INTO dyn_b6 SELECT n_nationkey + 30 FROM nation")
    s.sql("ALTER DYNAMIC TABLE dyn_a6 REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    assert(s.sql("SELECT * FROM dyn_a6").collect()(0).getLong(0) == 50)
  }

  test("DT over DT: downstream refresh is incremental off an in-place append") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_b7 AS
      SELECT o_orderkey AS k, o_custkey AS ck, o_totalprice AS price
      FROM orders WHERE o_orderkey <= 500""")
    // dt1 stateless → refresh APPENDS in place → dt2 sees a pure append
    s.sql("CREATE DYNAMIC TABLE dyn_d7a AS SELECT ck, price FROM dyn_b7 WHERE price > 1000")
    s.sql("CREATE DYNAMIC TABLE dyn_d7b AS SELECT ck, count(*) AS n FROM dyn_d7a GROUP BY ck")
    s.sql("""INSERT INTO dyn_b7 SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000""")
    s.sql("ALTER DYNAMIC TABLE dyn_d7a REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-append")
    s.sql("ALTER DYNAMIC TABLE dyn_d7b REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assertSame(
      s.sql("SELECT * FROM dyn_d7b"),
      s.sql("SELECT ck, count(*) AS n FROM dyn_b7 WHERE price > 1000 GROUP BY ck"))
  }

  test("guards: no INSERT into a DT; DROP DYNAMIC TABLE; SHOW DYNAMIC TABLES") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_b8 AS SELECT n_nationkey AS k FROM nation")
    s.sql("CREATE DYNAMIC TABLE dyn_a8 AS SELECT count(*) AS n FROM dyn_b8")
    val e = intercept[IllegalArgumentException] {
      s.sql("INSERT INTO dyn_a8 SELECT 1")
    }
    assert(e.getMessage.contains("dynamic table"))
    val shown = s.sql("SHOW DYNAMIC TABLES").collect()
    assert(shown.exists(r => r.getString(0) == "DYN_A8" &&
      r.getString(3).startsWith("INCREMENTAL")))
    s.sql("DROP DYNAMIC TABLE dyn_a8")
    intercept[Exception] { s.sql("SELECT * FROM dyn_a8").collect() }
    intercept[IllegalArgumentException] { s.sql("ALTER DYNAMIC TABLE dyn_a8 REFRESH") }
  }

  test("COUNT(DISTINCT) DT refreshes incrementally through the keyed state") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_b9 AS SELECT n_nationkey AS k, n_regionkey AS rk FROM nation")
    s.sql("CREATE DYNAMIC TABLE dyn_a9 AS SELECT rk, count(DISTINCT k) AS a FROM dyn_b9 GROUP BY rk")
    // overlapping distinct values: half the inserted keys already exist
    s.sql("INSERT INTO dyn_b9 SELECT CASE WHEN n_nationkey % 2 = 0 THEN n_nationkey ELSE n_nationkey + 25 END, n_regionkey FROM nation")
    s.sql("ALTER DYNAMIC TABLE dyn_a9 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge",
      DynamicTables.lastRefreshMode)
    assertSame(
      s.sql("SELECT * FROM dyn_a9"),
      s.sql("SELECT rk, count(DISTINCT k) AS a FROM dyn_b9 GROUP BY rk"))
  }

  test("COUNT(DISTINCT) mixed with SUM/AVG: append merges, granular DELETE retracts") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_db AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 500""")
    s.sql("""INSERT INTO dyn_db
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE dyn_dcd AS
      SELECT c % 10 AS g, count(DISTINCT c) AS dc, count(*) AS n,
        sum(p) AS total, avg(p) AS ap
      FROM dyn_db GROUP BY 1""")
    def want = s.sql("""SELECT c % 10 AS g, count(DISTINCT c) AS dc,
      count(*) AS n, sum(p) AS total, avg(p) AS ap FROM dyn_db GROUP BY 1""")
    assertSame(s.sql("SELECT * FROM dyn_dcd"), want)
    // append → state merge at (g, c) granularity
    s.sql("""INSERT INTO dyn_db
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 1500""")
    s.sql("ALTER DYNAMIC TABLE dyn_dcd REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM dyn_dcd"), want)
    // granular DELETE → ±fold retraction; distinct counts must drop
    // where a custkey's last order in the span is removed
    s.sql("DELETE FROM dyn_db WHERE k > 500 AND k <= 900")
    s.sql("ALTER DYNAMIC TABLE dyn_dcd REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-retract-merge",
      DynamicTables.lastRefreshMode)
    assert(DynamicTables.lastDeltaFiles.nonEmpty &&
      DynamicTables.lastDeltaFiles.forall(!_.contains("/data/s1/")),
      DynamicTables.lastDeltaFiles.toString)
    assertSame(s.sql("SELECT * FROM dyn_dcd"), want)
  }

  test("COUNT(DISTINCT) with HAVING filters over the re-aggregated state") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_dh AS
      SELECT o_custkey AS c, o_orderpriority AS pr
      FROM orders WHERE o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE dyn_dhd AS
      SELECT pr, count(DISTINCT c) AS dc FROM dyn_dh GROUP BY pr
      HAVING count(DISTINCT c) > 50""")
    def want = s.sql("""SELECT pr, count(DISTINCT c) AS dc FROM dyn_dh
      GROUP BY pr HAVING count(DISTINCT c) > 50""")
    assertSame(s.sql("SELECT * FROM dyn_dhd"), want)
    s.sql("""INSERT INTO dyn_dh
      SELECT o_custkey, o_orderpriority
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000""")
    s.sql("ALTER DYNAMIC TABLE dyn_dhd REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM dyn_dhd"), want)
  }

  test("multi-column and multiple COUNT(DISTINCT) stay exact across DML") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_dm AS
      SELECT o_orderkey AS k, o_custkey AS c, o_orderpriority AS pr,
        o_orderstatus AS st FROM orders WHERE o_orderkey <= 800""")
    s.sql("""CREATE DYNAMIC TABLE dyn_dmd AS
      SELECT st, count(DISTINCT c) AS dc, count(DISTINCT c, pr) AS dcp,
        count(*) AS n
      FROM dyn_dm GROUP BY st""")
    def want = s.sql("""SELECT st, count(DISTINCT c) AS dc,
      count(DISTINCT c, pr) AS dcp, count(*) AS n FROM dyn_dm GROUP BY st""")
    s.sql("""INSERT INTO dyn_dm
      SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus
      FROM orders WHERE o_orderkey > 800 AND o_orderkey <= 1600""")
    s.sql("ALTER DYNAMIC TABLE dyn_dmd REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM dyn_dmd"), want)
    s.sql("DELETE FROM dyn_dm WHERE k % 5 = 0 AND k > 800")
    s.sql("ALTER DYNAMIC TABLE dyn_dmd REFRESH")
    assert(DynamicTables.lastRefreshMode.startsWith("incremental"),
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM dyn_dmd"), want)
  }

  test("fuzz: random granular DML keeps a COUNT(DISTINCT) DT exact") {
    val s = newSession()
    val rnd = new scala.util.Random(0xD157)
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_df AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 400""")
    s.sql("""CREATE DYNAMIC TABLE dyn_dfd AS
      SELECT c % 7 AS g, count(DISTINCT c) AS dc, sum(p) AS total
      FROM dyn_df GROUP BY 1""")
    def want = s.sql("""SELECT c % 7 AS g, count(DISTINCT c) AS dc,
      sum(p) AS total FROM dyn_df GROUP BY 1""")
    var lo = 400
    val modes = scala.collection.mutable.Set.empty[String]
    for (round <- 1 to 6) {
      rnd.nextInt(3) match {
        case 0 =>
          s.sql(s"""INSERT INTO dyn_df
            SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
            FROM orders WHERE o_orderkey > $lo AND o_orderkey <= ${lo + 300}""")
          lo += 300
        case 1 =>
          val m = 2 + rnd.nextInt(5)
          s.sql(s"DELETE FROM dyn_df WHERE k % $m = 1 AND k > ${rnd.nextInt(lo)}")
        case 2 =>
          val m = 2 + rnd.nextInt(4)
          s.sql(s"UPDATE dyn_df SET c = c + 1 WHERE k % $m = 0")
      }
      s.sql("ALTER DYNAMIC TABLE dyn_dfd REFRESH")
      modes += DynamicTables.lastRefreshMode
      assertSame(s.sql("SELECT * FROM dyn_dfd"), want)
    }
    // coverage: the sequence must actually exercise incremental paths
    assert(modes.exists(_.startsWith("incremental")), modes.toString)
  }

  test("AVG DT: incremental-merge through the sum/count state sidecar") {
    val s = newSession()
    // decimal column: partial sums are exact, so the state-merged AVG is
    // bit-identical to the recompute (no FP-associativity slack needed)
    s.sql("""CREATE OR REPLACE TABLE dyn_b10 AS
      SELECT o_custkey AS k, o_totalprice::number(12,2) AS price
      FROM orders WHERE o_orderkey <= 4000""")
    s.sql("""CREATE DYNAMIC TABLE dyn_a10 AS
      SELECT k, avg(price) AS ap, count(*) AS n, max(price) AS hi
      FROM dyn_b10 GROUP BY k""")
    def want = s.sql(
      "SELECT k, avg(price) AS ap, count(*) AS n, max(price) AS hi FROM dyn_b10 GROUP BY k")
    // the state sidecar must not leak into the visible schema
    assert(s.sql("SELECT * FROM dyn_a10").columns.toSeq ==
      Seq("K", "AP", "N", "HI") ||
      s.sql("SELECT * FROM dyn_a10").columns.toSeq == Seq("k", "ap", "n", "hi"))
    assertSame(s.sql("SELECT * FROM dyn_a10"), want)
    s.sql("""INSERT INTO dyn_b10
      SELECT o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 8000""")
    s.sql("ALTER DYNAMIC TABLE dyn_a10 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assert(DynamicTables.lastDeltaFiles.nonEmpty)
    assertSame(s.sql("SELECT * FROM dyn_a10"), want)
    val sch1 = s.sql("SELECT * FROM dyn_a10").schema
    // second merge: the state must fold across refreshes, not just off
    // the create-time materialization
    s.sql("""INSERT INTO dyn_b10
      SELECT o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 8000""")
    s.sql("ALTER DYNAMIC TABLE dyn_a10 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assert(s.sql("SELECT * FROM dyn_a10").schema == sch1)
    assertSame(s.sql("SELECT * FROM dyn_a10"), want)
    // a delete degrades that one refresh to full — and the rebuilt state
    // must resume incremental merging afterwards
    s.sql("DELETE FROM dyn_b10 WHERE k % 3 = 0")
    s.sql("ALTER DYNAMIC TABLE dyn_a10 REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    assertSame(s.sql("SELECT * FROM dyn_a10"), want)
    s.sql("INSERT INTO dyn_b10 SELECT o_custkey, o_totalprice::number(12,2) FROM orders WHERE o_orderkey <= 500")
    s.sql("ALTER DYNAMIC TABLE dyn_a10 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assertSame(s.sql("SELECT * FROM dyn_a10"), want)
  }

  test("grouping key absent from the output forces full refresh") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_b12 AS SELECT n_nationkey AS k, n_regionkey AS rk FROM nation")
    // GROUP BY rk but rk is NOT selected: the materialization has one
    // row per rk with only the sum — a merge re-grouped by the output
    // keys (none) would collapse those rows into one. Must stay full.
    s.sql("CREATE DYNAMIC TABLE dyn_a12 AS SELECT sum(k) AS sk FROM dyn_b12 GROUP BY rk")
    s.sql("INSERT INTO dyn_b12 SELECT n_nationkey + 25, n_regionkey FROM nation")
    s.sql("ALTER DYNAMIC TABLE dyn_a12 REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    assertSame(
      s.sql("SELECT * FROM dyn_a12"),
      s.sql("SELECT sum(k) AS sk FROM dyn_b12 GROUP BY rk"))
  }

  test("derived-expression DT: arithmetic over aggregates maintains incrementally") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_b13 AS
      SELECT o_custkey AS k, o_totalprice::number(12,2) AS price
      FROM orders WHERE o_orderkey <= 4000""")
    // every output is an EXPRESSION over decomposable aggregates (plus
    // one mixing in the grouping expression): none is mergeable as a
    // value, all are maintainable through their aggregate partials
    val defn = """SELECT k % 5 AS g,
        sum(price) + 1 AS sp1,
        max(price) - min(price) AS spread,
        sum(price) / nullif(count(*), 0) AS unit,
        count(*) * 2 AS n2,
        round(avg(price), 2) AS ap2,
        sum(price) + (k % 5) AS mix
      FROM dyn_b13 GROUP BY k % 5"""
    s.sql(s"CREATE DYNAMIC TABLE dyn_a13 AS $defn")
    def want = s.sql(defn)
    assertSame(s.sql("SELECT * FROM dyn_a13"), want)
    s.sql("""INSERT INTO dyn_b13
      SELECT o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 8000""")
    s.sql("ALTER DYNAMIC TABLE dyn_a13 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assertSame(s.sql("SELECT * FROM dyn_a13"), want)
    // second merge folds state-over-state, not state-over-create
    s.sql("""INSERT INTO dyn_b13
      SELECT o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 8000""")
    s.sql("ALTER DYNAMIC TABLE dyn_a13 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assertSame(s.sql("SELECT * FROM dyn_a13"), want)
  }

  test("non-decomposable expressions over aggregates stay full") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_b14 AS SELECT n_nationkey AS k, n_regionkey AS rk FROM nation")
    // count(DISTINCT) inside an expression is not decomposable
    s.sql("CREATE DYNAMIC TABLE dyn_a14 AS SELECT rk, count(DISTINCT k) + 1 AS a FROM dyn_b14 GROUP BY rk")
    s.sql("INSERT INTO dyn_b14 SELECT n_nationkey + 25, n_regionkey FROM nation")
    s.sql("ALTER DYNAMIC TABLE dyn_a14 REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    assertSame(
      s.sql("SELECT * FROM dyn_a14"),
      s.sql("SELECT rk, count(DISTINCT k) + 1 AS a FROM dyn_b14 GROUP BY rk"))
  }

  test("fuzz: random insert/delete/refresh sequences keep a derived DT exact") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_b15 AS
      SELECT o_orderkey AS ok, o_custkey AS k, o_totalprice::number(12,2) AS price
      FROM orders WHERE o_orderkey <= 500""")
    val defn = """SELECT k % 4 AS g, count(*) AS n,
        sum(price) + 1 AS sp1, round(avg(price), 2) AS ap,
        max(price) - min(price) AS spread
      FROM dyn_b15 GROUP BY k % 4"""
    s.sql(s"CREATE DYNAMIC TABLE dyn_a15 AS $defn")
    val rnd = new scala.util.Random(42)
    var merges = 0
    for (step <- 1 to 12) {
      rnd.nextInt(3) match {
        case 0 => // append a pseudo-random slice (dupes are fine)
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          s.sql(s"""INSERT INTO dyn_b15
            SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
            FROM orders WHERE o_orderkey % $m = $r AND o_orderkey <= 4000""")
        case 1 => // base rewrite: degrades the NEXT refresh to full
          s.sql(s"DELETE FROM dyn_b15 WHERE ok % ${7 + rnd.nextInt(6)} = 1")
        case _ => () // refresh with no base change: no-op path
      }
      s.sql("ALTER DYNAMIC TABLE dyn_a15 REFRESH")
      if (DynamicTables.lastRefreshMode == "incremental-merge") merges += 1
      assertSame(s.sql("SELECT * FROM dyn_a15"), s.sql(defn))
    }
    // the sequence must actually exercise the incremental path, or this
    // fuzz silently degenerates into full-refresh-only coverage
    assert(merges >= 2, s"only $merges incremental merges in 12 steps")
  }

  test("fuzz: random granular DML + refresh keeps a retractable Iceberg DT exact") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_bf AS
      SELECT o_orderkey AS ok, o_custkey AS k, o_totalprice::number(12,2) AS price
      FROM orders WHERE o_orderkey <= 500""")
    // linear aggregates + HAVING: retraction-eligible, threshold-crossing
    val defn = """SELECT k % 4 AS g, count(*) AS n,
        sum(price) AS total, round(avg(price), 2) AS ap
      FROM dyn_bf GROUP BY k % 4 HAVING count(*) >= 10"""
    s.sql(s"CREATE DYNAMIC TABLE dyn_af AS $defn")
    val rnd = new scala.util.Random(7)
    var retracts = 0
    var lo = 500 // appended slices use fresh key ranges
    for (step <- 1 to 12) {
      rnd.nextInt(3) match {
        case 0 => // append a fresh slice (new snapshot)
          val hi = lo + 50 + rnd.nextInt(150)
          s.sql(s"""INSERT INTO dyn_bf
            SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
            FROM orders WHERE o_orderkey > $lo AND o_orderkey <= $hi""")
          lo = hi
        case 1 => // granular DELETE inside an existing range
          val m = 5 + rnd.nextInt(8)
          s.sql(s"DELETE FROM dyn_bf WHERE ok % $m = 1 AND ok <= $lo")
        case _ => // granular UPDATE of a random stripe
          val m = 6 + rnd.nextInt(7)
          s.sql(s"UPDATE dyn_bf SET price = price + 1 WHERE ok % $m = 2")
      }
      s.sql("ALTER DYNAMIC TABLE dyn_af REFRESH")
      if (DynamicTables.lastRefreshMode == "incremental-retract-merge")
        retracts += 1
      assertSame(s.sql("SELECT * FROM dyn_af"), s.sql(defn))
    }
    assert(retracts >= 2, s"only $retracts retractions in 12 steps")
  }

  test("HAVING DT: threshold crossings in both directions stay exact") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_b16 AS
      SELECT o_custkey AS k, o_totalprice::number(12,2) AS price
      FROM orders WHERE o_orderkey <= 500""")
    // sum(price) < N: appends push groups OVER it (rows disappear);
    // count(*) >= N: appends pull groups over it (rows appear) — the
    // state must keep every group unfiltered for either to be sound
    val defn = """SELECT k % 7 AS g, count(*) AS n, sum(price) AS total
      FROM dyn_b16 GROUP BY k % 7
      HAVING count(*) >= 40 AND sum(price) < 9000000"""
    s.sql(s"CREATE DYNAMIC TABLE dyn_a16 AS $defn")
    def want = s.sql(defn)
    assertSame(s.sql("SELECT * FROM dyn_a16"), want)
    for (lo <- Seq(2000, 4000, 6000)) {
      s.sql(s"""INSERT INTO dyn_b16
        SELECT o_custkey, o_totalprice::number(12,2)
        FROM orders WHERE o_orderkey > $lo AND o_orderkey <= ${lo + 2000}""")
      s.sql("ALTER DYNAMIC TABLE dyn_a16 REFRESH")
      assert(DynamicTables.lastRefreshMode == "incremental-merge")
      assertSame(s.sql("SELECT * FROM dyn_a16"), want)
    }
  }

  test("HAVING over an aggregate NOT in the SELECT list stays incremental") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_b17 AS
      SELECT o_custkey AS k, o_totalprice::number(12,2) AS price
      FROM orders WHERE o_orderkey <= 4000""")
    // the analyzer adds avg(price) to the Aggregate and projects it
    // away above the Filter — the Project(attrs, Filter(_, Aggregate))
    // shape; the helper's recipe lives only in the HAVING predicate
    val defn = """SELECT k % 5 AS g, count(*) AS n
      FROM dyn_b17 GROUP BY k % 5 HAVING avg(price) > 140000"""
    s.sql(s"CREATE DYNAMIC TABLE dyn_a17 AS $defn")
    assertSame(s.sql("SELECT * FROM dyn_a17"), s.sql(defn))
    s.sql("""INSERT INTO dyn_b17
      SELECT o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000""")
    s.sql("ALTER DYNAMIC TABLE dyn_a17 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assertSame(s.sql("SELECT * FROM dyn_a17"), s.sql(defn))
    // a second merge folds state-over-state with the filter re-applied
    s.sql("""INSERT INTO dyn_b17
      SELECT o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey <= 1000""")
    s.sql("ALTER DYNAMIC TABLE dyn_a17 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assertSame(s.sql("SELECT * FROM dyn_a17"), s.sql(defn))
  }

  test("HAVING over a DISTINCT aggregate not in the SELECT stays incremental") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_b18 AS SELECT n_nationkey AS k, n_regionkey AS rk FROM nation")
    val defn = "SELECT rk, count(*) AS n FROM dyn_b18 GROUP BY rk HAVING count(DISTINCT k) > 3"
    s.sql(s"CREATE DYNAMIC TABLE dyn_a18 AS $defn")
    s.sql("INSERT INTO dyn_b18 SELECT n_nationkey + 25, n_regionkey FROM nation")
    s.sql("ALTER DYNAMIC TABLE dyn_a18 REFRESH")
    // the analyzer's helper count(DISTINCT k) rides the keyed state like
    // a selected distinct column; the threshold applies post-merge
    assert(DynamicTables.lastRefreshMode == "incremental-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM dyn_a18"), s.sql(defn))
  }

  test("HAVING over a non-decomposable aggregate stays full") {
    val s = newSession()
    s.sql("CREATE OR REPLACE TABLE dyn_b19 AS SELECT n_nationkey AS k, n_regionkey AS rk FROM nation")
    val defn = "SELECT rk, count(*) AS n FROM dyn_b19 GROUP BY rk HAVING stddev(k) > 1"
    s.sql(s"CREATE DYNAMIC TABLE dyn_a19 AS $defn")
    s.sql("INSERT INTO dyn_b19 SELECT n_nationkey + 25, n_regionkey FROM nation")
    s.sql("ALTER DYNAMIC TABLE dyn_a19 REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    assertSame(s.sql("SELECT * FROM dyn_a19"), s.sql(defn))
  }

  test("AVG DT over a join: telescoped parts merge through the state") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE dyn_f11 AS
      SELECT n_nationkey AS k, n_regionkey AS rk FROM nation""")
    s.sql("""CREATE OR REPLACE TABLE dyn_d11 AS
      SELECT r_regionkey AS rk, r_name AS rname FROM region""")
    s.sql("""CREATE DYNAMIC TABLE dyn_a11 AS
      SELECT d.rname, avg(f.k) AS ak, count(*) AS n
      FROM dyn_f11 f JOIN dyn_d11 d ON f.rk = d.rk
      GROUP BY d.rname""")
    def want = s.sql("""SELECT d.rname, avg(f.k) AS ak, count(*) AS n
      FROM dyn_f11 f JOIN dyn_d11 d ON f.rk = d.rk GROUP BY d.rname""")
    s.sql("INSERT INTO dyn_f11 SELECT n_nationkey + 25, n_regionkey FROM nation")
    s.sql("ALTER DYNAMIC TABLE dyn_a11 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-merge")
    assertSame(s.sql("SELECT * FROM dyn_a11"), want)
    // both bases gain files: parts for each base union-merge into state
    s.sql("INSERT INTO dyn_f11 SELECT n_nationkey + 50, n_regionkey FROM nation")
    s.sql("INSERT INTO dyn_d11 SELECT 7, 'REGION7'")
    s.sql("ALTER DYNAMIC TABLE dyn_a11 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-merge")
    assertSame(s.sql("SELECT * FROM dyn_a11"), want)
  }

  test("fuzz: random granular DML keeps a MIN/MAX (regroup) Iceberg DT exact") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_bmm AS
      SELECT o_orderkey AS ok, o_custkey AS k, o_totalprice::number(12,2) AS price
      FROM orders WHERE o_orderkey <= 500""")
    // min/max in the state: retraction-ineligible, regroup-eligible
    val defn = """SELECT k % 6 AS g, count(*) AS n, min(price) AS lo,
        max(price) AS hi, sum(price) AS total
      FROM dyn_bmm GROUP BY k % 6"""
    s.sql(s"CREATE DYNAMIC TABLE dyn_amm AS $defn")
    val rnd = new scala.util.Random(13)
    var regroups = 0
    var lo = 500
    // slice-bounded DML: each INSERT lands a key range in its own
    // snapshot files, and later DELETE/UPDATEs target ONE recorded
    // slice, so the granular path replaces only that slice's files —
    // the shape that exercises regroup instead of the full fallback
    val slices = scala.collection.mutable.ArrayBuffer((0, 500))
    for (step <- 1 to 12) {
      rnd.nextInt(4) match {
        case 0 | 1 => // append a fresh slice (new snapshot)
          val hi = lo + 50 + rnd.nextInt(150)
          s.sql(s"""INSERT INTO dyn_bmm
            SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
            FROM orders WHERE o_orderkey > $lo AND o_orderkey <= $hi""")
          slices += ((lo, hi)); lo = hi
        case 2 => // granular DELETE — may remove current minima/maxima
          val (a, b) = slices(rnd.nextInt(slices.length))
          val m = 3 + rnd.nextInt(5)
          s.sql(s"DELETE FROM dyn_bmm WHERE ok % $m = 1 AND ok > $a AND ok <= $b")
        case _ => // granular UPDATE — moves extrema in both directions
          val (a, b) = slices(rnd.nextInt(slices.length))
          val m = 3 + rnd.nextInt(5)
          val expr = if (rnd.nextBoolean()) "price * 3" else "price / 2"
          s.sql(s"UPDATE dyn_bmm SET price = $expr WHERE ok % $m = 2 AND ok > $a AND ok <= $b")
      }
      s.sql("ALTER DYNAMIC TABLE dyn_amm REFRESH")
      if (DynamicTables.lastRefreshMode == "incremental-regroup-merge")
        regroups += 1
      assertSame(s.sql("SELECT * FROM dyn_amm"), s.sql(defn))
    }
    assert(regroups >= 3, s"only $regroups regroup refreshes in 12 steps")
  }

  test("fuzz: random base activity keeps a DT-over-DT chain exact") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE chf_t AS
      SELECT o_orderkey AS ok, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 500""")
    val defA = "SELECT c, count(*) AS n, sum(p) AS total FROM chf_t GROUP BY c"
    s.sql(s"CREATE DYNAMIC TABLE chf_a AS $defA")
    s.sql("""CREATE DYNAMIC TABLE chf_b AS
      SELECT c % 5 AS g, sum(n) AS n, sum(total) AS total, count(*) AS groups
      FROM chf_a GROUP BY 1""")
    s.sql("CREATE DYNAMIC TABLE chf_c AS SELECT c, total * 2 AS dbl FROM chf_a WHERE n >= 2")
    def wantB = s.sql(s"""WITH a AS ($defA)
      SELECT c % 5 AS g, sum(n) AS n, sum(total) AS total, count(*) AS groups
      FROM a GROUP BY 1""")
    def wantC = s.sql(s"WITH a AS ($defA) SELECT c, total * 2 AS dbl FROM a WHERE n >= 2")
    val rnd = new scala.util.Random(99)
    var dtdeltaB = 0; var dtdeltaC = 0
    var lo = 500
    for (step <- 1 to 14) {
      rnd.nextInt(6) match {
        case 0 | 1 | 2 | 3 => // append to the root, advance the base DT only
          val hi = lo + 100 + rnd.nextInt(300)
          s.sql(s"""INSERT INTO chf_t
            SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
            FROM orders WHERE o_orderkey > $lo AND o_orderkey <= $hi""")
          lo = hi
          s.sql("ALTER DYNAMIC TABLE chf_a REFRESH")
        case 4 => // root rewrite: base DT goes full, chain breaks once
          s.sql(s"DELETE FROM chf_t WHERE ok % ${9 + rnd.nextInt(5)} = 3")
          s.sql("ALTER DYNAMIC TABLE chf_a REFRESH")
        case _ => () // downstreams catch up on an unchanged base
      }
      // downstreams refresh on a random cadence — sometimes after two
      // base swaps (chained entries), sometimes with nothing new
      if (rnd.nextInt(4) != 0) {
        s.sql("ALTER DYNAMIC TABLE chf_b REFRESH")
        if (DynamicTables.lastRefreshMode == "incremental-dtdelta-merge")
          dtdeltaB += 1
        assertSame(s.sql("SELECT * FROM chf_b"), wantB)
      }
      if (rnd.nextInt(4) != 0) {
        s.sql("ALTER DYNAMIC TABLE chf_c REFRESH")
        if (DynamicTables.lastRefreshMode == "incremental-dtdelta-transform")
          dtdeltaC += 1
        assertSame(s.sql("SELECT * FROM chf_c"), wantC)
      }
    }
    // final catch-up: both downstreams must converge exactly
    s.sql("ALTER DYNAMIC TABLE chf_b REFRESH")
    assertSame(s.sql("SELECT * FROM chf_b"), wantB)
    s.sql("ALTER DYNAMIC TABLE chf_c REFRESH")
    assertSame(s.sql("SELECT * FROM chf_c"), wantC)
    assert(dtdeltaB >= 2 && dtdeltaC >= 2,
      s"dtdelta coverage too thin: merge=$dtdeltaB transform=$dtdeltaC")
  }

  // ── DT-over-DT across a merge-refreshing base ──────────────────────────

  test("DT chain: retractable agg downstream stays incremental across base merges") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE chain_t AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE chain_a AS
      SELECT c, count(*) AS n, sum(p) AS total FROM chain_t GROUP BY c""")
    s.sql("""CREATE DYNAMIC TABLE chain_b AS
      SELECT c % 5 AS g, sum(n) AS n, sum(total) AS total,
        count(*) AS groups
      FROM chain_a GROUP BY 1""")
    def want = s.sql("""WITH a AS (
        SELECT c, count(*) AS n, sum(p) AS total FROM chain_t GROUP BY c)
      SELECT c % 5 AS g, sum(n) AS n, sum(total) AS total,
        count(*) AS groups FROM a GROUP BY 1""")
    // cycle 1: base merge-refreshes (materialization path swap), then
    // the downstream consumes the published signed row delta
    s.sql("""INSERT INTO chain_t
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000""")
    s.sql("ALTER DYNAMIC TABLE chain_a REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    s.sql("ALTER DYNAMIC TABLE chain_b REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-dtdelta-merge",
      DynamicTables.lastRefreshMode)
    // the downstream read sidecar dirs, not the base materialization
    assert(DynamicTables.lastDeltaFiles.nonEmpty &&
      DynamicTables.lastDeltaFiles.forall(p =>
        p.contains("__dtdelta_") && p.contains("__sign=")),
      DynamicTables.lastDeltaFiles.toString)
    assertSame(s.sql("SELECT * FROM chain_b"), want)
    // cycle 2: TWO base refreshes before the downstream catches up —
    // the log entries chain across the gap
    s.sql("""INSERT INTO chain_t
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 2000 AND o_orderkey <= 2500""")
    s.sql("ALTER DYNAMIC TABLE chain_a REFRESH")
    s.sql("""INSERT INTO chain_t
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 2500 AND o_orderkey <= 3000""")
    s.sql("ALTER DYNAMIC TABLE chain_a REFRESH")
    s.sql("ALTER DYNAMIC TABLE chain_b REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-dtdelta-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM chain_b"), want)
  }

  test("DT chain: stateless transform downstream splices the published delta") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE chain_t2 AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE chain_a2 AS
      SELECT c, count(*) AS n, sum(p) AS total FROM chain_t2 GROUP BY c""")
    s.sql("""CREATE DYNAMIC TABLE chain_c AS
      SELECT c, total * 2 AS dbl FROM chain_a2 WHERE n >= 2""")
    def want = s.sql("""WITH a AS (
        SELECT c, count(*) AS n, sum(p) AS total FROM chain_t2 GROUP BY c)
      SELECT c, total * 2 AS dbl FROM a WHERE n >= 2""")
    s.sql("""INSERT INTO chain_t2
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000""")
    s.sql("ALTER DYNAMIC TABLE chain_a2 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    s.sql("ALTER DYNAMIC TABLE chain_c REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-dtdelta-transform",
      DynamicTables.lastRefreshMode)
    // groups whose n crossed the >= 2 threshold enter; changed totals
    // replace their old transformed row (the splice retracts it)
    assertSame(s.sql("SELECT * FROM chain_c"), want)
    // second cycle
    s.sql("""INSERT INTO chain_t2
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 2000 AND o_orderkey <= 3000""")
    s.sql("ALTER DYNAMIC TABLE chain_a2 REFRESH")
    s.sql("ALTER DYNAMIC TABLE chain_c REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-dtdelta-transform",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM chain_c"), want)
  }

  test("DT chain: MIN/MAX downstream regroups off the published sidecar") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE chain_t4 AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE chain_a4 AS
      SELECT c, count(*) AS n, sum(p) AS total FROM chain_t4 GROUP BY c""")
    // max over the base DT's totals: not retractable, but keyed —
    // the sidecar rows name the touched groups, which regroup-splice
    s.sql("""CREATE DYNAMIC TABLE chain_d AS
      SELECT c % 5 AS g, max(total) AS hi, min(total) AS lo, count(*) AS n
      FROM chain_a4 GROUP BY 1""")
    def want = s.sql("""WITH a AS (
        SELECT c, count(*) AS n, sum(p) AS total FROM chain_t4 GROUP BY c)
      SELECT c % 5 AS g, max(total) AS hi, min(total) AS lo, count(*) AS n
      FROM a GROUP BY 1""")
    s.sql("""INSERT INTO chain_t4
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000""")
    s.sql("ALTER DYNAMIC TABLE chain_a4 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    s.sql("ALTER DYNAMIC TABLE chain_d REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-dtdelta-regroup",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM chain_d"), want)
    // second cycle: two base merges, one downstream catch-up
    s.sql("""INSERT INTO chain_t4
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 2000 AND o_orderkey <= 2500""")
    s.sql("ALTER DYNAMIC TABLE chain_a4 REFRESH")
    s.sql("""INSERT INTO chain_t4
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 2500 AND o_orderkey <= 3000""")
    s.sql("ALTER DYNAMIC TABLE chain_a4 REFRESH")
    s.sql("ALTER DYNAMIC TABLE chain_d REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-dtdelta-regroup",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM chain_d"), want)
  }

  test("DT chain: join-DT over a merge-refreshing DT base stays incremental") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE chain_t5 AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE chain_a5 AS
      SELECT c, count(*) AS n, sum(p) AS total FROM chain_t5 GROUP BY c""")
    s.sql("""CREATE OR REPLACE TABLE chain_dim AS
      SELECT c_custkey AS c, c_nationkey AS nk FROM customer""")
    // star rollup over the chain: agg DT joined to a dim, downstream agg
    s.sql("""CREATE DYNAMIC TABLE chain_j AS
      SELECT d.nk, sum(a.total) AS total, sum(a.n) AS n
      FROM chain_a5 a JOIN chain_dim d ON a.c = d.c
      GROUP BY d.nk""")
    def want = s.sql("""WITH a AS (
        SELECT c, count(*) AS n, sum(p) AS total FROM chain_t5 GROUP BY c)
      SELECT d.nk, sum(a.total) AS total, sum(a.n) AS n
      FROM a JOIN chain_dim d ON a.c = d.c GROUP BY d.nk""")
    s.sql("""INSERT INTO chain_t5
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000""")
    s.sql("ALTER DYNAMIC TABLE chain_a5 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    s.sql("ALTER DYNAMIC TABLE chain_j REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-retract-merge",
      DynamicTables.lastRefreshMode)
    // the signed delta read the base DT's sidecar files, never its
    // swapped materialization wholesale
    assert(DynamicTables.lastDeltaFiles.nonEmpty &&
      DynamicTables.lastDeltaFiles.forall(p =>
        p.contains("__dtdelta_") && p.contains("__sign=")),
      DynamicTables.lastDeltaFiles.toString)
    assertSame(s.sql("SELECT * FROM chain_j"), want)
    // two more base merges before the join catches up — chained entries
    s.sql("""INSERT INTO chain_t5
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 2000 AND o_orderkey <= 2500""")
    s.sql("ALTER DYNAMIC TABLE chain_a5 REFRESH")
    s.sql("""INSERT INTO chain_t5
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 2500 AND o_orderkey <= 3000""")
    s.sql("ALTER DYNAMIC TABLE chain_a5 REFRESH")
    s.sql("ALTER DYNAMIC TABLE chain_j REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-retract-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM chain_j"), want)
  }

  test("DT chain: three levels deep — the middle DT republishes its own delta") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE chain_t6 AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE chain_l1 AS
      SELECT c, count(*) AS n, sum(p) AS total FROM chain_t6 GROUP BY c""")
    s.sql("""CREATE DYNAMIC TABLE chain_l2 AS
      SELECT c % 10 AS g, sum(n) AS n, sum(total) AS total
      FROM chain_l1 GROUP BY 1""")
    s.sql("""CREATE DYNAMIC TABLE chain_l3 AS
      SELECT g % 2 AS h, sum(n) AS n, sum(total) AS total
      FROM chain_l2 GROUP BY 1""")
    def want = s.sql("""WITH l1 AS (
        SELECT c, count(*) AS n, sum(p) AS total FROM chain_t6 GROUP BY c),
      l2 AS (SELECT c % 10 AS g, sum(n) AS n, sum(total) AS total
        FROM l1 GROUP BY 1)
      SELECT g % 2 AS h, sum(n) AS n, sum(total) AS total
      FROM l2 GROUP BY 1""")
    s.sql("""INSERT INTO chain_t6
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000""")
    s.sql("ALTER DYNAMIC TABLE chain_l1 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    s.sql("ALTER DYNAMIC TABLE chain_l2 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-dtdelta-merge",
      DynamicTables.lastRefreshMode)
    // l2's dtdelta-merge itself swapped its materialization AND
    // republished — l3 consumes the second-hop chain
    s.sql("ALTER DYNAMIC TABLE chain_l3 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-dtdelta-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM chain_l3"), want)
  }

  test("DT chain: a full base refresh breaks the chain — downstream goes full once") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE TABLE chain_t3 AS
      SELECT n_nationkey AS k, n_regionkey AS rk FROM nation""")
    s.sql("""CREATE DYNAMIC TABLE chain_a3 REFRESH_MODE = FULL AS
      SELECT rk, count(*) AS n FROM chain_t3 GROUP BY rk""")
    s.sql("""CREATE DYNAMIC TABLE chain_b3 AS
      SELECT rk % 2 AS g, sum(n) AS n FROM chain_a3 GROUP BY 1""")
    s.sql("INSERT INTO chain_t3 SELECT n_nationkey + 100, n_regionkey FROM nation")
    s.sql("ALTER DYNAMIC TABLE chain_a3 REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    s.sql("ALTER DYNAMIC TABLE chain_b3 REFRESH")
    assert(DynamicTables.lastRefreshMode == "full")
    assertSame(s.sql("SELECT * FROM chain_b3"),
      s.sql("""WITH a AS (SELECT rk, count(*) AS n FROM chain_t3 GROUP BY rk)
        SELECT rk % 2 AS g, sum(n) AS n FROM a GROUP BY 1"""))
  }

  // ── retraction: file-granular DML on an Iceberg base ───────────────────

  test("retraction: Iceberg granular DELETE refreshes by ±fold, not recompute") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_ib AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 500""")
    s.sql("""INSERT INTO dyn_ib
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE dyn_ret AS
      SELECT c % 10 AS g, count(*) AS n, sum(p) AS total, avg(p) AS ap
      FROM dyn_ib GROUP BY 1""")
    def want = s.sql("""SELECT c % 10 AS g, count(*) AS n, sum(p) AS total,
      avg(p) AS ap FROM dyn_ib GROUP BY 1""")
    // granular DELETE replaces only snapshot-2's files
    s.sql("DELETE FROM dyn_ib WHERE k > 500 AND k <= 750")
    s.sql("ALTER DYNAMIC TABLE dyn_ret REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-retract-merge",
      DynamicTables.lastRefreshMode)
    // the retraction read the replaced/removed files only — never s1
    assert(DynamicTables.lastDeltaFiles.nonEmpty &&
      DynamicTables.lastDeltaFiles.forall(!_.contains("/data/s1/")),
      DynamicTables.lastDeltaFiles.toString)
    assertSame(s.sql("SELECT * FROM dyn_ret"), want)
    // appends after a retraction resume the plain merge path
    s.sql("""INSERT INTO dyn_ib
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 1200""")
    s.sql("ALTER DYNAMIC TABLE dyn_ret REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assertSame(s.sql("SELECT * FROM dyn_ret"), want)
  }

  test("retraction: a group whose last row is deleted vanishes") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_ib2 AS
      SELECT n_nationkey AS k, n_regionkey AS rk FROM nation""")
    s.sql("INSERT INTO dyn_ib2 SELECT 99, 9") // lone group rk=9, snapshot 2
    s.sql("""CREATE DYNAMIC TABLE dyn_ret2 AS
      SELECT rk, count(*) AS n, sum(k) AS sk FROM dyn_ib2 GROUP BY rk""")
    assert(s.sql("SELECT * FROM dyn_ret2 WHERE rk = 9").count() == 1)
    s.sql("DELETE FROM dyn_ib2 WHERE rk = 9")
    s.sql("ALTER DYNAMIC TABLE dyn_ret2 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-retract-merge",
      DynamicTables.lastRefreshMode)
    // rn hit 0: the group must vanish, not read n=0/sk=0
    assert(s.sql("SELECT * FROM dyn_ret2 WHERE rk = 9").count() == 0)
    assertSame(s.sql("SELECT * FROM dyn_ret2"),
      s.sql("SELECT rk, count(*) AS n, sum(k) AS sk FROM dyn_ib2 GROUP BY rk"))
  }

  test("regroup: MIN/MAX under a granular DELETE recomputes touched groups only") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_ib3 AS
      SELECT n_nationkey AS k, n_regionkey AS rk FROM nation""")
    s.sql("INSERT INTO dyn_ib3 SELECT n_nationkey + 100, n_regionkey FROM nation")
    s.sql("""CREATE DYNAMIC TABLE dyn_ret3 AS
      SELECT rk, max(k) AS hi FROM dyn_ib3 GROUP BY rk""")
    // the DELETE removes exactly snapshot-2's rows: the current maxima
    // all drop — the case no fold can maintain, but the touched groups
    // are named by the removed files, so the refresh recomputes only
    // those (here: all groups, since every region has a k > 100 row)
    s.sql("DELETE FROM dyn_ib3 WHERE k > 100")
    s.sql("ALTER DYNAMIC TABLE dyn_ret3 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-regroup-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM dyn_ret3"),
      s.sql("SELECT rk, max(k) AS hi FROM dyn_ib3 GROUP BY rk"))
  }

  test("regroup: MIN/MAX + SUM mix stays exact through granular DELETE and UPDATE") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_mm AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 500""")
    s.sql("""INSERT INTO dyn_mm
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE dyn_mmd AS
      SELECT c % 10 AS g, count(*) AS n, min(p) AS lo, max(p) AS hi,
        sum(p) AS total
      FROM dyn_mm GROUP BY 1""")
    def want = s.sql("""SELECT c % 10 AS g, count(*) AS n, min(p) AS lo,
      max(p) AS hi, sum(p) AS total FROM dyn_mm GROUP BY 1""")
    // partial-file granular DELETE: replaces only snapshot-2's files
    s.sql("DELETE FROM dyn_mm WHERE k > 500 AND k <= 750")
    s.sql("ALTER DYNAMIC TABLE dyn_mmd REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-regroup-merge",
      DynamicTables.lastRefreshMode)
    // touched-group discovery read only the replaced/removed files
    assert(DynamicTables.lastDeltaFiles.nonEmpty &&
      DynamicTables.lastDeltaFiles.forall(!_.contains("/data/s1/")),
      DynamicTables.lastDeltaFiles.toString)
    assertSame(s.sql("SELECT * FROM dyn_mmd"), want)
    // an UPDATE that halves prices above the median lowers current
    // maxima in place — regroup again, still exact
    s.sql("UPDATE dyn_mm SET p = p / 2 WHERE k <= 300")
    s.sql("ALTER DYNAMIC TABLE dyn_mmd REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-regroup-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM dyn_mmd"), want)
    // appends afterwards resume the plain merge path
    s.sql("""INSERT INTO dyn_mm
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 1200""")
    s.sql("ALTER DYNAMIC TABLE dyn_mmd REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-merge")
    assertSame(s.sql("SELECT * FROM dyn_mmd"), want)
  }

  test("regroup: a MIN/MAX group whose last row is deleted vanishes") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_mm2 AS
      SELECT n_nationkey AS k, n_regionkey AS rk FROM nation""")
    s.sql("INSERT INTO dyn_mm2 SELECT 99, 9") // lone group rk=9, snapshot 2
    s.sql("""CREATE DYNAMIC TABLE dyn_mmd2 AS
      SELECT rk, max(k) AS hi, count(*) AS n FROM dyn_mm2 GROUP BY rk""")
    assert(s.sql("SELECT * FROM dyn_mmd2 WHERE rk = 9").count() == 1)
    s.sql("DELETE FROM dyn_mm2 WHERE rk = 9")
    s.sql("ALTER DYNAMIC TABLE dyn_mmd2 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-regroup-merge",
      DynamicTables.lastRefreshMode)
    assert(s.sql("SELECT * FROM dyn_mmd2 WHERE rk = 9").count() == 0)
    assertSame(s.sql("SELECT * FROM dyn_mmd2"),
      s.sql("SELECT rk, max(k) AS hi, count(*) AS n FROM dyn_mm2 GROUP BY rk"))
  }

  test("regroup: derived MIN/MAX expression with HAVING splices the state sidecar") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_mm3 AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 500""")
    s.sql("""INSERT INTO dyn_mm3
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE dyn_mmd3 AS
      SELECT c % 7 AS g, max(p) - min(p) AS spread, count(*) AS n
      FROM dyn_mm3 GROUP BY 1 HAVING count(*) > 20""")
    def want = s.sql("""SELECT c % 7 AS g, max(p) - min(p) AS spread,
      count(*) AS n FROM dyn_mm3 GROUP BY 1 HAVING count(*) > 20""")
    s.sql("DELETE FROM dyn_mm3 WHERE k > 500 AND k <= 750")
    s.sql("ALTER DYNAMIC TABLE dyn_mmd3 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-regroup-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM dyn_mmd3"), want)
  }

  test("join retraction: granular DELETE on the fact keeps the join DT incremental") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_jfact AS
      SELECT o_orderkey AS k, o_custkey AS c, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 500""")
    s.sql("""INSERT INTO dyn_jfact
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000""")
    s.sql("""CREATE OR REPLACE TABLE dyn_jdim AS
      SELECT c_custkey AS c, c_nationkey AS nk FROM customer""")
    s.sql("""CREATE DYNAMIC TABLE dyn_jret AS
      SELECT d.nk, count(*) AS n, sum(f.p) AS total
      FROM dyn_jfact f JOIN dyn_jdim d ON f.c = d.c
      GROUP BY d.nk""")
    def want = s.sql("""SELECT d.nk, count(*) AS n, sum(f.p) AS total
      FROM dyn_jfact f JOIN dyn_jdim d ON f.c = d.c GROUP BY d.nk""")
    // granular DELETE on the fact: only snapshot-2's files replaced
    s.sql("DELETE FROM dyn_jfact WHERE k > 500 AND k <= 750")
    s.sql("ALTER DYNAMIC TABLE dyn_jret REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-retract-merge",
      DynamicTables.lastRefreshMode)
    // the signed delta reads only the fact's replaced/removed files
    assert(DynamicTables.lastDeltaFiles.nonEmpty &&
      DynamicTables.lastDeltaFiles.forall(p =>
        p.toUpperCase.contains("DYN_JFACT") && !p.contains("/data/s1/")),
      DynamicTables.lastDeltaFiles.toString)
    assertSame(s.sql("SELECT * FROM dyn_jret"), want)
    // appends resume the plain telescoped path afterwards
    s.sql("""INSERT INTO dyn_jfact
      SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 1200""")
    s.sql("ALTER DYNAMIC TABLE dyn_jret REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-join-merge")
    assertSame(s.sql("SELECT * FROM dyn_jret"), want)
  }

  test("retraction: Iceberg granular UPDATE re-aggregates through ±fold") {
    val s = newSession()
    s.sql("""CREATE OR REPLACE ICEBERG TABLE dyn_ib4 AS
      SELECT o_orderkey AS k, o_totalprice::number(12,2) AS p
      FROM orders WHERE o_orderkey <= 500""")
    s.sql("""INSERT INTO dyn_ib4 SELECT o_orderkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000""")
    s.sql("""CREATE DYNAMIC TABLE dyn_ret4 AS
      SELECT k % 5 AS g, sum(p) AS total, count(*) AS n
      FROM dyn_ib4 GROUP BY 1""")
    s.sql("UPDATE dyn_ib4 SET p = p * 2 WHERE k > 500")
    s.sql("ALTER DYNAMIC TABLE dyn_ret4 REFRESH")
    assert(DynamicTables.lastRefreshMode == "incremental-retract-merge",
      DynamicTables.lastRefreshMode)
    assertSame(s.sql("SELECT * FROM dyn_ret4"),
      s.sql("SELECT k % 5 AS g, sum(p) AS total, count(*) AS n FROM dyn_ib4 GROUP BY 1"))
  }
}
