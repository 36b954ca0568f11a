package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Snowflake-style result reuse (USE_CACHED_RESULT): hit/miss mechanics,
  * write-invalidation of persisted anchors, and the session-parameter
  * syntax. The invalidation cases pin the ADVICE-r6 fix: once a reuse
  * persists its anchor plan, Spark's CacheManager substitutes the cached
  * blocks into ANY later statement embedding the same subplan, so a base
  * write must evict eagerly — the fingerprint re-check alone only guards
  * re-runs of the identical text. */
class ReuseCacheSpec extends AnyFunSuite {

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

  test("identical SELECT over unchanged base reuses the previous result") {
    val s = newSession()
    val q = "SELECT count(*) AS n FROM orders"
    s.sql(q).collect()
    assert(!s.lastResultReused, "first execution computes")
    val n = s.sql(q).collect()(0).getLong(0)
    assert(s.lastResultReused, "second execution must be a cache hit")
    assert(n == 1500)
  }

  test("base write evicts reuse entries: embedding statements see fresh data") {
    val s = newSession()
    s.sql("CREATE TABLE rc_t AS SELECT n_nationkey AS k FROM nation")
    val q = "SELECT sum(k) AS sk FROM rc_t"
    val before = s.sql(q).collect()(0).getLong(0)     // computes, registers
    s.sql(q).collect()                                 // reuse: persists anchor
    assert(s.lastResultReused)
    s.sql(q).collect()                                 // populates cached blocks
    s.sql("INSERT INTO rc_t VALUES (1000)")
    // the same text re-run must recompute (fingerprint moved AND entry
    // evicted), and a DIFFERENT statement embedding the plan must not be
    // served stale blocks by the CacheManager
    val direct = s.sql(q).collect()(0).getLong(0)
    assert(!s.lastResultReused, "post-write run must not reuse")
    assert(direct == before + 1000)
    val embedded = s.sql(s"SELECT sk + 0 AS sk2 FROM ($q)").collect()(0).getLong(0)
    assert(embedded == before + 1000,
      "embedding statement read stale cached blocks after a base write")
    s.sql("CREATE TABLE rc_t2 AS " + q)
    assert(s.sql("SELECT sk FROM rc_t2").collect()(0).getLong(0) == before + 1000,
      "CTAS of the cached text materialized stale blocks after a base write")
    s.sql("DROP TABLE rc_t"); s.sql("DROP TABLE rc_t2")
  }

  test("DML and dynamic-refresh paths invalidate too") {
    val s = newSession()
    s.sql("CREATE TABLE rc_d AS SELECT n_nationkey AS k FROM nation")
    val q = "SELECT count(*) AS n FROM rc_d"
    val n0 = s.sql(q).collect()(0).getLong(0)
    s.sql(q).collect(); s.sql(q).collect() // persist + populate
    s.sql("DELETE FROM rc_d WHERE k < 5")
    assert(s.sql(q).collect()(0).getLong(0) == n0 - 5)
    assert(!s.lastResultReused)
    s.sql("DROP TABLE rc_d")
  }

  test("paren-less time-context keywords never cache") {
    val s = newSession()
    for (expr <- Seq("CURRENT_TIMESTAMP", "CURRENT_DATE", "LOCALTIMESTAMP")) {
      val q = s"SELECT $expr AS t, count(*) AS n FROM nation"
      s.sql(q).collect()
      s.sql(q).collect()
      assert(!s.lastResultReused, s"$expr (no parens) must disable reuse")
    }
  }

  test("ALTER SESSION accepts quoted values and rejects invalid ones") {
    val s = newSession()
    val q = "SELECT count(*) AS n FROM region"
    s.sql(q).collect(); s.sql(q).collect()
    assert(s.lastResultReused)
    s.sql("ALTER SESSION SET USE_CACHED_RESULT = 'FALSE'")
    s.sql(q).collect(); s.sql(q).collect()
    assert(!s.lastResultReused, "quoted FALSE must disable reuse")
    s.sql("ALTER SESSION SET USE_CACHED_RESULT = 'TRUE'")
    s.sql(q).collect(); s.sql(q).collect()
    assert(s.lastResultReused, "quoted TRUE must re-enable reuse")
    val e = intercept[IllegalArgumentException] {
      s.sql("ALTER SESSION SET USE_CACHED_RESULT = MAYBE")
    }
    assert(e.getMessage.contains("USE_CACHED_RESULT"))
  }
}
