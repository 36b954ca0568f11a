package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[SkipPartialAggregation]] must be result-identical to the two-phase
  * plan (merge(init→update(row)) ≡ update(row)) and must actually remove
  * the partial hash aggregate when forced. */
class SkipPartialAggregationSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // shared-JVM suites: builder-time spark.sql.extensions is ignored and
    // AdaptiveRulesHolder is immutable — swap the SessionState's holder
    // via reflection for a copy carrying the prep rule (test-only; real
    // sessions register through GraftExtensions)
    val ss = s.sessionState
    val old = ss.adaptiveRulesHolder
    if (!old.queryStagePrepRules.contains(SkipPartialAggregation)) {
      val replaced = new org.apache.spark.sql.execution.adaptive.AdaptiveRulesHolder(
        old.queryStagePrepRules :+ SkipPartialAggregation,
        old.runtimeOptimizerRules, old.queryStageOptimizerRules,
        old.queryPostPlannerStrategyRules)
      val f = ss.getClass.getDeclaredFields
        .find(_.getName.endsWith("adaptiveRulesHolder")).get
      f.setAccessible(true)
      f.set(ss, replaced)
    }
    s
  }

  private def withMode[T](mode: String)(f: => T): T = {
    spark.conf.set("spark.graft.skipPartialAggregation", mode)
    try f finally spark.conf.set("spark.graft.skipPartialAggregation", "off")
  }

  private val aggSqls = Seq(
    // sum/count/min/max/avg over a keyed group
    """SELECT l_partkey, count(*) AS n, sum(l_extendedprice) AS s,
         min(l_quantity) AS mn, max(l_quantity) AS mx, avg(l_discount) AS av
       FROM li GROUP BY l_partkey""",
    // expression grouping key + arithmetic aggregate input
    """SELECT l_orderkey % 7 AS g, sum(l_extendedprice * (1.0 - l_discount)) AS rev
       FROM li GROUP BY l_orderkey % 7""",
    // multi-key group
    """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS q
       FROM li GROUP BY l_returnflag, l_linestatus""")

  test("force mode: identical results, partial hash aggregate removed") {
    graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .createOrReplaceTempView("li")
    for (sql <- aggSqls) {
      val base = spark.sql(sql).collect().toSet
      val (got, plan) = withMode("force") {
        val df = spark.sql(sql)
        val rows = df.collect().toSet
        (rows, df.queryExecution.executedPlan.toString)
      }
      assert(got == base, s"results diverged for:\n$sql")
      // exactly ONE hash aggregate left (the final one) — the partial
      // became a Project feeding the exchange. Count only the AQE final
      // plan section (the string repeats the pre-rewrite initial plan).
      val finalSection = plan.split("== Initial Plan ==").head
      val aggs = "HashAggregate".r.findAllIn(finalSection).length
      assert(aggs == 1,
        s"expected 1 HashAggregate after skip, got $aggs:\n$finalSection")
    }
  }

  test("global aggregates and distinct aggregates are never rewritten") {
    graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .createOrReplaceTempView("li")
    for (sql <- Seq(
        "SELECT count(*) AS n, sum(l_quantity) AS q FROM li",
        "SELECT l_returnflag, count(DISTINCT l_orderkey) AS d FROM li GROUP BY l_returnflag")) {
      val base = spark.sql(sql).collect().toSet
      val got = withMode("force")(spark.sql(sql).collect().toSet)
      assert(got == base, s"results diverged for:\n$sql")
    }
  }

  test("auto mode never fires without column stats") {
    graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .createOrReplaceTempView("li")
    val plan = withMode("auto") {
      spark.sql("SELECT l_partkey, count(*) AS n FROM li GROUP BY l_partkey")
        .queryExecution.executedPlan.toString
    }
    assert("HashAggregate".r.findAllIn(plan).length == 2,
      s"auto must keep both phases without stats:\n$plan")
  }
}
