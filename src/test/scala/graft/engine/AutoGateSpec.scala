package graft.engine

import graft.plans.{DistinctToBitmap, LowCardAgg, SmallAggExchange, TruncToFloor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 directive #4: prove the AUTO gates fire in a real session —
  * no `force` anywhere. Bench ran with `spark.graft.lowCardAgg=force` /
  * `bitmapDistinct=force` while GraftSession defaults to stats-gated
  * `auto`; without these plan-shape asserts the shipped wins could be
  * bench-only. Each test drives Snowflake-dialect SQL through a plain
  * GraftSession over the attached lake (AutoStats collects rowCount/NDV
  * lazily on first materialization, plus timestamp ranges for the
  * floored-key bound) and asserts the EXECUTED plan picked up the
  * operator under `auto`.
  *
  * The shared test JVM's SparkSession predates this suite, so the rules
  * GraftExtensions would register at builder time are spliced into the
  * session CLONE the GraftSession plans on (extraOptimizations +
  * reflective AdaptiveRulesHolder patch — same seam as LowCardAggSpec);
  * a production session gets them from
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`, which
  * cloneSession carries through. */
class AutoGateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def splice(s: SparkSession): Unit = {
    // guard each rule individually: other suites splice SUBSETS of these
    // into the shared JVM's session (LowCardAggSpec adds TruncToFloor),
    // so one shared sentinel would skip the rest
    Seq(AutoStats.AttachStats, TruncToFloor, DistinctToBitmap).foreach { r =>
      if (!s.experimental.extraOptimizations.contains(r))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ r
    }
    import org.apache.spark.sql.execution.adaptive.AdaptiveRulesHolder
    val ss = s.sessionState
    val holder = ss.adaptiveRulesHolder
    if (!holder.queryStagePrepRules.contains(LowCardAgg)) {
      val patched = new AdaptiveRulesHolder(
        holder.queryStagePrepRules :+ LowCardAgg :+ SmallAggExchange,
        holder.runtimeOptimizerRules,
        holder.queryStageOptimizerRules,
        holder.queryPostPlannerStrategyRules)
      val f = ss.getClass.getDeclaredFields
        .find(_.getName.contains("adaptiveRulesHolder"))
        .getOrElse(throw new IllegalStateException(
          "no adaptiveRulesHolder field on SessionState"))
      f.setAccessible(true)
      f.set(ss, patched)
    }
  }

  private def newSession(): GraftSession = {
    val gs = new GraftSession(spark)
    gs.attachLake("/root/testdata/sf0.001")
    splice(gs.spark) // what GraftExtensions registers in a real deploy
    gs
  }

  private def executedPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("auto: low-cardinality string key rides LowCardAggExec") {
    val gs = newSession()
    assert(gs.spark.conf.get("spark.graft.lowCardAgg") == "auto")
    val plan = executedPlan(gs.sql("""
      SELECT l_returnflag, count(*) AS n, sum(l_quantity::double) AS q
      FROM lineitem GROUP BY 1"""))
    assert(plan.contains("LowCardAgg"), s"auto did not fire:\n$plan")
  }

  test("auto: COUNT(DISTINCT int) plans the bitmap aggregate") {
    val gs = newSession()
    assert(gs.spark.conf.get("spark.graft.bitmapDistinct") == "auto")
    val plan = executedPlan(gs.sql("""
      SELECT o_orderpriority, count(DISTINCT o_orderkey) AS nd
      FROM orders GROUP BY 1"""))
    assert(plan.contains("bitmap_distinct_count"),
      s"bitmap auto did not fire:\n$plan")
    // and the bitmap partial itself rides the columnar operator
    assert(plan.contains("LowCardAgg"), s"partial not columnar:\n$plan")
  }

  test("auto: floored-timestamp key fires via the ts-range NDV bound") {
    val gs = newSession()
    val plan = executedPlan(gs.sql("""
      SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
      FROM events GROUP BY 1, 2"""))
    assert(plan.contains("LowCardAgg"),
      s"auto did not fire on the floored key:\n$plan")
    // the hour floor is carried in the operator's key spec (3600000000
    // micros), proving TruncToFloor rewrote AND the range bound gated
    assert(plan.contains("3600000000"),
      s"floored key spec missing from the operator:\n$plan")
  }

  test("auto: the gate actually reads stats — tiny maxNdv keeps stock") {
    val gs = newSession()
    gs.spark.conf.set("spark.graft.lowCardAgg.maxNdv", "2")
    try {
      val plan = executedPlan(gs.sql("""
        SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1"""))
      assert(!plan.contains("LowCardAgg"),
        s"fired despite ndv over the bound:\n$plan")
    } finally gs.spark.conf.unset("spark.graft.lowCardAgg.maxNdv")
  }
}
