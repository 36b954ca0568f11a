package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The date_trunc → FloorTimestamp optimizer rule: plan substitution for
  * fixed-width units under UTC, identical results, calendar units left to
  * Spark. Uses its own SparkSession since the rule loads via
  * spark.sql.extensions. */
class TruncToFloorSpec extends AnyFunSuite {

  // suites share one JVM-wide session, where spark.sql.extensions set at
  // builder time would be ignored — inject the same rule per-session
  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (!s.experimental.extraOptimizations.contains(TruncToFloor))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ TruncToFloor
    s
  }

  import spark.implicits._

  private def ts(s: String) =
    java.sql.Timestamp.valueOf(s)

  /** Literal inputs constant-fold straight through the rule — park the
    * rows in parquet so the optimized plan keeps the expressions. */
  private def viaParquet(df: org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_t2f").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("hour/day truncs rewrite to floor_timestamp with identical results") {
    val df = viaParquet(Seq(
      ts("2024-03-01 12:34:56.789"), ts("1969-12-31 22:10:05.5"),
      ts("2024-02-29 23:59:59.999999"))
      .toDF("t")
      .select(col("t").cast("timestamp_ntz").as("t")))
      .orderBy("t").select(col("t"))
    val truncs0 = df.select(
      date_trunc("hour", col("t")).as("h"),
      date_trunc("minute", col("t")).as("m"),
      date_trunc("day", col("t")).as("d"))
    val plan = truncs0.queryExecution.optimizedPlan.toString
    assert(plan.contains("floor_timestamp"), plan)
    assert(!plan.contains("date_trunc"), plan)
    val rows = truncs0
      .select(truncs0.columns.map(c => col(c).cast("string").as(c)): _*)
      .collect()
    def s(r: Int, c: Int) = rows(r).getString(c)
    // rows come back ordered by t: 1969 < 2024-02-29 < 2024-03-01
    // pre-1970 floors to the EARLIER boundary (floorMod, not %)
    assert(s(0, 0) == "1969-12-31 22:00:00")
    assert(s(0, 2) == "1969-12-31 00:00:00")
    // leap-day boundary
    assert(s(1, 2) == "2024-02-29 00:00:00")
    assert(s(2, 0) == "2024-03-01 12:00:00")
    assert(s(2, 1) == "2024-03-01 12:34:00")
    assert(s(2, 2) == "2024-03-01 00:00:00")
  }

  test("calendar units (month/year) keep Spark's date_trunc") {
    val df = Seq(ts("2024-03-15 12:00:00")).toDF("t")
      .select(col("t").cast("timestamp_ntz").as("t"))
    val m = df.select(date_trunc("month", col("t")).as("m"))
    assert(!m.queryExecution.optimizedPlan.toString.contains("floor_timestamp"))
    assert(m.select(col("m").cast("string")).collect()(0).getString(0) ==
      "2024-03-01 00:00:00")
  }

  test("ltz timestamps rewrite under the UTC session zone, same instants") {
    val df = viaParquet(Seq(ts("2024-07-01 05:30:30")).toDF("t")) // LTZ
    val h = df.select(date_trunc("hour", col("t")).as("h"))
    assert(h.queryExecution.optimizedPlan.toString.contains("floor_timestamp"))
    assert(h.collect()(0).getTimestamp(0) == ts("2024-07-01 05:00:00"))
  }
}
