package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round-11 directive #3, h07): where does h07's wall time go?
  * Runs the h07 shape (group by date_trunc(hour, ts) × event_type over
  * the heavy events table) under LowCardAgg force, with and without
  * GRAFT_LOWCARD_DEBUG=1 — the per-partition ext/hash/probe/agg marks
  * say whether any in-operator pass is worth vectorizing further, or
  * whether the residual is the fixed per-stage scheduler/codegen floor
  * (the r10 verdict's hypothesis; h07 is 3.2× DuckDB at a 190 ms
  * absolute but 1.6× at repl=400).
  *
  * Usage: GRAFT_LOWCARD_DEBUG=1 runMain graft.tools.H07Breakdown <dir>
  */
object H07Breakdown {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy_57378e9c")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.graft.lowCardAgg", "force")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet(s"$dir/events")
    def q() = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")))
      .orderBy(col("n").desc).limit(10)
    def drain(): Unit = { q().queryExecution.toRdd.count(); () }
    drain() // warm
    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); drain(); (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"query":"h07","reps":[${times.map(t => f"$t%.3f")
      .mkString(",")}],"min":${f"${times.min}%.3f"}}""")
    spark.stop()
  }
}
