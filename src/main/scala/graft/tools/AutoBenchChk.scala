package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: replicate Bench's heavy session in AUTO mode, collect
  * AutoStats, and print each heavy query's executed plan head + one
  * honest-timed rep — to see whether the auto gates fire with Bench's
  * exact plumbing and whether CBO changes any join plan.
  * Usage: runMain graft.tools.AutoBenchChk <heavyDir> [mode] */
object AutoBenchChk {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "auto"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.shuffle.compress", "true")
      .config("spark.shuffle.spill.compress", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.graft.lowCardAgg", mode)
      .config("spark.graft.bitmapDistinct", mode)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    val ev = spark.read.parquet(s"$dir/events")
    val ord = spark.read.parquet(s"$dir/orders")
    if (mode == "auto") {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.graft.autoStats.maxBytes", (64L << 30).toString)
      Seq(li, ev, ord).foreach(graft.engine.AutoStats.maybeCollect(spark, _))
    }
    def fullExec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    val qs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("h02", () => li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          avg(col("l_discount")), count(lit(1)))),
      ("h04", () => li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")))),
      ("h07", () => ev
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), avg(col("value")))
        .orderBy(col("n").desc).limit(10)),
      ("h09", () => li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        .orderBy(col("rev").desc)))
    qs.foreach { case (name, q) =>
      fullExec(q()) // warm
      val t0 = System.nanoTime(); fullExec(q())
      val sec = (System.nanoTime() - t0) / 1e9
      val df = q(); df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val marks = Seq("LowCardAgg", "bitmap_distinct_count",
        "ShuffledHashJoin", "SortMergeJoin", "BroadcastHashJoin")
        .filter(plan.contains)
      println(f"AUTOCHK $name%s $sec%.3f s  marks=${marks.mkString(",")}")
      println(plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Agg") || l.contains("Exchange"))
        .map(_.trim.take(140)).take(12).mkString("  ", "\n  ", ""))
    }
    spark.stop()
  }
}
