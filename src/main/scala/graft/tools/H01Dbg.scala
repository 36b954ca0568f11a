package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev one-off: h01 (filtered global agg) with GRAFT_LOWCARD_DEBUG per-
  * partition breakdowns, to see what the residual-predicate pass costs.
  * Usage: runMain graft.tools.H01Dbg <heavyDir> */
object H01Dbg {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
    val li = spark.read.parquet(s"$dir/lineitem")
    def fullExec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    def h01() = fullExec(li.filter(col("l_quantity") > 25)
      .agg(count(lit(1)), sum(col("l_extendedprice")),
        avg(col("l_discount"))))
    def h01nf() = fullExec(li
      .agg(count(lit(1)), sum(col("l_extendedprice")),
        avg(col("l_discount"))))
    h01(); h01nf()
    val t0 = System.nanoTime(); h01()
    val s1 = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime(); h01nf()
    val s2 = (System.nanoTime() - t1) / 1e9
    println(f"H01DBG filtered=$s1%.3f unfiltered=$s2%.3f")
    spark.stop()
  }
}
