package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the h09 plain-parquet join with and without
  * spark.sql.legacy.bucketedTableScan.outputOrdering, which the bench
  * session now sets for h09b's sake — it should be a no-op for
  * non-bucketed scans, but the round-6 official run recorded h09 6×
  * slower than the same-morning run without it. */
object H09ConfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy_57378e9c")
    val conf = args.lift(1).getOrElse("false")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.shuffle.compress", "true")
      .config("spark.shuffle.spill.compress", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", conf)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    val ord = spark.read.parquet(s"$dir/orders")
    def q() = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc)
    q().count() // warm
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); q().count()
      println(f"h09 outputOrdering=$conf rep$i ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    println(q().queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Sort")).map(_.take(120)).mkString("\n"))
    spark.stop()
  }
}
