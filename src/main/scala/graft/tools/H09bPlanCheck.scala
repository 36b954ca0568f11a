package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: assert the heavy-scale h09b bucketed join plan is
  * exchange-free and sort-free against the cached bucketed files. */
object H09bPlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy_57378e9c")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def reg(table: String, src: String, cols: Seq[String], key: String): Unit = {
      val df = spark.read.parquet(s"$dir/$src").select(cols.map(col): _*)
      graft.operators.Bucketing.registerExternalBucketed(
        spark, table, df.schema.toDDL, Seq(key), 32, s"$dir/bucketed_$table")
    }
    reg("graft_h09b_li", "lineitem",
      Seq("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey")
    reg("graft_h09b_ord", "orders",
      Seq("o_orderkey", "o_orderpriority"), "o_orderkey")
    val q = spark.table("graft_h09b_li")
      .join(spark.table("graft_h09b_ord"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    plan.linesIterator.filter(l =>
      l.contains("Sort") || l.contains("Exchange") || l.contains("Join") ||
      l.contains("Scan")).foreach(l => println(l.take(160)))
    // files per bucket
    Seq("graft_h09b_li", "graft_h09b_ord").foreach { t =>
      val fs = new java.io.File(s"$dir/bucketed_$t").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      println(s"$t files=${fs.length}")
    }
    spark.stop()
  }
}
