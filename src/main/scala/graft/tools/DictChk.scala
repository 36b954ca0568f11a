package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DictChk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ENVDBG=" + sys.env.get("GRAFT_LOWCARD_DEBUG") + " flag=" + graft.plans.LowCardAgg.debugTiming)
    val li = spark.read.parquet("/tmp/graft_heavy_57378e9c/lineitem")
    spark.conf.set("spark.graft.lowCardAgg", "force")
    spark.conf.set("spark.graft.lowCardAgg.maxStringKeys", "2")
    val df1 = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")), count(lit(1)))
    df1.collect()
    println("PLAN1: " + df1.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("LowCardAgg")).take(2).mkString(" | "))
    val df = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        avg(col("l_discount")), count(lit(1)))
    df.collect()
    println("PLAN: " + df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("LowCardAgg") || l.contains("HashAggregate"))
      .take(4).mkString(" | "))
    spark.stop()
  }
}
