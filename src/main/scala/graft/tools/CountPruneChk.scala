package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CountPruneChk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/tmp/graft_heavy_57378e9c/lineitem")
    val h02 = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        avg(col("l_discount")), count(lit(1)))
    val h04 = li.groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")))
    for ((n, df) <- Seq("h02" -> h02, "h04" -> h04)) {
      val cnt = df.groupBy().count()
      println(s"$n OPT: " + cnt.queryExecution.optimizedPlan.toString
        .linesIterator.take(4).mkString(" § "))
    }
    spark.stop()
  }
}
