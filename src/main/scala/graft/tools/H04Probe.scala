package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: where do h04's honest 5.1s go? Plan + variants. */
object H04Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/tmp/graft_heavy_57378e9c/lineitem")
    def full(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    def h04() = li.groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")))
    // variants
    def h04_two() = li.select("l_returnflag", "l_orderkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)))
    def h04_approx() = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey")))
    println("PLAN:\n" + h04().queryExecution.executedPlan.toString.linesIterator.take(14).mkString("\n"))
    val qs = Seq("h04" -> (() => full(h04())), "two" -> (() => full(h04_two())),
      "approx" -> (() => full(h04_approx())))
    qs.foreach { case (_, f) => f() }
    (1 to 3).foreach { _ =>
      qs.foreach { case (n, f) =>
        val t0 = System.nanoTime(); f()
        println(f"$n ${(System.nanoTime()-t0)/1e9}%.3f")
      }
    }
    spark.stop()
  }
}
