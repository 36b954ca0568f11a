package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B [[graft.plans.SkipPartialAggregation]] on the heavy
  * aggregate shapes. One JVM per mode (the rule list is fixed at session
  * start); the driving script interleaves fresh-JVM runs of both modes
  * so a load transient cannot sit on one side.
  *
  * Usage: runMain graft.tools.SkipPartialProbe <heavyDir> <off|force> [reps]
  * Prints one line per query: `skipPartial=<mode> <name> min=<s> all=[…]`.
  */
object SkipPartialProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.skipPartialAggregation", mode)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    val queries: Seq[(String, () => Long)] = Seq(
      ("h03_group_highcard_topk", () => li.groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
        .orderBy(col("rev").desc).limit(10).count()),
      ("h02_group_lowcard", () => li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          avg(col("l_discount")), count(lit(1))).count()),
      ("h04_count_distinct", () => li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey"))).count()),
      ("h06_having_topk", () => li.groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        .filter(col("n") > 100).orderBy(col("q").desc).limit(10).count()))
    queries.foreach { case (_, fn) => fn() } // warm
    queries.foreach { case (name, fn) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9 }
      println(f"skipPartial=$mode $name min=${ts.min}%.3f " +
        s"all=[${ts.map(t => f"$t%.3f").mkString(",")}]")
    }
    spark.stop()
  }
}
