package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure EagerProjection's effect on the h09 join-agg shape. */
object EpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.shuffle.compress", "true")
      .config("spark.shuffle.spill.compress", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ord = spark.read.parquet(s"$dir/orders")
    def h09() = spark.read.parquet(s"$dir/lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc)
    for (on <- Seq(true, false, true)) {
      spark.conf.set("spark.graft.eagerProjection", on.toString)
      println(s"--- eagerProjection=$on")
      if (on) println(h09().queryExecution.optimizedPlan.toString.split("\n").take(6).mkString("\n"))
      h09().count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); h09().count(); (System.nanoTime() - t0) / 1e9 }
      println(f"h09 min=${ts.min}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
