package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: isolate spark.sql.cbo.enabled's effect on the h09 join-agg
  * shape (AutoStats enables CBO session-wide; the heavy bench regressed
  * 2.7 s → 16.6 s when it landed — find the mechanism). */
object CboProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    val ord = spark.read.parquet(s"$dir/orders")
    def joinAgg() = spark.read.parquet(s"$dir/lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc)
    def time(name: String): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); joinAgg().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-16s min=${reps.min}%6.3f s  reps=${reps.map(r => f"$r%5.2f").mkString(",")}")
    }
    time("warmup")
    spark.conf.set("spark.sql.cbo.enabled", "false")
    time("cbo_off")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    time("cbo_on")
    spark.sql("SET spark.sql.cbo.enabled=false")
    spark.stop()
  }
}
