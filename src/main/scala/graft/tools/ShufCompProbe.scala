package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B shuffle compression on the h09 join shape (core conf,
  * fixed at session start — needs its own JVM per setting). */
object ShufCompProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val compress = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.shuffle.compress", compress)
      .config("spark.shuffle.spill.compress", compress)
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
    h09().count() // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); h09().count(); (System.nanoTime() - t0) / 1e9 }
    println(f"h09 compress=$compress min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
