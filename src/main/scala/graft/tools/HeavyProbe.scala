package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: isolate where heavy-bench time goes on the replicated
  * events table (scan vs group-key shaping vs aggregate). */
object HeavyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    val ev = spark.read.parquet(s"$dir/events")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s  (rows=$n)")
    }
    time("scan_count")(ev.count())
    time("scan_agg_value")(ev.agg(sum("value")).count())
    time("group_type_only")(ev.groupBy("event_type").count().count())
    time("group_hour_only")(
      ev.groupBy(date_trunc("hour", col("ts"))).count().count())
    time("group_hour_long")(
      ev.groupBy((unix_micros(col("ts").cast("timestamp")) /
        lit(3600000000L)).cast("long")).count().count())
    time("full_h07")(
      ev.groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), avg(col("value")))
        .orderBy(col("n").desc).limit(10).count())
    val ord = spark.read.parquet(s"$dir/orders")
    def joinAgg() = spark.read.parquet(s"$dir/lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc)
    time("h09_smj_default")(joinAgg().count())
    spark.conf.set(
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
    time("h09_aqe_shj")(joinAgg().count())
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    time("h09_prefer_shj")(joinAgg().count())
    for (p <- Seq(32, 64, 128)) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      time(s"h09_shj_parts_$p")(joinAgg().count())
    }
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    val li = spark.read.parquet(s"$dir/lineitem")
    def h03() = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
      .orderBy(col("rev").desc).limit(10)
    time("h03_default")(h03().count())
    spark.conf.set("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
    time("h03_vectorized_map")(h03().count())
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.partialOnly", "false")
    time("h03_twolevel_final")(h03().count())
    spark.stop()
  }
}
