package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: conf-sweep the non-join heavy aggregate shapes (h02, h03,
  * h06, h07) — Spark's fixed per-query cost (AQE replans, task waves) and
  * hash-aggregate map strategy are the levers left between the current
  * heavy numbers and the DuckDB 2× bar. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "true")
      .config("spark.shuffle.spill.compress", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    val ev = spark.read.parquet(s"$dir/events")

    def h02() = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        avg(col("l_discount")), count(lit(1)))
    def h03() = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
      .orderBy(col("rev").desc).limit(10)
    def h06() = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .filter(col("n") > 100).orderBy(col("q").desc).limit(10)
    def h07() = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")))
      .orderBy(col("n").desc).limit(10)
    val shapes = Seq("h02" -> h02 _, "h03" -> h03 _, "h06" -> h06 _,
      "h07" -> h07 _)

    def sweep(label: String, confs: Map[String, String]): Unit = {
      val saved = confs.keys.map(k =>
        k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val times = shapes.map { case (n, f) =>
        f().count() // warm this conf's codegen
        val samples = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f().count()
          (System.nanoTime() - t0) / 1e9
        }
        n -> samples.min
      }
      println(f"$label%-34s " +
        times.map { case (n, t) => f"$n=$t%.3f" }.mkString("  ") +
        f"  total=${times.map(_._2).sum}%.3f")
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    sweep("baseline(bench confs)", Map.empty)
    sweep("vectorized_map", Map(
      "spark.sql.codegen.aggregate.map.vectorized.enable" -> "true"))
    sweep("twolevel_final", Map(
      "spark.sql.codegen.aggregate.map.twolevel.partialOnly" -> "false"))
    sweep("aqe_off", Map(
      "spark.sql.adaptive.enabled" -> "false"))
    sweep("aqe_off+vectorized", Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.codegen.aggregate.map.vectorized.enable" -> "true"))
    sweep("shuffle_parts_8", Map(
      "spark.sql.shuffle.partitions" -> "8"))
    sweep("aqe_off+parts8+vectorized", Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.codegen.aggregate.map.vectorized.enable" -> "true"))
    spark.stop()
  }
}
