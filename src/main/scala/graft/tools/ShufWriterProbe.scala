package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the shuffle WRITER choice on the small-output heavy
  * aggregates. With 32 shuffle partitions the bypass-merge writer opens
  * one file per reducer per map task (32 files × 32 tasks per exchange);
  * stage metrics attribute ~40 ms/task to shuffle write for ~1000-row
  * partial outputs. `spark.shuffle.sort.bypassMergeThreshold=0` forces
  * the tungsten-sort writer — ONE spill file per task — which should cut
  * the fixed stage floor these sub-second queries sit on.
  *
  * One JVM per mode (writer picked at shuffle registration):
  * Usage: runMain graft.tools.ShufWriterProbe <heavyDir> <bypass|sort> [reps]
  */
object ShufWriterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.shuffle.compress", "true")
      .config("spark.graft.lowCardAgg", "force")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val b2 = mode match {
      case "bypass" => b // default threshold 200 → bypass at 32 partitions
      case "sort" => b.config("spark.shuffle.sort.bypassMergeThreshold", "0")
      case other => throw new IllegalArgumentException(other)
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    val ev = spark.read.parquet(s"$dir/events")
    val ord = spark.read.parquet(s"$dir/orders")

    val qs: Seq[(String, () => Long)] = Seq(
      "h03" -> (() => li.groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
        .orderBy(col("rev").desc).limit(10).count()),
      "h06" -> (() => li.groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        .filter(col("n") > 100).orderBy(col("q").desc).limit(10).count()),
      "h07" -> (() => ev
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), avg(col("value")))
        .orderBy(col("n").desc).limit(10).count()),
      // the big exchange: h09 ships 60M+15M rows — the sort writer must
      // not regress the real shuffle to win on the small ones
      "h09" -> (() => li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        .orderBy(col("rev").desc).count()))

    qs.foreach { case (_, f) => f() } // warm
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      qs.foreach { case (name, f) =>
        val t0 = System.nanoTime(); f()
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val json = qs.map { case (name, _) =>
      val s = samples(name)
      f""""$name":{"min":${s.min}%.3f,"samples":[${s.map(x => f"$x%.3f").mkString(",")}]}"""
    }.mkString("{", ",", "}")
    println(s"""SHUFWRITER {"mode":"$mode",$json}""".replace("},\"", "},\""))
    spark.stop()
  }
}
