package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the codegen hash-aggregate fast-map knobs on the heavy
  * agg-residual shapes (h03/h06/h07 — the queries where DuckDB's
  * vectorized perfect-hash aggregation still beats Spark's row-based
  * JVM hash agg 2-3×). Spark ships two first-level fast maps for
  * partial aggregation — the default row-based one and a VECTORIZED one
  * (`spark.sql.codegen.aggregate.map.vectorized.enable`, off by
  * default) — plus a capacity knob
  * (`spark.sql.codegen.aggregate.fastHashMap.capacityBit`, default 16 =
  * 64k slots). h03's group key (l_partkey, ~20k NDV at sf0.1 — the
  * heavy generator replicates rows without offsetting part keys) fits
  * the fast map; h06 (l_suppkey, ~1k) and h02 (9 groups) sit deep
  * inside it. Probing whether the vectorized map or a bigger first
  * level moves the residual.
  *
  * One JVM per mode (codegen caches per session). Modes:
  *   base        — stock confs (what Bench runs)
  *   vec         — vectorized fast map on
  *   cap20       — row-based fast map, 1M-slot first level
  *   veccap20    — both
  *
  * Usage: runMain graft.tools.AggMapProbe <heavyDir> <mode> [reps]
  */
object AggMapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val b2 = mode match {
      case "base" => b
      case "vec" =>
        b.config("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
      case "cap20" =>
        b.config("spark.sql.codegen.aggregate.fastHashMap.capacityBit", "20")
      case "veccap20" =>
        b.config("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
          .config("spark.sql.codegen.aggregate.fastHashMap.capacityBit", "20")
      case other => throw new IllegalArgumentException(other)
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    val ev = spark.read.parquet(s"$dir/events")
    val queries: Seq[(String, () => Long)] = Seq(
      ("h03_group_highcard_topk", () => li.groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
        .orderBy(col("rev").desc).limit(10).count()),
      ("h06_having_topk", () => li.groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        .filter(col("n") > 100).orderBy(col("q").desc).limit(10).count()),
      ("h07_events_hourly", () => ev
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), avg(col("value")))
        .orderBy(col("n").desc).limit(10).count()),
      // regression guards: the low-card and count-distinct shapes must
      // not pay for whatever helps the high-card ones
      ("h02_group_lowcard", () => li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          avg(col("l_discount")), count(lit(1))).count()),
      ("h04_count_distinct", () => li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey"))).count()))
    queries.foreach { case (_, fn) => fn() } // warm
    queries.foreach { case (name, fn) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9 }
      println(f"aggmap=$mode $name min=${ts.min}%.3f " +
        s"all=[${ts.map(t => f"$t%.3f").mkString(",")}]")
    }
    spark.stop()
  }
}
