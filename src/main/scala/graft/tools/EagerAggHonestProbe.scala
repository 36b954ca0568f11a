package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round-10 directive #1): re-probe h09's AGG-side levers under
  * the HONEST drain. The round-7 eager-aggregation refutation and the
  * round-8 exchange A/B were both measured with `df.count()` as the
  * drain, which let Catalyst prune the aggregate functions (and h09's
  * ORDER BY) out of the executed plan — the r9 `Bench.fullExec` fix
  * (toRdd.count, every output column produced) invalidates those
  * ledgers for any mode whose cost sits in the aggregate/sort path.
  *
  * Modes (one fresh JVM per invocation; the driving loop interleaves):
  *
  *   base    — h09 exactly as Bench runs it (join → group → sum → sort)
  *   eager   — the Yan-Larson rewrite expressed directly in DataFrames:
  *             lineitem pre-aggregated by l_orderkey below the join
  *             (count + sum partials), join carries one row per key,
  *             final agg re-sums. Semantically what
  *             [[graft.plans.EagerAggregation]] emits when its stats
  *             gate fires; here forced structurally so the measurement
  *             needs no table stats.
  *   proj    — explicit minimal projection before the join (re-confirm
  *             the exchange ships only pruned columns under honest eval)
  *   noorder — h09 without the ORDER BY (diagnostic: what the top sort
  *             costs now that it honestly executes; 5 rows, expect ~0)
  *   tmpfs   — spark.local.dir on /dev/shm (the only near-tie from the
  *             r8 exchange probe; re-check honestly)
  *
  * Prints one JSON line {"mode":…,"reps":[…],"min":…,"loadavg":…} plus
  * an exchange audit. Usage:
  *   runMain graft.tools.EagerAggHonestProbe <heavyDir> <mode> [reps]
  */
object EagerAggHonestProbe {
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
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.shuffle.compress", "true")
      .config("spark.shuffle.spill.compress", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.graft.lowCardAgg", "force")
      .config("spark.graft.bitmapDistinct", "force")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val b2 = mode match {
      case "tmpfs" =>
        val d = "/dev/shm/graft_shuffle"
        new java.io.File(d).mkdirs()
        b.config("spark.local.dir", d)
      case _ => b
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li0 = spark.read.parquet(s"$dir/lineitem")
    val ord0 = spark.read.parquet(s"$dir/orders")
    val (li, ord) =
      if (mode == "proj")
        (li0.select("l_orderkey", "l_extendedprice", "l_discount"),
          ord0.select("o_orderkey", "o_orderpriority"))
      else (li0, ord0)

    def q() = mode match {
      case "eager" =>
        val pre = li
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("pre_n"),
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("pre_rev"))
        pre.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("pre_n")).as("n"), sum(col("pre_rev")).as("rev"))
          .orderBy(col("rev").desc)
      case "noorder" =>
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("rev"))
      case _ =>
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("rev"))
          .orderBy(col("rev").desc)
    }
    // the honest drain: execute the full plan, produce every column
    def fullExec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    fullExec(q()) // warm: codegen + page cache
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); fullExec(q())
      (System.nanoTime() - t0) / 1e9
    }
    val plan = q().queryExecution.executedPlan.toString
    val exch = plan.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("HashAggregate")
        || l.contains("LowCardAgg"))
      .map(_.trim.take(160)).mkString(" | ")
    val load = scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(" ").take(3).mkString(",")
    println(s"""{"mode":"$mode","reps":[${times.map(t => f"$t%.3f")
      .mkString(",")}],"min":${f"${times.min}%.3f"},"loadavg":[$load],"plan":"${
      exch.replace('"', '\'')}"}""")
    spark.stop()
  }
}
