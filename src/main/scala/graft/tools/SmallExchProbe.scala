package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: size the exchange above a LowCardAggExec partial (the
  * SHIPPED lever, `spark.graft.lowCardAgg.shufflePartitions`) — the
  * tiny partial outputs pay numShufflePartitions reducer files per map
  * task that AQE coalesces straight back to one read partition.
  *
  * Round-10 re-probe (directive #5): the original A/B used `.count()`
  * as the drain (Catalyst pruned aggregate values — probes/
  * small_exchange.json numbers are pre-honest-eval) and varied the
  * SESSION shuffle partitions rather than the shipped conf. This
  * version drives `spark.graft.lowCardAgg.shufflePartitions` itself at
  * {off(0 → 32), 4 (shipped default), 2, 1} under the honest
  * `toRdd.count` drain, interleaved within one JVM, on the four
  * small-partial heavy queries (h02/h06/h07/h08).
  *
  * Usage: runMain graft.tools.SmallExchProbe <heavyDir> [reps]
  */
object SmallExchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.graft.lowCardAgg", "force")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    val ev = spark.read.parquet(s"$dir/events")

    def fullExec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    def h02() = fullExec(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        avg(col("l_discount")), count(lit(1))))
    def h06() = fullExec(li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .filter(col("n") > 100).orderBy(col("q").desc).limit(10))
    def h07() = fullExec(ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")))
      .orderBy(col("n").desc).limit(10))
    def h08() = fullExec(ev.filter(col("props").like("%a%"))
      .groupBy("event_type").agg(count(lit(1)), avg(col("value"))))

    val shufConf = "spark.graft.lowCardAgg.shufflePartitions"
    def withShuf[T](p: Int)(f: => T): T = {
      spark.conf.set(shufConf, p.toString)
      try f finally spark.conf.unset(shufConf)
    }
    val base: Seq[(String, () => Any)] = Seq(
      "h02" -> (() => h02()), "h06" -> (() => h06()),
      "h07" -> (() => h07()), "h08" -> (() => h08()))
    val qs: Seq[(String, () => Any)] = base.flatMap { case (n, f) =>
      Seq(s"${n}_off" -> (() => withShuf(0)(f())),
        s"${n}_p4" -> (() => withShuf(4)(f())),
        s"${n}_p2" -> (() => withShuf(2)(f())),
        s"${n}_p1" -> (() => withShuf(1)(f())))
    }

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
    println(s"SMALLEXCH $json")
    spark.stop()
  }
}
