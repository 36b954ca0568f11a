package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: does cutting the exchange's partition count help the tiny
  * partial-output aggregates? Their map stage writes numShufflePartitions
  * reducer files per task (bypass writer) that AQE immediately coalesces
  * to one read partition — a stats-gated numPartitions cut would shrink
  * the write fan-out. spark.sql.shuffle.partitions is a session conf, so
  * this A/Bs per query within one JVM, interleaved.
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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.graft.lowCardAgg", "force")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    val ev = spark.read.parquet(s"$dir/events")

    def h06() = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .filter(col("n") > 100).orderBy(col("q").desc).limit(10).count()
    def h07() = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")))
      .orderBy(col("n").desc).limit(10).count()
    def h03() = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
      .orderBy(col("rev").desc).limit(10).count()

    def withParts[T](p: Int)(f: => T): T = {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      try f finally spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    val qs: Seq[(String, () => Any)] = Seq(
      "h06_p32" -> (() => h06()),
      "h06_p4" -> (() => withParts(4)(h06())),
      "h06_p1" -> (() => withParts(1)(h06())),
      "h07_p32" -> (() => h07()),
      "h07_p4" -> (() => withParts(4)(h07())),
      "h07_p1" -> (() => withParts(1)(h07())),
      "h03_p32" -> (() => h03()),
      "h03_p4" -> (() => withParts(4)(h03())))

    qs.foreach { case (_, f) => f() }
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
