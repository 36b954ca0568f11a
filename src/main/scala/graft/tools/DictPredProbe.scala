package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round-11 directive #3, h08): A/B the dictionary-aware
  * string predicate — evaluate `contains` once per distinct dictionary
  * code, cached per Dictionary object (column chunk) — against the
  * per-row atom on the h08 shape (`props LIKE '%a%'` over the heavy
  * events table; props has ~100 distinct values, so the dict path pays
  * ~100 contains per chunk instead of one per row).
  *
  * Both modes run in ONE JVM alternating (the lever is a runtime conf
  * read at plan time), interleaved to split drift evenly.
  *
  * Usage: runMain graft.tools.DictPredProbe <heavyDir> [reps]
  */
object DictPredProbe {
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
    val ev = spark.read.parquet(s"$dir/events")
    def q() = ev.filter(col("props").like("%a%"))
      .groupBy("event_type")
      .agg(count(lit(1)), avg(col("value")))
    def drain(): Unit = { q().queryExecution.toRdd.count(); () }
    def run(mode: Boolean): Double = {
      spark.conf.set("spark.graft.lowCardAgg.dictPredicate", mode.toString)
      val t0 = System.nanoTime(); drain(); (System.nanoTime() - t0) / 1e9
    }
    // correctness cross-check before timing
    spark.conf.set("spark.graft.lowCardAgg.dictPredicate", "true")
    val a = q().collect().map(_.toString).sorted
    spark.conf.set("spark.graft.lowCardAgg.dictPredicate", "false")
    val b = q().collect().map(_.toString).sorted
    require(a.sameElements(b), "dictPredicate changed results!")
    run(mode = true); run(mode = false) // warm both codepaths
    val on = scala.collection.mutable.ArrayBuffer.empty[Double]
    val off = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ => on += run(true); off += run(false) }
    println(s"""{"query":"h08","dict_on":[${on.map(t => f"$t%.3f")
      .mkString(",")}],"dict_off":[${off.map(t => f"$t%.3f").mkString(",")}],""" +
      s""""min_on":${f"${on.min}%.3f"},"min_off":${f"${off.min}%.3f"}}""")
    spark.stop()
  }
}
