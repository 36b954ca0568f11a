package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the dictionary-code combo cache
  * (`spark.graft.lowCardAgg.dictCombo`) on the string-keyed heavy
  * group-bys, honest drain, interleaved min-of-N in one JVM.
  * h02 = two dictionary string keys; h08 = one (+ contains filter);
  * h04 = one string key + bitmap distinct.
  * Usage: runMain graft.tools.DictComboProbe <heavyDir> [reps]
  */
object DictComboProbe {
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
      .config("spark.graft.bitmapDistinct", "force")
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
    def h08() = fullExec(ev.filter(col("props").like("%a%"))
      .groupBy("event_type").agg(count(lit(1)), avg(col("value"))))
    def h04() = fullExec(li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey"))))
    val cf = "spark.graft.lowCardAgg.dictCombo"
    def withCombo[T](on: Boolean)(f: => T): T = {
      spark.conf.set(cf, on.toString)
      try f finally spark.conf.unset(cf)
    }
    val qs: Seq[(String, () => Any)] = Seq(
      "h02_combo" -> (() => withCombo(true)(h02())),
      "h02_probe" -> (() => withCombo(false)(h02())),
      "h08_combo" -> (() => withCombo(true)(h08())),
      "h08_probe" -> (() => withCombo(false)(h08())),
      "h04_combo" -> (() => withCombo(true)(h04())),
      "h04_probe" -> (() => withCombo(false)(h04())))
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
    println(s"DICTCOMBO $json")
    spark.stop()
  }
}
