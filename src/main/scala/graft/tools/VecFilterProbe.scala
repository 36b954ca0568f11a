package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the vectorized residual-predicate mask
  * (`spark.graft.lowCardAgg.vectorFilter`) against the generated
  * per-row Predicate, honest drain, interleaved min-of-N in one JVM.
  * Queries: h01 (double cmp, global agg), h08 (string contains,
  * grouped), plus a filtered GROUP BY (cmp + null test conjunction).
  * Usage: runMain graft.tools.VecFilterProbe <heavyDir> [reps]
  */
object VecFilterProbe {
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
    def h01() = fullExec(li.filter(col("l_quantity") > 25)
      .agg(count(lit(1)), sum(col("l_extendedprice")),
        avg(col("l_discount"))))
    def h08() = fullExec(ev.filter(col("props").like("%a%"))
      .groupBy("event_type").agg(count(lit(1)), avg(col("value"))))
    def fgb() = fullExec(li
      .filter(col("l_quantity") > 10 && col("l_discount") <= 0.05 &&
        col("l_returnflag").isNotNull)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s")))
    val cf = "spark.graft.lowCardAgg.vectorFilter"
    def withVf[T](on: Boolean)(f: => T): T = {
      spark.conf.set(cf, on.toString)
      try f finally spark.conf.unset(cf)
    }
    val qs: Seq[(String, () => Any)] = Seq(
      "h01_vec" -> (() => withVf(true)(h01())),
      "h01_pred" -> (() => withVf(false)(h01())),
      "h08_vec" -> (() => withVf(true)(h08())),
      "h08_pred" -> (() => withVf(false)(h08())),
      "fgb_vec" -> (() => withVf(true)(fgb())),
      "fgb_pred" -> (() => withVf(false)(fgb())))
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
    println(s"VECFILTER $json")
    spark.stop()
  }
}
