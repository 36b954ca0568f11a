package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the computed-aggregate-input modes on the h05 revenue
  * shape under the honest drain — off (stock whole-stage codegen, the
  * r9-probed winner vs the row projection), row (generated projection,
  * the probed -25% loss), vector (column-at-a-time VecSpec programs).
  * Queries: h05 (filter + global sum(a*(1-b))) and a grouped revenue
  * variant. Usage: runMain graft.tools.CompVecProbe <heavyDir> [reps]
  */
object CompVecProbe {
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
    def fullExec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    def h05() = fullExec(li
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
    def grev() = fullExec(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev"), count(lit(1)).as("n")))
    val cf = "spark.graft.lowCardAgg.computedInputs"
    def withMode[T](m: String)(f: => T): T = {
      spark.conf.set(cf, m)
      try f finally spark.conf.unset(cf)
    }
    val qs: Seq[(String, () => Any)] = Seq(
      "h05_off" -> (() => withMode("off")(h05())),
      "h05_row" -> (() => withMode("row")(h05())),
      "h05_vector" -> (() => withMode("vector")(h05())),
      "grev_off" -> (() => withMode("off")(grev())),
      "grev_row" -> (() => withMode("row")(grev())),
      "grev_vector" -> (() => withMode("vector")(grev())))
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
    println(s"COMPVEC $json")
    spark.stop()
  }
}
