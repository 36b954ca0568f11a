package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the dictionary-id string-key fast path on the gated
  * two-string-key shape (h02). Usage: runMain graft.tools.DictKeyProbe
  * <heavyDir> [reps]. */
object DictKeyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    def h02() = {
      val df = li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          avg(col("l_discount")), count(lit(1)))
      df.queryExecution.toRdd.count()
    }

    def withConf[T](kv: (String, String)*)(f: => T): T = {
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally kv.foreach { case (k, _) => spark.conf.unset(k) }
    }
    val qs: Seq[(String, () => Any)] = Seq(
      "h02_off" -> (() => withConf("spark.graft.lowCardAgg" -> "off")(h02())),
      "h02_force1" -> (() => withConf("spark.graft.lowCardAgg" -> "force")(h02())),
      "h02_force2" -> (() => withConf("spark.graft.lowCardAgg" -> "force",
        "spark.graft.lowCardAgg.maxStringKeys" -> "2")(h02())))
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
    println(s"DICTKEY $json")
    spark.stop()
  }
}
