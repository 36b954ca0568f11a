package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev one-off: h04's bitmap-partial exchange at shrink counts 1/2/4/8/32
  * under the honest drain — the SmallExchProbe set (h02/h06/h07/h08)
  * carries cheap VALUE merges, but h04's partial is object state
  * (PageSet OR-merge), where final-stage parallelism is the cost.
  * Usage: runMain graft.tools.H04ShufChk <heavyDir> [reps] */
object H04ShufChk {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 4
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
    def fullExec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    def h04() = fullExec(li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey"))))
    val conf = "spark.graft.lowCardAgg.shufflePartitions"
    val modes = Seq(1, 2, 4, 8, 32)
    modes.foreach { p => spark.conf.set(conf, p.toString); h04() } // warm
    val samples = scala.collection.mutable.Map.empty[Int, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      modes.foreach { p =>
        spark.conf.set(conf, p.toString)
        val t0 = System.nanoTime(); h04()
        samples(p) = samples(p) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    println("H04SHUF " + modes.map(p =>
      f""""p$p":{"min":${samples(p).min}%.3f,"samples":[${
        samples(p).map(x => f"$x%.3f").mkString(",")}]}""")
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
