package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: honest A/B of the direct-address single-int-key table
  * (spark.graft.lowCardAgg.direct) on h03/h06. */
object DirectKeyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.graft.lowCardAgg", "force")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    def full(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    def h03() = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
      .orderBy(col("rev").desc).limit(10)
    def h06() = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .filter(col("n") > 100).orderBy(col("q").desc).limit(10)
    def withDirect[T](on: Boolean)(f: => T): T = {
      spark.conf.set("spark.graft.lowCardAgg.direct", on.toString)
      try f finally spark.conf.unset("spark.graft.lowCardAgg.direct")
    }
    val qs: Seq[(String, () => Any)] = Seq(
      "h03_probe" -> (() => withDirect(false)(full(h03()))),
      "h03_direct" -> (() => withDirect(true)(full(h03()))),
      "h06_probe" -> (() => withDirect(false)(full(h06()))),
      "h06_direct" -> (() => withDirect(true)(full(h06()))))
    qs.foreach { case (_, f) => f() }
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      qs.foreach { case (name, f) =>
        val t0 = System.nanoTime(); f()
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    println("DIRECTKEY " + qs.map { case (name, _) =>
      val s = samples(name)
      f""""$name":{"min":${s.min}%.3f,"samples":[${s.map(x => f"$x%.3f").mkString(",")}]}"""
    }.mkString("{", ",", "}"))
    spark.stop()
  }
}
