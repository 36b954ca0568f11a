package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: honest A/B of the grouping-free LowCardAgg path on h01/h05. */
object GlobalAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    def full(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    def h01() = li.filter(col("l_quantity") > 25)
      .agg(count(lit(1)), sum(col("l_extendedprice")), avg(col("l_discount")))
    def h05() = li.filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
    def mode[T](m: String)(f: => T): T = {
      spark.conf.set("spark.graft.lowCardAgg", m)
      try f finally spark.conf.set("spark.graft.lowCardAgg", "off")
    }
    val qs: Seq[(String, () => Any)] = Seq(
      "h01_off" -> (() => mode("off")(full(h01()))),
      "h01_force" -> (() => mode("force")(full(h01()))),
      "h05_off" -> (() => mode("off")(full(h05()))),
      "h05_force" -> (() => mode("force")(full(h05()))))
    qs.foreach { case (_, f) => f() }
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      qs.foreach { case (name, f) =>
        val t0 = System.nanoTime(); f()
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    println("GLOBALAGG " + qs.map { case (name, _) =>
      val s = samples(name)
      f""""$name":{"min":${s.min}%.3f,"samples":[${s.map(x => f"$x%.3f").mkString(",")}]}"""
    }.mkString("{", ",", "}"))
    spark.stop()
  }
}
