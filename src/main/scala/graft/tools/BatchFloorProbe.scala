package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: two untested levers under the ~0.19 s small-aggregate stage
  * floor (probes/lowcard_agg.json stage_analysis — map stage walls
  * 188-198 ms with only ~35 ms/task of aggregation cpu):
  *
  *  - `spark.sql.parquet.columnarReaderBatchSize` (default 4096): the
  *    LowCardAgg passes re-dispatch per BATCH (hoisted locals die at the
  *    batch boundary, per-batch key-materialization arrays are re-read),
  *    so 60 M rows = ~15 k batch dispatches; 16 k/64 k rows per batch
  *    cuts that 4-16×.
  *  - `spark.sql.files.maxPartitionBytes` (default 128 m): the stage is
  *    fixed-cost-bound (task launch + parquet reader init + shuffle
  *    commit ≫ agg cpu), so FEWER, larger tasks may lower wall even
  *    though cores idle.
  *
  * Interleaved A/B within one JVM; both confs are runtime-settable and
  * re-read because each call rebuilds its DataFrame (fresh plan) and the
  * reader batch size binds at executor-side reader creation.
  *
  * Usage: runMain graft.tools.BatchFloorProbe <heavyDir> [reps]
  */
object BatchFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 6
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

    def h03() = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
      .orderBy(col("rev").desc).limit(10).count()
    def h06() = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .filter(col("n") > 100).orderBy(col("q").desc).limit(10).count()
    def h07() = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")))
      .orderBy(col("n").desc).limit(10).count()

    val Batch = "spark.sql.parquet.columnarReaderBatchSize"
    val Split = "spark.sql.files.maxPartitionBytes"
    def withConf[T](kv: (String, String)*)(f: => T): T = {
      val saved = kv.map { case (k, _) => k -> spark.conf.get(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
    }

    val shapes = Seq[(String, () => Any)](
      "h03" -> (() => h03()), "h06" -> (() => h06()), "h07" -> (() => h07()))
    val variants = Seq[(String, Seq[(String, String)])](
      "base" -> Nil,
      "b16k" -> Seq(Batch -> "16384"),
      "b64k" -> Seq(Batch -> "65536"),
      "split512" -> Seq(Split -> "536870912"),
      "b64k_split512" -> Seq(Batch -> "65536", Split -> "536870912"))
    val qs: Seq[(String, () => Any)] = for {
      (sn, f) <- shapes; (vn, confs) <- variants
    } yield s"${sn}_$vn" -> (() => withConf(confs: _*)(f()))

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
    println(s"BATCHFLOOR $json")
    spark.stop()
  }
}
