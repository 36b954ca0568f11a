package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 12): payoff measurement for [[graft.plans.LowCardAgg]]'s
  * RegexAtom — the EXPENSIVE predicate the dictionary verdict cache was
  * built for. probes/dict_predicate_shape.json closed the cheap atoms
  * (contains/prefix/suffix/equals) at parity because a `contains` over
  * even a 256-char value costs ~20-40 ns; a compiled-regex `find` costs
  * ~0.1-1 µs, so evaluating once per distinct dictionary code per column
  * chunk instead of once per row (rows/NDV fewer matches) should finally
  * show daylight. Three modes over the same parquet:
  *   dict_on  — RegexAtom with the dictionary verdict cache
  *   dict_off — RegexAtom per-row (reused Matcher, no per-row Pattern)
  *   stock    — spark.graft.lowCardAgg=off → Spark codegen RLike+HashAgg
  *
  * Usage: runMain graft.tools.DictRegexProbe [rows=20000000] [reps=5]
  */
object DictRegexProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 20000000L
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

    val len = 64
    val dir = f"/tmp/graft_dictregex_${rows}_$len"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      // 100 distinct 64-char values; 25 embed a token the regex finds.
      val rnd = new scala.util.Random(42 + len)
      val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789_"
      def randStr(n: Int): String =
        (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val values = (0 until 100).map { i =>
        if (i % 4 == 0) {
          val pre = randStr(len / 2)
          pre + "ndl_" + randStr(4) + "_match" + // regex-findable token
            randStr(len - pre.length - 14)
        } else randStr(len)
      }
      val vb = spark.sparkContext.broadcast(values.toArray)
      spark.range(rows)
        .select(col("id"),
          (col("id") % 100).cast("int").as("code"),
          (col("id") % 10).cast("int").as("g"),
          (col("id") % 1000 / 10.0).as("v"))
        .withColumn("s", udf((c: Int) => vb.value(c)).apply(col("code")))
        .drop("code")
        .repartition(32)
        .write.mode("overwrite").parquet(dir)
    }
    val t = spark.read.parquet(dir)
    def q() = t.filter(col("s").rlike("ndl_[a-z0-9]{4}_match"))
      .groupBy("g").agg(count(lit(1)), avg(col("v")))
    def run(mode: String, dict: Boolean): Double = {
      spark.conf.set("spark.graft.lowCardAgg", mode)
      spark.conf.set("spark.graft.lowCardAgg.dictPredicate", dict.toString)
      val t0 = System.nanoTime()
      q().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    // correctness cross-check across all three modes first
    def snap(): Array[String] = q().collect().map(_.toString).sorted
    spark.conf.set("spark.graft.lowCardAgg", "force")
    spark.conf.set("spark.graft.lowCardAgg.dictPredicate", "true")
    val a = snap()
    spark.conf.set("spark.graft.lowCardAgg.dictPredicate", "false")
    val b = snap()
    spark.conf.set("spark.graft.lowCardAgg", "off")
    val c = snap()
    require(a.sameElements(b) && a.sameElements(c),
      "modes disagree on the regex filter result!")
    // warm
    run("force", dict = true); run("force", dict = false); run("off", dict = true)
    val on = scala.collection.mutable.ArrayBuffer.empty[Double]
    val off = scala.collection.mutable.ArrayBuffer.empty[Double]
    val stock = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      on += run("force", dict = true)
      off += run("force", dict = false)
      stock += run("off", dict = true)
    }
    def arr(x: Seq[Double]) = x.map(v => f"$v%.3f").mkString("[", ",", "]")
    println(s"""{"probe":"DictRegexProbe","rows":$rows,"len":$len,""" +
      s""""pattern":"ndl_[a-z0-9]{4}_match","ndv":100,""" +
      s""""dict_on":${arr(on.toSeq)},"dict_off":${arr(off.toSeq)},""" +
      s""""stock":${arr(stock.toSeq)},""" +
      s""""min_on":${f"${on.min}%.3f"},"min_off":${f"${off.min}%.3f"},""" +
      s""""min_stock":${f"${stock.min}%.3f"},""" +
      s""""speedup_vs_row":${f"${off.min / on.min}%.2f"},""" +
      s""""speedup_vs_stock":${f"${stock.min / on.min}%.2f"}}""")
    spark.stop()
  }
}
