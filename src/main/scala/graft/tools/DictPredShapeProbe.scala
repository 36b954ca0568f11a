package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round-12 directive #7): the round-11 dict-predicate probe
  * showed PARITY on the h08 shape (~9-char values, 1-char needle) and
  * ARGUED the win appears at longer values/needles — this probe tests
  * that claim at the designed shape: 64/128/256-char dictionary-backed
  * strings (100 distinct values, so parquet dictionary-encodes) × an
  * 8-char needle, same filter→group→agg plan as h08. The dict-aware
  * atom pays the `contains` once per distinct code per column chunk
  * and skips per-row string materialization entirely; the row path
  * decodes + scans every row.
  *
  * Usage: runMain graft.tools.DictPredShapeProbe [rows=20000000] [reps=5]
  */
object DictPredShapeProbe {
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
    import spark.implicits._

    val out = new StringBuilder("{\"probe\":\"DictPredShapeProbe\"," +
      s""""rows":$rows,"needle":"ndl_match","shapes":{""")
    val shapes = Seq(64, 128, 256)
    shapes.zipWithIndex.foreach { case (len, si) =>
      val dir = f"/tmp/graft_dictshape_${rows}_$len"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        // 100 distinct values of `len` chars; 25 contain the 9-char
        // needle mid-string. Deterministic (seeded) so reruns compare.
        val rnd = new scala.util.Random(42 + len)
        val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789_"
        def randStr(n: Int): String =
          (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        val values = (0 until 100).map { i =>
          if (i % 4 == 0) {
            val pre = randStr(len / 2)
            pre + "ndl_match" + randStr(len - pre.length - 9)
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
      def q() = t.filter(col("s").like("%ndl_match%"))
        .groupBy("g").agg(count(lit(1)), avg(col("v")))
      def run(mode: Boolean): Double = {
        spark.conf.set("spark.graft.lowCardAgg.dictPredicate", mode.toString)
        val t0 = System.nanoTime()
        q().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      spark.conf.set("spark.graft.lowCardAgg.dictPredicate", "true")
      val a = q().collect().map(_.toString).sorted
      spark.conf.set("spark.graft.lowCardAgg.dictPredicate", "false")
      val b = q().collect().map(_.toString).sorted
      require(a.sameElements(b), s"dictPredicate changed results at len=$len!")
      run(mode = true); run(mode = false)
      val on = scala.collection.mutable.ArrayBuffer.empty[Double]
      val off = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ => on += run(true); off += run(false) }
      out ++= (if (si > 0) "," else "") +
        s""""len$len":{"dict_on":[${on.map(t0 => f"$t0%.3f").mkString(",")}],""" +
        s""""dict_off":[${off.map(t0 => f"$t0%.3f").mkString(",")}],""" +
        s""""min_on":${f"${on.min}%.3f"},"min_off":${f"${off.min}%.3f"},""" +
        s""""speedup":${f"${off.min / on.min}%.2f"}}"""
    }
    out ++= "}}"
    println(out.toString)
    spark.stop()
  }
}
