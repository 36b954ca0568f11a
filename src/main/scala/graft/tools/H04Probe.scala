package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: where do h04's honest 5.1s go? Plan + variants. */
object H04Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/tmp/graft_heavy_57378e9c/lineitem")
    def full(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    def h04() = li.groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")))
    // variants
    def h04_two() = li.select("l_returnflag", "l_orderkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)))
    def h04_approx() = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey")))
    println("PLAN:\n" + h04().queryExecution.executedPlan.toString.linesIterator.take(14).mkString("\n"))
    withBm { println("BMPLAN:\n" + h04().queryExecution.executedPlan.toString.linesIterator.take(14).mkString("\n")) }
    def withBm[T](f: => T): T = {
      spark.conf.set("spark.graft.bitmapDistinct", "force")
      try f finally spark.conf.set("spark.graft.bitmapDistinct", "off")
    }
    def withBmCol[T](f: => T): T = {
      spark.conf.set("spark.graft.bitmapDistinct", "force")
      spark.conf.set("spark.graft.lowCardAgg", "force")
      try f finally {
        spark.conf.set("spark.graft.bitmapDistinct", "off")
        spark.conf.set("spark.graft.lowCardAgg", "off")
      }
    }
    import org.apache.spark.sql.execution.FileSourceScanExec
    def ceiling(): Long = {
      val df = li.select("l_returnflag", "l_orderkey")
      val scan = df.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s }.get
      val ix = scan.output.map(_.name).zipWithIndex.toMap
      val (iF, iK) = (ix("l_returnflag"), ix("l_orderkey"))
      scan.executeColumnar().mapPartitions { it =>
        val sets = new java.util.HashMap[Int, graft.functions.BitmapDistinct.PageSet]()
        while (it.hasNext) {
          val b = it.next(); val n = b.numRows()
          val cF = b.column(iF); val cK = b.column(iK)
          var i = 0
          while (i < n) {
            val g = cF.getUTF8String(i).getByte(0).toInt
            var s = sets.get(g)
            if (s == null) { s = new graft.functions.BitmapDistinct.PageSet; sets.put(g, s) }
            s.add(cK.getLong(i))
            i += 1
          }
        }
        java.util.Arrays.asList(sets.size().toLong).iterator().asInstanceOf[java.util.Iterator[Long]] match { case x => new Iterator[Long] { def hasNext = x.hasNext; def next() = x.next() } }
      }.count()
    }
    val qs = Seq("ceiling" -> (() => ceiling()),
      "h04x" -> (() => full(h04())),
      "bitmap" -> (() => withBm(full(h04()))),
      "bmcol" -> (() => withBmCol(full(h04()))),
      "approx" -> (() => full(h04_approx())))
    qs.foreach { case (_, f) => f() }
    (1 to 3).foreach { _ =>
      qs.foreach { case (n, f) =>
        val t0 = System.nanoTime(); f()
        println(f"$n ${(System.nanoTime()-t0)/1e9}%.3f")
      }
    }
    spark.stop()
  }
}
