package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run named gate queries from SparkEntry on a given SF dir. */
object QDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("QDIR", "/root/testdata/sf0.001")
    for (name <- args) {
      val t0 = System.nanoTime()
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val rows = df.collect()
        println(f"OK $name rows=${rows.length} ${(System.nanoTime()-t0)/1e9}%.2fs")
        rows.take(5).foreach(r => println("  " + r))
      } catch {
        case e: Throwable =>
          println(s"FAIL $name: ${e.toString.take(500)}")
      }
    }
    spark.stop()
  }
}
