package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only smoke: checks Spark can read every testdata table. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"OK $t count=${df.count()} schema=${df.schema.simpleString.take(200)}")
      } catch {
        case e: Throwable => println(s"FAIL $t: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
