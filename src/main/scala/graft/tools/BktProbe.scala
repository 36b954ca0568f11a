package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: why does rewriting a 2-files-per-bucket bucketed table
  * through repartition+bucketBy produce misaligned bucket files? */
object BktProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    spark.sql("DROP TABLE IF EXISTS bp_t")
    df.repartition(4, col("k")).write.bucketBy(4, "k").sortBy("k")
      .format("parquet").saveAsTable("bp_t")
    // append → 2 files per bucket
    df.filter(col("k") <= 100).repartition(4, col("k"))
      .write.mode("append").bucketBy(4, "k").sortBy("k")
      .format("parquet").saveAsTable("bp_t")
    val in = spark.table("bp_t")
    val rp = in.repartition(4, col("k"))
    rp.explain("formatted")
    spark.sql("DROP TABLE IF EXISTS bp_t2")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    rp.write.bucketBy(4, "k").sortBy("k").format("parquet").saveAsTable("bp_t2")
    spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    val loc = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath, "bp_t2")
    loc.listFiles().map(_.getName).sorted.foreach(println)
    spark.stop()
  }
}
