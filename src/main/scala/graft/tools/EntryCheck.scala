package graft.tools
import org.apache.spark.sql.SparkSession
object EntryCheck {
  def main(args: Array[String]): Unit = {
    // deliberately vanilla: the driver's smoke session may not carry our configs
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println("ENTRY rows=" + df.count() + " cols=" + df.columns.mkString(","))
    spark.stop()
  }
}
