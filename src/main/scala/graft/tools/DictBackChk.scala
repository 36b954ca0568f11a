package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev check: how many columnar batches of a parquet column arrive
  * dictionary-backed (the precondition for the dict-code fast paths).
  * Usage: runMain graft.tools.DictBackChk <parquetDir> <column> */
object DictBackChk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val col = args(1)
    val scan = spark.read.parquet(args(0)).select(col)
      .queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .get
    val counts = scan
      .executeColumnar().mapPartitions { it =>
        var dict = 0; var plain = 0
        it.foreach { b =>
          b.column(0) match {
            case w: org.apache.spark.sql.execution.vectorized.WritableColumnVector
                if w.hasDictionary => dict += 1
            case _ => plain += 1
          }
        }
        Iterator((dict, plain))
      }.collect()
    println(s"dictBatches=${counts.map(_._1).sum} " +
      s"plainBatches=${counts.map(_._2).sum}")
    spark.stop()
  }
}
