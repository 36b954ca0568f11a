package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: audit physical plans of representative queries for the
  * properties that matter at scale — filter/column pushdown into the
  * parquet scan, broadcast joins for small sides, whole-stage codegen
  * coverage. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_revenue_forecast",
               "q03_topk_unshipped", "q05_nation_revenue", "q21_json_access",
               "x05_cosine_threshold_pairs")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // materialize THIS dataframe's own QueryExecution — count()/write
      // build a new one and would leave df's AQE plan unfinalized
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      def count(pat: String) = pat.r.findAllIn(plan).size
      println(s"=== $n")
      println(s"  PushedFilters: " + (
        "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan)
          .map(_.take(120)).mkString(" | ")))
      println(s"  ReadSchema: " + (
        "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("-").take(160)))
      println(s"  broadcasts=${count("BroadcastHashJoin|BroadcastNestedLoopJoin")}" +
        s" sortMerge=${count("SortMergeJoin")}" +
        s" exchanges=${count("Exchange")}" +
        // formatted explain tags codegen'd nodes "[codegen id : n]"
        s" codegenSpans=${"codegen id : (\\d+)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size}" +
        s" nonCodegenNodes=${count("\\n\\(\\d+\\) (?!.*codegen id)[A-Za-z]+")}")
    }
    spark.stop()
  }
}
