package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev check (round-11 directive #6): the q34-q36 vector-wave gates
  * force LowCardAgg through a CLONED session — confirm the operator
  * actually fires there (a silent non-fire would make the gates
  * vacuous oracle-passes over stock plans). */
object GateFireChk {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("q34_vector_filter_atoms", "q35_dict_combo_fallback_pred",
        "q36_vector_computed_group", "q37_regex_filter_atoms")
      .foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val fired = plan.contains("LowCardAgg")
      println(s"$name fired=$fired")
      if (!fired) { System.err.println(plan); sys.exit(1) }
    }
    spark.stop()
  }
}
