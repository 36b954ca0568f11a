package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `classic.Dataset.ofRows`, which is `private[sql]` in
  * Spark 4. Needed to evaluate a Catalyst plan produced by a plan
  * transform (e.g. the dynamic-table AVG partializer rewriting
  * `avg(x)` into `sum(x)` + `count(x)` state columns) as a DataFrame
  * without round-tripping through SQL text. */
object GraftPlans {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
