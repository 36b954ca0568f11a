package org.apache.spark.sql

/** Bridge to `Observation.getOrEmpty`, which is `private[sql]` in Spark 4.
  * The engine reads observed metrics right after the consuming action
  * returned; the non-blocking accessor lets degenerate zero-task plans
  * (where no metric event ever fires) fall back to a read-back count
  * instead of hanging in the blocking `get`. */
object GraftObservation {
  def getOrEmpty(o: Observation): Map[String, Any] = o.getOrEmpty
}
