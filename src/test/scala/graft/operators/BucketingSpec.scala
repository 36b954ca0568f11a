package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: correct results AND a shuffle-free plan. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    // force a non-broadcast plan so bucketing is what kills the shuffle
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()

  test("bucketed join runs without exchanges and matches plain join") {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val customer = graft.Tables.load(spark, "/root/testdata/sf0.001", "customer")

    Bucketing.writeBucketed(
      orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumnRenamed("o_custkey", "custkey"),
      "orders_b", "custkey", buckets = 4)
    Bucketing.writeBucketed(
      customer.select("c_custkey", "c_mktsegment")
        .withColumnRenamed("c_custkey", "custkey"),
      "customer_b", "custkey", buckets = 4)

    val joined = Bucketing.coLocatedJoin(spark, "orders_b", "customer_b", "custkey")
    val expected = orders.join(
      customer, orders("o_custkey") === customer("c_custkey")).count()
    assert(joined.count() == expected)

    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n$plan")

    spark.sql("DROP TABLE orders_b")
    spark.sql("DROP TABLE customer_b")
  }
}
