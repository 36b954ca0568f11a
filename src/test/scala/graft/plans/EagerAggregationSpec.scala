package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Eager aggregation: the partial aggregate lands below large inner
  * equi-joins, results are unchanged, and every guard (outer join,
  * DISTINCT, AVG, broadcast-sized side, mixed-side references) keeps the
  * rewrite off. */
class EagerAggregationSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (!s.experimental.extraOptimizations.contains(EagerAggregation))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ EagerAggregation
    s
  }

  import spark.implicits._

  private def viaParquet(df: DataFrame, name: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ea_$name").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  // ~4 fact rows per key, 50 keys; dim has extra (unmatched) keys and a
  // duplicate key to exercise the m-copies soundness argument
  private lazy val fact = viaParquet(
    (1 to 200).map(i => (i % 50, i.toLong, i * 1.5, s"c${i % 3}"))
      .toDF("k", "v", "d", "c"), "fact")
  private lazy val dim = viaParquet(
    ((0 until 60).map(k => (k, s"g${k % 4}")) :+ ((7, "gdup")))
      .toDF("k", "g"), "dim")

  private def preAggregated(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case Join(l, r, _, _, _)
          if l.isInstanceOf[Aggregate] || r.isInstanceOf[Aggregate] => true
    }.nonEmpty

  private def withEager[T](on: Boolean)(body: => T): T = {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.eagerAggregation", on.toString)
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.conf.unset("spark.graft.eagerAggregation")
    }
  }

  private def rollup(): DataFrame =
    fact.join(dim, fact("k") === dim("k"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum($"v" * 2 + 1).as("s"),
        min($"d").as("mn"), max($"d").as("mx"))
      .orderBy("g")

  test("sum/count/min/max rollup rewrites and keeps identical results") {
    val (plan, got) = withEager(on = true) {
      val df = rollup(); (preAggregated(df), df.collect().toSeq)
    }
    val want = withEager(on = false) {
      val df = rollup()
      assert(!preAggregated(df), "flag off must disable the rewrite")
      df.collect().toSeq
    }
    assert(plan, "expected a pre-aggregate below the join")
    assert(got == want)
  }

  test("agg side on the right works too") {
    withEager(on = true) {
      val df = dim.join(fact, dim("k") === fact("k"))
        .groupBy("g").agg(sum($"v").as("s")).orderBy("g")
      assert(preAggregated(df))
      val noRule = withEager(on = false) {
        dim.join(fact, dim("k") === fact("k"))
          .groupBy("g").agg(sum($"v").as("s")).orderBy("g").collect().toSeq
      }
      assert(df.collect().toSeq == noRule)
    }
  }

  test("guards: outer join, distinct, avg, mixed sides, broadcast size") {
    withEager(on = true) {
      val outer = fact.join(dim, fact("k") === dim("k"), "left")
        .groupBy("g").agg(sum($"v"))
      assert(!preAggregated(outer))
      val dist = fact.join(dim, fact("k") === dim("k"))
        .groupBy("g").agg(countDistinct($"v"))
      assert(!preAggregated(dist))
      val av = fact.join(dim, fact("k") === dim("k"))
        .groupBy("g").agg(avg($"v"))
      assert(!preAggregated(av))
      val mixed = fact.join(dim, fact("k") === dim("k"))
        .groupBy("g").agg(sum($"v" + length($"g")))
      assert(!preAggregated(mixed))
    }
    // default 10 MB broadcast threshold: tiny sides ⇒ no rewrite
    spark.conf.set("spark.graft.eagerAggregation", "true")
    try assert(!preAggregated(rollup()))
    finally spark.conf.unset("spark.graft.eagerAggregation")
  }

  test("count survives dim-side duplicate keys (m-copies soundness)") {
    // key 7 appears twice in dim: every key-7 fact row must count twice
    val (got, want) = withEager(on = true) {
      val on = fact.join(dim, fact("k") === dim("k"))
        .groupBy(dim("g")).agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .orderBy("g").collect().toSeq
      val off = withEager(on = false) {
        fact.join(dim, fact("k") === dim("k"))
          .groupBy(dim("g")).agg(count(lit(1)).as("n"), sum($"v").as("s"))
          .orderBy("g").collect().toSeq
      }
      (on, off)
    }
    assert(got == want)
    assert(got.exists(_.getAs[String]("g") == "gdup"))
  }
}
