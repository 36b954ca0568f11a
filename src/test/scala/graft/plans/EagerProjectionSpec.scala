package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{Join, Project}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Eager projection: one-sided aggregate inputs are computed below the
  * join with a strictly narrower side projection, results are unchanged,
  * and the structural gates (no one-sided candidates, no net narrowing)
  * keep the rewrite off. */
class EagerProjectionSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (!s.experimental.extraOptimizations.contains(EagerProjection))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ EagerProjection
    s
  }

  import spark.implicits._

  private def viaParquet(df: DataFrame, name: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ep_$name").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private lazy val fact = viaParquet(
    (1 to 200).map(i => (i % 50, i * 1.5, i * 0.01, i.toLong))
      .toDF("k", "price", "disc", "v"), "fact")
  private lazy val dim = viaParquet(
    (0 until 60).map(k => (k, s"g${k % 4}")).toDF("k", "g"), "dim")

  /** The computing Project directly under the join side, if any. */
  private def pushedProject(df: DataFrame): Option[Project] =
    df.queryExecution.optimizedPlan.collect {
      case Join(l, _, _, _, _) => l
    }.collectFirst {
      case p: Project if !p.projectList.forall(_.isInstanceOf[Attribute]) => p
    }

  private def withRule[T](on: Boolean)(body: => T): T = {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.eagerProjection", on.toString)
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.conf.unset("spark.graft.eagerProjection")
    }
  }

  private def rollup(): DataFrame =
    fact.join(dim, fact("k") === dim("k"))
      .groupBy("g")
      .agg(sum($"price" * (lit(1.0) - $"disc")).as("rev"),
        count(lit(1)).as("n"))
      .orderBy("g")

  test("one-sided aggregate input computes below the join; results equal") {
    val (proj, got) = withRule(on = true) {
      val df = rollup(); (pushedProject(df), df.collect().toSeq)
    }
    val want = withRule(on = false) {
      val df = rollup()
      assert(pushedProject(df).isEmpty, "flag off must disable the rewrite")
      df.collect().toSeq
    }
    assert(proj.isDefined, "expected a computing Project below the join")
    // the narrowed side carries the join key + computed column only —
    // price and disc no longer cross the exchange
    val names = proj.get.projectList.map(_.name).toSet
    assert(names.exists(_.startsWith("_ep")))
    assert(!names.contains("price") && !names.contains("disc"))
    assert(got == want)
  }

  test("grouping expressions push too") {
    withRule(on = true) {
      // group key combines TWO fact columns into one computed value:
      // 16 bytes leave the shuffled row, 8 arrive — net narrowing
      def q() = fact.join(dim, fact("k") === dim("k"))
        .groupBy((($"price" + $"disc") % 7).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n")).orderBy("bucket")
      val df = q()
      assert(pushedProject(df).isDefined)
      val off = withRule(on = false) { q().collect().toSeq }
      assert(df.collect().toSeq == off)
    }

    withRule(on = true) {
      // single-column grouping expression (v % 7): replaces v 1-for-1,
      // no net narrowing — the gate must keep the extraction Project
      val df = fact.join(dim, fact("k") === dim("k"))
        .groupBy((fact("v") % 7).as("bucket"))
        .agg(count(lit(1)).as("n"))
      assert(pushedProject(df).isEmpty)
    }
  }

  test("gates: bare columns, two-sided inputs, and no-net-narrowing stay put") {
    withRule(on = true) {
      // bare attribute input: nothing to compute early
      val bare = fact.join(dim, fact("k") === dim("k"))
        .groupBy("g").agg(sum($"v"))
      assert(pushedProject(bare).isEmpty)
      // expression spans both sides: not movable
      val mixed = fact.join(dim, fact("k") === dim("k"))
        .groupBy(dim("k")).agg(sum($"price" * length($"g")))
      assert(pushedProject(mixed).isEmpty)
      // v*2 replaces v: 8 bytes dropped, 8 added — no net narrowing
      val even = fact.join(dim, fact("k") === dim("k"))
        .groupBy("g").agg(sum($"v" * 2))
      assert(pushedProject(even).isEmpty)
    }
  }

  test("outer joins never rewrite: null-extended rows keep original semantics") {
    withRule(on = true) {
      // coalesce(price*disc, 99) over a LEFT join from dim: unmatched dim
      // rows are null-extended, and the original plan evaluates the
      // coalesce AFTER extension (→ 99); a push below fact would freeze
      // NULL. The rule must leave outer joins alone.
      def outer() = dim.join(fact, dim("k") === fact("k"), "left")
        .groupBy("g")
        .agg(sum(coalesce($"price" * $"disc", lit(99.0))).as("s"))
        .orderBy("g")
      val on = outer()
      assert(pushedProject(on).isEmpty)
      val got = on.collect().toSeq
      withRule(on = false) { assert(outer().collect().toSeq == got) }
    }
  }
}
