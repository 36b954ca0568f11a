package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 directive #8 — the LAST bounded h09 experiment: does a
  * storage-partitioned-join-style read path have anything left to
  * remove from h09b's plan?
  *
  * Storage-partitioned join (DSv2 `KeyGroupedPartitioning`) is the
  * formalization of "both sides arrive pre-partitioned on the join key,
  * so the join needs no exchange". The engine's bucketed layout
  * (CLUSTER BY → `Bucketing.writeBucketedMulti`, one sorted file per
  * bucket) + `bucketedTableScan.outputOrdering=true` already claims the
  * same physical property through the v1 bucketing path: join WITHOUT
  * exchange and WITHOUT sort. This probe verifies the claim on the
  * executed (post-AQE) plan and times the residual alternatives:
  *   - `bucketed`        — h09b exactly as the bench runs it
  *   - `bucketed_sorted` — outputOrdering=false (adds per-task sorts,
  *                         the only node SPJ could also have avoided)
  *   - `raw`             — plain parquet shuffle join (h09 baseline)
  * If `bucketed`'s executed plan shows zero exchanges and zero sorts
  * upstream of the 5-group aggregation, an SPJ read path has NOTHING
  * left to eliminate — the residual vs DuckDB is the final agg exchange
  * (a few KB) and scan+merge cost, and the h09 ledger closes.
  *
  * Usage: runMain graft.tools.H09SpjProbe [heavyDir] [reps]
  */
object H09SpjProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse {
      val base = new java.io.File("/tmp")
      base.listFiles((_, n) => n.startsWith("graft_heavy_"))
        .sortBy(-_.lastModified).headOption
        .map(_.getAbsolutePath)
        .getOrElse(sys.error("no /tmp/graft_heavy_* cache — run Bench first"))
    }
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def register(table: String, src: String, cols: Seq[String],
        key: String): Unit = {
      val loc = s"$dir/bucketed_$table"
      require(new java.io.File(s"$loc/_SUCCESS").exists(),
        s"$loc missing — run Bench once to build the bucketed copies")
      val schema = spark.read.parquet(s"$dir/$src")
        .select(cols.map(col): _*).schema.toDDL
      graft.operators.Bucketing.registerExternalBucketed(
        spark, table, schema, Seq(key), 32, loc)
    }
    register("graft_h09b_li", "lineitem",
      Seq("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey")
    register("graft_h09b_ord", "orders",
      Seq("o_orderkey", "o_orderpriority"), "o_orderkey")

    def h09b(): DataFrame = spark.table("graft_h09b_li")
      .join(spark.table("graft_h09b_ord"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc)
    def h09raw(): DataFrame = spark.read.parquet(s"$dir/lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(spark.read.parquet(s"$dir/orders")
          .select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc)

    def time(fn: () => DataFrame): (Double, String) = {
      var plan = ""
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn()
        df.collect()
        plan = df.queryExecution.executedPlan.toString
        (System.nanoTime() - t0) / 1e9
      }
      (secs.min, plan)
    }
    def nodeCounts(plan: String): (Int, Int) = {
      // post-AQE executed plan: exchanges + sorts upstream of the agg
      val ex = "(?m)^\\s*[+:\\-\\*\\(\\)0-9 ]*Exchange ".r
        .findAllIn(plan).length
      val so = "(?m)^\\s*[+:\\-\\*\\(\\)0-9 ]*Sort ".r
        .findAllIn(plan).length
      (ex, so)
    }

    // warm each shape once
    h09b().collect(); h09raw().collect()

    val (tB, planB) = time(h09b)
    val (exB, soB) = nodeCounts(planB)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
      "false")
    val (tBS, planBS) = time(h09b)
    val (exBS, soBS) = nodeCounts(planBS)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
      "true")
    val (tR, planR) = time(h09raw)
    val (exR, soR) = nodeCounts(planR)

    System.err.println("== bucketed executed plan ==\n" + planB)
    println(
      s"""{"what":"h09 storage-partitioned-join residual probe (round-14 directive #8)","dir":"$dir","reps":$reps,""" +
      s""""bucketed":{"min_sec":$tB,"exchanges":$exB,"sorts":$soB},""" +
      s""""bucketed_sorted":{"min_sec":$tBS,"exchanges":$exBS,"sorts":$soBS},""" +
      s""""raw":{"min_sec":$tR,"exchanges":$exR,"sorts":$soR}}""")
    spark.stop()
  }
}
