package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round-8 directive #2): A/B h09's EXCHANGE path — the one
  * lever class not yet probed on the fact-fact join that carries the
  * heavy pair's residual (~1.5 s of the ~2.1 s Spark−DuckDB gap; the
  * agg-side levers are probe-closed: key encoding NO WIN, skip-partial
  * 3× WORSE, eager-agg 2.7× worse).
  *
  * One JVM per (mode, invocation) — the driving script interleaves
  * fresh JVMs so JIT/page-cache state can't favor a mode. Modes:
  *
  *   base    — Bench's exact confs (32 partitions, /tmp local dir,
  *             32k file buffer)
  *   p64/p128 — spark.sql.shuffle.partitions 64 / 128 (smaller build
  *             sides per task, more parallel fetches; AQE may coalesce)
  *   tmpfs   — spark.local.dir on /dev/shm (true tmpfs; /tmp here is
  *             ext4, so shuffle writes go through the page cache but
  *             carry fs-journal overhead)
  *   buf1m   — spark.shuffle.file.buffer=1m (fewer flushes per map
  *             task writing 32 partition streams)
  *   proj    — explicit 3-column/2-column projection before the join,
  *             in case the scan→exchange path ships unused columns
  *             (Catalyst should prune; this confirms it's not the gap)
  *   combo   — every individually-plausible lever at once
  *
  * Prints one JSON line: {"mode":…,"reps":[…],"min":…} plus the
  * exchange rows of the executed plan for the projection audit.
  *
  * Usage: runMain graft.tools.H09ExchangeProbe <heavyDir> <mode> [reps]
  */
object H09ExchangeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        mode match { case "p64" => "64"; case "p128" => "128"; case _ => "32" })
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.shuffle.compress", "true")
      .config("spark.shuffle.spill.compress", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val b2 = mode match {
      case "tmpfs" | "combo" =>
        val d = "/dev/shm/graft_shuffle"
        new java.io.File(d).mkdirs()
        val w = b.config("spark.local.dir", d)
        if (mode == "combo") w.config("spark.shuffle.file.buffer", "1m")
        else w
      case "buf1m" => b.config("spark.shuffle.file.buffer", "1m")
      case _ => b
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li0 = spark.read.parquet(s"$dir/lineitem")
    val ord0 = spark.read.parquet(s"$dir/orders")
    val (li, ord) =
      if (mode == "proj" || mode == "combo")
        (li0.select("l_orderkey", "l_extendedprice", "l_discount"),
          ord0.select("o_orderkey", "o_orderpriority"))
      else (li0, ord0)
    def q() = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc)
    q().count() // warm (codegen + page cache)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); q().count()
      (System.nanoTime() - t0) / 1e9
    }
    // projection audit: what actually crosses the exchanges
    val plan = q().queryExecution.executedPlan.toString
    val exch = plan.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("ReadSchema"))
      .map(_.trim.take(200)).mkString(" | ")
    println(s"""{"mode":"$mode","reps":[${times.map(t => f"$t%.3f")
      .mkString(",")}],"min":${f"${times.min}%.3f"},"exchange":"${
      exch.replace('"', '\'')}"}""")
    spark.stop()
  }
}
