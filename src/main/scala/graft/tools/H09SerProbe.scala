package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round-11 directive #4): A/B h09's exchange SERIALIZATION —
  * the last unprobed lever class on the fact-fact join (eager-agg,
  * projection, tmpfs, ORDER BY, partition counts, file buffer are all
  * honestly closed; see probes/h09_exchange.json, eager_agg_honest.json).
  * The hypothesis: 60 M narrow rows may be encode/decode-bound on the
  * wire format, so the codec (and its block size) is the lever.
  *
  * One JVM per (mode, invocation) — codecs are core confs, start-fixed;
  * the driving script interleaves fresh JVMs across sweeps. Modes:
  *
  *   base     — Bench's exact confs (lz4, 32k blocks, 32k file buffer)
  *   zstd     — spark.io.compression.codec=zstd (better ratio, more CPU)
  *   snappy   — snappy (faster encode, worse ratio than lz4 usually)
  *   nocomp   — spark.shuffle.compress=false (pure page-cache bytes;
  *              re-run of the r4 A/B inside this matrix)
  *   lzblk512 — lz4 with 512k block size (fewer per-block overheads)
  *   zstdblk  — zstd with 512k blocks + level 1
  *
  * Unlike the r8 exchange probe this drains the FULL plan via toRdd
  * (count() prunes the aggregate outputs — Bench.fullExec doc).
  *
  * Usage: runMain graft.tools.H09SerProbe <heavyDir> <mode> [reps]
  * Output: one JSON line {"mode":…,"reps":[…],"min":…}
  */
object H09SerProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val reps = if (args.length > 2) args(2).toInt else 4
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.shuffle.compress",
        if (mode == "nocomp") "false" else "true")
      .config("spark.shuffle.spill.compress",
        if (mode == "nocomp") "false" else "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val b2 = mode match {
      case "zstd" => b.config("spark.io.compression.codec", "zstd")
      case "snappy" => b.config("spark.io.compression.codec", "snappy")
      case "lzblk512" =>
        b.config("spark.io.compression.lz4.blockSize", "512k")
      case "zstdblk" => b.config("spark.io.compression.codec", "zstd")
        .config("spark.io.compression.zstd.bufferSize", "512k")
        .config("spark.io.compression.zstd.level", "1")
      case _ => b
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    val ord = spark.read.parquet(s"$dir/orders")
    def q() = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc)
    def drain(): Long = q().queryExecution.toRdd.count()
    drain() // warm (codegen + page cache)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); drain()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"mode":"$mode","reps":[${times.map(t => f"$t%.3f")
      .mkString(",")}],"min":${f"${times.min}%.3f"}}""")
    spark.stop()
  }
}
