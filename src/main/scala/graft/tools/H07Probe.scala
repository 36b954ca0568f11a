package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: A/B the h07 group-key encodings (VERDICT r5 #5). h07 is the
  * widest heavy gap vs DuckDB (6.3×): group by date_trunc(hour, ts) ×
  * event_type over 10 M events. The hypothesis is the (timestamp, string)
  * hash-map key: Spark's UnsafeRow aggregate map hashes + compares the
  * string per row, where DuckDB perfect-hashes a small dictionary.
  * Shapes probed, interleaved sweeps so transient load can't sit on one:
  *
  *   A current   groupBy(date_trunc(hour, ts), event_type)
  *   B two-longs groupBy(hourIdx: long, xxhash64(event_type): long),
  *               string carried via first() (buffer-set-once, not per-row
  *               compares); decode = arithmetic + the carried string
  *   C one-long  groupBy(xxhash64(date_trunc, event_type)), both group
  *               columns carried via first()
  *   D pre-proj  A but with the trunc projected before the agg (isolates
  *               expression-eval cost from map-lookup cost)
  *
  * Emits one JSON line (shape → min sec over sweeps, spread, loadavg per
  * sweep). Collision note: B/C are perf probes; a production variant
  * must confirm xxhash64 injectivity over the observed type dictionary
  * (trivial: distinct count of (hash) == distinct count of (type)).
  *
  * RESULT (round 6, probes/h07_key_encoding.json): NO WIN. Two runs of
  * 5 interleaved sweeps put all four shapes within ~3% of each other on
  * min (A 0.409/0.481, B 0.413/0.443, C 0.405/0.423, D 0.455/0.512) —
  * inside the per-sweep spread (1.4–2.0×). The group-key encoding is not
  * the bottleneck; the residual vs DuckDB is the row-based JVM
  * hash-aggregate path itself. Line of inquiry closed — no production
  * rule follows from this probe.
  */
object H07Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy_57378e9c")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet(s"$dir/events")

    def a() = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")))
      .orderBy(col("n").desc).limit(10)
    def b() = ev
      .groupBy((unix_micros(col("ts").cast("timestamp")) / 3600000000L)
        .cast("long").as("hi"),
        xxhash64(col("event_type")).as("tc"))
      .agg(first(col("event_type")).as("event_type"),
        count(lit(1)).as("n"), avg(col("value")))
      .select(timestamp_micros(col("hi") * 3600000000L).as("h"),
        col("event_type"), col("n"))
      .orderBy(col("n").desc).limit(10)
    def c() = ev
      .groupBy(xxhash64(date_trunc("hour", col("ts")), col("event_type"))
        .as("k"))
      .agg(first(date_trunc("hour", col("ts"))).as("h"),
        first(col("event_type")).as("event_type"),
        count(lit(1)).as("n"), avg(col("value")))
      .select(col("h"), col("event_type"), col("n"))
      .orderBy(col("n").desc).limit(10)
    def d() = ev
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"),
        col("value"))
      .groupBy("h", "event_type")
      .agg(count(lit(1)).as("n"), avg(col("value")))
      .orderBy(col("n").desc).limit(10)

    val shapes: Seq[(String, () => DataFrame)] =
      Seq("A_current" -> a _, "B_two_longs" -> b _, "C_one_long" -> c _,
        "D_preproject" -> d _)

    shapes.foreach { case (_, f) => val _ = f().count() } // warm codegen
    val sweeps = 5
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val loads = scala.collection.mutable.ListBuffer.empty[Double]
    (1 to sweeps).foreach { _ =>
      loads += scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      shapes.foreach { case (n, f) =>
        val t0 = System.nanoTime(); f().count()
        times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val json = shapes.map { case (n, _) =>
      val ts = times(n)
      f""""$n":{"min":${ts.min}%.3f,"max":${ts.max}%.3f,"spread":${ts.max / ts.min}%.2f}"""
    }.mkString(",")
    println(s"""{"probe":"h07_key_encoding","sweeps":$sweeps,$json,""" +
      s""""loadavg":[${loads.map(l => f"$l%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
