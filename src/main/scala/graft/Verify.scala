package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only filter: SPARK_GRAFT_ONLY=q01,snow31 runs a subset (driver
    // sets no env, so the gate always runs everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // gate order: name-sorted by default; SPARK_GRAFT_SHUFFLE_SEED=<n>
    // runs the pack in a seeded-shuffled order instead (round-14
    // directive #6: the definition-order pack could mask
    // order-dependent state leaks between gates that CREATE/DROP
    // shared-name objects)
    val selected0 = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name)) }.toSeq.sortBy(_._1)
    val selected = sys.env.get("SPARK_GRAFT_SHUFFLE_SEED") match {
      case Some(seed) => new scala.util.Random(seed.toLong).shuffle(selected0)
      case None => selected0
    }
    // per-gate GC/spill attribution (the constrained-memory pack run —
    // round-14 directive #3 — needs proof the engine SPILLS rather than
    // OOMs under a small heap; nonzero spill with a hash match is the
    // healthy outcome there)
    val bm = new org.apache.spark.GraftBenchMetrics(spark.sparkContext)
    val perGate = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Long)]
    selected.foreach { case (name, fn) =>
      val (gc0, sp0, _, _, _) = bm.snapshot()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        e.printStackTrace()
      }
      val (gc1, sp1, _, _, _) = bm.snapshot()
      perGate(name) = (gc1 - gc0, sp1 - sp0)
    }
    val (gcT, spT, _, _, drained) = bm.snapshot()
    Files.writeString(Paths.get(s"$outDir/_metrics.json"),
      s"""{"heap_max_mb":${Runtime.getRuntime.maxMemory() / 1048576L},""" +
        s""""cpus":$cpus,"gc_ms_total":$gcT,"spill_bytes_total":$spT,""" +
        s""""drained":$drained,"per_gate":{""" +
        perGate.map { case (n, (gc, sp)) =>
          s""""$n":{"gc_ms":$gc,"spill_bytes":$sp}""" }.mkString(",") +
        "}}\n")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
