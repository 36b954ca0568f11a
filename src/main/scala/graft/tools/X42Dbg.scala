package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: stage-level time breakdown of gate x42_semantic_dedup —
  * exact pair build, exact components, semantic dedup pipeline,
  * verification join — so optimization effort goes where the seconds
  * are. Each stage is timed warm (best of `reps`).
  */
object X42Dbg {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Components, Similarity}

    val e = graft.Tables.load(spark, sfDir, "embeddings")
    def best(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$label%-30s min=${ts.min}%6.3f med=${ts.sorted.apply(reps / 2)}%6.3f")
    }
    def noop(d: DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()

    best("pairs (thresholdPairs .4)") {
      noop(Similarity.thresholdPairs(e, threshold = 0.4).select("i", "j"))
    }
    best("exact CC (pairs+components)") {
      noop(Components.dedupClusters(
        Similarity.thresholdPairs(e, threshold = 0.4).select("i", "j"),
        "i", "j").filter(!col("keep")).select("doc_id"))
    }
    best("semanticDedup") {
      noop(Similarity.semanticDedup(e, threshold = 0.4, nlist = 8, iters = 2)
        .filter(!col("keep")).select(col("doc_id").as("rem")))
    }
    best("full gate") {
      noop(graft.SparkEntry.queries("x42_semantic_dedup")(spark, sfDir))
    }
    spark.stop()
  }
}
