package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: where does duplicateSpans/removeDuplicateSpans time go? */
object SpanDbg {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    val df = graft.Tables.load(spark, sfDir, "documents")

    def noop(d: DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    def best(label: String, reps: Int = 5)(mk: => DataFrame): Unit = {
      try { noop(mk) } catch { case e: Throwable =>
        println(s"$label FAILED: ${e.getMessage.take(200)}"); return }
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9 }
      println(f"$label%-28s min=${ts.min}%6.3f med=${ts.sorted.apply(reps / 2)}%6.3f")
    }

    val k = 8
    val idCol = "doc_id"; val textCol = "text"
    val words = split(col(textCol), " ")
    def grams = df.filter(size(words) >= k)
      .select(col(idCol).as("doc_id"),
        posexplode(transform(sequence(lit(0), size(words) - k),
          i => array_join(slice(words, i + 1, lit(k)), " "))))
      .toDF("doc_id", "pos", "gram")
    def dup = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
    def hits = grams.join(dup.select("gram"), Seq("gram"), "left_semi")
    def spans = {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      hits.withColumn("brk",
          when(col("pos") - lag("pos", 1).over(w) <= k - 1, 0).otherwise(1))
        .withColumn("island", sum("brk").over(w))
        .groupBy(col("doc_id"), col("island"))
        .agg(min("pos").cast("long").as("span_start"),
          (max("pos") + k - 1).cast("long").as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"))
    }

    // A/B: hoist the split() into its own projection so the lambda body
    // references a bound column, not a re-evaluated split per element
    def gramsHoisted = df
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__ws"))
      .filter(size(col("__ws")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("__ws")) - k),
          i => array_join(slice(col("__ws"), i + 1, lit(k)), " "))))
      .toDF("doc_id", "pos", "gram")
    // A/B: same + repartition before the heavy projection
    def gramsHoistedPar = df
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__ws"))
      .filter(size(col("__ws")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("__ws")) - k),
          i => array_join(slice(col("__ws"), i + 1, lit(k)), " "))))
      .toDF("doc_id", "pos", "gram")
    def gramsPar = df
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .filter(size(words) >= k)
      .select(col(idCol).as("doc_id"),
        posexplode(transform(sequence(lit(0), size(words) - k),
          i => array_join(slice(words, i + 1, lit(k)), " "))))
      .toDF("doc_id", "pos", "gram")

    best("scan only")(df)
    best("grams")(grams)
    best("grams hoisted")(gramsHoisted)
    best("grams repart")(gramsPar)
    best("grams hoisted+repart")(gramsHoistedPar)
    best("dup agg")(dup)
    best("hits semi-join")(hits)
    best("full duplicateSpans")(spans)
    best("x40 gate")(graft.SparkEntry.queries("x40_dup_spans")(spark, sfDir))
    best("x43 gate")(graft.SparkEntry.queries("x43_dup_span_removal")(spark, sfDir))
    best("x23 gate")(graft.SparkEntry.queries("x23_repetition_filter")(spark, sfDir))
    best("x45 gate")(graft.SparkEntry.queries("x45_incremental_dedup")(spark, sfDir))
    best("x37 gate")(graft.SparkEntry.queries("x37_multimodal_resize")(spark, sfDir))
    spark.stop()
  }
}
