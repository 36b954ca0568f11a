package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew fixture for the gram dup test (r16): ONE stop-word-like gram at
  * ~10^6 occurrences next to a long tail of unique grams — the 100 TB
  * failure mode VERDICT r15 flagged for the whole-partition window
  * shape (all occurrences of a hot gram shuffle+sort into ONE task; AQE
  * cannot split windows). Runs [[graft.operators.Dedup.duplicateSpans]]
  * over the fixture and reports per-task straggler stats of every stage
  * (max vs median task time, max task input rows) plus wall time, for
  * the shipped two-level shape and, under -Dgraft.probe.window=true, an
  * inline re-implementation of the r15 window shape for comparison.
  *
  * Fixture: `hotDocs` docs of `hotLen` tokens each, every token the
  * SAME word ("the the the ..."), so a single gram accounts for
  * hotDocs*(hotLen-k+1) occurrences; plus `tailDocs` docs of unique
  * token streams (all grams unique). k=3.
  *
  * Usage: runMain graft.tools.SpanSkewProbe [hotOcc] [tailDocs]
  */
object SpanSkewProbe {
  def main(args: Array[String]): Unit = {
    val hotOcc = if (args.nonEmpty) args(0).toLong else 1000000L
    val tailDocs = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // per-stage task census
    final case class T(durMs: Long, rows: Long)
    val stages = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.List[T]]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
          stageNames.put(s.stageInfo.stageId,
            s.stageInfo.name.takeWhile(_ != '\n')); ()
        }
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val rows =
            if (te.taskMetrics == null) 0L
            else te.taskMetrics.shuffleReadMetrics.recordsRead +
              te.taskMetrics.inputMetrics.recordsRead
          stages.computeIfAbsent(te.stageId,
              _ => java.util.Collections.synchronizedList(
                new java.util.ArrayList[T]()))
            .add(T(te.taskInfo.duration, rows)); ()
        }
      })

    val k = 3
    // hot doc block: hotOcc k-gram occurrences of one repeated token
    val hotLen = 2000
    val gramsPerHotDoc = hotLen - k + 1
    val hotDocs = math.max(1L, hotOcc / gramsPerHotDoc).toInt
    val hot = spark.range(hotDocs).select(
      concat(lit("hot_"), col("id")).as("doc_id"),
      array_join(transform(sequence(lit(1), lit(hotLen)),
        _ => lit("the")), " ").as("text"))
    // tail: unique token streams (every gram globally unique)
    val tail = spark.range(tailDocs).select(
      concat(lit("tail_"), col("id")).as("doc_id"),
      array_join(transform(sequence(lit(1), lit(200)),
        i => concat(col("id"), lit("w"), i)), " ").as("text"))
    // materialize the fixture so the probed plan is the OPERATOR, not
    // the generator
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    hot.unionByName(tail).repartition(64)
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    println(s"fixture: ${hotDocs} hot docs x $gramsPerHotDoc grams = " +
      s"${hotDocs.toLong * gramsPerHotDoc} hot-gram occurrences, " +
      s"$tailDocs tail docs")

    def census(label: String)(body: => Unit): Unit = {
      stages.clear(); stageNames.clear()
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"RUN $label%-22s wall=$wall%6.2f s")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (sid, ts) =>
        val ds = ts.asScala.map(_.durMs.toDouble).toSeq.sorted
        if (ds.sum > 300) { // skip trivial stages
          val med = ds(ds.size / 2); val mx = ds.last
          val rowsMax = ts.asScala.map(_.rows).max
          println(f"  stage $sid%3d tasks=${ds.size}%4d med=$med%7.0f ms " +
            f"max=$mx%7.0f ms skew=${mx / math.max(med, 1.0)}%5.1fx " +
            f"maxrows=$rowsMax%9d  ${stageNames.get(sid).take(60)}")
        }
      }
    }

    // shipped two-level shape
    census("two-level(shipped)") {
      graft.operators.Dedup.duplicateSpans(docs, "doc_id", "text", k)
        .write.format("noop").mode("overwrite").save()
    }
    // r15 window shape, re-implemented inline for the A/B
    if (sys.props.getOrElse("graft.probe.window", "true").toBoolean)
      census("window(r15)") {
        val words = col("__ws")
        val grams = docs
          .select(col("doc_id"), split(col("text"), " ").as("__ws"))
          .filter(size(words) >= k)
          .select(col("doc_id"),
            posexplode(transform(sequence(lit(0), size(words) - k),
              i => array_join(slice(words, i + 1, lit(k)), " "))))
          .toDF("doc_id", "pos", "gram")
        val wg = org.apache.spark.sql.expressions.Window.partitionBy("gram")
        val hits = grams
          .withColumn("cnt", count(lit(1)).over(wg))
          .filter(col("cnt") > 1)
          .select("doc_id", "pos")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        hits
          .withColumn("brk",
            when(col("pos") - lag("pos", 1).over(w) <= k - 1, 0).otherwise(1))
          .withColumn("island", sum("brk").over(w))
          .groupBy(col("doc_id"), col("island"))
          .agg(min("pos").cast("long").as("span_start"),
            (max("pos") + k - 1).cast("long").as("span_end"))
          .select(col("doc_id"), col("span_start"), col("span_end"))
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
