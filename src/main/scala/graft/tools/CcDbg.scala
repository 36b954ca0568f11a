package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: connected-components round counts and per-stage time for
  * the gates that run Components (x21/x29/x39/x42). Prints the number
  * of propagation rounds each pair graph actually needs, so the
  * round-structure choice (plain vs alternating, fused rounds) is made
  * on data, not on the "dedup graphs are cliques" assumption.
  */
object CcDbg {
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
    import graft.operators.{Components, Similarity, Dedup}

    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // instrumented copy of Components.connected
    def connectedDbg(edges: DataFrame, src: String, dst: String): Unit = {
      val e = edges.select(col(src).as("a"), col(dst).as("b"))
        .union(edges.select(col(dst).as("a"), col(src).as("b")))
        .distinct()
        .localCheckpoint(eager = true)
      println(s"  edges=${e.count()}")
      def cps(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
        val obs = org.apache.spark.sql.Observation()
        val out = df.observe(obs,
            sum(col("comp").cast("decimal(38,0)")).as("s"))
          .localCheckpoint(eager = true)
        (out, obs.get("s").asInstanceOf[java.math.BigDecimal])
      }
      var (labels, prevSum) = cps(
        e.select(col("a").as("id")).distinct().withColumn("comp", col("id")))
      var iter = 0
      var converged = false
      while (!converged && iter < 40) {
        val t0 = System.nanoTime()
        val proposals = e.join(labels.withColumnRenamed("id", "b"), "b")
          .select(col("a").as("id"), col("comp"))
        val (next, nextSum) = cps(
          labels.select(col("id"), col("comp"))
            .union(proposals)
            .groupBy("id").agg(min("comp").as("comp")))
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        labels = next
        iter += 1
        println(f"  round $iter%2d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      println(s"  rounds=$iter")
    }

    // prop + pointer-jump variant: comp <- comp(comp) each round, so a
    // chain of length L converges in O(log L) rounds instead of L
    def connectedJumpDbg(edges: DataFrame, src: String, dst: String): Unit = {
      val e = edges.select(col(src).as("a"), col(dst).as("b"))
        .union(edges.select(col(dst).as("a"), col(src).as("b")))
        .repartition(col("b")).distinct()
        .localCheckpoint(eager = true)
      def cps(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
        val obs = org.apache.spark.sql.Observation()
        val out = df.observe(obs,
            sum(col("comp").cast("decimal(38,0)")).as("s"))
          .localCheckpoint(eager = true)
        (out, obs.get("s").asInstanceOf[java.math.BigDecimal])
      }
      var (labels, prevSum) = cps(
        e.select(col("a").as("id")).distinct().withColumn("comp", col("id")))
      var iter = 0
      var converged = false
      while (!converged && iter < 40) {
        val t0 = System.nanoTime()
        val prop = e.join(labels.withColumnRenamed("id", "b"), "b")
          .select(col("a").as("id"), col("comp"))
          .union(labels.select(col("id"), col("comp")))
          .groupBy("id").agg(min("comp").as("comp"))
        val jumped = prop.join(
            prop.select(col("id").as("__cid"), col("comp").as("__cc")),
            col("comp") === col("__cid"))
          .select(col("id"), col("__cc").as("comp"))
        val (next, nextSum) = cps(jumped)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        labels = next
        iter += 1
        println(f"  jround $iter%2d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      println(s"  jrounds=$iter")
      println("  labels check: " + labels.agg(count(lit(1)),
        sum(col("comp").cast("decimal(38,0)"))).collect()(0))
    }

    // fused variant: self-loop edges let one round reference the previous
    // labels exactly once, so k rounds chain into ONE linear plan per
    // action; convergence = label sum stable across actions (labels are
    // monotone non-increasing, so equality across k rounds ⇒ fixpoint)
    def connectedFusedDbg(edges: DataFrame, src: String, dst: String,
        k: Int): Unit = {
      val e = edges.select(col(src).as("a"), col(dst).as("b"))
        .union(edges.select(col(dst).as("a"), col(src).as("b")))
        .union(edges.select(col(src).as("a"), col(src).as("b")))
        .union(edges.select(col(dst).as("a"), col(dst).as("b")))
        .repartition(col("b")).distinct()
        .localCheckpoint(eager = true)
      var labels = e.select(col("a").as("id")).distinct()
        .withColumn("comp", col("id"))
        .localCheckpoint(eager = true)
      var prevSum: java.math.BigDecimal = null
      var iter = 0
      var converged = false
      while (!converged && iter < 40) {
        val t0 = System.nanoTime()
        var cur = labels
        for (_ <- 0 until k) {
          cur = e.join(cur.withColumnRenamed("id", "b"), "b")
            .select(col("a").as("id"), col("comp"))
            .groupBy("id").agg(min("comp").as("comp"))
        }
        val obs = org.apache.spark.sql.Observation()
        val next = cur.observe(obs,
            sum(col("comp").cast("decimal(38,0)")).as("s"))
          .localCheckpoint(eager = true)
        val nextSum = obs.get("s").asInstanceOf[java.math.BigDecimal]
        converged = prevSum != null && nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        labels = next
        iter += 1
        println(f"  faction $iter%2d (${k} rounds) ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      println(s"  factions=$iter (rounds=${iter * k})")
      println("  labels check: " + labels.agg(count(lit(1)),
        sum(col("comp").cast("decimal(38,0)"))).collect()(0))
    }

    def altDbg(edges: DataFrame, src: String, dst: String): Unit = {
      val t0 = System.nanoTime()
      val out = graft.operators.Components.connectedAlternating(edges, src, dst)
      println("  alt labels check: " + out.agg(count(lit(1)),
        sum(col("comp").cast("decimal(38,0)"))).collect()(0) +
        f"  ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    // lean alternating: large-star and small-star each as ONE window
    // (partition-min) instead of groupBy+join; one distinct per round
    import org.apache.spark.sql.expressions.Window
    def altWinDbg(edges: DataFrame, src: String, dst: String): Unit = {
      val vertices = edges.select(col(src).as("id"))
        .union(edges.select(col(dst).as("id"))).distinct()
        .localCheckpoint(eager = true)
      var e = edges.select(
          greatest(col(src), col(dst)).as("hi"),
          least(col(src), col(dst)).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
        .localCheckpoint(eager = true)
      def observed(df: DataFrame): (DataFrame, (Long, java.math.BigDecimal)) = {
        val obs = org.apache.spark.sql.Observation()
        val out = df.observe(obs, count(lit(1)).as("n"),
            sum((col("hi") * lit(1000003L) + col("lo"))
              .cast("decimal(38,0)")).as("s"))
          .localCheckpoint(eager = true)
        (out, (obs.get("n").asInstanceOf[Long],
          obs.get("s").asInstanceOf[java.math.BigDecimal]))
      }
      var sig: (Long, java.math.BigDecimal) = (-1L, null)
      var iter = 0
      var converged = false
      while (!converged && iter < 50) {
        val t0 = System.nanoTime()
        val wU = Window.partitionBy("u")
        val large = e.select(col("hi").as("u"), col("lo").as("v"))
          .union(e.select(col("lo").as("u"), col("hi").as("v")))
          .withColumn("m", least(min(col("v")).over(wU), col("u")))
          .filter(col("v") > col("u"))
          .select(col("v").as("hi"), col("m").as("lo"))
          .filter(col("hi") =!= col("lo"))
        val wH = Window.partitionBy("hi")
        val withM = large.withColumn("m", min(col("lo")).over(wH))
        val smallNext = withM.select(explode(
            when(col("lo") === col("m"),
              array(struct(col("lo").as("hi"), col("m").as("lo")),
                    struct(col("hi").as("hi"), col("m").as("lo"))))
            .otherwise(array(struct(col("lo").as("hi"), col("m").as("lo")))))
            .as("e2"))
          .select(col("e2.hi").as("hi"), col("e2.lo").as("lo"))
          .filter(col("hi") =!= col("lo")).distinct()
        val (next, nextSig) = observed(smallNext)
        val sigStable = sig._2 != null && nextSig._1 == sig._1 &&
          nextSig._2.compareTo(sig._2) == 0
        converged = sigStable && next.exceptAll(e).isEmpty
        sig = nextSig
        e = next
        iter += 1
        println(f"  wround $iter%2d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      println(s"  wrounds=$iter")
      val labels = e.select(col("hi").as("id"), col("lo"))
        .union(e.select(col("lo").as("id"), col("lo")))
        .groupBy("id").agg(min("lo").as("comp"))
      val out = vertices.join(labels, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      println("  win labels check: " + out.agg(count(lit(1)),
        sum(col("comp").cast("decimal(38,0)"))).collect()(0))
    }

    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val pairs42 = timeIt("x42 thresholdPairs(0.4) build") {
      Similarity.thresholdPairs(emb, threshold = 0.4).select("i", "j")
        .localCheckpoint(eager = true)
    }
    println(s"x42 pairs=${pairs42.count()}")
    timeIt("x42 connected") { connectedDbg(pairs42, "i", "j") }
    timeIt("x42 alternating") { altDbg(pairs42, "i", "j") }
    timeIt("x42 alternatingWin") { altWinDbg(pairs42, "i", "j") }

    val docs = graft.Tables.load(spark, sfDir, "documents")
    val pairs21 = timeIt("x21 jaccard pair build") {
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.5)
        .select("d1", "d2")
        .localCheckpoint(eager = true)
    }
    println(s"x21 pairs=${pairs21.count()}")
    timeIt("x21 connected") { connectedDbg(pairs21, "d1", "d2") }
    timeIt("x21 alternating") { altDbg(pairs21, "d1", "d2") }
    timeIt("x21 alternatingWin") { altWinDbg(pairs21, "d1", "d2") }

    spark.stop()
  }
}
