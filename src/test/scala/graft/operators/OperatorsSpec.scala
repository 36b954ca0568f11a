package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text").collect()
    assert(out.length == 2)
    assert(out.find(_.getAs[Long]("n_copies") == 2).get.getAs[Long]("keep_id") == 1L)
  }

  test("shingles produce distinct word n-grams") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", 3).collect().map(_.getString(1))
    assert(sh.toSet == Set("a b c", "b c d"))
  }

  test("shingles of short docs collapse to the full text") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", 3).collect().map(_.getString(1))
    assert(sh.toSet == Set("a b"))
  }

  test("jaccard pairs find near-duplicates, not unrelated docs") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tomorrow"),
      (3L, "completely different words appear in this one here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("d1") == 1L && pairs(0).getAs[Long]("d2") == 2L)
  }

  test("jaccard shingle-frequency cap: anti-join against the small over-cap set") {
    // all four docs share the leading shingle (freq 4 > cap 3) — it must be
    // dropped via a broadcast LEFT ANTI against the over-cap set, never by
    // broadcasting the kept vocabulary (OOM at web scale)
    val df = Seq(
      (1L, "common stop words a b c d e f g"),
      (2L, "common stop words a b c d e f h"),
      (3L, "common stop words p q r s t u v"),
      (4L, "common stop words j k l m n o z")).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5, maxShingleFreq = 3)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
    val physical = pairs.queryExecution.executedPlan.toString
    assert(physical.contains("LeftAnti"), physical)
    assert(physical.contains("BroadcastHashJoin") ||
      physical.contains("BroadcastExchange"), physical)
  }

  test("minhash LSH equals exact jaccard on near-dups") {
    val docs = (0L until 20L).map(i => (i, s"unique words number $i " +
      "padding tokens that differ completely between documents " + ("z" + i)))
    val nearDup = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
    val df = (docs ++ nearDup).toDF("doc_id", "text")
    val exact = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(df, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((100L, 101L)))
    assert(lsh == exact)
  }

  test("simhash: identical texts same sig, near texts close, format ok") {
    val df = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "totally other tokens in here now")).toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L).matches("[0-9a-f]{16}"))
    assert(sigs(1L) != sigs(3L))
  }

  test("simhash pairs via banding find hd<=3 duplicates") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHd = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs(0).getAs[Int]("hd") == 0)
  }

  test("cosine: orthogonal=0, identical=1") {
    val df = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(2f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.thresholdPairs(df, -2.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 0.0)
    assert(pairs((1L, 3L)) == 1.0)
  }

  test("bruteForceTopK ranks by similarity with k cap") {
    val df = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(1f, 0.01f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 1), 2)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rnk")))
    assert(top.toSeq == Seq((4L, 1), (2L, 2)))
  }

  test("langId picks dominant profile; und when no hits") {
    val df = Seq("the cat and the dog", "le chat et le chien", "zzz qqq www")
      .toDF("text")
    val out = df.select(TextAnalysis.langId($"text")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "fr", "und"))
  }

  test("quality features: ratios and score") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Int]("n_tokens") == 12)
    assert(r.getAs[Double]("stopword_ratio") > 0.2)
    assert(r.getAs[Double]("quality_score") == 1.0)
  }

  test("fingerprint is case/punct/whitespace insensitive") {
    val df = Seq("Hello,   World!", "hello world").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("salted join equals plain join") {
    val skewed = (1 to 100).map(i => (if (i % 2 == 0) "A" else "B", i))
      .toDF("k", "v")
    val dim = Seq(("A", 10), ("B", 20)).toDF("k", "w")
    val plain = skewed.join(dim, "k").agg(sum($"v" * $"w")).collect()(0).getLong(0)
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, "k", parts = 4)
      .agg(sum($"v" * $"w")).collect()(0).getLong(0)
    assert(salted == plain)
  }

  test("IVF topk: high recall vs brute force on real embeddings") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(e, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = IvfIndex.train(e, nlist = 8, iters = 2)
    val ivf = IvfIndex.topK(e, queries, model, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
    assert(ivf.size == exact.size)
  }

  test("int8 quantized topk: high recall, exact rescored scores, byte wire type") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter($"vec_id" < 5)
    // quantized storage really is int8 on the wire
    val q = Similarity.quantize(e)
    assert(q.schema("qvec").dataType.asInstanceOf[
      org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.ByteType)
    // every quantized component is within the int8 grid of the original
    val exact = Similarity.bruteForceTopK(e, queries, 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val quant = Similarity.quantizedTopK(e, queries, k = 5, probeFactor = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val hits = quant.keySet intersect exact.keySet
    val recall = hits.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall too low")
    // rescoring restores EXACT scores on every hit
    hits.foreach(k => assert(quant(k) == exact(k)))
    assert(quant.size == exact.size)
  }

  test("IVF persistent index: second index() call runs ZERO jobs") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    IvfIndex.clearCache()
    val idx1 = IvfIndex.index(e, nlist = 4, iters = 1)
    // the k-means collects + assignment write all happened above; a
    // second call must be a pure cache/disk lookup — no Spark jobs
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val idx2 =
      try {
        val i = IvfIndex.index(e, nlist = 4, iters = 1)
        Thread.sleep(1000) // listener delivery is async
        i
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get == 0, s"second index() started ${jobs.get} jobs")
    assert(idx2.model.centroids.map(_._2.toSeq).toSeq ==
      idx1.model.centroids.map(_._2.toSeq).toSeq)
    // fresh-JVM analog: drop the memory cache — the model reloads from
    // the persisted centroids (tiny read), identical values, no k-means
    IvfIndex.clearCache()
    val idx3 = IvfIndex.index(e, nlist = 4, iters = 1)
    assert(idx3.model.centroids.map(_._2.toSeq).toSeq ==
      idx1.model.centroids.map(_._2.toSeq).toSeq)
    // and the probed result over the persisted index matches the inline
    // topK over the same model
    val queries = e.filter($"vec_id" < 5)
    val a = IvfIndex.topKIndexed(idx3, queries, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = IvfIndex.topK(e, queries, idx1.model, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("as-of join: latest at-or-before match per key, ties inclusive") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val trades = Seq((1L, "A", ts(10)), (2L, "A", ts(20)), (3L, "B", ts(5)))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", ts(8), 1.0), ("A", ts(10), 2.0), ("A", ts(15), 3.0),
        ("B", ts(9), 9.0))
      .toDF("sym", "t", "px")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "t", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("r_px"))).toMap
    assert(out(1L) == Some(2.0))  // tie at t=10 matches (inclusive)
    assert(out(2L) == Some(3.0))  // latest of the three
    assert(out(3L) == None)       // no quote at-or-before t=5
  }

  test("forward as-of: FIRST at-or-after match per key, ties inclusive") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val trades = Seq((1L, "A", ts(10)), (2L, "A", ts(16)), (3L, "B", ts(50)))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", ts(8), 1.0), ("A", ts(10), 2.0), ("A", ts(15), 3.0),
        ("B", ts(9), 9.0))
      .toDF("sym", "t", "px")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "t", Seq("px"),
        forward = true)
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("r_px"))).toMap
    assert(out(1L) == Some(2.0))  // tie at t=10 matches (inclusive)
    assert(out(2L) == None)       // nothing at-or-after t=16 for A
    assert(out(3L) == None)       // B's only quote is before t=50
  }

  test("as-of join plans exactly one shuffle (union+window, no join)") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val l = Seq((1L, "A", ts(10))).toDF("id", "k", "t")
    val r = Seq(("A", ts(8), 1.0)).toDF("k", "t", "px")
    val out = AsOfJoin.asOf(l, r, "k", "t", "t", Seq("px"))
    out.collect()
    // AQE's toString repeats the plan under "== Initial Plan ==" — count
    // exchanges in the final section only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 hash exchange:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("repetition filter plans no shuffle (pure per-row expressions)") {
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionFeatures(df, "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetition features must be shuffle-free:\n$plan")
  }

  test("bucketed as-of equals plain as-of across bucket boundaries and gaps") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // quotes at 5,95 (bucket 0), 150 (bucket 1), none in bucket 2,
    // 460 (bucket 4); trades probe same-bucket, next-bucket, gap-spanning,
    // tie, and before-any-quote cases (bucketSeconds = 100)
    val trades = Seq(
      (1L, "A", ts(3)),   // before any quote → null
      (2L, "A", ts(50)),  // within bucket 0 → q@5
      (3L, "A", ts(150)), // tie with q@150 → inclusive
      (4L, "A", ts(210)), // bucket 2 empty → carry q@150
      (5L, "A", ts(320)), // gap spanning bucket 3 → carry q@150
      (6L, "A", ts(470)), // after q@460
      (7L, "B", ts(100))  // other key → q@90
    ).toDF("id", "k", "t")
    val quotes = Seq(
      ("A", ts(5), 1.0), ("A", ts(95), 2.0), ("A", ts(150), 3.0),
      ("A", ts(460), 4.0), ("B", ts(90), 9.0)
    ).toDF("k", "t", "px")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("r_px"))).toMap
    val plain = res(AsOfJoin.asOf(trades, quotes, "k", "t", "t", Seq("px")))
    val bucketed = res(AsOfJoin.asOfBucketed(trades, quotes, "k", "t", "t",
      Seq("px"), bucketSeconds = 100))
    assert(plain == bucketed)
    assert(bucketed(1L) == None && bucketed(2L) == Some(1.0) &&
      bucketed(3L) == Some(3.0) && bucketed(4L) == Some(3.0) &&
      bucketed(5L) == Some(3.0) && bucketed(6L) == Some(4.0) &&
      bucketed(7L) == Some(9.0))
  }

  test("as-of join with tolerance nulls stale matches") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val l = Seq((1L, "A", ts(100)), (2L, "A", ts(1000))).toDF("id", "k", "t")
    val r = Seq(("A", ts(90), 7.0)).toDF("k", "t", "px")
    val out = AsOfJoin.asOfWithin(l, r, "k", "t", "t", Seq("px"),
        expr("INTERVAL 30 SECONDS"))
      .collect().map(x => x.getAs[Long]("id") ->
        Option(x.getAs[Any]("r_px"))).toMap
    assert(out(1L) == Some(7.0))  // 10 s back, within tolerance
    assert(out(2L) == None)       // 910 s back, stale
  }

  test("alternating large-star/small-star: long chain in O(log n) rounds") {
    // a 1000-vertex path has diameter 999: min-propagation needs ~999
    // rounds, the alternating algorithm must finish inside maxIter=20
    // (≈2·log2 n) or the labels come out wrong and these asserts fail
    val chain = (1L until 1000L).map(i => (i, i + 1)).toDF("d1", "d2")
    val comp = Components.connectedAlternating(chain, "d1", "d2", maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 1000)
    assert(comp.values.forall(_ == 1L))

    // same answers as the propagation variant on a mixed graph
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 33L),
      (33L, 34L), (34L, 35L)).toDF("d1", "d2")
    val alt = Components.connectedAlternating(edges, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Components.connected(edges, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt == prop)
  }

  test("connected components: chain, clique, and singleton-pair graphs") {
    // chain 1-2-3-4 (diameter 3), clique 10-11-12, pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("d1", "d2")
    val comp = Components.connected(edges, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
    val dec = Components.dedupClusters(edges).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(dec(1L) && !dec(2L) && !dec(4L) && dec(10L) && !dec(12L))
  }

  test("repetition features flag high duplicate-ngram docs") {
    val rep = ("w1 w2 w3 w4 w5 " * 10).trim            // 46 shingles, 5 distinct
    val uniq = (1 to 20).map("u" + _).mkString(" ")    // all shingles distinct
    val df = Seq((1L, rep), (2L, uniq), (3L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionFeatures(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_fraction"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L)._1 > 0.8 && !out(1L)._2)
    assert(out(2L)._1 == 0.0 && out(2L)._2)
    assert(out(3L)._1 == 0.0 && out(3L)._2) // short doc = one shingle
  }

  test("vocabulary ranks tokens by document frequency with stable ties") {
    val df = Seq((1L, "a b c a"), (2L, "a b"), (3L, "a z")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(df, "doc_id", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(v(0) == ("a", 3L))  // in all 3 docs; within-doc repeat not counted
    assert(v(1) == ("b", 2L))
    assert(v(2) == ("c", 1L))  // tie with z broken lexicographically
  }

  test("multimodal: non-image payloads keep byte metadata, NULL image fields") {
    val df = Seq((7L, "abc")).toDF("doc_id", "text")
    val feat = Multimodal.extractFeatures(
      Multimodal.binaryFromText(df, "doc_id", "text")).collect()(0)
    assert(feat.getAs[Long]("n_bytes") == 3L)
    assert(feat.getAs[String]("content_digest") ==
      "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(feat.isNullAt(feat.fieldIndex("format")))
    assert(feat.isNullAt(feat.fieldIndex("width")))
  }

  test("multimodal: real PNG payloads decode to their true dimensions") {
    val ids = Seq(0L, 5L, 31L, 40L).toDF("doc_id")
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticImages(ids, "doc_id"))
      .orderBy("doc_id").collect()
    feats.foreach { f =>
      val id = f.getAs[Long]("doc_id")
      assert(f.getAs[String]("format") == "png")
      assert(f.getAs[Int]("width") == (8 + id % 32).toInt)
      assert(f.getAs[Int]("height") == (8 + (id * 7) % 32).toInt)
      assert(f.getAs[Int]("channels") == 3)
      assert(f.getAs[Long]("n_bytes") > 0)
    }
    // a corrupt payload must soft-fail, not kill the stage: PNG magic
    // with garbage body decodes to NULL dims but keeps byte metadata
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val corrupt = spark.createDataFrame(
      java.util.Arrays.asList(Row(99L,
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType))))
    val cf = Multimodal.extractFeatures(corrupt).collect()(0)
    assert(cf.getAs[String]("format") == "png" &&
      cf.isNullAt(cf.fieldIndex("width")) && cf.getAs[Long]("n_bytes") == 11L)
  }

  test("multimodal: WAV containers parse channels/rate/frames; truncated soft-fails") {
    val ids = Seq(0L, 1L, 4L, 9L, 123L).toDF("doc_id")
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticWavs(ids, "doc_id"))
      .orderBy("doc_id").collect()
    feats.foreach { f =>
      val id = f.getAs[Long]("doc_id")
      assert(f.getAs[String]("format") == "wav")
      assert(f.getAs[Int]("channels") == (1 + id % 2).toInt)
      assert(f.getAs[Int]("sample_rate") == (8000 + (id % 5) * 4000).toInt)
      assert(f.getAs[Long]("n_frames") == 50 + (id * 11) % 200)
      assert(f.isNullAt(f.fieldIndex("width"))) // image fields stay NULL
    }
    // a RIFF/WAVE header cut off before any fmt chunk: format sniffs as
    // wav, audio fields NULL, byte metadata intact — same soft-fail
    // contract as the corrupt PNG above
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val truncated = spark.createDataFrame(
      java.util.Arrays.asList(Row(77L,
        "RIFF    WAVE".getBytes("US-ASCII"))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType))))
    val tf = Multimodal.extractFeatures(truncated).collect()(0)
    assert(tf.getAs[String]("format") == "wav" &&
      tf.isNullAt(tf.fieldIndex("sample_rate")) &&
      tf.getAs[Long]("n_bytes") == 12L)
  }

  test("multimodal: MP4 box walk yields duration/tracks for both mvhd versions") {
    // ids 0/2/4 take the mvhd v0 layout, 1/3/123 take v1
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 123L).toDF("doc_id")
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticMp4s(ids, "doc_id"))
      .orderBy("doc_id").collect()
    feats.foreach { f =>
      val id = f.getAs[Long]("doc_id")
      assert(f.getAs[String]("format") == "mp4")
      assert(f.getAs[Long]("duration_ms") == 4 * (20 + (id * 13) % 480))
      assert(f.getAs[Int]("n_tracks") == (1 + id % 3).toInt)
      assert(f.isNullAt(f.fieldIndex("width"))) // image+audio fields NULL
      assert(f.isNullAt(f.fieldIndex("sample_rate")))
    }
    // an ftyp with a moov whose declared size overruns the payload:
    // format sniffs as mp4, video fields NULL, byte metadata intact
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val corrupt = java.nio.ByteBuffer.allocate(24)
    corrupt.putInt(16).put("ftypisom".getBytes("US-ASCII")).putInt(0)
    corrupt.putInt(9999).put("moov".getBytes("US-ASCII"))
    val cdf = spark.createDataFrame(
      java.util.Arrays.asList(Row(7L, corrupt.array())),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType))))
    val cf = Multimodal.extractFeatures(cdf).collect()(0)
    assert(cf.getAs[String]("format") == "mp4" &&
      cf.isNullAt(cf.fieldIndex("duration_ms")) &&
      cf.getAs[Long]("n_bytes") == 24L)
  }

  test("multimodal: resize downscales with exact dims; corrupt soft-fails NULL") {
    val ids = (0L to 40L).toDF("doc_id")
    val resized = Multimodal.resizeImages(
      Multimodal.syntheticImages(ids, "doc_id"), maxDim = 16)
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L to 40L).foreach { id =>
      val w = (8 + Math.floorMod(id, 32L)).toInt
      val h = (8 + Math.floorMod(id * 7, 32L)).toInt
      val (ew, eh) = Multimodal.resizedDims(w, h, 16)
      val r = resized(id)
      assert(r.getInt(2) == ew && r.getInt(3) == eh, s"id=$id")
      assert(math.max(ew, eh) <= 16)
      // the payload is a real decodable PNG with those dims
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      assert(img.getWidth == ew && img.getHeight == eh)
    }
    // corrupt/non-image payloads: NULL payload and dims, stage survives
    val junk = Seq((1L, "not an image".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(junk, maxDim = 16).collect()(0)
    assert(out.isNullAt(1) && out.isNullAt(2) && out.isNullAt(3))
  }

  test("chunk: overlap windows cover every token; short docs = one chunk") {
    val text = (1 to 25).map("w" + _).mkString(" ")
    val df = Seq((1L, text), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, "doc_id", "text", 10, 2)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // 25 tokens, window 10, step 8 → ceil((25-2)/8) = 3 chunks
    assert(d1.length == 3)
    assert(d1(0).getAs[String]("chunk_text").startsWith("w1 ") &&
      d1(0).getAs[Int]("n_tokens") == 10)
    assert(d1(1).getAs[String]("chunk_text").startsWith("w9 "))
    assert(d1(2).getAs[String]("chunk_text").endsWith(" w25"))
    // consecutive chunks overlap by 2 tokens
    assert(d1(0).getAs[String]("chunk_text").split(" ").takeRight(2).toSeq ==
      d1(1).getAs[String]("chunk_text").split(" ").take(2).toSeq)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getAs[Int]("n_tokens") == 2)
  }

  test("packSequences: exact partition, capacity respected, oversized singleton") {
    val docs = ((1L to 40L).map(i => (i, 100L + i)) :+ (99L, 900L))
      .toDF("doc_id", "tok")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "tok",
      capacity = 512, numBins = 4).collect()
    assert(packed.length == 41)
    assert(packed.map(_.getLong(0)).distinct.length == 41)
    // no multi-doc pack over capacity; the 900-token doc packs alone
    val byPack = packed.groupBy(r => (r.getLong(1), r.getLong(2)))
    byPack.values.foreach { rows =>
      if (rows.length > 1) assert(rows.map(_.getLong(3)).sum <= 512)
    }
    val big = packed.find(_.getLong(0) == 99L).get
    assert(byPack((big.getLong(1), big.getLong(2))).length == 1)
  }

  // ── duplicateSpans (substring-level exact dedup, Lee et al. 2021) ──────

  private def spans(df: org.apache.spark.sql.DataFrame, k: Int) =
    Dedup.duplicateSpans(df, "doc_id", "text", k).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"))).toSet

  test("duplicateSpans flags cross-doc duplicated k-gram ranges") {
    val df = Seq((1L, "a b c d e f"), (2L, "x x a b c y")).toDF("doc_id", "text")
    assert(spans(df, 3) == Set((1L, 0L, 2L), (2L, 2L, 4L)))
  }

  test("duplicateSpans merges overlapping duplicated grams into one span") {
    val df = Seq((1L, "a b c d q"), (2L, "a b c d z")).toDF("doc_id", "text")
    // "a b c" (pos 0) and "b c d" (pos 1) both duplicated → one span [0,3]
    assert(spans(df, 3) == Set((1L, 0L, 3L), (2L, 0L, 3L)))
  }

  test("duplicateSpans catches WITHIN-doc repeats and splits far islands") {
    val df = Seq((1L, "p q r s p q r t")).toDF("doc_id", "text")
    // "p q r" at pos 0 and 4; gap 4 > k-1 → two separate spans
    assert(spans(df, 3) == Set((1L, 0L, 2L), (1L, 4L, 6L)))
  }

  test("duplicateSpans merges islands whose token ranges touch") {
    // dup grams at pos 0 and 2 (diff = k-1 = 2): ranges [0,2] and [2,4] overlap
    val df = Seq((1L, "a b c b c d x"), (2L, "z a b c w"), (3L, "u c b c d v"))
      .toDF("doc_id", "text")
    // doc1: "a b c"@0 (shared with doc2), "b c d"@3... compute: doc1 grams:
    // a b c@0, b c b@1, c b c@2, b c d@3, c d x@4; doc3 grams: u c b@0,
    // c b c@1, b c d@2, c d v@3. dup: "a b c"(d1@0,d2@1), "c b c"(d1@2,d3@1),
    // "b c d"(d1@3,d3@2). doc1 positions {0,2,3} all within diff<=2 → one
    // span [0,5]; doc3 positions {1,2} → [1,4]; doc2 {1} → [1,3]
    assert(spans(df, 3) == Set((1L, 0L, 5L), (3L, 1L, 4L), (2L, 1L, 3L)))
  }

  test("duplicateSpans ignores docs shorter than k and unique docs") {
    val df = Seq((1L, "a b"), (2L, "q w e r t y")).toDF("doc_id", "text")
    assert(spans(df, 3).isEmpty)
  }

  test("duplicateSpans frequency cap drops stop-grams") {
    val df = Seq((1L, "s t p a b c"), (2L, "s t p d e f"), (3L, "s t p g h i"),
      (4L, "a b c z z z")).toDF("doc_id", "text")
    // "s t p" occurs 3× (over cap 2) → dropped; "a b c" (2×) kept
    val out = Dedup.duplicateSpans(df, "doc_id", "text", 3, maxGramFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 3L, 5L), (4L, 0L, 2L)))
  }

  test("duplicateSpans fuzz: equals a brute-force reference") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val k = 2 + rnd.nextInt(3)
      val docsSeq = (1L to 30L).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(24))(('a' + rnd.nextInt(4)).toChar.toString)
          .mkString(" "))
      }
      val gramsAll = docsSeq.flatMap { case (id, t) =>
        val w = t.split(" ")
        if (w.length >= k)
          (0 to w.length - k).map(p => (w.slice(p, p + k).mkString(" "), id, p))
        else Nil
      }
      val cnt = gramsAll.groupBy(_._1).map { case (g, os) => g -> os.size }
      val expected = gramsAll.filter(g => cnt(g._1) > 1)
        .groupBy(_._2).toSeq.flatMap { case (id, os) =>
          val ps = os.map(_._3).sorted
          val islands = ps.foldLeft(List.empty[List[Int]]) {
            case (acc @ (cur :: rest), p) =>
              if (p - cur.head <= k - 1) (p :: cur) :: rest
              else List(p) :: acc
            case (Nil, p) => List(List(p))
          }
          islands.map(is => (id, is.min.toLong, (is.max + k - 1).toLong))
        }.toSet
      val got = spans(docsSeq.toDF("doc_id", "text"), k)
      assert(got == expected, s"k=$k")
    }
  }

  // ── removeDuplicateSpans (keep-one-occurrence cleaning) ───────────────

  private def cleaned(df: org.apache.spark.sql.DataFrame, k: Int) =
    Dedup.removeDuplicateSpans(df, "doc_id", "text", k).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("removeDuplicateSpans keeps the globally-first occurrence intact") {
    val df = Seq((1L, "a b c d"), (2L, "x a b c")).toDF("doc_id", "text")
    assert(cleaned(df, 3) == Map(1L -> "a b c d", 2L -> "x"))
  }

  test("removeDuplicateSpans handles within-doc repeats") {
    val df = Seq((1L, "p q r s p q r")).toDF("doc_id", "text")
    assert(cleaned(df, 3) == Map(1L -> "p q r s"))
  }

  test("removeDuplicateSpans empties a fully-duplicated later doc") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "u v")).toDF("doc_id", "text")
    assert(cleaned(df, 3) == Map(1L -> "a b c d", 2L -> "", 3L -> "u v"))
  }

  test("removeDuplicateSpans fuzz: reference semantics on random corpora") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 4) {
      val k = 2 + rnd.nextInt(3)
      val docsSeq = (1L to 25L).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(20))(('a' + rnd.nextInt(3)).toChar.toString)
          .mkString(" "))
      }
      val occ = docsSeq.flatMap { case (id, t) =>
        val ws = t.split(" ")
        if (ws.length >= k)
          (0 to ws.length - k).map(p => (ws.slice(p, p + k).mkString(" "), id, p))
        else Nil
      }
      val dupGrams = occ.groupBy(_._1).filter(_._2.size > 1).keySet
      val flagged = occ.filter(o => dupGrams.contains(o._1))
      val canonSet = flagged.groupBy(_._1).values
        .map(os => os.minBy(o => (o._2, o._3))).toSet
      val canonCover = flagged.filter(canonSet.contains)
        .flatMap(o => (o._3 until o._3 + k).map(t => (o._2, t))).toSet
      val nonCover = flagged.filterNot(canonSet.contains)
        .flatMap(o => (o._3 until o._3 + k).map(t => (o._2, t))).toSet
      val removed = nonCover -- canonCover
      val expected = docsSeq.map { case (id, t) =>
        id -> t.split(" ", -1).zipWithIndex
          .filterNot { case (_, i) => removed.contains((id, i)) }
          .map(_._1).mkString(" ")
      }.toMap
      assert(cleaned(docsSeq.toDF("doc_id", "text"), k) == expected, s"k=$k")
    }
  }

  // ── BM25 retrieval ─────────────────────────────────────────────────────

  test("bm25TopK matches the hand-computed formula and drops no-hit docs") {
    val df = Seq((1L, "spark spark query x"), (2L, "spark y z w"),
      (3L, "n o p q")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(df, "doc_id", "text",
      Seq("spark", "query"), topK = 5).collect()
    // N=3, avgdl=4, dl/avgdl=1 → denom = tf + 1.2
    val idfSpark = math.log(1.0 + (3 - 2 + 0.5) / 2.5)
    val idfQuery = math.log(1.0 + (3 - 1 + 0.5) / 1.5)
    val s1 = idfSpark * 2 * 2.2 / 3.2 + idfQuery * 1 * 2.2 / 2.2
    val s2 = idfSpark * 1 * 2.2 / 2.2
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc3 filtered
    assert(out(0).getDouble(1) == math.rint(s1 * 1e6) / 1e6 ||
      math.abs(out(0).getDouble(1) - s1) < 1e-6)
    assert(math.abs(out(1).getDouble(1) - s2) < 1e-6)
  }

  test("bm25TopK rewards rarer terms (idf) and saturates tf") {
    val df = (1L to 20L).map { i =>
      (i, if (i == 1) "rare common a b" else "common c d e")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(df, "doc_id", "text",
      Seq("rare", "common"), topK = 3).collect()
    assert(out.head.getLong(0) == 1L) // the rare-term doc dominates
    assert(out.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("incrementalJaccardPairs: new batch vs corpus, no corpus×corpus pairs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an entirely different sentence about trains and stations"),
      (3L, "an entirely different sentence about planes and airports"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (11L, "the quick brown fox jumps over the lazy cat"),
      (12L, "nothing like anything else in this corpus at all"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalJaccardPairs(fresh, corpus,
      "doc_id", "text", n = 3, threshold = 0.3).collect()
    // 11 matches corpus doc 1; corpus docs 2/3 are near-dups of EACH
    // OTHER but must NOT pair (corpus×corpus is out of scope); 12 is new
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((11L, 1L)))
    // matches full jaccardPairs restricted to the cross split
    val full = Dedup.jaccardPairs(
      corpus.unionByName(fresh), "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.filter { case (a, b) => a <= 3 && b >= 11 }
      .map { case (a, b) => (b, a) } == Set((11L, 1L)))
  }

  // ── deterministic shuffle + sharding ──────────────────────────────────

  test("deterministicShuffle is reproducible, complete, and shard-balanced") {
    val df = (1L to 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = Sampling.deterministicShuffle(df, "doc_id", seed = 42, nShards = 7)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("shuffle_pos"),
        r.getAs[Long]("shard")))
    val b = Sampling.deterministicShuffle(df.repartition(5), "doc_id",
      seed = 42, nShards = 7)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("shuffle_pos"),
        r.getAs[Long]("shard")))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq) // partitioning-invariant
    assert(a.map(_._2).sorted.toSeq == (0L until 100L))  // a permutation
    val sizes = a.groupBy(_._3).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)                   // round-robin balance
    // a different seed gives a different order
    val c = Sampling.deterministicShuffle(df, "doc_id", seed = 43, nShards = 7)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("shuffle_pos")))
    assert(c.sortBy(_._1).map(_._2).toSeq != a.sortBy(_._1).map(_._2).toSeq)
  }

  // ── semantic dedup (SemDeDup shape) ───────────────────────────────────

  test("semanticDedup removals are exact-verified and complete here") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.999f, 0.001f)),   // near-dups
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.001f, 0.999f)),   // near-dups
      (5L, Seq(0.7f, 0.7f)), (6L, Seq(-1.0f, 0.0f)))       // singletons
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, threshold = 0.99, nlist = 2,
      iters = 2, probes = 2).collect()
    val removed = out.filter(!_.getAs[Boolean]("keep")).map(_.getLong(0)).toSet
    assert(removed == Set(2L, 4L))
    // every row present; survivors carry their own id as component
    assert(out.map(_.getLong(0)).toSet == (1L to 6L).toSet)
    assert(out.filter(_.getLong(0) == 2L).head.getAs[Long]("component") == 1L)
    // subset-of-exact (precision 1) against the O(n²) baseline
    val exact = Components.dedupClusters(
        Similarity.thresholdPairs(df, 0.99).select("i", "j"), "i", "j")
      .filter(!col("keep")).collect().map(_.getLong(0)).toSet
    assert(removed.subsetOf(exact))
  }

  test("semanticDedup single-probe stays a subset of multi-probe") {
    val df = (1L to 12L).map { i =>
      val a = (i % 4).toFloat; (i, Seq(a, 1f, (i / 7).toFloat))
    }.toDF("vec_id", "embedding")
    def removed(p: Int) = Similarity.semanticDedup(df, 0.95, nlist = 3,
      iters = 2, probes = p).filter(!col("keep"))
      .collect().map(_.getLong(0)).toSet
    assert(removed(1).subsetOf(removed(2)))
  }
}
