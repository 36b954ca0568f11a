package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Document deduplication operators for training-data pipelines.
  *
  * Scale notes (the designs assume hundreds of TB, tested at MBs):
  *   - exact dedup is a single hash-shuffle on the digest — the canonical
  *     scalable pattern; Catalyst plans partial aggregation map-side.
  *   - n-gram Jaccard materializes (shingle, doc) pairs and joins on
  *     shingle; the join key distribution is the shingle frequency — a
  *     frequency cap (`maxShingleFreq`) drops degenerate stop-shingles,
  *     which both bounds skew and removes semantically useless evidence
  *     (same idea as stop-word removal; at web scale a shingle shared by
  *     millions of docs contributes nothing to dedup decisions).
  *   - MinHash+LSH replaces the all-pairs join with banded signatures:
  *     O(n·bands) rows shuffle instead of O(n²) pairs; candidates are then
  *     verified with exact Jaccard, restricted to the candidate set.
  */
object Dedup {

  /** Exact dedup: one survivor (min of `idCol`) per distinct digest of
    * `textCol`. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("digest"))
      .groupBy("digest")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-`n`-gram shingles per document: (id, shingle).
    * Per-doc dedup is LOCAL (`array_distinct` before the explode) — a
    * global `.distinct()` here would shuffle every exploded shingle of
    * the corpus, a full-corpus exchange that per-row dedup replaces for
    * free (the set is per-document by definition). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // split() is hoisted into its own projection: expression trees inside
    // transform() lambdas see no subexpression elimination, so inlining
    // `split(text)` there re-tokenizes the document once PER SHINGLE
    // (measured 3x on the gram stage). Par.ensure parallelizes the
    // shingle build when the scan is a single small file (guide §2.5).
    val words = col("__ws")
    Par.ensure(df, col(idCol))
      .select(col(idCol).as("doc"), split(col(textCol), " ").as("__ws"))
      .select(col("doc"),
        array_distinct(
          when(size(words) >= n,
            transform(sequence(lit(0), size(words) - n),
              i => array_join(slice(words, i + 1, lit(n)), " ")))
            .otherwise(array(array_join(words, " "))))
          .as("shs"))
      .select(col("doc"), explode(col("shs")).as("shingle"))
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold.
    *
    * @param maxShingleFreq drop shingles occurring in more than this many
    *        docs before the pair join (skew + noise control). Disabled
    *        (Int.MaxValue) keeps exact semantics.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxShingleFreq: Int = Int.MaxValue): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val filtered =
      if (maxShingleFreq == Int.MaxValue) sh
      else {
        // broadcast the OVER-cap set (stop-shingles: tiny, Zipf head) and
        // anti-join — broadcasting the kept vocabulary would ship nearly
        // every distinct shingle to every executor and OOM at web scale
        val over = sh.groupBy("shingle").agg(count(lit(1)).as("df_freq"))
          .filter(col("df_freq") > maxShingleFreq)
        sh.join(broadcast(over.select("shingle")), Seq("shingle"), "left_anti")
      }
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val a = filtered.select(col("doc").as("d1"), col("shingle"))
    val b = filtered.select(col("doc").as("d2"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("inter"))
    jaccardFromIntersections(inter, sizes, threshold)
  }

  /** jaccard = |∩| / (|A| + |B| − |∩|) as a deterministic int/int double
    * division (bit-identical across engines). */
  private def jaccardFromIntersections(inter: DataFrame, sizes: DataFrame,
      threshold: Double): DataFrame = {
    inter
      .join(sizes.withColumnRenamed("doc", "d1").withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc", "d2").withColumnRenamed("sz", "sz2"), "d2")
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("sz1") + col("sz2") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Benchmark decontamination: the fraction of each corpus document's
    * n-gram shingles that appear anywhere in the benchmark set; documents
    * at-or-over `threshold` are flagged contaminated — the standard
    * pre-training hygiene pass (a training corpus must not contain the
    * eval suite).
    *
    * Scale shape: benchmark suites are tiny next to the corpus, so the
    * DISTINCT benchmark shingle set is BROADCAST and the corpus side
    * never shuffles its shingles ([[shingles]] dedups per-doc locally)
    * — one map-side hash probe + a partial-aggregated per-doc rollup. */
  def contamination(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double): DataFrame = {
    val cs = shingles(corpus, idCol, textCol, n)
    val bs = shingles(bench, idCol, textCol, n)
      .select(col("shingle")).distinct()
      .withColumn("_hit", lit(1))
    cs.join(broadcast(bs), Seq("shingle"), "left_outer")
      .groupBy("doc")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0))).cast("long").as("hits"))
      .withColumn("overlap",
        col("hits").cast(DoubleType) / col("n_shingles").cast(DoubleType))
      .select(col("doc").as(idCol), col("n_shingles"), col("hits"),
        round(col("overlap"), 6).as("overlap"),
        (col("overlap") >= threshold).as("contaminated"))
  }

  /** MinHash + banded LSH near-dup pairs, verified with exact Jaccard.
    *
    * `numHashes` minhash values per doc (min of a seeded xxhash64 over the
    * shingle set), grouped into bands of `rowsPerBand`; docs sharing any
    * band bucket become candidates; candidates are verified exactly. With
    * rowsPerBand=2 / 64 bands, P(miss) at J=0.5 is (1−0.25)^64 ≈ 1e-8, so
    * the result equals the exact jaccardPairs output with near-certainty
    * while shuffling O(n·bands) instead of O(n²). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, numHashes: Int = 128, rowsPerBand: Int = 2): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand

    // Signature stage is entirely PER-ROW — no shingle explode, no
    // signature shuffle: shingle the text, 64-bit-hash each distinct
    // shingle, and compute all minhashes in one codegen'd pass
    // (MinHashSig). Distinct-by-base-hash equals distinct-by-shingle up
    // to 64-bit collisions (~|shingles|²/2⁶⁴ — negligible at any corpus
    // size this engine targets, and 2⁻³² even at 100 B shingles).
    // hoisted split + adaptive parallelism — same rationale as [[shingles]]
    val words = col("__ws")
    val shingleStrs =
      when(size(words) >= n,
        transform(sequence(lit(0), size(words) - n),
          i => array_join(slice(words, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(words, " ")))
    val docsH = Par.ensure(df, col(idCol))
      .select(col(idCol).as("doc"), split(col(textCol), " ").as("__ws"))
      .select(col("doc"),
        array_distinct(transform(shingleStrs, s => xxhash64(s))).as("h0s"))
      .select(col("doc"), col("h0s"), size(col("h0s")).as("sz"),
        graft.functions.MinHashSig.minhashSig(col("h0s"), numHashes).as("sig"))
      .cache()

    // band hash = xxhash64 of the band's minhash values; O(n·bands) rows
    // shuffle into the candidate self-join — the LSH scale contract
    val bandCols = (0 until numBands).map { bnd =>
      val elems = (0 until rowsPerBand).map(r =>
        element_at(col("sig"), bnd * rowsPerBand + r + 1))
      struct(lit(bnd).as("band"), xxhash64(elems: _*).as("bh")).as(s"b$bnd")
    }
    val banded = docsH.select(col("doc"), array(bandCols: _*).as("bands"))
      .select(col("doc"), explode(col("bands")).as("b"))
      .select(col("doc"), col("b.band").as("band"), col("b.bh").as("bh"))

    val candidates = banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("d1"), col("y.doc").as("d2"))
      .distinct()

    // exact verification per candidate pair: set intersection of the two
    // base-hash arrays — a per-pair primitive op, vs re-exploding and
    // re-joining every shingle of every candidate doc
    val d1s = docsH.select(col("doc").as("d1"), col("h0s").as("h1s"),
      col("sz").as("sz1"))
    val d2s = docsH.select(col("doc").as("d2"), col("h0s").as("h2s"),
      col("sz").as("sz2"))
    candidates.join(d1s, Seq("d1")).join(d2s, Seq("d2"))
      .withColumn("inter", size(array_intersect(col("h1s"), col("h2s"))))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("sz1") + col("sz2") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Incremental near-dup check of a NEW batch against the at-rest
    * corpus: every (new, corpus) pair with word-n-gram Jaccard ≥
    * `threshold` — the daily-crawl update shape. The increment is small
    * by definition, so its distinct shingle set BROADCASTS; the corpus
    * scans once, probes the broadcast map-side, and aggregates
    * intersections partially — the 100 TB side never shuffles its
    * shingles and no corpus×corpus pair is ever formed (that audit
    * belongs to the one-time [[jaccardPairs]]/[[minhashLshPairs]] pass).
    *
    * Output: (d_new, d_old, jaccard). Corpus docs sharing no shingle
    * with any new doc are filtered map-side by the broadcast semi-join
    * before any aggregation state exists for them. */
  def incrementalJaccardPairs(newDocs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, n: Int,
      threshold: Double): DataFrame = {
    val shNew = shingles(newDocs, idCol, textCol, n).cache()
    val shOld = shingles(corpus, idCol, textCol, n)
    val szNew = shNew.groupBy("doc").agg(count(lit(1)).as("sz_new"))
      .withColumnRenamed("doc", "d_new")
    val szOld = shOld.groupBy("doc").agg(count(lit(1)).as("sz_old"))
      .withColumnRenamed("doc", "d_old")
    val inter = shOld
      .join(broadcast(shNew.withColumnRenamed("doc", "d_new")), Seq("shingle"))
      .groupBy(col("doc").as("d_old"), col("d_new"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(szNew), Seq("d_new"))
      .join(szOld, Seq("d_old"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("sz_new") + col("sz_old") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("d_new"), col("d_old"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Duplicated-substring spans, the substring-level (not document-level)
    * exact dedup of Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better": every maximal token range of a document
    * covered by word-`k`-grams that occur more than once in the corpus
    * (across documents or repeated within one). The suffix-array machinery
    * of the paper is a single-machine construct; the distributed
    * re-expression is sorted-k-gram grouping — equivalent output for
    * spans detected at k-gram resolution.
    *
    * Plan shape at scale: positions explode to O(tokens) rows, the dup
    * test is a PARTIAL-AGGREGATED per-gram count (a hot stop-word gram
    * collapses map-side to one row per task before any exchange)
    * re-attached to the occurrences with a left-semi join — broadcast
    * when the dup-gram set is small, AQE-skew-splittable shuffle join
    * otherwise — and span merging is one window per document
    * (gaps-and-islands over positions). Nothing collects; no O(n²)
    * pair join anywhere. `maxGramFreq` optionally drops stop-grams
    * (Zipf head) on the aggregated side, before the wide join — the
    * skew valve for web corpora, off by default for exact semantics.
    *
    * Output: one row per maximal duplicated span, `(doc_id, span_start,
    * span_end)` in 0-based token indices, end inclusive. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int, maxGramFreq: Long = Long.MaxValue): DataFrame = {
    require(k >= 1, "k-gram length must be >= 1")
    // hoisted split + adaptive scan parallelism (see [[shingles]])
    val words = col("__ws")
    val grams = Par.ensure(df, col(idCol))
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__ws"))
      .filter(size(words) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(words) - k),
          i => array_join(slice(words, i + 1, lit(k)), " "))))
      .toDF("doc_id", "pos", "gram")
    // the dup test is a two-level shape (guide §2.5): the per-gram
    // count PARTIAL-aggregates map-side — a hot stop-word gram
    // collapses to one row per map task before any exchange — and the
    // filtered dup-gram set re-attaches with a left-semi join the
    // planner broadcasts when small (occurrences then never shuffle at
    // all) and AQE can skew-split when not. The r15 whole-partition
    // window count shuffled AND sorted every occurrence of a hot gram
    // into one task, with no mitigation available (AQE skew handling
    // applies to joins only, and windows see no partial aggregation);
    // the maxGramFreq cap also lands here, on the aggregated side,
    // before the wide join instead of after the wide exchange.
    val dupGrams = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1 && col("cnt") <= maxGramFreq)
      .select("gram")
    val hits = grams.join(dupGrams, Seq("gram"), "left_semi")
      .select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    hits
      // a k-gram at p covers tokens [p, p+k-1]; consecutive duplicated
      // grams whose ranges overlap (diff <= k-1) merge into one span
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) <= k - 1, 0).otherwise(1))
      .withColumn("island", sum("brk").over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + k - 1).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** Substring-level dedup REMOVAL — the end goal of the Lee et al.
    * pass: rewrite each document with duplicated content deleted while
    * keeping exactly one occurrence per duplicated k-gram (the globally
    * first by `(doc_id, pos)` — the cross-engine-deterministic
    * canonical). Token `t` of a doc is removed iff it is covered by a
    * NON-canonical duplicated-gram occurrence and not covered by any
    * canonical one, so the kept copy always survives intact.
    *
    * Scale shape: the dup test and the canonical pick are ONE
    * partial-aggregated per-gram pass (count + min(doc_id, pos) — a hot
    * gram collapses map-side before any exchange) re-attached to the
    * occurrences by a join the planner broadcasts when small and AQE
    * can skew-split when not; the coverage explode is k rows per
    * duplicated occurrence (linear, and only over the DUPLICATED
    * subset, not the corpus); reconstruction is one shuffle on doc_id.
    * Nothing collects, no pair joins.
    *
    * Output: `(doc_id, clean_text)` for every input row. */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k-gram length must be >= 1")
    // hoisted split + adaptive scan parallelism (see [[shingles]])
    val src = Par.ensure(df, col(idCol))
    val withWs = src.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("__ws"))
    val occ = withWs.filter(size(col("__ws")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("__ws")) - k),
          i => array_join(slice(col("__ws"), i + 1, lit(k)), " "))))
      .toDF("doc_id", "pos", "gram")
    // dup test + canonical pick are ONE partial-aggregated per-gram
    // pass: count + min(struct(doc_id, pos)) — min over the struct IS
    // the first occurrence in (doc_id, pos) order, exactly the row the
    // old row_number()==1 window picked ((doc_id, pos) is unique per
    // occurrence, so the min is unique). Both aggregates combine
    // map-side, so a hot stop-word gram collapses to one row per map
    // task BEFORE any exchange; the join back to the occurrences is
    // broadcast when the dup-gram set is small and AQE-skew-splittable
    // when not. The r15 shape was a whole-partition window (count +
    // row_number over one gram sort): every occurrence of a hot gram
    // shuffled AND sorted into one task, unsplittable by AQE.
    val agg = occ.groupBy("gram").agg(
        count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("first_occ"))
      .filter(col("cnt") > 1)
      .select("gram", "first_occ")
    val cover = occ.join(agg, Seq("gram"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("t"),
        (col("doc_id") === col("first_occ.doc_id") &&
          col("pos") === col("first_occ.pos")).as("canon"))
    // removed = covered positions with NO canonical cover: one grouped
    // bool-or over (doc_id, t) — the old two-distinct + anti-join shape
    // recomputed `cover` (the whole gram pipeline) once per side and
    // paid three exchanges for the same set.
    val removed = cover.groupBy("doc_id", "t")
      .agg(max(col("canon")).as("any_canon"))
      .filter(!col("any_canon"))
      .select("doc_id", "t")
    val toks = src.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")))
      .toDF("doc_id", "t", "tok")
    val kept = toks.join(removed, Seq("doc_id", "t"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("t"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"))
    df.select(col(idCol).as("doc_id"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** SimHash signatures per doc (see [[graft.functions.SimHash64]]):
    * per-row, shuffle-free. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.SimHash64.simhash64(split(col(textCol), " ")).as("simhash"))

  /** SimHash near-dup candidate pairs within Hamming distance `maxHd`,
    * using 4-block banding (pigeonhole: hd ≤ 3 guarantees one equal
    * 16-bit block; for larger maxHd recall is partial — callers verify). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHd: Int = 3): DataFrame = {
    val sigs = simhashSignatures(df, idCol, textCol).cache()
    val blocks = sigs.select(col(idCol).as("doc"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        substring(col("simhash"), i * 4 + 1, 4)): _*)).as(Seq("blk", "bv")))
    val cand = blocks.alias("x").join(blocks.alias("y"),
        col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
        col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("d1"), col("y.doc").as("d2"),
        col("x.simhash").as("h1"), col("y.simhash").as("h2"))
      .distinct()
    cand.withColumn("hd",
        graft.functions.SimHash64.hammingHex(col("h1"), col("h2")))
      .filter(col("hd") <= maxHd)
      .select("d1", "d2", "hd")
  }
}
