package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text quality / language-ID / tokenization operators for training-data
  * curation. All pure per-row expressions (codegen'd, shuffle-free), so
  * the whole stage pipelines inside the scan at any scale. */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language-ID heuristic.
    * Deliberately tiny and deterministic; the operator contract is the
    * argmax structure, not lexicon quality. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "de", "et", "un", "en", "est"),
    "es" -> Seq("el", "los", "de", "y", "un", "en", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "zu", "ist"),
    "zh" -> Seq("de5", "le5", "shi4", "wo3", "bu4", "zai4", "you3"))

  private def words(textCol: Column): Column = split(textCol, " ")

  /** Count of tokens belonging to a profile (occurrences, not distinct). */
  def profileHits(textCol: Column, profile: Seq[String]): Column =
    size(filter(words(textCol),
      w => profile.map(p => w === lit(p)).reduce(_ || _)))

  /** Language-ID: argmax of profile hit counts; ties resolve to the first
    * profile in declaration order ('und' when all scores are zero). */
  def langId(textCol: Column): Column = {
    val scores = langProfiles.map { case (l, p) => (l, profileHits(textCol, p)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight keeps first-profile-wins on ties: en > fr > es > de > zh
  }

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(words(textCol))

  /** BPE-ish subword estimate: split words every ~4 chars, then count
    * non-empty tokens after whitespace/punct splitting — a cheap regex
    * proxy for tokenizer budgeting. (No lookahead: the oracle runs on
    * RE2.) */
  def subwordEstimate(textCol: Column): Column =
    size(filter(
      split(regexp_replace(textCol, "(\\w{4})", "$1 "), "[\\s\\p{Punct}]+"),
      t => t =!= ""))

  /** PII redaction — the standard corpus-cleaning pass before training:
    * emails, IPv4s, and long digit runs (phone/ID shapes) replaced with
    * typed placeholder tokens. A pure codegen'd regexp_replace chain:
    * per-row, shuffle-free, linear in the corpus — and RE2-compatible
    * patterns (no lookarounds) so the DuckDB oracle evaluates the exact
    * same language. */
  def redact(textCol: Column): Column = {
    val email = regexp_replace(textCol,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b\\d{7,}\\b", "<NUM>")
  }

  /** Quality features + a combined score. All int/int double divisions →
    * deterministic across engines. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTokens = tokenCount(t)
    val nPunct = nChars - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val nStop = profileHits(t, langProfiles.head._2)
    df.select(
      col(idCol),
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      round(nChars.cast(DoubleType) / nTokens.cast(DoubleType), 6).as("avg_token_len"),
      round(nPunct.cast(DoubleType) / nChars.cast(DoubleType), 6).as("punct_ratio"),
      round(nStop.cast(DoubleType) / nTokens.cast(DoubleType), 6).as("stopword_ratio"),
      // score: in-range token length, some stopwords, low punctuation
      round(
        when(nTokens.between(10, 1000), 0.4).otherwise(0.0) +
        when((nStop.cast(DoubleType) / nTokens.cast(DoubleType)) > 0.05, 0.3)
          .otherwise(0.0) +
        when((nPunct.cast(DoubleType) / nChars.cast(DoubleType)) < 0.1, 0.3)
          .otherwise(0.0), 2).as("quality_score"))
  }

  /** Canonical-form fingerprint: lowercase, strip punctuation, collapse
    * whitespace, md5 — the cheap member of the dedup family (catches
    * case/punctuation-only variants). */
  def fingerprint(textCol: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(textCol), "[\\p{Punct}]", ""), "\\s+", " ")))

  /** Within-document repetition features (the RefinedWeb/Gopher
    * "duplicate n-gram fraction" filter): per doc, the fraction of its
    * word n-grams that are repeats. Pure per-row array expressions —
    * no explode, no shuffle — so the filter pipelines inside the scan
    * at any corpus size. Short docs (< n words) count as one shingle,
    * mirroring [[Dedup.shingles]]. */
  def repetitionFeatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, maxDupFraction: Double = 0.2): DataFrame = {
    // split() hoisted into its own projection (lambda bodies get no
    // subexpression elimination — inlining re-tokenizes per shingle) and
    // the shingle build itself bound once: `shs` appears in four output
    // columns below, and top-level CSE cannot always prove the transform
    // chain common. Par.ensure parallelizes the single-file scan case.
    val ws = col("__ws")
    val shs0 = when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => array_join(slice(ws, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(ws, " ")))
    val shs = col("__shs")
    val total = size(shs)
    val distinctN = size(array_distinct(shs))
    Par.ensure(df, col(idCol))
      .select(col(idCol), split(col(textCol), " ").as("__ws"))
      .select(col(idCol), shs0.as("__shs"))
      .select(
      col(idCol),
      total.as("n_ngrams"),
      distinctN.as("n_distinct"),
      round(lit(1.0) - distinctN.cast(DoubleType) / total.cast(DoubleType), 6)
        .as("dup_fraction"),
      (lit(1.0) - distinctN.cast(DoubleType) / total.cast(DoubleType) <=
        maxDupFraction).as("keep"))
  }

  /** Context-window chunking: split each document into token windows of
    * `maxTokens` advancing by `maxTokens - overlap` (the RAG / long-doc
    * preprocessing step). Pure per-row transform + posexplode — no
    * shuffle, pipelines inside the scan at any corpus size. The final
    * window is the remainder (possibly shorter); every token appears in
    * at least one chunk. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val step = maxTokens - overlap
    // deliberately NOT hoisting split or guarding parallelism here: the
    // per-row work after tokenization is a cheap slice/explode, and both
    // variants measured slower at sf0.1 (0.32 s as-is vs 0.45 s hoisted
    // vs 0.63 s hoisted+repartitioned) — the materialized token array
    // widens the Generate input for no codegen win at this site
    val ws = split(col(textCol), " ")
    val nChunks = greatest(lit(1),
      ceil((size(ws) - lit(overlap)).cast(DoubleType) / step).cast("int"))
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(ws, i * step + 1, lit(maxTokens)), " "))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", size(split(col("chunk_text"), " ")))
  }

  /** Sequence packing: greedy first-fit of documents into fixed-capacity
    * training contexts (the pretraining batch-prep step that turns a
    * ragged corpus into dense `maxTokens` windows).
    *
    * Scale design: documents are hash-bucketed into `numBins` independent
    * groups (deterministic, data-parallel — each bin packs on one task),
    * sorted (tokens desc, id) inside the bin, then packed first-fit-
    * decreasing in a single pass. No driver state, no global sort: the
    * shuffle is one hash-partition by bin. Oversized docs (> capacity)
    * get singleton packs (callers chunk first via [[chunk]]).
    * Output: (doc, bin, pack, pack_tokens) — every doc exactly once. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      capacity: Int, numBins: Int = 64): DataFrame = {
    val binned = df.select(col(idCol).as("doc"),
        col(tokensCol).cast("long").as("tokens"),
        pmod(xxhash64(col(idCol)), lit(numBins)).as("bin"))
      .repartition(col("bin"))
      .sortWithinPartitions(col("bin"), col("tokens").desc, col("doc"))
    import binned.sparkSession.implicits._
    binned.select("doc", "tokens", "bin").as[(Long, Long, Long)]
      .mapPartitions { rows =>
        // one partition may hold several bins after hash-partitioning;
        // packs are per-bin so results are partitioning-independent
        val open = scala.collection.mutable.Map.empty[Long,
          scala.collection.mutable.ArrayBuffer[(Long, Long)]] // bin → packs
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        rows.foreach { case (doc, tokens, bin) =>
          val packs = open.getOrElseUpdate(bin,
            scala.collection.mutable.ArrayBuffer.empty)
          // first-fit over open packs of this bin
          val fit = packs.indexWhere(_._2 + tokens <= capacity)
          val packId =
            if (tokens >= capacity) { // singleton (incl. oversized)
              packs += ((packs.length.toLong, capacity.toLong)); packs.length - 1
            } else if (fit >= 0) {
              packs(fit) = (packs(fit)._1, packs(fit)._2 + tokens); fit
            } else {
              packs += ((packs.length.toLong, tokens)); packs.length - 1
            }
          out += ((doc, bin, packId.toLong, tokens))
        }
        out.iterator
      }
      .toDF("doc", "bin", "pack", "tokens")
  }

  /** Corpus vocabulary: top-`k` tokens by document frequency — the
    * tokenizer-training / stopword-derivation step. One explode + one
    * hash-shuffle count (map-side partial agg bounds the shuffle by
    * vocabulary size per partition, not token count); the Zipf-head skew
    * lives in the COUNT, not a join, so no salting is needed. Ties break
    * lexicographically for determinism. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame =
    df.select(col(idCol).as("doc"),
        explode(array_distinct(split(col(textCol), " "))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token"))
      .limit(k)

  /** BM25-scored retrieval (Robertson–Spärck Jones idf, the k1/b
    * saturation form) of the top-`topK` documents for a small literal
    * term set — the keyword-retrieval / targeted-curation primitive
    * (e.g. "pull every doc matching this probe query" over a crawl).
    *
    * Scale shape: term frequencies are per-row expressions over the
    * tokenized text (no inverted-index shuffle — the index is the
    * parquet scan itself), and the corpus statistics the formula needs
    * (N, avgdl, per-term document frequencies) are ONE single-row global
    * aggregate cross-joined back as a broadcast. The corpus therefore
    * scans exactly twice (once for stats, once for scoring) and never
    * shuffles by content; top-k is a TakeOrdered, not a global sort.
    *
    * Determinism: the score sums term contributions in declaration order
    * (left-assoc `+` chain), divisions and `ln` are double-precision,
    * and the output is rounded to 6 dp with doc-id tie-breaks — the same
    * cross-engine conventions as the cosine operators. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one term")
    val toks = words(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, w => w === lit(t))).as(s"tf$i")
    }
    val base = df.select(
      (col(idCol).as("doc_id") +: size(toks).as("dl") +: tfCols): _*)
    val statCols =
      count(lit(1)).cast(DoubleType).as("n") +:
        (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast(DoubleType)
            .as(s"df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast(DoubleType)
      val idf = log(lit(1.0) +
        (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }
}
