package graft.queries

import graft.{GQuery, QueryPack, Tables}
import graft.operators.{AsOfJoin, Bucketing, Components, Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators (the beyond-reference scope the brief
  * names as first-class): deduplication (exact, n-gram Jaccard,
  * MinHash+LSH, SimHash), embedding similarity (brute-force top-k,
  * threshold pairs, sign-LSH), text analysis (lang-ID, quality scoring,
  * token counting, fingerprinting), and multimodal binary plumbing.
  * Everything with portable semantics carries a DuckDB oracle. */
object Extensions extends QueryPack {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** Shared oracle for exact n-gram Jaccard pairs (J ≥ 0.5, 5-gram). Also
    * the oracle for the MinHash+LSH query: with 64 bands × 2 rows the miss
    * probability at J = 0.5 is (1 − 0.25)^64 ≈ 1e-8, so LSH+verify equals
    * the exact result. */
  private val jaccardOracle = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh0 AS (SELECT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS s
            FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS i) g),
    shd AS (SELECT DISTINCT doc_id, s FROM sh0),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1),
    pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
              FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT d1, d2,
      round(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter), 6) AS jaccard
    FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
    WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.5
    ORDER BY d1, d2"""

  private val cosineExpr =
    """round(list_dot_product(a.v, b.v) /
       sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 6)"""

  val all: Seq[GQuery] = Seq(

    // ───── deduplication ─────────────────────────────────────────────────
    GQuery("x01_dedup_exact", Some("""
      SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY digest""")) { (s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text").orderBy("digest")
    },

    GQuery("x02_ngram_jaccard_pairs", Some(jaccardOracle)) { (s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 5, threshold = 0.5)
        .orderBy("d1", "d2")
    },

    GQuery("x03_minhash_lsh_pairs", Some(jaccardOracle)) { (s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text", n = 5,
        threshold = 0.5, numHashes = 128, rowsPerBand = 2)
        .orderBy("d1", "d2")
    },

    GQuery("x04_simhash_signatures", Some("""
      WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      h AS (SELECT doc_id, substr(md5(word), 1, 16) AS hx FROM w),
      bits AS (SELECT doc_id, b,
        CASE WHEN ((strpos('0123456789abcdef', substr(hx, 1 + CAST(b // 4 AS INT), 1)) - 1)
              >> CAST(3 - (b % 4) AS INT)) & 1 = 1 THEN 1 ELSE -1 END AS v
        FROM h, LATERAL (SELECT unnest(generate_series(0, 63)) AS b) g),
      acc AS (SELECT doc_id, b, sum(v) AS sgn FROM bits GROUP BY 1, 2),
      hexd AS (SELECT doc_id, b // 4 AS d,
        sum((CASE WHEN sgn > 0 THEN 1 ELSE 0 END) *
            (CASE CAST(b % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) AS hv
        FROM acc GROUP BY 1, 2)
      SELECT doc_id,
        string_agg(substr('0123456789abcdef', CAST(hv AS INT) + 1, 1), '' ORDER BY d) AS simhash
      FROM hexd GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
      Dedup.simhashSignatures(docs(s, dir), "doc_id", "text").orderBy("doc_id")
    },

    // ───── similarity search ─────────────────────────────────────────────
    GQuery("x05_cosine_threshold_pairs", Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT a.vec_id AS i, b.vec_id AS j, $cosineExpr AS sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE $cosineExpr >= 0.4
      ORDER BY i, j""")) { (s, dir) =>
      Similarity.thresholdPairs(embs(s, dir), threshold = 0.4).orderBy("i", "j")
    },

    GQuery("x06_ann_bruteforce_topk", Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 10),
      scored AS (SELECT q.query_id, b.vec_id AS neighbor_id,
        round(list_dot_product(a.v, b.v) /
          sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 6) AS sim
        FROM q JOIN e a ON a.vec_id = q.query_id
        JOIN e b ON b.vec_id <> q.query_id),
      ranked AS (SELECT query_id, neighbor_id, sim,
        CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
        FROM scored)
      SELECT query_id, neighbor_id, sim, rnk FROM ranked WHERE rnk <= 5
      ORDER BY query_id, rnk""")) { (s, dir) =>
      val e = embs(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5)
        .orderBy("query_id", "rnk")
    },

    // LSH recall < 1 by design, so an equality oracle is impossible — but
    // the recall CONTRACT is checkable: the verified LSH output must be a
    // subset of the exact pair set (verification re-scores with the exact
    // cosine) and must recover at least half of it at this banding. Both
    // sides of the comparison are computed in-engine; DuckDB independently
    // reproduces the exact pair count.
    GQuery("x07_ann_lsh_bucketed", Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT CAST(count(*) AS BIGINT) AS n_exact,
        TRUE AS subset_ok, TRUE AS recall_ok
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE $cosineExpr >= 0.4""")) { (s, dir) =>
      val e = embs(s, dir)
      val exact = Similarity.thresholdPairs(e, threshold = 0.4)
        .select(col("i"), col("j"), lit(1).as("ex"))
      val found = Similarity.lshBucketedPairs(e, threshold = 0.4, dim = 64)
        .select(col("i"), col("j"), lit(1).as("fo"))
      exact.join(found, Seq("i", "j"), "full_outer")
        .agg(sum(col("ex")).cast("long").as("n_exact"),
             coalesce(sum(when(col("ex").isNull, 1)), lit(0)).as("n_extra"),
             coalesce(sum(when(col("ex") === 1 && col("fo") === 1, 1)), lit(0))
               .as("n_hit"))
        .select(col("n_exact"),
          (col("n_extra") === 0).as("subset_ok"),
          (col("n_hit").cast("double") / col("n_exact") >= 0.5).as("recall_ok"))
    },

    // IVF probing misses lists by design → same recall-contract oracle:
    // top-k lists come from the exact brute-force ranking (x06 shape);
    // IVF must recover ≥ 60% of them at nlist=8/nprobe=3. Training is
    // deterministic (lowest-id init + fixed Lloyd steps).
    GQuery("x13_ann_ivf_topk", Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 10),
      scored AS (SELECT q.query_id, b.vec_id AS neighbor_id,
        round(list_dot_product(a.v, b.v) /
          sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 6) AS sim
        FROM q JOIN e a ON a.vec_id = q.query_id
        JOIN e b ON b.vec_id <> q.query_id),
      ranked AS (SELECT query_id, neighbor_id,
        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
        FROM scored)
      SELECT CAST(count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
      FROM ranked WHERE rnk <= 5""")) { (s, dir) =>
      val e = embs(s, dir)
      val queries = e.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(e, queries, k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("ex"))
      val model = graft.operators.IvfIndex.train(e, nlist = 8, iters = 2)
      val ivf = graft.operators.IvfIndex.topK(e, queries, model,
        k = 5, nprobe = 3)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("fo"))
      exact.join(ivf, Seq("query_id", "neighbor_id"), "full_outer")
        .agg(sum(col("ex")).cast("long").as("n_exact"),
             coalesce(sum(when(col("ex") === 1 && col("fo") === 1, 1)), lit(0))
               .as("n_hit"))
        .select(col("n_exact"),
          (col("n_hit").cast("double") / col("n_exact") >= 0.6).as("recall_ok"))
    },

    // int8-quantized ANN probe + exact rescore: the probe ranks on
    // 1-byte/dim arrays (the 100 TB scan is 8× smaller), full-precision
    // vectors are fetched only for k×probeFactor candidates per query.
    // Contract: ≥80% recall of the exact top-k, AND every reported hit
    // carries the EXACT similarity (rescoring restores precision —
    // quantization can only cost recall, never score accuracy). DuckDB
    // independently reproduces the exact top-k cardinality.
    GQuery("x36_ann_quantized", Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 10),
      scored AS (SELECT q.query_id, b.vec_id AS neighbor_id,
        round(list_dot_product(a.v, b.v) /
          sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 6) AS sim
        FROM q JOIN e a ON a.vec_id = q.query_id
        JOIN e b ON b.vec_id <> q.query_id),
      ranked AS (SELECT query_id, neighbor_id,
        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
        FROM scored)
      SELECT CAST(count(*) AS BIGINT) AS n_exact,
        TRUE AS recall_ok, TRUE AS exact_scores_ok
      FROM ranked WHERE rnk <= 5""")) { (s, dir) =>
      val e = embs(s, dir)
      val queries = e.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(e, queries, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("sim").as("ex_sim"), lit(1).as("ex"))
      val quant = Similarity.quantizedTopK(e, queries, k = 5, probeFactor = 4)
        .select(col("query_id"), col("neighbor_id"),
          col("sim").as("q_sim"), lit(1).as("fo"))
      exact.join(quant, Seq("query_id", "neighbor_id"), "full_outer")
        .agg(sum(col("ex")).cast("long").as("n_exact"),
             coalesce(sum(when(col("ex") === 1 && col("fo") === 1, 1)), lit(0))
               .as("n_hit"),
             coalesce(sum(when(col("ex") === 1 && col("fo") === 1 &&
               col("ex_sim") =!= col("q_sim"), 1)), lit(0)).as("n_score_bad"))
        .select(col("n_exact"),
          (col("n_hit").cast("double") / col("n_exact") >= 0.8).as("recall_ok"),
          (col("n_score_bad") === 0).as("exact_scores_ok"))
    },

    // Salted skew join: result identical to the plain join (salting only
    // changes physical distribution), so the oracle is the unsalted join.
    // l_returnflag has 3 values — the canonical pathological join key.
    GQuery("x14_salted_skew_join", Some("""
      SELECT l_returnflag AS flag, r.flag_desc, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
      FROM lineitem JOIN (
        SELECT 'A' AS flag_key, 'returned_a' AS flag_desc UNION ALL
        SELECT 'N', 'not_returned' UNION ALL
        SELECT 'R', 'returned_r') r
      ON l_returnflag = r.flag_key
      GROUP BY 1, 2 ORDER BY flag""")) { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .withColumnRenamed("l_returnflag", "flag_key")
      val dim = Seq(("A", "returned_a"), ("N", "not_returned"),
        ("R", "returned_r")).toDF("flag_key", "flag_desc")
      graft.operators.SkewJoin.saltedInnerJoin(li, dim, "flag_key", parts = 8)
        .groupBy(col("flag_key").as("flag"), col("flag_desc"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
            .cast("double").as("qty"))
        .orderBy("flag")
    },

    // ───── text analysis ─────────────────────────────────────────────────
    GQuery("x08_text_quality", Some("""
      WITH t AS (SELECT doc_id, text,
        CAST(length(text) AS INT) AS n_chars,
        CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS INT) AS n_punct,
        CAST(len(list_filter(string_split(text, ' '),
          w -> w IN ('the','a','of','and','to','in','is'))) AS INT) AS n_stop
      FROM documents)
      SELECT doc_id, n_chars, n_tokens,
        round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS avg_token_len,
        round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
        round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
        round(
          (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END +
           CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens > 0.05 THEN 0.3 ELSE 0.0 END) +
           CASE WHEN CAST(n_punct AS DOUBLE) / n_chars < 0.1 THEN 0.3 ELSE 0.0 END, 2)
          AS quality_score
      FROM t ORDER BY doc_id""")) { (s, dir) =>
      TextAnalysis.qualityFeatures(docs(s, dir), "doc_id", "text").orderBy("doc_id")
    },

    GQuery("x09_langid", Some("""
      WITH scored AS (SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in','is'))) AS INT) AS s_en,
        CAST(len(list_filter(string_split(text, ' '), w -> w IN ('le','la','de','et','un','en','est'))) AS INT) AS s_fr,
        CAST(len(list_filter(string_split(text, ' '), w -> w IN ('el','los','de','y','un','en','es'))) AS INT) AS s_es,
        CAST(len(list_filter(string_split(text, ' '), w -> w IN ('der','die','das','und','ein','zu','ist'))) AS INT) AS s_de,
        CAST(len(list_filter(string_split(text, ' '), w -> w IN ('de5','le5','shi4','wo3','bu4','zai4','you3'))) AS INT) AS s_zh
      FROM documents),
      pred AS (SELECT doc_id,
        CASE WHEN s_en = greatest(s_en, s_fr, s_es, s_de, s_zh) AND greatest(s_en, s_fr, s_es, s_de, s_zh) > 0 THEN 'en'
             WHEN s_fr = greatest(s_en, s_fr, s_es, s_de, s_zh) AND greatest(s_en, s_fr, s_es, s_de, s_zh) > 0 THEN 'fr'
             WHEN s_es = greatest(s_en, s_fr, s_es, s_de, s_zh) AND greatest(s_en, s_fr, s_es, s_de, s_zh) > 0 THEN 'es'
             WHEN s_de = greatest(s_en, s_fr, s_es, s_de, s_zh) AND greatest(s_en, s_fr, s_es, s_de, s_zh) > 0 THEN 'de'
             WHEN s_zh = greatest(s_en, s_fr, s_es, s_de, s_zh) AND greatest(s_en, s_fr, s_es, s_de, s_zh) > 0 THEN 'zh'
             ELSE 'und' END AS lang_pred
      FROM scored)
      SELECT lang_pred, count(*) AS n FROM pred GROUP BY 1 ORDER BY lang_pred""")) { (s, dir) =>
      docs(s, dir)
        .select(TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy("lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang_pred")
    },

    GQuery("x10_token_counts", Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
        CAST(len(list_filter(
          string_split_regex(regexp_replace(text, '(\w{4})', '\1 ', 'g'), '[\s[:punct:]]+'),
          t -> t <> '')) AS INT) AS n_subwords
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
          TextAnalysis.subwordEstimate(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    },

    GQuery("x11_fingerprint_clusters", Some("""
      SELECT md5(trim(regexp_replace(
               regexp_replace(lower(text), '[[:punct:]]', '', 'g'),
               '\s+', ' ', 'g'))) AS fp,
             min(doc_id) AS keep_id, count(*) AS n
      FROM documents GROUP BY 1 ORDER BY fp""")) { (s, dir) =>
      docs(s, dir)
        .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .orderBy("fp")
    },

    // ───── multimodal: REAL image decode ─────────────────────────────────
    // Each doc_id becomes a real PNG (JDK codec) whose dimensions derive
    // from the id; the pipeline sniffs the container and DECODES it back
    // through javax.imageio in the mapPartitions batch stage. The oracle
    // is pure arithmetic on the id, so DuckDB verifies the decoded
    // dimensions with no image library — a genuine encode→decode
    // round-trip check, not plumbing-only.
    GQuery("x12_multimodal_features", Some("""
      SELECT doc_id,
        'png' AS format,
        CAST(8 + doc_id % 32 AS INT) AS width,
        CAST(8 + (doc_id * 7) % 32 AS INT) AS height,
        CAST(3 AS INT) AS channels
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.syntheticImages(docs(s, dir), "doc_id"))
        .select("doc_id", "format", "width", "height", "channels")
        .orderBy("doc_id")
    },

    // REAL image resize: decode → Java2D scale (max side 16, aspect
    // preserved, integer-exact dims) → PNG re-encode, then the check
    // RE-DECODES the resized payloads — so the gate proves the output
    // is a valid image with exactly the arithmetic dimensions, not just
    // that a metadata field was set.
    GQuery("x37_multimodal_resize", Some("""
      WITH dims AS (
        SELECT doc_id,
          CAST(8 + doc_id % 32 AS INT) AS w,
          CAST(8 + (doc_id * 7) % 32 AS INT) AS h
        FROM documents),
      d2 AS (SELECT doc_id, w, h, GREATEST(w, h) AS ms FROM dims)
      SELECT doc_id,
        CAST(CASE WHEN ms <= 16 THEN w
             ELSE GREATEST(1, w * 16 // ms) END AS INT) AS width,
        CAST(CASE WHEN ms <= 16 THEN h
             ELSE GREATEST(1, h * 16 // ms) END AS INT) AS height,
        CAST(3 AS INT) AS channels
      FROM d2 ORDER BY doc_id""")) { (s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.resizeImages(
          Multimodal.syntheticImages(docs(s, dir), "doc_id"), maxDim = 16))
        .select("doc_id", "width", "height", "channels")
        .orderBy("doc_id")
    },

    // Sessionization with a 30-minute inactivity gap: Spark's
    // `session_window` (shuffle by user_id, per-key merge — no full-sort
    // window function, so it scales to 100 TB of events). The oracle
    // replays the gap logic with lag + a running sum. Spark's session
    // windows are half-open [start, last+gap), so a gap of exactly 30
    // minutes starts a new session — hence `>=` in the oracle.
    GQuery("x15_sessionization", Some("""
      WITH d AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT user_id, ts, value,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
        FROM d)
      SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM s GROUP BY user_id, sid ORDER BY user_id, start_s""")) { (s, dir) =>
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType)
               .as("sum_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("start_s"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "start_s")
    },

    // Embedding-cosine near-dup dedup decision over documents: docs whose
    // embeddings (joined on id) are ≥ threshold cosine lose to the lower
    // id — the semantic-dedup complement of the lexical (shingle) paths.
    GQuery("x20_embedding_dedup", Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      losers AS (
        SELECT DISTINCT b.vec_id AS doc_id
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE $cosineExpr >= 0.4)
      SELECT d.doc_id, CASE WHEN losers.doc_id IS NULL THEN TRUE ELSE FALSE END AS keep
      FROM documents d LEFT JOIN losers ON d.doc_id = losers.doc_id
      ORDER BY d.doc_id""")) { (s, dir) =>
      val losers = Similarity.thresholdPairs(embs(s, dir), threshold = 0.4)
        .select(col("j").as("doc_id")).distinct()
      docs(s, dir).select("doc_id")
        .join(losers.withColumn("lost", lit(true)), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(!col("lost"), lit(true)).as("keep"))
        .orderBy("doc_id")
    },

    // Connected components over near-dup candidate pairs: the clustering
    // step between "pairs found" and "keep one doc per duplicate cluster".
    // Spark side: iterated min-label propagation (join+agg per round, no
    // driver graph state); oracle: recursive transitive closure — two
    // entirely different algorithms, same fixpoint.
    GQuery("x21_dedup_components", Some("""
      WITH RECURSIVE pairs AS (
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        sh0 AS (SELECT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS s
                FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS i) g),
        shd AS (SELECT DISTINCT doc_id, s FROM sh0),
        sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1),
        p0 AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
               FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
        SELECT d1, d2
        FROM p0 JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.5),
      e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a WHERE e2.b <> r.a),
      comp AS (SELECT a AS doc_id, least(a, min(b)) AS component
               FROM reach GROUP BY a)
      SELECT doc_id, component, doc_id = component AS keep
      FROM comp ORDER BY doc_id""")) { (s, dir) =>
      val pairs = Dedup.jaccardPairs(docs(s, dir), "doc_id", "text",
        n = 5, threshold = 0.5)
      Components.dedupClusters(pairs).orderBy("doc_id")
    },

    // As-of join: latest at-or-before 'view' for every 'purchase' by the
    // same user — single-shuffle union+window, no join operator at all.
    // DuckDB's native ASOF JOIN is the oracle.
    GQuery("x22_asof_join", Some("""
      WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts::TIMESTAMP AS ts
                 FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, v.view_id
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY p.event_id""")) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      AsOfJoin.asOf(p, v, "user_id", "ts", "ts", Seq("view_id"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          col("r_view_id").as("view_id"))
        .orderBy("event_id")
    },

    // PII redaction: emails / IPv4s / long digit runs → typed placeholder
    // tokens, a codegen'd regexp_replace chain (per-row, shuffle-free).
    // Patterns are RE2-compatible, so DuckDB runs the EXACT same regex
    // language ('g' = replace-all, Spark's default); synthetic PII is
    // injected identically on both sides so the pass provably fires.
    GQuery("x31_redact", Some("""
      SELECT doc_id, md5(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              text || ' contact u' || doc_id || '@ex.com at 10.0.0.' ||
                (doc_id % 256) || ' ref 1234567890' || doc_id,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
          '\b\d{7,}\b', '<NUM>', 'g')) AS redacted_md5
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        md5(TextAnalysis.redact(concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@ex.com at 10.0.0."),
          col("doc_id") % 256, lit(" ref 1234567890"), col("doc_id"))))
          .as("redacted_md5"))
        .orderBy("doc_id")
    },

    // Benchmark decontamination: per-doc fraction of 5-gram shingles
    // found in the "benchmark" set (every 20th doc stands in for an eval
    // suite — those must flag 1.0). Bench shingles broadcast; the corpus
    // text never shuffles.
    GQuery("x32_contamination", Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      sh0 AS (SELECT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS s
              FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS i) g),
      shd AS (SELECT DISTINCT doc_id, s FROM sh0),
      bench AS (SELECT DISTINCT s FROM shd WHERE doc_id % 20 = 0),
      agg AS (SELECT d.doc_id, count(*) AS n_shingles,
                CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
              FROM shd d LEFT JOIN bench b ON d.s = b.s GROUP BY 1)
      SELECT doc_id, n_shingles, hits,
        round(CAST(hits AS DOUBLE) / n_shingles, 6) AS overlap,
        CAST(hits AS DOUBLE) / n_shingles >= 0.5 AS contaminated
      FROM agg ORDER BY doc_id""")) { (s, dir) =>
      val d = docs(s, dir)
      Dedup.contamination(d, d.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 5, threshold = 0.5)
        .orderBy("doc_id")
    },

    // Persistent IVF index: same recall contract as x13, but through the
    // write-once/probe-many path — index() builds (or loads) centroids +
    // list-partitioned assignments on disk; topKIndexed only probes. The
    // double index() call inside the query proves the reuse path returns
    // the identical model (OperatorsSpec asserts the second call runs
    // ZERO jobs); at 100 TB the k-means/assignment cost amortizes across
    // every later ANN query instead of repeating per query.
    GQuery("x33_ann_ivf_indexed", Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 10),
      scored AS (SELECT q.query_id, b.vec_id AS neighbor_id,
        round(list_dot_product(a.v, b.v) /
          sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 6) AS sim
        FROM q JOIN e a ON a.vec_id = q.query_id
        JOIN e b ON b.vec_id <> q.query_id),
      ranked AS (SELECT query_id, neighbor_id,
        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
        FROM scored)
      SELECT CAST(count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
      FROM ranked WHERE rnk <= 5""")) { (s, dir) =>
      val e = embs(s, dir)
      val queries = e.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(e, queries, k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("ex"))
      val idx = graft.operators.IvfIndex.index(e, nlist = 8, iters = 2)
      val idx2 = graft.operators.IvfIndex.index(e, nlist = 8, iters = 2)
      require(idx2.model.centroids.map(_._2.toSeq).toSeq ==
        idx.model.centroids.map(_._2.toSeq).toSeq,
        "second index() call must return the persisted model")
      val ivf = graft.operators.IvfIndex.topKIndexed(idx2, queries,
        k = 5, nprobe = 3)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("fo"))
      exact.join(ivf, Seq("query_id", "neighbor_id"), "full_outer")
        .agg(sum(col("ex")).cast("long").as("n_exact"),
             coalesce(sum(when(col("ex") === 1 && col("fo") === 1, 1)), lit(0))
               .as("n_hit"))
        .select(col("n_exact"),
          (col("n_hit").cast("double") / col("n_exact") >= 0.6).as("recall_ok"))
    },

    // Audio through the same multimodal sniff→decode seam as x12's
    // images: a deterministic PCM RIFF/WAVE fixture per doc, then
    // extractFeatures walks the chunk list for channels / sample rate /
    // frame count. The oracle is pure arithmetic on doc_id — the fixture
    // parameters — so DuckDB verifies the real container parse with no
    // audio library. Same mapPartitions batch stage, no shuffle.
    GQuery("x34_multimodal_audio", Some("""
      SELECT doc_id,
        'wav' AS format,
        CAST(1 + doc_id % 2 AS INT) AS channels,
        CAST(8000 + (doc_id % 5) * 4000 AS INT) AS sample_rate,
        CAST(50 + (doc_id * 11) % 200 AS BIGINT) AS n_frames,
        CAST(44 + (50 + (doc_id * 11) % 200) * (1 + doc_id % 2) * 2 AS BIGINT)
          AS n_bytes
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.syntheticWavs(docs(s, dir), "doc_id"))
        .select("doc_id", "format", "channels", "sample_rate", "n_frames",
          "n_bytes")
        .orderBy("doc_id")
    },

    // Video completes the multimodal trio: a deterministic ISO-BMFF
    // (MP4) container per doc — ftyp + free + moov[mvhd + traks] + mdat,
    // mvhd alternating version 0/1 by id parity — then extractFeatures
    // walks the box tree for movie duration and track count. Every
    // container parameter derives from doc_id, so the DuckDB oracle is
    // pure arithmetic (duration_ms = 4*(20 + (id*13)%480), tracks =
    // 1 + id%3, and the exact byte size of the assembled container).
    GQuery("x35_multimodal_video", Some("""
      SELECT doc_id,
        'mp4' AS format,
        CAST(80 + 4 * ((doc_id * 13) % 480) AS BIGINT) AS duration_ms,
        CAST(1 + doc_id % 3 AS INT) AS n_tracks,
        CAST(196 + 12 * (doc_id % 2) + 8 * (doc_id % 3) + doc_id % 64
          AS BIGINT) AS n_bytes
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.syntheticMp4s(docs(s, dir), "doc_id"))
        .select("doc_id", "format", "duration_ms", "n_tracks", "n_bytes")
        .orderBy("doc_id")
    },

    // Forward as-of at the operator level: FIRST right row at-or-after
    // each left row (the same DESC-carry lowering snow48 takes in SQL).
    // The matched right timestamp is selected — unique even when right
    // rows tie — so the oracle is the tie-insensitive LEFT JOIN + min.
    GQuery("x30_asof_forward_op", Some("""
      WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT user_id, ts::TIMESTAMP AS vts
                 FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, min(v.vts) AS r_vts
      FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.vts >= p.ts
      GROUP BY p.event_id, p.user_id
      ORDER BY p.event_id""")) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"))
      AsOfJoin.asOf(p, v, "user_id", "ts", "vts", Seq("vts"), forward = true)
        .select(col("event_id"), col("user_id"), col("r_vts"))
        .orderBy("event_id")
    },

    // Long-chain connected components via alternating large-star /
    // small-star: the consecutive-doc-id chain has diameter ≈ corpus
    // size, the worst case for min-propagation and exactly the shape the
    // O(log n)-round algorithm exists for. Oracle: recursive transitive
    // closure (different algorithm, same fixpoint — like x21).
    GQuery("x29_components_longchain", Some("""
      WITH RECURSIVE e0 AS (
        SELECT doc_id AS a, doc_id + 1 AS b FROM documents
        WHERE doc_id < 1000
          AND doc_id + 1 IN (SELECT doc_id FROM documents WHERE doc_id <= 1000)),
      e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      reach AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
        WHERE e2.b <> r.a),
      comp AS (SELECT a AS doc_id, least(a, min(b)) AS component
               FROM reach GROUP BY a)
      SELECT doc_id, component FROM comp ORDER BY doc_id""")) { (s, dir) =>
      // diameter bounded to 1000 — still ~100× past practical
      // min-propagation range, without paying 13 rounds at every SF
      val ids = docs(s, dir).select("doc_id")
      val chain = ids.filter(col("doc_id") < 1000)
        .select(col("doc_id").as("d1"), (col("doc_id") + 1).as("d2"))
        .join(ids.filter(col("doc_id") <= 1000)
          .select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
      Components.connectedAlternating(chain, "d1", "d2")
        .select(col("id").as("doc_id"), col("comp").as("component"))
        .orderBy("doc_id")
    },

    // As-of join with tolerance: matches further back than 1 hour are
    // nulled out (pandas/kdb `tolerance` semantics) — same single-shuffle
    // union+window plan. Oracle: DuckDB native ASOF LEFT JOIN with the
    // staleness test as a post-CASE.
    GQuery("x27_asof_within", Some("""
      WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts::TIMESTAMP AS ts
                 FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id,
        CASE WHEN p.ts - v.ts <= INTERVAL 1 HOUR THEN v.view_id END AS view_id
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY p.event_id""")) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      AsOfJoin.asOfWithin(p, v, "user_id", "ts", "ts", Seq("view_id"),
          expr("INTERVAL 1 HOUR"))
        .select(col("event_id"), col("user_id"),
          col("r_view_id").as("view_id"))
        .orderBy("event_id")
    },

    // Skew-proof as-of join: partitions on (key, time-bucket) so a
    // pathologically hot key can't serialize into one task; result is
    // identical to the plain variant (also asserted in OperatorsSpec),
    // and the oracle is again DuckDB's native ASOF JOIN.
    GQuery("x28_asof_bucketed", Some("""
      WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts::TIMESTAMP AS ts
                 FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, v.view_id
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY p.event_id""")) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      AsOfJoin.asOfBucketed(p, v, "user_id", "ts", "ts", Seq("view_id"),
          bucketSeconds = 6 * 3600)
        .select(col("event_id"), col("user_id"),
          col("r_view_id").as("view_id"))
        .orderBy("event_id")
    },

    // Within-document repetition filter (RefinedWeb/Gopher duplicate
    // n-gram fraction): pure per-row array expressions, no shuffle.
    GQuery("x23_repetition_filter", Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      sh0 AS (SELECT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS s
              FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS i) g)
      SELECT doc_id, CAST(count(*) AS INT) AS n_ngrams,
        CAST(count(DISTINCT s) AS INT) AS n_distinct,
        round(1.0 - CAST(count(DISTINCT s) AS DOUBLE) / count(*), 6)
          AS dup_fraction,
        (1.0 - CAST(count(DISTINCT s) AS DOUBLE) / count(*)) <= 0.2 AS keep
      FROM sh0 GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
      TextAnalysis.repetitionFeatures(docs(s, dir), "doc_id", "text",
        n = 5, maxDupFraction = 0.2).orderBy("doc_id")
    },

    // Corpus vocabulary: top-k tokens by document frequency (tokenizer
    // training / stopword derivation). Zipf-head skew lands in a COUNT,
    // not a join, so partial aggregation absorbs it.
    GQuery("x24_vocabulary", Some("""
      WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
                   FROM documents)
      SELECT token, count(*) AS doc_freq FROM tok GROUP BY token
      ORDER BY doc_freq DESC, token LIMIT 100""")) { (s, dir) =>
      TextAnalysis.vocabulary(docs(s, dir), "doc_id", "text", k = 100)
    },

    // Context-window chunking (RAG / long-doc preprocessing): 64-token
    // windows advancing by 48 (16-token overlap). Per-row transform +
    // posexplode, shuffle-free; exact DuckDB oracle.
    GQuery("x25_chunking", Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      c AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
              array_to_string(list_slice(ws, i*48 + 1, i*48 + 64), ' ') AS chunk_text
            FROM w, LATERAL (SELECT unnest(generate_series(0,
              greatest(CAST(ceil((len(ws) - 16) / 48.0) AS INT), 1) - 1)) AS i) g)
      SELECT doc_id, chunk_idx, chunk_text,
        CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_tokens
      FROM c ORDER BY doc_id, chunk_idx""")) { (s, dir) =>
      TextAnalysis.chunk(docs(s, dir), "doc_id", "text",
        maxTokens = 64, overlap = 16).orderBy("doc_id", "chunk_idx")
    },

    // Sequence packing (pretraining batch prep): greedy first-fit-
    // decreasing into 512-token contexts, hash-bucketed into independent
    // bins so packing is data-parallel with no global sort. The exact
    // pack assignment is engine-internal, so the gate checks the
    // contract: every doc exactly once, token mass preserved, and no
    // multi-document pack over capacity.
    GQuery("x26_sequence_packing", Some("""
      SELECT count(*) AS n_docs, count(*) AS nd,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        true AS cap_ok
      FROM documents""")) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val counts = docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("tok"))
      val packed = TextAnalysis.packSequences(counts, "doc_id", "tok",
        capacity = 512, numBins = 16)
      val packSums = packed.groupBy("bin", "pack")
        .agg(sum("tokens").as("pt"), count(lit(1)).as("members"))
      packed.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("doc")).as("nd"),
          sum(col("tokens")).as("total_tokens"))
        .crossJoin(packSums.agg(
          coalesce(min(when(col("members") === 1, lit(true))
            .otherwise(col("pt") <= 512)), lit(true)).as("cap_ok")))
        .select(col("n_docs"), col("nd"), col("total_tokens"), col("cap_ok"))
    },

    // Deterministic hash-ranked stratified sample: k docs per source,
    // reproducible across engines (rank = md5(id), no RNG) — rerunning
    // corpus curation at 100 TB must select the SAME sample.
    GQuery("x17_stratified_sample", Some("""
      WITH ranked AS (
        SELECT source, doc_id,
          row_number() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
      SELECT source, doc_id FROM ranked WHERE rn <= 20
      ORDER BY source, doc_id""")) { (s, dir) =>
      graft.operators.Sampling.stratifiedByHash(
          docs(s, dir).select("source", "doc_id"), "source", "doc_id", k = 20)
        .orderBy("source", "doc_id")
    },

    // Deterministic fraction sample: per-row hash filter, shuffle-free —
    // the scale path when strata aren't needed.
    // (fixed-length lowercase hex compares lexicographically == numerically,
    // so the oracle's string threshold '4000' is exactly 0.25 * 65536)
    GQuery("x18_fraction_sample", Some("""
      SELECT doc_id FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
      ORDER BY doc_id""")) { (s, dir) =>
      graft.operators.Sampling.fractionByHash(
          docs(s, dir).select("doc_id"), "doc_id", fraction = 0.25)
        .orderBy("doc_id")
    },

    // Domain-balanced mixture sampling: per-domain deterministic
    // hash-rates targeting equal token share per domain within half the
    // total token budget — the mixture-rebalancing step before
    // tokenization (one O(#domains) aggregate broadcast onto a
    // never-shuffled corpus scan). Rates derive from exact-integer token
    // sums in a fixed operation order, so both engines select the
    // bit-identical sample.
    GQuery("x38_domain_balanced_sample", Some("""
      WITH tok AS (
        SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS t
        FROM documents),
      dom AS (SELECT source, sum(t) AS dt FROM tok GROUP BY 1),
      tot AS (SELECT sum(dt) AS all_t, count(*) AS nd FROM dom),
      rates AS (
        SELECT source,
          least(1.0, CAST((SELECT all_t FROM tot) AS DOUBLE) * 0.5
            / CAST((SELECT nd FROM tot) AS DOUBLE)
            / CAST(dt AS DOUBLE)) AS rate
        FROM dom)
      SELECT t.source, t.doc_id
      FROM tok t JOIN rates r USING (source)
      WHERE substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) <=
        lpad(lower(to_hex(least(CAST(floor(r.rate * 4294967296) AS BIGINT),
          4294967295))), 8, '0')
      ORDER BY source, doc_id""")) { (s, dir) =>
      graft.operators.Sampling.domainBalanced(
          docs(s, dir).select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("bigint").as("t")),
          "source", "doc_id", "t", budgetFraction = 0.5)
        .select("source", "doc_id").orderBy("source", "doc_id")
    },

    // Canonicalization: after pair finding (x02/x03) and clustering
    // (x21), keep the highest-QUALITY doc per duplicate cluster
    // (longest text, id tie-break) instead of the minimum id — the
    // decision step a curation pipeline actually ships. Oracle rebuilds
    // clusters by recursive transitive closure and picks per-cluster
    // winners with a window.
    GQuery("x39_dedup_canonicalize", Some("""
      WITH RECURSIVE pairs AS (
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        sh0 AS (SELECT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS s
                FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS i) g),
        shd AS (SELECT DISTINCT doc_id, s FROM sh0),
        sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1),
        p0 AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
               FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
        SELECT d1, d2
        FROM p0 JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.5),
      e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a WHERE e2.b <> r.a),
      comp AS (SELECT a AS doc_id, least(a, min(b)) AS component
               FROM reach GROUP BY a),
      fc AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS comp,
               length(d.text) AS q
             FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
      SELECT doc_id FROM (
        SELECT doc_id,
          row_number() OVER (PARTITION BY comp ORDER BY q DESC, doc_id) AS rn
        FROM fc)
      WHERE rn = 1 ORDER BY doc_id""")) { (s, dir) =>
      val pairs = Dedup.jaccardPairs(docs(s, dir), "doc_id", "text",
        n = 5, threshold = 0.5)
      // alternating = false: a 0.5-threshold Jaccard pair graph is
      // near-clique (diameter <= 2) — min-propagation converges in 2
      // rounds, where the alternating-star default pays ~4 extra
      // fixed-cost rounds for a long-diameter resilience this graph
      // never needs (measured r15: 1.54 -> 1.95 s from the default flip)
      Components.canonicalize(
          docs(s, dir).select(col("doc_id"), length(col("text")).as("q")),
          pairs, "doc_id", "q", alternating = false)
        .select("doc_id").orderBy("doc_id")
    },

    // Composed curation pipeline — quality gate ∘ exact dedup ∘ near-dup
    // removal, each stage an already-oracled operator; the oracle
    // recomposes them in SQL. This is the end-to-end "clean the corpus"
    // shape a training-data pipeline runs.
    GQuery("x19_corpus_clean", Some(s"""
      WITH q AS (
        SELECT doc_id FROM (
          SELECT doc_id,
            CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
            CAST(length(text) AS INT) AS n_chars,
            CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS INT) AS n_punct,
            CAST(len(list_filter(string_split(text, ' '),
              w -> w IN ('the','a','of','and','to','in','is'))) AS INT) AS n_stop
          FROM documents)
        WHERE (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END +
               CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens > 0.05 THEN 0.3 ELSE 0.0 END +
               CASE WHEN CAST(n_punct AS DOUBLE) / n_chars < 0.1 THEN 0.3 ELSE 0.0 END) >= 0.7),
      keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      sh0 AS (SELECT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS sng
              FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS i) g),
      shd AS (SELECT DISTINCT doc_id, sng FROM sh0),
      sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1),
      losers AS (
        SELECT DISTINCT b.doc_id
        FROM shd a JOIN shd b ON a.sng = b.sng AND a.doc_id < b.doc_id
        JOIN sizes s1 ON a.doc_id = s1.doc_id
        JOIN sizes s2 ON b.doc_id = s2.doc_id
        GROUP BY a.doc_id, b.doc_id, s1.sz, s2.sz
        HAVING CAST(count(*) AS DOUBLE) / (s1.sz + s2.sz - count(*)) >= 0.5)
      SELECT d.doc_id FROM documents d
      JOIN q ON d.doc_id = q.doc_id
      JOIN keep ON d.doc_id = keep.doc_id
      LEFT JOIN losers ON d.doc_id = losers.doc_id
      WHERE losers.doc_id IS NULL
      ORDER BY d.doc_id""")) { (s, dir) =>
      import graft.operators.{Dedup, TextAnalysis}
      val d = docs(s, dir)
      val quality = TextAnalysis.qualityFeatures(d, "doc_id", "text")
        .filter(col("quality_score") >= 0.7).select("doc_id")
      val exactKeep = Dedup.exact(d, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val nearDupLosers = Dedup.jaccardPairs(d, "doc_id", "text",
          n = 5, threshold = 0.5)
        .select(col("d2").as("doc_id"))
      d.select("doc_id")
        .join(quality, Seq("doc_id"), "left_semi")
        .join(exactKeep, Seq("doc_id"), "left_semi")
        .join(nearDupLosers, Seq("doc_id"), "left_anti")
        .orderBy("doc_id")
    },

    // Bucketed co-located join: both sides pre-bucketed on the join key,
    // so the join plans with ZERO shuffle exchanges (asserted in
    // BucketingSpec) — the at-scale tool for repeated fact-fact joins.
    GQuery("x16_bucketed_join", Some("""
      SELECT c_mktsegment AS seg, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY seg""")) { (s, dir) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      Bucketing.writeBucketed(
        Tables.load(s, dir, "orders").select("o_custkey", "o_totalprice")
          .withColumnRenamed("o_custkey", "custkey"),
        "x16_orders_b", "custkey", buckets = 8)
      Bucketing.writeBucketed(
        Tables.load(s, dir, "customer").select("c_custkey", "c_mktsegment")
          .withColumnRenamed("c_custkey", "custkey"),
        "x16_customer_b", "custkey", buckets = 8)
      Bucketing.coLocatedJoin(s, "x16_orders_b", "x16_customer_b", "custkey")
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"),
             sum(col("o_totalprice").cast(DecimalType(12, 2)))
               .cast(DoubleType).as("total"))
        .orderBy("seg")
    },

    // Substring-level exact dedup (Lee et al. 2021): maximal token spans
    // covered by corpus-duplicated 8-grams. The paper's suffix array is
    // re-expressed as one gram hash-shuffle + a per-doc islands window.
    GQuery("x40_dup_spans", Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT doc_id, i - 1 AS pos,
              array_to_string(list_slice(ws, i, i + 7), ' ') AS gram
            FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 7)) AS i) t
            WHERE len(ws) >= 8),
      c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
      d AS (SELECT g.doc_id, g.pos FROM g JOIN c USING (gram)),
      m AS (SELECT doc_id, pos,
              CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 7
                   THEN 0 ELSE 1 END AS brk
            FROM d),
      i AS (SELECT doc_id, pos,
              sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM m)
      SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        CAST(max(pos) + 7 AS BIGINT) AS span_end
      FROM i GROUP BY doc_id, island
      ORDER BY doc_id, span_start""")) { (s, dir) =>
      Dedup.duplicateSpans(docs(s, dir), "doc_id", "text", k = 8)
        .orderBy("doc_id", "span_start")
    },

    // BM25 keyword retrieval: per-row tf expressions + one broadcast
    // global stats row; corpus never shuffles by content.
    GQuery("x41_bm25_topk", Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      d AS (SELECT doc_id, len(ws) AS dl,
              len(list_filter(ws, w -> w = 'spark')) AS tf0,
              len(list_filter(ws, w -> w = 'join')) AS tf1,
              len(list_filter(ws, w -> w = 'query')) AS tf2
            FROM t),
      g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
              CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
              CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
              CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
            FROM d)
      SELECT doc_id, score FROM (
        SELECT doc_id, round(
          ln(CAST(1.0 AS DOUBLE) + (n - df0 + CAST(0.5 AS DOUBLE)) / (df0 + CAST(0.5 AS DOUBLE)))
            * tf0 * CAST(2.2 AS DOUBLE)
            / (tf0 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))
          + ln(CAST(1.0 AS DOUBLE) + (n - df1 + CAST(0.5 AS DOUBLE)) / (df1 + CAST(0.5 AS DOUBLE)))
            * tf1 * CAST(2.2 AS DOUBLE)
            / (tf1 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))
          + ln(CAST(1.0 AS DOUBLE) + (n - df2 + CAST(0.5 AS DOUBLE)) / (df2 + CAST(0.5 AS DOUBLE)))
            * tf2 * CAST(2.2 AS DOUBLE)
            / (tf2 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)),
          6) AS score
        FROM d, g)
      WHERE score > 0
      ORDER BY score DESC, doc_id LIMIT 15""")) { (s, dir) =>
      TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text",
        terms = Seq("spark", "join", "query"), topK = 15)
    },

    // Incremental near-dup: a NEW batch (source src0) against the
    // at-rest corpus (everything else) — broadcast increment shingles,
    // corpus scans once and never shuffles.
    GQuery("x45_incremental_dedup", Some("""
      WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      sh0 AS (SELECT doc_id, source, array_to_string(list_slice(ws, i, i + 4), ' ') AS s
              FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS i) g),
      shd AS (SELECT DISTINCT doc_id, source, s FROM sh0),
      sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1),
      pairs AS (SELECT a.doc_id AS d_new, b.doc_id AS d_old, count(*) AS inter
                FROM shd a JOIN shd b ON a.s = b.s
                WHERE a.source = 'src0' AND b.source <> 'src0'
                GROUP BY 1, 2)
      SELECT d_new, d_old,
        round(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter), 6) AS jaccard
      FROM pairs JOIN sizes s1 ON d_new = s1.doc_id
                 JOIN sizes s2 ON d_old = s2.doc_id
      WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.3
      ORDER BY d_new, d_old""")) { (s, dir) =>
      val d = docs(s, dir)
      Dedup.incrementalJaccardPairs(
          d.filter(col("source") === "src0"),
          d.filter(col("source") =!= "src0"),
          "doc_id", "text", n = 5, threshold = 0.3)
        .orderBy("d_new", "d_old")
    },

    // Deterministic global shuffle + round-robin sharding: the
    // curation→tokenization handoff. md5-ordered so the oracle (and any
    // re-run at any partitioning) reproduces the order bit-identically.
    GQuery("x44_deterministic_shuffle", Some("""
      WITH r AS (SELECT doc_id,
        row_number() OVER (ORDER BY md5(concat('7', ':', CAST(doc_id AS VARCHAR))), doc_id)
          - 1 AS shuffle_pos
        FROM documents)
      SELECT doc_id, CAST(shuffle_pos AS BIGINT) AS shuffle_pos,
        CAST(shuffle_pos % 8 AS BIGINT) AS shard
      FROM r ORDER BY shuffle_pos""")) { (s, dir) =>
      graft.operators.Sampling.deterministicShuffle(
          docs(s, dir).select("doc_id"), "doc_id", seed = 7, nShards = 8)
        .select("doc_id", "shuffle_pos", "shard")
        .orderBy("shuffle_pos")
    },

    // Substring-level dedup REMOVAL: rewrite docs keeping exactly one
    // occurrence per duplicated 8-gram (globally-first canonical); a
    // token goes iff covered only by non-canonical occurrences.
    GQuery("x43_dup_span_removal", Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      toks AS (SELECT doc_id, i - 1 AS t, ws[i] AS tok
               FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) u),
      g AS (SELECT doc_id, i - 1 AS pos,
              array_to_string(list_slice(ws, i, i + 7), ' ') AS gram
            FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 7)) AS i) v
            WHERE len(ws) >= 8),
      dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
      o AS (SELECT g.doc_id, g.pos,
              row_number() OVER (PARTITION BY g.gram ORDER BY g.doc_id, g.pos) = 1 AS canon
            FROM g JOIN dup USING (gram)),
      cover AS (SELECT doc_id, pos + j AS t, canon
                FROM o, LATERAL (SELECT unnest(generate_series(0, 7)) AS j) x),
      removed AS (
        SELECT doc_id, t FROM cover WHERE NOT canon
        EXCEPT
        SELECT doc_id, t FROM cover WHERE canon),
      kept AS (SELECT tk.doc_id, tk.t, tk.tok
               FROM toks tk LEFT JOIN removed r
                 ON tk.doc_id = r.doc_id AND tk.t = r.t
               WHERE r.doc_id IS NULL)
      SELECT d.doc_id,
        coalesce((SELECT string_agg(tok, ' ' ORDER BY t) FROM kept
                  WHERE kept.doc_id = d.doc_id), '') AS clean_text
      FROM documents d ORDER BY d.doc_id""")) { (s, dir) =>
      Dedup.removeDuplicateSpans(docs(s, dir), "doc_id", "text", k = 8)
        .orderBy("doc_id")
    },

    // SemDeDup (Abbas et al. 2023): cluster-scoped near-dup removal. The
    // oracle computes the EXACT threshold-graph removal set (recursive
    // closure, as x39); the Spark side reproduces that exact count, then
    // asserts the cluster-scoped removals are a subset (precision 1 by
    // construction) with recall >= 0.5 — the x33 recall-contract shape.
    GQuery("x42_semantic_dedup", Some("""
      WITH RECURSIVE e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      pairs AS (
        SELECT a.vec_id AS i, b.vec_id AS j
        FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v) /
          sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 6) >= 0.4),
      e AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a WHERE e2.b <> r.a),
      comp AS (SELECT a AS doc_id, least(a, min(b)) AS component
               FROM reach GROUP BY a)
      SELECT CAST(count(*) AS BIGINT) AS n_exact_removed,
        TRUE AS precision_ok, TRUE AS recall_ok
      FROM comp WHERE doc_id <> component""")) { (s, dir) =>
      val e = embs(s, dir)
      // the exact-baseline pipeline (O(n²) pairs + components) and the
      // semantic pipeline (k-means + cluster-scoped pairs + components)
      // are INDEPENDENT until the final recall join, and both are
      // driver-paced (eager checkpointed CC rounds, sequential k-means
      // collects) with the cluster mostly idle between round-trips —
      // overlap them on two threads (guide §2.6) so one pipeline's
      // rounds back-fill the other's latency. Results are unchanged:
      // each side is the same plan, just submitted concurrently.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      val exactF = Future {
        graft.operators.Components.dedupClusters(
            Similarity.thresholdPairs(e, threshold = 0.4).select("i", "j"),
            "i", "j")
          .filter(!col("keep")).select(col("doc_id")).cache()
      }
      val semF = Future {
        Similarity.semanticDedup(e, threshold = 0.4, nlist = 8, iters = 2)
          .filter(!col("keep")).select(col("doc_id").as("rem"))
      }
      val exactRemoved =
        Await.result(exactF, scala.concurrent.duration.Duration.Inf)
      val semRemoved =
        Await.result(semF, scala.concurrent.duration.Duration.Inf)
      val joined = semRemoved.join(exactRemoved,
        col("rem") === col("doc_id"), "left_outer")
      // one pass: count(col) skips NULLs, so hit = matched removals and
      // miss = the rest — the old two-filter shape recomputed the whole
      // semanticDedup pipeline (k-means + pair join + components) twice,
      // once per count (guide §1.2: don't run passes you can fold)
      val mh = joined.agg(count(lit(1)).as("tot"),
        count(col("doc_id")).as("hit")).collect()(0)
      val hit = mh.getLong(1)
      val miss = mh.getLong(0) - hit
      exactRemoved.agg(count(lit(1)).cast("long").as("n_exact_removed"))
        .select(col("n_exact_removed"),
          lit(miss == 0).as("precision_ok"),
          (lit(hit).cast("double") / col("n_exact_removed") >= 0.5)
            .as("recall_ok"))
    }
  )
}
