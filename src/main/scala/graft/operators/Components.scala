package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the clustering step every
  * near-duplicate pipeline needs between "candidate pairs" (Jaccard /
  * MinHash / SimHash / embedding-cosine) and "keep one document per
  * duplicate cluster". Components are labeled by their minimum member id,
  * so the canonical survivor is deterministic.
  *
  * Algorithm: iterated min-label propagation in pure DataFrame ops —
  * each round every vertex takes the min label over itself and its
  * neighbors, until no label changes (the standard Pregel-style CC,
  * expressed as join+groupBy so Catalyst/Tungsten run it). Rounds needed
  * = graph diameter; duplicate clusters are near-cliques (diameter ≤ ~3),
  * so this converges in 2-4 rounds on real dedup workloads.
  *
  * Scale notes (100 TB):
  *   - each round is one shuffle-join (labels × edges, both keyed on
  *     vertex id) + one shuffle-agg (min per vertex) — no driver-side
  *     graph state, edges never move to the driver;
  *   - labels are `localCheckpoint`ed every round, cutting the lineage so
  *     round N's plan doesn't replay rounds 1..N-1;
  *   - convergence is checked with a count of changed labels (one cheap
  *     agg per round), capped by `maxIter` as a runaway guard;
  *   - for web-scale graphs with long chains, swap the propagation body
  *     for the large-star/small-star rule (Kiveris et al.) — same
  *     join+agg primitives, O(log n) rounds; not the default because
  *     dedup graphs are clique-like and pay the extra shuffles for
  *     nothing.
  */
object Components {

  /** `edges`: two id columns (undirected). Returns (id, component) for
    * every vertex appearing in any edge; component = min id reachable. */
  def connected(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 20): DataFrame = {
    // symmetrize once — via explode, NOT a self-union: a union of two
    // projections of `edges` re-runs the whole upstream pair pipeline
    // (often an O(n^2) scorer) once per branch; the explode symmetrizes
    // in a single pass
    val e = edges.select(explode(array(
        struct(col(src).as("a"), col(dst).as("b")),
        struct(col(dst).as("a"), col(src).as("b")))).as("__e"))
      .select(col("__e.a").as("a"), col("__e.b").as("b"))
      .distinct()
      .localCheckpoint(eager = true)
    // labels only ever decrease, so the fixpoint is reached exactly when
    // the label sum stops changing. The sum rides the checkpoint job as an
    // Observation — convergence costs zero extra scans per round.
    def checkpointWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val out = df.observe(obs,
          sum(col("comp").cast("decimal(38,0)")).as("s"))
        .localCheckpoint(eager = true)
      (out, obs.get("s").asInstanceOf[java.math.BigDecimal])
    }
    var (labels, prevSum) = checkpointWithSum(
      e.select(col("a").as("id")).distinct().withColumn("comp", col("id")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor labels: for each edge (a,b), b proposes its comp to a
      val proposals = e.join(labels.withColumnRenamed("id", "b"), "b")
        .select(col("a").as("id"), col("comp"))
      val (next, nextSum) = checkpointWithSum(
        labels.select(col("id"), col("comp"))
          .union(proposals)
          .groupBy("id").agg(min("comp").as("comp")))
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    labels
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the long-chain escape hatch [[connected]]'s scaladoc names: rounds
    * grow with log(n), NOT graph diameter, so a 10^9-vertex path costs
    * ~30 rounds where min-propagation would need 10^9.
    *
    *   large-star(u): every neighbor v > u re-attaches to
    *     m = min(Γ(u) ∪ {u});
    *   small-star(u): every neighbor v ≤ u (plus u itself) re-attaches
    *     to the same m.
    *
    * Both steps are ONE whole-partition window min over the edge list
    * (the textbook shuffle-agg + shuffle-join-back pair fused into a
    * single exchange per star) — no driver-side graph state. Convergence
    * = the edge
    * set reaching its fixpoint (a star per component centered on its
    * minimum id): a (count, keyed-sum) observation pair screens for
    * stationarity each round for free, and a candidate fixpoint is then
    * CONFIRMED with an exact multiset-difference check (the sum alone
    * is collision-prone). `localCheckpoint` cuts lineage each round.
    *
    * Same output contract as [[connected]]: (id, comp) for every vertex
    * in the input, comp = min reachable id. Use for long-path graphs
    * (citation chains, link graphs); clique-like dedup graphs converge
    * faster under plain [[connected]].
    */
  def connectedAlternating(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 50): DataFrame = {
    // ONE pass over the (possibly expensive) upstream pair pipeline:
    // checkpoint the deduped directed pair list first and derive both
    // the vertex set and the working edge set from the checkpoint —
    // building them independently from `edges` re-ran the whole pair
    // build (an O(n^2) scorer in x42, the jaccard pipeline in x39)
    // once per frame.
    val e0 = edges.select(
        greatest(col(src), col(dst)).as("hi"),
        least(col(src), col(dst)).as("lo"))
      .distinct()
      .localCheckpoint(eager = true)
    val vertices = e0.select(col("hi").as("id"))
      .union(e0.select(col("lo").as("id"))).distinct()
    // directed representation: (hi, lo) with lo < hi; self-edges drop
    var e = e0.filter(col("hi") =!= col("lo"))

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
    val wU = org.apache.spark.sql.expressions.Window.partitionBy("u")
    val wH = org.apache.spark.sql.expressions.Window.partitionBy("hi")
    while (!converged && iter < maxIter) {
      // Each star step is ONE whole-partition window min instead of the
      // textbook groupBy + join-back — same m per vertex, half the
      // exchanges per round (the groupBy shuffled sym once for the mins
      // and the join shuffled it again for the re-attach; the window
      // computes m and re-attaches in a single pass over one exchange).
      // large-star over the symmetric view: m = min(Γ(u) ∪ {u}); each
      // strictly-larger neighbor v re-attaches as (v, m). No distinct
      // here: duplicate (v, m) rows (several u sharing the same m) are
      // min-neutral for the small-star and collapse in the round-end
      // distinct.
      val large = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
      // small-star over the downward edges: m = min of u's smaller
      // neighborhood (all lo < hi here); every lo re-attaches to m, and
      // hi itself attaches to m. The hi→m edge is emitted from the
      // lo == m row(s) of the partition (at least one exists; duplicates
      // collapse in the distinct), so no separate per-hi aggregate+union
      // pass over the frame is needed.
      val smallNext = large
        .withColumn("m", min(col("lo")).over(wH))
        .select(explode(
            when(col("lo") === col("m"),
              array(struct(col("lo").as("hi"), col("m").as("lo")),
                    struct(col("hi").as("hi"), col("m").as("lo"))))
            .otherwise(array(struct(col("lo").as("hi"), col("m").as("lo")))))
          .as("e2"))
        .select(col("e2.hi").as("hi"), col("e2.lo").as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
      val (next, nextSig) = observed(smallNext)
      // the (count, keyed-sum) pair is a cheap screen, not a proof —
      // distinct edge sets can collide (e.g. {(4,1),(2,3)} vs
      // {(4,3),(2,1)} share count and sum), so confirm the fixpoint
      // exactly before stopping: equal counts + empty multiset
      // difference ⇔ equal sets. Both frames are checkpointed, so the
      // exact check costs one small job and only runs when the screen
      // passes (typically once, at the true fixpoint).
      val sigStable = sig._2 != null && nextSig._1 == sig._1 &&
        nextSig._2.compareTo(sig._2) == 0
      converged = sigStable && next.exceptAll(e).isEmpty
      sig = nextSig
      e = next
      iter += 1
    }
    // fixpoint edge set is a star per component: label = min over incident
    // los (the root), or the vertex itself for singletons
    val labels = e.select(col("hi").as("id"), col("lo"))
      .union(e.select(col("lo").as("id"), col("lo")))
      .groupBy("id").agg(min("lo").as("comp"))
    vertices.join(labels, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Dedup decision over candidate pairs: every doc in a duplicate
    * cluster maps to its canonical (minimum-id) representative; `keep`
    * marks the survivor. Docs in no pair are implicitly kept.
    * Defaults to [[connectedAlternating]]: measured at parity with
    * min-propagation on clique-like pair graphs (2-round convergence
    * either way) and 2.2x faster on a real 17-hop-diameter similarity
    * graph (x42's 0.4-threshold graph: 17 propagation rounds vs 6
    * alternating rounds) — near-duplicate graphs are NOT always
    * cliques, and O(log n) rounds is the only shape that survives the
    * long-diameter case at scale. `alternating = false` falls back to
    * min-propagation for graphs known to have diameter <= ~2. */
  def dedupClusters(pairs: DataFrame, d1: String = "d1",
      d2: String = "d2", alternating: Boolean = true): DataFrame =
    (if (alternating) connectedAlternating(pairs, d1, d2)
     else connected(pairs, d1, d2))
      .select(col("id").as("doc_id"), col("comp").as("component"),
        (col("id") === col("comp")).as("keep"))

  /** Canonicalization: ONE representative per duplicate cluster, chosen
    * by QUALITY rather than by minimum id — the step after pair finding
    * and clustering where the pipeline decides WHICH near-duplicate to
    * keep (longest/cleanest doc wins; id breaks ties). Docs in no pair
    * are their own cluster and survive. Cost: components (O(log n)
    * rounds over the PAIRS, which are sparse) plus one window over the
    * corpus keyed by cluster — a single corpus shuffle.
    * `alternating` passes through to [[dedupClusters]]: callers whose
    * pair graph has known small diameter (high-threshold Jaccard pairs
    * are near-cliques, diameter <= ~2) set it false and save the
    * alternating-star scheme's extra fixed-cost rounds. */
  def canonicalize(docs: DataFrame, pairs: DataFrame, idCol: String,
      qualityCol: String, d1: String = "d1", d2: String = "d2",
      alternating: Boolean = true): DataFrame = {
    val comp = dedupClusters(pairs, d1, d2, alternating)
      .select(col("doc_id").as("__cid"), col("component"))
    val joined = docs.join(comp, docs(idCol) === col("__cid"), "left_outer")
      .withColumn("__comp", coalesce(col("component"), docs(idCol)))
      .drop("__cid", "component")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__comp")
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    joined.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__comp")
  }
}
