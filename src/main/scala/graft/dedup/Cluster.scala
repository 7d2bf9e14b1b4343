package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Duplicate-cluster resolution: the step a real dedup pipeline runs
  * AFTER pair generation. MinHash/SimHash/ngram pair lists are
  * transitive in intent ("A dups B" and "B dups C" means one group),
  * so keeping one doc per PAIR over-deletes; the correct unit is the
  * connected component of the pair graph, keeping one canonical doc
  * per component (the reference's dedup surface stops at pairs —
  * pd_explain has no clustering step; this extends the family the way
  * production pipelines use it).
  *
  * Scale (100 TB): [[connectedComponents]] is min-label propagation
  * over the EDGE list — the same algorithm GraphX's
  * `ConnectedComponents` runs, expressed in DataFrame joins. Each
  * round is one join + one aggregation of the edge table, and the
  * edge table is pair-bounded (it inherits whatever bound produced the
  * pairs: banded LSH, rare-shingle dfCap, IVF blocks — never the
  * corpus). Rounds run the one-hop neighbor-min flood, ESCALATING to a
  * per-round POINTER JUMP (path halving) from round 3, so total rounds
  * = O(log₂ diameter): dup clusters are near-cliques (2-3 plain
  * rounds, no jump cost), and even a chain-shaped component
  * (CDC-overlap chains) converges in ~log₂(length) rounds instead of
  * needing one round per hop; [[MaxIterations]] stays as a regression
  * fail-fast. Each round is `localCheckpoint`ed: iterative lineage
  * doubles per round (the label frame feeds the next round twice), so
  * an unpruned plan would grow 2^rounds nodes — the checkpoint pins
  * each round to its materialized result and keeps the plan
  * constant-size. Checkpoint blocks live in executor storage and are
  * reclaimed by Spark's ContextCleaner once the returned frame is
  * unreachable (no cache-manager entries are left behind).
  */
object Cluster {

  /** Fail-fast bound on propagation rounds. Each round floods one hop
    * AND pointer-jumps (path halving), so rounds needed =
    * O(log₂ diameter): 30 rounds cover any component a real corpus can
    * contain (diameter beyond 2³⁰ would need more nodes than exist).
    * A graph still unconverged here indicates a logic regression, not
    * data shape — the error names the knob anyway. */
  @volatile var MaxIterations: Int = 30

  /** Connected components of an undirected pair graph. Input: one row
    * per edge (`aCol`, `bCol` — any orientation, duplicates fine).
    * Output: (cluster_id, doc_id, cluster_size) — one row per distinct
    * node, cluster_id = the component's minimum doc id, ordered by
    * (cluster_id, doc_id). Nodes with no edges are absent (a doc in no
    * dup pair is its own singleton — join the result back to the corpus
    * to materialize keeps/drops). Deterministic: min-label flood
    * reaches the same fixpoint regardless of execution order. */
  def connectedComponents(pairs: DataFrame,
                          aCol: String = "doc_a",
                          bCol: String = "doc_b"): DataFrame = {
    // materialize the (possibly expensive) pair subtree ONCE in its
    // input orientation; the undirected doubling is a narrow map over
    // the checkpointed blocks, derived lazily per round — the
    // checkpoint writes E rows instead of 2E. The checkpointed blocks
    // do NOT keep a hash partitioning contract (verified: a
    // localCheckpoint'd frame re-exchanges under a shuffle join —
    // LogicalRDD drops outputPartitioning), so the per-round join
    // re-shuffles the edge table; that cost is bounded by the PAIR
    // table (never the corpus) and at bench scale the joins go
    // broadcast under AQE anyway.
    val e0 = pairs.select(col(aCol).cast(LongType).as("src"), col(bCol).cast(LongType).as("dst"))
      .localCheckpoint(true)
    // NULL-src rows are dropped once here: a NULL id can neither
    // receive a label (the pre-fusion form's null id never equi-joined
    // back) nor give one (min/least skip NULL dst), and the old
    // NULL-id row was unobservable in the output anyway (dropped by
    // the final sizes equi-join).
    def edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src").isNotNull)
    // ROUND 1 fused into ONE map-side-combined aggregation: with the
    // initial labels being each node's own id, round 1's neighbor-min
    // is simply min(dst) per src over both orientations, and the new
    // label is least(own, neighbor-min) — the separate node-distinct
    // checkpoint plus round-1's join+agg+join collapse into one
    // groupBy (two Spark jobs and two shuffles fewer per call).
    // Label/row equivalence with the unfused form is exact, incl. the
    // degenerate cases: least() skips a NULL neighbor-min (a node
    // whose only peers are NULL keeps its own id). Round 1 cannot
    // converge on a non-degenerate edge set (any 2-node component
    // relabels its larger endpoint), so the convergence check starts
    // at round 2; the all-self-loop corner just pays one cheap extra
    // round.
    var labels = edges
      .groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("nd"))
      .select(col("id"), least(col("id"), col("nd")).as("lbl"))
      .localCheckpoint(true)
    var converged = false
    var round = 1
    while (!converged && round < MaxIterations) {
      round += 1
      val prev = labels
      // VOTE-UNION round: each node's new label = min over (its own
      // previous label) ∪ (its neighbors' previous labels). Expressing
      // the self-vote as a union row instead of a second labels join
      // removes one shuffle/broadcast of the labels table per round —
      // one edges⋈labels join plus ONE map-side-combined aggregation.
      // prev_lbl rides the same aggregation (a node has exactly one
      // self-vote row, min over that singleton recovers it), so
      // `changed` needs no re-join either.
      val votes = edges
        .join(prev.select(col("id").as("dst"), col("lbl").as("nl")), Seq("dst"))
        .select(col("src").as("id"), col("nl").as("lbl"), lit(null).cast(LongType).as("self"))
      val stepped = votes
        .union(prev.select(col("id"), col("lbl"), col("lbl").as("self")))
        .groupBy("id")
        .agg(min(col("lbl")).as("lbl"), min(col("self")).as("prev_lbl"))
        .select(col("id"), col("prev_lbl"), col("lbl"))
      // POINTER JUMP (path halving) from round 3 on: follow each node's
      // label to that label's own label. Labels are node ids with
      // lbl(x) ≤ x invariant (start = own id, monotone decreasing min),
      // so the jump target is never larger — one extra self-join of the
      // NODE table per round turns label reach from one hop to doubling,
      // making total rounds O(log diameter): a chain-shaped component
      // (CDC-overlap chains, adversarial paths) converges in
      // ~log₂(length) rounds instead of hitting the MaxIterations
      // fail-fast at diameter > 30. Near-clique dup clusters — the
      // overwhelmingly common shape — finish inside the first two PLAIN
      // rounds and never pay the jump join; a component still moving at
      // round 3 is evidently not a clique, which is exactly when the
      // halving earns its cost.
      val jump = round >= 3
      // `changed` rides the same materialization: labels only decrease,
      // so convergence = "no row ended below its round-start label" — a
      // column scan of the frame this round just checkpointed, not the
      // labels×prev re-join the check used to pay per round.
      val next = (if (!jump) {
        stepped.select(col("id"), col("lbl"),
          (col("lbl") < col("prev_lbl")).as("changed"))
      } else {
        val parent = stepped.select(col("id").as("pid"), col("lbl").as("plbl"))
        stepped
          .join(parent, stepped("lbl") === parent("pid"), "left")
          .select(col("id"), coalesce(col("plbl"), col("lbl")).as("lbl"),
            (coalesce(col("plbl"), col("lbl")) < col("prev_lbl")).as("changed"))
      }).localCheckpoint(true)
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("id"), col("lbl"))
    }
    if (!converged) throw new IllegalStateException(
      s"Cluster.connectedComponents: not converged after $MaxIterations rounds — " +
        "with pointer jumping that needs a component diameter beyond 2^" +
        s"$MaxIterations, which no real pair graph reaches: suspect a logic " +
        "regression. graft.dedup.Cluster.MaxIterations raises the bound.")
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("lbl"))
      .select(col("lbl").as("cluster_id"), col("id").as("doc_id"),
        col("cluster_size").cast(LongType).as("cluster_size"))
      .orderBy("cluster_id", "doc_id")
  }

  /** [[connectedComponents]] over [[Dedup.minhashPairs]] candidates at
    * `minJaccard` estimated similarity — the end-to-end "which docs form
    * one duplicate group" query. */
  def minhashClusters(docs: DataFrame, minJaccard: Double = 0.5): DataFrame =
    connectedComponents(
      Dedup.minhashPairs(docs).filter(col("est_jaccard") >= minJaccard))

  /** DuckDB mirror of [[minhashClusters]]: the same banded-LSH pair
    * CTEs, then components via transitive closure (a recursive CTE's
    * UNION dedup terminates it; per-component cost is O(size²) paths —
    * fine for an oracle, not the scale path). */
  def minhashClustersSql(table: String, minJaccard: Double = 0.5): String =
    s"""WITH RECURSIVE ${Dedup.minhashCtes(table)},
       |prs AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= $minJaccard),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM prs
       |  UNION ALL SELECT doc_b, doc_a FROM prs),
       |reach(doc, lbl) AS (
       |  SELECT DISTINCT src, src FROM e
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.doc),
       |comp AS (SELECT doc AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc)
       |SELECT CAST(c.cluster_id AS BIGINT) AS cluster_id,
       |  CAST(c.doc_id AS BIGINT) AS doc_id,
       |  CAST(s.cnt AS BIGINT) AS cluster_size
       |FROM comp c JOIN (SELECT cluster_id, COUNT(*) AS cnt FROM comp GROUP BY 1) s
       |  USING (cluster_id)
       |ORDER BY cluster_id, doc_id""".stripMargin

  /** Dedup savings report — what resolving the clusters buys: per
    * cluster size, how many clusters, how many member docs, and how
    * many are REMOVABLE (docs − clusters, since one survivor stays per
    * cluster). Σ n_removable over the table is the corpus shrink the
    * near-dedup pass delivers — the number a pipeline owner asks for
    * before paying for the pass. Covers clustered (paired) docs only;
    * unpaired docs are trivially size-1 survivors. Scale: one KB-sized
    * aggregation over [[minhashClusters]]' (doc, cluster) table. */
  def clusterStats(docs: DataFrame, minJaccard: Double = 0.5): DataFrame =
    minhashClusters(docs, minJaccard)
      .groupBy("cluster_size")
      .agg(countDistinct(col("cluster_id")).cast(LongType).as("n_clusters"),
        count(lit(1)).cast(LongType).as("n_docs"))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        (col("n_docs") - col("n_clusters")).as("n_removable"))
      .orderBy("cluster_size")

  /** DuckDB mirror of [[clusterStats]]. */
  def clusterStatsSql(table: String, minJaccard: Double = 0.5): String =
    s"""SELECT cluster_size, CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) - COUNT(DISTINCT cluster_id) AS BIGINT) AS n_removable
       |FROM (${minhashClustersSql(table, minJaccard)})
       |GROUP BY 1 ORDER BY cluster_size""".stripMargin

  /** Canonical-survivor selection — the choice [[clusterStats]] prices
    * but doesn't make: per duplicate cluster keep the LONGEST member
    * (token count, ties → smallest doc_id), the content-preserving rule
    * a near-dedup pass applies where min-id survivorship would discard
    * the fullest copy. Returns (cluster_id, cluster_size, keep_doc_id,
    * keep_tokens, n_removed). Scale: the per-cluster argmax is the
    * hash-aggregable native [[graft.functions.ArgMaxBy]] (no window, no
    * sort) over the cluster table joined with a scan-local token count
    * — one join + one map-side-combined aggregation past the cluster
    * resolution itself. */
  def clusterKeepLongest(docs: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    val m = minhashClusters(docs, minJaccard)
      .join(docs.select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).cast(LongType).as("n_tokens")),
        "doc_id")
    m.groupBy("cluster_id", "cluster_size")
      .agg(graft.functions.ArgMaxBy.argmax(col("doc_id"),
          col("n_tokens").cast(org.apache.spark.sql.types.DoubleType)).as("keep_doc_id"),
        max(col("n_tokens")).as("keep_tokens"))
      .select(col("cluster_id"), col("cluster_size").cast(LongType).as("cluster_size"),
        col("keep_doc_id"), col("keep_tokens"),
        (col("cluster_size") - 1).cast(LongType).as("n_removed"))
      .orderBy("cluster_id")
  }

  /** DuckDB mirror of [[clusterKeepLongest]]. */
  def clusterKeepLongestSql(table: String, minJaccard: Double = 0.5): String =
    s"""SELECT cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
       |  doc_id AS keep_doc_id, n_tokens AS keep_tokens,
       |  CAST(cluster_size - 1 AS BIGINT) AS n_removed
       |FROM (SELECT c.*, d.n_tokens,
       |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
       |      ORDER BY d.n_tokens DESC, c.doc_id) AS rn
       |  FROM (${minhashClustersSql(table, minJaccard)}) c
       |  JOIN (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |        FROM $table) d ON c.doc_id = d.doc_id)
       |WHERE rn = 1 ORDER BY cluster_id""".stripMargin
}
