package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation
  * with pointer jumping: every node starts labelled with itself; each
  * round a node adopts the smallest label among itself and its
  * neighbours (one edge⋈label join + min-aggregate), then labels jump
  * to their label's label (one label⋈label join), which halves chain
  * depth — so convergence is O(log diameter) rounds, the same bound as
  * the large-star/small-star scheme (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014).
  *
  * Iterative-Spark essentials encoded here, both learned the hard way:
  *  - `localCheckpoint(eager)` each round. Persist alone does NOT
  *    truncate lineage: round N's plan would embed round N−1's plan
  *    multiple times (union + convergence join), so plan size grows
  *    exponentially and analysis itself OOMs after ~20 rounds.
  *  - one action per round: materializing the checkpoint and counting
  *    changed labels for the convergence test.
  *
  * Checkpoint durability is a parameter: localCheckpoint blocks die
  * with an executor, so on a cluster with preemption configure
  * `spark.sparkContext.setCheckpointDir` and the rounds automatically
  * switch to reliable `checkpoint()` (same algorithm, slower rounds,
  * survives executor loss).
  */
object Graph {

  /** `nodes`: single column `node`; `edges`: columns `a`,`b` in either
    * orientation (symmetrized internally). Returns (`node`, `lbl`)
    * where `lbl` is the component's minimum node id — deterministic.
    * Nodes absent from `edges` keep their own label (singletons).
    *
    * `reliableCheckpoint`: None (default) = reliable iff the session
    * has a checkpoint dir configured; Some(true) demands one (fails
    * fast otherwise); Some(false) forces localCheckpoint.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 25,
                          reliableCheckpoint: Option[Boolean] = None): DataFrame = {
    require(maxIter > 0, "maxIter must be positive")
    val sc = nodes.sparkSession.sparkContext
    val useReliable = reliableCheckpoint.getOrElse(sc.getCheckpointDir.isDefined)
    require(!useReliable || sc.getCheckpointDir.isDefined,
      "reliable checkpointing requested but no checkpoint dir is set " +
        "(spark.sparkContext.setCheckpointDir)")
    def ckpt(df: DataFrame): DataFrame =
      if (useReliable) df.checkpoint(true) else df.localCheckpoint(true)
    // storage note: localCheckpoint blocks are NOT freed by
    // Dataset.unpersist (that only uncaches CacheManager entries); they
    // are reclaimed asynchronously by the ContextCleaner once the
    // superseded round's Dataset becomes unreachable — which the
    // re-assignment below guarantees. Peak live state is therefore the
    // current round ± the cleaner's lag, not the sum of all rounds.
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .transform(ckpt) // reused every round — compute once
    var labels = nodes.select(col("node"), col("node").as("lbl"))
      .transform(ckpt)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // both viaEdges columns are RE-ALIASED (fresh attribute ids): the
      // select would otherwise carry labels' own `lbl` attribute into
      // the union's right child, and Union's constraint rewriting hits
      // "key not found" when children share attribute ids (seen live at
      // 100k nodes in Stress)
      val viaEdges = sym.join(labels.withColumnRenamed("node", "a"), Seq("a"))
        .select(col("b").as("node"), col("lbl").as("lbl"))
      val gathered = labels
        .select(col("node").as("node"), col("lbl").as("lbl"))
        .union(viaEdges)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
      // pointer jump: adopt the label of one's label. A component's
      // minimum always labels itself, so the left join only misses when
      // the label row landed elsewhere this round — coalesce keeps it.
      val self = gathered.select(col("node").as("lbl"), col("lbl").as("__lbl2"))
      val next = gathered.join(self, Seq("lbl"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("__lbl2"), col("lbl"))).as("lbl"))
        .transform(ckpt)
      val changed = next
        .join(labels.withColumnRenamed("lbl", "__old"), Seq("node"))
        .filter(col("lbl") =!= col("__old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    // wrong labels are worse than no labels: a truncated run would feed
    // callers bogus cluster ids with nothing signalling it
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds " +
        "(graph diameter too large — raise maxIter)")
    labels
  }
}
