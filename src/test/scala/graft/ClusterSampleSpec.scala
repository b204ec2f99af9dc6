package graft

import graft.ops.VectorOps

/** Cluster-balanced pruning: sqrt quotas, least-prototypical-first
  * ranking, and the one-shuffle plan contract.
  */
class ClusterSampleSpec extends SparkSpec {
  import spark.implicits._

  // planted assignment: cluster 0 dense (9 members), cluster 1 sparse
  // (2 members); proto_cos rises with vec_id inside each cluster
  private def assigned = (
    (0 until 9).map(i => (i.toLong, 0L, 0.1 + i * 0.05)) ++
      Seq((100L, 1L, 0.9), (101L, 1L, 0.95))
  ).toDF("vec_id", "cluster_id", "proto_cos")

  test("sqrt quota prunes dense clusters hardest, keeps sparse whole") {
    val out = VectorOps.clusterBalancedSample(assigned)
      .select("vec_id", "cluster_id", "quota", "is_kept").collect()
    val kept = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    // cluster 0: quota ceil(sqrt(9)) = 3 -> keep fraction 1/3;
    // LEAST prototypical (lowest proto_cos = lowest ids here) survive
    assert(kept.intersect((0L until 9L).toSet) == Set(0L, 1L, 2L))
    // cluster 1: quota ceil(sqrt(2)) = 2 -> survives whole
    assert(kept.contains(100L) && kept.contains(101L))
    assert(out.forall(r => r.getLong(2) == (if (r.getLong(1) == 0L) 3L else 2L)))
  }

  test("rank/count/quota ride one cluster_id exchange") {
    // string-count like tools/PlanAudit: AQE wraps the plan, so
    // TreeNode.collect would see no Exchange children pre-execution
    val plan = VectorOps.clusterBalancedSample(assigned)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1)
  }
}
