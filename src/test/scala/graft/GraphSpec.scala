package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference union-find for cross-checking. */
  private def bruteCc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // compress to the component MINIMUM, matching min-label semantics
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(
      nodes.toDF("node"), edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("components of a small known graph, including singletons") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L))
    val got = run(nodes, edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("a long chain converges to one component (diameter > 2)") {
    val n = 40L
    val nodes = (1L to n)
    val edges = (1L until n).map(i => (i, i + 1))
    val got = run(nodes, edges)
    assert(got.values.toSet == Set(1L))
  }

  test("matches union-find on random graphs") {
    val rnd = new Random(42)
    (1 to 3).foreach { _ =>
      val nodes = (1L to 60L)
      val edges = Seq.fill(45)((rnd.nextLong(60) + 1, rnd.nextLong(60) + 1))
      assert(run(nodes, edges) == bruteCc(nodes, edges))
    }
  }

  test("edge orientation does not matter") {
    val nodes = Seq(1L, 2L, 3L)
    assert(run(nodes, Seq((3L, 1L))) == run(nodes, Seq((1L, 3L))))
  }

  test("reliable checkpoint mode: same labels, auto-detected from checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val nodes = (1L to 60L)
    val edges = (1L until 60L by 2).map(i => (i, i + 1)) ++ Seq((2L, 5L), (10L, 33L))
    val local = run(nodes, edges)
    spark.sparkContext.setCheckpointDir(dir)
    try {
      // None auto-detects the configured dir → reliable checkpoint path
      val reliable = Graph.connectedComponents(
        nodes.toDF("node"), edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(reliable == local)
      // the reliable rounds must actually have written checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .count() > 1
      assert(wrote, "no checkpoint files written in reliable mode")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("Some(true) without a checkpoint dir fails fast") {
    val e = intercept[IllegalArgumentException] {
      Graph.connectedComponents(Seq(1L).toDF("node"),
        Seq((1L, 1L)).toDF("a", "b"), reliableCheckpoint = Some(true))
    }
    assert(e.getMessage.contains("checkpoint dir"))
  }

  test("non-convergence within maxIter throws instead of returning wrong labels") {
    val n = 64L
    val nodes = (1L to n)
    val edges = (1L until n).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      Graph.connectedComponents(nodes.toDF("node"), edges.toDF("a", "b"),
        maxIter = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
