package graft

import org.apache.spark.sql.functions._

/** Cross-modal pair dedup (q188): the planted waves must be dropped
  * via the RIGHT modality — same-image/different-caption pairs fold
  * into their base pair's cluster through the dHash side alone, and
  * same-caption/different-image pairs through the MinHash side alone.
  * The DuckDB oracle gates cross-engine equality; this spec gates the
  * SEMANTICS the fixture exists for (a broken modality that still
  * produced a deterministic labeling would pass the oracle).
  */
class PairDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = SparkEntry.queries("q188_pair_dedup")(spark, sfDir)
    .select("pair_id", "keeper", "keep")
    .as[(Long, Long, Boolean)].collect()
    .map(r => r._1 -> ((r._2, r._3))).toMap

  private lazy val docIds = graft.tables.Tables.documents(spark, sfDir)
    .select("doc_id").as[Long].collect().toSeq

  test("same-image/different-caption pairs fold into the base cluster") {
    val planted = docIds.filter(_ % 11 == 3)
    assert(planted.nonEmpty, "fixture vacuous: no %11==3 docs")
    for (d <- planted) {
      val (keeper, keep) = out(d * 4 + 1)
      assert(!keep, s"image-dup pair ${d * 4 + 1} survived")
      // the brightness re-encode collides at Hamming 0 with its base
      // pair, so both share a cluster; the keeper is the cluster min,
      // which is at most the base pair's id
      assert(keeper == out(d * 4)._1 && keeper <= d * 4,
        s"pair ${d * 4 + 1} not in its base pair's cluster")
    }
  }

  test("same-caption/different-image pairs fold into the base cluster") {
    val planted = docIds.filter(_ % 11 == 7)
    assert(planted.nonEmpty, "fixture vacuous: no %11==7 docs")
    for (d <- planted) {
      val (keeper, keep) = out(d * 4 + 2)
      assert(!keep, s"caption-dup pair ${d * 4 + 2} survived")
      assert(keeper == out(d * 4)._1 && keeper <= d * 4,
        s"pair ${d * 4 + 2} not in its base pair's cluster")
    }
  }

  test("every cluster keeps exactly its minimum pair id") {
    val byCluster = out.toSeq.groupBy(_._2._1)
    for ((keeper, members) <- byCluster) {
      assert(members.map(_._1).min == keeper,
        s"cluster $keeper: keeper is not the min member")
      assert(members.count(_._2._2) == 1 &&
        members.find(_._2._2).get._1 == keeper,
        s"cluster $keeper: keep flag not exactly on the keeper")
    }
  }
}
