package graft

import org.apache.spark.sql.functions._

import graft.ops.Shards

/** Shard/file packing: exact assignment algebra on hand-sized docs,
  * the one-document overflow bound, whole-document placement, and
  * rerun determinism.
  */
class ShardsSpec extends SparkSpec {
  import spark.implicits._

  test("files pack sequentially; a doc lands wholly where its first byte falls") {
    // one shard (nShards=1) so the packing order is just (k, id);
    // budget 10: docs of 4/4/4 bytes -> files 0,0,1 (8 <= 10 < 12)
    val docs = Seq((1L, "aaaa"), (2L, "bbbb"), (3L, "cccc"))
      .toDF("doc_id", "text")
    val a = Shards.assign(docs, "text", "doc_id", nShards = 1,
        budgetBytes = 10L, seed = "s")
      .select("doc_id", "bytes", "bytes_before", "file_idx")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(docs.count() == 3 && a.values.map(_._1).toSet == Set(4L))
    // order within the shard is by md5 key — recover it and check the
    // running offsets are 0, 4, 8 and the files split at the budget
    val ordered = a.toSeq.sortBy(_._2._2)
    assert(ordered.map(_._2._2) == Seq(0L, 4L, 8L))
    assert(ordered.map(_._2._3) == Seq(0L, 0L, 0L) ||
      ordered.map(_._2._3) == Seq(0L, 0L, 1L) ||
      ordered.map(_._2._3) == Seq(0L, 1L, 1L))
    // byte-exact: file changes exactly when bytes_before crosses 10
    ordered.foreach { case (_, (_, before, f)) =>
      assert(f == before / 10)
    }
  }

  test("byte budget: every file holds <= budget + (largest doc - 1) bytes") {
    val docs = spark.range(500).select(col("id").as("doc_id"),
      // doc sizes 10..137 bytes, deterministic
      concat_ws("", transform(sequence(lit(1),
        pmod(col("id") * 7, lit(128)) + 10), _ => lit("x"))).as("text"))
    val budget = 512L
    val a = Shards.assign(docs, "text", "doc_id", nShards = 4,
      budgetBytes = budget, seed = "seed42")
    val m = Shards.manifest(a, "doc_id").cache()
    val maxDoc = a.agg(max(col("bytes"))).head().getLong(0)
    val worst = m.agg(max(col("file_bytes"))).head().getLong(0)
    assert(worst <= budget + maxDoc - 1,
      s"file of $worst bytes exceeds budget $budget + maxDoc $maxDoc - 1")
    // docs are never split: manifest totals reconstruct the corpus
    assert(m.agg(sum(col("n_docs")), sum(col("file_bytes"))).head()
      .toSeq == Seq(500L,
        docs.agg(sum(octet_length(col("text")))).head().getLong(0)))
    // every non-final file in a shard is at least budget-full is NOT
    // guaranteed (a doc can straddle the boundary into the next file),
    // but files must be non-empty and contiguous per shard
    val byShard = m.select("shard", "file_idx").as[(Int, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    byShard.foreach { case (_, files) =>
      assert(files == (files.min to files.max))
    }
    m.unpersist()
  }

  test("assignment is deterministic across reruns and engine-replayable") {
    val docs = Seq((1L, "aaaa"), (2L, "bb"), (3L, "cccccc"), (4L, "d"))
      .toDF("doc_id", "text")
    def run() = Shards.assign(docs, "text", "doc_id", 2, 8L, "seed42")
      .select("doc_id", "shard", "pos", "file_idx")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(run() == run())
  }
}
