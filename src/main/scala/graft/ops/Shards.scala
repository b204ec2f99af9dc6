package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-shard delivery format — the WebDataset-shaped handoff at
  * the end of a corpus pipeline: q139's deterministic seeded shuffle
  * extended with SIZE-BOUNDED shard files and a manifest table, so a
  * training stack can address "shard 3, file 12" and know its byte
  * size, document count and position range without opening it.
  *
  * Determinism (the q139 contract): the shuffle key is md5 over a
  * seed + doc id — cross-engine replayable, stable across reruns —
  * and within a shard documents order by (key, id). File assignment
  * is the EXACT integer algebra file_idx = floor(bytes_before /
  * budget): a document lands wholly in the file where its first byte
  * falls, so a file never splits a document and its size is bounded
  * by budget + (largest doc − 1) bytes — the one-document overflow
  * every greedy packer accepts (ShardsSpec pins the bound). No
  * sequential scan: the running byte offset is one window sum, so
  * assignment stays a single hash exchange at any corpus size;
  * parallelism = shard count (size nShards >> cores in production).
  */
object Shards {

  /** Per-document shard/file assignment: adds (bytes, k, shard, pos,
    * bytes_before, file_idx) to (`idCol`, `textCol`) rows.
    */
  def assign(docs: DataFrame, textCol: String, idCol: String,
             nShards: Int, budgetBytes: Long, seed: String): DataFrame = {
    require(nShards > 0 && budgetBytes > 0)
    val k = conv(substring(md5(concat(lit(s"$seed:"),
      col(idCol).cast(StringType))), 1, 15), 16, 10).cast(LongType)
    val w = Window.partitionBy(col("shard")).orderBy(col("k"), col(idCol))
    docs
      .select(col(idCol),
        octet_length(col(textCol)).cast(LongType).as("bytes"), k.as("k"))
      .withColumn("shard", pmod(col("k"), lit(nShards)).cast(IntegerType))
      .withColumn("pos", row_number().over(w).cast(LongType))
      .withColumn("bytes_before", coalesce(sum(col("bytes")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("file_idx", expr(s"bytes_before div ${budgetBytes}L"))
  }

  /** The manifest: one row per (shard, file) with document count, byte
    * size and the position/id range — the table a training loader
    * reads instead of listing files.
    */
  def manifest(assigned: DataFrame, idCol: String): DataFrame = assigned
    .groupBy(col("shard"), col("file_idx"))
    .agg(count(lit(1)).as("n_docs"),
      sum(col("bytes")).as("file_bytes"),
      min(col("pos")).as("first_pos"),
      max(col("pos")).as("last_pos"),
      min_by(col(idCol), col("pos")).as("first_doc"),
      max_by(col(idCol), col("pos")).as("last_doc"))
}
