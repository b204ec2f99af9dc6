package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Load

/** Incremental near-duplicate detection against a PERSISTED MinHash
  * band index — the production form of batch LSH dedup (TextQueries
  * q30) at 100 TB: the corpus's band signatures live in a
  * [[Load.upsertKeyBucketed]] warehouse table laid out by
  * `bucket(band, sig)`, and a daily batch
  *
  *   1. computes its own signatures (map-only over the batch),
  *   2. probes ONLY the bucket directories its band keys hash into
  *      (partition-pruned scan — I/O bounded by the batch's bucket
  *      fan-out, never corpus size),
  *   3. emits new-vs-corpus and new-vs-new candidate pairs, and
  *   4. merges its signatures back in with bucket-scoped I/O,
  *
  * so daily dedup cost scales with the batch, not the corpus — the
  * same state-maintenance shape as the incremental aggregate
  * (ops/Scale.incrementalAgg) applied to the q30 signature scheme.
  *
  * MinHash family and banding follow Broder 1997 and the LSH banding
  * scheme of Leskovec/Rajaraman/Ullman (MMDS ch. 3); the constants are
  * shared verbatim with the q30/q136 DuckDB oracles. The band-bucket
  * cap carries q30's contract: candidate generation is quadratic in a
  * (band, sig) group's membership, so groups above `cap` members —
  * counted over corpus ∪ batch, exactly what a from-scratch rebuild
  * would count — are dropped whole before the pair join.
  */
object IncrementalDedup {

  /** 12 hashes in 4 bands of 3 — q30's scheme, shared with the oracle. */
  val NumHashes = 12
  val Bands = 4
  val RowsPerBand = 3
  val Mod = 1000000007L
  /** Universal-hash seeds (a_i, b_i): permutation i of base hash h is
    * (a_i * h + b_i) mod p.
    */
  val Seeds: Seq[(Long, Long)] =
    (0 until NumHashes).map(i => (2L * i + 3L, 7919L * (i + 1)))
  /** Max members a (band, sig) group may have and still generate
    * candidate pairs (output per group ≤ cap²).
    */
  val BandCap = 64L

  private val BandSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band", IntegerType),
    StructField("sig", StringType)))

  /** md5-derived base hash of a shingle (cross-engine stable). */
  private def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType) % Mod

  /** (doc_id, sig12) from (doc_id, sh): one md5 per shingle, then the
    * 12 permutations as pure arithmetic in a single fold pass — the
    * accumulator is the 12-wide running minimum.
    */
  def signatures(docs: DataFrame): DataFrame = {
    val seedA = typedLit(Seeds.map(_._1))
    val seedB = typedLit(Seeds.map(_._2))
    val sig = aggregate(
      transform(col("sh"), x => md5Int(x)),
      array_repeat(lit(Long.MaxValue), NumHashes),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(NumHashes - 1)),
        (m, i) => least(m,
          (element_at(seedA, i + 1) * h + element_at(seedB, i + 1)) % Mod)))
    docs.select(col("doc_id"), sig.as("sig12"))
  }

  /** Explode (doc_id, sig12) into one row per LSH band:
    * (doc_id, band, sig) with sig = the band's 3 slots joined by '|'.
    */
  def bandRows(withSig: DataFrame): DataFrame = {
    val bands = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (1 to RowsPerBand).map(r =>
          element_at(col("sig12"), RowsPerBand * b + r)): _*).as("sig"))
    }
    withSig
      .select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.sig").as("sig"))
  }

  /** Merge a batch's band rows into the persisted index at `dir`
    * (bootstraps the bucketed layout on first call). Row identity is
    * (doc_id, band) — re-submitting a changed document replaces its
    * signatures; location is bucket(band, sig) so probes stay scoped.
    */
  def mergeSignatures(spark: SparkSession, rows: DataFrame, dir: String,
                      buckets: Int): Long =
    Load.upsertKeyBucketed(spark, rows, dir,
      pk = Seq("doc_id", "band"), keyCols = Seq("band", "sig"), buckets)

  /** Probe a new batch's band rows against the persisted index WITHOUT
    * touching untouched buckets: reads only the bucket dirs the
    * batch's (band, sig) keys hash into, applies the group cap on
    * corpus ∪ batch membership, and returns distinct candidate pairs
    * (da < db) where at least one side is a batch document — exactly
    * the pairs a from-scratch rebuild over corpus ∪ batch would emit
    * for the batch. The batch side of the pair join is broadcast (a
    * daily batch's surviving band rows are small by contract); the
    * corpus side never leaves its scoped scan.
    *
    * Callers probing and THEN merging the same rows must materialize
    * `batchRows` first (ops/Relational.eager) — the probe plan is
    * re-executed by the merge, and the merge swaps the very bucket
    * dirs a lazy probe would later read.
    */
  def probe(spark: SparkSession, batchRows: DataFrame, dir: String,
            buckets: Int, cap: Long = BandCap): DataFrame = {
    val keyed = batchRows.withColumn("__bucket",
      Load.keyBucket(Seq(col("band"), col("sig")), buckets))
    // driver-side list bounded by min(batch bands, bucket count)
    val touched = keyed.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // bucket pruning narrows the SCAN; the broadcast semi-join on the
    // batch's exact (band, sig) keys narrows the ROWS — only groups
    // containing a batch member can emit pairs or need a cap count, so
    // dropping the rest before the membership aggregate keeps every
    // shuffle downstream O(batch), never O(bucket contents)
    val batchKeys = keyed.select(col("band"), col("sig")).distinct()
    val corpus = Load.readTable(spark, dir) match {
      case Some(t) => t.filter(col("__bucket").isin(touched: _*))
        .select(col("doc_id"), col("band"), col("sig"))
        .join(broadcast(batchKeys), Seq("band", "sig"), "left_semi")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], BandSchema)
    }
    // membership over corpus ∪ batch; a re-submitted doc counts once,
    // flagged as batch (max boolean = OR). Materialized (persist +
    // count): four downstream consumers (the hot-group count, both
    // sides of the pair join, the batch filter) would otherwise each
    // re-scan the index buckets; the frame itself is O(batch) rows by
    // the semi-join above, so the cache is small. Blocks are reclaimed
    // by the ContextCleaner once the result frame is dropped.
    val members = graft.ops.Relational.eager(
      corpus.withColumn("is_batch", lit(false))
        .unionByName(keyed.select(col("doc_id"), col("band"), col("sig"))
          .withColumn("is_batch", lit(true)))
        .groupBy(col("band"), col("sig"), col("doc_id"))
        .agg(max(col("is_batch")).as("is_batch")))
    // union-count cap — the by-construction-small hot list broadcasts
    // into an anti-join, mirroring TextQueries.cappedBandCandidates
    val hot = members.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("n")).filter(col("n") > cap)
      .select(col("band"), col("sig"))
    val capped = members.join(broadcast(hot), Seq("band", "sig"), "left_anti")
    val batchSide = capped.filter(col("is_batch"))
      .select(col("band"), col("sig"), col("doc_id").as("batch_doc"))
    // least/greatest + distinct collapses the two orientations a
    // batch-batch pair produces and cross-band repeats
    capped.as("a").join(broadcast(batchSide).as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") =!= col("b.batch_doc"))
      .select(least(col("a.doc_id"), col("b.batch_doc")).as("da"),
        greatest(col("a.doc_id"), col("b.batch_doc")).as("db"))
      .distinct()
  }
}
