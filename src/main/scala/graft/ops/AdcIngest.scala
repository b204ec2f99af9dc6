package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.etl.{Load, WriterLease}

/** Incremental PQ/ADC index warehouse — the vector-side member of the
  * incremental warehouse family (corpus `CorpusIngest`, signature
  * index q136, IVF q148, inverted index `InvertedIndex`): the coarse
  * centroids and the PQ codebooks are trained at bootstrap and FROZEN;
  * every later vector batch is assigned, residual-encoded, and landed
  * as its own `batch=I` generation of the compressed (codes, vn)
  * table. Because assignment and encoding are per-vector and
  * independent of every other vector, the incrementally-grown index is
  * BIT-IDENTICAL to a one-shot rebuild of the union under the same
  * models — the property the q172 oracle gates end-to-end (it
  * re-derives the encode of ALL vectors from the persisted models and
  * replays the ADC search, while Spark serves from the appended
  * warehouse). This is how production IVF-PQ serving ingests a vector
  * stream: O(batch) per fold, the historical index never rewritten,
  * model refresh a separate re-baseline decision.
  *
  * Layout under `dir`: `centroids/` + `codebooks/` (frozen models),
  * `index/batch=I/` (vec_id, cluster_id, codes, vn), `meta/` (one row:
  * last_batch — the exactly-once replay guard, swapped LAST — and
  * del_epoch, the [[delete]] commit point), `tombstones/epoch=E/`
  * (vec_id of logically deleted vectors; every read anti-joins
  * epochs ≤ the committed del_epoch).
  *
  * Scale: encode is a broadcast-centroid join plus two fused
  * expressions (PqCodes, PqReconNorm) — zero shuffles; the write
  * dynamic-overwrites only its own `batch=I` subtree (idempotent under
  * replay); search cost is [[Pq.adcSearch]]'s — the generation split
  * adds file listings, never shuffles (compaction, if ever needed, is
  * a purely physical rewrite as in InvertedIndex.compact).
  */
object AdcIngest {

  private def centDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    VectorOps.loadCentroids(spark, s"$dir/centroids").toSeq
      .toDF("cluster_id", "ce")
      .withColumn("cluster_id", col("cluster_id").cast(LongType))
      .withColumn("cn",
        sqrt(graft.functions.VectorExpressions.vecDot(col("ce"), col("ce"))))
  }

  /** Assign → PQ-encode → ADC rows for one frame under the FROZEN
    * persisted models. Input (vec_id, embedding); output
    * (vec_id, cluster_id, codes, vn). `meta` names extra columns of
    * `vecs` to carry INTO the index rows (attribute payload for
    * FILTERED vector search — the q201 shape: a metadata predicate is
    * then a map-side filter on the compressed scan itself, never a
    * corpus-scale join at query time). Pure passthrough: assignment,
    * codes and vn are unaffected.
    */
  def encodeBatch(spark: SparkSession, vecs: DataFrame,
                  dir: String, meta: Seq[String] = Nil): DataFrame = {
    val cents = VectorOps.loadCentroids(spark, s"$dir/centroids")
    val cdf = centDf(spark, dir)
    val cb = Load.readTable(spark, s"$dir/codebooks").getOrElse(
      sys.error(s"AdcIngest: no codebooks at $dir/codebooks"))
    val assigned = VectorOps.assignClusters(
        vecs.select((Seq("vec_id", "embedding") ++ meta).map(col): _*),
        cents)
      .withColumn("cluster_id", col("cluster_id").cast(LongType))
    Pq.adcIndex(Pq.encode(assigned, cdf, cb, meta), cdf,
      Pq.collectCodebook(cb), meta)
  }

  private def writeGeneration(df: DataFrame, dir: String,
                              batchId: Long): Unit =
    df.withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(s"$dir/index")

  /** Read-path crash heal, GATED on writer-lease liveness
    * ([[graft.etl.WriterLease.liveHolder]] — the InvertedIndex
    * .healForRead rationale): remnants under a LIVE lease are a
    * writer's in-flight state, not a crash; a read path "healing"
    * them could restore a directory the writer is mid-rename on
    * (retrain's root swap, a purge's generation swap) or delete its
    * staging. Covers the warehouse ROOT (a crashed [[retrain]]'s
    * whole-root swap) and the index tree. Writers never use this:
    * their heals run unconditionally INSIDE their own lease.
    */
  private def healForRead(spark: SparkSession, dir: String): Unit =
    if (!WriterLease.liveHolder(spark, dir)) {
      Load.recoverSwap(spark, dir)
      Load.recoverSwap(spark, s"$dir/index")
      SegmentCompaction.recover(spark, s"$dir/index")
    }

  /** Writer-side entry heal — unconditional, called INSIDE the held
    * lease: the root swap remnant first (a crashed retrain), then the
    * index-tree remnants.
    */
  private def healForWrite(spark: SparkSession, dir: String): Unit = {
    Load.recoverSwap(spark, dir)
    // sibling-table swap remnants (codebooks, centroids, meta, …):
    // readTable's heals are liveness-gated and therefore suppressed
    // under THIS writer's own live lease — heal them here, inside it
    Load.recoverTreeSwaps(spark, dir)
    // a publish that crashed between its swap and its marker delete
    // leaves the stage's _PUBLISH_AFTER in the live root — sweep it
    val strayMk = new org.apache.hadoop.fs.Path(dir, "_PUBLISH_AFTER")
    strayMk.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(strayMk, false)
    // a due retained retrain publishes before any mutation proceeds;
    // one still inside its window blocks mutations loudly (reads are
    // unaffected either way)
    publishRetrainGate(spark, dir)
    Load.recoverSwap(spark, s"$dir/index")
    SegmentCompaction.recover(spark, s"$dir/index")
  }

  private def retrainPendingPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir.__retrain_pending")

  /** The publish-after timestamp of a committed-but-unpublished
    * RETAINED retrain (see [[retrain]]'s `retainMs`), None when none
    * awaits. A torn marker reads as never-due (publish only through
    * [[vacuum]]) — the safe direction.
    */
  def retrainPending(spark: SparkSession, dir: String): Option[Long] = {
    val p = retrainPendingPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val mk = new org.apache.hadoop.fs.Path(p, "_PUBLISH_AFTER")
      if (!fs.exists(mk)) Some(Long.MaxValue)
      else {
        val in = fs.open(mk)
        try {
          val bytes = new Array[Byte](fs.getFileStatus(mk).getLen.toInt)
          in.readFully(bytes)
          try Some(new String(bytes, "UTF-8").trim.toLong)
          catch { case _: NumberFormatException => Some(Long.MaxValue) }
        } finally in.close()
      }
    }
  }

  /** MUTATOR gate for a pending retained retrain — called at every
    * writer entry under the lease: a due pending publishes first (the
    * mutation then applies to the retrained root — nothing is lost,
    * because mutations were blocked for the whole window); a pending
    * still inside its window REFUSES the mutation loudly (a mutation
    * landing on the old root would silently vanish at publish, and
    * one landing on the staged root would corrupt the old serving
    * view). Reads are never blocked — they serve the old root
    * untouched, which is the whole point of the retention.
    */
  private def publishRetrainGate(spark: SparkSession, dir: String,
                                 force: Boolean = false): Unit =
    retrainPending(spark, dir).foreach { after =>
      if (force || System.currentTimeMillis() >= after) {
        Load.atomicSwap(spark, s"$dir.__retrain_pending", dir)
        // the swap carries the stage's _PUBLISH_AFTER marker into the
        // live root — delete it, or every published retained retrain
        // leaves a stray marker in the serving tree forever
        val mk = new org.apache.hadoop.fs.Path(dir, "_PUBLISH_AFTER")
        mk.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(mk, false)
      } else throw new IllegalStateException(
        s"a retained retrain awaits publish at $dir.__retrain_pending " +
          s"(window ends in ${(after - System.currentTimeMillis()) / 1000}" +
          "s) — mutations are blocked until it publishes; vacuum to " +
          "force, or wait out the window")
    }

  /** The replay high-water mark; -1 when no warehouse exists. A
    * [[retrain]] that crashed mid-swap heals here (the warehouse-root
    * recoverSwap — gated on lease liveness), which covers every read
    * entry point; writers heal unconditionally inside their lease.
    */
  def lastBatch(spark: SparkSession, dir: String): Long = {
    if (!WriterLease.liveHolder(spark, dir)) Load.recoverSwap(spark, dir)
    readMeta(spark, dir).map(_._1).getOrElse(-1L)
  }

  /** The whole meta row in ONE head() — (last_batch, del_epoch,
    * model_epoch, reencoded_through), retrain fields defaulting to 0
    * for warehouses written before retrain existed. Every verb used to
    * re-read the table once per FIELD (lastBatch + delEpoch +
    * modelEpoch + reencodedThrough = four schema inferences + four
    * 1-row jobs per verb); the lifecycle gates replay several verbs
    * per bench pass, so the per-action floor added up to a measurable
    * slice of every vector-warehouse gate.
    */
  private def readMeta(spark: SparkSession,
                       dir: String): Option[(Long, Long, Long, Long)] =
    Load.readTable(spark, s"$dir/meta").flatMap { df =>
      df.take(1).headOption.map { r =>
        def f(n: String): Long =
          if (r.schema.fieldNames.contains(n)) r.getAs[Long](n) else 0L
        (r.getAs[Long]("last_batch"), f("del_epoch"),
          f("model_epoch"), f("reencoded_through"))
      }
    }

  private def metaField(spark: SparkSession, dir: String,
                        field: String): Long =
    Load.readTable(spark, s"$dir/meta").map { df =>
      val r = df.head()
      if (r.schema.fieldNames.contains(field)) r.getAs[Long](field) else 0L
    }.getOrElse(0L)

  /** The committed delete epoch; 0 (no deletes) for warehouses written
    * before delete support existed.
    */
  private[graft] def delEpoch(spark: SparkSession, dir: String): Long =
    metaField(spark, dir, "del_epoch")

  /** The model epoch: 0 = the bootstrap models, +1 per [[retrain]]. */
  def modelEpoch(spark: SparkSession, dir: String): Long =
    metaField(spark, dir, "model_epoch")

  /** The lowest generation whose CURRENT on-disk encoding matches what
    * was originally served (everything below was re-encoded by the
    * last [[retrain]] under newer models).
    */
  private def reencodedThrough(spark: SparkSession, dir: String): Long =
    metaField(spark, dir, "reencoded_through")

  /** One meta-row writer that PRESERVES the retrain fields — the
    * 2-field writers append/delete/rollback used before retrain
    * existed would silently reset the model epoch.
    */
  private def writeMeta(spark: SparkSession, dir: String, last: Long,
                        epoch: Long, modelEp: Long, floor: Long): Unit = {
    import spark.implicits._
    Load.replaceTable(spark,
      Seq((last, epoch, modelEp, floor))
        .toDF("last_batch", "del_epoch", "model_epoch",
          "reencoded_through"), s"$dir/meta")
    ()
  }

  /** Anti-join `df` out of the live tombstone set, or `df` untouched
    * when the warehouse holds no deletes (delete-free indexes keep
    * their exact pre-delete plans). Only epochs ≤ the COMMITTED
    * del_epoch serve — a crashed [[delete]]'s half-landed epoch is
    * inert. The tombstone side is |deletes|-bounded → broadcast.
    */
  private def liveVecs(spark: SparkSession, dir: String, epoch: Long)
                      (df: DataFrame): DataFrame =
    if (epoch <= 0L) df
    else df.join(
      broadcast(spark.read.parquet(s"$dir/tombstones")
        .filter(col("epoch") <= epoch).select(col("vec_id"))),
      Seq("vec_id"), "left_anti")

  /** Bootstrap the warehouse from the initial corpus (fully wipes
    * `dir` — generation zero): trains + persists k coarse centroids
    * and m×ks PQ codebooks, then lands the encode of ALL of `vecs` as
    * `batch=0`. `trainOn` (default: `vecs` itself) is the training
    * subset — at corpus scale Lloyd iterations over every vector are
    * neither affordable nor needed (Jégou et al. train PQ on ~100k
    * samples); pass a DETERMINISTIC sample so re-bootstraps reproduce
    * the same models. Correctness is unaffected either way: the
    * models are persisted and every consumer (ingest, search, the
    * oracles) reads them back.
    */
  def bootstrap(spark: SparkSession, vecs: DataFrame, dir: String,
                k: Int, m: Int, ks: Int, iters: Int = 2,
                trainOn: Option[DataFrame] = None,
                meta: Seq[String] = Nil): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // lease BEFORE the wipe (the lock lives outside the root, so the
    // wipe cannot destroy it): even the teardown of the previous
    // warehouse runs single-writer, and the fence stays monotonic
    // across re-bootstraps
    WriterLease.withLease(spark, dir, "adc.bootstrap") { _ =>
    if (fs.exists(root)) fs.delete(root, true)
    // a stale pending retrain of the PREVIOUS warehouse must not
    // publish over the fresh bootstrap
    fs.delete(retrainPendingPath(dir), true)
    val train = trainOn.getOrElse(vecs)
    VectorOps.saveCentroids(spark,
      VectorOps.kmeansFit(
        train.select(col("vec_id"), col("embedding")), k, iters),
      s"$dir/centroids")
    val cents = VectorOps.loadCentroids(spark, s"$dir/centroids")
    val assigned = VectorOps.assignClusters(
        train.select(col("vec_id"), col("embedding")), cents)
      .withColumn("cluster_id", col("cluster_id").cast(LongType))
    Load.replaceTable(spark,
      Pq.trainCodebooks(spark,
        Pq.subResiduals(assigned, centDf(spark, dir), m), ks, iters),
      s"$dir/codebooks")
    writeGeneration(encodeBatch(spark, vecs, dir, meta), dir, 0L)
    writeMeta(spark, dir, last = 0L, epoch = 0L, modelEp = 0L, floor = 0L)
    }
  }

  /** Fold a vector batch under a caller-supplied contiguous id ≥ 1:
    * encode under the frozen models, land as `batch=I`, advance the
    * guard LAST. Replays (id ≤ high-water mark) are a loud no-op
    * returning false; skipped ids are refused.
    */
  def append(spark: SparkSession, vecs: DataFrame, dir: String,
             batchId: Long, meta: Seq[String] = Nil): Boolean = {
    require(batchId >= 1, "batch ids start at 1 (0 is the bootstrap)")
    val last0 = lastBatch(spark, dir)
    require(last0 >= 0, s"AdcIngest.append: no warehouse at $dir")
    if (batchId <= last0) return false
    WriterLease.withLease(spark, dir, "adc.append") { lease =>
    // Heal half-finished swaps BEFORE writing (root + index tree): if
    // compact crashed between atomicSwap's two renames (index/ moved
    // to index.__old, staging not yet renamed), writing here would
    // recreate index/ holding only this batch, and the next
    // recoverSwap — seeing both dirs — would delete __old and with it
    // every prior generation, while meta still claimed they landed.
    healForWrite(spark, dir)
    // the replay/contiguity guard re-derives INSIDE the lease: the
    // pre-lease read above is only a cheap replay fast-path — two
    // concurrent deliveries of the same id (at-least-once streaming)
    // could both pass a guard read before mutual exclusion, and the
    // second would re-add the batch to a meta that already counts it
    val (last, epoch, modelEp, floor) = readMeta(spark, dir)
      .getOrElse((-1L, 0L, 0L, 0L))
    if (batchId <= last) false
    else {
    require(batchId == last + 1,
      s"batch $batchId arrived over high-water mark $last — ids must " +
        "be contiguous or the skipped batch would silently never land")
    val encoded = encodeBatch(spark, vecs, dir, meta)
    // a generation whose columns diverge from the tree's would read
    // back as nulls under parquet schema union — refuse loudly
    require(spark.read.parquet(s"$dir/index").columns
        .filterNot(_ == "batch").toSet == encoded.columns.toSet,
      s"AdcIngest.append: meta columns $meta do not reproduce the " +
        "index schema — every generation must carry the same columns")
    writeGeneration(encoded, dir, batchId)
    WriterLease.check(spark, lease)
    writeMeta(spark, dir, batchId, epoch, modelEp, floor)
    // a retained rollback may have scheduled this id for deferred
    // deletion — it is live again (the overwrite above is the
    // exactly-once contract; deferred deletion must never fire on it)
    SegmentCompaction.unretire(spark, s"$dir/index", batchId)
    true
    }
    }
  }

  /** Roll the index back to generation `toBatch`: reset the high-water
    * mark, then delete every `batch > toBatch` generation — the vector
    * twin of `CorpusIngest.rollback`, the recovery lever when a bad
    * batch landed (and the fixture lever that lets a gate re-run the
    * ingest lifecycle against a frozen bootstrap).
    *
    * Crash ordering: meta lands FIRST. A crash between the two steps
    * then leaves generation dirs ABOVE the high-water mark — inert
    * remnants that [[index]]/[[segmentCount]] filter out, the next
    * [[rollback]] deletes on entry, and a later [[append]] of the same
    * id dynamic-overwrites — never a meta that claims generations the
    * tree no longer fully holds (the old delete-first order could
    * crash into exactly that, and the strict contiguity check then
    * misdiagnosed the half-finished rollback as a merged tree).
    *
    * Compaction awareness: under the [[SegmentCompaction]] coverage
    * invariant (live dir I holds original batches [I, next live id −
    * 1]), a rollback cut is legal iff it falls on a generation
    * boundary — `toBatch + 1` must itself be a live dir (or the cut is
    * a no-op at the high-water mark). A cut INSIDE a merged tree is
    * refused: its files interleave rows from batches on both sides of
    * the cut, so deletion-by-generation would be silent data
    * corruption; rebuild from bootstrap instead.
    */
  def rollback(spark: SparkSession, dir: String, toBatch: Long,
               retainMs: Long = 0L): Unit = {
    require(toBatch >= 0, "cannot roll back past the bootstrap")
    val last0 = lastBatch(spark, dir)
    require(last0 >= toBatch,
      s"AdcIngest.rollback: no warehouse at $dir at or above batch " +
        s"$toBatch")
    WriterLease.withLease(spark, dir, "adc.rollback") { lease =>
    healForWrite(spark, dir)
    // the high-water mark re-derives INSIDE the lease: a rollback
    // serialized behind another writer must not trust a pre-lease
    // read (a concurrent rollback could have already cut below it,
    // and writing the stale meta back would claim deleted generations)
    val (last, epochR, modelEpR, floorR) = readMeta(spark, dir)
      .getOrElse((-1L, 0L, 0L, 0L))
    require(last >= toBatch,
      s"AdcIngest.rollback: a concurrent rollback already cut below " +
        s"batch $toBatch (high-water mark now $last)")
    // an unpublished retained merge may cover generations this cut
    // deletes — discard (source gens still live) before restructuring
    SegmentCompaction.discardPending(spark, s"$dir/index")
    val p = new org.apache.hadoop.fs.Path(s"$dir/index")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def delete(b: Long): Unit = { fs.delete(
      new org.apache.hadoop.fs.Path(s"$dir/index/batch=$b"), true); () }
    val ids = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).toSet
    // heal: dirs above the high-water mark are remnants of a prior
    // rollback that crashed after its meta write — delete before
    // validating coverage
    ids.filter(_ > last).foreach(delete)
    val live = ids.filter(_ <= last)
    require(toBatch == last || live.contains(toBatch + 1),
      s"AdcIngest.rollback: generation ${toBatch + 1} has been merged " +
        "into an earlier tree by compaction — its files hold rows from " +
        s"batches <= $toBatch too, so rolling back to $toBatch would " +
        "corrupt them; rebuild from bootstrap instead")
    // tombstones SURVIVE a rollback — it rewinds the INGEST stream,
    // not the delete requests (a re-appended batch re-enters minus its
    // tombstoned vectors, exactly the never-rolled-back state). The
    // re-encode floor clamps to the cut: generations appended AFTER
    // this rollback live under the current models, so cuts at or above
    // the new floor stay exact
    WriterLease.check(spark, lease)
    writeMeta(spark, dir, toBatch, epochR, modelEpR,
      math.min(floorR, toBatch))
    val cut = live.filter(_ > toBatch).toSeq.sorted
    if (retainMs > 0L)
      // SNAPSHOT-RETAINED rollback (the InvertedIndex.rollback
      // contract): the cut generations stay physically in place
      // behind the committed high-water mark — in-flight readers'
      // pinned files untouched — on a deferred-deletion schedule
      // executed by later lease-holding maintenance or [[vacuum]]
      SegmentCompaction.retire(spark, s"$dir/index", cut,
        System.currentTimeMillis() + retainMs)
    else cut.foreach(delete)
    ()
    }
  }

  /** Tombstone-delete vectors by id — the takedown/opt-out lever, the
    * vector twin of `InvertedIndex.delete` (an embedding derived from
    * deleted content must leave the serving index NOW, not at the next
    * re-bootstrap). Logical deletion: the ids land as an `epoch=E`
    * generation under `tombstones/`; [[index]] and [[readAsOf]]
    * anti-join them out (broadcast — the set is |deletes|-bounded), so
    * every served search behaves as if the vectors were never
    * ingested; physical bytes are reclaimed when compaction next
    * rewrites the rows' generations ([[compact]]/[[tieredCompact]]
    * purge). ADC search carries no corpus-level statistics, so unlike
    * the text twin there are no globals to adjust — the anti-join IS
    * the whole semantic change.
    *
    * Exactly-once, crash-safe: ids are validated against the served
    * index (one compressed-scan semi-join — `ids` must be
    * delete-request-sized, it broadcasts; unknown or already-deleted
    * ids count zero), land as epoch `del_epoch + 1`, and the meta row
    * — advancing `del_epoch` in ONE swap — commits LAST. A crash in
    * between leaves an epoch dir above the committed mark: inert,
    * healed on the next delete's entry. Returns the number of newly
    * deleted vectors.
    */
  def delete(spark: SparkSession, dir: String, ids: DataFrame): Long =
   WriterLease.withLease(spark, dir, "adc.delete") { lease =>
    import spark.implicits._
    healForWrite(spark, dir)
    val (last, e0, modelEpD, floorD) = readMeta(spark, dir)
      .getOrElse((-1L, 0L, 0L, 0L))
    require(last >= 0, s"AdcIngest.delete: no warehouse at $dir")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // heal: epoch dirs above the committed del_epoch are a prior
    // crashed delete's remnants (the meta row is the commit point)
    val tPath = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    if (fs.exists(tPath))
      fs.listStatus(tPath).map(_.getPath).filter { q =>
        val nm = q.getName
        nm.startsWith("epoch=") && nm.stripPrefix("epoch=").toLong > e0
      }.foreach(q => { fs.delete(q, true); () })
    // materialized ONCE (eager local checkpoint): the count and the
    // epoch write must see the SAME rows — a nondeterministic `ids`
    // could otherwise hand each action a different victim set and the
    // returned count would disagree with the committed ledger
    // (InvertedIndex.delete's contract, same rationale)
    val victims = liveVecs(spark, dir, e0)(
      spark.read.parquet(s"$dir/index")
        .filter(col("batch") <= last).select(col("vec_id")))
      .join(broadcast(ids.select(col("vec_id")).distinct()),
        Seq("vec_id"), "left_semi")
      .localCheckpoint()
    val n = victims.count()
    if (n == 0L) 0L
    else {
      // the new epoch writes directly to its OWN dir (never an
      // overwrite of the tombstones root a reader may hold open; the
      // entry heal removed any crashed epoch dir > e0, so
      // errorifexists is exact)
      victims.write.mode("errorifexists")
        .parquet(s"$dir/tombstones/epoch=${e0 + 1}")
      WriterLease.check(spark, lease)
      writeMeta(spark, dir, last, e0 + 1, modelEpD, floorD)
      n
    }
  }

  /** TIME-TRAVEL READ: the compressed index exactly as of generation
    * `batch` — the vector twin of `CorpusIngest.readAsOf` (the
    * reproducible-serving snapshot: re-run an audit or an evaluation
    * against the index as it stood after fold I, O(1) via partition
    * pruning). Under tiered merges an as-of cut is only exact when it
    * falls on a surviving generation boundary — a merged dir holds a
    * contiguous RUN of batches under its lowest id, so a cut inside
    * the run would silently include newer rows; the same coverage
    * check as [[rollback]] refuses it loudly.
    */
  def readAsOf(spark: SparkSession, dir: String, batch: Long): DataFrame = {
    require(batch >= 0, "as-of generations start at 0 (the bootstrap)")
    healForRead(spark, dir)
    val (last, del, modelEp, floor) = readMeta(spark, dir)
      .getOrElse((-1L, 0L, 0L, 0L))
    require(last >= 0, s"AdcIngest.readAsOf: no warehouse at $dir")
    require(batch <= last,
      s"AdcIngest.readAsOf: generation $batch is above the high-water " +
        s"mark $last")
    // CROSS-EPOCH cuts are refused: generations below the re-encode
    // floor were ingested under a PREVIOUS model epoch and now exist
    // only re-encoded under the current one ([[retrain]]) — an as-of
    // read there would not be the bytes anyone historically served
    require(batch >= floor,
      s"AdcIngest.readAsOf: generation $batch predates the model-epoch " +
        s"$modelEp retrain (re-encoded through " +
        s"$floor) — its original encoding no longer exists; snapshot " +
        "before retraining")
    val p = new org.apache.hadoop.fs.Path(s"$dir/index")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).filter(_ <= last).toSet
    require(batch == last || live.contains(batch + 1),
      s"AdcIngest.readAsOf: generation ${batch + 1} has been merged " +
        "into an earlier tree by compaction — an as-of cut inside the " +
        "merged run would include newer rows; snapshot before " +
        "compaction or rebuild")
    // deletes are NOT time-traveled: an as-of read rewinds the INGEST
    // stream, but a takedown applies to every serving read, historical
    // replays included — that is what a deletion request means
    servedCols(liveVecs(spark, dir, del)(
      spark.read.parquet(s"$dir/index")
        .filter(col("batch") <= batch)))
  }

  /** (vec_id, cluster_id, codes, vn) first, then any metadata columns
    * the ingest carried (see [[encodeBatch]]'s `meta`), minus the
    * physical `batch` partition column.
    */
  private def servedCols(df: DataFrame): DataFrame = {
    val core = Seq("vec_id", "cluster_id", "codes", "vn")
    val extras = df.columns.filterNot((core :+ "batch").contains).sorted
    df.select((core ++ extras).map(col): _*)
  }

  /** The served index across all generations: (vec_id, cluster_id,
    * codes, vn) — feed to [[Pq.adcSearch]] with [[Pq.probeLuts]] built
    * from the same persisted models.
    */
  def index(spark: SparkSession, dir: String): DataFrame = {
    healForRead(spark, dir)
    // generations above the high-water mark never serve: they are
    // either a crashed rollback's undeleted remnants (meta lands
    // first) or a crashed append's half-landed batch (meta lands
    // last) — a pure partition-pruned filter, no exchange. Tombstoned
    // vectors never serve either (broadcast anti-join, see [[delete]]).
    val (last, del, _, _) = readMeta(spark, dir)
      .getOrElse((-1L, 0L, 0L, 0L))
    servedCols(liveVecs(spark, dir, del)(
      spark.read.parquet(s"$dir/index")
        .filter(col("batch") <= last)))
  }

  /** Number of `batch=` generations in the index tree — the
    * [[compact]] trigger (the vector twin of
    * `InvertedIndex.segmentCount`): every search opens O(generations)
    * file groups, so an append-heavy index decays toward one file set
    * per batch. One driver-side listStatus, no Spark job.
    */
  def segmentCount(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/index")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    healForRead(spark, dir)
    if (!fs.exists(p)) 0
    else {
      val last = lastBatch(spark, dir)
      fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .count(_.stripPrefix("batch=").toLong <= last)
    }
  }

  /** Collapse every generation into a single `batch=0` tree — a PURE
    * physical move (batches carry disjoint vec_ids under the append
    * contract; per-vector rows never merge), clustered by cluster_id
    * within files so probe-routed reads touch contiguous runs.
    * Crash-safe via the warehouse two-rename swap; the meta row —
    * including the exactly-once `last_batch` high-water mark — is
    * untouched, so replay protection and the next append id survive.
    */
  def compact(spark: SparkSession, dir: String,
              retainMs: Long = 0L): Unit =
   WriterLease.withLease(spark, dir, "adc.compact") { lease =>
    val indexDir = s"$dir/index"
    // heal a crashed tiered merge before the full rewrite reads the
    // tree (aside'd generations would otherwise drop silently); an
    // unpublished retained merge is derived data of gens this rewrite
    // covers — discard rather than race its eventual publish
    healForWrite(spark, dir)
    SegmentCompaction.discardPending(spark, indexDir)
    val (last, delC, _, _) = readMeta(spark, dir)
      .getOrElse((-1L, 0L, 0L, 0L))
    val live = SegmentCompaction.genSizes(spark, indexDir)
      .map(_._1).filter(_ <= last)
    // retainMs > 0: commit the full rewrite as a HIDDEN pending over
    // ALL live generations (the tieredCompact protocol) — the current
    // tree keeps serving byte-untouched until publish
    val staging = if (retainMs > 0L) s"$indexDir.__tiered_staging"
      else s"$indexDir.__staging"
    spark.read.parquet(indexDir)
      .filter(col("batch") <= last) // remnants die here
      // PURGE: tombstoned rows drop from the rewrite (the tombstone
      // rows stay — they keep delete replays no-ops; the read filter
      // is idempotent on purged rows)
      .transform(liveVecs(spark, dir, delC))
      .drop("batch").withColumn("batch", lit(0L))
      .repartition(col("cluster_id"))
      .sortWithinPartitions(col("cluster_id"), col("vec_id"))
      .write.mode("overwrite").partitionBy("batch").parquet(staging)
    WriterLease.check(spark, lease)
    if (retainMs > 0L)
      SegmentCompaction.commit(spark, indexDir, live, retainMs)
    else Load.atomicSwap(spark, staging, indexDir)
  }

  /** The compaction POLICY hook (vector twin of
    * `InvertedIndex.compactIfNeeded`): compact when the tree holds
    * more than `maxSegments` generations, else no-op. Idempotent under
    * streaming replays; a crash mid-compaction heals through
    * [[segmentCount]]'s recoverSwap on the next call.
    */
  def compactIfNeeded(spark: SparkSession, dir: String,
                      maxSegments: Int): Boolean = {
    require(maxSegments >= 1, "maxSegments must be at least 1")
    if (segmentCount(spark, dir) > maxSegments) { compact(spark, dir); true }
    else false
  }

  /** Size-tiered compaction — `InvertedIndex.tieredCompact`'s vector
    * twin (policy, coverage invariant and crash protocol in
    * [[SegmentCompaction]]): merge the unsettled tail of generations
    * into one generation at the tail's lowest batch id when at least
    * `minMerge` candidates exist, leaving large settled trees — above
    * all the bootstrap — untouched on disk. A pure physical move
    * (disjoint vec_ids per the [[append]] contract), cluster-clustered
    * within files like [[compact]]; meta and its exactly-once
    * `last_batch` are untouched, and because merges collapse a
    * CONTIGUOUS run into its lowest id, [[rollback]] stays decidable
    * from the dir listing (cuts on surviving boundaries allowed, cuts
    * inside a merged tree refused). Returns the merged batch ids
    * (empty = policy did not fire).
    */
  def tieredCompact(spark: SparkSession, dir: String, ratio: Double = 4.0,
                    minMerge: Int = 2,
                    retainMs: Long = 0L): Seq[Long] =
   WriterLease.withLease(spark, dir, "adc.tieredCompact") { lease =>
    val indexDir = s"$dir/index"
    healForWrite(spark, dir)
    // publish a due retained merge (writer-side, under the lease);
    // back off while one is still inside its window. A retained
    // rollback's deferred deletions execute here too once due.
    SegmentCompaction.publishDue(spark, indexDir)
    val (last, delT, _, _) = readMeta(spark, dir)
      .getOrElse((-1L, 0L, 0L, 0L))
    SegmentCompaction.retireDue(spark, indexDir, last)
    val ids =
      if (SegmentCompaction.pending(spark, indexDir).nonEmpty) Seq.empty
      else SegmentCompaction.mergeSet(
        SegmentCompaction.genSizes(spark, indexDir).filter(_._1 <= last),
        ratio, minMerge)
    if (ids.isEmpty) Seq.empty
    else {
      val lo = ids.min
      spark.read.parquet(indexDir)
        .filter(col("batch").isin(ids: _*))
        // purge tombstoned rows falling inside the merged run (settled
        // generations keep theirs until they eventually merge)
        .transform(liveVecs(spark, dir, delT))
        .drop("batch").withColumn("batch", lit(lo))
        .repartition(col("cluster_id"))
        .sortWithinPartitions(col("cluster_id"), col("vec_id"))
        .write.mode("overwrite").partitionBy("batch")
        .parquet(s"$indexDir.__tiered_staging")
      WriterLease.check(spark, lease)
      SegmentCompaction.commit(spark, indexDir, ids, retainMs)
      ids
    }
  }

  /** RETRAIN the frozen models from the CURRENT live vectors and
    * re-encode every generation behind ONE crash-safe swap — the
    * drift responder the q194 recall audit exists for: quantization
    * models fitted at bootstrap degrade as the vector distribution
    * drifts (recall@5 0.650 → 0.513 over the recorded 1M drift wave),
    * and the only prior remedy was a full manual re-bootstrap that
    * destroyed the high-water mark and the tombstone ledger.
    *
    * `vecs` supplies the raw (vec_id, embedding [, meta…]) of the
    * CURRENT live vectors — the upstream vector store has them; this
    * warehouse stores only codes. Coverage is REQUIRED: every live
    * indexed vec_id must appear exactly once in `vecs` (missing rows
    * would silently vanish from the index — refused loudly).
    * `trainOn` optionally subsamples the k-means/PQ fit (the Jégou
    * rule — same contract as [[bootstrap]]).
    *
    * What survives: `last_batch` (replay protection and the next
    * append id), the tombstone ledger and `del_epoch` (deletes stay
    * deleted — tombstoned vectors are excluded from training AND from
    * the re-encode, making retrain also the physical purge of every
    * generation), per-generation membership (each vec_id re-encodes
    * into the generation it landed in, so rollback boundaries and
    * [[segmentCount]] are unchanged). What advances: `model_epoch`
    * +1, and `reencoded_through` = the high-water mark — [[readAsOf]]
    * refuses cuts below it (the original encodings no longer exist).
    *
    * Crash safety: the ENTIRE new warehouse (models, re-encoded
    * index, meta, tombstone copy, fence/lease continuity) stages
    * under `dir.__retrain`, then lands through the standard two-rename
    * [[graft.etl.Load.atomicSwap]] of the warehouse ROOT — one commit
    * point. `retainMs > 0` defers that swap: the staged root parks as
    * `dir.__retrain_pending` while the OLD root keeps serving
    * byte-untouched (in-flight and new readers both), mutations are
    * REFUSED until the window passes (a mutation on either root would
    * be lost or corrupting — see publishRetrainGate), and the first
    * maintenance call after the window — or [[vacuum]] — performs the
    * same atomic swap. This is the reader-safety story for the one
    * verb that rewrites the whole warehouse: at 100 TB a retrain
    * takes hours and minutes-long queries are always in flight; the
    * old root must outlive them. One commit
    * point, healed by the root recoverSwap every entry runs (see
    * [[lastBatch]]). Every crash point leaves the full old or the
    * full new warehouse. Returns the number of re-encoded vectors.
    */
  def retrain(spark: SparkSession, vecs: DataFrame, dir: String,
              k: Int, m: Int, ks: Int, iters: Int = 2,
              trainOn: Option[DataFrame] = None,
              meta: Seq[String] = Nil,
              retainMs: Long = 0L): Long =
   WriterLease.withLease(spark, dir, "adc.retrain") { lease =>
    healForWrite(spark, dir)
    // an unpublished retained merge is derived data of generations the
    // re-encode rewrites anyway
    SegmentCompaction.discardPending(spark, s"$dir/index")
    val (last, e0, modelEp0, _) = readMeta(spark, dir)
      .getOrElse((-1L, 0L, 0L, 0L))
    require(last >= 0, s"AdcIngest.retrain: no warehouse at $dir")
    val stage = s"$dir.__retrain"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true) // stale staging
    // live generation membership from the served index — each vector
    // re-encodes into the generation it originally landed in
    val membership = liveVecs(spark, dir, e0)(
      spark.read.parquet(s"$dir/index")
        .filter(col("batch") <= last)
        .select(col("vec_id"), col("batch").cast(LongType).as("batch")))
    val joined = graft.ops.Relational.eager(
      vecs.select((Seq("vec_id", "embedding") ++ meta).map(col): _*)
        .join(membership, Seq("vec_id")))
    try {
      val nLive = membership.count()
      val n = joined.count()
      require(n == nLive,
        s"AdcIngest.retrain: supplied vectors cover $n of $nLive live " +
          "indexed ids — a partial retrain would silently drop the " +
          "missing vectors; supply the full live set")
      // row counts alone can't tell a clean cover from one duplicate
      // masking one missing id — the distinct count closes that hole
      // (every live vec_id must appear EXACTLY once, per the contract)
      val nDistinct = joined.select(col("vec_id")).distinct().count()
      require(nDistinct == nLive,
        s"AdcIngest.retrain: supplied vectors carry ${n - nDistinct} " +
          "duplicate vec_id rows masking missing ids — every live " +
          "vec_id must appear exactly once")
      // new models fitted on the LIVE vectors (tombstoned ones are
      // gone from membership, so they influence nothing)
      val train = trainOn.getOrElse(joined)
      VectorOps.saveCentroids(spark,
        VectorOps.kmeansFit(
          train.select(col("vec_id"), col("embedding")), k, iters),
        s"$stage/centroids")
      val cents = VectorOps.loadCentroids(spark, s"$stage/centroids")
      val assigned = VectorOps.assignClusters(
          train.select(col("vec_id"), col("embedding")), cents)
        .withColumn("cluster_id", col("cluster_id").cast(LongType))
      Load.replaceTable(spark,
        Pq.trainCodebooks(spark,
          Pq.subResiduals(assigned, centDf(spark, stage), m), ks, iters),
        s"$stage/codebooks")
      // re-encode every generation under the staged models; `batch`
      // rides encodeBatch's meta passthrough and restores the layout
      encodeBatch(spark, joined, stage, meta :+ "batch")
        .write.mode("overwrite").partitionBy("batch")
        .parquet(s"$stage/index")
      writeMeta(spark, stage, last, e0, modelEp0 + 1, floor = last)
      // the ledger survives verbatim (delete replays stay no-ops);
      // the lease/fence live OUTSIDE the swapped root (<dir>.__lock —
      // the WriterLease contract), so the swap cannot destroy them
      // and no copy is needed
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tombstones")))
        spark.read.parquet(s"$dir/tombstones")
          .write.mode("overwrite").partitionBy("epoch")
          .parquet(s"$stage/tombstones")
      WriterLease.check(spark, lease)
      if (retainMs > 0L) {
        // RETAINED retrain: the fully-staged new root parks beside the
        // old one, which keeps serving untouched (in-flight AND new
        // readers); mutations are blocked until the window passes
        // (publishRetrainGate), then the first maintenance call — or
        // [[vacuum]] — publishes via the same atomic root swap
        val out = fs.create(new org.apache.hadoop.fs.Path(
          s"$stage/_PUBLISH_AFTER"), true)
        try out.write(
          (System.currentTimeMillis() + retainMs).toString.getBytes("UTF-8"))
        finally out.close()
        fs.delete(retrainPendingPath(dir), true) // unreachable, defensive
        if (!fs.rename(new org.apache.hadoop.fs.Path(stage),
            retrainPendingPath(dir)))
          throw new IllegalStateException(
            s"retained retrain aborted: cannot park $stage as " +
              s"${retrainPendingPath(dir)} (old root untouched)")
      } else Load.atomicSwap(spark, stage, dir)
      n
    } finally joined.unpersist()
  }

  /** TOMBSTONE-DEBT purge — the vector twin of
    * `InvertedIndex.purgeDebt`: rewrite (only) the generations whose
    * tombstoned-row fraction has reached `tau`, reclaiming dead bytes
    * a settled generation would otherwise hold until it happened to
    * merge. Generation-scoped two-rename swaps, pure physical filter,
    * serving identical before/after. Returns the purged generation
    * ids.
    */
  def purgeDebt(spark: SparkSession, dir: String,
                tau: Double = 0.5, retainMs: Long = 0L): Seq[Long] =
   WriterLease.withLease(spark, dir, "adc.purgeDebt") { lease =>
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    val indexDir = s"$dir/index"
    healForWrite(spark, dir)
    // publish DUE retained rewrites; in-window pendings are skipped
    // below, never discarded (their snapshots outlive this purge)
    SegmentCompaction.publishDue(spark, indexDir)
    val (last, epoch, _, _) = readMeta(spark, dir)
      .getOrElse((-1L, 0L, 0L, 0L))
    require(last >= 0, s"AdcIngest.purgeDebt: no warehouse at $dir")
    if (epoch <= 0L) Seq.empty
    else {
      val tomb = broadcast(spark.read.parquet(s"$dir/tombstones")
        .filter(col("epoch") <= epoch).select(col("vec_id")))
      val debt = spark.read.parquet(indexDir)
        .filter(col("batch") <= last)
        .join(tomb, Seq("vec_id"), "left_semi")
        .groupBy(col("batch").cast(LongType).as("batch"))
        .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // pending-covered generations skip (their debt drains at publish)
      val covered = SegmentCompaction.pendings(spark, indexDir)
        .flatMap(_.ids).toSet
      val victims = SegmentCompaction.genSizes(spark, indexDir)
        .filter(_._1 <= last)
        .collect { case (b, n)
          if n > 0 && !covered(b) &&
            debt.getOrElse(b, 0L).toDouble / n >= tau => b }
      victims.foreach { b =>
        val rewritten = liveVecs(spark, dir, epoch)(
          spark.read.parquet(indexDir).filter(col("batch") === b))
          .drop("batch")
          .repartition(col("cluster_id"))
          .sortWithinPartitions(col("cluster_id"), col("vec_id"))
        if (retainMs > 0L) {
          // hidden single-generation pending — the indebted generation
          // keeps serving until the window passes (views identical:
          // reads anti-join the tombstones either way)
          rewritten.write.mode("overwrite")
            .parquet(s"$indexDir.__tiered_staging/batch=$b")
          WriterLease.check(spark, lease)
          SegmentCompaction.commit(spark, indexDir, Seq(b), retainMs)
        } else {
          val staging = s"$indexDir.__debt_staging"
          rewritten.write.mode("overwrite").parquet(staging)
          WriterLease.check(spark, lease)
          Load.atomicSwap(spark, staging, s"$indexDir/batch=$b")
        }
      }
      victims
    }
  }

  /** Force-publish a snapshot-retained tiered merge NOW — the explicit
    * vacuum verb (see [[tieredCompact]]'s `retainMs`); call when no
    * reader still holds the pre-merge snapshot. Returns the published
    * ids (empty = nothing pending).
    */
  def vacuum(spark: SparkSession, dir: String): Seq[Long] =
    WriterLease.withLease(spark, dir, "adc.vacuum") { _ =>
      Load.recoverSwap(spark, dir)
      // vacuum is the explicit "no reader holds a snapshot" verb: a
      // pending retained retrain publishes NOW, then hidden pendings
      // and the deferred-deletion schedule drain
      publishRetrainGate(spark, dir, force = true)
      Load.recoverSwap(spark, s"$dir/index")
      SegmentCompaction.recover(spark, s"$dir/index")
      SegmentCompaction.publish(spark, s"$dir/index") ++
        SegmentCompaction.retireDue(spark, s"$dir/index",
          lastBatch(spark, dir), force = true)
    }
}
