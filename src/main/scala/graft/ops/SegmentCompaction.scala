package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Size-tiered segment merging for the `batch=I`-partitioned warehouse
  * indexes ([[InvertedIndex]], [[AdcIngest]]) — the write-amplification
  * fix over their full-rewrite `compact`: a full compact rewrites the
  * ENTIRE index into `batch=0` every time the policy fires, so a steady
  * append stream with segment budget K rewrites O(N·index/K) total
  * bytes — the classic full-rewrite anti-shape at warehouse scale
  * (O'Neil et al., "The Log-Structured Merge-Tree", Acta Informatica
  * 1996; the tiering here is the size-tiered policy of Lucene's
  * TieredMergePolicy / RocksDB universal compaction). Tiered merging
  * rewrites only the SMALL unsettled tail of generations; a large
  * settled tree's files are never opened, moved, or rewritten.
  *
  * Policy ([[mergeSet]]): generation i (size s_i — row count, see
  * [[genSizes]] — ascending batch id) is SETTLED when
  * s_i ≥ ratio × Σ s_j over every newer generation —
  * it dwarfs everything accumulated after it, so folding the tail into
  * it would pay O(s_i) for an O(tail) problem. The merge candidates are
  * every generation newer than the newest settled one; the merge fires
  * when at least `minMerge` of them exist. Each byte therefore
  * re-merges only while its segment is still within ratio× of the
  * incoming tail — segments settle geometrically and total write
  * amplification is O(ratio) per settled level instead of O(appends).
  *
  * Merging a CONTIGUOUS RUN of generations into the run's lowest id
  * preserves the coverage invariant the warehouses rely on: live dir
  * ids i_0 < … < i_k partition the original batches 0..last_batch into
  * runs, dir i_j holding exactly batches [i_j, i_{j+1}−1] (i_k holds
  * [i_k, last]). That is what lets [[AdcIngest.rollback]] decide — from
  * the dir listing and the meta high-water mark alone — whether a
  * rollback cut falls on a generation boundary (deletable) or inside a
  * merged tree (refused: rows below the cut share files with rows
  * above it).
  *
  * Crash safety — the two-rename discipline of
  * [[graft.etl.Load.atomicSwap]], scoped to the merged run:
  *  1. the merged generation is fully written to `<tree>.__tiered_staging`;
  *  2. a manifest naming the merged ids lands in `<tree>.__tiered_old`
  *     BEFORE anything moves (so recovery always knows the run);
  *  3. the merged source dirs rename into the aside dir ASCENDING —
  *     the lowest id first, because its presence in the live tree is
  *     the recovery discriminator;
  *  4. the staged merged dir renames into the live tree as
  *     `batch=<lowest id>` — the commit point;
  *  5. aside + staging are deleted.
  * [[recover]] (called by every maintenance/read entry point alongside
  * recoverSwap) heals any crash point: aside without manifest → nothing
  * moved, discard; manifest present and live `batch=<lo>` missing →
  * uncommitted, restore the moved dirs; live `batch=<lo>` present →
  * committed (or never started), discard remnants. Every crash point
  * leaves either the full pre-merge or the full post-merge tree.
  */
object SegmentCompaction {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def asidePath(tree: String) = new Path(s"$tree.__tiered_old")
  private def stagingPath(tree: String) = new Path(s"$tree.__tiered_staging")
  private val Manifest = "_MANIFEST"

  // ---- deferred publish (snapshot-retention) names ----
  // A dot-prefixed dir is INVISIBLE to Spark partition discovery and
  // to hive-glob readers — that invisibility is the whole snapshot
  // mechanism (see [[commit]] with retainMs > 0).
  private def mergedPath(tree: String, lo: Long) =
    new Path(s"$tree/.merged-$lo")
  private def oldAsidePath(tree: String, lo: Long) =
    new Path(s"$tree/.old-$lo")
  private val MergedMarker = "_MERGED_IDS"

  /** A committed-but-unpublished REWRITE: the rewritten generation
    * sits HIDDEN in the tree while the generations it replaces keep
    * serving (both views are identical — every retained rewrite here
    * is a pure physical move: tiered merge, full compact, debt
    * purge), until [[publishDue]]/[[publish]] swaps it in after the
    * retention window. Several can pend at once (one per purged
    * generation) — their id sets are disjoint by construction.
    */
  final case class PendingMerge(ids: Seq[Long], publishAfterMs: Long,
                                dir: Path)

  /** (batch id, row count) per live generation, ascending id. ROWS are
    * the tiering metric, not directory bytes: postings and PQ codes
    * are fixed-width rows, so rows ∝ data bytes at scale — but unlike
    * bytes, rows aren't floored by per-file parquet footer overhead
    * (a 64-bucket generation carries ~64 footers no matter how few
    * rows it holds, which at small scale makes every generation look
    * the same size and the policy nondeterministic). The count reads
    * only the partition column — footer metadata, no data pages.
    */
  def genSizes(spark: SparkSession, tree: String): Seq[(Long, Long)] =
    // exact per-generation row counts straight from each batch= dir's
    // parquet footers on the driver — the same numbers the previous
    // `read.parquet(tree).groupBy(batch).count()` computed, without the
    // schema inference + partition discovery + Spark job every
    // maintenance verb was paying per call (guide §1.2; zero-row
    // generations are omitted by both forms)
    graft.etl.LocalParquet.partitionRowCounts(spark, tree, "batch")

  /** The ids to merge under the size-tiered policy, or empty when no
    * merge is due: every generation newer than the newest SETTLED one
    * (settled ⇔ bytes ≥ ratio × total bytes of all newer generations),
    * gated on at least `minMerge` candidates. Pure — spec-pinned
    * directly.
    */
  def mergeSet(sizes: Seq[(Long, Long)], ratio: Double,
               minMerge: Int): Seq[Long] = {
    require(ratio >= 1.0, "tier ratio must be at least 1")
    require(minMerge >= 2, "a merge needs at least 2 generations")
    // suffix(i) = Σ sizes over generations i.. (newer-or-equal); the
    // newest generation is never a barrier — "settled" means dwarfing
    // a NONEMPTY newer tail, else nothing could ever merge
    val suffix = sizes.map(_._2).scanRight(0L)(_ + _)
    val lastSettled = (0 until sizes.length - 1).reverse
      .find(i => sizes(i)._2 >= ratio * suffix(i + 1)).getOrElse(-1)
    val cands = sizes.drop(lastSettled + 1).map(_._1)
    if (cands.size >= minMerge) cands else Seq.empty
  }

  /** Heal any half-finished tiered merge at `tree` — see the object doc
    * for the crash-point table. Idempotent and re-entrant.
    */
  def recover(spark: SparkSession, tree: String): Unit = {
    // publishes that crashed mid-sequence roll FORWARD (the pre-merge
    // view is already partially destroyed); an intact pending merge is
    // left alone — reads heal crashes, writers advance state
    // (publishDue runs from lease-holding maintenance entry points)
    completeHalfPublished(spark, tree)
    // a debt purge ([[InvertedIndex.purgeDebt]]/[[AdcIngest.purgeDebt]])
    // that crashed mid-generation-swap leaves a `batch=N.__old` beside
    // (or instead of) its generation dir — the standard scoped-swap
    // remnant, healed here so every entry point covers it
    graft.etl.Load.recoverScopedSwaps(spark, tree)
    val debtStaging = new Path(s"$tree.__debt_staging")
    val dfs = fsOf(spark, debtStaging)
    if (dfs.exists(debtStaging)) dfs.delete(debtStaging, true)
    val aside = asidePath(tree)
    val staging = stagingPath(tree)
    val fs = fsOf(spark, new Path(tree))
    if (fs.exists(aside)) {
      val mf = new Path(aside, Manifest)
      val ids = if (fs.exists(mf)) readManifest(fs, mf) else Seq.empty
      if (ids.isEmpty) {
        // no manifest, or an empty/truncated one (crash during the
        // manifest write — which happens BEFORE any rename, so nothing
        // can have moved under a manifest that never finished).
        // Defensively restore any aside'd dir whose live target is
        // missing — rename-if-absent is safe in every state: a present
        // target means the live tree already serves that generation.
        fs.listStatus(aside).foreach { st =>
          val name = st.getPath.getName
          if (name.startsWith("batch=") &&
              !fs.exists(new Path(s"$tree/$name")))
            restore(fs, st.getPath, new Path(s"$tree/$name"))
        }
        fs.delete(aside, true)
      } else {
        val lo = ids.min
        if (fs.exists(new Path(s"$tree/batch=$lo"))) {
          // committed (the merged dir serves) or never started moving
          // (the original dir still serves) — remnants are dead either
          // way
          fs.delete(aside, true)
        } else {
          // uncommitted: restore every generation that was moved
          // aside; a failed restore must abort BEFORE the aside delete
          // below, or the only copy of a generation would vanish
          ids.foreach { id =>
            val src = new Path(aside, s"batch=$id")
            if (fs.exists(src))
              restore(fs, src, new Path(s"$tree/batch=$id"))
          }
          fs.delete(aside, true)
        }
      }
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    ()
  }

  /** Drop tiered-merge remnants unconditionally — for bootstrap paths
    * that wipe and rebuild `tree`: a stale aside from a PRIOR index at
    * the same path must never "heal" dead generations into the fresh
    * one.
    */
  def clearRemnants(spark: SparkSession, tree: String): Unit = {
    val fs = fsOf(spark, new Path(tree))
    fs.delete(asidePath(tree), true)
    fs.delete(stagingPath(tree), true)
    // a PRIOR index's unpublished merge or publish aside must not
    // resurrect into the fresh tree either
    val p = new Path(tree)
    if (fs.exists(p))
      fs.listStatus(p).map(_.getPath)
        .filter { q =>
          q.getName.startsWith(".merged-") || q.getName.startsWith(".old-") ||
            q.getName == ".retired"
        }.foreach(q => { fs.delete(q, true); () })
    ()
  }

  /** Commit a staged tiered merge: the caller has fully written the
    * merged generation as `<tree>.__tiered_staging/batch=<ids.min>`.
    *
    * `retainMs = 0` (the default): immediate publish — protocol steps
    * 2–5 (manifest, aside renames ascending, commit rename, cleanup).
    * Rename failures abort loudly before the commit point —
    * [[recover]] then restores the pre-merge tree on the next entry.
    *
    * `retainMs > 0`: SNAPSHOT-RETENTION commit — the merged
    * generation lands as a HIDDEN `.merged-<lo>` dir (dot-prefixed:
    * invisible to Spark partition discovery and hive-glob readers)
    * carrying a `_MERGED_IDS` marker (ids + publish-after timestamp)
    * that rode the atomic rename from staging; the generations it
    * replaces keep serving UNTOUCHED. Because the merge is a pure
    * physical move, the pre-merge view every in-flight and new reader
    * resolves is semantically identical to the merged one — so a
    * reader whose plan pinned the old files mid-flight survives the
    * whole commit, and nothing is deleted until [[publishDue]] (from
    * a later lease-holding maintenance call) or an explicit
    * [[publish]] swaps the merged dir in after the window. This is
    * the Iceberg expire-snapshots contract re-expressed on plain
    * directories: visibility by metadata, data immutable until
    * vacuum.
    */
  def commit(spark: SparkSession, tree: String, ids: Seq[Long],
             retainMs: Long = 0L): Unit = {
    // ids.size >= 2 is a tiered MERGE; a single id is a retained
    // in-place REWRITE (debt purge, 1-generation compact) — the
    // protocol is identical, the replaced run is just length 1
    require(ids.nonEmpty, "a commit names at least one generation")
    val lo = ids.min
    val fs = fsOf(spark, new Path(tree))
    require(fs.exists(new Path(stagingPath(tree), s"batch=$lo")),
      s"tiered commit: no staged batch=$lo under ${stagingPath(tree)}")
    if (retainMs > 0L) {
      // disjointness keeps every pending independently publishable
      val overlap = pendings(spark, tree).flatMap(_.ids).toSet
        .intersect(ids.toSet)
      require(overlap.isEmpty,
        s"a pending rewrite already covers generations $overlap under " +
          s"$tree — publish or discard it before committing another")
      // the marker rides the atomic rename: no crash point can leave a
      // hidden merged dir whose replaced ids are unknown
      val out = fs.create(
        new Path(stagingPath(tree), s"batch=$lo/$MergedMarker"), true)
      try out.write((ids.sorted.mkString(",") + "|" +
        (System.currentTimeMillis() + retainMs)).getBytes("UTF-8"))
      finally out.close()
      if (!fs.rename(new Path(stagingPath(tree), s"batch=$lo"),
          mergedPath(tree, lo)))
        throw new IllegalStateException(
          s"tiered merge aborted: cannot place hidden merged dir in " +
            s"$tree (pre-merge tree untouched)")
      fs.delete(stagingPath(tree), true)
      ()
    } else {
      val aside = asidePath(tree)
      fs.mkdirs(aside)
      val out = fs.create(new Path(aside, Manifest), true)
      try out.write(ids.sorted.mkString(",").getBytes("UTF-8"))
      finally out.close()
      ids.sorted.foreach { id =>
        if (!fs.rename(new Path(s"$tree/batch=$id"),
            new Path(aside, s"batch=$id")))
          throw new IllegalStateException(
            s"tiered merge aborted: cannot move $tree/batch=$id aside " +
              "(recover() will restore the pre-merge tree)")
      }
      if (!fs.rename(new Path(stagingPath(tree), s"batch=$lo"),
          new Path(s"$tree/batch=$lo")))
        throw new IllegalStateException(
          s"tiered merge aborted: cannot commit merged batch=$lo into " +
            s"$tree (recover() will restore the pre-merge tree)")
      fs.delete(aside, true)
      fs.delete(stagingPath(tree), true)
      ()
    }
  }

  /** The committed-but-unpublished merge at `tree`, if any (the first
    * when several rewrites pend — see [[pendings]]).
    */
  def pending(spark: SparkSession, tree: String): Option[PendingMerge] =
    pendings(spark, tree).headOption

  /** Every committed-but-unpublished rewrite at `tree`, ascending by
    * lowest replaced id. Id sets are disjoint by the [[commit]]
    * overlap check, so each publishes independently.
    */
  def pendings(spark: SparkSession, tree: String): Seq[PendingMerge] = {
    val p = new Path(tree)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath)
      .filter(_.getName.startsWith(".merged-"))
      .flatMap { mdir =>
        readMarker(fs, new Path(mdir, MergedMarker))
          .map { case (ids, after) => PendingMerge(ids, after, mdir) }
      }.sortBy(_.ids.min).toSeq
  }

  /** Publish the pending merge NOW (the vacuum step): swap the hidden
    * merged dir in over its lowest replaced id and delete the replaced
    * generations. Returns the published ids, empty when nothing was
    * pending. Crash-safe roll-forward: the `_MERGED_IDS` marker stays
    * inside the now-live dir until every replaced generation is gone,
    * so [[recover]] completes any interrupted publish from the marker
    * alone. Callers hold the warehouse writer lease and assert the
    * retention window themselves ([[publishDue]] is the time-gated
    * form); publishing INVALIDATES reader snapshots older than the
    * window — the Iceberg expire-snapshots contract.
    */
  def publish(spark: SparkSession, tree: String): Seq[Long] =
    pendings(spark, tree).flatMap { case PendingMerge(ids, _, mdir) =>
      publishOne(spark, tree, ids, mdir)
    }

  private def publishOne(spark: SparkSession, tree: String,
                         ids: Seq[Long], mdir: Path): Seq[Long] = {
    val fs = fsOf(spark, new Path(tree))
    val lo = ids.min
    val live = new Path(s"$tree/batch=$lo")
    // step 1: the lowest replaced generation moves aside (hidden)
    // so the merged dir can take its name; a crash here rolls
    // forward through recover()'s half-published scan
    if (fs.exists(live) &&
        !fs.rename(live, oldAsidePath(tree, lo)))
      throw new IllegalStateException(
        s"tiered publish aborted: cannot move $live aside")
    // step 2 — COMMIT: the merged dir becomes the live generation
    if (!fs.rename(mdir, live))
      throw new IllegalStateException(
        s"tiered publish aborted: cannot swap $mdir into $live " +
          "(recover() rolls the publish forward)")
    finishPublish(fs, tree, ids)
    ids
  }

  /** Time-gated [[publish]]: fires only on rewrites whose recorded
    * retention window has passed. The writer-side maintenance entry
    * points call this; read-side [[recover]] never publishes by time
    * (reads heal crashes, writers advance state).
    */
  def publishDue(spark: SparkSession, tree: String): Seq[Long] = {
    val now = System.currentTimeMillis()
    pendings(spark, tree).filter(now >= _.publishAfterMs)
      .flatMap(p => publishOne(spark, tree, p.ids, p.dir))
  }

  /** Drop every pre-publish pending rewrite (their source generations
    * are still live, so the hidden dirs are pure derived data) —
    * called by tree-restructuring mutators (rollback, full compact)
    * that would otherwise race the eventual publish. A HALF-published
    * rewrite is rolled forward instead (its source is already
    * partially gone).
    */
  def discardPending(spark: SparkSession, tree: String): Unit = {
    completeHalfPublished(spark, tree)
    pendings(spark, tree).foreach { p =>
      fsOf(spark, new Path(tree)).delete(p.dir, true)
    }
  }

  // ---- deferred generation retirement (retained rollback) ----
  // A retained ROLLBACK cannot use the hidden-dir protocol: nothing is
  // rewritten — generations are CUT. The snapshot trick is the dual:
  // the cut generations stay physically in place (every read path
  // already filters `batch <= high-water mark`, so new readers never
  // see them; in-flight readers' pinned files are untouched) and only
  // their DELETION is deferred behind a `.retired` schedule file,
  // executed by a later lease-holding maintenance call ([[retireDue]])
  // or an explicit vacuum. A re-append of a retired id goes live again
  // ([[unretire]] + the `> hwm` guard — deletion can never touch a
  // live generation).

  private def retiredMarker(tree: String) = new Path(s"$tree/.retired")

  /** Schedule `ids` for deferred deletion after `afterMs` has passed;
    * merges with an existing schedule (ids union, latest window wins).
    */
  def retire(spark: SparkSession, tree: String, ids: Seq[Long],
             afterMs: Long): Unit = {
    if (ids.isEmpty) return
    val fs = fsOf(spark, new Path(tree))
    val (oldIds, oldAfter) = retired(spark, tree).getOrElse((Seq.empty, 0L))
    val merged = (oldIds ++ ids).distinct.sorted
    val out = fs.create(retiredMarker(tree), true)
    try out.write(
      (merged.mkString(",") + "|" + math.max(afterMs, oldAfter))
        .getBytes("UTF-8"))
    finally out.close()
    ()
  }

  /** The retirement schedule: (ids, delete-after ms), None when none
    * (or the marker is torn — a torn schedule deletes nothing, the
    * safe direction).
    */
  def retired(spark: SparkSession, tree: String): Option[(Seq[Long], Long)] =
    readMarker(fsOf(spark, new Path(tree)), retiredMarker(tree))

  /** Remove one id from the schedule — called by the append path when
    * a retired generation id is re-landed (it is live again; its
    * pre-rollback snapshot is gone by the overwrite, which is the
    * exactly-once contract, not a retention hole).
    */
  def unretire(spark: SparkSession, tree: String, id: Long): Unit =
    retired(spark, tree).foreach { case (ids, after) =>
      val fs = fsOf(spark, new Path(tree))
      val rest = ids.filterNot(_ == id)
      if (rest.isEmpty) { fs.delete(retiredMarker(tree), false); () }
      else {
        val out = fs.create(retiredMarker(tree), true)
        try out.write((rest.mkString(",") + "|" + after).getBytes("UTF-8"))
        finally out.close()
        ()
      }
    }

  /** Execute the retirement schedule if its window has passed: delete
    * every scheduled generation still ABOVE the high-water mark (a
    * re-appended id is live and is never touched — deletion is also
    * idempotent on ids an intervening rollback already removed), then
    * drop the schedule. Writer-side only (call under the lease).
    * Returns the deleted ids.
    */
  def retireDue(spark: SparkSession, tree: String, hwm: Long,
                force: Boolean = false): Seq[Long] =
    retired(spark, tree) match {
      case Some((ids, after))
          if force || System.currentTimeMillis() >= after =>
        val fs = fsOf(spark, new Path(tree))
        val gone = ids.filter(_ > hwm)
        gone.foreach { id =>
          fs.delete(new Path(s"$tree/batch=$id"), true); ()
        }
        fs.delete(retiredMarker(tree), false)
        gone
      case _ => Seq.empty
    }

  /** Steps 3–5 of a publish: delete the replaced generations (the
    * lowest sits in its hidden aside), then the marker LAST — the
    * marker's presence is what makes an interrupted publish
    * recoverable.
    */
  private def finishPublish(fs: FileSystem, tree: String,
                            ids: Seq[Long]): Unit = {
    val lo = ids.min
    ids.filter(_ != lo).foreach { id =>
      fs.delete(new Path(s"$tree/batch=$id"), true); ()
    }
    fs.delete(oldAsidePath(tree, lo), true)
    fs.delete(new Path(s"$tree/batch=$lo/$MergedMarker"), false)
    ()
  }

  /** Roll forward publishes that crashed mid-sequence — identified by
    * (a) a hidden merged dir whose live `batch=<lo>` is already gone
    * (crash between publish steps 1 and 2), or (b) a live generation
    * still carrying a `_MERGED_IDS` marker (crash after the commit
    * rename, before cleanup). Idempotent; called from [[recover]].
    */
  private def completeHalfPublished(spark: SparkSession,
                                    tree: String): Unit = {
    val p = new Path(tree)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return
    // (a) merged dir present, live target gone: the publish had
    // already destroyed the pre-merge view — finish it
    pendings(spark, tree).foreach { pm =>
      val live = new Path(s"$tree/batch=${pm.ids.min}")
      if (!fs.exists(live)) {
        if (!fs.rename(pm.dir, live))
          throw new IllegalStateException(
            s"tiered publish recovery aborted: cannot swap ${pm.dir} " +
              s"into $live — the hidden dir holds the only merged copy")
        finishPublish(fs, tree, pm.ids)
      }
    }
    // (b) committed merged dir still carrying its marker: cleanup
    fs.listStatus(p).map(_.getPath)
      .filter(q => q.getName.startsWith("batch="))
      .foreach { live =>
        val mk = new Path(live, MergedMarker)
        if (fs.exists(mk))
          readMarker(fs, mk).foreach { case (ids, _) =>
            finishPublish(fs, tree, ids)
          }
      }
  }

  /** `_MERGED_IDS` contents: `(replaced ids, publish-after ms)`, or
    * None when empty/truncated (a crash during the marker write —
    * which precedes the staging rename, so nothing moved).
    */
  private def readMarker(fs: FileSystem,
                         mk: Path): Option[(Seq[Long], Long)] = {
    if (!fs.exists(mk)) return None
    val in = fs.open(mk)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(mk).getLen.toInt)
      in.readFully(bytes)
      val txt = new String(bytes, "UTF-8").trim
      txt.split("\\|", 2) match {
        case Array(ids, after) =>
          try Some((ids.split(",").map(_.toLong).toSeq, after.toLong))
          catch { case _: NumberFormatException => None }
        case _ => None
      }
    } finally in.close()
  }

  private def restore(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new IllegalStateException(
        s"tiered recovery aborted: cannot restore $src to $dst — the " +
          "aside dir is left intact for a retry; do NOT delete it " +
          "(it holds the only copy of that generation)")

  /** Manifest contents, or empty when the file is empty/truncated (a
    * crash during the manifest write — which precedes every rename,
    * so an unparsable manifest proves nothing moved).
    */
  private def readManifest(fs: FileSystem, mf: Path): Seq[Long] = {
    val in = fs.open(mf)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(mf).getLen.toInt)
      in.readFully(bytes)
      val txt = new String(bytes, "UTF-8").trim
      try txt.split(",").map(_.toLong).toSeq
      catch { case _: NumberFormatException => Seq.empty }
    } finally in.close()
  }

  /** (absolute path, length, modification time) of every file under
    * `path`, recursively — the byte-identity fingerprint the
    * settled-tree guarantee is pinned with (q190/q191 requires, the
    * Stress tiered A/B, SegmentCompactionSpec). One definition so the
    * fingerprint can never drift between its pinning sites.
    */
  def fileStamps(spark: SparkSession,
                 path: String): Set[(String, Long, Long)] = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val it = fs.listFiles(p, true)
    val b = Set.newBuilder[(String, Long, Long)]
    while (it.hasNext) {
      val st = it.next()
      b += ((st.getPath.toString, st.getLen, st.getModificationTime))
    }
    b.result()
  }
}
