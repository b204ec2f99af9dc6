package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

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

  /** (batch id, row count) per live generation, ascending id. ROWS are
    * the tiering metric, not directory bytes: postings and PQ codes
    * are fixed-width rows, so rows ∝ data bytes at scale — but unlike
    * bytes, rows aren't floored by per-file parquet footer overhead
    * (a 64-bucket generation carries ~64 footers no matter how few
    * rows it holds, which at small scale makes every generation look
    * the same size and the policy nondeterministic). The count reads
    * only the partition column — footer metadata, no data pages.
    */
  def genSizes(spark: SparkSession, tree: String): Seq[(Long, Long)] = {
    val p = new Path(tree)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else spark.read.parquet(tree)
      .groupBy(col("batch").cast(LongType).as("batch"))
      .count().collect()
      .map(r => (r.getAs[Long]("batch"), r.getAs[Long]("count")))
      .toSeq.sortBy(_._1)
  }

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
    ()
  }

  /** Commit a staged tiered merge: the caller has fully written the
    * merged generation as `<tree>.__tiered_staging/batch=<ids.min>`;
    * this executes protocol steps 2–5 (manifest, aside renames
    * ascending, commit rename, cleanup). Rename failures abort loudly
    * before the commit point — [[recover]] then restores the pre-merge
    * tree on the next entry.
    */
  def commit(spark: SparkSession, tree: String, ids: Seq[Long]): Unit = {
    require(ids.size >= 2, "a tiered merge spans at least 2 generations")
    val lo = ids.min
    val aside = asidePath(tree)
    val fs = fsOf(spark, new Path(tree))
    require(fs.exists(new Path(stagingPath(tree), s"batch=$lo")),
      s"tiered commit: no staged batch=$lo under ${stagingPath(tree)}")
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
