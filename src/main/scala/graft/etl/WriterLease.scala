package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-writer lease per warehouse directory — the concurrency
  * contract the warehouse family (InvertedIndex, AdcIngest,
  * CorpusIngest) mutates under. Every mutating entry point brackets
  * its work in [[withLease]]: a second concurrent mutator is refused
  * LOUDLY (two interleaving writers could each "heal" the other's
  * in-flight swap — the failure mode single-process callers never see
  * but a streaming maintainer + an ad-hoc compact on a cluster hits
  * immediately). Read paths stay lease-free: they only heal crashed
  * remnants, which is safe against a crashed writer (that is what
  * heals are for) and a LIVE writer is excluded from the windows heals
  * touch by the lease among writers.
  *
  * Protocol (ZooKeeper-less, works on any Hadoop FileSystem with
  * atomic create-if-absent — local, HDFS; object stores need their
  * conditional-put shim):
  *  - `_FENCE` — a monotonic counter of issued leases, never deleted.
  *    [[acquire]] reads it, bumps it, and records the new value as the
  *    lease's FENCING TOKEN; because it only grows, a resurrected
  *    zombie writer always holds a SMALLER token than its usurper.
  *  - `_LEASE` — exists ⇔ held; content `token owner epochMs`.
  *    Created with overwrite=false (the atomic mutual exclusion),
  *    deleted on release.
  *  - STALE TAKEOVER: a crashed writer leaves `_LEASE` behind; an
  *    acquirer finding one older than `ttlMs` deletes it and retries
  *    ONCE (two concurrent takeovers then race on the create, one
  *    loses — correctness never depends on the ttl being right, only
  *    liveness).
  *  - FENCE CHECK: [[check]] re-reads `_LEASE` and requires it still
  *    carries the caller's token — called immediately before a
  *    mutation's commit point, so a writer that stalled past its ttl
  *    and lost a takeover race aborts BEFORE publishing over the
  *    usurper's work (the Chubby/ZooKeeper fencing rule).
  *
  * The fence counter doubles as the observability surface: q202's
  * WarehouseStats reports it (`fence_token`) and the oracle replays it
  * from the `_FENCE` text file directly.
  */
object WriterLease {

  final case class Lease(dir: String, token: Long, owner: String)

  /** Default staleness horizon: a writer silent for 15 minutes is
    * presumed dead. Mutations here are O(batch) jobs — minutes, not
    * hours; callers running longer rewrites pass their own ttl.
    */
  val DefaultTtlMs: Long = 15L * 60 * 1000

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def leasePath(dir: String) = new Path(s"$dir/_LEASE")
  private def fencePath(dir: String) = new Path(s"$dir/_FENCE")

  private def readSmall(spark: SparkSession, p: Path): Option[String] = {
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, "UTF-8").trim)
      } finally in.close()
    }
  }

  private def writeSmall(spark: SparkSession, p: Path, contents: String,
                         overwrite: Boolean): Unit = {
    val out = fs(spark, p).create(p, overwrite)
    try out.write(contents.getBytes("UTF-8")) finally out.close()
  }

  /** The last issued fencing token (0 = never leased — a fresh or
    * pre-lease warehouse).
    */
  def fenceToken(spark: SparkSession, dir: String): Long =
    readSmall(spark, fencePath(dir)).map(_.toLong).getOrElse(0L)

  /** Whether a (possibly stale) lease file currently exists. */
  def held(spark: SparkSession, dir: String): Boolean =
    fs(spark, leasePath(dir)).exists(leasePath(dir))

  /** Acquire the warehouse's writer lease or throw. One stale-lease
    * takeover retry; a LIVE holder is refused loudly with its
    * identity.
    */
  def acquire(spark: SparkSession, dir: String, owner: String,
              ttlMs: Long = DefaultTtlMs): Lease = {
    val root = new Path(dir)
    val f = fs(spark, root)
    if (!f.exists(root)) f.mkdirs(root)
    def attempt(retry: Boolean): Lease = {
      val token = fenceToken(spark, dir) + 1
      try {
        writeSmall(spark, leasePath(dir),
          s"$token $owner ${System.currentTimeMillis()}",
          overwrite = false)
        // under the lease we now hold, advancing the fence is safe
        writeSmall(spark, fencePath(dir), token.toString, overwrite = true)
        Lease(dir, token, owner)
      } catch {
        case _: java.io.IOException if f.exists(leasePath(dir)) =>
          val cur = readSmall(spark, leasePath(dir)).getOrElse("")
          val parts = cur.split(" ", 3)
          val ageMs =
            if (parts.length == 3)
              System.currentTimeMillis() - parts(2).toLong
            else Long.MaxValue // unreadable lease: treat as stale
          if (ageMs > ttlMs && retry) {
            f.delete(leasePath(dir), false)
            attempt(retry = false)
          } else throw new IllegalStateException(
            s"writer lease on $dir is held by '${
              if (parts.length >= 2) parts(1) else "?"
            }' (token ${parts.headOption.getOrElse("?")}, age ${
              ageMs / 1000}s ≤ ttl ${ttlMs / 1000}s) — refusing a " +
              "second concurrent mutator; wait, or raise ttlMs if the " +
              "holder is known dead")
      }
    }
    attempt(retry = true)
  }

  /** Require the lease is still ours — call immediately before a
    * mutation's commit point (see the object doc's fencing rule).
    */
  def check(spark: SparkSession, lease: Lease): Unit = {
    val cur = readSmall(spark, leasePath(lease.dir))
      .flatMap(_.split(" ", 3).headOption).map(_.toLong)
    require(cur.contains(lease.token),
      s"fencing token ${lease.token} on ${lease.dir} was superseded " +
        s"(current: ${cur.getOrElse("none")}) — another writer took " +
        "over a stale lease; aborting before the commit point")
  }

  /** Release — only our own token (a usurped zombie must not delete
    * the usurper's lease).
    */
  def release(spark: SparkSession, lease: Lease): Unit = {
    val cur = readSmall(spark, leasePath(lease.dir))
      .flatMap(_.split(" ", 3).headOption).map(_.toLong)
    if (cur.contains(lease.token))
      fs(spark, leasePath(lease.dir)).delete(leasePath(lease.dir), false)
    ()
  }

  /** Bracket a mutation in acquire/release; the body receives the
    * lease for [[check]] calls at its commit points. The lease is
    * released on BOTH success and failure — a thrown mutation leaves
    * crash remnants for the heals, not a dead lease for the ttl.
    */
  def withLease[T](spark: SparkSession, dir: String, owner: String,
                   ttlMs: Long = DefaultTtlMs)(body: Lease => T): T = {
    val lease = acquire(spark, dir, owner, ttlMs)
    try body(lease) finally release(spark, lease)
  }
}
