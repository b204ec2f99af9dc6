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
  * immediately). Read paths stay lease-free; they gate their crash
  * heals on [[liveHolder]] (a live writer's in-flight swap state must
  * never be "healed" out from under it — reads heal CRASHES, and a
  * crash is precisely a lease gone silent).
  *
  * The lock state lives in a SIBLING directory `<dir>.__lock/`, NOT
  * inside the warehouse root: warehouse-restructuring verbs (retrain,
  * purge) commit by atomically swapping the root itself, and a lock
  * kept inside the swapped tree would vanish between the two renames —
  * letting a concurrent acquirer mint a fresh lease mid-swap and the
  * second rename then land the staged root INSIDE the recreated dir.
  * Outside the root, the lease survives every swap, the fence stays
  * monotonic across re-bootstraps, and retrain needs no lease-copy
  * contortions.
  *
  * Protocol (ZooKeeper-less, works on any Hadoop FileSystem with
  * atomic create-if-absent — local, HDFS; object stores need their
  * conditional-put shim):
  *  - `_FENCE` — a monotonic counter of issued leases, never deleted.
  *    [[acquire]] bumps it BEFORE creating the lease (reserve-then-
  *    lock): a token is burned even when the lease create loses the
  *    race, so a resurrected zombie writer can never re-read an
  *    un-advanced fence and mint its usurper's token.
  *  - `_LEASE` — exists ⇔ held; content `token nonce owner hbMs`.
  *    Created with overwrite=false (the atomic mutual exclusion),
  *    deleted on release. The NONCE (a per-acquire UUID) is the
  *    lease's true identity: [[check]]/[[release]] compare token AND
  *    nonce, so even a pathological token collision (a fence write
  *    lost under a machine-level stall and replayed late) cannot let
  *    two writers both pass their commit-point check.
  *  - HEARTBEAT: [[withLease]] renews the lease timestamp on a
  *    `ttlMs / 3` cadence from a daemon thread, so STALENESS MEANS
  *    SILENCE, not elapsed time — an hours-long retrain under the
  *    15-minute default ttl is never legally usurped while its holder
  *    is alive; a crashed holder stops heartbeating and is taken over
  *    after one ttl of quiet.
  *  - STALE TAKEOVER: an acquirer finding a lease whose last
  *    heartbeat is older than `ttlMs` deletes it and retries ONCE
  *    (two concurrent takeovers then race on the create, one loses —
  *    correctness never depends on the ttl being right, only
  *    liveness).
  *  - FENCE CHECK: [[check]] re-reads `_LEASE` and requires it still
  *    carries the caller's (token, nonce) — called immediately before
  *    a mutation's commit point, so a writer that stalled past its
  *    ttl and lost a takeover aborts BEFORE publishing over the
  *    usurper's work (the Chubby/ZooKeeper fencing rule).
  *
  * The fence counter doubles as the observability surface: q202's
  * WarehouseStats reports it (`fence_token`) and the oracle replays it
  * from the `_FENCE` text file directly.
  */
object WriterLease {

  final case class Lease(dir: String, token: Long, nonce: String,
                         owner: String)

  /** Default staleness horizon: a writer SILENT (no heartbeat) for 15
    * minutes is presumed dead. Long mutations stay safe under it —
    * the holder heartbeats until it releases or dies.
    */
  val DefaultTtlMs: Long = 15L * 60 * 1000

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The lock directory of a warehouse — a SIBLING of the root (see
    * the object doc for why it must live outside the swapped tree).
    */
  def lockDir(dir: String): String = s"${dir.stripSuffix("/")}.__lock"

  private def leasePath(dir: String) = new Path(s"${lockDir(dir)}/_LEASE")
  private def fencePath(dir: String) = new Path(s"${lockDir(dir)}/_FENCE")

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

  /** Parsed `_LEASE` fields: (token, nonce, owner, heartbeatMs); None
    * when absent or unreadable (a torn write mid-create).
    */
  private def readLease(spark: SparkSession,
                        dir: String): Option[(Long, String, String, Long)] =
    readSmall(spark, leasePath(dir)).flatMap { s =>
      s.split(" ", 4) match {
        case Array(t, n, o, hb) =>
          try Some((t.toLong, n, o, hb.toLong))
          catch { case _: NumberFormatException => None }
        case _ => None
      }
    }

  /** The last issued fencing token (0 = never leased — a fresh or
    * pre-lease warehouse).
    */
  def fenceToken(spark: SparkSession, dir: String): Long =
    readSmall(spark, fencePath(dir)).map(_.toLong).getOrElse(0L)

  /** Whether a (possibly stale) lease file currently exists. */
  def held(spark: SparkSession, dir: String): Boolean =
    fs(spark, leasePath(dir)).exists(leasePath(dir))

  /** Whether a LIVE writer holds the lease right now: a lease file
    * whose last heartbeat is within `ttlMs`. This is what read paths
    * gate their crash heals on — remnants under a live lease are a
    * writer's in-flight state, not a crash. An unreadable lease (torn
    * mid-create — the writer is alive by definition) reads as live.
    */
  def liveHolder(spark: SparkSession, dir: String,
                 ttlMs: Long = DefaultTtlMs): Boolean =
    readLease(spark, dir) match {
      case Some((_, _, _, hb)) => System.currentTimeMillis() - hb <= ttlMs
      case None => held(spark, dir) // present but unreadable: live
    }

  /** Acquire the warehouse's writer lease or throw. One stale-lease
    * takeover retry; a LIVE holder is refused loudly with its
    * identity.
    */
  def acquire(spark: SparkSession, dir: String, owner: String,
              ttlMs: Long = DefaultTtlMs): Lease = {
    val lock = new Path(lockDir(dir))
    val f = fs(spark, lock)
    if (!f.exists(lock)) f.mkdirs(lock)
    def refuse(tok: String, own: String, ageMs: Long): Nothing =
      throw new IllegalStateException(
        s"writer lease on $dir is held by '$own' (token $tok, " +
          s"heartbeat age ${ageMs / 1000}s ≤ ttl ${ttlMs / 1000}s) " +
          "— refusing a second concurrent mutator; wait, or raise " +
          "ttlMs if the holder is known dead")
    def attempt(retriesLeft: Int): Lease = readLease(spark, dir) match {
      case Some((t, _, o, hb)) =>
        // a present lease is examined BEFORE burning a token, so a
        // refused acquire leaves the fence untouched
        val ageMs = System.currentTimeMillis() - hb
        if (ageMs > ttlMs && retriesLeft > 0) {
          f.delete(leasePath(dir), false)
          attempt(retriesLeft - 1)
        } else refuse(t.toString, o, ageMs)
      case None if held(spark, dir) =>
        // unreadable (torn) lease: its writer crashed mid-create —
        // treat as stale
        if (retriesLeft > 0) {
          f.delete(leasePath(dir), false)
          attempt(retriesLeft - 1)
        } else refuse("?", "?", Long.MaxValue)
      case None =>
        // RESERVE-THEN-LOCK: burn the token BEFORE the lease exists.
        // A losing acquirer merely wastes a token; a zombie that
        // stalls between this write and the create can never collide
        // with its usurper's token (the usurper reads the already-
        // advanced fence). The nonce makes even a lost-then-replayed
        // fence write harmless for correctness.
        val token = fenceToken(spark, dir) + 1
        writeSmall(spark, fencePath(dir), token.toString, overwrite = true)
        val nonce = java.util.UUID.randomUUID().toString
        try {
          writeSmall(spark, leasePath(dir),
            s"$token $nonce $owner ${System.currentTimeMillis()}",
            overwrite = false)
          Lease(dir, token, nonce, owner)
        } catch {
          case _: java.io.IOException if f.exists(leasePath(dir)) =>
            // lost the create race — re-examine the winner's lease
            // (fresh → refuse loudly; torn/stale → one more pass)
            if (retriesLeft > 0) attempt(retriesLeft - 1)
            else readLease(spark, dir) match {
              case Some((t, _, o, hb)) =>
                refuse(t.toString, o, System.currentTimeMillis() - hb)
              case None => refuse("?", "?", Long.MaxValue)
            }
        }
    }
    attempt(retriesLeft = 1)
  }

  /** Refresh the lease's heartbeat timestamp — only while it is still
    * ours (token AND nonce match). Returns false when the lease was
    * usurped (the holder's next [[check]] then aborts loudly).
    */
  def renew(spark: SparkSession, lease: Lease): Boolean =
    readLease(spark, lease.dir) match {
      case Some((t, n, _, _)) if t == lease.token && n == lease.nonce =>
        writeSmall(spark, leasePath(lease.dir),
          s"${lease.token} ${lease.nonce} ${lease.owner} " +
            s"${System.currentTimeMillis()}", overwrite = true)
        true
      case _ => false
    }

  /** Require the lease is still ours — call immediately before a
    * mutation's commit point (see the object doc's fencing rule).
    * Identity is (token, nonce): a usurper's lease fails the caller
    * even under a token collision.
    */
  def check(spark: SparkSession, lease: Lease): Unit = {
    val cur = readLease(spark, lease.dir)
    require(cur.exists(c => c._1 == lease.token && c._2 == lease.nonce),
      s"fencing token ${lease.token} on ${lease.dir} was superseded " +
        s"(current: ${cur.map(_._1).getOrElse("none")}) — another " +
        "writer took over a stale lease; aborting before the commit " +
        "point")
  }

  /** Release — only our own lease (a usurped zombie must not delete
    * the usurper's lease; token AND nonce must match).
    */
  def release(spark: SparkSession, lease: Lease): Unit = {
    val ours = readLease(spark, lease.dir)
      .exists(c => c._1 == lease.token && c._2 == lease.nonce)
    if (ours)
      fs(spark, leasePath(lease.dir)).delete(leasePath(lease.dir), false)
    ()
  }

  /** Bracket a mutation in acquire/release with a HEARTBEAT daemon:
    * the lease timestamp refreshes every `ttlMs / 3` while the body
    * runs, so a long mutation (hours-scale retrain/compact) is never
    * legally usurped while its holder lives — staleness means
    * heartbeat silence. The body receives the lease for [[check]]
    * calls at its commit points. The lease is released on BOTH
    * success and failure — a thrown mutation leaves crash remnants
    * for the heals, not a dead lease for the ttl.
    */
  def withLease[T](spark: SparkSession, dir: String, owner: String,
                   ttlMs: Long = DefaultTtlMs)(body: Lease => T): T = {
    val lease = acquire(spark, dir, owner, ttlMs)
    val hb = new Thread(() => {
      try {
        var mine = true
        while (mine && !Thread.interrupted()) {
          Thread.sleep(math.max(ttlMs / 3, 50L))
          // a failed renew means we were usurped — stop heartbeating
          // (the body's next check() aborts the mutation loudly)
          mine = renew(spark, lease)
        }
      } catch { case _: InterruptedException => }
    })
    hb.setDaemon(true)
    hb.setName(s"graft-lease-heartbeat-$owner")
    hb.start()
    try body(lease) finally {
      hb.interrupt()
      hb.join(1000)
      release(spark, lease)
    }
  }
}
