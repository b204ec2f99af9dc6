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
  *  - `_LEASE` — exists ⇔ held; content `token nonce owner hbMs
  *    ttlMs` (a pre-round-14 four-field lease reads with the default
  *    ttl). Created with overwrite=false (the atomic mutual
  *    exclusion), deleted on release. The NONCE (a per-acquire UUID)
  *    is the lease's true identity: [[check]]/[[release]] compare
  *    token AND nonce, so even a pathological token collision (a
  *    fence write lost under a machine-level stall and replayed late)
  *    cannot let two writers both pass their commit-point check.
  *    Recording the HOLDER's ttl in the file lets [[liveHolder]] and
  *    [[renew]] judge staleness by the cadence the holder actually
  *    heartbeats at — a holder acquired with a long ttl is not
  *    falsely presumed dead by a reader judging with the default.
  *    The file is NOT staged through a rename: on POSIX rename(2)
  *    OVERWRITES an existing target, so a tmp+rename create would
  *    silently break the create-if-absent exclusion the whole
  *    protocol rests on. The torn-create window (file visible,
  *    content not yet written) is instead handled by AGE: an
  *    unreadable lease younger than the ttl (by file mtime) is a
  *    live writer mid-create — refused, never deleted; one older
  *    than the ttl is a writer that crashed inside the create and
  *    is taken over like any other stale lease. [[acquire]] and
  *    [[liveHolder]] share this rule, so "unreadable" means the
  *    same thing on both the write and the read path.
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

  /** Parsed `_LEASE` fields: (token, nonce, owner, heartbeatMs,
    * ttlMs); None when absent or unreadable (a torn write
    * mid-create). A four-field pre-round-14 lease reads with the
    * default ttl.
    */
  private def readLease(spark: SparkSession, dir: String)
      : Option[(Long, String, String, Long, Long)] =
    readSmall(spark, leasePath(dir)).flatMap { s =>
      s.split(" ", 5) match {
        case Array(t, n, o, hb) =>
          try Some((t.toLong, n, o, hb.toLong, DefaultTtlMs))
          catch { case _: NumberFormatException => None }
        case Array(t, n, o, hb, ttl) =>
          try Some((t.toLong, n, o, hb.toLong, ttl.toLong))
          catch { case _: NumberFormatException => None }
        case _ => None
      }
    }

  /** Age of the `_LEASE` FILE by filesystem mtime — the staleness
    * judgment for a lease whose content is unreadable (torn
    * mid-create, so there is no heartbeat field to read). None when
    * the file vanished between the caller's existence check and the
    * stat.
    */
  private def leaseFileAgeMs(spark: SparkSession,
                             dir: String): Option[Long] = {
    val p = leasePath(dir)
    val f = fs(spark, p)
    try Some(System.currentTimeMillis() -
      f.getFileStatus(p).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }
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
    * whose last heartbeat is within the ttl the HOLDER recorded at
    * acquire (`ttlMs` only judges pre-round-14 four-field leases,
    * which recorded none). This is what read paths gate their crash
    * heals on — remnants under a live lease are a writer's in-flight
    * state, not a crash. An unreadable lease (torn mid-create) reads
    * as live while its file mtime is within the ttl — the same
    * age rule [[acquire]] applies, so the two paths agree on what a
    * torn lease means.
    */
  def liveHolder(spark: SparkSession, dir: String,
                 ttlMs: Long = DefaultTtlMs): Boolean =
    readLease(spark, dir) match {
      case Some((_, _, _, hb, recTtl)) =>
        System.currentTimeMillis() - hb <= recTtl
      case None =>
        held(spark, dir) &&
          leaseFileAgeMs(spark, dir).forall(_ <= ttlMs)
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
      case Some((t, _, o, hb, _)) =>
        // a present lease is examined BEFORE burning a token, so a
        // refused acquire leaves the fence untouched
        val ageMs = System.currentTimeMillis() - hb
        if (ageMs > ttlMs && retriesLeft > 0) {
          f.delete(leasePath(dir), false)
          attempt(retriesLeft - 1)
        } else refuse(t.toString, o, ageMs)
      case None if held(spark, dir) =>
        // unreadable (torn) lease: judged by FILE age, never deleted
        // young — a live acquirer's lease is momentarily empty
        // between its create and its content write, and deleting it
        // there would hand BOTH writers a lease (the exact mutual-
        // exclusion failure this module exists to prevent). Older
        // than the ttl ⇒ its writer crashed inside the create; take
        // over like any stale lease.
        val ageMs = leaseFileAgeMs(spark, dir).getOrElse(Long.MaxValue)
        if (ageMs > ttlMs && retriesLeft > 0) {
          f.delete(leasePath(dir), false)
          attempt(retriesLeft - 1)
        } else refuse("? (torn mid-create)", "?", ageMs)
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
            s"$token $nonce $owner ${System.currentTimeMillis()} $ttlMs",
            overwrite = false)
          Lease(dir, token, nonce, owner)
        } catch {
          case _: java.io.IOException if f.exists(leasePath(dir)) =>
            // lost the create race — re-examine the winner's lease
            // (fresh → refuse loudly; torn/stale → one more pass)
            if (retriesLeft > 0) attempt(retriesLeft - 1)
            else readLease(spark, dir) match {
              case Some((t, _, o, hb, _)) =>
                refuse(t.toString, o, System.currentTimeMillis() - hb)
              case None => refuse("?", "?", Long.MaxValue)
            }
        }
    }
    attempt(retriesLeft = 1)
  }

  /** Refresh the lease's heartbeat timestamp — only while it is still
    * ours (token AND nonce match) AND not already legally usurpable.
    * Returns false when the lease was usurped, or when renewing would
    * RESURRECT a zombie (the holder's next [[check]] then aborts
    * loudly).
    *
    * The raw read-then-overwrite had a resurrection window: a holder
    * whose heartbeat thread stalled silently past the ttl could have
    * an in-flight renew's read match BEFORE a takeover and its write
    * land AFTER — clobbering the usurper's fresh `_LEASE` with the
    * zombie's identity while the usurper sat between its commit
    * check and its publish rename, letting BOTH writers publish. Two
    * guards close it:
    *  - STALENESS: if the lease's recorded heartbeat is already older
    *    than its ttl, the lease is legally usurpable RIGHT NOW — a
    *    takeover may be in flight — so renew refuses rather than
    *    writing a fresh timestamp over it.
    *  - ELAPSED BOUND: if this renew itself took longer than ttl/3
    *    between its read and the end of its write (a stall INSIDE the
    *    window), the write may have clobbered an interleaved
    *    usurper's lease — renew WITHDRAWS (deletes the lease if it
    *    still carries our identity) and returns false. Both parties'
    *    next check then fails and neither publishes: a liveness
    *    hiccup in a pathological window, never a double publish.
    */
  def renew(spark: SparkSession, lease: Lease): Boolean = {
    val t0 = System.currentTimeMillis()
    readLease(spark, lease.dir) match {
      case Some((t, n, _, hb, ttl))
          if t == lease.token && n == lease.nonce =>
        if (t0 - hb > ttl) false // legally usurpable — don't resurrect
        else {
          writeSmall(spark, leasePath(lease.dir),
            s"${lease.token} ${lease.nonce} ${lease.owner} " +
              s"${System.currentTimeMillis()} $ttl", overwrite = true)
          if (System.currentTimeMillis() - t0 > math.max(ttl / 3, 50L)) {
            // stalled inside the renew — withdraw instead of trusting
            // a write that may have landed over a usurper's lease
            val ours = readLease(spark, lease.dir)
              .exists(c => c._1 == lease.token && c._2 == lease.nonce)
            if (ours)
              fs(spark, leasePath(lease.dir))
                .delete(leasePath(lease.dir), false)
            false
          } else true
        }
      case _ => false
    }
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
      // lastBeat = the last instant the lease is KNOWN fresh (acquire
      // stamped it; each successful renew re-stamps it)
      var lastBeat = System.currentTimeMillis()
      var mine = true
      while (mine && !Thread.currentThread().isInterrupted) {
        try {
          Thread.sleep(math.max(ttlMs / 3, 50L))
          if (System.currentTimeMillis() - lastBeat > ttlMs)
            // the sleep overran the ttl (GC pause, machine stall) —
            // the lease is legally usurpable; STOP renewing rather
            // than resurrect it (renew's own staleness guard would
            // also refuse — this avoids even attempting the write)
            mine = false
          else if (renew(spark, lease)) lastBeat = System.currentTimeMillis()
          // a failed renew means usurped/withdrawn — stop heartbeating
          // (the body's next check() aborts the mutation loudly)
          else mine = false
        } catch {
          case _: InterruptedException => mine = false
          case scala.util.control.NonFatal(_) =>
            // a TRANSIENT failure (e.g. an IOException from the
            // filesystem) must not silently kill the daemon — a
            // healthy hours-long holder would stop heartbeating and
            // become legally usurpable mid-mutation. Keep beating;
            // if the outage persists past the ttl, the overrun check
            // above (and renew's staleness guard) stop the loop
            // without a resurrecting write.
        }
      }
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
