package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Maintainer mutual exclusion for the layout-maintenance ops (r17
  * verdict #4): [[Bucketing.compact]], [[Ann.compactIndex]] /
  * `ivfPqCompactIndex`, and [[graft.streaming.Streams.vacuumVersions]]
  * all document a single-maintainer contract, but a contract nobody can
  * check is a race waiting for a second cron entry — two concurrent
  * compacts on one table interleave a drop-and-rewrite. This makes the
  * contract CHECKABLE with the cheapest primitives the stores already
  * give us: a conditional-create lock file (`create(overwrite=false)`
  * is atomic on HDFS and posix-local; on S3 a real deployment swaps in
  * a conditional PUT — same shape) and an atomic rename for takeover.
  *
  * Semantics:
  *  - acquire = create `<scope>` with `overwrite=false`, writing a
  *    UNIQUE holder token (host, pid, nonce); an existing file younger
  *    than `ttlMs` REFUSES LOUDLY ([[MaintenanceLock.HeldException]])
  *    naming the incumbent's token — maintenance is scheduled work; a
  *    collision is a config bug to surface, not a queue to wait in;
  *  - a stale lock (older than `ttlMs` by filesystem mtime — a crashed
  *    maintainer never releases) is TAKEN OVER by atomically RENAMING
  *    it aside (exactly one contender's rename of the same source can
  *    succeed — unlike delete-then-create, where a second contender's
  *    delete can land on the WINNER's fresh lock) and then re-running
  *    the conditional create; losing any step of the takeover refuses;
  *  - release = delete ONLY IF the file still carries our token, in
  *    `finally` — an op that THROWS releases too (its own recovery
  *    breadcrumbs describe the on-disk state), but a maintainer that
  *    overran its TTL and was legitimately taken over must NOT delete
  *    its successor's lock (the token mismatch detects that; it is
  *    logged loudly and left in place).
  *
  * TTL guidance: set it comfortably above the op's worst runtime (the
  * default is an hour — compaction ≈ one fragmented query, vacuum is a
  * listing plus deletes); a too-short TTL re-admits the race the lock
  * exists to close, a too-long one delays crash recovery by the excess.
  */
object MaintenanceLock {

  /** A younger-than-TTL lock is held by a live maintainer — the caller
    * decides whether that is fatal (a second cron entry: yes) or a
    * skip-this-cycle (a streaming sink's own maintenance cadence after
    * a kill −9 left the previous cycle's lock: retention is
    * best-effort per cadence, the stream must keep committing batches).
    */
  final class HeldException(msg: String) extends IllegalStateException(msg)

  /** Run `body` holding the lock file at `lockPath`. */
  def withLock[A](fs: FileSystem, lockPath: Path,
      ttlMs: Long = 3600000L)(body: => A): A = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    val token = s"${java.net.InetAddress.getLocalHost.getHostName}," +
      s"pid=${ProcessHandle.current().pid()}," +
      s"nonce=${java.util.UUID.randomUUID()}"
    acquire(fs, lockPath, ttlMs, token)
    try body
    finally release(fs, lockPath, token)
  }

  private def readToken(fs: FileSystem, lockPath: Path): Option[String] =
    try {
      val in = fs.open(lockPath)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  private def release(fs: FileSystem, lockPath: Path, token: String): Unit =
    readToken(fs, lockPath) match {
      case Some(t) if t == token => fs.delete(lockPath, false)
      case Some(other) =>
        // we overran our TTL and a successor took over — deleting now
        // would strip THEIR mutual exclusion; leave it, say so loudly
        System.err.println(s"[maintenance-lock] NOT releasing $lockPath: " +
          s"held by a successor ($other) — this maintainer overran its TTL")
      case None => () // already gone (nothing to release)
    }

  private def acquire(fs: FileSystem, lockPath: Path, ttlMs: Long,
      token: String): Unit = {
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lockPath, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if fs.exists(lockPath) => false
      }
    if (tryCreate()) return
    // lock exists: stale (crashed maintainer) → atomic-rename takeover,
    // exactly one winner; fresh → refuse
    val st = try Some(fs.getFileStatus(lockPath))
             catch { case _: java.io.FileNotFoundException => None }
    val ageMs = st.map(s => System.currentTimeMillis() - s.getModificationTime)
    if (ageMs.exists(_ > ttlMs)) {
      val aside = new Path(lockPath.getParent,
        lockPath.getName + s".stale.${java.util.UUID.randomUUID()}")
      if (fs.rename(lockPath, aside)) {
        fs.delete(aside, false)
        if (tryCreate()) return
      }
      throw new HeldException(
        s"maintenance lock $lockPath was stale (age ${ageMs.get} ms > ttl " +
          s"$ttlMs ms) but another maintainer won the takeover — refusing")
    }
    if (st.isEmpty && tryCreate()) return // released between create and stat
    val who = readToken(fs, lockPath).getOrElse("<gone>")
    throw new HeldException(
      s"maintenance lock $lockPath is held (holder: $who, age " +
        s"${ageMs.getOrElse(-1L)} ms <= ttl $ttlMs ms) — a second " +
        "maintainer is running; fix the schedule or wait for release")
  }
}
