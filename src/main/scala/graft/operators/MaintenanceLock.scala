package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Maintainer mutual exclusion for the layout-maintenance ops (r17
  * verdict #5): [[Bucketing.compact]], [[Ann.compactIndex]] /
  * `ivfPqCompactIndex`, and [[graft.streaming.Streams.vacuumVersions]]
  * all document a single-maintainer contract, but a contract nobody can
  * check is a race waiting for a second cron entry — two concurrent
  * compacts on one table interleave a drop-and-rewrite. This makes the
  * contract CHECKABLE with the cheapest primitive the stores already
  * give us: a conditional-create lock file (`create(overwrite=false)`
  * is atomic on HDFS and posix-local; on S3 a real deployment swaps in
  * a conditional PUT — same shape).
  *
  * Semantics:
  *  - acquire = create `<scope>` with `overwrite=false`; an existing
  *    file younger than `ttlMs` REFUSES LOUDLY, naming the holder line
  *    the incumbent wrote (host, pid, epoch) — maintenance is scheduled
  *    work; a collision is a config bug to surface, not a queue to wait
  *    in;
  *  - a stale lock (older than `ttlMs` by filesystem mtime — a crashed
  *    maintainer never releases) is TAKEN OVER: exactly one contender
  *    wins the `delete` of the stale file (delete of a vanished path
  *    returns false) and then re-runs conditional create, so takeover
  *    keeps the mutual-exclusion guarantee;
  *  - release = delete, in `finally` — an op that THROWS releases too
  *    (its own recovery breadcrumbs describe the on-disk state; holding
  *    the lock would only block the re-run the breadcrumb asks for).
  *
  * TTL guidance: set it comfortably above the op's worst runtime (the
  * default is an hour — compaction ≈ one fragmented query, vacuum is a
  * listing plus deletes); a too-short TTL re-admits the race the lock
  * exists to close, a too-long one delays crash recovery by the excess.
  */
object MaintenanceLock {

  /** Run `body` holding the lock file at `lockPath`. */
  def withLock[A](fs: FileSystem, lockPath: Path,
      ttlMs: Long = 3600000L)(body: => A): A = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    acquire(fs, lockPath, ttlMs)
    try body
    finally fs.delete(lockPath, false)
  }

  private def acquire(fs: FileSystem, lockPath: Path, ttlMs: Long): Unit = {
    val holder = s"${java.net.InetAddress.getLocalHost.getHostName}," +
      s"pid=${ProcessHandle.current().pid()},epoch=${System.currentTimeMillis()}"
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lockPath, false)
        try out.write(holder.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if fs.exists(lockPath) => false
      }
    if (tryCreate()) return
    // lock exists: stale (crashed maintainer) → exactly one contender
    // wins the delete and retries the conditional create; fresh → refuse
    val st = try Some(fs.getFileStatus(lockPath))
             catch { case _: java.io.FileNotFoundException => None }
    val ageMs = st.map(s => System.currentTimeMillis() - s.getModificationTime)
    if (ageMs.exists(_ > ttlMs)) {
      if (fs.delete(lockPath, false) && tryCreate()) return
      throw new IllegalStateException(
        s"maintenance lock $lockPath was stale (age ${ageMs.get} ms > ttl " +
          s"$ttlMs ms) but another maintainer won the takeover — refusing")
    }
    if (st.isEmpty && tryCreate()) return // released between create and stat
    val who = st.map { _ =>
      try {
        val in = fs.open(lockPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      } catch { case _: java.io.IOException => "<unreadable>" }
    }.getOrElse("<gone>")
    throw new IllegalStateException(
      s"maintenance lock $lockPath is held (holder: $who, age " +
        s"${ageMs.getOrElse(-1L)} ms <= ttl $ttlMs ms) — a second " +
        "maintainer is running; fix the schedule or wait for release")
  }
}
