package graft.state

import org.apache.spark.sql.SparkSession

/** Single-writer admission guard (SURVEY §4 "concurrency guard" — the
  * reference's skip_if_running, utils/utils.py:197-231: a flow run is
  * SKIPPED, not queued, when another run of the same flow is active).
  *
  * The lock is a file created with `overwrite = false` — an atomic
  * create-if-absent on HDFS and local filesystems — holding this
  * holder's unique token. A crashed holder is healed by TTL, and the
  * takeover path is race-safe: contenders RENAME the stale file to a
  * private name first (rename is atomic — exactly one contender wins)
  * instead of check-then-delete, so two takeovers can never both
  * acquire. Release verifies the stored token, so a holder that
  * outlived its TTL cannot delete its successor's lock.
  *
  * This is the guard the [[StateStore]]/[[graft.lake.Lake]]
  * read-modify-write discipline (including [[graft.lake.Lake.compact]])
  * assumes; every scheduled pipeline body should run inside
  * [[withLock]].
  */
class RunLock(spark: SparkSession, root: String) {
  import org.apache.hadoop.fs.Path

  private val tokens = scala.collection.mutable.Map[String, String]()

  private def lockPath(key: String) = new Path(s"$root/_locks/$key.lock")
  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The token currently stored on the lock file; None when the file
    * is unreadable (vanished, mid-takeover rename). */
  private def storedToken(f: org.apache.hadoop.fs.FileSystem,
                          p: Path): Option[String] =
    try {
      val in = f.open(p)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bos.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** True = this caller now holds the lock. False = another run is
    * active (the caller should SKIP, mirroring the reference). */
  def tryAcquire(key: String, owner: String = "run",
                 ttlMinutes: Int = 60): Boolean = RunLock.gate.synchronized {
    val p = lockPath(key)
    val f = fs(p)
    f.mkdirs(p.getParent)
    val token = s"$owner:${java.util.UUID.randomUUID()}"
    def create(): Boolean =
      try {
        val out = f.create(p, false) // atomic create-if-absent
        try {
          out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.close()
          tokens(key) = token
          true
        } catch { case _: java.io.IOException =>
          // the file EXISTS but its content never landed — remove the
          // orphan or every later acquire fails until the TTL
          try f.delete(p, false) catch { case _: java.io.IOException => () }
          false
        }
      } catch { case _: java.io.IOException => false } // already held
    if (create()) true
    else {
      val staleMtime = try {
        Some(f.getFileStatus(p).getModificationTime)
          .filter(_ < System.currentTimeMillis() - ttlMinutes * 60000L)
      } catch { case _: java.io.IOException => None } // vanished: not ours to claim
      // takeover: rename the stale file to a private name (atomic —
      // exactly one rename of a given file succeeds), then VERIFY the
      // claimed file is the one whose staleness we observed: a loser
      // whose rename landed on the winner's fresh lock instead puts it
      // back and skips. (A restore that itself races a third fresh
      // acquire is a ms-scale triple race we accept, as the reference's
      // Redis guard does.)
      staleMtime.exists { mt =>
        val claimed = new Path(s"$root/_locks/$key.takeover-${java.util.UUID.randomUUID()}")
        f.rename(p, claimed) && {
          val isOurs = try
            f.getFileStatus(claimed).getModificationTime == mt
          catch { case _: java.io.IOException => false }
          if (isOurs) { f.delete(claimed, false); create() }
          else { f.rename(claimed, p); false } // stole a fresh lock — restore
        }
      }
    }
  }

  /** Release only a lock THIS instance holds (token-checked): a holder
    * past its TTL whose lock was taken over must not delete the
    * successor's lock. */
  def release(key: String): Unit = RunLock.gate.synchronized {
    val p = lockPath(key)
    val f = fs(p)
    tokens.remove(key).foreach { token =>
      if (storedToken(f, p).contains(token)) f.delete(p, false)
    }
  }

  /** True iff THIS instance currently holds `key`: the token we minted
    * is still the one stored on the lock file. False after a TTL
    * takeover (the file holds the successor's token) or if the file
    * vanished — the two ways a holder silently stops being one. */
  def isHeldByMe(key: String): Boolean = RunLock.gate.synchronized {
    tokens.get(key).exists { token =>
      val p = lockPath(key)
      storedToken(fs(p), p).contains(token)
    }
  }

  /** Re-stamp a held lock's mtime so the TTL window measures IDLE time,
    * not total hold time: a long-running holder (a multi-day backfill)
    * that never refreshes would be judged stale by a contender's TTL
    * mid-run and taken over while actively committing — the takeover
    * the guard then catches, but only at its next check. Call between
    * units of work; false = we no longer hold the key (refresh cannot
    * resurrect a lost lock) OR the store could not extend the TTL.
    *
    * setTimes is a silent no-op on some stores (object stores expose
    * immutable mtimes), so the stamp is VERIFIED by reading the mtime
    * back; when it did not advance, the token file is REWRITTEN with
    * its own content — a content write always moves mtime, and on
    * object stores a PUT is an atomic replace. Returning true on a
    * frozen mtime would be the exact failure refresh exists to fix: a
    * long backfill believing itself protected while contenders see an
    * ever-staler lock. The final isHeldByMe closes the check→stamp
    * TOCTOU: a takeover landing between them means our stamp touched
    * the SUCCESSOR's lock (harmless to it — fresher mtime only delays
    * its own takeover horizon) and we must report the loss. */
  def refresh(key: String): Boolean = RunLock.gate.synchronized {
    isHeldByMe(key) && {
      val p = lockPath(key)
      val f = fs(p)
      try {
        val before = f.getFileStatus(p).getModificationTime
        val now = System.currentTimeMillis()
        try f.setTimes(p, now, -1L)
        catch { case _: java.io.IOException => () } // fall through to rewrite
        var after = f.getFileStatus(p).getModificationTime
        if (after == before && before < now) {
          // setTimes no-opped (or threw): bump mtime by rewriting the
          // token. Crash mid-write leaves a content-less lock nobody
          // owns until TTL — the same exposure as any holder crash.
          // Re-read IMMEDIATELY before the overwrite: a TTL takeover
          // landing after the leading isHeldByMe would otherwise be
          // ERASED by create(overwrite = true) — the file would hold
          // OUR token again, the trailing isHeldByMe would match, and
          // BOTH holders would proceed. A mismatch means the lock is
          // lost: skip the rewrite so the successor's token survives
          // and the trailing check reports the loss.
          tokens.get(key).foreach { token =>
            if (storedToken(f, p).contains(token)) {
              val out = f.create(p, true)
              try out.write(
                token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
            }
          }
          after = f.getFileStatus(p).getModificationTime
        }
        // before >= now: the lock was stamped within this clock tick —
        // already maximally fresh, nothing to extend
        after > before || before >= now
      } catch { case _: java.io.IOException => false }
    } && isHeldByMe(key)
  }

  /** Runtime form of the "caller holds the dataset's RunLock"
    * Scaladoc contracts: state-mutation paths whose correctness
    * assumes single-writer call this instead of trusting convention.
    * Throws (rather than skipping) because proceeding without the
    * lock is a correctness bug at the CALL SITE, not a concurrent-run
    * race to yield to. */
  def assertHeld(key: String): Unit =
    if (!isHeldByMe(key))
      throw new IllegalStateException(
        s"single-writer violation: this process does not hold RunLock " +
          s"'$key' (never acquired, released, or TTL-taken-over) — the " +
          "state mutation it guards must run inside withLock")

  /** Run `body` under the lock; None = skipped because a run is active.
    * The lock is released even when the body throws — but NOT when the
    * JVM dies, which is what the TTL takeover is for. */
  def withLock[T](key: String, owner: String = "run",
                  ttlMinutes: Int = 60)(body: => T): Option[T] =
    if (!tryAcquire(key, owner, ttlMinutes)) None
    else try Some(body) finally release(key)
}

object RunLock {
  /** JVM-wide gate for the acquire/release critical sections.
    * Cross-PROCESS exclusion comes from HDFS's server-side atomic
    * create-if-absent; local filesystems implement create(overwrite =
    * false) as check-then-act, so same-JVM contenders (local[*], tests)
    * must serialize here for the primitive to hold everywhere. */
  private[state] val gate = new Object
}
