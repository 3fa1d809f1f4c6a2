package graft.state

import org.apache.spark.sql.SparkSession

/** Single-writer admission guard (SURVEY §4 "concurrency guard" — the
  * reference's skip_if_running, utils/utils.py:197-231: a flow run is
  * SKIPPED, not queued, when another run of the same flow is active).
  *
  * The lock is a file created with `overwrite = false` — an atomic
  * create-if-absent on HDFS and local filesystems — holding the owner
  * tag. A crashed holder is healed by TTL: a lock older than
  * `ttlMinutes` is presumed dead and taken over. This is the guard the
  * [[StateStore]]/[[graft.lake.Lake]] read-modify-write discipline
  * assumes; every scheduled pipeline body should run inside
  * [[withLock]].
  */
class RunLock(spark: SparkSession, root: String) {
  import org.apache.hadoop.fs.Path

  private def lockPath(key: String) = new Path(s"$root/_locks/$key.lock")
  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True = this caller now holds the lock. False = another run is
    * active (the caller should SKIP, mirroring the reference). */
  def tryAcquire(key: String, owner: String = "run",
                 ttlMinutes: Int = 60): Boolean = {
    val p = lockPath(key)
    val f = fs(p)
    f.mkdirs(p.getParent)
    def create(): Boolean =
      try {
        val out = f.create(p, false) // atomic create-if-absent
        out.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (create()) true
    else {
      // stale takeover: a holder that died leaves its lock behind
      val stale = try {
        f.getFileStatus(p).getModificationTime <
          System.currentTimeMillis() - ttlMinutes * 60000L
      } catch { case _: java.io.IOException => false } // vanished = retry fresh
      if (stale) f.delete(p, false)
      stale && create()
    }
  }

  def release(key: String): Unit = {
    val p = lockPath(key)
    fs(p).delete(p, false)
  }

  /** Run `body` under the lock; None = skipped because a run is active.
    * The lock is released even when the body throws — but NOT when the
    * JVM dies, which is what the TTL takeover is for. */
  def withLock[T](key: String, owner: String = "run",
                  ttlMinutes: Int = 60)(body: => T): Option[T] =
    if (!tryAcquire(key, owner, ttlMinutes)) None
    else try Some(body) finally release(key)
}
