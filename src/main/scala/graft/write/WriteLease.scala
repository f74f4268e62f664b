package graft.write

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Cross-process write lease over a lock FILE next to the table directory —
 * the coordination layer the JVM-scoped stripes in [[Writes]] cannot
 * provide (they serialize one engine process; the reference serializes
 * writers through one in-process queue and simply has no second process,
 * `lib/src/core/data_store_impl.dart` write queue). Two healthy engine
 * processes sharing a warehouse now COOPERATE on a table instead of one
 * failing loud on the other's staging debris.
 *
 * Protocol (all public filesystem primitives, no lock service):
 *  - ACQUIRE: atomically create `<table>.lock` (create-if-absent — atomic
 *    on HDFS and on the local FS used in tests) carrying a random owner
 *    token + pid. If present, poll; if its mtime goes older than
 *    `staleMs`, the holder is presumed dead → delete-and-recreate
 *    (takeover). Losers of a takeover race fail the create and keep
 *    polling. Acquisition past `waitMs` throws — the PREDICTABLE failure:
 *    a slow writer queue surfaces as an error, never as a corrupt swap.
 *  - HEARTBEAT: while held, a daemon thread touches the lock's mtime
 *    every `staleMs / 3`, so a long staging write stays held and only a
 *    DEAD process (crash, kill -9) lets its lease expire.
 *  - RELEASE: verify the token still matches (a takeover after a
 *    heartbeat stall longer than `staleMs` is detectable, not silent),
 *    then delete.
 *
 * Consistency contract: writers holding the lease may assume no other
 * LIVE lease-respecting process is inside the staging+swap critical
 * section for this table. `staleMs` must exceed the worst-case heartbeat
 * stall (GC pause, FS hiccup) — a stalled-but-alive holder whose lease is
 * taken over is detected at its release (loud), but its in-flight write
 * may be lost; size `staleMs` generously on contended warehouses.
 */
final class WriteLease private (fs: FileSystem, lock: Path, token: String,
    heartbeatMs: Long) extends AutoCloseable {

  @volatile private var closed = false

  private val beat = new Thread(() => {
    try {
      while (!closed) {
        Thread.sleep(heartbeatMs)
        if (!closed) fs.setTimes(lock, System.currentTimeMillis(), -1)
      }
    } catch {
      case _: InterruptedException => () // release() interrupts: normal exit
      case scala.util.control.NonFatal(e) =>
        // a failed heartbeat cannot corrupt anything — worst case the
        // lease expires and another writer takes over; release() detects
        System.err.println(s"[graft] write-lease heartbeat lost on $lock: $e")
    }
  }, s"graft-write-lease-$token")
  beat.setDaemon(true)
  beat.start()

  /** Release the lease. Loud (IllegalStateException) if the lock was
    * taken over while held — the caller's just-finished write raced a
    * takeover and may be lost; surfacing that beats silence. */
  override def close(): Unit = {
    if (closed) return
    closed = true
    beat.interrupt()
    val current = WriteLease.readToken(fs, lock)
    if (current.contains(token)) { fs.delete(lock, false); () }
    else throw new IllegalStateException(
      s"write lease on $lock was taken over while held (heartbeat stalled " +
      s"past the stale horizon?) — this writer's last swap may have raced " +
      s"the new holder; verify table state")
  }
}

object WriteLease {

  /** Acquire the lease for `dataPath` (lock file = `dataPath + ".lock"`),
    * waiting up to `waitMs` and treating locks idle past `staleMs` as
    * abandoned. See class doc for the protocol and contract. */
  def acquire(fs: FileSystem, dataPath: String, staleMs: Long = 60000L,
      waitMs: Long = 30000L, pollMs: Long = 100L): WriteLease = {
    require(staleMs > 0 && waitMs >= 0 && pollMs > 0, "lease timings must be positive")
    val lock = new Path(dataPath + ".lock")
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs
    while (true) {
      if (tryCreate(fs, lock, token))
        return new WriteLease(fs, lock, token, math.max(1L, staleMs / 3))
      val mtime =
        try Some(fs.getFileStatus(lock).getModificationTime)
        catch { case _: java.io.FileNotFoundException => None } // freed: retry create
      if (mtime.isEmpty) Thread.sleep(1) // yield briefly; next loop re-creates
      mtime.foreach { m =>
        if (System.currentTimeMillis() - m > staleMs) {
          // presumed-dead holder: take over. Racing takeovers both delete
          // (idempotent); exactly one wins the subsequent create-if-absent.
          System.err.println(s"[graft] taking over stale write lease $lock " +
            s"(idle ${System.currentTimeMillis() - m} ms > $staleMs ms)")
          try fs.delete(lock, false)
          catch { case scala.util.control.NonFatal(_) => () }
        } else if (System.currentTimeMillis() >= deadline)
          throw new IllegalStateException(
            s"could not acquire write lease $lock within $waitMs ms: another " +
            s"process is writing this table (heartbeat ${System.currentTimeMillis() - m} ms " +
            s"ago). Retry later, or raise waitMs; if the holder is known dead, " +
            s"its lease expires after $staleMs ms idle")
        else Thread.sleep(pollMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Atomic create-if-absent carrying the owner token; false if present. */
  private def tryCreate(fs: FileSystem, lock: Path, token: String): Boolean =
    try {
      val out = fs.create(lock, false)
      try out.write((s"$token pid=${ProcessHandle.current().pid()} " +
        s"ts=${System.currentTimeMillis()}\n").getBytes("UTF-8"))
      finally out.close()
      true
    } catch {
      case _: java.io.IOException => false // exists (or transient FS refusal: poll)
    }

  /** First whitespace-delimited field of the lock body, if readable. */
  private[write] def readToken(fs: FileSystem, lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        if (n <= 0) None
        else new String(buf, 0, n, "UTF-8").split("\\s+").headOption
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
}
