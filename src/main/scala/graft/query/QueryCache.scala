package graft.query

/**
 * Budgeted LRU query-RESULT cache — the engine's counterpart of the
 * reference's TreeCache (query_executor.dart:42-49: 50 MB max default,
 * results keyed by query signature, invalidated on table writes).
 *
 * Opt-in per chain (`useQueryCache`), exactly like the reference: the
 * default path never pays the lookup. Entries are invalidated by EVERY
 * write that flows through the owning engine (`Graft.notifyWrite` —
 * insert/update/delete/upsert/clear/migration/FK actions), and may carry
 * a TTL. Scope caveat (same as the reference's in-process cache): writes
 * issued through a DIFFERENT engine instance on the same warehouse are
 * invisible — share one engine (or skip the cache) in that topology.
 *
 * Driver-memory safety: the budget bounds RESULT bytes, and results are
 * already bounded by the default-limit contract (limit 1000 / offset cap
 * / cursor paging), so the cache cannot hold unbounded collects. An entry
 * larger than the whole budget is not cached at all.
 */
final class QueryCache(@volatile private var maxBytes: Long = 50L << 20) {

  private final case class Entry(result: QueryResult, bytes: Long,
      tables: Set[String], expiresAt: Option[Long])

  // access-order LinkedHashMap = LRU; all access synchronized (driver-side
  // structure, contention is human-scale)
  private val entries = new java.util.LinkedHashMap[String, Entry](64, 0.75f, true)
  private var usedBytes = 0L
  private var hitCount = 0L
  private var missCount = 0L
  // bumped by every invalidate/clear: a result computed from a snapshot
  // taken BEFORE a write must never be inserted AFTER the write's
  // invalidation ran (the insert would be permanently stale)
  private var epoch = 0L

  /** Reference `maxCacheSize`-style knob (TreeCache thresholds). */
  def setBudget(bytes: Long): Unit = synchronized {
    maxBytes = bytes
    evictToBudget()
  }

  /** Cache-through: return the cached result for `key` or run `exec`,
    * store, and return it. `tables` drive write invalidation. */
  def getOrRun(key: String, tables: Set[String], ttlMs: Option[Long])
      (exec: => QueryResult): QueryResult = {
    val now = System.currentTimeMillis()
    val (cached, epochBefore) = synchronized {
      val e = entries.get(key)
      val c =
        if (e == null) None
        else if (e.expiresAt.exists(_ <= now)) {
          usedBytes -= e.bytes; entries.remove(key); None
        } else Some(e.result)
      (c, epoch)
    }
    cached match {
      case Some(r) => synchronized { hitCount += 1 }; r
      case None =>
        val r = exec // outside the lock: a Spark job runs here
        val bytes = estimateBytes(r)
        synchronized {
          missCount += 1
          // epoch check: if ANY invalidation ran while exec was reading,
          // this result may predate the write — don't cache it
          if (epoch == epochBefore && bytes <= maxBytes && !entries.containsKey(key)) {
            entries.put(key,
              Entry(r, bytes, tables, ttlMs.map(now + _)))
            usedBytes += bytes
            evictToBudget()
          }
        }
        r
    }
  }

  /** Drop every entry whose query touches `table` (called by the engine
    * on each write, BEFORE readers can observe the new data). */
  def invalidate(table: String): Unit = synchronized {
    epoch += 1
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.tables.contains(table)) {
        usedBytes -= e.getValue.bytes
        it.remove()
      }
    }
  }

  def clear(): Unit = synchronized {
    epoch += 1
    entries.clear(); usedBytes = 0L
  }

  /** (entries, bytes, hits, misses) — diagnostics surface. */
  def stats: (Int, Long, Long, Long) = synchronized {
    (entries.size(), usedBytes, hitCount, missCount)
  }

  private def evictToBudget(): Unit = {
    val it = entries.entrySet().iterator() // access order: LRU first
    while (usedBytes > maxBytes && it.hasNext) {
      val e = it.next()
      usedBytes -= e.getValue.bytes
      it.remove()
    }
  }

  /** Conservative per-row estimate: object headers + RECURSIVE per-value
    * cost (strings by length, collections and nested rows by element) —
    * same spirit as the reference's size accounting. Recursion matters:
    * a flat 16 B for an array<string> chunk column would let gigabytes
    * "fit" a 50 MB budget. */
  private def valueBytes(v: Any): Long = v match {
    case null => 8L
    case s: String => 48L + 2L * s.length
    case a: Array[_] => 48L + a.iterator.map(valueBytes).sum
    case s: Seq[_] => 48L + s.iterator.map(valueBytes).sum
    case m: scala.collection.Map[_, _] =>
      48L + m.iterator.map { case (k, x) => valueBytes(k) + valueBytes(x) }.sum
    case r: org.apache.spark.sql.Row =>
      48L + (0 until r.length).iterator.map(i => valueBytes(r.get(i))).sum
    case _ => 16L
  }

  private def estimateBytes(r: QueryResult): Long =
    r.data.iterator.map(row => 48L +
      (0 until row.length).iterator.map(i => valueBytes(row.get(i))).sum).sum
}
