package graft.schema

/**
 * Primary-key generator strategies (reference:
 * /root/reference/lib/src/model/id_generator.dart — SequentialIdGenerator
 * :31, TimeBasedIdGenerator :255-313 with Base62Encoder :255-310;
 * strategies declared at table_schema.dart:1917-1932). PKs are always TEXT
 * (table_schema.dart:2032-2036) and numeric-string generated forms sort
 * length-first (value_matcher.dart:121-148).
 *
 * The reference wraps these in ID pools + isolate batch generation — pure
 * throughput machinery for an embedded OLTP store. Here generation happens
 * per insert batch: ids are a deterministic function of (base, batch row
 * index), so a 10M-row batch can also assign them executor-side from a
 * partition offset without coordination.
 *
 * Value shapes (non-distributed node, id_generator.dart:1260-1295):
 *   timestampBased = (seconds since 1984-01-01 UTC) * 10^5 + seq
 *   datePrefixed   = yyyyMMdd * 10^5 + seq
 *   shortCode      = Base62(timestampBased value)
 *   sequential     = max(existing numeric pk) + 1 + seq
 * Sequence overflow past 99999 rolls arithmetically into the next
 * second/day — same carry the reference's maxSequence reset produces.
 */
object IdGen {

  /** Seconds since the reference's logical epoch (1984-01-01T00:00:00Z,
    * id_generator.dart:332). */
  val EpochStartSeconds = 441763200L

  object Base62 {
    private val Charset =
      "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

    def encode(value0: BigInt): String = {
      require(value0 >= 0, "Base62 encoding does not support negative numbers")
      if (value0 == 0) "0"
      else {
        var value = value0
        val sb = new StringBuilder
        while (value > 0) {
          sb.insert(0, Charset((value % 62).toInt))
          value /= 62
        }
        sb.toString
      }
    }

    def decode(s: String): BigInt =
      s.foldLeft(BigInt(0)) { (acc, ch) =>
        val d = Charset.indexOf(ch)
        require(d >= 0, s"Illegal Base62 character: $ch")
        acc * 62 + d
      }
  }

  // Per-table sequence state for the time-based strategies — the reference
  // keeps an in-process sequence map so batches landing in the same
  // second/day don't restart at 0 and collide (id_generator.dart:318-321).
  // Key: (strategy, table); value: the absolute NEXT FREE id value. Storing
  // the absolute bound (not (base, seq)) makes large reservations safe: a
  // 10M-row block spans ~100 seconds of timestampBased id space, and a
  // later batch whose fresh time base falls INSIDE a prior block must
  // continue from the block end, not restart at seq 0.
  private val seqState =
    new java.util.concurrent.ConcurrentHashMap[(String, String), BigInt]()

  /** Forget the in-process sequence state for a table (every strategy).
    * Called on truncate/drop: like SQL TRUNCATE restarting an identity
    * column, a cleared table's sequence starts over from the (now-empty)
    * stored max instead of continuing past the pre-truncation bound. */
  def reset(table: String): Unit = {
    val it = seqState.keySet().iterator()
    while (it.hasNext) if (it.next()._2 == table) it.remove()
  }

  /** Forget every table scope under a path prefix — deleteSpace /
    * deleteDatabase must not leave stale sequences for recreated tables. */
  def resetPrefix(prefix: String): Unit = {
    val it = seqState.keySet().iterator()
    while (it.hasNext) if (it.next()._2.startsWith(prefix)) it.remove()
  }

  /** Move a table's sequence state to a new scope — renameTable keeps the
    * sequence (the data moved with it), otherwise a same-second insert
    * after the rename could reserve an already-used id block. */
  def renameScope(from: String, to: String): Unit = {
    val it = seqState.entrySet().iterator()
    var moves = List.empty[((String, String), BigInt)]
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._2 == from) { moves ::= ((e.getKey._1, to), e.getValue); it.remove() }
    }
    moves.foreach { case (k, v) =>
      seqState.merge(k, v, (a, b) => a.max(b))
    }
  }

  /** Reserve a contiguous id block for `table` and return its first value:
    * id(i) = encode(start + i) for i in [0, count). The executor-side bulk
    * path (`Graft.insertFrom`) turns this into a pure Column expression
    * over the partition-offset row index — ids are a deterministic function
    * of (reserved base, row index), so no coordination beyond this one
    * driver-side reservation (the reference's isolate ID pools,
    * id_generator.dart:313-321, serve the same purpose). */
  def reserveFor(table: String, strategy: PkStrategy, count: Long,
      existingMax: Long = 0L, nowMs: Long = System.currentTimeMillis()): BigInt =
    strategy match {
      case PkStrategy.None =>
        throw new IllegalArgumentException(
          "PkStrategy.None does not generate ids — the caller must supply them")
      case _ =>
        val key = (strategy.toString, table)
        // Sequential reserves through seqState like the time-based
        // strategies: the stored-max re-read cannot see a sibling batch's
        // uncommitted rows, so two concurrent reservations off the same
        // existingMax would hand out identical blocks without it
        val base = strategy match {
          case PkStrategy.Sequential => BigInt(existingMax + 1)
          case PkStrategy.DatePrefixed =>
            BigInt(java.time.format.DateTimeFormatter.BASIC_ISO_DATE
              .format(java.time.Instant.ofEpochMilli(nowMs)
                .atZone(java.time.ZoneOffset.UTC).toLocalDate)) * 100000
          case _ => BigInt(nowMs / 1000 - EpochStartSeconds) * 100000
        }
        var start: BigInt = base
        seqState.compute(key, (_, prev) => {
          start = if (prev == null) base else base.max(prev)
          start + count
        })
        start
    }

  /** The value→string encoding of a strategy (ShortCode is Base62). */
  def encoderFor(strategy: PkStrategy): BigInt => String =
    if (strategy == PkStrategy.ShortCode) Base62.encode else _.toString

  /** Generate `count` ids for `table`, continuing the in-process sequence
    * when consecutive batches share the same time base. */
  def generateFor(table: String, strategy: PkStrategy, count: Int,
      existingMax: Long = 0L, nowMs: Long = System.currentTimeMillis()): Seq[String] =
    strategy match {
      case PkStrategy.None =>
        generate(strategy, count, existingMax, nowMs) // throws: caller must supply
      case _ =>
        val start = reserveFor(table, strategy, count.toLong, existingMax, nowMs)
        val enc = encoderFor(strategy)
        (0 until count).map(i => enc(start + i))
    }

  /** Generate `count` ids for a batch starting at deterministic base state
    * (stateless form — same-base batches restart at seq 0; prefer
    * `generateFor` for insert paths).
    * @param existingMax current max numeric pk (sequential only)
    * @param nowMs       wall clock for time-based strategies */
  def generate(strategy: PkStrategy, count: Int,
      existingMax: Long = 0L, nowMs: Long = System.currentTimeMillis()): Seq[String] =
    strategy match {
      case PkStrategy.None =>
        throw new IllegalArgumentException(
          "PkStrategy.None does not generate ids — the caller must supply them")
      case PkStrategy.Sequential =>
        (1 to count).map(i => (existingMax + i).toString)
      case PkStrategy.TimestampBased =>
        val base = BigInt(nowMs / 1000 - EpochStartSeconds) * 100000
        (0 until count).map(i => (base + i).toString)
      case PkStrategy.DatePrefixed =>
        val day = java.time.format.DateTimeFormatter.BASIC_ISO_DATE
          .format(java.time.Instant.ofEpochMilli(nowMs)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate)
        val base = BigInt(day) * 100000
        (0 until count).map(i => (base + i).toString)
      case PkStrategy.ShortCode =>
        val base = BigInt(nowMs / 1000 - EpochStartSeconds) * 100000
        (0 until count).map(i => Base62.encode(base + i))
    }
}
