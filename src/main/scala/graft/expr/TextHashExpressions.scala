package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen kernels for the text-dedup hash pipeline. The HOF formulations
 * (64 `aggregate` tallies for simhash, k×|shingles| `transform` md5 calls
 * for minhash) are CodegenFallback — every token crosses the interpreted
 * boundary 64×/k×. These kernels run the whole loop in one JVM static
 * call, producing BYTE-IDENTICAL output to the Column versions (and
 * therefore to the DuckDB oracles): same md5 hex strings, same hex-digit
 * bit decode, same '0'/'1' bit-string / hex-string-min results.
 * DedupSpec asserts kernel == HOF on real data.
 */
object TextHashKernel {

  // per-thread digest: DigestUtils allocates a MessageDigest per call,
  // which dominates small-token hashing in the hot loop
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  private[expr] def md5HexPublic(bytes: Array[Byte]): String = md5Hex(bytes)

  private[expr] def md5DigestPublic(bytes: Array[Byte]): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.digest(bytes)
  }

  /** md5 hex over a byte RANGE — no per-gram array copy. */
  private[expr] def md5HexRange(bytes: Array[Byte], off: Int, len: Int): String = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** 64-bit simhash over distinct tokens → 64-char '0'/'1' string.
    * Bit b of token t = (hexdigit(md5hex(t), b/4) >> (b%4)) & 1;
    * per-bit majority over tokens (ties → '1').
    * A null token element poisons the result to all-zeros — byte-identical
    * to the HOF formulation, where md5(null)=null nulls every tally and
    * `when(null >= 0,...)` emits '0' per bit. */
  def simhash64(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    val tallies = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        val zeros = new Array[Byte](64)
        java.util.Arrays.fill(zeros, '0'.toByte)
        return UTF8String.fromBytes(zeros)
      }
      val hex = md5Hex(toks.getUTF8String(i).getBytes)
      var b = 0
      while (b < 64) {
        val v = Character.digit(hex.charAt(b / 4), 16)
        tallies(b) += (((v >> (b % 4)) & 1) * 2) - 1
        b += 1
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var b = 0
    while (b < 64) { out(b) = if (tallies(b) >= 0) '1' else '0'; b += 1 }
    UTF8String.fromBytes(out)
  }

  /** Fast-family MinHash: element i = MIN over shingles s of
    * xxhash64(i, s) — bit-identical to the HOF
    * `array_min(transform(s, x => xxhash64(i, x)))` (Spark XXH64, seed 42,
    * children hashed left-to-right: hashInt(i) then the string bytes).
    * A null shingle contributes the running seed hashInt(i) — exactly what
    * Spark's xxhash64 returns when a child is null (null children are
    * skipped, not nulled); empty array → null (array_min of empty). */
  def minhashFast(shingles: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = shingles.numElements()
    val mins = new Array[Any](k)
    var i = 0
    while (i < k) {
      val hi = XXH64.hashInt(i, 42L)
      var best = Long.MaxValue
      var found = false
      var j = 0
      while (j < n) {
        val h =
          if (shingles.isNullAt(j)) hi
          else {
            val s = shingles.getUTF8String(j)
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, hi)
          }
        if (!found || h < best) { best = h; found = true }
        j += 1
      }
      mins(i) = if (found) java.lang.Long.valueOf(best) else null
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** MinHash signature: element i = MIN over shingles s of
    * md5hex(i + ":" + s) compared as strings (oracle family). Null shingle
    * elements are skipped (concat(i,':',null)=null → md5 null → ignored by
    * array_min in the HOF form). */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[UTF8String](k)
    var i = 0
    while (i < k) {
      val prefix = i.toString + ":"
      var best: String = null
      var j = 0
      while (j < n) {
        if (!shingles.isNullAt(j)) {
          val h = md5Hex((prefix + shingles.getUTF8String(j).toString)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          if (best == null || h.compareTo(best) < 0) best = h
        }
        j += 1
      }
      mins(i) = if (best == null) null else UTF8String.fromString(best)
      i += 1
    }
    new GenericArrayData(mins.asInstanceOf[Array[Any]])
  }

  /** Byte-wise hamming distance over the first min(len) positions of two
    * ASCII bit-strings ('0'/'1'). Byte-identical to the HOF
    * `aggregate(zip_with(split(a,""), split(b,""), ...))` form on ASCII
    * input: zip_with null-pads the longer side's tail and the
    * `when(x =!= y, 1)` null-compare contributes 0 there, so extra
    * positions never count. One tight JVM loop instead of two array
    * splits + a lambda per position. Empty-string quirk preserved:
    * Spark's split("", "") is [""] — ONE empty element — so "" vs a
    * non-empty string differs at exactly one position. */
  def hamming(a: UTF8String, b: UTF8String): Int = {
    val na = a.numBytes
    val nb = b.numBytes
    if (na == 0 || nb == 0) return if (na == nb) 0 else 1
    val n = if (na < nb) na else nb
    var d = 0
    var i = 0
    while (i < n) {
      if (a.getByte(i) != b.getByte(i)) d += 1
      i += 1
    }
    d
  }
}

/** 52-bit md5 fraction kernel: the top 13 hex digits of md5(input) as an
  * unsigned long — byte-identical to the Column chain
  * `conv(substring(md5(x), 1, 13), 16, 10).cast("long")` (the salted-
  * fraction idiom of the sampling/bootstrap/experiment families), with
  * ONE digest (ThreadLocal, no per-call MessageDigest.getInstance) and
  * no 32-char hex string materialization. */
object Md5FracKernel {
  def frac52(input: UTF8String): Long = {
    val d = TextHashKernel.md5DigestPublic(input.getBytes)
    ((d(0) & 0xFFL) << 44) | ((d(1) & 0xFFL) << 36) | ((d(2) & 0xFFL) << 28) |
      ((d(3) & 0xFFL) << 20) | ((d(4) & 0xFFL) << 12) | ((d(5) & 0xFFL) << 4) |
      ((d(6) & 0xFFL) >>> 4)
  }
}

/** md5Frac52(x) → LONG in [0, 2⁵²), codegen'd. */
case class Md5Frac52Expr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  // analysis-time contract: the old conv(substring(md5(x)...)) chain
  // implicitly cast any input; the kernel reads UTF8String directly, so
  // misuse must fail at analysis with a readable message, not as an
  // executor ClassCastException (r16 advice)
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    Md5FracKernel.frac52(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.Md5FracKernel.frac52($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Winnowing fingerprint kernel (Schleimer/Wilkerson/Aiken 2003) — the
 * whole MOSS chain (k-gram hash → sliding-window string-min → distinct)
 * in ONE pass per document. Byte-identical to the HOF formulation in
 * `Dedup.winnowFingerprintsHof` (kept as the spec cross-check): same
 * md5 hex strings / xxhash64 decimal strings, same window minima
 * (binary string compare), same first-occurrence distinct order, same
 * "L < k+w−1 → empty" contract. The HOF chain is CodegenFallback and
 * allocates a slice per window (O(L·w) interpreted comparisons); this
 * runs O(L) amortized via a monotonic deque.
 */
object WinnowKernel {
  private val Empty = new GenericArrayData(new Array[Any](0))

  def fingerprints(text: UTF8String, k: Int, w: Int, oracle: Boolean): ArrayData = {
    val l = text.numChars()
    if (l < k + w - 1) return Empty
    // one pass over the bytes: char-boundary offsets (substring(i, k) in
    // the HOF is CHARACTER-based; hashing reads the byte range directly)
    val bytes = text.getBytes
    val offs = new Array[Int](l + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      offs(ci) = bi
      // step with UTF8String's OWN first-byte width so the walk matches
      // numChars byte-for-byte on ANY input: the hand-rolled ladder
      // counted stray continuation bytes (0x80-0xBF) as 2-byte chars
      // where numChars counts 1, leaving tail offsets at 0 on malformed
      // UTF-8 (zero/negative gram ranges — the r16 advisor's finding)
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(l) = bytes.length
    val m = l - k + 1
    val hs = new Array[String](m)
    var i = 0
    while (i < m) {
      val off = offs(i)
      val len = offs(i + k) - off
      hs(i) =
        if (oracle) TextHashKernel.md5HexRange(bytes, off, len)
        else java.lang.Long.toString(
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
              len, 42L))
      i += 1
    }
    // sliding-window minimum, monotonic deque (ties keep any instance —
    // equal strings are indistinguishable in the output); distinct with
    // first-occurrence order = array_distinct
    val out = new java.util.LinkedHashSet[String]()
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // [head, tail) holds candidate indices, values ascending
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)).compareTo(hs(i)) >= 0) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hs(dq(head)))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }
}

/** winnowFps(loweredText, k, w, oracle) → ARRAY<STRING>, codegen'd. */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int, oracle: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType)

  override def nullSafeEval(a: Any): Any =
    WinnowKernel.fingerprints(a.asInstanceOf[UTF8String], k, w, oracle)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.expr.WinnowKernel.fingerprints($a, $k, $w, $oracle)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextStatsKernel {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** One pass over the document: (char length, whitespace-token count,
    * md5 fingerprint of the normalized text). Byte-identical to the Column
    * formulation `length(text)` / `size(split(trim(text), "\s+"))` /
    * `md5(regexp_replace(lower(trim(text)), "\s+", " ").cast("binary"))` —
    * which re-runs the trim/lower/regex chain once PER OUTPUT COLUMN.
    * Spark `trim` strips 0x20 only (UTF8String.trim), not Java's <=0x20. */
  def stats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val len = text.numChars()
    val trimmed = text.trim().toString
    val tokCnt = WS.split(trimmed, -1).length
    val norm = WS.matcher(trimmed.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ")
    val fp = TextHashKernel.md5HexPublic(
      norm.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](len, tokCnt, UTF8String.fromString(fp)))
  }

  /** Polynomial rolling hash (base 31, mod 1e9+7, acc₀=7) over the CODE
    * POINTS of the normalized text — byte-identical to the Column chain
    * `aggregate(split(normalizeText(text), ""), 7L,
    * (acc, ch) -> pmod(acc*31 + ascii(ch), 1e9+7))`: Spark's split("")
    * yields code points (UTF8String chars) and split of "" yields [""]
    * whose ascii is 0. */
  def rollingFp(text: UTF8String): Long = {
    val Mod = 1000000007L
    val norm = WS.matcher(text.trim().toString.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ")
    if (norm.isEmpty) (7L * 31) % Mod
    else {
      var acc = 7L
      val it = norm.codePoints().iterator()
      while (it.hasNext) acc = java.lang.Math.floorMod(acc * 31 + it.next(), Mod)
      acc
    }
  }

  /** Distinct normalized whitespace tokens, first-occurrence order —
    * byte-identical to `array_distinct(split(trim(regexp_replace(
    * lower(trim(text)), "\s+", " ")), "\s+"))` in one pass. */
  def distinctTokens(text: UTF8String): ArrayData = {
    val norm = WS.matcher(text.trim().toString.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ").trim
    val toks = WS.split(norm, -1)
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < toks.length) { out.add(toks(i)); i += 1 }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }
}

object ShingleKernel {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Word n-gram shingles of normalized text — byte-identical to the
    * Column chain `array_distinct(transform(...))` over
    * `split(trim(regexp_replace(lower(trim(text)), "\s+", " ")), "\s+")`:
    * lowercase, collapse whitespace, n-gram join with ' ', distinct with
    * first-occurrence order; < n tokens → one shingle of the whole text. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val norm = WS.matcher(text.toString.trim.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ").trim
    val toks = WS.split(norm, -1)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length >= n) {
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
    } else out.add(String.join(" ", toks: _*))
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }
}

object TextProfileKernel {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  // java regex \s — ASCII only, deliberately NOT Character.isWhitespace
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  private def isAlpha(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
  private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'
  private def isPunct(cp: Int): Boolean = cp match {
    case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' | '[' | ']' | '-' => true
    case _ => false
  }

  /** One pass over the document: every q27-class signal at once.
    * Byte-identical to the Column formulations it fuses —
    *   len       = `length(text)` (code points)
    *   bpe_cnt   = `size(regexp_extract_all(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))`
    *               (alpha runs + digit chars + other non-ws chars: the
    *               alternation is anchored per position, so a greedy
    *               alpha run, then single-char branches)
    *   alpha_cnt = `length(regexp_replace(text, "[^A-Za-z]", ""))`
    *   punct_cnt = `length(regexp_replace(text, "[^.,;:!?'\"()\[\]-]", ""))`
    *   tok_cnt   = `size(split(trim(lower(text)), "\s+"))` (Spark trim
    *               strips 0x20 only; split keeps boundary empties)
    *   marker_hits[k] = hits of marker set k over those tokens
    *               (= `MarkerCountsExpr` over `whitespaceTokens(lower(text))`) */
  def profile(text: UTF8String,
      sets: Array[java.util.HashSet[String]]): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    var bpe = 0; var alpha = 0; var punct = 0; var len = 0
    var prevAlpha = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      len += 1
      if (isAlpha(cp)) { if (!prevAlpha) bpe += 1; alpha += 1; prevAlpha = true }
      else {
        prevAlpha = false
        if (isDigit(cp) || !isWs(cp)) bpe += 1
        if (isPunct(cp)) punct += 1
      }
      i += Character.charCount(cp)
    }
    val toks = WS.split(text.toLowerCase.trim().toString, -1)
    val hits = new Array[Int](sets.length)
    var t = 0
    while (t < toks.length) {
      var k = 0
      while (k < sets.length) { if (sets(k).contains(toks(t))) hits(k) += 1; k += 1 }
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      len, bpe, alpha, punct, toks.length,
      new GenericArrayData(hits.map(Integer.valueOf).asInstanceOf[Array[Any]])))
  }
}

object MarkerKernel {
  /** Count hits of each marker set over a token array (multiplicity
    * preserved — matches `filter(toks, array_contains(set, t))`).
    * One pass over tokens for ALL sets. */
  def counts(toks: ArrayData, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val out = new Array[Int](sets.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i).toString
        var s = 0
        while (s < sets.length) {
          if (sets(s).contains(t)) out(s) += 1
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.map(Integer.valueOf).asInstanceOf[Array[Any]])
  }

  def build(sets: Seq[Seq[String]]): Array[java.util.HashSet[String]] =
    sets.map { ms =>
      val h = new java.util.HashSet[String]()
      ms.foreach(h.add)
      h
    }.toArray
}

/** markerCounts(tokens, sets) → ARRAY<INT> of per-set hit counts —
  * the language-ID / stopword scoring loop in one codegen pass. */
case class MarkerCountsExpr(child: Expression, markerSets: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType)

  @transient private lazy val sets = MarkerKernel.build(markerSets)

  override def nullSafeEval(a: Any): Any =
    MarkerKernel.counts(a.asInstanceOf[ArrayData], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, a => s"graft.expr.MarkerKernel.counts($a, $setsRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** textProfile(text) → STRUCT<len, bpe_cnt, alpha_cnt, punct_cnt,
  * tok_cnt, marker_hits ARRAY<INT>> in ONE kernel pass — the q27 path:
  * six regex/tokenize chains (BPE count, alpha ratio, punct ratio,
  * tokenize×2, marker scoring) fused. */
case class TextProfileExpr(child: Expression, markerSets: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("bpe_cnt", IntegerType, nullable = false),
    StructField("alpha_cnt", IntegerType, nullable = false),
    StructField("punct_cnt", IntegerType, nullable = false),
    StructField("tok_cnt", IntegerType, nullable = false),
    StructField("marker_hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  @transient private lazy val sets = MarkerKernel.build(markerSets)

  override def nullSafeEval(a: Any): Any =
    TextProfileKernel.profile(a.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, a => s"graft.expr.TextProfileKernel.profile($a, $setsRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** textStats(text) → STRUCT<len INT, tok_cnt INT, fp STRING> in one
  * kernel pass (the q24 path: three regex chains fused into one). */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("tok_cnt", IntegerType, nullable = false),
    StructField("fp", StringType, nullable = false)))

  override def nullSafeEval(a: Any): Any =
    TextStatsKernel.stats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.TextStatsKernel.stats($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** rollingFp(text) → BIGINT polynomial rolling hash, codegen'd. */
case class RollingFpExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    TextStatsKernel.rollingFp(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.TextStatsKernel.rollingFp($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** distinctTokens(text) → ARRAY<STRING>: normalized whitespace tokens,
  * deduped first-occurrence — the simhash tokenization in one pass. */
case class DistinctTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType)

  override def nullSafeEval(a: Any): Any =
    TextStatsKernel.distinctTokens(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.TextStatsKernel.distinctTokens($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** shingles(text, n) → ARRAY<STRING>, codegen'd. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType)

  override def nullSafeEval(a: Any): Any =
    ShingleKernel.shingles(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.ShingleKernel.shingles($a, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(tokens ARRAY<STRING>) → CHAR(64) bit-string, codegen'd. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any): Any =
    TextHashKernel.simhash64(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.TextHashKernel.simhash64($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhashFast(shingles ARRAY<STRING>, k) → ARRAY<LONG> of k xxhash64
  * mins (production hash family), codegen'd. */
case class MinHashFastExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType)

  override def nullSafeEval(a: Any): Any =
    TextHashKernel.minhashFast(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.TextHashKernel.minhashFast($a, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash(shingles ARRAY<STRING>, k) → ARRAY<STRING> of k hex mins. */
case class MinHashExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType)

  override def nullSafeEval(a: Any): Any =
    TextHashKernel.minhash(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.TextHashKernel.minhash($a, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** hamming(a, b) over ASCII bit-strings → INT, codegen'd. The interpreted
  * HOF twin (`Dedup.hammingDistanceHof`) is the spec cross-check. */
case class HammingExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernel.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.TextHashKernel.hamming($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
