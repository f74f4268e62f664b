package graft.query

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.expr.Cond

/**
 * Query result with pagination metadata — mirrors the reference's
 * `QueryResult{data, nextCursor/prevCursor, hasMore/hasPrev,
 * tableTotalCount, executionTimeMs}` (/root/reference/lib/src/model/query_result.dart:1-200,
 * query_builder.dart:443-470).
 *
 * hasMore is computed with the reference's limit+1 probe
 * (query_executor.dart:352-397): one extra row is fetched and dropped.
 *
 * Cursors are keyset tokens: base64 of `v1|table|sig|dir|k1\u0000v1...`
 * carrying the sort-key pivot of the page edge. `next()` re-runs the query
 * with a lexicographic keyset predicate `(k1,k2,..) > (p1,p2,..)` — plain
 * Column expressions, no OFFSET scan (query_executor.dart:2866-3000, 3570).
 * Cursor queries require the sort keys + a unique tie-break to be total,
 * as the reference does by appending the PK (query_executor.dart:1063-1074).
 */
final class QueryResult(
    val data: Seq[Row],
    val hasMore: Boolean,
    val hasPrev: Boolean,
    val nextCursor: Option[String],
    val prevCursor: Option[String],
    val executionTimeMs: Long,
    builder: QueryBuilder) {

  def size: Int = data.size
  def next(): QueryResult = nextCursor match {
    case Some(tok) => QueryResult.executeCursor(builder, tok)
    case None      => throw new IllegalStateException("no next page")
  }
  def prev(): QueryResult = prevCursor match {
    case Some(tok) => QueryResult.executeCursor(builder, tok)
    case None      => throw new IllegalStateException("no previous page")
  }
}

object QueryResult {

  private def signature(b: QueryBuilder): String =
    (b.table, b.cond, b.selects, b.joins, b.orders).hashCode.toHexString

  private[query] def encodeCursor(
      b: QueryBuilder, dir: String, pivot: Seq[(String, String)]): String = {
    val body = s"v1|${b.table}|${signature(b)}|$dir|" +
      pivot.map { case (k, v) => s"$k\u0000$v" }.mkString("\u0001")
    Base64.getUrlEncoder.encodeToString(body.getBytes(StandardCharsets.UTF_8))
  }

  private[query] def decodeCursor(b: QueryBuilder, tok: String): (String, Seq[(String, String)]) = {
    val body = new String(Base64.getUrlDecoder.decode(tok), StandardCharsets.UTF_8)
    val parts = body.split("\\|", 5)
    require(parts.length == 5 && parts(0) == "v1", "malformed cursor")
    require(parts(1) == b.table && parts(2) == signature(b),
      "cursor does not belong to this query") // token validation, query_executor.dart:416-450
    val pivot = parts(4).split('\u0001').toSeq.filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split('\u0000').padTo(2, "")
      (k, v)
    }
    (parts(3), pivot)
  }

  /** Lexicographic keyset predicate over the sort keys:
    * (k1 > p1) OR (k1 = p1 AND k2 > p2) OR ... with direction per key. */
  private def keysetCond(orders: Seq[(String, Boolean)], pivot: Seq[(String, String)],
      forward: Boolean): Cond = {
    val ks = orders.zip(pivot)
    val clauses = ks.indices.map { i =>
      val eqs: Seq[Cond] = ks.take(i).map { case ((f, _), (_, v)) => Cond.Leaf(f, "=", v) }
      val ((f, asc), (_, v)) = ks(i)
      val strict = if (asc == forward) ">" else "<"
      Cond.and(eqs :+ Cond.Leaf(f, strict, v): _*)
    }
    Cond.or(clauses: _*)
  }

  /** Effective cursor sort keys: the user's orderBy + the PK appended as an
    * automatic tie-break (ascending in scan direction) when the table has a
    * registered schema and the PK isn't already a sort key — the
    * reference's sortKey cursor mode always carries `orderBy + primary key`
    * (query_executor.dart:2948-2993, 3012-3018), so pages stay stable over
    * non-unique sort columns without a caller-supplied total order. */
  /** The reference restricts cursor pagination over JOINs: ordering by a
    * joined table's field makes keyset semantics ambiguous under row
    * multiplication, so a cursor-driven page throws and a first page simply
    * doesn't emit cursors (query_executor.dart:291-336). The reference only
    * validates the QUALIFIED spelling ("customer.c_name"); we also catch
    * the bare spelling of a field that doesn't belong to the main table —
    * the ambiguity is identical however the caller spells it. */
  private def cursorUnsupportedReason(b: QueryBuilder): Option[String] =
    if (b.joins.isEmpty) None
    else {
      lazy val mainCols = b.engine.table(b.table).schema.fieldNames.toSet
      val joinedFieldOrder = b.orders.exists { case (f, _) =>
        if (f.contains('.')) !f.startsWith(s"${b.table}.")
        else !mainCols.contains(f)
      }
      if (joinedFieldOrder)
        Some("Cursor pagination with JOIN only supports ordering by main table fields.")
      else None
    }

  private def effectiveOrders(b: QueryBuilder): Seq[(String, Boolean)] = {
    // single-table only: the reference does not support cursors across JOIN
    // row multiplication (SURVEY §2.7), and a joined frame may qualify the
    // PK name away (both sides named "id" → only "t.id"/"u.id" exist)
    val plain = b.joins.isEmpty && b.aggs.isEmpty && b.groups.isEmpty && b.distinctOn.isEmpty
    val pk = b.engine.registry.get(b.engine.space, b.table).map(_.primaryKey.name)
    pk match {
      case Some(p) if plain && b.orders.nonEmpty &&
          !b.orders.exists { case (f, _) => f == p || f.endsWith(s".$p") } =>
        b.orders :+ (p -> true)
      case _ => b.orders
    }
  }

  private[graft] def execute(b: QueryBuilder): QueryResult =
    executeImpl(b, b, fromCursor = None)

  /** @param bOrig  the user's builder — cursors are encoded/validated
    *               against it so every page's tokens stay exchangeable
    * @param bExec  bOrig + keyset predicate (for cursor-driven pages)
    * @param fromCursor Some("next"|"prev") when this page was reached via
    *               a cursor; "prev" executes with FLIPPED sort order +
    *               limit, then reverses, so it returns the page
    *               immediately before the pivot (not the head of the
    *               prefix). */
  private def executeImpl(
      b: QueryBuilder, bExec: QueryBuilder, fromCursor: Option[String]): QueryResult = {
    val t0 = System.nanoTime()
    val n = b.limitOpt.getOrElse(b.engine.defaultQueryLimit)
    val reversed = fromCursor.contains("prev")
    val ords = effectiveOrders(b) // user's orderBy + automatic PK tie-break
    val bEff = bExec.copy(orders = ords)
    val bDir =
      if (reversed) bEff.copy(orders = bEff.orders.map { case (f, asc) => (f, !asc) })
      else bEff

    // sort-key values must ride along even when not projected (the builder
    // supports ordering by non-selected fields): append them as __sk columns
    // and strip them from the returned rows
    val plainSelect = bDir.aggs.isEmpty && bDir.groups.isEmpty &&
      bDir.distinctOn.isEmpty && bDir.selects.nonEmpty
    val missing = ords.map(_._1).distinct
      .filterNot(f => bDir.selects.exists(_.field == f))
    val extras = if (plainSelect) missing.zipWithIndex.map { case (f, i) =>
      SelectItem(f, Some(s"__sk$i")) } else Nil
    val skName: Map[String, String] =
      (if (plainSelect) missing.zipWithIndex.map { case (f, i) => f -> s"__sk$i" }.toMap
       else Map.empty)

    val probeDf = bDir.copy(
      selects = bDir.selects ++ extras,
      limitOpt = Some(n + 1)).compile(applyLimit = true)
    val probe = probeDf.collect()
    val hasMoreProbe = probe.length > n
    val pageRaw = probe.take(n).toSeq
    val page = if (reversed) pageRaw.reverse else pageRaw

    // strip the __sk carrier columns (schema-preserving rows)
    val outSchema = org.apache.spark.sql.types.StructType(
      probeDf.schema.fields.filterNot(f => f.name.startsWith("__sk")))
    def strip(r: Row): Row =
      if (extras.isEmpty) r
      else new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        r.toSeq.take(outSchema.length).toArray, outSchema)
    val rows = page.map(strip)

    val (hasMore, hasPrev) = fromCursor match {
      case None         => (hasMoreProbe, b.offsetOpt.exists(_ > 0))
      case Some("next") => (hasMoreProbe, rows.nonEmpty)
      case _            => (rows.nonEmpty, hasMoreProbe) // "prev"
    }

    def pivotOf(r: Row): Option[Seq[(String, String)]] =
      scala.util.Try(ords.map { case (f, _) =>
        f -> Option(r.getAs[Any](skName.getOrElse(f, outName(b, f))))
          .map(_.toString).orNull
      }).toOption
    // unsupported cursor shape on a first page → no tokens (reference falls
    // back to non-cursor mode rather than failing the query)
    val cursorable = cursorUnsupportedReason(b).isEmpty
    val next =
      if (cursorable && hasMore && b.orders.nonEmpty && page.nonEmpty)
        pivotOf(page.last).map(encodeCursor(b, "next", _))
      else None
    val prev =
      if (cursorable && hasPrev && b.orders.nonEmpty && page.nonEmpty &&
          (fromCursor.isDefined || b.offsetOpt.exists(_ > 0)))
        pivotOf(page.head).map(encodeCursor(b, "prev", _))
      else None
    new QueryResult(rows, hasMore, hasPrev, next, prev,
      (System.nanoTime() - t0) / 1000000, b)
  }

  private def outName(b: QueryBuilder, f: String): String =
    b.selects.find(_.field == f).map(_.outputName).getOrElse(
      if (f.contains('.')) f.split('.').last else f)

  private[query] def executeCursor(b: QueryBuilder, tok: String): QueryResult = {
    cursorUnsupportedReason(b).foreach(r => throw new IllegalArgumentException(r))
    val (dir, pivot) = decodeCursor(b, tok)
    val forward = dir == "next"
    val ks = keysetCond(effectiveOrders(b), pivot, forward)
    executeImpl(b.copy(offsetOpt = None),
      b.copy(cond = b.cond && ks, offsetOpt = None), Some(dir))
  }
}
