package graft.schema

/**
 * Migration-task status — the reference's `MigrationStatus` model
 * (/root/reference/lib/src/model/migration_task.dart:491-569: taskId,
 * isCompleted, createTime, pendingSpaces, processedSpacesCount,
 * totalSpacesCount, totalRecordsProcessed, currentSpaceProgress,
 * throughput, progressPercentage), field for field.
 *
 * Semantics here: the reference runs multi-space schema migrations in
 * background isolates, so the task is something to POLL; in this engine
 * each space's migration is one atomic Spark rewrite and the task
 * completes before `applyAsync()` returns — Spark's executors ARE the
 * background machinery. The ledger still records real per-space
 * progress (counts, records, elapsed-derived throughput) so a user
 * polling `queryMigrationTaskStatus` sees the same shape and numbers
 * they would mid-flight on the reference, just always at 100%.
 */
final case class MigrationStatus(
    taskId: String,
    isCompleted: Boolean,
    createTimeMs: Long,
    pendingSpaces: Seq[String],
    processedSpacesCount: Int,
    totalSpacesCount: Int,
    totalRecordsProcessed: Long,
    currentSpaceProgress: Double,
    throughput: Double) {

  /** 0-100, spaces processed / total (reference migration_task.dart:521). */
  def progressPercentage: Double =
    if (totalSpacesCount > 0) processedSpacesCount.toDouble / totalSpacesCount * 100.0
    else 100.0
}
