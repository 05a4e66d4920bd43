package graft.pipeline

/** Table-format seam for the checkpoint/lineage layer (SURVEY.md §7.3).
  *
  * The pipeline only ever talks to these four members, so the commit
  * backend is swappable per deployment:
  *  - [[Checkpoint]] (the default here): JSON manifest on plain partitioned
  *    Parquet — snapshot id, per-sink rows, part-file lineage.
  *  - An Iceberg implementation (when the runtime has the Iceberg jars)
  *    would map `commitSink` to a table commit producing a snapshot,
  *    `isCommitted` to a snapshot-summary property lookup keyed by the
  *    input fingerprint, and `currentSnapshotId` to the table's current
  *    snapshot — same contract, no pipeline change.
  */
trait TableFormat {
  /** Has this sink already been durably written for the current input? */
  def isCommitted(sink: String): Boolean

  /** Rows recorded at commit time, if committed. */
  def committedRows(sink: String): Option[Long]

  /** Monotonic snapshot id — increments on every commit. */
  def currentSnapshotId: Long

  /** Record a completed durable write of `sink` with its row count. */
  def commitSink(sink: String, rows: Long): Unit
}
