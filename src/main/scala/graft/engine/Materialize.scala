package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager plan truncation with sane statistics and no cache leak — the
  * pattern every iterative loop that references its state more than once
  * per round must use.
  *
  * Why all three steps:
  *   - `persist` first: `Dataset.localCheckpoint` copies the ORIGIN
  *     plan's statistics into the checkpoint wrapper. For a persisted
  *     dataset those are the materialized cache's actual size; for a raw
  *     iterative plan they are Catalyst's multiplicative ESTIMATES, whose
  *     BigInt size products grow without bound across rounds and drive
  *     the optimizer into minutes-long `BigInteger.multiply` stalls on
  *     the next join (the round-4 `SizeInBytesOnlyStatsPlanVisitor`
  *     pathology — a bare eager checkpoint reintroduced it).
  *   - `localCheckpoint(eager = true)`: one job materializes the data
  *     and truncates lineage, so per-round plans stay constant-size.
  *   - `unpersist` the PRE-checkpoint handle afterwards: its plan still
  *     matches the CacheManager entry, releasing the double-stored cache
  *     copy. (Unpersisting the returned wrapper instead is a silent
  *     no-op — its plan is the post-checkpoint LogicalRDD — and leaks
  *     the entry for the session lifetime.)
  */
object Materialize {
  def eager(df: DataFrame): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    val out = cached.localCheckpoint(eager = true)
    cached.unpersist(blocking = false)
    out
  }
}
