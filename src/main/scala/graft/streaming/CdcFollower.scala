package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Continuous CDC consumer for [[VersionedTable]]: follows the
  * table version-by-version and maintains a grouped aggregate view by
  * applying each step's signed `cdc()` delta — the table-format
  * analog of a change-data-feed subscriber driving an incremental
  * materialized view.
  *
  * Per version step the work is O(changed buckets) + O(touched
  * groups): the follower never rescans the base table after the
  * initial seed, which is the only maintenance shape that survives a
  * 100-TB table taking small frequent commits. The view itself lives
  * in a driver-held DataFrame seeded once from the snapshot; a
  * production deployment would keep it in its own VersionedTable (the
  * combine step is a MERGE by group key) — the delta algebra is
  * identical.
  *
  * Delta algebra (same as `vt_incr_mv`): `insert`/`update_postimage`
  * add a row's contribution, `delete`/`update_preimage` retract it;
  * groups whose count reaches zero drop out of the view.
  */
final class CdcFollower(
    spark: SparkSession,
    table: VersionedTable,
    keys: Seq[String],
    groupCol: String,
    valueCol: String) {

  private var view: DataFrame = _
  private var at: Int = -1
  private var stepsSinceCheckpoint = 0

  /** every N advance() steps the view is localCheckpoint()ed, which
    * truncates the logical plan: persist()+count() alone caches the
    * DATA but leaves one full_outer join per step chained in the plan,
    * so driver-side analysis (and recomputation on cache-block loss)
    * would grow without bound over a long follow session. */
  private val CheckpointEvery = 8

  /** version the view currently reflects. */
  def version: Int = at

  private def aggregated(rows: DataFrame): DataFrame =
    rows.groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        // all-NULL groups total 0, not NULL — the delta algebra adds
        // decimals, so the view's totals must stay non-null for the
        // delta≡recompute invariant to hold on such groups
        coalesce(sum(col(valueCol).cast("decimal(28,2)")), lit(BigDecimal(0)).cast("decimal(28,2)"))
          .as("total"))

  /** seed the view from the snapshot at `fromVersion` (the one full
    * read the follower ever does). Re-seeding releases the previous
    * view's cache. */
  def seed(fromVersion: Int): Unit = {
    val prev = view
    view = aggregated(table.read(Some(fromVersion)).get)
      .persist()
    view.count() // materialize so later steps don't re-read the snapshot
    if (prev != null) prev.unpersist()
    at = fromVersion
  }

  /** advance the view by one committed version using only the CDC
    * delta of that step. */
  def advance(): Unit = advanceTo(at + 1)

  /** catch up to `toVersion`, one version step at a time (each step
    * reads only that step's changed buckets). */
  def catchUp(): Unit = {
    val latest = table.currentVersion().getOrElse(at)
    while (at < latest) advance()
  }

  private def advanceTo(toVersion: Int): Unit = {
    require(view != null, "seed() first")
    val delta = table.cdc(keys, at, toVersion)
      .withColumn("sgn",
        when(col("change_type").isin("insert", "update_postimage"), 1L).otherwise(-1L))
      .groupBy(groupCol)
      .agg(sum(col("sgn")).as("dn"),
        sum(col("sgn").cast("decimal(28,2)") * col(valueCol).cast("decimal(28,2)")).as("dt"))
    val old = view
    val stepped = old.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        (coalesce(col("total"), lit(BigDecimal(0)).cast("decimal(28,2)")) +
          coalesce(col("dt"), lit(BigDecimal(0)).cast("decimal(28,2)"))).cast("decimal(28,2)").as("total"))
      .filter(col("n_rows") > 0)
    if (stepsSinceCheckpoint + 1 >= CheckpointEvery) {
      view = stepped.localCheckpoint(true) // truncate plan + lineage
      stepsSinceCheckpoint = 0
    } else {
      view = stepped.persist()
      view.count() // materialize so the next step reads data, not lineage
      stepsSinceCheckpoint += 1
    }
    old.unpersist()
    at = toVersion
  }

  /** current view (group, n_rows, total). Valid until the next
    * advance()/seed(): stepping unpersists the superseded view, so a
    * held reference recomputes through its lineage — collect() before
    * advancing if the old state is needed. */
  def snapshot(): DataFrame = view

  /** ground truth for the current version — used by specs to prove
    * delta application ≡ recompute. */
  def recomputed(): DataFrame = aggregated(table.read(Some(at)).get)
}
