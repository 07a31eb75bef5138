package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join (click→purchase
  * attribution): every click joined to the same user's purchases
  * landing within the next `windowSec` seconds of event time.
  *
  * The SAME plan fragment serves both executions:
  *   - batch: plain equi-join on user + time-range residual;
  *   - streaming: with `withWatermark` on both inputs, the range
  *     condition on the two event-time columns is the constraint
  *     Spark's stream-stream join needs to bound its state — each
  *     side is buffered ONLY until the watermark proves no
  *     counterpart can still arrive, so a continuous run holds
  *     O(watermark + window) state per user, not the whole history.
  *     (`StreamJoinSpec` runs this under adversarial cross-batch
  *     arrival and compares bit-for-bit to the batch twin.)
  */
object StreamJoin {

  /** `events`: (event_id, ts, user_id, event_type). Output: one row
    * per (click, purchase-within-window) pair. */
  def attribution(events: DataFrame, windowSec: Long): DataFrame =
    joinPair(clicksOf(events), purchasesOf(events), windowSec)

  def clicksOf(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))

  def purchasesOf(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))

  /** The join itself, shared by the batch query and the streaming
    * spec (which passes watermarked streaming frames). The range
    * condition references the event-time columns directly so the
    * streaming planner derives state-eviction bounds from it. */
  def joinPair(clicks: DataFrame, purchases: DataFrame, windowSec: Long): DataFrame =
    clicks.join(purchases,
      expr(s"p_user = c_user AND p_ts >= c_ts AND p_ts <= c_ts + interval $windowSec seconds"))
      .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"))
}
