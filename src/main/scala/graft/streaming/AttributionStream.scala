package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream time-bounded join — the streaming counterpart of
  * the batch as-of attribution (rel_q12): every purchase paired with
  * the same user's clicks from the preceding 12 hours, computed as
  * two live streams join (the batch as-of keeps only the latest such
  * click; the stream-stream range join emits all in-window pairs and
  * a downstream consumer picks its winner).
  *
  * Both sides carry watermarks and the join condition bounds c_ts in
  * [p_ts - 12h, p_ts], which is what lets Spark expire state: a
  * click's state row is dropped once the watermark passes
  * c_ts + 12h (no future purchase can reach back to it), so state is
  * (12h + delay) × click rate — bounded regardless of stream length.
  * The join itself is one hash exchange per side on user_id.
  */
object AttributionStream {

  /** Join purchases to same-user clicks within the preceding 12h.
    * Inputs need columns (event_id, user_id, ts); works identically
    * on batch DataFrames (watermarks are no-ops in batch). */
  def rangeAttribution(purchases: DataFrame, clicks: DataFrame)
      : DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val c = clicks
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    p.join(c, expr(
      """p_user = c_user AND
        |c_ts BETWEEN p_ts - INTERVAL 12 HOURS AND p_ts""".stripMargin))
      .select(col("p_id"), col("p_user"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }
}
