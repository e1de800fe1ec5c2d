package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: which stage of view → click → purchase each
  * user reached, where a stage only counts if it happens AFTER the
  * previous one (a purchase before any view is not a conversion — the
  * ordering constraint is what separates a funnel from three
  * conditional counts).
  *
  * Spelled as running-max flags over one per-user event-time window:
  *   seen_view(t)  = did a view happen at or before t
  *   seen_click(t) = did a click happen after a view, at or before t
  * and a purchase converts iff seen_click held when it fired. Both
  * windows share the same (partition, order), so Catalyst plans ONE
  * exchange + ONE sort, and the final per-user aggregate reuses the
  * user_id clustering — a single shuffle end to end at any scale. At
  * 100 TB the only knob is the user_id partition count; no state
  * beyond the running flags, no self-joins (the naive spelling joins
  * events to events per stage — quadratic in stages).
  *
  * Reference analogue: the stage-gated ensemble cutoffs
  * (sub_stacking.py:37-38) are the same ordered-predicate shape; the
  * funnel applies it to event streams (SURVEY §2.9's events table).
  */
object Funnel {

  /** Per-user funnel stages over (user_id, ts, event_id, event_type).
    * Returns one row per user: reached_view/click/purchase ∈ {0,1}
    * (monotone by construction) and stage ∈ 0..3. Deterministic under
    * ts ties via the event_id tie-break. */
  def stages(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("seen_view",
        max(when(col("event_type") === "view", 1).otherwise(0)).over(w))
      .withColumn("seen_click",
        max(when(col("event_type") === "click" && col("seen_view") === 1, 1)
          .otherwise(0)).over(w))
      .withColumn("purchase_conv",
        when(col("event_type") === "purchase" && col("seen_click") === 1, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(
        max(col("seen_view")).as("reached_view"),
        max(col("seen_click")).as("reached_click"),
        max(col("purchase_conv")).as("reached_purchase"))
      .withColumn("stage",
        col("reached_view") + col("reached_click") + col("reached_purchase"))
  }
}
