package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a clickstream-shaped table: ordered
  * multi-step funnels, cohort retention, and first-order transition
  * matrices. These are the product-analytics queries a training-data
  * pipeline's telemetry side runs at the same scale as the corpus itself
  * (reference scope: the events table, SURVEY.md §2.14 analytics tier).
  *
  * Scale design — every shape here shuffles on ONE key only:
  *
  *  - [[funnelTimes]]: k−1 aggregate+join rounds, all hash-keyed by the
  *    entity. The per-step aggregates have map-side partial combine (a
  *    user's events collapse before the exchange), so shuffled bytes are
  *    O(entities), not O(events). No window over the raw event stream, no
  *    global sort.
  *  - [[cohortRetention]]: one entity-keyed aggregate for the cohort
  *    anchor, one join back (same key — AQE reuses the partitioning), one
  *    (cohort, offset) aggregate with partial combine. `countDistinct` over
  *    entities is the only expensive reduction and its key space is the
  *    cohort grid, not the event count.
  *  - [[transitionMatrix]]: a `lead` window partitioned by entity (skew =
  *    the most active single entity, bounded in any real stream), then a
  *    tiny (from, to) aggregate; the probability denominator is a window
  *    over the AGGREGATED matrix (|types|² rows), never the raw stream.
  *
  * All time arithmetic is integral (epoch micros / long periods, floor
  * division) so results are bit-identical across engines; callers must
  * supply non-negative timestamps (floor vs truncation divides diverge on
  * negatives — SQL `DIV` truncates, DuckDB `//` floors).
  */
object Funnel {

  /** Per-entity ordered funnel: the time of step 1 is the entity's first
    * `steps(0)` event; the time of step i+1 is the first `steps(i)` event
    * STRICTLY AFTER the step-i time (the classic "did the user view, then
    * click, then purchase, in that order" semantics — repeated step kinds
    * are allowed and matched afresh each round).
    *
    * Output: one row per entity that reached step 1 — `entity`,
    * `t1..tk` (long step times, NULL once the funnel stalls) and `stage`
    * (number of steps reached, 1..k).
    *
    * @param events entity/time/kind rows; extra columns are ignored
    * @param steps  ordered step kinds, length ≥ 1
    */
  def funnelTimes(events: DataFrame, entity: String, time: String,
      kind: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val reserved = (1 to steps.size).map(i => s"t$i").toSet + "stage"
    val clash = events.columns.filter(c => reserved(c) && c != entity)
    require(clash.isEmpty, s"column(s) ${clash.mkString(", ")} collide with " +
      "funnel output columns (t<i>, stage); rename before calling")

    val e = events.select(col(entity), col(time), col(kind))
    var acc = e.filter(col(kind) === steps.head)
      .groupBy(col(entity)).agg(min(col(time)).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val nxt = e.filter(col(kind) === step)
        .join(acc.select(col(entity), col(prev)), Seq(entity))
        .filter(col(time) > col(prev))
        .groupBy(col(entity)).agg(min(col(time)).as(cur))
      acc = acc.join(nxt, Seq(entity), "left")
    }
    val stage = (2 to steps.size).foldLeft(lit(1L)) { (s, i) =>
      s + when(col(s"t$i").isNotNull, 1L).otherwise(0L)
    }
    acc.withColumn("stage", stage)
  }

  /** Cohort retention grid: entities are anchored to the period of their
    * FIRST event (`cohort_p`, a floor-divided period index), and every
    * event lands in the offset cell `(event period − cohort period)`.
    * Output: `cohort_p`, `off`, `n_active` (distinct entities from cohort
    * `cohort_p` active `off` periods later). Offset 0 always contains the
    * full cohort.
    *
    * @param periodMicros retention period length in the same integral unit
    *                     as `time` (e.g. 86400000000 for days over micros)
    */
  def cohortRetention(events: DataFrame, entity: String, time: String,
      periodMicros: Long): DataFrame = {
    require(periodMicros > 0, "periodMicros must be positive")
    val e = events.select(col(entity), col(time))
    val anchors = e.groupBy(col(entity))
      .agg(min(col(time)).as("__t0"))
      .select(col(entity), expr(s"__t0 DIV ${periodMicros}L").as("cohort_p"))
    e.join(anchors, Seq(entity))
      .select(col(entity), col("cohort_p"),
        (expr(s"$time DIV ${periodMicros}L") - col("cohort_p")).as("off"))
      .groupBy(col("cohort_p"), col("off"))
      .agg(countDistinct(col(entity)).as("n_active"))
  }

  /** First-order transition matrix: for each entity's event sequence
    * (ordered by `time`, then `tiebreak` for simultaneous events), count
    * the (kind → next kind) transitions and their probability conditioned
    * on the source kind. Terminal events (no successor) drop out.
    *
    * Output: `from_kind`, `to_kind`, `cnt`, `prob` (cnt / Σ cnt per
    * `from_kind`, one double divide rounded to 6 — cross-engine exact).
    */
  def transitionMatrix(events: DataFrame, entity: String, time: String,
      kind: String, tiebreak: Seq[Column]): DataFrame = {
    require(!events.columns.contains("to_kind"),
      "column to_kind collides with transitionMatrix internals; rename first")
    val w = Window.partitionBy(col(entity))
      .orderBy(col(time) +: tiebreak: _*)
    // lead() runs over the unprojected input so `tiebreak` may reference
    // any of its columns; the projection to (from, to) happens after
    val pairs = events
      .withColumn("to_kind", lead(col(kind), 1).over(w))
      .filter(col("to_kind").isNotNull)
      .select(col(kind).as("from_kind"), col("to_kind"))
    val counts = pairs.groupBy(col("from_kind"), col("to_kind"))
      .agg(count(lit(1)).as("cnt"))
    val tot = Window.partitionBy(col("from_kind"))
    counts.withColumn("prob",
      round(col("cnt").cast("double") /
        sum(col("cnt")).over(tot).cast("double"), 6))
  }
}
