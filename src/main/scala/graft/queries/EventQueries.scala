package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, Funnel, RangeJoin}

/** Wave 5a — event-sequence analytics graded round 6: ordered funnels,
  * cohort retention, the first-order transition matrix, and the
  * interval×interval overlap join.
  *
  * Same conventions as every wave: identical column aliases in Spark and
  * DuckDB, total ORDER BY, all time arithmetic integral (epoch micros),
  * counts CAST to BIGINT in the oracle, probabilities produced by ONE
  * double divide rounded to 6 in both engines.
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** events.ts is TIMESTAMP(NANOS) read as a raw nanos long (see
    * Sessions); integer DIV bridges to DuckDB's epoch_us(ts). */
  private def evMicros(c: String = "ts") = expr(s"$c DIV 1000")

  private val funnelSteps = Seq("view", "click", "purchase")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered funnel: first view, first click after it, first purchase
    // after that — one row per user who viewed, with stall-aware stage.
    "q89_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), evMicros().as("t"), col("event_type"))
      Funnel.funnelTimes(ev, "user_id", "t", "event_type", funnelSteps)
        .orderBy(col("user_id"))
    }),

    // Cohort retention: users anchored to the day of their first event,
    // distinct-active counts at each day offset.
    "q90_cohort_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), evMicros().as("t"))
      Funnel.cohortRetention(ev, "user_id", "t", 86400000000L)
        .orderBy(col("cohort_p"), col("off"))
    }),

    // First-order Markov transition matrix over each user's event
    // sequence (time order, event_id tiebreak — same total order as q42).
    "q91_transition_matrix" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), evMicros().as("t"),
          col("event_type"), col("event_id"))
      Funnel.transitionMatrix(ev, "user_id", "t", "event_type",
        Seq(col("event_id")))
        .orderBy(col("from_kind"), col("to_kind"))
    }),

    // Interval overlap join: every ~97th event opens a (1..7)-hour
    // maintenance window; find all concurrent window pairs. The bucketed
    // self-join with the emit-once rule — a naive `ON overlap` predicate
    // plans as a nested loop.
    "q92_interval_overlap" -> ((s, dir) => {
      val iv = t(s, dir, "events")
        .filter(col("event_id") % 97 === 0)
        .select(col("event_id").as("iv_id"), evMicros().as("s_us"),
          (evMicros() + (col("event_id") % 7 + 1) * 3600000000L).as("e_us"))
      val a = iv.select(col("iv_id").as("a_id"), col("s_us").as("a_s"),
        col("e_us").as("a_e"))
      val b = iv.select(col("iv_id").as("b_id"), col("s_us").as("b_s"),
        col("e_us").as("b_e"))
      RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e",
        bucketWidth = 3600000000L)
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          (least(col("a_e"), col("b_e")) -
            greatest(col("a_s"), col("b_s"))).as("overlap_us"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Last-touch attribution: each purchase matched to the user's most
    // recent view at-or-before it, within a 24h staleness window — the
    // as-of join consumed the way a marketing pipeline consumes it.
    // Ties on view time resolve to the greatest view id (asOf contract).
    "q102_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), evMicros().as("t"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          evMicros().as("view_t"))
      AsOfJoin.asOfWithin(purchases, views, key = "user_id",
        leftTime = "t", rightTime = "view_t",
        payload = Seq("view_t", "view_id"),
        matchTime = "view_t", tolerance = 86400000000L,
        rightOrder = Seq(col("view_id")))
        .withColumn("gap_us",
          when(col("view_t").isNotNull, col("t") - col("view_t")))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q89_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND t > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND t > t2 GROUP BY e.user_id)
        |SELECT s1.user_id, t1, t2, t3,
        |  CAST(1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT AS BIGINT)
        |    AS stage
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q90_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        |f AS (SELECT user_id, min(t) // 86400000000 AS cohort_p
        |      FROM e GROUP BY user_id)
        |SELECT cohort_p, (t // 86400000000) - cohort_p AS off,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM e JOIN f USING (user_id)
        |GROUP BY cohort_p, off ORDER BY cohort_p, off""".stripMargin,

    "q91_transition_matrix" ->
      """WITH e AS (SELECT user_id, event_id, event_type AS from_kind,
        |             epoch_us(ts) AS t FROM events),
        |p AS (SELECT from_kind, lead(from_kind) OVER (
        |        PARTITION BY user_id ORDER BY t, event_id) AS to_kind
        |      FROM e),
        |c AS (SELECT from_kind, to_kind, CAST(count(*) AS BIGINT) AS cnt
        |      FROM p WHERE to_kind IS NOT NULL GROUP BY from_kind, to_kind)
        |SELECT from_kind, to_kind, cnt,
        |  round(cnt::DOUBLE / (sum(cnt) OVER (PARTITION BY from_kind))::DOUBLE,
        |        6) AS prob
        |FROM c ORDER BY from_kind, to_kind""".stripMargin,

    "q92_interval_overlap" ->
      """WITH iv AS (
        |  SELECT event_id AS iv_id, epoch_us(ts) AS s_us,
        |         epoch_us(ts) + (event_id % 7 + 1) * 3600000000 AS e_us
        |  FROM events WHERE event_id % 97 = 0)
        |SELECT a.iv_id AS a_id, b.iv_id AS b_id,
        |  least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us
        |FROM iv a JOIN iv b
        |  ON a.iv_id < b.iv_id AND a.s_us < b.e_us AND b.s_us < a.e_us
        |ORDER BY a_id, b_id""".stripMargin,

    "q102_attribution" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_t
        |      FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT p.event_id, v.view_t, v.view_id,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY v.view_t DESC, v.view_id DESC) AS rnk
        |  FROM p JOIN v
        |    ON p.user_id = v.user_id AND v.view_t <= p.t)
        |SELECT p.event_id, p.user_id, p.t,
        |  CASE WHEN p.t - m.view_t <= 86400000000 THEN m.view_t END AS view_t,
        |  CASE WHEN p.t - m.view_t <= 86400000000 THEN m.view_id END AS view_id,
        |  CASE WHEN p.t - m.view_t <= 86400000000 THEN p.t - m.view_t END
        |    AS gap_us
        |FROM p LEFT JOIN (SELECT * FROM m WHERE rnk = 1) m
        |  USING (event_id)
        |ORDER BY p.event_id""".stripMargin
  )
}
