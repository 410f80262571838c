package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Stats

/** Wave 9 — portable distributed statistics: trailing-window features,
  * integer-exact trend slopes, Gini diversity, Benford digit audit,
  * weighted medians and the χ² independence table.
  *
  * Same conventions as every wave: identical column aliases in Spark and
  * DuckDB, total ORDER BY, counts CAST to BIGINT in the oracle; every
  * aggregate is an integer (associative, engine-independent) and floats
  * appear only in final per-row projections — short identical IEEE chains
  * rounded to 6 in both engines.
  */
object StatsQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def evMicros(c: String = "ts") = expr(s"$c DIV 1000")

  /** Unique integral tiebreak for lineitem rows (linenumber ∈ 1..7). */
  private val liTie = "l_orderkey * 10 + l_linenumber"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Mergeable approximate quantiles: per-batch fixed-geometry histogram
    // states (integer bin counts — associative, so three batch states
    // merged equal the from-scratch histogram bit-for-bit, the q144
    // contract extended to distributions), quantile estimates read off
    // the merged ≤30-row state with bin-width error. Exact quantiles
    // (q140) must see every row; this is what a 100 TB pipeline keeps
    // BETWEEN full scans.
    "q151_hist_quantiles" -> ((s, dir) => {
      val prices = t(s, dir, "orders")
        .select(floor(col("o_totalprice")).cast("long").as("p"),
          col("o_orderkey"))
      val states = (0 to 2).map { b =>
        graft.operators.Incremental.histState(
          prices.filter(col("o_orderkey") % 3 === b), col("p"),
          lo = 0L, width = 20000L, numBins = 30)
      }
      graft.operators.Incremental.quantilesFromHist(
        graft.operators.Incremental.mergeHistStates(states),
        lo = 0L, width = 20000L,
        qs = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L),
          ("p90", 9L, 10L), ("p99", 99L, 100L)))
        .orderBy(col("qname"))
    }),

    // Trailing 24h activity features per user — RANGE-frame window, no
    // self-join: count (integer) and min/max (observed values) only; a
    // windowed float mean is order-sensitive and deliberately absent.
    "q130_trailing_features" -> ((s, dir) =>
      Stats.trailingWindowFeatures(
        t(s, dir, "events").select(col("event_id"), col("user_id"),
          evMicros().as("t"), col("value")),
        key = "user_id", time = "t", valueCol = "value",
        span = 86400000000L)
        .select(col("event_id"), col("user_id"), col("t"), col("w_cnt"),
          col("w_min"), col("w_max"))
        .orderBy(col("event_id"))),

    // Per-user activity trend: least squares over the (day, daily count)
    // series — integer sums only, slope emitted as the exact rational
    // num/den plus one IEEE division.
    "q131_trend_slope" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("user_id"),
          expr("(ts DIV 1000) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("cnt"))
      Stats.trendSlope(daily, "user_id", "day", "cnt")
        .select(col("user_id"), col("n"), col("slope_num"),
          col("slope_den"), round(col("slope"), 6).as("slope"))
        .orderBy(col("user_id"))
    }),

    // Source concentration per language: Gini diversity 1 − Σc²/N² —
    // the portable (log-free) diversity index.
    "q132_gini_diversity" -> ((s, dir) =>
      Stats.giniDiversity(t(s, dir, "documents"), "lang", "source")
        .select(col("lang"), col("n_cats"), col("n"), col("ssq"),
          round(col("gini"), 6).as("gini"))
        .orderBy(col("lang"))),

    // Benford first-digit audit of order totals per status — digit from
    // the integer part via long→string (integer formatting is identical
    // everywhere; float formatting is not).
    "q133_benford" -> ((s, dir) =>
      Stats.benfordProfile(t(s, dir, "orders"), "o_orderstatus",
        "o_totalprice")
        .select(col("o_orderstatus"), col("digit"), col("cnt"), col("n"),
          round(col("share"), 6).as("share"))
        .orderBy(col("o_orderstatus"), col("digit"))),

    // Quantity-weighted median price per return flag: smallest price with
    // 2·cumulative-quantity ≥ total — cross-multiplied integers, the
    // answer an observed value.
    "q134_weighted_median" -> ((s, dir) =>
      Stats.weightedMedian(t(s, dir, "lineitem"), "l_returnflag",
        "l_extendedprice", weight = col("l_quantity").cast("long"),
        tie = expr(liTie))
        .orderBy(col("l_returnflag"))),

    // Rolling 7-day distinct active users per observed day — the
    // windowed-distinct no frame can express, via the bounded
    // contribution explode (fan-out = 7, independent of user activity).
    "q139_rolling_actives" -> ((s, dir) =>
      Stats.rollingActiveCounts(
        t(s, dir, "events").select(col("user_id"), col("ts")),
        entity = "user_id",
        bucket = expr("(ts DIV 1000) DIV 86400000000"), window = 7)
        .orderBy(col("bucket"))),

    // Exact daily p50/p95 of event values: observed values at ranks
    // ⌈q·n⌉ (integer arithmetic), one window pass serving both quantiles.
    "q140_group_quantiles" -> ((s, dir) =>
      Stats.groupQuantiles(
        t(s, dir, "events").select(
          expr("(ts DIV 1000) DIV 86400000000").as("day"),
          col("value"), col("event_id")),
        group = "day", valueCol = "value", tie = col("event_id"),
        quantiles = Seq(("p50", 1L, 2L), ("p95", 19L, 20L)))
        .orderBy(col("day"), col("q"))),

    // χ² independence table for return flag × line status: integer
    // observed/marginal counts; expected and the χ² contribution are the
    // same 1- and 3-op IEEE chains in both engines.
    "q135_chi2" -> ((s, dir) =>
      Stats.contingencyChi2(t(s, dir, "lineitem"), "l_returnflag",
        "l_linestatus")
        .select(col("l_returnflag"), col("l_linestatus"), col("obs"),
          col("row_tot"), col("col_tot"), col("n"),
          round(col("expected"), 6).as("expected"),
          round(col("chi2"), 6).as("chi2"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )

  val oracles: Map[String, String] = Map(
    "q151_hist_quantiles" ->
      """WITH v AS (
        |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS p FROM orders),
        |b AS (SELECT least(greatest(p // 20000, 0), 29) AS bin FROM v),
        |h AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin),
        |n AS (SELECT sum(cnt) AS n_total FROM h),
        |qs AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2),
        |         ('p75', 3, 4), ('p90', 9, 10), ('p99', 99, 100))
        |         q(qname, num, den)),
        |r AS (SELECT qname, (num * n_total + den - 1) // den AS rank
        |      FROM qs, n),
        |c AS (SELECT bin, cnt,
        |        coalesce(sum(cnt) OVER (ORDER BY bin
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum_before
        |      FROM h)
        |SELECT qname, CAST(rank AS BIGINT) AS rank,
        |  CAST(bin AS BIGINT) AS bin,
        |  CAST(bin * 20000 AS BIGINT) AS bin_lo,
        |  CAST(cum_before AS BIGINT) AS cum_before,
        |  CAST(cnt AS BIGINT) AS bin_count,
        |  round(bin * 20000 +
        |    20000 * ((rank - cum_before)::DOUBLE / cnt), 6) AS est
        |FROM r JOIN c
        |  ON c.cum_before < r.rank AND r.rank <= c.cum_before + c.cnt
        |ORDER BY qname""".stripMargin,
    "q130_trailing_features" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
        |           FROM events)
        |SELECT event_id, user_id, t,
        |  CAST(count(*) OVER w AS BIGINT) AS w_cnt,
        |  min(value) OVER w AS w_min,
        |  max(value) OVER w AS w_max
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY t
        |  RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q131_trend_slope" ->
      """WITH d AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT user_id, count(*) AS n, sum(day) AS sx, sum(cnt) AS sy,
        |         sum(day * cnt) AS sxy, sum(day * day) AS sxx
        |  FROM d GROUP BY user_id)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
        |  CASE WHEN n * sxx - sx * sx <> 0 THEN
        |    round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx), 6)
        |  END AS slope
        |FROM a ORDER BY user_id""".stripMargin,

    "q132_gini_diversity" ->
      """WITH c AS (SELECT lang, source, count(*) AS c
        |           FROM documents GROUP BY 1, 2),
        |a AS (SELECT lang, count(*) AS n_cats, sum(c) AS n,
        |             sum(c * c) AS ssq
        |      FROM c GROUP BY lang)
        |SELECT lang, CAST(n_cats AS BIGINT) AS n_cats,
        |  CAST(n AS BIGINT) AS n, CAST(ssq AS BIGINT) AS ssq,
        |  round(1.0 - ssq::DOUBLE / (n * n), 6) AS gini
        |FROM a ORDER BY lang""".stripMargin,

    "q133_benford" ->
      """WITH d AS (
        |  SELECT o_orderstatus,
        |    substr(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT) AS VARCHAR),
        |           1, 1)::INT AS digit
        |  FROM orders WHERE abs(o_totalprice) >= 1),
        |c AS (SELECT o_orderstatus, digit, count(*) AS cnt
        |      FROM d GROUP BY 1, 2)
        |SELECT o_orderstatus, digit, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(sum(cnt) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n,
        |  round(cnt::DOUBLE /
        |    sum(cnt) OVER (PARTITION BY o_orderstatus), 6) AS share
        |FROM c ORDER BY o_orderstatus, digit""".stripMargin,

    "q134_weighted_median" ->
      s"""WITH r AS (
         |  SELECT l_returnflag, l_extendedprice,
         |    CAST(l_quantity AS BIGINT) AS w, $liTie AS tb
         |  FROM lineitem),
         |c AS (
         |  SELECT *, sum(w) OVER (PARTITION BY l_returnflag
         |      ORDER BY l_extendedprice, tb
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    sum(w) OVER (PARTITION BY l_returnflag) AS tot
         |  FROM r),
         |q AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
         |        ORDER BY l_extendedprice, tb) AS rn
         |      FROM c WHERE cum * 2 >= tot)
         |SELECT l_returnflag, l_extendedprice AS w_median,
         |  CAST(tot AS BIGINT) AS w_total
         |FROM q WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "q139_rolling_actives" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS b
        |  FROM events),
        |days AS (SELECT DISTINCT b AS bucket FROM act),
        |contrib AS (
        |  SELECT user_id, unnest(generate_series(b, b + 6)) AS bucket
        |  FROM act)
        |SELECT c.bucket, CAST(count(DISTINCT c.user_id) AS BIGINT)
        |  AS n_active
        |FROM contrib c JOIN days d ON d.bucket = c.bucket
        |GROUP BY c.bucket ORDER BY c.bucket""".stripMargin,

    "q140_group_quantiles" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, value, event_id
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT day, value,
        |    row_number() OVER (PARTITION BY day ORDER BY value, event_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY day) AS n
        |  FROM e)
        |SELECT day, q, value, CAST(n AS BIGINT) AS n FROM (
        |  SELECT day, 'p50' AS q, value, n, rn,
        |         (n * 1 + 1) // 2 AS want FROM r
        |  UNION ALL
        |  SELECT day, 'p95', value, n, rn, (n * 19 + 19) // 20 FROM r)
        |WHERE rn = want ORDER BY day, q""".stripMargin,

    "q135_chi2" ->
      """WITH cells AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS obs
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (
        |  SELECT *,
        |    sum(obs) OVER (PARTITION BY l_returnflag) AS row_tot,
        |    sum(obs) OVER (PARTITION BY l_linestatus) AS col_tot,
        |    sum(obs) OVER () AS n
        |  FROM cells),
        |x AS (
        |  SELECT *, (row_tot * col_tot)::DOUBLE / n AS expected
        |  FROM m)
        |SELECT l_returnflag, l_linestatus, CAST(obs AS BIGINT) AS obs,
        |  CAST(row_tot AS BIGINT) AS row_tot,
        |  CAST(col_tot AS BIGINT) AS col_tot, CAST(n AS BIGINT) AS n,
        |  round(expected, 6) AS expected,
        |  round((obs - expected) * (obs - expected) / expected, 6) AS chi2
        |FROM x ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
