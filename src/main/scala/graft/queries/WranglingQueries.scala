package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Affinity, FuzzyMatch, GapFill, Robust, Sampling, Scd}

/** Wave 8 — relational wrangling at scale: co-occurrence mining, fuzzy
  * entity matching, robust (median/MAD) statistics, dense-grid resampling,
  * weighted priority sampling and SCD-2 dimension history.
  *
  * Same conventions as every wave: identical column aliases in Spark and
  * DuckDB, total ORDER BY, counts CAST to BIGINT in the oracle, every
  * float one IEEE operation chain away from exact integers (single
  * divides, rounded to 6 in both engines) or copied verbatim from data.
  */
object WranglingQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** events.ts is TIMESTAMP(NANOS) read as a raw nanos long (see
    * Sessions); integer DIV bridges to DuckDB's epoch_us(ts). */
  private def evMicros(c: String = "ts") = expr(s"$c DIV 1000")

  /** q123 fixture: every 7th customer's name with one digit deleted at a
    * key-dependent position — the "dirty OCR batch" to match back against
    * the clean registry. Names are `Customer#` + 9 digits; the deletion
    * hits digit (c_custkey % 9). */
  private def dirtyFixture(c: DataFrame): DataFrame = {
    val pos = lit(10) + (col("c_custkey") % 9).cast("int") // 1-indexed
    c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("d_id"),
        concat(col("c_name").substr(lit(1), pos - 1),
          col("c_name").substr(pos + 1, length(col("c_name")) - pos))
          .as("d_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Market-basket pair affinity over order baskets: support, both
    // confidences and lift — integer counts, one divide each, the basket
    // total a broadcast 1-row aggregate. Pair fan-out bounded by the
    // basket-size cap BEFORE the self-join.
    "q122_basket_pairs" -> ((s, dir) =>
      Affinity.pairSupport(t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 2L)
        .select(col("i1"), col("i2"), col("support"), col("n1"), col("n2"),
          round(col("conf1"), 6).as("conf1"),
          round(col("conf2"), 6).as("conf2"),
          round(col("lift"), 6).as("lift"))
        .orderBy(col("i1"), col("i2"))),

    // Fuzzy entity matching: dirty records (one deleted digit) matched to
    // the clean registry via deletion-neighborhood (FastSS) blocking —
    // a complete distance-1 candidate set from pure equi-joins, verified
    // with one levenshtein per distinct candidate. Never a cross join.
    "q123_fuzzy_match" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      FuzzyMatch.distance1Join(
        dirtyFixture(cust), "d_id", "d_name",
        cust.select(col("c_custkey").as("c_id"), col("c_name")), "c_id",
        "c_name")
        .select(col("d_id"), col("c_id"), col("dist"))
        .orderBy(col("d_id"), col("c_id"))
    }),

    // Sorted-neighborhood matching: rank everyone by name (distributed
    // exact rank — no single-partition window), compare each record to
    // its next 3 neighbors only (bucketed rank join, fan-out = window),
    // verify with levenshtein ≤ 1.
    "q143_sorted_neighborhood" -> ((s, dir) =>
      FuzzyMatch.sortedNeighborhoodPairs(
        t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name", sortKey = col("c_name"), window = 3,
        maxDist = 1)
        .orderBy(col("d1"), col("d2"))),

    // Robust per-type value statistics: lower median, MAD and the
    // |x−med| > 3·MAD outlier count — the 50%-breakdown-point quality
    // gate. All windows partitioned by the group; medians are observed
    // data values, so every output is portable verbatim.
    "q124_robust_stats" -> ((s, dir) =>
      Robust.groupRobustStats(t(s, dir, "events"), "event_type", "value",
        tie = col("event_id"), factor = 3.0)
        .select(col("event_type"), col("n"),
          round(col("median"), 6).as("median"), round(col("mad"), 6).as("mad"),
          col("n_outliers"))
        .orderBy(col("event_type"))),

    // Dense daily panel per user with LOCF fill: the date-spine resample.
    // Spine = users × global day span (span is a broadcast 1-row
    // aggregate); per-(user, day) last observation picked by ONE
    // max-of-struct aggregate; fill is one per-user window.
    "q125_grid_resample" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), evMicros().as("t"), col("event_id"),
          col("value"))
      GapFill.gridLocf(ev, Seq("user_id"),
        expr("t DIV 86400000000"), Seq(col("t"), col("event_id")), "value")
        .orderBy(col("user_id"), col("bucket"))
    }),

    // Weighted priority sample: 200 docs, inclusion odds ∝ n_chars, fully
    // deterministic (hash-priority top-k, one IEEE divide per row — both
    // engines compute the identical double and the identical sample).
    // Priority stays UNROUNDED: the quotient is bit-exact by construction,
    // while round-to-6 at 1e11 magnitude is not decimal-representable and
    // the engines' rounding modes would diverge by an ulp.
    "q127_weighted_sample" -> ((s, dir) =>
      Sampling.weightedPrioritySample(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        key = col("doc_id").cast("string"), weight = col("n_chars"),
        k = 200, tie = col("doc_id"))
        .select(col("doc_id"), col("n_chars"), col("priority"))
        .orderBy(col("doc_id"))),

    // Incremental aggregate maintenance: three batch states merged by
    // re-aggregation equal the from-scratch aggregation bit-for-bit —
    // the oracle computes direct, Spark computes via the merge path.
    "q144_incremental_agg" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
      val states = (0 to 2).map { b =>
        graft.operators.Incremental.aggState(
          docs.filter(col("doc_id") % 3 === b), "source", "n_chars")
      }
      graft.operators.Incremental.withMean(
        graft.operators.Incremental.mergeStates("source", states))
        .select(col("source"), col("cnt"), col("sum_v"), col("min_v"),
          col("max_v"), round(col("mean_v"), 6).as("mean_v"))
        .orderBy(col("source"))
    }),

    // SCD-2 dimension history from three stacked snapshots: change points
    // by null-safe lag compare, versions by running change count,
    // validity intervals closed by lead — three key-partitioned passes.
    "q129_scd2_history" -> ((s, dir) =>
      scd2Fixture(s, dir)
        .select(col("o_orderkey"), col("ver"), col("status"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("o_orderkey"), col("ver"))),

    // Effective-dated lookup: each fact joined to the dimension version
    // valid AT ITS TIME (equi-join on the key, interval as a residual
    // predicate — per-fact fan-out bounded by the key's version count).
    // Facts probe at t = o_orderkey % 3, spanning every batch epoch.
    "q142_temporal_lookup" -> ((s, dir) => {
      val facts = t(s, dir, "orders")
        .select(col("o_orderkey").as("fact_key"),
          (col("o_orderkey") % 3).as("t"))
      Scd.lookupAsOf(scd2Fixture(s, dir)
          .withColumnRenamed("o_orderkey", "k"),
        facts.withColumnRenamed("fact_key", "k"), "k", "t")
        .select(col("k").as("o_orderkey"), col("t"), col("status"),
          col("ver"), col("valid_from"))
        .orderBy(col("o_orderkey"))
    })
  )

  /** q129/q142 fixture: SCD-2 history over three synthetic snapshots of
    * orders (batch b mutates keys with (key + b) % 4 == 0). */
  private def scd2Fixture(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val snaps = (0 to 2).map { b =>
      base.select(col("o_orderkey"),
        when((col("o_orderkey") + b) % 4 === 0,
          concat(lit("X"), lit(b.toLong).cast("string")))
          .otherwise(col("o_orderstatus")).as("status"),
        lit(b.toLong).as("batch"))
    }.reduce(_ unionAll _)
    Scd.scd2History(snaps, "o_orderkey", Seq("status"), "batch")
  }

  val oracles: Map[String, String] = Map(
    "q122_basket_pairs" ->
      """WITH m AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |           FROM lineitem),
        |ok AS (SELECT bk FROM (SELECT bk, count(*) AS c FROM m GROUP BY bk)
        |       WHERE c <= 1000),
        |mm AS (SELECT m.* FROM m JOIN ok USING (bk)),
        |nb AS (SELECT count(DISTINCT bk) AS n_baskets FROM mm),
        |f AS (SELECT it, count(*) AS n_it FROM mm GROUP BY it),
        |p AS (SELECT a.it AS i1, b.it AS i2, count(*) AS support
        |      FROM mm a JOIN mm b ON a.bk = b.bk AND a.it < b.it
        |      GROUP BY 1, 2)
        |SELECT i1, i2, CAST(support AS BIGINT) AS support,
        |  CAST(f1.n_it AS BIGINT) AS n1, CAST(f2.n_it AS BIGINT) AS n2,
        |  round(support::DOUBLE / f1.n_it, 6) AS conf1,
        |  round(support::DOUBLE / f2.n_it, 6) AS conf2,
        |  round((support * n_baskets)::DOUBLE / (f1.n_it * f2.n_it), 6)
        |    AS lift
        |FROM p JOIN f f1 ON f1.it = p.i1 JOIN f f2 ON f2.it = p.i2, nb
        |WHERE support >= 2 ORDER BY i1, i2""".stripMargin,

    // Complete for this pair universe: every true match has lengths 17 vs
    // 18, so lev ≤ 1 ⟺ the dirty string IS a single-deletion variant of
    // the clean one — the same equivalence the operator's variant join
    // exploits, minus the length-incompatible key combinations that can
    // never collide.
    "q123_fuzzy_match" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS d_id,
        |    substr(c_name, 1, 9 + (c_custkey % 9)::INT) ||
        |    substr(c_name, 11 + (c_custkey % 9)::INT) AS d_name
        |  FROM customer WHERE c_custkey % 7 = 0),
        |cv AS (
        |  SELECT c_custkey AS c_id, c_name,
        |    substr(c_name, 1, i.i - 1) || substr(c_name, i.i + 1) AS v
        |  FROM customer, generate_series(1, 18) AS i(i)),
        |cand AS (
        |  SELECT DISTINCT d_id, c_id, d_name, c_name
        |  FROM dirty JOIN cv ON cv.v = dirty.d_name)
        |SELECT d_id, c_id, CAST(levenshtein(d_name, c_name) AS BIGINT)
        |  AS dist
        |FROM cand WHERE levenshtein(d_name, c_name) <= 1
        |ORDER BY d_id, c_id""".stripMargin,

    "q143_sorted_neighborhood" ->
      """WITH r AS (
        |  SELECT c_custkey AS id, c_name AS s,
        |    row_number() OVER (ORDER BY c_name, c_custkey) AS rnk
        |  FROM customer)
        |SELECT a.id AS d1, b.id AS d2,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY d1, d2""".stripMargin,

    "q124_robust_stats" ->
      """WITH v AS (SELECT event_type, value AS x, event_id FROM events
        |           WHERE value IS NOT NULL),
        |m AS (SELECT event_type, x AS median, n FROM (
        |    SELECT event_type, x,
        |      row_number() OVER (PARTITION BY event_type ORDER BY x, event_id)
        |        AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM v)
        |  WHERE rn = (n + 1) // 2),
        |d AS (SELECT v.event_type, v.event_id, abs(v.x - m.median) AS dev
        |      FROM v JOIN m USING (event_type)),
        |md AS (SELECT event_type, dev AS mad FROM (
        |    SELECT event_type, dev,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY dev, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM d)
        |  WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, CAST(m.n AS BIGINT) AS n,
        |  round(m.median, 6) AS median, round(md.mad, 6) AS mad,
        |  CAST(sum(CASE WHEN d.dev > md.mad * 3.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN m USING (event_type) JOIN md USING (event_type)
        |GROUP BY d.event_type, m.n, m.median, md.mad
        |ORDER BY event_type""".stripMargin,

    "q125_grid_resample" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id, value,
        |         epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |p AS (SELECT user_id, day, value FROM (
        |    SELECT user_id, day, value,
        |      row_number() OVER (PARTITION BY user_id, day
        |        ORDER BY t DESC, event_id DESC) AS rn
        |    FROM e)
        |  WHERE rn = 1),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
        |g AS (SELECT u.user_id, unnest(generate_series(span.lo, span.hi))
        |        AS bucket
        |      FROM (SELECT DISTINCT user_id FROM e) u, span)
        |SELECT g.user_id, g.bucket, p.value IS NOT NULL AS observed,
        |  last_value(p.value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        |FROM g LEFT JOIN p ON p.user_id = g.user_id AND p.day = g.bucket
        |ORDER BY g.user_id, g.bucket""".stripMargin,

    "q127_weighted_sample" ->
      """SELECT doc_id, n_chars, priority FROM (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT::DOUBLE
        |      / n_chars::DOUBLE AS priority
        |  FROM documents
        |  ORDER BY priority, doc_id LIMIT 200)
        |ORDER BY doc_id""".stripMargin,

    "q144_incremental_agg" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_v,
        |  CAST(min(n_chars) AS BIGINT) AS min_v,
        |  CAST(max(n_chars) AS BIGINT) AS max_v,
        |  round(sum(n_chars)::DOUBLE / count(*), 6) AS mean_v
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q142_temporal_lookup" ->
      """WITH s AS (
        |  SELECT o_orderkey, r.b AS batch,
        |    CASE WHEN (o_orderkey + r.b) % 4 = 0 THEN 'X' || r.b::VARCHAR
        |         ELSE o_orderstatus END AS status
        |  FROM orders, range(0, 3) AS r(b)),
        |c AS (SELECT *,
        |    CASE WHEN lag(status) OVER (PARTITION BY o_orderkey
        |           ORDER BY batch) IS NOT DISTINCT FROM status
        |         THEN 0 ELSE 1 END AS chg
        |  FROM s),
        |v AS (SELECT *, sum(chg) OVER (PARTITION BY o_orderkey ORDER BY batch
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
        |  FROM c),
        |g AS (SELECT o_orderkey, ver, status,
        |        CAST(min(batch) AS BIGINT) AS valid_from
        |      FROM v GROUP BY 1, 2, 3),
        |h AS (SELECT o_orderkey, CAST(ver AS BIGINT) AS ver, status,
        |        valid_from,
        |        lead(valid_from) OVER (PARTITION BY o_orderkey
        |          ORDER BY valid_from) AS valid_to
        |      FROM g),
        |f AS (SELECT o_orderkey, o_orderkey % 3 AS t FROM orders)
        |SELECT f.o_orderkey, f.t, h.status, h.ver, h.valid_from
        |FROM f LEFT JOIN h
        |  ON h.o_orderkey = f.o_orderkey AND h.valid_from <= f.t
        |  AND (h.valid_to IS NULL OR f.t < h.valid_to)
        |ORDER BY f.o_orderkey""".stripMargin,

    "q129_scd2_history" ->
      """WITH s AS (
        |  SELECT o_orderkey, r.b AS batch,
        |    CASE WHEN (o_orderkey + r.b) % 4 = 0 THEN 'X' || r.b::VARCHAR
        |         ELSE o_orderstatus END AS status
        |  FROM orders, range(0, 3) AS r(b)),
        |c AS (SELECT *,
        |    CASE WHEN lag(status) OVER (PARTITION BY o_orderkey
        |           ORDER BY batch) IS NOT DISTINCT FROM status
        |         THEN 0 ELSE 1 END AS chg
        |  FROM s),
        |v AS (SELECT *, sum(chg) OVER (PARTITION BY o_orderkey ORDER BY batch
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
        |  FROM c),
        |g AS (SELECT o_orderkey, ver, status,
        |        CAST(min(batch) AS BIGINT) AS valid_from
        |      FROM v GROUP BY 1, 2, 3)
        |SELECT o_orderkey, CAST(ver AS BIGINT) AS ver, status, valid_from,
        |  lead(valid_from) OVER (PARTITION BY o_orderkey ORDER BY valid_from)
        |    AS valid_to,
        |  lead(valid_from) OVER (PARTITION BY o_orderkey ORDER BY valid_from)
        |    IS NULL AS is_current
        |FROM g ORDER BY o_orderkey, ver""".stripMargin
  )
}
