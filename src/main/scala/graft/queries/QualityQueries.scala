package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Quality
import graft.operators.Skew
import graft.plans.Drift

/** Wave 3 — the declared quality layer (SURVEY.md §2.13), skew-resilient
  * aggregation (§2.14 scale notes) and the set operations (§2.3 parity-plus).
  */
object QualityQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Governance: k-anonymity release gate over a quasi-identifier tuple
    // (segment × nation × balance band) — any combination shared by
    // fewer than 5 customers re-identifies them.
    "q141_k_anonymity" -> ((s, dir) =>
      Quality.kAnonymity(
        t(s, dir, "customer").select(col("c_mktsegment"),
          col("c_nationkey"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_band")),
        quasi = Seq("c_mktsegment", "c_nationkey", "bal_band"), k = 5L)
        .orderBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))),

    // Skew: two-phase salted count must equal the plain groupBy — the salt
    // only changes the shuffle shape (hot keys spread over 8 reducers).
    "q32_salted_mode" -> ((s, dir) =>
      Skew.saltedCount(t(s, dir, "lineitem"), "l_suppkey",
        col("l_orderkey"), saltBuckets = 8)
        .orderBy(desc("cnt"), col("l_suppkey"))
        .limit(20)),

    // Quality: mandatory-key audit (null PKs are data, not exceptions).
    "q33_null_audit" -> ((s, dir) =>
      Quality.mandatoryKeyAudit(t(s, dir, "orders"), "o_custkey")),

    // Quality: referential integrity — orphan counts per relationship.
    "q34_fk_orphans" -> ((s, dir) => {
      val li = Quality.fkOrphans(t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders"), "o_orderkey")
        .agg(count(lit(1)).as("orphans"))
        .select(lit("lineitem_orders").as("rel"), col("orphans"))
      val oc = Quality.fkOrphans(t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer"), "c_custkey")
        .agg(count(lit(1)).as("orphans"))
        .select(lit("orders_customer").as("rel"), col("orphans"))
      li.unionAll(oc).orderBy(col("rel"))
    }),

    // Set ops (INTERSECT distinct-semantics, like the SQL operator).
    "q35_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderkey") % 2 === 0).select(col("o_orderkey"))
        .intersect(o.filter(col("o_orderkey") % 3 === 0).select(col("o_orderkey")))
        .orderBy(col("o_orderkey"))
    }),

    "q36_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderkey") % 3 === 0).select(col("o_orderkey"))
        .except(o.filter(col("o_orderkey") % 2 === 0).select(col("o_orderkey")))
        .orderBy(col("o_orderkey"))
    }),

    // Quality: one-pass numeric profile — every column's count/nulls/
    // distinct/min/max/mean from a SINGLE aggregate job (the naive
    // per-column loop scans the table N times).
    "q60_profile" -> ((s, dir) =>
      Quality.numericProfile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"))
        .orderBy(col("col_name"))),

    // Run-over-run volume drift (notebook cell 17: ±30% deltas): the
    // "previous batch" drops half the F rows and a tenth of the O rows,
    // so the current batch reads as DRIFT for F (+~100%), OK for O
    // (+~11%) and OK for P — all three verdict paths on real groups.
    "q70_volume_drift" -> ((s, dir) =>
      Drift.volumeDrift(prevBatch(s, dir), t(s, dir, "orders"),
        keys = Seq("o_orderstatus"), tolerance = 0.3)
        .orderBy(col("o_orderstatus"))),

    // Category-distribution drift over the same two batches:
    // volume-independent shares, so the mix shift (F under-represented
    // in prev) flags while near-constant shares stay quiet.
    "q71_category_drift" -> ((s, dir) =>
      Drift.categoryDrift(prevBatch(s, dir), t(s, dir, "orders"),
        category = "o_orderstatus", tolerance = 0.05)
        .orderBy(col("o_orderstatus"))),

    // Skew detection BEFORE mitigation: hot-key report with integer-exact
    // heavy/skewed verdicts (cross-multiplied comparisons) — the numbers
    // that decide between a plain hash join and salting/AQE skew-join.
    "q117_skew_report" -> ((s, dir) =>
      Skew.skewReport(t(s, dir, "lineitem"), col("l_suppkey"),
        topK = 20, heavyDen = 500L, skewFactor = 2L)
        .orderBy(col("cnt").desc, col("key"))),

    // Distribution-shape drift: L1 distance between doc-length histograms
    // of two snapshots — catches the profile shift that volume and
    // category drift both miss. Cross-multiplied integers, one division.
    "q118_histogram_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Drift.histogramDrift(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 13 =!= 0),
        (col("n_chars") - pmod(col("n_chars"), lit(200L))).as("bucket"))
        .orderBy(col("bucket"))
    })
  )

  /** Fixture "previous batch": orders with half of F and a tenth of O
    * removed — a deterministic mix shift for the drift queries. */
  private def prevBatch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(!(col("o_orderstatus") === "F" && col("o_orderkey") % 2 === 0) &&
        !(col("o_orderstatus") === "O" && col("o_orderkey") % 10 === 0))

  val oracles: Map[String, String] = Map(
    "q141_k_anonymity" ->
      """SELECT c_mktsegment, c_nationkey,
        |  CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
        |  CAST(count(*) AS BIGINT) AS group_sz,
        |  count(*) >= 5 AS anonymous
        |FROM customer
        |GROUP BY 1, 2, 3
        |ORDER BY c_mktsegment, c_nationkey, bal_band""".stripMargin,

    "q117_skew_report" ->
      """WITH c AS (
        |  SELECT l_suppkey AS key, count(*) AS cnt
        |  FROM lineitem GROUP BY l_suppkey),
        |t AS (SELECT sum(cnt) AS n_rows, count(*) AS n_keys FROM c)
        |SELECT key, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(n_rows AS BIGINT) AS n_rows, CAST(n_keys AS BIGINT) AS n_keys,
        |  cnt * 500 > n_rows AS heavy,
        |  cnt * n_keys > n_rows * 2 AS skewed
        |FROM c CROSS JOIN t
        |ORDER BY cnt DESC, key LIMIT 20""".stripMargin,

    "q118_histogram_drift" ->
      """WITH a AS (
        |  SELECT n_chars - n_chars % 200 AS bucket, count(*) AS n_prev
        |  FROM documents WHERE doc_id % 17 <> 0 GROUP BY 1),
        |b AS (
        |  SELECT n_chars - n_chars % 200 AS bucket, count(*) AS n_cur
        |  FROM documents WHERE doc_id % 13 <> 0 GROUP BY 1),
        |j AS (
        |  SELECT coalesce(a.bucket, b.bucket) AS bucket,
        |    coalesce(n_prev, 0) AS n_prev, coalesce(n_cur, 0) AS n_cur
        |  FROM a FULL OUTER JOIN b ON a.bucket = b.bucket),
        |w AS (
        |  SELECT bucket, n_prev, n_cur,
        |    sum(n_prev) OVER () AS tp, sum(n_cur) OVER () AS tc,
        |    abs(n_prev * sum(n_cur) OVER () - n_cur * sum(n_prev) OVER ())
        |      AS num_abs
        |  FROM j)
        |SELECT bucket, CAST(n_prev AS BIGINT) AS n_prev,
        |  CAST(n_cur AS BIGINT) AS n_cur,
        |  round(num_abs::DOUBLE / (tp * tc)::DOUBLE, 6) AS share_diff,
        |  round((sum(num_abs) OVER ())::DOUBLE / (tp * tc)::DOUBLE, 6) AS l1
        |FROM w ORDER BY bucket""".stripMargin,

    "q32_salted_mode" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY cnt DESC, l_suppkey LIMIT 20""".stripMargin,

    "q33_null_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        |       CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT) AS null_keys,
        |       CASE WHEN count(CASE WHEN o_custkey IS NULL THEN 1 END) = 0
        |            THEN 'OK' ELSE 'ERROR' END AS estado
        |FROM orders""".stripMargin,

    "q34_fk_orphans" ->
      """SELECT * FROM (
        |  SELECT 'lineitem_orders' AS rel, CAST(count(*) AS BIGINT) AS orphans
        |  FROM lineitem
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |  UNION ALL
        |  SELECT 'orders_customer' AS rel, CAST(count(*) AS BIGINT) AS orphans
        |  FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
        |ORDER BY rel""".stripMargin,

    "q35_intersect" ->
      """SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0
        |INTERSECT
        |SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q36_except" ->
      """SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0
        |EXCEPT
        |SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q60_profile" -> Seq("l_orderkey", "l_partkey", "l_quantity",
      "l_extendedprice").map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS BIGINT) AS nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  round(min($c::DOUBLE), 4) AS min_v,
         |  round(max($c::DOUBLE), 4) AS max_v,
         |  round(avg($c::DOUBLE), 4) AS avg_v
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    "q70_volume_drift" ->
      s"""WITH prev AS ($prevBatchSql),
         |p AS (SELECT o_orderstatus, count(*) AS prev_rows FROM prev GROUP BY 1),
         |c AS (SELECT o_orderstatus, count(*) AS cur_rows FROM orders GROUP BY 1)
         |SELECT coalesce(p.o_orderstatus, c.o_orderstatus) AS o_orderstatus,
         |  CAST(coalesce(prev_rows, 0) AS BIGINT) AS prev_rows,
         |  CAST(coalesce(cur_rows, 0) AS BIGINT) AS cur_rows,
         |  CASE WHEN coalesce(prev_rows, 0) > 0
         |    THEN round((coalesce(cur_rows, 0) - prev_rows)::DOUBLE / prev_rows, 4)
         |  END AS delta_ratio,
         |  CASE WHEN coalesce(prev_rows, 0) = 0 THEN 'NEW'
         |       WHEN coalesce(cur_rows, 0) = 0 THEN 'GONE'
         |       WHEN abs((coalesce(cur_rows, 0) - prev_rows)::DOUBLE / prev_rows) > 0.3
         |         THEN 'DRIFT'
         |       ELSE 'OK' END AS status
         |FROM p FULL OUTER JOIN c ON p.o_orderstatus = c.o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,

    "q71_category_drift" ->
      s"""WITH prev AS ($prevBatchSql),
         |p AS (SELECT o_orderstatus,
         |        count(*)::DOUBLE / (SELECT count(*) FROM prev) AS ps
         |      FROM prev GROUP BY 1),
         |c AS (SELECT o_orderstatus,
         |        count(*)::DOUBLE / (SELECT count(*) FROM orders) AS cs
         |      FROM orders GROUP BY 1)
         |SELECT coalesce(p.o_orderstatus, c.o_orderstatus) AS o_orderstatus,
         |  round(coalesce(ps, 0), 4) AS prev_share,
         |  round(coalesce(cs, 0), 4) AS cur_share,
         |  round(coalesce(cs, 0) - coalesce(ps, 0), 4) AS share_delta,
         |  abs(coalesce(cs, 0) - coalesce(ps, 0)) > 0.05 AS drifted
         |FROM p FULL OUTER JOIN c ON p.o_orderstatus = c.o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
  )

  // def, not val: interpolated by `oracles` above, which would see a null
  // from a val declared textually later (object init order)
  private def prevBatchSql =
    """SELECT * FROM orders
      |WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 2 = 0)
      |  AND NOT (o_orderstatus = 'O' AND o_orderkey % 10 = 0)""".stripMargin
}
