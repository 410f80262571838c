package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Upsert}

/** Wave 1 — the reference's relational surface (SURVEY.md §2.1–2.7) expressed
  * over the driver testdata, each with a DuckDB-equivalent oracle.
  *
  * Conventions (driver contract, see the builder brief):
  *  - every output column is explicitly aliased, with the same name in the
  *    Spark plan and the oracle SQL;
  *  - every query ends with a deterministic ORDER BY (total tiebreak);
  *  - double aggregates are rounded in BOTH engines (sum order differs, the
  *    last ulp must not leak into the hash);
  *  - counts/sums of integers are CAST(... AS BIGINT) in the oracle so DuckDB
  *    does not widen to HUGEINT where Spark has LongType.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Shared fixture: positional union of two overlapping slices of `orders`
    * with an explicit source-priority column (SURVEY.md §2.3 U1 — concat
    * order encodes dedup priority, made explicit for determinism). */
  private def ordersUnion(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        lit(1).as("source_priority"))
    val b = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        lit(2).as("source_priority"))
    a.unionAll(b)
  }

  private val ordersUnionSql =
    """SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS source_priority
      |FROM orders WHERE o_orderkey % 3 = 0
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice, 2 AS source_priority
      |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin

  /** Shared fixture for the upsert family: `base` = every 3rd order,
    * `new` = every 2nd order re-priced (the "updated" rows).
    *
    * The reprice multiplier is 1.5 — binary-exact (3/2^1), so the reprice is
    * a single IEEE-754 double multiply that yields bitwise-identical results
    * in Spark and DuckDB with no rounding step. (Round-1 used
    * `round(x * 1.1, 2)`, whose HALF_UP-on-shortest-rendering semantics in
    * Spark diverged from DuckDB's raw-binary rounding on ~9/7500 boundary
    * rows — SURVEY.md §7.4 watch-item 2.) */
  private def upsertBase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def upsertNew(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice") * lit(1.5)).as("o_totalprice"))

  private val upsertCte =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |nw AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         o_totalprice * 1.5::DOUBLE AS o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 0)""".stripMargin

  private val mergedSql =
    """merged AS (
      |  SELECT * FROM nw
      |  UNION ALL
      |  SELECT b.* FROM base b
      |  WHERE NOT EXISTS (SELECT 1 FROM nw WHERE nw.o_orderkey = b.o_orderkey))""".stripMargin

  // ---------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P1/P2: scan with filter + projection, both pushed into the parquet
    // reader (verify: PushedFilters/ReadSchema in .explain).
    // Cutoff chosen inside the testdata's 1995–2001 shipdate range so the
    // filter selects a real subset (a 0-row result verifies nothing).
    "q01_scan_filter_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-06-01 00:00:00")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), to_date(col("l_shipdate")).as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // U1: positional union with explicit source priority.
    "q02_union_priority" -> ((s, dir) =>
      ordersUnion(s, dir).orderBy(col("o_orderkey"), col("source_priority"))),

    // D1: duplicate count by key over the union.
    "q03_dup_count" -> ((s, dir) =>
      Dedup.duplicateCount(ordersUnion(s, dir), "o_orderkey")),

    // D2/D3: deterministic keep-first dedup (window, priority order).
    "q04_dedup_keep_first" -> ((s, dir) =>
      Dedup.keepFirst(ordersUnion(s, dir), Seq("o_orderkey"), Seq(col("source_priority")))
        .orderBy(col("o_orderkey"))),

    // D4: DISTINCT ON with explicit TOTAL tiebreak. The testdata lineitem has
    // duplicate (l_orderkey, l_linenumber) pairs, so l_linenumber alone is
    // not a total order — extend to (l_linenumber, l_partkey, l_quantity),
    // which is measured-unique per orderkey (SURVEY.md §7.4 watch-item 1).
    "q05_distinct_on" -> ((s, dir) =>
      Dedup.distinctOn(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_quantity")),
        Seq("l_orderkey"),
        Seq(col("l_linenumber"), col("l_partkey"), col("l_quantity")))
        .orderBy(col("l_orderkey"))),

    // D5/T1: most-duplicated keys, top-20 with tiebreak.
    "q06_mode_topk" -> ((s, dir) =>
      Dedup.modeTopK(t(s, dir, "lineitem"), "l_partkey", 20)),

    // J1: left-semi — parts that are referenced by at least one lineitem.
    "q07_semi_join" -> ((s, dir) => {
      val p = t(s, dir, "part")
      p.join(t(s, dir, "lineitem"), p("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    }),

    // J2: left-anti — parts never ordered in bulk (quantity > 45). The
    // probe-side filter both makes the result non-empty (every part has
    // *some* lineitem in the testdata) and shrinks the shuffled side, the
    // same pre-filter a 100 TB anti join wants.
    "q08_anti_join" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val bulk = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      p.join(bulk, p("p_partkey") === bulk("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),

    // J3: upsert merge — new wins on key conflict, old rows preserved.
    "q09_upsert_merge" -> ((s, dir) =>
      Upsert.upsert(upsertBase(s, dir), upsertNew(s, dir), "o_orderkey")
        .orderBy(col("o_orderkey"))),

    // O1/A1: one-row stage audit (base/new/updates/inserts/final) in a
    // single full-outer-join pass — no caching needed, nothing to unpersist.
    "q10_upsert_audit" -> ((s, dir) =>
      Upsert.audit(upsertBase(s, dir), upsertNew(s, dir), "o_orderkey")),

    // A3/P4: HAVING — keys with more than one row in the union.
    "q11_having_dups" -> ((s, dir) =>
      Dedup.duplicateKeys(ordersUnion(s, dir), "o_orderkey")
        .orderBy(col("o_orderkey"))),

    // A2: COUNT vs COUNT(DISTINCT) — exact, as the reference (no HLL).
    "q12_count_distinct" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        count(lit(1)).as("total_rows"),
        countDistinct(col("o_custkey")).as("distinct_custkeys"))),

    // A4: pivot-style grouped multi-agg (TPC-H Q1 shape).
    "q13_group_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // A4 grand total: rollup with an explicit TOTAL row.
    "q14_rollup_total" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .select(coalesce(col("l_returnflag"), lit("TOTAL")).as("flag"),
          col("cnt"), col("sum_price"))
        .orderBy(col("flag"))),

    // A5: frequency table.
    "q15_freq_table" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("event_type"))),

    // A6: conditional aggregation.
    "q16_conditional_sum" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
        count_if(col("o_totalprice") > 200000.0).as("n_large"),
        round(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(0.0)), 2).as("sum_f_price"))),

    // Q4/F8: post-merge uniqueness verification with OK/ERROR verdict.
    "q17_verify_unique" -> ((s, dir) =>
      Upsert.verifyUnique(
        Upsert.upsert(upsertBase(s, dir), upsertNew(s, dir), "o_orderkey"),
        "o_orderkey")),

    // T1/T2: deterministic top-k by measure with key tiebreak.
    "q18_topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
          col("o_orderstatus"))
        .orderBy(desc("price"), col("o_orderkey"))
        .limit(10)),

    // U2: UNION ALL of labeled scalar aggregates — the reference's
    // load-verification shape (seccion3_sql.sql:113-115).
    "q31_union_scalar" -> ((s, dir) =>
      t(s, dir, "orders").agg(count(lit(1)).as("cnt"))
        .select(lit("orders").as("tabla"), col("cnt"))
        .unionAll(
          t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))
            .select(lit("lineitem").as("tabla"), col("cnt")))
        .orderBy(col("tabla")))
    ,

    // §2.8 Col_14 composite split (seccion3_sql.sql:52): a pipe-packed
    // record synthesized from orders in the reference's exact layout —
    // "src_id|code|zero-padded-key|op_type" — with every 73rd row
    // truncated to 2 parts to exercise the try_element_at NULL routing.
    // key_ok re-validates part 3 == zfill(part 1, 8) after the round trip
    // (NULL where the composite was malformed).
    "q69_composite_split" -> ((s, dir) => {
      val full = concat_ws("|", col("o_orderkey").cast("string"),
        col("o_custkey").cast("string"),
        graft.functions.Composite.zfill(col("o_orderkey").cast("string"), 8),
        col("o_orderstatus"))
      val truncated = concat_ws("|", col("o_orderkey").cast("string"),
        col("o_custkey").cast("string"))
      val c14 = when(col("o_orderkey") % 73 === 0, truncated).otherwise(full)
      val fields = graft.functions.Composite.parts(col("c14"), "|",
        Seq("src_id", "code", "flight_key", "op_type"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), c14.as("c14"))
        .select(col("o_orderkey") +: fields: _*)
        .withColumn("key_ok", col("flight_key") ===
          graft.functions.Composite.zfill(col("src_id"), 8))
        .orderBy(col("o_orderkey"))
    })
  )

  // ---------------------------------------------------------------------------

  val oracles: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-06-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_union_priority" ->
      s"""WITH u AS ($ordersUnionSql)
         |SELECT * FROM u ORDER BY o_orderkey, source_priority""".stripMargin,

    "q03_dup_count" ->
      s"""WITH u AS ($ordersUnionSql)
         |SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_count
         |FROM u""".stripMargin,

    "q04_dedup_keep_first" ->
      s"""WITH u AS ($ordersUnionSql)
         |SELECT o_orderkey, o_orderstatus, o_totalprice, source_priority
         |FROM (SELECT *, row_number() OVER
         |        (PARTITION BY o_orderkey ORDER BY source_priority) AS rn
         |      FROM u)
         |WHERE rn = 1
         |ORDER BY o_orderkey""".stripMargin,

    "q05_distinct_on" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |             row_number() OVER
        |               (PARTITION BY l_orderkey
        |                ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
        |      FROM lineitem)
        |WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin,

    "q06_mode_topk" ->
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem
        |GROUP BY l_partkey
        |ORDER BY cnt DESC, l_partkey
        |LIMIT 20""".stripMargin,

    "q07_semi_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,

    "q08_anti_join" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin,

    "q09_upsert_merge" ->
      s"""$upsertCte,
         |$mergedSql
         |SELECT o_orderkey, o_orderstatus, o_totalprice FROM merged
         |ORDER BY o_orderkey""".stripMargin,

    "q10_upsert_audit" ->
      s"""$upsertCte
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM base) AS base_count,
         |  (SELECT CAST(count(*) AS BIGINT) FROM nw) AS new_count,
         |  (SELECT CAST(count(*) AS BIGINT) FROM nw
         |     WHERE EXISTS (SELECT 1 FROM base WHERE base.o_orderkey = nw.o_orderkey)) AS updates,
         |  (SELECT CAST(count(*) AS BIGINT) FROM nw
         |     WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.o_orderkey = nw.o_orderkey)) AS inserts,
         |  (SELECT CAST(count(*) AS BIGINT) FROM base) -
         |    (SELECT CAST(count(*) AS BIGINT) FROM nw
         |       WHERE EXISTS (SELECT 1 FROM base WHERE base.o_orderkey = nw.o_orderkey)) +
         |    (SELECT CAST(count(*) AS BIGINT) FROM nw) AS final_count""".stripMargin,

    "q11_having_dups" ->
      s"""WITH u AS ($ordersUnionSql)
         |SELECT o_orderkey, CAST(count(*) AS BIGINT) AS cnt
         |FROM u GROUP BY o_orderkey HAVING count(*) > 1
         |ORDER BY o_orderkey""".stripMargin,

    "q12_count_distinct" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS distinct_custkeys
        |FROM orders""".stripMargin,

    "q13_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       round(avg(l_discount), 6) AS avg_disc
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q14_rollup_total" ->
      """SELECT coalesce(l_returnflag, 'TOTAL') AS flag,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag)
        |ORDER BY flag""".stripMargin,

    "q15_freq_table" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
        |FROM events
        |GROUP BY event_type
        |ORDER BY cnt DESC, event_type""".stripMargin,

    "q16_conditional_sum" ->
      """SELECT
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(count(*) FILTER (WHERE o_totalprice > 200000.0) AS BIGINT) AS n_large,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2) AS sum_f_price
        |FROM orders""".stripMargin,

    "q17_verify_unique" ->
      s"""$upsertCte,
         |$mergedSql
         |SELECT CAST(count(*) AS BIGINT) AS total_rows,
         |       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS distinct_keys,
         |       CASE WHEN count(*) = count(DISTINCT o_orderkey)
         |            THEN 'OK' ELSE 'ERROR' END AS estado
         |FROM merged""".stripMargin,

    "q18_topk_orders" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price, o_orderstatus
        |FROM orders
        |ORDER BY price DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q31_union_scalar" ->
      """SELECT * FROM (
        |  SELECT 'orders' AS tabla, CAST(count(*) AS BIGINT) AS cnt FROM orders
        |  UNION ALL
        |  SELECT 'lineitem' AS tabla, CAST(count(*) AS BIGINT) AS cnt FROM lineitem)
        |ORDER BY tabla""".stripMargin,

    // zfill (pad-without-truncate) is spelled out as a CASE in both
    // engines; DuckDB list_extract past the end yields NULL, mirroring
    // Spark try_element_at on the truncated composites.
    "q69_composite_split" ->
      """WITH c AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 73 = 0
        |      THEN o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR
        |      ELSE o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' ||
        |        (CASE WHEN len(o_orderkey::VARCHAR) >= 8
        |              THEN o_orderkey::VARCHAR
        |              ELSE lpad(o_orderkey::VARCHAR, 8, '0') END) ||
        |        '|' || o_orderstatus
        |    END AS c14
        |  FROM orders),
        |p AS (SELECT o_orderkey, string_split(c14, '|') AS parts FROM c)
        |SELECT o_orderkey,
        |  parts[1] AS src_id,
        |  parts[2] AS code,
        |  parts[3] AS flight_key,
        |  parts[4] AS op_type,
        |  parts[3] = (CASE WHEN len(parts[1]) >= 8 THEN parts[1]
        |              ELSE lpad(parts[1], 8, '0') END) AS key_ok
        |FROM p ORDER BY o_orderkey""".stripMargin
  )
}
