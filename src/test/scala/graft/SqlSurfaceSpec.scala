package graft

import org.apache.spark.sql.functions._

/** Q1: the re-runnable DDL/view surface — Tables.registerAll exposes every
  * testdata table as a temp view so `spark.sql` works against the same
  * names the DuckDB oracle uses. Idempotent by construction
  * (createOrReplaceTempView). */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("registerAll exposes all tables to spark.sql and is re-runnable") {
    Tables.registerAll(spark, dir)
    Tables.registerAll(spark, dir) // idempotent re-run (DROP/CREATE shape)
    val cnt = spark.sql("SELECT count(*) AS c FROM orders").head().getLong(0)
    assert(cnt === Tables.load(spark, dir, "orders").count())
    assert(Tables.names.forall(spark.catalog.tableExists))
  }

  test("lifted SQL functions equal their Column-DSL originals") {
    import graft.functions.{TextAnalysis, Urls}
    import graft.operators.NearDup
    Tables.registerAll(spark, dir)
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_lang_id(text) AS lid,
        |  graft_quality_score(text) AS q,
        |  graft_token_count(text) AS n,
        |  graft_md5h60(text) AS h,
        |  graft_url_canon('HTTPS://A.com:443/p?utm_x=1&b=2&a=1#f') AS u
        |FROM documents ORDER BY doc_id""".stripMargin).collect()
    val viaDsl = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lid"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        NearDup.md5Hash60(col("text")).as("h"),
        Urls.canonicalize(lit("HTTPS://A.com:443/p?utm_x=1&b=2&a=1#f")).as("u"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaDsl.toSeq)
    assert(viaSql.head.getString(5) == "https://a.com/p?a=1&b=2")
  }

  test("round-6 lifted functions: luhn, registered domain, dup-gram fraction") {
    val r = spark.sql(
      """SELECT graft_luhn('4111111111111111') AS l_ok,
        |  graft_luhn('4111111111111112') AS l_bad,
        |  graft_reg_domain('https://a.b.Example.COM:8443/x') AS dom,
        |  graft_dup_gram_frac('a b c a b c a b c') AS rep""".stripMargin)
      .head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getString(2) == "example.com")
    // 7 word-3-grams, 3 distinct -> 4/7 duplicated
    assert(math.abs(r.getDouble(3) - 4.0 / 7.0) < 1e-12)
  }

  test("wave-14 lifted functions: first digit, PII redaction") {
    val r = spark.sql(
      """SELECT graft_first_digit(999.6) AS d_floor,
        |  graft_first_digit(-23.4) AS d_neg,
        |  graft_first_digit(0.5) AS d_small,
        |  graft_redact_pii('mail a@b.com or 12345678') AS scrubbed"""
        .stripMargin).head()
    assert(r.getInt(0) === 9)  // floor, never round-to-1000
    assert(r.getInt(1) === 2)
    assert(r.isNullAt(2))      // |v| < 1 → NULL
    assert(!r.getString(3).contains("a@b.com") &&
      !r.getString(3).contains("12345678"))
  }

  test("graft_hilbert SQL surface: equals the interpreted reference, " +
      "auto-casts integral coords, demands a literal bits") {
    val r = spark.sql(
      "SELECT graft_hilbert(3, 2, 1, 4) AS h3, " +
        "graft_hilbert(CAST(5 AS BIGINT), CAST(9 AS BIGINT), 4) AS h2")
      .head()
    assert(r.getLong(0) ===
      graft.expressions.HilbertIndex.compute(Array(3L, 2L, 1L), 4))
    assert(r.getLong(1) ===
      graft.expressions.HilbertIndex.compute(Array(5L, 9L), 4))
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hilbert(1, 2, 1 + 3)").collect()
    }
    assert(e.getMessage.contains("graft_hilbert"))
  }

  test("lifted SQL functions reject wrong arity with a named error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_token_count('a', 'b')").collect()
    }
    assert(e.getMessage.contains("graft_token_count"))
  }

  test("spark.sql joins and aggregates over the registered views") {
    Tables.registerAll(spark, dir)
    val got = spark.sql(
      """SELECT o.o_orderstatus, count(*) AS cnt
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }
}
