package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Wave-9 portable statistics: trailing features, integer least squares,
  * Gini diversity, Benford digits, weighted median, χ² table. */
class StatsSpec extends SparkSpec {
  import sqlImplicits._

  test("trailingWindowFeatures uses the half-open (t−span, t] window") {
    val df = Seq(("u", 100L, 1.0), ("u", 150L, 2.0), ("u", 199L, 3.0),
      ("u", 200L, 4.0), ("v", 100L, 9.0))
      .toDF("k", "t", "v")
    val got = Stats.trailingWindowFeatures(df, "k", "t", "v", span = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // at t=199: window (99, 199] holds 100,150,199 → cnt 3
    assert(got(("u", 199L)) === ((3L, 1.0, 3.0)))
    // at t=200: window (100, 200] drops the t=100 row → cnt 3, min 2.0
    assert(got(("u", 200L)) === ((3L, 2.0, 4.0)))
    // other key is invisible
    assert(got(("v", 100L)) === ((1L, 9.0, 9.0)))
  }

  test("trendSlope recovers an exact rational slope; flat x gets NULL") {
    // y = 3x + 1 on x=0..4 → slope exactly 3
    val line = (0 to 4).map(x => ("a", x.toLong, 3L * x + 1))
    // all x equal → denominator 0
    val flat = Seq(("b", 2L, 5L), ("b", 2L, 7L))
    val out = Stats.trendSlope((line ++ flat).toDF("k", "x", "y"),
      "k", "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("slope_num") ===
      3L * a.getAs[Long]("slope_den"))
    assert(a.getAs[Double]("slope") === 3.0)
    assert(out("b").getAs[Long]("slope_den") === 0L)
    assert(out("b").isNullAt(out("b").fieldIndex("slope")))
  }

  test("giniDiversity: 0 for a monoculture, 1 − 1/k for k equal shares") {
    val df = (Seq.fill(8)(("mono", "s1")) ++
      Seq("a", "b", "c", "d").flatMap(s => Seq.fill(3)(("even", s))))
      .toDF("g", "cat")
    val got = Stats.giniDiversity(df, "g", "cat").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    assert(got("mono") === 0.0)
    assert(got("even") === 1.0 - 1.0 / 4.0)
  }

  test("benfordProfile floors before digit extraction and skips |v| < 1") {
    val df = Seq(("g", 999.6), ("g", 1000.0), ("g", 0.5), ("g", -23.4))
      .toDF("k", "v")
    val got = Stats.benfordProfile(df, "k", "v").collect()
      .map(r => r.getAs[Int]("digit") -> r.getAs[Long]("cnt")).toMap
    // 999.6 → floor 999 → digit 9 (a truncating cast-to-long in DuckDB
    // would ROUND to 1000 → digit 1 — the divergence the floor prevents)
    assert(got === Map(9 -> 1L, 1 -> 1L, 2 -> 1L))
  }

  test("weightedMedian: smallest value where 2·cumweight reaches the total") {
    // weights: 1@10, 2@20, 4@30, 1@40 → total 8; cum at 20 = 3 (2·3 < 8),
    // cum at 30 = 7 (14 ≥ 8) → weighted median 30
    val df = Seq(("g", 10.0, 1L, 1L), ("g", 20.0, 2L, 2L),
      ("g", 30.0, 4L, 3L), ("g", 40.0, 1L, 4L)).toDF("k", "v", "w", "id")
    val r = Stats.weightedMedian(df, "k", "v", col("w"), col("id")).head()
    assert(r.getAs[Double]("w_median") === 30.0)
    assert(r.getAs[Long]("w_total") === 8L)
  }

  test("rollingActiveCounts: trailing-window distinct, observed days only") {
    // user A active on days 1 and 3; user B on day 3 only; window 3
    val df = Seq(("A", 1L), ("A", 1L), ("A", 3L), ("B", 3L))
      .toDF("u", "d")
    val got = Stats.rollingActiveCounts(df, "u", col("d"), window = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // day 1: {A}; day 3: A (from day 1, still inside [1,3], AND day 3) + B
    // days 2, 4, 5 are not observed activity days → absent
    assert(got === Map(1L -> 1L, 3L -> 2L))
  }

  test("groupQuantiles picks the observed value at rank ceil(q*n)") {
    // n=10, values 1..10: p50 → rank 5 → 5.0; p95 → rank ceil(9.5)=10 → 10.0
    val df = (1 to 10).map(i => ("g", i.toDouble, i.toLong))
      .toDF("k", "v", "id")
    val got = Stats.groupQuantiles(df, "k", "v", col("id"),
      Seq(("p50", 1L, 2L), ("p95", 19L, 20L)))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(got === Map("p50" -> 5.0, "p95" -> 10.0))
  }

  test("contingencyChi2 is exactly zero under perfect independence") {
    // 2×2 with perfectly proportional cells: obs == expected exactly
    val rows = Seq.fill(8)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(4)(("b", "x")) ++ Seq.fill(1)(("b", "y"))
    val out = Stats.contingencyChi2(rows.toDF("u", "v"), "u", "v")
      .collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getAs[Double]("chi2") === 0.0,
        s"cell ${r.getString(0)}/${r.getString(1)}")
    }
    val n = out.head.getAs[Long]("n")
    assert(n === 15L)
  }
}
