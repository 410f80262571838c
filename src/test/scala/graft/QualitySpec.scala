package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Quality
import graft.operators.Skew

/** Quality-layer behaviour: schema conformance, reject routing, checksum
  * order-insensitivity, salted-aggregation equivalence on skewed data. */
class QualitySpec extends SparkSpec {
  import sqlImplicits._

  test("schemaConforms: case-insensitive names, exact types, extras tolerated") {
    val df = Seq((1L, "x", 2.5)).toDF("Key", "name", "price")
    val ok = StructType(Seq(
      StructField("key", LongType), StructField("PRICE", DoubleType)))
    val badType = StructType(Seq(StructField("key", IntegerType)))
    val missing = StructType(Seq(StructField("absent", LongType)))
    assert(Quality.schemaConforms(df, ok))
    assert(!Quality.schemaConforms(df, badType))
    assert(!Quality.schemaConforms(df, missing))
  }

  test("route splits pass/reject exhaustively and tags the reason") {
    val df = Seq((1, "a"), (2, null), (3, "c")).toDF("k", "v")
    val (pass, rej) = Quality.route(df, col("v").isNotNull, "null v")
    assert(pass.count() + rej.count() === 3)
    assert(pass.filter(col("v").isNull).count() === 0)
    assert(rej.select("reject_reason").head().getString(0) === "null v")
    // NULL predicate rows land on the reject side, not nowhere
    assert(rej.count() === 1)
  }

  test("mandatoryKeyAudit flags null keys") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("k")
    val a = Quality.mandatoryKeyAudit(df, "k").head()
    assert(a.getAs[Long]("total_rows") === 3L)
    assert(a.getAs[Long]("null_keys") === 1L)
    assert(a.getAs[String]("estado") === "ERROR")
  }

  test("fkOrphans finds exactly the parentless children") {
    val child = Seq((1, 10), (2, 20), (3, 99)).toDF("id", "fk")
    val parent = Seq(10, 20).toDF("pk")
    val got = Quality.fkOrphans(child, "fk", parent, "pk")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(3))
  }

  test("stageChecksum is order- and partitioning-insensitive") {
    val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val b = a.orderBy(desc("k")).repartition(7)
    val ca = Quality.stageChecksum(a, "k", "v").head()
    val cb = Quality.stageChecksum(b, "k", "v").head()
    assert(ca === cb)
  }

  test("volumeDelta: ±30% tolerance, first batch passes") {
    assert(Quality.volumeDelta(0L, 500L).ok)
    assert(Quality.volumeDelta(1000L, 1200L).ok)      // +20%
    assert(!Quality.volumeDelta(1000L, 1400L).ok)     // +40%
    assert(!Quality.volumeDelta(1000L, 600L).ok)      // -40%
    assert(Quality.volumeDelta(1000L, 900L).delta === -0.1)
  }

  test("categoryDrift surfaces appearing/disappearing categories as 0-share") {
    val prev = Seq("a", "a", "b", "b").toDF("cat")
    val cur = Seq("a", "a", "a", "c").toDF("cat")
    val got = graft.plans.Drift.categoryDrift(prev, cur, "cat")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("a") === ((0.5, 0.75, 0.25)))
    assert(got("b") === ((0.5, 0.0, -0.5)))  // disappeared
    assert(got("c") === ((0.0, 0.25, 0.25))) // appeared
  }

  test("salted aggregation equals plain groupBy on skewed data") {
    // hot key: 'h' carries 90% of rows
    val rows = (1 to 900).map(i => ("h", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))
    val df = rows.toDF("key", "seq")
    val plain = df.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "key", col("seq"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    val plainSum = df.groupBy("key").agg(sum("seq").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedSum = Skew.saltedSum(df, "key", "seq", col("seq"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedSum === plainSum)
  }

  test("salted join equals the plain inner join on a skewed fact") {
    val fact = ((1 to 900).map(i => ("h", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("key", "seq")
    val dim = (Seq("h") ++ (0 until 10).map(i => s"k$i") ++ Seq("absent"))
      .zipWithIndex.map { case (k, i) => (k, i * 10.0) }.toDF("key", "w")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("key", "seq", "w").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val plain = canon(fact.join(dim, Seq("key")))
    val salted = canon(Skew.saltedJoin(fact, dim, "key", col("seq"), 8))
    assert(salted === plain)
    assert(plain.nonEmpty && !plain.exists(_._1 == "absent"))
  }

  test("winsorize clips to per-group percentile bounds and keeps every row") {
    val o = Tables.load(spark, "/root/testdata/sf0.01", "orders")
    val w = Quality.winsorize(o, Seq("o_orderstatus"), "o_totalprice")
    assert(w.count() === o.count(), "winsorize must keep every row")
    // clipped values sit inside the bounds, and interior rows are untouched
    val per = w.groupBy(col("o_orderstatus"))
      .agg(min(col("o_totalprice_w")).as("mn"), max(col("o_totalprice_w")).as("mx"),
        min(col("o_totalprice")).as("omn"), max(col("o_totalprice")).as("omx"),
        count(when(col("o_totalprice_w") === col("o_totalprice"), 1)).as("same"),
        count(lit(1)).as("n"))
      .collect()
    per.foreach { r =>
      assert(r.getDouble(1) > r.getDouble(3) && r.getDouble(2) < r.getDouble(4),
        s"tails must actually be clipped for ${r.getString(0)}")
      val frac = r.getLong(5).toDouble / r.getLong(6)
      assert(frac > 0.85 && frac < 0.95, s"~90% interior expected, got $frac")
    }
  }

  test("approxDistinctCheck: HLL verdict true on real data, exact counts exact") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val got = Quality.approxDistinctCheck(li, Seq("l_returnflag"), "l_partkey")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === exact.keySet)
    exact.foreach { case (k, d) =>
      assert(got(k)._1 === d, s"exact count for $k")
      assert(got(k)._2, s"HLL verdict for $k")
    }
  }

  test("approxDistinctCheck: a zero bound fails unless the estimate is exact") {
    import sqlImplicits._
    // 10k distinct values: HLL at rsd=0.05 will not be spot-on, so the
    // impossible bound must yield false — the verdict is a real comparison,
    // not a constant
    val d = (1 to 10000).map(i => ("g", i)).toDF("g", "v")
    val row = Quality.approxDistinctCheck(d, Seq("g"), "v",
      rsd = 0.05, bound = 0.0).head()
    assert(row.getLong(1) === 10000L)
    assert(!row.getBoolean(2))
  }
}
