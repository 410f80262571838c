package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Sampling, Sessionize}

/** Wave-3 operators: as-of join, sessionization, deterministic sampling. */
class AnalyticsSpec extends SparkSpec {

  import sqlImplicits._

  test("asOf attaches the latest right row at or before each left time") {
    val left = Seq((1, "u", 100L), (2, "u", 200L), (3, "u", 50L))
      .toDF("id", "k", "t")
    val right = Seq(("u", 100L, "a"), ("u", 150L, "b"), ("u", 300L, "c"))
      .toDF("k", "rt", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("payload"))
      .orderBy("id").collect()
    // t=100 matches rt=100 (inclusive), t=200 matches rt=150, t=50 has no
    // match (left-join null)
    assert(out.map(r => Option(r.getAs[String]("payload"))).toSeq ===
      Seq(Some("a"), Some("b"), None))
  }

  test("asOf rightOrder breaks (key, time) ties deterministically") {
    val left = Seq((1, "u", 100L)).toDF("id", "k", "t")
    val right = Seq(("u", 100L, 1L, "first"), ("u", 100L, 2L, "second"))
      .toDF("k", "rt", "seq", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt",
      Seq("seq", "payload"), rightOrder = Seq(col("seq")))
      .collect()
    assert(out.head.getAs[String]("payload") === "second") // later seq wins
  }

  test("asOf attaches the matched row ATOMICALLY when a payload value is NULL") {
    // The newest right row at t<=200 carries px=NULL, note="newer". Whole-row
    // semantics (DuckDB ASOF / merge_asof): BOTH columns must come from that
    // row — px=NULL, note="newer" — never px from the older row ("torn" row).
    val left = Seq((1, "u", 200L)).toDF("id", "k", "t")
    val right = Seq(("u", 100L, Some(9L), "older"), ("u", 150L, None, "newer"))
      .toDF("k", "rt", "px", "note")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("px", "note"))
      .collect()
    assert(out.length === 1)
    assert(Option(out(0).getAs[java.lang.Long]("px")) === None)
    assert(out(0).getAs[String]("note") === "newer")
    // mirror: forward as-of must take the whole NEAREST following row
    val fwd = AsOfJoin.asOfForward(
      Seq((1, "u", 100L)).toDF("id", "k", "t"),
      Seq(("u", 120L, None: Option[Long], "near"), ("u", 400L, Some(7L), "far"))
        .toDF("k", "rt", "px", "note"),
      "k", "t", "rt", Seq("px", "note")).collect()
    assert(Option(fwd(0).getAs[java.lang.Long]("px")) === None)
    assert(fwd(0).getAs[String]("note") === "near")
  }

  test("asOfForward attaches the earliest right row at or after each left time") {
    val left = Seq((1, "u", 100L), (2, "u", 151L), (3, "u", 400L))
      .toDF("id", "k", "t")
    val right = Seq(("u", 100L, "a"), ("u", 150L, "b"), ("u", 300L, "c"))
      .toDF("k", "rt", "payload")
    val out = AsOfJoin.asOfForward(left, right, "k", "t", "rt", Seq("payload"))
      .orderBy("id").collect()
    // t=100 matches rt=100 (inclusive), t=151 matches rt=300, t=400: none
    assert(out.map(r => Option(r.getAs[String]("payload"))).toSeq ===
      Seq(Some("a"), Some("c"), None))
  }

  test("asOfWithin nulls out matches older than the tolerance") {
    val left = Seq((1, "u", 100L), (2, "u", 500L)).toDF("id", "k", "t")
    val right = Seq(("u", 90L, 90L, "fresh")).toDF("k", "rt", "mt", "payload")
    val out = AsOfJoin.asOfWithin(left, right, "k", "t", "rt",
      Seq("mt", "payload"), matchTime = "mt", tolerance = 50L)
      .orderBy("id").collect()
    assert(Option(out(0).getAs[String]("payload")) === Some("fresh")) // age 10
    assert(Option(out(1).getAs[String]("payload")) === None)          // age 410
  }

  test("sessionize numbers gap-separated islands per key") {
    val ev = Seq(
      ("u", 0L), ("u", 10L), ("u", 100L), ("u", 105L), // gap>50 at 100
      ("v", 0L)).zipWithIndex
      .map { case ((k, t), i) => (i, k, t) }.toDF("id", "k", "t")
    val out = Sessionize.sessionize(ev, "k", "t", gap = 50L,
      order = Seq(col("id")))
      .orderBy("id").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("session_id")))
    assert(out.toSeq === Seq(("u", 1L), ("u", 1L), ("u", 2L), ("u", 2L), ("v", 1L)))
  }

  test("sessionStats aggregates bounds and spans per session") {
    val ev = Seq((1, "u", 0L), (2, "u", 10L), (3, "u", 100L))
      .toDF("id", "k", "t")
    val st = Sessionize.sessionStats(
      Sessionize.sessionize(ev, "k", "t", gap = 50L, order = Seq(col("id"))),
      "k", "t").orderBy("session_id").collect()
    assert(st.map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("span")))
      .toSeq === Seq((2L, 10L), (1L, 0L)))
  }

  test("hashSample is deterministic and stable under repartition") {
    val df = spark.range(1000).toDF("id")
    val key = col("id").cast("string")
    val a = Sampling.hashSample(df, key, keep = 10).collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(df.repartition(7), key, keep = 10)
      .collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty && a.length < 1000)
    // membership is monotone in keep: keep=10 sample is a subset of keep=20
    val c = Sampling.hashSample(df, key, keep = 20).collect().map(_.getLong(0)).toSet
    assert(a.forall(c.contains))
  }

  test("hashSplit partitions exactly, is append-stable, and rejects bad cuts") {
    val df = spark.range(1000).toDF("id")
    val key = col("id").cast("string")
    val out = Sampling.hashSplit(df, key,
      Seq(("train", 80), ("val", 10), ("test", 10)))
    // exhaustive and disjoint: every row exactly one label
    assert(out.count() === 1000L)
    val byLabel = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel.values.sum === 1000L)
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
    // append-stable: the first 500 rows keep their labels inside the 1000-row run
    val small = Sampling.hashSplit(spark.range(500).toDF("id"), key,
      Seq(("train", 80), ("val", 10), ("test", 10)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, lbl) => assert(big(id) == lbl) }
    assertThrows[IllegalArgumentException] {
      Sampling.hashSplit(df, key, Seq(("train", 80), ("val", 10)))
    }
  }

  test("stratifiedHashSample applies per-stratum rates, drops unlisted strata") {
    val df = spark.range(300)
      .withColumn("s", when(col("id") % 3 === 0, "a")
        .when(col("id") % 3 === 1, "b").otherwise("c"))
    val out = Sampling.stratifiedHashSample(df, col("id").cast("string"),
      col("s"), Map("a" -> 100, "b" -> 30))
    val bySt = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySt("a") === 100)            // rate 100/100 keeps every 'a' row
    assert(bySt.get("c").isEmpty)        // unlisted stratum dropped
    assert(bySt("b") > 0 && bySt("b") < 100)
  }
}
