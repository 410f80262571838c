package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Funnel/cohort/transition semantics on hand-computed fixtures: ordered
  * (strictly-after) step matching, stall handling, floor-division cohort
  * anchoring, and per-source probability normalization. */
class FunnelSpec extends SparkSpec {

  private def events = {
    import sqlImplicits._
    Seq(
      // user 1: completes view(10) → click(20) → purchase(30)
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: clicks BEFORE viewing — stalls at stage 1
      (2L, 5L, "click"), (2L, 10L, "view"), (2L, 11L, "purchase"),
      // user 3: view → click, purchase precedes the click — stage 2
      (3L, 10L, "view"), (3L, 12L, "purchase"), (3L, 15L, "click"),
      // user 4: never views — absent from the funnel
      (4L, 10L, "click"), (4L, 20L, "purchase"),
      // user 5: repeated views; earliest anchors the funnel
      (5L, 50L, "view"), (5L, 40L, "view"), (5L, 45L, "click"),
      (5L, 60L, "click"), (5L, 70L, "purchase")
    ).toDF("user_id", "t", "kind")
  }

  test("funnelTimes matches the ordered strictly-after semantics") {
    val got = Funnel.funnelTimes(events, "user_id", "t", "kind",
      Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, Some(10L), Some(20L), Some(30L), 3L),
      (2L, Some(10L), None, None, 1L),
      (3L, Some(10L), Some(15L), None, 2L),
      // user 5: first view 40 → click 45 (45 > 40) → purchase 70
      (5L, Some(40L), Some(45L), Some(70L), 3L)))
  }

  test("funnel stage times are strictly increasing wherever present") {
    val rows = Funnel.funnelTimes(events, "user_id", "t", "kind",
      Seq("view", "click", "purchase")).collect()
    rows.foreach { r =>
      val ts = Seq(1, 2, 3).map(i => Option(r.get(i)).map(_.asInstanceOf[Long]))
      ts.sliding(2).foreach {
        case Seq(Some(a), Some(b)) => assert(a < b)
        case Seq(None, later)      => assert(later.isEmpty)
        case _                     =>
      }
    }
  }

  test("cohortRetention anchors to the first-event period with full cohort at offset 0") {
    import sqlImplicits._
    val ev = Seq(
      (1L, 5L), (1L, 25L), (1L, 47L),   // cohort 0, offsets 0, 2, 4
      (2L, 12L), (2L, 13L), (2L, 19L),  // cohort 1, all offset 0
      (3L, 21L), (3L, 39L)              // cohort 2, offsets 0, 1
    ).toDF("user_id", "t")
    val got = Funnel.cohortRetention(ev, "user_id", "t", periodMicros = 10L)
      .orderBy("cohort_p", "off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 0L, 1L), (0L, 2L, 1L), (0L, 4L, 1L),
      (1L, 0L, 1L), (2L, 0L, 1L), (2L, 1L, 1L)))
  }

  test("transitionMatrix counts ordered bigrams and normalizes per source kind") {
    import sqlImplicits._
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "a")
    ).zipWithIndex.map { case ((u, t, k), i) => (u, t, k, i.toLong) }
      .toDF("user_id", "t", "kind", "eid")
    val got = Funnel.transitionMatrix(ev, "user_id", "t", "kind",
      Seq(col("eid")))
      .orderBy("from_kind", "to_kind")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // user 1: a→b, b→a, a→b; user 2: a→a
    assert(got.toSeq == Seq(
      ("a", "a", 1L, 0.333333), ("a", "b", 2L, 0.666667),
      ("b", "a", 1L, 1.0)))
  }

  test("transition probabilities sum to 1 per source kind on real events") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), expr("ts DIV 1000").as("t"),
        col("event_type"), col("event_id"))
    val sums = Funnel.transitionMatrix(ev, "user_id", "t", "event_type",
      Seq(col("event_id")))
      .groupBy("from_kind").agg(sum(col("prob")).as("s"))
      .collect().map(_.getDouble(1))
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4))
  }
}
