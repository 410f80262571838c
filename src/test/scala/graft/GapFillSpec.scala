package graft

import org.apache.spark.sql.functions._

import graft.operators.GapFill

/** LOCF/NOCB gap filling: verbatim carry within a key, leading/trailing
  * nulls stay null, keys never bleed into each other. */
class GapFillSpec extends SparkSpec {
  import sqlImplicits._

  private def series = Seq(
    ("a", 1L, Option.empty[Double]),  // leading null — nothing to carry
    ("a", 2L, Some(10.0)),
    ("a", 3L, None),                  // ← 10.0 forward / 30.0 backward
    ("a", 4L, None),                  // ← 10.0 forward / 30.0 backward
    ("a", 5L, Some(30.0)),
    ("b", 1L, Some(7.0)),
    ("b", 2L, None),                  // ← 7.0; must NOT see a's values
    ("b", 3L, None)                   // trailing null under NOCB
  ).toDF("k", "seq", "v")

  test("locf carries the last observation forward per key") {
    val got = GapFill.locf(series, Seq("k"), Seq(col("seq")), Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got(("a", 1L)) === None)
    assert(got(("a", 3L)) === Some(10.0))
    assert(got(("a", 4L)) === Some(10.0))
    assert(got(("a", 5L)) === Some(30.0))
    assert(got(("b", 2L)) === Some(7.0))
    assert(got(("b", 3L)) === Some(7.0))
  }

  test("nocb carries the next observation backward per key") {
    val got = GapFill.nocb(series, Seq("k"), Seq(col("seq")), Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got(("a", 1L)) === Some(10.0))
    assert(got(("a", 3L)) === Some(30.0))
    assert(got(("a", 4L)) === Some(30.0))
    assert(got(("b", 2L)) === None, "trailing gap has no next observation")
    assert(got(("b", 3L)) === None)
  }
}
