package graft

import org.apache.spark.sql.functions._

import graft.functions.Composite

/** Delimited-composite helpers: NULL routing for short composites, zfill
  * non-truncation (the lpad trap), literal-delimiter quoting. */
class CompositeSpec extends SparkSpec {
  import sqlImplicits._

  test("parts: missing fields route to NULL, present ones split literally") {
    val df = Seq("a|b|c|d", "x|y", "").toDF("c")
      .select(Composite.parts(col("c"), "|", Seq("p1", "p2", "p3", "p4")): _*)
    val rows = df.collect().map(r => (0 until 4).map(i => Option(r.getString(i))))
    assert(rows(0) === Seq(Some("a"), Some("b"), Some("c"), Some("d")))
    assert(rows(1) === Seq(Some("x"), Some("y"), None, None))
    assert(rows(2) === Seq(Some(""), None, None, None))
  }

  test("parts treats regex metacharacter delimiters literally") {
    val row = Seq("1.2.3").toDF("c")
      .select(Composite.parts(col("c"), ".", Seq("a", "b", "x")): _*)
      .head()
    assert((row.getString(0), row.getString(1), row.getString(2)) === ("1", "2", "3"))
  }

  test("zfill pads short strings and never truncates long ones") {
    val row = Seq(("42", "123456789")).toDF("s", "l")
      .select(Composite.zfill(col("s"), 8).as("s"),
        Composite.zfill(col("l"), 8).as("l"))
      .head()
    assert(row.getString(0) === "00000042")
    assert(row.getString(1) === "123456789", "lpad would have truncated to 8")
  }
}
