package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.expressions.RollingHash
import graft.operators.NearDup

/** The native O(len) rolling-hash expression and the fast winnowing path
  * built on it. */
class WinnowRollingSpec extends SparkSpec {
  import sqlImplicits._

  private def rollCol(n: Int) = ColumnBridge.toColumn(
    RollingHash(ColumnBridge.toExpression(col("t")), n,
      RollingHash.DefaultBase))

  /** Driver-side reference: the definition, computed directly (no
    * incremental update) — pins both the polynomial and the window set. */
  private def reference(s: String, n: Int): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    if (b.length < n) Seq.empty
    else (0 to b.length - n).map { i =>
      var h = 0L
      for (j <- i until i + n) h = h * RollingHash.DefaultBase + (b(j) & 0xff)
      h
    }
  }

  test("rolling hash equals the direct polynomial definition") {
    val texts = Seq("hello rolling world", "abc", "ab", "",
      "aaaaaaaaaaaaaaaa", "x" * 100)
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    val got = df.select(col("id"), rollCol(3).as("hs")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) === reference(t, 3), s"text '$t'")
    }
  }

  test("rolling hash agrees between codegen and interpreted paths") {
    val df = Seq((1, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "t")
    val viaCodegen = df.select(rollCol(16)).head().getSeq[Long](0)
    // interpreted: eval() directly on the expression
    val ev = RollingHash(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          "the quick brown fox jumps over the lazy dog")),
      16, RollingHash.DefaultBase).eval(null)
    val viaEval = ev.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(viaCodegen === viaEval)
  }

  test("SQL surface: graft_rolling_hash matches and demands a literal") {
    val n = spark.sql(
      "SELECT size(graft_rolling_hash('abcdef', 3)) AS m").head().getInt(0)
    assert(n === 4) // 6 − 3 + 1
  }

  test("rolling winnow keeps the guarantee: a planted shared paragraph " +
    "surfaces, disjoint docs do not") {
    val shared = "this exact paragraph was copied between two documents " +
      "and must be detected by local overlap fingerprinting"
    val docs = Seq(
      (1L, s"unique preamble one ${shared} unique tail alpha beta"),
      (2L, s"completely different opening ${shared} other ending words"),
      (3L, "no overlap here at all just independent content entirely " +
        "unrelated to the others with its own phrasing")
    ).toDF("doc_id", "text")
    val fps = NearDup.winnowedFingerprintsRolling(docs, "doc_id", "text")
    val pairs = NearDup.overlapPairs(fps, minShared = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("rolling winnow selects the same POSITIONS density class as the " +
    "md5 path (both pick one min per complete window)") {
    val docs = Seq((1L, "a" * 50 + "bcdefghij" * 10)).toDF("doc_id", "text")
    val md5Count = NearDup.winnowedFingerprints(docs, "doc_id", "text")
      .count()
    val rollCount = NearDup.winnowedFingerprintsRolling(docs, "doc_id",
      "text").count()
    // distinct fp counts differ slightly (different hash ⇒ different
    // window winners) but both are bounded by the complete-window count
    // and both are non-trivial
    assert(md5Count > 0 && rollCount > 0)
    val maxWindows = (50 + 90) - 16 + 1 - (8 - 1)
    assert(md5Count <= maxWindows && rollCount <= maxWindows)
  }
}
