package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** C4-style line-level corpus dedup: global keep-first semantics, original
  *-order reassembly, and the all-lines-lost drop behavior. */
class CorpusLineDedupSpec extends SparkSpec {
  import sqlImplicits._

  private def lines(rows: (Long, String)*) =
    Dedup.toWordLines(rows.toDF("id", "text"), "id", "text", wordsPerLine = 2)

  test("toWordLines chunks words, keeps a short tail line, carries n_tot") {
    val got = lines((1L, "a b c d e")).orderBy("pos")
      .select("pos", "line", "n_tot").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((0, "a b", 3L), (1, "c d", 3L), (2, "e", 3L)))
  }

  test("a corpus-repeated line survives only at its smallest (id, pos)") {
    val out = Dedup.dedupCorpusLines(
      lines((2L, "x y a b"), (1L, "p q x y"), (3L, "x y")), "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // "x y" first occurs in doc 1 at pos 1; docs 2 and 3 lose their copy.
    assert(out.toSeq === Seq(
      (1L, 2L, 0L, "p q\nx y"),
      (2L, 1L, 1L, "a b")))
    // doc 3 lost its only line and drops out entirely
    assert(!out.exists(_._1 == 3L))
  }

  test("within-doc duplicate lines keep only the first position") {
    val out = Dedup.dedupCorpusLines(lines((5L, "a b c d a b")), "id").collect()
    assert(out.head.getLong(1) === 2L) // "a b", "c d"
    assert(out.head.getString(3) === "a b\nc d")
  }

  test("a duplicate-free corpus round-trips text exactly") {
    val df = Seq((1L, "k v w x"), (2L, "m n o")).toDF("id", "text")
    val out = Dedup.dedupCorpusLines(
      Dedup.toWordLines(df, "id", "text", 2), "id")
      .select(col("id"), regexp_replace(col("text_clean"), "\n", " ").as("t"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "k v w x"), (2L, "m n o")))
  }
}
