package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.operators.Dedup

/** Property tests for the dedup family: idempotence, count arithmetic,
  * deterministic survivor selection, digest dedup. */
class DedupSpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  /** Rows (key, seq, payload) where seq is a unique total order. */
  private val rowsGen: Gen[Seq[(Int, Int, String)]] =
    Gen.listOfN(80, Gen.chooseNum(0, 15)).map(keys =>
      keys.zipWithIndex.map { case (k, i) => (k, i, s"p$i") })

  private def df(rows: Seq[(Int, Int, String)]): DataFrame = {
    import sqlImplicits._
    rows.toDF("k", "seq", "payload")
  }

  test("keepFirst is idempotent") {
    for (seed <- 1L to 5L) {
      val d = df(sample(rowsGen, seed))
      val once = Dedup.keepFirst(d, Seq("k"), Seq(col("seq")))
      val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("seq")))
      assert(twice.collect().toSet === once.collect().toSet, s"seed=$seed")
    }
  }

  test("count arithmetic: total = distinct keys + duplicateCount") {
    for (seed <- 6L to 10L) {
      val rows = sample(rowsGen, seed)
      val d = df(rows)
      val dups = Dedup.duplicateCount(d, "k").head().getLong(0)
      assert(d.count() === Dedup.keepFirst(d, Seq("k"), Seq(col("seq"))).count() + dups,
        s"seed=$seed")
    }
  }

  test("keepFirst keeps exactly the min-seq row per key") {
    for (seed <- 11L to 13L) {
      val rows = sample(rowsGen, seed)
      val expected = rows.groupBy(_._1).map { case (_, g) => g.minBy(_._2) }.toSet
      val got = Dedup.keepFirst(df(rows), Seq("k"), Seq(col("seq")))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("duplicateKeys returns exactly the keys with multiplicity > 1") {
    val rows = sample(rowsGen, 14L)
    val expected = rows.groupBy(_._1).filter(_._2.size > 1).keySet
    val got = Dedup.duplicateKeys(df(rows), "k").collect().map(_.getInt(0)).toSet
    assert(got === expected)
  }

  test("modeTopK: first row is the true mode, ordering is (count desc, key)") {
    val rows = sample(rowsGen, 15L)
    val freq = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val got = Dedup.modeTopK(df(rows), "k", 5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val expected = freq.toSeq.map { case (k, n) => (k, n.toLong) }
      .sortBy { case (k, n) => (-n, k) }.take(5)
    assert(got.toSeq === expected)
  }

  test("exactDedupByDigest collapses equal-content rows to the smallest id") {
    import sqlImplicits._
    val d = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "other"),
      (4L, "same text"), (5L, "other"), (6L, "unique")
    ).toDF("id", "text")
    val got = Dedup.exactDedupByDigest(d, md5(col("text").cast("binary")), "id")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L, 6L))
  }

  test("incrementalNew keeps only within-batch survivors with unseen content") {
    import sqlImplicits._
    val batch = Seq(
      (1L, "seen before"),   // in registry → dropped
      (2L, "fresh"),         // new → kept
      (3L, "fresh"),         // within-batch dup of 2 → dropped
      (4L, "also new"),      // new → kept
      (5L, "seen before")    // registry dup → dropped
    ).toDF("id", "text")
    val seen = Seq("seen before", "ancient").toDF("t")
      .select(md5(col("t").cast("binary")).as("digest"))
    val got = Dedup.incrementalNew(batch, md5(col("text").cast("binary")),
      "id", seen).collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 4L))
  }

  test("incrementalNew with an empty registry is plain exact dedup") {
    import sqlImplicits._
    val batch = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "text")
    val empty = Seq.empty[String].toDF("digest")
    val got = Dedup.incrementalNew(batch, md5(col("text").cast("binary")),
      "id", empty).collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
  }
}
