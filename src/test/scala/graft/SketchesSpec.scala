package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Relational count-min / Bloom sketches: the structural guarantees
  * (no undercount, no false negatives), collision behavior under a
  * deliberately tiny geometry, and batch mergeability. */
class SketchesSpec extends SparkSpec {
  import sqlImplicits._

  private def zipf = (1 to 2000).map { i =>
    (i.toLong, (i % 37).toLong)  // 37 keys, uniformish
  }.toDF("row_id", "k")

  test("count-min never undercounts, and a tiny width forces overcounts") {
    val df = zipf
    val exact = df.groupBy(col("k")).agg(count(lit(1)).as("exact_cnt"))
    // width 8 << 37 keys: collisions guaranteed somewhere
    val cms = Sketches.countMin(df, col("k").cast("string"), depth = 3, width = 8L)
    val est = Sketches.countMinEstimate(cms, exact, col("k").cast("string"),
      depth = 3, width = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(est.forall { case (_, ex, e) => e >= ex }, "undercount found")
    assert(est.exists { case (_, ex, e) => e > ex },
      "width 8 with 37 keys must collide somewhere")
  }

  test("count-min states merge by summing bucket counts") {
    val a = zipf.filter(col("row_id") <= 1000)
    val b = zipf.filter(col("row_id") > 1000)
    val whole = Sketches.countMin(zipf, col("k").cast("string"), 3, 64L)
    val merged = Sketches.countMin(a, col("k").cast("string"), 3, 64L)
      .unionAll(Sketches.countMin(b, col("k").cast("string"), 3, 64L))
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val diff = whole.as("w").join(merged.as("m"), Seq("d", "bucket"), "full_outer")
      .filter(coalesce(col("w.cnt"), lit(-1L)) =!= coalesce(col("m.cnt"), lit(-2L)))
    assert(diff.count() === 0L)
  }

  test("bloom has no false negatives; a tiny filter shows false positives") {
    val present = (1 to 500).map(i => Tuple1(i.toLong * 2)).toDF("k")
    val bits = Sketches.bloomBits(present, col("k").cast("string"),
      numBits = 512L, numHashes = 3)  // 500 keys × 3 hashes in 512 bits: dense
    val probes = (1 to 1000).map(i => (i.toLong, i % 2 == 0)).toDF("k", "present")
    val got = Sketches.bloomMaybeContains(bits, probes, col("k").cast("string"),
      numBits = 512L, numHashes = 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.forall { case (_, p, m) => !p || m }, "false negative found")
    assert(got.exists { case (_, p, m) => !p && m },
      "a near-saturated filter must show some false positive")
  }
}
