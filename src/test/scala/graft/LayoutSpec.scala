package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: the interleave must be bit-exact, and clusteredWrite
  * must produce files whose cluster-key ranges are pairwise disjoint —
  * the property parquet min/max file skipping needs. */
class LayoutSpec extends SparkSpec {

  /** Reference interleave on the driver, for cross-checking the expression. */
  private def zRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave on a grid") {
    import sqlImplicits._
    val grid = for { a <- 0L until 16L; b <- 0L until 16L } yield (a, b)
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), bits = 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    grid.foreach { case (a, b) =>
      assert(got((a, b)) === zRef(a, b, 4), s"a=$a b=$b")
    }
  }

  test("zValue locality: adjacent cells differ less than distant ones on average") {
    // Sanity of the point of z-ordering: a 1-step neighbor in either
    // dimension stays numerically closer than a far cell, on average.
    val n = 64L
    val near = (0L until n - 1).map(a => math.abs(zRef(a + 1, a, 6) - zRef(a, a, 6)))
    val far = (0L until n - 1).map(a => math.abs(zRef(a, n - 1 - a, 6) - zRef(a, a, 6)))
    assert(near.sum < far.sum)
  }

  test("clusteredWrite yields pairwise-disjoint per-file z ranges") {
    val dir = Files.createTempDirectory("graft_zorder").toString + "/orders_z"
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    Layout.clusteredWrite(orders,
      Layout.zValue(pmod(col("o_custkey"), lit(256L)),
        pmod(col("o_orderkey"), lit(256L)), bits = 8),
      zorderCol = "z", path = dir, numFiles = 8)

    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
      case _ =>
    }
  }

  test("a z-range filter on the clustered table reaches the scan as a pushed filter") {
    val dir = Files.createTempDirectory("graft_zorder2").toString + "/orders_z"
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    Layout.clusteredWrite(orders,
      Layout.zValue(pmod(col("o_custkey"), lit(256L)),
        pmod(col("o_orderkey"), lit(256L)), bits = 8),
      zorderCol = "z", path = dir, numFiles = 8)
    val plan = spark.read.parquet(dir).filter(col("z") < 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(z), LessThan(z,1000)]"), plan)
  }

  test("zValue rejects out-of-range bits") {
    assertThrows[IllegalArgumentException] {
      Layout.zValue(lit(1L), lit(1L), bits = 0)
    }
    assertThrows[IllegalArgumentException] {
      Layout.zValue(lit(1L), lit(1L), bits = 32)
    }
  }

  /** Reference 3-D interleave: bit i of dim j at position 3i + j. */
  private def z3Ref(a: Long, b: Long, c: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (3 * i)) |
        (((b >> i) & 1L) << (3 * i + 1)) |
        (((c >> i) & 1L) << (3 * i + 2))
    }

  test("zValueN: 3-D interleave matches the reference; 2-D case equals zValue") {
    import sqlImplicits._
    val grid = for { a <- 0L until 8L; b <- 0L until 8L; c <- 0L until 8L }
      yield (a, b, c)
    val got = grid.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zValueN(Seq(col("a"), col("b"), col("c")), bits = 3).as("z"),
        Layout.zValueN(Seq(col("a"), col("b")), bits = 3).as("z2n"),
        Layout.zValue(col("a"), col("b"), bits = 3).as("z2"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) === z3Ref(r.getLong(0), r.getLong(1), r.getLong(2), 3))
      assert(r.getLong(4) === r.getLong(5), "zValueN(2 dims) must equal zValue")
    }
    assert(got.map(_.getLong(3)).distinct.length === 512, "bijection on the grid")
  }

  test("hilbertValue: bijection over the grid, consecutive indices are grid " +
      "neighbors (the locality property the z-curve lacks), codegen equals " +
      "the interpreted reference") {
    import sqlImplicits._
    val bits = 2
    val grid = for { a <- 0L until 4L; b <- 0L until 4L; c <- 0L until 4L }
      yield (a, b, c)
    val got = grid.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.hilbertValue(Seq(col("a"), col("b"), col("c")), bits).as("h"))
      .collect().map(r => (r.getLong(3), (r.getLong(0), r.getLong(1), r.getLong(2))))
    // codegen'd expression == interpreted Scala loop
    got.foreach { case (h, (a, b, c)) =>
      assert(h === graft.expressions.HilbertIndex.compute(Array(a, b, c), bits))
    }
    // bijection onto [0, 64)
    val byH = got.toMap
    assert(byH.size === 64 && byH.keys.min === 0L && byH.keys.max === 63L)
    // THE Hilbert property: h and h+1 are Manhattan-distance-1 neighbors.
    // The z-curve fails this at every power-of-two boundary.
    (0L until 63L).foreach { h =>
      val (a1, b1, c1) = byH(h)
      val (a2, b2, c2) = byH(h + 1)
      val d = math.abs(a1 - a2) + math.abs(b1 - b2) + math.abs(c1 - c2)
      assert(d === 1L, s"h=$h: ${byH(h)} -> ${byH(h + 1)} jumps distance $d")
    }
  }

  test("clusteredWrite on a 3-D hilbert key yields disjoint per-file ranges") {
    val dir = Files.createTempDirectory("graft_hilbert").toString + "/orders_h"
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    Layout.clusteredWrite(orders,
      Layout.hilbertValue(Seq(pmod(col("o_custkey"), lit(16L)),
        pmod(col("o_orderkey"), lit(16L)),
        pmod(dayofmonth(col("o_orderdate")).cast("long"), lit(16L))),
        bits = 4),
      zorderCol = "h", path = dir, numFiles = 8)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
      case _ =>
    }
  }

  test("hilbertValue null coordinate yields null; bit budget is enforced") {
    import sqlImplicits._
    val df = Seq((1L, Option.empty[Long]), (2L, Some(3L))).toDF("a", "b")
    val got = df.select(Layout.hilbertValue(Seq(col("a"), col("b")), 4).as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.count(_.isEmpty) === 1 && got.count(_.isDefined) === 1)
    assertThrows[IllegalArgumentException] {
      graft.expressions.HilbertIndex(Seq.empty, 4)
    }
    assertThrows[IllegalArgumentException] {
      Layout.hilbertValue(Seq(col("a"), col("b")), bits = 32)
    }
  }

  test("shardFingerprints: the parts tile the position range with no " +
      "gap/overlap, the release fp is the XOR of the part fps, and " +
      "any single-row change (content OR order) changes the release fp") {
    import sqlImplicits._
    val manifest = (1 to 97).map(i =>
      (i.toLong, i.toLong % 8, i.toLong % 11, (i * 13 % 50 + 5).toLong))
      .toDF("pos", "shard", "bin", "n_tokens")
    def card(df: org.apache.spark.sql.DataFrame) =
      Layout.shardFingerprints(df, "pos",
        concat_ws(":", col("shard"), col("bin")), "n_tokens", nParts = 6)
        .collect()
    val rows = card(manifest)
    val parts = rows.filter(_.getAs[String]("part") != "~release")
      .sortBy(_.getAs[String]("part"))
    val rel = rows.find(_.getAs[String]("part") == "~release").get
    assert(parts.length === 6)
    // contiguous tiling: each part's range is dense and they abut
    parts.foreach { p =>
      assert(p.getAs[Long]("last_pos") - p.getAs[Long]("first_pos") + 1 ===
        p.getAs[Long]("n_rows"))
    }
    assert(parts.map(_.getAs[Long]("n_rows")).sum === 97L)
    assert(parts.sliding(2).forall {
      case Array(a, b) => a.getAs[Long]("last_pos") + 1 ===
        b.getAs[Long]("first_pos")
      case _ => true
    })
    assert(rel.getAs[Long]("n_rows") === 97L &&
      rel.getAs[Long]("first_pos") === 1L &&
      rel.getAs[Long]("last_pos") === 97L)
    assert(parts.map(_.getAs[Long]("fp")).reduce(_ ^ _) ===
      rel.getAs[Long]("fp"),
      "release fp must be the XOR of the part fps")
    // a content change flips the release fp ...
    val mutated = manifest.withColumn("bin",
      when(col("pos") === 42L, lit(99L)).otherwise(col("bin")))
    assert(card(mutated).find(_.getAs[String]("part") == "~release").get
      .getAs[Long]("fp") !== rel.getAs[Long]("fp"))
    // ... and so does a pure ORDER swap (same row multiset, two rows
    // exchange positions — only the pos:key pairing differs)
    val swapped = manifest.withColumn("pos",
      when(col("pos") === 10L, lit(20L))
        .when(col("pos") === 20L, lit(10L)).otherwise(col("pos")))
    assert(card(swapped).find(_.getAs[String]("part") == "~release").get
      .getAs[Long]("fp") !== rel.getAs[Long]("fp"))
  }
}
