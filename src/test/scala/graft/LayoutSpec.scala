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
}
