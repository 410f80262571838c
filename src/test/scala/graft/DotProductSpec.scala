package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.operators.Similarity

/** The native graft_dot expression must be bit-identical to the
  * interpreted HOF fold on every input (the oracle depends on exact
  * sequential float64 summation). */
class DotProductSpec extends SparkSpec {
  import sqlImplicits._

  test("native dot equals the HOF fold bit-for-bit on random vectors") {
    val rnd = new Random(3)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
        Similarity.dot(col("a"), col("b")).as("nat"),
        Similarity.dotFold(col("a"), col("b")).as("fold"))
      .filter(col("nat") =!= col("fold"))
    assert(diff.count() === 0L)
  }

  test("edge cases: empty arrays and self-dot") {
    val df = Seq(
      (Seq.empty[Double], Seq.empty[Double]),
      (Seq(1.5, -2.0), Seq(1.5, -2.0))
    ).toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(got(0) === 0.0)
    assert(got(1) === 1.5 * 1.5 + 4.0)
  }

  test("graft_dot is callable from spark.sql") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      """SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                 CAST(embedding AS ARRAY<DOUBLE>)) AS sq
        |FROM embeddings LIMIT 5""".stripMargin)
      .collect().map(_.getDouble(0))
    assert(r.forall(_ > 0.0))
  }

  test("graft_cosine is bit-identical to the composed three-pass form") {
    import sqlImplicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian()))
    }
    val diff = rows.toDF("id", "a", "b").select(
        Similarity.cosine(col("a"), col("b")).as("fused"),
        Similarity.cosineComposed(col("a"), col("b")).as("composed"))
      .filter(col("fused") =!= col("composed"))
    assert(diff.count() === 0L)
  }

  test("graft_cosine edge cases: unequal lengths match composed; zero norm is NaN") {
    import sqlImplicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)),       // prefix dot, full own norms
      (Seq(1.5, -2.0), Seq(1.5, -2.0))           // self → exactly 1.0
    ).toDF("a", "b")
    val got = df.select(
      Similarity.cosine(col("a"), col("b")).as("f"),
      Similarity.cosineComposed(col("a"), col("b")).as("c")).collect()
    got.foreach { r =>
      val (f, c) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToRawLongBits(f) ===
        java.lang.Double.doubleToRawLongBits(c), s"fused=$f composed=$c")
    }
    assert(got(1).getDouble(0) === 1.0)

    // the ONE documented divergence: a zero-norm vector is DATA for the
    // native expression (IEEE NaN), while the composed form under ANSI
    // throws DIVIDE_BY_ZERO and would kill a corpus-wide scan
    val zero = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    assert(zero.select(Similarity.cosine(col("a"), col("b")))
      .head().getDouble(0).isNaN)
    val thrown = intercept[Exception] {
      zero.select(Similarity.cosineComposed(col("a"), col("b"))).collect()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"), thrown.getMessage)
  }
}
