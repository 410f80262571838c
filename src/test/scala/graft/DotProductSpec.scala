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
}
