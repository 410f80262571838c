package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Greedy sequence packing: budget respected, nothing dropped,
  * deterministic under repartition, oversize docs isolated. */
class PackingSpec extends SparkSpec {
  import sqlImplicits._

  private def fixture = (1 to 500)
    .map(i => (i.toLong, (i * 37 % 90 + 10).toLong)) // weights 10..99
    .toDF("doc_id", "n_tok")

  test("every bin fits the budget and every doc is assigned exactly once") {
    val packed = Packing.packGreedy(fixture, "doc_id", "n_tok",
      budget = 256L, shards = 8)
    assert(packed.count() === 500)
    assert(packed.select("id").distinct().count() === 500)
    val over = packed.groupBy("shard", "bin").agg(sum("w").as("fill"))
      .filter(col("fill") > 256).count()
    assert(over === 0L)
    val stats = Packing.packStats(packed, 256L).head()
    assert(stats.getAs[Long]("illegal_bins") === 0L)
    assert(stats.getAs[Double]("mean_fill") > 0.5, "greedy should pack densely")
  }

  test("deterministic under input repartition") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packGreedy(df, "doc_id", "n_tok", 256L, 8)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(run(fixture) === run(fixture.repartition(13)))
  }

  test("string ids keep their type and pack in lexicographic in-shard order") {
    val df = Seq(("b", 60L), ("a", 60L), ("c", 60L)).toDF("doc_id", "n_tok")
    val packed = Packing.packGreedy(df, "doc_id", "n_tok", 100L, 1)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    // order a,b,c at budget 100: each 60-token doc overflows the previous bin
    assert(packed === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("a NULL weight fails fast with a clear message, not silent corruption") {
    val df = Seq((1L, Option(50L)), (2L, Option.empty[Long])).toDF("doc_id", "n_tok")
    val ex = intercept[Exception] {
      Packing.packGreedy(df, "doc_id", "n_tok", 100L, 1).collect()
    }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("packGreedy"), s"unhelpful failure: $chain")
  }

  test("an over-budget doc gets its own bin, never dropped") {
    val df = Seq((1L, 50L), (2L, 999L), (3L, 60L)).toDF("doc_id", "n_tok")
    val packed = Packing.packGreedy(df, "doc_id", "n_tok", 100L, 1)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(packed.keySet === Set(1L, 2L, 3L))
    // the big doc is alone in its bin
    val bins = Packing.packGreedy(df, "doc_id", "n_tok", 100L, 1)
      .groupBy("bin").agg(collect_list("id").as("ids")).collect()
      .map(r => r.getSeq[Long](1).toSet)
    assert(bins.exists(_ === Set(2L)))
  }

  test("packCard: tokens + waste + over-budget excess tile the capacity " +
      "exactly, and the card conserves the input") {
    val df = (1 to 200).map(i => (i.toLong, (i % 90 + 10).toLong))
      .toDF("doc_id", "n_tok")
    val budget = 128L
    val packed = Packing.packGreedy(df, "doc_id", "n_tok", budget, 4)
      .persist()
    try {
      val c = Packing.packCard(packed, budget).collect()(0)
      val (nBins, nDocs, total, capacity) =
        (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
      val (waste, maxFill, nOver) =
        (c.getLong(4), c.getLong(5), c.getLong(6))
      assert(nDocs === 200L)
      assert(total === df.agg(sum(col("n_tok"))).collect()(0).getLong(0))
      assert(capacity === nBins * budget)
      // per-bin: fill + waste = budget when under, fill alone when over —
      // summed: total + waste − overExcess = capacity
      val overExcess = packed.groupBy(col("shard"), col("bin"))
        .agg(sum(col("w")).as("fill"))
        .filter(col("fill") > budget)
        .agg(coalesce(sum(col("fill") - budget), lit(0L)))
        .collect()(0).getLong(0)
      assert(total + waste - overExcess === capacity)
      assert(maxFill <= budget || nOver > 0)
    } finally { packed.unpersist(); () }
  }
}
