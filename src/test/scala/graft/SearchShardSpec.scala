package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Rendezvous, Similarity}

/** Wave-10 operators: rendezvous sharding, positional phrase search,
  * hard-negative mining. */
class SearchShardSpec extends SparkSpec {
  import sqlImplicits._

  test("rendezvous assignment moves ONLY the removed shard's keys") {
    val df = (1 to 2000).map(_.toLong).toDF("id")
    val all = Seq("s1", "s2", "s3", "s4")
    val before = Rendezvous.assign(df, col("id").cast("string"), all)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("shard")).toMap
    val after = Rendezvous.assign(df, col("id").cast("string"),
      all.filterNot(_ == "s3"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("shard")).toMap
    before.foreach { case (id, s) =>
      if (s == "s3") assert(after(id) != "s3")
      else assert(after(id) === s, s"key $id moved needlessly")
    }
    // every surviving shard still holds something (sanity on the spread)
    assert(after.values.toSet === Set("s1", "s2", "s4"))
  }

  test("rendezvous spread is roughly even") {
    val df = (1 to 3000).map(_.toLong).toDF("id")
    val counts = Rendezvous.assign(df, col("id").cast("string"),
      Seq("a", "b", "c")).groupBy("shard").count()
      .collect().map(_.getLong(1))
    assert(counts.length === 3)
    assert(counts.min > 800 && counts.max < 1200, counts.mkString(","))
  }

  test("phraseHits finds all aligned occurrences, including overlapping " +
    "and repeated-term phrases") {
    val docs = Seq(
      (1L, "a b c x a b c"),   // "a b c" twice, at 0 and 4
      (2L, "a a a a"),         // "a a" three times (overlapping)
      (3L, "c b a"),           // reversed — no hit
      (4L, "a b")              // too short for "a b c"
    ).toDF("doc_id", "text")
    val abc = TextAnalysis.phraseHits(docs, "doc_id", "text",
      Seq("a", "b", "c")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(abc === Map(1L -> ((2L, 0L))))
    val aa = TextAnalysis.phraseHits(docs, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa === Map(2L -> 3L))
  }

  test("hardNegatives never returns the query's own label and ranks by " +
    "similarity") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),   // query, label 0
      (1L, Array(1.0f, 0.01f), 0),  // same label — must be excluded
      (2L, Array(1.0f, 0.1f), 1),   // near, different label → rank 1
      (3L, Array(0.0f, 1.0f), 1),   // far, different label → rank 2
      (4L, Array(1.0f, 0.2f), 0)    // same label — excluded
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs.filter(col("vec_id") === 0),
      vecs, k = 5).orderBy("rnk").collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(2L, 3L))
    assert(out.forall(_.getAs[Int]("neg_label") == 1))
    assert(out.head.getAs[Double]("sim") > out.last.getAs[Double]("sim"))
  }
}
