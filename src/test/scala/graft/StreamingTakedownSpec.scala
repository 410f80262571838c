package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Takedown}

/** Continuous form of the q194/q195 takedown night: removal REQUESTS
  * (tombstone ids) arrive as a stream and each micro-batch purges the
  * stored table in place — the deployment shape a legal-removal queue
  * actually has. Contracts: the final store equals the ONE-SHOT purge
  * of the union of all requests (order-free), a re-delivered request
  * (at-least-once delivery) and an id with no store rows are both
  * harmless, and no condemned id is ever searchable after its night. */
class StreamingTakedownSpec extends SparkSpec {
  import sqlImplicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, dir, "embeddings")

  // batch 2 re-delivers 9 (at-least-once) and files 100009 (unknown id)
  private val requests: Seq[Seq[Long]] =
    Seq(Seq(9L, 32L), Seq(55L, 78L), Seq(9L, 100009L))

  test("foreachBatch takedown nights converge to the one-shot purge of " +
      "the union of requests; re-delivery and unknown ids are no-ops; " +
      "condemned ids become unsearchable") {
    implicit val ctx = spark.sqlContext
    val initial = Similarity.sq8Quantize(emb).localCheckpoint(true)
    var store = initial
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("vec_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        store = Takedown.purge(store, batch, "vec_id")
          .localCheckpoint(true)
        ()
      }
      .start()
    try {
      requests.foreach { ids =>
        in.addData(ids: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val union = requests.flatten.distinct.toDF("vec_id")
    val oneShot = Takedown.purge(initial, union, "vec_id")
    assert(store.except(oneShot).count() === 0L)
    assert(oneShot.except(store).count() === 0L)
    // the condemned ids are gone; everything else survived
    assert(store.join(union, Seq("vec_id"), "left_semi").count() === 0L)
    assert(store.count() ===
      initial.count() - initial.join(union, Seq("vec_id"), "left_semi")
        .count())
    // and a search over the purged store cannot return a condemned id
    val hits = Similarity.sq8DotTopK(emb.filter(col("vec_id") < 4),
      store, k = 10)
    assert(hits.join(union, Seq("vec_id"), "left_semi").count() === 0L)
  }
}
