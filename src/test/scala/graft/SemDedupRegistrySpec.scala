package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Cross-batch SemDeDup (`trainedCentroids` / `assignEmbeddings` /
  * `semDedupExemplars` / `semDedupVsRegistry`) — the embedding-space
  * registry that closes the quadrilateral: empty-registry degradation to
  * the within-batch prune, history coverage invisible within the batch,
  * and the compactRegistry lifecycle composition (tombstone readmission,
  * verdict preservation for surviving holders). */
class SemDedupRegistrySpec extends SparkSpec {
  import sqlImplicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, dir, "embeddings")

  private def emptyExemplars =
    Seq.empty[(Long, Long, Seq[Double])].toDF("cluster", "vec_id", "e")

  test("empty registry degrades EXACTLY to the within-batch prune " +
      "(q178 fixture geometry)") {
    val frozen = Similarity.trainedCentroids(
      Similarity.lloydAssigned(emb.filter(col("vec_id") < 250),
        iters = 2, k = 16))
    val ba = Similarity.assignEmbeddings(
      emb.filter(col("vec_id") >= 250), frozen).persist()
    try {
      val got = Similarity.semDedupVsRegistry(ba, emptyExemplars,
        tau = 0.3, maxPerCluster = 16L)
      assert(got.filter(col("vs_history")).count() === 0L)
      val want = Similarity.semDedupFromAssigned(ba,
        tau = 0.3, maxPerCluster = 16L)
      val g = got.select(col("vec_id"), col("cluster"), col("is_dup"))
      val w = want.select(col("vec_id"), col("cluster"), col("is_dup"))
      assert(g.except(w).count() === 0L)
      assert(w.except(g).count() === 0L)
    } finally { ba.unpersist(); () }
  }

  test("a history exemplar drops a batch vector that is UNIQUE within " +
      "its batch — and with no first-holder exemption") {
    // cluster 0's exemplar is identical to batch vector 10; vector 11
    // sits alone in cluster 1 — only the registry can see 10's twin
    val exemplars = Seq((0L, 1L, Seq(1.0, 0.0)))
      .toDF("cluster", "vec_id", "e")
    val batch = Seq(
      (10L, Seq(1.0, 0.0), 0L),
      (11L, Seq(0.0, 1.0), 1L)).toDF("vec_id", "e", "cluster")
    val got = Similarity.semDedupVsRegistry(batch, exemplars,
        tau = 0.9, maxPerCluster = 16L)
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3)))
    assert(got === Array((10L, true, true), (11L, false, false)))
  }

  test("exemplar builder keeps only capped smallest-id SURVIVORS with " +
      "their vectors") {
    // cluster 0: three identical vectors — 1 survives, 2 and 3 are dups;
    // cluster 1: two orthogonal-ish vectors both survive, cap 1 keeps
    // only the smallest id
    val assigned = Seq(
      (1L, Seq(1.0, 0.0), 0L),
      (2L, Seq(1.0, 0.0), 0L),
      (3L, Seq(1.0, 0.0), 0L),
      (4L, Seq(0.0, 1.0), 1L),
      (5L, Seq(1.0, 0.0), 1L)).toDF("vec_id", "e", "cluster")
    val ex = Similarity.semDedupExemplars(assigned, tau = 0.9,
        maxPerCluster = 1L)
      .orderBy(col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ex === Array((0L, 1L), (1L, 4L)))
  }

  test("compactRegistry composition: a tombstoned source's exemplars " +
      "retire and READMIT their content; surviving holders keep blocking") {
    // exemplar payload keyed by vec_id + provenance log — srcA holds the
    // cluster-0 exemplar, srcB the cluster-1 exemplar
    val payload = Seq(
      (0L, 1L, Seq(1.0, 0.0)),
      (1L, 2L, Seq(0.0, 1.0))).toDF("cluster", "vec_id", "e")
    val log = Seq(
      (1L, "srcA", 0L),
      (2L, "srcB", 0L)).toDF("vec_id", "source", "batch_id")
    val batch = Seq(
      (10L, Seq(1.0, 0.0), 0L),
      (11L, Seq(0.0, 1.0), 1L)).toDF("vec_id", "e", "cluster")

    def pruneAgainst(tomb: org.apache.spark.sql.DataFrame) = {
      val surviving = Dedup.compactRegistry(log, "vec_id", "source",
          "batch_id", tomb)
        .select(col("vec_id"))
      Similarity.semDedupVsRegistry(batch,
          payload.join(surviving, Seq("vec_id"), "left_semi"),
          tau = 0.9, maxPerCluster = 16L)
        .orderBy(col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    }
    val noTomb = Seq.empty[String].toDF("source")
    assert(pruneAgainst(noTomb) === Array((10L, true), (11L, true)))
    // retiring srcA readmits vector 10's content; srcB still blocks 11
    val tombA = Seq("srcA").toDF("source")
    assert(pruneAgainst(tombA) === Array((10L, false), (11L, true)))
  }

  test("tau curve: every point equals the full prune's dup count at that " +
      "tau, and n_dup is non-increasing in tau") {
    val assigned = Similarity.lloydAssigned(emb, iters = 2, k = 22)
      .persist()
    try {
      val taus = Seq(0.2, 0.3, 0.4)
      val curve = Similarity.semDedupTauCurve(assigned, taus,
          maxPerCluster = 16L)
        .orderBy(col("tau"))
        .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      assert(curve.map(_._1).toSeq === taus)
      // per-point equality with the full prune
      taus.zip(curve).foreach { case (tau, (_, nVecs, nDup)) =>
        val full = Similarity.semDedupFromAssigned(assigned, tau,
          maxPerCluster = 16L)
        assert(nVecs === full.count(), s"n_vecs off at tau=$tau")
        assert(nDup === full.filter(col("is_dup")).count(),
          s"n_dup off at tau=$tau")
      }
      // monotone: a vector duplicated at tau is duplicated at every
      // lower tau
      assert(curve.map(_._3).toSeq === curve.map(_._3).sorted.reverse)
    } finally { assigned.unpersist(); () }
  }
}
