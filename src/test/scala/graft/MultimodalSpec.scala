package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}
import graft.operators.Multimodal.Asset

/** Exercises the multimodal plumbing end-to-end: fake-container round-trip,
  * error routing for malformed payloads, pseudo-embeddings feeding the
  * similarity operators, frame sampling. */
class MultimodalSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val assets = Seq(
    Asset(1L, "image", Multimodal.encodeFake(4, 3, 3)),
    Asset(2L, "image", Multimodal.encodeFake(2, 2, 1)),
    Asset(3L, "image", "JPEGnotreally".getBytes),          // bad magic
    Asset(4L, "image", Array[Byte](0x46, 0x41)),           // truncated
    Asset(5L, "image", Multimodal.encodeFake(4, 3, 3).dropRight(2)) // size lie
  ).toDS()

  test("decode parses valid fake containers and routes malformed ones") {
    val got = Multimodal.decodeImages(assets).collect()
      .map(m => m.asset_id -> m).toMap
    assert(got(1L).valid && got(1L).width === 4 && got(1L).height === 3 &&
      got(1L).channels === 3 && got(1L).n_bytes === 13 + 36)
    assert(got(2L).valid && got(2L).width === 2)
    assert(!got(3L).valid && got(3L).err === "bad magic")
    assert(!got(4L).valid && got(4L).err === "truncated header")
    assert(!got(5L).valid && got(5L).err === "size mismatch")
  }

  test("pseudo-embeddings are deterministic and feed similarity search") {
    val emb = assets.toDF()
      .select(col("asset_id").as("vec_id"),
        Multimodal.fakeEmbedding(col("payload"), 16).as("embedding"))
    val twice = assets.toDF()
      .select(col("asset_id").as("vec_id"),
        Multimodal.fakeEmbedding(col("payload"), 16).as("embedding"))
    assert(emb.collect().map(_.toString).toSeq ===
      twice.collect().map(_.toString).toSeq)
    // identical payloads → cosine 1 with themselves via the operator stack
    val top = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 1), emb, 2)
    assert(top.count() === 2)
    val vals = emb.head().getSeq[Double](1)
    assert(vals.forall(v => v >= -0.5 && v < 0.5))
  }

  test("resize halves dimensions and re-encodes a decodable container") {
    val resized = Multimodal.resize(assets, 2)
    val meta = Multimodal.decodeImages(resized).collect()
      .map(m => m.asset_id -> m).toMap
    assert(meta(1L).valid && meta(1L).width === 2 && meta(1L).height === 1)
    assert(meta(2L).valid && meta(2L).width === 1 && meta(2L).height === 1)
    // invalid payloads pass through untouched
    assert(!meta(3L).valid && meta(3L).err === "bad magic")
  }

  test("frame sampling emits header-relative offsets with stride") {
    val video = Seq(Asset(9L, "video", Multimodal.encodeFake(10, 1, 3))).toDS()
    // payload body = 30 bytes; frames of 10 bytes → 3 frames, every 2nd → 2
    val offs = video.toDF()
      .select(Multimodal.frameOffsets(col("payload"), 10, 2).as("o"))
      .head().getSeq[Int](0)
    assert(offs === Seq(13, 33))
  }

  test("averageHash: a planted near-identical payload (few pixels " +
      "perturbed) lands within Hamming 3 of its original and is found " +
      "by the SimHash banding machinery, while an unrelated image is " +
      "far; corrupt payloads are invalid, never zero-hash impostors") {
    import graft.operators.NearDup
    def px(seed: Long)(i: Int): Int = ((seed * 31 + i) % 256).toInt
    val w = 16
    val h = 16
    val original = Multimodal.encodeFakeWith(w, h, 1)(px(42L))
    // the twin: same image, one pixel (a sampled grid cell) flipped hard
    val twin = Multimodal.encodeFakeWith(w, h, 1)(i =>
      if (i == 0) (px(42L)(i) + 128) % 256 else px(42L)(i))
    val unrelated = Multimodal.encodeFakeWith(w, h, 1)(px(7L))
    val fleet = Seq(
      Asset(1L, "image", original), Asset(2L, "image", twin),
      Asset(3L, "image", unrelated),
      Asset(4L, "image", Array[Byte](1, 2, 3))).toDS()
    val hs = Multimodal.averageHash(fleet).collect()
      .map(p => p.asset_id -> p).toMap
    assert(hs(1L).valid && hs(2L).valid && hs(3L).valid)
    assert(!hs(4L).valid) // corrupt: routed, not hashed
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dTwin = ham(hs(1L).phash, hs(2L).phash)
    assert(dTwin >= 1 && dTwin <= 3,
      s"twin should be near but not identical (got $dTwin)")
    assert(ham(hs(1L).phash, hs(3L).phash) > 3,
      "unrelated image should be far")
    // banding surfaces the planted pair without an all-pairs join
    val edges = NearDup.simhashCandidateEdges(
        fleet.toDF().filter(col("asset_id") =!= 4L)
          .join(Multimodal.averageHash(fleet).toDF()
            .filter(col("valid")), Seq("asset_id"))
          .select(col("asset_id"), col("phash")),
        "asset_id", "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.contains((1L, 2L)))
  }

  test("q239 cross-modal card: set algebra reconciles against the " +
      "standalone gates — drop sets recomputed from q220's pairs and " +
      "q94's verdicts over the common asset universe") {
    val dir = "/root/testdata/sf0.01"
    val card = SparkEntry.queries("q239_modal_agreement")(spark, dir)
      .collect().head
    val universe = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id")).collect().map(_.getLong(0))
      .filter(_ % 97 != 0).toSet
    val perc = SparkEntry.queries("q220_phash_neardup")(spark, dir)
      .select(col("d2")).collect().map(_.getLong(0)).toSet
      .intersect(universe)
    val sem = SparkEntry.queries("q94_semdedup")(spark, dir)
      .filter(col("is_dup")).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet.intersect(universe)
    val both = perc.intersect(sem)
    assert(card.getAs[Long]("n_assets") === universe.size.toLong)
    assert(card.getAs[Long]("n_perc") === perc.size.toLong)
    assert(card.getAs[Long]("n_sem") === sem.size.toLong)
    assert(card.getAs[Long]("n_both") === both.size.toLong)
    assert(card.getAs[Long]("n_union") ===
      perc.union(sem).size.toLong)
    def rnd6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(card.getAs[Double]("jaccard") ===
      rnd6(both.size.toDouble / perc.union(sem).size))
    assert(card.getAs[Double]("contain_perc") ===
      rnd6(both.size.toDouble / perc.size))
    assert(card.getAs[Double]("contain_sem") ===
      rnd6(both.size.toDouble / sem.size))
  }
}
