package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.expressions.RollingHash
import graft.operators.NearDup

/** The native O(len) rolling-hash expression and the fast winnowing path
  * built on it. */
class WinnowRollingSpec extends SparkSpec {
  import sqlImplicits._

  private def rollCol(n: Int) = ColumnBridge.toColumn(
    RollingHash(ColumnBridge.toExpression(col("t")), n,
      RollingHash.DefaultBase))

  /** Driver-side reference: the definition, computed directly (no
    * incremental update) — pins both the polynomial and the window set. */
  private def reference(s: String, n: Int): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    if (b.length < n) Seq.empty
    else (0 to b.length - n).map { i =>
      var h = 0L
      for (j <- i until i + n) h = h * RollingHash.DefaultBase + (b(j) & 0xff)
      h
    }
  }

  test("rolling hash equals the direct polynomial definition") {
    val texts = Seq("hello rolling world", "abc", "ab", "",
      "aaaaaaaaaaaaaaaa", "x" * 100)
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    val got = df.select(col("id"), rollCol(3).as("hs")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) === reference(t, 3), s"text '$t'")
    }
  }

  test("rolling hash agrees between codegen and interpreted paths") {
    val df = Seq((1, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "t")
    val viaCodegen = df.select(rollCol(16)).head().getSeq[Long](0)
    // interpreted: eval() directly on the expression
    val ev = RollingHash(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          "the quick brown fox jumps over the lazy dog")),
      16, RollingHash.DefaultBase).eval(null)
    val viaEval = ev.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(viaCodegen === viaEval)
  }

  test("SQL surface: graft_rolling_hash matches and demands a literal") {
    val n = spark.sql(
      "SELECT size(graft_rolling_hash('abcdef', 3)) AS m").head().getInt(0)
    assert(n === 4) // 6 − 3 + 1
  }

  test("rolling winnow keeps the guarantee: a planted shared paragraph " +
    "surfaces, disjoint docs do not") {
    val shared = "this exact paragraph was copied between two documents " +
      "and must be detected by local overlap fingerprinting"
    val docs = Seq(
      (1L, s"unique preamble one ${shared} unique tail alpha beta"),
      (2L, s"completely different opening ${shared} other ending words"),
      (3L, "no overlap here at all just independent content entirely " +
        "unrelated to the others with its own phrasing")
    ).toDF("doc_id", "text")
    val fps = NearDup.winnowedFingerprintsRolling(docs, "doc_id", "text")
    val pairs = NearDup.overlapPairs(fps, minShared = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("cdcChunksRolling: exact tiling, whole-doc short chunks, and " +
    "boundary re-synchronization after an insertion") {
    val tail = scala.util.Random.alphanumeric.take(400).mkString
    val docs = Seq(
      (1L, s"common prefix $tail"),
      (2L, s"INSERTED-EDIT common prefix $tail"), // same content, shifted
      (3L, "tiny")                                // shorter than the window
    ).toDF("doc_id", "text")
    val got = NearDup.cdcChunksRolling(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val texts = Map(1L -> s"common prefix $tail",
      2L -> s"INSERTED-EDIT common prefix $tail", 3L -> "tiny")
    got.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._3 == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3)
        case _ =>
      }
      assert(sorted.map(_._4).sum == texts(id).length.toLong)
    }
    assert(got.filter(_._1 == 3L).map(x => (x._2, x._3, x._4)).toSeq ==
      Seq((1L, 1L, 4L)))
    val h1 = got.filter(_._1 == 1L).map(_._5).toSet
    val h2 = got.filter(_._1 == 2L).map(_._5).toSet
    assert((h1 & h2).size >= h1.size / 2,
      s"only ${(h1 & h2).size} of ${h1.size} chunks survived the insertion")
  }

  test("rolling winnow selects the same POSITIONS density class as the " +
    "md5 path (both pick one min per complete window)") {
    val docs = Seq((1L, "a" * 50 + "bcdefghij" * 10)).toDF("doc_id", "text")
    val md5Count = NearDup.winnowedFingerprints(docs, "doc_id", "text")
      .count()
    val rollCount = NearDup.winnowedFingerprintsRolling(docs, "doc_id",
      "text").count()
    // distinct fp counts differ slightly (different hash ⇒ different
    // window winners) but both are bounded by the complete-window count
    // and both are non-trivial
    assert(md5Count > 0 && rollCount > 0)
    val maxWindows = (50 + 90) - 16 + 1 - (8 - 1)
    assert(md5Count <= maxWindows && rollCount <= maxWindows)
  }

  test("cdcChunksRolling on multi-byte text: byte-consistent offsets tile " +
    "the UTF-8 length exactly, no negative or empty chunks") {
    // é (2 bytes), ñ (2 bytes), 日 (3 bytes) — char length << byte length,
    // the case that used to misalign when RollingHash's byte boundaries
    // were sliced with character offsets
    val t1 = "café señor " * 30 + "日本語テキスト " * 10
    val t2 = "naïve résumé " * 25
    val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    val got = NearDup.cdcChunksRolling(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byteLen = Map(1L -> t1.getBytes("UTF-8").length.toLong,
      2L -> t2.getBytes("UTF-8").length.toLong)
    got.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._3 == 1L, "first chunk starts at byte 1")
      assert(sorted.forall(_._4 > 0L), s"doc $id has a non-positive chunk")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3, "chunks must tile")
        case _ =>
      }
      assert(sorted.map(_._4).sum == byteLen(id),
        s"doc $id chunks cover ${sorted.map(_._4).sum} of ${byteLen(id)} bytes")
    }
  }

  test("TIMING GATE: the rolling-hash winnow path beats the md5 oracle " +
    "path by at least 2x on a same-JVM median-of-3") {
    // Relative same-session measurement (absolute timings swing 10x on a
    // shared machine; the RATIO between two plans over the identical
    // cached input in one JVM is stable). VERDICT r6 measured 3.2x, so a
    // 2x gate has real margin while still failing if the native
    // expression ever silently falls out of the fast path. sf0.1 slice:
    // at sf0.01 the fixed per-job overhead (~0.2s of scheduling/shuffle
    // setup) compresses the observable ratio below the gate.
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .filter(col("doc_id") < 2000)
      .select(col("doc_id"), col("text")).persist()
    docs.count() // materialize once; both paths read the same blocks
    def median3(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }
    // warm both plans (codegen compile, shuffle setup) before timing
    NearDup.winnowedFingerprints(docs, "doc_id", "text").count()
    NearDup.winnowedFingerprintsRolling(docs, "doc_id", "text").count()
    val md5Sec = median3(
      NearDup.winnowedFingerprints(docs, "doc_id", "text").count())
    val rollSec = median3(
      NearDup.winnowedFingerprintsRolling(docs, "doc_id", "text").count())
    docs.unpersist()
    assert(rollSec * 2 <= md5Sec,
      f"rolling $rollSec%.2fs vs md5 $md5Sec%.2fs — production path " +
        "lost its codegen advantage")
  }
}
