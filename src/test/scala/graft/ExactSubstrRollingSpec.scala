package graft

import org.apache.spark.sql.functions._

import graft.operators.NearDup

/** The rolling-hash production variant of the exact-substring gram stage
  * (`repeatedSpanGramsRolling`) — hash-equivalence against the md5 oracle
  * path on ASCII, byte-offset sanity on multi-byte text, and the same-JVM
  * timing gate that keeps the native expression honest. */
class ExactSubstrRollingSpec extends SparkSpec {
  import sqlImplicits._

  private val L = 32

  /** A planted cross-document duplicate long enough to clear L, embedded
    * mid-line with different surroundings — the case exact-substring dedup
    * exists for. ASCII only, so byte offsets == char offsets and the two
    * gram variants must yield IDENTICAL spans. */
  private def asciiFixture = {
    val stolen = "the quick brown fox jumps over the lazy dog and then " +
      "keeps running through the mossy forest until nightfall arrives"
    Seq(
      (1L, s"original article opening. $stolen. original closing remarks."),
      (2L, s"completely different lead-in text, $stolen, and another end."),
      (3L, s"third holder of the passage: $stolen! plus trailing words."),
      (4L, "independent document with no shared passage of any kind, " +
        "written entirely in its own phrasing and long enough to gram.")
    ).toDF("doc_id", "text")
  }

  test("ASCII spans: rolling grams yield byte-identical spans to md5 grams") {
    val docs = asciiFixture
    val viaMd5 = NearDup.repeatedSpansFromGrams(
      NearDup.repeatedSpanGrams(docs, "doc_id", "text", L), L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val viaRoll = NearDup.repeatedSpansFromGrams(
      NearDup.repeatedSpanGramsRolling(docs, "doc_id", "text", L), L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(viaMd5.nonEmpty, "fixture must produce repeated spans")
    assert(viaRoll === viaMd5)
    // keep-first: doc 1 (minimum id) holds the first copy and is exempt
    assert(!viaMd5.exists(_._1 == 1L))
    assert(viaMd5.map(_._1) === Set(2L, 3L))
  }

  test("gram tables agree position-for-position on ASCII (same (id, s) " +
    "set, collision-free on the fixture)") {
    val docs = asciiFixture
    val md5Pos = NearDup.repeatedSpanGrams(docs, "doc_id", "text", L)
      .select("id", "s").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val rollPos = NearDup.repeatedSpanGramsRolling(docs, "doc_id", "text", L)
      .select("id", "s").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(rollPos === md5Pos)
  }

  test("multi-byte text: spans are valid BYTE ranges and the planted " +
    "duplicate still surfaces") {
    // é/ñ are 2 UTF-8 bytes, 日 is 3 — char length << byte length
    val stolen = "el señor café con leche visitó 日本語のテキスト y " +
      "continuó caminando por la señal durante toda la mañana fría"
    val docs = Seq(
      (1L, s"primera aparición: $stolen. resto único uno."),
      (2L, s"otro documento distinto — $stolen — con final propio."),
      (3L, "sin pasaje compartido, texto completamente independiente " +
        "escrito con sus propias palabras y suficientemente largo.")
    ).toDF("doc_id", "text")
    val spans = NearDup.repeatedSpansFromGrams(
      NearDup.repeatedSpanGramsRolling(docs, "doc_id", "text", L), L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.nonEmpty, "duplicate must be detected")
    assert(spans.forall(_._1 == 2L), "only the non-first holder is flagged")
    val byteLen = s"otro documento distinto — $stolen — con final propio."
      .getBytes("UTF-8").length.toLong
    spans.foreach { case (_, start, len) =>
      assert(start >= 1L && len >= L.toLong && start + len - 1 <= byteLen,
        s"span [$start, +$len) must lie inside the $byteLen-byte doc")
    }
    // the detected span must cover at least the stolen passage's bytes
    assert(spans.map(_._3).max >= stolen.getBytes("UTF-8").length.toLong)
  }

  test("short and null docs produce no gram rows (same completeness rule " +
    "as the md5 variant)") {
    val docs = Seq((1L, Some("tiny")), (2L, None), (3L, Some("x" * (L - 1))))
      .toDF("doc_id", "text")
    assert(NearDup.repeatedSpanGramsRolling(docs, "doc_id", "text", L)
      .count() === 0L)
    assert(NearDup.repeatedSpanGrams(docs, "doc_id", "text", L)
      .count() === 0L)
  }

  test("TIMING GATE: rolling gram stage beats the md5 oracle stage by at " +
    "least 2x on a same-JVM median-of-3") {
    // Same relative-measurement discipline as WinnowRollingSpec: absolute
    // timings swing on a shared machine, the ratio between two plans over
    // one cached input in one JVM is stable. The gram stage is the
    // bench's heaviest kernel (VERDICT r7 finding #2) — this gate fails
    // if the native expression ever falls out of the codegen fast path.
    // 4x-replicated full sf0.1 corpus: per-position md5 work must be well
    // clear of fixed per-job overhead (~0.1s of scheduling compresses the
    // observable ratio below the gate on a small slice).
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .withColumn("r", explode(sequence(lit(0L), lit(3L))))
      .select((col("doc_id") * 4 + col("r")).as("doc_id"), col("text"))
      .persist()
    docs.count()
    def median3(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }
    // Force the HASH column, not just the row count: `.count()` lets
    // Catalyst prune the md5 projection (the explode row count is known
    // from the sequence alone), which would time the explode, not the
    // digest kernel under comparison. max(gm) needs every hash value and
    // adds only a comparison per row on both sides.
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(max(col("gm"))).head(); ()
    }
    force(NearDup.repeatedSpanGrams(docs, "doc_id", "text", L))
    force(NearDup.repeatedSpanGramsRolling(docs, "doc_id", "text", L))
    val md5Sec = median3(
      force(NearDup.repeatedSpanGrams(docs, "doc_id", "text", L)))
    val rollSec = median3(
      force(NearDup.repeatedSpanGramsRolling(docs, "doc_id", "text", L)))
    docs.unpersist()
    assert(rollSec * 2 <= md5Sec,
      f"rolling $rollSec%.2fs vs md5 $md5Sec%.2fs — production gram " +
        "stage lost its codegen advantage")
  }
}
