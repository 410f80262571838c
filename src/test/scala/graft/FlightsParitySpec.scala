package graft

import org.apache.spark.sql.functions._

import graft.plans.FlightsPipeline
import graft.sources.FlightsIo

/** Reference-parity suite: runs the flights pipeline on the reference's own
  * committed CSVs (read-only at /root/reference) and asserts every golden
  * number from BASELINE.md — union/dedup cardinalities, email/phone
  * validation counts, the Excel pivot and mode answers, the Section-3 upsert
  * audit, and the byte-level md5 of the golden export. */
class FlightsParitySpec extends SparkSpec {

  private val refPy = "/root/reference/Seccion_2_Python"
  private val refSql = "/root/reference/Seccion_3_SQL"

  private lazy val unified =
    FlightsPipeline.unified(spark,
      s"$refPy/flights_10000v2.csv", s"$refPy/flights_5000v2.csv").cache()
  private lazy val deduped = FlightsPipeline.deduped(unified).cache()

  test("S1/S2/U1: union of both v2 files has 15,000 rows") {
    assert(unified.count() === 15000L)
  }

  test("S2: corrupt-header file still yields the canonical 19 columns") {
    val df = FlightsIo.readV2(spark, s"$refPy/flights_5000v2.csv")
    assert(df.columns.toSeq === FlightsIo.columns)
    assert(df.count() === 5000L)
    // BOM sits on the skipped header; first data cell must be clean
    val first = df.orderBy(col("Col_1")).select("Col_1").head().getString(0)
    assert(!first.startsWith("﻿"))
  }

  test("D1: 7,331 duplicate rows by Col_1 in the union") {
    val d = graft.operators.Dedup.duplicateCount(unified, "Col_1").head().getLong(0)
    assert(d === 7331L)
  }

  test("D2: keep-first dedup leaves 7,669 rows") {
    assert(deduped.count() === 7669L)
  }

  test("F1/F3: email validation on deduped rows → 7,538 valid / 131 invalid") {
    val v = FlightsPipeline.withEmailValidation(deduped)
      .groupBy(col("Email_Valido")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(v(true) === 7538L)
    assert(v(false) === 131L)
  }

  test("F4/F5: phone classification → 6,767 Celular / 27 Fijo / 875 No Apto") {
    val v = FlightsPipeline.withPhoneValidation(deduped)
      .groupBy(col("Telefono_Estado")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v("Apto - Celular") === 6767L)
    assert(v("Apto - Fijo") === 27L)
    assert(v("No Apto") === 875L)
  }

  test("A4: airline pivot matches the committed Excel golden values") {
    val p = FlightsPipeline.pivotByAirline(unified)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(p("TK") === ((2068L, 958840.2)))
    assert(p("DL") === ((1787L, 623227.8)))
    assert(p("TOTAL") === ((15000L, 11274856.1)))
    assert(p.size === 55) // 54 airlines + TOTAL
  }

  test("D5: most duplicated Col_1 is 45233075 × 32") {
    val top = FlightsPipeline.mostDuplicated(unified, 1).head()
    assert(top.getString(0) === "45233075")
    assert(top.getLong(1) === 32L)
  }

  test("O1/J1-J3: section-3 upsert audit matches the SP's semantics") {
    val (merged, audit) = FlightsPipeline.section3Upsert(spark,
      s"$refSql/flights_5000.csv", s"$refSql/flights_10000.csv")
    val a = audit.head()
    assert(a.getAs[Long]("base_count") === 2754L)
    assert(a.getAs[Long]("new_count") === 5423L)
    assert(a.getAs[Long]("updates") === 2754L)
    assert(a.getAs[Long]("inserts") === 2669L)
    assert(a.getAs[Long]("final_count") === 5423L)
    assert(merged.count() === 5423L)
    // Q4: post-merge uniqueness verification says OK
    val verdict = graft.operators.Upsert.verifyUnique(merged, "Col_1").head()
    assert(verdict.getAs[String]("estado") === "OK")
  }

  test("quality score composes the parity-tested flags consistently") {
    val scored = FlightsPipeline.qualityScore(deduped).cache()
    try {
      // scores live in [0,1]
      assert(scored.filter(col("q_score") < 0 || col("q_score") > 1).count() === 0L)
      // perfect scores == rows passing ALL four flags, counted independently
      val allPass = scored.filter(col("Email_Valido") &&
        col("Telefono_Estado") =!= "No Apto" &&
        col("Col_10").try_cast("double").isNotNull &&
        length(graft.functions.Validation.pyStrip(col("Col_1"))) > 0).count()
      assert(scored.filter(col("q_score") === 1.0).count() === allPass)
      assert(allPass > 6000L, "fixture sanity: most rows should be clean")
      // a failed phone alone costs exactly its weight share: 2/6
      val phoneOnly = scored.filter(col("Email_Valido") &&
        col("Telefono_Estado") === "No Apto" &&
        col("Col_10").try_cast("double").isNotNull &&
        length(graft.functions.Validation.pyStrip(col("Col_1"))) > 0)
      assert(phoneOnly.filter(col("q_score") =!= 0.6667).count() === 0L)
      assert(phoneOnly.count() > 0L)
    } finally { scored.unpersist(); () }
  }

  test("Col_14 composite parses 4 parts with the measured invariants") {
    val parsed = FlightsPipeline.parseCol14(unified).cache()
    try {
      // every row splits into exactly 4 non-null parts
      assert(parsed.filter(col("c14_op_type").isNull).count() === 0L)
      // part 3 == zero-padded Col_1 on all but the 11 measured exceptions.
      // NB: pad-to-at-least-8, not lpad(…, 8) — Spark lpad TRUNCATES longer
      // strings where Python zfill never does, and 3 keys exceed 8 chars.
      val zfilled = when(length(col("Col_1")) >= 8, col("Col_1"))
        .otherwise(lpad(col("Col_1"), 8, "0"))
      val keyMatches = parsed.filter(col("c14_flight_key") === zfilled).count()
      assert(keyMatches === 14989L)
      // part 4 refines Col_12: E→E; I→{I-Import, T-Import, I-Mail}
      val violations = parsed.filter(
        !(col("Col_12") === "E" && col("c14_op_type") === "E") &&
          !(col("Col_12") === "I" && col("c14_op_type")
            .isin("I-Import", "T-Import", "I-Mail"))).count()
      assert(violations === 0L)
    } finally { parsed.unpersist(); () }
  }

  test("S4: export is byte-identical to the reference's golden CSV (md5)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-export").resolve("flights_unificado_limpio.csv")
    FlightsPipeline.writeExport(unified, out.toString)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(out))
      .map("%02x".format(_)).mkString
    assert(md5 === "ac86d247b17b378773a4f218c5a263e8")
  }
}
