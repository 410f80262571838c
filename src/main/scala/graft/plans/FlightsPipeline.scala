package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Validation
import graft.operators.{Dedup, Upsert}
import graft.sources.FlightsIo

/** The reference's end-to-end flights pipeline, re-expressed as one lazy
  * DataFrame DAG (SURVEY.md §3.1): scan+repair → union → dedup → validate →
  * export, plus the Excel pivot/mode analyses (§3.3) and the Section-3
  * upsert procedure (§3.2). Golden numbers asserted in FlightsParitySpec.
  *
  * Stage boundaries at scale: the only shuffles are the dedup window
  * (partition by Col_1) and the aggregations; scan → union → validate →
  * export pipelines inside one whole-stage-codegen span.
  */
object FlightsPipeline {

  /** Stages 1–2 (`ETL_Prueba_Tecnica.ipynb:44`): read both v2 files with
    * header repair, tag source priority (10k file first = wins dedup) and
    * intra-file order, union positionally → 15,000 rows. */
  def unified(spark: SparkSession, dir10k: String, dir5k: String): DataFrame =
    FlightsIo.withIngestOrder(FlightsIo.readV2(spark, dir10k), 1)
      .unionAll(FlightsIo.withIngestOrder(FlightsIo.readV2(spark, dir5k), 2))

  /** Stage 3 (`ETL_Prueba_Tecnica.ipynb:60`): keep-first dedup by Col_1 —
    * first occurrence in (source, file-order) wins, exactly pandas
    * `drop_duplicates(keep='first')` on the concat frame. */
  def deduped(unified: DataFrame): DataFrame =
    Dedup.keepFirst(unified, Seq("Col_1"),
      Seq(col("source_priority"), col("ingest_seq")))

  /** Stage 4a (`ETL_Prueba_Tecnica.ipynb:79`): strip the ~200-char padding
    * from Col_8, then flag regex-valid emails. */
  def withEmailValidation(df: DataFrame): DataFrame =
    df.withColumn("Col_8", Validation.normalize(col("Col_8")))
      .withColumn("Email_Valido", Validation.emailValid(col("Col_8")))

  /** Stage 4b (`ETL_Prueba_Tecnica.ipynb:100`): clean phones to digits and
    * classify with the Colombian rules. */
  def withPhoneValidation(df: DataFrame): DataFrame =
    df.withColumn("Col_11_Limpio",
        Validation.pyStrip(Validation.cleanPhone(col("Col_11").cast("string"))))
      .withColumn("Telefono_Estado",
        Validation.classifyPhone(col("Col_11_Limpio")))

  /** Stage 5 (`ETL_Prueba_Tecnica.ipynb:116`): the export frame — the FULL
    * 15,000-row union (not the deduped frame; explicit decision in the
    * reference) with Col_8 stripped and Col_11 digit-normalized. Col_9 and
    * Col_10 are round-tripped through double because the reference's pandas
    * export inferred them as float64 and reformatted (e.g. "0" → "0.0") —
    * this is the one dtype-inference artifact needed for byte parity with
    * the golden CSV. */
  def exportFrame(unified: DataFrame): DataFrame =
    unified
      .withColumn("Col_8", Validation.normalize(col("Col_8")))
      .withColumn("Col_11",
        Validation.pyStrip(Validation.cleanPhone(col("Col_11").cast("string"))))
      .withColumn("Col_9", col("Col_9").cast("double").cast("string"))
      .withColumn("Col_10", col("Col_10").cast("double").cast("string"))

  /** Write the export in file order (10k rows then 5k, as concat left them),
    * one file, utf-8-sig — byte-comparable to the reference's golden
    * `flights_unificado_limpio.csv`. */
  def writeExport(unified: DataFrame, outFile: String): Unit = {
    val ordered = exportFrame(unified)
      .coalesce(1)
      .sortWithinPartitions(col("source_priority"), col("ingest_seq"))
      .select(FlightsIo.columns.map(col): _*)
    FlightsIo.writeCsvUtf8Sig(ordered, outFile)
  }

  /** §1.1 parity-plus: split the `Col_14` pipe-delimited composite
    * (`"10888635|729|45090006|I-Import"`) into typed parts — the one nested
    * record the reference's data carries but never parses. Measured
    * invariants (asserted in FlightsParitySpec): part 3 is `Col_1`
    * zero-padded to 8 on 14,989/15,000 rows, and part 4 refines `Col_12`
    * (E→E; I→I-Import/T-Import/I-Mail). */
  def parseCol14(df: DataFrame): DataFrame =
    df.select(df.columns.map(col) ++ graft.functions.Composite.parts(
      col("Col_14"), "|",
      Seq("c14_src_id", "c14_code", "c14_flight_key", "c14_op_type")): _*)

  /** Cell 18 "Scoring de calidad" realized over the flights validation
    * flags (the reference declares record/table scoring but never builds
    * it): accuracy = email F3 (weight 2) + phone F5 (weight 2) + numeric
    * Col_10 parses (1); completeness = non-blank business key Col_1 (1).
    * Record score in [0,1]; `avg(q_score)` is the table score. Composes
    * the already-parity-tested flag expressions — pure scan-speed
    * projection on top of [[withEmailValidation]]/[[withPhoneValidation]]. */
  def qualityScore(df: DataFrame): DataFrame = {
    val flagged = withPhoneValidation(withEmailValidation(df))
    flagged.withColumn("q_score", graft.functions.Quality.weightedScore(Seq(
      col("Email_Valido") -> 2.0,
      (col("Telefono_Estado") =!= "No Apto") -> 2.0,
      col("Col_10").try_cast("double").isNotNull -> 1.0,
      (Validation.pyStrip(col("Col_1")).isNotNull &&
        length(Validation.pyStrip(col("Col_1"))) > 0) -> 1.0)))
  }

  /** Excel pivot (`ETL_Prueba_Tecnica.ipynb:229-236`, xlsx
    * `Tabla_Dinamica_Col2`): count(Col_1) + sum(Col_10, errors→0) by airline
    * with a grand-TOTAL row via rollup. */
  def pivotByAirline(unified: DataFrame): DataFrame =
    unified.rollup(col("Col_2"))
      .agg(count(col("Col_1")).as("cantidad"),
        round(sum(Validation.castWithDefault(col("Col_10"), 0.0)), 1).as("suma_col10"))
      .select(coalesce(col("Col_2"), lit("TOTAL")).as("aerolinea"),
        col("cantidad"), col("suma_col10"))

  /** Excel mode analysis (xlsx `Duplicados_Col1`): top-k most duplicated
    * flight keys. */
  def mostDuplicated(unified: DataFrame, k: Int): DataFrame =
    Dedup.modeTopK(unified, "Col_1", k)

  /** Section 3 (`seccion3_sql.sql:142-318`): the stored-procedure upsert as
    * pure dataflow. Base ← dedup 5k file (MIN(ctid) ≈ keep first in file
    * order); new ← DISTINCT ON the 10k file (file order as the explicit
    * tiebreak the reference leaves unspecified); merge = new wins on key.
    * Returns (merged, audit) — audit carries the SP's RAISE NOTICE counters. */
  def section3Upsert(spark: SparkSession, base5k: String, new10k: String)
      : (DataFrame, DataFrame) = {
    val base = Dedup.keepFirst(
      FlightsIo.withIngestOrder(FlightsIo.readSection3(spark, base5k), 1),
      Seq("Col_1"), Seq(col("ingest_seq")))
    val nw = Dedup.distinctOn(
      FlightsIo.withIngestOrder(FlightsIo.readSection3(spark, new10k), 1),
      Seq("Col_1"), Seq(col("ingest_seq")))
    val cols = FlightsIo.columns.map(col)
    (Upsert.upsert(base.select(cols: _*), nw.select(cols: _*), "Col_1"),
      Upsert.audit(base, nw, "Col_1"))
  }
}
