package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tombstone-driven DELETION from stored derived tables — the takedown
  * night every real corpus eventually runs (copyright / PII removal
  * requests): given a tombstone id set, drop the condemned rows from a
  * stored artifact (ANN code tables, IVF indexes, registry exemplars,
  * packed-batch manifests) by ANTI-JOIN, never by rescanning or
  * re-deriving from the corpus.
  *
  * Why the anti-join is SAFE (not just cheap): every stored artifact in
  * this engine is row-local in the corpus — [[Similarity.pqEncodeFrozen]]
  * encodes each vector independently against a FROZEN codebook,
  * [[Similarity.sq8Quantize]] scales each vector by its own max,
  * [[Similarity.ivfAdcIndex]] is a per-vector equi-join of two row-local
  * tables — so deleting rows from the store is ROW-IDENTICAL to
  * re-deriving the store from the survivor corpus with the same frozen
  * artifacts (TakedownSpec pins it per family). The one table where that
  * equivalence deliberately does NOT hold is a registry's exemplar set:
  * re-clustering survivors would pick different exemplars; the takedown
  * contract there is "deleted exemplars stop covering, surviving
  * exemplars keep covering" ([[Similarity.semDedupVsRegistry]] fed the
  * purged table — monotone un-covering, pinned in TakedownSpec).
  *
  * Scale shape: one left-anti equi-join per store, tombstone side
  * broadcast by AQE when small (takedown lists are; the store is the big
  * side and streams through). Cost is O(|store|) with zero corpus I/O —
  * at 100 TB the corpus parquet is never opened, only the (much smaller)
  * derived stores are rewritten. The reference's own signature dedup is
  * literally a DELETE (seccion3_sql.sql:184-189); this is that operation
  * at index/registry scale.
  */
object Takedown {

  /** Drop every row of `store` whose `idCol` appears in `tombstones`
    * (same column name on both sides). Pure left-anti equi-join: no
    * distinct needed on the tombstone side (anti-join semantics ignore
    * duplicates), no corpus access, null-safe (a null id never matches a
    * tombstone and survives — stores here never carry null ids). */
  def purge(store: DataFrame, tombstones: DataFrame,
      idCol: String): DataFrame =
    store.join(tombstones.select(col(idCol)), Seq(idCol), "left_anti")
      // the equi-join moves idCol first; a purge must hand back the
      // store's exact schema (column order included) so delete==rebuild
      // holds row-identically
      .select(store.columns.map(col).toIndexedSeq: _*)

  /** The receipt a takedown night files: per store, rows before, rows
    * dropped, rows after — one aggregate over each side of the purge.
    * `dropped` counts STORE rows removed (a tombstoned vector holds m
    * code rows), not tombstone ids; ids with no store row cost nothing
    * and appear nowhere, which is the idempotence a re-filed takedown
    * request needs. */
  def purgeReceipt(store: DataFrame, tombstones: DataFrame, idCol: String,
      storeName: String): DataFrame = {
    // ONE store pass (round-20, guide §2.3 "aggregate before you
    // shuffle"): the historic form scanned the store twice (a count and
    // an anti-join + count, crossJoined) — but dropped = matched, so a
    // left join against the DISTINCT tombstone ids (distinct keeps the
    // ≤1-match-per-row arithmetic exact when a takedown request is
    // re-filed with duplicates) flags each row and one aggregate reads
    // off both numbers. The tombstone side is id-sized and explicitly
    // broadcast; rows_after = before − dropped is the purge count by
    // the same left_anti complement identity.
    require(!store.columns.contains("__tomb"),
      "column __tomb collides with purgeReceipt internals; rename first")
    val tomb = broadcast(tombstones.select(col(idCol)).distinct()
      .withColumn("__tomb", lit(true)))
    store.join(tomb, Seq(idCol), "left")
      .agg(count(lit(1)).as("rows_before"),
        coalesce(sum(when(col("__tomb"), 1L).otherwise(0L)), lit(0L))
          .as("rows_dropped"))
      .select(lit(storeName).as("store"), col("rows_before"),
        col("rows_dropped"),
        (col("rows_before") - col("rows_dropped")).as("rows_after"))
  }
}
