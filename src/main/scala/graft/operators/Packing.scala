package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training-data batching: assign each document to a
  * bin so no bin's total weight (token count) exceeds `budget` — the step
  * that turns a cleaned corpus into fixed-budget training sequences.
  *
  * Greedy packing is inherently sequential (each decision depends on the
  * running bin fill), so it cannot be a pure relational plan. The scale
  * shape: shard the corpus by a deterministic hash of the id (shards are
  * independent → embarrassingly parallel), hash-partition by shard and
  * sort WITHIN partitions by (shard, id) — Spark's external sort, which
  * spills — then run the sequential greedy as a pure streaming pass over
  * each partition's iterator. No shard is ever materialized in memory:
  * the greedy state is three scalars, so a shard larger than executor
  * memory still packs (the sort spills; the scan streams). Shard count
  * controls the parallelism/packing-quality trade: more shards = more
  * parallel + marginally more slack in the last bin of each shard.
  *
  * Deterministic: shard = md5-based hash of the id's string form (stable
  * across runs/partitionings), in-shard order = the id's natural order
  * (its original type — a string id sorts lexicographically). An
  * over-budget single document gets its own bin (never dropped, never
  * split — splitting is [[graft.functions.TextAnalysis.chunks]]'s job
  * upstream).
  */
object Packing {

  /** @return (id, weight, shard, bin) — bin is per-shard, 0-based; `id`
    * keeps its original type. A NULL/non-numeric weight fails fast with a
    * clear message (silently casting would corrupt the packing). */
  def packGreedy(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val keyed = df.select(col(idCol).as("id"),
      col(weightCol).cast("long").as("w"),
      Sampling.hashBucket(col(idCol).cast("string"), shards).as("shard"))
    val arranged = keyed
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
    val outSchema = arranged.schema.add("bin", LongType, nullable = false)
    arranged.mapPartitions { rows =>
      var curShard = -1L // hashBucket is in [0, shards), so -1 never collides
      var bin = 0L
      var fill = 0L
      rows.map { r =>
        if (r.isNullAt(1))
          throw new IllegalArgumentException(
            s"packGreedy: weight '$weightCol' is NULL or non-numeric for id ${r.get(0)}")
        val shard = r.getLong(2)
        if (shard != curShard) { curShard = shard; bin = 0L; fill = 0L }
        val w = r.getLong(1)
        if (fill > 0 && fill + w > budget) { bin += 1; fill = 0L }
        fill += w
        Row(r.get(0), w, shard, bin)
      }
    }(Encoders.row(outSchema))
  }

  /** Seeded EPOCH SHUFFLE — the deterministic training order that hands
    * a stored packing's bins to a trainer reproducibly: rank bins by
    * `md5(seed:shard:bin)` (tiebreak (shard, bin) — total order), one
    * permutation per seed, so epoch N's order is a pure function of
    * (packing, N) and any engine, any partitioning, any restart
    * re-derives the identical sequence — the same md5 discipline as
    * [[Sampling.hashBucket]]. Docs inside a bin keep their pack order;
    * the shuffle permutes whole bins (sequence assembly happened at
    * packing time and is not re-randomized).
    *
    * Scale shapes: the manifest is BIN-sized (corpus tokens / budget
    * rows), aggregated from the packing with one map-side-combinable
    * groupBy; the global position comes from [[Ranking.globalRank]]'s
    * range-partition + broadcast-offset construction — NO
    * single-partition window even when bins number in the billions. To
    * hand the order to a trainer as files, range-partition the result
    * on `pos` and write ([[Layout.clusteredWrite]] — each file then
    * covers a disjoint contiguous slice of the epoch, which is exactly
    * a data-loader shard; PackingSpec pins the file-range property).
    *
    * @return (pos, shard, bin, n_docs, n_tokens, order_key) — pos is
    *         1-based and unique; order_key the md5 hex the order is
    *         defined by */
  def epochShuffle(packed: DataFrame, seed: Long,
      parts: Int = 32): DataFrame = {
    val bins = packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_tokens"))
      .withColumn("order_key",
        md5(concat_ws(":", lit(seed), col("shard"), col("bin"))
          .cast("binary")))
    Ranking.globalRank(bins,
        Seq(col("order_key"), col("shard"), col("bin")), parts)
      .select(col("rank").as("pos"), col("shard"), col("bin"),
        col("n_docs"), col("n_tokens"), col("order_key"))
  }

  /** The packing-efficiency CARD — the padding-waste accounting a
    * training-data batch actually reports (every unfilled token slot in
    * a fixed-length training sequence is wasted compute): bins, docs,
    * packed tokens, nominal capacity, the summed per-bin waste
    * `max(0, budget − fill)`, the global fill rate, the hottest bin and
    * the over-budget bin count (legal only for single over-budget
    * docs — [[packStats]]' invariant, PackingSpec pins it). All columns
    * are exact integers except the one fill-rate division; the input is
    * a (persisted) [[packGreedy]] table, so the card costs one
    * bin-sized aggregate.
    * @return one row: (n_bins, n_docs, total_tokens, capacity,
    *         sum_waste, max_fill, n_overbudget, fill_rate) */
  def packCard(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(sum(col("w")).as("fill"), count(lit(1)).as("docs"))
      .agg(count(lit(1)).as("n_bins"),
        coalesce(sum(col("docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("fill")), lit(0L)).as("total_tokens"),
        (count(lit(1)) * budget).as("capacity"),
        coalesce(sum(when(col("fill") < budget, lit(budget) - col("fill"))
          .otherwise(0L)), lit(0L)).as("sum_waste"),
        coalesce(max(col("fill")), lit(0L)).as("max_fill"),
        coalesce(sum(when(col("fill") > budget, 1L).otherwise(0L)),
          lit(0L)).as("n_overbudget"))
      // empty-packing guard: zero capacity reads as zero fill, not null
      .withColumn("fill_rate", when(col("capacity") === 0, lit(0.0))
        .otherwise(round(col("total_tokens").cast("double") /
          col("capacity").cast("double"), 6)))

  /** Takedown BLAST RADIUS over a stored packing — when a tombstone set
    * arrives, the packed training batches containing condemned docs are
    * DIRTY and must be reassembled (a fixed-length sequence with a hole
    * is not servable); everything else ships untouched. One row:
    * total/dirty bin counts, the condemned docs and token mass, the
    * innocent docs/tokens that need re-packing because they share a bin
    * with a condemned doc, and the dirty fraction — the number that
    * decides whether the night re-packs incrementally (small radius) or
    * rebuilds the snapshot (radius ≈ 1).
    *
    * Scale shape: one semi-join of the packed table against the
    * (broadcast) tombstones to mark dirty bins, one bin-keyed
    * aggregate, one bin-count-sized reduction — the corpus text is
    * never touched, only the (id, w, shard, bin) manifest. */
  def takedownBlastRadius(packed: DataFrame, tombstones: DataFrame,
      idCol: String): DataFrame = {
    val tomb = tombstones.select(col(idCol).as("id")).distinct()
      .withColumn("__t", lit(true))
    val flagged = packed.join(broadcast(tomb), Seq("id"), "left")
      .select(col("id"), col("w"), col("shard"), col("bin"),
        coalesce(col("__t"), lit(false)).as("__t"))
    val bins = flagged.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("docs"), sum(col("w")).as("fill"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_tomb"),
        sum(when(col("__t"), col("w")).otherwise(0L)).as("w_tomb"))
    bins.agg(count(lit(1)).as("n_bins"),
        coalesce(sum(when(col("n_tomb") > 0, 1L).otherwise(0L)), lit(0L))
          .as("n_dirty_bins"),
        coalesce(sum(col("n_tomb")), lit(0L)).as("n_docs_dropped"),
        coalesce(sum(col("w_tomb")), lit(0L)).as("tokens_dropped"),
        coalesce(sum(when(col("n_tomb") > 0, col("docs") - col("n_tomb"))
          .otherwise(0L)), lit(0L)).as("n_docs_repack"),
        coalesce(sum(when(col("n_tomb") > 0, col("fill") - col("w_tomb"))
          .otherwise(0L)), lit(0L)).as("tokens_repack"))
      .select(col("n_bins"), col("n_dirty_bins"), col("n_docs_dropped"),
        col("tokens_dropped"), col("n_docs_repack"), col("tokens_repack"),
        // empty-manifest guard: no bins means nothing is dirty, not null
        when(col("n_bins") === 0, lit(0.0))
          .otherwise(round(col("n_dirty_bins").cast("double") /
            col("n_bins"), 6)).as("dirty_frac"))
  }

  /** INCREMENTAL RE-PACK — the night that follows
    * [[takedownBlastRadius]]'s verdict when the radius is small: bins
    * containing a condemned doc are DIRTY (a fixed-length training
    * sequence with a hole is not servable); every clean bin ships
    * UNTOUCHED (byte-identical (shard, bin) assignment — the artifact a
    * trainer already downloaded stays valid), the condemned docs are
    * dropped, and the dirty bins' INNOCENT docs are re-packed by the
    * same per-shard greedy into FRESH bin ids (continuing after each
    * shard's current max bin, so repaired ids never collide with kept
    * ones). Deterministic: the re-pack orders by the same (shard, id)
    * key as [[packGreedy]], so any engine, any partitioning and any
    * re-run produce the identical repaired manifest.
    *
    * Delete == rebuild deliberately does NOT hold for packing (a
    * from-scratch re-pack would reshuffle EVERY bin and invalidate the
    * whole shipped artifact) — that asymmetry is exactly why this night
    * exists and why [[takedownBlastRadius]] prices the choice.
    *
    * Scale shape: the greedy runs ONLY over the innocent docs of dirty
    * bins — the blast radius, not the corpus; the clean side is one
    * anti-join pass-through. The tombstone and dirty-bin join sides are
    * deliberately UNHINTED: when [[takedownBlastRadius]] reports a
    * small radius AQE broadcasts them, and when the radius approaches 1
    * (dirty is bin-count-sized — manifest scale) the joins fall back to
    * a shuffle instead of OOMing the driver on a forced broadcast. Only
    * the per-shard bin offsets (shard-count-sized by construction) keep
    * the explicit hint. `budget` and `shards` must be the original
    * packing's (the shard of an id is a pure hash, so re-packed docs
    * land back in their own shards).
    *
    * @return (id, w, shard, bin, repacked) — the full repaired
    *         manifest; `repacked` marks rows whose bin changed */
  def incrementalRepack(packed: DataFrame, tombstones: DataFrame,
      idCol: String, budget: Long, shards: Int): DataFrame = {
    val tomb = tombstones.select(col(idCol).as("id")).distinct()
    val dirty = packed.join(tomb, Seq("id"), "left_semi")
      .select(col("shard"), col("bin")).distinct()
    val clean = packed.join(dirty, Seq("shard", "bin"), "left_anti")
      .select(col("id"), col("w"), col("shard"), col("bin"),
        lit(false).as("repacked"))
    val innocent = packed.join(dirty, Seq("shard", "bin"), "left_semi")
      .join(tomb, Seq("id"), "left_anti")
      .select(col("id"), col("w"))
    val offsets = packed.groupBy(col("shard"))
      .agg(max(col("bin")).as("__maxbin"))
    val repacked = packGreedy(innocent, "id", "w", budget, shards)
      .join(broadcast(offsets), Seq("shard"))
      .select(col("id"), col("w"), col("shard"),
        (col("__maxbin") + 1L + col("bin")).as("bin"),
        lit(true).as("repacked"))
    clean.unionByName(repacked)
  }

  /** The SEQUENCE-LENGTH decision curve — what each candidate training
    * sequence length costs, measured: for every budget L in the grid,
    * one greedy packing of the SAME weight manifest and its efficiency
    * face (bins, padding waste, fill rate), plus the truncation
    * pressure a length-L trainer faces (tokens beyond L in documents
    * longer than L — the mass that either truncates or forces an
    * over-budget single-doc bin, counted both ways: `n_overbudget`
    * bins and `trunc_tokens`). Short L wastes nothing per bin but
    * truncates long documents; long L keeps documents whole but pads.
    * The row a run reads before fixing max_seq_len.
    *
    * Scale shape: |budgets| independent [[packGreedy]] passes over the
    * (id, weight) MANIFEST — never the text; each pass is the
    * shard-parallel streaming greedy, each card one bin-sized
    * aggregate. Pass a persisted per-doc stage so the grid shares one
    * materialization.
    *
    * @return one row per budget: (budget, n_bins, n_docs, total_tokens,
    *         sum_waste, fill_rate, n_overbudget, trunc_tokens,
    *         trunc_frac) */
  def packLengthCurve(df: DataFrame, idCol: String, weightCol: String,
      budgets: Seq[Long], shards: Int): DataFrame = {
    require(budgets.nonEmpty, "need at least one budget point")
    budgets.distinct.sorted.map { b =>
      val card = packCard(packGreedy(df, idCol, weightCol, b, shards), b)
      val tr = df.agg(coalesce(sum(greatest(
        col(weightCol).cast("long") - lit(b), lit(0L))), lit(0L))
        .as("trunc_tokens"))
      card.crossJoin(broadcast(tr))
        .select(lit(b).as("budget"), col("n_bins"), col("n_docs"),
          col("total_tokens"), col("sum_waste"), col("fill_rate"),
          col("n_overbudget"), col("trunc_tokens"),
          when(col("total_tokens") > 0,
            round(col("trunc_tokens").cast("double") /
              col("total_tokens").cast("double"), 6))
            .otherwise(lit(0.0)).as("trunc_frac"))
    }.reduce(_ unionByName _)
  }

  /** Per-bin SOURCE-DIVERSITY QA of a stored packing — the shard-audit
    * a trainer runs before trusting gradient batches: a bin dominated
    * by one source makes a correlated batch however good the global
    * mix is. Joins the packed manifest to a per-doc attribute and
    * reduces to a bounded histogram: one row per distinct
    * sources-per-bin count, with the bins/docs/tokens it covers and
    * how many of those bins are DOMINATED (one source holding at least
    * half the bin's tokens — an exact integer predicate, no float).
    *
    * Scale shape: one equi-join of the bin manifest to the per-doc
    * attribute table (both id-keyed; at scale both bucketable), two
    * bin-keyed aggregates, one histogram-sized reduction. The corpus
    * text is never touched.
    *
    * @param docKey  expression over the packed rows yielding the doc
    *                key (an instance-expanded packing divides the
    *                epoch factor back out, e.g. `expr("id div 8")`)
    * @param docAttr the per-doc attribute table, keyed by attrKeyCol
    * @return (n_sources, n_bins, n_docs, n_tokens, n_dominated) */
  def binDiversityCard(packed: DataFrame, docKey: Column,
      docAttr: DataFrame, attrKeyCol: String, attrCol: String)
      : DataFrame = {
    val joined = packed.withColumn("__k", docKey)
      .join(docAttr.select(col(attrKeyCol).as("__k"),
        col(attrCol).as("__a")), Seq("__k"))
      .select(col("shard"), col("bin"), col("w"), col("__a"))
    val perSrc = joined.groupBy(col("shard"), col("bin"), col("__a"))
      .agg(count(lit(1)).as("docs"), sum(col("w")).as("tok"))
    val perBin = perSrc.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_sources"), sum(col("docs")).as("docs"),
        sum(col("tok")).as("tok"), max(col("tok")).as("dom_tok"))
    perBin.groupBy(col("n_sources"))
      .agg(count(lit(1)).as("n_bins"), sum(col("docs")).as("n_docs"),
        sum(col("tok")).as("n_tokens"),
        sum(when(col("dom_tok") * 2 >= col("tok"), 1L).otherwise(0L))
          .as("n_dominated"))
  }

  /** Packing efficiency report: bins, mean fill ratio, over-budget bins
    * (only legal for single over-budget docs). */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(sum(col("w")).as("fill"), count(lit(1)).as("docs"))
      .agg(count(lit(1)).as("bins"),
        coalesce(round(avg(col("fill")).cast("double") / budget, 4),
          lit(0.0)).as("mean_fill"),
        count(when(col("fill") > budget && col("docs") > 1, 1))
          .as("illegal_bins"))
}
