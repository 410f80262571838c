package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale. Parquet keeps min/max
  * statistics per row group and per file; a reader's pushed-down predicate
  * skips any unit whose [min, max] range excludes it. That only pays off if
  * rows are CLUSTERED so the ranges are narrow — and when queries filter on
  * TWO dimensions, sorting by (a, b) clusters a perfectly and b not at all.
  * The Morton (Z-order) value interleaves the bits of both keys, so sorting
  * by it keeps rows close in a AND close in b at once: a filter on either
  * dimension (or both) prunes most files. This is the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain expressions.
  *
  * Scale notes: [[zValue]] is a pure per-row projection of shifts/masks/ors
  * — whole-stage-codegen'd, no shuffle, no UDF. [[clusteredWrite]] adds the
  * one range-partitioning shuffle any global clustering needs (sampled range
  * boundaries, AQE-friendly), then sorts within partitions — files then own
  * pairwise-disjoint z-ranges, which is exactly the property file skipping
  * needs. Nothing here reads data on the driver.
  */
object Layout {

  /** Morton/Z-value of two dimension columns: the low `bits` bits of `a`
    * and `b` interleaved (a on even positions, b on odd), as a long in
    * [0, 4^bits). Inputs must already be non-negative bucket ordinals
    * smaller than 2^bits — map raw values onto a grid first (e.g.
    * `pmod(hash(...), 2^bits)`, a date ordinal, or a range-bucket id);
    * values beyond the grid silently alias (only layout quality suffers,
    * never correctness, since pruning reads real min/max stats). `bits`
    * ≤ 31 so the result fits a long with room. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "need 0 < bits <= 31")
    zValueN(Seq(a, b), bits)
  }

  /** N-dimensional Morton/Z-value: bit `i` of dimension `j` lands at
    * output position `i·N + j` (round-robin interleave — the 2-D case is
    * exactly [[zValue]]'s layout). The common 3+-column ask is a
    * (source, lang, date) layout where queries filter any subset of the
    * dimensions. Same contract as [[zValue]]: inputs are non-negative
    * grid ordinals below 2^bits, output is a pure codegen'd projection,
    * and `bits · N ≤ 62` keeps the value in a long. More dimensions split
    * the fixed bit budget, so per-dimension pruning resolution drops —
    * the standard Z-order trade (beyond ~4 dims prefer partitioning on
    * the extra columns). */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, "need at least 2 dimensions")
    require(bits > 0 && bits * n <= 62, s"bit budget: bits * $n must be <= 62")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)
    terms.reduce(_ bitwiseOR _).cast("long")
  }

  /** d-dimensional Hilbert-curve cluster value — the locality-preserving
    * option next to [[zValueN]] for 3+-column layouts: consecutive Hilbert
    * indices are always grid neighbors (no power-of-two diagonal jumps),
    * so range-partitioned files cover tighter per-dimension min/max boxes
    * and prune better on single-dimension predicates. Same input contract
    * as [[zValueN]] (non-negative grid ordinals < 2^bits, bits·d ≤ 62);
    * backed by the native codegen'd [[graft.expressions.HilbertIndex]]
    * (Skilling's transform — a composed-Column spelling would blow up
    * exponentially, see the expression doc). */
  def hilbertValue(cols: Seq[Column], bits: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.toColumn(graft.expressions.HilbertIndex(
      cols.map(c => ColumnBridge.toExpression(c.cast("long"))), bits))
  }

  /** Write `df` clustered by `clusterExpr` (typically a [[zValue]]):
    * range-repartition into `numFiles` partitions, sort each partition,
    * write one parquet file per partition. Every file covers a disjoint
    * range of the cluster key, so a pushed-down predicate on it (or on a
    * dimension correlated with it — the z-value's point) skips whole files
    * via footer stats. The cluster column is materialized as `zorderCol` so
    * readers can filter on it directly. */
  def clusteredWrite(df: DataFrame, clusterExpr: Column, zorderCol: String,
      path: String, numFiles: Int): Unit =
    df.withColumn(zorderCol, clusterExpr)
      .repartitionByRange(numFiles, col(zorderCol))
      .sortWithinPartitions(col(zorderCol))
      .write.mode("overwrite").parquet(path)

  /** Sort-merge-BUCKET layout: persist `df` as a bucketed+sorted table so
    * every future equi-join or aggregation on `keyCol` runs with NO
    * exchange — the join co-location is paid ONCE at write time instead
    * of per query. This is the other half of the shuffle-minimization
    * story next to broadcast ([[graft.operators.Sketches.bloomPrune]])
    * and salting: at 100 TB the nightly fact tables are written bucketed
    * on their join key, and the day's queries read them with zero
    * fact-side shuffles (`BucketJoinSpec` pins the exchange-free plan).
    * Both sides of a join must share the bucket count; `sortBy` makes
    * the per-bucket files merge-join-ready without a sort node. */
  def bucketedWrite(df: DataFrame, keyCol: String, numBuckets: Int,
      table: String): Unit =
    // repartition on the key with the bucket count: Spark's repartition
    // hash IS the bucketing hash, so every bucket is written by exactly
    // one task → ONE file per bucket. sortBy then makes each bucket file
    // a sorted run; the reader still plans a per-bucket Sort (trusting
    // write order needs the legacy outputOrdering conf) but it runs over
    // already-sorted single-file buckets — the EXCHANGE elision is the
    // contract BucketJoinSpec pins.
    df.repartition(numBuckets, col(keyCol))
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)

  /** [[shardFingerprints]] with FIXED-WIDTH parts (part = (pos−1) div
    * partSize) instead of a fixed part COUNT. This is the streaming-
    * maintainable form: growing the manifest (a nightly append of new
    * bins past the current tail) only ever touches the LAST part —
    * earlier parts' membership is a pure function of pos — and every
    * per-part column is a commutative fold (count/sum/min/max/XOR), so
    * a foreachBatch night can maintain the whole card incrementally
    * with one grouped merge per batch (batchId-guarded: XOR state is
    * worse than double-counting under replay — a replayed batch
    * TOGGLES its rows back out and silently cancels the fingerprint;
    * `StreamingChecksumSpec` pins the night). The fixed-count form
    * (q258) re-derives boundaries from N and is the release-time card;
    * this form is the live one. Because part = (pos−1) div partSize is
    * UNBOUNDED as the manifest grows, the label is padded to six digits
    * (`p%06d` — numeric sort order holds to a million parts, vs the
    * fixed-count card's `p%03d` whose nParts is caller-chosen and
    * release-sized). */
  def shardFingerprintsFixed(manifest: DataFrame, posCol: String,
      key: Column, weightCol: String, partSize: Long): DataFrame = {
    require(partSize > 0, "partSize must be positive")
    val rows = manifest
      .select(col(posCol).as("pos"), key.as("__k"),
        col(weightCol).as("__w"))
      .withColumn("part", expr(s"(pos - 1) div $partSize"))
      .withColumn("__h",
        NearDup.md5Hash60(concat_ws(":", col("pos"), col("__k"))))
    val per = rows.groupBy(col("part")).agg(
      count(lit(1)).as("n_rows"), sum(col("__w")).as("n_tokens"),
      min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
      expr("bit_xor(__h)").as("fp"))
    val rel = per.agg(
        coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("first_pos")).as("first_pos"),
        max(col("last_pos")).as("last_pos"),
        expr("bit_xor(fp)").as("fp"))
      .select(lit("~release").as("part"), col("n_rows"), col("n_tokens"),
        col("first_pos"), col("last_pos"), col("fp"))
    per.select(format_string("p%06d", col("part")).as("part"),
        col("n_rows"), col("n_tokens"), col("first_pos"), col("last_pos"),
        col("fp"))
      .unionByName(rel)
  }

  /** LOADER-SHARD integrity manifest — the checksummed face of a
    * release a trainer verifies before (and after) a multi-day run:
    * the epoch order is split into `nParts` contiguous position
    * ranges (shard p = positions with ((pos−1)·nParts) div N = p —
    * exactly the slices [[clusteredWrite]] would emit as data-loader
    * files), and each shard row carries its row/token counts, its
    * [first_pos, last_pos] range (last−first+1 = n_rows proves the
    * ranges tile the epoch with no gap or overlap) and an
    * ORDER-ENCODING fingerprint: XOR of md5-60(pos:key) row hashes.
    * XOR is commutative so the aggregate is map-side combinable and
    * distributed-exact at any manifest size (the q236 order_fp
    * discipline — no ordered concat ever materializes a shard in one
    * task), yet the order is still pinned because pos rides inside
    * every hashed term. The `~release` row closes the card: totals
    * plus the XOR of all row hashes, which by XOR's associativity
    * equals the XOR of the shard fingerprints — one released number
    * that changes if ANY shard changes.
    *
    * @param manifest an epoch-order table ([[Packing.epochShuffle]]'s
    *                 shape) with a dense 1-based `posCol`
    * @param key      string column pinning each row's identity (e.g.
    *                 shard:bin)
    * @return one row per loader shard, `part` "p000".."p{n-1}"
    *         (zero-padded so the label sorts in numeric part order up
    *         to 1000 shards — nParts is caller-chosen and release-sized
    *         here; the unbounded streaming variant above pads to six
    *         digits), plus "~release": (part, n_rows,
    *         n_tokens, first_pos, last_pos, fp) ordered by part */
  def shardFingerprints(manifest: DataFrame, posCol: String, key: Column,
      weightCol: String, nParts: Int): DataFrame = {
    require(nParts > 0, "need at least one loader shard")
    val n = manifest.agg(count(lit(1)).as("__n"))
    val rows = manifest.crossJoin(broadcast(n))
      .select(col(posCol).as("pos"), key.as("__k"),
        col(weightCol).as("__w"), col("__n"))
      .withColumn("part", expr(s"((pos - 1) * $nParts) div __n"))
      .withColumn("__h",
        NearDup.md5Hash60(concat_ws(":", col("pos"), col("__k"))))
    val per = rows.groupBy(col("part")).agg(
      count(lit(1)).as("n_rows"), sum(col("__w")).as("n_tokens"),
      min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
      expr("bit_xor(__h)").as("fp"))
    val rel = per.agg(
        coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("first_pos")).as("first_pos"),
        max(col("last_pos")).as("last_pos"),
        expr("bit_xor(fp)").as("fp"))
      .select(lit("~release").as("part"), col("n_rows"), col("n_tokens"),
        col("first_pos"), col("last_pos"), col("fp"))
    per.select(format_string("p%03d", col("part")).as("part"),
        col("n_rows"), col("n_tokens"), col("first_pos"), col("last_pos"),
        col("fp"))
      .unionByName(rel)
  }
}
