package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch structures built from plain relational operators — count-min
  * frequency estimation and Bloom membership — complementing the builtin
  * HLL/KLL aggregates (`approx_count_distinct`, `percentile_approx`,
  * contract-checked in SketchSpec and q77).
  *
  * Why relational sketches: the sketch STATE lives in DataFrames
  * ((row, bucket) counts / set bit positions), so it is mergeable across
  * batches with a `groupBy`+`sum`/`distinct` union — the property that
  * matters on an append-only corpus — and persists as ordinary parquet.
  * Hashes are the md5-60bit bridge, so every estimate is deterministic
  * and cross-engine reproducible (graded with exact row-level oracles,
  * not tolerance checks — a luxury HLL internals can't offer).
  *
  * Scale: building either sketch is one explode (×depth/×numHashes) plus
  * one aggregation keyed by (row, bucket)/(bit) — map-side combinable,
  * output size bounded by the sketch geometry (depth×width / numBits),
  * independent of input cardinality. Probing joins the TINY sketch table
  * (broadcast) — the corpus is never rescanned.
  */
object Sketches {

  private def bucketOf(seed: Int, key: Column, width: Long): Column =
    pmod(NearDup.md5Hash60(concat_ws("|", lit(seed.toString), key)),
      lit(width))

  /** Fast NON-portable bucket hash (native xxhash64) for sketches whose
    * bits never cross the engine boundary. The md5 bridge above exists so
    * a DuckDB oracle can replay every bit; a Bloom used purely as an
    * internal pre-join prune ([[bloomPrune]]) is output-transparent —
    * ANY hash family yields the identical final result — so paying an
    * md5 per probe per row on a corpus-sized fact table is pure waste.
    * Build and probe must use the same function; pass this as `bucket`
    * to BOTH [[bloomBitsArray]] and [[bloomPrune]]. */
  val xxBucket: (Int, Column, Long) => Column =
    (seed, key, width) => pmod(xxhash64(lit(seed), key), lit(width))

  /** Count-min sketch state: (d, bucket, cnt) — `depth` independent hash
    * rows of `width` buckets, each holding the count of keys landing in
    * it. Merge two batches' states by unioning and summing cnt. */
  def countMin(df: DataFrame, key: Column, depth: Int, width: Long): DataFrame = {
    require(depth > 0 && width > 0, "need positive depth and width")
    df.select(explode(array((0 until depth).map { d =>
        struct(lit(d).as("d"), bucketOf(d, key, width).as("bucket"))
      }: _*)).as("h"))
      .groupBy(col("h.d").as("d"), col("h.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes` against a [[countMin]] state:
    * min over the depth rows of the probed bucket's count. Never
    * undercounts (collisions only ADD); the overcount is bounded by
    * (input size / width) per row w.h.p. All probe columns survive. */
  def countMinEstimate(cms: DataFrame, probes: DataFrame, key: Column,
      depth: Int, width: Long): DataFrame = {
    val keyed = probes.withColumn("__h", explode(array((0 until depth).map { d =>
      struct(lit(d).as("d"), bucketOf(d, key, width).as("bucket"))
    }: _*)))
      .select(probes.columns.map(col) :+ col("__h.d").as("d") :+
        col("__h.bucket").as("bucket"): _*)
    keyed.join(broadcast(cms), Seq("d", "bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** The count-min WIDTH curve — the memory/accuracy dial of the
    * frequency sketch priced on the actual key distribution (the
    * estimator-error member of the tuning tables, next to the Bloom
    * sizing curve's membership FP dial): for each candidate width, the
    * total and worst per-key OVERCOUNT of the sketch against the exact
    * counts, plus the undercount count — which is structurally ZERO
    * (collisions only add; `n_under` rides in the output as a live
    * invariant, and SketchesSpec pins it). Overcount shrinks as width
    * grows (fewer collisions per row); the measured curve is what a
    * deployment reads before fixing depth×width memory.
    *
    * Scale shape: per width, one [[countMin]] build (explode ×depth +
    * one bounded aggregate) and one broadcast-sketch probe join over
    * the key table — the corpus pays |widths| passes, the aggregates
    * are sketch- and key-sized. All error columns are exact integers;
    * only the final mean divides.
    *
    * @param key the key column in its STRING form (hash input)
    * @return one row per width: (width, depth, n_keys, n_under,
    *         sum_over, max_over, mean_over) */
  def countMinWidthCurve(df: DataFrame, key: Column, widths: Seq[Long],
      depth: Int): DataFrame = {
    require(widths.nonEmpty, "need at least one width")
    val exact = df.groupBy(key.as("__k"))
      .agg(count(lit(1)).as("exact_cnt"))
    widths.distinct.sorted.map { w =>
      val est = countMinEstimate(countMin(df, key, depth, w), exact,
        col("__k"), depth, w)
      est.agg(count(lit(1)).as("n_keys"),
          coalesce(sum(when(col("cms_est") < col("exact_cnt"), 1L)
            .otherwise(0L)), lit(0L)).as("n_under"),
          coalesce(sum(col("cms_est") - col("exact_cnt")), lit(0L))
            .as("sum_over"),
          coalesce(max(col("cms_est") - col("exact_cnt")), lit(0L))
            .as("max_over"))
        .select(lit(w).as("width"), lit(depth.toLong).as("depth"),
          col("n_keys"), col("n_under"), col("sum_over"), col("max_over"),
          // empty-input guard: zero keys means zero mean error, not null
          when(col("n_keys") === 0, lit(0.0))
            .otherwise(round(col("sum_over").cast("double") /
              col("n_keys"), 6)).as("mean_over"))
    }.reduce(_ unionByName _)
  }

  /** Bloom filter state: the distinct set bit positions of `numBits`
    * slots under `numHashes` hash functions. Merge batches by union +
    * distinct. */
  def bloomBits(df: DataFrame, key: Column, numBits: Long,
      numHashes: Int): DataFrame = {
    require(numBits > 0 && numHashes > 0, "need positive bits and hashes")
    df.select(explode(array((0 until numHashes).map(
        bucketOf(_, key, numBits)): _*)).as("bit"))
      .distinct()
  }

  /** Membership verdicts for `probes` against a [[bloomBits]] state:
    * `bloom_maybe` is true iff ALL the probe's bits are set — guaranteed
    * true for every key the filter was built from (no false negatives);
    * false positives occur at the geometry's rate. */
  def bloomMaybeContains(bits: DataFrame, probes: DataFrame, key: Column,
      numBits: Long, numHashes: Int): DataFrame = {
    val keyed = probes.withColumn("__bit", explode(array(
      (0 until numHashes).map(bucketOf(_, key, numBits)): _*)))
    keyed.join(broadcast(bits.withColumn("__set", lit(true))),
        keyed("__bit") === bits("bit"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("__set"), lit(false))).as("bloom_maybe"))
  }

  /** The whole Bloom identity — geometry AND hash family — as ONE value
    * shared by build and probe, so the two sides CANNOT diverge: a bits
    * array built under one bucket function and probed under another has
    * silent false NEGATIVES (wrong, over-pruned results — not a
    * slowdown), and the free-floating `bucket` default args on
    * [[bloomBitsArray]]/[[bloomPrune]] let exactly that compile. Build
    * and prune through one `BloomConfig` instance instead; the raw
    * functions remain for the (already-consistent) legacy call sites. */
  final case class BloomConfig(numBits: Long, numHashes: Int,
      bucket: (Int, Column, Long) => Column = bucketOf) {
    require(numBits > 0 && numHashes > 0, "need positive bits and hashes")
    /** [[bloomBitsArray]] under this config's hash family. */
    def bitsArray(df: DataFrame, key: Column): DataFrame =
      bloomBitsArray(df, key, numBits, numHashes, bucket)
    /** [[bloomPrune]] under this config's hash family — feed it ONLY a
      * [[bitsArray]] built from the same instance. */
    def prune(fact: DataFrame, key: Column, bits: DataFrame): DataFrame =
      bloomPrune(fact, key, bits, numBits, numHashes, bucket)
  }

  /** [[BloomConfig]] over the fast native hash — the right family for a
    * Bloom used purely as an engine-internal prune (output-transparent,
    * never replayed by an oracle). */
  def xxBloom(numBits: Long, numHashes: Int): BloomConfig =
    BloomConfig(numBits, numHashes, xxBucket)

  /** The Bloom SIZING curve — the bits-per-key dial priced on the
    * actual key set (the sketch-family member of the engine's tuning
    * tables, next to nprobe/τ/LSH-geometry): for each candidate filter
    * size, the measured false-positive rate against a probe set that is
    * DISJOINT from the build keys by construction, so every pass is a
    * false positive and the rate is measured, not modeled. fp_rate is
    * non-increasing in bits (a larger filter at the same key set and
    * hash count sets a sparser fraction of its bits; SketchesSpec pins
    * the monotone curve and cross-checks each point against theory).
    *
    * Scale shape: per size, one [[BloomConfig.bitsArray]] build (the
    * one-row broadcast form) and one row-local [[BloomConfig.prune]]
    * pass over the probes — no shuffle anywhere; the curve costs
    * |sizes| hash passes over two key columns.
    *
    * @return one row per size: (num_bits, num_hashes, n_keys, n_probes,
    *         n_fp, fp_rate) */
  def bloomSizingCurve(build: DataFrame, absentProbes: DataFrame,
      key: Column, numBitsCurve: Seq[Long], numHashes: Int): DataFrame = {
    require(numBitsCurve.nonEmpty, "need at least one filter size")
    val nKeys = build.agg(count(lit(1)).as("n_keys"))
    val nProbes = absentProbes.agg(count(lit(1)).as("n_probes"))
    numBitsCurve.distinct.sorted.map { m =>
      val cfg = BloomConfig(m, numHashes)
      val fp = cfg.prune(absentProbes, key, cfg.bitsArray(build, key))
      fp.agg(count(lit(1)).as("n_fp"))
        .crossJoin(broadcast(nKeys))
        .crossJoin(broadcast(nProbes))
        .select(lit(m).as("num_bits"),
          lit(numHashes.toLong).as("num_hashes"),
          col("n_keys"), col("n_probes"), col("n_fp"),
          // empty-probe guard: no probes means no false positives, not null
          when(col("n_probes") === 0, lit(0.0))
            .otherwise(round(col("n_fp").cast("double") /
              col("n_probes"), 6)).as("fp_rate"))
    }.reduce(_ unionByName _)
  }

  /** [[bloomBits]] collapsed to ONE row holding the sorted set-bit
    * positions — the broadcastable form [[bloomPrune]] consumes. Size is
    * bounded by min(numBits, |keys|·numHashes) longs, chosen small by
    * construction (a 1M-bit filter is ≤ 8 MB). */
  def bloomBitsArray(df: DataFrame, key: Column, numBits: Long,
      numHashes: Int,
      bucket: (Int, Column, Long) => Column = bucketOf): DataFrame =
    df.select(explode(array((0 until numHashes).map(
        bucket(_, key, numBits)): _*)).as("bit"))
      .distinct()
      .agg(sort_array(collect_list(col("bit"))).as("bloom_bits"))

  /** Bloom-pruned pre-join filter — the 100 TB shuffle cutter: before a
    * fact⋈dim join whose dim side is selective, drop the fact rows whose
    * join key CANNOT match (bloom has no false negatives) as a pure
    * row-local projection. The bit array rides a broadcast; membership is
    * the native binary-search expression (O(log bits) per probe, where
    * `array_contains` would scan the whole array per row); the fact table
    * is never shuffled, grouped or exploded — the surviving (usually
    * tiny) fraction proceeds to the real join, which now shuffles only
    * matches + the false-positive residue.
    *
    * Contrast [[bloomMaybeContains]]: that emits per-row verdicts via a
    * bit-table join and re-grouping (a probe-side shuffle) — right for
    * auditing a sketch, wrong for pruning a corpus. */
  def bloomPrune(fact: DataFrame, key: Column, bitsArray: DataFrame,
      numBits: Long, numHashes: Int,
      bucket: (Int, Column, Long) => Column = bucketOf): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    def contains(h: Column): Column = ColumnBridge.toColumn(
      graft.expressions.SortedArrayContains(
        ColumnBridge.toExpression(col("bloom_bits")),
        ColumnBridge.toExpression(h)))
    val maybe = (0 until numHashes)
      .map(s => contains(bucket(s, key, numBits)))
      .reduce(_ && _)
    fact.crossJoin(broadcast(bitsArray))
      .filter(maybe)
      .drop("bloom_bits")
  }
}
