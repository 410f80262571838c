package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family — the reference's signature operation, present in all
  * three of its engines (pandas `drop_duplicates`, Postgres `MIN(ctid)` /
  * `DISTINCT ON`, Excel pivot mode analysis). See SURVEY.md §2.4 (D1–D5),
  * citing /root/reference/Seccion_2_Python/ETL_Prueba_Tecnica.ipynb:60 and
  * /root/reference/Seccion_3_SQL/seccion3_sql.sql:184-229.
  *
  * Scale notes (100 TB): every dedup here is a single hash-shuffle on the key
  * (window or aggregate) — no global sort, no driver collect. Skewed keys are
  * handled by AQE (enabled in Verify/Bench sessions); for pathological skew,
  * pre-aggregate with a salted key then re-reduce (the `count`-based forms
  * below already do map-side partial aggregation).
  */
object Dedup {

  /** D1: number of duplicate rows by key = total - distinct keys.
    * Single row, computed as one aggregate (map-side partial combine). */
  def duplicateCount(df: DataFrame, key: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(key))).as("dup_count"))

  /** D2/D3: deterministic keep-first dedup. One row per key — the row that
    * sorts first by `order` (e.g. source priority, then intra-file sequence).
    * The reference's pandas `keep='first'` and Postgres `MIN(ctid)` both
    * depend on physical row order; here the order is explicit so the result
    * is reproducible on any cluster (SURVEY.md §7.4 watch-item 1). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D4: `DISTINCT ON (key) ORDER BY ...` with an explicit, total tiebreak
    * (the reference's ORDER BY lists only the key, leaving the survivor
    * nondeterministic — we document the deviation and make it testable). */
  def distinctOn(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order)

  /** D5 / T1: most-duplicated values — top-k keys by frequency with a
    * deterministic tiebreak on the key itself. */
  def modeTopK(df: DataFrame, key: String, k: Int): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(key))
      .limit(k)

  /** A3/P4: leftover-duplicates check — keys appearing more than once.
    * Empty result == uniqueness holds (the reference's post-UPSERT
    * verification, seccion3_sql.sql:342-345). */
  def duplicateKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Exact content dedup at scale: fingerprint rows by a digest of selected
    * columns, keep the smallest `idCol` per fingerprint. This is the 100 TB
    * form of D2: the shuffle key is the (well-distributed) digest, so there
    * is no key skew by construction. */
  def exactDedupByDigest(df: DataFrame, digest: Column, idCol: String): DataFrame =
    keepFirst(df.withColumn("__fp", digest), Seq("__fp"), Seq(col(idCol)))
      .drop("__fp")

  /** Cross-batch incremental dedup — the shape every append-only corpus
    * pipeline runs nightly: keep only the rows of `batch` whose content is
    * NEW, i.e. absent from the accumulated digest registry of all prior
    * batches AND not already kept earlier in this batch. Two steps, both
    * keyed on the digest: within-batch [[exactDedupByDigest]], then a
    * LEFT ANTI join against the registry's digest column.
    *
    * Scale: the registry carries one digest per historical distinct row —
    * tiny next to the corpus — and the anti join shuffles on the digest
    * (well-distributed by construction, no key skew); when the registry
    * fits in memory AQE turns it into a broadcast anti join with zero
    * batch-side shuffle. The registry for the NEXT run is the union of
    * `seenDigests` and the survivors' digests — the caller appends it,
    * keeping the whole history out of the hot path. */
  def incrementalNew(batch: DataFrame, digest: Column, idCol: String,
      seenDigests: DataFrame): DataFrame = {
    val reg = seenDigests.select(col(seenDigests.columns.head).as("__fp")).distinct()
    exactDedupByDigest(batch, digest, idCol)
      .withColumn("__fp", digest)
      .join(reg, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Registry lifecycle — the compaction/retention pass the append-only
    * digest registry of [[incrementalNew]] needs to run nightly: the
    * registry grows monotonically (one appended row per kept doc), and
    * without retirement it eventually dominates the anti join. This
    * compacts a PROVENANCE-CARRYING registry log — rows
    * `(digestCol, sourceCol, batchCol)`, one per historical kept row,
    * possibly holding the same digest many times — down to ONE row per
    * still-live digest.
    *
    * Retirement rules: a holder row is dropped when its source appears in
    * `tombstoned` (source retraction / takedown — its content must become
    * admissible again) or its batch is older than `minBatch` (TTL). A
    * DIGEST survives iff at least one holder survives — content held by
    * both a tombstoned source and a live one stays blocked, which is what
    * makes compaction verdict-preserving for all non-retired content
    * (RegistryLifecycleSpec pins both directions).
    *
    * Scale shape: one filter + one anti join against the (tiny, broadcast)
    * tombstone list + one map-side-combinable aggregate on the digest —
    * the well-distributed key, no skew by construction. Output carries the
    * earliest surviving holder `(first_batch, first_source)` (min-struct,
    * total order → deterministic) and the surviving holder count, so the
    * compacted table remains a valid provenance log for the NEXT
    * compaction — compaction composes with itself.
    *
    * Feed the result straight back to [[incrementalNew]] as `seenDigests`
    * by selecting the digest column (it is emitted first).
    *
    * @return (digest, first_batch, first_source, n_holders) — one row per
    *         surviving digest, named after the input columns
    */
  def compactRegistry(registry: DataFrame, digestCol: String,
      sourceCol: String, batchCol: String, tombstoned: DataFrame,
      minBatch: Long = Long.MinValue): DataFrame = {
    val ts = tombstoned
      .select(col(tombstoned.columns.head).as(sourceCol)).distinct()
    registry
      .filter(col(batchCol) >= minBatch)
      .join(broadcast(ts), Seq(sourceCol), "left_anti")
      .groupBy(col(digestCol))
      .agg(min(struct(col(batchCol), col(sourceCol))).as("__f"),
        count(lit(1)).as("n_holders"))
      .select(col(digestCol), col("__f")(batchCol).as("first_batch"),
        col("__f")(sourceCol).as("first_source"), col("n_holders"))
  }

  /** [[compactRegistry]] with the LICENSING-AWARE survivor rule (the
    * registry-side twin of
    * [[NearDup.priorityRepresentatives]]): the surviving holder per
    * digest is chosen by (source priority asc, batch asc, source asc)
    * instead of pure first-holder — "keep the copy from the permissive
    * source" even when a restricted source saw the content first.
    * `priority` is a per-source rank table (smaller = keep-preferred);
    * sources absent from it rank last (Long.MaxValue), so an EMPTY or
    * uniform priority table reproduces [[compactRegistry]]
    * bit-identically (spec-pinned). Same output contract — (digest,
    * first_batch, first_source, n_holders) — so the result composes
    * with [[incrementalNew]] and re-compacts with itself exactly like
    * the first-holder form; the priority join is one broadcast of the
    * domain-sized rank table. */
  def compactRegistryPrioritized(registry: DataFrame, digestCol: String,
      sourceCol: String, batchCol: String, tombstoned: DataFrame,
      priority: DataFrame, minBatch: Long = Long.MinValue): DataFrame = {
    val ts = tombstoned
      .select(col(tombstoned.columns.head).as(sourceCol)).distinct()
    val pr = priority.select(col(priority.columns.head).as(sourceCol),
      col(priority.columns(1)).as("__p"))
    registry
      .filter(col(batchCol) >= minBatch)
      .join(broadcast(ts), Seq(sourceCol), "left_anti")
      .join(broadcast(pr), Seq(sourceCol), "left")
      .withColumn("__p", coalesce(col("__p"), lit(Long.MaxValue)))
      .groupBy(col(digestCol))
      .agg(min(struct(col("__p"), col(batchCol), col(sourceCol)))
          .as("__f"),
        count(lit(1)).as("n_holders"))
      .select(col(digestCol), col("__f")(batchCol).as("first_batch"),
        col("__f")(sourceCol).as("first_source"), col("n_holders"))
  }

  /** The registry OPS CARD — the one-row dashboard an operator reads
    * before scheduling a [[compactRegistry]] night: total provenance
    * rows, distinct sources, how many rows a pending tombstone set
    * condemns, how many the TTL (`minBatch`) expires, how many survive
    * both (what compaction will keep, pre-dedup), the distinct keys
    * among the survivors (the post-compaction registry size), and the
    * newest batch seen. A row can be both tombstoned and expired — the
    * two counts are independent filters, `n_live` is their conjunction.
    *
    * Scale shape: one broadcast tombstone flag join + ONE map-side-
    * combinable aggregate over the registry (registries are tiny next
    * to the corpus; the card is an aggregate over the small table, the
    * corpus is untouched). Same column contract per family, so the four
    * family cards union into one table. */
  def registryOpsCard(registry: DataFrame, keyCol: String,
      sourceCol: String, batchCol: String, tombstoned: DataFrame,
      minBatch: Long, family: String): DataFrame = {
    val ts = tombstoned
      .select(col(tombstoned.columns.head).as(sourceCol)).distinct()
      .withColumn("__t", lit(true))
    val live = coalesce(col("__t"), lit(false)).unary_! &&
      col(batchCol) >= minBatch
    registry.join(broadcast(ts), Seq(sourceCol), "left")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sourceCol)).as("n_sources"),
        coalesce(sum(when(col("__t"), 1L).otherwise(0L)), lit(0L))
          .as("n_tombstoned"),
        coalesce(sum(when(col(batchCol) < minBatch, 1L).otherwise(0L)),
          lit(0L)).as("n_expired"),
        coalesce(sum(when(live, 1L).otherwise(0L)), lit(0L)).as("n_live"),
        countDistinct(when(live, col(keyCol))).as("n_keys_live"),
        // an EMPTY registry's last_batch stays null — "no batch seen"
        // is the honest value; the count/sum zeros above are guarded
        max(col(batchCol)).cast("long").as("last_batch"))
      .select(lit(family).as("family"), col("n_rows"), col("n_sources"),
        col("n_tombstoned"), col("n_expired"), col("n_live"),
        col("n_keys_live"), col("last_batch"))
  }

  /** Splits documents into fixed-width word "lines" for [[dedupCorpusLines]]:
    * one output row per `wordsPerLine`-word chunk, `(id, pos, line, n_tot)`
    * with `pos` the 0-based chunk index and `n_tot` the doc's total chunk
    * count (carried on every row so the dedup pass never rescans the input).
    * Real web corpora would split on '\n' instead — same downstream contract.
    * Empty documents produce no rows. */
  def toWordLines(df: DataFrame, idCol: String, textCol: String,
      wordsPerLine: Int): DataFrame = {
    require(wordsPerLine > 0, "wordsPerLine must be positive")
    val words = split(col(textCol), " ")
    val lastIdx = floor((size(words).cast("double") - 1d) / wordsPerLine)
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol), (lastIdx + 1L).as("n_tot"),
        posexplode(transform(sequence(lit(0L), lastIdx), i =>
          array_join(slice(words, (i * wordsPerLine + 1).cast("int"),
            lit(wordsPerLine)), " "))))
      .withColumnRenamed("col", "line")
  }

  /** C4-style line-level corpus dedup — the boilerplate-removal pass of a
    * web-scale training-data pipeline: across the WHOLE corpus each distinct
    * line survives only at its first occurrence (smallest `(id, pos)`), then
    * documents are reassembled from their surviving lines in original order.
    * Repeated footers/navigation/licence blocks collapse to one sighting;
    * documents that lose every line drop out entirely.
    *
    * Scale: the first-occurrence table is a map-side-combinable
    * `min(struct(id, pos))` aggregate per line (hot boilerplate lines reduce
    * within each task before the exchange — no single reducer sees all
    * copies), and the keep decision is a LEFT SEMI join on the full
    * `(line, id, pos)` triple, whose keys are unique on BOTH sides — so no
    * skew, unlike a `row_number() OVER (PARTITION BY line)` window that
    * funnels every copy of a hot line through one partition. The `lines`
    * plan is evaluated twice (once per side); at 100 TB persist it — it is
    * a narrow map over the scan. Reassembly groups by doc id, bounded by
    * document size. */
  /** Cross-group duplication matrix: how many distinct content keys each
    * unordered pair of groups shares — "which sources copy from each
    * other", the corpus-governance view behind per-source dedup decisions
    * (a mirror site shows up as one hot cell).
    *
    * The inner `distinct` bounds the join: each key occurs at most once
    * per group, so a key's fan-out is ≤ C(groups,2) — bounded by the
    * (small) group cardinality, never by how often content repeats inside
    * a group. Shuffles on the content key only; group strings ride along.
    */
  def crossGroupOverlap(df: DataFrame, key: Column, group: Column): DataFrame = {
    // materialized once: the self-join would otherwise scan and distinct
    // the corpus twice (exchange reuse does not fire across the a/b
    // branches); the distinct output is the small side to hold
    val d = df.select(key.as("k"), group.as("g")).distinct()
      .localCheckpoint(true)
    d.as("a").join(d.as("b"),
        col("a.k") === col("b.k") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(count(lit(1)).as("n_shared"))
  }

  def dedupCorpusLines(lines: DataFrame, idCol: String): DataFrame = {
    val firsts = lines
      .groupBy(col("line"))
      .agg(min(struct(col(idCol), col("pos"))).as("__f"))
      .select(col("line"), col(s"__f.$idCol").as(idCol), col("__f.pos").as("pos"))
    lines.join(firsts, Seq("line", idCol, "pos"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"), max(col("n_tot")).as("__n_tot"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("text_clean"))
      .select(col(idCol), col("n_kept"),
        (col("__n_tot") - col("n_kept")).as("n_dropped"), col("text_clean"))
  }
}
