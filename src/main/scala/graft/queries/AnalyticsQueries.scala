package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, Multimodal, NearDup, Sampling, Sessionize, Skew, Sweep, Upsert}

/** Wave 3 — time-series / window-analytics / sampling surface: the
  * operations a warehouse user reaches for daily that neither the
  * reference nor waves 1–2 graded yet. Same conventions as CoreQueries
  * (identical aliases both engines, total ORDER BY, doubles rounded,
  * BIGINT casts in the oracle).
  *
  * Time bridge: `events.ts` is parquet TIMESTAMP(NANOS) — Spark (with
  * nanosAsLong) sees a raw nanos LongType, DuckDB sees a µs TIMESTAMP.
  * Both sides normalize to epoch MICROS as BIGINT: Spark `ts DIV 1000`
  * (integer division — a double roundtrip would lose precision at 1.7e18),
  * DuckDB `epoch_us(ts)`.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** epoch-micros event time, shared by q41/q42. */
  private def evMicros(c: String = "ts") = expr(s"$c DIV 1000")

  /** Persisted q220 VERIFIED perceptual near-dup pairs (d1, d2, hamming
    * ≤ 3) over the deterministic planted-twin payload fixture: aHash
    * through the typed codec path, Hamming-banded candidate blocking
    * (simhashCandidateEdges reused — equi-join, never all-pairs),
    * hamming-verified at τ=3; corrupt payloads (id%97==0) fail decode
    * and exit as invalid. Shared by q220 (the pair list) and q239 (the
    * cross-modal complementarity card's perceptual side). Only the
    * 64-bit hash ever shuffles — the payload dies in the codec pass. */
  private[queries] def phashPairsStage(s: SparkSession, dir: String)
      : DataFrame =
    PipelineQueries.stage(s, dir, "phash_pairs") {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .select(col("doc_id").cast("long")).as[Long]
      val assets = ids.map { id =>
        if (id % 97 == 0)
          Multimodal.Asset(id, "image", Array[Byte](1, 2, 3))
        else {
          // twins re-render the SEED doc's image: dims and pixels are
          // functions of seed alone, so the pair is row-local (no join
          // to build the fixture) and the oracle replays it closed-form
          val seed = if (id % 10 == 1) id - 1 else id
          val w = (seed % 29 + 4).toInt
          val h = (seed / 29 % 17 + 4).toInt
          Multimodal.Asset(id, "image",
            Multimodal.encodeFakeWith(w, h, 1) { i =>
              val base = ((seed * 31 + i) % 256).toInt
              if (id % 10 == 1 && i % 50 == 0) (base + 128) % 256
              else base
            })
        }
      }
      val hashes = Multimodal.averageHash(assets).toDF()
        .filter(col("valid"))
        .select(col("asset_id"), col("phash"))
      val cand = NearDup.simhashCandidateEdges(hashes, "asset_id", "phash")
      cand
        .join(hashes.select(col("asset_id").as("d1"),
          col("phash").as("p1")), Seq("d1"))
        .join(hashes.select(col("asset_id").as("d2"),
          col("phash").as("p2")), Seq("d2"))
        .select(col("d1"), col("d2"),
          NearDup.hamming64(col("p1"), col("p2")).cast("long")
            .as("hamming"))
        .filter(col("hamming") <= 3)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // As-of join: each click gets the latest error of the same user at or
    // before it (union + running last over ONE shuffle — no range
    // explosion; see AsOfJoin scaladoc). (user_id, ts) is unique in the
    // testdata, so no right-side tiebreak is needed.
    "q41_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), evMicros().as("t"),
          col("value"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), evMicros().as("err_t"),
          col("value").as("err_value"))
      AsOfJoin.asOf(clicks, errors, key = "user_id",
        leftTime = "t", rightTime = "err_t",
        payload = Seq("err_t", "err_value"))
        .orderBy(col("event_id"))
    }),

    // Forward as-of: each click gets the user's EARLIEST purchase at or
    // after it (mirror window of q41; DuckDB ASOF with `<=`).
    "q57_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), evMicros().as("t"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), evMicros().as("p_t"),
          col("value").as("p_value"))
      AsOfJoin.asOfForward(clicks, purchases, key = "user_id",
        leftTime = "t", rightTime = "p_t", payload = Seq("p_t", "p_value"))
        .orderBy(col("event_id"))
    }),

    // Sessionization: 4-hour-gap sessions per user (median per-user gap in
    // the testdata is ~7.3 h, so the corpus splits into real multi-event
    // sessions rather than degenerating to one session or one per event).
    "q42_sessionize" -> ((s, dir) =>
      Sessionize.sessionize(
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), evMicros().as("t")),
        key = "user_id", time = "t", gap = 14400000000L,
        order = Seq(col("event_id")))
        .orderBy(col("event_id"))),

    // Running total: cumulative revenue per customer in order-date order.
    // ROWS frame in both engines (their default with ORDER BY is RANGE,
    // which merges date ties); the cumulative double sum is sequential in
    // frame order in both engines, so rounding to 2 is stable.
    "q43_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("run_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Lag analytics: whole days since the customer's previous order.
    "q44_order_gaps" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
            .cast("long").as("gap_days"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // GROUPING SETS with grouping() disambiguation — the multi-rollup
    // shape q14's ROLLUP can't express (two independent single-column
    // totals + grand total in one pass).
    "q45_grouping_sets" -> ((s, dir) => {
      // register just the table the query reads — registerAll would cost
      // 9 extra parquet footer reads per execution (Q1's re-runnable-DDL
      // surface is exercised by SqlSurfaceSpec instead)
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |  CAST(count(*) AS BIGINT) AS cnt,
              |  round(sum(l_quantity), 2) AS sum_qty,
              |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
              |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY g_rf, g_ls,
              |  l_returnflag ASC NULLS FIRST,
              |  l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // Pivot: order counts per priority × status, statuses as columns
    // (explicit value list — Spark then skips the distinct-values job and
    // the plan is a plain one-pass pivot aggregate).
    "q46_pivot_status" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy(col("o_orderpriority"))),

    // Top-k per group: 3 priciest orders per priority. The per-group
    // row_number window shuffles once on the group key; the final global
    // sort is grading-only (tiny output).
    "q47_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"), row_number().over(w).cast("long").as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy(col("o_orderpriority"), col("rnk"))
    }),

    // Deterministic 10% hash sample of lineitem: membership is a pure
    // function of the row key (md5-60bit bridge), so the sample is stable
    // across runs/engines/partitionings — and cross-engine verifiable,
    // which seed-based sample() can never be.
    "q48_hash_sample" -> ((s, dir) => {
      val key = concat_ws("|",
        col("l_orderkey").cast("string"), col("l_partkey").cast("string"),
        col("l_suppkey").cast("string"), col("l_linenumber").cast("string"))
      Sampling.hashSample(t(s, dir, "lineitem"), key, keep = 10)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_quantity"),
          Sampling.hashBucket(key, 100).as("bucket"))
        .orderBy(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"))
    }),

    // Per-label centroid components of the embedding corpus (the IVF
    // coarse-quantizer stage of q30, exposed directly): explode → grouped
    // mean per (label, dimension). Rounded to 6 in both engines — the
    // grouped double mean is reduction-order-sensitive.
    "q49_centroids" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding").cast("array<double>")))
        .groupBy(col("label"), col("pos").cast("long").as("ord"))
        .agg(round(avg(col("col")), 6).as("m"))
        .orderBy(col("label"), col("ord"))),

    // Interval analytics without a self-join: how many user sessions are
    // open at each session's start instant. Sweep-line over the session
    // bounds — starts at-or-before minus ends strictly-before — computed
    // with the distributed two-pass prefix sum (range-bucketed windows +
    // broadcast offsets), not the single-partition global window and not
    // the O(n²) interval self-join.
    "q51_session_concurrency" -> ((s, dir) => {
      val sess = Sessionize.sessionStats(
        Sessionize.sessionize(
          t(s, dir, "events")
            .select(col("event_id"), col("user_id"), evMicros().as("t")),
          key = "user_id", time = "t", gap = 14400000000L,
          order = Seq(col("event_id"))),
        "user_id", "t")
        .select(col("user_id"), col("t_start"), col("t_end"))
      Sweep.concurrencyAtStarts(sess, "t_start", "t_end")
        .orderBy(col("user_id"), col("t_start"))
    }),

    // SCD type 2: history-preserving merge. Current dims (every 3rd order,
    // open since t=0) + a change batch (every 2nd order, repriced 1.5× —
    // binary-exact — effective at the order date): matched rows close at
    // the change time and reopen, unmatched changes insert, nothing is
    // rewritten in place.
    "q52_scd2_merge" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val dim = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_totalprice"),
          lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"),
          lit(true).as("is_current"))
      val chg = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") * lit(1.5)).as("o_totalprice"),
          // o_orderdate is TIMESTAMP_NTZ; session TZ is pinned UTC, so the
          // cast is the identity instant and matches DuckDB's epoch_us.
          unix_micros(col("o_orderdate").cast("timestamp")).as("chg_ts"))
      Upsert.scd2Merge(dim, chg, key = "o_orderkey", tsCol = "chg_ts")
        .orderBy(col("o_orderkey"), col("valid_from"))
    }),

    // The rank-function family in one pass: rank/dense_rank over a
    // tie-PRONE key (price bucket — tie semantics are the point; both are
    // tie-stable), percent_rank/cume_dist (deterministic order
    // statistics), and ntile over a total order (ntile splits ties
    // arbitrarily, so it gets the orderkey tiebreak).
    "q68_rank_family" -> ((s, dir) => {
      val byBucket = Window.partitionBy(col("o_orderpriority"))
        .orderBy(desc("bucket"))
      val total = Window.partitionBy(col("o_orderpriority"))
        .orderBy(desc("bucket"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderpriority"), col("o_orderkey"),
          floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
        .withColumn("rnk", rank().over(byBucket).cast("long"))
        .withColumn("drnk", dense_rank().over(byBucket).cast("long"))
        .withColumn("prnk", round(percent_rank().over(byBucket), 6))
        .withColumn("cume", round(cume_dist().over(byBucket), 6))
        .withColumn("tile", ntile(4).over(total).cast("long"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // Histogram: fixed-width binned distribution of a measure — bin ids
    // from pure integer arithmetic on a data-independent width, so both
    // engines agree exactly.
    "q66_histogram" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(floor(col("l_extendedprice") / 5000).cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("bin"))),

    // Moving average over the DENSE daily series (composes on q64's
    // spine — gap days count as 0, which a moving average over the raw
    // sparse table silently gets wrong): 7-day trailing mean per
    // priority. Integer window sums divide exactly, so the doubles agree.
    "q67_moving_avg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"),
          col("o_orderdate").cast("date").as("d"))
      val spine = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("d"))
      val dense = spine.crossJoin(o.select(col("prio")).distinct())
        .join(o.groupBy(col("prio"), col("d")).agg(count(lit(1)).as("cnt")),
          Seq("prio", "d"), "left")
        .select(col("prio"), col("d"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val w = Window.partitionBy(col("prio")).orderBy(col("d"))
        .rowsBetween(-6, Window.currentRow)
      dense.withColumn("ma7", round(avg(col("cnt")).over(w), 4))
        .orderBy(col("prio"), col("d"))
    }),

    // Edit distance (fuzzy string matching): levenshtein to the next
    // customer name within a hash bucket — exact integer output, so the
    // oracle matches bit-for-bit; bucketed lead keeps the window parallel
    // (no global single-partition sort).
    "q63_edit_distance" -> ((s, dir) => {
      val w = Window.partitionBy(col("bkt")).orderBy(col("c_custkey"))
      t(s, dir, "customer").filter(col("c_custkey") < 500)
        .select(col("c_custkey"), (col("c_custkey") % 10).as("bkt"),
          col("c_name"))
        .withColumn("next_name", lead(col("c_name"), 1).over(w))
        .select(col("c_custkey"),
          levenshtein(col("c_name"), col("next_name")).cast("long")
            .as("edit_dist"))
        .orderBy(col("c_custkey"))
    }),

    // Date-spine densification: every (priority, day) in the full date
    // range, missing days filled with 0 — the calendar-fill every
    // time-series report needs. The spine is generated from the data's own
    // bounds (sequence + explode), tiny, and broadcast against the counts.
    "q64_date_spine" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"),
          col("o_orderdate").cast("date").as("d"))
      val spine = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("d"))
      val grid = spine.crossJoin(o.select(col("prio")).distinct())
      val counts = o.groupBy(col("prio"), col("d"))
        .agg(count(lit(1)).as("cnt"))
      grid.join(counts, Seq("prio", "d"), "left")
        .select(col("prio"), col("d"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy(col("prio"), col("d"))
    }),

    // Ratio-to-report: each priority's share of total revenue. Group sums
    // are rounded BEFORE the ratio so the (order-sensitive) double sums
    // can't leak last-ulp noise into the division.
    "q65_revenue_share" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
        .withColumn("share",
          round(col("revenue") / sum(col("revenue")).over(
            Window.partitionBy()), 6))
        .orderBy(col("o_orderpriority"))),

    // Semi-structured column: extract a typed value out of the JSON props
    // string and aggregate — `get_json_object` is a pure scan-side
    // expression (no UDF, no parse-twice).
    "q53_json_props" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("cnt"),
          round(avg(col("k")), 2).as("avg_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // Unpivot / melt: wide measure columns to (metric, val) rows — the
    // narrow-transform side of q46's pivot. No shuffle: unpivot is a
    // generate-style projection.
    "q54_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"),
          col("val"))),

    // Salted join: the fact side is collapsed onto 5 intentionally-hot
    // keys; the salt spreads each hot key over 8 reducers and the dim is
    // replicated per salt. Result must equal the plain inner join (the
    // oracle does the plain one).
    "q56_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select((col("l_orderkey") % 5).as("k"), col("l_quantity"))
      val dim = t(s, dir, "orders")
        .groupBy((col("o_orderkey") % 5).as("k"))
        .agg(round(avg(col("o_totalprice")), 2).as("dim_avg"))
      Skew.saltedJoin(li, dim, "k", col("l_quantity"), 8)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_quantity")), 2).as("qty"),
          max(col("dim_avg")).as("dim_avg"))
        .orderBy(col("k"))
    }),

    // Context-window chunking: overlapping 200-char chunks (50 overlap)
    // per document — the preprocessing step between cleaning and
    // tokenization in a training pipeline. Explode-shaped, scan-speed.
    "q55_doc_chunks" -> ((s, dir) =>
      graft.functions.TextAnalysis.chunks(
        t(s, dir, "documents"), "doc_id", "text", size = 200, overlap = 50)
        .orderBy(col("doc_id"), col("off"))),

    // Multimodal decode end-to-end: deterministic fake image payloads
    // synthesized from document stats, batch-decoded via the typed
    // mapPartitions path with every 97th payload corrupted to exercise
    // reject-routing. The fake codec is closed-form arithmetic over
    // (doc_id, n_chars), so the decoded metadata IS DuckDB-expressible —
    // the oracle reproduces every field of ImageMeta with CASE arithmetic
    // (byte-level header parsing itself is unit-tested in MultimodalSpec).
    "q58_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
        .as[(Long, Long)]
      val assets = docs.map { case (id, n) =>
        if (id % 97 == 0) Multimodal.Asset(id, "image", Array[Byte](1, 2, 3))
        else Multimodal.Asset(id, "image",
          Multimodal.encodeFake((n % 32 + 1).toInt, (n / 32 % 32 + 1).toInt, 3))
      }
      Multimodal.decodeImages(assets).toDF()
        .orderBy(col("asset_id"))
    }),

    // Multimodal pipeline 2: decode → nearest-neighbor resize (factor 2)
    // → stride-2 frame sampling, all through the typed mapPartitions
    // plumbing. Like q58, the fake codec is closed-form over (doc_id,
    // n_chars), so the resized dimensions, byte counts and sampled frame
    // offsets are DuckDB-expressible arithmetic; corrupt payloads (every
    // 97th) pass through resize untouched and sample zero frames.
    "q105_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
        .as[(Long, Long)]
      val assets = docs.map { case (id, n) =>
        if (id % 97 == 0) Multimodal.Asset(id, "video", Array[Byte](1, 2, 3))
        else Multimodal.Asset(id, "video",
          Multimodal.encodeFake((n % 32 + 1).toInt, (n / 32 % 32 + 1).toInt, 3))
      }
      val resized = Multimodal.resize(assets, factor = 2).toDF()
      val off = Multimodal.frameOffsets(col("payload"), frameBytes = 48,
        everyN = 2)
      resized
        .select(col("asset_id"),
          length(col("payload")).cast("long").as("n_bytes"), off.as("_off"))
        .select(col("asset_id"), col("n_bytes"),
          greatest(expr("(n_bytes - 13) DIV 48"), lit(0L)).as("n_frames"),
          size(col("_off")).cast("long").as("n_sampled"),
          when(size(col("_off")) > 0, element_at(col("_off"), 1))
            .cast("long").as("first_off"),
          when(size(col("_off")) > 0, element_at(col("_off"), -1))
            .cast("long").as("last_off"))
        .orderBy(col("asset_id"))
    }),

    // Perceptual near-dup for the MULTIMODAL payload column — the gap
    // in the dedup families: digest/LSH/semantic/substring all read
    // text, none read bytes. Average-hash fingerprints (8×8 grid, mean
    // threshold — the DCT-free pHash variant; integer mean comparison
    // keeps it closed-form) over a deterministic pixel fixture with
    // PLANTED perturbed twins (id%10==1 re-renders its neighbor's image
    // with every 50th pixel flipped by 128 — a re-encode the exact
    // digest can never match), then Hamming-banded candidate blocking
    // via the SimHash machinery REUSED AS-IS (banding is hash-family-
    // agnostic; pigeonhole: hamming ≤ 3 ⇒ one intact 16-bit chunk, so
    // candidates are an equi-join, never all-pairs), hamming-verified
    // at τ=3. Corrupt payloads (id%97==0) fail decode and exit the
    // pipeline as invalid instead of as spurious zero-hashes.
    // Persisted as the phash_pairs stage since round 14 (the q239
    // cross-modal card reads the same verified pairs).
    "q220_phash_neardup" -> ((s, dir) =>
      phashPairsStage(s, dir).orderBy(col("d1"), col("d2"))),

    // Exact interpolated percentiles per group — Spark `percentile` and
    // DuckDB `quantile_cont` both sort and linearly interpolate; verified
    // to agree at 4 decimals on this data.
    "q50_percentiles" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag")))
  )

  val oracles: Map[String, String] = Map(
    // Mirrors the q58 pipeline arithmetic: corrupt payloads (doc_id % 97
    // = 0) are 3 bytes -> "truncated header"; valid ones decode to the
    // encodeFake dimensions w = n%32+1, h = (n/32)%32+1, c = 3 and
    // n_bytes = 13-byte header + w*h*c pixels.
    "q58_multimodal_decode" ->
      """SELECT doc_id AS asset_id,
        |  CAST(CASE WHEN doc_id % 97 = 0 THEN 0
        |       ELSE n_chars % 32 + 1 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 97 = 0 THEN 0
        |       ELSE (n_chars // 32) % 32 + 1 END AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 97 = 0 THEN 0 ELSE 3 END AS INTEGER) AS channels,
        |  CAST(CASE WHEN doc_id % 97 = 0 THEN 3
        |       ELSE 13 + (n_chars % 32 + 1) * ((n_chars // 32) % 32 + 1) * 3
        |       END AS BIGINT) AS n_bytes,
        |  doc_id % 97 <> 0 AS valid,
        |  CASE WHEN doc_id % 97 = 0 THEN 'truncated header' ELSE '' END AS err
        |FROM documents ORDER BY asset_id""".stripMargin,

    // Mirrors the q105 pipeline arithmetic: resized dims are
    // max(1, d // 2) of the q58 encodeFake dims, the resized payload is
    // 13 + w2*h2*3 bytes, frames are 48-byte strides past the header
    // sampled every 2nd — corrupt payloads stay 3 bytes and sample none.
    "q105_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id AS asset_id,
        |    CASE WHEN doc_id % 97 = 0 THEN 3
        |         ELSE 13 + greatest(1, (n_chars % 32 + 1) // 2) *
        |                   greatest(1, ((n_chars // 32) % 32 + 1) // 2) * 3
        |    END AS n_bytes
        |  FROM documents),
        |f AS (
        |  SELECT asset_id, n_bytes,
        |    greatest((n_bytes - 13) // 48, 0) AS n_frames
        |  FROM d)
        |SELECT asset_id, CAST(n_bytes AS BIGINT) AS n_bytes,
        |  CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST((n_frames + 1) // 2 AS BIGINT) AS n_sampled,
        |  CASE WHEN n_frames > 0 THEN 13 END::BIGINT AS first_off,
        |  CASE WHEN n_frames > 0
        |       THEN 13 + 96 * ((n_frames + 1) // 2 - 1) END::BIGINT
        |    AS last_off
        |FROM f ORDER BY asset_id""".stripMargin,

    "q41_asof_join" ->
      """WITH c AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS t, value
        |  FROM events WHERE event_type = 'click'),
        |e AS (
        |  SELECT user_id, epoch_us(ts) AS err_t, value AS err_value
        |  FROM events WHERE event_type = 'error')
        |SELECT c.event_id, c.user_id, c.t, c.value, e.err_t, e.err_value
        |FROM c ASOF LEFT JOIN e
        |  ON c.user_id = e.user_id AND c.t >= e.err_t
        |ORDER BY c.event_id""".stripMargin,

    "q57_asof_forward" ->
      """WITH c AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS p_t, value AS p_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.t, p.p_t, p.p_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.t <= p.p_t
        |ORDER BY c.event_id""".stripMargin,

    "q42_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
        |f AS (
        |  SELECT event_id, user_id, t,
        |    CASE WHEN lag(t) OVER w IS NULL
        |           OR t - lag(t) OVER w > 14400000000 THEN 1 ELSE 0 END AS s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
        |SELECT event_id, user_id, t,
        |  CAST(sum(s) OVER (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |FROM f ORDER BY event_id""".stripMargin,

    "q43_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING), 2) AS run_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q44_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
        |  date_diff('day',
        |    lag(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey),
        |    o_orderdate) AS gap_days
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q45_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls,
        |  l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q46_pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS "F",
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS "O",
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q47_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,

    "q48_hash_sample" ->
      """WITH k AS (
        |  SELECT *,
        |    l_orderkey::VARCHAR || '|' || l_partkey::VARCHAR || '|' ||
        |    l_suppkey::VARCHAR || '|' || l_linenumber::VARCHAR AS key
        |  FROM lineitem)
        |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  ('0x' || substr(md5(key), 1, 15))::BIGINT % 100 AS bucket
        |FROM k
        |WHERE ('0x' || substr(md5(key), 1, 15))::BIGINT % 100 < 10
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin,

    "q49_centroids" ->
      """SELECT label, r.i AS ord, round(avg(v[(r.i + 1)::INTEGER]), 6) AS m
        |FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        |     range(0, 64) AS r(i)
        |GROUP BY label, r.i ORDER BY label, ord""".stripMargin,

    "q51_session_concurrency" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
        |f AS (
        |  SELECT user_id, t,
        |    CASE WHEN lag(t) OVER w IS NULL
        |           OR t - lag(t) OVER w > 14400000000 THEN 1 ELSE 0 END AS s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |g AS (
        |  SELECT user_id, t, sum(s) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f),
        |sess AS (
        |  SELECT user_id, sid, min(t) AS t_start, max(t) AS t_end
        |  FROM g GROUP BY user_id, sid),
        |u AS (
        |  SELECT user_id, t_start, t_start AS t, 1 AS is_s, 0 AS is_e FROM sess
        |  UNION ALL
        |  SELECT user_id, t_start, t_end, 0, 1 FROM sess),
        |c AS (
        |  SELECT user_id, t_start, is_s,
        |    sum(is_s) OVER (ORDER BY t
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS si,
        |    coalesce(sum(is_e) OVER (ORDER BY t
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ee
        |  FROM u)
        |SELECT user_id, t_start, CAST(si - ee AS BIGINT) AS concurrency
        |FROM c WHERE is_s = 1 ORDER BY user_id, t_start""".stripMargin,

    "q52_scd2_merge" ->
      """WITH dim AS (
        |  SELECT o_orderkey, o_totalprice, 0::BIGINT AS valid_from,
        |         NULL::BIGINT AS valid_to, TRUE AS is_current
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |chg AS (
        |  SELECT o_orderkey, o_totalprice * 1.5::DOUBLE AS o_totalprice,
        |         epoch_us(o_orderdate) AS ts
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |closed AS (
        |  SELECT d.o_orderkey, d.o_totalprice, d.valid_from,
        |         c.ts AS valid_to, FALSE AS is_current
        |  FROM dim d JOIN chg c USING (o_orderkey)),
        |untouched AS (
        |  SELECT d.* FROM dim d
        |  WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.o_orderkey = d.o_orderkey)),
        |opened AS (
        |  SELECT o_orderkey, o_totalprice, ts AS valid_from,
        |         NULL::BIGINT AS valid_to, TRUE AS is_current
        |  FROM chg)
        |SELECT * FROM closed
        |UNION ALL SELECT * FROM untouched
        |UNION ALL SELECT * FROM opened
        |ORDER BY o_orderkey, valid_from""".stripMargin,

    "q68_rank_family" ->
      """SELECT o_orderpriority, o_orderkey, bucket,
        |  CAST(rank() OVER wb AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER wb AS BIGINT) AS drnk,
        |  round(percent_rank() OVER wb, 6) AS prnk,
        |  round(cume_dist() OVER wb, 6) AS cume,
        |  CAST(ntile(4) OVER wt AS BIGINT) AS tile
        |FROM (SELECT o_orderpriority, o_orderkey,
        |        CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket
        |      FROM orders WHERE o_orderkey < 2000)
        |WINDOW
        |  wb AS (PARTITION BY o_orderpriority ORDER BY bucket DESC),
        |  wt AS (PARTITION BY o_orderpriority ORDER BY bucket DESC, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q66_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin,

    "q67_moving_avg" ->
      """WITH b AS (SELECT min(o_orderdate::DATE) AS lo,
        |                  max(o_orderdate::DATE) AS hi FROM orders),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        |  FROM b),
        |prios AS (SELECT DISTINCT o_orderpriority AS prio FROM orders),
        |counts AS (
        |  SELECT o_orderpriority AS prio, o_orderdate::DATE AS d,
        |         count(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |dense AS (
        |  SELECT p.prio, s.d, coalesce(c.cnt, 0) AS cnt
        |  FROM spine s CROSS JOIN prios p
        |  LEFT JOIN counts c ON c.prio = p.prio AND c.d = s.d)
        |SELECT prio, d, CAST(cnt AS BIGINT) AS cnt,
        |       round(avg(cnt) OVER (PARTITION BY prio ORDER BY d
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
        |FROM dense ORDER BY prio, d""".stripMargin,

    "q63_edit_distance" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, lead(c_name) OVER
        |    (PARTITION BY c_custkey % 10 ORDER BY c_custkey)) AS BIGINT)
        |    AS edit_dist
        |FROM customer WHERE c_custkey < 500
        |ORDER BY c_custkey""".stripMargin,

    "q64_date_spine" ->
      """WITH b AS (SELECT min(o_orderdate::DATE) AS lo,
        |                  max(o_orderdate::DATE) AS hi FROM orders),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        |  FROM b),
        |prios AS (SELECT DISTINCT o_orderpriority AS prio FROM orders),
        |counts AS (
        |  SELECT o_orderpriority AS prio, o_orderdate::DATE AS d,
        |         count(*) AS cnt
        |  FROM orders GROUP BY 1, 2)
        |SELECT p.prio, s.d, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
        |FROM spine s CROSS JOIN prios p
        |LEFT JOIN counts c ON c.prio = p.prio AND c.d = s.d
        |ORDER BY p.prio, s.d""".stripMargin,

    "q65_revenue_share" ->
      """WITH g AS (
        |  SELECT o_orderpriority, round(sum(o_totalprice), 2) AS revenue
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, revenue,
        |       round(revenue / sum(revenue) OVER (), 6) AS share
        |FROM g ORDER BY o_orderpriority""".stripMargin,

    "q53_json_props" ->
      """SELECT event_type, CAST(count(k) AS BIGINT) AS cnt,
        |       round(avg(k), 2) AS avg_k,
        |       CAST(min(k) AS BIGINT) AS min_k,
        |       CAST(max(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type, json_extract(props, '$.k')::BIGINT AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q54_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, val
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |      FROM lineitem)
        |UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
        |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin,

    "q56_salted_join" ->
      """WITH li AS (SELECT l_orderkey % 5 AS k, l_quantity FROM lineitem),
        |dim AS (SELECT o_orderkey % 5 AS k, round(avg(o_totalprice), 2) AS dim_avg
        |        FROM orders GROUP BY 1)
        |SELECT li.k, CAST(count(*) AS BIGINT) AS cnt,
        |       round(sum(l_quantity), 2) AS qty, max(dim_avg) AS dim_avg
        |FROM li JOIN dim ON li.k = dim.k
        |GROUP BY li.k ORDER BY li.k""".stripMargin,

    // DuckDB 1.0 range() cannot take lateral column bounds; the oracle
    // joins a static offset grid (far beyond any doc length) and filters.
    "q55_doc_chunks" ->
      """SELECT doc_id, CAST(r.i / 150 AS BIGINT) AS chunk_idx, r.i AS off,
        |       substr(text, (r.i + 1)::INTEGER, 200) AS chunk
        |FROM documents, range(0, 100000, 150) AS r(i)
        |WHERE r.i < greatest(length(text), 1)
        |ORDER BY doc_id, off""".stripMargin,

    "q50_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Mirrors the q220 pipeline closed-form: the same seed/dims/pixel
    // arithmetic, the same 8x8 nearest-neighbor grid, the integer mean
    // comparison (64*v > sum), the same star + rep-rep edge contract as
    // simhashCandidateEdges (identical hashes collapse to a star around
    // min id; cross edges only between group reps sharing a 16-bit
    // chunk), hamming-verified at 3. Bit 63 is added as the signed
    // two's-complement constant because DuckDB's BIGINT << 63 overflows
    // where Java's wraps; the HUGEINT sum then casts back exactly.
    "q220_phash_neardup" ->
      s"""WITH $phashCtes
         |SELECT d1, d2, hamming FROM (
         |  SELECT * FROM star
         |  UNION ALL
         |  SELECT * FROM crossh WHERE hamming <= 3)
         |ORDER BY d1, d2""".stripMargin
  )

  /** Shared WITH-body of the q220/q239 oracles: the planted-twin pixel
    * fixture replay, aHash, and the star + verified-cross pair chain. */
  private[queries] def phashCtes: String =
      """cfg AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END
        |      AS seed,
        |    doc_id % 10 = 1 AS twin
        |  FROM documents WHERE doc_id % 97 <> 0),
        |dims AS (
        |  SELECT id, seed, twin, seed % 29 + 4 AS w,
        |         (seed // 29) % 17 + 4 AS h
        |  FROM cfg),
        |samp AS (
        |  SELECT d.id, (gy.range * 8 + gx.range) AS bit,
        |    ((d.seed * 31 +
        |        ((gy.range * d.h // 8) * d.w + (gx.range * d.w // 8)))
        |       % 256
        |     + CASE WHEN d.twin AND
        |         ((gy.range * d.h // 8) * d.w + (gx.range * d.w // 8))
        |           % 50 = 0
        |       THEN 128 ELSE 0 END) % 256 AS v
        |  FROM dims d, range(0, 8) gx, range(0, 8) gy),
        |tot AS (SELECT id, sum(v) AS s FROM samp GROUP BY id),
        |ph AS (
        |  SELECT samp.id,
        |    CAST(sum(CASE WHEN 64 * v > s THEN
        |        CASE WHEN bit = 63 THEN -9223372036854775807 - 1
        |             ELSE 1::BIGINT << bit::INTEGER END
        |      ELSE 0 END) AS BIGINT) AS phash
        |  FROM samp JOIN tot USING (id) GROUP BY samp.id),
        |reps AS (SELECT phash, min(id) AS rep FROM ph GROUP BY phash),
        |star AS (
        |  SELECT r.rep AS d1, p.id AS d2, 0::BIGINT AS hamming
        |  FROM ph p JOIN reps r USING (phash) WHERE p.id <> r.rep),
        |chunks AS (
        |  SELECT rep, j.range AS j, (phash >> (j.range * 16)::INTEGER)
        |    & 65535 AS cv
        |  FROM reps, range(0, 4) j),
        |crossp AS (
        |  SELECT DISTINCT a.rep AS d1, b.rep AS d2
        |  FROM chunks a JOIN chunks b
        |    ON a.j = b.j AND a.cv = b.cv AND a.rep < b.rep),
        |crossh AS (
        |  SELECT d1, d2,
        |    CAST(bit_count(xor(p1.phash, p2.phash)) AS BIGINT) AS hamming
        |  FROM crossp
        |  JOIN ph p1 ON p1.id = d1 JOIN ph p2 ON p2.id = d2)""".stripMargin
}
