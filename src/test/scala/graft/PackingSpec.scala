package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Greedy sequence packing: budget respected, nothing dropped,
  * deterministic under repartition, oversize docs isolated. */
class PackingSpec extends SparkSpec {
  import sqlImplicits._

  private def fixture = (1 to 500)
    .map(i => (i.toLong, (i * 37 % 90 + 10).toLong)) // weights 10..99
    .toDF("doc_id", "n_tok")

  test("every bin fits the budget and every doc is assigned exactly once") {
    val packed = Packing.packGreedy(fixture, "doc_id", "n_tok",
      budget = 256L, shards = 8)
    assert(packed.count() === 500)
    assert(packed.select("id").distinct().count() === 500)
    val over = packed.groupBy("shard", "bin").agg(sum("w").as("fill"))
      .filter(col("fill") > 256).count()
    assert(over === 0L)
    val stats = Packing.packStats(packed, 256L).head()
    assert(stats.getAs[Long]("illegal_bins") === 0L)
    assert(stats.getAs[Double]("mean_fill") > 0.5, "greedy should pack densely")
  }

  test("deterministic under input repartition") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packGreedy(df, "doc_id", "n_tok", 256L, 8)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(run(fixture) === run(fixture.repartition(13)))
  }

  test("string ids keep their type and pack in lexicographic in-shard order") {
    val df = Seq(("b", 60L), ("a", 60L), ("c", 60L)).toDF("doc_id", "n_tok")
    val packed = Packing.packGreedy(df, "doc_id", "n_tok", 100L, 1)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    // order a,b,c at budget 100: each 60-token doc overflows the previous bin
    assert(packed === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("a NULL weight fails fast with a clear message, not silent corruption") {
    val df = Seq((1L, Option(50L)), (2L, Option.empty[Long])).toDF("doc_id", "n_tok")
    val ex = intercept[Exception] {
      Packing.packGreedy(df, "doc_id", "n_tok", 100L, 1).collect()
    }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("packGreedy"), s"unhelpful failure: $chain")
  }

  test("an over-budget doc gets its own bin, never dropped") {
    val df = Seq((1L, 50L), (2L, 999L), (3L, 60L)).toDF("doc_id", "n_tok")
    val packed = Packing.packGreedy(df, "doc_id", "n_tok", 100L, 1)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(packed.keySet === Set(1L, 2L, 3L))
    // the big doc is alone in its bin
    val bins = Packing.packGreedy(df, "doc_id", "n_tok", 100L, 1)
      .groupBy("bin").agg(collect_list("id").as("ids")).collect()
      .map(r => r.getSeq[Long](1).toSet)
    assert(bins.exists(_ === Set(2L)))
  }

  test("packCard: tokens + waste + over-budget excess tile the capacity " +
      "exactly, and the card conserves the input") {
    val df = (1 to 200).map(i => (i.toLong, (i % 90 + 10).toLong))
      .toDF("doc_id", "n_tok")
    val budget = 128L
    val packed = Packing.packGreedy(df, "doc_id", "n_tok", budget, 4)
      .persist()
    try {
      val c = Packing.packCard(packed, budget).collect()(0)
      val (nBins, nDocs, total, capacity) =
        (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
      val (waste, maxFill, nOver) =
        (c.getLong(4), c.getLong(5), c.getLong(6))
      assert(nDocs === 200L)
      assert(total === df.agg(sum(col("n_tok"))).collect()(0).getLong(0))
      assert(capacity === nBins * budget)
      // per-bin: fill + waste = budget when under, fill alone when over —
      // summed: total + waste − overExcess = capacity
      val overExcess = packed.groupBy(col("shard"), col("bin"))
        .agg(sum(col("w")).as("fill"))
        .filter(col("fill") > budget)
        .agg(coalesce(sum(col("fill") - budget), lit(0L)))
        .collect()(0).getLong(0)
      assert(total + waste - overExcess === capacity)
      assert(maxFill <= budget || nOver > 0)
    } finally { packed.unpersist(); () }
  }

  test("epochShuffle: a permutation of the bins (pos 1..n, every bin " +
      "once), invariant under input repartitioning, different seeds " +
      "give different orders, and same seed replays identically") {
    import sqlImplicits._
    val df = (1L to 200L).map(i => (i, (i * 7) % 90 + 10))
      .toDF("doc_id", "n_tok")
    val packed = Packing.packGreedy(df, "doc_id", "n_tok", 128L, 4)
      .persist()
    try {
      def order(p: org.apache.spark.sql.DataFrame, seed: Long) =
        Packing.epochShuffle(p, seed).orderBy(col("pos"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq
      val e1 = order(packed, 13L)
      val nBins = packed.select(col("shard"), col("bin")).distinct().count()
      assert(e1.map(_._1) === (1L to nBins).toSeq) // pos is 1..n, unique
      assert(e1.map(t => (t._2, t._3)).toSet ===
        packed.select(col("shard"), col("bin")).distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      // replay + partitioning invariance: the order is a pure function
      // of (packing, seed), not of physical layout
      assert(order(packed.repartition(7), 13L) === e1)
      assert(order(packed, 13L) === e1)
      // a different epoch is a different permutation of the same bins
      val e2 = order(packed, 14L)
      assert(e2 !== e1)
      assert(e2.map(t => (t._2, t._3)).toSet ===
        e1.map(t => (t._2, t._3)).toSet)
    } finally { packed.unpersist(); () }
  }

  test("epochShuffle + clusteredWrite: each written file covers a " +
      "disjoint contiguous pos range — a file IS a data-loader shard " +
      "of the epoch") {
    import sqlImplicits._
    val df = (1L to 400L).map(i => (i, (i * 11) % 90 + 10))
      .toDF("doc_id", "n_tok")
    val packed = Packing.packGreedy(df, "doc_id", "n_tok", 128L, 4)
    val epoch = Packing.epochShuffle(packed, seed = 5L)
    val dir = java.nio.file.Files.createTempDirectory("graft_epoch")
      .toString + "/epoch_5"
    graft.operators.Layout.clusteredWrite(epoch,
      col("pos"), zorderCol = "pos_k", path = dir, numFiles = 4)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("pos")).as("lo"), max(col("pos")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    // disjoint AND contiguous: file i ends exactly where i+1 begins
    ranges.sliding(2).foreach {
      case Array((lo1, hi1, n1), (lo2, _, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: $hi1 >= $lo2")
        assert(hi1 - lo1 + 1 === n1 && hi1 + 1 === lo2,
          s"epoch slice not contiguous: [$lo1,$hi1] n=$n1 next=$lo2")
      case _ =>
    }
  }

  test("incrementalRepack: clean bins byte-identical, condemned gone, " +
      "repaired bins fresh and within budget, and the row counts " +
      "reconcile with takedownBlastRadius") {
    val packed = Packing.packGreedy(fixture, "doc_id", "n_tok",
      budget = 256L, shards = 8).localCheckpoint(true)
    val tombs = packed.filter(col("id") % 23 === 9).select(col("id"))
    val repaired = Packing.incrementalRepack(packed, tombs, "id",
      budget = 256L, shards = 8).localCheckpoint(true)
    // no condemned doc anywhere
    assert(repaired.join(tombs, Seq("id"), "left_semi").count() === 0L)
    // clean rows keep their exact (shard, bin); repacked rows all come
    // from dirty bins
    val orig = packed.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val dirtyBins = packed.filter(col("id") % 23 === 9)
      .select(col("shard"), col("bin")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    repaired.collect().foreach { r =>
      val (id, shard, bin, rep) = (r.getLong(0), r.getLong(2),
        r.getLong(3), r.getBoolean(4))
      if (!rep) {
        assert((shard, bin) === orig(id), s"clean row moved: $id")
        assert(!dirtyBins((shard, bin)), s"dirty bin kept: $id")
      } else {
        assert(dirtyBins(orig(id)), s"repacked a clean-bin doc: $id")
      }
    }
    // fresh bins: every repacked bin id exceeds the shard's original max
    val maxBin = packed.groupBy(col("shard")).agg(max(col("bin")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    repaired.filter(col("repacked")).collect().foreach { r =>
      assert(r.getLong(3) > maxBin(r.getLong(2)),
        s"repaired bin collides in shard ${r.getLong(2)}")
    }
    // budget respected in the repaired manifest (fixture has no
    // over-budget single docs)
    val over = repaired.groupBy("shard", "bin").agg(sum("w").as("fill"))
      .filter(col("fill") > 256).count()
    assert(over === 0L)
    // reconciliation with the blast radius card
    val radius = Packing.takedownBlastRadius(packed, tombs, "id").head()
    assert(repaired.filter(col("repacked")).count() ===
      radius.getAs[Long]("n_docs_repack"))
    assert(packed.count() - repaired.count() ===
      radius.getAs[Long]("n_docs_dropped"))
  }

  test("incrementalRepack degenerate inputs: an empty tombstone set is " +
      "a byte-identical no-op; tombstoning everything empties the " +
      "manifest; a fully-dirty packing re-packs every survivor") {
    val packed = Packing.packGreedy(fixture, "doc_id", "n_tok",
      budget = 256L, shards = 8).localCheckpoint(true)
    // no tombstones -> identity, nothing marked repacked
    val noop = Packing.incrementalRepack(packed,
      fixture.filter(lit(false)).select(col("doc_id").as("id")), "id",
      budget = 256L, shards = 8)
    assert(noop.filter(col("repacked")).count() === 0L)
    assert(noop.select("id", "w", "shard", "bin").collect().toSet ===
      packed.collect().toSet.map((r: org.apache.spark.sql.Row) => r))
    // everything tombstoned -> empty manifest
    val all = Packing.incrementalRepack(packed,
      packed.select(col("id")), "id", budget = 256L, shards = 8)
    assert(all.count() === 0L)
    // one tombstone per bin -> every surviving doc re-packs, budget and
    // freshness still hold
    val perBin = packed.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("shard"), col("bin")).orderBy(col("id"))))
      .filter(col("rn") === 1).select(col("id"))
    val full = Packing.incrementalRepack(packed, perBin, "id",
      budget = 256L, shards = 8)
    assert(full.filter(!col("repacked")).count() === 0L)
    assert(full.count() === packed.count() - perBin.count())
    val over = full.groupBy("shard", "bin").agg(sum("w").as("fill"))
      .filter(col("fill") > 256).count()
    assert(over === 0L)
  }

  test("packLengthCurve: token mass is budget-invariant, bins shrink as " +
      "the budget grows, waste tiles capacity when nothing is " +
      "over-budget, and truncation pressure counts exactly the tokens " +
      "beyond L") {
    val rows = Packing.packLengthCurve(fixture, "doc_id", "n_tok",
      budgets = Seq(32L, 128L, 65536L), shards = 8)
      .orderBy(col("budget")).collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getAs[Long]("total_tokens") ===
      fixture.agg(sum("n_tok")).head().getLong(0)))
    val bins = rows.map(_.getAs[Long]("n_bins")).toSeq
    assert(bins === bins.sorted.reverse,
      "a bigger budget can only need fewer-or-equal bins")
    // weights are 10..99: at L=32 docs longer than 32 are over-budget
    val r32 = rows.head
    val expectTrunc = fixture.agg(sum(greatest(col("n_tok") - 32L,
      lit(0L)))).head().getLong(0)
    assert(r32.getAs[Long]("trunc_tokens") === expectTrunc)
    assert(r32.getAs[Long]("n_overbudget") ===
      fixture.filter(col("n_tok") > 32).count())
    // at L=65536 (beyond the whole corpus) one bin per non-empty
    // shard, zero truncation
    val rBig = rows.last
    assert(rBig.getAs[Long]("trunc_tokens") === 0L &&
      rBig.getAs[Long]("n_overbudget") === 0L &&
      rBig.getAs[Long]("n_bins") === 8L)
    // truncation-free points: waste is exactly the unfilled capacity
    rows.filter(_.getAs[Long]("n_overbudget") == 0L).foreach { r =>
      assert(r.getAs[Long]("sum_waste") ===
        r.getAs[Long]("n_bins") * r.getAs[Long]("budget") -
          r.getAs[Long]("total_tokens"), r.toString)
    }
  }

  test("binDiversityCard: hand-checked histogram — per-bin source " +
      "counts, domination at the exact half-token boundary, and " +
      "doc/token conservation") {
    // source of id i = s((i-1) % 3 + 1):
    // bin (0,0): ids 1,2,3 -> s1 30, s2 20, s3 10 — s1 holds exactly
    //   half (30 of 60) -> dominated (the >= boundary)
    // bin (0,1): ids 4,5 -> s1 25, s2 25 — a perfect split still has a
    //   source at half -> dominated
    // bin (1,0): ids 6,7,8 -> s3 20, s1 15, s2 15 — max 20 of 50 ->
    //   NOT dominated
    val packed = Seq(
      (1L, 30L, 0L, 0L), (2L, 20L, 0L, 0L), (3L, 10L, 0L, 0L),
      (4L, 25L, 0L, 1L), (5L, 25L, 0L, 1L),
      (6L, 20L, 1L, 0L), (7L, 15L, 1L, 0L), (8L, 15L, 1L, 0L))
      .toDF("id", "w", "shard", "bin")
    val attrs = packed.select(col("id").as("doc_id"),
      expr("element_at(array('s1','s2','s3'), " +
        "cast(((id - 1) % 3) + 1 as int))").as("source"))
    val card = Packing.binDiversityCard(packed,
      col("id"), attrs, "doc_id", "source")
      .orderBy(col("n_sources")).collect()
    val by = card.map(r => r.getAs[Long]("n_sources") -> r).toMap
    assert(by(2L).getAs[Long]("n_bins") === 1L &&
      by(2L).getAs[Long]("n_dominated") === 1L,
      "the 25/25 split sits ON the boundary and counts as dominated")
    assert(by(3L).getAs[Long]("n_bins") === 2L &&
      by(3L).getAs[Long]("n_dominated") === 1L)
    assert(card.map(_.getAs[Long]("n_docs")).sum === 8L)
    assert(card.map(_.getAs[Long]("n_tokens")).sum === 160L)
  }

  test("q252 budget metering: the two packings cover the same docs, " +
      "each row's cross-units are the other row's own units, and the " +
      "conservative BPE metering never overflows in whitespace terms") {
    val card = SparkEntry.queries("q252_bpe_packing")(
      spark, "/root/testdata/sf0.001").collect()
    assert(card.length === 2)
    val ws = card.find(_.getAs[String]("meter") == "a_whitespace").get
    val bpe = card.find(_.getAs[String]("meter") == "b_bpe").get
    assert(ws.getAs[Long]("n_docs") === bpe.getAs[Long]("n_docs"))
    assert(ws.getAs[Long]("cross_units") === bpe.getAs[Long]("total_units"),
      "the ws packing's BPE mass must equal the BPE packing's own total")
    assert(bpe.getAs[Long]("cross_units") === ws.getAs[Long]("total_units"))
    // per doc BPE tokens >= whitespace words (every word is >= 1 token),
    // so a bin under the BPE budget is automatically under it in words
    assert(bpe.getAs[Long]("n_cross_over") === 0L)
    assert(bpe.getAs[Long]("n_bins") >= ws.getAs[Long]("n_bins"),
      "metering in the finer unit can only need more bins")
  }

  test("packStream: per shard the docs tile the token stream exactly, " +
      "segments match the bin arithmetic, and the layout is " +
      "repartition-invariant") {
    val streamed = Packing.packStream(fixture, "doc_id", "n_tok",
      budget = 256L, shards = 8)
    assert(streamed.count() === 500)
    // the stream tiles: every doc starts where the previous one ended
    val gaps = streamed.selectExpr("shard", "start_off",
        "start_off + w AS end_off")
      .withColumn("prev_end", coalesce(
        lag(col("end_off"), 1).over(org.apache.spark.sql.expressions
          .Window.partitionBy(col("shard")).orderBy(col("start_off"))),
        lit(0L)))
      .filter(col("start_off") =!= col("prev_end")).count()
    assert(gaps === 0L, "stream offsets must tile with no gap/overlap")
    // segment arithmetic: a doc spans exactly the bins its interval hits
    val bad = streamed.filter(
      col("first_bin") =!= expr("start_off div 256") ||
        col("n_segments") =!= col("last_bin") - col("first_bin") + 1L ||
        col("last_bin") < col("first_bin")).count()
    assert(bad === 0L)
    def runSet(df: org.apache.spark.sql.DataFrame) =
      Packing.packStream(df, "doc_id", "n_tok", 256L, 8)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(runSet(fixture) === runSet(fixture.repartition(13)))
  }

  test("streamPackCard vs packCard: same docs and tokens, stream bins " +
      "<= greedy bins (zero padding except shard tails), and the card " +
      "reconciles fill against capacity exactly") {
    val greedy = Packing.packCard(
      Packing.packGreedy(fixture, "doc_id", "n_tok", 256L, 8), 256L)
      .head()
    val sc = Packing.streamPackCard(
      Packing.packStream(fixture, "doc_id", "n_tok", 256L, 8), 256L)
      .head()
    assert(sc.getAs[Long]("n_docs") === greedy.getAs[Long]("n_docs"))
    assert(sc.getAs[Long]("total_tokens") ===
      greedy.getAs[Long]("total_tokens"))
    assert(sc.getAs[Long]("n_bins") <= greedy.getAs[Long]("n_bins"),
      "the stream layout is the padding-optimal packing")
    assert(sc.getAs[Long]("sum_waste") <= greedy.getAs[Long]("sum_waste"))
    // waste = capacity − tokens, and at most (budget−1) per shard
    assert(sc.getAs[Long]("n_bins") * 256L -
      sc.getAs[Long]("total_tokens") === sc.getAs[Long]("sum_waste"))
    assert(sc.getAs[Long]("sum_waste") < 8L * 256L)
    assert(sc.getAs[Long]("n_docs_split") > 0L,
      "100-token docs at budget 256 must split somewhere")
  }

  test("lengthBucketCard: bucket rows tile the sequences, capacity " +
      "reconciles, truncation only above the max boundary, and the " +
      "~total saved_frac is the exact padding saving") {
    val df = Seq(10L, 64L, 65L, 200L, 300L, 400L, 600L).toDF("len")
    val card = Packing.lengthBucketCard(df, "len",
      Seq(64L, 128L, 256L, 384L, 512L)).collect()
    val tot = card.find(_.getAs[String]("bucket") == "~total").get
    val rows = card.filter(_.getAs[String]("bucket") != "~total")
    assert(rows.map(_.getAs[Long]("n_seqs")).sum === 7L)
    assert(tot.getAs[Long]("n_seqs") === 7L)
    rows.foreach { r =>
      assert(r.getAs[Long]("capacity") - r.getAs[Long]("n_tokens") ===
        r.getAs[Long]("pad_waste"))
    }
    // 600 truncates to 512; nothing else does
    assert(tot.getAs[Long]("trunc_tokens") === 88L)
    // by-hand: buckets L0064:{10,64}, L0128:{65}, L0256:{200},
    // L0384:{300}, L0512:{400, 600→512}
    val by = rows.map(r => r.getAs[String]("bucket") ->
      r.getAs[Long]("n_seqs")).toMap
    assert(by === Map("L0064" -> 2L, "L0128" -> 1L, "L0256" -> 1L,
      "L0384" -> 1L, "L0512" -> 2L))
    val saved = 1.0 - tot.getAs[Long]("pad_waste").toDouble /
      tot.getAs[Long]("maxpad_waste").toDouble
    assert(math.abs(tot.getAs[Double]("saved_frac") -
      math.rint(saved * 1e6) / 1e6) < 1e-12)
  }

  test("packShardCurve: totals are shard-count-invariant, tail waste " +
      "stays under the a-priori shards·budget bound, and no bin is " +
      "over budget on weights under it") {
    val curve = Packing.packShardCurve(fixture, "doc_id", "n_tok",
      budget = 256L, shardGrid = Seq(2, 4, 8, 16)).collect()
    assert(curve.map(_.getAs[Long]("shards")).toSeq ===
      Seq(2L, 4L, 8L, 16L))
    val docs = curve.map(_.getAs[Long]("n_docs")).distinct
    val toks = curve.map(_.getAs[Long]("total_tokens")).distinct
    assert(docs === Array(500L) && toks.length === 1,
      "the manifest is the same whatever the shard count")
    curve.foreach { r =>
      assert(r.getAs[Long]("n_overbudget") === 0L)
      assert(r.getAs[Long]("sum_waste") <
        r.getAs[Long]("shards") * 256L +
          (r.getAs[Long]("n_bins") - r.getAs[Long]("shards")) * 99L,
        "waste beyond the short-tail + per-bin-slack bound: " + r)
    }
  }

  test("q262 invalidation card: token totals reconcile with the " +
      "tombstoned mass, original parts only ever shrink, appended " +
      "parts are new and changed") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q262_shard_invalidation")(spark, dir)
      .collect()
    val v1Parts = (0 to 5).map(i => f"p$i%03d").toSet
    val orig = rows.filter(r => v1Parts.contains(r.getAs[String]("part")))
    val appended =
      rows.filterNot(r => v1Parts.contains(r.getAs[String]("part")))
    assert(appended.nonEmpty, "the repair must append repaired bins")
    appended.foreach { r =>
      assert(r.getAs[Long]("n_before") === 0L &&
        r.getAs[Boolean]("changed"))
    }
    orig.foreach { r =>
      assert(r.getAs[Long]("n_after") <= r.getAs[Long]("n_before"),
        "holes only — clean bins keep their positions: " + r)
    }
    // v2 tokens = v1 tokens − tombstoned docs' tokens (innocent docs
    // re-pack but keep their mass); rebuild the q61 manifest directly
    val tombTok = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 23 === 9)
      .agg(coalesce(sum(graft.functions.TextAnalysis.tokenCount(
        col("text"))), lit(0L))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("tok_before")).sum - tombTok ===
      rows.map(_.getAs[Long]("tok_after")).sum)
  }

  test("shuffleQaCard: identical epoch orders put every recurrence gap " +
      "at exactly N, and the adjacency rate is a true rate over N-1 " +
      "pairs") {
    val packed = Packing.packGreedy(fixture, "doc_id", "n_tok", 256L, 8)
    val dom = Packing.binDominantAttr(packed, col("id"),
      fixture.select(col("doc_id"),
        concat(lit("s"), (col("doc_id") % 3).cast("string")).as("src")),
      "doc_id", "src")
    val e = Packing.epochShuffle(packed, seed = 13L)
    val n = e.count()
    val same = Packing.shuffleQaCard(e, e, dom).head()
    assert(same.getAs[Long]("n_pos") === n)
    // epochB == epochA: every bin's gap is (N − pos) + pos = N
    assert(same.getAs[Long]("min_cross_gap") === n)
    assert(same.getAs[Long]("n_close_cross") === 0L)
    val diff = Packing.shuffleQaCard(e,
      Packing.epochShuffle(packed, seed = 14L), dom).head()
    assert(diff.getAs[Long]("min_cross_gap") < n,
      "different seeds must produce some early recurrence")
    assert(diff.getAs[Double]("adj_same_rate") >= 0.0 &&
      diff.getAs[Double]("adj_same_rate") <= 1.0)
    assert(diff.getAs[Double]("exp_same_rate") > 0.0)
  }
}
