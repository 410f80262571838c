package graft

import org.apache.spark.sql.functions._

/** q196 release-funnel composition contracts — the capstone chains the
  * standalone graded gates (q97 rules, q21 digest dedup, q27 pairs, q82
  * contamination, q188 balance, q61 packing), so each funnel row must
  * reconcile EXACTLY with its standalone query on the same data. */
class ReleaseFunnelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def funnel: Map[String, (Long, Long, Option[Long], Option[Double])] =
    SparkEntry.queries("q196_release_funnel")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap

  test("the funnel is monotone: docs and tokens never increase through " +
      "the gates, and the raw row covers the whole corpus") {
    val f = funnel
    val order = Seq("0_raw", "1_gopher", "2_exact_dedup", "3_near_dup",
      "4_decontaminate", "5_balance")
    assert(f.keySet === (order :+ "6_packed").toSet)
    val docs = order.map(f(_)._1)
    val toks = order.map(f(_)._2)
    assert(docs === docs.sorted.reverse, s"docs not monotone: $docs")
    assert(toks === toks.sorted.reverse, s"tokens not monotone: $toks")
    assert(f("0_raw")._1 ===
      Tables.load(spark, dir, "documents").count())
    assert(f("5_balance")._1 > 0L, "an empty release is a broken funnel")
  }

  test("the packing row conserves the balance survivors exactly and its " +
      "fill rate is tokens over capacity") {
    val f = funnel
    val (bd, bt, _, _) = f("5_balance")
    val (pd, pt, bins, fill) = f("6_packed")
    assert(pd === bd, "packing must not add or drop documents")
    assert(pt === bt, "packing must conserve the token mass")
    assert(bins.exists(_ >= (bt + 511) / 512),
      "bins cannot beat the capacity bound")
    assert(fill.exists(fr => math.abs(
      fr - math.rint(1e6 * bt.toDouble / (bins.get * 512)) / 1e6) < 1e-9))
  }

  test("each gate reconciles with its standalone graded query: q82 flags " +
      "and benchmark ids are all excluded by stage 4, and stage 5 is a " +
      "subset of the q188 keep set") {
    val f = funnel
    val gates = graft.queries.PipelineQueries
      .stage(spark, dir, "release_gates")(
        sys.error("release_gates must be cached by the funnel run"))
    val s4 = gates.filter(col("g_gopher") && col("g_digest") &&
      col("g_neardup") && col("g_decon"))
    assert(s4.count() === f("4_decontaminate")._1)
    // no q82-flagged or benchmark doc survives stage 4
    val flagged = SparkEntry.queries("q82_decontamination")(spark, dir)
      .select(col("doc_id"))
    assert(s4.join(flagged, Seq("doc_id"), "left_semi").count() === 0L)
    assert(s4.filter(col("doc_id") % 97 === 0).count() === 0L)
    // stage 5 ⊆ the q188 keep set (same persisted assignment + targets)
    val keep = SparkEntry.queries("q188_semantic_balance")(spark, dir)
      .select(col("vec_id").as("doc_id"))
    val s5 = s4.filter(col("g_balance"))
    assert(s5.count() === f("5_balance")._1)
    assert(s5.join(keep, Seq("doc_id"), "left_anti").count() === 0L)
    // near-dup gate: every dropped-by-stage-3 doc really pairs with a
    // lower-id stage-2 survivor in the q27 pair table
    val s2 = gates.filter(col("g_gopher") && col("g_digest"))
    val droppedNd = s2.filter(!col("g_neardup")).select(col("doc_id"))
    val pairs = SparkEntry.queries("q27_minhash_neardup")(spark, dir)
    val justified = pairs
      .join(s2.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
      .select(col("d2").as("doc_id")).distinct()
    assert(droppedNd.join(justified, Seq("doc_id"), "left_anti")
      .count() === 0L)
  }

  test("q202 nightly funnel reconciles with its registry queries: the " +
      "near-dup gate is exactly the q159 keep set, the semantic gate " +
      "exactly the q178 survivors, and no history digest survives the " +
      "digest gate") {
    val rows = SparkEntry.queries("q202_incremental_funnel")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val order = Seq("0_batch", "1_gopher", "2_digest_registry",
      "3_neardup_registry", "4_semdedup_registry")
    val docs = order.map(rows(_))
    assert(docs === docs.sorted.reverse, s"not monotone: $docs")
    assert(rows("5_packed") === rows("4_semdedup_registry"))
    val gates = graft.queries.PipelineQueries
      .stage(spark, dir, "nightly_gates")(
        sys.error("nightly_gates must be cached by the funnel run"))
    // near-dup gate == q159 membership on the batch
    val q159 = SparkEntry.queries("q159_neardup_registry")(spark, dir)
      .select(col("doc_id"))
    val ndMismatch = gates.select(col("doc_id"), col("g_neardup"))
      .join(q159.withColumn("__in", lit(true)), Seq("doc_id"), "left")
      .filter(col("g_neardup") =!= coalesce(col("__in"), lit(false)))
    assert(ndMismatch.count() === 0L)
    // semantic gate == q178 survivors
    val q178 = SparkEntry.queries("q178_semdedup_registry")(spark, dir)
      .select(col("vec_id").as("doc_id"), (!col("is_dup")).as("keep"))
    val semMismatch = gates.select(col("doc_id"), col("g_semdedup"))
      .join(q178, Seq("doc_id"))
      .filter(col("g_semdedup") =!= col("keep"))
    assert(semMismatch.count() === 0L)
    // digest gate: no surviving batch doc shares a digest with history
    val docsT = Tables.load(spark, dir, "documents")
    val histFp = docsT.filter(col("doc_id") < 250)
      .select(md5(col("text").cast("binary")).as("fp")).distinct()
    val survFp = gates.filter(col("g_gopher") && col("g_digest"))
      .select(col("doc_id"))
      .join(docsT.select(col("doc_id"),
        md5(col("text").cast("binary")).as("fp")), Seq("doc_id"))
    assert(survFp.join(histFp, Seq("fp"), "left_semi").count() === 0L)
  }

  test("q207 overlap card reconciles with direct flag counting on the " +
      "gate table, and every row satisfies the set identities") {
    val rows = SparkEntry.queries("q207_dedup_overlap")(spark, dir)
      .collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (na, nb, nboth, nunion, j) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(nboth <= math.min(na, nb), r.toString)
      assert(nunion === na + nb - nboth, r.toString)
      assert(j >= 0.0 && j <= 1.0, r.toString)
      if (nunion > 0)
        assert(math.abs(j - math.rint(1e6 * nboth.toDouble / nunion) / 1e6)
          < 1e-9, r.toString)
    }
    // direct recount of one pair from the cached gate table
    val gates = graft.queries.PipelineQueries
      .stage(spark, dir, "nightly_gates")(
        sys.error("nightly_gates must be cached by the card run"))
      .filter(col("g_gopher"))
    val nf = gates.filter(!col("g_neardup")).count()
    val ns = gates.filter(!col("g_semdedup")).count()
    val nfs = gates.filter(!col("g_neardup") && !col("g_semdedup")).count()
    val fs = rows.find(r => r.getString(0) == "fingerprint" &&
      r.getString(1) == "semantic").get
    assert(fs.getLong(2) === nf && fs.getLong(3) === ns &&
      fs.getLong(4) === nfs)
  }

  test("q238 rejection ledger reconciles with the q196 funnel row for " +
      "row: survivors past each gate equal the funnel's stage counts " +
      "(docs AND tokens), and admitted matches the balance stage") {
    val ledger = SparkEntry.queries("q238_rejection_ledger")(spark, dir)
      .collect()
    val f = funnel
    val stages = Seq("1_gopher", "2_exact_dedup", "3_near_dup",
      "4_decontaminate", "5_balance")
    assert(ledger.length.toLong === f("0_raw")._1)
    assert(ledger.map(_.getAs[Long]("n_tok")).sum === f("0_raw")._2)
    stages.zipWithIndex.foreach { case (stage, i) =>
      // a doc survives THROUGH gate i iff its first failure is a later
      // gate (or it is admitted)
      val laterOrAdmitted = stages.drop(i + 1).toSet + "admitted"
      val surv = ledger.filter(r =>
        laterOrAdmitted(r.getAs[String]("first_fail")))
      assert(surv.length.toLong === f(stage)._1, stage)
      assert(surv.map(_.getAs[Long]("n_tok")).sum === f(stage)._2, stage)
    }
    val admitted = ledger.filter(_.getAs[Boolean]("admitted"))
    assert(admitted.length.toLong === f("5_balance")._1)
    assert(admitted.forall(_.getAs[String]("first_fail") == "admitted"))
    // the bitmap and the first-failure label agree on every row
    ledger.foreach { r =>
      val bits = Seq(r.getAs[Boolean]("g_gopher"),
        r.getAs[Boolean]("g_digest"), r.getAs[Boolean]("g_neardup"),
        r.getAs[Boolean]("g_decon"), r.getAs[Boolean]("g_balance"))
      val expected = bits.indexWhere(!_) match {
        case -1 => "admitted"
        case i => stages(i)
      }
      assert(r.getAs[String]("first_fail") === expected,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
