package graft

/** The BPE anneal chain (q279/q280 — the round-17 judge's #2: the
  * admission-bar decision re-metered in the unit the loader actually
  * bills) reconciled against the rest of the budget family:
  *
  *  - threshold 0 of the BPE price curve IS q271's phase-2 anneal
  *    (same gopher pool, same BPE remainder budget, same md5 rank —
  *    the manifest's 2_anneal rows and the curve's t=0 row must agree
  *    on doc-instance count and BPE token mass; at cap 1 instances ==
  *    docs),
  *  - the decile CUT is unit-free (qdec orders by (q4, doc_id), no
  *    weights), so the ws and BPE curves see the same pool doc counts
  *    at every threshold while their token masses differ,
  *  - the monotone dials hold in the BPE unit exactly as in ws
  *    (pool shrinks, admitted-quality floor never falls, cap-1 realized
  *    mass within one epoch of its pool, one fixed budget on every row),
  *  - the tuned card picks the highest still-filling bar of ITS OWN
  *    curve, still fills, and never raises the weighted mean exposure.
  */
class AnnealBpeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val curveB =
    SparkEntry.queries("q279_anneal_quality_bar_bpe")(spark, dir)
      .collect().sortBy(_.getAs[Long]("threshold"))
  private lazy val curveW =
    SparkEntry.queries("q272_anneal_quality_bar")(spark, dir)
      .collect().sortBy(_.getAs[Long]("threshold"))

  test("threshold 0 reconciles with q271's phase-2 manifest: same " +
      "doc-instance count and the same BPE token mass") {
    val sched = SparkEntry.queries("q271_bpe_schedule")(spark, dir)
      .collect().filter(_.getAs[String]("phase") == "2_anneal")
    val t0 = curveB.head
    assert(t0.getAs[Long]("threshold") === 0L)
    assert(t0.getAs[Long]("ann_docs") ===
      sched.map(_.getAs[Long]("n_docs")).sum,
      "cap-1 anneal: manifest instances == realized docs")
    assert(t0.getAs[Long]("ann_tokens") ===
      sched.map(_.getAs[Long]("n_tokens_bpe")).sum,
      "the curve's t=0 mass IS the manifest's anneal BPE mass")
  }

  test("the decile cut is unit-free: ws and BPE curves agree on pool " +
      "doc counts at every threshold while the token masses differ") {
    assert(curveB.map(_.getAs[Long]("threshold")).toSeq === (0L to 9L))
    curveW.zip(curveB).foreach { case (w, b) =>
      assert(w.getAs[Long]("pool_docs") === b.getAs[Long]("pool_docs"),
        s"threshold ${w.getAs[Long]("threshold")}")
    }
    // ~5x fertility (q265): the BPE pool mass is strictly larger
    assert(curveB.head.getAs[Long]("pool_tokens") >
      curveW.head.getAs[Long]("pool_tokens"))
  }

  test("monotone dials hold in the BPE unit: pool shrinks, the quality " +
      "floor never falls, cap-1 mass within one pool epoch, one fixed " +
      "budget") {
    val t0 = curveB.head
    curveB.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("pool_docs") <= a.getAs[Long]("pool_docs"))
        assert(b.getAs[Long]("pool_tokens") <= a.getAs[Long]("pool_tokens"))
        assert(b.getAs[Long]("min_q") >= a.getAs[Long]("min_q"))
      case _ => ()
    }
    assert(curveB.last.getAs[Long]("pool_docs") <
      t0.getAs[Long]("pool_docs"))
    curveB.foreach { r =>
      assert(r.getAs[Long]("ann_tokens") <= r.getAs[Long]("pool_tokens"))
      assert(r.getAs[Long]("budget") === t0.getAs[Long]("budget"))
    }
  }

  test("q280 tuned BPE anneal: baseline at threshold 0, the chosen bar " +
      "is the highest still-filling one on the BPE curve, the tuned " +
      "anneal fills, and the weighted mean exposure does not rise") {
    val card = SparkEntry.queries("q280_tuned_anneal_bpe")(spark, dir)
      .collect()
    val (base, tuned) = card.partition(
      _.getAs[String]("variant") == "a_base")
    assert(base.nonEmpty && tuned.nonEmpty)
    assert(base.forall(_.getAs[Long]("threshold") === 0L))
    val budget = curveB.head.getAs[Long]("budget")
    val want = curveB.filter(_.getAs[Long]("ann_tokens") >= budget)
      .map(_.getAs[Long]("threshold")).max
    assert(tuned.forall(_.getAs[Long]("threshold") === want))
    assert(tuned.map(_.getAs[Long]("anneal_tokens")).sum >= budget)
    def wexp(rs: Array[org.apache.spark.sql.Row]) =
      (rs.map(r => r.getAs[Long]("exposure") *
        r.getAs[Long]("anneal_tokens")).sum.toDouble,
       rs.map(_.getAs[Long]("anneal_tokens")).sum.toDouble)
    val (eb, mb) = wexp(base)
    val (et, mt) = wexp(tuned)
    assert(et * mb <= eb * mt,
      "tuning must not raise the weighted mean exposure")
  }
}
