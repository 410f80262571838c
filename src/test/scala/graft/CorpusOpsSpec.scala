package graft

import org.apache.spark.sql.functions._

import graft.functions.Urls
import graft.operators.{NearDup, Sampling, Similarity}

/** Wave-5b operator semantics: the per-group cap (bounded, deterministic,
  * WindowGroupLimit-planned), SemDeDup (keep-first pruning in embedding
  * space, verified against brute force), and URL canonicalization rules. */
class CorpusOpsSpec extends SparkSpec {

  // ---- perGroupCap ----

  private def docs = {
    import sqlImplicits._
    (0L until 200L).map(i => (i, s"src${i % 7}")).toDF("id", "grp")
  }

  test("perGroupCap keeps at most k rows per group, ranked deterministically") {
    val capped = Sampling.perGroupCap(docs, col("grp"), 5,
      Seq(NearDup.md5Hash60(col("id").cast("string")), col("id")))
    val sizes = capped.groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 5L) && sizes.length == 7)
    val again = Sampling.perGroupCap(docs.repartition(13), col("grp"), 5,
      Seq(NearDup.md5Hash60(col("id").cast("string")), col("id")))
    assert(capped.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("perGroupCap hash order is a sample, not an id-order prefix") {
    val kept = Sampling.perGroupCap(docs, col("grp"), 5,
      Seq(NearDup.md5Hash60(col("id").cast("string")), col("id")))
      .select("id").collect().map(_.getLong(0)).toSet
    // an id-order prefix would keep exactly 0..34; the hash order must not
    assert(kept != (0L until 35L).toSet)
  }

  test("perGroupCap plans the rank filter as WindowGroupLimit") {
    val plan = Sampling.perGroupCap(docs, col("grp"), 5, Seq(col("id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  // ---- semDedup ----

  test("semDedup flags exactly the vectors with a lower-id tau-neighbor in their cluster") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val tau = 0.3
    val got = Similarity.semDedup(emb, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // brute-force reference: same centroid assignment, all-pairs check
    val assigned = got.map { case (id, cl, _) => id -> cl }.toMap
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { case (id, cl, isDup) =>
      val expected = assigned.exists { case (oid, ocl) =>
        ocl == cl && oid < id && cos(vecs(oid), vecs(id)) >= tau
      }
      assert(isDup == expected, s"vec $id cluster $cl")
    }
    // sanity: the flag is a real partition of the corpus at this tau
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  test("semDedup min-id vector of every cluster always survives") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val minIds = Similarity.semDedup(emb, 0.3)
      .groupBy("cluster").agg(min("vec_id").as("m"))
      .collect().map(_.getLong(1)).toSet
    val dupIds = Similarity.semDedup(emb, 0.3)
      .filter(col("is_dup")).collect().map(_.getLong(0)).toSet
    assert(minIds.intersect(dupIds).isEmpty)
  }

  // ---- URL canonicalization ----

  private def canon(url: String): Option[String] = {
    import sqlImplicits._
    Seq(url).toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0))).head
  }

  test("canonicalize lowercases scheme and host but not the path") {
    assert(canon("HTTPS://WWW.Foo.COM/Path/X") ==
      Some("https://www.foo.com/Path/X"))
  }

  test("canonicalize strips default ports per scheme only") {
    assert(canon("https://a.com:443/x") == Some("https://a.com/x"))
    assert(canon("http://a.com:80/x") == Some("http://a.com/x"))
    assert(canon("http://a.com:443/x") == Some("http://a.com:443/x"))
    assert(canon("https://a.com:8443/x") == Some("https://a.com:8443/x"))
  }

  test("canonicalize drops fragments and utm params and sorts the rest") {
    assert(canon("https://a.com/p?utm_source=f&b=2&a=1#frag") ==
      Some("https://a.com/p?a=1&b=2"))
    assert(canon("https://a.com/p?utm_campaign=x") == Some("https://a.com/p"))
  }

  test("canonicalize defaults an empty path to / and rejects non-URLs") {
    assert(canon("https://a.com") == Some("https://a.com/"))
    assert(canon("not a url") == None)
  }

  // ---- wave-2 graded-query semantics ----

  test("gopher battery: every rule fires both ways on the planted fixture") {
    val out = SparkEntry.queries("q97_gopher_rules")(spark,
      "/root/testdata/sf0.001")
    val flags = Seq("f_nwords", "f_wlen", "f_stop", "f_sym", "f_rep", "accept")
    val counts = out.select(flags.map(f =>
      sum(when(col(f), 1L).otherwise(0L)).as(f)): _*).collect().head
    val n = out.count()
    flags.zipWithIndex.foreach { case (f, i) =>
      val c = counts.getLong(i)
      assert(c > 0 && c < n, s"$f fired $c/$n — not discriminative")
    }
    // accept is exactly the conjunction
    val bad = out.filter(col("accept") =!= (col("f_nwords") && col("f_wlen") &&
      col("f_stop") && col("f_sym") && col("f_rep"))).count()
    assert(bad == 0L)
  }

  test("token budget keeps the maximal best-first prefix per source") {
    import sqlImplicits._
    val out = SparkEntry.queries("q99_token_budget")(spark,
      "/root/testdata/sf0.001")
    // every kept row was admitted while the budget before it had room
    assert(out.filter(col("cum_tok") - col("n_tok") >= 2000L).count() == 0L)
    // and nothing admissible was skipped: per source, kept count equals
    // the prefix length of the score-ordered ranking that fits
    val full = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.TextAnalysis.qualityScore(col("text")).as("score"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("n_tok"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2),
        r.getLong(3)))
    val expected = full.groupBy(_._1).map { case (src, rows) =>
      val ordered = rows.sortBy(r => (-r._3, r._2))
      var cum = 0L
      src -> ordered.takeWhile { r => val ok = cum < 2000L; cum += r._4; ok }
        .length
    }
    val got = out.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.foreach { case (src, n) =>
      assert(got.getOrElse(src, 0L) == n.toLong, s"source $src")
    }
  }

  test("collocation lift matches the hand computation") {
    import sqlImplicits._
    import graft.functions.TextAnalysis
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"))
      .toDF("doc_id", "text")
    val terms = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(lower(col("text")))))
        .as("term"))
    val tf = terms.groupBy("term").agg(count(lit(1)).as("n_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tf == Map("x" -> 3L, "y" -> 2L, "z" -> 1L))
    val pairs = terms.as("a").join(terms.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term"), col("b.term")).agg(count(lit(1)).as("n_ab"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(pairs == Map(("x", "y") -> 2L, ("x", "z") -> 1L))
    // lift(x,y) = 2*3/(3*2) = 1.0 ; lift(x,z) = 1*3/(3*1) = 1.0
  }

  test("canonicalize is idempotent") {
    val messy = Seq(
      "HTTPS://WWW.Foo.COM:443/Path?utm_x=1&b=2&a=1#f",
      "http://bar.org:80/?z=9&y=8",
      "https://plain.example/")
    messy.foreach { u =>
      val once = canon(u).get
      assert(canon(once) == Some(once), u)
    }
  }

  // ---- registeredDomain / domainBlockFilter ----

  private def regDom(u: String): Option[String] = {
    import sqlImplicits._
    Seq(u).toDF("u").select(Urls.registeredDomain(col("u")))
      .collect().headOption.flatMap(r => Option(r.getString(0)))
  }

  test("registeredDomain keeps the last two labels, drops port and case") {
    assert(regDom("https://WWW.News.Example.COM:8443/x?y=1") ==
      Some("example.com"))
    assert(regDom("http://example.org/") == Some("example.org"))
    assert(regDom("https://localhost/x") == Some("localhost"))
    assert(regDom("not a url") == None)
  }

  test("domainBlockFilter drops exactly the blocklisted domains via anti-join") {
    import sqlImplicits._
    val rows = Seq(
      (1L, "https://a.spam.com/x"), (2L, "https://b.ok.org/y"),
      (3L, "http://c.SPAM.com:80/z"), (4L, "https://ok.net/"))
      .toDF("id", "url")
    val kept = Urls.domainBlockFilter(rows, col("url"), Seq("Spam.com"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 4L))
    // plan audit: the blocklist must ride a broadcast hash anti-join, not
    // a per-pattern scan
    val plan = Urls.domainBlockFilter(rows, col("url"), Seq("spam.com"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("Broadcast"))
  }

  // ---- shardAndOrder ----

  test("shardAndOrder defines a total, repartition-invariant order") {
    import sqlImplicits._
    val df = (0L until 500L).map(i => (i, s"s${i % 3}")).toDF("id", "cat")
    val a = Sampling.shardAndOrder(df, col("id").cast("string"), 8, col("id"))
      .orderBy("id").collect().toSeq
    val b = Sampling.shardAndOrder(df.repartition(13),
      col("id").cast("string"), 8, col("id")).orderBy("id").collect().toSeq
    assert(a == b)
    // (shard, seq) is a bijection onto rows: every shard numbers 1..n_s
    val byShard = a.groupBy(_.getLong(2))
    byShard.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted == (1L to rows.size).toSeq)
    }
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
  }

  test("shardAndOrder rejects colliding column names") {
    import sqlImplicits._
    val df = Seq((1L, 2L)).toDF("id", "seq")
    assertThrows[IllegalArgumentException] {
      Sampling.shardAndOrder(df, col("id").cast("string"), 4, col("id"))
    }
  }

  test("allocateLargestRemainder: seats sum EXACTLY to the target, " +
      "every allocation is within one of its exact quota, and a " +
      "hand-solved case lands the leftover seats on the largest " +
      "remainders") {
    import sqlImplicits._
    // total 100, target 10: quotas 1.7/3.3/5.0 → bases 1/3/5, one
    // leftover seat → largest remainder (a: .7) takes it
    val counts = Seq(("a", 17L), ("b", 33L), ("c", 50L)).toDF("src", "n")
    val got = Sampling.allocateLargestRemainder(counts, "src", "n",
        num = 1L, den = 10L)
      .collect().map(r => r.getAs[String]("src") ->
        r.getAs[Long]("alloc")).toMap
    assert(got === Map("a" -> 2L, "b" -> 3L, "c" -> 5L))
    // property sweep: exact seat totals and ±1-of-quota at several
    // fractions over an uneven domain
    val dom = Seq(("a", 7L), ("b", 13L), ("c", 101L), ("d", 1L),
      ("e", 78L)).toDF("src", "n")
    val tot = 7L + 13L + 101L + 1L + 78L
    Seq((1L, 10L), (1L, 3L), (9L, 10L), (1L, 1L)).foreach {
      case (nu, de) =>
        val rows = Sampling.allocateLargestRemainder(dom, "src", "n",
          nu, de).collect()
        val target = tot * nu / de
        assert(rows.map(_.getAs[Long]("alloc")).sum === target,
          s"fraction $nu/$de must seat exactly $target")
        rows.foreach { r =>
          val q = target * r.getAs[Long]("n") // exact quota numerator
          val base = q / tot
          val a = r.getAs[Long]("alloc")
          assert(a === base || a === base + 1L, r.toString)
          assert(a <= r.getAs[Long]("n"),
            "never allocate beyond the domain's own rows: " + r)
        }
    }
  }

  test("drawAllocated: draws exactly alloc members per domain, is " +
      "repartition-invariant, and another domain's growth never " +
      "changes a domain's drawn set") {
    import sqlImplicits._
    val rows = (1 to 60).map(i => (i.toLong, if (i % 3 == 0) "x" else "y"))
      .toDF("id", "src")
    val counts = rows.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val alloc = Sampling.allocateLargestRemainder(counts, "src", "n",
      1L, 4L)
    def drawSet(df: org.apache.spark.sql.DataFrame) =
      Sampling.drawAllocated(df, "src", col("id"), alloc)
        .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("id")))
        .toSet
    val got = drawSet(rows)
    val byAlloc = alloc.collect().map(r => r.getAs[String]("src") ->
      r.getAs[Long]("alloc")).toMap
    assert(got.count(_._1 == "x").toLong === byAlloc("x"))
    assert(got.count(_._1 == "y").toLong === byAlloc("y"))
    assert(drawSet(rows.repartition(7)) === got)
    // growing y (appends) leaves x's drawn members untouched
    val grown = rows.unionByName(
      (100 to 120).map(i => (i.toLong, "y")).toDF("id", "src"))
    val gotX = Sampling.drawAllocated(grown, "src", col("id"), alloc)
      .filter(col("src") === "x")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(gotX === got.filter(_._1 == "x").map(_._2))
  }

  // ---- q273 langid-misrouting impact card ----

  test("q273 misrouting card reconciles row-for-row with q268's " +
      "confusion matrix, conserves the corpus token mass, and its " +
      "per-pred contamination equals the sum of that pred's misrouted " +
      "shares") {
    val dir = "/root/testdata/sf0.01"
    val card = SparkEntry.queries("q273_langid_misrouting")(spark, dir)
      .collect()
    val conf = SparkEntry.queries("q268_langid_confusion")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("lang_pred")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(card.length === conf.size)
    card.foreach { r =>
      val k = (r.getAs[String]("lang"), r.getAs[String]("lang_pred"))
      assert(conf(k) === r.getAs[Long]("n_docs"),
        s"doc count drifted from q268 at $k")
    }
    // token-mass conservation: the matrix partitions the corpus
    val total = Tables.load(spark, dir, "documents")
      .agg(sum(graft.functions.TextAnalysis.tokenCount(col("text"))))
      .collect().head.getLong(0)
    assert(card.map(_.getAs[Long]("n_tokens")).sum === total)
    // per-pred identities: cell shares sum to 1, contamination is the
    // misrouted share sum, and pred_tokens is the partition total
    card.groupBy(_.getAs[String]("lang_pred")).foreach { case (_, cells) =>
      val pt = cells.head.getAs[Long]("pred_tokens")
      assert(cells.forall(_.getAs[Long]("pred_tokens") === pt))
      assert(cells.map(_.getAs[Long]("n_tokens")).sum === pt)
      val contam = cells.filter(_.getAs[Boolean]("misrouted"))
        .map(_.getAs[Long]("n_tokens")).sum
      val want = BigDecimal(contam.toDouble / pt.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cells.forall(_.getAs[Double]("pred_contam_frac") === want))
    }
  }

  test("q275 priority-impact ledger: doc-count conservation on the " +
      "~total row, per-source survivor counts reconcile with q274's " +
      "group card, and held docs partition the label table") {
    val dir = "/root/testdata/sf0.01"
    val card = SparkEntry.queries("q275_priority_impact")(spark, dir)
      .collect()
    val tot = card.find(_.getAs[String]("source") == "~total").get
    val srcs = card.filter(_.getAs[String]("source") != "~total")
    // both rules keep exactly one doc per group
    assert(tot.getAs[Long]("delta_docs") === 0L)
    assert(tot.getAs[Long]("kept_first") === tot.getAs[Long]("kept_prio"))
    // column sums reconcile into the total row
    Seq("docs_held", "kept_first", "tokens_first", "kept_prio",
      "tokens_prio").foreach { c =>
      assert(srcs.map(_.getAs[Long](c)).sum === tot.getAs[Long](c), c)
    }
    // reconcile against q274: survivors per source under each rule
    val groups = SparkEntry.queries("q274_priority_keep")(spark, dir)
      .collect()
    assert(tot.getAs[Long]("kept_first") === groups.length)
    val firstBySrc = groups.groupBy(_.getAs[String]("src_first"))
      .map { case (k, g) => k -> g.length.toLong }
    val prioBySrc = groups.groupBy(_.getAs[String]("src_prio"))
      .map { case (k, g) => k -> g.length.toLong }
    srcs.foreach { r =>
      val s0 = r.getAs[String]("source")
      assert(r.getAs[Long]("kept_first") === firstBySrc.getOrElse(s0, 0L))
      assert(r.getAs[Long]("kept_prio") === prioBySrc.getOrElse(s0, 0L))
    }
    assert(tot.getAs[Long]("docs_held") ===
      groups.map(_.getAs[Long]("n_docs")).sum)
  }

  test("q277 misrouting-distorted allocation: token mass is conserved " +
      "between the true and routed tables, both waterfills spend the " +
      "same budget to within integer-division remainders, and the " +
      "router's error visibly moves allocation") {
    val dir = "/root/testdata/sf0.01"
    val card = SparkEntry.queries("q277_misrouting_allocation")(
      spark, dir).collect()
    val tTrue = card.map(_.getAs[Long]("true_tokens")).sum
    val tPred = card.map(_.getAs[Long]("pred_tokens")).sum
    assert(tTrue === tPred, "misrouting must conserve total mass")
    val k = card.length.toLong
    val b = tTrue * 9 / 10
    val aT = card.map(_.getAs[Long]("alloc_true")).sum
    val aP = card.map(_.getAs[Long]("alloc_pred")).sum
    assert(aT <= b && b - aT < k, s"true waterfill must spend b: $aT/$b")
    assert(aP <= b && b - aP < k, s"pred waterfill must spend b: $aP/$b")
    // deltas are internally consistent and the distortion is real
    card.foreach { r =>
      assert(r.getAs[Long]("delta_tokens") ===
        r.getAs[Long]("pred_tokens") - r.getAs[Long]("true_tokens"))
      assert(r.getAs[Long]("delta_alloc") ===
        r.getAs[Long]("alloc_pred") - r.getAs[Long]("alloc_true"))
    }
    assert(card.exists(_.getAs[Long]("delta_alloc") !== 0L),
      "the q268-measured router error should move allocation")
  }
}
