package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-mixture resampling — the "domain weights" step of training-data
  * assembly: given a target share per category (language, source, domain),
  * downsample every category deterministically so the output matches the
  * target mixture as closely as downsampling-only allows.
  *
  * The output size is maximal: M = min over targeted categories of
  * n_cat / t_cat, and each category keeps p_cat = t_cat × M / n_cat of its
  * rows (the binding category keeps 100%). Membership is the same
  * md5-of-key bucket as [[Sampling]] — a pure function of the row key, so
  * the resample is stable across runs, engines, partitionings and appends,
  * and (given the same key universe) a SUPERSET-consistent shrink: raising
  * a category's target only adds rows, never swaps them.
  *
  * Scale shape: two passes over the corpus — an aggregate-first stats pass
  * producing ONE tiny row per category (map-side partial counts, one
  * shuffle), and the filter pass where those per-category probabilities
  * broadcast-join back onto the rows (no corpus shuffle). The global
  * scale M is a single-partition window over the per-category aggregate —
  * a handful of rows, never the corpus (same shape as Drift.categoryDrift).
  * Rows whose category has no target are dropped (a mixture that omits a
  * category means zero share).
  */
object Mixture {

  private val Two60 = 1152921504606846976.0 // 2^60 as an exact double

  /** @param df          corpus
    * @param categoryCol category column name (string-typed)
    * @param key         stable row identity for the deterministic bucket
    * @param targets     target share per category value; must be positive
    *                    (omit a category to drop it entirely)
    */
  def resampleToMixture(df: DataFrame, categoryCol: String, key: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty with positive shares")
    val reserved = Set("__t", "__n", "__m", "__p")
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty, s"column(s) ${clash.mkString(", ")} collide with " +
      "Mixture internals; rename before resampling")

    // target share as a column; NULL for untargeted categories → dropped
    val t = targets.foldLeft(lit(null).cast("double")) {
      case (acc, (k, v)) => when(col(categoryCol) === k, lit(v)).otherwise(acc)
    }
    val counts = df.withColumn("__t", t).filter(col("__t").isNotNull)
      .groupBy(col(categoryCol), col("__t")).agg(count(lit(1)).as("__n"))
    // the max output size M and the keep probabilities, derived from the
    // single aggregated stats table (window over a handful of rows)
    val probs = counts
      .withColumn("__m", min(col("__n").cast("double") / col("__t"))
        .over(Window.partitionBy()))
      .select(col(categoryCol),
        ((col("__t") * col("__m")) / col("__n").cast("double")).as("__p"))
    df.join(broadcast(probs), Seq(categoryCol))
      .filter(NearDup.md5Hash60(key).cast("double") < col("__p") * lit(Two60))
      .drop("__p")
  }

  /** [[resampleToMixture]] with DATA-DRIVEN targets — the composition
    * point for semantic (cluster-level) balancing, where the category
    * shares come out of the corpus itself ([[temperatureTargets]] over
    * a quantizer assignment) instead of a hand-written map: identical
    * keep-probability math (M = min(n/t), p = t·M/n, md5-bucket
    * membership — row-level reproducible cross-engine), with the target
    * table joined in rather than folded into a literal CASE. Categories
    * absent from `targets` are dropped, exactly like an omitted map key.
    *
    * Scale shape: the targets table is category-sized (broadcast), the
    * per-category stats are one aggregate pass, and membership is a
    * row-local hash test — the corpus is never shuffled.
    *
    * @param targets  (categoryCol, shareCol) rows — ONE row per
    *                 category (a duplicated category would double-join
    *                 its rows and silently inflate the sample; the
    *                 join below dedups defensively, keeping the MAX
    *                 share so the mistake saturates instead of
    *                 corrupting); shares must be > 0 */
  def resampleToTargets(df: DataFrame, categoryCol: String, key: Column,
      targets: DataFrame, shareCol: String = "share_t"): DataFrame = {
    val reserved = Set("__t", "__n", "__m", "__p")
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty, s"column(s) ${clash.mkString(", ")} collide with " +
      "Mixture internals; rename before resampling")
    val tg = targets.select(col(categoryCol),
        col(shareCol).cast("double").as("__t"))
      .groupBy(col(categoryCol)).agg(max(col("__t")).as("__t"))
    val counts = df.join(broadcast(tg), Seq(categoryCol))
      .groupBy(col(categoryCol), col("__t")).agg(count(lit(1)).as("__n"))
    val probs = counts
      .withColumn("__m", min(col("__n").cast("double") / col("__t"))
        .over(Window.partitionBy()))
      .select(col(categoryCol),
        ((col("__t") * col("__m")) / col("__n").cast("double")).as("__p"))
    df.join(broadcast(probs), Seq(categoryCol))
      .filter(NearDup.md5Hash60(key).cast("double") < col("__p") * lit(Two60))
      .drop("__p")
  }

  /** Temperature-scaled mixture targets (α = 0.5): the multilingual /
    * multi-domain rebalancing rule (share ∝ n^α) that upweights small
    * categories without letting giants dominate — the step that produces
    * the `targets` map [[resampleToMixture]] consumes.
    *
    * α is FIXED at 0.5 because sqrt is one of the IEEE-754 correctly-
    * rounded operations: both engines compute the identical double for
    * every count, so the only cross-engine freedom left is the addition
    * order of the normalizer — a sum over a handful of category rows,
    * absorbed by the 6-decimal round (the same contract every float
    * aggregate in this library grades under). A general α would route
    * through `pow`, which libms round differently in the last ulp.
    *
    * Scale shape: one aggregate pass over the corpus (map-side partial
    * counts, one shuffle producing ONE row per category), then a single-
    * partition window over that tiny aggregate — the corpus itself is
    * never reshuffled.
    *
    * @return (category, n_docs, share_raw, share_t) — raw and temperature-
    *         scaled shares, rounded to 6
    */
  /** The temperature-α TUNING CURVE — the dial behind
    * [[temperatureTargets]] (which fixes α = 0.5): per candidate α, the
    * flattened target share each category would get. All points from
    * ONE category-count aggregate (k rows); the per-α weight and
    * normalization are row-local over that tiny table. α = 1 reproduces
    * the natural shares exactly, α = 0 is uniform 1/k, and shares
    * flatten monotonically as α falls (MixtureSpec pins all three).
    * The graded α ∈ {0, 0.5, 1} use EXACT expressions (1, sqrt, n) so
    * both engines round identically; other α fall back to pow (whose
    * last-ulp is not cross-engine guaranteed — fine for exploration,
    * not for grading).
    * @return (alpha, category, n_docs, share_raw, share_t) */
  def temperatureCurve(df: DataFrame, categoryCol: String,
      alphas: Seq[Double]): DataFrame = {
    require(alphas.nonEmpty, "need at least one alpha")
    val counts = df.groupBy(col(categoryCol))
      .agg(count(lit(1)).as("n_docs"))
    val all = Window.partitionBy()
    def w(a: Double): Column =
      if (a == 0.0) lit(1.0)
      else if (a == 0.5) sqrt(col("n_docs").cast("double"))
      else if (a == 1.0) col("n_docs").cast("double")
      else pow(col("n_docs").cast("double"), lit(a))
    alphas.distinct.sorted.map { a =>
      counts.withColumn("__w", w(a))
        .select(lit(a).as("alpha"), col(categoryCol),
          col("n_docs"),
          round(col("n_docs").cast("double") /
            sum(col("n_docs")).over(all).cast("double"), 6).as("share_raw"),
          round(col("__w") / sum(col("__w")).over(all), 6).as("share_t"))
    }.reduce(_ unionByName _)
  }

  def temperatureTargets(df: DataFrame, categoryCol: String): DataFrame = {
    val counts = df.groupBy(col(categoryCol))
      .agg(count(lit(1)).as("n_docs"))
    val all = Window.partitionBy()
    counts
      .withColumn("__w", sqrt(col("n_docs").cast("double")))
      .withColumn("share_raw", round(
        col("n_docs").cast("double") /
          sum(col("n_docs")).over(all).cast("double"), 6))
      .withColumn("share_t", round(col("__w") / sum(col("__w")).over(all), 6))
      .drop("__w")
  }

  /** UniMax token-budget allocation (Chung et al., ICLR 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): split a total token budget as EVENLY
    * as possible across domains, except no domain may be read more
    * than `maxEpochs` times — the budget a capped domain cannot absorb
    * waterfills to the rest. The closed-form waterfill is exact
    * integer arithmetic end to end: with domains ranked by capacity
    * cap = n_tok·maxEpochs ascending (id tiebreak), domain r is
    * SATURATED iff cap_r·(k−r+1) + S_{r−1} ≤ B (S = prefix capacity
    * sum) — the left side is nondecreasing in r, so the saturated set
    * is a well-defined prefix and every row can evaluate its own
    * predicate independently; the rest share
    * floor((B − S_sat)/(k − m)) each, with the ≤ k−m−1 remainder
    * tokens reported, not silently spread (spreading would need an
    * arbitrary order).
    *
    * Budget is SF-RELATIVE: B = (Σ n_tok · budgetNum) div budgetDen —
    * an exact integer derived from the data, so the same query is
    * non-degenerate at every scale factor.
    *
    * Scale shape: ONE aggregate pass produces the k-row (domain,
    * n_tok) table (the caller usually has it as a stage already);
    * every window here runs over those k rows — the mixture-family
    * idiom. The corpus itself is never re-read or shuffled.
    *
    * CONTRACT: `counts` must be a DOMAIN-sized table (one row per
    * domain — dozens to a few thousand rows, the output of a grouped
    * aggregate), because the rank/prefix-sum windows below are global
    * and unpartitioned: every row funnels through one task, which is
    * exactly right for a k-row mixture table and exactly wrong for a
    * corpus. Feeding a row-per-document table here is a misuse, not a
    * supported slow path. A ZERO-capacity domain (n_tok = 0 — e.g. a
    * source whose documents are all empty) is carried through with
    * alloc = 0 / epochs_used = 0 rather than aborting the whole
    * allocation: cap = 0 ranks first and satisfies the saturation
    * predicate trivially, so the waterfill is untouched — only the
    * epochs_used division needs the guard. Negative n_tok is a
    * corrupted input and still fails fast.
    *
    * @param counts one row per domain: domainCol, tokCol (unique
    *               tokens available, must be ≥ 0)
    * @return (domain, n_tok, cap, saturated, alloc, epochs_used 4-dp,
    *         leftover — the global undistributed remainder, constant
    *         across rows)
    */
  def unimaxAllocation(counts: DataFrame, domainCol: String,
      tokCol: String, maxEpochs: Long, budgetNum: Long,
      budgetDen: Long): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0,
      "the budget fraction must be positive")
    waterfill(counts.select(col(domainCol), col(tokCol).as("n_tok")),
      domainCol, maxEpochs,
      expr(s"(sum(n_tok) over () * $budgetNum) div $budgetDen"))
  }

  /** [[unimaxAllocation]] with the budget supplied as an EXPLICIT exact
    * integer — a one-row, one-BIGINT-column DataFrame — instead of a
    * fraction of the domain table's own total. This is the form a
    * multi-phase schedule needs: an anneal phase's budget is a fraction
    * of the WHOLE run's tokens, not of the high-quality pool it
    * allocates over, so the caller derives the budget from one table
    * and waterfills another. The budget row is broadcast onto the
    * k-row domain table (domain-sized work, the mixture-family idiom). */
  def unimaxAllocationBudget(counts: DataFrame, domainCol: String,
      tokCol: String, maxEpochs: Long, budget: DataFrame): DataFrame = {
    // enforce the one-row contract: an empty budget would silently
    // return an empty allocation and a multi-row budget would duplicate
    // every domain row through the crossJoin — both fail fast instead
    val b = broadcast(
      budget.select(budget.columns.head).toDF("__b")
        .agg(count(lit(1)).as("__c"), min(col("__b").cast("long")).as("__b"))
        .select(when(col("__c") === 1L, col("__b")).otherwise(
          raise_error(concat(
            lit("unimaxAllocationBudget: budget must be exactly one row, got "),
            col("__c").cast("string")))).as("__b")))
    waterfill(counts.select(col(domainCol), col(tokCol).as("n_tok"))
        .crossJoin(b),
      domainCol, maxEpochs, col("__b"))
  }

  /** CONFUSION-CORRECTED grouped masses — de-biasing router-filed
    * masses through a labeled calibration matrix before a waterfill
    * plans on them: a language-ID (or any classifier) router files
    * each document under its PREDICTED label, so the per-label token
    * masses a mixture allocates over are distorted by exactly the
    * classifier's confusion (the q273/q277 measurement: a low-recall
    * router collapses every minority label's mass, and the waterfill
    * zeroes their allocations). Given the calibration matrix's
    * (true, pred) cell masses, each routed label's mass is
    * re-attributed to true labels by the column-posterior
    * P(true | pred) — in exact integer arithmetic, term =
    * (routed · cell) div colsum per (true, pred) pair, summed per true
    * label — so a PERFECT router (diagonal matrix) returns the routed
    * table unchanged, and total mass is conserved up to one integer
    * floor per matrix column (`LangidCorrectionSpec` pins both, plus
    * the fixed point: calibrated on the routed corpus itself, the
    * correction recovers the true masses exactly, because each
    * column's routed mass IS its calibration column sum).
    *
    * Scale shape: the matrix is ≤ |labels|² rows and the routed table
    * |labels| rows — both broadcast; the corpus-sized work lives in
    * whatever built them (one classify+sum pass). Output: (keyCol =
    * true label, massCol = corrected mass), one row per true label
    * with a positive-colsum predicted cell. */
  def confusionCorrectedMasses(routed: DataFrame, keyCol: String,
      massCol: String, matrix: DataFrame, trueCol: String,
      predCol: String, cellCol: String): DataFrame = {
    val cells = matrix.select(col(trueCol).as("__true"),
      col(predCol).as("__pred"), col(cellCol).as("__cell"))
    val colSums = cells.groupBy(col("__pred"))
      .agg(sum(col("__cell")).as("__colsum"))
    routed.select(col(keyCol).as("__pred"), col(massCol).as("__routed"))
      .join(broadcast(cells), Seq("__pred"))
      .join(broadcast(colSums.filter(col("__colsum") > 0)), Seq("__pred"))
      // the routed·cell product runs in decimal(38,0) (HUGEINT in the
      // oracle): two 100-TB-scale token masses multiply past Long range
      .select(col("__true"),
        expr("CAST((CAST(__routed AS DECIMAL(38,0)) * __cell) " +
          "div __colsum AS BIGINT)").as("__term"))
      .groupBy(col("__true"))
      .agg(sum(col("__term")).as(massCol))
      .select(col("__true").as(keyCol), col(massCol))
  }

  /** LEAVE-ONE-OUT mixture sensitivity — the "what if we lose a
    * source" decision card: for EVERY domain d, re-run the
    * [[unimaxAllocation]] waterfill over the surviving k−1 domains at
    * the SAME fixed budget (the point of the question — a licensing
    * takedown or a crawler ban removes the source, not the training
    * budget) and report each survivor's allocation shift. Saturated
    * survivors are data-constrained and absorb nothing; the freed
    * budget flows entirely to the unsaturated share — the card shows
    * exactly where, per hypothetical loss, before any source is
    * actually lost.
    *
    * Scale shape: the k² (dropped, source) pairs come from one
    * self-cross of the k-row DOMAIN table (the mixture-family
    * contract — never a corpus), every window below is PARTITIONED by
    * `dropped` (k groups of k−1 rows), and the closed-form saturation
    * algebra is [[unimaxAllocation]]'s, row for row. The budget is the
    * full table's ⌊T·num/den⌋, broadcast onto the pairs.
    *
    * @return one row per ordered (dropped, source) pair, source ≠
    *         dropped: (dropped, source, n_tok, alloc_base, alloc_drop,
    *         delta = alloc_drop − alloc_base) */
  def leaveOneOutSensitivity(counts: DataFrame, domainCol: String,
      tokCol: String, maxEpochs: Long, budgetNum: Long,
      budgetDen: Long): DataFrame = {
    require(maxEpochs > 0 && budgetNum > 0 && budgetDen > 0,
      "maxEpochs and the budget fraction must be positive")
    val dom = counts.select(col(domainCol).as("source"),
      col(tokCol).cast("long").as("n_tok"))
    val budget = broadcast(dom.agg(
      expr(s"(sum(n_tok) * $budgetNum) div $budgetDen").as("__b")))
    val base = unimaxAllocationBudget(dom, "source", "n_tok",
        maxEpochs, budget)
      .select(col("source"), col("alloc").as("alloc_base"))
    val pairs = dom.select(col("source").as("dropped"))
      .crossJoin(dom)
      .filter(col("dropped") =!= col("source"))
      .withColumn("cap", col("n_tok") * lit(maxEpochs))
    val wOrd = Window.partitionBy(col("dropped"))
      .orderBy(col("cap"), col("source"))
    val wAll = Window.partitionBy(col("dropped"))
    val solved = pairs.crossJoin(budget)
      .withColumn("_r", row_number().over(wOrd).cast("long"))
      .withColumn("_s", coalesce(sum(col("cap")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_k", count(lit(1)).over(wAll))
      .withColumn("saturated",
        col("cap") * (col("_k") - col("_r") + 1L) + col("_s") <= col("__b"))
      .withColumn("_m", sum(when(col("saturated"), 1L).otherwise(0L))
        .over(wAll))
      .withColumn("_ssat", coalesce(sum(when(col("saturated"), col("cap")))
        .over(wAll), lit(0L)))
      .withColumn("_share", when(col("_k") > col("_m"),
        expr("(__b - _ssat) div (_k - _m)")).otherwise(lit(0L)))
      .withColumn("alloc_drop",
        when(col("saturated"), col("cap")).otherwise(col("_share")))
    solved.join(broadcast(base), Seq("source"))
      .select(col("dropped"), col("source"), col("n_tok"),
        col("alloc_base"), col("alloc_drop"),
        (col("alloc_drop") - col("alloc_base")).as("delta"))
  }

  /** The shared closed-form waterfill (see [[unimaxAllocation]] for the
    * math and the domain-sized-table window contract); `bCol` evaluates
    * the exact-integer budget per row. */
  private def waterfill(counts0: DataFrame, domainCol: String,
      maxEpochs: Long, bCol: Column): DataFrame = {
    require(maxEpochs > 0, "maxEpochs must be positive")
    val base = counts0
      .withColumn("n_tok", when(col("n_tok") >= 0, col("n_tok"))
        .otherwise(raise_error(concat(
          lit("unimaxAllocation: negative n_tok for domain "),
          col(domainCol).cast("string")))))
      .withColumn("cap", col("n_tok") * lit(maxEpochs))
    val wOrd = Window.orderBy(col("cap"), col(domainCol))
    val all = Window.partitionBy()
    val ranked = base
      .withColumn("_r", row_number().over(wOrd).cast("long"))
      .withColumn("_s", coalesce(sum(col("cap")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_k", count(lit(1)).over(all))
      .withColumn("_b", bCol)
      .withColumn("saturated",
        col("cap") * (col("_k") - col("_r") + 1L) + col("_s") <= col("_b"))
    val solved = ranked
      .withColumn("_m", sum(when(col("saturated"), 1L).otherwise(0L))
        .over(all))
      .withColumn("_ssat", coalesce(sum(when(col("saturated"), col("cap")))
        .over(all), lit(0L)))
      .withColumn("_share", when(col("_k") > col("_m"),
        expr("(_b - _ssat) div (_k - _m)")).otherwise(lit(0L)))
      .withColumn("alloc",
        when(col("saturated"), col("cap")).otherwise(col("_share")))
    solved.select(col(domainCol), col("n_tok"), col("cap"),
      col("saturated"), col("alloc"),
      when(col("n_tok") > 0,
        round(col("alloc").cast("double") / col("n_tok").cast("double"), 4))
        .otherwise(lit(0.0)).as("epochs_used"),
      (col("_b") - col("_ssat") - col("_share") * (col("_k") - col("_m")))
        .as("leftover"))
  }

  /** Data-constrained scaling value card (Muennighoff et al., NeurIPS
    * 2023, "Scaling Data-Constrained Language Models"): the paper's
    * fitted law for what repeated epochs are WORTH — effective data
    *
    *   D' = U + U·R*·(1 − e^(−R_D / R*)),  R_D = alloc/U − 1
    *
    * with R* the fitted repetition half-life (≈ 15.4 in the paper):
    * the first epoch counts in full, repetitions decay exponentially,
    * and no amount of repetition is worth more than R* extra epochs.
    * An under-allocated domain (alloc ≤ U) is worth exactly its
    * allocation — it never even sees all its unique tokens.
    *
    * Exactness discipline (the q225 precedent): R_D is 4-dp-rounded
    * before the single exp — the only transcendental — and the
    * outputs re-round, so the cross-engine hazard is confined to one
    * libm ulp under a 4-dp window.
    *
    * @param alloc one row per domain: domainCol, tokCol (unique
    *              tokens U), allocCol (allocated budget)
    * @return (domain, n_tok, alloc, epochs 4-dp, eff_tokens 2-dp,
    *         value_frac 6-dp = eff/alloc)
    */
  def dataConstrainedValue(alloc: DataFrame, domainCol: String,
      tokCol: String, allocCol: String,
      rstar: Double = 15.39): DataFrame = {
    require(rstar > 0.0, "rstar must be positive")
    val u = col(tokCol).cast("double")
    val a = col(allocCol).cast("double")
    val rd = round(a / u - lit(1.0), 4)
    val eff = when(col(allocCol) <= col(tokCol), a)
      .otherwise(u * (lit(1.0) +
        lit(rstar) * (lit(1.0) - exp(-rd / lit(rstar)))))
    alloc.select(col(domainCol), col(tokCol), col(allocCol),
      // zero-capacity domains are legal upstream (unimaxAllocation
      // carries them as alloc = 0); 0/0 must read as 0 epochs, not NaN
      when(col(tokCol) > 0, round(a / u, 4)).otherwise(lit(0.0))
        .as("epochs"),
      round(eff, 2).as("eff_tokens"),
      when(col(allocCol) > 0,
        round(round(eff, 2) / a, 6)).otherwise(lit(0.0)).as("value_frac"))
  }

  /** The EPOCH-CAP decision curve — the question [[unimaxAllocation]]
    * and [[dataConstrainedValue]] exist to answer, asked across a grid:
    * for ONE fixed token budget, what does each candidate epoch cap
    * buy? A tight cap strands budget (small domains saturate and the
    * leftover can't go anywhere); a loose cap spends it all but on
    * repetitions whose value decays (Muennighoff et al. 2023). One row
    * per cap: saturation count, allocated total, stranded leftover, and
    * the effective-token total under the repetition-decay law — the
    * number a run picks its cap to maximize.
    *
    * Cross-engine exactness: per-domain eff_tokens is 2-dp by
    * [[dataConstrainedValue]]'s discipline, so its CENT count
    * round(eff·100) is an exact integer — summed as a LONG (order-free)
    * and divided back once, the curve total is bit-identical in any
    * engine and any partitioning; summing the raw doubles would leak
    * reduction order.
    *
    * Scale shape: |caps| waterfills over the SAME k-row domain table —
    * domain-sized work per point, the corpus never re-read.
    *
    * @return one row per cap: (max_epochs, n_domains, n_saturated,
    *         total_alloc, leftover, eff_tokens, value_frac) */
  def epochCapCurve(counts: DataFrame, domainCol: String, tokCol: String,
      caps: Seq[Long], budgetNum: Long, budgetDen: Long,
      rstar: Double = 15.39): DataFrame = {
    require(caps.nonEmpty, "need at least one cap point")
    caps.distinct.sorted.map { cap =>
      val al = unimaxAllocation(counts, domainCol, tokCol, cap,
        budgetNum, budgetDen)
      val valued = dataConstrainedValue(
        al.select(col(domainCol), col("n_tok"), col("alloc")),
        domainCol, "n_tok", "alloc", rstar)
        .select(col(domainCol),
          round(col("eff_tokens") * 100).cast("long").as("__cents"))
      // every sum coalesced: an empty domain table must yield a zeroed
      // curve row, not nulls (EmptyInputSpec pins it)
      al.join(valued, Seq(domainCol))
        .agg(count(lit(1)).as("n_domains"),
          coalesce(sum(when(col("saturated"), 1L).otherwise(0L)), lit(0L))
            .as("n_saturated"),
          coalesce(sum(col("alloc")), lit(0L)).as("total_alloc"),
          coalesce(min(col("leftover")), lit(0L)).as("leftover"),
          coalesce(sum(col("__cents")), lit(0L)).as("__c"))
        .select(lit(cap).as("max_epochs"), col("n_domains"),
          col("n_saturated"), col("total_alloc"), col("leftover"),
          (col("__c").cast("double") / lit(100.0)).as("eff_tokens"),
          when(col("total_alloc") > 0,
            round(col("__c").cast("double") /
              (col("total_alloc").cast("double") * lit(100.0)), 6))
            .otherwise(lit(0.0)).as("value_frac"))
    }.reduce(_ unionByName _)
  }
}
