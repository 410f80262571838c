package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.operators.{Dedup, Upsert}

/** Property tests for the upsert family (cited by Upsert.scala's scaladoc):
  * idempotence, semi/anti partition of the new side, audit arithmetic.
  * Generators are sampled with fixed seeds — each case spawns Spark jobs, so
  * we run a handful of deterministic cases rather than 100 forAll trials. */
class UpsertSpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  /** Random keyed tables: overlapping key ranges, unique keys per side
    * (upsert's documented precondition). */
  private val tableGen: Gen[(Seq[(Int, String, Double)], Seq[(Int, String, Double)])] =
    for {
      baseKeys <- Gen.someOf(0 to 40)
      newKeys <- Gen.someOf(20 to 60)
      bv <- Gen.listOfN(baseKeys.size, Gen.alphaStr.map(_.take(4)))
      nv <- Gen.listOfN(newKeys.size, Gen.alphaStr.map(_.take(4)))
    } yield (
      baseKeys.toSeq.zip(bv).map { case (k, v) => (k, v, k * 1.5) },
      newKeys.toSeq.zip(nv).map { case (k, v) => (k, v, k * 2.5) })

  private def df(rows: Seq[(Int, String, Double)]): DataFrame = {
    import sqlImplicits._
    rows.toDF("k", "v", "price")
  }

  private def rows(d: DataFrame): Set[(Int, String, Double)] =
    d.collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet

  test("upsert is idempotent: applying the same delta twice is a fixed point") {
    for (seed <- 1L to 5L) {
      val (b, n) = sample(tableGen, seed)
      val once = Upsert.upsert(df(b), df(n), "k")
      val twice = Upsert.upsert(once, df(n), "k")
      assert(rows(twice) === rows(once), s"seed=$seed")
    }
  }

  test("updates ∪ inserts partitions the new side (disjoint, exhaustive)") {
    for (seed <- 6L to 10L) {
      val (b, n) = sample(tableGen, seed)
      val up = rows(Upsert.updates(df(b), df(n), "k"))
      val ins = rows(Upsert.inserts(df(b), df(n), "k"))
      assert((up & ins) === Set.empty, s"seed=$seed: overlap")
      assert((up | ins) === n.toSet, s"seed=$seed: not exhaustive")
    }
  }

  test("audit counters: final = base - updates + new; counts match inputs") {
    for (seed <- 11L to 15L) {
      val (b, n) = sample(tableGen, seed)
      val a = Upsert.audit(df(b), df(n), "k").head()
      assert(a.getAs[Long]("base_count") === b.size.toLong)
      assert(a.getAs[Long]("new_count") === n.size.toLong)
      assert(a.getAs[Long]("final_count") ===
        a.getAs[Long]("base_count") - a.getAs[Long]("updates") + a.getAs[Long]("new_count"))
      assert(a.getAs[Long]("final_count") ===
        Upsert.upsert(df(b), df(n), "k").count())
    }
  }

  test("merged result verifies unique and new rows win on conflict") {
    for (seed <- 16L to 18L) {
      val (b, n) = sample(tableGen, seed)
      val merged = Upsert.upsert(df(b), df(n), "k")
      assert(Upsert.verifyUnique(merged, "k").head().getAs[String]("estado") === "OK")
      val newKeys = n.map(_._1).toSet
      val fromNew = rows(merged).filter(r => newKeys(r._1))
      assert(fromNew === n.toSet, s"seed=$seed: conflict rows not taken from new side")
    }
  }

  test("dedup-then-upsert composes: duplicated new side collapses to keepFirst") {
    val (b, n) = sample(tableGen, 19L)
    val dup = n ++ n.map { case (k, v, p) => (k, v + "_dup", p + 1) }
    val deduped = Dedup.keepFirst(df(dup), Seq("k"), Seq(col("v"), col("price")))
    val merged = Upsert.upsert(df(b), deduped, "k")
    assert(Upsert.verifyUnique(merged, "k").head().getAs[String]("estado") === "OK")
  }

  test("scd2Merge: one current version per key, history immutable, append-only") {
    import sqlImplicits._
    for (seed <- 1L to 3L) {
      val (b, n) = sample(tableGen, seed)
      val dim = df(b)
        .withColumn("valid_from", lit(0L))
        .withColumn("valid_to", lit(null).cast("long"))
        .withColumn("is_current", lit(true))
      // pre-existing history row: must pass through byte-identical
      val hist = Seq((-1, "old", 0.0)).toDF("k", "v", "price")
        .withColumn("valid_from", lit(0L))
        .withColumn("valid_to", lit(5L))
        .withColumn("is_current", lit(false))
      val changes = df(n).withColumn("chg_ts", lit(100L))
      val out = Upsert.scd2Merge(dim.unionByName(hist), changes, "k", "chg_ts")

      // append-only: |out| = |dim| + |history| + |changes|
      assert(out.count() === b.size + 1 + n.size, s"seed=$seed")
      // exactly one current version per surviving key
      val curDup = out.filter(col("is_current"))
        .groupBy("k").count().filter(col("count") > 1).count()
      assert(curDup === 0L, s"seed=$seed")
      // changed keys: closed row's valid_to equals the new row's valid_from
      val changedKeys = b.map(_._1).toSet intersect n.map(_._1).toSet
      changedKeys.headOption.foreach { k =>
        val versions = out.filter(col("k") === k)
          .select("valid_from", "valid_to", "is_current").collect()
        assert(versions.length === 2)
        val closed = versions.find(!_.getBoolean(2)).get
        val opened = versions.find(_.getBoolean(2)).get
        assert(closed.getLong(1) === opened.getLong(0))
      }
      // the history row survived untouched
      val h = out.filter(col("k") === -1).collect()
      assert(h.length === 1 && h.head.getAs[Long]("valid_to") === 5L)
    }
  }
}
