package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Sort-merge-bucket joins: co-location paid once at write time buys
  * exchange-free joins and aggregations forever after — the layout-level
  * shuffle eliminator for recurring join keys. */
class BucketJoinSpec extends SparkSpec {
  import sqlImplicits._

  test("a join between two tables bucketed on the key runs with NO " +
    "exchange and no sort; the unbucketed join shuffles both sides") {
    val facts = (1L to 5000L).map(i => (i % 97, i)).toDF("k", "v")
    val dims = (0L until 97L).map(i => (i, s"d$i")).toDF("k", "name")
    Layout.bucketedWrite(facts, "k", 8, "bj_facts")
    Layout.bucketedWrite(dims, "k", 8, "bj_dims")
    // a 97-row dim would (correctly) broadcast; turn that off so the
    // plan under audit is the big-big case buckets exist for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bj_facts")
        .join(spark.table("bj_dims"), Seq("k"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p)
      // the scan really is bucket-pruned-capable and bucket-aligned
      assert(p.contains("Bucketed: true"), p)
      // NOTE: Spark 3+ still inserts per-bucket Sort nodes (it only
      // trusts sortBy order under the legacy outputOrdering conf); the
      // sort runs over already-sorted single-file buckets — cheap. The
      // exchange elision is the material win.
      // and the result is the plain join's result
      assert(joined.count() === 5000L)
      val unbucketed = facts.join(dims, Seq("k"))
      val up = unbucketed.queryExecution.executedPlan.toString
      assert(up.contains("Exchange"), up)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bj_facts")
      spark.sql("DROP TABLE IF EXISTS bj_dims")
    }
  }

  test("a grouped aggregation on the bucket key needs no exchange below " +
    "the final aggregate") {
    val facts = (1L to 2000L).map(i => (i % 53, i)).toDF("k", "v")
    Layout.bucketedWrite(facts, "k", 8, "bj_agg")
    try {
      val agg = spark.table("bj_agg").groupBy(col("k"))
        .agg(sum(col("v")).as("s"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"), p)
      assert(agg.count() === 53L)
    } finally spark.sql("DROP TABLE IF EXISTS bj_agg")
  }
}
