package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data batching: assign each document to a
  * bin so no bin's total weight (token count) exceeds `budget` — the step
  * that turns a cleaned corpus into fixed-budget training sequences.
  *
  * Greedy packing is inherently sequential (each decision depends on the
  * running bin fill), so it cannot be a pure relational plan. The scale
  * shape: shard the corpus by a deterministic hash of the id (shards are
  * independent → embarrassingly parallel), then run the sequential greedy
  * INSIDE each shard via `flatMapGroups` — the documented last-resort
  * imperative escape hatch, used here because the semantics genuinely
  * need it. Shard count controls the parallelism/packing-quality trade:
  * more shards = more parallel + marginally more slack in the last bin of
  * each shard.
  *
  * Deterministic: shard = md5-based hash (stable across runs/partitions),
  * in-shard order = id. An over-budget single document gets its own bin
  * (never dropped, never split — splitting is [[graft.functions.TextAnalysis.chunks]]'s job
  * upstream).
  */
object Packing {

  /** @return (id, weight, shard, bin) — bin is per-shard, 0-based. */
  def packGreedy(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(idCol).cast("long").as("id"),
      col(weightCol).cast("long").as("w"),
      Sampling.hashBucket(col(idCol).cast("string"), shards).as("shard"))
      .as[(Long, Long, Long)]
    keyed.groupByKey(_._3)
      .flatMapGroups { (shard, rows) =>
        // deterministic in-shard order; shards are sized by the caller so
        // a shard fits in memory (shards ≈ corpus tokens / executor budget)
        val sorted = rows.toSeq.sortBy(_._1)
        var bin = 0L
        var fill = 0L
        sorted.iterator.map { case (id, w, _) =>
          if (fill > 0 && fill + w > budget) { bin += 1; fill = 0 }
          fill += w
          (id, w, shard, bin)
        }
      }
      .toDF("id", "w", "shard", "bin")
  }

  /** Packing efficiency report: bins, mean fill ratio, over-budget bins
    * (only legal for single over-budget docs). */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(sum(col("w")).as("fill"), count(lit(1)).as("docs"))
      .agg(count(lit(1)).as("bins"),
        round(avg(col("fill")).cast("double") / budget, 4).as("mean_fill"),
        count(when(col("fill") > budget && col("docs") > 1, 1))
          .as("illegal_bins"))
}
