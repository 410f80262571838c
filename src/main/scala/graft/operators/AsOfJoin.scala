package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the payload of the
  * latest right row with `rightTime <= leftTime` for the same key — the
  * time-series lookup Spark has no built-in operator for (trades→latest
  * quote, click→latest error, feature→latest snapshot).
  *
  * Plan shape: tag both sides, union, ONE shuffle by key, and a running
  * `last(_, ignoreNulls)` window ordered by (time, side) — the same merge
  * pass a native as-of join would do. The naive formulations both fail at
  * scale: a range-condition join explodes to O(left × right-per-key) pairs
  * before taking the max, and a per-left-row subquery is O(n) jobs. Here
  * every right row is carried exactly once, so the cost is the sort — the
  * plan that survives a 100× scale-up.
  *
  * Ties: right rows sort before left rows at equal time (side 0 < 1), so
  * the match is inclusive. Among right rows with identical (key, time) the
  * last one by `rightOrder` wins — pass a total tiebreak there for
  * deterministic output when (key, time) can repeat.
  *
  * The payload rides as ONE struct through the window, so the whole
  * matched right row attaches atomically (DuckDB ASOF / merge_asof
  * semantics). Running `last(_, ignoreNulls)` per payload column
  * independently would tear rows: a right row with a legitimately NULL
  * payload value would fall back to an OLDER right row for that column
  * while its siblings came from the newer one. Consequence: a NULL inside
  * an attached payload means the MATCHED row carried NULL there; all-NULL
  * payload columns mean no right row matched at all.
  */
object AsOfJoin {

  /** The merge pass stages its bookkeeping in `_t`, `_side`, `_p` and
    * `_o<i>` columns; a left column with one of those names would be
    * silently overwritten, so reject it up front. */
  private def requireNoReserved(left: DataFrame, nOrder: Int): Unit = {
    val reserved = Set("_t", "_side", "_p") ++ (0 until nOrder).map(i => s"_o$i")
    val clash = left.columns.filter(reserved)
    require(clash.isEmpty,
      s"left column(s) ${clash.mkString(", ")} collide with AsOfJoin internal " +
        "names (_t, _side, _p, _o<i>); rename them before joining")
  }

  /** @param left       probe side; all its columns survive
    * @param right      build side; only `payload` columns are attached
    * @param key        equi-join key column name (both sides)
    * @param leftTime   left event-time column (any orderable type)
    * @param rightTime  right event-time column (same type)
    * @param payload    right columns to carry onto each left row (renamed
    *                   as-is; must not collide with left column names)
    * @param rightOrder extra total-order tiebreak among right rows sharing
    *                   (key, time) — expressions over `right`'s columns,
    *                   compared ascending; later (greater) wins */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      rightOrder: Seq[Column] = Nil): DataFrame = {
    requireNoReserved(left, rightOrder.length)
    val leftCols = left.columns.toSeq
    val rightProj = right.select(col(key) +: col(rightTime).as("_t") +:
      struct(payload.map(col): _*).as("_p") +:
      rightOrder.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }: _*)

    // Aligned union: key, _t, _side, left columns (null on right rows),
    // the payload struct (null on left rows). Nulls are typed via the
    // schema of the source side so unionByName never widens.
    val lSide = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val rSide = rightProj.withColumn("_side", lit(0))
    val unioned = lSide.unionByName(rSide, allowMissingColumns = true)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc +: col("_side").asc +:
        rightOrder.indices.map(i => col(s"_o$i").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_p").getField(p).as(p)): _*)
  }

  /** Forward as-of: the EARLIEST right row with `rightTime >= leftTime`
    * per key — the mirror of [[asOf]] (next quote after the order, next
    * deploy after the alert). Same union + one-shuffle merge shape, with
    * the window reversed: right rows sort after left rows at equal time,
    * and `first(_, ignoreNulls)` over the following frame picks the
    * nearest. Among right ties on (key, time), the FIRST by `rightOrder`
    * wins. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      rightOrder: Seq[Column] = Nil): DataFrame = {
    requireNoReserved(left, rightOrder.length)
    val leftCols = left.columns.toSeq
    val rightProj = right.select(col(key) +: col(rightTime).as("_t") +:
      struct(payload.map(col): _*).as("_p") +:
      rightOrder.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }: _*)
    val lSide = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(0))
    val rSide = rightProj.withColumn("_side", lit(1))
    val unioned = lSide.unionByName(rSide, allowMissingColumns = true)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc +: col("_side").asc +:
        rightOrder.indices.map(i => col(s"_o$i").asc): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned.withColumn("_p", first(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(leftCols.map(col) ++
        payload.map(p => col("_p").getField(p).as(p)): _*)
  }

  /** [[asOf]] with bounded staleness: matches older than `tolerance` time
    * units before the left row are nulled out (a quote from last week is
    * not a usable price). `matchTime` must be one of `payload` so the age
    * is computable; times must be numeric. */
  def asOfWithin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      matchTime: String, tolerance: Long,
      rightOrder: Seq[Column] = Nil): DataFrame = {
    require(payload.contains(matchTime), "matchTime must be in payload")
    val joined = asOf(left, right, key, leftTime, rightTime, payload, rightOrder)
    val stale = col(matchTime).isNull ||
      (col(leftTime) - col(matchTime)) > tolerance
    payload.foldLeft(joined) { (df, p) =>
      df.withColumn(p, when(stale, lit(null)).otherwise(col(p)))
    }
  }
}
