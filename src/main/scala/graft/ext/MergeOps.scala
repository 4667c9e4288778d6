package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC MERGE — apply a changelog onto a keyed snapshot (the lakehouse
  * `MERGE INTO` / upsert-compaction primitive; reference scope ends at
  * per-element transforms — `/root/reference/pypeln/process/api/map.py`
  * — so table maintenance is extension surface, built Spark-first).
  *
  * Shape chosen for 100 TB, not for row count:
  *   1. the changelog FOLDS to one winner row per key with a map-side-
  *      combined `max_by` over the (ord, seq) struct — last-writer-wins
  *      is an associative argmax, so only |keys| rows ever cross the
  *      exchange no matter how many updates a key received;
  *   2. the snapshot then meets the folded changelog in ONE
  *      key-partitioned full-outer join — no window, no global sort,
  *      and both sides are free to co-partition (a bucketed base table
  *      joins with zero base-side shuffle);
  *   3. delete semantics never touch payload bytes: a key whose winning
  *      op is the delete op is dropped by a post-join filter, and a
  *      delete for an absent key is a no-op (MERGE contract).
  * The naive alternative — union + row_number over every key — sorts
  * the full history; this plan aggregates it. Skewed keys cost one
  * combine-side fold, not a single-partition window.
  */
object MergeOps {

  /** Per-key latest payload: for each `key`, the `payload` columns of
    * the row with the greatest (ordCols) tuple — the snapshot-building
    * fold (`max_by` over a struct compares lexicographically, so pass
    * (time, uniqueSeq) to make the winner deterministic). Map-side
    * combined; one row per key crosses the shuffle. */
  def latestSnapshot(df: DataFrame, key: String, ordCols: Seq[String],
      payload: Seq[String]): DataFrame =
    df.groupBy(col(key))
      .agg(max_by(struct(payload.map(col): _*),
        struct(ordCols.map(col): _*)).as("_p"))
      .select(col(key) +: payload.map(c => col("_p")(c).as(c)): _*)

  /** Apply changelog `changes` to snapshot `base`.
    *
    * `base`: one row per `key` with `payload` columns. `changes`: any
    * number of rows per key with `ordCols` (last-writer-wins order,
    * unique per key), an `opCol` whose value equals `deleteOp` for
    * deletes (any other value = upsert), and the same `payload`
    * columns. Returns the merged snapshot:
    * (key, payload..., status ∈ kept|updated|inserted, n_changes) —
    * keys whose winning op is a delete are absent; a delete for a key
    * not in `base` is a no-op. The winner's payload is taken as a
    * WHOLE struct (no per-column coalesce), so a legitimately-null
    * payload field in the winning change is not back-filled from the
    * base row. */
  def cdcMerge(base: DataFrame, changes: DataFrame, key: String,
      ordCols: Seq[String], opCol: String, payload: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    val reserved = Seq("_b", "_c", "_bk", "_ck", "n_changes", "status")
    require(!(base.columns ++ changes.columns).exists(reserved.contains),
      s"cdcMerge reserves column names ${reserved.mkString(", ")}")
    val folded = changes.groupBy(col(key).as("_ck"))
      .agg(max_by(struct((opCol +: payload).map(col): _*),
        struct(ordCols.map(col): _*)).as("_c"),
        count(lit(1)).as("n_changes"))
    val b = base.select(col(key).as("_bk"),
      struct(payload.map(col): _*).as("_b"))
    val winnerPayload: Column =
      struct(payload.map(c => col("_c")(c).as(c)): _*)
    b.join(folded, col("_bk") === col("_ck"), "full_outer")
      .filter(col("_c").isNull || col("_c")(opCol) =!= lit(deleteOp))
      .select(coalesce(col("_bk"), col("_ck")).as(key) +:
        payload.map(c =>
          when(col("_c").isNull, col("_b")(c))
            .otherwise(winnerPayload(c)).as(c)) :+
        when(col("_c").isNull, lit("kept"))
          .when(col("_bk").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("status") :+
        coalesce(col("n_changes"), lit(0L)).as("n_changes"): _*)
  }
}
