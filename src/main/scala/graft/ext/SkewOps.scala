package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the joins AQE can't fix on its own.
  *
  * Spark's own ladder comes first: map-side partial aggregation
  * absorbs skewed groupBy keys; AQE skew-join splits oversized
  * sort-merge partitions at runtime. What remains is the hot-key join
  * where one probe-side key floods a partition and the build side is
  * too big to broadcast — there, salting is the standard fix:
  * replicate the build side `salts` ways and scatter the probe side
  * deterministically across the replicas, turning one hot partition
  * into `salts` even ones at the cost of a `salts`× build-side
  * blow-up. Use a salt count near the observed skew factor, not the
  * cluster size.
  */
object SkewOps {

  /** Inner equi-join of `big` (skewed probe side) with `small` (build
    * side, too big to broadcast, small enough to replicate) on
    * `key`. Deterministic scatter: the salt is a hash of the probe
    * row's `scatterCol` (any well-distributed column — an id, not the
    * skewed key itself), so results are reproducible run-to-run. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      scatterCol: String, salts: Int): DataFrame = {
    val bigS = big.withColumn("_salt", pmod(hash(col(scatterCol)), lit(salts)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Input-parallelism guard (guide §2.5 "one huge unsplittable file →
    * repartition immediately after the read"): a parquet ROW GROUP is
    * unsplittable, so a source written as one row group gives the scan
    * stage 1-2 partitions — and every expensive per-row kernel fused
    * into that stage (shingle/minhash/simhash fingerprints, byte
    * hashes, tokenizers) inherits 1-2-way parallelism no matter how
    * many cores sit idle (measured sf0.1: dedup_simhash_pairs spent
    * 1.5 s of its 2.4 s in ONE 2-task kernel stage). When the planned
    * scan parallelism is below half the cluster's, redistribute rows
    * round-robin BEFORE the kernels (callers apply this to the RAW
    * relation and select kernels after it — column pruning only pushes
    * attribute projections below the exchange, never the kernel
    * expressions). SCALE-ADAPTIVE, not a local[32] constant: at
    * warehouse scale the scan arrives in thousands of row-group splits,
    * `cur * 2 > target` holds, and this is the identity — the corpus
    * is never shuffled. Deterministic under retries
    * (sortBeforeRepartition stays on) and value-invariant: every
    * consumer is partitioning-agnostic (DeterminismSpec's fleet-wide
    * contract). */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // queryExecution.toRdd: the INTERNAL-row RDD — same partition count
    // as .rdd but without appending the external-row deserializer plan
    // (r17 verdict note: .rdd built a second, wider plan per probe; the
    // probe only needs the partitioning). Still a build-time plan of
    // the raw relation — cheap (a scan node), and the pre-AQE count is
    // the right one to test: the guard asks what the SCAN stage's
    // parallelism would be.
    val cur = df.queryExecution.toRdd.getNumPartitions
    if (cur * 2 <= target) df.repartition(target) else df
  }

  /** EXACT global row_number WITHOUT the single-partition window —
    * the two-job distributed rank: `repartitionByRange` on the sort
    * key gives ordered, disjoint partitions; `sortWithinPartitions`
    * orders inside each; `zipWithIndex` (one count job + one map job,
    * no extra shuffle) assigns the contiguous global index. Appended
    * as `outCol` (1-based, LongType).
    *
    * Exactness caveat, same shape as every rank: rows TIED on the full
    * sort key receive an arbitrary-but-valid permutation of their rank
    * range (range partitioning may split a tie group across partition
    * boundaries). Any aggregate invariant under tie permutation —
    * equal-size bucket cuts over fully-determined rows (q_zorder),
    * counts, min/max — is exact; a consumer that needs a DETERMINISTIC
    * winner inside tie groups must put a total key in `sortCols`.
    *
    * Cost: the RDD detour deserializes rows once (the
    * [[graft.core.GraftStage.concatRoundRobin]] precedent — eager,
    * documented); at any scale this is 2 jobs + the one range
    * exchange, vs the window form's everything-through-one-task. */
  /** EXACT global running total (rank + cumulative sum of `valCol` in
    * `sortCols` order) with NO single-partition window — the classic
    * distributed prefix-sum: range-partition + local sort, then ONE
    * bounded collect of per-partition totals (numShufflePartitions
    * longs — the kmeans-centroid scalar-sync shape), prefix them on
    * the driver, broadcast the offsets back, and each partition adds
    * its offset to a local running sum. Two passes over the sorted
    * relation (persisted between them, released by the caller's query
    * scope). `ntile OVER (ORDER BY …)`'s cumulative cousin: powers
    * Pareto/coverage queries (`events_power_users`) at any row count.
    * `valCol` must be LongType. */
  def globalCumSum(df: DataFrame, sortCols: Seq[String], valCol: String,
      rankCol: String = "_rk", cumCol: String = "_cum",
      partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val np = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val cols = sortCols.map(col)
    val sorted = graft.core.QueryCaches.track(
      df.repartitionByRange(np, cols: _*).sortWithinPartitions(cols: _*))
    val vIdx = sorted.schema.fieldIndex(valCol)
    // pass 1: per-partition (count, sum) — np rows to the driver
    val partAgg = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var s = 0L
      it.foreach { r => n += 1; s += r.getLong(vIdx) }
      Iterator((pid, n, s))
    }.collect().sortBy(_._1)
    val nParts = partAgg.length
    val rankOff = new Array[Long](nParts + 1)
    val cumOff = new Array[Long](nParts + 1)
    partAgg.foreach { case (pid, n, s) =>
      rankOff(pid + 1) = n; cumOff(pid + 1) = s
    }
    for (i <- 1 to nParts) { rankOff(i) += rankOff(i - 1); cumOff(i) += cumOff(i - 1) }
    val schema = StructType(sorted.schema.fields ++ Seq(
      StructField(rankCol, LongType, nullable = false),
      StructField(cumCol, LongType, nullable = false)))
    // pass 2: local prefix + broadcast offsets
    val withCum = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var rk = rankOff(pid); var cum = cumOff(pid)
      it.map { r =>
        rk += 1; cum += r.getLong(vIdx)
        Row.fromSeq(r.toSeq ++ Seq(rk, cum))
      }
    }
    sorted.sparkSession.createDataFrame(withCum, schema)
  }

  /** Distributed running MAX over a global sort order — the prefix
    * cousin of [[globalCumSum]] with the same two-pass shape: range
    * partition on `sortCols`, per-partition maxima to the driver
    * (numPartitions longs — a bounded scalar sync), prefix-max the
    * offsets, broadcast back, local running max per partition. MAX is
    * associative and idempotent, so the composition equals the
    * sequential `MAX(v) OVER (ORDER BY …)` exactly — the window this
    * helper exists to avoid serializing onto one task. Powers
    * out-of-orderness audits (`events_lateness`): "has any EARLIER row
    * a larger v" is a prefix-max compare. `valCol` must be LongType. */
  def globalCumMax(df: DataFrame, sortCols: Seq[String], valCol: String,
      cumCol: String = "_cmax", partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val np = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val cols = sortCols.map(col)
    val sorted = graft.core.QueryCaches.track(
      df.repartitionByRange(np, cols: _*).sortWithinPartitions(cols: _*))
    val vIdx = sorted.schema.fieldIndex(valCol)
    val partMax = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var m = Long.MinValue
      it.foreach { r => val v = r.getLong(vIdx); if (v > m) m = v }
      Iterator((pid, m))
    }.collect().sortBy(_._1)
    val nParts = partMax.length
    // offset(p) = max over all partitions strictly before p
    val maxOff = new Array[Long](nParts + 1)
    maxOff(0) = Long.MinValue
    partMax.foreach { case (pid, m) => maxOff(pid + 1) = m }
    for (i <- 1 to nParts)
      if (maxOff(i - 1) > maxOff(i)) maxOff(i) = maxOff(i - 1)
    val schema = StructType(sorted.schema.fields :+
      StructField(cumCol, LongType, nullable = false))
    val withMax = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var m = maxOff(pid)
      it.map { r =>
        val v = r.getLong(vIdx); if (v > m) m = v
        Row.fromSeq(r.toSeq :+ m)
      }
    }
    sorted.sparkSession.createDataFrame(withMax, schema)
  }

  def globalRank(df: DataFrame, sortCols: Seq[String],
      outCol: String = "_rk", partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val np = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val cols = sortCols.map(col)
    // r17: persist the sorted relation like the [[globalCumSum]] /
    // [[globalCumMax]] siblings already do — zipWithIndex runs a count
    // job and the final map is a separate pass, so the UNPERSISTED
    // range-partition + sort AND everything upstream of it executed
    // THREE times per rank (range sampling, count, map). Measured
    // sf0.1 (bench methodology, quiet): q_winsorized 2.59 → 2.17 s
    // (its rank input is an unpersisted join — the whole lineage ran
    // 3×); q_zorder/events_qte unchanged within noise (their rank
    // inputs were already query-cached, so only the sort was repeated
    // and the cache write costs about what the re-sorts did). Kept for
    // the unpersisted-input callers and sibling consistency: strictly
    // fewer plan evaluations at any scale.
    val sorted = graft.core.QueryCaches.track(
      df.repartitionByRange(np, cols: _*).sortWithinPartitions(cols: _*))
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(ranked, schema)
  }

  /** Global n-tile WITHOUT the single-partition window: `ntile(n)
    * OVER (ORDER BY v)` serializes the whole relation through one
    * task, which is exactly the plan q_ntile documents avoiding (it
    * partitions by nation). This is the global-scale path: quantile
    * BOUNDARIES come from one `approxQuantile` pass (a driver
    * round-trip of n−1 doubles — the bounded-scalar sync, like the
    * kmeans centroid loop), then every row buckets by range
    * comparison inside its own scan partition — no sort, no window,
    * no exchange beyond whatever the caller aggregates next.
    *
    * Semantics vs exact ntile: with `relativeError = 0` the
    * boundaries are exact quantile VALUES, so on distinct values the
    * assignment matches `ntile` exactly when the count divides `n`;
    * rows TIED on a boundary value all land in the lower tile
    * (value-determined, deterministic, engine-agnostic) whereas exact
    * ntile splits ties by rank — the inherent trade of value-range
    * bucketing, and the right one at scale (tile membership becomes a
    * pure function of the value, stable under re-partitioning). A
    * nonzero `relativeError` adds rank slack in exchange for a
    * fixed-size sketch per partition. */
  def globalNtile(df: DataFrame, valueCol: String, n: Int,
      relativeError: Double = 0.0): DataFrame = {
    require(n >= 2, s"globalNtile needs n >= 2, got $n")
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bounds = df.stat.approxQuantile(valueCol, probs, relativeError)
    // first boundary >= value wins → tile = smallest i with v <= b_i
    val tile = bounds.zipWithIndex.foldRight(lit(n.toLong)) {
      case ((b, i), acc) => when(col(valueCol) <= b, lit(i + 1L)).otherwise(acc)
    }
    df.withColumn("tile", tile)
  }

  /** Bloom-filter build over `keyHash` (must be a LongType column —
    * wrap arbitrary keys in `xxhash64`): Spark's OWN runtime-filter
    * aggregate (`BloomFilterAggregate`, the sketch behind
    * spark.sql.optimizer.runtime.bloomFilter) surfaced as a library
    * aggregate — fixed-size sketch buffers, merged map-side, one
    * binary blob out. */
  def bloomAgg(keyHash: Column, expectedItems: Long, numBits: Long): Column =
    toColumn(new BloomFilterAggregate(toExpression(keyHash),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a SERIALIZED bloom filter (binary
    * literal): codegen'd, usable inside any scan-stage filter. */
  def bloomMightContain(bfBytes: Array[Byte], keyHash: Column): Column =
    toColumn(BloomFilterMightContain(Literal(bfBytes),
      toExpression(keyHash)))

  /** Semi-join of `big` against `small`'s keys with an EXPLICIT
    * Bloom-filter runtime prefilter — the `InjectRuntimeFilter` shape
    * (build a sketch over the small side's join keys, probe it in the
    * big side's scan stage so the shuffle only carries surviving
    * rows), made deterministic and available where the optimizer
    * would not inject it (DataFrame API, custom thresholds).
    *
    * The build side executes EAGERLY (`.head()`) and the fixed-size
    * sketch embeds as a binary literal: `might_contain` demands a
    * constant/scalar-subquery filter, and a literal keeps the probe
    * foldable-per-batch and codegen'd. That is one driver round-trip
    * of numBits/8 bytes — the broadcast-variable pattern, not a data
    * collect. False positives are removed by the exact semi-join, so
    * the result is EXACTLY the plain semi-join's (the oracle-gated
    * property); the filter only prunes shuffle input. */
  def bloomPrunedSemiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long, numBits: Long): DataFrame = {
    import org.apache.spark.sql.types._
    // xxhash64 is TYPE-sensitive: the same numeric value hashes
    // differently as IntegerType vs LongType, and a mismatch here
    // would turn bloom false-positives into false NEGATIVES —
    // silently dropping rows the exact semi-join matches. Normalize
    // integral keys to long on both sides; anything else must already
    // agree on type (fail fast rather than drop rows).
    val bigT = big.schema(bigKey).dataType
    val smallT = small.schema(smallKey).dataType
    def isIntegral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val (bigHashKey, smallHashKey) =
      if (isIntegral(bigT) && isIntegral(smallT))
        (col(bigKey).cast(LongType), col(smallKey).cast(LongType))
      else if (bigT == smallT) (col(bigKey), col(smallKey))
      else throw new IllegalArgumentException(
        s"bloomPrunedSemiJoin: incompatible key types $bigT vs $smallT — " +
          "xxhash64 is type-sensitive; cast the keys to a common type first")
    // rename the build-side key: with bigKey == smallKey both join
    // children would expose the same column name and the unqualified
    // condition would be AMBIGUOUS_REFERENCE. Derive a name absent
    // from big's columns so a probe-side column can't collide either.
    // No distinct() — a left-semi join already emits each probe row at
    // most once, so deduplicating the build side only adds an exchange.
    val buildKey = Iterator.from(0).map(i => s"_graft_bloom_key$i")
      .find(n => !big.columns.contains(n)).get
    val bf = small.agg(bloomAgg(xxhash64(smallHashKey), expectedItems, numBits))
      .head().getAs[Array[Byte]](0)
    // Empty build side ⇒ BloomFilterAggregate yields null; the true
    // semi-join is empty, so return that directly instead of leaning
    // on might_contain accepting a null bloom blob.
    if (bf == null) return big.limit(0)
    big.filter(bloomMightContain(bf, xxhash64(bigHashKey)))
      .join(small.select(col(smallKey).as(buildKey)),
        col(bigKey) === col(buildKey), "left_semi")
  }
}
