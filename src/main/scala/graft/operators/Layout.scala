package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional scan pruning.
  *
  * At 100 TB the cheapest rows are the ones never read: parquet
  * min/max footer stats skip whole files, but only if the write
  * ordering made per-file value ranges narrow. A single-column sort
  * gives perfect skipping on that column and none on any other;
  * Z-ORDERING interleaves the bits of several columns so every file's
  * bounding box is narrow in ALL of them — range predicates on any
  * clustered dimension skip most files (the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`; Morton curves, public
  * literature).
  *
  * The z-value is pure column algebra (normalize each dimension to a
  * `bits`-bit integer against its fit min/max, then interleave bits) —
  * codegen'd arithmetic, zero shuffles to compute; the clustering
  * itself is ONE range-repartition exchange on the z-value, the same
  * cost as any global sort-before-write.
  */
object Layout {

  /** Exact long division via Spark's integral `div` operator (the
    * FunctionRegistry name for IntegralDivide). Never goes through
    * doubles: a long→double cast loses precision past 2^53, which can
    * land the quotient one off in EITHER direction — an
    * overestimation-only correction is not enough, and any divergence
    * breaks the one-source-of-truth contract with zValue2Sql's exact
    * `//` replay. Truncating = floor here because both operands are
    * non-negative on the z-value domain (x ≥ lo, hi > lo). */
  private def idiv(x: Column, y: Column): Column = call_function("div", x, y)

  /** Morton/Z-value of two integer dimensions: each is min/max
    * normalized to `bits` bits, then bit-interleaved (a gets the odd
    * bit positions, b the even). All arithmetic in longs: exact and
    * replayable in any engine with bit operators.
    *
    * Domain contract (enforced by [[clusterByZ]] on its fit, documented
    * here for direct callers): values must lie in [min, max], and
    * (max − min) · (2^bits − 1) must fit a signed long — e.g. bits=16
    * allows dimension ranges up to ~2^47 (epoch-MICROS ranges over
    * decades need fewer bits or a pre-scale). */
  def zValue2(a: Column, aMin: Column, aMax: Column,
      b: Column, bMin: Column, bMax: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
    val top = (1L << bits) - 1
    def norm(x: Column, lo: Column, hi: Column): Column =
      when(hi <= lo, lit(0L)).otherwise(
        idiv((x.cast("long") - lo.cast("long")) * top,
          hi.cast("long") - lo.cast("long")))
    val na = norm(a, aMin, aMax)
    val nb = norm(b, bMin, bMax)
    (0 until bits).map { i =>
      val abit = shiftleft(shiftrightunsigned(na, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftrightunsigned(nb, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** The DuckDB/ANSI replay of [[zValue2]] — one source of truth for
    * the interleave formula, used by the `layout_zorder` oracle. */
  def zValue2Sql(a: String, aMin: String, aMax: String,
      b: String, bMin: String, bMax: String, bits: Int = 16): String = {
    val top = (1L << bits) - 1
    def norm(x: String, lo: String, hi: String): String =
      s"(CASE WHEN $hi <= $lo THEN 0 ELSE ((CAST($x AS BIGINT) - $lo) * $top) // ($hi - $lo) END)"
    val na = norm(a, aMin, aMax)
    val nb = norm(b, bMin, bMax)
    (0 until bits).map { i =>
      s"(((($na >> $i) & 1) << ${2 * i + 1}) | ((($nb >> $i) & 1) << ${2 * i}))"
    }.mkString("(", " | ", ")")
  }

  /** N-dimensional Morton/Z-value: each dimension is min/max normalized
    * to `bits` bits, then bits interleave round-robin (bit i of
    * dimension j lands at position i·N + j). Requires bits·N ≤ 63.
    * Dimensions are (column, min, max) triples. */
  def zValueN(dims: Seq[(Column, Column, Column)], bits: Int): Column = {
    val n = dims.size
    require(n >= 2, "zValueN needs at least 2 dimensions")
    require(bits > 0 && bits * n <= 63,
      s"bits ($bits) × dims ($n) must fit a signed long")
    val top = (1L << bits) - 1
    def norm(x: Column, lo: Column, hi: Column): Column =
      when(hi <= lo, lit(0L)).otherwise(
        idiv((x.cast("long") - lo.cast("long")) * top,
          hi.cast("long") - lo.cast("long")))
    dims.zipWithIndex.flatMap { case ((c, lo, hi), j) =>
      val nc = norm(c, lo, hi)
      (0 until bits).map { i =>
        shiftleft(shiftrightunsigned(nc, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` for writing: range-repartition + sort by the z-value
    * of the given dimensions (fit min/max computed in one tiny agg
    * pass). Downstream `.write.parquet` produces files whose footer
    * min/max are narrow in ALL clustered dimensions. */
  def clusterByZ(df: DataFrame, dims: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    val aggCols = dims.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).as(s"lo$i"), max(col(c)).as(s"hi$i"))
    }
    val fit = df.agg(aggCols.head, aggCols.tail: _*).head() // bounded: 1-row global agg
    // zValue* domain contract: (hi-lo)·(2^bits-1) must fit a signed
    // long or the normalization itself overflows (silently wrong
    // z-values → wrong clustering). Fail at fit time, not per row.
    val top = (1L << bits) - 1
    dims.indices.foreach { i =>
      (fit.get(2 * i), fit.get(2 * i + 1)) match {
        case (lo: Number, hi: Number) =>
          val range = hi.longValue - lo.longValue
          require(range <= Long.MaxValue / top,
            s"clusterByZ: dimension '${dims(i)}' range $range × top $top " +
              "overflows a signed long — reduce bits or pre-scale the column")
        case _ => // non-numeric fit (null on empty input): nothing to check
      }
    }
    val z =
      if (dims.size == 2)
        zValue2(col(dims(0)), lit(fit.get(0)), lit(fit.get(1)),
          col(dims(1)), lit(fit.get(2)), lit(fit.get(3)), bits)
      else
        zValueN(dims.zipWithIndex.map { case (c, i) =>
          (col(c), lit(fit.get(2 * i)), lit(fit.get(2 * i + 1)))
        }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Two-column convenience form of [[clusterByZ]]. */
  def clusterByZ2(df: DataFrame, a: String, b: String, numFiles: Int,
      bits: Int = 16): DataFrame =
    clusterByZ(df, Seq(a, b), numFiles, bits)

  /** SMALL-FILES compaction: repartition so each output file lands
    * near `targetBytes` of estimated data. The file-count estimate
    * comes from Catalyst's plan statistics (for file sources, the sum
    * of input file sizes after partition pruning) — a heuristic, not a
    * contract; parquet re-compression shifts real sizes by the codec
    * ratio, so pass an effective target. Why it matters at 100 TB:
    * a 10k-task job writing a 20-file-sized result creates 10k tiny
    * files, and every later scan pays 10k opens + footer reads; the
    * NameNode/manifest pays 10k entries. One round-robin exchange
    * fixes the layout. Ceiling division + a floor of 1 keep the edge
    * cases (empty input, target larger than data) at one file. */
  def compactTo(df: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = ((est + targetBytes - 1) / targetBytes)
      .max(BigInt(1)).min(BigInt(1 << 20)).toInt
    df.repartition(parts)
  }

  /** Scale-ADAPTIVE input re-sharding for CPU-heavy per-row projections
    * (r20, guide §2 "make partitioning scale-adaptive rather than a
    * constant tuned for either local mode or the cluster"): when the
    * input plans FEWER partitions than half the session's parallelism
    * — one small file, a coalesced upstream — every expensive
    * projection above it (minhash signatures, text quality scoring)
    * runs on ONE core regardless of cluster width; measured r20: the
    * single-split sf0.1 documents scan serialized a 0.4 s signature
    * pass under dedup_clusters/pipeline_curation while 31 cores idled.
    * Round-robin re-shard to the default parallelism in exactly that
    * case. The exchange's cost is bounded by the small input that
    * triggers it; any real data size (a 100 TB scan has ~10^6 splits)
    * takes the no-op branch, so no unconditional shuffle is added.
    * Row placement does not affect results — callers compute
    * per-row/keyed-deterministic operators above it. */
  def parallelizeSmallInput(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }
}
