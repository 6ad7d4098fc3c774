package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators that are thin-but-real wrappers over
  * Catalyst plans (SURVEY §2.2-§2.6).
  *
  * Reference operators mapped here: `Top` (transforms/Top.java:58),
  * `Latest` (transforms/Latest.java:56), `Partition`
  * (transforms/Partition.java:83), `Sample` (transforms/Sample.java:50),
  * `WithFailures` (transforms/WithFailures.java:73), `Sets`
  * (transforms/Sets.java:81), `SortValues` (extensions/sorter/).
  */
object Relational {

  /** Global top-k: `orderBy.limit` — Spark plans TakeOrderedAndProject
    * (per-partition heaps + driver merge of k·parts rows, no full sort).
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** SPILL-SAFE secondary sort — Beam's sorter extension
    * (extensions/sorter/.../SortValues.java:53 backed by
    * BufferedExternalSorter.java:33, which exists precisely because a
    * key's values may not fit in memory). The `sort_array(collect_list)`
    * form materializes each group on the heap; this one hands `f` a
    * LAZY iterator in `sortCols` order straight off the exchange's
    * external (disk-spilling) sort — a billion-value key streams, never
    * materializes. One shuffle on the key, sort piggybacked on it. */
  def sortValuesStreamed[K: Encoder, T, U: Encoder](ds: Dataset[T],
      key: T => K, sortCols: Seq[Column])(
      f: (K, Iterator[T]) => IterableOnce[U]): Dataset[U] =
    ds.groupByKey(key).flatMapSortedGroups(sortCols: _*)(f)

  /** Per-key exponentially weighted moving average in event order —
    * the pandas `ewm(alpha).mean()` recurrence (adjust=False):
    * e_1 = v_1; e_i = α·v_i + (1−α)·e_{i−1}. The sequential-scan
    * shape (@RequiresTimeSortedInput): one shuffle on the key, the
    * sort rides the exchange's spill-safe group sort, each key streams
    * through O(1) state. A window-function formulation is either
    * O(n²) per key (re-sum each frame) or numerically explosive
    * (closed form needs (1−α)^(−j) factors), so the recurrence is the
    * 100 TB path. */
  def ewmaPerKey[K: Encoder, T, U: Encoder](ds: Dataset[T], key: T => K,
      sortCols: Seq[Column], value: T => Double, alpha: Double)(
      out: (T, Double) => U): Dataset[U] =
    ds.groupByKey(key).flatMapSortedGroups(sortCols: _*) { (_, it) =>
      var e = Double.NaN
      it.map { t =>
        val v = value(t)
        e = if (e.isNaN) v else alpha * v + (1 - alpha) * e
        out(t, e)
      }
    }

  /** Per-key top-k via ranked window (Beam: Top.perKey). One shuffle on
    * the key; rank prunes before any further stage. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Latest value per key by timestamp with deterministic tie-break
    * (Beam: Latest.perKey — transforms/Latest.java:56). */
  def latestPerKey(df: DataFrame, keys: Seq[Column], ts: Column,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ts.desc, tieBreak.desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Split one DataFrame into disjoint partitions by predicate list; rows
    * matching no predicate are dropped (Beam: Partition.of). Each output
    * re-reads the (cached) parent — cache before fanning out. */
  def partition(df: DataFrame, preds: Seq[Column]): Seq[DataFrame] =
    preds.zipWithIndex.map { case (p, i) =>
      val notEarlier = preds.take(i).foldLeft(lit(true))((acc, q) => acc && !q)
      df.filter(p && notEarlier)
    }

  /** Dead-letter pattern (Beam: WithFailures.java:73): evaluate `attempt`
    * and split success/failure rows on a null/err marker column. */
  def withFailures(df: DataFrame, attempt: Column, errCond: Column,
      outCol: String): (DataFrame, DataFrame) = {
    val evaluated = df.withColumn(outCol, attempt)
    (evaluated.filter(!errCond), evaluated.filter(errCond))
  }

  /** Exception-catching dead-letter — the DoFn path of Beam's
    * WithFailures (transforms/WithFailures.java:73
    * `exceptionsInto/exceptionsVia`): apply `fn` per element inside
    * try/catch in ONE narrow pass. Success rows carry
    * (Some(result), None, null); failures carry
    * (None, Some(input), "ExceptionClass: message") — Beam's
    * WithFailures.Result output/failures pair flattened into one frame
    * so a single evaluation feeds both branches (callers filtering into
    * two datasets should cache the returned frame first).
    * Only NonFatal throwables are dead-lettered; errors propagate. */
  def tryMap[T, O](ds: Dataset[T], fn: T => O)(
      implicit enc: Encoder[(Option[O], Option[T], String)]): Dataset[(Option[O], Option[T], String)] =
    ds.map { t =>
      try { (Some(fn(t)), Option.empty[T], null.asInstanceOf[String]) }
      catch {
        case scala.util.control.NonFatal(ex) =>
          (Option.empty[O], Some(t), s"${ex.getClass.getName}: ${ex.getMessage}")
      }
    }

  /** Secondary sort (Beam: SortValues) — values sorted within each key
    * group without a global sort: sort_array over collected structs. */
  def sortedValuesPerKey(df: DataFrame, key: Column, sortCol: Column,
      valueCol: Column): DataFrame =
    df.groupBy(key)
      .agg(transform(sort_array(collect_list(struct(sortCol.as("s"), valueCol.as("v")))),
        x => x.getField("v")).as("sorted_values"))

  /** Hot-key fanout (Beam: Combine.withFanout — transforms/Combine.java):
    * two-stage aggregation through a salt key. Stage 1 aggregates on
    * (key, salt) — spreading each hot key over `fanout` reducers —
    * stage 2 merges the per-salt partials. Only valid for algebraic
    * aggregates (partial results merge with the same function: sum,
    * count, min, max). At 100 TB this is what keeps a 3-distinct-value
    * grouping key from serializing into 3 reducer tasks; AQE's skew
    * handling covers joins, but aggregation skew needs the salt.
    *
    * @param stage1Aggs aliased partial aggregates (e.g. sum(x).as("s"))
    * @param stage2Aggs merge aggregates over the stage-1 aliases
    *                   (e.g. sum("s").as("s"); count partials merge
    *                   with sum)
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], fanout: Int,
      stage1Aggs: Seq[Column], stage2Aggs: Seq[Column]): DataFrame = {
    val salt = pmod(hash(spark_partition_id(), monotonically_increasing_id()),
      lit(fanout)).as("__salt")
    df.withColumn("__salt", salt)
      .groupBy(keys :+ col("__salt"): _*)
      .agg(stage1Aggs.head, stage1Aggs.tail: _*)
      .groupBy(keys: _*)
      .agg(stage2Aggs.head, stage2Aggs.tail: _*)
  }

  /** Contiguous global row index 0..n−1 in `order` — the scalable form
    * of zipWithIndex / a pandas RangeIndex. The naive
    * `row_number() OVER (ORDER BY …)` with no PARTITION BY funnels
    * every row through ONE task (the global-window anti-pattern this
    * library bans); this instead range-partitions on the order keys,
    * sorts within partitions, and assigns per-partition offsets from a
    * lightweight count-per-partition job (the two-action zipWithIndex
    * contract) — index assignment is a narrow map, no bottleneck.
    * `order` must be a TOTAL order (include a unique tie-break) for
    * determinism; the range boundaries themselves may vary with
    * sampling, but the assigned index equals the global sort position
    * regardless of where the cuts land. */
  def globalRowIndex(df: DataFrame, idxCol: String,
      order: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        idxCol, org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }

  /** CDC/changelog APPLY — incremental snapshot maintenance: merge a
    * (much smaller) change set into a snapshot by key. `changes`
    * carries the snapshot's columns plus `opCol` ∈ {"I","U","D"}:
    * D removes the key, I/U upsert it (non-null change values override
    * the snapshot's; an I/U for an absent key inserts). The whole
    * apply is ONE full-outer equi-join on the key — at 100 TB,
    * co-partition/bucket both sides on the key and the nightly apply
    * is a zero-extra-exchange merge (the relational form of Delta/
    * Iceberg MERGE INTO, no table format required). */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val valCols = snapshot.columns.filterNot(_ == key)
    require(changes.columns.contains(opCol),
      s"changes must carry the op column '$opCol'")
    snapshot.as("s").join(changes.as("c"), Seq(key), "full_outer")
      .filter(coalesce(col(s"c.$opCol"), lit("")) =!= "D")
      .select(col(key) +: valCols.map(v =>
        coalesce(col(s"c.$v"), col(s"s.$v")).as(v)): _*)
  }
}
