package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond plain `Dataset.join`.
  *
  * Beam surface: `CoGroupByKey`
  * (reference: sdks/java/core/.../transforms/join/CoGroupByKey.java:71),
  * schema `Join`/`CoGroup` (schemas/transforms/Join.java,
  * CoGroup.java), the SQL join rels (extensions/sql/.../rel/BeamJoinRel.java:59)
  * and the side-input/broadcast path (BeamSideInputJoinRel.java:69).
  * Equi/outer/semi/anti/theta joins are native Spark; what we add are the
  * Beam-shaped cogroup and an as-of join (absent in Beam — SURVEY §2.4
  * flags it as a capability bonus) built shuffle-once.
  */
object Joins {

  /** Beam-style CoGroupByKey of two keyed inputs: one row per key with
    * the grouped values of each side as (sorted) arrays. Relationally:
    * full-outer join of two pre-grouped sides — two partial-aggregated
    * shuffles on the same key, then a key-aligned join (AQE will pick a
    * sort-merge or hash join; both sides are already reduced). */
  def coGroupByKey(left: DataFrame, right: DataFrame, key: String,
      leftVal: String, rightVal: String): DataFrame = {
    val l = left.groupBy(col(key))
      .agg(sort_array(collect_list(col(leftVal))).as("left_values"))
    val r = right.groupBy(col(key))
      .agg(sort_array(collect_list(col(rightVal))).as("right_values"))
    l.join(r, Seq(key), "full_outer")
      .select(col(key),
        coalesce(col("left_values"), array().cast(l.schema("left_values").dataType)).as("left_values"),
        coalesce(col("right_values"), array().cast(r.schema("right_values").dataType)).as("right_values"))
  }

  /** N-ary schema CoGroup (schemas/transforms/CoGroup.java:819): join
    * any number of keyed inputs into one row per key, each input's
    * grouped values as a sorted array, with PER-INPUT inner/outer
    * participation (Beam's `CoGroup.join(...)` with per-input
    * `fieldNames(...).withOptionalParticipation()`): an inner input
    * requires the key to be present in it; an outer input contributes
    * an empty array when absent.
    *
    * Plan shape: every input partial-aggregates to one row per key
    * BEFORE the chained key-aligned joins — N reduced shuffles on the
    * same key, never a row-level N-way join explosion. */
  def coGroup(inputs: Seq[(DataFrame, String)], key: String,
      inner: Seq[Boolean] = Seq.empty): DataFrame = {
    require(inputs.size >= 2, "coGroup needs at least two inputs")
    val innerFlags =
      if (inner.isEmpty) Seq.fill(inputs.size)(false) else inner
    require(innerFlags.size == inputs.size,
      "inner participation flags must match the input count")
    val grouped = inputs.zipWithIndex.map { case ((df, valCol), i) =>
      df.groupBy(col(key))
        .agg(sort_array(collect_list(col(valCol))).as(s"values_$i"))
    }
    val joined = grouped.reduce((a, b) => a.join(b, Seq(key), "full_outer"))
    val participating = innerFlags.zipWithIndex.foldLeft(joined) {
      case (df, (isInner, i)) =>
        if (isInner) df.filter(col(s"values_$i").isNotNull) else df
    }
    participating.select(col(key) +: grouped.indices.map { i =>
      coalesce(col(s"values_$i"),
        array().cast(grouped(i).schema(s"values_$i").dataType))
        .as(s"values_$i")
    }: _*)
  }

  /** As-of join: for each left row, attach the latest right row with
    * right.ts <= left.ts for the same key (nulls when none exists —
    * LEFT ASOF semantics).
    *
    * Implementation is the single-shuffle union trick (not a range
    * join): union both sides tagged, one window pass per key ordered by
    * (ts, side) carrying the last right payload struct forward. At
    * 100 TB this is one repartition-by-key + per-partition sort —
    * strictly cheaper than a range-condition join (which would BNLJ)
    * and skew-safe via AQE. Right side at equal ts wins (tag orders
    * right before left). Left payloads ride the union in a struct, so
    * duplicate (key, ts) left rows stay 1:1 with their outputs (a
    * join-back on (key, ts) would multiply them).
    *
    * @param leftCols  columns of `left` to keep in the output
    * @param valueCols columns of `right` to attach as `r_<name>`
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      leftCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val rPay = struct(valueCols.map(col): _*)
    val rSel = right.select(col(key), col(tsCol), rPay.as("__rpay"), lit(0).as("__side"))
    val rPayType = rSel.schema("__rpay").dataType
    val lSel = left.select(col(key), col(tsCol),
      lit(null).cast(rPayType).as("__rpay"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lpay"))
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    rSel.withColumn("__lpay", lit(null).cast(lSel.schema("__lpay").dataType))
      .unionByName(lSel)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(tsCol)) ++
        leftCols.map(c => col(s"__lpay.$c").as(c)) ++
        valueCols.map(c => col(s"__match.$c").as(s"r_$c")): _*)
  }

  /** Skew-safe (salted) equi-join: the fact side salts each row into
    * `fanout` sub-keys by a deterministic hash of `saltBy` (a unique
    * row identity — determinism keeps stage retries and speculative
    * tasks consistent), the dim side replicates every row across all
    * `fanout` salt values, and the join runs on (key, salt). A hot fact
    * key is spread over `fanout` reducers instead of landing on one —
    * the join-shaped sibling of `Combine.withFanout`
    * (transforms/Combine.java withHotKeyFanout) and the manual form of
    * AQE's skew-join splitting, for dims too large to broadcast joined
    * to facts whose key histogram is pathological. Cost model: the dim
    * shuffle grows ×`fanout` (it is the SMALL side by precondition);
    * the fact side's per-reducer load drops ×`fanout` on hot keys. At
    * 100 TB pick fanout ≈ (hottest-key rows) / (rows a reducer can
    * hold); AQE handles everything milder for free. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      fanout: Int, saltBy: Seq[Column]): DataFrame = {
    require(fanout > 0, "fanout must be positive")
    val sf = fact.withColumn("__salt",
      pmod(xxhash64(saltBy: _*), lit(fanout)).cast("int"))
    val sd = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(fanout - 1))))
    // SHUFFLE_HASH hint (r19 opt, guide §3.1): the dim is "too large to
    // broadcast" by this operator's own precondition, but Catalyst's
    // size estimator does not inflate through the ×fanout Generate and
    // silently planned a BroadcastHashJoin of the EXPLODED dim
    // (measured: a 68 MiB broadcast at sf0.01 — ×10 at the bench SF —
    // paying driver collect + full-relation build, and defeating the
    // very skew-spreading this operator exists to demonstrate). The
    // hint pins the salted (key, salt) SHUFFLE with a per-partition
    // hash build of the dim side — the actual salted-join plan, at any
    // scale.
    sf.join(sd.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** HYBRID skew join: salt only the keys that are actually hot.
    * `saltedJoin` replicates the ENTIRE dim ×fanout — at 100 TB that
    * tax is paid on every key when typically only a handful are
    * pathological. Here one partial-agg pass over the fact (O(distinct
    * keys) crosses the exchange) finds keys with more than
    * `hotThreshold` rows; that key set is small by construction (each
    * hot key exceeds the threshold, so there are at most
    * |fact|/threshold of them) and broadcasts to tag both sides. Hot
    * rows take the salted path (dim replicated ×fanout for THOSE keys
    * only), cold rows take the plain shuffle join, results union —
    * result-identical to the plain join at any threshold (the split is
    * an execution detail). This is the classic two-tier skew plan
    * (Spark AQE's skew splitting is the runtime form; this is the
    * declarative form for when downstream partitioning reuse disables
    * AQE's). */
  def hybridSkewJoin(fact: DataFrame, dim: DataFrame, key: String,
      fanout: Int, saltBy: Seq[Column], hotThreshold: Long): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be positive")
    // Tag column must not collide with user columns: derive a name that
    // exists in neither input (deterministic, unlike a UUID, so plans
    // stay stable across retries).
    val taken = (fact.columns ++ dim.columns).toSet
    val tag = Iterator.from(0).map(i => if (i == 0) "__hot" else s"__hot$i")
      .find(!taken.contains(_)).get
    // The hot-key set is tiny by construction (≤ |fact|/threshold keys
    // — the same size bound that makes it broadcastable) and referenced
    // twice below (fact tag + dim tag). NO persist (a session-lifetime
    // cache-block leak unless the caller unpersists — nobody does) and
    // NO driver collect (an eager synchronous job that can't pipeline
    // with the main query): the two broadcast references share one
    // compute via Spark's exchange reuse — identical canonical subplans
    // dedupe to a single shuffle + broadcast (ReusedExchange, asserted
    // in JoinsSpec), so the count pass runs once IN-PLAN.
    val hot = fact.groupBy(key).count()
      .filter(col("count") > hotThreshold)
      .select(col(key), lit(true).as(tag))
    val f = fact.join(broadcast(hot), Seq(key), "left")
    val d = dim.join(broadcast(hot), Seq(key), "left")
    saltedJoin(f.filter(col(tag)).drop(tag),
        d.filter(col(tag)).drop(tag), key, fanout, saltBy)
      .unionByName(
        f.filter(col(tag).isNull).drop(tag)
          .join(d.filter(col(tag).isNull).drop(tag), Seq(key)))
  }

  /** Fuzzy (edit-distance) equi-candidate join over a string column:
    * all unordered pairs of DISTINCT values of `strCol` within
    * Levenshtein distance `maxDist`. Candidate generation is the
    * length-band pigeonhole (|len(a)−len(b)| ≤ maxDist is necessary):
    * each value emits its own length, the probe side additionally
    * explodes to every length in [len−maxDist, len+maxDist], and
    * candidates meet on an equi-join over that band key — never an
    * all-pairs cross. Exact `levenshtein` then verifies.
    *
    * The 100 TB story is the DISTINCT projection: fuzzy matching runs
    * on the value vocabulary (≪ corpus — here 64 names for 2k parts),
    * which one partial-agg shuffle produces; results broadcast back to
    * the corpus if row-level pairing is needed. For vocabularies where
    * a length band is still too wide, layer q-gram / PassJoin segment
    * pruning on the same verify (the inverted-index shape
    * `ngramJaccardPairs` already demonstrates). */
  def fuzzyJoinEditDistance(df: DataFrame, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val names = df.select(col(strCol).as("name")).distinct()
    val a = names.select(col("name").as("name_a"),
      length(col("name")).as("__band"))
    val b = names.select(col("name").as("name_b"),
      explode(sequence(length(col("name")) - maxDist,
        length(col("name")) + maxDist)).as("__band"))
    a.join(b, Seq("__band"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

  /** Banded INTERVAL join (Flink's interval join; Beam users hand-roll
    * it with CoGBK + windows): pairs rows sharing `key` where
    * `right.ts ∈ [left.ts + lowerUs, left.ts + upperUs]` (timestamps
    * as LONG epoch units, bounds inclusive).
    *
    * Scale shape: a naive non-equi time join is a per-key cross
    * product (exactly what ScaleLint bans). Instead both sides band
    * into fixed time buckets of width = the interval span: the right
    * side bucketizes ONCE, the left side explodes to the ≤2 buckets
    * its window can touch, the join is a plain hash EQUI-join on
    * (key, bucket), and the exact bounds filter runs post-join. Work
    * is O(pairs-within-2-buckets), never O(per-key²); the explode
    * factor is a constant 2.
    *
    * Column name collisions: both inputs' columns survive with `_l` /
    * `_r` suffixes. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTsCol: String, rightTsCol: String, lowerUs: Long,
      upperUs: Long): DataFrame = {
    require(upperUs >= lowerUs,
      s"interval upper bound $upperUs < lower bound $lowerUs")
    require(leftTsCol != key && rightTsCol != key,
      s"interval join timestamp column must differ from key '$key'")
    val w = math.max(1L, upperUs - lowerUs + 1) // bucket width = span
    // Exact long floor-division toward -inf: Spark's `/` is double
    // division, inexact past 2^53 — a boundary row could land in the
    // wrong bucket and silently drop pairs. pmod + integral `div`
    // keeps the whole computation on longs.
    def floorDiv(x: Column): Column =
      call_function("div", x - pmod(x, lit(w)), lit(w))
    val l = left.columns.foldLeft(left) { (df, c) =>
      if (c == key) df else df.withColumnRenamed(c, c + "_l")
    }.withColumn("__b", explode(sequence(
      floorDiv(col(leftTsCol + "_l").cast("long") + lowerUs),
      floorDiv(col(leftTsCol + "_l").cast("long") + upperUs))))
    val r = right.columns.foldLeft(right) { (df, c) =>
      if (c == key) df else df.withColumnRenamed(c, c + "_r")
    }.withColumn("__b", floorDiv(col(rightTsCol + "_r").cast("long")))
    l.join(r, Seq(key, "__b"))
      .filter(col(rightTsCol + "_r") >= col(leftTsCol + "_l") + lowerUs &&
        col(rightTsCol + "_r") <= col(leftTsCol + "_l") + upperUs)
      .drop("__b")
  }

  /** Theta/range join helper — Spark-native arbitrary-condition join,
    * which Beam SQL rejects (BeamJoinRel only supports conjunctions of
    * equalities); exposed for parity documentation. */
  def thetaJoin(left: DataFrame, right: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    left.join(right, cond, joinType)

  /** Broadcast (side-input) join — Beam's View/side-input pattern
    * (transforms/View.java:139, BeamSideInputJoinRel.java:69). */
  def broadcastJoin(big: DataFrame, small: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    big.join(broadcast(small), cond, joinType)
}
