package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Deduplication operators — exact and near-duplicate — designed for
  * 100 TB corpora.
  *
  * Beam surface being matched: `Distinct` (+ representative values)
  * (reference: sdks/java/core/.../transforms/Distinct.java:67),
  * `Deduplicate` (transforms/Deduplicate.java:70), plus the near-dedup
  * capability a training-data pipeline needs (MinHash/LSH, SimHash,
  * n-gram Jaccard).
  *
  * Scale notes:
  *  - exact dedup = one hash-partitioned shuffle on the key (map-side
  *    partial aggregation lifts most of the volume before the exchange);
  *  - MinHash/LSH turns O(n²) pair enumeration into an equi-join on band
  *    buckets — the only quadratic work left is within buckets;
  *  - all hashes come from [[PortableHash]] so every stage is verifiable
  *    against an external SQL oracle.
  */
object Dedup {

  /** Exact dedup keeping the smallest tie-break value per key group.
    * Deterministic (unlike `dropDuplicates`, whose survivor depends on
    * partition order — fine for semantics, wrong for golden tests).
    */
  def exactByKey(df: DataFrame, keys: Seq[String], tieBreak: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature matrix: one row per doc, `numHashes` minima over
    * word `shingleSize`-gram shingles. Pure column expressions
    * (explode-free: array `transform` + `array_min`), so it is a single
    * narrow projection — no shuffle at all. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleSize: Int = 3): DataFrame = {
    val sh = TextAnalysis.shingles(col(textCol), shingleSize)
    val sigCols = (0 until numHashes).map { i =>
      array_min(transform(sh, s =>
        PortableHash.md5Long(concat(lit(i.toString), lit(":"), s))))
        .as(s"h$i")
    }
    df.select((col(idCol) +: sigCols): _*)
  }

  /** LSH band buckets from a signature frame produced by
    * [[minHashSignatures]]: `numBands` rows per doc keyed by
    * (band, bucket-hash). Docs sharing any bucket are candidate pairs. */
  def minHashBuckets(sig: DataFrame, idCol: String, numHashes: Int,
      numBands: Int): DataFrame = {
    require(numHashes % numBands == 0)
    val rowsPerBand = numHashes / numBands
    val bands = (0 until numBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(b).as("band"), md5(concat_ws("_", cols: _*)).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bands: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate near-dup pairs via MinHash LSH: equi-join on band buckets,
    * then estimate Jaccard as fraction of agreeing signature components.
    * Returns (idA, idB, est_jaccard) with idA < idB, deduplicated across
    * bands. The join is a plain shuffle-hash equi-join on the bucket key
    * — linear in candidates, never materializes the O(n²) pair space. */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, numBands: Int = 4,
      minEstJaccard: Double = 0.0): DataFrame = {
    val sig = minHashSignatures(df, idCol, textCol, numHashes).cache()
    val buckets = minHashBuckets(sig, idCol, numHashes, numBands)
    val a = buckets.as("a")
    val b = buckets.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val sigA = sig.toDF(sig.columns.map(c => if (c == idCol) "id_a" else s"a_$c"): _*)
    val sigB = sig.toDF(sig.columns.map(c => if (c == idCol) "id_b" else s"b_$c"): _*)
    val agree = (0 until numHashes)
      .map(i => when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(sigA, "id_a").join(sigB, "id_b")
      .select(col("id_a"), col("id_b"),
        round(agree.cast("double") / numHashes, 6).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** SimHash over whitespace tokens using `bits` bits of the portable
    * hash. Per-bit majority vote of token hashes; one narrow projection.
    */
  def simHash(text: Column, bits: Int = 16): Column = {
    val toks = TextAnalysis.tokens(text)
    val hashes = transform(toks, t => PortableHash.md5Long(t))
    val bitCols = (0 until bits).map { b =>
      // sum over tokens of (bit b set ? 1 : -1), then sign → bit b
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L) * (1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Exact n-gram Jaccard similarity pairs above a threshold, via
    * shingle inverted index: explode distinct shingles, self-join on
    * shingle, count intersections, compute |A∩B| / (|A|+|B|-|A∩B|).
    * One shuffle on the shingle key + one on the pair key. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.1): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("sh"))
    val sizes = sh.groupBy("id").agg(count("*").as("sz"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count("*").as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
