package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity operators over `array<float>` embedding columns.
  *
  * Beam analog: the embeddings/RAG surface
  * (reference: sdks/python/apache_beam/ml/transforms/base.py:259
  * EmbeddingsManager, ml/rag/) produces embedding columns; similarity
  * search itself is the capability a training-data pipeline adds on top.
  *
  * Scale design:
  *  - brute-force top-k broadcasts the (small) query set and computes
  *    dot products with codegen'd higher-order functions — a single scan
  *    of the corpus, no shuffle of the corpus itself;
  *  - the LSH variant buckets by random-hyperplane signs so candidate
  *    generation is an equi-join on (bucket), avoiding the full cross
  *    product when both sides are large.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Brute-force cosine top-k: for every row of `queries`, the k nearest
    * rows of `corpus` (excluding self-matches by id). `queries` is
    * broadcast — corpus is scanned once; the only shuffle is the final
    * per-query top-k (tiny: k rows per query). Rounding before ranking
    * keeps the result oracle-stable across fp summation orders. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("match_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("match_id"))
      .select(col("query_id"), col("match_id"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("match_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("match_id"), col("sim"),
        col("rk").cast("int").as("rk"))
  }

  /** Per-label centroids: mean of each vector component. Shuffles once on
    * (label, pos) after a posexplode — partial aggregation collapses each
    * partition to at most |labels|·dim rows before the exchange. */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg(col("v").cast("double")), 6).as("mean_v"))

  /** Sign-random-projection LSH bucket id: `bits` hyperplanes with
    * deterministic ±1 weights derived from md5 — engine-portable and
    * reproducible. Bucketing both sides turns ANN search into an
    * equi-join on (bucket). */
  def srpBucket(vec: Column, bits: Int = 8, seed: Int = 7): Column = {
    val bitCols = (0 until bits).map { b =>
      // deterministic ±1 weight per (plane b, component i): parity of md5
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
          val h = graft.functions.PortableHash.md5Long(
            concat(lit(s"$seed:$b:"), i.cast("string")))
          when(h.bitwiseAND(1L) === 1L, x.cast("double")).otherwise(-x.cast("double"))
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** ANN top-k via SRP-LSH: join query and corpus rows sharing a bucket,
    * rank by exact cosine within candidates. Recall < 1 by construction;
    * scale path for corpus × corpus search where brute force is O(n²). */
  def lshCosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      srpBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("match_id"), col(vecCol).as("cv"),
      srpBucket(col(vecCol), bits).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("match_id"))
      .select(col("query_id"), col("match_id"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("match_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }
}
