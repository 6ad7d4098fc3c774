package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Similarity

/** Vector-similarity coverage over the `embeddings` table: norms,
  * brute-force cosine top-k (broadcast query set — the corpus is scanned
  * once, never shuffled), per-label centroids, embedding-cosine near-dup
  * pairs, and the SRP-LSH approximate variant as the 100 TB scale path.
  *
  * The DuckDB oracle reproduces Spark's `aggregate()` fold exactly with
  * `list_reduce` (both are sequential left folds in double), so cosine
  * values hash-match bit-for-bit after rounding.
  */
object VectorQueries {

  private def emb(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)

  /** DuckDB sequential left-fold sum of a double list expression. */
  private def foldSum(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $listExpr), (acc, x) -> acc + x)"

  private def dotSql(a: String, b: String): String =
    foldSum(s"list_transform(list_zip($a, $b), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))")

  private def norm2Sql(a: String): String =
    s"sqrt(${foldSum(s"list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")})"

  private def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${norm2Sql(a)} * ${norm2Sql(b)}))"

  def queries: Seq[Q] = Seq(

    Q("vec_norms",
      (s, d) => emb(s, d).select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(Similarity.l2Norm(col("embedding")), 6).as("norm")),
      Some(s"""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        round(${norm2Sql("embedding")}, 6) AS norm FROM embeddings""")),

    // Brute-force cosine top-k: small query set (vec_id % 100 = 0)
    // broadcast against the full corpus — the baseline ANN oracle.
    Q("vec_cosine_topk",
      (s, d) => Similarity.cosineTopK(
          emb(s, d).filter(col("vec_id") % 100 === 0), emb(s, d),
          "vec_id", "embedding", k = 5)
        .withColumn("rk", col("rk").cast("long")),
      Some(s"""WITH q AS (
          SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          WHERE vec_id % 100 = 0
        ), c AS (
          SELECT vec_id AS match_id, embedding AS cv FROM embeddings
        ), sc AS (
          SELECT query_id, match_id,
            round(${cosineSql("qv", "cv")}, 6) AS sim
          FROM q JOIN c ON query_id != match_id)
        SELECT query_id, match_id, sim,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, match_id ASC) AS BIGINT) AS rk
        FROM sc QUALIFY rk <= 5""")),

    // Per-label centroids (posexplode + partial-aggregated shuffle).
    Q("vec_centroids",
      (s, d) => Similarity.centroids(emb(s, d), "label", "embedding")
        .select(col("label").cast("long").as("label"),
          col("pos").cast("long").as("pos"), col("mean_v")),
      Some("""SELECT CAST(label AS BIGINT) AS label,
        CAST(g.i - 1 AS BIGINT) AS pos,
        round(avg(CAST(embedding[g.i] AS DOUBLE)), 6) AS mean_v
        FROM embeddings CROSS JOIN LATERAL
          (SELECT unnest(generate_series(1, len(embedding))) AS i) g
        GROUP BY 1, 2""")),

    // Embedding-cosine near-duplicate pairs (exact, brute force): the
    // correctness baseline for near-dedup; LSH below is the scale path.
    // Threshold 0.35 ≈ the top 0.1% of the data's pairwise-similarity
    // distribution (max observed 0.51), so the oracle compares a
    // non-empty result set and actually exercises the value path.
    // Registered form is the distributed block kernel — no driver
    // materialization anywhere in the plan (the single-node collect
    // kernel remains available for ≤broadcast-size corpora).
    Q("dedup_embedding_cosine",
      (s, d) => Similarity.cosinePairsAboveBlocked(emb(s, d), "vec_id", "embedding",
        threshold = 0.35),
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(${cosineSql("a.embedding", "b.embedding")}, 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(${cosineSql("a.embedding", "b.embedding")}, 6) >= 0.35""")),

    // Banded multi-table SRP-LSH approximate top-k: candidate
    // generation is an equi-join on (table, bucket) — never O(n²).
    // 8 bits × 8 tables here (bucket count sized to this corpus's
    // ~10³ near-orthogonal vectors; at 10⁹ rows raise bits to
    // ~log2(n/bucket_target) and add tables to recover recall — the
    // recall@1 spec in VectorSpec demonstrates 16-bit × 4 tables on
    // planted near-duplicates). Recall < 1 by construction →
    // rows-only check.
    Q("vec_ann_lsh",
      (s, d) => Similarity.lshCosineTopK(
        emb(s, d).filter(col("vec_id") % 100 === 0), emb(s, d),
        "vec_id", "embedding", k = 5, bits = 8, dim = 64, tables = 8),
      None),

    // IVF ANN: coarse-quantizer cells + multi-probe — the other scale
    // path; recall < 1 by construction → rows-only check.
    Q("vec_ann_ivf",
      (s, d) => Similarity.ivfCosineTopK(
        emb(s, d).filter(col("vec_id") % 100 === 0), emb(s, d),
        "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4),
      None),
  )
}
