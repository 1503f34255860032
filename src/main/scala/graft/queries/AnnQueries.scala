package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Ann

/** Similarity-search queries over the embeddings table (operators.Ann).
  *
  * Query set = every 50th vector (broadcastable small side); candidates =
  * the whole table. Brute-force cosine top-k is replayed exactly in DuckDB
  * (list_cosine_similarity); LSH / IVF depend on engine-side hyperplanes /
  * centroids so they get rows-only driver checks, with ScalaTest asserting
  * recall against the brute-force baseline.
  */
object AnnQueries extends Registry {

  private def queriesOf(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0)

  val defs: Map[String, QueryFn] = Map(
    "ann_brute_topk" -> ((s, d) =>
      Ann.bruteForceTopK(Tables.embeddings(s, d), queriesOf(s, d),
        "vec_id", "embedding", k = 5)),

    "ann_lsh_topk" -> ((s, d) =>
      Ann.lshTopK(Tables.embeddings(s, d), queriesOf(s, d),
        "vec_id", "embedding", k = 5)),

    "ann_ivf_topk" -> ((s, d) =>
      Ann.ivfTopK(Tables.embeddings(s, d), queriesOf(s, d),
        "vec_id", "embedding", k = 5)),

    // Full-corpus per-label centroids (the distributed IVF-build /
    // cluster-audit reduction): long form (label, dim, c).
    "ann_centroids" -> ((s, d) =>
      Ann.centroids(Tables.embeddings(s, d), "label", "embedding")),
  )

  val oracles: Map[String, String] = Map(
    "ann_brute_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id % 50 = 0),
          c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
                FROM embeddings),
          r AS (SELECT query_id, cand_id,
                       list_cosine_similarity(qv, cv) AS s,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY list_cosine_similarity(qv, cv) DESC,
                                  cand_id ASC) AS rank
                FROM q CROSS JOIN c
                WHERE query_id <> cand_id)
          SELECT query_id, rank, cand_id, round(s, 4) AS sim
          FROM r WHERE rank <= 5
          ORDER BY query_id, rank""",

    // ann_lsh_topk / ann_ivf_topk: engine-side hyperplanes & centroids —
    // rows-only driver check; recall vs brute force asserted in ScalaTest.

    // Correlated unnest(range(...)) drives the 1-based element index per
    // row (dimension-generic, not pinned to 64); Spark's posexplode is
    // 0-based, hence i - 1. Both engines widen FLOAT to DOUBLE before
    // averaging.
    "ann_centroids" ->
      """SELECT label, i - 1 AS dim,
                round(avg(embedding[i]::DOUBLE), 4) + 0 AS c
         FROM (SELECT label, embedding,
                      unnest(range(1, len(embedding) + 1)) AS i
               FROM embeddings) t
         GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
