package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Corpus, Packing}
import Relational.Q

/** SURVEY §2.2 corpus-analysis and dataset-prep operators as
  * oracle-checked queries (greedy packing is rows-only — its sequential
  * first-fit loop has no SQL analog; PackSpec carries the gates).
  */
object CorpusPack {

  // t05/t06/p01 use plain load, NOT loadParallel: they all aggregate, so
  // a pre-repartition would shuffle full document text while the
  // aggregation's own exchange already distributes the (narrow) projected
  // rows — the d01 lesson (SURVEY §5) applied to corpus analysis
  private val t05 = Q(
    "t05_token_stats",
    (s, dir) => Corpus.tokenStats(
        Tables.load(s, dir, "documents"), "text", "lang")
      .orderBy("lang"),
    Some("""SELECT lang, COUNT(*) AS n_docs,
              MIN(n_tok) AS min_tokens, MAX(n_tok) AS max_tokens,
              quantile_cont(n_tok, 0.5) AS median_tokens
            FROM (SELECT lang,
                    len(list_filter(string_split(text, ' '), x -> x <> ''))
                      AS n_tok
                  FROM documents)
            GROUP BY lang ORDER BY lang"""))

  private val t06 = Q(
    "t06_heavy_hitters",
    (s, dir) => Corpus.heavyHitters(
      Tables.load(s, dir, "documents"), "text", k = 50),
    Some("""SELECT token, COUNT(*) AS n
            FROM (SELECT unnest(list_filter(string_split(text, ' '),
                    x -> x <> '')) AS token
                  FROM documents)
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 50"""))

  private val p01 = Q(
    "p01_split_assign",
    (s, dir) => Corpus.splitSummary(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy("split"),
    Some("""SELECT split, COUNT(*) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS n_tokens
            FROM (SELECT
                    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                           IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                         THEN 'train'
                         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                           IN ('c','d')
                         THEN 'val'
                         ELSE 'test' END AS split,
                    len(list_filter(string_split(text, ' '), x -> x <> ''))
                      AS n_tok
                  FROM documents)
            GROUP BY split ORDER BY split"""))

  private val p02 = Q(
    "p02_pack_chunk",
    (s, dir) => Packing.chunkPack(Tables.load(s, dir, "documents"),
        "doc_id", "text", budget = 2048, shardDocs = 100)
      .orderBy("shard", "seq_idx"),
    Some("""WITH t AS (SELECT doc_id,
                         doc_id // 100 AS shard,
                         len(list_filter(string_split(text, ' '), x -> x <> ''))
                           AS n_tok
                       FROM documents),
              c AS (SELECT *,
                      SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
                    FROM t)
            SELECT shard, CAST((cum - n_tok) // 2048 AS BIGINT) AS seq_idx,
              COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
              MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
            FROM c GROUP BY 1, 2 ORDER BY 1, 2"""))

  private val p03 = Q(
    "p03_pack_greedy",
    (s, dir) => Packing.greedyPack(s, Tables.load(s, dir, "documents"),
        "doc_id", "text", budget = 2048, shardDocs = 100)
      .groupBy("shard", "bin_idx")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy("shard", "bin_idx"),
    None) // sequential first-fit loop -> rows-only (gates in PackSpec)

  val all: Seq[Q] = Seq(t05, t06, p01, p02, p03)
}
