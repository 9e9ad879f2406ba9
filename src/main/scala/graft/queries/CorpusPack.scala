package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Clusters, Corpus, Dedup, LangIdModel, Packing, QualityModel, TextOps, UnigramTokenizer}
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

  /** Shared CTE prefix: all-pairs bigram-Jaccard >= 1/2 (d02's oracle
    * machinery), reused by the two cross-relation dedup oracles below.
    */
  private val pairsCte =
    """t AS (SELECT doc_id, string_split(text, ' ') l FROM documents),
       raw AS (SELECT doc_id, unnest(l) w, generate_subscripts(l, 1) i FROM t),
       tok AS (SELECT doc_id, w,
                 row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
               FROM raw WHERE w <> ''),
       big AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w g
               FROM tok a JOIN tok b
                 ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
       sz AS (SELECT doc_id, COUNT(*) n FROM big GROUP BY 1),
       com AS (SELECT a.doc_id ia, b.doc_id ib, COUNT(*) c
               FROM big a JOIN big b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
       pairs AS (SELECT ia, ib,
                   CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS j
                 FROM com JOIN sz sa ON ia = sa.doc_id
                          JOIN sz sb ON ib = sb.doc_id
                 WHERE c * 2 >= (sa.n + sb.n - c) * 1)"""

  /** Shared per-doc gopher-stat mirror (t14 + t15): `gp` carries doc_id,
    * source, lang, n_chars, the six stats, req_stops, and the pass flag
    * at the corpus-adapted thresholds (minWords=10, minStops=1).
    */
  private val gopherCte =
    """gc AS (
         SELECT doc_id, source, lang, length(text) AS n_chars,
           list_filter(string_split(text, ' '), x -> x <> '') AS words,
           string_split(text, chr(10)) AS ls,
           (length(text) - length(replace(text, '#', '')))
             + len(regexp_extract_all(text, '\.\.\.')) AS n_sym
         FROM documents),
       gs AS (
         SELECT doc_id, source, lang, n_chars,
           len(words) AS n_words,
           CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
             / greatest(CAST(len(words) AS DOUBLE), 1.0) AS mean_word_len,
           CAST(n_sym AS DOUBLE)
             / greatest(CAST(len(words) AS DOUBLE), 1.0) AS symbol_ratio,
           CAST(len(list_filter(ls, x -> starts_with(x, '- ')
                 OR starts_with(x, '* ') OR starts_with(x, '• ')))
                AS DOUBLE)
             / greatest(CAST(len(ls) AS DOUBLE), 1.0) AS bullet_frac,
           CAST(len(list_filter(ls, x -> ends_with(x, '...'))) AS DOUBLE)
             / greatest(CAST(len(ls) AS DOUBLE), 1.0) AS ellipsis_frac,
           CAST(len(list_filter(words,
                 x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
             / greatest(CAST(len(words) AS DOUBLE), 1.0) AS alpha_frac,
           CAST(list_contains(words, 'the') AS INT)
           + CAST(list_contains(words, 'be') AS INT)
           + CAST(list_contains(words, 'to') AS INT)
           + CAST(list_contains(words, 'of') AS INT)
           + CAST(list_contains(words, 'and') AS INT)
           + CAST(list_contains(words, 'that') AS INT)
           + CAST(list_contains(words, 'have') AS INT)
           + CAST(list_contains(words, 'with') AS INT) AS req_stops
         FROM gc),
       gp AS (
         SELECT *,
           n_words >= 10 AND n_words <= 100000
           AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
           AND symbol_ratio < 0.1
           AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
           AND alpha_frac >= 0.8 AND req_stops >= 1 AS pass
         FROM gs)"""

  private val d06 = Q(
    "d06_dedup_incremental",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      // cutoff at 80% of the id space: ids below are the standing corpus,
      // above are the newly ingested batch — the shape of every append-only
      // ingestion run. broadcast: one scalar row
      val thr = broadcast(docs.agg(expr("max(doc_id) * 8 DIV 10").as("thr")))
      val withThr = docs.crossJoin(thr)
      val corpus = withThr.filter(col("doc_id") <= col("thr"))
      val batch = withThr.filter(col("doc_id") > col("thr"))
      val contaminated = Dedup.crossJaccard(batch, corpus,
          "text", "doc_id", tauNum = 1, tauDen = 2)
        .select(col("id_a").as("doc_id")).distinct()
      batch.join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id").orderBy("doc_id")
    },
    Some(s"""WITH thr AS (SELECT max(doc_id) * 8 // 10 AS t FROM documents),
               $pairsCte,
               cont AS (SELECT CASE WHEN ia > t THEN ia ELSE ib END AS bid
                        FROM pairs, thr WHERE (ia > t) <> (ib > t))
             SELECT doc_id FROM documents, thr
             WHERE doc_id > t
               AND NOT EXISTS (SELECT 1 FROM cont WHERE bid = doc_id)
             ORDER BY 1"""))

  private val d07 = Q(
    "d07_decontaminate",
    (s, dir) => Corpus.decontaminate(Tables.load(s, dir, "documents"),
        "doc_id", "text", tauNum = 1, tauDen = 2)
      .orderBy("train_id", "test_id"),
    Some(s"""WITH $pairsCte,
               lab AS (SELECT doc_id,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                        IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                      THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                        IN ('c','d')
                      THEN 'val' ELSE 'test' END AS split
                 FROM documents)
             SELECT CASE WHEN la.split = 'train' THEN ia ELSE ib END AS train_id,
               CASE WHEN la.split = 'train' THEN ib ELSE ia END AS test_id,
               j AS jaccard
             FROM pairs JOIN lab la ON la.doc_id = ia
                        JOIN lab lb ON lb.doc_id = ib
             WHERE (la.split = 'train' AND lb.split = 'test')
                OR (la.split = 'test' AND lb.split = 'train')
             ORDER BY 1, 2"""))

  private val d09 = Q(
    "d09_dedup_bloom",
    // re-ingestion run: the whole table arrives as a batch, the first 80%
    // of the id space is already in the corpus — ids <= thr are exact
    // dups (caught by bloom + md5 verify), ids > thr are admitted. The
    // bloom sketch admits definite-new docs with zero join work.
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val thr = broadcast(docs.agg(expr("max(doc_id) * 8 DIV 10").as("thr")))
      val corpus = docs.crossJoin(thr).filter(col("doc_id") <= col("thr"))
      Dedup.exactIncremental(docs, corpus, "text", "doc_id",
          expectedItems = 100000L, fpp = 0.01)
        .select("doc_id").orderBy("doc_id")
    },
    Some("""WITH thr AS (SELECT max(doc_id) * 8 // 10 AS t FROM documents)
            SELECT doc_id FROM documents b, thr
            WHERE NOT EXISTS (SELECT 1 FROM documents c
                              WHERE c.doc_id <= thr.t AND c.text = b.text)
            ORDER BY 1"""))

  private val d12 = Q(
    "d12_ngram_decontaminate",
    // exact 5-gram overlap between train and test splits — the "one
    // shared long n-gram IS the leak" check, complementing d07's
    // whole-document Jaccard similarity
    (s, dir) => {
      val labeled = Tables.load(s, dir, "documents")
        .withColumn("split", Corpus.splitLabel(col("doc_id")))
      Dedup.crossNGramOverlap(
          labeled.filter(col("split") === "train"),
          labeled.filter(col("split") === "test"),
          "text", "doc_id", n = 5)
        .withColumnRenamed("id_a", "train_id")
        .withColumnRenamed("id_b", "test_id")
        .orderBy("train_id", "test_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') l
                       FROM documents),
              raw AS (SELECT doc_id, unnest(l) w, generate_subscripts(l, 1) i
                      FROM t),
              tok AS (SELECT doc_id, w,
                        row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
                      FROM raw WHERE w <> ''),
              g5 AS (SELECT doc_id,
                       w || ' ' || LEAD(w, 1) OVER win
                         || ' ' || LEAD(w, 2) OVER win
                         || ' ' || LEAD(w, 3) OVER win
                         || ' ' || LEAD(w, 4) OVER win AS g,
                       LEAD(w, 4) OVER win AS tail
                     FROM tok
                     WINDOW win AS (PARTITION BY doc_id ORDER BY rn)),
              gd AS (SELECT DISTINCT doc_id, g FROM g5 WHERE tail IS NOT NULL),
              lab AS (SELECT doc_id,
                        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                               IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                             THEN 'train'
                             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                               IN ('c','d')
                             THEN 'val' ELSE 'test' END AS split
                      FROM documents)
            SELECT a.doc_id AS train_id, b.doc_id AS test_id,
              COUNT(*) AS n_shared
            FROM gd a JOIN lab la ON a.doc_id = la.doc_id
                      JOIN gd b ON a.g = b.g
                      JOIN lab lb ON b.doc_id = lb.doc_id
            WHERE la.split = 'train' AND lb.split = 'test'
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  private val d37 = Q(
    "d37_transitive_contamination",
    // transitive contamination: min-hop BFS from direct-leak seeds over
    // the near-dup graph — exact n-gram checks (d12/d27) miss the
    // near-duplicates OF leaked docs (Lee et al. 2022 §6.2; rephrased
    // samples evade n-gram matching by construction). Seeds = train
    // docs near-dup to a TEST doc; edges = train-train near-dups at a
    // deliberately WIDE tau (1/10 — suspicion casts a larger net than
    // dedup, the hop tiers recover precision); 3 hops. Pair generation
    // uses the inverted-index COUNT join (nGramJaccard), NOT the d34
    // prefix filter: at tau = 0.1 the prefix keeps ~90% of each gram
    // set, so prefix+positional filtering prunes nothing and its
    // per-candidate hashed-set verify costs ~7x the count join's
    // aggregation (measured 51.6 s -> see bench) — the selection rule
    // is: prefix filter for tight dedup thresholds, count join for
    // wide suspicion nets
    (s, dir) => {
      val labeled = Tables.load(s, dir, "documents")
        .withColumn("split", Corpus.splitLabel(col("doc_id")))
        .filter(col("split").isin("train", "test"))
      val splits = labeled.select(col("doc_id"), col("split"))
      // pairs feed seeds AND edges: persist, never checkpoint, the
      // multi-consumer rule
      val pairs = Dedup.nGramJaccard(labeled, "text", "doc_id", 1, 10)
        .join(splits.select(col("doc_id").as("id_a"),
          col("split").as("sp_a")), "id_a")
        .join(splits.select(col("doc_id").as("id_b"),
          col("split").as("sp_b")), "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val seeds = pairs
        .filter(col("sp_a") === "train" && col("sp_b") === "test")
        .select(col("id_a").as("doc_id"))
        .unionByName(pairs
          .filter(col("sp_a") === "test" && col("sp_b") === "train")
          .select(col("id_b").as("doc_id")))
      val edges = pairs
        .filter(col("sp_a") === "train" && col("sp_b") === "train")
        .select("id_a", "id_b")
      // contaminationHops materializes internally (and frees its own
      // tiers) — once it returns, the pair cache has served both
      // consumers and can go too; the returned frame is self-contained
      val hops = Dedup.contaminationHops(edges, seeds, "doc_id", maxHop = 3)
      pairs.unpersist(blocking = false)
      hops.withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    Some("""WITH docs AS (SELECT doc_id, text,
              CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                  IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                  IN ('c','d') THEN 'val' ELSE 'test' END AS split
              FROM documents),
            t AS (SELECT doc_id, split, string_split(text, ' ') l
                  FROM docs WHERE split IN ('train','test')),
            raw AS (SELECT doc_id, split, unnest(l) w,
                generate_subscripts(l, 1) i FROM t),
            tok AS (SELECT doc_id, split, w,
                row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
              FROM raw WHERE w <> ''),
            big AS MATERIALIZED (SELECT DISTINCT a.doc_id, a.split,
                a.w || ' ' || b.w g
              FROM tok a JOIN tok b
                ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
            sz AS (SELECT doc_id, COUNT(*) n FROM big GROUP BY 1),
            com AS (SELECT a.doc_id ia, a.split spa, b.doc_id ib,
                b.split spb, COUNT(*) c
              FROM big a JOIN big b
                ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4),
            jp AS MATERIALIZED (SELECT ia, spa, ib, spb
              FROM com JOIN sz za ON ia = za.doc_id
                JOIN sz zb ON ib = zb.doc_id
              WHERE c*10 >= (za.n + zb.n - c)),
            seeds AS MATERIALIZED (SELECT DISTINCT
                CASE WHEN spa = 'train' THEN ia ELSE ib END doc_id
              FROM jp WHERE (spa = 'train' AND spb = 'test')
                OR (spa = 'test' AND spb = 'train')),
            edges AS MATERIALIZED (SELECT ia, ib FROM jp
              WHERE spa = 'train' AND spb = 'train'),
            sym AS MATERIALIZED (SELECT ia s, ib d FROM edges
              UNION ALL SELECT ib, ia FROM edges),
            h1 AS MATERIALIZED (SELECT DISTINCT d doc_id
              FROM sym JOIN seeds ON s = seeds.doc_id
              WHERE d NOT IN (SELECT doc_id FROM seeds)),
            h2 AS MATERIALIZED (SELECT DISTINCT d doc_id
              FROM sym JOIN h1 ON s = h1.doc_id
              WHERE d NOT IN (SELECT doc_id FROM seeds)
                AND d NOT IN (SELECT doc_id FROM h1)),
            h3 AS (SELECT DISTINCT d doc_id
              FROM sym JOIN h2 ON s = h2.doc_id
              WHERE d NOT IN (SELECT doc_id FROM seeds)
                AND d NOT IN (SELECT doc_id FROM h1)
                AND d NOT IN (SELECT doc_id FROM h2))
            SELECT doc_id, CAST(0 AS BIGINT) AS hop FROM seeds
            UNION ALL SELECT doc_id, 1 FROM h1
            UNION ALL SELECT doc_id, 2 FROM h2
            UNION ALL SELECT doc_id, 3 FROM h3
            ORDER BY doc_id"""))

  private val d27 = Q(
    "d27_decontaminate_bloom",
    // d12's train/test n-gram leak join with the 100 TB shuffle fixed:
    // the test side's gram hashes build a broadcast Bloom filter and
    // only might-contain train grams enter the exchange — exact by
    // construction (the equi-join verifies every survivor; a Bloom "no"
    // is definitive), so the oracle is the plain overlap SQL. n=4 and
    // minShared=2 exercise a different operating point than d12
    (s, dir) => {
      val labeled = Tables.load(s, dir, "documents")
        .withColumn("split", Corpus.splitLabel(col("doc_id")))
      Dedup.crossNGramOverlapBloom(
          labeled.filter(col("split") === "train"),
          labeled.filter(col("split") === "test"),
          "text", "doc_id", n = 4, minShared = 2L,
          expectedItems = 100000L)
        .withColumnRenamed("id_a", "train_id")
        .withColumnRenamed("id_b", "test_id")
        .orderBy("train_id", "test_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') l
                       FROM documents),
              raw AS (SELECT doc_id, unnest(l) w, generate_subscripts(l, 1) i
                      FROM t),
              tok AS (SELECT doc_id, w,
                        row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
                      FROM raw WHERE w <> ''),
              g4 AS (SELECT doc_id,
                       w || ' ' || LEAD(w, 1) OVER win
                         || ' ' || LEAD(w, 2) OVER win
                         || ' ' || LEAD(w, 3) OVER win AS g,
                       LEAD(w, 3) OVER win AS tail
                     FROM tok
                     WINDOW win AS (PARTITION BY doc_id ORDER BY rn)),
              gd AS (SELECT DISTINCT doc_id, g FROM g4 WHERE tail IS NOT NULL),
              lab AS (SELECT doc_id,
                        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                               IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                             THEN 'train'
                             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                               IN ('c','d')
                             THEN 'val' ELSE 'test' END AS split
                      FROM documents)
            SELECT a.doc_id AS train_id, b.doc_id AS test_id,
              COUNT(*) AS n_shared
            FROM gd a JOIN lab la ON a.doc_id = la.doc_id
                      JOIN gd b ON a.g = b.g
                      JOIN lab lb ON b.doc_id = lb.doc_id
            WHERE la.split = 'train' AND lb.split = 'test'
            GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY 1, 2"""))

  private val d20 = Q(
    "d20_ngram_coverage",
    // per-eval-doc contamination coverage: the release-decision metric
    // d12's pair counts feed into — fraction of each test doc's distinct
    // 5-grams appearing anywhere in the train split
    (s, dir) => {
      val labeled = Tables.load(s, dir, "documents")
        .withColumn("split", Corpus.splitLabel(col("doc_id")))
      Dedup.ngramCoverage(
          labeled.filter(col("split") === "test"),
          labeled.filter(col("split") === "train"),
          "text", "doc_id", n = 5)
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') l
                       FROM documents),
              raw AS (SELECT doc_id, unnest(l) w, generate_subscripts(l, 1) i
                      FROM t),
              tok AS (SELECT doc_id, w,
                        row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
                      FROM raw WHERE w <> ''),
              g5 AS (SELECT doc_id,
                       w || ' ' || LEAD(w, 1) OVER win
                         || ' ' || LEAD(w, 2) OVER win
                         || ' ' || LEAD(w, 3) OVER win
                         || ' ' || LEAD(w, 4) OVER win AS g,
                       LEAD(w, 4) OVER win AS tail
                     FROM tok
                     WINDOW win AS (PARTITION BY doc_id ORDER BY rn)),
              gd AS (SELECT DISTINCT doc_id, g FROM g5 WHERE tail IS NOT NULL),
              lab AS (SELECT doc_id,
                        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                               IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                             THEN 'train'
                             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                               IN ('c','d')
                             THEN 'val' ELSE 'test' END AS split
                      FROM documents),
              tg AS (SELECT DISTINCT g FROM gd JOIN lab USING (doc_id)
                     WHERE split = 'train'),
              ev AS (SELECT doc_id, g FROM gd JOIN lab USING (doc_id)
                     WHERE split = 'test'),
              tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM ev GROUP BY 1),
              cov AS (SELECT doc_id, COUNT(*) AS n_covered
                      FROM ev SEMI JOIN tg USING (g) GROUP BY 1)
            SELECT doc_id,
              COALESCE(n_grams, 0) AS n_grams,
              COALESCE(n_covered, 0) AS n_covered,
              CAST(COALESCE(n_covered, 0) AS DOUBLE)
                / CAST(greatest(COALESCE(n_grams, 0), 1) AS DOUBLE)
                AS coverage
            FROM lab LEFT JOIN tot USING (doc_id)
                     LEFT JOIN cov USING (doc_id)
            WHERE split = 'test' ORDER BY doc_id"""))

  private val d15 = Q(
    "d15_dedup_normalized",
    // near-exact dedup: normalize (lowercase, collapse whitespace, trim)
    // then hash — catches re-encode/copy-paste variants exact hashing
    // misses. A deterministic slice of uppercased double-spaced variants
    // is unioned in so the normalization classes are non-trivial; each
    // variant must fold into its base doc's class (n_copies = 2)
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 16 === 1)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(upper(col("text")), lit("  ")).as("text"))
      Dedup.exactNormalized(docs.unionByName(variants), "text", "doc_id")
        .orderBy("content_hash")
    },
    Some("""WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, upper(text) || '  ' AS text
              FROM documents WHERE doc_id % 16 = 1),
            n AS (SELECT doc_id,
                    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                      AS content_hash
                  FROM corpus)
            SELECT content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
            FROM n GROUP BY 1 ORDER BY 1"""))

  private val d19 = Q(
    "d19_dedup_unicode",
    // d15's UNICODE rung (r8): NFKC + case fold + whitespace collapse —
    // the corpus is ASCII (where NFKC is the identity and the DuckDB
    // oracle's nfc_normalize+lower reproduces the fold exactly), and two
    // injected variant slices make the Unicode classes non-trivial: per
    // selected doc, an uppercased DECOMPOSED-accent suffix variant and a
    // lowercase COMPOSED one — textually different strings that must
    // land in one class (n_copies = 2). NFKC-only folds (ligatures,
    // fullwidth) have no DuckDB mirror and are unit-spec'd instead
    // (OpsSpec/FunctionsSpec).
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      // "CAFE" + combining acute on the E, doubled spaces, uppercase
      val varA = docs.filter(col("doc_id") % 16 === 1)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(upper(col("text")), lit("  CAFÉ")).as("text"))
      // composed é, already lowercase, single space
      val varB = docs.filter(col("doc_id") % 16 === 1)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" café")).as("text"))
      Dedup.exactNormalizedUnicode(
        docs.unionByName(varA).unionByName(varB), "text", "doc_id")
        .orderBy("content_hash")
    },
    Some("""WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id,
                     upper(text) || '  CAFE' || chr(769) AS text
              FROM documents WHERE doc_id % 16 = 1
              UNION ALL
              SELECT doc_id + 200000 AS doc_id,
                     text || ' caf' || chr(233) AS text
              FROM documents WHERE doc_id % 16 = 1),
            n AS (SELECT doc_id,
                    md5(trim(regexp_replace(
                      lower(nfc_normalize(text)), '\s+', ' ', 'g')))
                      AS content_hash
                  FROM corpus)
            SELECT content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
            FROM n GROUP BY 1 ORDER BY 1"""))

  private val d16 = Q(
    "d16_scrub_lines",
    // C4-style repeated-line removal: the corpus text (one unique long
    // line per doc) is wrapped in synthetic boilerplate — a banner on
    // every doc (df=500), a notice on 1/3 of docs (df≈167), a 7-variant
    // footer (df≈71) — plus a per-doc unique tail. maxLineDf=10 scrubs
    // all three boilerplate lines and keeps the two unique ones, in order
    (s, dir) => {
      val src = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n",
          lit("subscribe to our newsletter"),
          col("text"),
          when(col("doc_id") % 3 === 0, lit("all rights reserved")),
          concat(lit("footer variant "), (col("doc_id") % 7).cast("string")),
          concat(lit("unique tail "), col("doc_id").cast("string")))
          .as("text"))
      Dedup.scrubRepeatedLines(src, "text", "doc_id", maxLineDf = 10)
        .orderBy("doc_id")
    },
    Some("""WITH src AS (
              SELECT doc_id, concat_ws(chr(10),
                'subscribe to our newsletter',
                text,
                CASE WHEN doc_id % 3 = 0 THEN 'all rights reserved' END,
                'footer variant ' || CAST(doc_id % 7 AS VARCHAR),
                'unique tail ' || CAST(doc_id AS VARCHAR)) AS text
              FROM documents),
            l AS (SELECT doc_id,
                    unnest(string_split(text, chr(10))) AS line,
                    generate_subscripts(string_split(text, chr(10)), 1) AS pos
                  FROM src),
            hot AS (SELECT line FROM (
                      SELECT line, COUNT(DISTINCT doc_id) AS d
                      FROM l GROUP BY 1)
                    WHERE d > 10)
            SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
            FROM l WHERE line NOT IN (SELECT line FROM hot)
            GROUP BY doc_id ORDER BY doc_id"""))

  private val d17 = Q(
    "d17_scrub_spans",
    // ExactSubstr-style repeated token-SPAN removal — the sub-line
    // boilerplate d16 can't see: a hot phrase is spliced MID-token-stream
    // between each doc's unique text and a unique tail token (plus a
    // second phrase on 1/3 of docs), never on a line boundary. n=5,
    // maxSpanDf=10: every 5-window fully inside a phrase is corpus-hot
    // (df=500 / ≈167) and its token span is scrubbed; windows straddling
    // into unique neighbors stay cold, so the surrounding text survives
    (s, dir) => {
      val src = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat_ws(" ",
          lit("begin"), col("text"),
          lit("click here to accept cookies and continue reading"),
          when(col("doc_id") % 3 === 0,
            lit("share this story on your favorite social network")),
          concat(lit("tail"), col("doc_id").cast("string"))).as("text"))
      Dedup.scrubRepeatedSpans(src, "text", "doc_id", n = 5, maxSpanDf = 10)
        .orderBy("doc_id")
    },
    Some("""WITH src AS (
              SELECT doc_id, concat_ws(' ',
                'begin', text,
                'click here to accept cookies and continue reading',
                CASE WHEN doc_id % 3 = 0
                  THEN 'share this story on your favorite social network' END,
                'tail' || CAST(doc_id AS VARCHAR)) AS text
              FROM documents),
            toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM src),
            tok AS (SELECT doc_id, unnest(t) AS tokstr,
                           unnest(range(len(t))) AS p
                    FROM toks),
            wins AS (SELECT doc_id,
                       unnest(range(greatest(len(t) - 4, 0))) AS p,
                       unnest(list_transform(range(greatest(len(t) - 4, 0)),
                         i -> array_to_string(t[i+1:i+5], ' '))) AS w
                     FROM toks),
            hot AS (SELECT w FROM (SELECT w, COUNT(DISTINCT doc_id) AS d
                                   FROM wins GROUP BY 1) WHERE d > 10),
            removed AS (SELECT DISTINCT wins.doc_id, wins.p + offs.o AS rp
                        FROM wins JOIN hot USING (w)
                        CROSS JOIN (SELECT unnest(range(5)) AS o) offs),
            kept AS (SELECT tok.doc_id, tok.p, tok.tokstr
                     FROM tok LEFT JOIN removed
                       ON tok.doc_id = removed.doc_id AND tok.p = removed.rp
                     WHERE removed.doc_id IS NULL)
            SELECT doc_id, string_agg(tokstr, ' ' ORDER BY p) AS text
            FROM kept GROUP BY doc_id ORDER BY doc_id"""))

  private val d25 = Q(
    "d25_scrub_maxspans",
    // MAXIMAL-span ExactSubstr (Lee et al. 2022): chain hot windows into
    // maximal spans, remove only spans ≥ minSpanLen tokens. The injection
    // plants BOTH regimes mid-token-stream between doc-unique anchors: a
    // 15-token boilerplate paste (10 chained hot 5-windows → span 15 ≥ 12,
    // removed whole) and a 6-token hot phrase (2 chained windows → span
    // 6 < 12, SURVIVES — the semantic d17 cannot express: published
    // ExactSubstr keeps short repeated formulas and excises long pastes)
    (s, dir) => {
      val src = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat_ws(" ",
          concat(lit("head"), col("doc_id").cast("string")), col("text"),
          lit("this website uses cookies to ensure you get the best " +
            "browsing experience on our site"),
          concat(lit("mid"), col("doc_id").cast("string")),
          lit("all rights reserved worldwide by publisher"),
          concat(lit("tail"), col("doc_id").cast("string"))).as("text"))
      Dedup.scrubMaxSpans(src, "text", "doc_id",
          n = 5, maxSpanDf = 10, minSpanLen = 12)
        .orderBy("doc_id")
    },
    Some("""WITH src AS (
              SELECT doc_id, concat_ws(' ',
                'head' || CAST(doc_id AS VARCHAR), text,
                'this website uses cookies to ensure you get the best browsing experience on our site',
                'mid' || CAST(doc_id AS VARCHAR),
                'all rights reserved worldwide by publisher',
                'tail' || CAST(doc_id AS VARCHAR)) AS text
              FROM documents),
            toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM src),
            tok AS (SELECT doc_id, unnest(t) AS tokstr,
                           unnest(range(len(t))) AS p
                    FROM toks),
            wins AS (SELECT doc_id,
                       unnest(range(greatest(len(t) - 4, 0))) AS p,
                       unnest(list_transform(range(greatest(len(t) - 4, 0)),
                         i -> array_to_string(t[i+1:i+5], ' '))) AS w
                     FROM toks),
            hot AS (SELECT w FROM (SELECT w, COUNT(DISTINCT doc_id) AS d
                                   FROM wins GROUP BY 1) WHERE d > 10),
            hits AS (SELECT DISTINCT wins.doc_id, wins.p
                     FROM wins JOIN hot USING (w)),
            isl AS (SELECT doc_id, p,
                      CASE WHEN p - lag(p) OVER (PARTITION BY doc_id
                             ORDER BY p) > 5
                           THEN 1 ELSE 0 END AS newi
                    FROM hits),
            isl2 AS (SELECT doc_id, p,
                       SUM(newi) OVER (PARTITION BY doc_id ORDER BY p
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS island
                     FROM isl),
            spans AS (SELECT doc_id, island, MIN(p) AS s, MAX(p) + 5 AS e
                      FROM isl2 GROUP BY 1, 2
                      HAVING MAX(p) + 5 - MIN(p) >= 12),
            removed AS (SELECT doc_id, unnest(range(s, e)) AS rp
                        FROM spans),
            kept AS (SELECT tok.doc_id, tok.p, tok.tokstr
                     FROM tok LEFT JOIN removed
                       ON tok.doc_id = removed.doc_id
                       AND tok.p = removed.rp
                     WHERE removed.doc_id IS NULL)
            SELECT doc_id, string_agg(tokstr, ' ' ORDER BY p) AS text
            FROM kept GROUP BY doc_id ORDER BY doc_id"""))

  private val d13 = Q(
    "d13_snapshot_diff",
    // two deterministic synthetic releases of the corpus: ids %13==3 are
    // new in v2 (absent from v1), %13==7 were dropped, and %5==0 got an
    // edit — the diff classifies every id for incremental re-processing
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 13 =!= 3)
      val v2 = docs.filter(col("doc_id") % 13 =!= 7)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      Dedup.snapshotDiff(v1, v2, "doc_id", "text").orderBy("doc_id")
    },
    Some("""WITH v1 AS (SELECT doc_id, text FROM documents
                        WHERE doc_id % 13 <> 3),
              v2 AS (SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
                            ELSE text END AS text
                     FROM documents WHERE doc_id % 13 <> 7)
            SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
              CASE WHEN o.doc_id IS NULL THEN 'added'
                   WHEN n.doc_id IS NULL THEN 'removed'
                   WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
                   ELSE 'changed' END AS status
            FROM v1 o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
            ORDER BY 1"""))

  private val d33 = Q(
    "d33_soft_dedup",
    // soft dedup (Muennighoff et al. 2023's data-constrained regime):
    // keep every document, weight = 1/cluster_size over the d08
    // cluster graph — a cluster of k near-copies contributes one
    // document's worth of expected training signal; eff_tok sums to
    // the deduplicated token budget without deleting anything.
    // Non-paired docs are singletons at weight 1
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Clusters.softDedupWeights(
          Dedup.nGramJaccard(docs, "text", "doc_id",
            tauNum = 1, tauDen = 2),
          "id_a", "id_b",
          docs.select(col("doc_id"),
            TextOps.tokenCount(col("text")).as("n_tok")),
          "doc_id", "n_tok")
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $pairsCte,
               edges AS (SELECT ia AS u, ib AS v FROM pairs
                         UNION SELECT ib, ia FROM pairs),
               reach(u, v) AS (
                 SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
               comp AS (SELECT u AS doc_id, MIN(v) AS cluster_id
                        FROM reach GROUP BY u),
               cs AS (SELECT cluster_id, COUNT(*) AS csize
                      FROM comp GROUP BY 1),
               dt AS (SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '),
                     x -> x <> '')) AS BIGINT) AS n_tok
                 FROM documents)
             SELECT dt.doc_id,
               COALESCE(comp.cluster_id, dt.doc_id) AS cluster_id,
               CAST(COALESCE(cs.csize, 1) AS BIGINT) AS csize,
               dt.n_tok,
               CAST(1 AS DOUBLE) / COALESCE(cs.csize, 1) AS weight,
               CAST(dt.n_tok AS DOUBLE) / COALESCE(cs.csize, 1)
                 AS eff_tok
             FROM dt LEFT JOIN comp ON dt.doc_id = comp.doc_id
             LEFT JOIN cs ON comp.cluster_id = cs.cluster_id
             ORDER BY dt.doc_id"""))

  private val d08 = Q(
    "d08_dedup_clusters",
    // pair finding (d02's exact inverted-index jaccard) -> transitive
    // cluster resolution -> canonical pick: the full dedup pipeline.
    // Oracle = recursive transitive closure with min-reachable labels.
    (s, dir) => Clusters.dedupClusters(
        Dedup.nGramJaccard(Tables.load(s, dir, "documents"),
          "text", "doc_id", tauNum = 1, tauDen = 2),
        "id_a", "id_b")
      .orderBy("doc_id"),
    Some(s"""WITH RECURSIVE $pairsCte,
               edges AS (SELECT ia AS u, ib AS v FROM pairs
                         UNION SELECT ib, ia FROM pairs),
               reach(u, v) AS (
                 SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
               comp AS (SELECT u AS doc_id, MIN(v) AS cluster_id
                        FROM reach GROUP BY u)
             SELECT doc_id, cluster_id,
               CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS keep
             FROM comp ORDER BY doc_id"""))

  private val d18 = Q(
    "d18_cluster_keep_best",
    // d08's clusters with the production canonical pick: keep each
    // cluster's highest-QUALITY member (t02's exact score), ties to min
    // id — one hash-agg argmax, no per-cluster sort/window
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Clusters.keepBestPerCluster(
          Dedup.nGramJaccard(docs, "text", "doc_id", tauNum = 1, tauDen = 2),
          "id_a", "id_b",
          docs.select(col("doc_id"),
            TextOps.qualityScore(col("text")).as("quality")),
          "doc_id", "quality")
        .orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE $pairsCte,
               edges AS (SELECT ia AS u, ib AS v FROM pairs
                         UNION SELECT ib, ia FROM pairs),
               reach(u, v) AS (
                 SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
               comp AS (SELECT u AS doc_id, MIN(v) AS cluster_id
                        FROM reach GROUP BY u),
               qc AS (SELECT doc_id,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens,
                 len(list_filter(string_split(text, ' '),
                   x -> x IN ('the','a','of','and','is','in','to')))
                   AS n_stopwords,
                 length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                   AS n_punct,
                 length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                   AS n_upper,
                 length(text) AS n_chars
                 FROM documents),
               scoredq AS (SELECT doc_id,
                 0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
                 + 0.3 * (CAST(n_stopwords AS DOUBLE)
                          / greatest(CAST(n_tokens AS DOUBLE), 1.0))
                 + 0.2 * (1.0 - CAST(n_punct AS DOUBLE)
                                / greatest(CAST(n_chars AS DOUBLE), 1.0))
                 + 0.1 * (1.0 - CAST(n_upper AS DOUBLE)
                                / greatest(CAST(n_chars AS DOUBLE), 1.0))
                 AS quality
                 FROM qc),
               ranked AS (SELECT c.cluster_id, c.doc_id, s.quality,
                 COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members,
                 ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                   ORDER BY s.quality DESC, c.doc_id) AS rn
                 FROM comp c JOIN scoredq s USING (doc_id))
             SELECT cluster_id, doc_id AS keep_doc, quality AS keep_score,
               n_members
             FROM ranked WHERE rn = 1 ORDER BY cluster_id"""))

  private val d11 = Q(
    "d11_cc_incremental",
    // continuous-ingest cluster maintenance: label the "standing corpus"
    // (pairs wholly under a doc-id cutoff) with the full CC loop, then
    // FOLD the remaining pairs in incrementally — the loop reruns only on
    // touched cluster reps + new ids, never the corpus. Min-id labels
    // compose, so the result equals d08's full recompute and shares its
    // recursive-CTE oracle verbatim.
    (s, dir) => {
      val pairs = Dedup.nGramJaccard(Tables.load(s, dir, "documents"),
          "text", "doc_id", tauNum = 1, tauDen = 2)
        .select("id_a", "id_b").localCheckpoint()
      val isOld = col("id_a") <= 250 && col("id_b") <= 250
      val labels0 = Clusters.connectedComponents(
        pairs.filter(isOld), "id_a", "id_b")
      Clusters.incrementalComponents(labels0, pairs.filter(!isOld),
          "id_a", "id_b")
        .select(col("id").as("doc_id"), col("cluster_id"),
          when(col("id") === col("cluster_id"), 1).otherwise(0).as("keep"))
        .orderBy("doc_id")
    },
    d08.oracle)

  private val d14 = Q(
    "d14_fuzzy_pipeline",
    // the production fuzzy-dedup pipeline at its 100 TB shape: MinHash
    // LSH banding for candidates (NO exact inverted index — candidate
    // cost is banding buckets, not sum df(g)^2) -> exact-jaccard verify
    // of candidates only -> connected components -> canonical min-id
    // keep. Shares d08's recursive-CTE oracle: the verify stage keeps
    // only true tau-pairs (output edges ⊆ exact edges), and RecallSpec
    // proves this banding config recovers the exact pair set at test SFs,
    // so the clusters equal the exact pipeline's deterministically.
    (s, dir) => Clusters.dedupClusters(
        Dedup.minHashLsh(Tables.load(s, dir, "documents"),
          "text", "doc_id", bands = 32, rowsPerBand = 4,
          tauNum = 1, tauDen = 2),
        "id_a", "id_b")
      .orderBy("doc_id"),
    d08.oracle)

  private val t07 = Q(
    "t07_top_tokens_per_lang",
    (s, dir) => Corpus.topTokensPerGroup(
        Tables.load(s, dir, "documents"), "text", "lang", k = 3)
      .orderBy("lang", "rk"),
    Some("""SELECT lang, token, n, rk FROM (
              SELECT lang, token, COUNT(*) AS n,
                ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY COUNT(*) DESC, token ASC) AS rk
              FROM (SELECT lang, unnest(list_filter(string_split(text, ' '),
                      x -> x <> '')) AS token
                    FROM documents)
              GROUP BY lang, token)
            WHERE rk <= 3 ORDER BY lang, rk"""))

  private val t08 = Q(
    "t08_repetition",
    // plain load, NOT loadParallel: repartitioning first would shuffle the
    // raw text; the op's own groupBy exchanges only fixed-width rows after
    // map-side partial aggregation
    (s, dir) => Corpus.repetitionScores(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') l FROM documents),
              raw AS (SELECT doc_id, unnest(l) w, generate_subscripts(l, 1) i
                      FROM t),
              tok AS (SELECT doc_id, w,
                        row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
                      FROM raw WHERE w <> ''),
              cnt AS (SELECT doc_id, w, COUNT(*) c FROM tok GROUP BY 1, 2),
              agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
                        MAX(c) AS top_tok_n
                      FROM cnt GROUP BY 1),
              big AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w g
                      FROM tok a JOIN tok b
                        ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
              sz AS (SELECT doc_id, COUNT(*) n FROM big GROUP BY 1)
            SELECT a.doc_id, a.n_tok, a.top_tok_n,
              CAST(a.top_tok_n AS DOUBLE) / a.n_tok AS top_tok_frac,
              COALESCE(s.n, 0) AS n_uniq_bigram,
              CASE WHEN a.n_tok > 1
                   THEN 1.0 - CAST(COALESCE(s.n, 0) AS DOUBLE) / (a.n_tok - 1)
                   ELSE 0.0 END AS dup_bigram_frac
            FROM agg a LEFT JOIN sz s ON a.doc_id = s.doc_id
            ORDER BY a.doc_id"""))

  private val t09 = Q(
    "t09_vocab_size",
    (s, dir) => Corpus.vocabPerGroup(
        Tables.load(s, dir, "documents"), "text", "lang")
      .orderBy("lang"),
    Some("""SELECT lang, COUNT(DISTINCT token) AS vocab,
              COUNT(*) AS n_tokens
            FROM (SELECT lang, unnest(list_filter(string_split(text, ' '),
                    x -> x <> '')) AS token
                  FROM documents)
            GROUP BY lang ORDER BY lang"""))

  private val t10 = Q(
    "t10_distinctive_tokens",
    (s, dir) => Corpus.distinctiveTokensPerGroup(
        Tables.load(s, dir, "documents"), "text", "lang", k = 5, minDf = 10L)
      .orderBy("lang", "rk"),
    Some("""WITH tf AS (SELECT lang, token, COUNT(*) AS tf
              FROM (SELECT lang, unnest(list_filter(string_split(text, ' '),
                      x -> x <> '')) AS token
                    FROM documents)
              GROUP BY lang, token),
              gt AS (SELECT lang, SUM(tf) AS gt FROM tf GROUP BY lang),
              ctf AS (SELECT token, SUM(tf) AS tc FROM tf GROUP BY token),
              tot AS (SELECT SUM(tc) AS total FROM ctf),
              lift AS (SELECT tf.lang, tf.token, tf.tf,
                  CAST(tf.tf * tot.total AS DOUBLE)
                    / CAST(gt.gt * ctf.tc AS DOUBLE) AS lift
                FROM tf JOIN ctf ON tf.token = ctf.token
                        JOIN gt ON tf.lang = gt.lang
                        CROSS JOIN tot
                WHERE ctf.tc >= 10)
            SELECT lang, token, CAST(tf AS BIGINT) AS tf, lift, rk
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY lift DESC, token ASC) AS rk
                  FROM lift)
            WHERE rk <= 5 ORDER BY lang, rk"""))

  private val t11 = Q(
    "t11_length_histogram",
    // token-length histogram in fixed 64-token buckets (top bucket open) —
    // the sequence-length profile that sizes packing budgets and batch
    // shapes. Pure projection + small-keyspace count: 16 groups max.
    (s, dir) => Tables.load(s, dir, "documents")
      .select(TextOps.tokenCount(col("text")).as("n_tok"))
      .groupBy(least(expr("n_tok div 64"), lit(15)).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min("n_tok").as("min_tokens"), max("n_tok").as("max_tokens"))
      .orderBy("bucket"),
    Some("""SELECT LEAST(n_tok // 64, 15) AS bucket, COUNT(*) AS n_docs,
              MIN(n_tok) AS min_tokens, MAX(n_tok) AS max_tokens
            FROM (SELECT len(list_filter(string_split(text, ' '),
                    x -> x <> '')) AS n_tok
                  FROM documents)
            GROUP BY 1 ORDER BY 1"""))

  private val p04 = Q(
    "p04_stratified_sample",
    (s, dir) => Corpus.stratifiedSample(
        Tables.load(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 4, "zh" -> 8))
      .select("doc_id", "lang").orderBy("doc_id"),
    Some("""SELECT doc_id, lang FROM documents
            WHERE CASE
              WHEN lang = 'en' THEN substr(md5(CAST(doc_id AS VARCHAR)), 31, 1)
                IN ('0','1','2','3')
              WHEN lang = 'zh' THEN substr(md5(CAST(doc_id AS VARCHAR)), 31, 1)
                IN ('0','1','2','3','4','5','6','7')
              ELSE TRUE END
            ORDER BY doc_id"""))

  private val p06 = Q(
    "p06_quota_sample",
    // exact per-stratum quotas (counts, where p04 gives rates): the
    // quota-smallest (md5(id), id) keys per language — phase 1 is
    // shuffle-free bounded heaps per partition, phase 2 ranks only the
    // survivors, so the full corpus is never window-sorted
    (s, dir) => Corpus.quotaSample(
        Tables.load(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 20, "zh" -> 10), defaultQuota = 5)
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents)
            WHERE rn <= CASE lang WHEN 'en' THEN 20 WHEN 'zh' THEN 10
                                  ELSE 5 END
            ORDER BY doc_id"""))

  private val p05 = Q(
    "p05_mixture_upsample",
    // src0 at 2.5 epochs, src1 at 0.5, src2 dropped, everything else 1.0
    (s, dir) => Corpus.mixtureUpsample(
        Tables.load(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 640, "src1" -> 128, "src2" -> 0))
      .orderBy("doc_id", "epoch"),
    Some("""WITH w AS (SELECT doc_id, source,
                CASE source WHEN 'src0' THEN 640 WHEN 'src1' THEN 128
                            WHEN 'src2' THEN 0 ELSE 256 END AS w256,
                (instr('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 29, 1)) - 1) * 16
                + (instr('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 30, 1)) - 1) AS hb
              FROM documents),
              r AS (SELECT doc_id, source,
                      w256 // 256
                        + CASE WHEN hb < w256 % 256 THEN 1 ELSE 0 END AS reps
                    FROM w)
            SELECT doc_id, source,
              unnest(generate_series(1, reps)) AS epoch
            FROM r WHERE reps > 0 ORDER BY doc_id, epoch"""))

  private val p07 = Q(
    "p07_global_ids",
    // contiguous 0-based corpus offsets WITHOUT a single-task global
    // window: range partition + local counters + broadcast prefix offsets
    (s, dir) => Corpus.contiguousIds(
        Tables.load(s, dir, "documents"), "doc_id")
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
              ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rid
            FROM documents ORDER BY doc_id"""))

  private val p08 = Q(
    "p08_quality_buckets",
    // corpus-wide exact quartile boundaries (broadcast single row) ->
    // bucket assignment as a pure map; summarized per bucket
    (s, dir) => Corpus.qualityBuckets(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("score").as("min_score"), max("score").as("max_score"))
      .orderBy("bucket"),
    Some("""WITH c AS (
              SELECT doc_id,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tokens,
                len(list_filter(string_split(text, ' '),
                  x -> x IN ('the','a','of','and','is','in','to')))
                  AS n_stopwords,
                length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                  AS n_punct,
                length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                  AS n_upper,
                length(text) AS n_chars
              FROM documents),
            scored AS (
              SELECT doc_id,
                0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
                + 0.3 * (CAST(n_stopwords AS DOUBLE)
                         / greatest(CAST(n_tokens AS DOUBLE), 1.0))
                + 0.2 * (1.0 - CAST(n_punct AS DOUBLE)
                               / greatest(CAST(n_chars AS DOUBLE), 1.0))
                + 0.1 * (1.0 - CAST(n_upper AS DOUBLE)
                               / greatest(CAST(n_chars AS DOUBLE), 1.0))
                AS score
              FROM c),
            qs AS (SELECT quantile_cont(score, 0.25) q1,
                     quantile_cont(score, 0.5) q2,
                     quantile_cont(score, 0.75) q3
                   FROM scored)
            SELECT CASE WHEN score <= q1 THEN 0
                        WHEN score <= q2 THEN 1
                        WHEN score <= q3 THEN 2
                        ELSE 3 END AS bucket,
              COUNT(*) AS n_docs,
              MIN(score) AS min_score, MAX(score) AS max_score
            FROM scored, qs
            GROUP BY 1 ORDER BY 1"""))

  private val t12 = Q(
    "t12_split_drift",
    // per-lang train-vs-test unigram TV distance; exact integer
    // cross-multiplication, one double division (oracle bit-stable)
    (s, dir) => Corpus.splitDrift(
        Tables.load(s, dir, "documents"), "doc_id", "text", "lang")
      .orderBy("lang"),
    Some("""WITH tok AS (
              SELECT lang,
                CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                       IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                     THEN 'train'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                       IN ('c','d')
                     THEN 'val' ELSE 'test' END AS split,
                unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS token
              FROM documents),
            cnt AS (SELECT lang, token,
                      SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS ca,
                      SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS cb
                    FROM tok WHERE split IN ('train', 'test')
                    GROUP BY 1, 2),
            tot AS (SELECT lang, CAST(SUM(ca) AS BIGINT) AS na,
                      CAST(SUM(cb) AS BIGINT) AS nb
                    FROM cnt GROUP BY 1)
            SELECT c.lang, t.na AS n_a_tokens, t.nb AS n_b_tokens,
              COUNT(*) AS vocab_union,
              CAST(SUM(ABS(c.ca * t.nb - c.cb * t.na)) AS DOUBLE)
                / CAST(2 * t.na * t.nb AS DOUBLE) AS tv_dist
            FROM cnt c JOIN tot t USING (lang)
            GROUP BY c.lang, t.na, t.nb ORDER BY c.lang"""))

  private val p09 = Q(
    "p09_curriculum_order",
    // materialized training order: best quality bucket first, hash-shuffled
    // within bucket, dense 0-based positions without a one-task window
    (s, dir) => Corpus.curriculumOrder(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH c AS (
              SELECT doc_id,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tokens,
                len(list_filter(string_split(text, ' '),
                  x -> x IN ('the','a','of','and','is','in','to')))
                  AS n_stopwords,
                length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                  AS n_punct,
                length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                  AS n_upper,
                length(text) AS n_chars
              FROM documents),
            scored AS (
              SELECT doc_id,
                0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
                + 0.3 * (CAST(n_stopwords AS DOUBLE)
                         / greatest(CAST(n_tokens AS DOUBLE), 1.0))
                + 0.2 * (1.0 - CAST(n_punct AS DOUBLE)
                               / greatest(CAST(n_chars AS DOUBLE), 1.0))
                + 0.1 * (1.0 - CAST(n_upper AS DOUBLE)
                               / greatest(CAST(n_chars AS DOUBLE), 1.0))
                AS score
              FROM c),
            qs AS (SELECT quantile_cont(score, 0.25) q1,
                     quantile_cont(score, 0.5) q2,
                     quantile_cont(score, 0.75) q3
                   FROM scored),
            bucketed AS (
              SELECT doc_id,
                CASE WHEN score <= q1 THEN 0
                     WHEN score <= q2 THEN 1
                     WHEN score <= q3 THEN 2
                     ELSE 3 END AS bucket
              FROM scored, qs)
            SELECT doc_id, bucket,
              ROW_NUMBER() OVER (ORDER BY 3 - bucket,
                md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS train_pos
            FROM bucketed ORDER BY doc_id"""))

  private val t13 = Q(
    "t13_redact_pii",
    // PII scrub audit: a deterministic slice of docs (ids %11==0) gets an
    // email + phone planted, the redactor strips them, and the audit
    // reports per-doc match counts plus the md5 of the redacted text —
    // which also proves untouched docs pass through byte-identical
    (s, dir) => {
      val injected = Tables.load(s, dir, "documents")
        .withColumn("text",
          when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" mail user"),
              col("doc_id").cast("string"),
              lit("@corp.example.com or 555-123-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text")))
      injected.select(col("doc_id"),
          TextOps.emailCount(col("text")).as("n_emails"),
          TextOps.phoneCount(col("text")).as("n_phones"),
          md5(TextOps.redactPii(col("text"))).as("red_md5"))
        .orderBy("doc_id")
    },
    Some("""WITH inj AS (SELECT doc_id,
              CASE WHEN doc_id % 11 = 0
                THEN text || ' mail user' || CAST(doc_id AS VARCHAR)
                  || '@corp.example.com or 555-123-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE text END AS text
              FROM documents)
            SELECT doc_id,
              len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
              len(regexp_extract_all(text,
                '[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}')) AS n_phones,
              md5(regexp_replace(regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}', '<PHONE>', 'g')) AS red_md5
            FROM inj ORDER BY doc_id"""))

  private val t14 = Q(
    "t14_gopher_rules",
    // Gopher-style hard quality rules (Rae et al. 2021): per-doc stats
    // plus the composite keep flag, every stat an integer count with one
    // double division. Word-count bounds adapted to this corpus's short
    // synthetic docs (10..100k words, stopword floor 1 — the tech-word
    // vocabulary only ever hits 'the'); the line/symbol rules are
    // degenerate here (single-line, letters-only docs) and get their
    // non-trivial coverage from OpsSpec's crafted docs.
    (s, dir) => Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_words"),
        TextOps.meanWordLen(col("text")).as("mean_word_len"),
        TextOps.symbolRatio(col("text")).as("symbol_ratio"),
        TextOps.bulletLineFrac(col("text")).as("bullet_frac"),
        TextOps.ellipsisLineFrac(col("text")).as("ellipsis_frac"),
        TextOps.alphaWordFrac(col("text")).as("alpha_frac"),
        TextOps.requiredStopwordHits(col("text")).as("req_stops"),
        TextOps.gopherPass(col("text"), 10, 100000, minStops = 1)
          .as("pass"))
      .orderBy("doc_id"),
    Some(s"""WITH $gopherCte
            SELECT doc_id, n_words, mean_word_len, symbol_ratio,
              bullet_frac, ellipsis_frac, alpha_frac, req_stops, pass
            FROM gp ORDER BY doc_id"""))

  private val t15 = Q(
    "t15_corpus_card",
    // per-(source, lang) dataset card: doc/token/char totals and gopher
    // pass counts as exact integer sums; ratio columns derive from ONE
    // division of those longs (a sum of per-doc doubles would be
    // order-sensitive across partitions and break the bit-exact compare)
    (s, dir) => Tables.loadParallel(s, dir, "documents")
      .select(col("source"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("nc"),
        TextOps.gopherPass(col("text"), 10, 100000, minStops = 1)
          .cast("long").as("p"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        sum("nc").as("n_chars"),
        sum("p").as("n_pass"))
      .withColumn("pass_rate",
        col("n_pass").cast("double") / col("n_docs").cast("double"))
      .withColumn("mean_doc_tokens",
        col("n_tokens").cast("double") / col("n_docs").cast("double"))
      .orderBy("source", "lang"),
    Some(s"""WITH $gopherCte
            SELECT source, lang, COUNT(*) AS n_docs,
              CAST(SUM(n_words) AS BIGINT) AS n_tokens,
              CAST(SUM(n_chars) AS BIGINT) AS n_chars,
              CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                AS n_pass,
              CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS pass_rate,
              CAST(SUM(n_words) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                AS mean_doc_tokens
            FROM gp GROUP BY source, lang ORDER BY source, lang"""))

  private val t16 = Q(
    "t16_surprisal",
    // CCNet-style LM quality signal: mean per-token surprisal (whole
    // bits, integer-only — no libm log) under a unigram model of the
    // English slice; low bits/token reads as head-like fluent text
    (s, dir) => Corpus.surprisalPerDoc(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id"),
    Some("""WITH toks AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS token
              FROM documents),
            ref AS (SELECT unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS token
              FROM documents WHERE lang = 'en'),
            cnt AS (SELECT token, COUNT(*) AS cnt FROM ref GROUP BY token),
            tot AS (SELECT COUNT(*) AS ref_total FROM ref),
            bits AS (SELECT t.doc_id,
                LENGTH(bin(tot.ref_total // COALESCE(c.cnt, 1))) AS bits
              FROM toks t LEFT JOIN cnt c ON t.token = c.token
                   CROSS JOIN tot),
            agg AS (SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS sum_bits,
                COUNT(*) AS n_tok
              FROM bits GROUP BY doc_id)
            SELECT d.doc_id,
              COALESCE(a.sum_bits, 0) AS sum_bits,
              COALESCE(a.n_tok, 0) AS n_tok,
              CASE WHEN a.n_tok IS NULL THEN NULL
                   ELSE CAST(a.sum_bits AS DOUBLE) / a.n_tok END
                AS bits_per_token
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id"""))

  private val p19 = Q(
    "p19_surprisal_buckets",
    // CCNet head/middle/tail release bands: surprisal terciles of the
    // en-slice unigram LM, summarized per band (cuts broadcast, bucket
    // assignment a pure map — the p08 shape)
    (s, dir) => Corpus.surprisalBuckets(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("bits_per_token").as("min_bpt"),
        max("bits_per_token").as("max_bpt"))
      .orderBy("bucket"),
    Some("""WITH toks AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS token
              FROM documents),
            ref AS (SELECT unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS token
              FROM documents WHERE lang = 'en'),
            cnt AS (SELECT token, COUNT(*) AS cnt FROM ref GROUP BY token),
            tot AS (SELECT COUNT(*) AS ref_total FROM ref),
            bits AS (SELECT t.doc_id,
                LENGTH(bin(tot.ref_total // COALESCE(c.cnt, 1))) AS bits
              FROM toks t LEFT JOIN cnt c ON t.token = c.token
                   CROSS JOIN tot),
            bpt AS (SELECT doc_id,
                CAST(CAST(SUM(bits) AS BIGINT) AS DOUBLE) / COUNT(*)
                  AS bits_per_token
              FROM bits GROUP BY doc_id),
            qs AS (SELECT quantile_cont(bits_per_token, 1.0/3) AS c1,
                     quantile_cont(bits_per_token, 2.0/3) AS c2
                   FROM bpt)
            SELECT CASE WHEN bits_per_token <= c1 THEN 'head'
                        WHEN bits_per_token <= c2 THEN 'middle'
                        ELSE 'tail' END AS bucket,
              COUNT(*) AS n_docs,
              MIN(bits_per_token) AS min_bpt,
              MAX(bits_per_token) AS max_bpt
            FROM bpt CROSS JOIN qs
            GROUP BY 1 ORDER BY 1"""))

  private val p20 = Q(
    "p20_dsir_bigram",
    // DSIR with the paper's fuller feature space: unigrams ∪ adjacent
    // word bigrams in one shared count table — the phrase-level signal
    // a bag of words misses. Same whole-bit integer arithmetic as p18
    (s, dir) => Corpus.dsirWeights(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        targetFilter = col("lang") === "en", rawFilter = lit(true),
        bigrams = true)
      .orderBy("doc_id"),
    Some("""WITH base AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents),
            toks AS (SELECT doc_id,
                unnest(t || list_transform(
                  generate_series(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i + 1])) AS token
              FROM base),
            tc AS (SELECT token, COUNT(*) AS cnt_t
              FROM toks JOIN documents USING (doc_id)
              WHERE lang = 'en' GROUP BY token),
            rc AS (SELECT token, COUNT(*) AS cnt_r
              FROM toks GROUP BY token),
            tt AS (SELECT CAST(SUM(cnt_t) AS BIGINT) AS total_t FROM tc),
            rt AS (SELECT CAST(SUM(cnt_r) AS BIGINT) AS total_r FROM rc),
            delta AS (SELECT COALESCE(tc.token, rc.token) AS token,
                CAST(LENGTH(bin(rt.total_r // COALESCE(rc.cnt_r, 1)))
                     AS BIGINT)
              - CAST(LENGTH(bin(tt.total_t // COALESCE(tc.cnt_t, 1)))
                     AS BIGINT) AS dbits
              FROM tc FULL JOIN rc ON tc.token = rc.token
                   CROSS JOIN tt CROSS JOIN rt),
            sc AS (SELECT t.doc_id,
                CAST(SUM(COALESCE(d.dbits, 0)) AS BIGINT) AS log2_w,
                COUNT(*) AS n_tok
              FROM toks t LEFT JOIN delta d ON t.token = d.token
              GROUP BY t.doc_id)
            SELECT d.doc_id, COALESCE(sc.log2_w, 0) AS log2_w,
              COALESCE(sc.n_tok, 0) AS n_tok
            FROM documents d LEFT JOIN sc USING (doc_id)
            ORDER BY d.doc_id"""))

  private val t18 = Q(
    "t18_compression_ratio",
    // deflate-ratio quality signal (MassiveText/RefinedWeb family):
    // templated or repetitive docs compress anomalously well. Rows-only
    // (no DuckDB deflate); semantics unit-pinned against a direct
    // java.util.zip reference in TextOpsSpec
    (s, dir) => Tables.loadParallel(s, dir, "documents")
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"),
        graft.functions.TextExpressions.deflateLen(col("text")).as("z"))
      .select(col("doc_id"),
        col("z.n_bytes").cast("long").as("n_bytes"),
        col("z.n_deflate").cast("long").as("n_deflate"),
        (col("z.n_deflate").cast("double") /
          col("z.n_bytes").cast("double")).as("ratio"))
      .orderBy("doc_id"),
    None)

  private val d22 = Q(
    "d22_containment",
    // token-run containment pairs: inverted-index candidates (common
    // grams == smaller side's gram count), sentinel-wrapped contains
    // verify on candidate texts only
    (s, dir) => Dedup.containment(
        Tables.load(s, dir, "documents"), "text", "doc_id")
      .orderBy("contained_id", "container_id"),
    Some("""WITH tok AS (SELECT doc_id,
                ' ' || array_to_string(list_filter(string_split(text, ' '),
                    x -> x <> ''), ' ') || ' ' AS norm,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tok
              FROM documents)
            SELECT a.doc_id AS contained_id, b.doc_id AS container_id
            FROM tok a JOIN tok b ON a.doc_id != b.doc_id
            WHERE a.n_tok >= 2
              AND contains(b.norm, a.norm)
              AND (a.n_tok < b.n_tok
                   OR (a.n_tok = b.n_tok AND a.doc_id < b.doc_id))
            ORDER BY 1, 2"""))

  private val d23 = Q(
    "d23_scrub_doc_lines",
    // within-doc repeated-line removal: the corpus is single-line, so —
    // t19's injection pattern — both engines derive a page with a
    // repeated banner line (×3) and " table "-split body lines first,
    // then keep each line's first occurrence in order
    (s, dir) => {
      val body = regexp_replace(col("text"), " table ", "\n")
      val page = concat(lit("subscribe banner\n"), body,
        lit("\nsubscribe banner\nsubscribe banner"))
      Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"), page.as("page"))
        .select(col("doc_id"),
          size(split(col("page"), "\n")).as("n_lines"),
          TextOps.dedupDocLines(col("page")).as("scrubbed"))
        .select(col("doc_id"), col("n_lines"),
          size(split(col("scrubbed"), "\n")).as("n_kept"),
          md5(col("scrubbed")).as("scrub_md5"))
        .orderBy("doc_id")
    },
    Some("""WITH inj AS (SELECT doc_id,
              'subscribe banner' || chr(10)
                || replace(text, ' table ', chr(10))
                || chr(10) || 'subscribe banner'
                || chr(10) || 'subscribe banner' AS page
              FROM documents),
            l AS (SELECT doc_id, page,
                unnest(string_split(page, chr(10))) AS line,
                generate_subscripts(string_split(page, chr(10)), 1) AS i
              FROM inj),
            fst AS (SELECT doc_id, line, MIN(i) AS i
              FROM l GROUP BY doc_id, line),
            reb AS (SELECT doc_id,
                array_to_string(list(line ORDER BY i), chr(10)) AS scrubbed,
                COUNT(*) AS n_kept
              FROM fst GROUP BY doc_id)
            SELECT i.doc_id,
              len(string_split(i.page, chr(10))) AS n_lines,
              CAST(r.n_kept AS INTEGER) AS n_kept,
              md5(r.scrubbed) AS scrub_md5
            FROM inj i JOIN reb r USING (doc_id)
            ORDER BY i.doc_id"""))

  private val t21 = Q(
    "t21_script_profile",
    // Unicode script triage: the corpus is ASCII, so (t13 pattern) both
    // engines append deterministic non-Latin tails to selected doc_ids
    // first, then count per-script characters and pick the dominant
    (s, dir) => {
      val page = when(col("doc_id") % 5 === 1,
          concat(col("text"), lit(" привет мир как дела сегодня")))
        .when(col("doc_id") % 5 === 2,
          concat(col("text"), lit(" 汉字文本处理系统测试样例")))
        .when(col("doc_id") % 5 === 3,
          concat(col("text"), lit(" مرحبا بالعالم اليوم هنا")))
        .otherwise(col("text"))
      Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"), page.as("page"))
        .select(col("doc_id"),
          length(col("page")).as("n_chars"),
          TextOps.classCount(col("page"), "[A-Za-z]").as("n_latin"),
          TextOps.classCount(col("page"), "[\\x{0400}-\\x{04FF}]")
            .as("n_cyrillic"),
          TextOps.classCount(col("page"), "[\\x{4E00}-\\x{9FFF}]")
            .as("n_cjk"),
          TextOps.classCount(col("page"), "[\\x{0600}-\\x{06FF}]")
            .as("n_arabic"),
          TextOps.classCount(col("page"), "[0-9]").as("n_digit"),
          TextOps.dominantScript(col("page")).as("dominant"))
        .orderBy("doc_id")
    },
    Some("""WITH inj AS (SELECT doc_id,
              CASE WHEN doc_id % 5 = 1
                     THEN text || ' привет мир как дела сегодня'
                   WHEN doc_id % 5 = 2
                     THEN text || ' 汉字文本处理系统测试样例'
                   WHEN doc_id % 5 = 3
                     THEN text || ' مرحبا بالعالم اليوم هنا'
                   ELSE text END AS page
              FROM documents),
            c AS (SELECT doc_id, page,
              len(page) AS n_chars,
              len(page) - len(regexp_replace(page, '[A-Za-z]', '', 'g'))
                AS n_latin,
              len(page) - len(regexp_replace(page,
                '[\x{0400}-\x{04FF}]', '', 'g')) AS n_cyrillic,
              len(page) - len(regexp_replace(page,
                '[\x{4E00}-\x{9FFF}]', '', 'g')) AS n_cjk,
              len(page) - len(regexp_replace(page,
                '[\x{0600}-\x{06FF}]', '', 'g')) AS n_arabic,
              len(page) - len(regexp_replace(page, '[0-9]', '', 'g'))
                AS n_digit
              FROM inj)
            SELECT doc_id, n_chars, n_latin, n_cyrillic, n_cjk, n_arabic,
              n_digit,
              CASE WHEN n_latin + n_cyrillic + n_cjk + n_arabic = 0
                     THEN 'none'
                   WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk
                        AND n_latin >= n_arabic THEN 'latin'
                   WHEN n_cyrillic >= n_cjk AND n_cyrillic >= n_arabic
                     THEN 'cyrillic'
                   WHEN n_cjk >= n_arabic THEN 'cjk'
                   ELSE 'arabic' END AS dominant
            FROM c ORDER BY doc_id"""))

  private val t58 = Q(
    "t58_mixed_script",
    // homoglyph / mojibake triage: tokens mixing Latin with Cyrillic
    // INSIDE one word (the spoofing-and-broken-decode signature t21's
    // whole-doc script histogram cannot see — a doc can be 95% Latin
    // and still carry 'pаypаl' with Cyrillic а), plus U+FFFD
    // replacement-char counts (the universal broken-transcode tell).
    // ASCII corpus, so both engines inject the same deterministic
    // tails first (the t13/t21 pattern). Exact integer counts
    (s, dir) => {
      val page = when(col("doc_id") % 7 === 1,
          concat(col("text"), lit(" pаypаl sеcurе")))
        .when(col("doc_id") % 7 === 2,
          concat(col("text"), lit(" brok�n t�xt")))
        .otherwise(col("text"))
      val toks = TextOps.tokens(col("page"))
      Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"), page.as("page"))
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(filter(toks, t => t.rlike("[A-Za-z]") &&
            t.rlike("[\\x{0400}-\\x{04FF}]"))).cast("long")
            .as("n_mixed"),
          TextOps.classCount(col("page"), "[\\x{FFFD}]").as("n_repl"))
        .withColumn("suspect",
          when(col("n_mixed") > 0 || col("n_repl") > 0, 1L)
            .otherwise(0L))
        .orderBy("doc_id")
    },
    Some("""WITH inj AS (SELECT doc_id,
              CASE WHEN doc_id % 7 = 1
                     THEN text || ' pаypаl sеcurе'
                   WHEN doc_id % 7 = 2
                     THEN text || ' brok�n t�xt'
                   ELSE text END AS page
              FROM documents),
            c AS (SELECT doc_id,
              list_filter(string_split(page, ' '), x -> x <> '') AS l,
              len(page) - len(regexp_replace(page, '[\x{FFFD}]', '', 'g'))
                AS n_repl
              FROM inj)
            SELECT doc_id,
              CAST(len(l) AS BIGINT) AS n_tokens,
              CAST(len(list_filter(l, x ->
                regexp_matches(x, '[A-Za-z]') AND
                regexp_matches(x, '[\x{0400}-\x{04FF}]')))
                AS BIGINT) AS n_mixed,
              CAST(n_repl AS BIGINT) AS n_repl,
              CASE WHEN len(list_filter(l, x ->
                  regexp_matches(x, '[A-Za-z]') AND
                  regexp_matches(x, '[\x{0400}-\x{04FF}]'))) > 0
                OR n_repl > 0 THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS suspect
            FROM c ORDER BY doc_id"""))

  private val t59 = Q(
    "t59_blocklist_gate",
    // lexicon-based content screen (the C4 "bad words" gate made an
    // operator): per doc, blocked-term occurrences WITH multiplicity,
    // distinct lexicon terms present, hit density per 1000 tokens (ONE
    // IEEE division of exact longs), and the gate flag. Pure scan-stage
    // token arithmetic — no shuffle at all; the lexicon ships in the
    // expression like t01's marker lists. 'crash' never occurs in the
    // corpus (exercises the absent-term path)
    (s, dir) => {
      val lex = Seq("slow", "dup", "crash")
      val toks = TextOps.tokens(col("text"))
      Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tok"),
          size(filter(toks, t => t.isInCollection(lex))).cast("long")
            .as("hits"),
          lex.map(t => when(array_contains(toks, t), 1L).otherwise(0L))
            .reduce(_ + _).as("n_terms"))
        // zero-token guard: an unguarded 0/0 reads NaN, and NaN sorts
        // ABOVE every threshold in both engines — an empty doc would
        // silently flag
        .withColumn("hits_per_1k",
          when(col("n_tok") > 0,
            (col("hits") * 1000L).cast("double") /
              col("n_tok").cast("double")))
        .withColumn("flagged",
          coalesce(col("hits_per_1k") >= 60.0, lit(false)))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS l
              FROM documents),
            h AS (SELECT doc_id,
                CAST(len(l) AS BIGINT) AS n_tok,
                CAST(len(list_filter(l,
                  t -> t IN ('slow', 'dup', 'crash'))) AS BIGINT) AS hits,
                CAST((CASE WHEN list_contains(l, 'slow') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(l, 'dup') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(l, 'crash') THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_terms
              FROM d)
            SELECT doc_id, n_tok, hits, n_terms,
              CASE WHEN n_tok > 0 THEN
                CAST(hits * 1000 AS DOUBLE) / CAST(n_tok AS DOUBLE)
                END AS hits_per_1k,
              COALESCE(CASE WHEN n_tok > 0 THEN
                CAST(hits * 1000 AS DOUBLE) / CAST(n_tok AS DOUBLE)
                END >= 60.0, false) AS flagged
            FROM h ORDER BY doc_id"""))

  private val t60 = Q(
    "t60_chi2_outlier",
    // per-doc chi-square goodness-of-fit vs the corpus unigram
    // background (top-16 tokens + tail bucket): the DISTRIBUTION-level
    // outlier gate that catches keyword stuffing / template debris when
    // every per-rule gate passes. Zero-observed buckets folded in closed
    // form (no doc x topK grid); every float term decimal-injected (e33
    // convention) — hash-exact
    (s, dir) => Corpus.chi2Outliers(
        Tables.load(s, dir, "documents"), "doc_id", "text", topK = 16)
      .orderBy("doc_id"),
    Some("""WITH d AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS l
              FROM documents),
            docs AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tok
              FROM d),
            tf AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tok,
                unnest(l) AS token
              FROM d),
            bg AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM tf GROUP BY 1),
            top AS (SELECT token, cnt FROM bg
              ORDER BY cnt DESC, token LIMIT 16),
            st AS (SELECT
                (SELECT CAST(SUM(cnt) AS BIGINT) FROM bg) AS n_total,
                (SELECT CAST(SUM(cnt) AS BIGINT) FROM top) AS n_top),
            st2 AS (SELECT n_total, n_top, n_total - n_top AS n_tail
              FROM st),
            obs AS (SELECT doc_id, n_tok, t.token, t.cnt,
                CAST(COUNT(*) AS BIGINT) AS obs
              FROM tf JOIN top t USING (token) GROUP BY 1, 2, 3, 4),
            pt AS (SELECT doc_id, obs,
                CAST(n_tok AS DOUBLE) * cnt / n_total AS e
              FROM obs CROSS JOIN st2),
            pa AS (SELECT doc_id,
                SUM(CAST((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE)
                  - e) / e - e AS DECIMAL(18,6))) AS s,
                CAST(SUM(obs) AS BIGINT) AS sum_obs
              FROM pt GROUP BY 1),
            fin AS (SELECT dd.doc_id, dd.n_tok,
                COALESCE(pa.s, CAST(0 AS DECIMAL(18,6)))
                + CAST(CAST(dd.n_tok AS DOUBLE) * n_top / n_total
                    AS DECIMAL(18,6))
                + (CASE WHEN n_tail > 0 AND dd.n_tok > 0 THEN
                    CAST((CAST(dd.n_tok - COALESCE(sum_obs, 0) AS DOUBLE)
                        - CAST(dd.n_tok AS DOUBLE) * n_tail / n_total)
                      * (CAST(dd.n_tok - COALESCE(sum_obs, 0) AS DOUBLE)
                        - CAST(dd.n_tok AS DOUBLE) * n_tail / n_total)
                      / (CAST(dd.n_tok AS DOUBLE) * n_tail / n_total)
                      AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS chi2d
              FROM docs dd LEFT JOIN pa USING (doc_id) CROSS JOIN st2)
            SELECT doc_id, n_tok, CAST(chi2d AS DOUBLE) AS chi2,
              CAST(chi2d AS DOUBLE) >= 32.0 AS flagged
            FROM fin ORDER BY doc_id"""))

  private val t61 = Q(
    "t61_mix_independence",
    // language x source chi-square independence + Cramer's V: the
    // mixture-confounding diagnostic — if language is NOT independent
    // of source, every per-source statistic is partly a language
    // effect and reweighting one axis silently moves the other. Cell
    // terms are bounded by cell counts (the safe small-magnitude
    // decimal-injection regime) — hash-exact
    (s, dir) => Corpus.chi2Independence(
        Tables.load(s, dir, "documents"), "lang", "source")
      .orderBy("n_docs"),
    Some("""WITH cells AS (SELECT lang AS a, source AS b,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM documents
              WHERE lang IS NOT NULL AND source IS NOT NULL
              GROUP BY 1, 2),
            rowm AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ra
              FROM cells GROUP BY 1),
            colm AS (SELECT b, CAST(SUM(n) AS BIGINT) AS cb
              FROM cells GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
                CAST(COUNT(DISTINCT b) AS BIGINT) AS c
              FROM cells),
            j AS (SELECT cells.n, tot.nn, tot.r, tot.c,
                CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
                  / CAST(nn AS DOUBLE) AS e
              FROM cells JOIN rowm USING (a) JOIN colm USING (b)
              CROSS JOIN tot),
            t AS (SELECT nn, r, c,
                SUM(CAST((CAST(n AS DOUBLE) - e) * (CAST(n AS DOUBLE)
                  - e) / e AS DECIMAL(18,6))) AS chi
              FROM j GROUP BY 1, 2, 3)
            SELECT nn AS n_docs, r AS n_rows, c AS n_cols,
              (r - 1) * (c - 1) AS df,
              CASE WHEN r >= 2 AND c >= 2
                THEN CAST(chi AS DOUBLE) END AS chi2,
              CASE WHEN r >= 2 AND c >= 2
                THEN sqrt(CAST(chi AS DOUBLE)
                  / CAST(nn * least(r - 1, c - 1) AS DOUBLE))
                END AS cramers_v
            FROM t ORDER BY n_docs"""))

  private val p31 = Q(
    "p31_sentence_chunks",
    // sentence-boundary-respecting RAG chunking: greedy first-fit pack
    // of consecutive sentences into <=24-token chunks (t22 cuts at
    // fixed offsets mid-sentence; this is the boundary-honest form).
    // The ASCII corpus has no punctuation, so both engines inject the
    // same deterministic sentence breaks first (the t13/t58 pattern:
    // a '.' after token i of doc d iff the first md5 nibble of "d:i"
    // is 0-2, mean sentence ~5.3 tokens). Pure integer fold, replayed
    // by the oracle as a recursive CTE — hash-exact
    (s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val dotted = transform(toks, (t, i) =>
        concat(t, when(substring(md5(concat_ws(":",
            col("doc_id").cast("string"), i.cast("string"))), 1, 1)
          .isin("0", "1", "2"), lit(".")).otherwise(lit(""))))
      Corpus.sentenceChunks(
        Tables.loadParallel(s, dir, "documents")
          .select(col("doc_id"), concat_ws(" ", dotted).as("text")),
        "doc_id", "text", budgetTokens = 24)
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH RECURSIVE d AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS l
              FROM documents),
            tk AS (SELECT doc_id, unnest(l) AS tok,
                CAST(unnest(range(len(l))) AS BIGINT) AS i
              FROM d),
            bd AS (SELECT doc_id, i,
                CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || CAST(i AS VARCHAR)), 1, 1)
                  IN ('0', '1', '2') THEN 1 ELSE 0 END AS brk
              FROM tk),
            sg AS (SELECT doc_id, i,
                CAST(COALESCE(SUM(brk) OVER (PARTITION BY doc_id
                  ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS sent
              FROM bd),
            sc AS (SELECT doc_id, sent, CAST(COUNT(*) AS BIGINT) AS n
              FROM sg GROUP BY 1, 2),
            f AS (SELECT doc_id, sent, n, CAST(0 AS BIGINT) AS chunk,
                n AS used
              FROM sc WHERE sent = 0
              UNION ALL
              SELECT s.doc_id, s.sent, s.n,
                CASE WHEN f.used + s.n > 24 THEN f.chunk + 1
                  ELSE f.chunk END,
                CASE WHEN f.used + s.n > 24 THEN s.n
                  ELSE f.used + s.n END
              FROM f JOIN sc s ON s.doc_id = f.doc_id
                AND s.sent = f.sent + 1)
            SELECT doc_id, chunk AS chunk_id,
              CAST(COUNT(*) AS BIGINT) AS n_sents,
              CAST(SUM(n) AS BIGINT) AS n_tok,
              MIN(sent) AS sent_lo, MAX(sent) AS sent_hi
            FROM f GROUP BY 1, 2 ORDER BY doc_id, chunk_id"""))

  private val t20 = Q(
    "t20_bigram_surprisal",
    // conditional bigram-LM surprisal (the KenLM rung above t16): whole
    // bits, integer-only — hapax backoff for unseen pairs with a seen
    // context, 1 bit for unseen contexts
    (s, dir) => Corpus.bigramSurprisalPerDoc(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id"),
    Some("""WITH base AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS l
              FROM documents),
            toks AS (SELECT doc_id, unnest(l) AS w,
                generate_subscripts(l, 1) AS rn
              FROM base),
            pairs AS (SELECT a.doc_id, a.w AS w1,
                a.w || ' ' || b.w AS bigram
              FROM toks a JOIN toks b
                ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
            refb AS (SELECT p.bigram, COUNT(*) AS cnt2
              FROM pairs p JOIN documents d USING (doc_id)
              WHERE d.lang = 'en' GROUP BY 1),
            refu AS (SELECT unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS w1
              FROM documents WHERE lang = 'en'),
            cnt1 AS (SELECT w1, COUNT(*) AS cnt1 FROM refu GROUP BY 1),
            bits AS (SELECT p.doc_id,
                LENGTH(bin(COALESCE(c1.cnt1, 1) // COALESCE(c2.cnt2, 1)))
                  AS bits
              FROM pairs p
                LEFT JOIN refb c2 USING (bigram)
                LEFT JOIN cnt1 c1 ON p.w1 = c1.w1),
            agg AS (SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS sum_bits,
                COUNT(*) AS n_pairs
              FROM bits GROUP BY doc_id)
            SELECT d.doc_id,
              COALESCE(a.sum_bits, 0) AS sum_bits,
              COALESCE(a.n_pairs, 0) AS n_pairs,
              CASE WHEN a.n_pairs IS NULL THEN NULL
                   ELSE CAST(a.sum_bits AS DOUBLE) / a.n_pairs END
                AS bits_per_pair
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id"""))

  private val t19 = Q(
    "t19_c4_rules",
    // C4 line-level cleaning (Raffel et al. 2020 §2.2): the corpus's
    // single-line synthetic docs carry no line structure, so — the t13
    // injection pattern — both engines first derive a multi-line page
    // deterministically from the SAME parquet rows (" table " becomes a
    // sentence break; selected doc_ids gain a trailing period, a
    // javascript line, a curly-brace code line, a lorem-ipsum footer),
    // then clean it: per-line keep/drop rebuilds the text, the doc gate
    // reads the ORIGINAL page. All pure per-row maps — no shuffle at any
    // corpus size; crafted multi-line edge cases live in OpsSpec.
    (s, dir) => {
      val inj0 = regexp_replace(col("text"), " table ", ".\n")
      val x = concat(
        when(col("doc_id") % 3 === 0, concat(inj0, lit(".")))
          .otherwise(inj0),
        when(col("doc_id") % 7 === 0,
          lit("\nclick here to enable javascript now.")).otherwise(lit("")),
        when(col("doc_id") % 17 === 0,
          lit("\nfunction f() { return 1; }.")).otherwise(lit("")))
      val page = when(col("doc_id") % 13 === 0,
        concat(x, lit("\nthis page uses lorem ipsum filler text.")))
        .otherwise(x)
      Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"), page.as("page"))
        .select(col("doc_id"), col("page"),
          TextOps.c4CleanText(col("page")).as("cleaned"))
        .select(col("doc_id"),
          size(split(col("page"), "\n")).as("n_lines"),
          when(col("cleaned") === "", 0)
            .otherwise(size(split(col("cleaned"), "\n"))).as("n_kept"),
          TextOps.c4SentenceCount(col("cleaned")).as("n_sentences"),
          TextOps.c4DocPass(col("page"), col("cleaned")).as("pass"),
          md5(col("cleaned")).as("clean_md5"))
        .orderBy("doc_id")
    },
    Some("""WITH inj AS (SELECT doc_id,
              CASE WHEN doc_id % 13 = 0
                THEN x || chr(10) || 'this page uses lorem ipsum filler text.'
                ELSE x END AS page
              FROM (SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0
                    THEN replace(text, ' table ', '.' || chr(10)) || '.'
                    ELSE replace(text, ' table ', '.' || chr(10)) END
                || CASE WHEN doc_id % 7 = 0
                    THEN chr(10) || 'click here to enable javascript now.'
                    ELSE '' END
                || CASE WHEN doc_id % 17 = 0
                    THEN chr(10) || 'function f() { return 1; }.'
                    ELSE '' END AS x
                FROM documents)),
            cl AS (SELECT doc_id, page,
              COALESCE(array_to_string(list_filter(
                string_split(page, chr(10)),
                l -> (ends_with(l, '.') OR ends_with(l, '!')
                      OR ends_with(l, '?') OR ends_with(l, '"'))
                  AND len(list_filter(string_split(l, ' '),
                        w -> w <> '')) >= 5
                  AND NOT contains(lower(l), 'javascript')),
                chr(10)), '') AS cleaned
              FROM inj)
            SELECT doc_id,
              len(string_split(page, chr(10))) AS n_lines,
              CASE WHEN cleaned = '' THEN 0
                   ELSE len(string_split(cleaned, chr(10))) END AS n_kept,
              len(regexp_extract_all(cleaned, '[.!?]')) AS n_sentences,
              (len(regexp_extract_all(cleaned, '[.!?]')) >= 3
               AND NOT contains(page, '{')
               AND NOT contains(lower(page), 'lorem ipsum')) AS pass,
              md5(cleaned) AS clean_md5
            FROM cl ORDER BY doc_id"""))

  private val p21 = Q(
    "p21_temperature_sample",
    // multilingual temperature sampling at alpha = 1/2: budget 200
    // across sources proportional to isqrt(n_s) — integer-only quotas
    // (no pow, no double sums), drawn with the p06 md5 machinery
    (s, dir) => Corpus.temperatureQuotaSample(
        Tables.load(s, dir, "documents"), "doc_id", "source", budget = 200L)
      .orderBy("doc_id"),
    Some("""WITH cnt AS (SELECT source, COUNT(*) AS n
              FROM documents GROUP BY source),
            w AS (SELECT source,
                CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS w
              FROM cnt),
            tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tot FROM w),
            q AS (SELECT source, 200 * w.w // tot.tot AS quota
              FROM w CROSS JOIN tot),
            r AS (SELECT doc_id, source,
                ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents)
            SELECT doc_id, source FROM r JOIN q USING (source)
            WHERE rn <= quota ORDER BY doc_id"""))

  private val t22 = Q(
    "t22_text_chunks",
    // embedding/RAG prep: 64-token windows every 48 tokens (16-token
    // overlap), last window truncated, empty docs dropped. Pure
    // scan-stage projection + bounded explode — no shuffle; chunk md5
    // stands in for the text so dup checks compose without moving it
    (s, dir) => Corpus.textChunks(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        window = 64, stride = 48)
      .orderBy("doc_id", "chunk_idx"),
    Some("""WITH tok AS (
              SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS ts
              FROM documents),
            c AS (SELECT doc_id, ts, len(ts) AS n
                  FROM tok WHERE len(ts) > 0),
            ch AS (SELECT doc_id, ts, n,
                unnest(generate_series(0, CAST((n - 1) // 48 AS BIGINT)))
                  AS chunk_idx
              FROM c)
            SELECT doc_id, chunk_idx,
              LEAST(64, n - chunk_idx * 48) AS n_chunk_tok,
              md5(array_to_string(
                ts[CAST(chunk_idx * 48 + 1 AS BIGINT) :
                   CAST(chunk_idx * 48 + LEAST(64, n - chunk_idx * 48)
                        AS BIGINT)], ' ')) AS chunk_md5
            FROM ch ORDER BY doc_id, chunk_idx"""))

  private val t23 = Q(
    "t23_model_quality",
    // trained model-based quality filter (the fastText/CCNet rung): the
    // classifier DISTILLS the t14 Gopher hard gates — train a hashed-BoW
    // logistic model on the even-doc_id half's pass/fail labels, score
    // the held-out odd half with the fused scan-stage expression. The
    // trained-float logit has no DuckDB mirror (rows-only); QualitySpec
    // gates planted-population accuracy, bit-reproducible training,
    // save/load, and expression≡reference-scorer equality
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
        .withColumn("label",
          TextOps.gopherPass(col("text"), 10, 100000, minStops = 1)
            .cast("double"))
      val model = QualityModel.train(
        docs.filter(col("doc_id") % 2 === 0), "text", "label")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), model.logit(col("text")).as("logit"),
          (model.logit(col("text")) > 0).as("pred"),
          col("label").as("gate_label"))
        .orderBy("doc_id")
    },
    None) // trained-float logits: rows-only, QualitySpec-gated

  private val t24 = Q(
    "t24_doc_keywords",
    // per-document keyword extraction: top-3 tokens by frequency lift
    // (tf/doc_len over cf/corpus_total — the integer-rational tf-idf of
    // t10, regrouped from language to DOCUMENT; minDf=3 suppresses
    // hapax noise). The lift is one double division of exact integer
    // products, ties break on the token string — both engines order
    // identically
    (s, dir) => Corpus.distinctiveTokensPerGroup(
        Tables.load(s, dir, "documents"), "text", "doc_id",
        k = 3, minDf = 3L)
      .orderBy("doc_id", "rk"),
    Some("""WITH tf AS (SELECT doc_id, token, COUNT(*) AS tf
              FROM (SELECT doc_id,
                      unnest(list_filter(string_split(text, ' '),
                        x -> x <> '')) AS token
                    FROM documents)
              GROUP BY doc_id, token),
              gt AS (SELECT doc_id, SUM(tf) AS gt FROM tf GROUP BY doc_id),
              ctf AS (SELECT token, SUM(tf) AS tc FROM tf GROUP BY token),
              tot AS (SELECT SUM(tc) AS total FROM ctf),
              lift AS (SELECT tf.doc_id, tf.token, tf.tf,
                  CAST(tf.tf * tot.total AS DOUBLE)
                    / CAST(gt.gt * ctf.tc AS DOUBLE) AS lift
                FROM tf JOIN ctf ON tf.token = ctf.token
                        JOIN gt ON tf.doc_id = gt.doc_id
                        CROSS JOIN tot
                WHERE ctf.tc >= 3)
            SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, lift, rk
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY lift DESC, token ASC) AS rk
                  FROM lift)
            WHERE rk <= 3 ORDER BY doc_id, rk"""))

  private val p23 = Q(
    "p23_length_batches",
    // length-grouped batching audit: batches of 32 docs cut from the
    // descending-length order, with the padding each fixed-shape batch
    // tensor would waste — all exact integers
    (s, dir) => Corpus.lengthBatches(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        batchSize = 32)
      .orderBy("batch_id"),
    Some("""WITH t AS (SELECT doc_id,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tok
              FROM documents),
            pos AS (SELECT *,
                ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS p
              FROM t)
            SELECT p // 32 AS batch_id, COUNT(*) AS n_docs,
              MAX(n_tok) AS max_tok, CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
              COUNT(*) * MAX(n_tok) - CAST(SUM(n_tok) AS BIGINT) AS padding
            FROM pos GROUP BY 1 ORDER BY 1"""))

  private val p32 = Q(
    "p32_batch_size_sweep",
    // batch-size knob table: padding waste / batch counts at each
    // candidate dataloader batch size from ONE descending-length
    // ranked pass (the d39/s22 measured-knob discipline applied to
    // p23's batching audit). Integer arithmetic + one IEEE division
    // per sweep row — hash-exact
    (s, dir) => Corpus.batchSizeSweep(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        sizes = Seq(8, 16, 32, 64, 128))
      .orderBy("batch_size"),
    Some("""WITH t AS (SELECT doc_id,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tok
              FROM documents),
            pos AS (SELECT n_tok,
                ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS p
              FROM t),
            sw AS (SELECT CAST(unnest([8, 16, 32, 64, 128]) AS BIGINT)
                AS batch_size),
            b AS (SELECT batch_size, p // batch_size AS bid,
                CAST(COUNT(*) AS BIGINT) AS nd,
                CAST(MAX(n_tok) AS BIGINT) AS mx,
                CAST(SUM(n_tok) AS BIGINT) AS sm
              FROM pos CROSS JOIN sw GROUP BY 1, 2),
            f AS (SELECT batch_size,
                CAST(COUNT(*) AS BIGINT) AS n_batches,
                CAST(SUM(nd * mx - sm) AS BIGINT) AS total_padding,
                CAST(SUM(sm) AS BIGINT) AS total_tok
              FROM b GROUP BY 1)
            SELECT batch_size, n_batches, total_padding, total_tok,
              CAST(total_padding AS DOUBLE)
                / CAST(total_padding + total_tok AS DOUBLE) AS waste_frac
            FROM f ORDER BY batch_size"""))

  private val p22 = Q(
    "p22_repeat_cap_mix",
    // data-constrained repeat-capped mixing (Muennighoff et al. 2023):
    // 100k-token budget, >=4-epoch cap; src0 weighted 8x and src1 4x cap
    // out at 4 full epochs, the rest land k full epochs + a token-exact
    // partial epoch in seeded md5 order. Integer-only shares and prefix
    // sums; the per-source prefix comes from ONE global prefixSumBy
    // minus broadcast source-start offsets (no per-source window)
    (s, dir) => Corpus.repeatCapMix(
        Tables.load(s, dir, "documents"), "doc_id", "source", "text",
        tokenBudget = 100000L, maxRepeats = 4,
        weights = Map("src0" -> 8, "src1" -> 4))
      .orderBy("doc_id", "epoch"),
    Some("""WITH tok AS (
              SELECT doc_id, source,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS tok,
                md5(CAST(doc_id AS VARCHAR)) AS key
              FROM documents),
            tot AS (SELECT source, SUM(tok) AS t FROM tok GROUP BY source),
            ws AS (SELECT source, t,
                CASE source WHEN 'src0' THEN 8 WHEN 'src1' THEN 4
                            ELSE 1 END AS w
              FROM tot),
            wt AS (SELECT SUM(w) AS wtot FROM ws),
            st AS (SELECT source, t,
                LEAST(100000 * w // wtot, 4 * t) AS alloc
              FROM ws CROSS JOIN wt),
            kr AS (SELECT source,
                CASE WHEN t = 0 THEN 0 ELSE alloc // t END AS k,
                CASE WHEN t = 0 THEN 0
                     ELSE alloc - (alloc // t) * t END AS rem
              FROM st),
            pre AS (SELECT doc_id, source, tok,
                COALESCE(SUM(tok) OVER (PARTITION BY source
                  ORDER BY key, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS pre
              FROM tok),
            reps AS (SELECT p.doc_id, p.source,
                CAST(kr.k + CASE WHEN p.pre < kr.rem THEN 1 ELSE 0 END
                     AS BIGINT) AS reps
              FROM pre p JOIN kr ON p.source = kr.source)
            SELECT doc_id, source,
              unnest(generate_series(0, reps - 1)) AS epoch
            FROM reps WHERE reps > 0 ORDER BY doc_id, epoch"""))

  private val t17 = Q(
    "t17_bpe_token_count",
    // exact per-doc token counts under corpus-trained BPE merges — the
    // real-tokenizer budget the whitespace/heuristic counts approximate.
    // No SQL oracle (DuckDB cannot BPE-encode); BpeFidelitySpec gates
    // strict equality against an independent reference trainer+encoder,
    // and the heuristic column makes the subword fan-out auditable
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      val merges = TextOps.trainBpeMerges(docs, "text", nMerges = 150)
      docs.select(col("doc_id"),
        TextOps.bpeTokenCountTrained(col("text"), merges).as("n_bpe_tok"),
        TextOps.bpeTokenCount(col("text")).as("n_heuristic"))
        .orderBy("doc_id")
    },
    None)

  private val d24 = Q(
    "d24_cluster_sizes",
    // duplicate-factor distribution: cluster-size histogram over the
    // full corpus (singletons included via the p24 left-join+coalesce
    // labeling) — the release metric that says HOW duplicated a corpus
    // is, not just which docs to drop. Two tiny rollups above the d08
    // CC machinery: label -> size, size -> n_clusters
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Corpus.leakageSafeSplit(docs,
          Dedup.nGramJaccard(docs, "text", "doc_id", tauNum = 1, tauDen = 2),
          "doc_id", "id_a", "id_b")
        .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum("sz").as("n_docs"))
        .orderBy("cluster_size")
    },
    Some(s"""WITH RECURSIVE $pairsCte,
               edges AS (SELECT ia AS u, ib AS v FROM pairs
                         UNION SELECT ib, ia FROM pairs),
               reach(u, v) AS (
                 SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
               comp AS (SELECT u AS doc_id, MIN(v) AS cluster_id
                        FROM reach GROUP BY u),
               lab AS (SELECT d.doc_id,
                         COALESCE(comp.cluster_id, d.doc_id) AS cluster_id
                       FROM documents d LEFT JOIN comp USING (doc_id)),
               szs AS (SELECT cluster_id, COUNT(*) AS sz
                       FROM lab GROUP BY cluster_id)
             SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
               CAST(SUM(sz) AS BIGINT) AS n_docs
             FROM szs GROUP BY sz ORDER BY sz"""))

  private val p24 = Q(
    "p24_leakage_split",
    // leakage-safe splitting: p01's md5 rule applied to the duplicate-
    // CLUSTER label (d08's exact pair->CC chain), so near-copies never
    // straddle the train/eval boundary; singletons keep p01's split
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Corpus.leakageSafeSplit(docs,
          Dedup.nGramJaccard(docs, "text", "doc_id", tauNum = 1, tauDen = 2),
          "doc_id", "id_a", "id_b")
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $pairsCte,
               edges AS (SELECT ia AS u, ib AS v FROM pairs
                         UNION SELECT ib, ia FROM pairs),
               reach(u, v) AS (
                 SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
               comp AS (SELECT u AS doc_id, MIN(v) AS cluster_id
                        FROM reach GROUP BY u),
               lab AS (SELECT d.doc_id,
                         COALESCE(comp.cluster_id, d.doc_id) AS cluster_id
                       FROM documents d LEFT JOIN comp USING (doc_id))
             SELECT doc_id, cluster_id,
               CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 32, 1)
                      IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                    THEN 'train'
                    WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 32, 1)
                      IN ('c','d')
                    THEN 'val'
                    ELSE 'test' END AS split
             FROM lab ORDER BY doc_id"""))

  private val t29 = Q(
    "t29_pr_curve",
    // the threshold table t27's AUC summarizes: precision/recall of
    // "surprisal >= q-th decile" against the gate-failure label at
    // every interior decile — exact percentile cuts broadcast, one
    // pass of q40-style filtered aggregates, integer-exact counts
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val scored = Corpus.surprisalPerDoc(docs, "doc_id", "text",
          col("lang") === "en")
        .select(col("doc_id"), col("bits_per_token"))
      val labeled = docs.select(col("doc_id"),
        (!TextOps.gopherPass(col("text"), 10, 100000, minStops = 1))
          .cast("long").as("fail"))
      Corpus.prCurve(scored.join(labeled, "doc_id"),
          "bits_per_token", "fail", points = 10)
        .orderBy("q")
    },
    Some(s"""WITH $gopherCte,
            toks AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS token
              FROM documents),
            ref AS (SELECT unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS token
              FROM documents WHERE lang = 'en'),
            cnt AS (SELECT token, COUNT(*) AS cnt FROM ref GROUP BY token),
            tot AS (SELECT COUNT(*) AS ref_total FROM ref),
            bits AS (SELECT t.doc_id,
                LENGTH(bin(tot.ref_total // COALESCE(c.cnt, 1))) AS bits
              FROM toks t LEFT JOIN cnt c ON t.token = c.token
                   CROSS JOIN tot),
            agg AS (SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS sum_bits,
                COUNT(*) AS n_tok
              FROM bits GROUP BY doc_id),
            sc AS (SELECT gp.doc_id,
                CAST(a.sum_bits AS DOUBLE) / a.n_tok AS score,
                CASE WHEN gp.pass THEN 0 ELSE 1 END AS lab
              FROM gp JOIN agg a USING (doc_id)
              WHERE a.n_tok > 0),
            cuts AS (SELECT unnest(quantile_cont(score,
                  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]))
                  AS threshold,
                generate_subscripts(quantile_cont(score,
                  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]), 1)
                  AS q
              FROM sc),
            p AS (SELECT CAST(SUM(lab) AS BIGINT) AS p FROM sc),
            byq AS (SELECT c.q, c.threshold,
                CAST(SUM(CASE WHEN s.score >= c.threshold THEN 1
                         ELSE 0 END) AS BIGINT) AS n_pred,
                CAST(SUM(CASE WHEN s.score >= c.threshold THEN s.lab
                         ELSE 0 END) AS BIGINT) AS tp
              FROM cuts c CROSS JOIN sc s GROUP BY c.q, c.threshold)
            SELECT q, threshold, n_pred, tp,
              CASE WHEN n_pred > 0
                   THEN CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)
                   ELSE NULL END AS precision,
              CASE WHEN p.p > 0
                   THEN CAST(tp AS DOUBLE) / CAST(p.p AS DOUBLE)
                   ELSE NULL END AS recall
            FROM byq CROSS JOIN p ORDER BY q"""))

  private val t28 = Q(
    "t28_gate_agreement",
    // do the two heuristic screens measure the same thing? Cohen's
    // kappa between t14's Gopher gate and t02's composite-quality
    // threshold — 2x2 contingency as exact longs from ONE aggregation,
    // kappa as one division (the chance-corrected agreement a release
    // review reads before stacking filters)
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Corpus.gateAgreement(docs,
        TextOps.gopherPass(col("text"), 10, 100000, minStops = 1),
        TextOps.qualityScore(col("text")) >= 0.5)
    },
    Some(s"""WITH $gopherCte,
            qc AS (SELECT doc_id,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tokens,
                len(list_filter(string_split(text, ' '),
                  x -> x IN ('the','a','of','and','is','in','to')))
                  AS n_stopwords,
                length(text) - length(regexp_replace(text, '[.,!?;:]',
                  '', 'g')) AS n_punct,
                length(text) - length(regexp_replace(text, '[A-Z]', '',
                  'g')) AS n_upper,
                length(text) AS n_chars
              FROM documents),
            q AS (SELECT doc_id,
                0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
                + 0.3 * (CAST(n_stopwords AS DOUBLE)
                         / greatest(CAST(n_tokens AS DOUBLE), 1.0))
                + 0.2 * (1.0 - CAST(n_punct AS DOUBLE)
                               / greatest(CAST(n_chars AS DOUBLE), 1.0))
                + 0.1 * (1.0 - CAST(n_upper AS DOUBLE)
                               / greatest(CAST(n_chars AS DOUBLE), 1.0))
                  AS quality
              FROM qc),
            fl AS (SELECT gp.pass AS fa, q.quality >= 0.5 AS fb
                   FROM gp JOIN q USING (doc_id)),
            ct AS (SELECT
                CAST(SUM(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT) AS a,
                CAST(SUM(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT) AS b,
                CAST(SUM(CASE WHEN NOT fa AND fb THEN 1 ELSE 0 END) AS BIGINT) AS c,
                CAST(SUM(CASE WHEN NOT fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT) AS d
              FROM fl)
            SELECT a AS both_pass, b AS only_a, c AS only_b,
              d AS both_fail,
              CASE WHEN (a+b+c+d)*(a+b+c+d)
                     - ((a+b)*(a+c) + (c+d)*(b+d)) <> 0 THEN
                CAST((a+b+c+d)*(a+d) - ((a+b)*(a+c) + (c+d)*(b+d))
                     AS DOUBLE)
                / CAST((a+b+c+d)*(a+b+c+d)
                       - ((a+b)*(a+c) + (c+d)*(b+d)) AS DOUBLE)
              ELSE NULL END AS kappa
            FROM ct"""))

  private val t27 = Q(
    "t27_signal_auc",
    // exact tie-aware AUC over the full corpus: does the t16 unigram
    // surprisal signal actually predict the t14 hard-gate failures?
    // The metric a quality-signal calibration loop reads, as one
    // integer-exact rank-sum — no sampling, no per-row ranks. (On this
    // synthetic corpus the signal comes out INVERTED (~0.28): gate
    // failures are mostly missing-stopword docs, which the uniform
    // tech-word vocabulary scores as LOW-surprisal — exactly the kind
    // of calibration fact you measure before trusting a signal)
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val scored = Corpus.surprisalPerDoc(docs, "doc_id", "text",
          col("lang") === "en")
        .select(col("doc_id"), col("bits_per_token"))
      val labeled = docs.select(col("doc_id"),
        (!TextOps.gopherPass(col("text"), 10, 100000, minStops = 1))
          .cast("long").as("fail"))
      Corpus.exactAuc(scored.join(labeled, "doc_id"),
        "bits_per_token", "fail")
    },
    Some(s"""WITH $gopherCte,
            toks AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS token
              FROM documents),
            ref AS (SELECT unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS token
              FROM documents WHERE lang = 'en'),
            cnt AS (SELECT token, COUNT(*) AS cnt FROM ref GROUP BY token),
            tot AS (SELECT COUNT(*) AS ref_total FROM ref),
            bits AS (SELECT t.doc_id,
                LENGTH(bin(tot.ref_total // COALESCE(c.cnt, 1))) AS bits
              FROM toks t LEFT JOIN cnt c ON t.token = c.token
                   CROSS JOIN tot),
            agg AS (SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS sum_bits,
                COUNT(*) AS n_tok
              FROM bits GROUP BY doc_id),
            sc AS (SELECT gp.doc_id,
                CAST(a.sum_bits AS DOUBLE) / a.n_tok AS score,
                CASE WHEN gp.pass THEN 0 ELSE 1 END AS lab
              FROM gp JOIN agg a USING (doc_id)
              WHERE a.n_tok > 0),
            g AS (SELECT score, COUNT(*) AS n, SUM(lab) AS npos
                  FROM sc GROUP BY score),
            c2 AS (SELECT *, COALESCE(SUM(n) OVER (ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS cum FROM g),
            t AS (SELECT CAST(SUM(npos * (2 * cum + n + 1)) AS BIGINT)
                AS r2,
                CAST(SUM(n) AS BIGINT) AS nt,
                CAST(SUM(npos) AS BIGINT) AS p FROM c2)
            SELECT nt AS n_rows, p AS n_pos,
              CASE WHEN p > 0 AND p < nt THEN
                CAST(r2 - p * (p + 1) AS DOUBLE)
                  / CAST(2 * p * (nt - p) AS DOUBLE)
              ELSE NULL END AS auc
            FROM t"""))

  private val t26 = Q(
    "t26_html_strip",
    // HTML extraction ahead of the text ladder: the corpus is plain
    // text, so both engines derive the same markup deterministically
    // (the t13 injection pattern — a third of docs get a page wrapper
    // with a script block, a third get double-encoded entities), strip
    // it, and compare the recovered text
    (s, dir) => {
      val raw = Tables.loadParallel(s, dir, "documents")
        .withColumn("page",
          when(col("doc_id") % 3 === 0, concat(
            lit("<html><body onload=\"x()\"><p>"), col("text"),
            lit("</p><script>var x=1;\nalert('hi');</script></body></html>")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("start &amp;amp; "), col("text"), lit(" &lt;end&gt;")))
          .otherwise(col("text")))
      raw.select(col("doc_id"),
          TextOps.stripHtml(col("page")).as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).as("n_chars"))
        .orderBy("doc_id")
    },
    Some("""WITH pg AS (SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN
                '<html><body onload="x()"><p>' || text ||
                '</p><script>var x=1;' || chr(10) ||
                'alert(''hi'');</script></body></html>'
              WHEN doc_id % 3 = 1 THEN
                'start &amp;amp; ' || text || ' &lt;end&gt;'
              ELSE text END AS page
            FROM documents),
            cl AS (SELECT doc_id, trim(regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(page,
                          '(?is)<(script|style)[^>]*>.*?</(script|style)>',
                          ' ', 'g'),
                        '<[^>]+>', ' ', 'g'),
                      '&lt;', '<', 'g'),
                    '&gt;', '>', 'g'),
                  '&quot;', '"', 'g'),
                '&#39;', '''', 'g'),
              '[ \t'
              || chr(10) || chr(13) || ']+', ' ', 'g')) AS clean0
            FROM pg),
            dec AS (SELECT doc_id,
              regexp_replace(clean0, '&amp;', '&', 'g') AS clean
            FROM cl)
            SELECT doc_id, md5(clean) AS clean_md5,
              length(clean) AS n_chars
            FROM dec ORDER BY doc_id"""))

  private val t31 = Q(
    "t31_unigram_token_ids",
    // the SentencePiece emit: documents as ids under the corpus-trained
    // unigram vocabulary (canonical sorted-piece id space; OOV glyphs in
    // the vocabSize+codePoint fallback range), count column proving
    // size(ids) == the t25 counter in-row
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      val model = UnigramTokenizer.train(docs, "text", vocabSize = 48)
      docs.select(col("doc_id"),
        TextOps.unigramEncodeIds(col("text"), model.pieces).as("ids"),
        TextOps.unigramTokenCount(col("text"), model.pieces).as("n_tok"))
        // harness boundary: digest + size, never the raw array (r8 lesson —
        // pandas cannot sort array cells; the array API stays in TextOps)
        .select(col("doc_id"), Relational.harnessDigest(col("ids")).as("ids_md5"),
          size(col("ids")).as("n_ids"), col("n_tok"))
        .orderBy("doc_id")
    },
    None)

  private val t30 = Q(
    "t30_bpe_token_ids",
    // the emit step: documents as TRAINING IDS under the corpus-trained
    // merges (deterministic BpeVocab id space), with the count column
    // proving size(ids) == the t17 counter in-row. Arrays of trained
    // ids have no DuckDB mirror (rows-only); BpeFidelitySpec-style
    // gates live in TextOpsSpec (round-trip, count equality)
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      val merges = TextOps.trainBpeMerges(docs, "text", nMerges = 150)
      docs.select(col("doc_id"),
        TextOps.bpeEncodeIds(col("text"), merges).as("ids"),
        TextOps.bpeTokenCountTrained(col("text"), merges).as("n_tok"))
        // harness boundary: digest + size, never the raw array (r8 lesson)
        .select(col("doc_id"), Relational.harnessDigest(col("ids")).as("ids_md5"),
          size(col("ids")).as("n_ids"), col("n_tok"))
        .orderBy("doc_id")
    },
    None)

  private val t25 = Q(
    "t25_unigram_token_count",
    // exact per-doc token counts under a corpus-trained unigram-LM
    // (SentencePiece) vocabulary — the second production tokenizer
    // beside t17's BPE, counted side by side so the two segmentations
    // are directly comparable. No SQL oracle (DuckDB cannot Viterbi-
    // segment); UnigramSpec gates EM log-likelihood monotonicity,
    // Viterbi ≡ brute-force enumeration, bit-reproducible training,
    // and the parquet round-trip
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      // the synthetic corpus has ~31 distinct words; a tight vocab
      // (chars + the frequency head) forces genuine subword splits so
      // the count column actually exercises the Viterbi path
      val model = UnigramTokenizer.train(docs, "text", vocabSize = 48)
      docs.select(col("doc_id"),
        TextOps.unigramTokenCount(col("text"), model.pieces)
          .as("n_unigram_tok"),
        TextOps.tokenCount(col("text")).as("n_ws_tok"))
        .orderBy("doc_id")
    },
    None)

  private val t32 = Q(
    "t32_byte_bpe_count",
    // BYTE-level BPE exact token counting (GPT-2-style byte fallback):
    // every glyph tokenizes with zero OOV, so the count matches a real
    // model's budget on multilingual text where the alpha-run BPE (t17)
    // flattens non-alpha glyphs to one token each. No DuckDB mirror
    // (rows-only); ByteBpeSpec gates trainer+encoder strict equality vs
    // an independent reference, the total lossless round-trip, and the
    // zero-OOV id-range bound
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      val merges = TextOps.trainByteBpeMerges(docs, "text", nMerges = 200)
      docs.select(col("doc_id"),
        TextOps.byteBpeTokenCount(col("text"), merges).as("n_byte_tok"),
        octet_length(col("text")).as("n_bytes"),
        TextOps.tokenCount(col("text")).as("n_ws_tok"))
        .orderBy("doc_id")
    },
    None)

  private val t33 = Q(
    "t33_byte_bpe_ids",
    // the byte-level emit: documents as training ids under the trained
    // byte merges (id = byte value 0..255 or 256+mergeRank). Harness
    // boundary ships the digest + sizes (the r9 convention); n_ids ≡
    // n_tok in-row proves encode and count share one engine
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      val merges = TextOps.trainByteBpeMerges(docs, "text", nMerges = 200)
      docs.select(col("doc_id"),
        TextOps.byteBpeEncodeIds(col("text"), merges).as("ids"),
        TextOps.byteBpeTokenCount(col("text"), merges).as("n_tok"))
        .select(col("doc_id"),
          Relational.harnessDigest(col("ids")).as("ids_md5"),
          size(col("ids")).as("n_ids"), col("n_tok"))
        .orderBy("doc_id")
    },
    None)

  private val t34 = Q(
    "t34_bm25_search",
    // BM25 keyword retrieval: top-10 docs per query under the canonical
    // k1=1.2/b=0.75 ranking with whole-bit idf (length(bin(N div df)))
    // and cleared rational denominators — every term score is one IEEE
    // division of exact longs, summed through DECIMAL(18,6) so the
    // DuckDB oracle matches bit-for-bit (no ln, no float-sum order)
    (s, dir) => {
      val queries = s.createDataFrame(Seq(
        (0, "join"), (0, "hash"), (1, "vector"), (1, "stream"),
        (2, "customer"))).toDF("query_id", "term")
      Corpus.bm25TopK(Tables.load(s, dir, "documents"),
          "doc_id", "text", queries, k = 10)
        .orderBy("query_id", "rk")
    },
    Some("""WITH q(query_id, term) AS (VALUES
              (0, 'join'), (0, 'hash'), (1, 'vector'), (1, 'stream'),
              (2, 'customer')),
            tok AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS token
              FROM documents),
            tf AS (SELECT doc_id, token, COUNT(*) AS tf
                   FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
            stats AS (SELECT COUNT(*) AS n, SUM(dl) AS a FROM dl),
            dft AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
            scored AS (
              SELECT q.query_id, tf.doc_id,
                SUM(CAST(
                  CAST(44 * a * tf.tf * length(bin(n // df)) AS DOUBLE) /
                  CAST(20 * a * tf.tf + 6 * a + 18 * dl.dl * n AS DOUBLE)
                  AS DECIMAL(18, 6))) AS s
              FROM q JOIN tf ON q.term = tf.token
              JOIN dft ON dft.token = tf.token
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats
              GROUP BY 1, 2),
            ranked AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY s DESC, doc_id) AS rk,
                CAST(s AS DOUBLE) AS score
              FROM scored)
            SELECT query_id, rk, doc_id, score FROM ranked
            WHERE rk <= 10 ORDER BY query_id, rk"""))

  private val t35 = Q(
    "t35_kn_bigram",
    // interpolated Kneser-Ney bigram scoring (D=3/4) in whole bits —
    // the properly-smoothed rung above t20's hapax backoff: unseen
    // pairs score by CONTINUATION probability; non-en docs exercise
    // every branch against the en-trained tables
    (s, dir) => Corpus.knBigramPerDoc(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id"),
    Some("""WITH base AS (SELECT doc_id, lang,
                list_filter(string_split(text, ' '), x -> x <> '') AS l
              FROM documents),
            toks AS (SELECT doc_id, lang, unnest(l) AS w,
                generate_subscripts(l, 1) AS rn
              FROM base),
            pairsall AS (SELECT a.doc_id, a.lang, a.w AS w1, b.w AS w2
              FROM toks a JOIN toks b
                ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
            pc AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairsall
                   WHERE lang = 'en' GROUP BY 1, 2),
            ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                COUNT(*) AS n1w1 FROM pc GROUP BY 1),
            cont AS (SELECT w2, COUNT(*) AS nc2 FROM pc GROUP BY 1),
            nt AS (SELECT COUNT(*) AS ntot FROM pc),
            scored AS (SELECT p.doc_id,
                CASE WHEN ctx.c1 IS NULL THEN 1
                  WHEN (COALESCE((4 * pc.c12 - 3) * ntot, 0)
                      + 3 * ctx.n1w1 * COALESCE(cont.nc2, 0)) > 0
                  THEN length(bin((4 * ctx.c1 * ntot) //
                    (COALESCE((4 * pc.c12 - 3) * ntot, 0)
                      + 3 * ctx.n1w1 * COALESCE(cont.nc2, 0))))
                  ELSE length(bin(4 * ctx.c1 * ntot)) END AS bits
              FROM pairsall p
              LEFT JOIN pc ON p.w1 = pc.w1 AND p.w2 = pc.w2
              LEFT JOIN ctx ON p.w1 = ctx.w1
              LEFT JOIN cont ON p.w2 = cont.w2
              CROSS JOIN nt),
            agg AS (SELECT doc_id, SUM(bits) AS sum_bits,
                COUNT(*) AS n_pairs FROM scored GROUP BY 1)
            SELECT d.doc_id,
              CAST(COALESCE(sum_bits, 0) AS BIGINT) AS sum_bits,
              COALESCE(n_pairs, 0) AS n_pairs,
              CASE WHEN COALESCE(n_pairs, 0) = 0 THEN NULL
                ELSE CAST(sum_bits AS DOUBLE) / n_pairs
              END AS bits_per_pair
            FROM documents d LEFT JOIN agg USING (doc_id)
            ORDER BY d.doc_id"""))

  private val t37 = Q(
    "t37_kn_trigram",
    // interpolated Kneser-Ney TRIGRAM scoring (D=3/4) in whole bits —
    // t35's recursion one order up, interpolating through the
    // bigram-continuation distribution; non-en docs exercise the
    // unseen-context backoff ladder against the en-trained tables
    (s, dir) => Corpus.knTrigramPerDoc(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id"),
    Some("""WITH base AS (SELECT doc_id, lang,
                list_filter(string_split(text, ' '), x -> x <> '') AS l
              FROM documents),
            toks AS (SELECT doc_id, lang, unnest(l) AS w,
                generate_subscripts(l, 1) AS rn
              FROM base),
            triall AS (SELECT a.doc_id, a.lang,
                a.w AS w1, b.w AS w2, c.w AS w3
              FROM toks a
              JOIN toks b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
              JOIN toks c ON a.doc_id = c.doc_id AND c.rn = a.rn + 2),
            tc AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM triall
                   WHERE lang = 'en' GROUP BY 1, 2, 3),
            ctx AS (SELECT w1, w2, CAST(SUM(c123) AS BIGINT) AS c12,
                COUNT(*) AS n3 FROM tc GROUP BY 1, 2),
            bb AS (SELECT w2, w3, COUNT(*) AS b23 FROM tc GROUP BY 1, 2),
            mid AS (SELECT w2, COUNT(*) AS m2 FROM tc GROUP BY 1),
            bt AS (SELECT DISTINCT a.w AS b1, b.w AS b2
              FROM toks a
              JOIN toks b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
              WHERE a.lang = 'en'),
            ft AS (SELECT b1 AS w2, COUNT(*) AS f2 FROM bt GROUP BY 1),
            nt3 AS (SELECT b2 AS w3, COUNT(*) AS nc3 FROM bt GROUP BY 1),
            nb AS (SELECT COUNT(*) AS nbt FROM bt),
            scored AS (SELECT t.doc_id,
                CASE WHEN ctx.c12 IS NOT NULL THEN
                  CASE WHEN (4 * COALESCE(4 * tc.c123 - 3, 0)
                        * mid.m2 * nbt
                      + 3 * ctx.n3 * (COALESCE((4 * bb.b23 - 3) * nbt, 0)
                        + 3 * ft.f2 * COALESCE(nt3.nc3, 0))) > 0
                    THEN length(bin((16 * ctx.c12 * mid.m2 * nbt) //
                      (4 * COALESCE(4 * tc.c123 - 3, 0) * mid.m2 * nbt
                        + 3 * ctx.n3 *
                          (COALESCE((4 * bb.b23 - 3) * nbt, 0)
                            + 3 * ft.f2 * COALESCE(nt3.nc3, 0)))))
                    ELSE length(bin(16 * ctx.c12 * mid.m2 * nbt)) END
                WHEN mid.m2 IS NOT NULL THEN
                  CASE WHEN (COALESCE((4 * bb.b23 - 3) * nbt, 0)
                      + 3 * ft.f2 * COALESCE(nt3.nc3, 0)) > 0
                    THEN length(bin((4 * mid.m2 * nbt) //
                      (COALESCE((4 * bb.b23 - 3) * nbt, 0)
                        + 3 * ft.f2 * COALESCE(nt3.nc3, 0))))
                    ELSE length(bin(4 * mid.m2 * nbt)) END
                ELSE 1 END AS bits
              FROM triall t
              LEFT JOIN tc ON t.w1 = tc.w1 AND t.w2 = tc.w2
                AND t.w3 = tc.w3
              LEFT JOIN ctx ON t.w1 = ctx.w1 AND t.w2 = ctx.w2
              LEFT JOIN bb ON t.w2 = bb.w2 AND t.w3 = bb.w3
              LEFT JOIN mid ON t.w2 = mid.w2
              LEFT JOIN ft ON t.w2 = ft.w2
              LEFT JOIN nt3 ON t.w3 = nt3.w3
              CROSS JOIN nb),
            agg AS (SELECT doc_id, SUM(bits) AS sum_bits,
                COUNT(*) AS n_tri FROM scored GROUP BY 1)
            SELECT d.doc_id,
              CAST(COALESCE(sum_bits, 0) AS BIGINT) AS sum_bits,
              COALESCE(n_tri, 0) AS n_tri,
              CASE WHEN COALESCE(n_tri, 0) = 0 THEN NULL
                ELSE CAST(sum_bits AS DOUBLE) / n_tri
              END AS bits_per_tri
            FROM documents d LEFT JOIN agg USING (doc_id)
            ORDER BY d.doc_id"""))

  private val t39 = Q(
    "t39_hist_quantiles",
    // fixed-bin histogram quantiles per lang — t05's bounded-state scale
    // path: bin counters are mergeable sums (state = max_len/16 cells
    // per group, not the value multiset), quantile = first bin whose
    // cumulative count reaches the ceil-rank, reported as the bin's
    // upper edge. Pure integer arithmetic end to end, so unlike t05's
    // interpolated median this rung is hash-exact by construction
    (s, dir) => Corpus.histQuantiles(
        Tables.load(s, dir, "documents"), "text", "lang", binWidth = 16L),
    Some("""WITH tok AS (SELECT lang,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tok
              FROM documents),
            b AS (SELECT lang, n_tok // 16 AS bin, COUNT(*) AS cnt
              FROM tok GROUP BY 1, 2),
            c AS (SELECT lang, bin, cnt,
                SUM(cnt) OVER (PARTITION BY lang ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                SUM(cnt) OVER (PARTITION BY lang) AS total
              FROM b)
            SELECT lang, CAST(MAX(total) AS BIGINT) AS n_docs,
              MIN(CASE WHEN cum >= (total * 1 + 1) // 2
                THEN (bin + 1) * 16 END) AS p50_hi,
              MIN(CASE WHEN cum >= (total * 9 + 9) // 10
                THEN (bin + 1) * 16 END) AS p90_hi,
              MIN(CASE WHEN cum >= (total * 99 + 99) // 100
                THEN (bin + 1) * 16 END) AS p99_hi
            FROM c GROUP BY lang ORDER BY lang"""))

  /** Luhn check digit for the planted card `'4' || lpad(base, 14, '0')`,
    * derived NUMERICALLY from `base` (no string ops in the injection, so
    * both engines build byte-identical cards): prefix digit k (units
    * position k of base) sits at left position 15−k of the PAN, which is
    * odd — doubled — exactly when k is even; the leading '4' (position 1)
    * always doubles to 8. `shift` corrupts the check digit mod 10 for
    * the planted-invalid arm. `divOp` = `div` (Spark) / `//` (DuckDB).
    */
  private def luhnChkSql(divOp: String, shift: Int): String = {
    val terms = (0 to 13).map { k =>
      val d = s"((base $divOp ${"1" + "0" * k}) % 10)"
      if (k % 2 == 0) s"(CASE WHEN 2*$d > 9 THEN 2*$d - 9 ELSE 2*$d END)"
      else d
    }
    s"((10 - ((8 + ${terms.mkString(" + ")}) % 10)) % 10 + $shift) % 10"
  }

  /** The t13 injection pattern for cards: ids %7==0 get a Luhn-VALID
    * card, %7==3 the same card with the check digit shifted +5 (invalid
    * by construction — Luhn catches every single-digit substitution).
    */
  private def cardInjectSql(divOp: String, strT: String): String = {
    def card(shift: Int) = {
      val f = s"('4' || lpad(CAST(base AS $strT), 14, '0') || " +
        s"CAST(${luhnChkSql(divOp, shift)} AS $strT))"
      s"(substr($f, 1, 4) || '-' || substr($f, 5, 4) || '-' || " +
        s"substr($f, 9, 4) || '-' || substr($f, 13, 4))"
    }
    s"""CASE WHEN doc_id % 7 = 0 THEN text || ' card ' || ${card(0)}
          WHEN doc_id % 7 = 3 THEN text || ' ref ' || ${card(5)}
          ELSE text END"""
  }

  /** The mod-10 sum of [[graft.ops.TextOps.luhnValid]] as oracle SQL over
    * a candidate expression (16 fixed substring terms, separators
    * stripped) — term-for-term the Spark expression.
    */
  private def luhnCandSql(cand: String): String = {
    val terms = (1 to 16).map { p =>
      val d = s"CAST(substr(translate($cand, '- ', ''), $p, 1) AS INT)"
      if (p % 2 == 1) s"(CASE WHEN 2*$d > 9 THEN 2*$d - 9 ELSE 2*$d END)"
      else d
    }
    s"(${terms.mkString(" + ")}) % 10 = 0"
  }

  private val t38 = Q(
    "t38_luhn_redact",
    // checksum-validated card redaction — the PII rung above t13's
    // pattern-only regexes: candidates come from the same linear-scan
    // regex family, but only Luhn-passing candidates are redacted (the
    // false-positive control for order numbers / serials — any 16
    // digits match the pattern, ~10% pass the checksum). The audit
    // reports candidate/valid counts, the md5 of the validated strings,
    // and the md5 of the Luhn-aware redaction (a left fold of exact
    // replaces — a blanket regexp_replace can't decide per candidate)
    (s, dir) => {
      val inj = Tables.load(s, dir, "documents")
        .withColumn("base", expr("doc_id % 100000000"))
        .withColumn("text", expr(cardInjectSql("div", "STRING")))
      inj.select(col("doc_id"),
          size(TextOps.cardCandidates(col("text"))).as("n_cands"),
          size(TextOps.validCards(col("text"))).as("n_valid"),
          md5(array_join(TextOps.validCards(col("text")), "|"))
            .as("valid_md5"),
          md5(TextOps.redactCards(col("text"))).as("red_md5"))
        .orderBy("doc_id")
    },
    Some(s"""WITH basej AS (SELECT doc_id, text,
                doc_id % 100000000 AS base FROM documents),
            inj AS (SELECT doc_id,
                ${cardInjectSql("//", "VARCHAR")} AS text
              FROM basej),
            c AS (SELECT doc_id, text, regexp_extract_all(text,
                '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}') AS cands
              FROM inj),
            v AS (SELECT doc_id, text, cands,
                list_filter(cands, cc -> ${luhnCandSql("cc")}) AS valid
              FROM c)
            SELECT doc_id, len(cands) AS n_cands, len(valid) AS n_valid,
              md5(coalesce(array_to_string(valid, '|'), '')) AS valid_md5,
              md5(CASE WHEN len(valid) = 0 THEN text
                ELSE list_reduce(list_prepend(text, valid),
                  (acc, x) -> replace(acc, x, '<CARD>')) END) AS red_md5
            FROM v ORDER BY doc_id"""))

  private val t36 = Q(
    "t36_content_extract",
    // boilerplate-density main-content extraction (Kohlschütter et al.
    // WSDM 2010 NumWords/LinkDensity rules) — the corpus is plain text,
    // so both engines derive the same page deterministically (the t13
    // injection pattern): a nav line of anchors, the doc text split
    // into lines at " table ", an opt-in mixed "read more" line, and
    // an anchor-heavy footer. The rules run with EXACT integer
    // threshold comparisons (3·anchor ≤ chars; 9·anchor ≤ 5·chars) —
    // no division in either engine
    (s, dir) => {
      val nav = "<a href=\"/\">home</a> <a href=\"/about\">about</a> " +
        "<a href=\"/contact\">contact</a>"
      val footer = "copyright <a href=\"/tos\">terms</a> " +
        "<a href=\"/privacy\">privacy</a>"
      val body = regexp_replace(col("text"), " table ", ".\n")
      val page = concat(
        lit(nav + "\n"), body,
        when(col("doc_id") % 5 === 0,
          lit("\nread more in <a href=\"/shop\">our shop</a> today"))
          .otherwise(lit("")),
        lit("\n" + footer))
      Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"), page.as("page"))
        .select(col("doc_id"),
          TextOps.densityExtract(col("page")).as("extract"),
          size(split(col("page"), "\n")).as("n_lines"))
        .select(col("doc_id"), md5(col("extract")).as("extract_md5"),
          coalesce(length(col("extract")), lit(0)).as("n_chars"),
          col("n_lines"))
        .orderBy("doc_id")
    },
    Some("""WITH pg AS (SELECT doc_id,
              '<a href="/">home</a> <a href="/about">about</a> ' ||
              '<a href="/contact">contact</a>' || chr(10) ||
              regexp_replace(text, ' table ', '.' || chr(10), 'g') ||
              CASE WHEN doc_id % 5 = 0 THEN chr(10) ||
                'read more in <a href="/shop">our shop</a> today'
                ELSE '' END || chr(10) ||
              'copyright <a href="/tos">terms</a> ' ||
              '<a href="/privacy">privacy</a>' AS page
            FROM documents),
            lines AS (SELECT doc_id,
                unnest(string_split(page, chr(10))) AS ln,
                generate_subscripts(string_split(page, chr(10)), 1) AS idx,
                len(string_split(page, chr(10))) AS n_lines
              FROM pg),
            feat AS (SELECT doc_id, idx, n_lines,
                regexp_replace(ln, '<[^>]+>', '', 'g') AS clean,
                COALESCE(length(array_to_string(regexp_extract_all(ln,
                  '<a[^>]*>(.*?)</a>', 1), '')), 0) AS anchor
              FROM lines),
            feat2 AS (SELECT doc_id, idx, n_lines, clean, anchor,
                length(clean) AS clen,
                len(list_filter(string_split(clean, ' '), x -> x <> ''))
                  AS words
              FROM feat),
            nb AS (SELECT doc_id, idx, n_lines, clean, anchor, clen, words,
                lag(anchor) OVER w AS panchor,
                lag(clen) OVER w AS pclen,
                lag(words) OVER w AS pwords,
                lead(words) OVER w AS nwords
              FROM feat2
              WINDOW w AS (PARTITION BY doc_id ORDER BY idx)),
            cls AS (SELECT doc_id, idx, n_lines, clean,
                CASE WHEN anchor * 3 <= clen THEN
                  CASE WHEN COALESCE(panchor * 9 <= pclen * 5, TRUE)
                    THEN (words > 16 OR COALESCE(nwords, 0) > 15
                      OR COALESCE(pwords, 0) > 4)
                    ELSE (words > 40 OR COALESCE(nwords, 0) > 17) END
                  ELSE FALSE END AS content
              FROM nb),
            agg AS (SELECT doc_id, MAX(n_lines) AS n_lines,
                string_agg(clean, chr(10) ORDER BY idx)
                  FILTER (WHERE content) AS extract
              FROM cls GROUP BY 1)
            SELECT doc_id, md5(extract) AS extract_md5,
              CAST(COALESCE(length(extract), 0) AS INT) AS n_chars,
              CAST(n_lines AS INT) AS n_lines
            FROM agg ORDER BY doc_id"""))

  private val p13 = Q(
    "p13_seeded_shuffle",
    // deterministic per-epoch training shuffle: md5(seed:id) permutation
    // with dense positions via the same no-global-window machinery as p07
    (s, dir) => Corpus.seededShuffle(
        Tables.load(s, dir, "documents"), "doc_id", "epoch0")
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
              ROW_NUMBER() OVER (
                ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id)
              - 1 AS train_pos
            FROM documents ORDER BY doc_id"""))

  private val p16 = Q(
    "p16_uniform_sample",
    // exactly-k uniform eval-set draw: the k smallest md5(seed:id) keys —
    // a seeded reservoir without an RNG (deterministic, retry-stable,
    // disjoint draws by seed). limit-after-orderBy plans as
    // TakeOrderedAndProject: per-partition bounded heaps, never a global
    // sort (PlanSpec-asserted, the q30 shape)
    (s, dir) => Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat_ws(":", lit("eval0"), col("doc_id").cast("string")))
          .as("draw_key"))
      .orderBy("draw_key", "doc_id")
      .limit(64)
      .orderBy("doc_id"),
    Some("""SELECT * FROM (
              SELECT doc_id, source,
                md5('eval0:' || CAST(doc_id AS VARCHAR)) AS draw_key
              FROM documents
              ORDER BY draw_key, doc_id LIMIT 64)
            ORDER BY doc_id"""))

  private val p25 = Q(
    "p25_weighted_sample",
    // the DSIR/DoReMi resampling step: exactly-64 seeded draw with
    // inclusion ∝ token count (the budget weight) via Efraimidis-
    // Spirakis ln(u)/w top-k — p16's uniform draw, weighted. No SQL
    // oracle (libm ln ulp could flip near-equal key ORDER between
    // engines); CorpusOpsSpec gates strict equality vs a driver-side
    // reference over the same hash + the frequency-tracks-weight
    // property across seeds
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("double").as("w"))
      Corpus.weightedSample(docs, "doc_id", "w", k = 64, seed = "mix0")
        .select(col("doc_id"), col("source"), col("w").as("weight"))
        .orderBy("doc_id")
    },
    None)

  private val p15 = Q(
    "p15_pack_boundaries",
    // the attention/loss-mask table for p02's packed stream: which slice
    // of each fixed-256-token sequence belongs to which document (a
    // straddling doc emits one row per spanned sequence)
    (s, dir) => Packing.chunkBoundaries(Tables.load(s, dir, "documents"),
        "doc_id", "text", budget = 256, shardDocs = 100)
      .orderBy("doc_id", "seq_idx"),
    Some("""WITH t AS (SELECT doc_id,
                doc_id // 100 AS shard,
                CAST(len(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS BIGINT) AS n_tok
              FROM documents),
            c AS (SELECT *,
                SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM t),
            b AS (SELECT doc_id, shard, CAST(cum AS BIGINT) AS cum,
                CAST(cum - n_tok AS BIGINT) AS pre
              FROM c WHERE n_tok > 0),
            e AS (SELECT doc_id, shard, pre, cum,
                unnest(generate_series(pre // 256, (cum - 1) // 256))
                  AS seq_idx
              FROM b)
            SELECT shard, seq_idx, doc_id,
              greatest(pre, seq_idx * 256) - seq_idx * 256 AS start,
              least(cum, (seq_idx + 1) * 256)
                - greatest(pre, seq_idx * 256) AS len
            FROM e ORDER BY doc_id, seq_idx"""))

  private val p17 = Q(
    "p17_mixture_order",
    // mixture-weighted interleave: curated sources src0–src4 up-weighted
    // 4:1 over the rest — the materialized source-mixing order (stride
    // scheduling / WFQ virtual time), deterministic and re-seedable
    (s, dir) => {
      val weights = (0 until 20).map(i =>
        s"src$i" -> (if (i < 5) 4.0 else 1.0)).toMap
      Corpus.mixtureOrder(Tables.load(s, dir, "documents"),
          "doc_id", "source", weights, seed = "mix0")
        .orderBy("doc_id")
    },
    Some("""WITH k AS (SELECT doc_id, source,
                         md5('mix0:' || CAST(doc_id AS VARCHAR)) AS sk
                       FROM documents),
              r AS (SELECT doc_id, source,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY sk, doc_id) - 1 AS src_rank
                    FROM k),
              v AS (SELECT doc_id, source, src_rank,
                      (CAST(src_rank AS DOUBLE) + 0.5) /
                        (CASE WHEN source IN
                           ('src0','src1','src2','src3','src4')
                          THEN 4.0 ELSE 1.0 END) AS vt
                    FROM r),
              f AS (SELECT doc_id, source, src_rank,
                      row_number() OVER (ORDER BY vt, doc_id) - 1 AS mix_pos
                    FROM v)
            SELECT doc_id, source, src_rank, mix_pos
            FROM f ORDER BY doc_id"""))

  private val p18 = Q(
    "p18_dsir_weights",
    // DSIR data selection: per-doc whole-bit log importance weight of a
    // target-domain (en) unigram LM against the raw-corpus LM; positive
    // = target-like. Integer-only, so oracle-exact
    (s, dir) => Corpus.dsirWeights(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        targetFilter = col("lang") === "en", rawFilter = lit(true))
      .orderBy("doc_id"),
    Some("""WITH toks AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS token
              FROM documents),
            tc AS (SELECT token, COUNT(*) AS cnt_t
              FROM (SELECT unnest(list_filter(string_split(text, ' '),
                      x -> x <> '')) AS token
                    FROM documents WHERE lang = 'en')
              GROUP BY token),
            rc AS (SELECT token, COUNT(*) AS cnt_r
              FROM toks GROUP BY token),
            tt AS (SELECT CAST(SUM(cnt_t) AS BIGINT) AS total_t FROM tc),
            rt AS (SELECT CAST(SUM(cnt_r) AS BIGINT) AS total_r FROM rc),
            delta AS (SELECT COALESCE(tc.token, rc.token) AS token,
                CAST(LENGTH(bin(rt.total_r // COALESCE(rc.cnt_r, 1)))
                     AS BIGINT)
              - CAST(LENGTH(bin(tt.total_t // COALESCE(tc.cnt_t, 1)))
                     AS BIGINT) AS dbits
              FROM tc FULL JOIN rc ON tc.token = rc.token
                   CROSS JOIN tt CROSS JOIN rt),
            sc AS (SELECT t.doc_id,
                CAST(SUM(COALESCE(d.dbits, 0)) AS BIGINT) AS log2_w,
                COUNT(*) AS n_tok
              FROM toks t LEFT JOIN delta d ON t.token = d.token
              GROUP BY t.doc_id)
            SELECT d.doc_id, COALESCE(sc.log2_w, 0) AS log2_w,
              COALESCE(sc.n_tok, 0) AS n_tok
            FROM documents d LEFT JOIN sc USING (doc_id)
            ORDER BY d.doc_id"""))

  private val p14 = Q(
    "p14_shard_budget",
    // token-budgeted output sharding in the seeded-shuffle order (p13's
    // key): the materialized write plan for a training corpus — each
    // shard fills to ~2000 tokens, boundaries a pure function of the
    // ordered weights via the distributed exclusive prefix sum
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
          md5(concat_ws(":", lit("epoch0"), col("doc_id").cast("string")))
            .as("sk"))
      Corpus.budgetShards(docs, Seq("sk", "doc_id"), "n_tok", 2000L)
        .select("doc_id", "n_tok", "shard_id")
        .orderBy("doc_id")
    },
    Some("""WITH w AS (
              SELECT doc_id,
                CAST(len(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS BIGINT) AS n_tok,
                md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS sk
              FROM documents),
            p AS (
              SELECT doc_id, n_tok,
                COALESCE(SUM(n_tok) OVER (ORDER BY sk, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS pre
              FROM w)
            SELECT doc_id, n_tok,
              CAST(pre // 2000 AS BIGINT) AS shard_id
            FROM p ORDER BY doc_id"""))

  private val p10 = Q(
    "p10_token_budget",
    // the pre-launch planning query: mixture weights (p05's exact
    // 256ths-of-epoch semantics) x per-doc token counts = the actual
    // training token budget each source contributes. Replicated rows
    // carry only (doc_id, source); token counts join in narrow.
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tok"))
      Corpus.mixtureUpsample(docs, "doc_id", "source",
          Map("src0" -> 640, "src1" -> 128, "src2" -> 0))
        .join(toks, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_epoch_docs"),
          sum("n_tok").as("n_tokens"))
        .orderBy("source")
    },
    Some("""WITH w AS (SELECT doc_id, source,
                CASE source WHEN 'src0' THEN 640 WHEN 'src1' THEN 128
                            WHEN 'src2' THEN 0 ELSE 256 END AS w256,
                (instr('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 29, 1)) - 1) * 16
                + (instr('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 30, 1)) - 1) AS hb,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tok
              FROM documents),
              r AS (SELECT doc_id, source, n_tok,
                      w256 // 256
                        + CASE WHEN hb < w256 % 256 THEN 1 ELSE 0 END AS reps
                    FROM w)
            SELECT source, CAST(SUM(reps) AS BIGINT) AS n_epoch_docs,
              CAST(SUM(reps * n_tok) AS BIGINT) AS n_tokens
            FROM r WHERE reps > 0
            GROUP BY source ORDER BY source"""))

  private val p03 = Q(
    "p03_pack_greedy",
    (s, dir) => Packing.greedyPack(s, Tables.load(s, dir, "documents"),
        "doc_id", "text", budget = 2048, shardDocs = 100)
      .groupBy("shard", "bin_idx")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy("shard", "bin_idx"),
    None) // sequential first-fit loop -> rows-only (gates in PackSpec)

  /** DuckDB mirror of [[TextOps.langId]]'s argmax CASE over a relation
    * exposing a `text` column (the t01 oracle's generator, reusable in
    * composed pipelines).
    */
  private def langCaseSql: String = {
    def hits(ms: Seq[String]) =
      s"len(list_filter(list_distinct(list_filter(string_split(text, ' '), " +
        s"x -> x <> '')), x -> x IN (${ms.map(m => s"'$m'").mkString(", ")})))"
    val scores = TextOps.langMarkers.map { case (l, ms) => l -> hits(ms) }
    val branches = scores.zipWithIndex.init.map { case ((l, sc), i) =>
      val rest = scores.drop(i + 1).map(_._2)
      s"WHEN ${rest.map(o => s"$sc >= $o").mkString(" AND ")} THEN '$l'"
    }
    s"CASE ${branches.mkString(" ")} ELSE '${scores.last._1}' END"
  }

  private val p12 = Q(
    "p12_curation_pipeline",
    // the whole curation chain as ONE declarative plan — the composition
    // the single-op queries exist for: boilerplate-injected corpus (plus
    // exact-replica docs) → span scrub (d17) → lang-ID (t01) + quality
    // (t02) gates on the CLEAN text → exact dedup keeping the min-id
    // canonical (d01) → deterministic split assignment (p01). Catalyst
    // optimizes ACROSS the op boundaries (one scan feeds the scrub index
    // and the rebuild; the gates run in the rebuild's projection); every
    // stage's semantics is pinned by its own oracle-checked query, and
    // this one pins their composition.
    // r7's driver-host 107 s rep outlier (median 9.3 s): not reproducible
    // — 5 instrumented sf0.1 reps here run [5.30, 4.36, 3.93, 4.01,
    // 4.55] s, spread 1.37 s, and the only systematic first-rep cost is
    // sf0.1-plan codegen (AQE re-plans vs the sf0.001 warmup; the warmup
    // compile for this composed tree is ~12 s, paid once). Bench now
    // records per-rep times (reps_sec) so a recurrence is attributable
    // to a specific rep instead of hiding inside a spread number
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val replicas = docs.filter(col("doc_id") % 16 === 1)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val src = docs.select(col("doc_id"), col("text"))
        .unionByName(replicas)
        .select(col("doc_id"), concat_ws(" ", lit("begin"), col("text"),
          lit("click here to accept cookies and continue reading"))
          .as("text"))
      val clean = Dedup.scrubRepeatedSpans(src, "text", "doc_id",
        n = 5, maxSpanDf = 10)
      // r15b: the gate columns are ExpensiveBarrier aliases so the filter
      // below cannot be pushed through the projection by substituting the
      // lang/quality expression trees into its condition — each gate
      // expression evaluates once per row, and the filter tests the
      // materialized columns (values unchanged; the p12 plan previously
      // inlined the full scrub-rebuild + gate trees ~20x per row)
      val scored = clean.select(col("doc_id"), col("text"),
          graft.functions.HashExpressions.expensive(
            TextOps.langId(col("text"))).as("lang_pred"),
          graft.functions.HashExpressions.expensive(
            TextOps.qualityScore(col("text"))).as("quality"),
          TextOps.tokenCount(col("text")).as("n_tok"))
        .filter(col("lang_pred") === "en" && col("quality") >= 0.5)
      // exact dedup INLINE as a window-min over the content hash (d01's
      // semantics): joining back to Dedup.exact would re-derive the whole
      // scrub pipeline a second time (Catalyst has no cross-branch CSE) —
      // here the one derivation flows through a single narrow exchange of
      // (hash, id, quality, n_tok) rows
      val wMin = org.apache.spark.sql.expressions.Window.partitionBy("h")
      scored.select(col("doc_id"), col("quality"), col("n_tok"),
          md5(col("text")).as("h"))
        .withColumn("keep_id", min("doc_id").over(wMin))
        .filter(col("doc_id") === col("keep_id"))
        .select(col("doc_id"), col("quality"), col("n_tok"),
          Corpus.splitLabel(col("doc_id")).as("split"))
        .orderBy("doc_id")
    },
    Some(s"""WITH base AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, text FROM documents
              WHERE doc_id % 16 = 1),
            src AS (
              SELECT doc_id, concat_ws(' ', 'begin', text,
                'click here to accept cookies and continue reading') AS text
              FROM base),
            toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM src),
            tok AS (SELECT doc_id, unnest(t) AS tokstr,
                           unnest(range(len(t))) AS p FROM toks),
            wins AS (SELECT doc_id,
                       unnest(range(greatest(len(t) - 4, 0))) AS p,
                       unnest(list_transform(range(greatest(len(t) - 4, 0)),
                         i -> array_to_string(t[i+1:i+5], ' '))) AS w
                     FROM toks),
            hot AS (SELECT w FROM (SELECT w, COUNT(DISTINCT doc_id) AS d
                                   FROM wins GROUP BY 1) WHERE d > 10),
            removed AS (SELECT DISTINCT wins.doc_id, wins.p + offs.o AS rp
                        FROM wins JOIN hot USING (w)
                        CROSS JOIN (SELECT unnest(range(5)) AS o) offs),
            kept AS (SELECT tok.doc_id, tok.p, tok.tokstr
                     FROM tok LEFT JOIN removed
                       ON tok.doc_id = removed.doc_id AND tok.p = removed.rp
                     WHERE removed.doc_id IS NULL),
            clean AS (SELECT doc_id, string_agg(tokstr, ' ' ORDER BY p) AS text
                      FROM kept GROUP BY doc_id),
            feat AS (SELECT doc_id, text,
                len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
                len(list_filter(string_split(text, ' '),
                  x -> x IN ('the','a','of','and','is','in','to'))) AS n_stop,
                length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                  AS n_punct,
                length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                  AS n_upper,
                length(text) AS n_chars,
                $langCaseSql AS lang_pred
              FROM clean),
            passed AS (SELECT * FROM (
                SELECT doc_id, text, n_tok,
                  0.4 * least(CAST(n_tok AS DOUBLE) / 64.0, 1.0)
                  + 0.3 * (CAST(n_stop AS DOUBLE)
                           / greatest(CAST(n_tok AS DOUBLE), 1.0))
                  + 0.2 * (1.0 - CAST(n_punct AS DOUBLE)
                                 / greatest(CAST(n_chars AS DOUBLE), 1.0))
                  + 0.1 * (1.0 - CAST(n_upper AS DOUBLE)
                                 / greatest(CAST(n_chars AS DOUBLE), 1.0))
                    AS quality
                FROM feat WHERE lang_pred = 'en')
              WHERE quality >= 0.5),
            keep AS (SELECT MIN(doc_id) AS doc_id FROM passed GROUP BY text)
            SELECT p.doc_id, p.quality, p.n_tok,
              CASE WHEN substr(md5(CAST(p.doc_id AS VARCHAR)), 32, 1)
                     IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                   THEN 'train'
                   WHEN substr(md5(CAST(p.doc_id AS VARCHAR)), 32, 1)
                     IN ('c','d') THEN 'val'
                   ELSE 'test' END AS split
            FROM passed p JOIN keep USING (doc_id)
            ORDER BY doc_id"""))

  private val t40 = Q(
    "t40_wordpiece_ids",
    // WordPiece (BERT-family) count + emit under a corpus-trained
    // likelihood-gain vocabulary — the fourth production tokenizer
    // beside alpha BPE (t17/t30), unigram-LM (t25/t31), and byte BPE
    // (t32/t33); greedy longest-match-first with the whole-word [UNK]
    // rule. No SQL oracle (DuckDB cannot WordPiece-encode);
    // WordPieceSpec gates greedy-longest-match, the UNK rule, the
    // likelihood-vs-frequency trainer separation, decode round-trip,
    // totality, and count == size(ids). n_unk audits OOV mass
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      val vocab = TextOps.trainWordPieceVocab(docs, "text", nMerges = 150)
      docs.select(col("doc_id"),
        TextOps.wordPieceEncodeIds(col("text"), vocab).as("ids"),
        TextOps.wordPieceCount(col("text"), vocab).as("n_tok"))
        // harness boundary: digest + size, never the raw array
        .select(col("doc_id"),
          Relational.harnessDigest(col("ids")).as("ids_md5"),
          size(col("ids")).as("n_ids"), col("n_tok"),
          size(filter(col("ids"), _ === 0)).as("n_unk"))
        .orderBy("doc_id")
    },
    None)

  private val t41 = Q(
    "t41_readability",
    // Flesch-Kincaid grade (Kincaid et al. 1975): the formula-based
    // readability rung of the quality family below the trained
    // classifier — three linear regex scans to exact long counts
    // (words / sentence runs floored at 1 / vowel-group syllables with
    // the every-word->=1 fallback), then ONE fixed IEEE expression
    // tree for the grade (the e23 discipline, so DuckDB hash-matches)
    (s, dir) => {
      val r = TextOps.readability(col("text"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), r.as("r"))
        .select(col("doc_id"), col("r.n_words").as("n_words"),
          col("r.n_sent").as("n_sent"), col("r.n_syll").as("n_syll"),
          col("r.fk_grade").as("fk_grade"))
        .orderBy("doc_id")
    },
    Some("""WITH c AS (SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
                  AS BIGINT) AS w,
                greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
                  AS BIGINT), 1) AS s,
                CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                  AS BIGINT) AS vg,
                CAST(len(regexp_extract_all(text,
                  '[A-Za-z]*[aeiouyAEIOUY][A-Za-z]*')) AS BIGINT) AS wv
              FROM documents)
            SELECT doc_id, w AS n_words, s AS n_sent,
              vg + (w - wv) AS n_syll,
              CASE WHEN w = 0 THEN NULL
                ELSE 0.39 * (CAST(w AS DOUBLE) / s)
                  + 11.8 * (CAST(vg + (w - wv) AS DOUBLE) / w) - 15.59
              END AS fk_grade
            FROM c ORDER BY doc_id"""))

  private val t42 = Q(
    "t42_char_entropy",
    // whole-bit byte-entropy quality signal: the zeroth-order analytic
    // twin of t18's deflate ratio (uniform-random bytes maximize it, a
    // single repeated byte zeroes it; prose sits in a narrow band, so
    // both tails flag junk). ONE codegen'd scan-stage pass per doc —
    // 256-long stack histogram, no explode, no shuffle; h_bits =
    // sum c*(floor log2(n/c)) exact longs, one IEEE division at the end
    (s, dir) => {
      val e = graft.functions.TextExpressions.charEntropy(col("text"))
      Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"), e.as("e"))
        .select(col("doc_id"), col("e.n_bytes").as("n_bytes"),
          col("e.h_bits").as("h_bits"))
        .withColumn("bits_per_byte",
          when(col("n_bytes") === 0, lit(null).cast("double"))
            .otherwise(col("h_bits").cast("double") / col("n_bytes")))
        .orderBy("doc_id")
    },
    Some("""WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
              FROM documents),
            h AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
              FROM c GROUP BY 1, 2),
            n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
              FROM h GROUP BY 1),
            e AS (SELECT h.doc_id, n.n,
                CAST(SUM(c * (length(bin(n.n // c)) - 1)) AS BIGINT)
                  AS h_bits
              FROM h JOIN n ON h.doc_id = n.doc_id GROUP BY 1, 2)
            SELECT d.doc_id, COALESCE(e.n, 0) AS n_bytes,
              COALESCE(e.h_bits, 0) AS h_bits,
              CASE WHEN COALESCE(e.n, 0) = 0 THEN NULL
                ELSE CAST(e.h_bits AS DOUBLE) / e.n END AS bits_per_byte
            FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
            ORDER BY d.doc_id"""))

  private val t43 = Q(
    "t43_fertility",
    // tokenizer fertility table (subword tokens per whitespace word —
    // the standard tokenizer-selection metric, cf. Rust et al. 2021
    // "How Good is Your Tokenizer?"): one row per language comparing
    // ALL FOUR production tokenizers the engine trains (alpha BPE,
    // unigram LM, byte BPE, WordPiece) on the same corpus. High
    // fertility = more compute per word for that language — THE
    // multilingual-budget diagnostic. Exact long sums, one IEEE
    // division per cell; rows-only (trained tokenizers have no SQL
    // mirror), CorpusOpsSpec gates the bounds and determinism
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      val merges = TextOps.trainBpeMerges(docs, "text", nMerges = 150)
      val uni = UnigramTokenizer.train(docs, "text", vocabSize = 48)
      val bb = TextOps.trainByteBpeMerges(docs, "text", nMerges = 200)
      val wp = TextOps.trainWordPieceVocab(docs, "text", nMerges = 150)
      Corpus.fertilityTable(docs, "lang", "text", merges, uni.pieces,
        bb, wp).orderBy("lang")
    },
    None)

  private val t44 = Q(
    "t44_scaling_fit",
    // corpus scaling-law exponents: Heaps' vocabulary growth (Heaps
    // 1978 — sizes open-vocabulary state) and the Zipf head exponent
    // (Zipf 1949 — corpus naturalness; templated corpora flatten it).
    // WHOLE-BIT log-log least squares: every point an exact integer,
    // the slope cleared to the exact rational (k·Σxy−ΣxΣy)/(k·Σx²−Σx²)
    // emitted as num/den longs + one IEEE division
    (s, dir) => Corpus.scalingLaws(
        Tables.loadParallel(s, dir, "documents"),
        "doc_id", "text", stride = 50L, topR = 256)
      .orderBy("law"),
    Some("""WITH d AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS l
              FROM documents),
            tb AS (SELECT (doc_id + 49) // 50 AS b,
                CAST(SUM(len(l)) AS BIGINT) AS t FROM d GROUP BY 1),
            fs AS (SELECT w, MIN(doc_id) AS fd FROM (
                SELECT doc_id, unnest(l) AS w FROM d) GROUP BY 1),
            vb AS (SELECT (fd + 49) // 50 AS b,
                CAST(COUNT(*) AS BIGINT) AS v FROM fs GROUP BY 1),
            jb AS (SELECT COALESCE(tb.b, vb.b) AS b, COALESCE(t, 0) AS t,
                COALESCE(v, 0) AS v FROM tb FULL JOIN vb ON tb.b = vb.b),
            cum AS (SELECT
                CAST(SUM(t) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS ct,
                CAST(SUM(v) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cv FROM jb),
            hp AS (SELECT length(bin(ct)) - 1 AS x,
                length(bin(cv)) - 1 AS y
              FROM cum WHERE ct > 0 AND cv > 0),
            tf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
                SELECT unnest(l) AS w FROM d) GROUP BY 1),
            zr AS (SELECT w, c, row_number() OVER (
                ORDER BY c DESC, w ASC) AS r FROM tf),
            zp AS (SELECT length(bin(r)) - 1 AS x,
                length(bin(c)) - 1 AS y FROM zr WHERE r <= 256)
            SELECT 'heaps' AS law, CAST(COUNT(*) AS BIGINT) AS k_points,
              CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS BIGINT)
                AS slope_num,
              CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS BIGINT)
                AS slope_den,
              CASE WHEN COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) <> 0
                THEN CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE)
                  / CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE)
              END AS slope
            FROM hp
            UNION ALL
            SELECT 'zipf', CAST(COUNT(*) AS BIGINT),
              CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS BIGINT),
              CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS BIGINT),
              CASE WHEN COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) <> 0
                THEN CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE)
                  / CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE)
              END
            FROM zp ORDER BY law"""))

  private val t45 = Q(
    "t45_dup_fraction",
    // per-doc duplicated-n-gram fraction (Lee et al. 2022 report this
    // per example): what share of a doc's distinct 8-gram windows also
    // occur in >= 1 other doc. The finer memorization-risk dial below
    // d33's cluster-level down-weighting — a doc in no dup cluster can
    // still be 80% boilerplate n-grams. One gram explode + df rollup +
    // semi join; ONE IEEE division per doc
    (s, dir) => Dedup.dupGramFraction(
        Tables.loadParallel(s, dir, "documents"),
        "text", "doc_id", n = 8).orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') l
              FROM documents),
            raw AS (SELECT doc_id, unnest(l) w, generate_subscripts(l, 1) i
              FROM t),
            tok AS (SELECT doc_id, w,
                row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
              FROM raw WHERE w <> ''),
            g8 AS (SELECT doc_id,
                w || ' ' || LEAD(w, 1) OVER win
                  || ' ' || LEAD(w, 2) OVER win
                  || ' ' || LEAD(w, 3) OVER win
                  || ' ' || LEAD(w, 4) OVER win
                  || ' ' || LEAD(w, 5) OVER win
                  || ' ' || LEAD(w, 6) OVER win
                  || ' ' || LEAD(w, 7) OVER win AS g,
                LEAD(w, 7) OVER win AS tail
              FROM tok
              WINDOW win AS (PARTITION BY doc_id ORDER BY rn)),
            gd AS (SELECT DISTINCT doc_id, g FROM g8
              WHERE tail IS NOT NULL),
            gdf AS (SELECT g, COUNT(*) AS df FROM gd GROUP BY 1),
            tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
              FROM gd GROUP BY 1),
            dup AS (SELECT gd.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
              FROM gd JOIN gdf ON gd.g = gdf.g
              WHERE gdf.df >= 2 GROUP BY 1)
            SELECT d.doc_id,
              COALESCE(tot.n_grams, 0) AS n_grams,
              COALESCE(dup.n_dup, 0) AS n_dup,
              CASE WHEN COALESCE(tot.n_grams, 0) = 0 THEN NULL
                ELSE CAST(COALESCE(dup.n_dup, 0) AS DOUBLE) / tot.n_grams
              END AS dup_frac
            FROM documents d
            LEFT JOIN tot ON d.doc_id = tot.doc_id
            LEFT JOIN dup ON d.doc_id = dup.doc_id
            ORDER BY d.doc_id"""))

  private val t46 = Q(
    "t46_winnowing",
    // winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD 2003 —
    // the MOSS selection rule): rightmost-minimal md5 of each window
    // of 5 consecutive token-4-gram hashes. Any >= 8-token match
    // between two docs shares a fingerprint (the winnowing guarantee);
    // density ~2/(w+1). Equal-length hex ORDERS like the number it
    // encodes in both engines, so min-by-(h, pos desc) mirrors exactly
    (s, dir) => Dedup.winnowFingerprints(
        Tables.loadParallel(s, dir, "documents"),
        "text", "doc_id", k = 4, w = 5)
      .orderBy("doc_id", "pos", "fp"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') l
              FROM documents),
            raw AS (SELECT doc_id, unnest(l) w, generate_subscripts(l, 1) i
              FROM t),
            tok AS (SELECT doc_id, w,
                row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
              FROM raw WHERE w <> ''),
            g4 AS (SELECT doc_id, CAST(rn - 1 AS BIGINT) AS pos,
                md5(w || ' ' || LEAD(w, 1) OVER win
                  || ' ' || LEAD(w, 2) OVER win
                  || ' ' || LEAD(w, 3) OVER win) AS h,
                LEAD(w, 3) OVER win AS tail
              FROM tok
              WINDOW win AS (PARTITION BY doc_id ORDER BY rn)),
            gg AS (SELECT doc_id, pos, h FROM g4 WHERE tail IS NOT NULL),
            cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ng
              FROM gg GROUP BY 1),
            wins AS (SELECT doc_id, pos, h,
                unnest(range(pos - 4, pos + 1)) AS s FROM gg),
            winf AS (SELECT w.doc_id, w.pos, w.h, w.s
              FROM wins w JOIN cnt c ON w.doc_id = c.doc_id
              WHERE w.s >= 0 AND w.s <= c.ng - 5),
            sel AS (SELECT doc_id, s, pos, h,
                row_number() OVER (PARTITION BY doc_id, s
                  ORDER BY h ASC, pos DESC) AS rk
              FROM winf)
            SELECT DISTINCT doc_id, pos, h AS fp
            FROM sel WHERE rk = 1
            ORDER BY doc_id, pos, fp"""))

  private val p30 = Q(
    "p30_dedup_shrinkage",
    // per-source dedup-shrinkage table — the release-card before/after:
    // raw vs surviving (keep-min exact dedup) doc and token counts and
    // the retained fraction per source. The number that tells you which
    // feed is re-crawl (web sources routinely lose 30-60% to dedup
    // while curated sources lose ~0) and re-prices every mixture weight
    // computed on RAW counts. Composition: d01's hash-groupBy keep-min
    // + two source rollups; exact longs, one IEEE division
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
      val keep = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"))
      val raw = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs_raw"),
        sum("n_tok").as("n_tokens_raw"))
      val kept = docs.join(keep,
          docs("doc_id") === keep("keep_id"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs_kept"),
          sum("n_tok").as("n_tokens_kept"))
      raw.join(kept, Seq("source"), "left")
        .select(col("source"), col("n_docs_raw"), col("n_tokens_raw"),
          coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
          coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"))
        .withColumn("token_retention", expr(
          "CAST(n_tokens_kept AS DOUBLE) / CAST(n_tokens_raw AS DOUBLE)"))
        .orderBy("source")
    },
    Some("""WITH d AS (SELECT doc_id, source,
                CAST(len(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS BIGINT) AS n_tok,
                md5(text) AS h
              FROM documents),
            k AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY 1),
            raw AS (SELECT source,
                CAST(COUNT(*) AS BIGINT) AS n_docs_raw,
                CAST(SUM(n_tok) AS BIGINT) AS n_tokens_raw
              FROM d GROUP BY 1),
            kept AS (SELECT source,
                CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
                CAST(SUM(n_tok) AS BIGINT) AS n_tokens_kept
              FROM d JOIN k ON d.doc_id = k.keep_id GROUP BY 1)
            SELECT raw.source, n_docs_raw, n_tokens_raw,
              COALESCE(n_docs_kept, CAST(0 AS BIGINT)) AS n_docs_kept,
              COALESCE(n_tokens_kept, CAST(0 AS BIGINT))
                AS n_tokens_kept,
              CAST(COALESCE(n_tokens_kept, 0) AS DOUBLE)
                / CAST(n_tokens_raw AS DOUBLE) AS token_retention
            FROM raw LEFT JOIN kept ON raw.source = kept.source
            ORDER BY raw.source"""))

  private val t56 = Q(
    "t56_collocations",
    // collocation mining (Church & Hanks PMI over adjacent pairs, count
    // floor 5 against low-count bias): the lexicalized-phrase inventory
    // a corpus card prints. Whole-bit PMI — the cleared rational
    // c_xy*N/(c_x*c_y) scored as signed bits, hash-exact
    // plain load (the t05 convention): every consumer aggregates, so the
    // exchanges already carry narrow rows — a pre-repartition would
    // shuffle full document text first
    (s, dir) => Corpus.collocationPmi(
        Tables.load(s, dir, "documents"), "text", minCount = 5L)
      .orderBy("w1", "w2"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') l
              FROM documents),
            raw AS (SELECT doc_id, unnest(l) w, generate_subscripts(l, 1) i
              FROM t),
            tok AS (SELECT doc_id, w,
                row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
              FROM raw WHERE w <> ''),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok),
            uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
              FROM tok GROUP BY 1),
            pc AS (SELECT a.w AS w1, b.w AS w2,
                CAST(COUNT(*) AS BIGINT) AS c_xy
              FROM tok a JOIN tok b
                ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
              GROUP BY 1, 2 HAVING COUNT(*) >= 5),
            j AS (SELECT w1, w2, c_xy, ux.c AS c_x, uy.c AS c_y,
                c_xy * n.n_tok AS num, ux.c * uy.c AS den
              FROM pc
              JOIN uc ux ON pc.w1 = ux.w
              JOIN uc uy ON pc.w2 = uy.w
              CROSS JOIN n)
            SELECT w1, w2, c_xy, c_x, c_y,
              CASE WHEN num >= den
                THEN CAST(length(bin(num // den)) AS BIGINT)
                ELSE 0 - CAST(length(bin(den // num)) AS BIGINT)
              END AS pmi_bits
            FROM j ORDER BY w1, w2"""))

  private val p29 = Q(
    "p29_shard_manifest",
    // release-integrity manifest over p14's write plan: per shard, doc
    // and token totals plus md5 checksums of the write-ordered id list
    // and the chained per-doc content digests — what a release card
    // publishes so consumers can verify shards without re-reading the
    // corpus, and delta builds can prove standing shards untouched
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
          md5(concat_ws(":", lit("epoch0"), col("doc_id").cast("string")))
            .as("sk"))
      Corpus.shardManifest(docs, "doc_id", "text",
        Seq("sk", "doc_id"), "n_tok", budget = 2000L)
    },
    Some("""WITH w AS (
              SELECT doc_id, md5(text) AS h,
                CAST(len(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS BIGINT) AS n_tok,
                md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS sk
              FROM documents),
            p AS (
              SELECT doc_id, h, n_tok, sk,
                COALESCE(SUM(n_tok) OVER (ORDER BY sk, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS pre
              FROM w)
            SELECT CAST(pre // 2000 AS BIGINT) AS shard_id,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
              md5(string_agg(CAST(doc_id AS VARCHAR), ','
                ORDER BY sk, doc_id)) AS ids_md5,
              md5(string_agg(h, '' ORDER BY sk, doc_id)) AS content_md5
            FROM p GROUP BY 1 ORDER BY 1"""))

  private val d38 = Q(
    "d38_winnow_pairs",
    // MOSS-style overlap pairs over t46's winnowing fingerprints: docs
    // sharing >= 2 distinct fingerprints, containment-scored (fires when
    // a small doc is pasted into a large one, where Jaccard stays low).
    // Candidates from the cold-fp inverted index (df <= 20), exact
    // re-verify against full fp sets — the d02-capped contract on a
    // ~2/(w+1)-density index
    (s, dir) => Dedup.winnowPairs(
        Tables.loadParallel(s, dir, "documents"),
        "text", "doc_id", k = 4, w = 5, minShared = 2, maxFpDf = 20)
      .orderBy("id_a", "id_b"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') l
              FROM documents),
            raw AS (SELECT doc_id, unnest(l) w, generate_subscripts(l, 1) i
              FROM t),
            tok AS (SELECT doc_id, w,
                row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
              FROM raw WHERE w <> ''),
            g4 AS (SELECT doc_id, CAST(rn - 1 AS BIGINT) AS pos,
                md5(w || ' ' || LEAD(w, 1) OVER win
                  || ' ' || LEAD(w, 2) OVER win
                  || ' ' || LEAD(w, 3) OVER win) AS h,
                LEAD(w, 3) OVER win AS tail
              FROM tok
              WINDOW win AS (PARTITION BY doc_id ORDER BY rn)),
            gg AS MATERIALIZED (SELECT doc_id, pos, h FROM g4
              WHERE tail IS NOT NULL),
            cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ng
              FROM gg GROUP BY 1),
            wins AS (SELECT doc_id, pos, h,
                unnest(range(pos - 4, pos + 1)) AS s FROM gg),
            winf AS (SELECT w.doc_id, w.pos, w.h, w.s
              FROM wins w JOIN cnt c ON w.doc_id = c.doc_id
              WHERE w.s >= 0 AND w.s <= c.ng - 5),
            sel AS (SELECT doc_id, s, pos, h,
                row_number() OVER (PARTITION BY doc_id, s
                  ORDER BY h ASC, pos DESC) AS rk
              FROM winf),
            fps AS MATERIALIZED (SELECT DISTINCT doc_id, h AS fp
              FROM sel WHERE rk = 1),
            cold AS (SELECT fp FROM fps GROUP BY fp
              HAVING COUNT(*) <= 20),
            cand AS (SELECT DISTINCT a.doc_id ia, b.doc_id ib
              FROM fps a JOIN fps b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              JOIN cold c ON a.fp = c.fp),
            sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM fps GROUP BY 1),
            sh AS (SELECT ia, ib, CAST(COUNT(*) AS BIGINT) AS ns
              FROM cand
              JOIN fps fa ON fa.doc_id = ia
              JOIN fps fb ON fb.doc_id = ib AND fa.fp = fb.fp
              GROUP BY 1, 2)
            SELECT ia AS id_a, ib AS id_b, ns AS n_shared,
              sa.n AS n_a, sb.n AS n_b,
              CAST(ns AS DOUBLE) / least(sa.n, sb.n) AS containment
            FROM sh
            JOIN sz sa ON ia = sa.doc_id
            JOIN sz sb ON ib = sb.doc_id
            WHERE ns >= 2
            ORDER BY id_a, id_b"""))

  private val t68 = Q(
    "t68_token_gini",
    // per-source Gini concentration of token counts (Sen 1973 rank
    // formula): the release-card inequality stat beside t15's totals —
    // near 0 = docs contribute evenly, near 1 = a few megadocs carry
    // the source. Exact long rank sums, one final IEEE division —
    // hash-exact (Corpus.tokenGini).
    (s, dir) => Corpus.tokenGini(
        Tables.loadParallel(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
        "n_tok", "source", "doc_id")
      .orderBy("source"),
    Some("""WITH d AS (SELECT doc_id, source,
                CAST(len(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS BIGINT) AS x
              FROM documents),
            r AS (SELECT source, x,
                CAST(row_number() OVER (PARTITION BY source
                  ORDER BY x ASC, doc_id ASC) AS BIGINT) AS i
              FROM d)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(x) AS BIGINT) AS total_tokens,
              CASE WHEN SUM(x) > 0 THEN
                CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
                  / CAST(COUNT(*) * SUM(x) AS DOUBLE)
              ELSE NULL END AS gini
            FROM r GROUP BY source ORDER BY source"""))

  private val d41 = Q(
    "d41_substring_dedup",
    // pairwise ExactSubstr (Lee et al. 2022 — the 50-token rung between
    // d01's whole-doc hash and the d02/d34 set-similarity family, at
    // test scale n=8/minSpan=12): every 25th doc gets a 14-token paste
    // between doc-unique anchors, so otherwise-unrelated docs share
    // EXACTLY the paste (one span of 14 ≥ 12) while natural dup pairs
    // surface their full shared runs; window equi-join on the hashed
    // 8-token shingles, diagonal gaps-and-islands chain, hash-exact
    (s, dir) => {
      val src = Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 25 === 0,
            concat_ws(" ",
              concat(lit("pre"), col("doc_id").cast("string")), col("text"),
              lit("subscribe to our newsletter for weekly updates " +
                "delivered straight to your inbox every friday"),
              concat(lit("post"), col("doc_id").cast("string"))))
            .otherwise(col("text")).as("text"))
      Dedup.substringDupSpans(src, "text", "doc_id",
          n = 8, minSpanLen = 12)
        .orderBy("id_a", "id_b", "start_a", "start_b")
    },
    Some("""WITH src AS (SELECT doc_id,
              CASE WHEN doc_id % 25 = 0 THEN concat_ws(' ',
                'pre' || CAST(doc_id AS VARCHAR), text,
                'subscribe to our newsletter for weekly updates delivered straight to your inbox every friday',
                'post' || CAST(doc_id AS VARCHAR))
              ELSE text END AS text
              FROM documents),
            toks AS (SELECT doc_id, string_split(text, ' ') AS t
              FROM src),
            wins AS (SELECT doc_id,
                unnest(range(greatest(len(t) - 7, 0))) AS p,
                unnest(list_transform(range(greatest(len(t) - 7, 0)),
                  i -> array_to_string(t[i+1:i+8], ' '))) AS w
              FROM toks),
            m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                a.p AS pa, b.p - a.p AS diag
              FROM wins a JOIN wins b
                ON a.w = b.w AND a.doc_id < b.doc_id),
            isl AS (SELECT id_a, id_b, diag, pa,
                CASE WHEN pa - lag(pa) OVER (PARTITION BY id_a, id_b,
                    diag ORDER BY pa) > 8
                  THEN 1 ELSE 0 END AS newi
              FROM m),
            isl2 AS (SELECT id_a, id_b, diag, pa,
                SUM(newi) OVER (PARTITION BY id_a, id_b, diag
                  ORDER BY pa
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS island
              FROM isl),
            spans AS (SELECT id_a, id_b, diag, island,
                MIN(pa) AS start_a, MAX(pa) + 8 AS ea
              FROM isl2 GROUP BY 1, 2, 3, 4
              HAVING MAX(pa) + 8 - MIN(pa) >= 12)
            SELECT id_a, id_b, CAST(start_a AS BIGINT) AS start_a,
              CAST(start_a + diag AS BIGINT) AS start_b,
              CAST(ea - start_a AS BIGINT) AS span_len
            FROM spans
            ORDER BY id_a, id_b, start_a, start_b"""))

  private val d42 = Q(
    "d42_substring_decontaminate",
    // span-LOCALIZED decontamination (Lee et al. 2022 ExactSubstr, the
    // cross form): every maximal token run >= 12 shared between a TEST
    // doc and a TRAIN doc, with start offsets on BOTH sides — d12/d27
    // flag overlapping docs, this names the exact stolen span (the
    // evidence a release review or memorization audit reads). Same
    // diagonal-islands lemma as d41 with the self-join replaced by a
    // probe x corpus equi join on the shingle hash — hash-exact
    (s, dir) => {
      val labeled = Tables.load(s, dir, "documents")
        .withColumn("split", Corpus.splitLabel(col("doc_id")))
      Dedup.crossSubstringSpans(
          labeled.filter(col("split") === "test"),
          labeled.filter(col("split") === "train"),
          "text", "doc_id", n = 8, minSpanLen = 12)
        .orderBy("probe_id", "corpus_id", "start_p", "start_c")
    },
    Some("""WITH lab AS (SELECT doc_id, text,
              CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                  IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                  IN ('c','d') THEN 'val'
                ELSE 'test' END AS split
              FROM documents),
            toks AS (SELECT doc_id, split, string_split(text, ' ') AS t
              FROM lab WHERE split IN ('train', 'test')),
            wins AS (SELECT doc_id, split,
                unnest(range(greatest(len(t) - 7, 0))) AS p,
                unnest(list_transform(range(greatest(len(t) - 7, 0)),
                  i -> array_to_string(t[i+1:i+8], ' '))) AS w
              FROM toks),
            m AS (SELECT a.doc_id AS pid, b.doc_id AS cid,
                a.p AS pa, b.p - a.p AS diag
              FROM wins a JOIN wins b ON a.w = b.w
              WHERE a.split = 'test' AND b.split = 'train'),
            isl AS (SELECT pid, cid, diag, pa,
                CASE WHEN pa - lag(pa) OVER (PARTITION BY pid, cid,
                    diag ORDER BY pa) > 8
                  THEN 1 ELSE 0 END AS newi
              FROM m),
            isl2 AS (SELECT pid, cid, diag, pa,
                SUM(newi) OVER (PARTITION BY pid, cid, diag
                  ORDER BY pa
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS island
              FROM isl),
            spans AS (SELECT pid, cid, diag, island,
                MIN(pa) AS start_p, MAX(pa) + 8 AS ea
              FROM isl2 GROUP BY 1, 2, 3, 4
              HAVING MAX(pa) + 8 - MIN(pa) >= 12)
            SELECT pid AS probe_id, cid AS corpus_id,
              CAST(start_p AS BIGINT) AS start_p,
              CAST(start_p + diag AS BIGINT) AS start_c,
              CAST(ea - start_p AS BIGINT) AS span_len
            FROM spans
            ORDER BY probe_id, corpus_id, start_p, start_c"""))

  private val d43 = Q(
    "d43_paragraph_bloom",
    // paragraph-level dedup (Dolma "BFF" — Soldaini et al. 2024; the
    // SlimPajama rung between d01's whole-doc hash and d41's span
    // evidence): synthesize multi-paragraph docs — a shared wire-desk
    // header on every 3rd doc (uppercased on every 6th, so the case/
    // whitespace NORMALIZATION is exercised), the doc's own unique
    // text, a 20-way repeated refrain, a shared footer on every 5th —
    // then keep each normalized paragraph only at its corpus-wide
    // FIRST (doc_id, pos) occurrence, duplicates dropped IN PLACE.
    // md5 keys (128-bit, the d01 convention — 64-bit birthdays are
    // real at 100 TB paragraph cardinality); hash-exact
    (s, dir) => {
      val header = lit("Breaking News From The Wire Desk")
      val src = Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws("\n",
            when(col("doc_id") % 3 === 0,
              when(col("doc_id") % 6 === 0, upper(header)).otherwise(header))
              .otherwise(concat(lit("intro "),
                col("doc_id").cast("string"))),
            col("text"),
            concat(lit("refrain block "),
              (col("doc_id") % 20).cast("string")),
            when(col("doc_id") % 5 === 0,
              lit("subscribe to our newsletter today"))).as("text"))
      Dedup.paragraphDedup(src, "text", "doc_id").orderBy("doc_id")
    },
    Some("""WITH src AS (SELECT doc_id, concat_ws(chr(10),
              CASE WHEN doc_id % 3 = 0 THEN
                (CASE WHEN doc_id % 6 = 0
                   THEN upper('Breaking News From The Wire Desk')
                   ELSE 'Breaking News From The Wire Desk' END)
                ELSE 'intro ' || CAST(doc_id AS VARCHAR) END,
              text,
              'refrain block ' || CAST(doc_id % 20 AS VARCHAR),
              CASE WHEN doc_id % 5 = 0
                THEN 'subscribe to our newsletter today' END) AS text
              FROM documents),
            sp AS (SELECT doc_id, string_split(text, chr(10)) AS l
              FROM src),
            p AS (SELECT doc_id, unnest(l) AS para,
                generate_subscripts(l, 1) AS pos FROM sp),
            nn AS (SELECT doc_id, pos, para,
                lower(trim(regexp_replace(para, '\s+', ' ', 'g'))) AS norm
              FROM p
              WHERE length(lower(trim(
                regexp_replace(para, '\s+', ' ', 'g')))) > 0),
            k AS (SELECT doc_id, pos, para,
                row_number() OVER (PARTITION BY norm
                  ORDER BY doc_id, pos) AS rn
              FROM nn)
            SELECT doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_paras,
              CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_kept,
              string_agg(CASE WHEN rn = 1 THEN para END, chr(10)
                ORDER BY pos) AS text
            FROM k GROUP BY doc_id
            HAVING SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) > 0
            ORDER BY doc_id"""))

  private val p26 = Q(
    "p26_bootstrap_ci",
    // Poisson-bootstrap 90% percentile CI for mean tokens per language
    // (Efron 1979; Poisson(1) resampling is the standard distributed
    // bootstrap, Chamandy et al. 2012) — the error bars a release card
    // should print beside every corpus statistic. Deterministic:
    // multiplicities from md5(id ':' replica) through a fixed
    // hex-threshold inverse CDF, exact long sums, one IEEE division
    // per replica, ceil-rank percentile selection
    (s, dir) => Corpus.bootstrapMeanCi(
        Tables.loadParallel(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
        "doc_id", "n_tok", "lang", replicas = 20)
      .orderBy("lang"),
    Some("""WITH d AS (SELECT doc_id, lang,
                CAST(len(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS BIGINT) AS v
              FROM documents),
            reps AS (SELECT lang, doc_id, v,
                unnest(range(0, 20)) AS b FROM d),
            mult AS (SELECT lang, b, v,
                CASE WHEN h <= '5e2d58d8' THEN 0
                     WHEN h <= 'bc5ab1b1' THEN 1
                     WHEN h <= 'eb715e1d' THEN 2
                     WHEN h <= 'fb239797' THEN 3
                     WHEN h <= 'ff1025f5' THEN 4
                     WHEN h <= 'ffd90f3b' THEN 5
                     WHEN h <= 'fffa8b71' THEN 6
                     WHEN h <= 'ffff540c' THEN 7
                     ELSE 8 END AS m
              FROM (SELECT lang, b, v,
                  substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || CAST(b AS VARCHAR)), 1, 8) AS h
                FROM reps)),
            rm AS (SELECT lang, b,
                CASE WHEN SUM(m) = 0 THEN NULL
                  ELSE CAST(SUM(m * v) AS DOUBLE) / SUM(m)
                END AS mean_b
              FROM mult GROUP BY 1, 2),
            nn AS (SELECT lang, b, mean_b,
                row_number() OVER (PARTITION BY lang
                  ORDER BY mean_b ASC, b ASC) AS rn,
                COUNT(*) OVER (PARTITION BY lang) AS nb
              FROM rm WHERE mean_b IS NOT NULL),
            ci AS (SELECT lang,
                MAX(CASE WHEN rn = (nb * 5 + 99) // 100
                  THEN mean_b END) AS ci_lo,
                MAX(CASE WHEN rn = (nb * 95 + 99) // 100
                  THEN mean_b END) AS ci_hi
              FROM nn GROUP BY 1),
            pt AS (SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean
              FROM d GROUP BY 1)
            SELECT pt.lang, n_docs, mean, ci_lo, ci_hi
            FROM pt LEFT JOIN ci USING (lang)
            ORDER BY lang"""))

  // the per-round TextRank CTE pair, doc-keyed (d26's rankIterCtes with
  // (doc_id, word) keys and the PER-DOC teleport/damping from `nodes`)
  private def textRankIterCtes(iters: Int): String =
    (1 to iters).map { k =>
      s"""s$k AS (SELECT e.doc_id, e.dst AS word,
              SUM(r${k - 1}.rank // e.deg) AS sum_c
            FROM e JOIN r${k - 1}
              ON e.doc_id = r${k - 1}.doc_id AND e.src = r${k - 1}.word
            GROUP BY 1, 2),
          r$k AS MATERIALIZED (SELECT n.doc_id, n.word,
              n.tele + (COALESCE(s$k.sum_c, 0) * 85 // 100) AS rank
            FROM nodes n LEFT JOIN s$k
              ON n.doc_id = s$k.doc_id AND n.word = s$k.word)"""
    }.mkString(",\n")

  private val t47 = Q(
    "t47_textrank",
    // TextRank keywords (Mihalcea & Tarau 2004): per-doc PageRank over
    // the adjacent-word co-occurrence graph, top-5 by rank — the GRAPH
    // keyword rung above t24's tf-idf (centrality in THIS doc's
    // structure vs corpus rarity). d26's scaled-integer floor-division
    // discipline keyed by (doc, word), so the oracle unrolls all 5
    // rounds CTE-for-CTE with the per-doc teleport 15·scale/(100·n_d)
    (s, dir) => Clusters.textRank(
      Tables.loadParallel(s, dir, "documents"),
      "doc_id", "text", iters = 5, topK = 5),
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') l
              FROM documents),
            raw AS (SELECT doc_id, unnest(l) w, generate_subscripts(l, 1) i
              FROM t),
            tok AS (SELECT doc_id, w,
                row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
              FROM raw WHERE w <> ''),
            adj AS (SELECT a.doc_id, a.w AS wa, b.w AS wb
              FROM tok a JOIN tok b
                ON a.doc_id = b.doc_id AND b.rn = a.rn + 1 AND a.w <> b.w),
            und AS (SELECT DISTINCT doc_id, least(wa, wb) AS u,
                greatest(wa, wb) AS v FROM adj),
            e0 AS (SELECT doc_id, u AS src, v AS dst FROM und
              UNION ALL SELECT doc_id, v, u FROM und),
            deg AS MATERIALIZED (SELECT doc_id, src, COUNT(*) AS deg
              FROM e0 GROUP BY 1, 2),
            nd AS (SELECT doc_id, COUNT(*) AS n_d FROM deg GROUP BY 1),
            nodes AS MATERIALIZED (SELECT deg.doc_id, deg.src AS word,
                (15 * 1000000000000) // (100 * nd.n_d) AS tele,
                1000000000000 // nd.n_d AS r0
              FROM deg JOIN nd USING (doc_id)),
            e AS MATERIALIZED (SELECT e0.doc_id, e0.src, e0.dst, deg.deg
              FROM e0 JOIN deg USING (doc_id, src)),
            r0 AS (SELECT doc_id, word, r0 AS rank FROM nodes),
            ${textRankIterCtes(5)},
            sel AS (SELECT doc_id, word, rank,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY rank DESC, word ASC) AS rn
              FROM r5)
            SELECT doc_id, word, CAST(rank AS BIGINT) AS rank,
              CAST(rn AS BIGINT) AS rn
            FROM sel WHERE rn <= 5
            ORDER BY doc_id, rn"""))

  private val t48 = Q(
    "t48_source_prior",
    // empirical-Bayes shrunk per-source quality rate (the m-estimate,
    // Cestnik 1990 — a Beta prior of strength m=20 pseudo-docs on each
    // source's gopher pass rate): the DOMAIN-level quality prior crawl
    // pipelines rank sources by — a 2/2 source must not outrank a
    // 950/1000 one. Cleared to (k_g*N + m*K)/(N*(n_g + m)): exact
    // longs, ONE IEEE division (+ one for the reported raw rate)
    (s, dir) => Corpus.shrunkGroupRate(
        Tables.loadParallel(s, dir, "documents")
          .select(col("source"),
            TextOps.gopherPass(col("text"), 10, 100000, minStops = 1)
              .as("pass")),
        "source", "pass", m = 20)
      .orderBy("source"),
    Some(s"""WITH $gopherCte,
            g AS (SELECT source, COUNT(*) AS n_docs,
                CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_pass
              FROM gp GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
                CAST(SUM(n_pass) AS BIGINT) AS kk FROM g)
            SELECT g.source, g.n_docs, g.n_pass,
              CAST(g.n_pass AS DOUBLE) / g.n_docs AS raw_rate,
              CAST(g.n_pass * tot.nn + 20 * tot.kk AS DOUBLE) /
                CAST(tot.nn * (g.n_docs + 20) AS DOUBLE) AS shrunk_rate
            FROM g CROSS JOIN tot
            ORDER BY source"""))

  private val t49 = Q(
    "t49_trained_lang_id",
    // trained multiclass language ID (the fastText/CCNet rung above
    // t01's marker heuristic): fit a softmax hashed-BoW model on the
    // even-doc_id half's lang labels, predict the held-out odd half with
    // the fused one-pass argmax expression. Trained-float margins have
    // no DuckDB mirror (rows-only); LangIdSpec gates planted-population
    // accuracy >= 0.9, bit-reproducible training, save/load, and
    // expression ≡ reference-predictor strict equality
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      val model = LangIdModel.train(
        docs.filter(col("doc_id") % 2 === 0), "text", "lang")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang").as("lang_label"),
          model.predict(col("text")).as("lang_pred"))
        .withColumn("hit", (col("lang_pred") === col("lang_label")).cast("int"))
        .orderBy("doc_id")
    },
    None) // trained-float argmax: rows-only, LangIdSpec-gated

  private val t50 = Q(
    "t50_dirichlet_ql",
    // Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001): the
    // LM-retrieval rung beside t34's BM25 — same fixture queries, ranked
    // by total whole-bit surprisal of the query under each candidate
    // doc's smoothed unigram LM (mu=2000). Integer end to end: cleared
    // rationals, length(bin(den div num)) per term, LONG sums; within-
    // bit ties by matched term mass then doc_id
    (s, dir) => {
      val queries = s.createDataFrame(Seq(
        (0, "join"), (0, "hash"), (1, "vector"), (1, "stream"),
        (2, "customer"))).toDF("query_id", "term")
      Corpus.dirichletQlTopK(Tables.load(s, dir, "documents"),
          "doc_id", "text", queries, k = 10)
        .orderBy("query_id", "rk")
    },
    Some("""WITH q(query_id, term) AS (VALUES
              (0, 'join'), (0, 'hash'), (1, 'vector'), (1, 'stream'),
              (2, 'customer')),
            tok AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS token
              FROM documents),
            tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
                   FROM tok GROUP BY 1),
            stats AS (SELECT CAST(SUM(dl) AS BIGINT) AS csize FROM dl),
            cf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cf
                   FROM tok GROUP BY 1),
            cand AS (SELECT DISTINCT q.query_id, tf.doc_id
              FROM q JOIN tf ON q.term = tf.token),
            scored AS (
              SELECT c.query_id, c.doc_id,
                SUM(CASE WHEN COALESCE(tf.tf, 0) * csize
                      + 2000 * COALESCE(cf.cf, 0) > 0
                  THEN length(bin((dl.dl + 2000) * csize //
                    (COALESCE(tf.tf, 0) * csize
                     + 2000 * COALESCE(cf.cf, 0))))
                  ELSE length(bin((dl.dl + 2000) * csize)) END) AS sum_bits,
                CAST(SUM(COALESCE(tf.tf, 0)) AS BIGINT) AS match_tf
              FROM cand c
              JOIN q ON q.query_id = c.query_id
              LEFT JOIN cf ON cf.token = q.term
              LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.token = q.term
              JOIN dl ON dl.doc_id = c.doc_id
              CROSS JOIN stats
              GROUP BY 1, 2),
            ranked AS (SELECT query_id, doc_id, sum_bits, match_tf,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY sum_bits ASC, match_tf DESC, doc_id) AS rk
              FROM scored)
            SELECT query_id, rk, doc_id,
              CAST(sum_bits AS BIGINT) AS sum_bits, match_tf
            FROM ranked WHERE rk <= 10 ORDER BY query_id, rk"""))

  private val t51 = Q(
    "t51_yule_k",
    // Yule's characteristic K (Yule 1944): length-stable lexical
    // diversity — the repetitiveness quality signal ONE threshold can
    // gate across the document length distribution (TTR can't). Exact
    // longs (sum of squared type counts), one IEEE expression
    (s, dir) => Corpus.yuleK(
        Tables.loadParallel(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH tok AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS w
              FROM documents),
            c AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
                  FROM tok GROUP BY 1, 2),
            d AS (SELECT doc_id, CAST(SUM(c*c) AS BIGINT) AS sum_sq,
                CAST(SUM(c) AS BIGINT) AS n_tok FROM c GROUP BY 1)
            SELECT docs.doc_id,
              COALESCE(n_tok, 0) AS n_tok,
              COALESCE(sum_sq, 0) AS sum_sq,
              CASE WHEN COALESCE(n_tok, 0) > 0
                THEN 10000.0 * (sum_sq - n_tok)
                  / (CAST(n_tok AS DOUBLE) * n_tok)
                ELSE NULL END AS yule_k
            FROM (SELECT doc_id FROM documents) docs
            LEFT JOIN d USING (doc_id) ORDER BY doc_id"""))

  private val t52 = Q(
    "t52_signal_corr",
    // quality-signal redundancy: pairwise Pearson r over the five t02
    // integer signals in ONE exact-moment pass — which signals measure
    // the same thing (t28's kappa asks this of binary GATES; this asks
    // it of the raw scores, BEFORE thresholds exist)
    (s, dir) => Corpus.pearsonMatrix(
        Tables.loadParallel(s, dir, "documents")
          .select(TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
            TextOps.stopwordCount(col("text")).cast("long").as("n_stop"),
            TextOps.punctCount(col("text")).cast("long").as("n_punct"),
            size(TextOps.wordSet(col("text"))).cast("long").as("n_uniq"),
            length(col("text")).cast("long").as("n_chars")),
        Seq("n_tok", "n_stop", "n_punct", "n_uniq", "n_chars"))
      .orderBy("sig_x", "sig_y"),
    Some {
      val cols = Seq("n_tok", "n_stop", "n_punct", "n_uniq", "n_chars")
      val prs = for {
        i <- cols.indices; j <- (i + 1) until cols.size
      } yield (cols(i), cols(j))
      val pairSelects = prs.map { case (a, b) =>
        s"""SELECT '$a' AS sig_x, '$b' AS sig_y, n,
           CASE WHEN n*q_$a - s_$a*s_$a > 0 AND n*q_$b - s_$b*s_$b > 0
             THEN CAST(n*p_${a}__$b - s_$a*s_$b AS DOUBLE) /
               (sqrt(CAST(n*q_$a - s_$a*s_$a AS DOUBLE)) *
                sqrt(CAST(n*q_$b - s_$b*s_$b AS DOUBLE)))
             ELSE NULL END AS r FROM m"""
      }.mkString("\n            UNION ALL ")
      val moments = (cols.flatMap(c => Seq(
        s"CAST(SUM($c) AS BIGINT) AS s_$c",
        s"CAST(SUM($c*$c) AS BIGINT) AS q_$c")) ++
        prs.map { case (a, b) =>
          s"CAST(SUM($a*$b) AS BIGINT) AS p_${a}__$b" } :+
        "CAST(COUNT(*) AS BIGINT) AS n").mkString(",\n                ")
      s"""WITH sig AS (SELECT
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tok,
                len(list_filter(string_split(text, ' '),
                  x -> x IN ('the','a','of','and','is','in','to')))
                  AS n_stop,
                length(text) - length(regexp_replace(text, '[.,!?;:]',
                  '', 'g')) AS n_punct,
                len(list_distinct(list_filter(string_split(text, ' '),
                  x -> x <> ''))) AS n_uniq,
                length(text) AS n_chars
              FROM documents),
            m AS (SELECT
                $moments
              FROM sig)
            $pairSelects
            ORDER BY sig_x, sig_y"""
    })

  private val t53 = Q(
    "t53_token_dispersion",
    // token burstiness (Church & Gale 1995): VMR across docs separates
    // clumping content words (VMR >> 1) from Poisson-spread function
    // words (VMR ~ 1) — stopword induction without a hand list. Exact
    // longs, one IEEE division; df >= 5 bounds the output
    (s, dir) => Corpus.tokenDispersion(
        Tables.loadParallel(s, dir, "documents"), "doc_id", "text",
        minDf = 5)
      .orderBy("token"),
    Some("""WITH tok AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS w
              FROM documents),
            c AS (SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
                  FROM tok GROUP BY 1, 2),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
            agg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
                CAST(SUM(c) AS BIGINT) AS s,
                CAST(SUM(c*c) AS BIGINT) AS q
              FROM c GROUP BY 1)
            SELECT w AS token, df, s AS total,
              CAST(nn.n * q - s * s AS DOUBLE)
                / (CAST(nn.n AS DOUBLE) * s) AS vmr
            FROM agg CROSS JOIN nn
            WHERE df >= 5
            ORDER BY token"""))

  private val p28 = Q(
    "p28_budget_select",
    // token-budget-constrained selection (the GPT-3/LLaMA "take the
    // top classifier-scored docs to a size target" cut, materialized):
    // keep docs in (quality desc, id) order while the running token
    // total fits 10k. Score = t02's quality quantized to micros;
    // running totals via the range-partitioned prefix machinery
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
          round(TextOps.qualityScore(col("text")) * 1000000)
            .cast("long").as("q_micro"))
      Corpus.budgetSelect(docs, "doc_id", "n_tok", "q_micro",
          budget = 10000L)
        .orderBy("doc_id")
    },
    Some("""WITH c AS (SELECT doc_id,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tokens,
                len(list_filter(string_split(text, ' '),
                  x -> x IN ('the','a','of','and','is','in','to')))
                  AS n_stopwords,
                length(text) - length(regexp_replace(text, '[.,!?;:]',
                  '', 'g')) AS n_punct,
                length(text) - length(regexp_replace(text, '[A-Z]', '',
                  'g')) AS n_upper,
                length(text) AS n_chars
              FROM documents),
            q AS (SELECT doc_id,
                CAST(n_tokens AS BIGINT) AS n_tok,
                CAST(round((0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0,
                    1.0)
                  + 0.3 * (CAST(n_stopwords AS DOUBLE)
                      / greatest(CAST(n_tokens AS DOUBLE), 1.0))
                  + 0.2 * (1.0 - CAST(n_punct AS DOUBLE)
                      / greatest(CAST(n_chars AS DOUBLE), 1.0))
                  + 0.1 * (1.0 - CAST(n_upper AS DOUBLE)
                      / greatest(CAST(n_chars AS DOUBLE), 1.0)))
                  * 1000000) AS BIGINT) AS q_micro
              FROM c),
            o AS (SELECT doc_id, n_tok, q_micro,
                CAST(SUM(n_tok) OVER (ORDER BY q_micro DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_weight
              FROM q)
            SELECT doc_id, n_tok, q_micro, cum_weight
            FROM o WHERE cum_weight <= 10000 ORDER BY doc_id"""))

  private val t54 = Q(
    "t54_novelty_rate",
    // corpus novelty curve: per doc, the fraction of its distinct
    // bigrams never seen in any EARLIER doc — how much MARGINAL
    // content each ingest contributes (the declining tail is why
    // data-constrained runs repeat epochs instead of crawling more)
    (s, dir) => Corpus.noveltyRate(
        Tables.loadParallel(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') l
                  FROM documents),
            raw AS (SELECT doc_id, unnest(l) w,
                generate_subscripts(l, 1) i FROM t),
            tok AS (SELECT doc_id, w,
                row_number() OVER (PARTITION BY doc_id ORDER BY i) rn
              FROM raw WHERE w <> ''),
            big AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w g
                FROM tok a JOIN tok b
                  ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
            fo AS (SELECT g, MIN(doc_id) first_id FROM big GROUP BY 1),
            per AS (SELECT big.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                CAST(SUM(CASE WHEN fo.first_id = big.doc_id THEN 1
                  ELSE 0 END) AS BIGINT) AS n_new
              FROM big JOIN fo ON big.g = fo.g GROUP BY 1)
            SELECT d.doc_id,
              COALESCE(n_grams, 0) AS n_grams,
              COALESCE(n_new, 0) AS n_new,
              CASE WHEN COALESCE(n_grams, 0) > 0
                THEN CAST(n_new AS DOUBLE) / n_grams ELSE NULL END
                AS novelty
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN per USING (doc_id) ORDER BY doc_id"""))

  private val t55 = Q(
    "t55_rank_sketch",
    // mergeable ε-rank quantile sketch per lang (GK QuantileSummaries
    // via approx_percentile): t39's error-bounded twin for UNBOUNDED
    // value domains — state is O((1/ε)·log(εn)) per group, never the
    // multiset. Rows-only: the estimate depends on the sketch's
    // compaction schedule, which no SQL engine mirrors; SketchSpec
    // gates the ε-rank guarantee, merge invariance, and stream parity
    (s, dir) => Corpus.rankSketchQuantiles(
      Tables.load(s, dir, "documents"), "text", "lang", accuracy = 1000),
    None)

  private val p27 = Q(
    "p27_stratified_k",
    // exactly-100 stratified eval draw over language shares: Hamilton
    // largest-remainder quotas (base floor + leftover seats to the
    // largest k*n_s mod N, ties to the smaller stratum) + the p16
    // seeded-md5 reservoir within each stratum — integer end to end,
    // so quota arithmetic and the draw both mirror exactly
    (s, dir) => Corpus.stratifiedExactK(
        Tables.load(s, dir, "documents"), "doc_id", "lang",
        k = 100, seed = "strat0")
      .orderBy("doc_id"),
    Some("""WITH c AS (SELECT lang AS stratum, COUNT(*) AS n_s
              FROM documents GROUP BY 1),
            q0 AS (SELECT stratum, n_s, SUM(n_s) OVER () AS n_tot FROM c),
            q1 AS (SELECT stratum, n_s, n_tot,
                (n_s * 100) // n_tot AS base,
                (n_s * 100) % n_tot AS rem FROM q0),
            q2 AS (SELECT *, 100 - SUM(base) OVER () AS leftover,
                row_number() OVER (ORDER BY rem DESC, stratum ASC) AS rk_rem
              FROM q1),
            quota AS (SELECT stratum,
                base + CASE WHEN rk_rem <= leftover THEN 1 ELSE 0 END
                  AS quota FROM q2),
            d AS (SELECT doc_id, lang,
                md5('strat0:' || CAST(doc_id AS VARCHAR)) AS draw_key
              FROM documents),
            r AS (SELECT doc_id, lang, CAST(row_number() OVER
                (PARTITION BY lang ORDER BY draw_key, doc_id) AS BIGINT)
                AS rk
              FROM d)
            SELECT r.doc_id, r.lang, r.rk, CAST(q.quota AS BIGINT) AS quota
            FROM r JOIN quota q ON r.lang = q.stratum
            WHERE r.rk <= q.quota
            ORDER BY doc_id"""))

  private val t62 = Q(
    "t62_krippendorff",
    // Krippendorff's alpha across THREE binary quality gates (length,
    // token-count, function-word) — the panel-reliability audit above
    // t28's 2-rater kappa: do the gates measure one construct, or is
    // one of them noise? Integer coincidence moments in one scan; the
    // final alpha is a single fixed IEEE expression — hash-exact.
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      Corpus.krippendorffAlpha(d, Seq(
        col("n_chars") >= 200,
        size(TextOps.tokens(col("text"))) >= 40,
        contains(lower(col("text")), lit(" the "))))
    },
    Some("""WITH r AS (SELECT
                (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END
                 + CASE WHEN len(list_filter(string_split(text, ' '),
                     x -> x <> '')) >= 40 THEN 1 ELSE 0 END
                 + CASE WHEN contains(lower(text), ' the ')
                     THEN 1 ELSE 0 END) AS n1
              FROM documents),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
                CAST(SUM(n1) AS BIGINT) AS n1_total,
                CAST(SUM(n1 * (3 - n1)) AS BIGINT) AS pair_disagree
              FROM r)
            SELECT n_units, CAST(3 AS BIGINT) AS m, n1_total,
              3 * n_units - n1_total AS n0_total, pair_disagree,
              CASE WHEN n1_total = 0 OR 3 * n_units - n1_total = 0
                THEN NULL
                ELSE 1.0E0 - (CAST(3 * n_units - 1 AS DOUBLE)
                    * CAST(pair_disagree AS DOUBLE))
                  / (CAST(2 AS DOUBLE)
                    * CAST(3 * n_units - n1_total AS DOUBLE)
                    * CAST(n1_total AS DOUBLE))
              END AS alpha
            FROM a"""))

  private val t63 = Q(
    "t63_stem_vocab",
    // top-5 Porter stems per language: the morphology-collapsed vocab
    // head (see Corpus.topStemsPerGroup / functions.PorterStemExpr).
    // Rows-only: the stemmer is an algorithm, not a SQL expression —
    // StemSpec gates the expression against the published algorithm's
    // vectors and pins determinism + non-alpha passthrough.
    (s, dir) => Corpus.topStemsPerGroup(
        Tables.loadParallel(s, dir, "documents"), "text", "lang", k = 5)
      .orderBy("lang", "rk"),
    None)

  private val t64 = Q(
    "t64_sketch_vocab",
    // per-language vocabulary from per-(lang, source) DataSketches HLL
    // sketches unioned per language — the PERSISTABLE mergeable-sketch
    // path (see Corpus.sketchVocabPerGroup). Rows-only: sketch
    // estimates have no SQL mirror; SketchSpec gates the estimate
    // against the exact distinct count and pins union invariance.
    (s, dir) => Corpus.sketchVocabPerGroup(
        Tables.loadParallel(s, dir, "documents"), "text", "lang", "source")
      .orderBy("lang"),
    None)

  private val t65 = Q(
    "t65_conformal_gate",
    // split-conformal threshold calibration for a token-density score
    // (see Corpus.conformalGate): calibration slice = md5 last hex
    // 0-7 (the p01 split convention), target flag rate alpha = 0.1;
    // per-language test-slice audit shows the marginal-vs-conditional
    // coverage gap. Integer rank arithmetic end-to-end — hash-exact.
    (s, dir) => {
      val d = Tables.load(s, dir, "documents").filter(col("n_chars") > 0)
      Corpus.conformalGate(d,
        expr("1000L * size(filter(split(text, ' '), x -> x != '')) div n_chars"),
        substring(md5(col("doc_id").cast("string")), 32, 1)
          .between("0", "7"),
        "lang")
        .orderBy("lang")
    },
    Some("""WITH sc AS (SELECT lang,
                1000 * len(list_filter(string_split(text, ' '),
                  x -> x <> '')) // n_chars AS s,
                substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                  BETWEEN '0' AND '7' AS cal
              FROM documents WHERE n_chars > 0),
            cals AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS c
              FROM sc WHERE cal GROUP BY s),
            cum AS (SELECT s,
                CAST(SUM(c) OVER (ORDER BY s) AS BIGINT) AS cum,
                CAST(SUM(c) OVER () AS BIGINT) AS n_cal
              FROM cals),
            thr AS (SELECT COALESCE(MIN(CASE
                  WHEN 10 * cum >= 9 * (n_cal + 1) THEN s END),
                9223372036854775807) AS threshold FROM cum)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN s > threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
              CAST(SUM(CASE WHEN s > threshold THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS flag_rate,
              threshold
            FROM sc CROSS JOIN thr WHERE NOT cal
            GROUP BY lang, threshold ORDER BY lang"""))

  private val t66 = Q(
    "t66_code_detect",
    // code-vs-prose triage: symbol/semicolon/indent/camelCase counts
    // per doc + a composite code flag, rolled per language — the
    // mixture-routing gate a pretraining pipeline runs before deciding
    // a document's tokenizer, packing lane, and mixture bucket (code
    // and prose want different treatment end to end). The corpus is
    // synthetic prose, so a deterministic slice (ids %19==0) gets a
    // code block planted — the t13 injection pattern; the flag must
    // recover exactly that slice. Integer counts + one division —
    // hash-exact.
    (s, dir) => {
      val injected = Tables.load(s, dir, "documents")
        .withColumn("text",
          when(col("doc_id") % 19 === 0,
            concat(col("text"),
              lit(" int main() {\n  x = y;\n  foo(bar);\n  return 0;\n}")))
          .otherwise(col("text")))
      val sym = length(col("text")) -
        length(regexp_replace(col("text"), "[{}()\\[\\];=<>]", ""))
      val scored = injected.select(col("lang"),
        sym.as("n_sym"),
        regexp_count(col("text"), lit(";")).as("n_semi"),
        regexp_count(col("text"), lit("\\n  ")).as("n_indent"),
        regexp_count(col("text"), lit("[a-z][A-Z]")).as("n_camel"))
        .withColumn("code_flag",
          (col("n_semi") >= 3 && col("n_sym") >= 8 && col("n_indent") >= 2)
            .cast("long"))
      scored.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("code_flag").as("n_code"),
          sum("n_sym").as("sym_total"),
          sum("n_semi").as("semi_total"),
          sum("n_camel").as("camel_total"))
        .select(col("lang"), col("n_docs"), col("n_code"),
          (col("n_code").cast("double") / col("n_docs").cast("double"))
            .as("code_rate"),
          col("sym_total"), col("semi_total"), col("camel_total"))
        .orderBy("lang")
    },
    Some("""WITH inj AS (SELECT lang,
              CASE WHEN doc_id % 19 = 0
                THEN text || ' int main() {' || chr(10) || '  x = y;'
                  || chr(10) || '  foo(bar);' || chr(10)
                  || '  return 0;' || chr(10) || '}'
                ELSE text END AS text
              FROM documents),
            sc AS (SELECT lang,
              length(text) - length(regexp_replace(text,
                '[{}()\[\];=<>]', '', 'g')) AS n_sym,
              len(regexp_extract_all(text, ';')) AS n_semi,
              len(regexp_extract_all(text, '\n  ')) AS n_indent,
              len(regexp_extract_all(text, '[a-z][A-Z]')) AS n_camel
              FROM inj),
            fl AS (SELECT lang, n_sym, n_semi, n_camel,
              CASE WHEN n_semi >= 3 AND n_sym >= 8 AND n_indent >= 2
                THEN 1 ELSE 0 END AS code_flag
              FROM sc)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(code_flag) AS BIGINT) AS n_code,
              CAST(SUM(code_flag) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                AS code_rate,
              CAST(SUM(n_sym) AS BIGINT) AS sym_total,
              CAST(SUM(n_semi) AS BIGINT) AS semi_total,
              CAST(SUM(n_camel) AS BIGINT) AS camel_total
            FROM fl GROUP BY lang ORDER BY lang"""))

  private val t67 = Q(
    "t67_secret_scan",
    // credential / high-entropy leak scan: key-assignment patterns,
    // 32-hex runs, and base64-ish runs per doc, rolled per source —
    // the secret-scrubbing gate a code-bearing corpus runs before
    // release (trained models regurgitate verbatim keys; scanning at
    // curation is the cheap place to stop that). Deterministic
    // injection (the t13 pattern): ids %13==0 get a key assignment,
    // ids %17==0 a 32-hex blob (which the base64-class detector also
    // matches — hex is a subset, real scanner behavior). Integer
    // counts + one division — hash-exact.
    (s, dir) => {
      val injected = Tables.load(s, dir, "documents")
        .withColumn("text", concat(col("text"),
          when(col("doc_id") % 13 === 0,
            concat(lit(" cfg api_key=AK"),
              substring(md5(concat(lit("k:"),
                col("doc_id").cast("string"))), 1, 16)))
            .otherwise(lit("")),
          when(col("doc_id") % 17 === 0,
            concat(lit(" blob "),
              md5(concat(lit("b:"), col("doc_id").cast("string")))))
            .otherwise(lit(""))))
      val scored = injected.select(col("source"),
        regexp_count(col("text"),
          lit("(?i)(api_key|secret|token|passwd|password) *[=:] *[A-Za-z0-9/+_-]{8,}"))
          .as("n_keyassign"),
        regexp_count(col("text"), lit("[0-9a-f]{32}")).as("n_hexruns"),
        regexp_count(col("text"), lit("[A-Za-z0-9+/]{28,}={0,2}"))
          .as("n_b64runs"))
        .withColumn("leak_flag",
          (col("n_keyassign") > 0 || col("n_hexruns") > 0 ||
            col("n_b64runs") > 0).cast("long"))
      scored.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("leak_flag").as("n_flagged"),
          sum("n_keyassign").as("keyassign_total"),
          sum("n_hexruns").as("hexrun_total"),
          sum("n_b64runs").as("b64_total"))
        .select(col("source"), col("n_docs"), col("n_flagged"),
          (col("n_flagged").cast("double") / col("n_docs").cast("double"))
            .as("leak_rate"),
          col("keyassign_total"), col("hexrun_total"), col("b64_total"))
        .orderBy("source")
    },
    Some("""WITH inj AS (SELECT source, text
                || CASE WHEN doc_id % 13 = 0
                  THEN ' cfg api_key=AK' || substr(md5('k:'
                    || CAST(doc_id AS VARCHAR)), 1, 16)
                  ELSE '' END
                || CASE WHEN doc_id % 17 = 0
                  THEN ' blob ' || md5('b:' || CAST(doc_id AS VARCHAR))
                  ELSE '' END AS text
              FROM documents),
            sc AS (SELECT source,
              len(regexp_extract_all(text,
                '(?i)(api_key|secret|token|passwd|password) *[=:] *[A-Za-z0-9/+_-]{8,}'))
                AS n_keyassign,
              len(regexp_extract_all(text, '[0-9a-f]{32}')) AS n_hexruns,
              len(regexp_extract_all(text, '[A-Za-z0-9+/]{28,}={0,2}'))
                AS n_b64runs
              FROM inj),
            fl AS (SELECT source, n_keyassign, n_hexruns, n_b64runs,
              CASE WHEN n_keyassign > 0 OR n_hexruns > 0 OR n_b64runs > 0
                THEN 1 ELSE 0 END AS leak_flag
              FROM sc)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(leak_flag) AS BIGINT) AS n_flagged,
              CAST(SUM(leak_flag) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                AS leak_rate,
              CAST(SUM(n_keyassign) AS BIGINT) AS keyassign_total,
              CAST(SUM(n_hexruns) AS BIGINT) AS hexrun_total,
              CAST(SUM(n_b64runs) AS BIGINT) AS b64_total
            FROM fl GROUP BY source ORDER BY source"""))

  private val p33 = Q(
    "p33_mixture_audit",
    // fairness audit of p17's materialized interleave: per source over
    // 100-doc training windows, realized min/max counts vs the
    // weight-implied expectation and the worst absolute deviation —
    // WFQ guarantees long-run rates, the curriculum cares about the
    // worst WINDOW (Corpus.mixtureAudit). Integer window counts + one
    // fixed IEEE expression over min/max — hash-exact on top of the
    // p17 SQL chain.
    (s, dir) => {
      val weights = (0 until 20).map(i =>
        s"src$i" -> (if (i < 5) 4.0 else 1.0)).toMap
      Corpus.mixtureAudit(
        Corpus.mixtureOrder(Tables.load(s, dir, "documents"),
          "doc_id", "source", weights, seed = "mix0"),
        "source", weights, window = 100)
        .orderBy("source")
    },
    Some("""WITH k AS (SELECT doc_id, source,
                md5('mix0:' || CAST(doc_id AS VARCHAR)) AS sk
              FROM documents),
            r AS (SELECT doc_id, source,
                row_number() OVER (PARTITION BY source
                  ORDER BY sk, doc_id) - 1 AS src_rank
              FROM k),
            v AS (SELECT doc_id, source, src_rank,
                (CAST(src_rank AS DOUBLE) + 0.5) /
                  (CASE WHEN source IN
                     ('src0','src1','src2','src3','src4')
                    THEN 4.0 ELSE 1.0 END) AS vt
              FROM r),
            f AS (SELECT doc_id, source,
                row_number() OVER (ORDER BY vt, doc_id) - 1 AS mix_pos
              FROM v),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM f),
            fb AS (SELECT source, mix_pos // 100 AS w
              FROM f CROSS JOIN tot
              WHERE mix_pos < (n_total // 100) * 100),
            wc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM fb GROUP BY 1, 2),
            nw AS (SELECT n_total // 100 AS n_windows FROM tot),
            agg AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_docs,
                CAST(COUNT(*) AS BIGINT) AS n_present,
                CAST(MIN(cnt) AS BIGINT) AS min_present,
                CAST(MAX(cnt) AS BIGINT) AS max_cnt
              FROM wc GROUP BY 1),
            spine AS (SELECT 'src' || CAST(i AS VARCHAR) AS source
              FROM range(20) t(i)),
            j AS (SELECT COALESCE(spine.source, agg.source) AS source,
                CAST(COALESCE(n_docs, 0) AS BIGINT) AS n_docs,
                CAST(COALESCE(n_present, 0) AS BIGINT) AS n_present,
                CAST(COALESCE(min_present, 0) AS BIGINT) AS min_present,
                CAST(COALESCE(max_cnt, 0) AS BIGINT) AS max_cnt
              FROM spine FULL JOIN agg ON spine.source = agg.source)
            SELECT source, n_docs, n_windows,
              CASE WHEN n_present < n_windows THEN 0
                ELSE min_present END AS min_cnt,
              max_cnt,
              100.0E0 * (CASE WHEN source IN
                  ('src0','src1','src2','src3','src4')
                THEN 4.0E0 ELSE 1.0E0 END) / 35.0E0
                AS expected_per_window,
              greatest(
                abs(CAST(CASE WHEN n_present < n_windows THEN 0
                    ELSE min_present END AS DOUBLE)
                  - (100.0E0 * (CASE WHEN source IN
                      ('src0','src1','src2','src3','src4')
                    THEN 4.0E0 ELSE 1.0E0 END) / 35.0E0)),
                abs(CAST(max_cnt AS DOUBLE)
                  - (100.0E0 * (CASE WHEN source IN
                      ('src0','src1','src2','src3','src4')
                    THEN 4.0E0 ELSE 1.0E0 END) / 35.0E0)))
                AS max_abs_dev
            FROM j CROSS JOIN nw ORDER BY source"""))

  val all: Seq[Q] =
    Seq(t05, t06, t07, t08, t09, t10, t11, t12, t13, t14, t15, t16, t17, t18, t19, t20, t21, t22, t23, t24, t25, t26, t27, t28, t29, t30, t31, t32, t33, t34, t35, t36, t37, t38, t39, t40, t41, t42, t43, t44, t45, t46, t47, t48, t49, t50, t51, t52, t53, t54, t55, t56, t58, t59, t60, t61, t62, t63, t64, t65, t66, t67,
      t68,
      p01, p02, p03, p04, p05, p06, p07, p08, p09, p10, p12, p13, p14, p15, p16, p17, p18, p19, p20, p21, p22, p23, p24, p25, p26, p27, p28, p29, p30, p31, p32, p33,
      d06, d07, d08, d09, d11, d12, d13, d14, d15, d16, d17, d18, d19, d20,
      d22, d23, d24, d25, d27, d33, d37, d38, d41, d42, d43)
}
