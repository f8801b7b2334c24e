package graft.queries

import org.apache.spark.sql.functions._

import graft.mm.Multimodal
import graft.sim.Similarity
import graft.source.Tables
import graft.text.{Dedup, Text}

/** Driver-checkable queries over the corpus tables (`documents`,
  * `embeddings`): dedup, text analysis, similarity search, multimodal
  * plumbing — the training-data-pipeline surface (SURVEY.md §7.2 M5).
  */
object CorpusQueries {

  /** Exact top-10 cosine neighbors of the first 20 vectors — the oracle for
    * both `ann_brute_topk` and `ann_ivf_topk` (IVF probing every inverted
    * list is exhaustive search, so its result set is identical by
    * construction). Bit-exactness holds because both engines promote floats
    * to double and accumulate the dot product in index order (see the
    * `emb_norms` precedent), and ranking ties break on `n_id`.
    */
  private val annExactTopkSql =
    """WITH v AS (SELECT vec_id, embedding,
       sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS norm
       FROM embeddings),
     s AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       list_sum(list_transform(range(len(q.embedding)),
         i -> CAST(q.embedding[i+1] AS DOUBLE) * CAST(n.embedding[i+1] AS DOUBLE)))
         / (q.norm * n.norm) AS cos
       FROM v q JOIN v n ON n.vec_id <> q.vec_id WHERE q.vec_id < 20)
     SELECT q_id, n_id, cos, rnk FROM (
       SELECT q_id, n_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rnk
       FROM s) WHERE rnk <= 10 ORDER BY q_id, rnk"""

  val all: Seq[Q] = Seq(

    // Exact dedup via content fingerprint (hash-groupBy; text never shuffles).
    Q("doc_exact_dedup",
      """SELECT md5(text) AS fingerprint, MIN(doc_id) AS canonical_id,
         COUNT(*) AS n_dups
         FROM documents GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      Dedup.exact(Tables(s, dir, "documents")).orderBy(col("fingerprint"))
    },

    // Token statistics per (lang, source) stratum.
    Q("doc_token_stats",
      """SELECT lang, source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
         FROM documents GROUP BY lang, source ORDER BY lang, source""") { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy(col("lang"), col("source"))
    },

    // Per-document quality features (ratios are int/int → exact doubles).
    Q("doc_quality",
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS distinct_tokens,
         len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS distinct_ratio,
         len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) / len(string_split(text, ' ')) AS stopword_ratio
         FROM documents ORDER BY doc_id""") { (s, dir) =>
      val toks = split(col("text"), " ")
      val stops = array(lit("the"), lit("a"))
      Tables(s, dir, "documents").select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("distinct_tokens"),
          (size(array_distinct(toks)) / size(toks)).as("distinct_ratio"),
          (size(filter(toks, w => array_contains(stops, w))) / size(toks))
            .as("stopword_ratio"))
        .orderBy(col("doc_id"))
    },

    // Exact word-set Jaccard near-dup pairs, blocked on (lang, source).
    Q("doc_jaccard_pairs",
      """WITH d AS (SELECT doc_id, lang, source,
           list_distinct(string_split(text, ' ')) AS w FROM documents)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           len(list_intersect(a.w, b.w)) /
             (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) AS jaccard
         FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
           AND a.doc_id < b.doc_id
         WHERE len(list_intersect(a.w, b.w)) /
             (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.8
         ORDER BY a_id, b_id""") { (s, dir) =>
      Dedup.jaccardPairs(Tables(s, dir, "documents"),
          blockCols = Seq("lang", "source"), threshold = 0.8)
        .orderBy(col("a_id"), col("b_id"))
    },

    // MinHash+LSH near-dup pairs — banded bucket join, no SQL oracle
    // (minhash permutations are engine-side); DedupSpec checks candidates
    // against exact shingle Jaccard.
    Q.unchecked("doc_minhash_pairs") { (s, dir) =>
      Dedup.minhashPairs(Tables(s, dir, "documents"), threshold = 0.5)
        .orderBy(col("a_id"), col("b_id"))
    },

    // SimHash near-dup pairs (Hamming ≤ 3 on 64-bit signatures).
    Q.unchecked("doc_simhash_pairs") { (s, dir) =>
      Dedup.simhashPairs(Tables(s, dir, "documents"), maxHamming = 3)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Language ID + quality score (heuristic models — spec-verified).
    // The fixture file is a single parquet row group (= one scan task), so
    // this CPU-heavy per-doc stage repartitions first: a few MB of shuffle
    // buys full-cluster parallelism for the expression evaluation — the
    // standard move for compute-bound per-row stages after a narrow scan.
    Q.unchecked("doc_langid") { (s, dir) =>
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(
          col("doc_id"), col("lang").as("labeled_lang"),
          Text.langId(col("text")).as("predicted_lang"),
          Text.langIdNgram(col("text")).as("predicted_lang_ngram"),
          Text.qualityScore(col("text")).as("quality"),
          Text.bpeTokenCount(col("text")).as("bpe_tokens"),
          Text.rollingFingerprint(col("text")).as("rolling_fp"))
        .orderBy(col("doc_id"))
    },

    // BPE-ish subword token counts (regex pre-tokenizer shape).
    Q("doc_bpe_tokens",
      """SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_tokens
         FROM documents ORDER BY doc_id""") { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), Text.bpeTokenCount(col("text")).as("bpe_tokens"))
        .orderBy(col("doc_id"))
    },

    // ---- similarity search over embeddings ----

    // L2 norms through the native DotProduct kernel — float→double
    // promotion + in-order double accumulation matches DuckDB's list_sum
    // over a double-transformed list bit-for-bit.
    Q("emb_norms",
      """SELECT vec_id,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS norm
         FROM embeddings ORDER BY vec_id""") { (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.l2Norm(col("embedding")).as("norm"))
        .orderBy(col("vec_id"))
    },

    Q("emb_label_counts",
      """SELECT label, COUNT(*) AS n FROM embeddings
         GROUP BY label ORDER BY label""") { (s, dir) =>
      Tables(s, dir, "embeddings")
        .groupBy(col("label")).agg(count(lit(1)).as("n")).orderBy(col("label"))
    },

    // Brute-force exact top-10 cosine neighbors for the first 20 vectors.
    // Oracle-checked: the native DotProduct kernel accumulates float→double
    // products in index order, exactly like DuckDB's list_sum over the
    // double-transformed zip — doubles are bit-identical, so ranking is too.
    Q("ann_brute_topk", annExactTopkSql) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), k = 10)
        .orderBy(col("q_id"), col("rnk"))
    },

    // LSH-bucketed ANN for the same queries (recall measured in the spec;
    // 4-bit chunks because the fixture vectors are random — see spec note).
    Q.unchecked("ann_lsh_topk") { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20), k = 10, chunkBits = 4)
        .orderBy(col("q_id"), col("rnk"))
    },

    // IVF ANN: k-means-lite inverted lists + exact rerank. Registered at
    // FULL probe (nProbe = nCentroids): exhaustive IVF is exact search, so
    // the brute-force SQL oracle applies — the plan still exercises the
    // whole IVF machinery (training, assignment kernel, inverted-list
    // bucket join). The production partial-probe path (nProbe < k) is
    // approximate by design; IvfSpec measures its recall curve.
    Q("ann_ivf_topk", annExactTopkSql) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val model = graft.sim.Ivf.train(emb, nCentroids = 16, dim = 64, iters = 2)
      graft.sim.Ivf.search(emb, emb.filter(col("vec_id") < 20), model,
          k = 10, nProbe = 16)
        .orderBy(col("q_id"), col("rnk"))
    },

    // Embedding-cosine near-duplicate pairs (LSH-bucketed). The fixture
    // embeddings are i.i.d. random (max pairwise cosine ≈ 0.48), so the
    // threshold is set low enough to surface candidates; production use
    // would run ≥0.9 with coarser chunks.
    Q.unchecked("emb_dup_pairs") { (s, dir) =>
      Similarity.cosineDupPairs(Tables(s, dir, "embeddings"), threshold = 0.3,
          chunkBits = 4)
        .orderBy(col("a_id"), col("b_id"))
    },

    // ---- multimodal plumbing (deterministic fake payloads) ----

    // Binary-column metadata: byte length and logical frame count.
    Q("mm_media_stats",
      """SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
         CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) AS n_frames
         FROM documents ORDER BY media_id""") { (s, dir) =>
      Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
        .select(col("media_id"), length(col("media")).as("n_bytes"),
          ceil(length(col("media")) / lit(64.0)).cast("int").as("n_frames"))
        .orderBy(col("media_id"))
    },

    // Decode-stub features via batch-shaped mapPartitions (no SQL oracle —
    // the codec is engine-side; MultimodalSpec pins its outputs).
    Q.unchecked("mm_decoded_features") { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeFeatures(media).toDF().orderBy(col("media_id"))
    })
}
