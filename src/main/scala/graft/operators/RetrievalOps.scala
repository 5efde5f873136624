package graft.operators

import graft.operators.Lineage.LineageOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Lexical retrieval over the documents table (round 15, wave 4):
  * integer-exact BM25 scoring and reciprocal-rank fusion of
  * heterogeneous rankers — the keyword half of a hybrid
  * (lexical + vector) search stack, and the scoring pass a curation
  * pipeline runs to mine topic-targeted training slices from a raw
  * corpus ("find the k best documents for each seed query").
  *
  * Arithmetic discipline (SURVEY §7.4): every score is integer. BM25's
  * two float knobs are cleared to integer ratios — k1 = 1.2 and
  * b = 0.75 multiply through as small rationals, and the average
  * document length enters as the q8 fixed-point scalar
  * `A = (256·L) div N` so no product ever scales with corpus token
  * count L (see [[bm25TopK]]). The idf keeps Robertson's odds
  * `(N − df + ½)/(df + ½)` WITHOUT the log — `ln` on doubles differs in
  * the last ulp across libm implementations (the
  * [[TextOps.tfIdfTopTerms]] precedent), and the odds are strictly
  * decreasing in df, so per-term ranking is preserved; the documented
  * deviation is that multi-term sums weight rare terms more steeply
  * than log-idf BM25. A `min(·, 10⁹ ppm)` saturation bounds the
  * rare-term boost so idf·tf products stay far inside int64 at any
  * corpus size (Lucene similarly bounds idf in float32).
  */
object RetrievalOps {

  /** Deterministic per-(doc, word) term frequencies + per-doc length. */
  private def tfDl(documents: DataFrame): (DataFrame, DataFrame) = {
    val tf = documents
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).cast(LongType).as("tf"))
    val dl = documents
      .select(col("doc_id"),
        size(TextOps.words(col("text"))).cast(LongType).as("dl"))
    (tf, dl)
  }

  /** BM25 top-k documents per literal keyword query.
    *
    * Integer formulation (k1 = 1.2, b = 0.75, avgdl = L/N):
    * {{{
    *   A            = (256·L) div N                       // q8 avgdl
    *   tf_sat_ppm   = 10⁶·22·A·tf div (10·A·tf + 3·A + 2304·dl)
    *   idf_ppm      = min(10⁹, 10⁶·(2N − 2df + 1) div (2df + 1))
    *   term_score   = idf_ppm·tf_sat_ppm div 10⁶          // ppm units
    *   score_ppm    = Σ term_score over query terms present in the doc
    * }}}
    * `tf_sat_ppm` is BM25's saturating tf exactly (both sides of the
    * fraction multiplied by 10·A; the only quantization is avgdl at
    * 1/256 resolution), so magnitudes are bounded by DOCUMENT length,
    * never corpus size: 10⁶·22·A·tf ≤ 10⁶·22·(256·maxdl)·maxdl ≈ 6·10¹⁷
    * at maxdl = 10⁴ « Long.MaxValue — safe at 100 TB.
    *
    * Scale shape: df and (N, L, A) are corpus statistics from
    * map-side-combined rollups; the query-term table broadcasts (a
    * handful of literal rows); scoring is one word-keyed join of the tf
    * relation against the broadcast terms — document bodies never
    * shuffle; the final top-k is a per-query window over matched rows
    * only.
    */
  def bm25TopK(documents: DataFrame,
               queries: Seq[(String, Seq[String])], k: Int): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25TopK needs at least one query with at least one term")
    val spark = documents.sparkSession
    import spark.implicits._
    val (tf, dl) = tfDl(documents)
    val tfT = tf.lineageTruncate() // 2 consumers: df rollup + scoring join
    val df = tfT.groupBy("word")
      .agg(count(lit(1)).cast(LongType).as("df"))
    val scalars = dl.agg(
      count(lit(1)).cast(LongType).as("n_docs"),
      sum(col("dl")).cast(LongType).as("l_total"))
      .withColumn("avgdl_q8", expr("l_total * 256L div n_docs"))
    val terms = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("query_id", "word")
    val matched = tfT
      .join(broadcast(terms), Seq("word"))
      .join(broadcast(df), Seq("word"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(scalars))
    bm25ScoreRank(matched, k)
  }

  /** The BM25 scoring + ranking tail, defined ONCE so the in-plan
    * ([[bm25TopK]]) and artifact-serving ([[bm25TopKFromIndex]]) paths
    * cannot drift. Input needs columns (query_id, doc_id, tf, dl, df,
    * n_docs, avgdl_q8).
    */
  private def bm25ScoreRank(matched: DataFrame, k: Int): DataFrame = {
    val scored = matched
      .withColumn("tf_sat_ppm",
        expr("1000000L * 22L * avgdl_q8 * tf div " +
          "(10L * avgdl_q8 * tf + 3L * avgdl_q8 + 2304L * dl)"))
      .withColumn("idf_ppm",
        expr("least(1000000000L, " +
          "1000000L * (2L * n_docs - 2L * df + 1L) div (2L * df + 1L))"))
      .withColumn("term_score", expr("idf_ppm * tf_sat_ppm div 1000000L"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("term_score")).cast(LongType).as("score_ppm"),
        count(lit(1)).cast(LongType).as("n_terms"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score_ppm"), asc("doc_id"))
    scored
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select("query_id", "rn", "doc_id", "score_ppm", "n_terms")
      .orderBy("query_id", "rn")
  }

  /** Write the PERSISTED lexical index (round 15, wave 4) — the
    * [[SimilarityOps.ivfPqWriteCodes]]-discipline artifact for keyword
    * search:
    *
    *  - `$outDir/postings` — (word, doc_id, tf, dl): the inverted index
    *    with the length norm DENORMALIZED into each posting (the
    *    classic norms channel — one extra long per row buys the scorer
    *    a join-free scan). WORD-CLUSTERED layout: range-partitioned +
    *    sorted on word with an EXPLICIT partition count (AQE would
    *    coalesce the tiny test-scale shuffle into one file whose
    *    min/max covers the whole vocabulary, killing row-group
    *    pruning), so a `word IN (query terms)` filter prunes file and
    *    row-group stats and a search reads ~|terms|/|vocab| of the
    *    bytes.
    *  - `$outDir/df` — (word, df): the document-frequency table,
    *    range-partitioned on word like the postings channel (a web
    *    vocabulary is 10⁸–10⁹ rows — never a single-task write;
    *    VERDICT r17 #3).
    *  - `$outDir/dl` — (doc_id, dl): the per-doc length table. The
    *    channel takedown arithmetic subtracts (N, L) from — a document
    *    with no postings rows (zero tokens under a stricter tokenizer)
    *    still has a dl row, so deleting it decrements n_docs correctly
    *    (r17 ADVICE).
    *  - `$outDir/scalars` — one row (n_docs, l_total, avgdl_q8).
    *
    * Memoized on the source-directory fingerprint + outDir (the codes
    * writer's key discipline): corpus mutation forces a rebuild, a
    * same-corpus re-run is free.
    */
  def bm25WriteIndex(documents: DataFrame, srcDir: String,
                     outDir: String, rangeParts: Int = 32): Boolean = {
    graft.sources.StorageOps.materializeCached(documents.sparkSession,
      s"bm25_index:$outDir:$rangeParts:dl", srcDir, outDir) {
      val (tf, dl) = tfDl(documents)
      val tfT = tf.lineageTruncate() // 2 consumers: postings + df
      val dlT = dl.lineageTruncate() // 3 consumers: postings + dl +
                                     // scalars
      tfT.join(dlT, Seq("doc_id"))
        .select("word", "doc_id", "tf", "dl")
        .repartitionByRange(rangeParts, col("word"))
        .sortWithinPartitions("word", "doc_id")
        .write.mode("overwrite").parquet(s"$outDir/postings")
      tfT.groupBy("word").agg(count(lit(1)).cast(LongType).as("df"))
        .repartitionByRange(rangeParts, col("word"))
        .sortWithinPartitions("word")
        .write.mode("overwrite").parquet(s"$outDir/df")
      dlT.repartitionByRange(rangeParts, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(s"$outDir/dl")
      dlT.agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(col("dl")).cast(LongType).as("l_total"))
        .withColumn("avgdl_q8", expr("l_total * 256L div n_docs"))
        .write.mode("overwrite").parquet(s"$outDir/scalars")
    }
    true
  }

  /** BM25 search from the PERSISTED index alone — the fleet path: a
    * worker session with no memo state reads the three artifacts and
    * serves the query batch. The query terms reach the postings scan as
    * a pushed `word IN (…)` filter against the word-clustered layout
    * (RetrievalOpsSpec pins the pushed filter and the scan-row
    * reduction), so at 100 TB a search touches the matched posting
    * lists, not the corpus: this is an indexed lookup, not a
    * late-filtered full scan. df rows for the terms and the one-row
    * scalar table broadcast; scoring is the shared [[bm25ScoreRank]]
    * tail — fresh ≡ stored is the declared key's oracle identity.
    */
  def bm25TopKFromIndex(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String,
                        queries: Seq[(String, Seq[String])],
                        k: Int): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25TopKFromIndex needs at least one query with at least one term")
    import spark.implicits._
    val termList = queries.flatMap(_._2).distinct
      .map(_.asInstanceOf[Any])
    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("word").isin(termList: _*))
    val dfRel = spark.read.parquet(s"$indexDir/df")
      .filter(col("word").isin(termList: _*))
    val scalars = spark.read.parquet(s"$indexDir/scalars")
    val terms = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("query_id", "word")
    val matched = postings
      .join(broadcast(terms), Seq("word"))
      .join(broadcast(dfRel), Seq("word"))
      .crossJoin(broadcast(scalars))
    bm25ScoreRank(matched, k)
  }

  /** Build-if-needed + serve: the declared-key entry point for the
    * stored lexical search (the [[SimilarityOps.ivfPqTopKStored]]
    * shape). Same parameters as [[bm25TopK]] ⇒ the SAME oracle —
    * hash-equality against it IS the stored-vs-fresh parity contract.
    */
  def bm25TopKStored(documents: DataFrame, srcDir: String, outDir: String,
                     queries: Seq[(String, Seq[String])],
                     k: Int): DataFrame = {
    bm25WriteIndex(documents, srcDir, outDir)
    bm25TopKFromIndex(documents.sparkSession, outDir, queries, k)
  }

  /** INCREMENTAL POSTINGS UPSERT (round 16) — the codesUpsert/
    * pack_shards_upsert economics applied to the lexical index: a batch
    * of NEW documents is tokenized ONCE (batch-only [[tfDl]]) and the
    * stored index serves the merged corpus without ever re-reading the
    * base postings beyond the query terms —
    *
    *  - postings: the term-pushed stored scan UNION the batch-only
    *    posting rows (ids disjoint, so union IS the merged tf relation);
    *  - df: stored ⊕ batch per-word counts (full-outer coalesced sum);
    *  - scalars: stored (N, L) plus the batch delta — BM25's global
    *    statistics update by pure ADDITION, which is what makes the
    *    lexical index append-friendly where the ANN index needed frozen
    *    codebooks. Scores of OLD documents shift correctly under the
    *    new N/avgdl/df — no stale-idf approximation.
    *
    * APPEND-ONLY by contract: a batch doc_id already in the base would
    * double-count its tf, so a clash fails loudly (the
    * pack_shards_upsert interleaving-refusal discipline). Oracle = the
    * from-scratch [[bm25TopK]] chain over the merged corpus — exact,
    * because disjoint-id union commutes with every rollup above.
    *
    * Scale shape: batch-only explode + the usual broadcast-small
    * df/scalars/terms; the stored postings contribute a pushed
    * `word IN (terms)` scan exactly as [[bm25TopKFromIndex]].
    */
  def bm25TopKUpserted(base: DataFrame, batch: DataFrame, srcDir: String,
                       outDir: String,
                       queries: Seq[(String, Seq[String])],
                       k: Int): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25TopKUpserted needs at least one query with at least one term")
    bm25WriteIndex(base, srcDir, outDir)
    val spark = base.sparkSession
    import spark.implicits._
    val clash = batch.select("doc_id")
      .join(base.select("doc_id"), Seq("doc_id"), "left_semi")
      .limit(1).count()
    require(clash == 0L,
      "bm25TopKUpserted is append-only: batch doc_ids must be NEW " +
        "(a re-crawled id would double-count its term frequencies — " +
        "delete-then-append or rebuild instead)")
    val termList = queries.flatMap(_._2).distinct.map(_.asInstanceOf[Any])
    val (btf, bdl) = tfDl(batch)
    val btfT = btf.lineageTruncate() // 2 consumers: df delta + postings
    val bdlT = bdl.lineageTruncate() // 2 consumers: postings + scalars
    val postings = spark.read.parquet(s"$outDir/postings")
      .filter(col("word").isin(termList: _*))
      .unionByName(btfT.join(bdlT, Seq("doc_id"))
        .select("word", "doc_id", "tf", "dl")
        .filter(col("word").isin(termList: _*)))
    val dfRel = spark.read.parquet(s"$outDir/df")
      .filter(col("word").isin(termList: _*))
      .join(btfT.groupBy("word")
        .agg(count(lit(1)).cast(LongType).as("df_b"))
        .filter(col("word").isin(termList: _*)),
        Seq("word"), "full_outer")
      .select(col("word"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("df_b"), lit(0L)))
          .as("df"))
    val scalars = spark.read.parquet(s"$outDir/scalars")
      .crossJoin(bdlT.agg(
        count(lit(1)).cast(LongType).as("n_b"),
        coalesce(sum(col("dl")), lit(0L)).cast(LongType).as("l_b")))
      // additive stat updates are int64-safe: n_docs wraps past 9.2·10¹⁸
      // documents and l_total past 9.2·10¹⁸ corpus tokens (≥10⁵× beyond
      // the 100 TB target); l_total*256 in avgdl_q8 is the binding term
      // and still allows 3.6·10¹⁶ tokens ≈ 100 PB of text (r17 audit)
      .select((col("n_docs") + col("n_b")).as("n_docs"),
        (col("l_total") + col("l_b")).as("l_total"))
      .withColumn("avgdl_q8", expr("l_total * 256L div n_docs"))
    val terms = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("query_id", "word")
    val matched = postings
      .join(broadcast(terms), Seq("word"))
      .join(broadcast(dfRel), Seq("word"))
      .crossJoin(broadcast(scalars))
    bm25ScoreRank(matched, k)
  }

  /** POSTINGS COMPACTION / TAKEDOWN (round 17, VERDICT r16 #3) — the
    * step that completes the lexical index's lifecycle symmetry with
    * the ANN artifact (build → serve → upsert → COMPACT):
    * [[bm25TopKUpserted]] can only APPEND; real corpora also take
    * documents DOWN (the q_card_diff takedown signal). One compaction
    * writes the next ARTIFACT GENERATION at `outDir` from the stored
    * generation at `baseDir` plus a maintenance batch — `deletes`
    * (doc_ids leaving the corpus) and `batch` (new documents arriving,
    * may be empty) — by PURE index arithmetic:
    *
    *  - postings: stored rows anti-joined against the takedown keys,
    *    union the batch-only rows (tokenized ONCE), rewritten
    *    word-clustered exactly as [[bm25WriteIndex]] so row-group
    *    pruning survives the generation swap;
    *  - df: stored minus the deleted docs' per-word counts plus the
    *    batch's — df shifts DOWN by subtraction, no corpus re-scan;
    *  - dl: stored per-doc lengths anti-joined against the takedown
    *    keys, union the batch's — the next generation keeps its own
    *    subtraction channel;
    *  - scalars: (N, L) minus the deleted docs' counts/lengths read
    *    from the stored per-doc dl TABLE (not the deleted postings
    *    rows — a zero-token document has a dl row but no postings, so
    *    postings-derived deltas would silently miss it; r17 ADVICE)
    *    plus the batch's — BM25's global statistics update by pure
    *    addition/subtraction, so surviving documents score correctly
    *    under the post-takedown N/avgdl/df with the base corpus NEVER
    *    re-tokenized.
    *
    * Contract guards (the [[bm25TopKUpserted]] clash discipline):
    * batch ids must be NEW (an id already in the base would
    * double-count tf) and disjoint from `deletes` (delete+re-add is
    * two maintenance cycles, the knnGraphUpserted rule). Memoized on
    * the source fingerprint + `batchKey` (the caller's identity for
    * this batch/takedown set — the ivfPqCompactWrite discipline).
    *
    * Scale shape: one stored-postings scan (the rewrite is unavoidable
    * and IS the compaction), the takedown keys as a distributed
    * semi/anti join side (never an `isin` literal — a 100 TB takedown
    * list is itself a table), batch-only tokenization, and three
    * broadcast-sized stat rollups.
    */
  def bm25CompactWrite(base: DataFrame, batch: DataFrame,
                       deletes: DataFrame, srcDir: String, baseDir: String,
                       outDir: String, batchKey: String,
                       rangeParts: Int = 32): Boolean = {
    bm25WriteIndex(base, srcDir, baseDir)
    val spark = base.sparkSession
    val delKeys = deletes.select("doc_id").distinct()
    val reAdd = batch.select("doc_id")
      .join(delKeys, Seq("doc_id"), "left_semi").limit(1).count()
    require(reAdd == 0L,
      "bm25CompactWrite: batch doc_ids and deletes must be disjoint — " +
        "a delete+re-add is two maintenance cycles, not one")
    val clash = batch.select("doc_id")
      .join(base.select("doc_id"), Seq("doc_id"), "left_semi")
      .limit(1).count()
    require(clash == 0L,
      "bm25CompactWrite: batch doc_ids must be NEW (an id already in " +
        "the base would double-count its term frequencies — take it " +
        "down first, then append the re-crawl)")
    graft.sources.StorageOps.materializeCached(spark,
      s"bm25_compact:$outDir:$batchKey:$rangeParts:dl", srcDir, outDir) {
      val storedP = spark.read.parquet(s"$baseDir/postings")
      val storedDl = spark.read.parquet(s"$baseDir/dl")
        .lineageTruncate() // 2 consumers: scalar delta + next-gen dl
      val delT = delKeys.lineageTruncate() // 4 consumers below
      // the deleted docs' stored POSTINGS rows carry the per-word df
      // deltas; their stored DL rows carry the (N, L) deltas — the dl
      // channel also covers docs with no postings at all
      val delP = storedP.join(delT, Seq("doc_id"), "left_semi")
      val (btf, bdl) = tfDl(batch)
      val btfT = btf.lineageTruncate() // 2 consumers: postings + df
      val bdlT = bdl.lineageTruncate() // 3 consumers: postings + dl +
                                       // scalars
      storedP.join(delT, Seq("doc_id"), "left_anti")
        .unionByName(btfT.join(bdlT, Seq("doc_id"))
          .select("word", "doc_id", "tf", "dl"))
        .repartitionByRange(rangeParts, col("word"))
        .sortWithinPartitions("word", "doc_id")
        .write.mode("overwrite").parquet(s"$outDir/postings")
      val dfDel = delP.groupBy("word")
        .agg(count(lit(1)).cast(LongType).as("df_d"))
      val dfAdd = btfT.groupBy("word")
        .agg(count(lit(1)).cast(LongType).as("df_a"))
      spark.read.parquet(s"$baseDir/df")
        .join(dfDel, Seq("word"), "left_outer")
        .select(col("word"),
          (col("df") - coalesce(col("df_d"), lit(0L))).as("df"))
        .join(dfAdd, Seq("word"), "full_outer")
        .select(col("word"),
          (coalesce(col("df"), lit(0L)) + coalesce(col("df_a"), lit(0L)))
            .as("df"))
        .filter(col("df") > 0L)
        .repartitionByRange(rangeParts, col("word"))
        .sortWithinPartitions("word")
        .write.mode("overwrite").parquet(s"$outDir/df")
      storedDl.join(delT, Seq("doc_id"), "left_anti")
        .unionByName(bdlT)
        .repartitionByRange(rangeParts, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(s"$outDir/dl")
      // (N, L) deltas from the stored dl table: one row per deleted doc
      // WHETHER OR NOT it had postings; subtraction then addition keeps
      // the scalars exact
      val delDl = storedDl.join(delT, Seq("doc_id"), "left_semi")
      spark.read.parquet(s"$baseDir/scalars")
        .crossJoin(delDl.agg(
          count(lit(1)).cast(LongType).as("n_d"),
          coalesce(sum(col("dl")), lit(0L)).cast(LongType).as("l_d")))
        .crossJoin(bdlT.agg(
          count(lit(1)).cast(LongType).as("n_a"),
          coalesce(sum(col("dl")), lit(0L)).cast(LongType).as("l_a")))
        .select((col("n_docs") - col("n_d") + col("n_a")).as("n_docs"),
          (col("l_total") - col("l_d") + col("l_a")).as("l_total"))
        .withColumn("avgdl_q8", expr("l_total * 256L div n_docs"))
        .write.mode("overwrite").parquet(s"$outDir/scalars")
    }
    true
  }

  /** Compact-then-serve: the declared-key entry point for the
    * post-takedown lexical search. The served relation is EXACTLY the
    * from-scratch [[bm25TopK]] over (base ∖ deletes) ∪ batch — disjoint
    * membership algebra commutes with every rollup above — so the
    * from-scratch oracle over the surviving corpus IS the identity
    * contract (the [[bm25TopKStored]] pattern).
    */
  def bm25TopKCompacted(base: DataFrame, batch: DataFrame,
                        deletes: DataFrame, srcDir: String,
                        baseDir: String, outDir: String, batchKey: String,
                        queries: Seq[(String, Seq[String])],
                        k: Int): DataFrame = {
    bm25CompactWrite(base, batch, deletes, srcDir, baseDir, outDir,
      batchKey)
    bm25TopKFromIndex(base.sparkSession, outDir, queries, k)
  }

  /** Per-probe tf·idf-dot ranking: neighbors of each probe document by
    * the integer dot product of `tf·(10⁶ div df)` weight vectors (the
    * [[DedupOps.tfidfCosinePairs]] weight grid), self excluded, top
    * `k` by (dot desc, doc_id). The LEXICAL ranker of [[hybridRrfTopK]].
    */
  def tfidfDotRanks(documents: DataFrame, probeMod: Int,
                    k: Int): DataFrame = {
    val (tf, _) = tfDl(documents)
    val df = tf.groupBy("word").agg(count(lit(1)).cast(LongType).as("df"))
    val wt = tf.join(broadcast(df), Seq("word"))
      .withColumn("w", expr("tf * (1000000L div df)"))
      .select("doc_id", "word", "w")
      .lineageTruncate() // 2 consumers: probe slice + candidate side
    val probes = wt.filter(pmod(col("doc_id"), lit(probeMod)) === 0)
      .select(col("doc_id").as("q_id"), col("word"), col("w").as("qw"))
    val dots = wt.join(probes, Seq("word"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id")
      .agg(sum(col("w") * col("qw")).cast(LongType).as("dot_s"))
    val w = Window.partitionBy("q_id").orderBy(desc("dot_s"), asc("doc_id"))
    dots.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("q_id", "doc_id", "rank")
  }

  /** Per-probe 3-gram Jaccard ranking: neighbors by
    * `|A∩B|·10⁶ div |A∪B|` over DISTINCT word trigrams, self excluded,
    * top `k` by (jaccard desc, doc_id). The SURFACE-OVERLAP ranker of
    * [[hybridRrfTopK]] — near-verbatim copies rank high here even when
    * their word-frequency profiles diverge.
    */
  def ngramJaccardRanks(documents: DataFrame, probeMod: Int, n: Int,
                        k: Int): DataFrame = {
    val grams = documents
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), explode(TextOps.wordNgrams(col("ws"), n))
        .as("gram"))
      .distinct()
      .lineageTruncate() // 3 consumers: sizes + probe slice + join
    val sizes = grams.groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("sz"))
    val probes = grams.filter(pmod(col("doc_id"), lit(probeMod)) === 0)
      .select(col("doc_id").as("q_id"), col("gram"))
    val common = grams.join(probes, Seq("gram"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).cast(LongType).as("common"))
    val jac = common
      .join(sizes.select(col("doc_id").as("q_id"), col("sz").as("q_sz")),
        Seq("q_id"))
      .join(sizes, Seq("doc_id"))
      .withColumn("jac_ppm",
        expr("common * 1000000L div (q_sz + sz - common)"))
    val w = Window.partitionBy("q_id").orderBy(desc("jac_ppm"), asc("doc_id"))
    jac.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("q_id", "doc_id", "rank")
  }

  /** RECIPROCAL-RANK FUSION (Cormack et al.): fuse ranker outputs
    * `(q_id, doc_id, rank)` by `Σ 10⁶ div (c + rank)` (integer; a
    * document absent from a ranker's top list contributes 0), emit the
    * fused top `topK` per probe. `c = 60` is the published constant.
    *
    * Scale shape: inputs are already rank-truncated (|probes|·k rows
    * each) — the fusion is a union + one (q_id, doc_id) rollup + a
    * per-probe window; negligible next to the rankers themselves.
    */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contrib = rankings
      .map(_.select(col("q_id"), col("doc_id"),
        expr(s"1000000L div (${c}L + rank)").as("contrib")))
      .reduce(_ unionByName _)
    val fused = contrib
      .groupBy("q_id", "doc_id")
      .agg(sum(col("contrib")).cast(LongType).as("rrf_ppm"),
        count(lit(1)).cast(LongType).as("n_rankers"))
    val w = Window.partitionBy("q_id").orderBy(desc("rrf_ppm"), asc("doc_id"))
    fused.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= topK)
      .select("q_id", "rn", "doc_id", "rrf_ppm", "n_rankers")
      .orderBy("q_id", "rn")
  }

  /** HYBRID RETRIEVAL: tf·idf-dot and 3-gram-Jaccard rankings of each
    * probe document's neighbors, fused by reciprocal rank — the
    * standard two-retriever hybrid shape (in production the second
    * ranker is the ANN top-k; here both rankers are oracle-replayable
    * so the FUSION arithmetic itself is hash-checked, and the ANN
    * variant composes from the same [[rrfFuse]]).
    */
  def hybridRrfTopK(documents: DataFrame, probeMod: Int, kPerRanker: Int,
                    topK: Int): DataFrame =
    rrfFuse(Seq(
      tfidfDotRanks(documents, probeMod, kPerRanker),
      ngramJaccardRanks(documents, probeMod, n = 3, k = kPerRanker)), topK)
}
