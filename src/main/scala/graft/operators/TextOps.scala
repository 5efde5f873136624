package graft.operators

import graft.operators.Lineage.LineageOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for the `documents` table (SURVEY.md §2 K L4;
  * the training-data-pipeline extensions mandated by BASELINE.json).
  *
  * Everything is native expressions over `split`/`explode`/aggregation —
  * fully distributed, no driver materialization, no UDFs. At 100 TB the
  * word-level explode is the classic inverted-index build: it shuffles on
  * the grouping keys once and map-side-combines first.
  */
object TextOps {

  /** Tokenize on single spaces (the documents corpus is space-joined). */
  def words(c: Column): Column = split(c, " ")

  /** The engine's BPE-ish tokenizer regex: alpha runs + digit runs +
    * single non-space symbols. ONE definition — per-doc accounting
    * ([[tokenCounts]]), sequence packing, the budget planner
    * ([[mixtureEpochs]]) and the dedup ROI table
    * ([[graft.operators.DedupOps.dedupTokensSaved]]) must count
    * identically or the planners silently disagree with the
    * accounting; the DuckDB oracles embed this same literal.
    */
  val TokenRegex = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  /** Token count of a text column under [[TokenRegex]] (LongType;
    * NULL text yields NULL — callers choose their own degenerate-input
    * stance).
    */
  def tokenCountCol(c: Column): Column =
    size(regexp_extract_all(c, lit(TokenRegex), lit(0))).cast("long")

  /** Canonicalize a URL for dedup: lowercase, strip scheme and
    * leading `www.`, drop the query string / fragment, drop a trailing
    * slash. These are the variations crawlers record for the SAME page
    * (`HTTP://`, tracking params, `#anchors`); everything else — path
    * case on case-sensitive servers aside, which lowering accepts as a
    * dedup-biased tradeoff — identifies distinct content. All four
    * rewrites are anchored/greedy-tail regexes (RE2-safe: no
    * lookaround, replayable by any engine).
    */
  def canonicalizeUrl(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(c), "^[a-z]+://", ""),
          "^www\\.", ""),
        "[?#].*$", ""),
      "/$", "")

  /** URL-level dedup of a (doc_id, url) frame: group on the canonical
    * form, keep the minimum doc id — the crawl-frontier dedup that runs
    * BEFORE any content is fetched or tokenized, which is what makes it
    * the cheapest dedup tier at 100 TB (16-byte canonical hashes
    * shuffle; page bodies never do). Same keep-min contract as
    * [[DedupOps.exactDedup]] one tier up.
    */
  def urlDedup(urls: DataFrame): DataFrame =
    urls
      .groupBy(canonicalizeUrl(col("url")).as("canonical_url"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("dup_cnt"))
      .orderBy("keep_doc_id")

  /** Splice-overlap detection: document pairs where one document's
    * LAST k tokens equal another's FIRST k — the boundary signature of
    * split/continued/stitched pages (a chunked crawl re-emitting one
    * article as consecutive "documents", or shingled training leakage
    * across record boundaries). Jaccard-style dedup misses these: the
    * bodies can be entirely disjoint while the seam is exact.
    *
    * One equi-join on the k-gram seam string — tails and heads are one
    * row per document, so the join is |docs| vs |docs| on a selective
    * key, never all-pairs; at 100 TB the seam table is the only thing
    * shuffled (k tokens per doc, not bodies).
    */
  def spliceOverlaps(documents: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val ws = words(col("text"))
    val base = documents
      .filter(size(ws) >= k)
      .select(col("doc_id"), ws.as("ws"))
    val heads = base.select(col("doc_id").as("head_doc"),
      concat_ws(" ", slice(col("ws"), 1, k)).as("gram"))
    val tails = base.select(col("doc_id").as("tail_doc"),
      concat_ws(" ", slice(col("ws"), -k, k)).as("gram"))
    tails.join(heads, Seq("gram"))
      .filter(col("tail_doc") =!= col("head_doc"))
      .select(col("tail_doc"), col("head_doc"), col("gram"))
      .orderBy("tail_doc", "head_doc")
  }

  /** LENGTH-BUCKETED batching stats: documents grouped into token-count
    * buckets (floor(n_tokens / width), capped), with the padding-waste
    * accounting a training-batch packer optimizes — batching by length
    * bucket pads every member to its bucket's max, so
    * `waste = Σ(bucket_max − n_tokens)` and its ppm share is THE
    * metric that justifies the bucketing (vs. padding everything to
    * the global max). Pure integer arithmetic; one map-side-combined
    * rollup over |buckets| keys.
    */
  def lengthBuckets(documents: DataFrame, bucketWidth: Int,
                    maxBucket: Int): DataFrame = {
    require(bucketWidth >= 1 && maxBucket >= 1)
    documents
      .select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .groupBy(least(expr(s"n_tokens div $bucketWidth"),
        lit(maxBucket.toLong)).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .select(col("bucket"), col("n_docs"), col("total_tokens"),
        col("max_tokens"),
        (col("max_tokens") * col("n_docs") - col("total_tokens"))
          .as("padding_tokens"),
        expr("(max_tokens * n_docs - total_tokens) * 1000000L " +
          "div (max_tokens * n_docs)").as("waste_ppm"))
      .orderBy("bucket")
  }

  /** Lexical-rarity score: global corpus frequency ranks (1 = most
    * frequent), then each document's mean token rank in ppm — a
    * perplexity PROXY that needs no language model and no logarithm
    * (libm would break cross-engine hashing): text built from rare
    * words scores high, boilerplate built from the corpus head scores
    * low. The quality-signal sibling of [[oovRate]] with a graded
    * rather than binary vocabulary notion.
    *
    * Scale shape: the rank window runs over the VOCABULARY-sized
    * frequency table (single partition by design — bounded like the
    * tf-idf rank pass), which then broadcasts back into the token
    * stream; per-doc rollup is map-side-combined. Mean = integer
    * Σrank·10⁶ div n — exact.
    */
  def rarityScores(documents: DataFrame,
                   broadcastVocab: Boolean = true): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(words(col("text"))).as("word"))
    val freq = toks.groupBy("word").agg(count(lit(1)).as("freq"))
    val rank = freq.withColumn("rank",
      dense_rank().over(Window.orderBy(desc("freq"), col("word")))
        .cast("long"))
    val rankRel = rank.select(col("word"), col("rank"))
    // vocabulary broadcast is a PARAMETER (tfIdfTopTerms r10 discipline)
    toks.join(if (broadcastVocab) broadcast(rankRel) else rankRel,
        Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("rank")).as("rank_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("rank_sum * 1000000L div n_tokens").as("mean_rank_ppm"))
      .orderBy("doc_id")
  }

  /** Word n-gram shingles of a token-array column: the windowed-slice
    * expression shared by repetition stats, decontamination, and n-gram
    * Jaccard (one definition — three consumers). Caller guards
    * `size(ws) >= n` (Spark `sequence` DESCENDS when the bound is
    * negative).
    */
  def wordNgrams(ws: Column, n: Int): Column =
    transform(sequence(lit(0), size(ws) - n),
      i => concat_ws(" ", slice(ws, i + 1, lit(n))))

  /** L4 — per-document n-gram novelty: the share of each doc's DISTINCT
    * n-grams never seen in any EARLIER document (doc_id = arrival
    * order). The data-freshness curve of a growing corpus: a healthy
    * crawl keeps contributing new n-grams; a feed that trends toward
    * zero novelty is re-serving near-dups or boilerplate and can be cut
    * before tokenization. Complements dedup (which asks "is this doc a
    * copy?") by pricing MARGINAL contribution ("what fraction of it is
    * new at all?").
    *
    * Scale shape: explode to distinct (doc, gram) once, a gram-keyed
    * min(doc_id) rollup (the first-occurrence table, vocabulary-bounded
    * like every df table here), then one equi-join back on gram — two
    * bounded shuffles keyed by n-gram, document bodies never move.
    * Pure integer output (ppm by truncating division).
    */
  def ngramNovelty(documents: DataFrame, n: Int): DataFrame = {
    val ws = words(col("text"))
    val grams = documents
      .filter(size(ws) >= n)
      .select(col("doc_id"), explode(wordNgrams(ws, n)).as("gram"))
    // Never join the pair set back on gram: a doc's novel count IS the
    // number of grams whose first occurrence is that doc, so it reads
    // straight off the first-occurrence table (groupBy first_doc). No
    // standalone distinct() either — min(doc_id) is duplicate-idempotent
    // (the max-rho argument), and the per-doc side is count_distinct's
    // partial-aggregated form. Both aggregates map-side-combine — a
    // gram appearing in EVERY doc (the boilerplate-skew case) collapses
    // per map task instead of landing on one reducer, and the only join
    // is between two |docs|-sized count frames. A/B'd isolated at sf0.1
    // min-of-3: this 1.9 s (a wash with the explicit-distinct double
    // pass, 1.84 s) vs window-over-gram 2.0 s vs groupBy+join-back
    // 2.5 s (localCheckpoint helped neither form: 2.48-2.65 s).
    val perDoc = grams.groupBy("doc_id")
      .agg(count_distinct(col("gram")).as("n_grams"))
    val novel = grams.groupBy("gram").agg(min("doc_id").as("first_doc"))
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        expr("coalesce(n_novel, 0L) * 1000000L div n_grams").as("novel_ppm"))
      .orderBy("doc_id")
  }

  /** L4 — per-SOURCE n-gram novelty: [[ngramNovelty]]'s feed-level
    * rollup. Each distinct gram credits the source of its globally
    * FIRST document; novel_ppm = first-contributions per distinct
    * gram-occurrence. The feed-health pair with per-source dup rates:
    * dup-rate says which feed re-serves copies, this says which feed
    * still contributes CONTENT nobody else has — the keep-crawling
    * signal.
    *
    * Scale shape: same two map-side-combined aggregates as
    * [[ngramNovelty]] (occurrences per source; min(doc_id) per gram,
    * duplicate-idempotent so no distinct pass), plus one vocab-sized ⋈
    * |docs|-sized equi-join on doc_id to resolve the first doc's
    * source. Sources are few — the output and both join sides after
    * aggregation are tiny; bodies never move.
    */
  def noveltyBySource(documents: DataFrame, n: Int): DataFrame = {
    val ws = words(col("text"))
    val pairs = documents
      .filter(size(ws) >= n)
      .select(col("doc_id"), col("source"), explode(wordNgrams(ws, n)).as("gram"))
    val occ = pairs.dropDuplicates("doc_id", "gram")
      .groupBy("source").agg(count(lit(1)).as("n_occ"))
    val firstDoc = pairs.groupBy("gram").agg(min("doc_id").as("doc_id"))
    val firsts = firstDoc
      .join(documents.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source").agg(count(lit(1)).as("n_first"))
    occ.join(firsts, Seq("source"), "left")
      .select(col("source"), col("n_occ"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        expr("coalesce(n_first, 0L) * 1000000L div n_occ").as("novel_ppm"))
      .orderBy("source")
  }

  /** L4 — per-(lang, word) counts over the whole corpus. */
  def wordCounts(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), explode(words(col("text"))).as("word"))
      .groupBy("lang", "word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "word")

  /** Per-(doc, word) term frequencies. */
  def termFrequencies(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))

  /** L4 — top-N terms per document by a deterministic tf-idf-style score.
    *
    * Classic tf·idf multiplies by `ln(N/df)`; `ln` on doubles differs in
    * the last ulp across libm implementations, which breaks hash-exact
    * oracle comparison. Since `ln(N/df)` is strictly decreasing in `df`,
    * ranking by the integer score `tf * 1_000_000 div df` preserves the
    * tf/df trade-off with fully exact arithmetic (documented deviation;
    * same top-N ordering philosophy).
    */
  def tfIdfTopTerms(documents: DataFrame, topN: Int,
                    broadcastVocab: Boolean = true): DataFrame = {
    val tf = termFrequencies(documents)
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    // df is vocabulary-bounded (distinct words), orders of magnitude
    // smaller than the tf relation — broadcast is the right default.
    // When the vocabulary itself stops fitting executor memory the
    // caller passes broadcastVocab = false and this becomes a shuffle
    // join on word — a PARAMETER, not a comment to edit (VERDICT r9
    // hygiene note); both plans agree bit-for-bit (spec-pinned).
    val vocab = if (broadcastVocab) broadcast(df) else df
    val scored = tf.join(vocab, Seq("word"))
      .withColumn("score_ppm", expr("tf * 1000000L div df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("score_ppm"), desc("tf"), asc("word"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select("doc_id", "rn", "word", "tf", "df", "score_ppm")
      .orderBy("doc_id", "rn")
  }

  /** Stopword count of a token-array column — THE counting expression
    * behind the stopword-share quality score, defined once so
    * [[textQuality]] (which emits the score) and [[qualityLangBias]]
    * (which buckets it) cannot drift apart.
    */
  def stopCount(ws: Column, stopwords: Seq[String]): Column =
    size(filter(ws,
      w => w.isin(stopwords.map(_.asInstanceOf[Any]): _*))).cast("long")

  /** L4 — quality scoring: word count, mean word length, stopword ratio —
    * all in exact integer arithmetic (ppm = parts per million). The
    * corpus is space-joined, so total word chars = n_chars - (n_words-1).
    */
  def textQuality(documents: DataFrame, stopwords: Seq[String]): DataFrame =
    documents
      .withColumn("n_words", size(words(col("text"))).cast("long"))
      .withColumn("__stop_cnt", stopCount(words(col("text")), stopwords))
      .select(
        col("doc_id"),
        col("n_words"),
        expr("(n_chars - (n_words - 1)) * 1000000L div n_words").as("chars_per_word_ppm"),
        expr("__stop_cnt * 1000000L div n_words").as("stopword_ppm"),
        col("n_chars"))
      .orderBy("doc_id")

  /** L4 — TOKEN-BUDGET curation: per source, greedily keep the
    * highest-quality documents until the source's cumulative token
    * count reaches `budgetTokens` — the "we can afford N tokens per
    * feed" selection step between scoring and training, which caps
    * each feed's volume while keeping its best content (a global
    * budget would let one verbose feed crowd out the rest).
    *
    * Quality = distinct-word ratio in ppm (the repetition-penalizing
    * integer score; boilerplate and keyword-stuffed docs rank last),
    * tie-broken by doc_id so the greedy order is total and the kept
    * set is deterministic under any partitioning. A document is kept
    * iff the cumulative count INCLUDING it fits the budget.
    *
    * Scale shape: one map pass computes (n_words, score) per doc —
    * the running sum then runs over |docs-per-source| rows hash-
    * partitioned by source, and only (id, counts) tuples shuffle,
    * never text. Per-source windows are the bounded-partition shape;
    * a skewed giant feed degrades to ITS doc count, not the corpus.
    */
  def tokenBudgetSelect(documents: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    val w = Window.partitionBy("source")
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("source"), col("doc_id"),
        size(words(col("text"))).cast("long").as("n_words"),
        expr("cast(size(array_distinct(split(text, ' '))) as bigint) " +
          "* 1000000L div cast(size(split(text, ' ')) as bigint)")
          .as("score_ppm"))
      .withColumn("cum_tokens", sum(col("n_words")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .select("source", "doc_id", "score_ppm", "n_words", "cum_tokens")
      .orderBy("source", "doc_id")
  }

  /** L4 — BPE-ish token counting: alpha runs + digit runs + single
    * non-space symbols, via one regex pass.
    */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      tokenCountCol(col("text")).as("n_tokens"),
      col("n_chars"))
      .orderBy("doc_id")

  /** L4 — document fingerprint: md5 over the exact text (content-hash
    * identity for exact-dedup joins across 100 TB corpora; md5 is
    * bit-identical across engines, unlike engine-specific hash()).
    */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), md5(col("text")).as("fp"))
      .orderBy("doc_id")

  /** RE2-safe PII patterns (no lookahead — they must run identically in
    * Java regex and RE2-based engines).
    */
  val UrlRegex = "https?://[^ ]+"
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** L4 — PII scrubbing for training corpora: mask URLs and email
    * addresses, reporting per-document match counts. One codegen'd regex
    * pass per pattern, map-side only — scales linearly.
    *
    * NB: patterns go through the `Column` API only — interpolating a
    * pattern into an `expr(...)` SQL string would strip the `\.` escape
    * at the SQL-literal layer (verified), silently widening the email
    * match and diverging from both the replace pass and the oracle.
    */
  def scrubPii(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(UrlRegex), lit(0)))
        .cast("long").as("n_urls"),
      size(regexp_extract_all(col("text"), lit(EmailRegex), lit(0)))
        .cast("long").as("n_emails"),
      substring(
        regexp_replace(regexp_replace(col("text"), UrlRegex, "<URL>"),
          EmailRegex, "<EMAIL>"), 1, 60).as("scrubbed_prefix"))
      .orderBy("doc_id")

  /** Max multiplicity of any element in a SORTED array, as the longest
    * run of equal neighbors — one `aggregate` fold, no shuffle. This is
    * the per-row replacement for the wordcount-shaped
    * `explode → groupBy(doc, word) → max(tf)` pipeline: the statistic is
    * per-document, so it belongs in a row-local expression, not in a
    * corpus-wide shuffle that moves every token to a reducer.
    */
  def maxMultiplicity(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        // run starts at 0, so a first element equal to the "" sentinel
        // still opens its run at 1 — no special case for empty tokens
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** L4 — repetition profile (Gopher-style quality rules): duplicate-word
    * ratio, most-frequent-word count, and most-frequent-bigram share —
    * the standard signals for detecting degenerate/boilerplate text.
    * Integer ppm arithmetic throughout.
    *
    * Single narrow MAP pass (round-5 rewrite; was two explode+groupBy
    * wordcount jobs = 2 scans, 3 tokenizations, 4 shuffle stages): every
    * statistic is per-document, so it is computed from the token array
    * in place — `array_distinct` for the distinct count,
    * [[maxMultiplicity]] over the sorted unigram/bigram arrays for the
    * top-term counts. At 100 TB this is the difference between shuffling
    * every token of the corpus and shuffling NOTHING (the only exchange
    * is the output sort's range partitioning).
    *
    * Tokenize-once discipline: the `≥2 tokens` row filter (the old
    * shape's inner-join semantics — single-token docs have no bigram) is
    * expressed as `text CONTAINS ' '`, which is equivalent under
    * single-space tokenization and CHEAP, so predicate pushdown sends a
    * plain string predicate to the scan instead of re-deriving
    * `size(split(…))` a second time; the split itself lives in its own
    * projection that the optimizer cannot inline (non-cheap, multi-ref).
    * PushdownSpec pins one `split(` in the executed plan and the absence
    * of any hash aggregation/exchange.
    */
  def repetitionStats(documents: DataFrame): DataFrame =
    documents
      // text contains a space ⟺ split(text,' ') has ≥ 2 elements (split
      // on "" yields [""], size 1) — Contains translates to a pushable
      // StringContains source filter, unlike instr(…) > 0 arithmetic
      .filter(col("text").contains(" "))
      .select(col("doc_id"), words(col("text")).as("__toks"))
      .select(
        col("doc_id"),
        size(col("__toks")).cast("long").as("n_words"),
        size(array_distinct(col("__toks"))).cast("long").as("distinct_words"),
        maxMultiplicity(array_sort(col("__toks"))).as("top_word_cnt"),
        maxMultiplicity(array_sort(wordNgrams(col("__toks"), 2)))
          .as("top_bigram_cnt"),
        (size(col("__toks")) - 1).cast("long").as("n_bigrams"))
      .select(col("doc_id"), col("n_words"), col("distinct_words"),
        expr("(n_words - distinct_words) * 1000000L div n_words").as("dup_word_ppm"),
        col("top_word_cnt"), col("top_bigram_cnt"),
        expr("top_bigram_cnt * 1000000L div n_bigrams").as("top_bigram_ppm"))
      .orderBy("doc_id")

  /** L4 — fixed-size token-window chunking with overlap: the standard
    * "split long documents into training sequences" step of an LLM data
    * pipeline. Chunk i covers tokens [i·stride, i·stride + window); the
    * final chunk may be short; every token position is covered. Pure
    * projection + posexplode — no shuffle before the output sort, so the
    * plan is a single map pass at any corpus size. Output rows carry the
    * chunk's md5 (not the text) so the declared result stays scalar and
    * compact.
    */
  def chunkWindows(documents: DataFrame, window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride,
      "need stride > 0 and window >= stride (full coverage)")
    val ws = words(col("text"))
    val chunks = transform(
      // start offsets 0, stride, 2·stride, … while start < n_tokens
      sequence(lit(0L), floor((size(ws) - 1) / lit(stride)).cast("long"), lit(1L)),
      i => concat_ws(" ", slice(ws, (i * stride + 1).cast("int"), lit(window))))
    documents
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(words(col("chunk"))).cast("long").as("n_tokens"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** L4 — n-gram language-ID heuristic: score each candidate language by
    * how many of its marker words appear in the text; pick the best
    * (ties broken lexicographically). Marker lists are tiny and inlined
    * into the plan — no join, no shuffle beyond the final sort.
    */
  def languageId(documents: DataFrame, markers: Map[String, Seq[String]]): DataFrame = {
    // tokenize ONCE into an intermediate projection — scoring references
    // the materialized token array, so the per-language fold costs one
    // array scan per language instead of one re-tokenization per language
    val tokenized = documents.withColumn("__toks", words(col("text")))
    val scores: Seq[(String, Column)] = markers.toSeq.sortBy(_._1).map {
      case (lang, ws) =>
        lang -> size(filter(col("__toks"),
          w => w.isin(ws.map(_.asInstanceOf[Any]): _*)))
    }
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (lang, sc)) =>
        when(sc > acc.getField("score"),
          struct(sc.as("score"), lit(lang).as("lang"))).otherwise(acc)
    }
    tokenized.select(col("doc_id"), col("lang").as("lang_actual"),
      best.getField("lang").as("lang_guess"),
      best.getField("score").cast("long").as("marker_hits"))
      .orderBy("doc_id")
  }

  /** L4 — corpus-boilerplate share (the cross-document cousin of the
    * within-document [[repetitionStats]]): an n-gram is "boilerplate"
    * when it appears in ≥ `minDf` distinct documents; each document is
    * scored by the ppm of its distinct n-grams that are boilerplate —
    * the CCNet-style signal for navigation chrome / legal footers
    * duplicated across a crawl.
    *
    * Scale shape: the n-gram df rollup is an inverted-index build (one
    * shuffle on the gram, map-side combined). The surviving boilerplate
    * set is df-filtered — a tiny fraction of the gram vocabulary by
    * construction — so it broadcast-joins back and the corpus-sized
    * side shuffles only on doc_id for the final rollup.
    */
  def boilerplateShare(documents: DataFrame, n: Int, minDf: Int): DataFrame = {
    val ws = words(col("text"))
    // grams feeds TWO consumers (df rollup + join-back). Deliberately
    // NOT .cache()'d: a builder can't unpersist after its action, and a
    // session-pinned corpus-sized cache starves every later query in a
    // long session (the IVF cache needed an explicit release() for the
    // same reason). A localCheckpoint (the jaccardPairs discipline) was
    // A/B-measured in r6 and LOST — 1.90 s uncheckpointed vs 2.00 s
    // checkpointed at sf0.1 (the double tokenize+shingle pass is cheaper
    // than materializing the exploded gram relation). At 100 TB
    // materialize grams to an explicit checkpoint table instead.
    val grams = documents.filter(size(ws) >= n)
      .select(col("doc_id"), explode(array_distinct(wordNgrams(ws, n))).as("g"))
    val hot = grams.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("g"), lit(1L).as("hot"))
    grams.join(broadcast(hot), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count_if(col("hot").isNotNull).as("n_boiler"))
      .withColumn("boiler_ppm", expr("n_boiler * 1000000 div n_grams"))
      .orderBy("doc_id")
  }

  /** L4 — out-of-vocabulary rate: the share of each document's tokens
    * falling outside the corpus's top-`vocabSize` words — a standard
    * LLM-curation quality signal (high OOV ⇒ boilerplate/noise/wrong
    * language). Integer ppm output, fully oracle-checkable.
    *
    * Scale shape: the vocabulary rank runs on the DISTINCT-WORD frame
    * (vocabulary-bounded — Heaps' law keeps it millions of rows at
    * 100 TB, not trillions), and the single-partition rank window only
    * ever sees those aggregated rows; the chosen vocab (≤ vocabSize
    * rows) then broadcast-joins back, so the corpus-sized side never
    * shuffles on `word`— it shuffles once on `doc_id` for the final
    * per-doc rollup. Ties at the frequency cut are broken
    * lexicographically (deterministic vocab).
    */
  def oovRate(documents: DataFrame, vocabSize: Int): DataFrame = {
    val tokens = documents.select(col("doc_id"),
      explode(words(col("text"))).as("word"))
    val vocab = tokens.groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("cnt").desc, col("word"))))
      .filter(col("rk") <= vocabSize)
      .select(col("word"), lit(1L).as("in_vocab"))
    tokens.join(broadcast(vocab), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count_if(col("in_vocab").isNull).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
      .orderBy("doc_id")
  }

  /** L4 — word co-occurrence counts within a forward window of `window`
    * tokens: for each position i, emit (wᵢ, wⱼ) for j ∈ (i, i+window] —
    * the raw counts behind PMI/embedding-training co-occurrence matrices.
    * Top-`topN` pairs by (count desc, w1, w2) — a total order, since the
    * grouped (w1, w2) key is unique.
    *
    * Scale shape: ONE narrow map pass builds the pair list per row
    * (array-slice fan-out — linear in tokens × window, no self-join on
    * position, which would shuffle the corpus once per token), then a
    * single map-side-combined groupBy on the pair; the final top-N is
    * `TakeOrderedAndProject` over the vocabulary²-bounded count frame.
    * Tokenize-once: the token array is projected before the fan-out, so
    * `split` runs once per document even though the expression references
    * the array twice.
    */
  def cooccurrence(documents: DataFrame, window: Int, topN: Int): DataFrame = {
    require(window >= 1)
    documents
      .select(words(col("text")).as("__ws"))
      .select(explode(flatten(transform(col("__ws"), (w, i) =>
        transform(slice(col("__ws"), i + lit(2), lit(window)),
          v => struct(w.as("w1"), v.as("w2")))))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w1"), asc("w2"))
      .limit(topN)
  }

  /** L4 — temperature-sampled language weights (α = 1/2): the standard
    * multilingual-corpus rebalancing step — sampling probability
    * ∝ (docs per language)^α flattens the head so low-resource languages
    * are upsampled relative to their raw share.
    *
    * α = 1/2 is deliberately the exponent whose power function (sqrt) is
    * CORRECTLY ROUNDED under IEEE 754 in every conforming engine — unlike
    * pow/ln/exp, whose last ulp is libm-specific — so
    * `floor(sqrt(n) · 10⁶)` is bit-identical across engines and the ppm
    * weights oracle-check exactly. Weights are integer-normalized:
    * wᵢ = sᵢ·10⁶ div Σs.
    *
    * Scale shape: one map-side-combined count per language, then a
    * single-partition window over the LANGUAGE-CARDINALITY-sized frame
    * (dozens of rows at any corpus size) for the normalizing sum.
    */
  def languageSamplingWeights(documents: DataFrame): DataFrame = {
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    documents.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("sqrt_s6",
        floor(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
      // integer `div`, NOT Column./ — the latter is double division, and
      // truncating a last-ulp-low quotient like 41.999…9 would floor to
      // the wrong integer
      .withColumn("__total", sum("sqrt_s6").over(all))
      .withColumn("weight_ppm", expr("sqrt_s6 * 1000000L div __total"))
      .drop("__total")
      .orderBy("lang")
  }

  /** L4 — sequence packing for training-batch assembly: concatenate
    * documents in deterministic `doc_id` order and cut fixed
    * `budgetTokens` bins, attributing each document to the bin its FIRST
    * token lands in (concat-then-chunk with start-aligned attribution —
    * a long document may spill past its bin's end rather than being
    * split).
    *
    * Scale shape: the prefix sum runs per (source, shard) where
    * shard = doc_id div `shardDocs`, so no window partition ever exceeds
    * `shardDocs` rows — a single global ORDER BY prefix sum would
    * collapse to ONE partition at 100 TB. Shard boundaries waste at most
    * one partial bin each, the price of parallel packing.
    */
  def packSequences(documents: DataFrame, budgetTokens: Long,
                    shardDocs: Long): DataFrame = {
    val toks = documents.select(col("source"),
      expr(s"doc_id div $shardDocs").as("shard"), col("doc_id"),
      tokenCountCol(col("text")).as("n_tokens"))
    val before = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("cum_before", coalesce(sum("n_tokens").over(before), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $budgetTokens"))
      .groupBy("source", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "shard", "bin")
  }

  /** L4 — unigram SURPRISAL scoring (round 13): the CCNet-style
    * language-model quality filter, integer-exact. Fit = the corpus's
    * own unigram counts (one corpus pass, vocab-sized table); score =
    * per word, floor(log₂(total∕count)) bits — computed PORTABLY as
    * `length(bin(total div count)) − 1` (both Spark and DuckDB ship
    * `bin`), so the whole filter replays bit-for-bit with no
    * transcendental float in sight; per doc, the q8 fixed-point mean
    * bits per token. Rare-word-heavy documents score high (the
    * perplexity-filter signal); the whole-bit quantization is the
    * price of engine-exact replay and is honest about itself — a float
    * production variant is one `log2()` away but not oracle-checkable.
    * Documents with NULL text carry no words and emit no row (the
    * unnest/explode agreement both engines share).
    *
    * Scale shape: one corpus explode (map-side-combined word count),
    * the vocab-sized bits table broadcast back onto the word stream,
    * one per-doc aggregation. The corpus total rides a broadcast
    * one-row cross join — no driver collect.
    */
  def surprisalBits(documents: DataFrame): DataFrame = {
    val w = documents.select(col("doc_id"),
      explode(words(col("text"))).as("word"))
    val wc = w.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = wc.agg(sum(col("cnt")).as("t"))
    val wordBits = wc.crossJoin(broadcast(total))
      .select(col("word"),
        (length(bin(expr("t div cnt"))) - 1).cast("long").as("bits"))
    w.join(broadcast(wordBits), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("bits").as("sum_bits"))
      .withColumn("bits_q8", expr("sum_bits * 256L div n_words"))
      .orderBy("doc_id")
  }

  /** Per-domain NTILE(3) over (bits_q8, doc_id) WITHOUT a corpus-sized
    * window partition (round 18, VERDICT r17 #1) — byte-identical to
    * `ntile(3) OVER (PARTITION BY source ORDER BY bits_q8, doc_id)`
    * (Round18OpsSpec equates the two on ragged fixtures), but computed
    * by CUT POINTS so no task ever sorts a whole domain:
    *
    *  1. roll `ds` up to the DISTINCT (source, bits_q8) value table —
    *     bounded by loss-value cardinality, never corpus size (the
    *     [[paddingWaste]] discipline); cumulative counts over that
    *     bounded table give each value group its 0-based start rank;
    *  2. NTILE's two boundary ranks per source are pure arithmetic
    *     (`cut_j = j·(n div 3) + min(j, n mod 3)`); locate each inside
    *     its containing value group;
    *  3. a cut landing INSIDE a tie group (offset > 0) needs the
    *     doc_id NTILE would split at: rank doc_ids within the ≤2
    *     boundary groups per source ONLY (a window partitioned by the
    *     (source, bits_q8) tie group, semi-joined down to boundary
    *     groups first — never a domain-wide partition);
    *  4. broadcast the per-source (cut_bits, cut_id) pairs and assign
    *     `tercile = 1 + Σ_j [(bits_q8, doc_id) ≥ cut_j]` by comparison.
    *
    * Input `ds`: (doc_id, source, n_words, bits_q8) with doc_id unique.
    * Output adds `tercile` (long, 1..3).
    */
  private[graft] def tercilesByCuts(ds0: DataFrame): DataFrame = {
    val ds = ds0.lineageTruncate() // 3 consumers: value groups,
                                   // boundary-group ranks, assignment
    val vg = ds.groupBy("source", "bits_q8")
      .agg(count(lit(1)).cast("long").as("cnt"))
    val cumW = Window.partitionBy("source").orderBy("bits_q8")
      .rowsBetween(Window.unboundedPreceding, -1)
    // both windows run over the BOUNDED value table (vg), not documents
    val cuts = vg
      .withColumn("cum_before",
        coalesce(sum(col("cnt")).over(cumW), lit(0L)))
      .withColumn("n",
        sum(col("cnt")).over(Window.partitionBy("source")))
      .select(col("source"), col("bits_q8"), col("cnt"),
        col("cum_before"), col("n"),
        explode(array(lit(1L), lit(2L))).as("j"))
      .withColumn("cut_rank", expr("j * (n div 3) + least(j, n % 3)"))
      // a cut at rank n means the higher bucket is empty: no boundary
      .filter(col("cut_rank") < col("n"))
      // keep the value group CONTAINING the cut rank
      .filter(col("cut_rank") >= col("cum_before") &&
        col("cut_rank") < col("cum_before") + col("cnt"))
      .select(col("source"), col("j"), col("bits_q8").as("cut_bits"),
        (col("cut_rank") - col("cum_before")).as("off"))
      .lineageTruncate() // 3 consumers: boundary groups, in-group cuts,
                         // group-start cuts
    val bdGroups = cuts.filter(col("off") > 0L)
      .select(col("source"), col("cut_bits").as("bits_q8")).distinct()
    val bdRanks = ds
      .join(broadcast(bdGroups), Seq("source", "bits_q8"), "left_semi")
      .withColumn("rn", row_number().over(
        Window.partitionBy("source", "bits_q8").orderBy("doc_id"))
        .cast("long"))
    val cutIn = bdRanks
      .join(broadcast(cuts.filter(col("off") > 0L)
        .withColumnRenamed("cut_bits", "bits_q8")),
        Seq("source", "bits_q8"))
      .filter(col("rn") === col("off") + 1L)
      .select(col("source"), col("j"), col("bits_q8").as("cut_bits"),
        col("doc_id").as("cut_id"))
    // a cut at a group start boundary needs no doc_id: every doc_id in
    // the group is past it
    val cutStart = cuts.filter(col("off") === 0L)
      .select(col("source"), col("j"), col("cut_bits"),
        lit(Long.MinValue).as("cut_id"))
    val cutRow = cutIn.unionByName(cutStart)
      .groupBy("source")
      .agg(max(when(col("j") === 1L, col("cut_bits"))).as("c1_bits"),
        max(when(col("j") === 1L, col("cut_id"))).as("c1_id"),
        max(when(col("j") === 2L, col("cut_bits"))).as("c2_bits"),
        max(when(col("j") === 2L, col("cut_id"))).as("c2_id"))
    def passed(b: Column, i: Column): Column =
      b.isNotNull && (col("bits_q8") > b ||
        (col("bits_q8") === b && col("doc_id") >= i))
    ds.join(broadcast(cutRow), Seq("source"), "left_outer")
      .withColumn("tercile",
        lit(1L) +
          when(passed(col("c1_bits"), col("c1_id")), 1L).otherwise(0L) +
          when(passed(col("c2_bits"), col("c2_id")), 1L).otherwise(0L))
      .select("doc_id", "source", "n_words", "bits_q8", "tercile")
  }

  /** The shared tercile relation both CCNet keys consume: surprisal
    * bits joined to the domain column, terciled by [[tercilesByCuts]].
    */
  private def ccnetTerciles(documents: DataFrame): DataFrame =
    tercilesByCuts(
      surprisalBits(documents)
        .select("doc_id", "n_words", "bits_q8")
        .join(documents.select("doc_id", "source"), Seq("doc_id")))

  /** CCNET-STYLE PERPLEXITY TERCILES (round 17; de-windowed round 18)
    * — the Wenzek et al. 2020 bucketing ("CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data"): per DOMAIN,
    * documents split into head/middle/tail terciles by language-model
    * perplexity, so curation keeps or reweights buckets instead of
    * applying one global threshold — the per-domain normalization is
    * the point (domains differ in baseline perplexity; a global cut
    * starves clean-but-unusual domains). The loss proxy is
    * [[surprisalBits]]' integer unigram code length (the
    * [[domainReweight]] discipline; a production run swaps LM
    * perplexity through the identical bucketing). Returns per (source,
    * tercile): doc count, token mass, and the bits_q8 band — the audit
    * read before choosing buckets.
    *
    * Tercile semantics = ntile(3) within source over (bits_q8, doc_id)
    * — the standard SQL NTILE both engines implement identically, ties
    * broken by doc_id so the relation is hash-checkable — but computed
    * via [[tercilesByCuts]], so at 100 TB no task ever sorts a whole
    * domain (a web-crawl domain is terabytes; a per-source window
    * partition would single-thread it).
    *
    * Scale shape: one surprisal pass (explode + two map-side-combined
    * rollups) + the bounded cut-point chain + a (domains × 3)-key
    * rollup.
    */
  def ccnetBuckets(documents: DataFrame): DataFrame =
    ccnetTerciles(documents)
      .groupBy("source", "tercile")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_words")).cast("long").as("tokens"),
        min(col("bits_q8")).as("min_bits_q8"),
        max(col("bits_q8")).as("max_bits_q8"))
      .orderBy("source", "tercile")

  /** CCNET FILTER DECISION (round 17) — the curation step
    * [[ccnetBuckets]]' audit feeds: keep each domain's documents whose
    * tercile is in `keepTerciles` (CCNet's published default keeps
    * head+middle and drops the high-perplexity tail), reported as the
    * per-domain accounting relation a pipeline logs beside the kept
    * corpus — docs in/kept and token mass in/kept. The audit→decision
    * symmetry every other quality signal here has (threshold filters,
    * the quality gate): buckets are computed ONCE with the identical
    * [[tercilesByCuts]] rule, so the decision provably matches the
    * audit.
    *
    * Scale shape: [[ccnetBuckets]]' one surprisal pass + the bounded
    * cut-point chain, then a conditional rollup — no second corpus
    * pass, no per-domain window.
    */
  def ccnetFilter(documents: DataFrame,
                  keepTerciles: Seq[Int] = Seq(1, 2)): DataFrame = {
    require(keepTerciles.nonEmpty &&
      keepTerciles.forall(t => t >= 1 && t <= 3),
      s"keepTerciles must be a non-empty subset of 1..3, got $keepTerciles")
    val keep = col("tercile")
      .isin(keepTerciles.map(_.toLong.asInstanceOf[Any]): _*)
    ccnetTerciles(documents)
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("docs_in"),
        sum(when(keep, 1L).otherwise(0L)).cast("long").as("docs_kept"),
        sum(col("n_words")).cast("long").as("tokens_in"),
        sum(when(keep, col("n_words")).otherwise(0L)).cast("long")
          .as("tokens_kept"))
      .orderBy("source")
  }

  /** PADDING-WASTE AUDIT under length-bucketed batching (round 17) —
    * the training-throughput audit: documents batched together pad to
    * the longest member, so a batching policy's padded-token waste is
    * `Σ_bucket (max_len·n_docs − Σ len)`. Reports each EXACT length-
    * quantile bucket plus the one-global-batch baseline (bucket −1);
    * the delta between the baseline's waste_permille and the buckets'
    * IS the throughput argument for length-bucketed batch shaping.
    *
    * Buckets are exact quantiles computed SCALE-SAFELY: the cumulative
    * distribution runs over the DISTINCT length-value table (bounded
    * by max document length, not corpus size — the documented-bounded
    * global-window discipline), and a whole length-group takes its
    * first document's bucket (`cum_before·B div N`) — deterministic,
    * partition-invariant, and equal-length docs never split across
    * buckets the way raw NTILE tie-splitting would.
    *
    * Arithmetic: waste is per-MILLE (×1000, not ppm) so
    * `(padded − sum)·1000` stays in int64 for any bucket under
    * 9.2·10¹⁵ padded tokens — ~700× headroom over a 100 TB corpus
    * split 8 ways (ppm would cut that to 9.2·10¹², reachable).
    */
  def paddingWaste(documents: DataFrame, buckets: Int = 8): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val lens = documents
      .select(size(words(col("text"))).cast("long").as("len"))
      .groupBy("len").agg(count(lit(1)).cast("long").as("cnt"))
      .lineageTruncate() // 2 consumers: cumulative window + total
    val cumW = Window.orderBy("len")
      .rowsBetween(Window.unboundedPreceding, -1)
    val per = lens
      .withColumn("cum_before",
        coalesce(sum(col("cnt")).over(cumW), lit(0L)))
      .crossJoin(broadcast(
        lens.agg(sum(col("cnt")).cast("long").as("n_total"))))
      .withColumn("bucket", expr(s"cum_before * ${buckets}L div n_total"))
      .groupBy("bucket")
      .agg(sum(col("cnt")).cast("long").as("n_docs"),
        sum(col("len") * col("cnt")).cast("long").as("sum_tokens"),
        max(col("len")).as("max_len"))
      .lineageTruncate() // 2 consumers: bucket rows + baseline rollup
    val baseline = per.agg(
      sum(col("n_docs")).cast("long").as("n_docs"),
      sum(col("sum_tokens")).cast("long").as("sum_tokens"),
      max(col("max_len")).as("max_len"))
      .select(lit(-1L).as("bucket"), col("n_docs"), col("sum_tokens"),
        col("max_len"))
    per.select("bucket", "n_docs", "sum_tokens", "max_len")
      .unionByName(baseline)
      .withColumn("padded_tokens", expr("max_len * n_docs"))
      // a bucket of all-zero-length docs (or an empty corpus baseline)
      // has padded_tokens = 0: Spark's div would yield null where the
      // oracle's // errors — define waste as 0 there, on both engines
      .withColumn("waste_permille",
        expr("CASE WHEN padded_tokens > 0 THEN " +
          "(padded_tokens - sum_tokens) * 1000L div padded_tokens " +
          "ELSE 0L END"))
      .orderBy("bucket")
  }

  /** DOMAIN REWEIGHTING by multiplicative weights (round 15, wave 5) —
    * the DoReMi shape (Xie et al. 2023, "DoReMi: Optimizing Data
    * Mixtures Speeds Up Language Model Pretraining"): start from a
    * uniform domain mixture and iteratively shift sampling weight
    * toward domains whose per-token loss EXCEEDS the current
    * mixture-weighted average (`w′ᵢ ∝ wᵢ·(1 + η·excessᵢ)` — the
    * standard linearized MW update). The loss proxy here is the
    * [[surprisalBits]] unigram code length per token (q8), so the whole
    * trajectory is integer-exact and DuckDB-replayable; a production
    * run swaps in proxy-model losses through the identical update.
    *
    * Returns the FULL trajectory — one row per (iteration, domain) with
    * the domain loss and the ppm weight after that iteration — because
    * the trajectory is the audit: weight mass should drain from
    * below-average domains monotonically under a fixed step.
    *
    * Arithmetic (all long): `avg_q8 = Σwᵢ·lossᵢ div Σwᵢ`;
    * `rawᵢ = wᵢ·(scaleQ + etaQ·max(0, lossᵢ − avg_q8))`;
    * `w′ᵢ = rawᵢ·10⁶ div Σraw`. With w ≤ 10⁶, loss_q8 ≤ ~10⁴ and
    * domain counts in the thousands, every product stays far inside
    * int64.
    *
    * Scale shape: the corpus-sized work is ONE explode + two map-side
    * combined aggregations (word counts, per-domain bits rollup); the
    * MW iteration runs driver-side over the collected per-domain table
    * — bounded by the DOMAIN count (sources: tens to thousands), the
    * same bounded-collect discipline as the Lloyd centroid fit. No
    * per-iteration corpus pass: losses are frozen, only weights move.
    */
  def domainReweight(documents: DataFrame, iters: Int = 5,
                     scaleQ: Long = 4096L, etaQ: Long = 64L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = documents.sparkSession
    import spark.implicits._
    val w = documents.select(col("source"),
      explode(words(col("text"))).as("word"))
    val wc = w.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = wc.agg(sum(col("cnt")).as("t"))
    val wordBits = wc.crossJoin(broadcast(total))
      .select(col("word"),
        (length(bin(expr("t div cnt"))) - 1).cast("long").as("bits"))
    val dom = w.join(broadcast(wordBits), Seq("word"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"), sum("bits").as("sum_bits"))
      .withColumn("loss_q8", expr("sum_bits * 256L div n_words"))
      .select("source", "loss_q8")
      // bounded collect: one row per DOMAIN (source), not per document —
      // the mixture table a training job holds anyway
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(dom.nonEmpty, "domainReweight: no domains in input")
    val d = dom.length.toLong
    var weights: Seq[Long] = Seq.fill(dom.length)(1000000L / d)
    val trace = scala.collection.mutable.ArrayBuffer.empty[
      (Long, String, Long, Long)]
    dom.zip(weights).foreach { case ((s, l), wp) => trace += ((0L, s, l, wp)) }
    (1 to iters).foreach { t =>
      val sumW = weights.sum
      val avg = dom.zip(weights).map { case ((_, l), wp) => wp * l }.sum / sumW
      val raw = dom.zip(weights).map { case ((_, l), wp) =>
        wp * (scaleQ + etaQ * math.max(0L, l - avg))
      }
      val sumRaw = raw.sum
      weights = raw.map(r => r * 1000000L / sumRaw)
      dom.zip(weights).foreach { case ((s, l), wp) =>
        trace += ((t.toLong, s, l, wp))
      }
    }
    trace.toSeq.toDF("iter", "source", "loss_q8", "w_ppm")
      .orderBy("iter", "source")
  }

  /** MIXTURE SCHEDULE (round 15, wave 8) — the operational consumer of
    * [[domainReweight]]: the converged weights turned into the numbers
    * a training run actually executes on. Per domain: the final ppm
    * weight, the tokens AVAILABLE in the corpus, the tokens ALLOCATED
    * out of `budgetTokens` (`w_ppm·B div 10⁶`), and the implied
    * oversampling factor `epochs_q8 = alloc·256 div avail` — epochs_q8
    * above 256 means the schedule repeats that domain's data (the
    * up-weighted, high-loss domains), below means it subsamples. This
    * closes the reweight → schedule loop the same way q_budget_* keys
    * close filter → pack.
    *
    * Scale shape: [[domainReweight]]'s one corpus pass + one more
    * map-side-combined per-domain token rollup + a domain-sized join.
    */
  def mixtureSchedule(documents: DataFrame, budgetTokens: Long,
                      iters: Int = 5, scaleQ: Long = 4096L,
                      etaQ: Long = 64L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    // w_ppm reaches 10⁶, so alloc = w_ppm·B wraps int64 (silently, under
    // non-ANSI Spark) once B > Long.MaxValue/10⁶ ≈ 9.2·10¹² tokens —
    // a plausible 100 TB-scale budget (ADVICE r15). Fail loud here; a
    // run that genuinely needs a bigger budget computes alloc in
    // decimal(38,0) before the div (same one-line swap as dimensionAudit).
    require(budgetTokens <= Long.MaxValue / 1000000L,
      s"budgetTokens $budgetTokens would overflow w_ppm*B in int64; " +
        "cap at Long.MaxValue/1e6 or switch alloc to decimal(38,0)")
    val finalW = domainReweight(documents, iters, scaleQ, etaQ)
      .filter(col("iter") === iters.toLong)
      .select("source", "loss_q8", "w_ppm")
    val avail = documents
      .select(col("source"), size(words(col("text"))).cast("long").as("nt"))
      .groupBy("source")
      .agg(sum(col("nt")).cast("long").as("avail_tokens"))
    finalW.join(avail, Seq("source"))
      .withColumn("alloc_tokens",
        expr(s"w_ppm * ${budgetTokens}L div 1000000L"))
      .withColumn("epochs_q8",
        expr("alloc_tokens * 256L div avail_tokens"))
      .select("source", "loss_q8", "w_ppm", "avail_tokens",
        "alloc_tokens", "epochs_q8")
      .orderBy("source")
  }

  /** SCHEDULE EXECUTION PRICING (round 16) — the operational consumer
    * of [[mixtureSchedule]], closing reweight → schedule → EXECUTION:
    * each arriving document is priced against the FROZEN schedule's
    * per-domain oversampling factor. A doc from domain s repeats
    * `epochs_q8(s) div 256` times plus one more with probability
    * `(epochs_q8 mod 256)/256` — stochastic rounding of the repetition
    * factor, drawn DETERMINISTICALLY from the doc id's portable md5-60
    * hash (the weighted-sample draw discipline), so the executed sample
    * is retry-invariant and engine-exact. Domains the frozen schedule
    * never saw price to zero repeats (allocated nothing) while their
    * arriving mass still reports — the new-domain monitor signal.
    *
    * Stateless per document given the domain-bounded (source,
    * epochs_q8) table — which is exactly what makes the streaming twin
    * ([[graft.streaming.StreamingOps.priceScheduleStream]]) safe in
    * append mode with no state store, the scoreTokenizerStream
    * discipline. This batch side rolls the same per-doc pricing up per
    * (batch_id, source).
    *
    * Scale shape: [[mixtureSchedule]]'s cost once per freeze (domain-
    * bounded collect), then ONE map pass over the arriving stream (the
    * schedule rides in a literal map) + a map-side-combined rollup on
    * the (batches × domains)-bounded key. The corpus that FITTED the
    * schedule is never touched again.
    */
  def schedulePriceBatches(documents: DataFrame, arriving: DataFrame,
                           budgetTokens: Long, iters: Int = 5,
                           scaleQ: Long = 4096L,
                           etaQ: Long = 64L): DataFrame = {
    val sched = mixtureSchedule(documents, budgetTokens, iters, scaleQ, etaQ)
      .select("source", "epochs_q8")
      // bounded collect: one row per DOMAIN — the frozen schedule a
      // training job ships to its loaders anyway
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    priceDocsAgainstSchedule(arriving, sched)
      .groupBy("batch_id", "source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("arr_tokens"),
        sum(when(col("repeats") > 0, 1L).otherwise(0L)).cast("long")
          .as("sampled_docs"),
        // int64-safe by priceDocsAgainstSchedule's repeats<2³¹ require:
        // per-doc product < 2⁶³ for docs under 4G tokens, and the group
        // sum wraps only past 9.2·10¹⁸ sampled tokens per batch×domain
        sum(col("n_tokens") * col("repeats")).cast("long")
          .as("sampled_tokens"),
        max(col("epochs_q8")).as("epochs_q8"))
      .orderBy("batch_id", "source")
  }

  /** SCHEDULE-EXECUTED PACKING (round 16) — the step after
    * [[schedulePriceBatches]]: the sampled stream (each doc realized
    * `repeats` times by the md5-drawn stochastic rounding) concatenated
    * in (doc_id, copy) order and cut into fixed `binTokens` bins per
    * (batch, domain) — the training batches a run under the frozen
    * mixture actually assembles, closing reweight → schedule → price →
    * PACK. Attribution is [[packSequences]]' concat-then-chunk rule:
    * each copy lands in the bin its first token falls in.
    *
    * Scale shape: the pricing map pass + one copy-explode (bounded by
    * Σrepeats ≤ max_epochs·|batch|), then ONE prefix-sum window
    * partitioned by (batch_id, source) — bounded by the micro-batch,
    * never a global sort — and a (batches × domains × bins)-key rollup.
    */
  def packScheduledBins(documents: DataFrame, arriving: DataFrame,
                        budgetTokens: Long, binTokens: Long,
                        iters: Int = 5, scaleQ: Long = 4096L,
                        etaQ: Long = 64L): DataFrame = {
    require(binTokens > 0, s"binTokens must be > 0, got $binTokens")
    val sched = mixtureSchedule(documents, budgetTokens, iters, scaleQ,
        etaQ)
      .select("source", "epochs_q8")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    packDocsAgainstSchedule(arriving, sched, binTokens)
  }

  /** The per-batch packing tail shared by [[packScheduledBins]] and the
    * streaming twin ([[graft.streaming.StreamingOps
    * .packScheduledStream]]) — stream/batch parity BY CONSTRUCTION,
    * the curateIngest discipline. `arriving` must carry (batch_id,
    * doc_id, source, text); the window partitions per (batch_id,
    * source), so in the stream twin the frame is exactly one
    * micro-batch and the prefix sum never crosses batches.
    */
  def packDocsAgainstSchedule(arriving: DataFrame,
                              domainEpochs: Seq[(String, Long)],
                              binTokens: Long): DataFrame = {
    require(binTokens > 0, s"binTokens must be > 0, got $binTokens")
    val copies = priceDocsAgainstSchedule(arriving, domainEpochs)
      // repeats >= 1 BEFORE sequence(): Spark's sequence(1, 0) counts
      // DOWN ([1, 0]) rather than yielding empty — dropped docs must
      // never reach the explode
      .filter(col("repeats") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("repeats"))))
    val before = Window.partitionBy("batch_id", "source")
      .orderBy("doc_id", "copy")
      .rowsBetween(Window.unboundedPreceding, -1)
    copies
      // prefix sum over the realized copies: bounded by the group's
      // sampled token mass — int64-safe under the same 9.2·10¹⁸-per-
      // batch×domain bound as schedulePriceBatches' sampled_tokens
      .withColumn("__before",
        coalesce(sum(col("n_tokens")).over(before), lit(0L)))
      .withColumn("bin", expr(s"__before div ${binTokens}L"))
      .groupBy("batch_id", "source", "bin")
      .agg(count(lit(1)).cast("long").as("n_items"),
        countDistinct(col("doc_id")).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("bin_tokens"))
      .orderBy("batch_id", "source", "bin")
  }

  /** MIXTURE-DRIFT AUDIT (round 16) — the refreeze signal for the
    * frozen schedule, closing the lifecycle the tokenizer-drift key
    * opened for the OTHER frozen artifact: run [[domainReweight]] once
    * on the corpus the schedule froze on and once on the corpus as it
    * stands after an ingest cycle, and report per domain the final
    * loss and weight under each, plus the ppm weight delta. A delta
    * mass drifting from zero is the signal that the executed mixture
    * ([[schedulePriceBatches]]) no longer matches what the reweighting
    * would choose today — time to refreeze.
    *
    * Scale shape: two reweight plans (each one corpus explode + two
    * rollups + the domain-bounded driver loop) + a domain-sized join.
    */
  def scheduleDrift(frozenCorpus: DataFrame, currentCorpus: DataFrame,
                    iters: Int = 5, scaleQ: Long = 4096L,
                    etaQ: Long = 64L): DataFrame = {
    val frozen = domainReweight(frozenCorpus, iters, scaleQ, etaQ)
      .filter(col("iter") === iters.toLong)
      .select(col("source"), col("loss_q8").as("loss_frozen"),
        col("w_ppm").as("w_frozen"))
    val current = domainReweight(currentCorpus, iters, scaleQ, etaQ)
      .filter(col("iter") === iters.toLong)
      .select(col("source"), col("loss_q8").as("loss_refit"),
        col("w_ppm").as("w_refit"))
    frozen.join(current, Seq("source"), "full_outer")
      .withColumn("loss_frozen", coalesce(col("loss_frozen"), lit(0L)))
      .withColumn("loss_refit", coalesce(col("loss_refit"), lit(0L)))
      .withColumn("w_frozen", coalesce(col("w_frozen"), lit(0L)))
      .withColumn("w_refit", coalesce(col("w_refit"), lit(0L)))
      .withColumn("delta_ppm", col("w_refit") - col("w_frozen"))
      .select("source", "loss_frozen", "loss_refit", "w_frozen",
        "w_refit", "delta_ppm")
      .orderBy("source")
  }

  /** The per-document stateless pricing projection shared by
    * [[schedulePriceBatches]] and the streaming twin: n_tokens,
    * epochs_q8 (0 for unseen domains), the md5-drawn repeat count, and
    * the repeated token mass. `domainEpochs` is the frozen schedule's
    * domain-bounded (source, epochs_q8) table as literals.
    */
  def priceDocsAgainstSchedule(docs: DataFrame,
                               domainEpochs: Seq[(String, Long)])
      : DataFrame = {
    require(domainEpochs.nonEmpty,
      "domainEpochs must be non-empty — freeze the schedule first")
    // a duplicate source would hit Spark's opaque duplicate-map-key
    // error (or silently last-win) inside the literal map — fail with
    // the precondition instead
    require(domainEpochs.map(_._1).distinct.size == domainEpochs.size,
      "domainEpochs sources must be unique — a frozen schedule has one " +
        "epochs_q8 row per domain")
    // Overflow bound (ADVICE-r15 class, audited r17): downstream
    // consumers form n_tokens·repeats and sum it per (batch, domain).
    // With repeats < 2³¹ every per-doc product stays < 2⁶³ for any doc
    // under 2³² (≈4·10⁹) tokens, and the per-group sum wraps only past
    // 9.2·10¹⁸ sampled tokens in ONE micro-batch×domain — not a
    // micro-batch. A schedule demanding ≥2³¹ repeats of single
    // documents is a degenerate fit (budget ≫ corpus); refuse it here
    // rather than wrap silently downstream.
    require(domainEpochs.forall(_._2 / 256L < (1L << 31)),
      "domainEpochs repeats (epochs_q8 div 256) must stay below 2^31 — " +
        "a larger oversampling factor risks int64 wrap in " +
        "n_tokens*repeats; refit with a smaller budget")
    val em = map(domainEpochs.flatMap { case (s, e) =>
      Seq(lit(s), lit(e)) }: _*)
    docs
      .withColumn("n_tokens", size(words(col("text"))).cast("long"))
      .withColumn("epochs_q8",
        coalesce(element_at(em, col("source")), lit(0L)))
      .withColumn("__draw",
        DedupOps.md5Hash60(col("doc_id").cast("string")) % 256L)
      .withColumn("repeats",
        expr("epochs_q8 div 256L") +
          when(col("__draw") < expr("epochs_q8 % 256L"), 1L).otherwise(0L))
      .drop("__draw")
  }

  /** ZIPF RANK-FREQUENCY AUDIT (round 15, wave 8) — vocabulary health
    * in log₂-log₂ buckets: words ranked by frequency (ties broken by
    * word), grouped into doubling rank buckets (`floor(log₂ rank)`),
    * each bucket reporting word count, total occurrences, min/max
    * count, and the mean `floor(log₂ cnt)` in q8. A natural-language
    * corpus shows mean frequency bits falling ≈ linearly per bucket
    * (Zipf slope ≈ −1); a flat profile means templated/synthetic text,
    * a cliff means boilerplate dominating — the cheap whole-corpus
    * sanity check before spending on per-doc quality scoring.
    *
    * Scale shape: one word rollup; the rank window runs over the
    * VOCABULARY (≪ corpus — the capped-fit collect discipline's
    * bound, but distributed), then a bucket-count rollup.
    */
  def zipfAudit(documents: DataFrame): DataFrame = {
    val wc = documents.select(explode(words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))
    val ranked = wc
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("cnt"), asc("word"))).cast("long"))
      .withColumn("rank_bucket", (length(bin(col("rank"))) - 1).cast("long"))
      .withColumn("freq_bits", (length(bin(col("cnt"))) - 1).cast("long"))
    ranked.groupBy("rank_bucket")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("cnt")).cast("long").as("occurrences"),
        min(col("cnt")).cast("long").as("min_cnt"),
        max(col("cnt")).cast("long").as("max_cnt"),
        sum(col("freq_bits")).cast("long").as("__sfb"))
      .withColumn("mean_freq_bits_q8", expr("__sfb * 256L div n_words"))
      .drop("__sfb")
      .orderBy("rank_bucket")
  }

  /** BIGRAM-CONDITIONAL SURPRISAL (round 15) — the fluency tier above
    * [[surprisalBits]]: a document's first word prices at its unigram
    * bits, every later word at floor(log₂(ctx(prev) div cnt₂(prev, w)))
    * — the corpus bigram model's conditional code length. Templated /
    * boilerplate text with predictable transitions scores LOW bigram
    * bits even when its unigram mix looks normal (each transition is
    * near-deterministic), which is exactly the repetition signature the
    * unigram filter can't see; `gain = sum_uni − sum_bi` is the per-doc
    * mass the context explains. All integer floor-log₂ arithmetic (the
    * [[surprisalBits]] price of engine-exact replay); `keep` flags docs
    * whose q8 conditional bits stay under `keepBitsQ8`.
    *
    * Bigram pairs come from zip_with over the document's OWN word
    * array (slice vs slice-shifted) — no per-doc window, no extra
    * shuffle to order words. The bigram table is corpus-derived and
    * joins back by (prev, word) — at 100 TB you'd cap it top-B with a
    * backoff penalty (the [[surprisalFitTop]] discipline); here it is
    * exact because the oracle replays it exactly.
    */
  def surprisalBigramBits(documents: DataFrame,
                          keepBitsQ8: Long): DataFrame = {
    val docsW = documents.select(col("doc_id"), words(col("text")).as("ws"))
    val w = docsW.select(col("doc_id"), explode(col("ws")).as("word"))
    val wc = w.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = wc.agg(sum(col("cnt")).as("t"))
    val wb = wc.crossJoin(broadcast(total))
      .select(col("word"),
        (length(bin(expr("t div cnt"))) - 1).cast("long").as("ubits"))
    val pairs = docsW.select(col("doc_id"),
      explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("prev"), b.as("word")))).as("pr"))
      .select(col("doc_id"), col("pr.prev").as("prev"),
        col("pr.word").as("word"))
    val bc = pairs.groupBy("prev", "word").agg(count(lit(1)).as("cnt2"))
    val cx = bc.groupBy("prev").agg(sum(col("cnt2")).as("ctx"))
    val pairBits = pairs
      .join(bc.join(cx, Seq("prev")), Seq("prev", "word"))
      .select(col("doc_id"),
        (length(bin(expr("ctx div cnt2"))) - 1).cast("long").as("bits"))
    val firstBits = docsW.filter(size(col("ws")) >= 1)
      .select(col("doc_id"), element_at(col("ws"), 1).as("word"))
      .join(broadcast(wb), Seq("word"))
      .select(col("doc_id"), col("ubits").as("bits"))
    val uni = w.join(broadcast(wb), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("ubits").as("sum_uni_bits"))
    val bi = firstBits.unionByName(pairBits)
      .groupBy("doc_id").agg(sum("bits").as("sum_bi_bits"))
    uni.join(bi, Seq("doc_id"))
      .withColumn("bi_q8", expr("sum_bi_bits * 256L div n_words"))
      .withColumn("gain_q8",
        expr("(sum_uni_bits - sum_bi_bits) * 256L div n_words"))
      .withColumn("keep",
        when(col("bi_q8") <= lit(keepBitsQ8), 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  /** Frozen-fit exporter for the streaming BIGRAM scorer — the
    * [[surprisalFitTop]] discipline one order up: the top-`topWords`
    * unigram bits table, the top-`topPairs` bigram conditional-bits
    * table (keyed "prev word" — words are space-split so the composite
    * key is unambiguous), and the count-1-smoothed unseen-word bits.
    * Driver state is bounded by the two caps; a streaming scorer
    * prices seen pairs at their conditional bits and backs off to the
    * word's unigram bits (unseen word → unseenBits) — with caps
    * covering the full tables the stream equals [[surprisalBigramBits]]
    * doc-for-doc (Round15bOpsSpec pins it).
    */
  def surprisalBigramFitTop(documents: DataFrame, topWords: Int,
                            topPairs: Int)
      : (Seq[(String, Long)], Seq[(String, Long)], Long) = {
    val docsW = documents.select(words(col("text")).as("ws"))
    val w = docsW.select(explode(col("ws")).as("word"))
    val wc = w.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = wc.agg(sum(col("cnt")).as("t"))
    val wordBits = wc.crossJoin(broadcast(total))
      .orderBy(desc("cnt"), asc("word")).limit(topWords)
      .select(col("word"),
        (length(bin(expr("t div cnt"))) - 1).cast("long").as("bits"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val pairs = docsW.select(
      explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("prev"), b.as("word")))).as("pr"))
      .select(col("pr.prev").as("prev"), col("pr.word").as("word"))
    val bc = pairs.groupBy("prev", "word").agg(count(lit(1)).as("cnt2"))
    val cx = bc.groupBy("prev").agg(sum(col("cnt2")).as("ctx"))
    val pairBits = bc.join(cx, Seq("prev"))
      .orderBy(desc("cnt2"), asc("prev"), asc("word")).limit(topPairs)
      .select(concat(col("prev"), lit(" "), col("word")).as("pair"),
        (length(bin(expr("ctx div cnt2"))) - 1).cast("long").as("bits"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val totalTokens = total.collect()(0).getLong(0)
    (wordBits, pairBits,
      java.lang.Long.toBinaryString(math.max(totalTokens, 1L)).length - 1L)
  }

  /** The frozen-fit exporter for the streaming surprisal scorer: the
    * top-`topWords` unigram bits table (the [[surprisalBits]]
    * arithmetic, capped so driver state is bounded — the DSIR
    * posterior-table convention) plus the unseen-word bits under
    * count-1 smoothing, floor(log₂(total)) — the score a word outside
    * the capped vocabulary receives. Returns (wordBits, unseenBits).
    */
  def surprisalFitTop(documents: DataFrame, topWords: Int)
      : (Seq[(String, Long)], Long) = {
    val w = documents.select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    val wc = w.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = wc.agg(sum(col("cnt")).as("t"))
    val bitsRows = wc.crossJoin(broadcast(total))
      .orderBy(desc("cnt"), asc("word")).limit(topWords)
      .select(col("word"),
        (length(bin(expr("t div cnt"))) - 1).cast("long").as("bits"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val totalTokens = total.collect()(0).getLong(0)
    (bitsRows, java.lang.Long.toBinaryString(totalTokens).length - 1L)
  }

  /** [[packSequences]] in TOKENIZER units (round 14): identical
    * concat-then-chunk bin semantics, but each document is priced by
    * the fitted BPE artifact — Σ over its words of n_bpe (OOV → char
    * count, the [[bpeEncodeWithMerges]] rule) — instead of the regex
    * token heuristic. Production budgets are tokenizer tokens; a pack
    * frame priced in the wrong currency mis-sizes every training
    * batch downstream. Documents with NULL/empty text price at 0 and
    * still pack (they occupy no budget), matching the heuristic
    * packer's inclusion semantics.
    *
    * Scale shape: ONE extra corpus explode joined to the broadcast
    * vocab-sized table, aggregated per doc (counts shuffle, text does
    * not); then the same bounded per-(source, shard) windows.
    */
  def packSequencesBpe(documents: DataFrame, wordTokens: DataFrame,
                       budgetTokens: Long, shardDocs: Long): DataFrame =
    bpeBinFrame(documents, wordTokens, budgetTokens, shardDocs)
      .groupBy("source", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "shard", "bin")

  /** PACK MANIFEST (round 14): the loader handoff [[packSequencesBpe]]
    * summarizes — one row per document with its bin AND its token
    * offset inside the bin's concatenated stream (offset = tokens of
    * the bin's earlier documents). A training data-loader consumes
    * exactly this relation: seek to (bin, offset), read n_tokens. The
    * offset is the bin-local rebase of the same prefix sum that
    * assigned the bin, so the manifest costs one extra window MIN per
    * bin over the already-bounded (source, shard) partitions.
    */
  def packManifestBpe(documents: DataFrame, wordTokens: DataFrame,
                      budgetTokens: Long, shardDocs: Long): DataFrame = {
    val binStart = Window.partitionBy("source", "shard", "bin")
    bpeBinFrame(documents, wordTokens, budgetTokens, shardDocs)
      .withColumn("tok_offset",
        col("cum_before") - min("cum_before").over(binStart))
      .select("source", "shard", "bin", "doc_id", "n_tokens", "tok_offset")
      .orderBy("source", "shard", "bin", "doc_id")
  }

  /** The shared tokenizer-priced prefix-sum frame behind the BPE pack
    * family: (source, shard, doc_id, n_tokens, cum_before, bin) with
    * n_tokens = Σ n_bpe over the document's words (OOV → char count;
    * NULL/empty text → 0, still packed).
    */
  private def bpeBinFrame(documents: DataFrame, wordTokens: DataFrame,
                          budgetTokens: Long, shardDocs: Long): DataFrame = {
    val priced = documents
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .join(broadcast(wordTokens), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("n_bpe"), length(col("word")).cast("long")))
        .as("__n"))
    val toks = documents.select(col("source"),
        expr(s"doc_id div $shardDocs").as("shard"), col("doc_id"))
      .join(priced, Seq("doc_id"), "left")
      .select(col("source"), col("shard"), col("doc_id"),
        coalesce(col("__n"), lit(0L)).as("n_tokens"))
    val before = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("cum_before", coalesce(sum("n_tokens").over(before), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $budgetTokens"))
  }

  /** Packing-efficiency audit over [[packSequences]]: per source, how
    * full the bins actually are — n_bins, packed tokens, the worst
    * single bin (bins can EXCEED the budget when a document straddles a
    * boundary: bin assignment is by pre-document cumulative tokens, the
    * no-document-splitting policy), and fill_ppm = packed·10⁶ ∕
    * (n_bins·budget). This is the number you tune `budgetTokens`
    * against: a low fill means the budget fragments against the
    * document-length distribution. Same inputs, one extra rollup — the
    * audit costs one aggregation over the (already tiny) bin frame.
    */
  def packUtilization(documents: DataFrame, budgetTokens: Long,
                      shardDocs: Long): DataFrame =
    packSequences(documents, budgetTokens, shardDocs)
      .groupBy("source")
      .agg(count(lit(1)).as("n_bins"),
        sum("bin_tokens").as("packed_tokens"),
        max("bin_tokens").as("max_bin_tokens"))
      .withColumn("fill_ppm",
        expr(s"packed_tokens * 1000000L div (n_bins * ${budgetTokens}L)"))
      .select("source", "n_bins", "packed_tokens", "max_bin_tokens",
        "fill_ppm")
      .orderBy("source")

  /** L4 — QUALITY-SIGNAL AGREEMENT MATRIX (VERDICT r13 #3): the engine
    * now ships three independent keep/drop signals — the heuristic
    * quality filter ([[textQuality]] thresholds), the DSIR importance
    * gate ([[importanceResample]]'s deterministic md5 selection), and
    * the unigram-surprisal filter ([[surprisalBits]] under a bits-q8
    * cap) — and a pipeline that stacks filters without measuring their
    * overlap is guessing at its own selectivity. Per ordered signal
    * pair (a < b lexicographically), the exact-integer confusion
    * counts over every document carrying at least one word (the common
    * domain of all three signals) plus the agreement rate in ppm:
    * near-10⁶ agreement means the filters are redundant (drop one);
    * near-random means they see DIFFERENT failure modes (keep both,
    * or gate on votes).
    *
    * Scale shape: three already-audited corpus passes (each map-side
    * arithmetic + a broadcast vocab/bucket table), two doc-keyed
    * equi-joins to align the flags, then a 3× row explode into the
    * 3-row output aggregate. Nothing new shuffles document text.
    */
  def qualitySignalAgreement(documents: DataFrame, target: DataFrame,
                             stopwords: Seq[String], minWords: Long,
                             maxStopwordPpm: Long, numBuckets: Int,
                             maxBitsQ8: Long): DataFrame = {
    val flags = qualitySignalVotes(documents, target, stopwords, minWords,
      maxStopwordPpm, numBuckets, maxBitsQ8)
    val pairs = flags.select(explode(array(
      struct(lit("dsir").as("sig_a"), lit("quality").as("sig_b"),
        col("k_dsir").as("ka"), col("k_quality").as("kb")),
      struct(lit("dsir").as("sig_a"), lit("surprisal").as("sig_b"),
        col("k_dsir").as("ka"), col("k_surprisal").as("kb")),
      struct(lit("quality").as("sig_a"), lit("surprisal").as("sig_b"),
        col("k_quality").as("ka"), col("k_surprisal").as("kb")))).as("p"))
    pairs.select(col("p.sig_a").as("sig_a"), col("p.sig_b").as("sig_b"),
        col("p.ka").as("ka"), col("p.kb").as("kb"))
      .groupBy("sig_a", "sig_b")
      .agg(sum(col("ka") * col("kb")).as("both_keep"),
        sum(col("ka") * (lit(1L) - col("kb"))).as("a_only_keep"),
        sum((lit(1L) - col("ka")) * col("kb")).as("b_only_keep"),
        sum((lit(1L) - col("ka")) * (lit(1L) - col("kb"))).as("both_drop"),
        count(lit(1)).as("n_docs"))
      .withColumn("agree_ppm",
        expr("(both_keep + both_drop) * 1000000L div n_docs"))
      .orderBy("sig_a", "sig_b")
  }

  /** FOUR-SIGNAL AGREEMENT MATRIX (round 15) —
    * [[qualitySignalAgreement]] extended with the bigram fluency
    * signal ([[surprisalBigramBits]]' keep flag at `maxBiQ8`): all six
    * pairwise confusion rows over heuristic / DSIR / unigram-surprisal
    * / bigram-fluency. The bigram column is the one that can DISAGREE
    * with unigram surprisal on templated text (same word mix,
    * deterministic transitions) — its (surprisal, bigram) row is the
    * direct measure of how much fluency information the ensemble
    * gains; near-10⁶ agreement there would say the fourth signal is
    * redundant and not worth its pass. Same one-explode rollup as the
    * 3-signal matrix; the original key stays hash-pinned untouched.
    */
  def qualitySignalAgreement4(documents: DataFrame, target: DataFrame,
                              stopwords: Seq[String], minWords: Long,
                              maxStopwordPpm: Long, numBuckets: Int,
                              maxBitsQ8: Long, maxBiQ8: Long): DataFrame = {
    val flags = qualitySignalVotes(documents, target, stopwords, minWords,
      maxStopwordPpm, numBuckets, maxBitsQ8)
      .join(surprisalBigramBits(documents, maxBiQ8)
        .select(col("doc_id"), col("keep").as("k_bigram")), Seq("doc_id"))
    def pair(a: String, b: String) =
      struct(lit(a).as("sig_a"), lit(b).as("sig_b"),
        col(s"k_$a").as("ka"), col(s"k_$b").as("kb"))
    flags.select(explode(array(
        pair("bigram", "dsir"), pair("bigram", "quality"),
        pair("bigram", "surprisal"), pair("dsir", "quality"),
        pair("dsir", "surprisal"), pair("quality", "surprisal"))).as("p"))
      .select(col("p.sig_a").as("sig_a"), col("p.sig_b").as("sig_b"),
        col("p.ka").as("ka"), col("p.kb").as("kb"))
      .groupBy("sig_a", "sig_b")
      .agg(sum(col("ka") * col("kb")).as("both_keep"),
        sum(col("ka") * (lit(1L) - col("kb"))).as("a_only_keep"),
        sum((lit(1L) - col("ka")) * col("kb")).as("b_only_keep"),
        sum((lit(1L) - col("ka")) * (lit(1L) - col("kb"))).as("both_drop"),
        count(lit(1)).as("n_docs"))
      .withColumn("agree_ppm",
        expr("(both_keep + both_drop) * 1000000L div n_docs"))
      .orderBy("sig_a", "sig_b")
  }

  /** ENSEMBLE QUALITY VOTES (VERDICT r14 #6) — the per-document flag
    * frame behind [[qualitySignalAgreement]], now a first-class verb:
    * (doc_id, k_quality, k_surprisal, k_dsir, ensemble_keep) over every
    * document carrying at least one word, where `ensemble_keep` is the
    * MAJORITY vote (≥ 2 of 3 signals keep). The agreement matrix told a
    * pipeline whether its filters are redundant; this is the DECISION a
    * pipeline gates on — a single filter's failure mode (heuristic
    * fooled by listy text, DSIR fooled by on-distribution spam,
    * surprisal fooled by rare-word soup) needs a second signal to
    * agree before a document is kept. Three already-audited map-side
    * passes + two doc-keyed equi-joins; text never shuffles.
    */
  def qualitySignalVotes(documents: DataFrame, target: DataFrame,
                         stopwords: Seq[String], minWords: Long,
                         maxStopwordPpm: Long, numBuckets: Int,
                         maxBitsQ8: Long): DataFrame = {
    val kQuality = textQuality(documents, stopwords)
      .select(col("doc_id"),
        (col("n_words") >= minWords && col("stopword_ppm") < maxStopwordPpm)
          .cast("long").as("k_quality"))
    val kSurprisal = surprisalBits(documents)
      .select(col("doc_id"),
        (col("bits_q8") <= maxBitsQ8).cast("long").as("k_surprisal"))
    val kDsir = importanceWeights(documents, target, numBuckets)
      .select(col("doc_id"),
        (Relational.hashBucketPpm(col("doc_id"), "dsir:") < col("dsir_ppm"))
          .cast("long").as("k_dsir"))
    kQuality.join(kSurprisal, Seq("doc_id"))
      .join(kDsir, Seq("doc_id"))
      .withColumn("ensemble_keep",
        (col("k_quality") + col("k_surprisal") + col("k_dsir") >= 2L)
          .cast("long"))
  }

  /** L4 — CORPUS DATA CARD (round 14): the per-(source, lang) summary
    * relation a dataset release publishes — document and token and
    * char volumes, the exact-duplicate count (documents whose md5
    * matches ANY other document's, computed with one window over the
    * GLOBAL fingerprint partition so cross-source duplicates count in
    * both sources' rows), and the corpus-level stopword rate in ppm.
    * Everything integer-exact in one pass + one fingerprint window +
    * one rollup; text never shuffles (the md5 window moves 16-byte
    * keys).
    */
  def dataCard(documents: DataFrame, stopwords: Seq[String]): DataFrame = {
    val byFp = Window.partitionBy(md5(col("text")))
    documents
      .withColumn("nw", size(words(col("text"))).cast("long"))
      .withColumn("sc", stopCount(words(col("text")), stopwords))
      .withColumn("is_dup",
        (count(lit(1)).over(byFp) > 1).cast("long"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("nw"), lit(0L)).as("n_tokens"),
        coalesce(sum("n_chars"), lit(0L)).as("n_chars"),
        sum("is_dup").as("n_exact_dup"),
        coalesce(sum("sc"), lit(0L)).as("__sc"))
      .withColumn("stopword_ppm",
        expr("case when n_tokens = 0 then 0L " +
          "else __sc * 1000000L div n_tokens end"))
      .select("source", "lang", "n_docs", "n_tokens", "n_chars",
        "n_exact_dup", "stopword_ppm")
      .orderBy("source", "lang")
  }

  /** RELEASE CARD DIFF (round 15) — the relation a corpus RELEASE
    * publishes beside its card: per (source, lang), what changed since
    * the previous release. Old and new releases each build their own
    * [[dataCard]] (duplicate status is within-release by definition —
    * a takedown can turn yesterday's duplicate into today's unique),
    * then full-outer-join on (source, lang) with zero-coalesced sides
    * so a source that appears or vanishes wholesale still reports.
    * Negative deltas are takedown mass; a rising exact_dup_delta says
    * the ingest re-crawled content the release already carried — the
    * audit that catches a mis-configured ingest before training does.
    *
    * Scale shape: two card passes (each one rollup + one 16-byte
    * fingerprint window) + one card-sized join — the diff itself is
    * bounded by |sources × langs|, never by the corpus.
    */
  def dataCardDiff(oldDocs: DataFrame, newDocs: DataFrame,
                   stopwords: Seq[String]): DataFrame = {
    def side(docs: DataFrame, tag: String) = dataCard(docs, stopwords)
      .select(col("source"), col("lang"),
        col("n_docs").as(s"docs_$tag"),
        col("n_tokens").as(s"tokens_$tag"),
        col("n_exact_dup").as(s"dup_$tag"),
        col("stopword_ppm").as(s"ppm_$tag"))
    side(oldDocs, "old")
      .join(side(newDocs, "new"), Seq("source", "lang"), "full_outer")
      .select(col("source"), col("lang"),
        coalesce(col("docs_old"), lit(0L)).as("docs_old"),
        coalesce(col("docs_new"), lit(0L)).as("docs_new"),
        (coalesce(col("docs_new"), lit(0L))
          - coalesce(col("docs_old"), lit(0L))).as("docs_delta"),
        (coalesce(col("tokens_new"), lit(0L))
          - coalesce(col("tokens_old"), lit(0L))).as("tokens_delta"),
        (coalesce(col("dup_new"), lit(0L))
          - coalesce(col("dup_old"), lit(0L))).as("exact_dup_delta"),
        (coalesce(col("ppm_new"), lit(0L))
          - coalesce(col("ppm_old"), lit(0L))).as("stopword_ppm_delta"))
      .orderBy("source", "lang")
  }

  /** L4 — DATA CARD v2 (VERDICT r14 #5): [[dataCard]] upgraded to the
    * card a release actually publishes — token volume priced in
    * TOKENIZER units (`bpe_tokens`: the frozen [[bpeWordTokens]]
    * artifact, OOV → character count — the same pricing the pack
    * family spends), and near-duplicate mass (`n_neardup`: documents
    * with at least one VERIFIED Jaccard ≥ `minJaccardPct` partner —
    * candidates from the banded LSH join, never all-pairs; a raw
    * band-bucket membership saturates on a small shared vocabulary,
    * measured at 508/510 on the card fixture, so the verify stage is
    * what makes the column informative — a superset of the exact-dup
    * column since identical texts verify at J=100). The original
    * [[dataCard]] stays untouched (hash-pinned).
    *
    * Scale shape: one extra broadcast-vocab join + per-doc rollup for
    * the pricing, and the banded-candidate verify pass every dedup
    * query already runs.
    */
  def dataCardV2(documents: DataFrame, stopwords: Seq[String],
                 wordTokens: DataFrame, numHashes: Int, rowsPerBand: Int,
                 minJaccardPct: Int): DataFrame = {
    import graft.operators.DedupOps
    val priced = documents
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .join(broadcast(wordTokens), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("n_bpe"), length(col("word")).cast("long")))
        .as("__nb"))
    val pairs = DedupOps.lshVerifiedJaccardPairsUnsorted(
      documents.select("doc_id", "text"), numHashes, rowsPerBand,
      minJaccardPct)
    val members = pairs.select(col("a_id").as("doc_id"))
      .unionByName(pairs.select(col("b_id").as("doc_id")))
      .distinct()
      .withColumn("__nd", lit(1L))
    val byFp = Window.partitionBy(md5(col("text")))
    documents
      .join(priced, Seq("doc_id"), "left")
      .join(members, Seq("doc_id"), "left")
      .withColumn("nw", size(words(col("text"))).cast("long"))
      .withColumn("sc", stopCount(words(col("text")), stopwords))
      .withColumn("is_dup", (count(lit(1)).over(byFp) > 1).cast("long"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("nw"), lit(0L)).as("n_tokens"),
        coalesce(sum(coalesce(col("__nb"), lit(0L))), lit(0L))
          .as("bpe_tokens"),
        coalesce(sum("n_chars"), lit(0L)).as("n_chars"),
        sum("is_dup").as("n_exact_dup"),
        sum(coalesce(col("__nd"), lit(0L))).as("n_neardup"),
        coalesce(sum("sc"), lit(0L)).as("__sc"))
      .withColumn("stopword_ppm",
        expr("case when n_tokens = 0 then 0L " +
          "else __sc * 1000000L div n_tokens end"))
      .select("source", "lang", "n_docs", "n_tokens", "bpe_tokens",
        "n_chars", "n_exact_dup", "n_neardup", "stopword_ppm")
      .orderBy("source", "lang")
  }

  /** Vocabulary coverage curve: for each coverage threshold (in ppm of
    * all token occurrences), the number of most-frequent word types
    * needed to reach it — the "how big must the vocab be to cover 99%?"
    * question every tokenizer-training pipeline asks. Rank words by
    * (count desc, word asc — total order), prefix-sum the counts, and
    * report the first rank whose cumulative share meets each threshold.
    *
    * Scale shape: the corpus-wide scans are a map-side-combined word
    * count plus one scalar token total; the only global sort is
    * `orderBy.limit(maxRank)` — a TakeOrderedAndProject over the
    * ALREADY-AGGREGATED vocab, so the single-partition window that
    * follows touches at most `maxRank` rows regardless of corpus size.
    * The cumulative products run in Decimal(38,0) (oracle: HUGEINT):
    * cum_cnt·10⁶ overflows a long past ~9·10¹² tokens.
    *
    * A threshold unreachable within `maxRank` ranks yields no output row
    * (inner-join semantics) — size `maxRank` to the vocab you're willing
    * to keep.
    */
  def vocabCoverage(documents: DataFrame, thresholdsPpm: Seq[Long],
                    maxRank: Int): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val wc = documents
      .select(explode(words(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
    val total = wc.agg(sum(col("cnt")).as("total_tokens"))
    val byFreq = Window.orderBy(col("cnt").desc, col("word"))
    val ranked = wc.orderBy(col("cnt").desc, col("word")).limit(maxRank)
      .select(col("cnt"),
        row_number().over(byFreq).cast("long").as("rank"),
        sum(col("cnt")).over(
          byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_cnt"))
    val thresholds = documents.sparkSession
      .createDataFrame(thresholdsPpm.map(Tuple1(_)))
      .toDF("threshold_ppm")
    ranked
      .crossJoin(broadcast(total))
      .crossJoin(broadcast(thresholds))
      .filter(col("cum_cnt").cast(d38) * lit(1000000L) >=
        col("threshold_ppm").cast(d38) * col("total_tokens").cast(d38))
      .groupBy("threshold_ppm")
      .agg(min(col("rank")).as("rank_needed"),
        min_by(col("cum_cnt"), col("rank")).as("cum_cnt"),
        min(col("total_tokens")).as("total_tokens"))
      .orderBy("threshold_ppm")
  }

  /** DOMAIN-MIXTURE EPOCH PLANNER: given per-source token supply and a
    * declared target mixture (weights relation `(source, weight_ppm)`),
    * compute how many passes (epochs, in ppm) over each source a
    * training run must take to hit a global `budgetTokens` at the
    * declared mixture — the Pile/DoReMi-style "how often do we repeat
    * Wikipedia vs CommonCrawl" table. epochs_ppm > 10⁶ means
    * upsampling (repetition), < 10⁶ downsampling.
    *
    * Semantics are exact-integer and loud:
    *  - `target_tokens = budgetTokens · weight_ppm div 10⁶` and
    *    `epochs_ppm = target_tokens · 10⁶ div tokens_have`, both in
    *    Decimal(38,0) — a 100 TB budget (~2·10¹³ tokens) × 10⁶ passes
    *    2⁶³, so Long arithmetic is wrong at exactly the scale this
    *    table exists for. Outputs cast back to BIGINT (ANSI: an
    *    implausible quotient overflows loudly, never wraps).
    *  - A PLANNED source with weight > 0 but zero supplied tokens
    *    `raise_error`s: a domain the mixture calls for that the corpus
    *    cannot serve means the run silently trains on a different
    *    mixture than declared — the same silent-contamination class as
    *    a leaky split, so it fails the plan, not the training run.
    *  - An OBSERVED source absent from the weights relation gets
    *    weight 0 / target 0 / epochs 0 — visible in the output row,
    *    not dropped (ADVICE-r9 null-join lesson: full-outer, never
    *    inner, so neither side's rows can vanish).
    *  - A MALFORMED weights relation fails loudly: a duplicate source
    *    row (which would silently fan out the join into two planner
    *    rows for one source) or a negative weight both `raise_error`
    *    inside the plan.
    *
    * Tokens are the engine's BPE-ish token count ([[tokenCounts]]'s
    * regex), so the plan and the per-doc accounting agree.
    *
    * Scale shape: one map-side-combined aggregate to source grain,
    * then a full-outer join at |sources| cardinality (dozens of rows at
    * any corpus size) — document text never shuffles.
    */
  def mixtureEpochs(documents: DataFrame, weights: DataFrame,
                    budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    val supply = documents
      .select(col("source"),
        tokenCountCol(col("text")).as("n_tok"))
      .groupBy("source")
      .agg(sum(col("n_tok")).as("tokens_have"))
    // Validate the weights RELATION the way constraint names are
    // validated (the r10 lesson — reject, don't document): a duplicate
    // source row would silently fan out the full-outer join (two
    // planner rows for one source), and a negative weight is a
    // nonsense plan — both fail loudly inside the plan, at |sources|
    // cost.
    val w = weights
      .groupBy(col("source"))
      .agg(count(lit(1)).as("__w_cnt"),
        max(col("weight_ppm").cast("long")).as("__w"))
      .select(col("source"), expr(
        "CASE WHEN __w_cnt > 1 THEN CAST(raise_error(" +
          "'mixtureEpochs: duplicate weight row for source ' || " +
          "coalesce(source, 'NULL')) AS BIGINT) " +
          "WHEN __w IS NULL THEN CAST(raise_error(" +
          "'mixtureEpochs: NULL weight_ppm for source ' || " +
          "coalesce(source, 'NULL')) AS BIGINT) " +
          "WHEN __w < 0 THEN CAST(raise_error(" +
          "'mixtureEpochs: negative weight_ppm for source ' || " +
          "coalesce(source, 'NULL')) AS BIGINT) " +
          "ELSE __w END").as("weight_ppm"))
    // <=> not a USING join: a NULL source grouping on the supply side
    // must meet a NULL-source weight row as ONE planner row — the
    // non-null-safe form splits them in two and the weight half, seeing
    // tokens_have 0, spuriously trips the unservable guard
    supply.as("s")
      .join(w.as("w"), col("s.source") <=> col("w.source"), "full_outer")
      .select(coalesce(col("s.source"), col("w.source")).as("source"),
        coalesce(col("tokens_have"), lit(0L)).as("tokens_have"),
        coalesce(col("weight_ppm"), lit(0L)).as("weight_ppm"))
      .withColumn("target_tokens", expr(
        s"CAST(CAST($budgetTokens AS DECIMAL(38,0)) " +
          "* CAST(weight_ppm AS DECIMAL(38,0)) div 1000000 AS BIGINT)"))
      .withColumn("epochs_ppm", expr(
        "CASE WHEN tokens_have = 0 AND target_tokens > 0 THEN " +
          "CAST(raise_error('mixtureEpochs: planned source ' || " +
          "coalesce(source, 'NULL') || " +
          "' has weight > 0 but zero supplied tokens — the declared " +
          "mixture is unservable') AS BIGINT) " +
          "WHEN tokens_have = 0 THEN 0L " +
          "ELSE CAST(CAST(target_tokens AS DECIMAL(38,0)) * 1000000 " +
          "div CAST(tokens_have AS DECIMAL(38,0)) AS BIGINT) END"))
      .orderBy("source")
  }

  /** Portable hashed-feature bucket: the first 8 hex chars of md5,
    * decoded as an integer, mod `buckets` — the same md5-prefix decode
    * as [[DedupOps.md5Hash60]] truncated to 32 bits, so any SQL engine
    * replays the identical bucket id. Hashing is what bounds
    * importance-resampling state: a 100 TB corpus's unbounded vocabulary
    * folds into a FIXED 2^k-row feature table.
    */
  def hashBucket(c: Column, buckets: Int): Column =
    pmod(conv(substring(md5(c), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** L4 — DSIR-style hashed-unigram importance score for data
    * selection (after Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling": score raw documents by how
    * target-like their hashed n-gram bag is, then resample by the
    * score). Tokens hash into `numBuckets` buckets ([[hashBucket]]);
    * bucket unigram distributions are estimated for the TARGET corpus
    * and the RAW corpus with add-one smoothing; each document's score
    * is the mean per-token posterior `P(target | bucket)` under equal
    * priors, in ppm.
    *
    * DSIR proper sums `log(p_target/p_raw)`; libm `log` differs in the
    * last ulp across engines and would break hash-exact oracle
    * comparison (the [[rarityScores]] precedent), so the engine scores
    * with the log-free PER-TOKEN posterior `p_t/(p_t+p_r)` and
    * averages. The monotone equivalence is PER FEATURE ONLY: for a
    * single token, posterior and log-ratio order identically — but the
    * DOCUMENT score (mean of posteriors) is NOT rank-equivalent to
    * DSIR's sum of log-ratios (a bounded mean and an unbounded sum
    * weight extreme tokens differently), so document-level rankings —
    * and hence the resampled set — can differ from log-ratio DSIR
    * (ADVICE r10). The trade is deliberate: an oracle-checkable,
    * overflow-free integer score with the same feature-level signal.
    * Exact integer arithmetic throughout:
    * `post = (t_c+1)(R+B)·10⁶ div [(t_c+1)(R+B) + (r_c+1)(T+B)]`
    * in Decimal(38,0) (t_c ≤ 10¹⁴ tokens times R ≤ 10¹⁵ stays under
    * 10³⁸ at any real corpus size — the [[mixtureEpochs]] Decimal
    * discipline, no overflow cliff).
    *
    * Degenerate inputs: an EMPTY target corpus fails loudly (the target
    * distribution is undefined — the kappa n=0 stance); NULL-text docs
    * tokenize to nothing and drop from the output (a meaningless mean,
    * not a zero score).
    *
    * Scale shape: ONE corpus tokenization pass. The tokenize+md5 work
    * lands in a lineage-truncated (doc, bucket, cnt) frame
    * ([[Lineage.truncate]] — `spark.graft.checkpointDir` flips to
    * reliable checkpoints) from which BOTH halves of DSIR's
    * fit-then-score structure derive: the raw bucket distribution is a
    * re-aggregation of the truncated counts (never a second text
    * scan), and the per-doc score folds `cnt·post` over the same
    * frame after the broadcast (parameter — r10 hint discipline)
    * posterior join. A/B'd at sf0.1 ([[graft.DsirAB]], binding record
    * in SCALE.md): the fused form beat the two-pass original ~20-30%
    * locally across both sessions, and at 100 TB it halves the
    * dominant cost — corpus text scans. Document text shuffles
    * NOWHERE; the only wide state is the 2^k bucket table, constant
    * in corpus size — which is precisely DSIR's pitch.
    */
  def importanceWeights(documents: DataFrame, target: DataFrame,
                        numBuckets: Int = 1024,
                        broadcastBuckets: Boolean = true,
                        checkpointDir: Option[String] = None): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    // generators can't nest inside expressions — explode to a word
    // column first, bucket in the next projection
    val docB = Lineage.truncate(
      documents
        .select(col("doc_id"), explode(words(col("text"))).as("word"))
        .select(col("doc_id"), hashBucket(col("word"), numBuckets).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("cnt")),
      checkpointDir)
    // the derived ≤2^k-row raw frame is truncated too: its two
    // consumers inside posteriorsFromCounts (totals fold + posterior
    // join) would otherwise each re-aggregate the corpus-sized docB
    // checkpoint
    val raw = Lineage.truncate(
      docB.groupBy("b").agg(sum("cnt").as("r_c")), checkpointDir)
    val posts = posteriorsFromCounts(raw,
      targetBucketCounts(target, numBuckets, checkpointDir), numBuckets)
    val bt = if (broadcastBuckets) broadcast(posts) else posts
    docB.join(bt, Seq("b"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_tokens"),
        sum(expr("cnt * post_ppm")).as("post_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("post_sum div n_tokens").as("dsir_ppm"))
      .orderBy("doc_id")
  }

  /** The FIT phase of [[importanceWeights]], exposed on its own: the
    * `numBuckets`-row posterior table (b, post_ppm) estimated from the
    * raw and target corpora — one bucket aggregate over each, totals
    * folded from the (lineage-truncated) bucket frames. Consumed by
    * the batch scorer above (broadcast join) and collectible for the
    * streaming scorer ([[graft.streaming.StreamingOps.scoreDsirStream]]
    * compiles it into a literal map — legitimate driver state because
    * the table is FIXED 2^k rows at any corpus size). Buckets absent
    * from the RAW corpus are absent here; a scorer meeting one (a
    * token the fit never saw) uses [[importanceUnseenPpm]].
    */
  def importancePosteriors(documents: DataFrame, target: DataFrame,
                           numBuckets: Int = 1024,
                           checkpointDir: Option[String] = None): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val raw = Lineage.truncate(
      documents
        .select(explode(words(col("text"))).as("word"))
        .select(hashBucket(col("word"), numBuckets).as("b"))
        .groupBy("b").agg(count(lit(1)).as("r_c")), checkpointDir)
    posteriorsFromCounts(raw,
      targetBucketCounts(target, numBuckets, checkpointDir), numBuckets)
  }

  /** The target corpus's bucket counts (b, t_c), lineage-truncated —
    * shared by the standalone fit and the fused batch scorer.
    */
  private def targetBucketCounts(target: DataFrame, numBuckets: Int,
                                 checkpointDir: Option[String]): DataFrame =
    Lineage.truncate(
      target
        .select(explode(words(col("text"))).as("word"))
        .select(hashBucket(col("word"), numBuckets).as("b"))
        .groupBy("b").agg(count(lit(1)).as("t_c")), checkpointDir)

  /** The posterior arithmetic over (b, r_c) × (b, t_c) count frames —
    * ONE definition (add-one smoothing, Decimal(38,0) products, the
    * oracle's truncation order) consumed by both entry points above so
    * the fused and standalone forms cannot drift.
    *
    * FULL OUTER on the bucket id: when the target is NOT a subset of
    * the raw corpus (DSIR's canonical external-target use), a bucket
    * populated only by target tokens still gets its proper smoothed
    * posterior — a left join would silently drop exactly the
    * strongest target-signal buckets, and a streaming scorer meeting
    * such a token would mis-score it as never-seen. Batch scoring is
    * unaffected either way (raw tokens can only hit raw buckets), so
    * the declared oracle keeps its LEFT JOIN form — equal by
    * construction on the declared query's target ⊆ documents.
    */
  private def posteriorsFromCounts(raw: DataFrame, tgt: DataFrame,
                                   numBuckets: Int): DataFrame = {
    val b = lit(numBuckets.toLong)
    val rTot = raw.agg(coalesce(sum("r_c"), lit(0L)).as("r_tot"))
    val tTot = tgt.agg(coalesce(sum("t_c"), lit(0L)).as("t_tot"))
      .select(expr(
        "CASE WHEN t_tot = 0 THEN CAST(raise_error(" +
          "'importanceWeights: empty target corpus — the target " +
          "unigram distribution is undefined') AS BIGINT) " +
          "ELSE t_tot END").as("t_tot"))
    raw.join(tgt, Seq("b"), "full_outer")
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(tTot))
      .select(col("b"),
        ((coalesce(col("t_c"), lit(0L)) + lit(1L))
          .cast(DecimalType(19, 0)) *
          (col("r_tot") + b).cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0)).as("num"),
        ((coalesce(col("r_c"), lit(0L)) + lit(1L))
          .cast(DecimalType(19, 0)) *
          (col("t_tot") + b).cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0)).as("den"))
      .select(col("b"),
        expr("num * 1000000 div (num + den)").as("post_ppm"))
  }

  /** The smoothed posterior of a bucket NEITHER corpus populated
    * (t_c = r_c = 0): `(R+B)·10⁶ div ((R+B) + (T+B))` — what a scorer
    * should assign a token the fit never saw. Driver-side arithmetic
    * over the two token totals (BigInt, same truncation as the plan).
    */
  def importanceUnseenPpm(rawTokens: Long, targetTokens: Long,
                          numBuckets: Int): Long = {
    val num = BigInt(rawTokens) + numBuckets
    val den = BigInt(targetTokens) + numBuckets
    ((num * 1000000) / (num + den)).toLong
  }

  /** In-PLAN form of [[importanceUnseenPpm]] (VERDICT r10 #6): one row
    * (r_tot, t_tot, unseen_ppm) computed from the two corpora inside
    * the engine — the streaming scorer's fallback constant as an
    * oracle-pinnable relation instead of driver-only arithmetic.
    * Same Decimal(38,0) products and truncating `div` as
    * `posteriorsFromCounts`, so the emitted constant provably equals
    * what a fit over these corpora implies (Round11 spec additionally
    * pins it equal to the driver-side function).
    *
    * Scale shape: two map-side-combined global counts (no text
    * shuffle), a 1×1 broadcast cross join, constant output.
    */
  def importanceUnseenTable(documents: DataFrame, target: DataFrame,
                            numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val r = documents.select(explode(words(col("text"))).as("w"))
      .agg(count(lit(1)).cast("long").as("r_tot"))
    val t = target.select(explode(words(col("text"))).as("w"))
      .agg(count(lit(1)).cast("long").as("t_tot"))
    r.crossJoin(broadcast(t))
      .select(col("r_tot"), col("t_tot"),
        expr(s"CAST((CAST(r_tot AS DECIMAL(38,0)) + $numBuckets) * 1000000 " +
          s"div ((CAST(r_tot AS DECIMAL(38,0)) + $numBuckets) " +
          s"+ (t_tot + $numBuckets)) AS BIGINT)").as("unseen_ppm"))
  }

  /** L4 — DSIR importance RESAMPLING: the selection step that completes
    * [[importanceWeights]] — keep each document with probability equal
    * to its target-posterior score (sample ∝ P(target | doc)), realized
    * as the deterministic md5 gate `hash_ppm('dsir:'||doc_id) <
    * dsir_ppm` ([[Relational.hashBucketPpm]]'s salted form — the gate
    * is DOMAIN-SEPARATED from [[Relational.assignSplit]]'s unsalted
    * key hash, ADVICE r10: with the same hash driving both, every
    * resample survivor would have a low bucket value, i.e. sit in the
    * train band, and composing resample→split on the same key would
    * silently starve val/test). Membership is a pure function of
    * the ids and the two corpora — identical on any cluster size,
    * partitioning, or retry (the stratified-sampling discipline: a
    * seeded `df.sample` changes membership whenever partitioning
    * changes, which silently breaks resumable pipelines).
    *
    * Scale shape: [[importanceWeights]]'s single fused tokenization
    * pass plus one map-side hash-compare — no additional shuffle or
    * pass.
    */
  def importanceResample(documents: DataFrame, target: DataFrame,
                         numBuckets: Int = 1024,
                         broadcastBuckets: Boolean = true,
                         checkpointDir: Option[String] = None): DataFrame =
    importanceWeights(documents, target, numBuckets, broadcastBuckets,
      checkpointDir)
      .withColumn("bucket_ppm",
        Relational.hashBucketPpm(col("doc_id"), "dsir:"))
      .filter(col("bucket_ppm") < col("dsir_ppm"))
      .select(col("doc_id"), col("n_tokens"), col("dsir_ppm"),
        col("bucket_ppm"))
      .orderBy("doc_id")

  /** L4 — quality-signal BIAS AUDIT: bucket documents on a bounded
    * quality score (stopword share in ppm, [[textQuality]]'s
    * arithmetic, fixed-width `nBuckets` grid over [0, 10⁶]) and report
    * each bucket's LANGUAGE composition. The calibration check every
    * quality-filtered corpus needs before the filter runs: stopword /
    * perplexity-proxy signals are built from high-resource-language
    * statistics, and a threshold that looks neutral globally can
    * silently evict one language's documents wholesale (the documented
    * failure mode of English-centric quality classifiers on
    * multilingual crawls). A language concentrated in the low-score
    * buckets here = that filter is a language filter in disguise.
    *
    * Fixed-width buckets, NOT ntile: a global ntile is a single-
    * partition total sort at corpus scale, while `score·n div (10⁶+1)`
    * is a map-side expression — and the audit wants ABSOLUTE score
    * bands anyway (the filter thresholds on the score, not the rank).
    *
    * NULL-text documents land in SENTINEL BUCKET −1 (their score is
    * undefined, not low) rather than dropping: a missing-text slice
    * correlated with a language or source is exactly the skewed
    * exclusion this audit exists to surface — silently omitting it
    * would be the ADVICE-r9 null-drop class inside the auditor itself.
    *
    * Scale shape: one map pass tokenizes ONCE, scores and buckets; two
    * map-side-combined aggregates to (bucket, lang) / bucket grain
    * (≤ (n+1)·|langs| rows at any corpus size) and a tiny-×-tiny join.
    * Text never shuffles.
    */
  def qualityLangBias(documents: DataFrame, stopwords: Seq[String],
                      nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    val scored = documents
      .select(col("lang"), words(col("text")).as("ws"))
      .select(col("lang"),
        size(col("ws")).cast("long").as("n_words"),
        stopCount(col("ws"), stopwords).as("stop_cnt"))
      .select(col("lang"),
        // NULL text → NULL ws → NULL arithmetic → sentinel −1
        coalesce(
          expr(s"(stop_cnt * 1000000L div n_words) * ${nBuckets}L " +
            "div 1000001L"),
          lit(-1L)).as("bucket"))
    val bl = scored.groupBy("bucket", "lang")
      .agg(count(lit(1)).as("n_docs"))
    val bt = bl.groupBy("bucket").agg(sum("n_docs").as("bucket_docs"))
    bl.join(bt, Seq("bucket"))
      .select(col("bucket"), col("lang"), col("n_docs"), col("bucket_docs"),
        expr("n_docs * 1000000L div bucket_docs").as("share_ppm"))
      .orderBy("bucket", "lang")
  }

  /** L4 — BPE tokenizer-merge fitting (Sennrich et al., ACL'16): the
    * tokenizer-training step of a training-data pipeline. Count every
    * word ONCE (the only corpus-sized pass), split each distinct word
    * into characters, then for `rounds` rounds: count adjacent symbol
    * pairs weighted by word frequency, pick the most frequent pair
    * (ties → lexicographically smallest (left, right) — deterministic
    * in both engines under binary collation), and merge it everywhere
    * (leftmost-nonoverlapping, [[graft.plans.BpeMergePair]]).
    *
    * Returns one row per round: (merge_round, lsym, rsym, pair_count,
    * corpus_symbols, vocab_symbols) where corpus_symbols =
    * Σ freq·|syms| AFTER the merge (the token count the fitted
    * tokenizer would emit on the corpus — strictly decreasing) and
    * vocab_symbols = the distinct-symbol count after the merge.
    *
    * Scale shape: after the one corpus pass, EVERY round operates on
    * the distinct-word table (vocab-sized — millions of rows at 100 TB,
    * bounded regardless of corpus size), so fitting cost is
    * O(corpus + rounds · vocab). Driver state per round is one best-pair
    * row and two accounting scalars (the bounded-collect convention of
    * the IVF centroid loop); the vocab frame itself stays distributed,
    * persisted per round and released as the next round lands. Stops
    * early (fewer output rows) only if the vocabulary runs out of
    * adjacent pairs — the declared query's (rounds, topWords) are sized
    * so it never does on the shipped corpora.
    */
  def bpeFit(documents: DataFrame, rounds: Int, topWords: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    bpeFitCached(documents, rounds, topWords)
      .toDF("merge_round", "lsym", "rsym", "pair_count",
        "corpus_symbols", "vocab_symbols")
      .orderBy("merge_round")
  }

  /** Session-identity-keyed memo of fitted merge tables (the
    * [[SimilarityOps]] centroid-cache discipline: a tokenizer refitted
    * per query is no tokenizer). Values are plain driver rows —
    * `rounds` tuples, nothing to release; stopped sessions' entries are
    * swept on each lookup. Keyed by the semantic hash of the input
    * frame's analyzed plan COMBINED with the data fingerprint of the
    * files under it ([[graft.sources.StorageOps.filesFingerprint]] —
    * VERDICT r13 #4): different corpora never share merges, and a
    * mid-session rewrite of the files at the same path now moves the
    * fingerprint and forces a refit instead of serving stale merges
    * (Round14OpsSpec pins the refit on a mutated temp-copy parquet).
    */
  private final class SessionRef(val s: org.apache.spark.sql.SparkSession) {
    override def hashCode(): Int = System.identityHashCode(s)
    override def equals(o: Any): Boolean = o match {
      case r: SessionRef => r.s eq s
      case _ => false
    }
  }
  private val bpeMergeCache = new java.util.concurrent.ConcurrentHashMap[
    (SessionRef, Int, Int, Int), Seq[(Long, String, String, Long, Long, Long)]]()

  private def bpeFitCached(documents: DataFrame, rounds: Int, topWords: Int)
      : Seq[(Long, String, String, Long, Long, Long)] = {
    bpeMergeCache.forEach { (key, _) =>
      if (key._1.s.sparkContext.isStopped) bpeMergeCache.remove(key)
    }
    val planKey = (documents.queryExecution.analyzed.semanticHash(),
      graft.sources.StorageOps.filesFingerprint(documents)).hashCode()
    bpeMergeCache.computeIfAbsent(
      (new SessionRef(documents.sparkSession), planKey, rounds, topWords),
      _ => {
        val (out, syms) = bpeFitLoop(documents, rounds, topWords)
        syms.unpersist()
        out
      })
  }

  /** L4 — encode the corpus with the merges [[bpeFit]] learns: per
    * source, the whitespace token count and the symbol count the fitted
    * tokenizer emits (the compression the merges buy, by source). The
    * scale trick mirrors the fit: each DISTINCT word is encoded once on
    * the vocab-sized frame; the corpus-sized side only joins the
    * resulting per-word symbol count back by word (broadcast — the
    * vocabulary is capped at `topWords`). Words beyond the cap fall
    * back to character count (no merges were learned for them).
    */
  def bpeEncode(documents: DataFrame, rounds: Int, topWords: Int): DataFrame =
    // apply the (memoized) fitted merge table in ONE distributed pass —
    // no per-round aggregations or driver round-trips on the encode path
    bpeEncodeWithMerges(documents,
      bpeFitCached(documents, rounds, topWords).map(m => (m._2, m._3)),
      topWords)

  /** Encode against an EXPLICIT ordered merge list — the production
    * handoff: a tokenizer fitted once (here or anywhere) ships as its
    * merge table (exactly the (lsym, rsym) columns of q_bpe_merges,
    * round-trippable through parquet), and any later pipeline encodes
    * with the artifact, never refitting. Rebuild the character-split
    * vocabulary, fold the merges over it in order as chained fused
    * expressions, and broadcast-join the per-word symbol counts back
    * onto the corpus word stream (out-of-vocabulary words fall back to
    * character count).
    */
  def bpeEncodeWithMerges(documents: DataFrame, merges: Seq[(String, String)],
                          topWords: Int): DataFrame = {
    val wordTokens = bpeWordTokens(documents, merges, topWords)
    documents.select(col("source"), explode(words(col("text"))).as("word"))
      .join(broadcast(wordTokens), Seq("word"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("whitespace_tokens"),
        sum(coalesce(col("n_bpe"), length(col("word")).cast("long")))
          .as("bpe_tokens"))
      .orderBy("source")
  }

  /** The fitted merge table as the shippable artifact rows — the
    * (lsym, rsym) columns of [[bpeFit]] in merge order, memoized per
    * (session, corpus data identity, params). The handoff every
    * consumer of the tokenizer takes: [[bpeEncodeWithMerges]] /
    * [[bpeWordTokens]] here, parquet round-trips elsewhere.
    */
  def bpeMerges(documents: DataFrame, rounds: Int, topWords: Int)
      : Seq[(String, String)] =
    bpeFitCached(documents, rounds, topWords).map(m => (m._2, m._3))

  /** The per-word symbol-count table (word, n_bpe) the fitted tokenizer
    * implies on `documents`' capped vocabulary — the vocab-sized half of
    * [[bpeEncodeWithMerges]], exposed on its own so ANY accounting pass
    * (the curation pipeline's per-stage token audit, VERDICT r13 #2)
    * broadcast-joins it onto a word stream instead of re-folding the
    * merges per consumer. Lineage-truncated: the fold chains `merges
    * .length` fused expressions, and every stage accountant re-reads the
    * result. Words beyond the `topWords` cap are ABSENT — consumers
    * fall back to character count (the [[bpeEncodeWithMerges]] OOV
    * rule).
    */
  def bpeWordTokens(documents: DataFrame, merges: Seq[(String, String)],
                    topWords: Int): DataFrame =
    bpeWordSyms(documents, merges, topWords)
      .select(col("word"), size(col("syms")).cast("long").as("n_bpe"))

  /** TOKENIZER-DRIFT AUDIT (round 15) — the q_index_drift discipline
    * applied to the OTHER frozen artifact: a tokenizer fitted on
    * yesterday's corpus (`fitDocs`) is priced against labeled word
    * streams (`streams`: (phase, (source, word)) relations — the fit
    * corpus itself as the "base" control and an ingest batch as the
    * drifted phase). Per (phase, source): whitespace and tokenizer
    * token totals, OOV word occurrences (absent from the fitted vocab,
    * empty split artifacts excluded), and the OOV rate in ppm. Rising
    * new-phase oov_ppm / token fertility against the base rows is the
    * "re-fit the tokenizer" signal, exactly as off-diagonal mass in
    * the IVF drift matrix schedules a codebook re-train — without it
    * the BPE artifact's no-refit economics ([[bpeEncodeWithMerges]])
    * have no shelf-life check.
    *
    * Scale shape: one capped fit (driver state = merge table), then
    * per phase ONE broadcast vocab join + map-side-combined rollup
    * over the word stream — no corpus shuffle.
    */
  def tokenizerDrift(fitDocs: DataFrame, streams: Seq[(String, DataFrame)],
                     rounds: Int, topWords: Int): DataFrame = {
    require(streams.nonEmpty,
      "tokenizerDrift needs at least one labeled word stream")
    val wt = bpeWordTokens(fitDocs, bpeMerges(fitDocs, rounds, topWords),
      topWords)
    streams.map { case (tag, ws) =>
      ws.select(lit(tag).as("phase"), col("source"), col("word"))
    }.reduce(_.unionByName(_))
      .join(broadcast(wt), Seq("word"), "left")
      .groupBy("phase", "source")
      .agg(count(lit(1)).as("whitespace_tokens"),
        sum(coalesce(col("n_bpe"), length(col("word")).cast("long")))
          .as("bpe_tokens"),
        sum(when(col("n_bpe").isNull && length(col("word")) > 0, 1L)
          .otherwise(0L)).as("oov_words"))
      .withColumn("oov_ppm",
        expr("oov_words * 1000000L div whitespace_tokens"))
      .orderBy("phase", "source")
  }

  /** The encoded vocabulary itself — (word, syms) for the `topWords`
    * most frequent words under the fitted merge table ([[bpeWordTokens]]
    * is its size projection; [[docTokenStreams]] and the shard packer
    * consume the symbols). Persisted like every tokenizer artifact:
    * vocab-bounded rows, computed once per (corpus, merges).
    */
  def bpeWordSyms(documents: DataFrame, merges: Seq[(String, String)],
                  topWords: Int): DataFrame = {
    val vocab0 = documents
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0) // the bpeFitLoop empty-word pin
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("word")).limit(topWords)
      .select(col("word"),
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))).as("syms"))
    val encoded = merges.foldLeft(vocab0) { case (df, (l, r)) =>
      df.withColumn("syms",
        graft.plans.BpeMergePair.bpeMergePair(col("syms"), lit(l), lit(r)))
    }
    Lineage.truncate(encoded.select(col("word"), col("syms")), None)
  }

  /** Per-document BPE token stream — (doc_id, tokens), the document's
    * words in order, each expanded to its vocabulary symbols (OOV →
    * its characters, the [[bpeEncodeWithMerges]] rule; empty symbols
    * filtered so the stream length ALWAYS equals the [[bpeWordTokens]]
    * pricing). The reassembly is a broadcast vocab join + one groupBy
    * whose per-key state is the document's own tokens — order restored
    * by array_sort over (wpos, syms) structs, no window, no second
    * shuffle. This is the relation the shard packer concatenates; at
    * 100 TB it is one map-side-joined pass over the corpus.
    */
  def docTokenStreams(documents: DataFrame, wordSyms: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), posexplode(words(col("text")))
        .as(Seq("wpos", "word")))
      .join(broadcast(wordSyms), Seq("word"), "left")
      .withColumn("syms", coalesce(col("syms"),
        filter(split(col("word"), ""), s => s =!= "")))
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("wpos"), col("syms")))),
        x => x("syms"))).as("tokens"))

  /** PACKED SHARDS ARTIFACT (VERDICT r14 #4): materialize the thing
    * [[packManifestBpe]]'s offsets point INTO — one row per (source,
    * shard, bin) holding the bin's concatenated token stream, the
    * relation a training data-loader mmaps and seeks. Documents
    * concatenate in doc_id order (the same total order the manifest's
    * prefix sum ran over), so manifest row (bin, tok_offset, n_tokens)
    * slices exactly that document's encoding back out of the stream —
    * q_pack_shards hash-checks the round trip against per-document
    * encodings replayed by DuckDB. Fingerprint-memoized on the source
    * like the IVF-PQ codes: written once per corpus state.
    *
    * Scale shape: tokens shuffle ONCE (the groupBy to bin rows, keyed
    * on (source, shard, bin) — bounded by budgetTokens each); bin rows
    * are loader-page-sized by construction, so no partition holds more
    * than a shard's bins.
    */
  def packShardsWrite(documents: DataFrame, wordSyms: DataFrame,
                      budgetTokens: Long, shardDocs: Long,
                      srcDir: String, outDir: String,
                      tokKey: String = "bpe6x31"): Unit = {
    val spark = documents.sparkSession
    // tokKey is the TOKENIZER's identity contribution (the ADVICE-r14
    // memo-key discipline: wordSyms is a caller-side derivation, so the
    // source fingerprint alone cannot distinguish two tokenizers over
    // the same corpus — a 6x31 and a 12x64 fit writing the same outDir
    // must not memo-collide)
    graft.sources.StorageOps.materializeCached(spark,
      s"pack_shards:$outDir:$tokKey:$budgetTokens:$shardDocs",
      srcDir, outDir) {
      packBinStreams(documents, wordSyms, budgetTokens, shardDocs)
        .write.mode("overwrite").parquet(outDir)
    }
  }

  /** The (source, shard, bin, tokens) bin-stream frame both shard
    * writers materialize — [[packShardsWrite]] over the full corpus,
    * [[packShardsUpsert]] over an ingest batch alone.
    */
  private def packBinStreams(documents: DataFrame, wordSyms: DataFrame,
                             budgetTokens: Long,
                             shardDocs: Long): DataFrame = {
    val wordTokens = wordSyms
      .select(col("word"), size(col("syms")).cast("long").as("n_bpe"))
    bpeBinFrame(documents, wordTokens, budgetTokens, shardDocs)
      .select("source", "shard", "bin", "doc_id")
      .join(docTokenStreams(documents, wordSyms), Seq("doc_id"), "left")
      .withColumn("tokens",
        coalesce(col("tokens"), array().cast("array<string>")))
      .groupBy("source", "shard", "bin")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("doc_id"), col("tokens")))),
        x => x("tokens"))).as("tokens"))
  }

  /** INCREMENTAL SHARD PACK (round 15) — the codesUpsert economics
    * applied to the packed-shards artifact: an ingest batch's documents
    * are encoded under the FROZEN tokenizer and packed into THEIR OWN
    * bins, and the stored bin streams are carried over untouched —
    * the base corpus is never re-encoded. Sound because shard identity
    * is `doc_id div shardDocs` per source and the prefix sum that
    * assigns bins runs WITHIN (source, shard): a batch whose doc_ids
    * lie beyond every stored shard adds only new (source, shard) keys,
    * so pack(base ∪ batch) ≡ pack(base) ∪ pack(batch) exactly —
    * q_pack_shards_upsert hash-checks that identity every round via
    * the from-scratch oracle over the merged corpus. A batch that
    * INTERLEAVES stored shards would shift existing offsets; this
    * fails loudly (one card-bounded driver check) rather than serving
    * a silently mis-offset manifest — that ingest must repack.
    */
  def packShardsUpsert(baseDocs: DataFrame, batchDocs: DataFrame,
                       wordSyms: DataFrame, budgetTokens: Long,
                       shardDocs: Long, srcDir: String, outDir: String,
                       upsertDir: String, batchKey: String,
                       tokKey: String = "bpe6x31"): Unit = {
    packShardsWrite(baseDocs, wordSyms, budgetTokens, shardDocs, srcDir,
      outDir, tokKey)
    val spark = baseDocs.sparkSession
    graft.sources.StorageOps.materializeCached(spark,
      s"pack_upsert:$upsertDir:$batchKey:$tokKey:$budgetTokens:$shardDocs",
      srcDir, upsertDir) {
      val stored = spark.read.parquet(outDir)
      // append-only guard: bounded by |sources|, one scalar to the driver
      val overlapping = stored
        .groupBy("source").agg(max("shard").as("max_shard"))
        .join(batchDocs.select(col("source"),
            expr(s"doc_id div $shardDocs").as("shard"))
          .groupBy("source").agg(min("shard").as("min_shard")),
          Seq("source"))
        .filter(col("min_shard") <= col("max_shard")).count()
      require(overlapping == 0,
        s"packShardsUpsert: batch shards interleave stored shards for " +
          s"$overlapping source(s) — append-only packing needs batch " +
          "doc_ids beyond every stored shard; repack from scratch")
      stored
        .unionByName(
          packBinStreams(batchDocs, wordSyms, budgetTokens, shardDocs))
        .write.mode("overwrite").parquet(upsertDir)
    }
  }

  /** SHARD-PACK TAKEDOWN / COMPACTION (round 18, VERDICT r17 #7) — the
    * q_postings_compact generation story applied to the packed-bin
    * artifact: documents leaving the corpus (`deletes`, a RELATION —
    * the takedown-list-is-a-table discipline) plus an arriving batch
    * fold into the NEXT artifact generation at `genDir` under the
    * FROZEN tokenizer, with the base corpus re-encoded only where the
    * takedown actually lands:
    *
    *  - bins of (source, shard) keys holding NO deleted doc carry over
    *    from the stored generation UNTOUCHED (shard identity is
    *    `doc_id div shardDocs` per source and the bin prefix sum runs
    *    WITHIN (source, shard), so a deletion elsewhere cannot shift
    *    them — the same independence [[packShardsUpsert]] exploits);
    *  - AFFECTED shards repack from their surviving documents only —
    *    an O(|affected shards| · shardDocs) slice of the corpus, never
    *    a full re-encode (deleting a doc shifts the offsets of the
    *    docs AFTER it in its own shard, so those bins must rewrite —
    *    exactly them and nothing more);
    *  - the batch packs into its own new shards under the
    *    [[packShardsUpsert]] append-only guard.
    *
    * Append-then-delete ≡ from-scratch over the merged corpus, exactly
    * (per-shard independence again) — q_pack_compact hash-checks that
    * identity against the from-scratch oracle. Memoized on the source
    * fingerprint + `batchKey` (the caller's identity for this
    * batch/takedown set — batch and deletes are DataFrames, the
    * bm25CompactWrite memo contract).
    */
  def packShardsCompact(baseDocs: DataFrame, batchDocs: DataFrame,
                        deletes: DataFrame, wordSyms: DataFrame,
                        budgetTokens: Long, shardDocs: Long,
                        srcDir: String, outDir: String, genDir: String,
                        batchKey: String,
                        tokKey: String = "bpe6x31"): Unit = {
    packShardsWrite(baseDocs, wordSyms, budgetTokens, shardDocs, srcDir,
      outDir, tokKey)
    val spark = baseDocs.sparkSession
    val delKeys = deletes.select("doc_id").distinct()
      .lineageTruncate() // 3 consumers: clash guard, affected shards,
                         // survivor anti-join
    val clash = batchDocs.select("doc_id")
      .join(delKeys, Seq("doc_id"), "left_semi").limit(1).count()
    require(clash == 0L,
      "packShardsCompact: batch doc_ids and deletes must be disjoint — " +
        "a delete+re-add is two maintenance cycles, not one")
    graft.sources.StorageOps.materializeCached(spark,
      s"pack_compact:$genDir:$batchKey:$tokKey:$budgetTokens:$shardDocs",
      srcDir, genDir) {
      val stored = spark.read.parquet(outDir)
        .lineageTruncate() // 2 consumers: append guard + carried bins
      // append-only guard: bounded by |sources|, one scalar to the driver
      val overlapping = stored
        .groupBy("source").agg(max("shard").as("max_shard"))
        .join(batchDocs.select(col("source"),
            expr(s"doc_id div $shardDocs").as("shard"))
          .groupBy("source").agg(min("shard").as("min_shard")),
          Seq("source"))
        .filter(col("min_shard") <= col("max_shard")).count()
      require(overlapping == 0,
        s"packShardsCompact: batch shards interleave stored shards for " +
          s"$overlapping source(s) — append-only packing needs batch " +
          "doc_ids beyond every stored shard; repack from scratch")
      // only shards that LOST a document rewrite; everything else is
      // carried over as stored bytes
      val affected = baseDocs.join(delKeys, Seq("doc_id"), "left_semi")
        .select(col("source"), expr(s"doc_id div $shardDocs").as("shard"))
        .distinct()
        .lineageTruncate() // 2 consumers: carried anti + survivor semi
      val carried = stored.join(affected, Seq("source", "shard"),
        "left_anti")
      val survivors = baseDocs
        .withColumn("shard", expr(s"doc_id div $shardDocs"))
        .join(affected, Seq("source", "shard"), "left_semi")
        .join(delKeys, Seq("doc_id"), "left_anti")
        .drop("shard")
      carried
        .unionByName(
          packBinStreams(survivors, wordSyms, budgetTokens, shardDocs))
        .unionByName(
          packBinStreams(batchDocs, wordSyms, budgetTokens, shardDocs))
        .write.mode("overwrite").parquet(genDir)
    }
  }

  /** Round-trip audit of the packed shards: for every manifest row,
    * slice [tok_offset, tok_offset + n_tokens) out of the bin's stored
    * stream and fingerprint it — the declared q_pack_shards relation,
    * whose oracle recomputes each document's encoding independently.
    * A manifest pointing at a mis-packed artifact (wrong order, wrong
    * offset base, dropped doc) changes some row's md5.
    */
  def packShardsSliceAudit(documents: DataFrame, wordSyms: DataFrame,
                           budgetTokens: Long, shardDocs: Long,
                           outDir: String): DataFrame = {
    val wordTokens = wordSyms
      .select(col("word"), size(col("syms")).cast("long").as("n_bpe"))
    packManifestBpe(documents, wordTokens, budgetTokens, shardDocs)
      .join(documents.sparkSession.read.parquet(outDir),
        Seq("source", "shard", "bin"))
      .select(col("source"), col("shard"), col("bin"), col("doc_id"),
        col("n_tokens"), col("tok_offset"),
        md5(concat_ws(" ",
          slice(col("tokens"), (col("tok_offset") + 1).cast("int"),
            col("n_tokens").cast("int")))).as("tok_md5"))
      .orderBy("source", "shard", "bin", "doc_id")
  }

  /** The shared fit loop: returns the per-round merge rows and the
    * PERSISTED final (word, freq, syms) vocabulary frame (caller
    * unpersists). Driver state per round is one best-pair row and two
    * accounting scalars — the bounded-collect convention of the IVF
    * centroid loop.
    */
  private def bpeFitLoop(documents: DataFrame, rounds: Int, topWords: Int)
      : (Seq[(Long, String, String, Long, Long, Long)], DataFrame) = {
    // empty words (doubled spaces) are excluded BEFORE the cap: they
    // have no characters to merge, and their char-split is the one
    // place Spark and SQL replays could diverge (sequence(1, 0) is a
    // DESCENDING two-element range in Spark, range(1, 1) is empty in
    // DuckDB) — pin the semantics instead of inheriting either
    val wc = documents
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("word")).limit(topWords)
    var syms = wc.select(col("word"), col("freq"),
      transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))).as("syms"))
      .persist()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, Long, Long)]
    var t = 1
    var exhausted = false
    while (t <= rounds && !exhausted) {
      val best = syms
        .select(col("freq"), explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r"))))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        val next = syms.withColumn("syms",
          graft.plans.BpeMergePair.bpeMergePair(col("syms"), lit(l), lit(r)))
          .persist()
        val corpusSymbols = next
          .agg(sum(col("freq") * size(col("syms")))).collect()(0).getLong(0)
        val vocabSymbols = next
          .select(explode(col("syms")).as("sym")).distinct().count()
        out += ((t.toLong, l, r, cnt, corpusSymbols, vocabSymbols))
        syms.unpersist()
        syms = next
        t += 1
      }
    }
    (out.toSeq, syms)
  }

  /** The relational twin of [[graft.plans.BpeMergePair]] — one merge
    * pass expressed purely in windows, mirroring the DuckDB oracle's
    * CTE shape symbol for symbol: position-explode, flag candidate
    * starts (sym = left ∧ next = right), group CONSECUTIVE candidates
    * into islands (gaps-and-islands: pos − row_number over candidates),
    * keep even offsets within each island (the leftmost-nonoverlapping
    * parity rule — consecutive candidates only arise for same-symbol
    * runs), then rebuild each array dropping consumed positions. The
    * independent implementation the parity spec pins the fused
    * expression against; production code uses the expression.
    *
    * Input frame must carry (`word`, `freq`, `syms`).
    */
  def bpeMergeStepRelational(vocab: DataFrame, left: String, right: String): DataFrame = {
    val byPos = Window.partitionBy("word").orderBy("pos")
    val e = vocab
      .select(col("word"), col("freq"),
        posexplode(col("syms")).as(Seq("pos", "sym")))
      .withColumn("cand",
        col("sym") === lit(left) && lead(col("sym"), 1).over(byPos) === lit(right))
    val islands = e.withColumn("isl",
      when(col("cand"), col("pos") -
        row_number().over(Window.partitionBy("word", "cand").orderBy("pos"))))
    val starts = islands.withColumn("strt",
      col("cand") &&
        (col("pos") - min("pos").over(Window.partitionBy("word", "isl"))) % 2 === 0)
    starts
      .withColumn("sym2",
        when(col("strt"), lit(left + right))
          .when(lag(col("strt"), 1, false).over(byPos), lit(null: String))
          .otherwise(col("sym")))
      .filter(col("sym2").isNotNull)
      .groupBy("word")
      .agg(first("freq").as("freq"),
        transform(array_sort(collect_list(struct(col("pos"), col("sym2")))),
          s => s.getField("sym2")).as("syms"))
  }

  /** CURRICULUM-ORDERED SHARDING (round 15, wave 4): assign every
    * document a training shard and a WITHIN-SHARD curriculum position —
    * short documents first (length is the classic difficulty proxy; swap
    * the band expression for any integer difficulty score). Shard
    * membership is the same pure `md5('shard:'||id)` bucket function as
    * [[Relational.shardAssign]] (partition/retry invariant, every shard
    * statistically balanced per band); the position orders each shard's
    * stream by (band, doc_id), so a data loader reading shard files in
    * `pos` order replays the curriculum deterministically.
    *
    * Scale shape: the band needs ONE corpus scalar (max token count —
    * a map-side-combined agg, broadcast back); shard assignment is
    * embarrassingly parallel; the only window partitions by SHARD, whose
    * count grows with the cluster — each partition holds n/nShards rows,
    * never a global sort. (A band-partitioned global rank would put each
    * band in one task; this formulation deliberately avoids it.)
    */
  def curriculumShards(documents: DataFrame, nShards: Int,
                       nBands: Int): DataFrame = {
    require(nShards >= 1 && nBands >= 1,
      s"nShards/nBands must be >= 1, got $nShards/$nBands")
    val toks = documents.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens"))
    val maxTok = toks.agg(max(col("n_tokens")).as("max_tok"))
    val banded = toks.crossJoin(broadcast(maxTok))
      .withColumn("band",
        least(lit(nBands - 1L),
          expr(s"n_tokens * ${nBands}L div (max_tok + 1L)")))
      .withColumn("shard",
        pmod(DedupOps.md5Hash60(
          concat(lit("shard:"), col("doc_id").cast("string"))),
          lit(nShards.toLong)))
    val w = Window.partitionBy("shard")
      .orderBy(col("band"), col("doc_id"))
    banded
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "n_tokens", "band", "shard", "pos")
      .orderBy("doc_id")
  }
}
