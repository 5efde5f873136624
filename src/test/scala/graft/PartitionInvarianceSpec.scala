package graft

/** Makes the determinism claim MECHANICAL: a sample of order-sensitive
  * declared queries must produce byte-identical row sequences at
  * different `spark.sql.shuffle.partitions` — the property the whole
  * hash-compare contract rests on (a result that depends on partition
  * count can never hash-match an oracle, and silently breaks on any
  * cluster resize). Two child sessions of the shared context, nothing
  * else differing.
  */
class PartitionInvarianceSpec extends SparkSpec {

  // order-sensitive shapes across the families: window rank, grouped
  // agg, inverted-index join, sketch arithmetic, sampling, graph
  private val sampled = Seq(
    "q_agg_multi", "q_window_rank", "q_tfidf_cosine", "q_hll_estimate",
    "q_sample_k_per_group", "q_kcore", "q_mom_growth", "q_semdedup_buckets",
    // r10 curation planners: global-min keeper choice and full-outer
    // planner join must not depend on partition count
    "q_dedup_tokens_saved", "q_mixture_epochs",
    // r10 second wave: hashed-bucket posterior join + fixed-point
    // cross-set cosine must not depend on partition count
    "q_dsir_weights", "q_decon_semantic",
    // r11: integer LSH/IVF indexes (argmax ties, probe ranking) and
    // the distributed media-fixture fingerprints must not depend on
    // partition count
    "q_simsearch_lsh", "q_simsearch_ivf", "q_media_fingerprint",
    // r13: BPE merge rounds (global best-pair argmax per round), PQ /
    // IVF-PQ codebooks + codes + ADC ranking, the surprisal one-row
    // total cross join, and the threshold-curve conditional counts
    "q_bpe_merges", "q_simsearch_pq_refined", "q_simsearch_ivfpq",
    "q_surprisal", "q_neardup_threshold_curve",
    // r14: the stored-codes search (parquet round-trip + ADC ranking),
    // tokenizer-accounted pipeline, signal-agreement confusion rollup,
    // gated greedy budget, and the incremental CC label fold
    "q_simsearch_ivfpq_stored", "q_pipeline_curate_bpe",
    "q_quality_agreement", "q_budget_surprisal", "q_dedup_incremental_cc",
    // r14 second wave: driver-side probe + pushed-filter codes scan,
    // tokenizer-priced pack manifest, global-fingerprint data card
    "q_simsearch_ivfpq_fleet", "q_pack_manifest", "q_data_card",
    // r14 third wave: two-fit drift matrix (argmax ties in both chains)
    "q_index_drift",
    // r15 wave 2: compacted-artifact search (range-partitioned rewrite
    // + ADC), bigram surprisal (two-level count joins), keeper-argmin
    // span trim, filtered IVF, the four-signal rollup, and the
    // appended shard artifact's slice audit
    "q_ann_compact", "q_surprisal_bigram", "q_span_trim",
    "q_simsearch_filtered", "q_quality_agreement4",
    "q_pack_shards_upsert",
    // r15 wave 3: the recursive CTE (per-iteration joins over the
    // truncated spine must not depend on partition count)
    "q_sql_recursive",
    // r15 wave 4: stored-postings BM25 (pushed term filter + score
    // window), CC over 60-bit name hashes with argmin survivorship,
    // and the priority sample's per-stratum top-k
    "q_bm25_stored", "q_entity_resolve", "q_weighted_sample",
    // r15 waves 5-7: grid-bucketed interval self-join (later-start-cell
    // dedup), collected-domain MW trajectory, wrong-label filtered dot
    // ranking, iterative BFS frontier, cluster-purity argmax, and the
    // dimension-variance rank over a single window
    "q_interval_join", "q_domain_reweight", "q_hard_negatives",
    "q_graph_bfs", "q_cluster_purity", "q_emb_dim_audit",
    // r16: the incremental graph upsert (stored-edge merge + rank
    // across three candidate unions), the md5-drawn schedule
    // execution, the two-chain drift join, the postings-upsert
    // full-outer df merge, and the per-(batch, source) prefix-sum
    // packing must not depend on partition count
    "q_knn_edges_upsert", "q_schedule_price", "q_schedule_drift",
    "q_bm25_postings_upsert", "q_pack_scheduled",
    // r17: the compacted-generation search (stat subtraction + rewrite
    // + pushed-term scan), the persisted post-upsert graph serve, the
    // per-source NTILE terciles, and the distinct-length cumulative
    // bucketing must not depend on partition count
    "q_postings_compact", "q_knn_graph_upsert_stored",
    "q_ccnet_buckets", "q_ccnet_filter", "q_padding_waste")

  test("sampled queries are row-identical at 3 vs 17 shuffle partitions") {
    val dir = "/root/testdata/sf0.001"
    val a = spark.newSession()
    val b = spark.newSession()
    // a child session starts with a fresh function registry — the
    // codegen kernels must be re-registered per session
    graft.plans.VecDot.register(a)
    graft.plans.VecDot.register(b)
    a.conf.set("spark.sql.shuffle.partitions", "3")
    b.conf.set("spark.sql.shuffle.partitions", "17")
    for (name <- sampled) {
      val fn = Queries.queries(name)
      val ra = fn(a, dir).collect().map(_.toString).toSeq
      val rb = fn(b, dir).collect().map(_.toString).toSeq
      assert(ra == rb, s"$name differs across partition counts")
      assert(ra.nonEmpty, s"$name vacuous at sf0.001")
    }
  }
}
