#!/usr/bin/env python3
"""Non-vacuity audit over a Verify output directory.

An oracle hash-match on DEGENERATE output proves nothing: a join whose
date ranges never overlap is all-NULL in both engines and still green
(this exact trap shipped as q_join_asof_fwd's first formulation, and
four more vacuous greens hid in round-3's suite). After `graft.Verify`
writes its parquet, run:

    python3 scripts/vacuity_audit.py /tmp/verify_out

and eyeball every flag. A flag is NOT automatically a bug — constants
can be structural (array dims, literal keys, a filter echoing its own
predicate) — but each one deserves a reason. Known-benign flags are
listed below and suppressed.

The KNOWN_BENIGN list is tuned to sf0.01 (the driver's correctness
gate). Smaller SFs saturate additional columns (e.g. one retention
cohort, uniform bool_agg groups at sf0.001) — expected small-sample
effects, not query defects.
"""
import os
import sys

import pandas as pd

# reviewed constants: structural, not vacuous (see SURVEY.md audit note)
KNOWN_BENIGN = {
    # the bound-audit invariant IS the checked claim: within_bound must
    # be uniformly TRUE (a FALSE row means the sketch broke its
    # published guarantee and the oracle compare goes red) — r10 form
    ("q_agg_approx_distinct", "within_bound"),
    ("q_approx_percentile", "within_bound"),
    # uniform grid saturation: every return flag's ~20k rows cover the
    # full 2000-part pool, so the exact twin is the same count per flag;
    # the per-flag HLL estimate (compared inside within_bound) varies
    ("q_agg_approx_distinct", "exact_nd"),
    # uniform quantity grid: the p50 rank window endpoints coincide
    # across return flags (same reason q_percentile_disc's p25/p75 do)
    ("q_approx_percentile", "p50_lo_s2"),
    ("q_approx_percentile", "p50_hi_s2"),
    ("q_agg_distinct", "nd_part"), ("q_agg_distinct", "nd_supp"),
    ("q_agg_multi", "min_qty"),            # TPC-H grid min is 1 everywhere
    ("q_array_funcs", "dim"),               # embedding dim is fixed 64
    ("q_bit_agg", "key_and"), ("q_bit_agg", "key_or"),  # saturated folds
    ("q_describe", "n_rows"), ("q_null_ratio", "n_rows"),
    ("q_filter_eq", "l_returnflag"),        # the filter's own predicate
    ("q_join_range", "band_id"),            # sf0.01 prices sit in one band
    ("q_map_funcs", "m_size"), ("q_map_funcs", "keys"),  # literal structure
    ("q_median", "p90_qty_s3"),             # uniform quantity grid
    ("q_neardup_clusters", "cluster_id"),   # %10 slice is ONE cluster (doc'd)
    # uniform 25 docs/source testdata: every domain's doc count and its
    # NTILE(3) head+middle size (9+8=17) are the same by construction;
    # the token columns vary and carry the audited signal
    ("q_ccnet_filter", "docs_in"), ("q_ccnet_filter", "docs_kept"),
    # every signal pair is evaluated over the SAME document domain
    # (docs carrying ≥1 word — the three flag frames inner-join on
    # doc_id), so n_docs is uniform across the 3 rows BY CONSTRUCTION;
    # Round14OpsSpec asserts exactly this. The confusion cells vary.
    ("q_quality_agreement", "n_docs"),
    # every vector carries all 64 dimensions, so each dimension's sample
    # count is the corpus size BY CONSTRUCTION (a varying n would mean
    # ragged embeddings); mean/var/rank vary (round 15 wave 6)
    ("q_emb_dim_audit", "n"),
    # same construction over the four-signal matrix (round 15 wave 2):
    # all six pairs inner-join the SAME ≥1-word document domain, so
    # n_docs is uniform across the 6 rows; the confusion cells vary
    ("q_quality_agreement4", "n_docs"),
    # same %10 slice through the star-contraction engine: same single
    # cluster — the shared-oracle sibling of q_neardup_clusters
    ("q_neardup_clusters_star", "cluster_id"),
    # every event_type draws values from the same generator, so each
    # type's MEDIAN falls in the same 2000-cent bin; the within-bin
    # ppm offsets (frac500_ppm) DO vary per type and are the estimate
    ("q_hist_quantiles", "b500"),
    # the uniform corpus gives every source exactly 25 distinct texts,
    # and the re-ingested dup slice adds none by construction — n_docs
    # and dup_ppm are the varying signal
    ("q_dup_rate_by_source", "n_distinct"),
    ("q_percentile_disc", "p25_s2"), ("q_percentile_disc", "p75_s2"),
    ("q_string_agg", "priorities"),         # every status sees all 5 values
    # the corpus-wide token total is ONE scalar repeated per threshold
    # row by construction (the curve's denominator) — structural
    ("q_vocab_coverage", "total_tokens"),
}


def audit(base: str) -> int:
    flags = []
    for d in sorted(os.listdir(base)):
        p = os.path.join(base, d)
        if not os.path.isdir(p):
            continue
        try:
            df = pd.read_parquet(p)
        except Exception as e:  # noqa: BLE001
            flags.append((d, "READ ERROR", str(e)[:60]))
            continue
        if len(df) == 0:
            flags.append((d, "ZERO ROWS", ""))
            continue
        for c in df.columns:
            col = df[c]
            if col.isna().all():
                flags.append((d, f"col {c}", "ALL NULL"))
            elif col.nunique(dropna=True) == 1 and len(df) > 2 \
                    and (d, c) not in KNOWN_BENIGN:
                flags.append((d, f"col {c}", f"constant={col.dropna().iloc[0]}"))
    for f in flags:
        print("FLAG", *f)
    print(f"{len(flags)} unexplained flags" if flags else "CLEAN")
    return 1 if flags else 0


if __name__ == "__main__":
    if len(sys.argv) != 2 or not os.path.isdir(sys.argv[1]):
        print("usage: vacuity_audit.py <verify_output_dir>")
        sys.exit(2)
    sys.exit(audit(sys.argv[1]))
