"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: the flagship sketch-build pipeline (read → extract html→text →
project → 9-sketch build → merge → finalize) over the synthesized 500k-row
Common-Crawl-style table (FIXTURES.md F1; cached under /tmp).  Also times a
representative subset of the query catalog over $GRAFT_SF_DIR.

    python bench.py             # single run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling   # N vs 4N cpus (default 4 vs 16), interleaved

Scaling protocol per BASELINE.md: same 2M-doc input, fresh ray.init
sessions per level, levels interleaved across rounds to cancel shared-host
load swings; efficiency = (T_lo / T_hi) / (hi / lo).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
# Ray WORKERS resolve q_digest_ray via inherited PYTHONPATH, not the
# driver's sys.path — export before ray.init so bench works from any cwd
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

CC_DIR = os.environ.get("GRAFT_CC_DIR", "/tmp/qdr_cc_pages_bench")
CC_ROWS = int(os.environ.get("GRAFT_CC_ROWS", "500000"))
CC_SHARDS = int(os.environ.get("GRAFT_CC_SHARDS", "32"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

QUERY_NAMES = [
    "pricing_summary",
    "events_hourly",
    "top_users",
    "dedup_exact",
    "exact_quantiles_nchars",
    "ann_topk",
    "ann_lsh_topk",
    "order_revenue_by_nation",
    "token_totals",
    "minhash_dedup",
    "sessionize",
    "asof_join_orders",
    "quality_filter",
    "sk_qdigest_nchars",
    "sk_hll_distinct_users",
    "customer_nation_revenue",
    "ann_ivf_topk",
    "sk_kll_weighted_nchars",
    "curation_funnel",
    "fingerprint_stats",
    "sk_bloom_membership",
    "orders_without_lineitems",
    "distinct_users_by_type",
    "top_docs_per_lang",
    "top_terms_per_lang",
    "docs_vs_lang_median",
    "sk_decile_binning",
    "cross_source_contamination",
    "sk_unigram_logprob_quality",
    "minhash_dedup_streaming",
    "brand_revenue",
    "supplier_region_acctbal",
    "paragraph_dedup_docs",
    "promo_revenue_by_month",
    "repetition_stats",
    "cumulative_spend",
    "embedding_cluster_sizes",
    "props_value_by_type",
    "normalized_dedup_by_source",
    "ngram_jaccard_dups",
    "embedding_cosine_dups",
    "top_bigrams",
    "stratified_sample",
    "value_band_join",
    "tfidf_top_terms",
    "scrub_stats",
    "rollup_revenue",
    "sk_window_rollup",
    "global_sort_ranks",
    "bloom_prune_join",
    "sk_incremental_build",
    "corr_quantity_price",
    "cust_order_count_dist",
    "shipping_priority",
    "lang_source_matrix",
    "source_lang_entropy",
    "inter_event_gaps",
    "users_all_types",
    "mode_priority_by_status",
    "event_pair_counts",
    "zscore_outliers",
    "mad_nchars_by_lang",
    "user_first_last",
    "funnel_conversion",
    "embedding_centroid_norms",
    "table_profile",
    "conversion_latency",
    "decayed_counts",
    "sk_hll_users_by_type",
    "sk_profile",
    "clickers_never_purchased",
    "price_histogram",
    "sk_join_size_estimate",
    "sk_skew_f2",
    "weighted_sample_docs",
    "dup_spans",
    "sequence_pack_stats",
    "gopher_quality_flags",
    "sk_drift_monitor",
    "mixture_weights",
    "compression_ratio_stats",
    "padding_waste_stats",
    "dup_spans_scalable",
    "sk_sliding_quantiles",
    "curation_v2_stats",
    "ann_pq_topk",
    "train_val_test_split",
    "byte_pair_stats",
    "sk_quality_blend",
    "sk_robust_outliers",
    "rate_limit_audit",
    "media_phash_dups",
    "audio_fingerprint_dups",
    "video_shot_stats",
    "span_removal_dedup",
    "epoch_ingest_order",
    "epoch_token_counts",
    "ann_ivfpq_topk",
    "epoch_export_order",
    "running_total_events",
    "late_events",
    "minhash_dedup_distributed",
    "sk_ddsketch_nchars",
    "sk_native_udaf",
    "sk_fd_spectrum",
    "sk_csk_join_size",
    "ngram_contamination",
    "semdedup_prune",
    "incremental_dedup",
    "token_balanced_shards",
    "bm25_topk",
    "pmi_collocations",
    "chi2_lang_source",
    "dup_span_length_hist",
    "trimmed_mean_nchars_by_lang",
    "sk_dedup_preview",
    "dup_group_size_hist",
    "mixture_resample",
    "cohort_retention",
    "active_users_daily",
    "gini_user_activity",
]


def host_speed_probe() -> float:
    """Fixed single-thread CPU workload (seconds; LOWER = faster host).
    This sandbox's VM speed swings 3-4x between boots (same code measured
    404k docs/s on one boot, ~110k on another, with per-task UDF time up
    3x for identical blocks) — the probe anchors every bench JSON to the
    host speed it ran on so rounds stay comparable."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((600, 600))
    x = rng.integers(0, 1 << 62, size=1_000_000, dtype=np.int64)
    t0 = time.perf_counter()
    for _ in range(3):
        (a @ a).sum()
        np.sort(x)
        h = (x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        h.sum()
        # alloc+first-touch-write+free of a fresh 64 MB buffer: the mmap
        # page-fault path is what actually swings between boots (measured
        # 10x per-task inflation inside Ray workers while reused-buffer
        # compute stayed flat) — without this term the probe reads "fast"
        # on a boot where every plasma read crawls
        buf = np.empty(8 << 20, np.float64)
        buf[:] = 1.0
        del buf
    return round(time.perf_counter() - t0, 4)


def run_bench() -> dict:
    import ray

    from q_digest_ray.sources.cc_pages import read_cc_pages, synthesize

    synthesize(CC_DIR, total_rows=CC_ROWS, shards=CC_SHARDS, seed=42)

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from q_digest_ray.pipelines import queries as Q
    from q_digest_ray.pipelines.flagship import run_cc_pages_flagship

    # warm-up (untimed): one full pass warms the OS page cache AND each Ray
    # worker's memory arenas (this sandbox's first-touch page faults run at
    # ~60 MB/s; steady-state is what we're measuring — see BASELINE.md)
    run_cc_pages_flagship(CC_DIR, batch_size=None)

    # best of N timed runs (sandbox page-fault noise is high)
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    headline = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_cc_pages_flagship(CC_DIR, batch_size=None)
        headline = min(headline, time.perf_counter() - t0)

    # second headline: the composed curation operator (keep-first dedup x
    # Gopher gates, one exchange) over the SAME 500k-doc cc_pages table —
    # evidence the text-pipeline ops run at corpus scale, not just sf0.1
    curation_sec = None
    if not os.environ.get("GRAFT_SKIP_CURATION"):
        from q_digest_ray.pipelines.export import curation_v2
        from q_digest_ray.sources.cc_pages import read_cc_pages

        try:
            curation_sec = float("inf")
            for _ in range(int(os.environ.get("GRAFT_CURATION_REPS", "2"))):
                t0 = time.perf_counter()
                curation_v2(
                    read_cc_pages(CC_DIR, columns=["url", "lang", "text"]),
                    "url",
                    "lang",
                    "text",
                )
                curation_sec = min(curation_sec, time.perf_counter() - t0)
            curation_sec = round(curation_sec, 3)
        except Exception as exc:  # never let the second headline kill the JSON
            print(f"curation_500k failed: {exc}", file=sys.stderr)
            curation_sec = None

    # training-ingest leg: one full deterministic-epoch pass over the
    # sf documents table (sort to epoch order + streamed batch iteration +
    # token counting) — the consumption-side tokens/sec the trainer sees
    ingest_tokens_per_sec = None
    if not os.environ.get("GRAFT_SKIP_INGEST"):
        try:
            from q_digest_ray.pipelines.ingest import (
                count_tokens_batch,
                iter_epoch_batches,
            )

            total_tokens = 0
            t0 = time.perf_counter()
            for b in iter_epoch_batches(SF_DIR, epoch=0, batch_size=1024, split="all"):
                total_tokens += int(count_tokens_batch(b).sum())
            ingest_sec = time.perf_counter() - t0
            ingest_tokens_per_sec = round(total_tokens / ingest_sec, 1)
        except Exception as exc:
            print(f"ingest leg failed: {exc}", file=sys.stderr)

    per_query: dict[str, float] = {}
    if not os.environ.get("GRAFT_SKIP_QUERIES"):
        # min-of-N per query: shared-VM load bursts inflate single shots
        # 3-5x at random (BASELINE.md host quirks); the min is the engine.
        # Soft deadline: past GRAFT_QUERY_BUDGET seconds of cumulative query
        # time, degrade to 1 rep (never skip a query — per-query coverage
        # matters more than min-of-2 on a loaded host)
        qreps = int(os.environ.get("GRAFT_QUERY_REPS", "2"))
        budget = float(os.environ.get("GRAFT_QUERY_BUDGET", "420"))
        loop_start = time.perf_counter()
        for name in QUERY_NAMES:
            fn = Q.EXACT_QUERIES[name][0] if name in Q.EXACT_QUERIES else Q.SKETCH_QUERIES[name]
            reps_here = qreps if (time.perf_counter() - loop_start) < budget else 1
            best = float("inf")
            for _ in range(reps_here):
                t0 = time.perf_counter()
                fn(SF_DIR)
                best = min(best, time.perf_counter() - t0)
            per_query[name] = round(best, 3)

    ray.shutdown()

    # alt headline at 16 cpus in a FRESH session: some boots of this shared
    # VM anti-scale allocation-heavy Ray work beyond ~16 procs (BASELINE.md
    # host quirks; same code measured 3-7x faster at 16 than 32 cpus on such
    # boots), so the record always carries the host's best parallelism too
    alt = None
    alt_curation = None
    if NUM_CPUS > 16 and not os.environ.get("GRAFT_NO_ALT"):
        try:
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS="16",
                GRAFT_BENCH_REPS="2",
                GRAFT_SKIP_QUERIES="1",
                GRAFT_SKIP_INGEST="1",
                GRAFT_NO_ALT="1",
            )
            # the alt session also re-times the curation leg: it is the
            # most allocation-heavy stage, so the >16-proc quirk inflates
            # it the most (measured 24.8 s @16 vs 84 s @32 on one boot)
            if os.environ.get("GRAFT_SKIP_CURATION"):
                env["GRAFT_SKIP_CURATION"] = "1"
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            rec = json.loads(out.strip().splitlines()[-1])
            alt = rec["value"]
            alt_curation = rec.get("curation_500k_sec")
        except Exception as exc:
            print(f"alt headline failed: {exc}", file=sys.stderr)

    result = {
        "metric": "flagship cc_pages sketch-build wall time",
        "value": round(headline, 3),
        "unit": "sec",
        "docs_per_sec": round(CC_ROWS / headline, 1),
        "curation_500k_sec": curation_sec,
        "ingest_tokens_per_sec": ingest_tokens_per_sec,
        "cc_rows": CC_ROWS,
        "queries": per_query,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "host_probe_sec": host_speed_probe(),
    }
    if alt is not None:
        result["value_16cpu"] = round(alt, 3)
        result["docs_per_sec_16cpu"] = round(CC_ROWS / alt, 1)
        result["docs_per_sec_best"] = max(
            result["docs_per_sec"], result["docs_per_sec_16cpu"]
        )
    if alt_curation is not None:
        result["curation_500k_sec_16cpu"] = alt_curation
        if curation_sec is not None:
            result["curation_500k_sec_best"] = min(curation_sec, alt_curation)
    return result


def run_scaling() -> dict:
    """N vs 4N fresh-session scaling on a 2M-doc input (same input both
    levels; per BASELINE.md protocol).  Levels default to 4 and 16: beyond
    ~16 concurrent processes this sandbox host's mmap/page-fault path stops
    scaling (measured: alloc+write+free throughput DROPS 2x from 8 to 32
    procs while reused-buffer writes scale linearly), which corrupts any
    8-vs-32 comparison with host noise unrelated to the engine."""

    scaling_dir = os.environ.get("GRAFT_SCALING_DIR", "/tmp/qdr_cc_scaling")
    scaling_rows = int(os.environ.get("GRAFT_SCALING_ROWS", "2000000"))
    lo = int(os.environ.get("GRAFT_SCALING_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "16"))
    rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "3"))

    from q_digest_ray.sources.cc_pages import synthesize

    synthesize(scaling_dir, total_rows=scaling_rows, shards=64, seed=42)

    def run_at(ncpu: int) -> float:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_CC_DIR=scaling_dir,
            GRAFT_CC_ROWS=str(scaling_rows),
            GRAFT_CC_SHARDS="64",  # MUST match the parent synthesize() call
            GRAFT_BENCH_REPS="2",
            GRAFT_SKIP_QUERIES="1",
            GRAFT_SKIP_CURATION="1",
            GRAFT_SKIP_INGEST="1",
            GRAFT_NO_ALT="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])["value"]

    # interleave the two levels so shared-host load swings (which dwarf the
    # engine's own variance here) hit both levels alike; min per level
    lo_secs, hi_secs = [], []
    for _ in range(rounds):
        lo_secs.append(run_at(lo))
        hi_secs.append(run_at(hi))
    t_lo, t_hi = min(lo_secs), min(hi_secs)
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": f"scaling efficiency ({lo} -> {hi} cpus, fresh sessions, same input)",
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"all_sec_{lo}": lo_secs,
        f"all_sec_{hi}": hi_secs,
        f"docs_per_sec_{lo}": round(scaling_rows / t_lo, 1),
        f"docs_per_sec_{hi}": round(scaling_rows / t_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "cc_rows": scaling_rows,
        "host_probe_sec": host_speed_probe(),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
