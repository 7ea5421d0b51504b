"""The serving/curation TUNING levers as one PUBLISHED artifact.

Companion to plans/curation_report.py (`funnel`) and
plans/audit_report.py (`audit`): one CLI invocation writes the six
lever tables a data lead reads side-by-side before committing a
pipeline config —

  <out>/dedup_thresholds/    #203 pairs/docs-flagged per jaccard threshold
  <out>/ivf_probes/          #201 recall vs candidate cost per n_probe
  <out>/lsh_planes/          #205 recall vs candidate volume per n_planes
  <out>/seq_len_packing/     #204 truncation loss vs tail waste per L
  <out>/matryoshka_dims/     #169 neighbor recall per truncated dim
  <out>/bpe_compression/     #209 corpus symbols per BPE merge round
  <out>/minhash_bbit/        #235 estimator error per signature bit width
  <out>/_SUMMARY.json        driver-side recommended operating points

Every table IS the exact frame of a value-oracled registry query
(#203, #201, #205, #204, #169) — the artifact never re-derives lever
logic, so every published number is covered by the driver's
correctness gate; the summary only picks rows by documented rules.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

# Recommendation rules (documented knob policies, not new math):
#   ivf_probes      smallest n_probe whose recall is within
#                   _RECALL_SLACK_MICROS of the sweep's best recall
#   lsh_planes      the plane count maximizing recall per candidate —
#                   highest recall_micros/candidate ratio, tie → fewer
#                   candidates (micros-floor integer ratio)
#   matryoshka_dims smallest truncated dim with recall_micros >=
#                   _MATRYOSHKA_FLOOR_MICROS of the full-dim run
#   seq_len_packing the L minimizing total wasted tokens
#                   (tokens_truncated + tail_waste_tokens)
#   dedup_thresholds no single winner — the table reports the
#                   pair-volume curve; the summary echoes the knee:
#                   the LARGER threshold of the last strict pair-count
#                   drop when walking thresholds ascending (past it
#                   the curve is flat — tightening buys nothing)
#   bpe_compression the LAST merge round whose marginal
#                   total_symbols reduction is still >=
#                   _BPE_MARGINAL_FLOOR_MICROS of the round-0
#                   corpus cost (diminishing-returns cutoff)
#   minhash_bbit    the SMALLEST bit width whose mean estimator error
#                   is within _BBIT_ERR_SLACK_MICROS of the full-hash
#                   baseline row (bits=64) — memory is 64/b x
_RECALL_SLACK_MICROS = 100_000  # within 10pp of best recall
_MATRYOSHKA_FLOOR_MICROS = 900_000  # >= 90% recall vs full dim
_BPE_MARGINAL_FLOOR_MICROS = 5_000  # >= 0.5% of round-0 cost per round
_BBIT_ERR_SLACK_MICROS = 30_000  # within 3pp of the full-hash error


def write_tuning_report(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    fmt: str = "parquet",
) -> dict:
    """Write the five lever tables + _SUMMARY.json under ``out_dir``
    and return the summary dict. Same contract as write_audit_report:
    table writes go through the Spark writer; the summary is a
    driver-side manifest over tiny frames (every lever table is
    sweep-sized: 3-5 rows)."""
    from utility_service_areas_spark.operators.dedup import lineage_cut
    from utility_service_areas_spark.plans.ann_queries import (
        ann_ivf_probe_recall,
        ann_lsh_plane_sweep,
        embedding_matryoshka_recall,
    )
    from utility_service_areas_spark.plans.dedup_queries import (
        dedup_threshold_sweep,
    )
    from utility_service_areas_spark.plans.pipeline_queries import (
        seq_len_packing_sweep,
    )
    from utility_service_areas_spark.plans.dedup_queries import (
        minhash_bbit_tradeoff,
    )
    from utility_service_areas_spark.plans.text_queries import (
        bpe_compression_sweep,
    )

    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet or jsonl, got {fmt!r}")

    # Each frame has TWO consumers (the table write and the summary
    # collect); the levers' upstream passes (pair generation, brute
    # truth joins, tokenize) are the expensive part — cut once.
    frames = {
        "dedup_thresholds": lineage_cut(dedup_threshold_sweep(spark, sf_dir)),
        "ivf_probes": lineage_cut(ann_ivf_probe_recall(spark, sf_dir)),
        "lsh_planes": lineage_cut(ann_lsh_plane_sweep(spark, sf_dir)),
        "seq_len_packing": lineage_cut(seq_len_packing_sweep(spark, sf_dir)),
        "matryoshka_dims": lineage_cut(
            embedding_matryoshka_recall(spark, sf_dir)
        ),
        "bpe_compression": lineage_cut(bpe_compression_sweep(spark, sf_dir)),
        "minhash_bbit": lineage_cut(minhash_bbit_tradeoff(spark, sf_dir)),
    }

    for name, df in frames.items():
        path = os.path.join(out_dir, name)
        w = df.write.mode("overwrite")
        if fmt == "parquet":
            w.parquet(path)
        else:
            w.json(path)

    probes = sorted(
        frames["ivf_probes"].collect(), key=lambda r: r.probe
    )
    planes = sorted(
        frames["lsh_planes"].collect(), key=lambda r: r.n_planes
    )
    matry = sorted(
        frames["matryoshka_dims"].collect(), key=lambda r: r.trunc_dim
    )
    packing = sorted(
        frames["seq_len_packing"].collect(), key=lambda r: r.seq_len
    )
    thresholds = sorted(
        frames["dedup_thresholds"].collect(), key=lambda r: r.threshold_micros
    )
    bpe_rounds = sorted(
        frames["bpe_compression"].collect(), key=lambda r: r.merge_round
    )
    bbit = sorted(frames["minhash_bbit"].collect(), key=lambda r: r.bits)

    best_recall = max(r.recall_micros for r in probes)
    probe_pick = min(
        r.probe
        for r in probes
        if r.recall_micros >= best_recall - _RECALL_SLACK_MICROS
    )

    plane_pick = min(
        planes,
        key=lambda r: (
            -(r.recall_micros * 1_000_000 // max(r.n_candidates, 1)),
            r.n_candidates,
        ),
    ).n_planes

    full_recall = matry[-1].recall_micros  # largest dim = full vectors
    matry_ok = [
        r.trunc_dim
        for r in matry
        if r.recall_micros * 1_000_000
        >= _MATRYOSHKA_FLOOR_MICROS * full_recall
    ]
    matry_pick = min(matry_ok) if matry_ok else matry[-1].trunc_dim

    pack_pick = min(
        packing,
        key=lambda r: (r.tokens_truncated + r.tail_waste_tokens, r.seq_len),
    ).seq_len

    # BPE merge budget: marginal compression per round vs the
    # round-0 corpus cost; stop at the last round still clearing
    # the floor (reductions are near-monotone, the rule is exact
    # either way because it takes the MAX qualifying round).
    bpe_floor = max(
        bpe_rounds[0].total_symbols * _BPE_MARGINAL_FLOOR_MICROS // 1_000_000,
        1,
    )
    bpe_pick = 0
    for prev, cur in zip(bpe_rounds, bpe_rounds[1:]):
        if prev.total_symbols - cur.total_symbols >= bpe_floor:
            bpe_pick = cur.merge_round

    baseline_err = next(r.mean_abs_err_micros for r in bbit if r.bits == 64)
    bbit_ok = [
        r.bits
        for r in bbit
        if r.bits != 64
        and r.mean_abs_err_micros <= baseline_err + _BBIT_ERR_SLACK_MICROS
    ]
    bbit_pick = min(bbit_ok) if bbit_ok else 64

    # threshold knee: the larger threshold of the LAST strict
    # pair-count drop (walking ascending) — past it the curve is
    # flat and a tighter threshold buys nothing.
    knee = thresholds[0].threshold_micros
    for prev, cur in zip(thresholds, thresholds[1:]):
        if cur.n_pairs < prev.n_pairs:
            knee = cur.threshold_micros

    summary = {
        "sf_dir": sf_dir,
        "format": fmt,
        "ivf_probes": {
            "rows": [
                {
                    "probe": r.probe,
                    "recall_micros": r.recall_micros,
                    "n_candidates": r.n_candidates,
                }
                for r in probes
            ],
            "recommended_probe": probe_pick,
        },
        "lsh_planes": {
            "rows": [
                {
                    "n_planes": r.n_planes,
                    "recall_micros": r.recall_micros,
                    "n_candidates": r.n_candidates,
                }
                for r in planes
            ],
            "recommended_planes": plane_pick,
        },
        "matryoshka_dims": {
            "rows": [
                {"trunc_dim": r.trunc_dim, "recall_micros": r.recall_micros}
                for r in matry
            ],
            "recommended_dim": matry_pick,
        },
        "seq_len_packing": {
            "rows": [
                {
                    "seq_len": r.seq_len,
                    "tokens_truncated": r.tokens_truncated,
                    "tail_waste_tokens": r.tail_waste_tokens,
                }
                for r in packing
            ],
            "recommended_seq_len": pack_pick,
        },
        "dedup_thresholds": {
            "rows": [
                {
                    "threshold_micros": r.threshold_micros,
                    "n_pairs": r.n_pairs,
                    "n_docs_flagged": r.n_docs_flagged,
                }
                for r in thresholds
            ],
            "knee_threshold_micros": knee,
        },
        "bpe_compression": {
            "rows": [
                {
                    "merge_round": r.merge_round,
                    "total_symbols": r.total_symbols,
                    "n_symbol_types": r.n_symbol_types,
                }
                for r in bpe_rounds
            ],
            "recommended_merge_rounds": bpe_pick,
        },
        "minhash_bbit": {
            "rows": [
                {
                    "bits": r.bits,
                    "n_pairs": r.n_pairs,
                    "mean_abs_err_micros": r.mean_abs_err_micros,
                }
                for r in bbit
            ],
            "recommended_bits": bbit_pick,
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_SUMMARY.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    return summary
