"""Scale-slope measurement: generate a 10x (sf1) fixture set and measure
the heavy operator families at sf0.1 vs sf1 (VERDICT r8 item 1 — convert
the 100 TB prose into measured exponents).

Every 100 TB claim in the operator docstrings rests on sf0.1 timings plus
a plan-shape argument; one measured DECADE of scale makes the story
checkable: a narrow-map op should read ~1.0, the rank machinery ~n log n
(~1.1 at this decade), and anything super-linear is a bug to fix, not a
footnote.

sf1 generation (10x sf0.1, deterministic, structure-preserving):

- ``documents``: 10 copies; copy k's text passes through a per-copy
  LETTER/DIGIT ROTATION (``F.translate`` — a bijection on the alphabet),
  so WITHIN-copy duplicate structure (shingle sets, suffix spans, token
  Zipf) is preserved exactly while CROSS-copy text never collides —
  replicating verbatim would make every dup cluster 10x larger and the
  pair-output quadratically bigger, contaminating the slope with a data
  artifact instead of measuring the algorithm. doc_id shifts by copy.
- ``embeddings``: 10 copies; copy k's vector is DIMENSION-ROTATED by k
  (an isometry: all pairwise distances inside a copy are preserved
  exactly; cross-copy vectors decorrelate), vec_id shifts by copy.
- ``lineitem``/``orders``: 10 copies with key shifts (the linear-control
  anchor, q1 agg).

The measured mix is the verdict's heavy list: suffix array (q23),
winnowing + CDC chunkers (q24/q25), blocked graph-ANN (q19), connected
components (q12), MinHash LSH (q8), plus the q1 aggregation as the
known-linear control. Both scales run the MULTIFILE layout (sf0.1's
32-file twin vs sf1's 80 files) with the same session config — so the
slope is about the operators, not the scan layout. Per-query statistic:
min of N timed passes after one warm-up (the slope divides two numbers
from the SAME session, so warm-state bias cancels).

Usage:
    python tools/scale_slope.py [--passes 2] [--sf1-dir /tmp/...]
Output: one JSON line per stage, final line = the slope table
(seconds at both scales + exponent log10(t1/t0) per query).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_COPIES = 10
_SHIFT = 100_000_000  # id shift per copy — far above any fixture id

MIX = [
    ("q1_agg_linear_control", "agg_hash_groupby"),
    ("q8_minhash_lsh_dedup", "dedup_minhash_lsh_pairs"),
    ("q12_connected_components", "dedup_cluster_components"),
    ("q19_graph_ann_blocked", "sim_ann_graph_topk_blocked"),
    # the bits-∝-log-n variant of the blocked build: 4-bit tables at
    # sf0.1 (== the registered op), 7-bit at sf1 — the superlinearity
    # fix the first slope run demanded (fixed-width tables measured 15×
    # at 10×: bucket occupancy ∝ n ⇒ bucket-mate pairs ∝ n²/2^bits).
    # Both widths are REGISTERED driver-graded keys since round 10
    # (VERDICT r9 item 1): 4-bit = sim_ann_graph_topk_blocked,
    # 7-bit = sim_ann_graph_topk_blocked_wide.
    ("q19_graph_ann_blocked_scaled", "__q19_scaled"),
    # the self-tuning form (round 11, VERDICT r10 item 1): derives its
    # width from a build-time corpus count — the registered key runs
    # AS-IS at every scale, no per-scale key swap needed; its exponent
    # should track the hand-scaled row above
    ("q19_graph_ann_auto", "sim_ann_graph_topk_blocked_auto"),
    ("q23_suffix_array_span", "dedup_span_suffix_array"),
    ("q24_winnowing_fingerprints", "dedup_winnowing_fingerprints"),
    ("q25_cdc_chunking", "multimodal_cdc_chunk_savings"),
    # round 13 (VERDICT r12 item 1): the last heavies without a 25x
    # point — BPE merge training (fixed merge count over a corpus-wide
    # pair census), the composed IVF-PQ serving index (fixed k/M — watch
    # for the fixed-parameter superlinearity the 4-bit graph build had),
    # and the 5-fold held-out bigram perplexity DAG
    ("q13_bpe_train", "text_bpe_merges"),
    ("q21_ivf_pq_topk", "sim_ivf_pq_topk"),
    ("q22_heldout_perplexity", "text_heldout_perplexity"),
    # the round-13 DSIR selection composite: claimed linear (one
    # (doc_id, bucket) shuffle + broadcast distribution tables) — measured
    # rather than asserted
    ("q31_dsir_mix_shift", "corpus_dsir_resample_mix_shift"),
    # round-13 census completion: every REMAINING bench-mix family whose
    # tables the harness replicates (events now included — see _TABLES),
    # so "measured at 25x" holds for the whole mix rather than just the
    # heavies. q15 bloom-prefilter is the one documented exclusion (see
    # the _TABLES note on supplier).
    ("q2_orders_lineitem_join", "join_sortmerge"),
    ("q3_topk_per_customer", "win_rank_topk"),
    ("q4_encrypted_pipeline", "pipeline_end_to_end"),
    ("q5_tumbling_windows", "window_tumbling_counts"),
    ("q6_asof_join", "join_asof"),
    ("q7_cosine_topk", "sim_cosine_topk"),
    ("q9_near_dup_jaccard", "dedup_near_jaccard"),
    ("q10_tokenize_topterms", "text_tokenize_topterms"),
    ("q11_embedding_lsh_dedup", "dedup_embedding_lsh"),
    ("q14_training_manifest", "corpus_training_manifest"),
    ("q16_rolling_distinct", "events_rolling_distinct_users"),
    ("q17_scalable_rank_rfm", "rfm_segmentation_scalable"),
    ("q18_span_dedup", "dedup_span_exact"),
    # the fix for THE census finding: q11's fixed 4-bit prefix measured
    # exponent 1.60 (pairs ∝ n²/2^bits); the auto twin derives the
    # prefix via the graph family's proven log2(n/160) rule
    ("q32_embedding_lsh_auto", "dedup_embedding_lsh_auto"),
    # round 12 (VERDICT r11 item 2): the non-ANN heavy families whose only
    # slope points were <=10x — weighted-jaccard pairing and the
    # auto-sized Lloyd train (which derives k=round(sqrt(n)) from a live
    # count, so the registered key runs AS-IS at every scale: k=71/nprobe=8
    # at sf0.1's 5k vectors, k=354/nprobe=19 at sf2.5's 125k)
    # round 14 (VERDICT r13 item 3): the bloom pair under the supplier
    # co-shift (see _TABLES) — the FIXED 992-bit filter saturates by
    # design (the fp census in its own output shows it: the contrast
    # row), the auto key derives m from the 25x dim count and holds
    # fp ~= p; the q15 slope-exclusion paragraph in SCALING.md is
    # replaced by these measured points.
    ("q15_bloom_prefilter", "join_bloom_prefilter"),
    ("q33_bloom_auto", "join_bloom_prefilter_auto"),
    # ...and the 2-band OR-amplified embedding LSH (2x the q32 band cost
    # for the measured recall lift)
    ("q34_embedding_lsh_banded", "dedup_embedding_lsh_banded"),
    # round 15 (VERDICT r14 item 3): the target-recall auto-banded key —
    # at every scale the rule re-derives (bits from n, bands from R);
    # its cost should track q34 wherever both derive 2 bands and the
    # volume-ceiling clamp binds at wide bits
    ("q35_embedding_lsh_banded_auto", "dedup_embedding_lsh_banded_auto"),
    ("q20_weighted_jaccard", "dedup_weighted_jaccard"),
    ("q28_kmeans_ivf_auto", "sim_ann_kmeans_ivf_topk_auto"),
    # the sample-capped train twin (stride = n//(8k) derived from the same
    # count): train cost O(8k^2) = O(n) instead of O(n*k) = O(n^1.5) —
    # the slope delta vs q28 is the measured value of the sample cap
    ("q30_kmeans_ivf_sampled", "sim_ann_kmeans_ivf_topk_auto_sampled"),
    # round 15, second session: SemDeDup — the occupancy-budget sizing
    # (k = n/50 cells) makes within-cell pair work ~25n, so the slope
    # should read ~linear-or-below; the delta vs q30 (same sampled
    # Lloyd train at k = sqrt(n)) prices the pair pass. And the
    # embedding decontam scan — self-tuning eval modulus keeps the eval
    # set ~10 rows at any n, so the pair grid is ~10n (one broadcast
    # corpus pass; a fixed modulus would have read quadratic here).
    ("q37_semdedup_cells", "dedup_semdedup_cells"),
    ("q38_decontam_embedding", "decontam_embedding_cosine"),
]

_SCALED_BITS = {"small": 4, "big": 7}  # log2(10×) ≈ +3.3 bits

# tables the mix touches — only these are generated at sf1.
# events: copies shift event_id/user_id and KEEP ts, so every window gets
# copies× denser — the honest way an event stream scales (more users and
# events per unit time, not a longer history); NULL user_ids stay NULL
# (null + shift = null). ts round-trips as raw nanos (read under
# nanosAsLong, written as INT64) and load_events' LongType branch
# converts it exactly as it does the original fixture.
# supplier replication (round 14 — closes the standing q15 exclusion):
# copies co-shift s_suppkey AND lineitem.l_suppkey by the same k*_SHIFT,
# so per-copy join structure is preserved exactly (fact 25x, dim 25x,
# matches 25x, no cross-copy fan-out). Under this transform the FIXED
# 992-bit bloom (q15) saturates honestly — fp -> 1 is the measurement,
# the contrast row — while the auto key derives m ∝ n_dim and holds
# fp ~= p; both are in MIX below. The r13 exclusion reasoning ("either
# way the measurement would be about the fixture transform") applied to
# measuring the FIXED key alone; with the auto twin the co-shift IS the
# honest scaling and the fixed key's saturation is the point.
_TABLES = ("documents", "embeddings", "lineitem", "orders", "events", "supplier")

# transform version: bumped whenever a _TABLES transform changes shape
# (r14: supplier added + l_suppkey co-shift; r15: documents extended past
# 26 copies with the dihedral lap). A dir generated under a different
# version must never be silently measured — same failure class as a
# copies mismatch (mixed-scale directory), enforced via the manifest.
_XFORM_VERSION = 3


def _rot(s: str, k: int) -> str:
    return s[k:] + s[:k]


def _doc_perm(k: int) -> tuple[str, str]:
    """Per-copy character bijection for the documents table, as a
    (src, dst) pair for ``translate`` — VERDICT r14 item 4's ≥50x
    document decade. Copies 0..25 are the original letter/digit
    ROTATIONS; copies 26..51 are the SECOND lap: the same rotations
    composed with the alphabet REFLECTION (together the dihedral group
    D26 — 52 distinct permutations). Any character bijection preserves
    within-copy dup structure EXACTLY (s == t  <=>  perm(s) == perm(t),
    character-wise, so shingle sets, suffix spans, LCP lengths and span
    clusters are invariant — the law tests/test_round15_ops.py pins);
    cross-copy collisions need every char of a span fixed under
    perm_j^-1 ∘ perm_k, and a non-identity dihedral element fixes at
    most 2 letters — so >=3-distinct-char spans never collide across
    copies. Digits ride the same family at period 10."""
    lower, upper, digits = (
        string.ascii_lowercase,
        string.ascii_uppercase,
        string.digits,
    )
    assert 0 <= k < 52, "documents transform supports at most 52 copies"
    if k < 26:
        dst = _rot(lower, k) + _rot(upper, k) + _rot(digits, k % 10)
    else:
        j = k - 26
        dst = (
            _rot(lower[::-1], j)
            + _rot(upper[::-1], j)
            + _rot(digits[::-1], j % 10)
        )
    return lower + upper + digits, dst


def generate_sf1(
    spark,
    sf01_dir: str,
    out_dir: str,
    copies: int = _COPIES,
    tables: tuple = _TABLES,
) -> None:
    from pyspark.sql import functions as F

    # documents caps at the 52 distinct dihedral permutations (_doc_perm:
    # 26 rotations + 26 reflected rotations — r15's second lap, the
    # document analog of the embeddings' rotation+negation lap); beyond
    # that, copies share a permutation and dup clusters silently merge
    # across copies, contaminating the slope with a data artifact. The
    # cap binds only when documents is among the generated tables — the
    # 100x embeddings-only dir uses rotation+negation laps, distinct up
    # to 2*dim = 128 copies.
    if "documents" in tables:
        assert copies <= 52, "dihedral lap supports at most 52 distinct copies"
    assert copies <= 128, "embedding rotation+negation supports at most 128 copies"
    # copies manifest: a dir generated at one multiplier must never be
    # silently measured at another (--copies 3 against a leftover
    # 10-copy dir would label sf1 numbers as sf0.3). Written BEFORE any
    # table is generated (ADVICE r10): a generation interrupted after
    # renaming some tables used to leave a manifest-less dir that a rerun
    # at a different --copies would warn about, then fill the missing
    # tables at the NEW multiplier — a silently mixed-scale directory.
    manifest = f"{out_dir}/_copies.json"
    pre_existing = [
        t for t in tables if os.path.isdir(f"{out_dir}/{t}.parquet")
    ]
    if os.path.exists(manifest):
        with open(manifest) as fh:
            mf = json.load(fh)
        have, have_x = mf["copies"], mf.get("xform", 1)
        if have != copies or have_x != _XFORM_VERSION:
            raise SystemExit(
                f"{out_dir} was generated with copies={have} "
                f"xform=v{have_x}, asked for copies={copies} "
                f"xform=v{_XFORM_VERSION} — point --sf1-dir at a fresh "
                "directory"
            )
    elif pre_existing:
        # tables exist but no manifest: the multiplier is unverifiable, so
        # refuse — filling in missing tables at the asked-for value could
        # mix scales (the exact failure class the staging fix targets)
        raise SystemExit(
            f"{out_dir} has tables ({', '.join(pre_existing)}) but no "
            f"_copies.json manifest — its multiplier is unverifiable; "
            f"point --sf1-dir at a fresh directory"
        )
    else:
        # stamp the INTENDED multiplier up front so any interruption from
        # here on leaves a dir that later runs validate, never guess
        with open(manifest, "w") as fh:
            json.dump({"copies": copies, "xform": _XFORM_VERSION}, fh)
    for table in tables:
        dst = f"{out_dir}/{table}.parquet"
        if os.path.isdir(dst):
            print(json.dumps({"stage": "generate", "table": table,
                              "skipped": "exists"}))
            continue
        # stage into a temp dir and rename into place on completion
        # (ADVICE r9 item 1: an interrupted append loop used to leave a
        # partial <10-copy table that later runs silently treated as
        # complete, corrupting every downstream slope)
        stage = f"{out_dir}/.staging-{table}.parquet"
        if os.path.isdir(stage):
            import shutil

            shutil.rmtree(stage)
        src = spark.read.parquet(f"{sf01_dir}/{table}.parquet")
        for k in range(copies):
            df = src
            if table == "documents":
                src_chars, dst_chars = _doc_perm(k)
                df = df.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(k * _SHIFT)
                ).withColumn(
                    "text", F.translate("text", src_chars, dst_chars)
                )
            elif table == "embeddings":
                dim_probe = len(src.select("embedding").head()["embedding"])
                # copy k: cyclic dim rotation by k % dim; the second lap
                # (k >= dim, the 100x path) additionally NEGATES every
                # component — negation flips every hyperplane sign, a
                # bucket bijection (occupancy spread preserved), and
                # cos(-a,-b) = cos(a,b) keeps within-copy dup structure
                # while cross-lap pairs land at -cos (below any tau)
                r = k % dim_probe
                rot = (
                    F.concat(
                        F.slice("embedding", r + 1, dim_probe - r),
                        F.slice("embedding", 1, r),
                    )
                    if r
                    else F.col("embedding")
                )
                if k >= dim_probe:
                    rot = F.transform(rot, lambda x: -x)
                df = df.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(k * _SHIFT)
                ).withColumn("embedding", rot)
            elif table == "lineitem":
                df = df.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(k * _SHIFT)
                ).withColumn(
                    "l_suppkey", F.col("l_suppkey") + F.lit(k * _SHIFT)
                )
            elif table == "supplier":
                df = df.withColumn(
                    "s_suppkey", F.col("s_suppkey") + F.lit(k * _SHIFT)
                )
            elif table == "orders":
                df = df.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(k * _SHIFT)
                ).withColumn(
                    "o_custkey", F.col("o_custkey") + F.lit(k * _SHIFT)
                )
            elif table == "events":
                df = df.withColumn(
                    "event_id", F.col("event_id") + F.lit(k * _SHIFT)
                ).withColumn(
                    "user_id", F.col("user_id") + F.lit(k * _SHIFT)
                )
            df.repartition(8).write.mode(
                "append" if k else "overwrite"
            ).parquet(stage)
        os.rename(stage, dst)  # completion marker: dst exists <=> all copies
        print(json.dumps({"stage": "generate", "table": table, "copies": copies}))


def _run(queries, spark, key: str, sf_dir: str) -> float:
    from dataflow_pubsub_message_encryption_spark.materialize import release_pins

    t0 = time.time()
    queries[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    release_pins(spark)
    return dt


def measure(
    queries, spark, sf_dir: str, passes: int, medians=None, warmups: int = 1
) -> dict[str, float]:
    """Per-query MIN of ``passes`` timed runs after ``warmups`` warm-up
    passes; when a ``medians`` dict is supplied, the per-query median also
    lands there (VERDICT r9 item 4 — bound run-to-run variance in the
    artifact, the q19/sf1 reading spread 4× between runs). At the top
    stress scale, where generation immediately precedes measurement, use
    ``warmups=2`` — the r10 sf2.5 passes read monotone-decreasing
    (113/88/53 s) because the page cache was still warming in after the
    generation write (VERDICT r10 item 6)."""
    import statistics

    out: dict[str, float] = {}
    for label, key in MIX:
        for _ in range(max(1, warmups)):  # warm (codegen/C2/Arrow/page cache)
            _run(queries, spark, key, sf_dir)
        times = [_run(queries, spark, key, sf_dir) for _ in range(passes)]
        out[label] = round(min(times), 3)
        rec = {"stage": "measure", "sf_dir": sf_dir, "query": label,
               "sec": out[label]}
        if medians is not None:
            medians[label] = round(statistics.median(times), 3)
            rec["median_sec"] = medians[label]
            rec["all_sec"] = [round(t, 3) for t in times]
        print(json.dumps(rec))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--sf1-dir",
        default=os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sparkgraft-sf1"),
    )
    ap.add_argument(
        "--sf01-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated MIX label substrings to measure (e.g. "
        "'q19,q23,q1_' for a targeted upper-scale point); empty = all",
    )
    ap.add_argument(
        "--copies",
        type=int,
        default=_COPIES,
        help="fixture multiplier for the big scale (10 = the sf1 decade; "
        "3 = an sf0.3 half-decade point for 3-point exponent fits — "
        "pair with --sf1-dir /tmp/sparkgraft-sf0.3)",
    )
    ap.add_argument(
        "--tables",
        default="",
        help="comma-separated subset of tables to generate at the big "
        "scale (empty = all of _TABLES); the 100x embeddings-only point "
        "uses --tables embeddings (documents' letter rotation caps at 26 "
        "copies, embeddings' rotation+negation laps reach 128)",
    )
    ap.add_argument(
        "--warmups",
        type=int,
        default=1,
        help="warm-up passes per query before the timed passes; use 2 at "
        "the top stress scale where generation immediately precedes "
        "measurement (page-cache warm-in, VERDICT r10 item 6)",
    )
    args = ap.parse_args()
    if args.only:
        keep = [tok for tok in args.only.split(",") if tok]
        global MIX
        MIX = [(l, k) for l, k in MIX if any(t in l for t in keep)]
        if not MIX:
            raise SystemExit(f"--only {args.only!r} matches no MIX label")

    from dataflow_pubsub_message_encryption_spark.operators import registry
    from dataflow_pubsub_message_encryption_spark.session import get_session

    queries, _ = registry()
    spark = get_session("scale-slope")

    # hold layout constant: sf0.1 runs its 32-file multifile twin
    import bench

    twin = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        os.path.basename(args.sf01_dir.rstrip("/")) + "-multifile",
    )
    bench.ensure_multifile_twin(spark, args.sf01_dir, twin)

    os.makedirs(args.sf1_dir, exist_ok=True)
    gen_tables = (
        tuple(t for t in args.tables.split(",") if t) if args.tables else _TABLES
    )
    unknown = [t for t in gen_tables if t not in _TABLES]
    if unknown:
        raise SystemExit(f"--tables names unknown tables: {unknown}")
    generate_sf1(spark, args.sf01_dir, args.sf1_dir, args.copies, gen_tables)

    # both widths of the bits-knob are registered keys now (round 10):
    # the small scale runs the 4-bit registered op, the big scale the
    # 7-bit registered wide op — the slope row quotes driver-graded
    # queries end to end (VERDICT r9 item 1)
    def _with_scaled(which):
        q = dict(queries)
        q["__q19_scaled"] = queries[
            "sim_ann_graph_topk_blocked"
            if which == "small"
            else "sim_ann_graph_topk_blocked_wide"
        ]
        return q

    med_small: dict[str, float] = {}
    med_big: dict[str, float] = {}
    t_small = measure(
        _with_scaled("small"), spark, twin, args.passes, med_small,
        warmups=args.warmups,
    )
    t_big = measure(
        _with_scaled("big"), spark, args.sf1_dir, args.passes, med_big,
        warmups=args.warmups,
    )

    slopes = {}
    for label, _ in MIX:
        a, b = t_small[label], t_big[label]
        slopes[label] = {
            "sf0.1_sec": a,
            "sf1_sec": b,  # 'sf1' = the --copies big scale (see 'copies')
            "sf0.1_median_sec": med_small[label],
            "sf1_median_sec": med_big[label],
            "ratio": round(b / a, 2),
            # a true scaling exponent: t1/t0 = copies^e — log10 only when
            # the span is a decade (ADVICE r10: the sf0.3 logs recorded
            # log10 values ~2.4× smaller than the real 3×-span exponent)
            "exponent": (
                round(math.log(b / a) / math.log(args.copies), 3)
                if a > 0 and args.copies > 1
                else None
            ),
        }
    if "q19_graph_ann_blocked_scaled" in slopes:
        slopes["q19_graph_ann_blocked_scaled"]["bits"] = _SCALED_BITS
        slopes["q19_graph_ann_blocked_scaled"]["keys"] = {
            "small": "sim_ann_graph_topk_blocked",
            "big": "sim_ann_graph_topk_blocked_wide",
        }
    if "q19_graph_ann_auto" in slopes:
        # record the widths the auto rule derived at each scale (the rule
        # is deterministic in the corpus count, so this is the measured
        # run's configuration, not a guess)
        from dataflow_pubsub_message_encryption_spark.operators.similarity import (
            _grb_auto_bits,
        )

        n_small = spark.read.parquet(f"{twin}/embeddings.parquet").count() - 1
        n_big = (
            spark.read.parquet(f"{args.sf1_dir}/embeddings.parquet").count() - 1
        )
        slopes["q19_graph_ann_auto"]["bits"] = {
            "small": _grb_auto_bits(n_small),
            "big": _grb_auto_bits(n_big),
        }
    spark.stop()
    print(
        json.dumps(
            {
                "metric": (
                    f"scale slope sf0.1 -> sf{args.copies / 10:g} "
                    f"({args.copies}x span), multifile layout"
                ),
                "copies": args.copies,
                "passes": args.passes,
                "warmups": args.warmups,
                "slopes": slopes,
            }
        )
    )


if __name__ == "__main__":
    main()
