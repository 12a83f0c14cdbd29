"""Property tests. Hypothesis drives the pure-Python layers (spec
validation — many examples are cheap there); Spark-side properties use
one seeded-random batch per test so the whole property costs a single
job, not max_examples jobs."""

from __future__ import annotations

import json
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from monasca_aggregator_spark.models import AggregationSpec, Rollup, SpecError

# the reference's seven + this engine's sketch-backed DSL extensions
_FUNCTIONS = (
    "sum", "count", "avg", "min", "max", "delta", "rate",
    "distinct", "p95",
)

_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=12,
)


@given(fn=_names)
@settings(max_examples=200, deadline=None)
def test_only_reference_functions_accepted(fn):
    """Any function name outside the supported set must be rejected
    (reference: models/aggregation_specification.go validation)."""
    kwargs = dict(
        name="n",
        aggregated_metric_name="a",
        filtered_metric_name="f",
        function=fn,
    )
    if fn in _FUNCTIONS:
        AggregationSpec(**kwargs)
    else:
        with pytest.raises(SpecError):
            AggregationSpec(**kwargs)


@given(
    grouped=st.lists(_names, max_size=4, unique=True),
    rollup_extra=st.lists(_names, max_size=3, unique=True),
)
@settings(max_examples=200, deadline=None)
def test_rollup_dims_subset_invariant(grouped, rollup_extra):
    """Rollup grouped dims valid iff ⊆ outer grouped dims
    (reference: aggregation_specification.go rollup validation)."""
    rollup_dims = tuple(rollup_extra)
    kwargs = dict(
        name="n",
        aggregated_metric_name="a",
        filtered_metric_name="f",
        function="sum",
        grouped_dimensions=tuple(grouped),
        rollup=Rollup(function="max", grouped_dimensions=rollup_dims),
    )
    if set(rollup_dims) <= set(grouped):
        AggregationSpec(**kwargs)
    else:
        with pytest.raises(SpecError):
            AggregationSpec(**kwargs)


def test_window_id_matches_reference_formula(spark):
    """Spark's tumbling window start == floor(ts_ms / W)*W for random
    timestamps (reference: aggregation_rule.go:52 epoch alignment) —
    one job over a 500-row seeded batch."""
    from pyspark.sql import functions as F

    rng = random.Random(7)
    w_ms = 3600 * 1000
    ts_ms = [rng.randrange(0, 2_000_000_000_000) for _ in range(500)]
    df = spark.createDataFrame([(t,) for t in ts_ms], "ts_ms long")
    got = (
        df.select(
            "ts_ms",
            F.unix_millis(
                F.window(F.timestamp_millis("ts_ms"), "3600 seconds").start
            ).alias("w"),
        )
        .orderBy("ts_ms")
        .collect()
    )
    for r in got:
        assert r.w == (r.ts_ms // w_ms) * w_ms


def test_envelope_json_roundtrip_random_batch(spark):
    """parse_envelopes inverts the wire format for arbitrary
    names/dims/values — one job over a 200-row seeded batch."""
    from monasca_aggregator_spark.sources.envelope import parse_envelopes

    rng = random.Random(11)

    def rand_str():
        return "".join(
            rng.choice("abcXYZ012 _.-é世") for _ in range(rng.randrange(1, 10))
        )

    envs = []
    for i in range(200):
        envs.append(
            {
                "metric": {
                    "name": rand_str(),
                    "dimensions": {
                        rand_str(): rand_str() for _ in range(rng.randrange(0, 4))
                    },
                    "timestamp": float(rng.randrange(0, 2_000_000_000_000)),
                    "value": rng.uniform(-1e6, 1e6),
                    "value_meta": {},
                },
                "meta": {"tenantId": rand_str(), "extra": rand_str()},
                "creation_time": i,
            }
        )
    raw = spark.createDataFrame(
        [(json.dumps(e),) for e in envs], "value string"
    )
    rows = parse_envelopes(raw).collect()
    assert len(rows) == len(envs)
    for row, env in zip(rows, envs):
        assert row.name == env["metric"]["name"]
        assert dict(row.dimensions or {}) == env["metric"]["dimensions"]
        assert row.value == pytest.approx(env["metric"]["value"])
        assert row.tenant_id == env["meta"]["tenantId"]
        assert int(row.timestamp.timestamp() * 1000) == int(
            env["metric"]["timestamp"]
        )


def test_minhash_estimates_jaccard_random_batch(spark):
    """Fraction of agreeing signature positions ≈ true Jaccard (the
    MinHash property) over seeded random shingle sets — one job."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.functions.text import minhash_signature

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(400)]
    pairs = []
    for _ in range(40):
        base = rng.sample(vocab, 60)
        overlap = rng.randrange(0, 61)
        other = base[:overlap] + rng.sample(
            [w for w in vocab if w not in base], 60 - overlap
        )
        pairs.append((base, other))
    df = spark.createDataFrame(
        pairs, "a array<string>, b array<string>"
    )
    out = df.select(
        minhash_signature(F.col("a"), 64).alias("sa"),
        minhash_signature(F.col("b"), 64).alias("sb"),
        (
            F.size(F.array_intersect("a", "b"))
            / F.size(F.array_union("a", "b"))
        ).alias("true_j"),
    ).select(
        "true_j",
        (
            F.size(
                F.filter(
                    F.zip_with("sa", "sb", lambda x, y: x == y),
                    lambda m: m,
                )
            )
            / F.lit(64.0)
        ).alias("est_j"),
    )
    rows = out.collect()
    # per-pair: 64 hashes → se ≈ sqrt(j(1-j)/64) ≤ 0.0625; allow 4 se
    for r in rows:
        assert abs(r.est_j - r.true_j) < 0.25
    # aggregate bias: mean error should be near zero
    mean_err = sum(r.est_j - r.true_j for r in rows) / len(rows)
    assert abs(mean_err) < 0.03


def test_split_total_and_stable_random_batch(spark):
    """split_assign: every row gets exactly one split; membership is a
    pure function of the bucket (stable under repartition); fractions
    track the bucket ranges."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.operators.sampling import split_assign

    rng = random.Random(7)
    ids = [(rng.randrange(0, 10**12),) for _ in range(5000)]
    df = spark.createDataFrame(ids, "doc_id long")
    b = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(100))
    splits = [("train", 80), ("val", 90), ("test", 100)]

    out = split_assign(df, b, splits)
    counts = {
        r.split: r.n
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == len(ids)  # total: nothing dropped
    assert set(counts) <= {"train", "val", "test"}
    # xxhash spreads ~uniformly: train fraction within ±5pp of 80%
    assert abs(counts["train"] / len(ids) - 0.80) < 0.05

    again = {
        r.doc_id: r.split
        for r in split_assign(df.repartition(13), b, splits).collect()
    }
    first = {r.doc_id: r.split for r in out.collect()}
    assert first == again  # stability under re-partitioning


def test_pack_conserves_docs_and_bounds_chunks_random_batch(spark):
    """pack_concat_chunk: every doc lands in exactly one chunk; chunk
    payloads are bounded by budget + the max doc size (a doc may
    straddle one boundary, never two ... as long as no single doc
    exceeds the budget, each chunk holds < budget + max_doc chars)."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.operators.sampling import pack_concat_chunk

    rng = random.Random(11)
    budget = 1000
    rows = [
        (f"s{rng.randrange(3)}", i, rng.randrange(1, 400))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, sz long")
    packed = pack_concat_chunk(df, "src", "doc_id", "sz", budget)
    assert packed.count() == len(rows)  # conservation

    per_chunk = (
        packed.groupBy("src", "chunk_id")
        .agg(F.sum("sz").alias("chars"))
        .collect()
    )
    max_doc = max(r[2] for r in rows)
    for r in per_chunk:
        assert r.chars < budget + max_doc
    # chunk ids are dense from 0 per group (no gaps: offsets are a
    # contiguous cumsum)
    by_src: dict = {}
    for r in per_chunk:
        by_src.setdefault(r.src, []).append(r.chunk_id)
    for src, chunks in by_src.items():
        assert sorted(chunks) == list(range(len(chunks)))


@given(
    data=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=400,
    ),
    q=st.floats(min_value=0.01, max_value=0.99),
)
@settings(max_examples=40, deadline=None)
def test_tdigest_quantile_within_range_and_weight_conserved(data, q):
    import numpy as np

    from monasca_aggregator_spark.operators.tdigest import (
        compress,
        quantile,
    )

    x = np.asarray(data, dtype=float)
    m, w = compress(x, np.ones(x.size), 50.0)
    assert w.sum() == pytest.approx(x.size)
    est = quantile(m, w, q)
    assert min(data) <= est <= max(data)


@given(
    tokens=st.lists(
        st.sampled_from([f"t{i}" for i in range(30)]),
        min_size=1,
        max_size=600,
    ),
    cap=st.integers(min_value=4, max_value=64),
)
@settings(max_examples=40, deadline=None)
def test_space_saving_bounds_hold_for_any_stream(tokens, cap):
    from collections import Counter

    from monasca_aggregator_spark.operators.heavyhitters import (
        _space_saving,
    )

    summary = _space_saving(tokens, cap)
    truth = Counter(tokens)
    assert len(summary) <= cap
    for t, (cnt, err) in summary.items():
        assert cnt >= truth[t] >= cnt - err
    for t, c in truth.items():
        if c > len(tokens) / cap:
            assert t in summary


def test_merge_pass_eliminates_target_pair_property():
    """Property: after one greedy-leftmost merge pass for rule (a, b),
    no adjacent (a, b) pair survives (merged symbol differs from a) —
    over random symbol sequences."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from monasca_aggregator_spark.operators.bpe import _merge_pass

    syms = st.lists(st.sampled_from(["a", "b", "c", "ab"]), max_size=40)

    @settings(max_examples=200, deadline=None)
    @given(syms)
    def check(s):
        out = _merge_pass(list(s), "a", "b", "ab")
        assert all(
            not (x == "a" and y == "b") for x, y in zip(out, out[1:])
        )
        # token mass is conserved: concatenation round-trips
        assert "".join(out) == "".join(s)

    check()


def test_png_round_trip_property():
    """Property: encode→decode is the identity for random 8-bit images
    across shapes, channel counts, and filter types."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from monasca_aggregator_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        c=st.sampled_from([1, 3, 4]),
        ft=st.integers(0, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, c, ft, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        out = decode_png(encode_png(img, filter_type=ft))
        assert out.shape == (h, w, c)
        assert (out == img).all()

    check()


def test_span_rewrite_matches_bruteforce_random_batch(spark):
    """Random tiny-vocab corpora (heavy span collisions by
    construction): span_dedup_rewrite must match a brute-force Python
    reference computing first-seen spans and coverage — one seeded
    batch, one Spark job."""
    import hashlib

    from monasca_aggregator_spark.operators.textops import (
        span_dedup_rewrite,
    )

    rng = random.Random(77)
    n_span = 4
    vocab = [f"w{i}" for i in range(6)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
        for i in range(40)
    ]

    # brute-force reference
    first_seen: dict[tuple, int] = {}
    toks_by_doc = {}
    for did, text in docs:
        toks = text.lower().strip().split() if text.strip() else [""]
        if text == "":
            toks = [""]
        toks_by_doc[did] = toks
        for s in range(len(toks) - n_span + 1):
            key = tuple(toks[s : s + n_span])
            first_seen.setdefault(key, did)
    want = {}
    for did, toks in toks_by_doc.items():
        rm = [False] * len(toks)
        for s in range(len(toks) - n_span + 1):
            if first_seen[tuple(toks[s : s + n_span])] < did:
                for p in range(s, s + n_span):
                    rm[p] = True
        kept = [t for t, r in zip(toks, rm) if not r]
        want[did] = (
            len(toks),
            sum(rm),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.kept_md5)
        for r in span_dedup_rewrite(df, n=n_span).collect()
    }
    assert got == want


def test_twa_matches_bruteforce_random_batch(spark):
    """Random irregular series incl. same-timestamp ties and
    singleton series: metric_twa's windowed integral must match a
    brute Python piecewise-constant integration with the identical e3
    quantization and window attribution."""
    from monasca_aggregator_spark.plans.series import _HOUR_MS

    rng = random.Random(13)
    rows = []
    eid = 0
    for m in ("a", "b"):
        for u in range(3):
            t = 1_700_000_000_000
            for _ in range(rng.randint(1, 25)):
                t += rng.choice([0, 1_000, 60_000, 1_800_000, 4_000_000])
                rows.append((eid, m, u, t, rng.uniform(-5, 50)))
                eid += 1

    import math

    segs: dict[tuple, list] = {}
    by_series: dict[tuple, list] = {}
    for eid_, m, u, t, v in rows:
        by_series.setdefault((m, u), []).append((t, eid_, v))
    for (m, u), pts in by_series.items():
        pts.sort()
        for (t1, _, v1), (t2, _, _) in zip(pts, pts[1:]):
            w = (t1 // _HOUR_MS) * _HOUR_MS
            v_e3 = math.floor(v1 * 1000.0 + 0.5)
            segs.setdefault((m, w), []).append((v_e3, t2 - t1))
    want = {}
    for key, ss in segs.items():
        num = sum(v * dt for v, dt in ss)
        den = sum(dt for v, dt in ss)
        twa = (
            math.floor((num / (1000.0 * den)) * 10000.0 + 0.5) / 10000.0
            if den > 0
            else None
        )
        want[key] = (twa, len(ss), den)

    from pyspark.sql import functions as SF

    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, t long, value double"
    ).select(
        "event_id", "event_type", "user_id",
        SF.timestamp_millis(SF.col("t")).alias("ts"), "value",
    )
    import monasca_aggregator_spark.plans.series as series_mod
    from monasca_aggregator_spark.plans.series import q_metric_twa

    # run the same plan body against the synthetic frame
    orig = series_mod.load_table
    series_mod.load_table = lambda *_a, **_k: df
    try:
        got = {
            (r.event_type, r.window_ts_ms): (r.twa, r.n_segments, r.covered_ms)
            for r in q_metric_twa(spark, "unused").collect()
        }
    finally:
        series_mod.load_table = orig
    assert got == want


def test_prefix_jaccard_lossless_on_random_corpora(spark):
    """One seeded-random corpus sweep: across word-pool sizes (which
    control how much docs overlap) and thresholds, the prefix-filtered
    join must equal the exhaustive self-join exactly."""
    from monasca_aggregator_spark.operators import dedup as D

    rng = random.Random(99)
    rows = []
    did = 0
    for pool in (6, 12, 30):
        words = [f"p{pool}w{i}" for i in range(pool)]
        for _ in range(12):
            n = rng.randint(3, 14)
            rows.append((did, " ".join(rng.choice(words) for _ in range(n))))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()
    for thr in (0.25, 0.5, 0.75):
        exact = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in D.ngram_jaccard_pairs(docs, threshold=thr).collect()
        )
        pref = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in D.jaccard_prefix_pairs(docs, threshold=thr).collect()
        )
        assert pref == exact, f"threshold {thr}"
    assert exact or thr  # low-threshold rounds produce pairs


def test_weighted_median_matches_numpy_definition(spark, tmp_path):
    """Random weighted multisets: the windowed crossing pick equals the
    direct definition (smallest value with cumweight*2 >= total)."""
    import pandas as pd

    from monasca_aggregator_spark.plans.analytic import q_weighted_median

    rng = random.Random(5)
    rows = []
    for g in ("A", "B", "C"):
        for i in range(rng.randint(5, 40)):
            rows.append(
                (g, float(rng.randint(1, 20)), float(rng.randint(1, 9)), 1, i)
            )
    pd.DataFrame(
        rows,
        columns=[
            "l_returnflag", "l_extendedprice", "l_quantity",
            "l_orderkey", "l_linenumber",
        ],
    ).to_parquet(tmp_path / "lineitem.parquet")
    got = {
        r.l_returnflag: r.weighted_median_price
        for r in q_weighted_median(spark, str(tmp_path)).collect()
    }

    def direct(grp):
        items = sorted((p, w) for _, p, w, _, _ in grp)
        total = sum(w for _, w in items)
        cum = 0
        for p, w in items:
            cum += w
            if cum * 2 >= total:
                return p

    by_g = {}
    for row in rows:
        by_g.setdefault(row[0], []).append(row)
    for g, grp in by_g.items():
        assert got[g] == direct(grp), g


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    gray=st.booleans(),
    subsample=st.booleans(),
    quality=st.integers(min_value=30, max_value=100),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_never_crashes_and_bounds_error(
    h, w, gray, subsample, quality, seed
):
    """Pure-numpy property: encode_jpeg→decode_jpeg succeeds on ANY
    image shape (including 1×1 and non-multiple-of-8/16 edges), output
    shape matches, and reconstruction error is bounded by quantization
    noise that shrinks as quality rises."""
    import numpy as np

    from monasca_aggregator_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    # gentle gradient around a random level: JPEG's error bound is
    # only meaningful on low-frequency content — random pixels at
    # tiny sizes are all high frequency and legitimately lossy
    level = rng.integers(40, 216, size=(1 if gray else 3,))
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((xx + yy) % 32 - 16)[..., None]
    img = np.clip(level[None, None, :] + grad, 0, 255).astype(np.uint8)
    if gray:
        img = img[..., 0]
    dec = decode_jpeg(
        encode_jpeg(img, quality=quality, subsample=subsample)
    )
    exp_c = 1 if gray else 3
    assert dec.shape == (h, w, exp_c)
    ref = img if not gray else img[..., None]
    err = np.abs(dec.astype(int) - ref.astype(int))
    assert err.max() <= 48


def test_html_extractor_properties_random_batch(spark):
    """HTML extractor robustness on adversarial input (one seeded
    batch, one Spark job): for random tag-soup strings —

    - NEVER crashes, never yields NULL main_text;
    - output contains no '<tag>' markup (script/style/comment bodies
      and all tags stripped);
    - output whitespace is canonical (no doubles, no lead/trail);
    - a page whose every block is chrome quarantines (kept == 0);
    - extraction is IDEMPOTENT: re-wrapping the extracted text in a
      single <p> and extracting again returns the same text (the
      canonical form is a fixed point).
    """
    import random as _r

    from pyspark.sql import functions as F

    from monasca_aggregator_spark.operators.html import extract_main

    rng = _r.Random(7)
    # NB: decoded entities are DATA — "&lt;b&gt;" would legitimately
    # put a literal "<b>" in the output (decode runs AFTER
    # tag-stripping), so the no-markup property uses entity words
    # that decode to non-markup only
    words = ["alpha", "beta", "gamma", "delta", "x1", "&amp;"]
    tags = ["p", "div", "li", "h1", "br", "span", "a href='/x'",
            "script", "style", "nav", "table", "td"]

    def soup():
        parts = []
        for _ in range(rng.randint(1, 25)):
            r = rng.random()
            if r < 0.35:
                t = rng.choice(tags)
                parts.append(f"<{t}>" if rng.random() < 0.6
                             else f"</{t.split()[0]}>")
            elif r < 0.45:
                parts.append("<!-- c -->")
            elif r < 0.5:
                parts.append("<script>var a='<p>x</p>';</script>")
            else:
                parts.append(
                    " ".join(rng.choices(words, k=rng.randint(1, 12)))
                )
        return "".join(parts)

    rows = [(i, soup()) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, html string")
    out = extract_main(df).collect()
    assert len(out) == 200
    import re as _re

    for r in out:
        assert r.main_text is not None
        assert not _re.search(r"</?[a-zA-Z][^>]*>", r.main_text), (
            r.main_text
        )
        assert "  " not in r.main_text
        assert r.main_text == r.main_text.strip()
        assert (r.n_kept == 0) == r._quarantined

    # idempotence: extract(wrap(extract(x))) == extract(x) for kept rows
    kept = [(r.id, f"<p>{r.main_text}</p>") for r in out if r.n_kept > 0]
    if kept:
        df2 = spark.createDataFrame(kept, "id long, html string")
        again = {r.id: r.main_text for r in extract_main(df2).collect()}
        want = {r.id: r.main_text for r in out if r.n_kept > 0}
        # blocks shorter than MIN_BLOCK_CHARS drop on re-extraction;
        # compare only rows whose text clears the length gate
        for i, txt in want.items():
            if len(txt) >= 25:
                assert again[i] == txt, i


def test_banding_pigeonhole_recall_property(spark):
    """Pigeonhole guarantee of hamming64_band_pairs at BOTH band
    widths (4×16 aHash, 8×8 pHash): one seeded-random batch of hash
    pairs at every Hamming distance ≤ n_bands−1 — each MUST be found
    (recall is structural, not probabilistic), and a pair strictly
    above max_hamming must NOT pass the exact verify."""
    from monasca_aggregator_spark.operators.dedup import (
        hamming64_band_pairs,
    )

    rng = random.Random(2024)
    for n_bands in (4, 8):
        rows = []
        expected = set()
        rid = 0
        for d in range(0, n_bands):  # distances 0..n_bands-1
            for _ in range(8):
                base = rng.getrandbits(64)
                bits = rng.sample(range(64), d)
                twin = base
                for b in bits:
                    twin ^= 1 << b
                a_id, b_id = rid, rid + 1
                rid += 2

                def signed(v):
                    return v - (1 << 64) if v >= (1 << 63) else v

                rows.append((a_id, signed(base)))
                rows.append((b_id, signed(twin)))
                expected.add((a_id, b_id))
        sigs = spark.createDataFrame(rows, "id long, h long")
        got = {
            (r.id_a, r.id_b)
            for r in hamming64_band_pairs(
                sigs,
                id_col="id",
                hash_col="h",
                max_hamming=n_bands - 1,
                n_bands=n_bands,
            ).collect()
        }
        # every planted pair within budget is found (other cross-pairs
        # may collide legitimately; the planted set must be a subset)
        missing = expected - got
        assert not missing, (n_bands, sorted(missing)[:5])
        # the verify bound holds: no returned pair exceeds the budget
        for r in hamming64_band_pairs(
            sigs, id_col="id", hash_col="h",
            max_hamming=n_bands - 1, n_bands=n_bands,
        ).collect():
            assert r.hamming <= n_bands - 1


@given(
    s=st.integers(min_value=0, max_value=7 * 10**17),
    n=st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=300)
def test_two_step_long_division_identity(s, n):
    """The exact S²//n trick q_metric_anova_days relies on
    (plans/series_ext.py): with q = S div n and r = S mod n,
    q·S + (r·S) div n == S² // n EXACTLY, and each two-step QUOTIENT
    fits BIGINT even where the direct product does not — which is why
    the implementation carries both products in DEC38: this sweep's
    counterexample (r·S ≈ 5·10²⁰ at n=26, S=5.4·10¹⁷) is exactly the
    case that would silently overflow a bare BIGINT r·S multiply."""
    q, r = divmod(s, n)
    assert q * s + (r * s) // n == (s * s) // n
    # the quotients the engines READ BACK stay BIGINT-ranged even
    # when the intermediate products do not
    assert (r * s) // n <= s < 2**63
    assert q * s + (r * s) // n == (s * s) // n


@given(
    v=st.integers(min_value=0, max_value=10**15),
    vmin=st.integers(min_value=0, max_value=10**15),
    vmax=st.integers(min_value=0, max_value=10**15),
)
@settings(max_examples=300)
def test_sax_symbolization_bounds(v, vmin, vmax):
    """metric_sax_motifs' equal-width symbolization s =
    (v−min)·4 div (max−min+1) lands in [0, 3] for every in-range
    value, including the degenerate constant series (max == min →
    symbol 0)."""
    lo, hi = sorted((vmin, vmax))
    x = lo + (v % (hi - lo + 1))
    s = ((x - lo) * 4) // (hi - lo + 1)
    assert 0 <= s <= 3
