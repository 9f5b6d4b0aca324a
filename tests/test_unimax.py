"""UniMax epoch-capped allocation + selection (operators/sampling.py).

The driver-facing integration (the `unimax` section of
doc_stratified_sample) is oracle-checked; this file pins the
allocation algebra and the selection realization against brute-force
Python witnesses, including partitioning invariance.
"""

from __future__ import annotations

import hashlib

from sec_financial_pipeline_spark.operators.sampling import (
    unimax_allocation,
    unimax_stats,
)


def test_uncapped_budget_splits_evenly():
    # caps far above any share: pure water-fill = near-even integer split
    q = unimax_allocation([("a", 10**9), ("b", 10**9), ("c", 10**9)],
                          budget=100, epochs_cap=2.0)
    assert sum(q.values()) == 100
    assert sorted(q.values()) == [33, 33, 34]  # floor shares, tail absorbs


def test_small_stratum_clips_at_epoch_cap_and_leftover_respreads():
    # 'tiny' absorbs at most 2.0 * 10 = 20; the other two re-split the rest
    q = unimax_allocation([("tiny", 10), ("big1", 1000), ("big2", 1000)],
                          budget=320, epochs_cap=2.0)
    assert q["tiny"] == 20
    assert q["big1"] == 150 and q["big2"] == 150
    assert sum(q.values()) == 320


def test_all_caps_bound_leaves_budget_unused():
    q = unimax_allocation([("a", 10), ("b", 20)], budget=1000, epochs_cap=1.0)
    assert q == {"a": 10, "b": 20}


def test_allocation_matches_reference_loop():
    import math

    counts = [("en", 68231), ("de", 19525), ("es", 21756),
              ("fr", 20622), ("zh", 22832)]
    budget = sum(c for _, c in counts)
    got = unimax_allocation(counts, budget, 1.2)
    # independent re-derivation of Algorithm 1
    caps = sorted((int(math.floor(1.2 * c)), s) for s, c in counts)
    rem, want = budget, {}
    for i, (cap, s) in enumerate(caps):
        share = rem // (len(caps) - i)
        want[s] = min(cap, share)
        rem -= want[s]
    assert got == want
    # every quota <= its cap; the head language is budget-bound
    capmap = dict((s, c) for c, s in caps)
    assert all(got[s] <= capmap[s] for s in got)
    assert got["en"] < capmap["en"]


def _brute_stats(rows, epochs_cap, salt):
    import math
    from collections import defaultdict

    by = defaultdict(list)
    for key, stratum, w in rows:
        by[stratum].append((key, w))
    totals = {s: sum(w for _, w in v) for s, v in by.items()}
    quotas = unimax_allocation(sorted(totals.items()), sum(totals.values()),
                               epochs_cap)
    out = {}
    for s, docs in by.items():
        chars, q = totals[s], quotas[s]
        full, rem = q // chars, q % chars
        ordered = sorted(
            docs, key=lambda kw: (hashlib.md5(
                (salt + str(kw[0])).encode()).hexdigest(), kw[0])
        )
        cum, p_n, p_ids = 0, 0, 0
        for k, w in ordered:
            if cum < rem:
                p_n += 1
                p_ids += k
            cum += w
        out[s] = {
            "n_docs": len(docs),
            "threshold": q,
            "n_selected": full * len(docs) + p_n,
            "checksum": full * sum(k for k, _ in docs) + p_ids,
            "rate": round(q / chars, 6),
        }
    return out


def test_stats_match_bruteforce_and_partitioning_invariant(spark):
    rows = [(i, ["x", "y", "z"][i % 3], 40 + (i * 7) % 90)
            for i in range(120)]
    want = _brute_stats(rows, epochs_cap=1.5, salt="t1")
    for n_part in (2, 17):
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, n_chars long"
        ).repartition(n_part)
        got = {
            r["lang"]: r.asDict()
            for r in unimax_stats(
                df, key="doc_id", stratum="lang", weight="n_chars",
                epochs_cap=1.5, salt="t1",
            ).collect()
        }
        for s, w in want.items():
            g = got[s]
            for k in ("n_docs", "threshold", "n_selected", "checksum", "rate"):
                assert g[k] == w[k], (n_part, s, k, g[k], w[k])


def test_explicit_budget_overrides_one_epoch_default(spark):
    rows = [(i, "only", 10) for i in range(50)]  # 500 chars total
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    r = unimax_stats(
        df, key="doc_id", stratum="lang", weight="n_chars",
        epochs_cap=3.0, budget=1205, salt="b",
    ).collect()[0]
    # quota = min(cap=1500, 1205) = 1205 -> 2 full epochs + 205-char prefix
    assert r["threshold"] == 1205
    assert r["n_selected"] == 2 * 50 + 21  # 20 docs = 200 chars, 21st starts at 200 < 205
    assert r["rate"] == round(1205 / 500, 6)


def test_zero_weight_stratum_emits_zeros_not_nulls(spark):
    # ADVICE r10: a stratum whose rows all weigh 0 used to divide by
    # zero in `quota % chars` / `quota div chars`, silently NULLing its
    # n_selected/checksum. It must report an explicit empty selection.
    rows = [(1, "live", 100), (2, "live", 60), (3, "dead", 0), (4, "dead", 0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    got = {
        r["lang"]: r.asDict()
        for r in unimax_stats(
            df, key="doc_id", stratum="lang", weight="n_chars",
            epochs_cap=2.0, salt="z",
        ).collect()
    }
    dead = got["dead"]
    assert dead["n_docs"] == 2
    assert dead["threshold"] == 0
    assert dead["n_selected"] == 0
    assert dead["checksum"] == 0
    assert dead["rate"] == 0.0
    live = got["live"]
    assert live["n_selected"] is not None and live["n_selected"] >= 2
    assert live["checksum"] is not None


# hypothesis property sweep over random count/cap/budget shapes
from hypothesis import given, settings, strategies as st  # noqa: E402

_COUNTS = st.lists(
    st.tuples(st.integers(0, 10**6)), min_size=1, max_size=8
).map(lambda xs: [(f"s{i}", c[0] + 1) for i, c in enumerate(xs)])


@settings(max_examples=200, deadline=None)
@given(
    counts=_COUNTS,
    budget=st.integers(0, 4 * 10**6),
    epochs=st.sampled_from([0.25, 0.5, 1.0, 1.2, 2.0, 5.0]),
)
def test_allocation_invariants(counts, budget, epochs):
    import math

    q = unimax_allocation(counts, budget, epochs)
    caps = {s: int(math.floor(epochs * c)) for s, c in counts}
    # every stratum allocated, never past its cap, never negative
    assert set(q) == {s for s, _ in counts}
    assert all(0 <= q[s] <= caps[s] for s in q)
    # never over budget; budget fully used unless every leftover
    # stratum is cap-bound (the largest-cap stratum absorbs remainders)
    spent = sum(q.values())
    assert spent <= budget
    if spent < budget:
        assert all(q[s] == caps[s] for s in q), (
            "unused budget with an uncapped stratum"
        )
    # water-level monotonicity: in cap order the allocation never
    # decreases (shares only grow as caps bind; a cap-bound stratum's
    # cap is >= every earlier stratum's quota by the sort)
    by_cap = sorted(q, key=lambda s: (caps[s], s))
    for a, b in zip(by_cap, by_cap[1:]):
        assert q[b] >= q[a], (a, b, q, caps)
    # exact idempotence: same inputs, same dict
    assert unimax_allocation(counts, budget, epochs) == q
