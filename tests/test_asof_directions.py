"""Direction variants of the as-of join (backward / forward / nearest) —
checked exhaustively against a brute-force pandas oracle on randomized
frames, plus targeted edge cases (equal-time visibility, no-match
NULLs, exact-middle tie resolving backward)."""

from __future__ import annotations

import random

from sec_financial_pipeline_spark.operators.asof import as_of_join


def _brute(left, right, direction):
    """Per right row (key, t): the matching left value under direction."""
    out = []
    for rk, rt, rid in right:
        cands = [(lt, lv) for lk, lt, lv in left if lk == rk]
        back = max(
            ((lt, lv) for lt, lv in cands if lt <= rt), default=None
        )
        fwd = min(
            ((lt, lv) for lt, lv in cands if lt >= rt), default=None
        )
        if direction == "backward":
            pick = back
        elif direction == "forward":
            pick = fwd
        else:
            if back is None:
                pick = fwd
            elif fwd is None:
                pick = back
            else:
                pick = back if (rt - back[0]) <= (fwd[0] - rt) else fwd
        out.append((rid, None if pick is None else pick[1]))
    return dict(out)


def _run(spark, left, right, direction):
    ldf = spark.createDataFrame(left, "key string, ts int, val string")
    rdf = spark.createDataFrame(right, "key string, ts int, rid int")
    got = as_of_join(
        ldf,
        rdf,
        on=["key"],
        left_time="ts",
        right_time="ts",
        value_cols=["val"],
        direction=direction,
    ).collect()
    return {r.rid: r.val for r in got}


def test_directions_match_brute_force_randomized(spark):
    rng = random.Random(7)
    left = [
        (k, rng.randrange(0, 50), f"L{k}{i}")
        for k in "ab"
        for i in range(8)
    ]
    right = [
        (rng.choice("abc"), rng.randrange(0, 50), i) for i in range(30)
    ]
    # distinct (key, time) on the left so the match is unique without
    # tiebreakers (brute force picks max/min by time only)
    seen = set()
    left = [
        r for r in left if not (r[:2] in seen or seen.add(r[:2]))
    ]
    for direction in ("backward", "forward", "nearest"):
        assert _run(spark, left, right, direction) == _brute(
            left, right, direction
        ), direction


def test_equal_time_visible_in_all_directions(spark):
    left = [("k", 100, "at100")]
    right = [("k", 100, 1)]
    for direction in ("backward", "forward", "nearest"):
        assert _run(spark, left, right, direction) == {1: "at100"}


def test_no_match_yields_null(spark):
    left = [("k", 100, "only")]
    assert _run(spark, left, [("k", 50, 1)], "backward") == {1: None}
    assert _run(spark, left, [("k", 150, 1)], "forward") == {1: None}
    assert _run(spark, left, [("z", 100, 1)], "nearest") == {1: None}


def test_nearest_exact_middle_resolves_backward(spark):
    left = [("k", 90, "before"), ("k", 110, "after")]
    assert _run(spark, left, [("k", 100, 1)], "nearest") == {1: "before"}
    # one step closer to the later row flips the pick
    assert _run(spark, left, [("k", 101, 2)], "nearest") == {2: "after"}


def test_unknown_direction_raises(spark):
    import pytest

    left = [("k", 1, "x")]
    with pytest.raises(ValueError, match="direction"):
        _run(spark, left, [("k", 1, 1)], "sideways")


def test_tolerance_voids_distant_matches(spark):
    from sec_financial_pipeline_spark.operators.asof import as_of_join

    left = [("k", 100, "near"), ("k", 10, "far")]
    ldf = spark.createDataFrame(left, "key string, ts int, val string")
    rdf = spark.createDataFrame(
        [("k", 105, 1), ("k", 300, 2)], "key string, ts int, rid int"
    )

    def run(direction, tol):
        got = as_of_join(
            ldf, rdf, on=["key"], left_time="ts", right_time="ts",
            value_cols=["val"], direction=direction, tolerance=tol,
        ).collect()
        return {r.rid: r.val for r in got}

    # backward: rid1 is 5 away from "near" (kept), rid2 is 200 away (void)
    assert run("backward", 10) == {1: "near", 2: None}
    # nearest with a tolerance behaves the same here
    assert run("nearest", 10) == {1: "near", 2: None}
    # forward: nothing at-or-after either right time within 10
    assert run("forward", 10) == {1: None, 2: None}
    # no tolerance: the distant match comes back
    assert run("backward", None) == {1: "near", 2: "near"}
