"""Registry ordering: the driver truncates its correctness gate at a
budget, so insertion order decides which operators earn a hard signal.
The order must be driven by the actual driver history
(CORRECTNESS_r*.json): failed → unchecked → green."""

from nimble_spark.registry import QUERIES, _driver_history, _load_all


def test_history_parses_driver_files():
    h = _driver_history()
    # r01 exists in-repo: 50 rows, exactly two hash-fails
    assert h, "no CORRECTNESS_r*.json parsed"
    # Assert ONLY monotonic facts: cumulative-green never un-greens,
    # and a query once checked stays in the history. Never assert a
    # query is currently False — the next driver round can flip it
    # and strand the suite red on correct behavior (the r3 trap).
    assert h.get("q1_pricing_summary") is True
    # q_case_agg was a r01 hash-fail, re-proven green in r03
    assert h.get("q_case_agg") is True
    assert "q_sessionize" in h


def test_failed_then_unchecked_then_green():
    _load_all()
    h = _driver_history()
    names = list(QUERIES)

    def tier(n):
        if n not in h:
            return 1
        return 2 if h[n] else 0

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), "registry order must be failed < unchecked < green"
    # every registered query is present exactly once
    assert len(names) == len(set(names))


def test_green_tier_rotates_least_recently_sampled():
    """r9 (VERDICT r8 #7): inside the green tier, queries are ordered
    by the LAST round that sampled them, oldest first — so a
    budget-truncated driver gate re-proves the entire green set on a
    bounded cycle instead of letting early-registered queries go stale."""
    from nimble_spark.registry import _last_sampled

    _load_all()
    h = _driver_history()
    last = _last_sampled()
    green = [n for n in QUERIES if h.get(n) is True]
    rounds = [last.get(n, 0) for n in green]
    assert rounds == sorted(rounds), (
        "green tier must be least-recently-sampled first"
    )
    # sanity: history spans multiple rounds, so the rotation is real
    assert len(set(rounds)) > 1
