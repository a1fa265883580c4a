"""Contract tests for the driver-facing registry ordering.

The driver's correctness gate checks the first 50 registry entries;
registry.WINDOW pins which queries those are. These tests lock the
invariants that make the round-2 rotation plan work: the window is
exactly the first 50, fully oracle-backed, and covers every operator
family from SURVEY.md §2.1.
"""

from __future__ import annotations

from pokertracker_cassandra_st_spark.registry import (
    REGISTRY,
    WINDOW,
    get_oracles,
    get_queries,
)

# one representative name-prefix per §2.1 family (VERDICT r1 table)
FAMILY_PREFIXES = {
    "scan/sink": ("q_scan_", "q_sink_"),
    "filter": ("q_filter_",),
    "join": ("q_join_",),
    "agg": ("q_agg_",),
    "window": ("q_win_",),
    "sort/topk": ("q_sort_", "q_topk"),
    "setop": ("q_set_",),
    "reshape/sample": ("q_unpivot", "q_sample_", "q_agg_pivot"),
    "replay": ("q_replay_", "q_scd2_"),
    "subquery/cte": ("q_subquery_", "q_lateral_", "q_recursive_"),
    "composite": ("q_tpch_", "q_skew_"),
    "timeseries": ("q_ts_",),
    "scalar-fn": ("q_fn_",),
    "udf": ("q_udf_", "q_udaf_", "q_udtf_"),
    "streaming": ("q_stream_",),
    "dedup": ("q_dedup_",),
    "similarity": ("q_sim_",),
    "text": ("q_text_",),
    "multimodal": ("q_multimodal_",),
    "pipeline": ("q_pipeline_",),
    "formats": ("q_source_",),
}


def test_window_is_first_50_and_oracle_backed():
    names = list(get_queries())
    assert len(WINDOW) == 50 == len(set(WINDOW))
    assert names[: len(WINDOW)] == WINDOW
    oracles = get_oracles()
    missing = [n for n in WINDOW if n not in oracles]
    assert not missing, f"window entries without an oracle: {missing}"


def _driver_checked() -> set[str]:
    """Union of every driver CORRECTNESS artifact written so far."""
    import glob
    import json

    checked: set[str] = set()
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r0*.json")):
        checked |= set(json.load(open(f)))
    return checked


def test_window_covers_every_family():
    """Every §2.1 family must carry a driver signal: either a prior
    driver-green CORRECTNESS row or a slot in the active window.

    (Through round 3 the window itself covered every family; from round
    4 on, every slot goes to a never-driver-checked query until the
    backlog clears — VERDICT r3 'Next round #1' — so families whose
    entries are all already driver-green are covered cumulatively.)
    """
    covered = set(WINDOW) | _driver_checked()
    uncovered = [
        fam
        for fam, prefixes in FAMILY_PREFIXES.items()
        if not any(n.startswith(p) for p in prefixes for n in covered)
    ]
    assert not uncovered, f"families with no driver signal at all: {uncovered}"


def test_every_query_registered_and_named():
    get_queries()
    assert all(n.startswith("q_") for n in REGISTRY)


def test_round4_window_is_all_never_driver_checked():
    """Round-4 rotation contract (VERDICT r3 'Next round #1'): every one
    of the 50 slots goes to a query with NO driver CORRECTNESS row from
    rounds 1-3, and the window + the declared round-5 deferral exactly
    exhaust the never-checked backlog — nothing silently falls out."""
    from pokertracker_cassandra_st_spark.registry import (
        DEFERRED_R5,
        POST_ROTATION_R3,
        POST_ROTATION_R4,
    )

    qs = get_queries()
    checked = _driver_checked()
    already = sorted(set(WINDOW) & checked)
    assert not already, f"window slots wasted on driver-checked queries: {already}"
    never = {n for n in qs if n not in checked}
    leftover = sorted(
        never - set(WINDOW) - set(DEFERRED_R5) - set(POST_ROTATION_R4)
    )
    assert not leftover, f"never-checked queries neither windowed nor deferred: {leftover}"
    r4_adds = [n for n in POST_ROTATION_R4 if n not in qs]
    assert not r4_adds, f"POST_ROTATION_R4 names not registered: {r4_adds}"
    overlap = sorted(set(WINDOW) & set(DEFERRED_R5))
    assert not overlap, f"queries both windowed and deferred: {overlap}"
    undeclared = [n for n in POST_ROTATION_R3 if n not in qs]
    assert not undeclared, f"POST_ROTATION_R3 names not registered: {undeclared}"


def test_round5_window_is_staged_correctly():
    """WINDOW_R5 pre-staging contract (avoids the round-3 mistake of a
    window drafted before late additions landed): the leading 21 slots
    must be EXACTLY the never-driver-checked set as of round-4 close
    (DEFERRED_R5 + POST_ROTATION_R4) — so if any query registers after
    this draft without joining POST_ROTATION_R4 AND WINDOW_R5, this
    test fails loudly instead of the slot arithmetic silently rotting.
    All 50 slots must be distinct, registered, and oracle-backed."""
    from pokertracker_cassandra_st_spark.registry import (
        DEFERRED_R5,
        POST_ROTATION_R4,
        WINDOW_R5,
    )

    qs = get_queries()
    oracles = get_oracles()
    assert len(WINDOW_R5) == 50 == len(set(WINDOW_R5))
    unreg = [n for n in WINDOW_R5 if n not in qs]
    assert not unreg, f"WINDOW_R5 names not registered: {unreg}"
    no_oracle = [n for n in WINDOW_R5 if n not in oracles]
    assert not no_oracle, f"WINDOW_R5 entries without an oracle: {no_oracle}"

    must_lead = set(DEFERRED_R5) | set(POST_ROTATION_R4)
    lead = WINDOW_R5[: len(must_lead)]
    assert set(lead) == must_lead, (
        f"leading slots must be exactly the never-checked backlog; "
        f"missing={sorted(must_lead - set(lead))} extra={sorted(set(lead) - must_lead)}"
    )
    # every query never driver-checked must be in the leading slots —
    # i.e. nothing registered after the draft without bookkeeping
    checked = _driver_checked()
    never = {n for n in qs if n not in checked}
    stranded = sorted(never - must_lead - set(WINDOW))
    assert not stranded, (
        f"queries registered after the round-5 draft without joining "
        f"POST_ROTATION_R4 + WINDOW_R5: {stranded}"
    )
    # the 29 rep slots must all carry a prior driver row (they trade a
    # window slot for freshness, not first-time coverage)
    reps = WINDOW_R5[len(must_lead):]
    unchecked_reps = sorted(set(reps) - checked)
    assert not unchecked_reps, f"rep slots lacking any driver row: {unchecked_reps}"
