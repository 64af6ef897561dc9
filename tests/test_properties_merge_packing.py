"""Property-based tests for merge-changelog and greedy-packing
semantics, checked against direct python reference executions on
arbitrary generated inputs (Spark run once per example batch — the
strategies produce whole scenarios, not rows, to keep session round
trips bounded)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from inception_eventstore_spark.operators import merge as MG
from inception_eventstore_spark.operators import packing as PK

# -- merge ------------------------------------------------------------

keys = st.integers(min_value=0, max_value=6)
vals = st.text(alphabet="abc", min_size=0, max_size=3)

change = st.tuples(keys, vals, st.sampled_from("UD"))
scenario = st.tuples(
    st.dictionaries(keys, vals, max_size=5),       # base snapshot
    st.lists(change, max_size=12),                 # changelog in seq order
)


def _merge_reference(base: dict, changes: list) -> dict:
    state = dict(base)
    for k, v, op in changes:
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    return state


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(scenario)
def test_merge_matches_sequential_replay(spark, scen):
    base, changes = scen
    base_df = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in base.items()] or [], "k long, v string"
    )
    ch_df = spark.createDataFrame(
        [Row(k=k, v=v, seq=i, op=op)
         for i, (k, v, op) in enumerate(changes)] or [],
        "k long, v string, seq long, op string",
    )
    got = {r.k: r.v
           for r in MG.merge_changelog(base_df, ch_df, ["k"]).collect()}
    assert got == _merge_reference(base, changes)


# -- packing ----------------------------------------------------------

pack_scenario = st.tuples(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1,
             max_size=25),
    st.integers(min_value=1, max_value=20),        # budget
)


def _greedy_reference(counts: list, budget: int) -> list:
    bins, b, fill = [], 0, 0
    for n in counts:
        n_eff = min(n, budget)
        if fill > 0 and fill + n_eff > budget:
            b, fill = b + 1, 0
        bins.append(b)
        fill += n_eff
    return bins


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pack_scenario)
def test_greedy_packing_matches_reference(spark, scen):
    counts, budget = scen
    df = spark.createDataFrame(
        [Row(doc_id=i, n_tok=n) for i, n in enumerate(counts)],
        "doc_id long, n_tok long",
    )
    got = [
        r.bin_in_shard
        for r in PK.pack_greedy(df, budget=budget).orderBy("doc_id").collect()
    ]
    assert got == _greedy_reference(counts, budget)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pack_scenario)
def test_offsets_are_exclusive_prefix_sums(spark, scen):
    counts, _ = scen
    df = spark.createDataFrame(
        [Row(doc_id=i, n_tok=n) for i, n in enumerate(counts)],
        "doc_id long, n_tok long",
    )
    got = [
        r.tok_start
        for r in PK.token_offsets(df, shard_size=4).orderBy("doc_id").collect()
    ]
    acc, want = 0, []
    for n in counts:
        want.append(acc)
        acc += n
    assert got == want
