"""Round-4 second wave: label propagation, triangle counts,
Adamic-Adar, EWMA smoothing, weighted sampling, skip-gram PPMI.

Each operator is checked against an independent pure-python
re-implementation of its declared deterministic spec (the same
python-parity strategy as TestPageRank / TestKMeans), plus the
edge-case guards the spec calls out.
"""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import graph as G
from inception_eventstore_spark.operators import lm as LM
from inception_eventstore_spark.operators import sampling as SA
from inception_eventstore_spark.operators import timeseries as TS


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _und(pairs):
    s = set()
    for a, b in pairs:
        if a != b:
            s.add((min(a, b), max(a, b)))
    return s


def _nbrs(und):
    n = defaultdict(set)
    for a, b in und:
        n[a].add(b)
        n[b].add(a)
    return n


class TestLabelPropagation:
    def _py_lpa(self, pairs, iterations):
        nbr = _nbrs(_und(pairs))
        labels = {v: v for v in nbr}
        for _ in range(iterations):
            nxt = {}
            for v in nbr:
                votes = Counter(labels[u] for u in nbr[v])
                best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                nxt[v] = best[0]
            labels = nxt
        return labels

    def test_two_cliques_bridge(self, spark):
        # two triangles joined by one bridge edge → two communities
        pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
        got = {
            r["node"]: r["label"]
            for r in G.label_propagation(_edges_df(spark, pairs), 3).collect()
        }
        assert got == self._py_lpa(pairs, 3)
        # the two cliques end with distinct dominant labels
        assert got[1] == got[2] == got[3] or got[10] == got[11] == got[12]

    def test_python_parity_random(self, spark):
        rng = random.Random(7)
        pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
        pairs = [p for p in pairs if p[0] != p[1]]
        for iters in (1, 4):
            got = {
                r["node"]: r["label"]
                for r in G.label_propagation(
                    _edges_df(spark, pairs), iters
                ).collect()
            }
            assert got == self._py_lpa(pairs, iters)

    def test_iteration_guard(self, spark):
        with pytest.raises(ValueError):
            G.label_propagation(_edges_df(spark, [(1, 2)]), 0)


class TestTriangleCounts:
    def _py_triangles(self, pairs):
        und = _und(pairs)
        nbr = _nbrs(und)
        t = Counter({v: 0 for v in nbr})
        for a, b in und:
            for c in nbr[a] & nbr[b]:
                if c > b:  # each triangle once: a < b < c
                    if a < b:
                        t[a] += 1
                        t[b] += 1
                        t[c] += 1
        return dict(t)

    def test_k4_and_pendant(self, spark):
        k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
        pairs = k4 + [(3, 9)]  # 9 dangles off the clique
        got = {
            r["node"]: r["triangles"]
            for r in G.triangle_counts(_edges_df(spark, pairs)).collect()
        }
        assert got == {0: 3, 1: 3, 2: 3, 3: 3, 9: 0}

    def test_python_parity_random(self, spark):
        rng = random.Random(13)
        pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(90)]
        pairs = [p for p in pairs if p[0] != p[1]]
        got = {
            r["node"]: r["triangles"]
            for r in G.triangle_counts(_edges_df(spark, pairs)).collect()
        }
        assert got == self._py_triangles(pairs)

    def test_direction_and_duplicates_ignored(self, spark):
        # same triangle given twice with mixed directions counts once
        pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)]
        got = {
            r["node"]: r["triangles"]
            for r in G.triangle_counts(_edges_df(spark, pairs)).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1}


class TestAdamicAdar:
    def _py_aa(self, pairs, min_common=1):
        und = _und(pairs)
        nbr = _nbrs(und)
        out = {}
        for u in nbr:
            for v in nbr:
                if u < v and (u, v) not in und:
                    common = nbr[u] & nbr[v]
                    if len(common) >= min_common:
                        aa = sum(1.0 / math.log(len(nbr[w])) for w in common)
                        out[(u, v)] = (len(common), round(aa, 6))
        return out

    def test_path_graph(self, spark):
        got = {
            (r["u"], r["v"]): (r["common_neighbors"], r["adamic_adar"])
            for r in G.adamic_adar(_edges_df(spark, [(1, 2), (2, 3)])).collect()
        }
        # only (1,3): common neighbor 2 has degree 2 → 1/ln 2
        assert got == {(1, 3): (1, round(1.0 / math.log(2.0), 6))}

    def test_python_parity_random(self, spark):
        rng = random.Random(29)
        pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
        pairs = [p for p in pairs if p[0] != p[1]]
        got = {
            (r["u"], r["v"]): (r["common_neighbors"], r["adamic_adar"])
            for r in G.adamic_adar(_edges_df(spark, pairs)).collect()
        }
        assert got == self._py_aa(pairs)

    def test_adjacent_pairs_excluded(self, spark):
        # triangle: every pair adjacent → no candidates at all
        assert (
            G.adamic_adar(
                _edges_df(spark, [(1, 2), (2, 3), (1, 3)])
            ).count()
            == 0
        )


class TestEwmaSmooth:
    def _py_ewma(self, values, alpha=0.3, depth=8):
        out = []
        for t in range(len(values)):
            num = den = 0.0
            for j in range(depth):
                if t - j < 0:
                    break
                x = values[t - j]
                if x is not None:
                    c = (1.0 - alpha) ** j
                    num += x * c
                    den += c
            out.append(round(num / den, 6) if den > 0 else None)
        return out

    def test_python_parity(self, spark):
        rng = random.Random(5)
        vals = [round(rng.uniform(-5, 5), 3) for _ in range(30)]
        rows = [(1, i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, ["user_id", "event_id", "value"])
        got = [
            r["ewma"]
            for r in TS.ewma_smooth(
                df, key_col="user_id", order_cols=("event_id",)
            ).orderBy("event_id").collect()
        ]
        assert got == self._py_ewma(vals)

    def test_null_values_skip_weight(self, spark):
        vals = [1.0, None, 3.0]
        df = spark.createDataFrame(
            [(1, i, v) for i, v in enumerate(vals)],
            "user_id long, event_id long, value double",
        )
        got = [
            r["ewma"]
            for r in TS.ewma_smooth(
                df, key_col="user_id", order_cols=("event_id",)
            ).orderBy("event_id").collect()
        ]
        assert got == self._py_ewma(vals)
        # row 1 (null value): ewma over the one existing term = 1.0
        assert got[1] == 1.0

    def test_keys_isolated(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 10.0), (2, 1, 99.0)], ["user_id", "event_id", "value"]
        )
        got = {
            r["user_id"]: r["ewma"]
            for r in TS.ewma_smooth(
                df, key_col="user_id", order_cols=("event_id",)
            ).collect()
        }
        assert got == {1: 10.0, 2: 99.0}

    def test_guards(self, spark):
        df = spark.createDataFrame([(1, 0, 1.0)], ["user_id", "event_id", "value"])
        with pytest.raises(ValueError):
            TS.ewma_smooth(df, alpha=0.0)
        with pytest.raises(ValueError):
            TS.ewma_smooth(df, depth=0)


class TestWeightedSample:
    def test_exact_k_and_determinism(self, spark):
        df = spark.range(500).select(
            F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
        )
        a = SA.weighted_sample(df, "w", k=50, id_col="doc_id")
        b = SA.weighted_sample(df, "w", k=50, id_col="doc_id")
        ra = sorted(r["doc_id"] for r in a.collect())
        rb = sorted(r["doc_id"] for r in b.collect())
        assert len(ra) == 50 and ra == rb

    def test_weight_proportionality(self, spark):
        # half the ids carry 50× the weight → they dominate the sample
        df = spark.range(400).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 200, 50).otherwise(1).alias("w"),
        )
        got = [r["doc_id"] for r in
               SA.weighted_sample(df, "w", k=80, id_col="doc_id").collect()]
        heavy = sum(1 for i in got if i < 200)
        assert heavy >= 70  # E[heavy] ≈ 79

    def test_nonpositive_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 5), (2, 0), (3, -2), (4, None)],
            "doc_id long, w int",
        )
        got = [r["doc_id"] for r in
               SA.weighted_sample(df, "w", k=10, id_col="doc_id").collect()]
        assert got == [1]

    def test_k_guard(self, spark):
        df = spark.range(3).select(F.col("id").alias("doc_id"),
                                   F.lit(1).alias("w"))
        with pytest.raises(ValueError):
            SA.weighted_sample(df, "w", k=0)


class TestSkipgramPpmi:
    def _py_ppmi(self, texts, window=2, min_count=1):
        pairs = Counter()
        for t in texts:
            toks = t.lower().split()
            for d in range(1, window + 1):
                for i in range(len(toks) - d):
                    a, b = toks[i], toks[i + d]
                    if a != b:
                        pairs[(min(a, b), max(a, b))] += 1
        total = sum(pairs.values())
        marg = Counter()
        for (x, y), c in pairs.items():
            marg[x] += c
            marg[y] += c
        return {
            (x, y): (
                c,
                round(
                    max(0.0, math.log(c * float(total) / (marg[x] * marg[y]))),
                    6,
                ),
            )
            for (x, y), c in pairs.items()
            if c >= min_count
        }

    def test_python_parity(self, spark):
        rng = random.Random(3)
        vocab = ["red", "blue", "cat", "dog", "sky", "sea"]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 12)))
            for _ in range(40)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = {
            (r["tok_x"], r["tok_y"]): (r["pair_count"], r["ppmi"])
            for r in LM.skipgram_ppmi(df, min_pair_count=1).collect()
        }
        assert got == self._py_ppmi(texts)

    def test_correlated_pair_scores_high(self, spark):
        # "neural networks" always adjacent → top PPMI; fillers spread out
        texts = [f"neural networks w{i} w{i+1} w{i+2}" for i in range(20)]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        top = LM.skipgram_ppmi(df, min_pair_count=5, top_n=1).collect()[0]
        assert {top["tok_x"], top["tok_y"]} == {"networks", "neural"}
        assert top["ppmi"] > 0


class TestAdamicAdarHubCap:
    def test_hub_cap_drops_supernode_middles(self, spark):
        # star hub 0 (deg 10) + edge (1,2): uncapped scores 44 pairs
        # through the hub; capping at deg<=5 excludes the hub middle
        # and the remaining wedges all close existing edges -> empty
        pairs = [(0, i) for i in range(1, 11)] + [(1, 2)]
        df = _edges_df(spark, pairs)
        assert G.adamic_adar(df).count() == 44
        assert G.adamic_adar(df, max_degree=5).count() == 0

    def test_cap_above_max_degree_is_exact(self, spark):
        rng = random.Random(11)
        pairs = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
        pairs = [p for p in pairs if p[0] != p[1]]
        exact = {(r["u"], r["v"]): r["adamic_adar"]
                 for r in G.adamic_adar(_edges_df(spark, pairs)).collect()}
        capped = {(r["u"], r["v"]): r["adamic_adar"]
                  for r in G.adamic_adar(
                      _edges_df(spark, pairs), max_degree=1000
                  ).collect()}
        assert exact == capped


def _seed_df(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], ["node"])


class TestBfsHops:
    def test_chain_levels(self, spark):
        # directed chain 1 -> 2 -> 3 -> 4 -> 5, hop bound 3
        edges = _edges_df(spark, [(i, i + 1) for i in range(1, 5)])
        got = {
            r["node"]: r["hop"]
            for r in G.bfs_hops(edges, _seed_df(spark, [1]), 3).collect()
        }
        assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond the bound

    def test_min_hop_wins_on_multiple_paths(self, spark):
        # 1->2->4 and 1->4: node 4 must report hop 1, not 2
        edges = _edges_df(spark, [(1, 2), (2, 4), (1, 4)])
        got = {
            r["node"]: r["hop"]
            for r in G.bfs_hops(edges, _seed_df(spark, [1]), 3).collect()
        }
        assert got[4] == 1

    def test_cycle_terminates_and_keeps_first_visit(self, spark):
        edges = _edges_df(spark, [(1, 2), (2, 3), (3, 1)])
        got = {
            r["node"]: r["hop"]
            for r in G.bfs_hops(edges, _seed_df(spark, [1]), 3).collect()
        }
        assert got == {1: 0, 2: 1, 3: 2}

    def test_multi_seed_and_unreachable(self, spark):
        edges = _edges_df(spark, [(1, 2), (10, 11), (20, 21)])
        got = {
            r["node"]: r["hop"]
            for r in G.bfs_hops(edges, _seed_df(spark, [1, 10]), 2).collect()
        }
        assert got == {1: 0, 10: 0, 2: 1, 11: 1}  # 20/21 unreached

    def test_early_exit_when_frontier_drains(self, spark):
        # component exhausted at hop 1; max_hops 5 must not loop on
        edges = _edges_df(spark, [(1, 2)])
        res = G.bfs_hops(edges, _seed_df(spark, [1]), 5)
        assert {(r["node"], r["hop"]) for r in res.collect()} == {
            (1, 0), (2, 1)
        }

    def test_hop_zero_and_guard(self, spark):
        edges = _edges_df(spark, [(1, 2)])
        res = G.bfs_hops(edges, _seed_df(spark, [1]), 0)
        assert res.collect()[0]["hop"] == 0 and res.count() == 1
        with pytest.raises(ValueError):
            G.bfs_hops(edges, _seed_df(spark, [1]), -1)


class TestKcore:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    def _run(self, spark, pairs, k):
        from inception_eventstore_spark.operators.graph import kcore

        out = kcore(self._edges(spark, pairs), k=k).collect()
        return {r["node"]: r["core_degree"] for r in out}

    def test_chain_has_no_2core(self, spark):
        assert self._run(spark, [(1, 2), (2, 3), (3, 4)], 2) == {}

    def test_triangle_with_tail(self, spark):
        # triangle 1-2-3 plus tail 3-4: 2-core is exactly the triangle
        got = self._run(spark, [(1, 2), (2, 3), (3, 1), (3, 4)], 2)
        assert got == {1: 2, 2: 2, 3: 2}

    def test_multi_round_cascade(self, spark):
        # pentagon chain hanging off a triangle: peeling the chain
        # takes multiple synchronous rounds before the fixpoint
        edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 7)]
        got = self._run(spark, edges, 2)
        assert got == {1: 2, 2: 2, 3: 2}

    def test_k3_on_k4_minus_edge_cascades_empty(self, spark):
        # K4 minus one edge: two nodes have degree 2 < 3 → peel →
        # remaining degrees collapse → empty 3-core
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
        assert self._run(spark, edges, 3) == {}

    def test_k3_on_k4_survives(self, spark):
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        got = self._run(spark, edges, 3)
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        # dup + reversed edges must not inflate degrees
        edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1)]
        got = self._run(spark, edges, 2)
        assert got == {1: 2, 2: 2, 3: 2}

    def test_guards(self, spark):
        import pytest

        from inception_eventstore_spark.operators.graph import kcore

        e = self._edges(spark, [(1, 2)])
        with pytest.raises(ValueError):
            kcore(e, k=0)
        with pytest.raises(ValueError):
            kcore(e, k=2, max_rounds=0)
