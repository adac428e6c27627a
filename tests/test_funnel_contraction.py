"""Randomized equivalence: contracted funnel clustering vs union-find over
the UNCONTRACTED graph (exact same-sig stars ∪ heavy edges).

The sf0.01 oracle parity test proves equivalence on the real derivation;
this drives adversarial shapes directly — heavy edges between non-rep
members, chains across sig-groups, heavy edges inside one sig-group —
where a contraction bug would hide.
"""

from __future__ import annotations

import random

from addressparser_spark.plans.pipeline import funnel_clusters_from


def _union_find(n_ids: list[str], edges: list[tuple[str, str]]) -> dict[str, str]:
    parent = {x: x for x in n_ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[str, list[str]] = {}
    for x in n_ids:
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


def test_funnel_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n_convs, n_sigs = 40, 12
        convs = [f"c{i:03d}" for i in range(n_convs)]
        # random sig assignment: multi-member groups produce the star edges
        sig_of = {c: f"s{rng.randrange(n_sigs):02d}" for c in convs}
        profiles = spark.createDataFrame(
            [(c, sig_of[c]) for c in convs], ["conv_id", "sig"]
        )
        # heavy edges between ARBITRARY members (not just reps), including
        # occasional same-sig pairs (redundant with the star — must be a no-op)
        heavy = [tuple(rng.sample(convs, 2)) for _ in range(10)]
        heavy_df = spark.createDataFrame(heavy, ["src", "dst"])

        got = {
            r["conv_id"]: r["cluster_id"]
            for r in funnel_clusters_from(profiles, heavy_df).collect()
        }

        # oracle: union-find over star edges + heavy edges, labels = min
        groups: dict[str, list[str]] = {}
        for c in convs:
            groups.setdefault(sig_of[c], []).append(c)
        star = [
            (m, min(members))
            for members in groups.values()
            for m in members
            if m != min(members)
        ]
        want = _union_find(convs, star + heavy)
        assert got == want, f"trial {trial}"


def test_funnel_no_heavy_edges(spark):
    profiles = spark.createDataFrame(
        [("a", "s1"), ("b", "s1"), ("c", "s2")], ["conv_id", "sig"]
    )
    empty = spark.createDataFrame([], "src string, dst string")
    got = {
        r["conv_id"]: r["cluster_id"]
        for r in funnel_clusters_from(profiles, empty).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "c"}
