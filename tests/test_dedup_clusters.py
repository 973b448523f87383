"""Connected-components dedup clustering: distributed min-label propagation
vs a brute-force union-find on the same edge set."""

import pyspark.sql.functions as F

from lucene_solr_spark.textops import connected_components, minhash_lsh_pairs


def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min node id in the component
    comps = {}
    for n in list(parent):
        comps.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comps.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


import pytest


@pytest.mark.parametrize("method", ["propagation", "star"])
def test_cc_matches_union_find_on_chain_and_clique(spark, method):
    # chain 1-2-3-4 (diameter 3 forces multiple propagation rounds),
    # clique {10,11,12}, singleton edge pair {20,21}
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, method=method).collect()
    }
    assert got == _uf_components(edges)


@pytest.mark.parametrize("method", ["propagation", "star"])
def test_cc_adversarial_graphs(spark, method):
    import random

    rng = random.Random(7)
    cases = [
        # long chain: worst case for diameter-bound methods
        [(i, i + 1) for i in range(30)],
        # two cliques bridged by one edge, ids descending to stress min-label
        [(i, j) for i in range(50, 55) for j in range(i + 1, 55)]
        + [(i, j) for i in range(90, 94) for j in range(i + 1, 94)]
        + [(54, 90)],
        # random sparse graph
        [(rng.randrange(100), rng.randrange(100)) for _ in range(60)],
    ]
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(df, method=method).collect()
        }
        assert got == _uf_components(edges), (method, edges[:5])


def test_cc_on_lsh_pairs_matches_union_find(spark):
    sf = "/root/testdata/sf0.001"
    pairs = [(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(spark, sf).collect()]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()
    }
    assert got == _uf_components(pairs)
    # every label is the min id of its cluster: labels are also members
    assert set(got.values()) <= set(got.keys())
    for n, lbl in got.items():
        assert lbl <= n
