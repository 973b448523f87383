"""Solr JSON Facet API: terms / range / query facets, nested aggs and
sub-facets, evaluated over the search domain.

Reference: solr/core/src/java/org/apache/solr/search/facet/FacetModule.java:48,
FacetField.java (limit/mincount/sort/nested), FacetRange.java:40 (empty
buckets kept at mincount=0), FacetQuery.java:28, FacetParser.java +
SlotAcc.java (the aggregation grammar).
"""

from collections import Counter, defaultdict

import pytest

from lucene_solr_spark.search.jsonfacet import json_facets


@pytest.fixture(scope="module")
def searcher(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    return IndexSearcher(spark, d, analyzer="code")


@pytest.fixture(scope="module")
def domain(searcher, spark):
    """(segment_id, doc_id) → (repo, path, score) for query 'parse'."""
    docs = spark.read.parquet(searcher.index_dir + "/docs").select(
        "segment_id", "doc_id", "repo", "path"
    )
    rows = searcher.search("parse", k=None).join(docs, ["segment_id", "doc_id"])
    return {
        (r.segment_id, r.doc_id): (r.repo, r.path, float(r.score))
        for r in rows.collect()
    }


def test_terms_facet_counts(searcher, domain):
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "repos": {
                    "type": "terms",
                    "field": "repo",
                    "limit": -1,
                    "sort": "index asc",
                }
            },
        },
        searcher=searcher,
    )
    got = [(r.repo, r["count"]) for r in out["repos"].collect()]
    want = Counter(repo for repo, _, _ in domain.values())
    assert got == sorted(want.items())


def test_terms_facet_sort_by_agg_and_limit(searcher, domain):
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "repos": {
                    "type": "terms",
                    "field": "repo",
                    "limit": 3,
                    "sort": {"avgsc": "desc"},
                    "facet": {"avgsc": "avg(score)"},
                }
            },
        },
        searcher=searcher,
    )["repos"]
    got = [(r.repo, float(r.avgsc)) for r in out.collect()]
    sums, counts = defaultdict(float), Counter()
    for repo, _, s in domain.values():
        sums[repo] += s
        counts[repo] += 1
    want = sorted(
        ((repo, sums[repo] / counts[repo]) for repo in counts),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert [g for g, _ in got] == [w for w, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-6)


def test_nested_subfacet_per_parent_limit(searcher, domain):
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "repos": {
                    "type": "terms",
                    "field": "repo",
                    "limit": 2,
                    "facet": {
                        "paths": {
                            "type": "terms",
                            "field": "path",
                            "limit": 2,
                            "sort": "count desc",
                        }
                    },
                }
            },
        },
        searcher=searcher,
    )
    parents = [r.repo for r in out["repos"].collect()]
    repo_counts = Counter(repo for repo, _, _ in domain.values())
    want_parents = sorted(repo_counts, key=lambda x: (-repo_counts[x], x))[:2]
    assert parents == want_parents

    sub = [(r.repo, r.path, r["count"]) for r in out["repos.paths"].collect()]
    by_parent = defaultdict(list)
    for repo, path, c in sub:
        by_parent[repo].append((path, c))
    assert set(by_parent) == set(want_parents)
    for repo in want_parents:
        pair_counts = Counter(
            path for rp, path, _ in domain.values() if rp == repo
        )
        want = sorted(pair_counts.items(), key=lambda t: (-t[1], t[0]))[:2]
        assert sorted(by_parent[repo]) == sorted(want)


def test_query_facet_counts_intersection(searcher, domain):
    out = json_facets(
        {"query": "parse", "facet": {"http_in": {"type": "query", "q": "http"}}},
        searcher=searcher,
    )["http_in"]
    http_ids = {
        (r.segment_id, r.doc_id)
        for r in searcher.search("http", k=None).collect()
    }
    want = len(set(domain) & http_ids)
    assert [r["count"] for r in out.collect()] == [want]


def test_range_facet_keeps_empty_buckets(searcher, domain):
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "sc": {
                    "type": "range",
                    "field": "score",
                    "start": 0,
                    "end": 3,
                    "gap": 0.5,
                }
            },
        },
        searcher=searcher,
    )["sc"]
    got = [(float(r.val), r["count"]) for r in out.collect()]
    assert [v for v, _ in got] == [0.0, 0.5, 1.0, 1.5, 2.0, 2.5]
    want = Counter()
    for _, _, s in domain.values():
        if 0 <= s < 3:
            want[(s // 0.5) * 0.5] += 1
    assert {v: c for v, c in got if c} == dict(want)
    assert sum(c for _, c in got) == sum(want.values())


def test_top_level_agg(searcher, domain):
    out = json_facets(
        {"query": "parse", "facet": {"avgscore": "avg(score)"}}, searcher=searcher
    )["avgscore"]
    scores = [s for _, _, s in domain.values()]
    assert float(out.collect()[0].avgscore) == pytest.approx(
        sum(scores) / len(scores), rel=1e-6
    )


def test_unique_and_missing_aggs(searcher, domain):
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "repos": {
                    "type": "terms",
                    "field": "repo",
                    "limit": -1,
                    "sort": "index asc",
                    "facet": {"paths": "unique(path)", "miss": "missing(path)"},
                }
            },
        },
        searcher=searcher,
    )["repos"]
    per_repo = defaultdict(set)
    for repo, path, _ in domain.values():
        per_repo[repo].add(path)
    for r in out.collect():
        assert r.paths == len(per_repo[r.repo])
        assert r.miss == 0


def test_bad_agg_and_sort_raise(searcher):
    with pytest.raises(ValueError, match="unknown facet aggregation"):
        json_facets(
            {"query": "parse", "facet": {"x": "median(score)"}}, searcher=searcher
        )
    with pytest.raises(ValueError, match="not count/index or a named agg"):
        json_facets(
            {
                "query": "parse",
                "facet": {
                    "repos": {"type": "terms", "field": "repo", "sort": "nope desc"}
                },
            },
            searcher=searcher,
        )


def test_facets_use_full_domain_not_page(searcher, domain):
    # limit/offset shape the doc page only — facets see every match
    out = json_facets(
        {
            "query": "parse",
            "limit": 1,
            "offset": 0,
            "facet": {"n": "sum(score)"},
        },
        searcher=searcher,
    )["n"]
    want = sum(s for _, _, s in domain.values())
    assert float(out.collect()[0].n) == pytest.approx(want, rel=1e-6)


# ----------------------------------------- multi-select domains + knobs


def test_exclude_tags_multiselect(searcher, domain):
    """The classic multi-select shape: facet on the filtered field counts
    AS IF its own filter were absent (FacetRequest excludeTags)."""
    repos = sorted({repo for repo, _, _ in domain.values()})
    picked = repos[0]
    body = {
        "query": "parse",
        "filter": [{"#repoTag": {"terms": {"f": "repo", "query": picked}}}],
        "facet": {
            "sel": {
                "type": "terms",
                "field": "repo",
                "limit": -1,
                "sort": "index asc",
                "domain": {"excludeTags": "repoTag"},
            },
            "narrowed": {
                "type": "terms",
                "field": "repo",
                "limit": -1,
                "sort": "index asc",
            },
        },
    }
    out = json_facets(body, searcher=searcher)
    # excluded: identical to the unfiltered facet over all parse hits
    all_counts = Counter(repo for repo, _, _ in domain.values())
    got = [(r.repo, r["count"]) for r in out["sel"].collect()]
    assert got == sorted(all_counts.items())
    # not excluded: only the selected bucket survives its own filter
    got2 = [(r.repo, r["count"]) for r in out["narrowed"].collect()]
    assert got2 == [(picked, all_counts[picked])]


def test_terms_filter_needs_stored_field(searcher):
    # {!terms f=repo} over the docs frame is the filter the multi-select
    # test uses — sanity-check it alone through the DSL
    from lucene_solr_spark.search.jsondsl import json_request

    out = json_request(
        {
            "query": "parse",
            "filter": [{"terms": {"f": "repo", "query": "org0/repo0"}}],
            "fields": ["repo"],
            "limit": None,
        },
        searcher=searcher,
    )
    vals = {r.repo for r in out.collect()}
    assert vals <= {"org0/repo0"}


def test_domain_query_replaces_base(searcher):
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "other": {
                    "type": "query",
                    "q": "http",
                    "domain": {"query": "http"},
                }
            },
        },
        searcher=searcher,
    )["other"]
    want = searcher.search("http", k=None).count()
    assert [r["count"] for r in out.collect()] == [want]


def test_domain_filter_intersects(searcher, domain):
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "both": {"type": "query", "q": "parse", "domain": {"filter": "http"}}
            },
        },
        searcher=searcher,
    )["both"]
    http_ids = {
        (r.segment_id, r.doc_id)
        for r in searcher.search("http", k=None).collect()
    }
    assert [r["count"] for r in out.collect()] == [len(set(domain) & http_ids)]


def test_prefix_offset_numbuckets_allbuckets_missing(searcher, domain):
    counts = Counter(repo for repo, _, _ in domain.values())
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "r": {
                    "type": "terms",
                    "field": "repo",
                    "prefix": "org1/",
                    "sort": "index asc",
                    "offset": 1,
                    "limit": 2,
                    "numBuckets": True,
                    "allBuckets": True,
                    "missing": True,
                }
            },
        },
        searcher=searcher,
    )
    pref = sorted((r, c) for r, c in counts.items() if r.startswith("org1/"))
    assert [(r.repo, r["count"]) for r in out["r"].collect()] == pref[1:3]
    assert [r.numBuckets for r in out["r.numBuckets"].collect()] == [len(pref)]
    assert [r["count"] for r in out["r.allBuckets"].collect()] == [
        sum(c for _, c in pref)
    ]
    assert [r["count"] for r in out["r.missing"].collect()] == [0]


def test_domain_on_nested_facet_raises(searcher):
    with pytest.raises(ValueError, match="top-level"):
        json_facets(
            {
                "query": "parse",
                "facet": {
                    "r": {
                        "type": "terms",
                        "field": "repo",
                        "facet": {
                            "s": {
                                "type": "terms",
                                "field": "path",
                                "domain": {"excludeTags": "x"},
                            }
                        },
                    }
                },
            },
            searcher=searcher,
        )


def test_relatedness_agg(searcher, domain, spark):
    """relatedness($fore,$back) — RelatednessAgg.java:473 z-score +
    sigmoid blend, fore/back as absolute docsets."""
    out = json_facets(
        {
            "query": "parse",
            "params": {"fore": "http", "back": "*:*"},
            "facet": {
                "r": {
                    "type": "terms",
                    "field": "repo",
                    "limit": -1,
                    "sort": "index asc",
                    "facet": {"skg": "relatedness($fore,$back)"},
                }
            },
        },
        searcher=searcher,
    )["r"]
    http_ids = {
        (r.segment_id, r.doc_id)
        for r in searcher.search("http", k=None).collect()
    }
    n_docs = spark.read.parquet(searcher.index_dir + "/docs").count()
    fg_size, bg_size = float(len(http_ids)), float(n_docs)
    by_repo = defaultdict(list)
    for ids, (repo, _, _) in domain.items():
        by_repo[repo].append(ids)
    import math

    def expect(repo):
        bucket = by_repo[repo]
        fg_c = float(sum(1 for i in bucket if i in http_ids))
        bg_c = float(len(bucket))  # back = *:* restricted to the bucket rows
        bg_prob = bg_c / bg_size
        den = math.sqrt(fg_size * bg_prob * (1 - bg_prob)) or 1e-10
        z = (fg_c - fg_size * bg_prob) / den

        def sig(off, scale):
            return (z + off) / (scale + abs(z + off))

        return round(
            0.2 * sig(-80, 50) + 0.2 * sig(-30, 30) + 0.2 * sig(0, 30)
            + 0.2 * sig(30, 30) + 0.2 * sig(80, 50),
            5,
        )

    got = {r.repo: float(r.skg) for r in out.collect()}
    assert set(got) == set(by_repo)
    for repo, v in got.items():
        assert v == pytest.approx(expect(repo), abs=2e-5)


def test_hll_agg_approximates_unique(searcher):
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "r": {
                    "type": "terms",
                    "field": "repo",
                    "limit": 5,
                    "facet": {"u": "unique(path)", "h": "hll(path)"},
                }
            },
        },
        searcher=searcher,
    )["r"]
    for r in out.collect():
        assert r.h == pytest.approx(r.u, rel=0.2)


def test_relatedness_needs_param_refs(searcher):
    with pytest.raises(ValueError, match="must name request params"):
        json_facets(
            {
                "query": "parse",
                "facet": {
                    "r": {
                        "type": "terms",
                        "field": "repo",
                        "facet": {"skg": "relatedness($nope,$back)"},
                    }
                },
            },
            searcher=searcher,
        )


def test_range_subfacet_restricted_to_surviving_buckets(searcher):
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "sc": {
                    "type": "range",
                    "field": "score",
                    "start": 0,
                    "end": 3,
                    "gap": 0.5,
                    "mincount": 2,
                    "facet": {"repos": {"type": "terms", "field": "repo", "limit": -1}},
                }
            },
        },
        searcher=searcher,
    )
    surviving = {float(r.val) for r in out["sc"].collect()}
    sub_parents = {float(r.val) for r in out["sc.repos"].collect()}
    assert sub_parents <= surviving  # no sub-facet rows for dropped buckets
