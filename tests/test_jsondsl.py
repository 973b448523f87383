"""Solr JSON Request API: JsonQueryConverter string conversion, the
{!bool} qparser, and json_request body execution.

Reference: solr/core/src/java/org/apache/solr/request/json/
JsonQueryConverter.java:30 (toLocalParams — JSON query objects become
{!type ...} local-params strings with hoisted $_tt<N> params),
RequestUtil.java:80 (processParams — the query/filter/fields/sort/offset/
limit/params/queries body keys), and solr/core/src/java/org/apache/solr/
search/BoolQParserPlugin.java:39 (must/must_not/should/filter clause
params, BooleanQuery occur semantics).
"""

import pytest

from lucene_solr_spark.search.jsondsl import (
    json_query,
    json_request,
    json_to_local_params,
)
from lucene_solr_spark.search.localparams import parse_local_params


def _hits(df):
    return {(r.segment_id, r.doc_id): float(r.score) for r in df.collect()}


def _same_hits(a, b):
    # f32 engine scores summed in f64 by the frame algebra vs inside the
    # kernel — equal to f32 addition noise
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-6, abs=1e-6)


@pytest.fixture(scope="module")
def searcher(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    return IndexSearcher(spark, d, analyzer="code")


# ------------------------------------------------------- converter strings


def test_converter_string_passthrough():
    p = {}
    assert json_to_local_params("parse AND http", p) == "parse AND http"
    assert p == {}


def test_converter_param_ref():
    assert json_to_local_params({"param": "qq"}, {}) == "{!v=$qq}"


def test_converter_leaf_hoists_body():
    p = {}
    s = json_to_local_params({"lucene": {"query": "parse http"}}, p)
    assert s == "{!lucene v=$_tt0}"
    assert p == {"_tt0": "parse http"}


def test_converter_shorthand_primitive():
    p = {}
    assert json_to_local_params({"prefix": "par"}, p) == "{!prefix v=$_tt0}"
    assert p == {"_tt0": "par"}


def test_converter_scalar_params_quote_and_bool():
    p = {}
    s = json_to_local_params(
        {"frange": {"l": 0, "incl": True, "query": "field(x)"}}, p
    )
    assert s == "{!frange l=0 incl=true v=$_tt0}"
    assert p["_tt0"] == "field(x)"


def test_converter_list_repeats_key():
    p = {}
    s = json_to_local_params({"bool": {"must": ["a", "b"]}}, p)
    assert s == "{!bool must=$_tt0 must=$_tt1}"
    assert p == {"_tt0": "a", "_tt1": "b"}


def test_converter_nested_object_hoists_converted_form():
    p = {}
    s = json_to_local_params(
        {"bool": {"must": [{"lucene": {"query": "parse"}}]}}, p
    )
    assert s == "{!bool must=$_tt1}"
    assert p == {"_tt0": "parse", "_tt1": "{!lucene v=$_tt0}"}


def test_converter_rejects_multi_key_object():
    with pytest.raises(ValueError, match="exactly one parser key"):
        json_to_local_params({"lucene": {}, "bool": {}}, {})


def test_parse_local_params_collects_repeated_keys():
    typ, lp, body = parse_local_params("{!bool must=a must=b should=c}")
    assert typ == "bool"
    assert lp == {"must": ["a", "b"], "should": "c"}
    assert body == ""


def test_parse_local_params_rejects_repeated_v():
    with pytest.raises(ValueError, match="more than once"):
        parse_local_params("{!foo v=a v=b}")


# ------------------------------------------------------------ {!bool} parity


def test_bool_must_matches_classic_and(searcher):
    got = _hits(json_query({"bool": {"must": ["parse", "http"]}}, searcher=searcher))
    want = _hits(searcher.search("parse AND http", k=None))
    assert want  # non-trivial fixture
    _same_hits(got, want)


def test_bool_should_matches_classic_or(searcher):
    got = _hits(json_query({"bool": {"should": ["parse", "http"]}}, searcher=searcher))
    want = _hits(searcher.search("parse OR http", k=None))
    _same_hits(got, want)


def test_bool_must_not_matches_classic(searcher):
    got = _hits(
        json_query(
            {"bool": {"must": ["parse"], "must_not": ["merge"]}}, searcher=searcher
        )
    )
    want = _hits(searcher.search("+parse -merge", k=None))
    assert got  # non-trivial
    _same_hits(got, want)


def test_bool_filter_matches_kernel_filter_clause(searcher):
    from lucene_solr_spark.search.query import BooleanQuery, TermQuery

    got = _hits(
        json_query(
            {"bool": {"must": ["parse"], "filter": ["http"]}}, searcher=searcher
        )
    )
    want = _hits(
        searcher.search_many(
            {0: BooleanQuery(must=(TermQuery("parse"),), filter=(TermQuery("http"),))},
            k=None,
        ).drop("qid")
    )
    assert got
    _same_hits(got, want)


def test_bool_should_adds_on_top_of_must(searcher):
    got = _hits(
        json_query(
            {"bool": {"must": ["parse"], "should": ["http"]}}, searcher=searcher
        )
    )
    must = _hits(searcher.search("parse", k=None))
    opt = _hits(searcher.search("http", k=None))
    assert set(got) == set(must)
    for k in got:
        assert got[k] == pytest.approx(must[k] + opt.get(k, 0.0), rel=1e-6)


def test_bool_filter_only_scores_zero(searcher):
    got = _hits(json_query({"bool": {"filter": ["parse"]}}, searcher=searcher))
    want = _hits(searcher.search("parse", k=None))
    assert set(got) == set(want)
    assert set(got.values()) == {0.0}


def test_bool_nested_bool(searcher):
    got = _hits(
        json_query(
            {
                "bool": {
                    "must": [{"bool": {"should": ["parse", "http"]}}],
                    "must_not": ["merge"],
                }
            },
            searcher=searcher,
        )
    )
    disj = _hits(searcher.search("parse OR http", k=None))
    neg = set(_hits(searcher.search("merge", k=None)))
    want = {k: v for k, v in disj.items() if k not in neg}
    _same_hits(got, want)


def test_bool_needs_a_positive_clause(searcher):
    with pytest.raises(ValueError, match="positive clause"):
        json_query({"bool": {"must_not": ["parse"]}}, searcher=searcher)


def test_bool_rejects_body(searcher):
    from lucene_solr_spark.search.localparams import local_query

    with pytest.raises(ValueError, match="clause params"):
        local_query("{!bool must=parse}trailing", searcher=searcher)


# --------------------------------------------------------------- json_request


def _expected_page(searcher, spark, query, key):
    """Full (repo, path, score) listing sorted by the engine tie-break."""
    d = searcher.index_dir
    docs = spark.read.parquet(d + "/docs").select(
        "segment_id", "doc_id", "repo", "path"
    )
    hits = searcher.search(query, k=None).join(docs, ["segment_id", "doc_id"])
    rows = [
        (r.segment_id, r.doc_id, r.repo, r.path, float(r.score))
        for r in hits.collect()
    ]
    rows.sort(key=key)
    return rows


def test_json_request_sort_offset_limit_fields(searcher, spark):
    body = {
        "query": "parse",
        "fields": ["repo", "path", "score"],
        "sort": "score desc",
        "offset": 2,
        "limit": 5,
    }
    got = [
        (r.repo, r.path, float(r.score))
        for r in json_request(body, searcher=searcher).collect()
    ]
    rows = _expected_page(
        searcher, spark, "parse", key=lambda t: (-t[4], t[0], t[1])
    )
    want = [(repo, path, s) for _, _, repo, path, s in rows[2:7]]
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_json_request_stored_field_sort(searcher, spark):
    body = {
        "query": "parse",
        "fields": ["repo", "path"],
        "sort": "repo asc, score desc",
        "limit": 4,
    }
    got = [(r.repo, r.path) for r in json_request(body, searcher=searcher).collect()]
    rows = _expected_page(
        searcher, spark, "parse", key=lambda t: (t[2], -t[4], t[0], t[1])
    )
    assert got == [(repo, path) for _, _, repo, path, _ in rows[:4]]


def test_json_request_defaults_match_solr(searcher, spark):
    out = json_request({"query": "parse"}, searcher=searcher)
    docs_cols = spark.read.parquet(searcher.index_dir + "/docs").columns
    # fl=* default: every stored column, no score; rows=10 default
    assert out.columns == [c for c in docs_cols if c not in ("segment_id", "doc_id")]
    assert out.count() == min(10, searcher.search("parse", k=None).count())


def test_json_request_filter_is_non_scoring(searcher):
    got = _hits(
        json_request(
            {
                "query": "parse",
                "filter": ["http"],
                "fields": ["segment_id", "doc_id", "score"],
                "limit": None,
            },
            searcher=searcher,
        )
    )
    base = _hits(searcher.search("parse", k=None))
    keep = set(_hits(searcher.search("http", k=None)))
    want = {k: v for k, v in base.items() if k in keep}
    assert got
    _same_hits(got, want)


def test_json_request_named_queries_and_params(searcher):
    body = {
        "queries": {"myq": {"lucene": {"query": "parse"}}},
        "query": {"param": "myq"},
        "filter": [{"param": "fq"}],
        "params": {"fq": "http"},
        "fields": ["segment_id", "doc_id", "score"],
        "limit": None,
    }
    got = _hits(json_request(body, searcher=searcher))
    base = _hits(searcher.search("parse", k=None))
    keep = set(_hits(searcher.search("http", k=None)))
    want = {k: v for k, v in base.items() if k in keep}
    _same_hits(got, want)


def test_json_request_rejects_unknown_keys(searcher):
    with pytest.raises(ValueError, match="unknown JSON request keys"):
        json_request({"query": "parse", "rows": 5}, searcher=searcher)


def test_json_request_rejects_unknown_field(searcher):
    with pytest.raises(ValueError, match="unknown fields"):
        json_request({"query": "parse", "fields": ["nope"]}, searcher=searcher)


def test_json_request_rejects_bad_sort(searcher):
    with pytest.raises(ValueError, match="bad sort clause"):
        json_request({"query": "parse", "sort": "score"}, searcher=searcher)
