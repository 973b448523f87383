"""``[child]`` / ``[parent]`` doc transformers
(``ChildDocTransformerFactory.java:57``): nested-doc retrieval — matching
parents carry their (childFilter-filtered, limit-capped) children as an
array column. Oracle: DuckDB builds the same nested lists; both sides are
compared via sorted serialization (structs don't hash identically across
engines, so the comparison canonicalizes to plain tuples)."""

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF, t + '.parquet')}'"
        )
    return con


def _canon_children(children):
    return tuple(
        (int(c[0]), float(c[1]), float(c[2])) for c in children
    )


def test_child_transform_vs_duckdb(spark, ddb):
    from lucene_solr_spark.relational import child_doc_transform

    got = {
        int(r["o_orderkey"]): (
            float(r["o_totalprice"]),
            _canon_children([(c["l_linenumber"], c["l_quantity"], c["l_extendedprice"]) for c in r["children"]]),
        )
        for r in child_doc_transform(spark, SF).collect()
    }
    oracle = ddb.execute("""
        SELECT o_orderkey, o_totalprice,
               coalesce((
                 SELECT (list(struct_pack(n := l_linenumber, q := l_quantity,
                                          p := l_extendedprice)
                              ORDER BY l_linenumber, l_quantity, l_extendedprice))[:3]
                 FROM lineitem
                 WHERE l_orderkey = o_orderkey AND l_quantity >= 30), []) AS children
        FROM orders WHERE o_totalprice > 400000 AND o_orderstatus = 'F'
    """).fetchall()
    want = {
        int(k): (float(tp), tuple((int(c["n"]), float(c["q"]), float(c["p"])) for c in ch))
        for k, tp, ch in oracle
    }
    assert got == want
    assert len(got) > 0
    # childless parents survive with an empty array (decorate, not filter)
    # and every child satisfies the filter + cap
    for tp, ch in got.values():
        assert len(ch) <= 3
        assert all(q >= 30 for _, q, _ in ch)


def test_child_transform_knobs(spark, ddb):
    from lucene_solr_spark.relational import child_doc_transform

    rows = child_doc_transform(
        spark, SF, child_filter="l_quantity >= 50", limit=1
    ).collect()
    n_kids = sum(len(r["children"]) for r in rows)
    for r in rows:
        assert len(r["children"]) <= 1
        for c in r["children"]:
            assert c["l_quantity"] >= 50
    # the tighter filter yields strictly fewer attached children
    base = child_doc_transform(spark, SF).collect()
    assert n_kids < sum(len(r["children"]) for r in base)


def test_parent_transform_vs_duckdb(spark, ddb):
    from lucene_solr_spark.relational import parent_doc_transform

    got = {
        (int(r["o_orderkey"]), int(r["l_linenumber"])): (
            r["parent"]["o_orderstatus"],
            float(r["parent"]["o_totalprice"]),
        )
        for r in parent_doc_transform(spark, SF).collect()
    }
    oracle = ddb.execute("""
        SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, o.o_totalprice
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= 49 AND l.l_discount >= 0.09
    """).fetchall()
    want = {(int(k), int(n)): (s, float(tp)) for k, n, s, tp in oracle}
    assert got == want and len(got) > 0
