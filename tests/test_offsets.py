"""Offsets in the posting format (``PostingsEnum.OFFSETS``,
``index/PostingsEnum.java:34-46``): per-occurrence (start, end) char spans
stored beside positions as an interleaved (start-delta, length) VByte stream
whose delta chains reset per (term, doc) list — so doc-id rebasing (merges)
never patches the offset blob.

Checks:
- ``analyze_batch_offsets`` emits EXACTLY ``analyze_batch``'s 5-tuple plus
  aligned spans, for every offset-capable chain.
- spans point at the raw text: slicing recovers each token (modulo
  lowercase/stemming); WDGF stacked tokens span the whole original token.
- build → decode round-trips through the index.
- offsets survive the concatenating merge (clean + deletes + hot-sharded)
  and the sorted merge, keyed by stable doc identity.
- mixed offset/offset-free merges refuse loudly.
"""

import numpy as np
import pytest

from lucene_solr_spark.analysis import (
    OFFSET_ANALYZERS,
    analyze_batch,
    analyze_batch_offsets,
)
from lucene_solr_spark.corpus import synth_corpus_local

EDGE_TEXTS = [
    "",
    "the and of",  # all stopwords
    "parseHttp500 retryCount fooBar_baz",
    "x" * 300 + " normalToken camelCase99",  # long-token slow path
    "tab\tsep  multi   space\nnewline",
    "Grüße straße ÄÖÜ tokens",  # non-ASCII word chars
    "a1B2c3 __init__ foo.bar.Baz(qux)",
    None,
]


def _texts():
    corpus = synth_corpus_local(60)
    return corpus["content"].tolist() + [t for t in EDGE_TEXTS]


@pytest.mark.parametrize("analyzer", OFFSET_ANALYZERS)
def test_offsets_twin_matches_analyze_batch(analyzer):
    texts = _texts()
    base = analyze_batch(texts, analyzer)
    off = analyze_batch_offsets(texts, analyzer)
    assert list(off[0]) == list(base[0])  # terms
    np.testing.assert_array_equal(off[1], base[1])  # positions
    np.testing.assert_array_equal(off[2], base[2])  # doc_lens
    np.testing.assert_array_equal(off[3], base[3])  # doc_start
    np.testing.assert_array_equal(off[4], base[4])  # norm_lens
    assert len(off[5]) == len(off[0]) and len(off[6]) == len(off[0])


@pytest.mark.parametrize("analyzer", ["code", "english"])
def test_spans_recover_tokens(analyzer):
    from lucene_solr_spark.porter import porter_stem

    texts = _texts()
    terms, _, lens, starts, _, off_s, off_e = analyze_batch_offsets(texts, analyzer)
    for i, t in enumerate(texts):
        t = t if t is not None else ""
        for j in range(starts[i], starts[i] + lens[i]):
            got = t[off_s[j] : off_e[j]].lower()
            if analyzer == "english":
                got = porter_stem(got)
            assert got == terms[j], (t, j, terms[j], got)


def test_graph_spans_stacked_tokens():
    text = "parseHttp500 sends fooBar_baz to the bufferPool"
    terms, pos, lens, starts, _, off_s, off_e = analyze_batch_offsets(
        [text], "code_graph"
    )
    by_term = {t: (int(s), int(e)) for t, s, e in zip(terms, off_s, off_e)}
    # stacked catenation + preserved original span the WHOLE original token
    assert by_term["parsehttp500"] == (0, 12)
    assert by_term["foobar_baz"] == by_term["foobarbaz"]
    # the subword parts span just themselves
    assert text[slice(*by_term["parse"])] == "parse"
    assert text[slice(*by_term["http"])] == "Http"
    assert text[slice(*by_term["500"])] == "500"
    assert text[slice(*by_term["pool"])] == "Pool"


# ------------------------------------------------------------------ index --


def _offset_rows_by_key(spark, index_dir):
    """Decoded offsets joined to the stable doc key (path) so they compare
    across segmentations / doc-id assignments."""
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.read import offsets_postings

    live = live_segments(spark, index_dir)
    offs = offsets_postings(spark, index_dir).filter(F.col("segment_id").isin(live))
    docs = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .filter(F.col("segment_id").isin(live))
        .select("segment_id", "doc_id", "path")
    )
    rows = offs.join(docs, ["segment_id", "doc_id"]).select(
        "path", "term", "pos", "start_off", "end_off"
    )
    return sorted(map(tuple, rows.collect()))


@pytest.fixture(scope="module")
def off_index(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index

    d = str(tmp_path_factory.mktemp("offs") / "idx")
    docs = spark.createDataFrame(tiny_corpus)
    build_index(
        spark, docs, d, num_segments=4, analyzer="code", store_offsets=True
    )
    return d


def test_build_offsets_roundtrip(spark, tiny_corpus, off_index):
    got = _offset_rows_by_key(spark, off_index)
    expected = []
    texts = tiny_corpus["content"].tolist()
    paths = tiny_corpus["path"].tolist()
    terms, pos, lens, starts, _, off_s, off_e = analyze_batch_offsets(texts, "code")
    for i, p in enumerate(paths):
        for j in range(starts[i], starts[i] + lens[i]):
            expected.append(
                (p, terms[j], int(pos[j]), int(off_s[j]), int(off_e[j]))
            )
    assert got == sorted(expected)


def test_offsets_survive_concat_merge(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import merge_segments

    d = str(tmp_path_factory.mktemp("offs_m") / "idx")
    docs = spark.createDataFrame(tiny_corpus)
    build_index(spark, docs, d, num_segments=4, analyzer="code", store_offsets=True)
    before = _offset_rows_by_key(spark, d)
    merge_segments(spark, d, [0, 1, 2, 3])
    after = _offset_rows_by_key(spark, d)
    assert after == before


def test_offsets_survive_merge_with_deletes(spark, tiny_corpus, tmp_path_factory):
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import delete_docs, merge_segments

    d = str(tmp_path_factory.mktemp("offs_d") / "idx")
    docs = spark.createDataFrame(tiny_corpus)
    build_index(spark, docs, d, num_segments=4, analyzer="code", store_offsets=True)
    stored = spark.read.parquet(os.path.join(d, "docs"))
    victims = stored.filter(
        F.col("path").isin(list(set(tiny_corpus.iloc[::7]["path"])))
    )
    n = delete_docs(spark, d, victims)
    assert n > 0
    dead_paths = set(tiny_corpus.iloc[::7]["path"])
    before = [r for r in _offset_rows_by_key(spark, d) if r[0] not in dead_paths]
    merge_segments(spark, d, [0, 1, 2, 3])
    after = _offset_rows_by_key(spark, d)
    assert after == before


def test_offsets_survive_hot_sharded_merge(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import merge_segments

    d = str(tmp_path_factory.mktemp("offs_h") / "idx")
    docs = spark.createDataFrame(tiny_corpus)
    build_index(spark, docs, d, num_segments=4, analyzer="code", store_offsets=True)
    before = _offset_rows_by_key(spark, d)
    merge_segments(spark, d, [0, 1, 2, 3], hot_df_threshold=0)  # every term shards
    after = _offset_rows_by_key(spark, d)
    assert after == before


def test_offsets_survive_sorted_merge(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import merge_segments

    rows = [
        (r.repo, r.path, r.commit, r.content, float((i * 37) % 100) + 0.5)
        for i, r in enumerate(tiny_corpus.itertuples())
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string, price double"
    )
    d = str(tmp_path_factory.mktemp("offs_s") / "idx")
    build_index(
        spark, docs, d, num_segments=4, analyzer="code",
        index_sort="price", store_offsets=True,
    )
    before = _offset_rows_by_key(spark, d)
    res = merge_segments(spark, d, [0, 1, 2, 3])
    assert res["index_sort"] == "price"
    after = _offset_rows_by_key(spark, d)
    assert after == before


def test_mixed_offsets_merge_raises(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import merge_segments

    d = str(tmp_path_factory.mktemp("offs_mix") / "idx")
    docs = spark.createDataFrame(tiny_corpus)
    build_index(
        spark, docs.limit(50), d, num_segments=2, analyzer="code",
        store_offsets=True,
    )
    build_index(
        spark, docs, d, num_segments=2, analyzer="code",
        store_offsets=False, segment_base=2, resume=False,
    )
    with pytest.raises(ValueError, match="store_offsets"):
        merge_segments(spark, d, [0, 1, 2, 3])
