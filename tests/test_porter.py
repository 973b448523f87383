"""Porter stemmer: the published algorithm's own example vocabulary
(Porter 1980, the algorithm behind analysis/en/PorterStemFilter.java), plus
the english analyzer chain (stop gaps preserved, batch == scalar)."""

import numpy as np

from lucene_solr_spark.analysis import analyze_batch, analyze_english
from lucene_solr_spark.porter import porter_stem

VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "controll": "control", "roll": "roll",
}


def test_published_vectors():
    bad = {w: (porter_stem(w), s) for w, s in VECTORS.items() if porter_stem(w) != s}
    assert not bad, bad


def test_short_and_nonalpha_unchanged():
    for w in ("a", "is", "io", "sd500", "漢", "x1"):
        assert porter_stem(w) == w


def test_english_chain_stems_with_stop_gaps():
    terms, pos = analyze_english("the running dogs are jumping")
    assert terms == ["run", "dog", "jump"]
    assert pos == [1, 2, 4]  # stopword gaps preserved (positions 0, 3)


def test_english_batch_matches_scalar():
    texts = [
        "the running dogs", "", "parseHttp connections allowed",
        "relational databases are effective", "caresses ponies ties",
    ]
    t_flat, p_flat, lens, _, _nl = analyze_batch(texts, "english")
    off = 0
    for i, t in enumerate(texts):
        st, sp = analyze_english(t)
        assert list(t_flat[off : off + lens[i]]) == st, t
        assert list(p_flat[off : off + lens[i]]) == sp, t
        off += lens[i]


def test_english_index_end_to_end(spark, tmp_path):
    """Build with the english analyzer; a query for 'connection' matches docs
    containing 'connections'/'connected' (the recall win stemming buys)."""
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    docs = spark.createDataFrame(
        [
            ("r", "a.py", "c1", "opening database connections quickly"),
            ("r", "b.py", "c2", "the connection was refused"),
            ("r", "c.py", "c3", "we connected to the server"),
            ("r", "d.py", "c4", "nothing relevant here"),
        ],
        "repo string, path string, commit string, content string",
    )
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, num_segments=2, analyzer="english")
    s = IndexSearcher(spark, d, analyzer="english")
    hits = s.fetch(s.search("connection", k=10), cols=["path"]).collect()
    assert sorted(r.path for r in hits) == ["a.py", "b.py", "c.py"]
