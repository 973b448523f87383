"""Double Metaphone (``DoubleMetaphoneFilter.java:31`` / commons-codec
``DoubleMetaphone`` — Lawrence Philips' public-domain algorithm): the
classic published vectors, the smith↔schmidt alternate-key match, and the
``phonetic_suggest(encoder="dmetaphone")`` dictionary path."""

import pytest

from lucene_solr_spark.phonetic import double_metaphone as dm


VECTORS = {
    "smith": ("SM0", "XMT"),
    "schmidt": ("XMT", "SMT"),
    "snider": ("SNTR", "XNTR"),
    "schneider": ("XNTR", "SNTR"),
    "katherine": ("K0RN", "KTRN"),
    "thumb": ("0M", "TM"),
    "thomas": ("TMS", "TMS"),
    "knight": ("NT", "NT"),
    "pneumonia": ("NMN", "NMN"),
    "wright": ("RT", "RT"),
    "phone": ("FN", "FN"),
    "caesar": ("SSR", "SSR"),
    "chianti": ("KNT", "KNT"),
    "michael": ("MKL", "MXL"),
    "ghost": ("KST", "KST"),
    "otto": ("AT", "AT"),
    "jose": ("HS", "HS"),
    "san jose": ("SNHS", "SNHS"),
    "xavier": ("SF", "SFR"),
    "judge": ("JJ", "AJ"),
    "school": ("SKL", "SKL"),
    "filipowicz": ("FLPT", "FLPF"),
    "edge": ("AJ", "AJ"),
    "edgar": ("ATKR", "ATKR"),
    "island": ("ALNT", "ALNT"),
    "dumb": ("TM", "TM"),
    "cough": ("KF", "KF"),
    "laugh": ("LF", "LF"),
    "wasserman": ("ASRM", "FSRM"),
    "gnome": ("NM", "NM"),
    "aubrey": ("APR", "APR"),
    "cabrillo": ("KPRL", "KPR"),
}


@pytest.mark.parametrize("word,expected", sorted(VECTORS.items()))
def test_double_metaphone_vectors(word, expected):
    assert dm(word) == expected


def test_smith_matches_schmidt_on_alternate():
    sm = set(dm("smith"))
    sc = set(dm("schmidt"))
    assert sm & sc == {"XMT"}


def test_empty_and_nonalpha():
    assert dm("") == ("", "")
    assert dm("123") == ("", "")
    assert dm("o'brien") == dm("obrien")


def test_dmetaphone_suggest(spark):
    """encoder="dmetaphone" keys the term dictionary through the Arrow
    batch pass; inputs match corpus terms on key-set intersection."""
    from lucene_solr_spark.textops import phonetic_suggest

    sf = "/root/testdata/sf0.001"
    got = phonetic_suggest(
        spark, sf, encoder="dmetaphone",
        inputs=["phast", "streem", "kustomer", "tabel"],
    ).collect()
    pairs = {(r["input"], r["suggestion"]) for r in got}
    assert ("phast", "fast") in pairs
    assert ("streem", "stream") in pairs
    assert ("kustomer", "customer") in pairs
    assert ("tabel", "table") in pairs
    # every suggestion shares a DM key with its input
    for r in got:
        assert set(dm(r["input"])) & set(dm(r["suggestion"]))


def test_unknown_encoder_rejected(spark):
    from lucene_solr_spark.textops import phonetic_suggest

    with pytest.raises(ValueError, match="unknown phonetic encoder"):
        phonetic_suggest(spark, "/root/testdata/sf0.001", encoder="nysiis")
