"""SignatureUpdateProcessor role — dedup-on-ingest signatures
(``solr/core/src/java/org/apache/solr/update/processor/
SignatureUpdateProcessorFactory.java``, ``MD5Signature.java``,
``TextProfileSignature.java``). The DuckDB-oracled group op is gated in
``tests/test_entry.py`` (``signature_dedup``); here: the per-kind
signature semantics and the overwriteDupes keep-one contract."""

import hashlib

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.textops import (
    md5_signatures,
    signature_dedup_frame,
    text_profile_signatures,
)


def _profile_py(text, quant_rate=0.01, min_token_len=2):
    import re
    from collections import Counter

    toks = [
        t for t in re.split(r"[^a-z0-9]+", text.lower()) if len(t) > min_token_len
    ]
    c = Counter(toks)
    if not c:
        return ""
    maxf = max(c.values())
    quant = round(maxf * quant_rate)
    if quant < 2:
        quant = 2 if maxf > 1 else 1
    prof = []
    for tok, cnt in c.items():
        cnt = (cnt // quant) * quant
        if cnt >= quant:
            prof.append((cnt, tok))
    prof.sort(key=lambda p: (-p[0], p[1]))
    return "\n".join(f"{tok} {cnt}" for cnt, tok in prof)


def test_text_profile_matches_mirror(spark):
    rows = [
        (1, "The quick brown fox. The quick dog! the THE the"),
        (2, "unique words only here today"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["signature"]
        for r in text_profile_signatures(df).collect()
    }
    for doc_id, text in rows:
        want = hashlib.md5(_profile_py(text).encode()).hexdigest()
        assert got[doc_id] == want, doc_id


def test_text_profile_quant_rounds_frequencies_together(spark):
    # freq 5 and freq 4 both quantize to 4 with quant=2 → same profile line
    a = "alpha " * 5 + "beta " * 4
    b = "alpha " * 4 + "beta " * 5
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    got = [r["signature"] for r in text_profile_signatures(df).collect()]
    assert got[0] == got[1]  # the fuzzy-signature point of TextProfile


def test_md5_signature_concatenates_fields_in_order(spark):
    df = spark.createDataFrame(
        [(1, "foo", "bar"), (2, "foob", "ar")], "doc_id long, a string, b string"
    )
    got = {r["doc_id"]: r["signature"] for r in md5_signatures(df, ["a", "b"]).collect()}
    assert got[1] == hashlib.md5(b"foobar").hexdigest()
    assert got[1] == got[2]  # concatenation without separator, like the digest


def test_overwrite_dupes_keeps_one_per_signature(spark):
    rows = [
        (1, "exact same content here today"),
        (2, "exact same content here today"),
        (3, "different content entirely folks"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = signature_dedup_frame(df, ["text"], signature="md5")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3]  # smallest key survives per signature
    no_dedup = signature_dedup_frame(df, ["text"], signature="md5", overwrite_dupes=False)
    assert no_dedup.count() == 3
    assert "signature" in no_dedup.columns


def test_lookup3_standin_is_8_bytes(spark):
    df = spark.createDataFrame([(1, "content")], "doc_id long, text string")
    out = signature_dedup_frame(df, ["text"], signature="lookup3")
    sig = out.collect()[0]["signature"]
    assert len(sig) == 16  # 8 bytes hex
    with pytest.raises(ValueError, match="unknown signature"):
        signature_dedup_frame(df, ["text"], signature="sha9000")
