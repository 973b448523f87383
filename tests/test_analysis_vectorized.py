"""The vectorized analysis chain must be BIT-IDENTICAL to the naive
per-token reference chain (the original straight-line transcription of the
reference semantics) — terms, positions, and norms lengths. Hypothesis
generates adversarial identifier soup; the synthetic corpus covers the
realistic distribution."""

import re

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_solr_spark.analysis import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    analyze_batch,
    analyze_code,
)
from lucene_solr_spark.corpus import synth_corpus_local

from lucene_solr_spark.analysis import (  # script ranges are config, not algorithm
    _HANGUL,
    _KATAKANA,
    _UNIGRAM,
)

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
_WORD_RE = re.compile(
    rf"[{_UNIGRAM}]|[{_KATAKANA}]+|[{_HANGUL}]+|[^\W_{_UNIGRAM}{_KATAKANA}{_HANGUL}]+"
)

# case detection covers the bicameral ranges (Latin incl. 0x41-0x24F,
# Greek, Cyrillic) — round 5 extended the package regex beyond ASCII; the
# naive reference implements the SAME rule independently with a per-char
# isupper/islower walk instead of a regex.
_CASE_RANGES = ((0x41, 0x24F), (0x370, 0x3FF), (0x400, 0x52F))


def _kind(ch: str) -> str:
    cp = ord(ch)
    if "0" <= ch <= "9":
        return "d"
    if any(lo <= cp <= hi for lo, hi in _CASE_RANGES):
        if ch.isupper():
            return "U"
        if ch.islower():
            return "l"
    return "o"


def _case_split(tok: str) -> str:
    """Insert a space at every WordDelimiter case/digit transition:
    lower|digit→Upper, Upper→Upper-lower, letter→digit, digit→letter."""
    out = []
    n = len(tok)
    for i, ch in enumerate(tok):
        if i > 0:
            a, b = _kind(tok[i - 1]), _kind(ch)
            if (
                (a in ("l", "d") and b == "U")
                or (a == "U" and b == "U" and i + 1 < n and _kind(tok[i + 1]) == "l")
                or (a in ("U", "l") and b == "d")
                or (a == "d" and b in ("U", "l"))
            ):
                out.append(" ")
        out.append(ch)
    return "".join(out)


def naive_chain(text: str):
    """Reference implementation: per-token loop, exactly the documented
    StandardTokenizer → WordDelimiter → LowerCase → Stop semantics (with the
    Unicode script rules: Han/Hiragana unigrams, Katakana/Hangul runs)."""
    terms, positions, pos = [], [], -1
    for m in _TOKEN_RE.finditer(text):
        tok = m.group()
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        for part in _WORD_RE.findall(_case_split(tok)):
            pos += 1
            low = part.lower()
            if low in ENGLISH_STOP_WORDS:
                continue
            terms.append(low)
            positions.append(pos)
    return terms, positions


ident_chars = st.sampled_from(
    list("abcXYZ_09 \t\n.,;(){}")
    + list("漢字のテひカナ한국어ᄀé把ß")
    + ["Http", "XML", "SD500", "the", "The", "x" * 260, "café", "Ünïcode",
       "ｆｕｌｌ", "ÜberParser", "ПарсерБуфер", "αβΓδ", "É9", "ßX"]
)
texts = st.lists(ident_chars, min_size=0, max_size=60).map("".join)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_scalar_matches_naive(text):
    assert analyze_code(text) == naive_chain(text)


@settings(max_examples=60, deadline=None)
@given(st.lists(texts, min_size=0, max_size=8))
def test_batch_matches_naive(batch):
    t_flat, p_flat, lens, starts, _nl = analyze_batch(batch, "code")
    off = 0
    for i, t in enumerate(batch):
        nt, npos = naive_chain(t)
        assert list(t_flat[off : off + lens[i]]) == nt
        assert list(p_flat[off : off + lens[i]]) == npos
        off += lens[i]
    assert off == len(t_flat)


def test_corpus_parity():
    content = synth_corpus_local(300)["content"].tolist()
    t_flat, p_flat, lens, starts, _nl = analyze_batch(content, "code")
    off = 0
    for i, t in enumerate(content):
        nt, npos = naive_chain(t)
        assert list(t_flat[off : off + lens[i]]) == nt, i
        assert list(p_flat[off : off + lens[i]]) == npos, i
        off += lens[i]


def test_long_token_dropped_whole():
    text = "x" * 300 + " parseHttp the SD500"
    terms, pos = analyze_code(text)
    assert terms == ["parse", "http", "sd", "500"]
    # "the" consumed position 2 (gap), long token emitted nothing
    assert pos == [0, 1, 3, 4]
