"""Analysis chains — code-aware tokenization as vectorized batch kernels.

Reimplements (from scratch, semantics only) the reference chain used for
source-code text:

- tokenizer: Unicode word segmentation, the role of ``StandardTokenizer``
  (``analysis/standard/StandardTokenizer.java:39,61-69``; UAX#29 keeps
  ``_``-joined runs together via ExtendNumLet, so ``snake_case`` is one token
  entering the word-delimiter stage). maxTokenLength 255.
- ``WordDelimiterGraphFilter`` splitting rules
  (``analysis/common/.../miscellaneous/WordDelimiterGraphFilter.java:46-64,
  99-164``): split on non-alphanumerics, case transitions (``parseHttp`` →
  ``parse``/``Http``, ``HTTPServer`` → ``HTTP``/``Server``) and letter↔digit
  transitions (``SD500`` → ``SD``/``500``). GENERATE_WORD_PARTS +
  GENERATE_NUMBER_PARTS + SPLIT_ON_CASE_CHANGE + SPLIT_ON_NUMERICS; no
  catenation and no PRESERVE_ORIGINAL in the v0 chain, so no stacked
  (posIncr=0) tokens and numOverlap = 0.
- ``LowerCaseFilter`` (``analysis/LowerCaseFilter.java:27,40``).
- ``StopFilter`` with the 33-word English stop set
  (``analysis/en/EnglishAnalyzer.java:43-54``). Removal bumps the position
  increment over removed tokens (``FilteringTokenFilter.java:55-60``), i.e.
  kept tokens retain their absolute position — the gaps matter for phrase
  queries.

Field length for norms = number of tokens EMITTED by the chain (post-stop),
minus overlaps (none here) — ``DefaultIndexingChain.invert``
(``index/DefaultIndexingChain.java:822,848``) + ``BM25Similarity.computeNorm``
(:115-126).

Two chains are exposed:

- ``code``: the full chain above (the engine's default).
- ``simple``: ``lower(text)`` → ``[a-z0-9]+`` tokens, no stop/word-delimiter.
  Chosen because it is *also* expressible in ANSI SQL
  (``regexp_extract_all(lower(text), '[a-z0-9]+')``), which lets the DuckDB
  oracle verify the whole index+BM25 pipeline end-to-end.

Both are pure Python/numpy batch functions shared verbatim by the Spark Arrow
UDFs and the brute-force oracle — what the oracle independently checks is the
distributed index build, compression round-trip, pruning, and top-k, not the
tokenizer.
"""

from __future__ import annotations

import math
import re

import numpy as np

# analysis/en/EnglishAnalyzer.java:43-54 (verbatim 33-word set)
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255  # StandardTokenizer.java:61-69

# StandardTokenizer stand-in — UNICODE word runs (`\w` covers all scripts),
# '_' glues runs together (UAX#29 ExtendNumLet behaviour relevant to source
# code identifiers).
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# UAX#29-style script handling (StandardTokenizerImpl.java semantics for the
# scripts that matter in a code/web corpus): Han + Hiragana emit ONE TOKEN
# PER CHARACTER (the reference's IDEOGRAPHIC/HIRAGANA token types); Katakana
# and Hangul emit runs; everything else alphanumeric (incl. accented Latin,
# Greek, Cyrillic) emits runs.
_UNIGRAM = "\u3040-\u309f\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff"
_KATAKANA = "\u30a0-\u30ff"
_HANGUL = "\u1100-\u11ff\uac00-\ud7af"

# WordDelimiterGraphFilter case/digit transitions as ONE zero-width boundary
# pass (``parseHttp``→``parse Http``, ``HTTPServer``→``HTTP Server``,
# ``SD500``→``SD 500``). Case detection covers the BICAMERAL scripts a
# code/web corpus hits — Latin incl. Latin-1/Extended-A/B, Greek, Cyrillic
# (``ÜberParser``→``über parser``, ``ПарсерБуфер``→``парсер буфер``) —
# built from str.isupper()/islower() over those ranges at import (the
# reference uses Character.isUpperCase, full-Unicode; unicameral scripts
# have no case transitions to detect). The split itself happens in the
# word scan below.


def _case_classes() -> tuple[str, str]:
    ups: list[int] = []
    lows: list[int] = []
    for lo, hi in ((0x41, 0x24F), (0x370, 0x3FF), (0x400, 0x52F)):
        for cp in range(lo, hi + 1):
            ch = chr(cp)
            if ch.isupper():
                ups.append(cp)
            elif ch.islower():
                lows.append(cp)

    def compress(cps: list[int]) -> str:
        runs = []
        start = prev = cps[0]
        for c in cps[1:]:
            if c == prev + 1:
                prev = c
                continue
            runs.append((start, prev))
            start = prev = c
        runs.append((start, prev))
        return "".join(
            re.escape(chr(a)) if a == b else f"{re.escape(chr(a))}-{re.escape(chr(b))}"
            for a, b in runs
        )

    return compress(ups), compress(lows)


_UPPER_CLS, _LOWER_CLS = _case_classes()

_CASE_BOUND_RE = re.compile(
    f"(?<=[{_LOWER_CLS}0-9])(?=[{_UPPER_CLS}])"
    f"|(?<=[{_UPPER_CLS}])(?=[{_UPPER_CLS}][{_LOWER_CLS}])"
    f"|(?<=[{_UPPER_CLS}{_LOWER_CLS}])(?=[0-9])"
    f"|(?<=[0-9])(?=[{_UPPER_CLS}{_LOWER_CLS}])"
)

# subword scan over boundary-split text: CJK unigrams first, then Katakana /
# Hangul runs, then any other word chars (underscore always splits)
_WORD_RE = re.compile(
    rf"[{_UNIGRAM}]|[{_KATAKANA}]+|[{_HANGUL}]+|[^\W_{_UNIGRAM}{_KATAKANA}{_HANGUL}]+"
)

_SIMPLE_RE = re.compile(r"[a-z0-9]+")

_STOP_LIST = sorted(ENGLISH_STOP_WORDS)


# tokens longer than MAX_TOKEN_LENGTH are dropped whole (rare); their
# presence forces the per-token slow path for that document
_LONG_TOKEN_RE = re.compile(r"\w{%d,}" % (MAX_TOKEN_LENGTH + 1))


def _split_subwords(text: str) -> list[str]:
    return _WORD_RE.findall(_CASE_BOUND_RE.sub(" ", text))


def _subwords_lower(text: str) -> list[str]:
    """All lowered subwords of a document via whole-document C passes: one
    zero-width boundary substitution (case/digit transitions), one
    ``_WORD_RE.findall``, then lowercase ALL parts at once with a
    join→lower→split round-trip — no per-token Python.

    Equivalent to running the scan per ``_TOKEN_RE`` token: case boundaries
    only fire between adjacent word chars (same token), and ``_WORD_RE``
    classes are subsets of ``\\w`` so matches never cross a token boundary —
    the direct scan yields the identical sequence (property-tested against
    the naive chain).
    """
    if len(text) > MAX_TOKEN_LENGTH and _LONG_TOKEN_RE.search(text):
        out: list[str] = []
        for m in _TOKEN_RE.finditer(text):
            tok = m.group()
            if len(tok) <= MAX_TOKEN_LENGTH:
                out.extend(p.lower() for p in _split_subwords(tok))
        return out
    parts = _split_subwords(text)
    if not parts:
        return parts
    return " ".join(parts).lower().split(" ")


def analyze_code(text: str) -> tuple[list[str], list[int]]:
    """Full code-aware chain. Returns (terms, positions) with Lucene position
    semantics: each generated subword advances the position by 1; stopword
    removal leaves gaps."""
    terms: list[str] = []
    positions: list[int] = []
    for pos, low in enumerate(_subwords_lower(text)):
        if low in ENGLISH_STOP_WORDS:
            continue
        terms.append(low)
        positions.append(pos)
    return terms, positions


def analyze_english(text: str) -> tuple[list[str], list[int]]:
    """EnglishAnalyzer chain (``analysis/en/EnglishAnalyzer.java:43-54``):
    the code chain + ``PorterStemFilter`` (``analysis/en/PorterStemFilter.java``)
    after stopword removal. Positions are unchanged by stemming."""
    from .porter import porter_stem

    terms: list[str] = []
    positions: list[int] = []
    for pos, low in enumerate(_subwords_lower(text)):
        if low in ENGLISH_STOP_WORDS:
            continue
        terms.append(porter_stem(low))
        positions.append(pos)
    return terms, positions


def analyze_simple(text: str) -> tuple[list[str], list[int]]:
    """SQL-expressible chain: lowercase + [a-z0-9]+ runs, positions dense."""
    terms = _SIMPLE_RE.findall(text.lower())
    return terms, list(range(len(terms)))


def analyze_code_graph(text: str) -> tuple[list[str], list[int]]:
    """The ``code`` chain with ``WordDelimiterGraphFilter``'s CATENATE_ALL +
    PRESERVE_ORIGINAL flags (``WordDelimiterGraphFilter.java:99-164``):
    every original token that splits into more than one part additionally
    emits, STACKED at the first part's position (posIncr=0, the graph
    filter's injected-token semantics):

    - the catenation of its parts   (``parseHttp500`` → ``parsehttp500``)
    - the original token, lowered   (``foo_bar``      → ``foo_bar``)

    deduplicated when identical. Stacked tokens are overlaps: they do NOT
    count toward field length (``BM25Similarity`` discountOverlaps,
    ``FieldInvertState.numOverlap``) — norms, and therefore BM25 scores of
    non-stacked terms, are identical to the plain ``code`` chain.

    This is an INDEX-SIDE chain (the standard Solr configuration: catenation
    at query time produces graph queries with known anomalies — see the
    reference's WDGF class javadoc). ``analyze_query`` therefore analyzes
    queries for this chain with the base ``code`` rules; a single-token query
    ``parsehttp500`` matches documents containing ``parseHttp500`` through
    the catenated indexed term. Per-token Python (not the whole-document C
    pass) — an opt-in chain, not the engine default.
    """
    terms: list[str] = []
    positions: list[int] = []
    pos = 0
    for m in _TOKEN_RE.finditer(text):
        tok = m.group()
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        parts = _split_subwords(tok)
        if not parts:
            continue
        low_parts = [p.lower() for p in parts]
        if len(parts) > 1:
            for s in sorted({"".join(low_parts), tok.lower()}):
                if s not in ENGLISH_STOP_WORDS:
                    terms.append(s)
                    positions.append(pos)
        for i, lp in enumerate(low_parts):
            if lp not in ENGLISH_STOP_WORDS:
                terms.append(lp)
                positions.append(pos + i)
        pos += len(parts)
    return terms, positions


def _make_ngram_analyzer(n: int):
    """``NGramTokenizer`` with minGram == maxGram == n
    (``analysis/ngram/NGramTokenizer.java:58``): lowercase, then emit every
    character n-gram of each alphanumeric run, one position per gram,
    consecutive within a run. Run boundaries advance the position by an
    extra ``n`` slots: the every-n-th-gram rewrite (``NGramPhraseQuery``)
    keeps grams at position strides <= n, and within one run a matching
    (first, last) pair forces the middle grams by character overlap — so a
    false positive would need two kept grams straddling a boundary at a
    stride <= n, which the n+1 boundary gap makes impossible. Without the
    gap, a phrase whose first gram ends one run and whose last gram starts
    the next can falsely match. Runs shorter than n emit nothing (Lucene
    behaviour)."""

    def analyze(text: str) -> tuple[list[str], list[int]]:
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        for run in _SIMPLE_RE.findall(text.lower()):
            for i in range(len(run) - n + 1):
                terms.append(run[i : i + n])
                positions.append(pos)
                pos += 1
            pos += n  # boundary gap; see docstring
        return terms, positions

    return analyze


# fixed-size character-gram chains: the fields NGramPhraseQuery optimizes
NGRAM_SIZES = {"ngram2": 2, "ngram3": 3}

# -------------------------------------------- ASCII folding ----------------
# ASCIIFoldingFilter (``analysis/common/.../miscellaneous/ASCIIFoldingFilter
# .java``): map accented/decorated Latin characters to their ASCII base
# before tokenizing. The reference's hand-rolled switch is reproduced for
# the Latin-1 / Latin Extended-A/B ranges via Unicode NFKD decomposition
# (drop combining marks) plus the non-decomposable special cases the
# reference handles explicitly (ß→ss, Æ→AE, Ø→O, Þ→TH, œ→oe, ...). One
# C-level ``str.translate`` pass per document — no per-char Python.

_FOLD_TABLE: dict | None = None


def _fold_table() -> dict:
    global _FOLD_TABLE
    if _FOLD_TABLE is None:
        import unicodedata

        t: dict[int, str] = {}
        for cp in range(0x80, 0x250):
            nf = unicodedata.normalize("NFKD", chr(cp))
            a = "".join(c for c in nf if ord(c) < 128)
            if a:
                t[cp] = a
        for k, v in {
            "ß": "ss", "Æ": "AE", "æ": "ae", "Ø": "O", "ø": "o",
            "Đ": "D", "đ": "d", "Ħ": "H", "ħ": "h", "ı": "i",
            "Ł": "L", "ł": "l", "Ŋ": "N", "ŋ": "n", "Œ": "OE",
            "œ": "oe", "Ŧ": "T", "ŧ": "t", "Þ": "TH", "þ": "th",
            "Ð": "D", "ð": "d",
        }.items():
            t[ord(k)] = v
        _FOLD_TABLE = t
    return _FOLD_TABLE


def fold_to_ascii(text: str) -> str:
    """ASCIIFoldingFilter's character mapping as one translate pass."""
    return text.translate(_fold_table())


def analyze_simple_fold(text: str) -> tuple[list[str], list[int]]:
    """``simple`` chain with ASCII folding ahead of tokenization — the
    standard accent-insensitive field; queries fold identically (the filter
    runs on both sides in the reference chain)."""
    return analyze_simple(fold_to_ascii(text))


# ------------------------------------------- common grams ------------------
# CommonGramsFilter (``analysis/common/src/java/org/apache/lucene/analysis/
# commongrams/CommonGramsFilter.java:51``) + CommonGramsQueryFilter
# (``CommonGramsQueryFilter.java``): the phrase-speed chain that KEEPS
# common words. Index side: every unigram is emitted as usual, and each
# adjacent pair where either word is common additionally emits the joined
# gram ``w1_w2`` STACKED at the first word's position (posIncr=0 — grams
# share the unigram's slot, so they don't count toward field length,
# discountOverlaps). Query side: a phrase keeps the grams and drops the
# unigrams they cover, so "the quick brown" becomes [the_quick@0, brown@2]
# — the phrase walks the gram's (much shorter) postings instead of the
# stop word's. Common set = the 33-word English stop list (Solr wires the
# same words file into both filters).

COMMON_GRAMS_SEP = "_"


def analyze_common_grams(
    text: str, common: frozenset = ENGLISH_STOP_WORDS
) -> tuple[list[str], list[int]]:
    """Index chain: simple tokens (common words KEPT) + stacked grams."""
    words = _SIMPLE_RE.findall(text.lower())
    terms: list[str] = []
    pos: list[int] = []
    n = len(words)
    for i, w in enumerate(words):
        terms.append(w)
        pos.append(i)
        if i + 1 < n and (w in common or words[i + 1] in common):
            terms.append(w + COMMON_GRAMS_SEP + words[i + 1])
            pos.append(i)  # stacked (posIncr=0) at the first word's slot
    return terms, pos


def common_grams_query(
    text: str, common: frozenset = ENGLISH_STOP_WORDS
) -> tuple[list[str], list[int]]:
    """CommonGramsQueryFilter role: phrase terms for a common-grams field —
    grams replace the unigrams they cover; an isolated token (no gram on
    either side) stays a unigram, so a single-word query still works.
    Returns (terms, relative positions) for a ``PhraseQuery``."""
    words = _SIMPLE_RE.findall(text.lower())
    n = len(words)
    gram_at = [
        i + 1 < n and (words[i] in common or words[i + 1] in common)
        for i in range(n)
    ]
    terms: list[str] = []
    pos: list[int] = []
    for i in range(n):
        if gram_at[i]:
            terms.append(words[i] + COMMON_GRAMS_SEP + words[i + 1])
            pos.append(i)
        covered = gram_at[i] or (i > 0 and gram_at[i - 1])
        if not covered:
            terms.append(words[i])
            pos.append(i)
    return terms, pos


# ------------------------------------------- CJK bigram chain --------------
# Solr's ``text_cjk`` field type: StandardTokenizer → CJKWidthFilter →
# LowerCaseFilter → CJKBigramFilter (``analysis/common/src/java/org/apache/
# lucene/analysis/cjk/CJKBigramFilter.java:48`` — han/hiragana/katakana/
# hangul all enabled, outputUnigrams=false; ``CJKWidthFilter.java:35``;
# ``CJKAnalyzer.java``). Semantics:
#
# - width fold: fullwidth ASCII variants (U+FF01-FF5E) → ASCII, ideographic
#   space → space, halfwidth katakana (U+FF66-FF9D) → standard katakana
#   (the base-letter map; voiced-mark composition U+FF9E/FF9F is out of
#   scope — documented partial).
# - bigrams: each maximal run of adjacent CJK characters emits its n-1
#   overlapping character bigrams, one position each; a LONE CJK character
#   (run length 1) is emitted as a unigram (it has no neighbour — the
#   filter's single-char flush). Non-CJK tokens pass through lowercased.
#   Runs of DIFFERENT CJK scripts bigram together (all four flags on, the
#   CJKAnalyzer default). No stop filter (text_cjk has none).
# - deviation (documented): the reference bigrams across a separator
#   BETWEEN two ideographs ("一 二" → "一二") because the filter only sees
#   the token stream; this chain requires the characters to be CONTIGUOUS
#   in the text — the form a SQL oracle can express and the one that keeps
#   positions meaningful for phrase queries. Within unbroken CJK text (the
#   dominant case — CJK scripts don't use spaces) the two agree.
#
# Positions are dense (token index): a latin token or lone CJK char takes
# one slot, an n-char run takes n-1 slots — so quoted bigram sequences
# behave exactly like the reference's phrase-over-bigrams.

_HAN_CLASS = "㐀-䶿一-鿿豈-﫿"
_CJK_CLASS = _HAN_CLASS + "぀-ゟ" + _KATAKANA + "ᄀ-ᇿ가-힯"
_CJK_RUN_RE = re.compile(rf"[{_CJK_CLASS}]+|[^\W_{_CJK_CLASS}]+")
_CJK_FIRST_RE = re.compile(rf"[{_CJK_CLASS}]")

_CJK_WIDTH_TABLE: dict | None = None


def _cjk_width_table() -> dict:
    global _CJK_WIDTH_TABLE
    if _CJK_WIDTH_TABLE is None:
        t: dict[int, str] = {0x3000: " "}
        for cp in range(0xFF01, 0xFF5F):  # fullwidth ASCII variants
            t[cp] = chr(cp - 0xFEE0)
        # halfwidth katakana base letters (U+FF66-FF9D) → standard block
        half = "ｦｧｨｩｪｫｬｭｮｯｰｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜﾝ"
        full = "ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテトナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン"
        for h, f in zip(half, full):
            t[ord(h)] = f
        _CJK_WIDTH_TABLE = t
    return _CJK_WIDTH_TABLE


def analyze_cjk(
    text: str, output_unigrams: bool = False
) -> tuple[list[str], list[int]]:
    """The ``cjk`` chain: width fold → lowercase → run scan → CJK bigrams.
    Whole-document C passes (translate, lower, one findall); the only
    Python loop is per-RUN slicing, bounded by token count like the other
    simple chains.

    ``output_unigrams=True`` is the filter's recall flag
    (``CJKBigramFilter.java`` outputUnigrams): every CJK character emits
    its unigram at its own position AND each bigram is emitted STACKED at
    its first character's position (posIncr=0, positionLength 2 in the
    reference) — so a run of n chars occupies n positions with n-1
    overlapped bigrams, norms discount the overlaps, and both unigram and
    bigram queries match. The ``cjk_unigrams`` registry name selects it."""
    s = text.translate(_cjk_width_table()).lower()
    terms: list[str] = []
    pos: list[int] = []
    p = 0
    for m in _CJK_RUN_RE.finditer(s):
        tok = m.group()
        if _CJK_FIRST_RE.match(tok):
            n = len(tok)
            if n == 1:
                terms.append(tok)
                pos.append(p)
                p += 1
            elif output_unigrams:
                for i in range(n):
                    terms.append(tok[i])
                    pos.append(p)
                    if i + 1 < n:
                        terms.append(tok[i : i + 2])  # stacked on 1st char
                        pos.append(p)
                    p += 1
            else:
                for i in range(n - 1):
                    terms.append(tok[i : i + 2])
                    pos.append(p)
                    p += 1
        elif len(tok) <= MAX_TOKEN_LENGTH:
            terms.append(tok)
            pos.append(p)
            p += 1
        else:
            p += 1  # over-long token dropped; its slot stays (a hole)
    return terms, pos


def analyze_cjk_unigrams(text: str) -> tuple[list[str], list[int]]:
    return analyze_cjk(text, output_unigrams=True)


# ---- user-dictionary CJK segmentation (the ``JapaneseTokenizer``
# userDictionary role, ``lucene/analysis/kuromoji/.../JapaneseTokenizer
# .java:74`` + ``dict/UserDictionary.java``): user-dictionary entries take
# precedence over statistical segmentation via longest match. The full
# kuromoji/nori Viterbi needs the bundled MeCab/ko-dic dictionaries (not
# in this container — documented boundary); the USER-DICT half is exact:
# greedy longest-match over the supplied words (the classic MaxMatch
# rule), with uncovered CJK stretches falling back to the bigram chain
# and non-CJK tokens passing through lowercased. Addressed by the
# self-describing spec string ``cjkdict:<path>`` (one word per line,
# ``#`` comments) — a worker that re-imports this module rebuilds the
# chain from the path alone, like the ``synonym:`` chains.


def load_user_dict(path: str) -> tuple[dict, int]:
    """{first_char: [words longest-first]}, max word length."""
    by_first: dict[str, list[str]] = {}
    maxlen = 1
    with open(path, encoding="utf-8") as f:
        for raw in f:
            w = raw.split("#", 1)[0].strip().lower()
            if not w:
                continue
            by_first.setdefault(w[0], []).append(w)
            maxlen = max(maxlen, len(w))
    for lst in by_first.values():
        lst.sort(key=len, reverse=True)
    return by_first, maxlen


def make_cjk_dict_analyzer(path: str):
    by_first, _maxlen = load_user_dict(path)

    def _emit_bigrams(stretch: str, terms: list, pos: list, p: int) -> int:
        n = len(stretch)
        if n == 1:
            terms.append(stretch)
            pos.append(p)
            return p + 1
        for i in range(n - 1):
            terms.append(stretch[i : i + 2])
            pos.append(p)
            p += 1
        return p

    def analyze(text: str) -> tuple[list[str], list[int]]:
        s = text.translate(_cjk_width_table()).lower()
        terms: list[str] = []
        pos: list[int] = []
        p = 0
        for m in _CJK_RUN_RE.finditer(s):
            tok = m.group()
            if not _CJK_FIRST_RE.match(tok):
                if len(tok) <= MAX_TOKEN_LENGTH:
                    terms.append(tok)
                    pos.append(p)
                    p += 1
                else:
                    p += 1
                continue
            i, n = 0, len(tok)
            unknown_start = 0
            while i < n:
                hit = None
                for w in by_first.get(tok[i], ()):
                    if tok.startswith(w, i):
                        hit = w
                        break  # longest-first order → first hit wins
                if hit is None:
                    i += 1
                    continue
                if unknown_start < i:  # flush the uncovered stretch
                    p = _emit_bigrams(tok[unknown_start:i], terms, pos, p)
                terms.append(hit)
                pos.append(p)
                p += 1
                i += len(hit)
                unknown_start = i
            if unknown_start < n:
                p = _emit_bigrams(tok[unknown_start:], terms, pos, p)
        return terms, pos

    return analyze


# ------------------------------------------- synonym graph filter ----------
# SynonymGraphFilter / SolrSynonymParser (``analysis/common/.../synonym/
# SynonymGraphFilter.java`` + ``SolrSynonymParser.java``): inject synonym
# tokens STACKED at the original's position (posIncr=0 overlaps — they do
# not count toward field length, discountOverlaps). Scope (documented):
# single-token inputs and outputs only — multi-word synonyms need posLength
# graph support the posting format doesn't store (the same limitation the
# reference has at INDEX time: its graph flattening is lossy too, see the
# SynonymGraphFilter javadoc's index-time warning). Rules files use Solr's
# synonyms.txt grammar: `a, b, c` equivalence classes (expand=true) and
# `a => b, c` explicit mappings (LHS replaced by RHS).
#
# Chains are addressed by SPEC STRING — ``synonym:<base>:<path>`` — so the
# name itself carries everything a worker process needs to rebuild the
# chain (rules load lazily per process from <path>, which must be on
# storage every executor can read, like Solr's conf/ directory).


def parse_synonym_rules(path: str) -> dict:
    """Solr synonyms.txt -> {term: (replace, outputs)}. ``replace=True``
    for `lhs => rhs` lines (LHS dropped), False for equivalence classes
    (original kept, others stacked).

    A term appearing on SEVERAL lines merges like ``SynonymMap.Builder.add``
    does: outputs are the union (first-seen order), and the original is
    kept if ANY of its rules keeps it (includeOrig is per-add in the
    reference, so one keep wins)."""
    rules: dict[str, tuple[bool, tuple[str, ...]]] = {}

    def _add(term: str, replace: bool, outs):
        old = rules.get(term)
        if old is None:
            rules[term] = (replace, tuple(outs))
            return
        old_replace, old_outs = old
        merged = tuple(dict.fromkeys((*old_outs, *outs)))
        rules[term] = (old_replace and replace, merged)

    with open(path) as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            if "=>" in line:
                lhs, rhs = line.split("=>", 1)
                lhs_items = [t.strip().lower() for t in lhs.split(",") if t.strip()]
                rhs_items = [t.strip().lower() for t in rhs.split(",") if t.strip()]
                items = lhs_items + rhs_items
                if not lhs_items or not rhs_items:
                    raise ValueError(f"bad synonym rule: {raw!r}")
                if any(" " in t for t in items):
                    raise ValueError(
                        f"multi-word synonyms need the query-time graph path (synonymq: via parse_query): {raw!r}"
                    )
                for t in lhs_items:
                    _add(t, True, rhs_items)
            else:
                items = [t.strip().lower() for t in line.split(",") if t.strip()]
                if len(items) < 2:
                    raise ValueError(f"bad synonym rule: {raw!r}")
                if any(" " in t for t in items):
                    raise ValueError(
                        f"multi-word synonyms need the query-time graph path (synonymq: via parse_query): {raw!r}"
                    )
                for t in items:
                    _add(t, False, (o for o in items if o != t))
    return rules


def parse_synonym_rules_graph(path: str) -> dict:
    """Solr synonyms.txt with MULTI-WORD entries allowed — the token-graph
    form ``QueryBuilder.analyzeGraphPhrase`` consumes (reference
    ``lucene/core/src/java/org/apache/lucene/util/QueryBuilder.java:586``,
    ``analysis/common/.../synonym/SynonymGraphFilter.java:58``).

    Returns ``{first_word: [(lhs_words, replace, output_paths), ...]}`` with
    candidates longest-LHS-first per bucket (``SynonymMap``'s FST
    longest-match contract: at each token the longest matching LHS wins and
    scanning resumes after it). Query-time only: the posting format stores
    no posLength, so multi-word rules compile into the QUERY graph
    (PhraseQuery / SpanNear alternatives in ``search/query.py``), never into
    the index — the same one-sided configuration the reference javadoc
    recommends for multi-word synonyms (index-time graph flattening is
    lossy there too)."""
    merged: dict[tuple, tuple[bool, tuple]] = {}

    def _add(lhs: tuple, replace: bool, outs):
        old = merged.get(lhs)
        if old is None:
            merged[lhs] = (replace, tuple(outs))
            return
        old_replace, old_outs = old
        merged[lhs] = (old_replace and replace, tuple(dict.fromkeys((*old_outs, *outs))))

    with open(path) as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            if "=>" in line:
                lhs_s, rhs_s = line.split("=>", 1)
                lhs_items = [tuple(t.strip().lower().split()) for t in lhs_s.split(",") if t.strip()]
                rhs_items = [tuple(t.strip().lower().split()) for t in rhs_s.split(",") if t.strip()]
                if not lhs_items or not rhs_items:
                    raise ValueError(f"bad synonym rule: {raw!r}")
                for lhs in lhs_items:
                    _add(lhs, True, rhs_items)
            else:
                items = [tuple(t.strip().lower().split()) for t in line.split(",") if t.strip()]
                if len(items) < 2:
                    raise ValueError(f"bad synonym rule: {raw!r}")
                for lhs in items:
                    _add(lhs, False, (o for o in items if o != lhs))
    by_first: dict[str, list] = {}
    for lhs, (replace, outs) in merged.items():
        by_first.setdefault(lhs[0], []).append((lhs, replace, outs))
    for cands in by_first.values():
        cands.sort(key=lambda c: -len(c[0]))
    return by_first


def make_synonym_analyzer(base_fn, rules: dict):
    """Wrap a base chain with the synonym filter: injected tokens stack at
    the original's position (posIncr=0); explicit-mapping originals drop.

    Per-token Python (like the ``code_graph`` chain) — an OPT-IN chain, not
    the engine default; the documented exception to the no-per-row-Python
    invariant. A vocabulary-factorized vectorization (the ``english``
    chain's stem-the-dictionary trick) is possible but the substitution is
    1→many, which changes doc_lens/positions — left to a future pass."""

    def analyze(text: str) -> tuple[list[str], list[int]]:
        terms, pos = base_fn(text)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, pos):
            r = rules.get(t)
            if r is None:
                out_t.append(t)
                out_p.append(p)
                continue
            replace, outs = r
            if not replace:
                out_t.append(t)
                out_p.append(p)
            for o in outs:
                out_t.append(o)
                out_p.append(p)
        return out_t, out_p

    return analyze


def _synonym_spec(spec: str) -> tuple[str, str]:
    parts = spec.split(":", 2)
    if len(parts) != 3 or not parts[1] or not parts[2]:
        raise KeyError(f"bad synonym analyzer spec {spec!r} "
                       "(want synonym:<base>:<path>)")
    return parts[1], parts[2]


class _AnalyzerRegistry(dict):
    """Static chains by name, plus on-demand ``synonym:<base>:<path>``
    chains — the spec string is self-describing, so a worker that re-imports
    this module resolves it without any driver-side registration."""

    def __missing__(self, key):
        if isinstance(key, str) and key.startswith(("synonym:", "synonymq:")):
            base, path = _synonym_spec(key)
            fn = make_synonym_analyzer(
                self[base], parse_synonym_rules(path)
            )
            self[key] = fn  # per-process memoization
            return fn
        if isinstance(key, str) and key.startswith("cjkdict:"):
            fn = make_cjk_dict_analyzer(key.split(":", 1)[1])
            self[key] = fn
            return fn
        raise KeyError(key)


class _QueryChain(dict):
    """Index-side graph chains analyze queries with their base rules;
    synonym chains resolve to their declared base (index-time synonyms, the
    standard Solr configuration — query-time graph expansion has the known
    multi-term anomalies the reference javadoc warns about)."""

    def get(self, key, default=None):
        if key in self:
            return self[key]
        if isinstance(key, str) and key.startswith("synonym:"):
            # recurse: a graph BASE (e.g. code_graph) must still analyze
            # queries with ITS base rules
            base = _synonym_spec(key)[0]
            return self.get(base, base)
        # synonymq: QUERY-time synonyms (the reference's query-analyzer
        # configuration): queries analyze WITH the synonym chain — the
        # parser turns stacked tokens into SynonymQuery / MultiPhraseQuery /
        # SpanOr-in-SpanNear (QueryBuilder.analyzeGraph* roles)
        if isinstance(key, str) and key.startswith("synonymq:"):
            return key
        return default


ANALYZERS = _AnalyzerRegistry({
    "code": analyze_code,
    "code_graph": analyze_code_graph,
    "english": analyze_english,
    "simple": analyze_simple,
    "simple_fold": analyze_simple_fold,
    "cjk": analyze_cjk,
    "cjk_unigrams": analyze_cjk_unigrams,
    "commongrams": analyze_common_grams,
    "commongrams_query": common_grams_query,
    **{name: _make_ngram_analyzer(n) for name, n in NGRAM_SIZES.items()},
})

# graph chains are index-side only; queries analyze with the base rules.
# commongrams queries go through CommonGramsQueryFilter (grams REPLACE the
# unigrams they cover — the index side stacks both).
QUERY_CHAIN = _QueryChain({"code_graph": "code", "commongrams": "commongrams_query"})

# DuckDB-side equivalent of analyze_simple, used when emitting oracle SQL.
SIMPLE_SQL_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z0-9]+')"


def analyze_batch(
    texts, analyzer: str = "code"
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch of documents in one flat pass.

    Returns (terms object-array, positions int32, doc_lens int32, doc_start
    int64, norm_lens int32) where ``terms``/``positions`` are flat
    concatenations over the batch, ``doc_lens[i]`` = number of emitted tokens
    for doc i (segments the flat arrays), ``doc_start`` marks each doc's
    first flat index, and ``norm_lens[i]`` = the field length for norms =
    occupied position slots, i.e. emitted tokens minus posIncr=0 overlaps
    (``FieldInvertState.length - numOverlap``, discountOverlaps). For chains
    without stacked tokens norm_lens == doc_lens.

    The regex work is one C-level pass per document; lowercase, stopword
    masking and position assignment are flat numpy over the whole batch (the
    per-token Python loop of the naive chain was ~85% of build time).
    """
    if analyzer in ("code", "english"):
        import pandas as pd

        parts_per_doc = [_subwords_lower(t if t is not None else "") for t in texts]
        raw_lens = np.fromiter(
            (len(p) for p in parts_per_doc), dtype=np.int64, count=len(texts)
        )
        flat = [p for parts in parts_per_doc for p in parts]
        if flat:
            low = np.array(flat, dtype=object)
            # hashtable membership in C (pandas) — not a Python loop
            keep = ~pd.Index(low).isin(_STOP_LIST)
            # global position = index within the doc's subword sequence
            doc_start_raw = np.zeros(len(texts), dtype=np.int64)
            np.cumsum(raw_lens[:-1], out=doc_start_raw[1:])
            gpos = np.arange(len(flat), dtype=np.int64) - np.repeat(
                doc_start_raw, raw_lens
            )
            doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), raw_lens)
            terms = low[keep]
            if analyzer == "english":
                # stem the DICTIONARY, not the token stream: factorize to
                # unique terms (C hashtable), stem each unique once, map back
                from .porter import porter_stem

                codes, uniq = pd.factorize(pd.array(terms))
                stemmed = np.array([porter_stem(u) for u in uniq], dtype=object)
                terms = stemmed[codes]
            positions = gpos[keep].astype(np.int32)
            lens = np.bincount(doc_of[keep], minlength=len(texts)).astype(np.int32)
        else:
            terms = np.empty(0, dtype=object)
            positions = np.empty(0, dtype=np.int32)
            lens = np.zeros(len(texts), dtype=np.int32)
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        return terms, positions, lens, starts, lens

    fn = ANALYZERS[analyzer]
    all_terms: list[str] = []
    all_pos: list[int] = []
    lens = np.empty(len(texts), dtype=np.int32)
    norm_lens = np.empty(len(texts), dtype=np.int32)
    for i, t in enumerate(texts):
        terms, pos = fn(t if t is not None else "")
        all_terms.extend(terms)
        all_pos.extend(pos)
        lens[i] = len(terms)
        # field length = occupied position slots (stacked tokens share a slot)
        norm_lens[i] = len(set(pos))
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return (
        np.asarray(all_terms, dtype=object),
        np.asarray(all_pos, dtype=np.int32),
        lens,
        starts,
        norm_lens,
    )


# --------------------------------------------------------------- offsets ----
# OffsetAttribute support (``analysis/tokenattributes/OffsetAttribute.java``,
# consumed as ``PostingsEnum.OFFSETS`` — ``index/PostingsEnum.java:34-46``):
# the same chains, additionally reporting each emitted token's (start, end)
# character span in the RAW text. Kept out of :func:`analyze_batch` so its
# load-bearing 5-tuple contract (and the offset-free fast path) is untouched.

OFFSET_ANALYZERS = ("code", "english", "code_graph")


def _scan_spans(text: str) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Subword scan with raw-text char spans: the ``_split_subwords`` pass,
    plus mapping match offsets in the boundary-substituted text back through
    the zero-width insertions (each substitution INSERTS one space)."""
    ins = [m.start() for m in _CASE_BOUND_RE.finditer(text)]
    mod = _CASE_BOUND_RE.sub(" ", text)
    spans = [m.span() for m in _WORD_RE.finditer(mod)]
    if not spans:
        return [], np.empty(0, np.int64), np.empty(0, np.int64)
    parts = [mod[s:e] for s, e in spans]
    starts = np.fromiter((s for s, _ in spans), np.int64, len(spans))
    ends = np.fromiter((e for _, e in spans), np.int64, len(spans))
    if ins:
        # insertion offsets in the MOD text; a span never contains one
        # (inserted spaces match no _WORD_RE class)
        mod_ins = np.asarray(ins, np.int64) + np.arange(len(ins), dtype=np.int64)
        starts -= np.searchsorted(mod_ins, starts, side="left")
        ends -= np.searchsorted(mod_ins, ends - 1, side="right")
    return parts, starts, ends


def _subwords_offsets(text: str) -> tuple[list[str], np.ndarray, np.ndarray]:
    """``_subwords_lower``'s token sequence (identical strings, property-
    tested) with raw-text (start, end) spans per token."""
    if len(text) > MAX_TOKEN_LENGTH and _LONG_TOKEN_RE.search(text):
        parts: list[str] = []
        ss: list[np.ndarray] = []
        ee: list[np.ndarray] = []
        for m in _TOKEN_RE.finditer(text):
            tok = m.group()
            if len(tok) <= MAX_TOKEN_LENGTH:
                p, s, e = _scan_spans(tok)
                parts.extend(p)
                ss.append(s + m.start())
                ee.append(e + m.start())
        starts = np.concatenate(ss) if ss else np.empty(0, np.int64)
        ends = np.concatenate(ee) if ee else np.empty(0, np.int64)
        return [p.lower() for p in parts], starts, ends
    parts, starts, ends = _scan_spans(text)
    if parts:
        parts = " ".join(parts).lower().split(" ")
    return parts, starts, ends


def analyze_batch_offsets(
    texts, analyzer: str = "code"
) -> tuple[np.ndarray, ...]:
    """:func:`analyze_batch` plus per-token char offsets.

    Returns (terms, positions, doc_lens, doc_start, norm_lens, off_start,
    off_end) — the first five exactly as :func:`analyze_batch`, the last two
    int64 raw-text spans aligned with ``terms``. For ``code_graph``, stacked
    (posIncr=0) tokens — the catenation and the preserved original — span the
    WHOLE original token (WordDelimiterGraphFilter offset semantics), which
    is exactly the case offset-free re-analysis cannot reconstruct.

    Only chains in :data:`OFFSET_ANALYZERS` support offsets (``simple`` and
    the ngram chains are oracle/rewrite surfaces with no display path).
    """
    if analyzer in ("code", "english"):
        import pandas as pd

        per_doc = [_subwords_offsets(t if t is not None else "") for t in texts]
        raw_lens = np.fromiter((len(p[0]) for p in per_doc), np.int64, len(texts))
        flat = [p for parts, _, _ in per_doc for p in parts]
        if not flat:
            z = np.zeros(len(texts), dtype=np.int32)
            z64 = np.zeros(len(texts), dtype=np.int64)
            e = np.empty(0, np.int64)
            return np.empty(0, object), np.empty(0, np.int32), z, z64, z, e, e
        low = np.array(flat, dtype=object)
        off_s = np.concatenate([s for _, s, _ in per_doc])
        off_e = np.concatenate([e for _, _, e in per_doc])
        keep = ~pd.Index(low).isin(_STOP_LIST)
        doc_start_raw = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(raw_lens[:-1], out=doc_start_raw[1:])
        gpos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            doc_start_raw, raw_lens
        )
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), raw_lens)
        terms = low[keep]
        if analyzer == "english":
            from .porter import porter_stem

            codes, uniq = pd.factorize(pd.array(terms))
            stemmed = np.array([porter_stem(u) for u in uniq], dtype=object)
            terms = stemmed[codes]
        positions = gpos[keep].astype(np.int32)
        lens = np.bincount(doc_of[keep], minlength=len(texts)).astype(np.int32)
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        return terms, positions, lens, starts, lens, off_s[keep], off_e[keep]

    if analyzer != "code_graph":
        raise ValueError(
            f"offsets unsupported for analyzer {analyzer!r} "
            f"(supported: {OFFSET_ANALYZERS})"
        )

    all_terms: list[str] = []
    all_pos: list[int] = []
    all_s: list[int] = []
    all_e: list[int] = []
    lens = np.empty(len(texts), dtype=np.int32)
    norm_lens = np.empty(len(texts), dtype=np.int32)
    for i, text in enumerate(texts):
        text = text if text is not None else ""
        n0 = len(all_terms)
        pos = 0
        slots = 0
        for m in _TOKEN_RE.finditer(text):
            tok = m.group()
            if len(tok) > MAX_TOKEN_LENGTH:
                continue
            parts, ps, pe = _scan_spans(tok)
            if not parts:
                continue
            low_parts = [p.lower() for p in parts]
            if len(parts) > 1:
                # stacked injected tokens span the ORIGINAL token
                for s in sorted({"".join(low_parts), tok.lower()}):
                    if s not in ENGLISH_STOP_WORDS:
                        all_terms.append(s)
                        all_pos.append(pos)
                        all_s.append(m.start())
                        all_e.append(m.end())
            for j, lp in enumerate(low_parts):
                if lp not in ENGLISH_STOP_WORDS:
                    all_terms.append(lp)
                    all_pos.append(pos + j)
                    all_s.append(m.start() + int(ps[j]))
                    all_e.append(m.start() + int(pe[j]))
            pos += len(parts)
            slots += len(parts)
        lens[i] = len(all_terms) - n0
        norm_lens[i] = len(set(all_pos[n0:]))
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return (
        np.asarray(all_terms, dtype=object),
        np.asarray(all_pos, dtype=np.int32),
        lens,
        starts,
        norm_lens,
        np.asarray(all_s, dtype=np.int64),
        np.asarray(all_e, dtype=np.int64),
    )


def analyze_query(text: str, analyzer: str = "code") -> list[str]:
    """Analyze query text with the same chain (QueryBuilder.java:60-135).
    Index-side graph chains analyze queries with their base rules."""
    return ANALYZERS[QUERY_CHAIN.get(analyzer, analyzer)](text)[0]


# -------------------------------------------------------------- payloads ----
# DelimitedPayloadTokenFilter + FloatEncoder chain
# (``analysis/common/src/java/org/apache/lucene/analysis/payloads/
# DelimitedPayloadTokenFilter.java`` / ``FloatEncoder.java``): whitespace
# tokenization, each token split at its LAST '|' into (term, float payload),
# term lowercased. Deviations (documented, lenient where Lucene throws):
# a token with an unparseable or empty payload part keeps its full pre-'|'
# text as the term and gets NO payload; tokens whose term part is empty are
# dropped. Absent payloads score as 1.0 at query time — the
# ``PayloadDecoder.FLOAT_DECODER`` null contract
# (``queries/payloads/PayloadDecoder.java:36``).

PAYLOAD_DELIMITER = "|"


def analyze_payload(text: str) -> tuple[list[str], list[int]]:
    """Query-side payload chain: terms only (payload suffixes stripped)."""
    terms = []
    for tok in text.split():
        before, sep, after = tok.rpartition(PAYLOAD_DELIMITER)
        term = (before if sep else after).lower()
        if sep:
            try:
                if not after or not math.isfinite(float(after)):
                    term = tok.lower()
            except ValueError:
                term = tok.lower()
        if term:
            terms.append(term)
    return terms, list(range(len(terms)))


ANALYZERS["payload"] = analyze_payload


def analyze_batch_payloads(
    texts,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """:func:`analyze_batch`'s 5-tuple for the payload chain, plus a float32
    payload per emitted token (1.0 where the token carried none).

    Token streams are identical to :func:`analyze_payload` per document
    (property-tested); the flat work is pandas C string kernels over the
    whole batch, no per-token Python.
    """
    import pandas as pd

    per_doc = [(t if t is not None else "").split() for t in texts]
    raw_lens = np.fromiter((len(p) for p in per_doc), np.int64, len(texts))
    flat = [tok for parts in per_doc for tok in parts]
    if not flat:
        z32 = np.zeros(len(texts), dtype=np.int32)
        z64 = np.zeros(len(texts), dtype=np.int64)
        return (
            np.empty(0, object), np.empty(0, np.int32), z32, z64, z32,
            np.empty(0, np.float32),
        )
    s = pd.Series(flat, dtype=object)
    parts3 = s.str.rpartition(PAYLOAD_DELIMITER)
    has_delim = parts3[1].to_numpy() == PAYLOAD_DELIMITER
    pay = pd.to_numeric(parts3[2], errors="coerce").to_numpy(np.float64)
    pay_ok = has_delim & np.isfinite(pay) & (parts3[2].to_numpy() != "")
    term = np.where(pay_ok, parts3[0].to_numpy(), s.to_numpy())
    term = pd.Series(term).str.lower().to_numpy(object)
    payload = np.where(pay_ok, pay, 1.0).astype(np.float32)
    keep = term != ""

    doc_start_raw = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(raw_lens[:-1], out=doc_start_raw[1:])
    gpos = np.arange(len(flat), dtype=np.int64) - np.repeat(doc_start_raw, raw_lens)
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), raw_lens)
    # positions re-densify after empty-term drops (the chain has no
    # stopword gaps: dropped tokens are malformed, not stop words)
    terms = term[keep]
    doc_kept = doc_of[keep]
    lens = np.bincount(doc_kept, minlength=len(texts)).astype(np.int32)
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    positions = (np.arange(len(terms), dtype=np.int64) - np.repeat(starts, lens)).astype(np.int32)
    return terms, positions, lens, starts, lens, payload[keep]
