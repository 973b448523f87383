"""Double Metaphone — the real Solr phonetic default.

Reference: ``lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/DoubleMetaphoneFilter.java:31`` (delegating to commons-codec's
``DoubleMetaphone``, itself Lawrence Philips' public-domain algorithm,
C/C++ Users Journal, June 2000). Re-implemented here from the published
algorithm description: a primary and an alternate 4-character key per
word, with the context rules (Slavo-Germanic detection, silent initial
clusters, the big C/G/S/X rule tables) that make ``smith`` (SM0/XMT) match
``schmidt`` (XMT/SMT) on the alternate↔primary key.

Unlike Soundex (pure translate/replace — expressed identically in Catalyst
and DuckDB SQL, ``textops._soundex_spark``), Double Metaphone is a
procedural rule cascade no SQL engine expresses; the Spark integration
(``textops.phonetic_suggest(encoder="dmetaphone")``) keys the TERM
DICTIONARY — never the corpus — through one Arrow-batched pass, and
correctness is pinned by the classic published vectors
(``tests/test_phonetic.py``) rather than a DuckDB twin.
"""

from __future__ import annotations

VOWELS = frozenset("AEIOUY")


def _slavo_germanic(s: str) -> bool:
    return "W" in s or "K" in s or "CZ" in s or "WITZ" in s


def double_metaphone(value: str, max_length: int = 4) -> tuple[str, str]:
    """Return (primary, alternate) Double Metaphone keys of ``value``.

    The alternate equals the primary unless a context rule forked; callers
    matching sound-alikes should compare all four primary/alternate pairs.
    """
    s = value.upper()
    # strip everything outside A-Z, keeping interior spaces ("SAN ", "VAN "
    # name-particle rules look across them; the reference pads with spaces)
    s = "".join(c for c in s if "A" <= c <= "Z" or c == " ").strip()
    length = len(s)
    if length == 0:
        return "", ""
    last = length - 1
    pad = s + "     "
    pri: list[str] = []
    alt: list[str] = []
    sg = _slavo_germanic(s)

    def at(i: int) -> str:
        return pad[i] if 0 <= i < length else ""

    def string_at(start: int, n: int, *opts: str) -> bool:
        if start < 0:
            return False
        sub = pad[start : start + n]
        return sub in opts

    def is_vowel(i: int) -> bool:
        return 0 <= i < length and pad[i] in VOWELS

    def add(p: str, a: str | None = None) -> None:
        pri.append(p)
        alt.append(p if a is None else a)

    current = 0
    # silent initial clusters
    if string_at(0, 2, "GN", "KN", "PN", "WR", "PS"):
        current = 1
    # initial X sounds like S ("Xavier")
    if at(0) == "X":
        add("S")
        current = 1

    while current < length and (len("".join(pri)) < max_length or len("".join(alt)) < max_length):
        c = at(current)
        if c in VOWELS:
            if current == 0:
                add("A")
            current += 1
            continue
        if c == "B":
            add("P")
            current += 2 if at(current + 1) == "B" else 1
            continue
        if c == "\xc7":
            add("S")
            current += 1
            continue
        if c == "C":
            # germanic CH as K: "michael" style ACH- but not ACHI-
            if (
                current > 1
                and not is_vowel(current - 2)
                and string_at(current - 1, 3, "ACH")
                and at(current + 2) != "I"
                and (at(current + 2) != "E" or string_at(current - 2, 6, "BACHER", "MACHER"))
            ):
                add("K")
                current += 2
                continue
            if current == 0 and string_at(0, 6, "CAESAR"):
                add("S")
                current += 2
                continue
            if string_at(current, 4, "CHIA"):  # italian "chianti"
                add("K")
                current += 2
                continue
            if string_at(current, 2, "CH"):
                if current > 0 and string_at(current, 4, "CHAE"):  # michael
                    add("K", "X")
                    current += 2
                    continue
                # greek roots: chemistry, chorus; initial CH before vowel-ish
                if (
                    current == 0
                    and (string_at(1, 5, "HARAC", "HARIS") or string_at(1, 3, "HOR", "HYM", "HIA", "HEM"))
                    and not string_at(0, 5, "CHORE")
                ):
                    add("K")
                    current += 2
                    continue
                # germanic/greek contexts → K
                if (
                    string_at(0, 4, "VAN ", "VON ")
                    or string_at(0, 3, "SCH")
                    or string_at(current - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                    or string_at(current + 2, 1, "T", "S")
                    or (
                        (string_at(current - 1, 1, "A", "O", "U", "E") or current == 0)
                        and string_at(current + 2, 1, "L", "R", "N", "M", "B", "H", "F", "V", "W", " ", "")
                    )
                ):
                    add("K")
                else:
                    if current > 0:
                        if string_at(0, 2, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                current += 2
                continue
            if string_at(current, 2, "CZ") and not string_at(current - 2, 4, "WICZ"):
                add("S", "X")
                current += 2
                continue
            if string_at(current + 1, 3, "CIA"):  # focaccia
                add("X")
                current += 3
                continue
            if string_at(current, 2, "CC") and not (current == 1 and at(0) == "M"):
                # double C, but not McClellan
                if string_at(current + 2, 1, "I", "E", "H") and not string_at(current + 2, 2, "HU"):
                    # bellocchio / bacchus handled below
                    if (current == 1 and at(current - 1) == "A") or string_at(
                        current - 1, 5, "UCCEE", "UCCES"
                    ):
                        add("KS")  # accident, accede, succeed
                    else:
                        add("X")  # bacci, bertucci
                    current += 3
                    continue
                add("K")  # Pierce's rule
                current += 2
                continue
            if string_at(current, 2, "CK", "CG", "CQ"):
                add("K")
                current += 2
                continue
            if string_at(current, 2, "CI", "CE", "CY"):
                if string_at(current, 3, "CIO", "CIE", "CIA"):  # italian vs english
                    add("S", "X")
                else:
                    add("S")
                current += 2
                continue
            add("K")
            if string_at(current + 1, 2, " C", " Q", " G"):  # mac caffrey
                current += 3
            elif string_at(current + 1, 1, "C", "K", "Q") and not string_at(
                current + 1, 2, "CE", "CI"
            ):
                current += 2
            else:
                current += 1
            continue
        if c == "D":
            if string_at(current, 2, "DG"):
                if string_at(current + 2, 1, "I", "E", "Y"):  # edge
                    add("J")
                    current += 3
                else:  # edgar
                    add("TK")
                    current += 2
                continue
            if string_at(current, 2, "DT", "DD"):
                add("T")
                current += 2
                continue
            add("T")
            current += 1
            continue
        if c == "F":
            current += 2 if at(current + 1) == "F" else 1
            add("F")
            continue
        if c == "G":
            if at(current + 1) == "H":
                if current > 0 and not is_vowel(current - 1):
                    add("K")
                    current += 2
                    continue
                if current == 0:
                    if at(current + 2) == "I":  # ghislane
                        add("J")
                    else:  # ghost
                        add("K")
                    current += 2
                    continue
                # silent GH: Parker's rule (hugh, bough, broughton...)
                if (
                    (current > 1 and string_at(current - 2, 1, "B", "H", "D"))
                    or (current > 2 and string_at(current - 3, 1, "B", "H", "D"))
                    or (current > 3 and string_at(current - 4, 1, "B", "H"))
                ):
                    current += 2
                    continue
                # laugh, mcLaughlin, cough... → F
                if current > 2 and at(current - 1) == "U" and string_at(
                    current - 3, 1, "C", "G", "L", "R", "T"
                ):
                    add("F")
                elif current > 0 and at(current - 1) != "I":
                    add("K")
                current += 2
                continue
            if at(current + 1) == "N":
                if current == 1 and is_vowel(0) and not sg:
                    add("KN", "N")
                elif not string_at(current + 2, 2, "EY") and at(current + 1) != "Y" and not sg:
                    add("N", "KN")
                else:
                    add("KN")
                current += 2
                continue
            if string_at(current + 1, 2, "LI") and not sg:  # tagliaro
                add("KL", "L")
                current += 2
                continue
            # -ges-, -gep-, ... initial
            if current == 0 and (
                at(current + 1) == "Y"
                or string_at(current + 1, 2, "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
            ):
                add("K", "J")
                current += 2
                continue
            if (
                string_at(current + 1, 2, "ER") or at(current + 1) == "Y"
            ) and not string_at(0, 6, "DANGER", "RANGER", "MANGER") and not string_at(
                current - 1, 1, "E", "I"
            ) and not string_at(current - 1, 3, "RGY", "OGY"):
                add("K", "J")
                current += 2
                continue
            # italian "biaggi"
            if string_at(current + 1, 1, "E", "I", "Y") or string_at(
                current - 1, 4, "AGGI", "OGGI"
            ):
                if (
                    string_at(0, 4, "VAN ", "VON ")
                    or string_at(0, 3, "SCH")
                    or string_at(current + 1, 2, "ET")
                ):
                    add("K")
                elif string_at(current + 1, 4, "IER "):
                    add("J")
                else:
                    add("J", "K")
                current += 2
                continue
            add("K")
            current += 2 if at(current + 1) == "G" else 1
            continue
        if c == "H":
            # only keep if first & before vowel, or between two vowels
            if (current == 0 or is_vowel(current - 1)) and is_vowel(current + 1):
                add("H")
                current += 2
            else:
                current += 1
            continue
        if c == "J":
            if string_at(current, 4, "JOSE") or string_at(0, 4, "SAN "):
                # end-of-string counts as the reference's space padding
                if (
                    current == 0 and (current + 4 >= length or at(current + 4) == " ")
                ) or string_at(0, 4, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                current += 1
                continue
            if current == 0 and not string_at(current, 4, "JOSE"):
                add("J", "A")  # Yankelovich/Jankelowicz
            elif is_vowel(current - 1) and not sg and (at(current + 1) == "A" or at(current + 1) == "O"):
                add("J", "H")
            elif current == last:
                add("J", "")
            elif not string_at(current + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z") and not string_at(
                current - 1, 1, "S", "K", "L"
            ):
                add("J")
            current += 2 if at(current + 1) == "J" else 1
            continue
        if c == "K":
            current += 2 if at(current + 1) == "K" else 1
            add("K")
            continue
        if c == "L":
            if at(current + 1) == "L":
                # spanish "cabrillo", "gallegos"
                if (
                    current == length - 3
                    and string_at(current - 1, 4, "ILLO", "ILLA", "ALLE")
                ) or (
                    (string_at(last - 1, 2, "AS", "OS") or string_at(last, 1, "A", "O"))
                    and string_at(current - 1, 4, "ALLE")
                ):
                    add("L", "")
                    current += 2
                    continue
                current += 2
            else:
                current += 1
            add("L")
            continue
        if c == "M":
            if (
                string_at(current - 1, 3, "UMB")
                and (current + 1 == last or string_at(current + 2, 2, "ER"))
            ) or at(current + 1) == "M":
                current += 2  # "dumb", "thumb"
            else:
                current += 1
            add("M")
            continue
        if c == "N":
            current += 2 if at(current + 1) == "N" else 1
            add("N")
            continue
        if c == "\xd1":
            current += 1
            add("N")
            continue
        if c == "P":
            if at(current + 1) == "H":
                add("F")
                current += 2
                continue
            current += 2 if string_at(current + 1, 1, "P", "B") else 1
            add("P")
            continue
        if c == "Q":
            current += 2 if at(current + 1) == "Q" else 1
            add("K")
            continue
        if c == "R":
            # french "rogier" — silent final R
            if (
                current == last
                and not sg
                and string_at(current - 2, 2, "IE")
                and not string_at(current - 4, 2, "ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            current += 2 if at(current + 1) == "R" else 1
            continue
        if c == "S":
            if string_at(current - 1, 3, "ISL", "YSL"):  # island, isle
                current += 1
                continue
            if current == 0 and string_at(current, 5, "SUGAR"):
                add("X", "S")
                current += 1
                continue
            if string_at(current, 2, "SH"):
                if string_at(current + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):  # germanic
                    add("S")
                else:
                    add("X")
                current += 2
                continue
            if string_at(current, 3, "SIO", "SIA") or string_at(current, 4, "SIAN"):
                if not sg:
                    add("S", "X")
                else:
                    add("S")
                current += 3
                continue
            # german & anglicisations: initial S[MNLW] → S/X; SZ → S/X
            if (current == 0 and string_at(current + 1, 1, "M", "N", "L", "W")) or string_at(
                current + 1, 1, "Z"
            ):
                add("S", "X")
                current += 2 if string_at(current + 1, 1, "Z") else 1
                continue
            if string_at(current, 2, "SC"):
                if at(current + 2) == "H":
                    # dutch origin: school, schooner
                    if string_at(current + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if string_at(current + 3, 2, "ER", "EN"):  # schermerhorn
                            add("X", "SK")
                        else:
                            add("SK")
                        current += 3
                        continue
                    if current == 0 and not is_vowel(3) and at(3) != "W":
                        add("X", "S")
                    else:
                        add("X")
                    current += 3
                    continue
                if string_at(current + 2, 1, "I", "E", "Y"):
                    add("S")
                    current += 3
                    continue
                add("SK")
                current += 3
                continue
            if current == last and string_at(current - 2, 2, "AI", "OI"):  # french
                add("", "S")
            else:
                add("S")
            current += 2 if string_at(current + 1, 1, "S", "Z") else 1
            continue
        if c == "T":
            if string_at(current, 4, "TION") or string_at(current, 3, "TIA", "TCH"):
                add("X")
                current += 3
                continue
            if string_at(current, 2, "TH") or string_at(current, 3, "TTH"):
                if string_at(current + 2, 2, "OM", "AM") or string_at(
                    0, 4, "VAN ", "VON "
                ) or string_at(0, 3, "SCH"):  # thomas, thames, germanic
                    add("T")
                else:
                    add("0", "T")
                current += 2
                continue
            current += 2 if string_at(current + 1, 1, "T", "D") else 1
            add("T")
            continue
        if c == "V":
            current += 2 if at(current + 1) == "V" else 1
            add("F")
            continue
        if c == "W":
            if string_at(current, 2, "WR"):  # can only be in the middle here
                add("R")
                current += 2
                continue
            if current == 0 and (is_vowel(current + 1) or string_at(current, 2, "WH")):
                if is_vowel(current + 1):  # Wasserman → A / F
                    add("A", "F")
                else:  # Whitney
                    add("A")
            if (
                (current == last and is_vowel(current - 1))
                or string_at(current - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                or string_at(0, 3, "SCH")
            ):
                add("", "F")  # Arnow → ARN / ARNF
                current += 1
                continue
            if string_at(current, 4, "WICZ", "WITZ"):  # polish
                add("TS", "FX")
                current += 4
                continue
            current += 1
            continue
        if c == "X":
            # french final -aux/-oux silent
            if not (
                current == last
                and (string_at(current - 3, 3, "IAU", "EAU") or string_at(current - 2, 2, "AU", "OU"))
            ):
                add("KS")
            current += 2 if string_at(current + 1, 1, "C", "X") else 1
            continue
        if c == "Z":
            if at(current + 1) == "H":  # chinese pinyin
                add("J")
                current += 2
                continue
            if string_at(current + 1, 2, "ZO", "ZI", "ZA") or (sg and current > 0 and at(current - 1) != "T"):
                add("S", "TS")
            else:
                add("S")
            current += 2 if at(current + 1) == "Z" else 1
            continue
        current += 1

    return "".join(pri)[:max_length], "".join(alt)[:max_length]


def dmetaphone_keys(words) -> list[tuple[str, str]]:
    """Vector form used by the Arrow-batched dictionary pass."""
    return [double_metaphone(w) for w in words]
