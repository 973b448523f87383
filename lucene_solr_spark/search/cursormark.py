"""Solr cursorMark deep-paging tokens.

Reference: ``solr/core/src/java/org/apache/solr/search/CursorMark.java``
(``getSerializedTotem`` / ``parseSerializedTotem``: the sort values of the
last document returned, serialized with JavaBin and base64-encoded into an
opaque URL-safe token; ``CursorMarkParams.CURSOR_MARK_START = "*"``) and
``CursorPagingTest``'s contract: an unchanged totem re-returns the same
page, the totem is opaque to clients, and a tampered totem fails loudly.

Here the sort state is :meth:`IndexSearcher.search_after`'s cursor
``(score, segment_id, doc_id)``; the totem serializes it with a short
checksum so truncation/tampering is detected on parse (the reference gets
that from JavaBin's framing). ``*`` is the start totem, exactly as Solr.
"""

from __future__ import annotations

import base64
import hashlib
import struct

CURSOR_MARK_START = "*"
_MAGIC = b"LSS1"


def next_cursor_mark(score: float, segment_id: int, doc_id: int) -> str:
    """Serialize the last hit's sort values into an opaque, URL-safe totem
    (``CursorMark.getSerializedTotem`` role)."""
    payload = _MAGIC + struct.pack("<dqq", float(score), int(segment_id), int(doc_id))
    payload += hashlib.md5(payload).digest()[:4]
    return base64.urlsafe_b64encode(payload).decode("ascii")


def parse_cursor_mark(totem: str) -> tuple[float, int, int] | None:
    """Decode a totem back to the ``search_after`` cursor; ``"*"`` → None
    (first page). Raises ``ValueError`` on a tampered or truncated totem
    (``parseSerializedTotem``'s loud-failure contract)."""
    if totem == CURSOR_MARK_START:
        return None
    try:
        raw = base64.urlsafe_b64decode(totem.encode("ascii"))
    except Exception as exc:
        raise ValueError(f"invalid cursorMark: {totem!r}") from exc
    if len(raw) != len(_MAGIC) + 24 + 4 or raw[: len(_MAGIC)] != _MAGIC:
        raise ValueError(f"invalid cursorMark: {totem!r}")
    body, check = raw[:-4], raw[-4:]
    if hashlib.md5(body).digest()[:4] != check:
        raise ValueError(f"corrupt cursorMark: {totem!r}")
    score, seg, doc = struct.unpack("<dqq", body[len(_MAGIC):])
    return (score, int(seg), int(doc))


def cursor_page(searcher, query, cursor_mark: str = CURSOR_MARK_START, k: int = 10):
    """One page of results plus the next totem (the Solr request loop:
    send cursorMark, read nextCursorMark, repeat until they're equal).

    Returns ``(rows, next_cursor_mark)`` where rows are the collected hit
    rows (score desc, segment asc, doc asc). When the page is empty the
    incoming totem is returned unchanged — Solr's end-of-results signal."""
    after = parse_cursor_mark(cursor_mark)
    if after is None:
        hits = searcher.search(query, k=k)
    else:
        hits = searcher.search_after(query, after, k=k)
    rows = hits.orderBy("rank").collect()
    if not rows:
        return rows, cursor_mark
    last = rows[-1]
    return rows, next_cursor_mark(float(last.score), int(last.segment_id), int(last.doc_id))
