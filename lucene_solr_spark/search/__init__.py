from .query import (  # noqa: F401
    BooleanQuery,
    MatchAllQuery,
    MatchNoneQuery,
    PayloadScoreQuery,
    PhraseQuery,
    PointRangeQuery,
    Query,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPayloadCheckQuery,
    SpanTermQuery,
    TermQuery,
    parse_query,
    rewrite,
)
from .simpleparser import SimpleQueryParser, parse_simple  # noqa: F401
from .surround import SurroundQueryParser, parse_surround  # noqa: F401
from .xmlparser import CoreParser, parse_xml_query  # noqa: F401
from .executor import IndexSearcher  # noqa: F401
from .multifield import MultiFieldSearcher  # noqa: F401
from .edismax import EDisMaxSearcher  # noqa: F401
