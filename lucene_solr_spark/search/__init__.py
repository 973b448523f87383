from .query import (  # noqa: F401
    BooleanQuery,
    MatchAllQuery,
    MatchNoneQuery,
    PhraseQuery,
    Query,
    TermQuery,
    parse_query,
    rewrite,
)
from .executor import IndexSearcher  # noqa: F401
