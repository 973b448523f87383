from .build import build_index, with_segment_id, segment_of  # noqa: F401
from .replicate import replicate_index  # noqa: F401
