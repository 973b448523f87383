from .build import build_index, with_segment_id, segment_of  # noqa: F401
