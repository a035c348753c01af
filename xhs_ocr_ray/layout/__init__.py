"""Layout analysis over text blocks (the tbpu/ analog, built fresh).

A *text block* is a plain dict ``{"box": [[x,y]*4], "score": float,
"text": str}``; layout stages add ``"normalized_bbox": (x0,y0,x1,y1)`` and
``"end": str`` (the trailing separator that encodes paragraph structure).
Document text is ``"".join(tb["text"] + tb["end"] for tb in blocks)``.

These are pure per-document functions — they run inside ``map_batches`` UDFs
and have no Ray dependency. Semantics follow the behavior described in
SURVEY.md §2.4 (reference: /root/reference/tbpu/), re-implemented from the
published algorithm descriptions.
"""

from xhs_ocr_ray.layout.parsers import PARSER_REGISTRY, get_parser
from xhs_ocr_ray.layout.separators import word_separator

__all__ = ["PARSER_REGISTRY", "get_parser", "word_separator"]
