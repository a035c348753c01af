"""HTML DOM parsing and main-content extraction (pure Python, stdlib only).

The graft analog of the reference's mask→OCR→sort loop: parse HTML bytes into
a lightweight DOM, score nodes by text density / link density, prune
boilerplate (nav/header/footer/ads), pick the main-content container, and
render deterministic extracted text with CJK-aware separators.
"""

from xhs_ocr_ray.html.extract import extract_main_text
from xhs_ocr_ray.html.parser import parse_html

__all__ = ["parse_html", "extract_main_text"]
