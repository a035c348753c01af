"""PDF payload decode: pure-Python parser + minimal writer (see parser.py)."""

from xhs_ocr_ray.pdf.parser import extract_pdf_blocks
from xhs_ocr_ray.pdf.writer import build_pdf, build_text_pdf, page_content

__all__ = ["extract_pdf_blocks", "build_pdf", "build_text_pdf", "page_content"]
