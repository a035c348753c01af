"""Regenerate goldens/{key}.txt from the current extractor.

Run ONLY when extraction semantics intentionally change; eyeball the diff —
these bytes are the correctness contract (FIXTURES.md §1).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xhs_ocr_ray.engine import ExtractorEngine
from xhs_ocr_ray.sources.golden import GOLDEN_PROFILES, golden_corpus, golden_key

out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")
os.makedirs(out_dir, exist_ok=True)
eng = ExtractorEngine(GOLDEN_PROFILES)
for row in golden_corpus():
    key = golden_key(row["url"])
    res = eng.extract_row(row["url"], row["html"])
    with open(os.path.join(out_dir, key + ".txt"), "wb") as f:
        f.write((res.text or "").encode("utf-8"))
    meta = f"{res.status}\t{res.profile_id}\t{res.fields_json or ''}\n"
    with open(os.path.join(out_dir, key + ".meta"), "w") as f:
        f.write(meta)
    print(key, "->", res.status)
