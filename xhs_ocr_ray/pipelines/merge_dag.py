"""The reference's 4-step merge DAG (SURVEY.md §3 E1, db/pipeline.py:8-76),
as a declarative spec over named Datasets.

Steps (reference semantics preserved):
1. related merge  video_top + video_bottom  → video_overview
1b. related merge note_top + note_bottom    → note_overview
2. unrelated merge note_overview + video_overview → data_overview
3. unrelated merge note_traffic + video_traffic   → traffic_analysis
4. related merge  data_overview + traffic_analysis → overview_traffic

A *related* step aborts when any input is absent; an *unrelated* step
tolerates absent inputs (db/data_dms.py:74-81). Each step's output becomes
available to later steps by name.
"""

from __future__ import annotations

from xhs_ocr_ray.stages.merge import MissingTableError, related_merge, unrelated_merge

DEFAULT_RELATED_KEY = ["account_id", "device_ip", "collect_date", "url"]

REFERENCE_DAG: list[dict] = [
    {"kind": "related", "inputs": ["video_top", "video_bottom"],
     "output": "video_overview"},
    {"kind": "related", "inputs": ["note_top", "note_bottom"],
     "output": "note_overview"},
    {"kind": "unrelated", "inputs": ["note_overview", "video_overview"],
     "output": "data_overview"},
    {"kind": "unrelated", "inputs": ["note_traffic", "video_traffic"],
     "output": "traffic_analysis"},
    {"kind": "related", "inputs": ["data_overview", "traffic_analysis"],
     "output": "overview_traffic"},
]


def run_merge_dag(tables: dict, *, dag: list[dict] | None = None,
                  key_cols: list[str] | None = None) -> dict:
    """Execute the merge DAG over named Datasets; returns the updated name →
    Dataset mapping (inputs + every step output)."""
    dag = dag if dag is not None else REFERENCE_DAG
    key_cols = key_cols or DEFAULT_RELATED_KEY
    out = dict(tables)
    for step in dag:
        inputs = [out.get(name) for name in step["inputs"]]
        if step["kind"] == "related":
            out[step["output"]] = related_merge(inputs, key_cols)
        elif step["kind"] == "unrelated":
            present = [t for t in inputs if t is not None]
            if not present:
                raise MissingTableError(
                    f"merge step {step['output']}: no inputs present"
                )
            out[step["output"]] = unrelated_merge(present)
        else:
            raise ValueError(f"unknown merge kind {step['kind']!r}")
    return out
