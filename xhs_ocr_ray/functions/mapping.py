"""Config-driven column mapping (SURVEY.md §2.2 M12/M13).

The reference renames columns before sync (采集日期→采集时间,
db/data_sync.py:80-84) and maps Chinese column names to English via the
config ``[fields]`` section (FIELD_MAPPING, db/data_sync.py:15-19). Here the
mapping is an explicit dict applied with ``Dataset.rename_columns``;
unmapped columns pass through unchanged.
"""

from __future__ import annotations

# Example of the reference's CN→EN field mapping shape (config.ini [fields]).
DEFAULT_FIELD_MAPPING = {
    "作品标题": "title",
    "链接": "url",
    "采集日期": "collect_date",
    "账号ID": "account_id",
    "设备IP": "device_ip",
}


def apply_column_mapping(ds, mapping: dict[str, str]):
    """Rename the columns present in ``mapping`` (others untouched)."""
    present = set(ds.schema().names)
    effective = {k: v for k, v in mapping.items() if k in present}
    if not effective:
        return ds
    return ds.rename_columns(effective)
