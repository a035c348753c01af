"""URL canonicalization for web-crawl dedup keys.

The flagship's first-wins dedup keys on raw ``url`` (reference analog:
INSERT OR IGNORE on the page url, db/__init__.py:97); real crawls need the
key canonicalized first or trivially-distinct spellings of one page
(``HTTP://Host``, ``:80``, ``utm_*`` junk, fragments, param order) defeat
the dedup. Rules here are the common-crawl staples, each chosen to be
exactly replicable in DuckDB SQL (same RE2-class regexes, same codepoint
string sort) so the oracle is hash-exact:

1. drop the ``#fragment``;
2. lowercase scheme and host;
3. strip the scheme's default port (``http…:80``, ``https…:443``);
4. drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``) and
   empty params, SORT the survivors (codepoint order);
5. an empty path becomes ``/``.

Unparseable strings (no ``scheme://host``) pass through unchanged after
fragment-stripping — canonicalization must never lose a row.
"""

from __future__ import annotations

import re

_URL_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?]*)([^?]*)(?:\?(.*))?$")
_TRACKING_RE = re.compile(r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)")


def canonical_url(url: str | None) -> str:
    """Canonical form of one URL (see module docstring for the rules)."""
    u = (url or "").split("#", 1)[0]
    m = _URL_RE.match(u)
    if not m:
        return u
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    path = m.group(3) or "/"
    query = m.group(4) or ""
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    params = sorted(
        p for p in query.split("&") if p and not _TRACKING_RE.match(p))
    out = f"{scheme}://{host}{path}"
    if params:
        out += "?" + "&".join(params)
    return out


def canonicalize_url_batch(batch, *, col: str = "url",
                           out_col: str = "url_canon"):
    """Append the canonical form of ``col`` — per-batch map stage (string
    parse work, same cost profile as the extractor's per-doc routing)."""
    import pyarrow as pa

    vals = batch.column(col).to_pylist()
    return batch.append_column(
        out_col, pa.array([canonical_url(v) for v in vals], pa.string()))
