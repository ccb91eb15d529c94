"""Vectorized JSON property extraction for the events ``props`` column.

The reference's only scalar JSON op is property extraction
(SURVEY.md §2.9); the engine's SQL-oracle dual is
``json_extract(props, '$.k')::BIGINT``. The hot path must not run a
Python json.loads per row (a 1M-row batch pays ~1 s for what an Arrow
regex kernel does in ~30 ms), so the kernel is ``pc.extract_regex`` for
the overwhelmingly common flat ``{"k": <int>}`` shape with a per-row
json.loads fallback ONLY for rows the regex does not match (escaped
keys, nesting, floats) — value-identical to json.loads everywhere, and
the fallback set is empty on well-formed corpora.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["props_int_column"]


def props_int_column(arr: pa.Array | pa.ChunkedArray, key: str = "k",
                     default: int = 0) -> np.ndarray:
    """int64 values of ``key`` per row of a JSON-string column.

    Matches ``json.loads(row).get(key, default)`` exactly for integer
    values on any VALID-JSON corpus: the fast regex is trusted only on
    rows that are provably flat (one ``{``, no escapes, single key
    occurrence, ``{...}``-anchored); nested objects, escaped quotes,
    duplicate keys, non-integer values and nulls all fall back to real
    json parsing row-wise. Malformed non-JSON rows return ``default``
    via the fallback unless they happen to pass every flatness anchor
    while still being unparseable (e.g. a flat object with a trailing
    comma) — out of contract, as for the SQL ``json_extract`` oracle.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # '"k"␣*:␣*(-?digits)' followed by , } or whitespace — not a longer
    # number (json ints cannot run into another token without one)
    pat = rf'"{re.escape(key)}"\s*:\s*(?P<v>-?\d+)\s*[,}}\s]'
    m = pc.extract_regex(arr, pat)
    # null flags live on the STRUCT, not its child field
    ok = m.is_valid().to_numpy(zero_copy_only=False)
    # The regex is positionally blind, so trust it only where the row is
    # provably flat: exactly one '{' (no nested objects), no backslash
    # (no escaped quotes that could smuggle '"k":' inside a string
    # value), and a single '"key"' occurrence (duplicate keys take
    # json.loads's last-wins). Everything else goes through real json.
    trimmed = pc.utf8_trim_whitespace(arr)
    flat = pc.fill_null(
        pc.and_(pc.and_(pc.and_(pc.and_(
            pc.equal(pc.count_substring(arr, "{"), 1),
            pc.equal(pc.count_substring(arr, "\\"), 0)),
            pc.equal(pc.count_substring(arr, f'"{key}"'), 1)),
            pc.starts_with(trimmed, "{")),
            pc.ends_with(trimmed, "}")),
        False).to_numpy(zero_copy_only=False)
    ok &= flat
    out = np.full(len(arr), default, dtype=np.int64)
    if ok.any():
        out[ok] = (m.field("v").filter(pa.array(ok))
                   .cast(pa.int64()).to_numpy())
    miss = np.flatnonzero(~ok)
    if len(miss):
        raw = arr.take(pa.array(miss)).to_pylist()
        for j, s in zip(miss, raw):
            try:
                # valid non-object JSON ('null', '5', '"x"', '[1]') has no
                # .get — such rows take the default like any other miss
                v = json.loads(s).get(key, default)
            except (TypeError, ValueError, AttributeError):
                v = default
            # int(float) truncates — the same cast the previous
            # np.array(..., dtype=int64) engine path applied
            out[j] = (int(v) if isinstance(v, (int, float, np.integer))
                      and not isinstance(v, bool) else default)
    return out
