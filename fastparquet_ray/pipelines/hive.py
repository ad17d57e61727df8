"""Hive ``key=value`` partition-path support for the engine's own
shard format (SURVEY.md M8 — the reference parses partition dirs into
typed columns and filters on them: val_to_num
/root/reference/fastparquet/util.py:59-95, paths_to_cats
api.py:700-758, filter_out_cats api.py:1002-1039).

Write side: encode_pipeline(hive_cols=[...]) splits each block by the
partition columns, DROPS them from the encoded payload, and stores the
value in the shard's directory path — the reference's partition_on
layout (writer.py:1066-1105). Read side: decode_dataset discovers the
``key=value`` components, parses them back to typed columns, and
attaches them as constant columns per shard; filters on partition
columns prune whole shards from the path alone.
"""

from __future__ import annotations

import urllib.parse

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"  # hive's own null sentinel


def encode_component(col: str, value) -> str:
    """One ``col=value`` path component; value URL-quoted so '/', '='
    and friends can't corrupt the path."""
    if value is None:
        return f"{col}={HIVE_NULL}"
    return f"{col}={urllib.parse.quote(str(value), safe='')}"


def val_to_typed(raw: str):
    """Parse a partition-path value string to the narrowest sensible
    type: None / bool / int / float / ISO timestamp / string
    (reference val_to_num semantics, util.py:59-95 — int before float
    before timestamp, leaving non-parsable strings untouched)."""
    s = urllib.parse.unquote(raw)
    if s == HIVE_NULL:
        return None
    if s in ("true", "True", "TRUE"):
        return True
    if s in ("false", "False", "FALSE"):
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        # reject inf/nan spellings the reference also leaves as strings
        f = float(s)
        if s.lower() not in ("inf", "-inf", "nan", "infinity", "-infinity"):
            return f
    except ValueError:
        pass
    if len(s) >= 8 and s[:4].isdigit():
        import pandas as pd

        try:
            return pd.Timestamp(s)
        except ValueError:
            pass
    return s


def parse_hive_parts(path: str) -> dict[str, object]:
    """``key=value`` directory components of a shard path, parsed to
    typed values; empty dict for a flat layout."""
    out: dict[str, object] = {}
    for comp in path.split("/")[:-1]:  # exclude the filename
        if "=" in comp and not comp.startswith("."):
            key, _, raw = comp.partition("=")
            if key:
                out[key] = val_to_typed(raw)
    return out


def attach_hive_columns(table, parts: dict[str, object],
                        columns: list[str] | None = None):
    """Append constant partition columns to a decoded batch (only those
    requested when a projection is given)."""
    import pyarrow as pa

    for col, val in parts.items():
        if columns is not None and col not in columns:
            continue
        if col in table.column_names:
            continue  # stored column wins over the path
        table = table.append_column(
            col, pa.array([val] * table.num_rows)
        )
    return table
