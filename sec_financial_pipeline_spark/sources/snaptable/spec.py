"""Partition-spec parsing, hidden-partitioning transforms, temporal probes and bloom predicates (pure helpers, no manifest I/O).

Split from the former single-module snaptable.py (VERDICT r10 item 3);
see the package __init__ for the protocol overview.
"""

from __future__ import annotations

import json
import re as _re
import threading
import time
import uuid
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

from sec_financial_pipeline_spark.sources.sink import _hadoop_fs


def _pkg():
    """The snaptable package itself — tunables and the manifest-part
    cache live on the PACKAGE namespace so tests can monkeypatch
    ``snaptable._SPLIT_THRESHOLD`` etc. and every submodule sees the
    patched value at call time."""
    import sec_financial_pipeline_spark.sources.snaptable as p
    return p


#: Iceberg-style HIDDEN-PARTITIONING transforms. A partition-spec entry
#: is either a plain column (identity) or a transform over one:
#: ``bucket(N, col)`` (md5-family hash mod N — the repo's engine-
#: independent hash, mirrored bit-for-bit in Python for probe-time
#: pruning), ``truncate(W, col)`` (strings: prefix; integers: floor to
#: a multiple of W), ``days(col)`` / ``months(col)`` (calendar dirs
#: from a date/timestamp). The data files keep the SOURCE column —
#: only the directory layout is derived — so queries filter on the raw
#: column and the engine prunes the transformed dirs without the user
#: ever knowing the layout (the Iceberg pitch: partitioning without
#: partition-column discipline).
_X_BUCKET_TRUNC = _re.compile(
    r"^(bucket|truncate)\(\s*(\d+)\s*,\s*(\w+)\s*\)$"
)

_X_TEMPORAL = _re.compile(r"^(days|months)\(\s*(\w+)\s*\)$")

#: derived-dir-name patterns, keyed for probe-time recovery
_X_DERIVED = _re.compile(r"^(?P<src>\w+)_(?:bucket|trunc)_(?P<n>\d+)$")



def _parse_spec_entry(s: str) -> tuple:
    """``spec string -> (kind, src_col, param, derived_dir_name)``;
    plain columns parse as ``("identity", col, None, col)``."""
    s = s.strip()
    m = _X_BUCKET_TRUNC.match(s)
    if m:
        kind, param, src = m.group(1), int(m.group(2)), m.group(3)
        if param <= 0:
            raise ValueError(f"snaptable: {kind} width must be > 0 in {s!r}")
        tag = "bucket" if kind == "bucket" else "trunc"
        return kind, src, param, f"{src}_{tag}_{param}"
    m = _X_TEMPORAL.match(s)
    if m:
        kind, src = m.group(1), m.group(2)
        return kind, src, None, f"{src}_{'day' if kind == 'days' else 'month'}"
    if not _re.match(r"^\w+$", s):
        raise ValueError(
            f"snaptable: unparseable partition-spec entry {s!r} (expected "
            f"a column, bucket(N, col), truncate(W, col), days(col) or "
            f"months(col))"
        )
    return "identity", s, None, s



def _transform_expr(kind: str, src: str, param, src_type: str):
    """The Spark column computing a transform's derived dir value."""
    from pyspark.sql import functions as F

    c = F.col(src)
    if kind == "bucket":
        return F.pmod(
            F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
            .cast("long"),
            F.lit(param),
        )
    if kind == "truncate":
        if src_type == "string":
            return F.substring(c, 1, param)
        return c - F.pmod(c, F.lit(param))
    if kind == "days":
        return F.date_format(c, "yyyy-MM-dd")
    return F.date_format(c, "yyyy-MM")  # months



def _transform_py(kind: str, param, v):
    """Python mirror of :func:`_transform_expr` — identical output for
    identical input, so manifest pruning can compute the dir value a
    probe WOULD have landed in. None maps to None (the NULL dir)."""
    import hashlib as _hl

    if v is None:
        return None
    if kind == "bucket":
        return int(_hl.md5(str(v).encode()).hexdigest()[:8], 16) % param
    if kind == "truncate":
        if isinstance(v, str):
            return v[:param]
        return v - (v % param)  # Python % is non-negative for param > 0
    s = _temporal_iso(v)
    if s is None:
        return None
    return s[:10] if kind == "days" else s[:7]



def _session_tzinfo():
    """tzinfo of the active session's ``spark.sql.session.timeZone``
    (None when no session is active or the zone is unknown)."""
    try:
        from zoneinfo import ZoneInfo

        s = SparkSession.getActiveSession()
        if s is None:
            return None
        return ZoneInfo(s.conf.get("spark.sql.session.timeZone"))
    except Exception:
        return None



def _temporal_iso(v) -> str | None:
    """ISO rendering of a date/datetime/ISO-string probe value (None if
    the value can't be read temporally — pruning then just keeps).
    Writers render timestamps via ``date_format`` in the SESSION
    timezone, so a tz-AWARE probe is converted to that zone before
    rendering (ADVICE r9: dropping the offset could compute a
    different calendar day near midnight and wrongly prune); with no
    active session to ask, tz-aware probes skip temporal pruning
    entirely. Naive datetimes are taken as session-local, matching the
    writer's rendering of what the user stored."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            tz = _session_tzinfo()
            if tz is None:
                return None  # can't place it on the writer's calendar
            v = v.astimezone(tz).replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, str) and _re.match(r"^\d{4}-\d{2}", v):
        return v
    return None



def _derived_probe(part_key: str, probe_col: str) -> tuple | None:
    """Recover (kind, param) when ``part_key`` is a derived dir of
    ``probe_col`` — the stateless inverse of the spec's derived names
    (works for entries written under ANY retained spec)."""
    if part_key == f"{probe_col}_day":
        return ("days", None)
    if part_key == f"{probe_col}_month":
        return ("months", None)
    m = _X_DERIVED.match(part_key)
    if m and m.group("src") == probe_col:
        kind = "bucket" if "_bucket_" in part_key else "truncate"
        return (kind, int(m.group("n")))
    return None



_BUCKETABLE = {"byte", "short", "integer", "long", "string", "date"}

_TRUNCATABLE = {"byte", "short", "integer", "long", "string"}

_TEMPORAL_T = {"date", "timestamp", "timestamp_ntz"}



def _validate_partition_spec(schema, partition_cols) -> None:
    """Shared spec validation for create/set_partition_spec: source
    columns exist, transform types make sense, derived dir names can't
    shadow real columns (a table column named ``k_bucket_16`` beside
    ``bucket(16, k)`` would make reads ambiguous)."""
    names = {f.name: f.dataType.typeName() for f in schema.fields}
    derived = set()
    for s in partition_cols:
        kind, src, param, dname = _parse_spec_entry(str(s))
        if src not in names:
            raise ValueError(
                f"snaptable: partition-spec column '{src}' is not a "
                f"table column (have {sorted(names)})"
            )
        t = names[src]
        if kind == "bucket" and t not in _BUCKETABLE:
            raise ValueError(
                f"snaptable: bucket() needs an int/string/date column, "
                f"got {src}: {t} (float renderings differ across engines)"
            )
        if kind == "truncate" and t not in _TRUNCATABLE:
            raise ValueError(
                f"snaptable: truncate() needs an int/string column, "
                f"got {src}: {t}"
            )
        if kind in ("days", "months") and t not in _TEMPORAL_T:
            raise ValueError(
                f"snaptable: {kind}() needs a date/timestamp column, "
                f"got {src}: {t}"
            )
        if kind != "identity" and (dname in names or dname in derived):
            raise ValueError(
                f"snaptable: derived partition dir '{dname}' collides "
                f"with an existing column or another spec entry"
            )
        derived.add(dname)



def _unquote_hive(v: str) -> str:
    """Invert Spark's Hive path escaping (%XX per escaped char).
    urllib's unquote decodes the same %-hex scheme; errors='strict'
    is not needed — a stray '%' not followed by hex passes through
    unchanged, matching how it would have been written ('%25')."""
    from urllib.parse import unquote

    return unquote(v)



def _spec_exprs(df: DataFrame, partition_cols) -> list:
    """Physical partitioning expressions for a spec (identity columns
    as-is, transforms derived) — what a write clusters by and what
    compact repartitions on."""
    from pyspark.sql import functions as F

    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    out = []
    for s in partition_cols:
        kind, src, param, _d = _parse_spec_entry(str(s))
        out.append(
            F.col(src) if kind == "identity"
            else _transform_expr(kind, src, param, types[src])
        )
    return out



_TS_QUOTED = _re.compile(r"('(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"|`[^`]*`)")



def _bloom_positions(value, bits: int, k: int) -> list[int]:
    """k bit positions for a value — md5-salted, identical in any
    engine/language (the repo's standard hash family)."""
    import hashlib as _hl

    return [
        int(_hl.md5(f"{i}#{value}".encode()).hexdigest()[:8], 16) % bits
        for i in range(k)
    ]



def _bloom_rules_out(e: dict, col: str, value) -> bool:
    """True iff this file's bloom PROVES the value is absent. The probe
    value is normalized to the indexed column's rendering (int columns
    hash str(int(v)) — so a float probe like 4242.0 against a long
    column matches the indexed '4242'; a non-integral float probe can
    never match an int column and rules every bloomed file out)."""
    meta = e.get("bloom", {}).get(col)
    if not meta:
        return False  # no bloom: always keep
    if meta.get("type") == "int":
        try:
            iv = int(value)
        except (TypeError, ValueError):
            return True  # non-numeric probe of an int column: absent
        if iv != value and not isinstance(value, str):
            return True  # non-integral float probe: cannot exist
        value = iv
    else:
        value = str(value)
    mask = bytes.fromhex(meta["mask"])
    for p in _bloom_positions(value, meta["bits"], meta["k"]):
        if not (mask[p // 8] >> (p % 8)) & 1:
            return True
    return False
