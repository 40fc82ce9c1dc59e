"""CSV/TSV payload mining — from scratch (RFC 4180 + the wild forms).

Crawls carry enormous numbers of .csv/.tsv data files; tabular text
is a real training-data class (table-to-text tasks) and the census
(rows/cols/delimiter/header) is what a curation pipeline keys on.

- dialect: comma / tab / semicolon / pipe, sniffed by field-count
  consistency over the first records (a candidate wins only if it
  yields the same column count > 1 on every sampled record)
- RFC 4180 quoting: quoted fields with "" escapes, embedded
  delimiters and newlines inside quotes, CRLF and bare-LF records
- header heuristic: the first record is a header when none of its
  fields parse as numbers but some field in the following records
  does (the DuckDB/pandas rule of thumb)
- text reduction: cells joined with tab, records with newline — the
  kernel/xlsx.py grid rule — so tabular payloads ride the flagship
  extraction family

The sniff is deliberately strict (>= 2 columns, >= 2 records,
consistent counts, no NULs) because free text trivially looks like a
one-column CSV. The independent oracle is the STDLIB csv module
re-read in fixtures._csv_expected. Tolerant-open posture: CsvError
is data, never a task failure.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

_DELIMS = (b",", b"\t", b";", b"|")
_MAX_BYTES = 256 << 20
_MAX_RECORDS = 10_000_000
_SNIFF_RECORDS = 8
_NUM = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


class CsvError(Exception):
    pass


def _parse(data: str, delim: str, limit: Optional[int] = None
           ) -> List[List[str]]:
    """RFC 4180 state machine over decoded text."""
    records: List[List[str]] = []
    field: List[str] = []
    row: List[str] = []
    in_q = False
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if in_q:
            if c == '"':
                if data[i + 1:i + 2] == '"':
                    field.append('"')
                    i += 2
                    continue
                in_q = False
            else:
                field.append(c)
            i += 1
            continue
        if c == '"' and not field:
            in_q = True
        elif c == delim:
            row.append("".join(field))
            field = []
        elif c == "\n" or c == "\r":
            if c == "\r" and data[i + 1:i + 2] == "\n":
                i += 1
            row.append("".join(field))
            field = []
            records.append(row)
            row = []
            if limit is not None and len(records) >= limit:
                return records
            if len(records) >= _MAX_RECORDS:
                break
        else:
            field.append(c)
        i += 1
    if field or row:
        row.append("".join(field))
        records.append(row)
    return records


def sniff_delimiter(raw: bytes) -> Optional[str]:
    """The candidate that yields a CONSISTENT column count > 1 over
    the first records; ties break in _DELIMS order. None when no
    candidate qualifies (then the payload is not a table)."""
    if b"\x00" in raw[:4096]:
        return None
    text = raw[:65536].decode("utf-8", "replace")
    for d in _DELIMS:
        ds = d.decode()
        recs = _parse(text, ds, limit=_SNIFF_RECORDS + 1)
        # the final record of the window may be a truncation artifact
        if len(recs) > _SNIFF_RECORDS:
            recs = recs[:_SNIFF_RECORDS]
        if len(recs) < 2:
            continue
        counts = {len(r) for r in recs}
        if len(counts) == 1 and counts.pop() > 1:
            return ds
    return None


def looks_like_csv(raw: bytes) -> bool:
    return sniff_delimiter(raw) is not None


def parse_csv(raw: bytes) -> dict:
    """-> {text, delimiter, n_records, n_cols, has_header}."""
    if len(raw) > _MAX_BYTES:
        raise CsvError("csv payload over cap")
    delim = sniff_delimiter(raw)
    if delim is None:
        raise CsvError("not a delimited table")
    records = _parse(raw.decode("utf-8", "replace"), delim)
    # drop a trailing fully-empty record (trailing newline artifact)
    if records and records[-1] == [""]:
        records.pop()
    if not records:
        raise CsvError("empty table")
    n_cols = len(records[0])
    first_numeric = any(_NUM.match(f) for f in records[0])
    later_numeric = any(_NUM.match(f) for r in records[1:_SNIFF_RECORDS]
                        for f in r)
    has_header = (not first_numeric) and later_numeric
    return {
        "text": "\n".join("\t".join(r) for r in records),
        "delimiter": delim,
        "n_records": len(records),
        "n_cols": n_cols,
        "has_header": has_header,
    }
