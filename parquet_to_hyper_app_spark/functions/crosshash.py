"""Cross-engine deterministic hashing primitives.

The driver's correctness gate value-hashes Spark results against DuckDB
oracles, so any hash that influences an output must be computable
bit-identically by BOTH engines (and by plain Python for tests).
xxhash64 is Spark-private; md5 is everywhere. The shared primitive is
the first 15 hex digits of md5 read as a positive 60-bit int64:

- Spark :  CAST(conv(substr(md5(c), 1, 15), 16, 10) AS BIGINT)
- DuckDB:  CAST(('0x' || substr(md5(c), 1, 15)) AS BIGINT)
- Python:  int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

All three agree on every string (unit-tested incl. unicode/empty). The
seeded families built on top (MinHash XOR constants, Rademacher ±1
hyperplane entries) use only int64 XOR/shift/compare — no 64-bit
multiplication, whose overflow semantics differ across engines (Java
wraps, DuckDB raises).
"""

from __future__ import annotations

import hashlib

#: Spark SQL / DuckDB SQL spellings of the shared 60-bit hash; format
#: with col=<expression producing a string>
HASH60_SPARK = "CAST(conv(substr(md5({col}), 1, 15), 16, 10) AS BIGINT)"
HASH60_DUCK = "CAST(('0x' || substr(md5({col}), 1, 15)) AS BIGINT)"

#: Cross-engine whitespace contract. Three regex engines tokenize text
#: in this repo — Java (Spark split/regexp_*/rlike), RE2 (DuckDB
#: oracles), and Python re (pandas UDFs) — and their `\s` classes
#: disagree: Java \s = [ \t\n\x0B\f\r]; RE2 \s = [ \t\n\f\r] (no
#: vertical tab); Python \s additionally matches Unicode whitespace
#: (U+00A0, U+2028, ...). This explicit ASCII class is the one spelling
#: all three read identically (the escapes \t \n \r \f \x0B parse the
#: same in every engine), so tokenizers/normalizers use WS / NON_WS
#: instead of \s / \S. Unit-pinned three ways in
#: tests/test_dirty_semantics.py::test_ws_class_agrees_across_engines.
WS_CHARS = r" \t\n\r\f\x0B"
WS = f"[{WS_CHARS}]"
NON_WS = f"[^{WS_CHARS}]"


def hash60_const(s: str) -> int:
    """Python twin of the cross-engine 60-bit md5 hash."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def rademacher_entry(key: str) -> float:
    """±1.0 by bit 0 of the shared hash — the plane-entry rule the
    DuckDB oracles re-evaluate with their own md5."""
    return 1.0 if hash60_const(key) & 1 else -1.0


def rel_margin(row_scale):
    """Magnitude-RELATIVE knife-edge margin for BLAS-vs-sequential-fold
    comparisons: blocked float summation differs from the oracle's
    left-to-right fold by ~dim·eps·scale (≈1.4e-14·scale for dim≤64),
    so any fixed absolute epsilon under-triggers once values grow —
    1e8-scale embedding entries put the error near 1e4 absolute. The
    margin 1e-9·max(1, scale) dominates that error at every magnitude
    while staying far below real value gaps. Shared by the Lloyd
    argmin (scale = row max distance) and the LSH sign dots (scale =
    Σ|x|); accepts a scalar or a numpy array.
    """
    import numpy as np

    return 1e-9 * np.maximum(1.0, row_scale)
