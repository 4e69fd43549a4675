"""Data-layout clustering keys: Morton (Z-order) curve interleaving.

Multi-dimensional clustering is how a 100 TB lake prunes scans on TWO
filter columns at once (Delta Lake ``ZORDER BY``, Iceberg sort orders):
interleave the bits of both dimensions into one sort key, write files
range-partitioned on it, and each file's min/max footer then bounds a
*rectangle* in (a, b) space — a filter on either dimension skips most
files. Spark has no built-in z-order; the interleave below is pure
integer SQL (shift/mask under a higher-order ``aggregate`` fold), so it
runs JVM-side inside whole-stage codegen, and the DuckDB twin makes the
key value-hash verifiable.

Usage at scale::

    z = F.expr(morton_z("user_bucket", "value_bucket"))
    df.repartitionByRange(N, z).sortWithinPartitions(z).write.parquet(...)

(tests/test_scale_paths.py asserts the written files' z-ranges are
disjoint — the property min/max pruning needs.)
"""

from __future__ import annotations


def morton_z(a: str, b: str, bits: int = 16) -> str:
    """Spark SQL expression: interleave the low ``bits`` bits of two
    non-negative integer expressions (``a`` even positions, ``b`` odd).

    2×16 bits -> a 32-bit z-value in a bigint; callers bucket wider
    domains first (e.g. ``col % 65536`` or a range-rank) — clustering
    needs locality of the *buckets*, not full key fidelity.
    """
    return (
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, i) -> acc"
        f" + shiftleft(shiftright(cast({a} as bigint), i) & 1, 2 * i)"
        f" + shiftleft(shiftright(cast({b} as bigint), i) & 1, 2 * i + 1))"
    )


def morton_z_duckdb(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_z` for oracle SQL."""
    return (
        f"CAST(list_sum(list_transform(generate_series(0, {bits - 1}), i -> "
        f"((({a} >> i) & 1) << (2 * i)) + ((({b} >> i) & 1) << (2 * i + 1))"
        f")) AS BIGINT)"
    )
