"""Deterministic corpus sampling + composition stats.

Training-data curation needs repeatable samples: the same row set on every
run, every engine, any partitioning — no RNG state, no seed plumbing. The
operator keeps a row when the first 4 hex chars of ``md5(id)`` fall below
``rate * 0xffff`` — a pure function of the id, so it pushes down to the
scan as an ordinary filter, composes with stratification (group rates), and
has a byte-identical DuckDB/SQL twin (md5 hex is engine-portable where
hash() functions are not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_threshold_hex(rate: float) -> str:
    """4-hex-digit threshold for a [0,1] sampling rate (floor semantics)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * 0x10000), 0xFFFF), "04x")


def sample_predicate(id_col, rate: float):
    """Boolean column: deterministically keep ~``rate`` of rows by id.
    ``rate >= 1.0`` is the identity (no row dropped) — the 4-hex threshold
    saturates at 'ffff', which would otherwise drop ~1/65536 of rows."""
    if rate >= 1.0:
        sample_threshold_hex(rate)  # still validates rate <= 1.0
        return F.lit(True)
    return F.substring(F.md5(id_col.cast("string")), 1, 4) < F.lit(sample_threshold_hex(rate))


def deterministic_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """~``rate`` deterministic sample, stable across runs/engines/partitions."""
    return df.filter(sample_predicate(F.col(id_col), rate))


def sample_predicate_sql(id_expr: str, rate: float) -> str:
    """DuckDB/ANSI twin of :func:`sample_predicate`."""
    if rate >= 1.0:
        sample_threshold_hex(rate)
        return "TRUE"
    return f"substr(md5(CAST({id_expr} AS VARCHAR)), 1, 4) < '{sample_threshold_hex(rate)}'"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps ~its own
    rate of rows (domain/language mixing — re-weighting a corpus toward a
    target source distribution). Pure function of (id, stratum): pushes to
    the scan as a filter, repeatable on any engine/partitioning.

    Salting note: the md5 is keyed on the id alone, so a row keeps/drops
    CONSISTENTLY across strata definitions — resampling with new rates
    reuses the same underlying uniform draw (coordinated sampling).
    """
    pred = F.lit(False)
    for stratum, rate in sorted(rates.items()):
        pred = pred | ((F.col(strata_col) == stratum) & sample_predicate(F.col(id_col), rate))
    if default_rate > 0:
        # NULL-safe: ~isin() is NULL (not True) for NULL strata, which
        # filter() would silently drop — unknown-language rows must fall
        # into the default bucket
        others = F.col(strata_col).isNull() | ~F.col(strata_col).isin(list(rates))
        pred = pred | (others & sample_predicate(F.col(id_col), default_rate))
    return df.filter(pred)


def _sql_quote(s: str) -> str:
    """Escape a string for use inside a single-quoted SQL literal."""
    return s.replace("'", "''")


def stratified_sample_sql(id_expr: str, strata_expr: str, rates: dict[str, float], default_rate: float = 0.0) -> str:
    """DuckDB twin of :func:`stratified_sample`'s predicate."""
    parts = [
        f"({strata_expr} = '{_sql_quote(s)}' AND {sample_predicate_sql(id_expr, r)})"
        for s, r in sorted(rates.items())
    ]
    if default_rate > 0:
        quoted = ", ".join(f"'{_sql_quote(s)}'" for s in rates)
        parts.append(
            f"(({strata_expr} IS NULL OR {strata_expr} NOT IN ({quoted})) "
            f"AND {sample_predicate_sql(id_expr, default_rate)})"
        )
    return " OR ".join(parts) if parts else "FALSE"
