"""As-of (point-in-time) join — match each probe row to the latest
reference row at-or-before its timestamp, per key.

The reference engine's closest analog is the last-known-good lookup of
``IssuesData`` against the newest processed diff (``Program.cs:75-117``
keeps exactly one "current state as of the latest minutely diff" per
entity); the generalized operator is what a training-data pipeline
needs to stamp every example with the most recent upstream state
(model snapshot, label version, quote before a trade).

Spark has no ASOF JOIN, and the naive formulation
(``p JOIN r ON p.k = r.k AND r.t <= p.t`` + max-per-probe) explodes to
O(|p|·|r|/keys) intermediate rows. The distributed-standard rewrite
used here is **union + ordered window**:

1. tag probes (``_is_probe=1``) and refs (0) and UNION them — column-
   aligned, no join at all;
2. one shuffle on ``key``, one sort on ``(t, tiebreak)`` per key;
3. ``last(ref_payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` carries the most
   recent reference values forward onto every probe row;
4. filter back to probes.

Cost = exactly ONE shuffle of |p|+|r| rows (a sort-merge join would
shuffle the same volume and still need the per-probe max). Everything
is native Column expressions — whole-stage codegen, no Python.

Tie semantics are explicit: ``strict=False`` (default, matches DuckDB
``ASOF JOIN ... ON p.t >= r.t``) sorts refs BEFORE probes at equal
``t`` so an equal-time ref is visible; ``strict=True`` (``>``) sorts
probes first so it is not.

Scale note (100 TB): the single shuffle partitions by ``key`` only —
a hot key serializes its window on one task and AQE cannot split a
window the way it splits a skewed join. For keys with bounded row
counts (users, instruments) that is the right trade; for pathological
keys, pre-bucket by ``(key, time_range)`` and run per-bucket with
range-boundary ref duplication (not implemented here — callers at that
scale compose it from this primitive per time slice).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "_is_probe"


def asof_join(
    probes: DataFrame,
    refs: DataFrame,
    key: str,
    t: str,
    payload: Sequence[str],
    *,
    strict: bool = False,
    prefix: str = "ref_",
) -> DataFrame:
    """Left as-of join: every probe row + the payload of the latest ref
    row with ``ref.t <= probe.t`` (``<`` when ``strict``) and equal
    ``key``; nulls when no such ref exists.

    ``probes``/``refs`` need ``key`` and ``t`` columns (``t`` orderable;
    use an integer epoch for cross-engine determinism). ``payload``
    names ref columns carried onto the match, emitted as
    ``{prefix}{name}``; ``{prefix}{t}`` (the matched ref time) is always
    emitted. Probe columns pass through unchanged.
    """
    dup = [c for c in payload if f"{prefix}{c}" in probes.columns]
    if dup:
        raise ValueError(f"probe columns collide with prefixed payload: {dup}")

    ref_cols = [F.col(c).alias(f"{prefix}{c}") for c in (*payload, t)
                if f"{prefix}{c}" != f"{prefix}{t}"] + [
        F.col(t).alias(f"{prefix}{t}")]
    probe_cols = [c for c in probes.columns]

    tagged_refs = refs.select(
        F.col(key).alias(key), F.col(t).alias(t), *ref_cols,
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c)
          for c in probe_cols if c not in (key, t)],
        F.lit(0).alias(_TAG),
    )
    tagged_probes = probes.select(
        key, t,
        *[F.lit(None).cast(tagged_refs.schema[f"{prefix}{c}"].dataType)
          .alias(f"{prefix}{c}") for c in (*payload, t)],
        *[c for c in probe_cols if c not in (key, t)],
        F.lit(1).alias(_TAG),
    )
    # strict: probes sort before refs at equal t → an equal-t ref is
    # outside the frame; non-strict: refs first → visible.
    tie = F.col(_TAG).desc() if strict else F.col(_TAG).asc()
    w = (Window.partitionBy(key).orderBy(F.col(t).asc(), tie)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    carried = tagged_refs.unionByName(tagged_probes)
    out_payload = [F.last(f"{prefix}{c}", ignorenulls=True).over(w)
                   .alias(f"{prefix}{c}") for c in (*payload, t)
                   if f"{prefix}{c}" != f"{prefix}{t}"]
    out_payload.append(
        F.last(f"{prefix}{t}", ignorenulls=True).over(w).alias(f"{prefix}{t}"))
    return (
        carried.select(*probe_cols, *out_payload, _TAG)
        .where(F.col(_TAG) == 1)
        .drop(_TAG)
    )


def asof_join_sql(
    probes_sql: str,
    refs_sql: str,
    key: str,
    t: str,
    payload: Sequence[str],
    *,
    strict: bool = False,
    prefix: str = "ref_",
    probe_select: str = "p.*",
) -> str:
    """DuckDB twin: native ``ASOF LEFT JOIN`` (independent engine path —
    DuckDB plans a partitioned merge, not our union+window)."""
    op = ">" if strict else ">="
    pay = ", ".join(
        [f"r.{c} AS {prefix}{c}" for c in payload] + [f"r.{t} AS {prefix}{t}"])
    return (
        f"SELECT {probe_select}, {pay} FROM ({probes_sql}) p "
        f"ASOF LEFT JOIN ({refs_sql}) r "
        f"ON p.{key} = r.{key} AND p.{t} {op} r.{t}"
    )
