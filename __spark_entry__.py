"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`azure_batch_map_reduce_spark.registry` — every engine
operator registers itself there with a PySpark builder and (when
SQL-expressible) a DuckDB oracle; this module just exposes the registry in
the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from azure_batch_map_reduce_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Verification ordering. The driver samples ~50 queries per round,
# taking the HEAD of queries() (confirmed by r4..r7 samples each being
# exactly the first 50 names). Rounds 4-7 maintained that head as a
# hand-rotated static list, and the rotation trap re-armed three times
# — the head kept being the rows the previous driver run had just
# stamped. From round 8 the order is COMPUTED from the committed
# CORRECTNESS_r*.json artifacts (steady-state policy, r7 verdict task
# 5): never-sampled queries first in q-order, then ascending
# last-verified round (stalest driver rows refresh soonest against
# code drift), ties in q-order. Each driver round commits a new
# CORRECTNESS file, so the order self-rotates with zero manual edits.


def _row_verified(row) -> bool:
    """A CORRECTNESS row counts as a successful verification iff the
    oracle check was green (``hash_match`` True, no error) or the
    documented rows-only check succeeded (``err == 'no_oracle'`` with a
    recorded row count). Failed rows — ``hash_match`` False or a real
    error — do NOT stamp: they stay in the never-verified head block so
    the driver re-checks them soonest, not last (r8 ADVICE item 1)."""
    if not isinstance(row, dict):
        return False
    if row.get("err") is None and row.get("hash_match") is True:
        return True
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def _last_stamps(
    artifact_dir: str | None = None,
) -> dict[str, tuple[int, bool]]:
    """Per query, ``(round, oracle_green)`` of the NEWEST committed
    CORRECTNESS_r*.json row that was a SUCCESSFUL verification (see
    :func:`_row_verified`): ``round`` is the newest such round,
    ``oracle_green`` whether THAT newest stamp was a full oracle match
    (True) or a documented rows-only pass (False). Queries absent from
    every file — or only ever present as failures — get no entry
    (= scheduled in the head block). ``artifact_dir`` defaults to this
    file's directory (the repo root, where the driver commits the
    artifacts); tests pass a synthetic dir."""
    import glob
    import json
    import os
    import re as _re

    last: dict[str, tuple[int, bool]] = {}
    here = artifact_dir or os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd_match = _re.search(r"_r(\d+)\.json$", path)
        if rnd_match is None:
            continue
        rnd = int(rnd_match.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue  # malformed/unreadable artifact: skip, never fail
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if _row_verified(row):
                green = row.get("err") is None and row.get("hash_match") is True
                prev = last.get(name)
                if prev is None or rnd >= prev[0]:
                    last[name] = (rnd, green)
    return last


def _last_verified_round(artifact_dir: str | None = None) -> dict[str, int]:
    """Per query, the newest round with a SUCCESSFUL row (the rotation
    staleness key); see :func:`_last_stamps` for the stamp-kind-aware
    variant."""
    return {n: r for n, (r, _) in _last_stamps(artifact_dir).items()}


# Queries whose RESULT SEMANTICS changed after their newest driver
# stamp (the rotation orders by stamp recency, so a recently-stamped
# query whose release just changed would otherwise be re-checked LAST
# — the stamp certifies the old semantics). Entry value = the round
# whose stamp is now stale; the name rejoins the head block until the
# driver records a SUCCESSFUL stamp in a LATER round, after which the
# entry is inert (self-cleaning — safe to leave or prune). Add a name
# here whenever a change alters a stamped query's released values;
# pure refactors that keep results bit-identical (verified by the
# local differential) do not qualify.
RESTAMP_AFTER: dict[str, int] = {
    # r12: two-axis region rule + 6-step subset-varied snapshots
    # replaced the r11-stamped confidence-only release. (Inert since
    # the driver's r12 stamp — kept as the documented example.)
    "q437_dataset_cartography": 11,
    # r13: the shared ULM lattice gained the _ULM_BLOCK=64 DP block
    # bound (token boundaries forced at block edges — released token
    # counts/costs and usage shares changed vs the r12-stamped
    # unblocked DP).
    "q443_unigram_lm_viterbi_segmentation": 12,
    "q447_unigram_lm_hard_em_mstep": 12,
}


def _qnum(name: str) -> int:
    import re as _re

    m = _re.match(r"q(\d+)_", name)
    return int(m.group(1)) if m else 10**9


def _ordered():
    reg = load_all()
    stamps = _last_stamps()
    # Head block = never-successfully-sampled queries PLUS queries whose
    # registry row HAS an oracle but whose newest successful stamp was a
    # rows-only (`no_oracle`) pass — i.e. the query GAINED an oracle
    # after its last stamp, so the driver has never actually run the
    # differential it is now capable of (r11 verdict task 2; the
    # concrete instances were q147/q164, rows-only-stamped r8, oracles
    # added r10). Head in q-order, then ascending last-verified round
    # (stalest first), ties in q-order; with no readable CORRECTNESS
    # files this degrades to plain q-order.
    def _key(n: str):
        st = stamps.get(n)
        in_head = (
            st is None
            or (reg[n].oracle is not None and not st[1])
            or st[0] <= RESTAMP_AFTER.get(n, -1)
        )
        return (not in_head, 0 if in_head else st[0], _qnum(n))

    names = sorted(reg, key=_key)
    return {n: reg[n] for n in names}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    registry = load_all()
    return registry["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; rows-only checks omit their entry.

    Path-dependent oracles (q90's ``read_blob`` directory stat) carry a
    ``__SF_DIR__`` placeholder — DuckDB table functions only accept
    constant paths — substituted here with the driver's documented
    sf=0.01 comparison grain (the local differential substitutes its
    own active dir instead)."""
    return {
        name: q.oracle.replace("__SF_DIR__", "/root/testdata/sf0.01")
        for name, q in _ordered().items()
        if q.oracle is not None
    }
