"""Output-contract guard: every registered query's FINAL schema must be
flat and driver-hashable.

The driver's correctness comparator sorts raw pandas frames before
hashing; an ArrayType/MapType cell reaches pandas as a Python list/dict
and crashes `sort_values`/factorize with ``TypeError: unhashable type``
(CORRECTNESS_r04: q274/q281). The reference's own reduce-slot contract
is a flat text file (``App.config:20``, ``Program.cs:358-359``), so a
flat output schema is the faithful shape anyway. This test makes the
whole CLASS unrepresentable: no query may ever emit a complex-typed
column in its final projection (serialize to a delimited string
instead — see q220/q274/q281).
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, MapType, StructType

from azure_batch_map_reduce_spark.registry import ROWS_ONLY_RATIONALE, load_all

REGISTRY = load_all()


def test_every_rows_only_query_is_documented():
    """No silent rows-only rows: every oracle=None query carries an
    explicit rationale (r4 verdict task 6), and no rationale goes
    stale when a query gains an oracle."""
    oracleless = {n for n, q in REGISTRY.items() if not q.oracle}
    assert oracleless == set(ROWS_ONLY_RATIONALE)


def _complex_cols(schema: StructType) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_final_schema_is_flat(spark, sf_dir, name):
    q = REGISTRY[name]
    # Mostly analysis-only; the handful of eager builders
    # (localCheckpoint(eager=True) in q384/q388/q391/q396/q399, the
    # count() in q396) do run real jobs at sf0.001 here — accepted cost,
    # since the final schema only exists on the built frame and the
    # differential suite executes the same queries anyway.
    df = q.fn(spark, sf_dir)
    bad = _complex_cols(df.schema)
    assert not bad, (
        f"{name} emits complex-typed column(s) {bad} — the driver's "
        "comparator cannot hash list/dict cells; serialize to a "
        "delimited string on BOTH engines (F.concat_ws / "
        "array_to_string)"
    )
