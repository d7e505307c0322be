"""Pins for the driver-contract verification ordering.

The driver samples the HEAD of ``queries()`` (~50/round), so the order
IS the verification schedule. Rounds 4-7 hand-rotated a static list and
the head kept re-arming to just-stamped rows; round 8 replaced it with
an order COMPUTED from the committed CORRECTNESS_r*.json artifacts.
These tests pin the policy: never-sampled first in q-order, then
ascending last-verified round, ties in q-order — so each driver round
automatically schedules the stalest rows next. No SparkSession needed.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

entry = importlib.import_module("__spark_entry__")


def test_queries_cover_registry_exactly_once():
    from azure_batch_map_reduce_spark.registry import load_all

    names = list(entry.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(load_all())


def _head_names(reg, stamps):
    """The policy's head block: never-successfully-stamped queries,
    oracle-gained queries (registry HAS an oracle, newest successful
    stamp was rows-only — r11 verdict task 2), and semantics-changed
    queries whose newest stamp is <= their RESTAMP_AFTER round (r12)."""
    return {
        n
        for n in reg
        if n not in stamps
        or (reg[n].oracle is not None and not stamps[n][1])
        or stamps[n][0] <= entry.RESTAMP_AFTER.get(n, -1)
    }


def test_head_block_leads_in_q_order():
    from azure_batch_map_reduce_spark.registry import load_all

    reg = load_all()
    stamps = entry._last_stamps()
    names = list(entry.queries())
    head = [n for n in names if n in _head_names(reg, stamps)]
    # Every head-block query precedes every stamped query...
    assert names[: len(head)] == head
    # ...and the head block is in q-order.
    assert head == sorted(head, key=entry._qnum)


def test_stamped_queries_ordered_stalest_first():
    from azure_batch_map_reduce_spark.registry import load_all

    reg = load_all()
    stamps = entry._last_stamps()
    head = _head_names(reg, stamps)
    names = [n for n in entry.queries() if n not in head]
    keys = [(stamps[n][0], entry._qnum(n)) for n in names]
    assert keys == sorted(keys)


def test_oracle_gained_queries_join_head_block(tmp_path, monkeypatch):
    """r11 verdict task 2: a query whose newest successful stamp was a
    rows-only (`no_oracle`) pass but whose registry row now HAS an
    oracle must sort into the head block — the driver has never run
    the differential the query is now capable of. Synthetic artifacts:
    q147/q164-shaped histories plus a genuinely-rows-only row (no
    oracle in the registry) that must NOT join the head."""
    import json

    (tmp_path / "CORRECTNESS_r08.json").write_text(
        json.dumps(
            {
                "q147_gained": {
                    "hash_match": None,
                    "err": "no_oracle",
                    "spark_rows": 7,
                },
                "q092_forever_rows_only": {
                    "hash_match": None,
                    "err": "no_oracle",
                    "spark_rows": 3,
                },
                "q001_green": {"hash_match": True, "err": None},
            }
        )
    )
    stamps = entry._last_stamps(str(tmp_path))
    assert stamps == {
        "q147_gained": (8, False),
        "q092_forever_rows_only": (8, False),
        "q001_green": (8, True),
    }

    class _Q:
        def __init__(self, oracle):
            self.oracle = oracle

    reg = {
        "q147_gained": _Q("SELECT 1"),  # oracle gained after the stamp
        "q092_forever_rows_only": _Q(None),  # documented rows-only
        "q001_green": _Q("SELECT 1"),
        "q200_never": _Q("SELECT 1"),
    }
    head = _head_names(reg, stamps)
    assert head == {"q147_gained", "q200_never"}


def test_real_artifacts_leave_no_oracle_gained_backlog():
    """After the r12 driver run stamps q147/q164 oracle-green, the head
    block should contain ONLY genuinely-new queries: every oracle-
    gained entry is by construction a query the driver must re-check,
    so pin that each one is either new this round (no stamp at all) or
    one of the two known rows-only-stamped/oracle-gained rows."""
    from azure_batch_map_reduce_spark.registry import load_all

    reg = load_all()
    stamps = entry._last_stamps()
    gained = {
        n
        for n in reg
        if n in stamps and reg[n].oracle is not None and not stamps[n][1]
    }
    assert gained <= {"q147_frame_sampling", "q164_vad_segments"}


def test_oracle_sql_keys_subset_of_queries():
    qs = set(entry.queries())
    osql = entry.oracle_sql()
    assert set(osql) <= qs
    # Rows-only queries are the documented PAIR and nothing more
    # (registry.py enforces the rationale). Down from the r1-r9
    # quartet: q147/q164 gained full read_blob oracles in round 10.
    rows_only = qs - set(osql)
    assert rows_only == {
        "q67_ml_minhash_lsh",
        "q92_multimodal_pipeline",
    }


def test_last_verified_round_is_monotone_union():
    """Sanity on the artifact parse: every name appearing in any
    CORRECTNESS file with a SUCCESSFUL row gets the MAX successful
    round across files, and parsing never raises on the committed
    artifacts."""
    import glob
    import json
    import re

    here = Path(entry.__file__).parent
    expected: dict[str, int] = {}
    for p in sorted(glob.glob(str(here / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", p).group(1))
        for name, row in json.load(open(p)).items():
            if entry._row_verified(row):
                expected[name] = max(expected.get(name, 0), rnd)
    assert entry._last_verified_round() == expected


def test_last_verified_round_synthetic_artifacts(tmp_path):
    """The parse is shaped by whatever the driver writes, so pin the
    contract against synthetic artifacts: latest SUCCESSFUL round wins
    per name, malformed or non-dict files are skipped silently, and a
    directory with no artifacts yields an empty map (=> plain q-order)."""
    import json

    green = {"hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q01_a": green, "q02_b": green})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"q02_b": green, "q05_c": green})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps([1, 2]))
    got = entry._last_verified_round(str(tmp_path))
    assert got == {"q01_a": 1, "q02_b": 3, "q05_c": 3}
    empty = tmp_path / "none"
    empty.mkdir()
    assert entry._last_verified_round(str(empty)) == {}


def test_failed_rows_do_not_stamp(tmp_path):
    """r8 ADVICE item 1: a driver row with hash_match=False or a real
    err must NOT count as verified — the query rejoins the head block
    instead of sorting to the back of the schedule. Rows-only successes
    (err='no_oracle' with a row count) DO stamp; a rows-only run that
    itself crashed (no spark_rows) does not."""
    import json

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "q01_green": {"hash_match": True, "err": None},
                "q02_hash_fail": {"hash_match": False, "err": None},
                "q03_errored": {"hash_match": None, "err": "Traceback ..."},
                "q04_rows_only_ok": {
                    "hash_match": None,
                    "err": "no_oracle",
                    "spark_rows": 10,
                },
                "q05_rows_only_crash": {
                    "hash_match": None,
                    "err": "no_oracle",
                    "spark_rows": None,
                },
            }
        )
    )
    # q02 later fixed and re-stamped green: latest SUCCESS wins.
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q02_hash_fail": {"hash_match": True, "err": None}})
    )
    got = entry._last_verified_round(str(tmp_path))
    assert got == {"q01_green": 1, "q02_hash_fail": 2, "q04_rows_only_ok": 1}


def test_restamp_after_forces_head_until_newer_stamp(tmp_path):
    """RESTAMP_AFTER semantics (r12): a query whose release changed
    after its newest stamp sorts into the head block while its newest
    stamp round <= the recorded stale round, and becomes an ordinary
    tail row once a LATER round stamps it (the entry is then inert)."""
    import json

    green = {"hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r11.json").write_text(
        json.dumps({"q437_x": green, "q01_y": green})
    )
    stamps = entry._last_stamps(str(tmp_path))

    class _Q:
        oracle = "SELECT 1"

    reg = {"q437_x": _Q(), "q01_y": _Q()}
    fake_restamp = {"q437_x": 11}
    head = {
        n
        for n in reg
        if n not in stamps
        or (reg[n].oracle is not None and not stamps[n][1])
        or stamps[n][0] <= fake_restamp.get(n, -1)
    }
    assert head == {"q437_x"}
    # A later stamp clears it.
    (tmp_path / "CORRECTNESS_r12.json").write_text(
        json.dumps({"q437_x": green})
    )
    stamps = entry._last_stamps(str(tmp_path))
    head = {
        n
        for n in reg
        if n not in stamps
        or (reg[n].oracle is not None and not stamps[n][1])
        or stamps[n][0] <= fake_restamp.get(n, -1)
    }
    assert head == set()


def test_restamp_entries_schedule_consistently_with_live_stamps():
    """Round-invariant live-artifact pin (r12 verdict task 1 replaced
    the round-specific ``test_q437_leads_r12_schedule``, which pinned a
    transient schedule and went red the moment the driver stamped q437
    — the RESTAMP rule self-cleaning as designed). The only property a
    test may assert against the REAL artifact directory is one that
    holds in EVERY round: each RESTAMP_AFTER entry sits in the head
    block IFF its newest successful stamp is not newer than the
    recorded stale round. No names-of-this-round, no positional
    schedule pins — those belong in synthetic-artifact tests
    (``test_restamp_after_forces_head_until_newer_stamp``)."""
    names = list(entry.queries())
    stamps = entry._last_stamps()
    reg_oracles = entry.oracle_sql()
    # Head block = maximal prefix of rows the rotation keyed in_head;
    # recompute membership per the documented rule and check each
    # RESTAMP entry lands on the side its stamp dictates.
    for name, stale_round in entry.RESTAMP_AFTER.items():
        if name not in names:
            continue  # entry may outlive a renamed query; inert
        st = stamps.get(name)
        should_lead = (
            st is None
            or (name in reg_oracles and not st[1])
            or st[0] <= stale_round
        )
        # Position check: head rows all sort before every stamped
        # ordinary row. q01 is stamped green every round since r1 with
        # no RESTAMP entry, so it is ordinary whenever q437 is not.
        anchor = names.index("q01_pricing_summary")
        if should_lead:
            assert names.index(name) < anchor, (
                f"{name} has no stamp newer than round {stale_round} "
                "but did not schedule in the head block"
            )
        else:
            assert st is not None and st[0] > stale_round


def test_no_unconditional_live_schedule_pins():
    """Meta-guard for the trap class that went red twice (r8 hand-
    rotated lists, r12 ``test_q437_leads_r12_schedule``): a test that
    reads the REAL artifact directory must assert only round-invariant
    properties, never "query X is in this round's head block" — the
    driver's very next CORRECTNESS commit changes the head by design.
    Concretely: in any test function WITHOUT a tmp_path fixture
    (= reads live artifacts), an ``assert "<literal>" in <slice>`` /
    ``not in <slice>`` is banned unless the function also consults the
    stamps that make the claim conditional (``_last_stamps`` /
    ``RESTAMP_AFTER``)."""
    import ast
    import inspect

    src = inspect.getsource(type(entry) and __import__("sys").modules[__name__])
    tree = ast.parse(src)
    offenders = []
    for fn in ast.walk(tree):
        if not isinstance(fn, ast.FunctionDef) or not fn.name.startswith("test_"):
            continue
        if any(a.arg == "tmp_path" for a in fn.args.args):
            continue  # synthetic-artifact test: literal pins are fine
        fn_src = ast.unparse(fn)
        stamp_aware = "_last_stamps" in fn_src or "RESTAMP_AFTER" in fn_src
        for node in ast.walk(fn):
            if not isinstance(node, ast.Assert):
                continue
            for cmp_node in ast.walk(node):
                if not isinstance(cmp_node, ast.Compare):
                    continue
                if not any(isinstance(op, (ast.In, ast.NotIn)) for op in cmp_node.ops):
                    continue
                lhs_literal_qname = (
                    isinstance(cmp_node.left, ast.Constant)
                    and isinstance(cmp_node.left.value, str)
                    and cmp_node.left.value.startswith("q")
                )
                rhs_slice = any(
                    isinstance(c, ast.Subscript) for c in cmp_node.comparators
                )
                if lhs_literal_qname and rhs_slice and not stamp_aware:
                    offenders.append(fn.name)
    assert offenders == [], (
        f"round-specific live-artifact schedule pins: {offenders} — "
        "make the assertion stamp-conditional or move it to a "
        "tmp_path synthetic-artifact test"
    )
