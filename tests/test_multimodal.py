"""Multimodal column plumbing tests (binary payload + typed metadata)."""

from __future__ import annotations

import hashlib

import pytest

from azure_batch_map_reduce_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_metadata,
    extract_features,
    load_assets,
    sample_chunks,
)


@pytest.fixture()
def assets_dir(tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.img").write_bytes(b"\x89FAKE-IMAGE" + bytes(range(256)) * 10)
    (d / "b.img").write_bytes(b"\x89FAKE-IMAGE-2" + bytes(range(256)))
    (d / "c.aud").write_bytes(b"FAKE-AUDIO" + b"\x01\x02" * 100_000)
    return str(d)


def test_load_assets_schema(spark, assets_dir):
    assets = load_assets(spark, assets_dir)
    rows = {r["asset_id"]: r for r in assets.collect()}
    assert set(rows) == {"a.img", "b.img", "c.aud"}
    assert rows["a.img"]["media_type"] == "img"
    assert rows["c.aud"]["media_type"] == "aud"
    assert rows["b.img"]["n_bytes"] == len(b"\x89FAKE-IMAGE-2" + bytes(range(256)))


def test_decode_metadata_deterministic(spark, assets_dir):
    meta = decode_metadata(load_assets(spark, assets_dir)).collect()
    again = decode_metadata(load_assets(spark, assets_dir)).collect()
    assert sorted(map(str, meta)) == sorted(map(str, again))
    for r in meta:
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert 1 <= r["channels"] <= 4


def test_extract_features_shape_and_value(spark, assets_dir):
    feats = {r["asset_id"]: r for r in extract_features(load_assets(spark, assets_dir)).collect()}
    assert all(len(r["feature"]) == FEATURE_DIM for r in feats.values())
    payload = b"\x89FAKE-IMAGE" + bytes(range(256)) * 10
    expected0 = round(hashlib.sha256(payload).digest()[0] / 255.0, 6)
    assert feats["a.img"]["feature"][0] == pytest.approx(expected0)


def test_sample_chunks(spark, assets_dir):
    chunks = sample_chunks(load_assets(spark, assets_dir), chunk_size=1024, max_chunks=3).collect()
    by_asset = {}
    for r in chunks:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # c.aud is ~200KB → capped at 3 chunks of 1024
    assert len(by_asset["c.aud"]) == 3
    assert all(r["chunk_bytes"] == 1024 for r in by_asset["c.aud"])
    # b.img is small → 1 chunk
    assert len(by_asset["b.img"]) == 1


def test_resize_preserves_rows_and_sizes_payloads(spark, sf_dir):
    from azure_batch_map_reduce_spark.functions.multimodal import (
        load_assets,
        resize_assets,
    )

    assets = load_assets(spark, sf_dir, glob="*.parquet")
    resized = resize_assets(assets, width=64, height=64)
    rows = resized.collect()
    assert len(rows) == assets.count()
    budgets = {len(bytes(r["content"])) for r in rows}
    # 64*64*channels//64 with channels in 1..4
    assert budgets <= {64 * c for c in (1, 2, 3, 4)}
    assert all(r["n_bytes"] == len(bytes(r["content"])) for r in rows)
    # deterministic: same input -> same surrogate payload
    again = {r["asset_id"]: bytes(r["content"]) for r in resize_assets(assets, 64, 64).collect()}
    assert all(bytes(r["content"]) == again[r["asset_id"]] for r in rows)


def _registry():
    from azure_batch_map_reduce_spark.registry import load_all

    return load_all()


def test_q90_manifest_invariants(spark, sf_dir):
    rows = _registry()["q90_file_manifest"].fn(spark, sf_dir).collect()
    assert rows, "manifest empty"
    assert all(r.lineage_ok for r in rows)
    assert all(r.bytes_positive for r in rows)
    ids = [r.map_task_id for r in rows]
    assert len(ids) == len(set(ids)), "map_task_id not unique"


def test_q92_pipeline_invariants(spark, sf_dir):
    rows = _registry()["q92_multimodal_pipeline"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.bytes_conserved for r in rows)
    assert all(r.counts_conserved for r in rows)
    assert all(r.features_ok for r in rows)


def test_q147_frame_grid_invariants(spark, sf_dir):
    rows = _registry()["q147_frame_sampling"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.grid_ok for r in rows), [r for r in rows if not r.grid_ok]
    assert all(r.brightness_ok for r in rows)
    # independent Python recomputation of one asset's grid
    r0 = rows[0]
    from azure_batch_map_reduce_spark.functions.multimodal import TARGET_FRAMES

    assert r0.n_frames == TARGET_FRAMES
    assert r0.last_frame_ms == (TARGET_FRAMES - 1) * r0.duration_ms // TARGET_FRAMES


def test_q164_vad_invariants(spark, sf_dir):
    rows = _registry()["q164_vad_segments"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.frames_ok, r
        assert r.counts_ok, r
        assert r.ratio_ok, r
