"""Multimodal plumbing tests: binary columns, Arrow-batched mapInPandas
feature extraction, per-row decode-error isolation, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def assets(spark):
    from unicargo_medallion_data_pipeline_spark.textops.multimodal import synthetic_assets

    return synthetic_assets(spark, n=64)


def test_asset_schema_roundtrip(spark, assets, tmp_path_factory):
    """binary + struct metadata survives a parquet round trip."""
    path = str(tmp_path_factory.mktemp("assets"))
    assets.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 64
    assert dict(back.dtypes)["content"] == "binary"
    row = back.filter(F.col("asset_id") == 1).collect()[0]
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["meta"]["n_channels"] == 3


def test_extract_features_batched(spark, assets):
    from unicargo_medallion_data_pipeline_spark.textops.multimodal import extract_features

    feats = extract_features(assets.repartition(4))
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 64
    ok = [r for r in rows.values() if r["decode_status"] == "ok"]
    errs = [r for r in rows.values() if r["decode_status"].startswith("error")]
    # i % 13 == 0 assets are corrupt (empty) → exactly 5 of 64
    assert len(errs) == 5 and len(ok) == 59
    # deterministic fake decode: mean byte of asset 1's bytes
    import statistics

    expected = statistics.mean((1 * 7 + j) % 256 for j in range(150))
    assert abs(rows[1]["mean_byte"] - expected) < 1e-9
    assert rows[1]["content_hash"] and rows[1]["n_bytes"] == 150


def test_decode_errors_do_not_kill_stage(spark, assets):
    from unicargo_medallion_data_pipeline_spark.textops.multimodal import extract_features

    # all-corrupt partition still completes
    corrupt = assets.filter(F.col("asset_id") % 13 == 0)
    out = extract_features(corrupt).collect()
    assert len(out) == 5
    assert all(r["decode_status"].startswith("error") for r in out)


def test_frame_sampling(spark, assets):
    from unicargo_medallion_data_pipeline_spark.textops.multimodal import sample_frames

    frames = sample_frames(assets, every_ms=1000)
    got = frames.groupBy("asset_id").count().collect()
    by_id = {r["asset_id"]: r["count"] for r in got}
    # video assets have duration (i % 10)*1000 ms → i % 10 frames at 1fps
    for aid, n in by_id.items():
        assert aid % 3 == 2, "only video assets may emit frames"
        assert n == aid % 10
    # ts aligned to the sampling grid
    assert frames.filter(F.col("ts_ms") % 1000 != 0).count() == 0


def test_resize_is_explicit_stub(spark, assets):
    from unicargo_medallion_data_pipeline_spark.textops.multimodal import resize_images

    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        resize_images(assets, 32, 32).count()
