#!/usr/bin/env python
"""Multimodal decode-stage throughput at bench scale (r15: the PNG
quarter now decodes REAL pixels — PngCodec, stdlib zlib — so the
feature-extract stage is re-measured with genuine decode work in it).

Three stages over a deterministic synthetic asset lake (N assets,
one third real PNGs in the 64-191 px range, the rest raw-byte blobs):

  metadata   — ``asset_metadata_rows``: pure-codegen sniff/hash/dims
               (the 100 TB profiling path; no Python, no decode)
  features   — ``extract_features``: Arrow-batched mapInPandas; real
               IDAT inflate + unfilter for PNG content, byte stats
               otherwise
  resize     — ``resize_images`` to 32x24 via AutoCodec (real PNG
               re-encode for PNGs, raw arrays otherwise)

Noise discipline as everywhere: ``bench.steady_time_queries`` (CPU
probes bracketing every attempt, steady-by-construction retries).
Prints ONE JSON line:
  {"metric": "multimodal_decode_stages", "value": total_sec,
   "unit": "sec", "queries": {...}, "n_assets": N,
   "assets_per_sec": {...}, "calibration": {...}}

Usage: python bench_multimodal.py [--assets 6000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def build_assets(spark, n: int):
    """Deterministic asset frame at scale, executor-side generation:
    pixel ramps → real PNG encode for the PNG third (inside
    mapInPandas, so the bench generation itself is distributed), raw
    byte blobs for the rest."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from unicargo_medallion_data_pipeline_spark.textops.multimodal import (
        ASSET_SCHEMA,
        PngCodec,
    )

    base = spark.range(0, n, 1, 32).selectExpr("CAST(id AS INT) AS asset_id")

    def _gen(batches):
        import numpy as np

        png = PngCodec()
        for pdf in batches:
            rows = {"asset_id": [], "media_type": [], "content": [], "meta": []}
            for i in pdf["asset_id"]:
                i = int(i)
                media = ["image/png", "audio/wav", "video/mp4"][i % 3]
                w, h = 64 + i % 128, 64 + (i * 3) % 128
                if media == "image/png":
                    yy, xx = np.mgrid[0:h, 0:w]
                    arr = np.stack(
                        [(yy + i) % 256, (xx * 3 + i) % 256, (yy + xx) % 256],
                        axis=-1,
                    ).astype(np.uint8)
                    content = png.encode(arr)
                else:
                    content = bytes((i * 7 + j) % 256 for j in range(256 + i % 512))
                rows["asset_id"].append(i)
                rows["media_type"].append(media)
                rows["content"].append(content)
                rows["meta"].append(
                    {
                        "width": w,
                        "height": h,
                        "n_channels": 3,
                        "duration_ms": (i % 10) * 1000 if media == "video/mp4" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(_gen, schema=ASSET_SCHEMA)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", type=int, default=6000)
    args = ap.parse_args()

    from bench import steady_time_queries

    from unicargo_medallion_data_pipeline_spark.session import get_spark
    from unicargo_medallion_data_pipeline_spark.textops.multimodal import (
        asset_metadata_rows,
        extract_features,
        resize_images,
    )

    spark = get_spark("bench-multimodal")
    spark.sparkContext.setLogLevel("ERROR")

    import pyspark.sql.functions as F

    assets = build_assets(spark, args.assets).localCheckpoint(eager=True)
    assert assets.count() == args.assets

    binlike = assets.select(
        F.concat(F.lit("mem://"), F.col("asset_id").cast("string")).alias("path"),
        F.length("content").cast("long").alias("length"),
        F.col("content"),
    )

    stages = {
        "metadata": lambda: asset_metadata_rows(binlike).count(),
        "features": lambda: extract_features(assets)
        .filter(F.col("decode_status") == "ok")
        .count(),
        "resize": lambda: resize_images(assets, 32, 24)
        .select(F.sum(F.length("content")))
        .collect(),
    }

    def _attempt(name: str) -> float:
        import time

        t0 = time.perf_counter()
        stages[name]()
        return time.perf_counter() - t0

    times, cal = steady_time_queries(list(stages), _attempt)
    out = {
        "metric": "multimodal_decode_stages",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in times.items()},
        "n_assets": args.assets,
        "assets_per_sec": {
            k: round(args.assets / v) for k, v in times.items() if v > 0
        },
        "calibration": cal,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
