"""Host data-path throughput: NpySource + native gather + Prefetcher.

Measures the feed rate (img/s) the host can sustain at 256/512/1024 px and
compares it to the device step time at each resolution, answering SURVEY.md
hard part (f) / VERDICT r1 #9: does the input pipeline keep up at high
resolution? Results are recorded in BASELINE.md.

The source is a freshly written npy shard directory (memory-mapped reads,
like a real `ganlab prepare-data` output); batches flow through the same
Prefetcher used by the Trainer. No TPU required — `place` is a host-side
copy standing in for the uint8 host->HBM transfer initiation.

Usage: python scripts/bench_data.py [--images 512] [--seconds 6]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--max-res", type=int, default=1024)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ganlab_tpu.config import DataConfig
    from ganlab_tpu.data import Prefetcher, make_source
    from ganlab_tpu.data.native import gather as native_gather

    # measured per-device step times on the v5-lite (BASELINE.md);
    # feed must beat batch/step_time img/s to keep the chip busy.
    step_ms = {256: 92.4, 512: 185.0, 1024: 340.0}
    batch_at = {256: 16, 512: 4, 1024: 2}

    with tempfile.TemporaryDirectory() as d:
        from ganlab_tpu.data.pipeline import box_downsample

        rng = np.random.default_rng(0)
        print(f"# writing {args.images} images at <=f{args.max_res}^2 "
              "(per-res shards, like prepare-data) ...", flush=True)
        arr = rng.integers(0, 256, (args.images, args.max_res,
                                    args.max_res, 3), dtype=np.uint8)
        res_w = args.max_res
        while res_w >= 256:
            np.save(os.path.join(d, f"images_{res_w}.npy"),
                    box_downsample(arr, args.max_res // res_w))
            res_w //= 2
        del arr

        cfg = DataConfig(dataset="npy", data_dir=d)
        rows = []
        for res in (256, 512, 1024):
            if res > args.max_res:
                continue
            src = make_source(cfg, res, seed=1)
            bs = batch_at[res]

            # raw source rate (gather + downsample, no pipeline)
            n, t0 = 0, time.perf_counter()
            while time.perf_counter() - t0 < args.seconds / 2:
                src.batch(bs, res)
                n += bs
            raw_rate = n / (time.perf_counter() - t0)

            # through the Prefetcher (background thread + host copy)
            with Prefetcher(src, bs, res,
                            place=lambda b: np.ascontiguousarray(b)) as pf:
                pf.next()  # warm
                n, t0 = 0, time.perf_counter()
                while time.perf_counter() - t0 < args.seconds / 2:
                    pf.next()
                    n += bs
                pf_rate = n / (time.perf_counter() - t0)

            need = batch_at[res] / (step_ms[res] / 1000.0)
            rows.append({
                "res": res, "batch": bs,
                "native_gather": native_gather(
                    np.zeros((2, res, res, 3), np.uint8),
                    np.array([0, 1]), 1) is not None,
                "source_img_s": round(raw_rate, 1),
                "prefetcher_img_s": round(pf_rate, 1),
                "device_needs_img_s": round(need, 1),
                "headroom_x": round(pf_rate / need, 1),
            })
            print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
