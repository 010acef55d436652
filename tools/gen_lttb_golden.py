#!/usr/bin/env python3
"""LTTB differential golden: an independent Python implementation of
Largest-Triangle-Three-Buckets (Steinarsson 2013, "Downsampling Time Series
for Visual Representation", ch. 4.2 — the canonical public algorithm, same
bucketing/centroid/area rules as every mainstream implementation). The Scala
kernel (graft.ops.DownsampleOps.lttbIndices) must select identical indices.

Writes src/test/resources/golden/lttb.json. No reference imports needed —
LTTB is not part of claspy; this pins the engine's extra downsample operator
against an independently written twin.
"""
import json
import math
import os


def lttb_indices(ts, v, threshold):
    n = len(ts)
    if threshold >= n or threshold < 3:
        return list(range(n))
    out = [0]
    bucket_size = (n - 2) / (threshold - 2)
    a = 0
    for i in range(threshold - 2):
        c_start = int(math.floor((i + 1) * bucket_size) + 1)
        c_end = min(int(math.floor((i + 2) * bucket_size) + 1), n)
        m = max(c_end - c_start, 1)
        cx = sum(float(ts[j]) for j in range(c_start, c_end)) / m
        cy = sum(v[j] for j in range(c_start, c_end)) / m
        b_start = int(math.floor(i * bucket_size) + 1)
        b_end = min(int(math.floor((i + 1) * bucket_size) + 1), n)
        ax, ay = float(ts[a]), v[a]
        best, best_idx = -1.0, b_start
        for j in range(b_start, b_end):
            area = abs((ax - cx) * (v[j] - ay) - (ax - float(ts[j])) * (cy - ay)) * 0.5
            if area > best:
                best, best_idx = area, j
        out.append(best_idx)
        a = best_idx
    out.append(n - 1)
    return out


def lcg_series(seed, n, ts_step=1000):
    """Integer-LCG series (no library RNG): reproducible bit-for-bit on JVM."""
    s = seed
    ts, v = [], []
    for i in range(n):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        ts.append(i * ts_step + (s % 97))  # slightly irregular timestamps
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        v.append((s % 100000) / 1000.0 + 10.0 * math.sin(i / 15.0))
    return ts, v


cases = []
for seed, n, threshold in [(7, 500, 50), (13, 1000, 100), (29, 997, 73),
                           (31, 64, 12), (41, 5000, 200), (43, 100, 3),
                           (47, 10, 20),  # threshold >= n: identity
                           (53, 2000, 4)]:
    ts, v = lcg_series(seed, n)
    idx = lttb_indices(ts, v, threshold)
    cases.append({"seed": seed, "n": n, "threshold": threshold,
                  "ts": ts, "v": v, "indices": idx})

out_dir = "/root/repo/src/test/resources/golden"
os.makedirs(out_dir, exist_ok=True)
with open(f"{out_dir}/lttb.json", "w") as f:
    json.dump({"cases": cases}, f)
print("wrote lttb.json:", [(c["n"], c["threshold"], len(c["indices"])) for c in cases])
