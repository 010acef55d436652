#!/usr/bin/env python3
"""Golden-fixture generator: runs the REFERENCE (claspy at /root/reference)
with numba/scipy/sklearn/statsmodels/matplotlib stubbed out (its @njit kernels
are plain numpy code), and dumps inputs + outputs as JSON for the Scala parity
suite. The series themselves are embedded in the JSON at full precision, so
the JVM side never has to reproduce Python float generation.

Usage: python3 tools/gen_golden.py
"""
import json, math, os, sys, types
import contextlib

import numpy as np

# ---------------------------------------------------------------- stubs
numba = types.ModuleType("numba")

def njit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]):
        return args[0]
    def deco(f):
        return f
    return deco

class _ObjMode:
    def __init__(self, **kwargs):
        pass
    def __enter__(self):
        return self
    def __exit__(self, *a):
        return False

numba.njit = njit
numba.prange = range
numba.objmode = _ObjMode
numba.get_num_threads = lambda: 1
numba.set_num_threads = lambda n: None

typed = types.ModuleType("numba.typed")
typedlist = types.ModuleType("numba.typed.typedlist")
typedlist.List = lambda x: list(x)
typed.typedlist = typedlist
numba.typed = typed

sys.modules["numba"] = numba
sys.modules["numba.typed"] = typed
sys.modules["numba.typed.typedlist"] = typedlist

scipy = types.ModuleType("scipy")
scipy_stats = types.ModuleType("scipy.stats")

class _Norm:
    @staticmethod
    def sf(x):
        return 0.5 * math.erfc(x / math.sqrt(2.0))

class _Distributions:
    norm = _Norm()

scipy_stats.distributions = _Distributions()
scipy_signal = types.ModuleType("scipy.signal")

def find_peaks(x):
    # scipy default semantics: strict local maxima, plateau -> floor midpoint
    x = np.asarray(x)
    peaks = []
    i_max = len(x) - 1
    i = 1
    while i < i_max:
        if x[i - 1] < x[i]:
            i_ahead = i + 1
            while i_ahead < i_max and x[i_ahead] == x[i]:
                i_ahead += 1
            if x[i_ahead] < x[i]:
                peaks.append((i + i_ahead - 1) // 2)
                i = i_ahead
        i += 1
    return np.array(peaks, dtype=np.int64), {}

scipy_signal.find_peaks = find_peaks
scipy.stats = scipy_stats
scipy.signal = scipy_signal
sys.modules["scipy"] = scipy
sys.modules["scipy.stats"] = scipy_stats
sys.modules["scipy.signal"] = scipy_signal

sklearn = types.ModuleType("sklearn")
sklearn_exc = types.ModuleType("sklearn.exceptions")

class NotFittedError(Exception):
    pass

sklearn_exc.NotFittedError = NotFittedError
sklearn.exceptions = sklearn_exc
sys.modules["sklearn"] = sklearn
sys.modules["sklearn.exceptions"] = sklearn_exc

sm = types.ModuleType("statsmodels")
sm_tsa = types.ModuleType("statsmodels.tsa")
sm_st = types.ModuleType("statsmodels.tsa.stattools")

def acf(x, fft=True, nlags=None):
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    mu = x.mean()
    xd = x - mu
    out = np.empty(nlags + 1)
    for lag in range(nlags + 1):
        out[lag] = np.sum(xd[: n - lag] * xd[lag:]) / n
    return out / out[0]

sm_st.acf = acf
sm_tsa.stattools = sm_st
sm.tsa = sm_tsa
sys.modules["statsmodels"] = sm
sys.modules["statsmodels.tsa"] = sm_tsa
sys.modules["statsmodels.tsa.stattools"] = sm_st

mpl = types.ModuleType("matplotlib")
mpl_p = types.ModuleType("matplotlib.pyplot")
mpl.pyplot = mpl_p
sys.modules["matplotlib"] = mpl
sys.modules["matplotlib.pyplot"] = mpl_p

sys.path.insert(0, "/root/reference")

from claspy.nearest_neighbour import KSubsequenceNeighbours
from claspy.clasp import ClaSP, ClaSPEnsemble
from claspy.segmentation import BinaryClaSPSegmentation
from claspy.window_size import suss, dominant_fourier_frequency, highest_autocorrelation

OUT = "/root/repo/src/test/resources/golden"
os.makedirs(OUT, exist_ok=True)


def gen_series(kind, n, seed):
    rng = np.random.RandomState(seed)
    if kind == "mean_shift":
        k = 3
        cps = [n // 3, 2 * n // 3]
        means = [0.0, 3.0, -2.0]
        parts = []
        bounds = [0] + cps + [n]
        for i in range(k):
            parts.append(means[i] + rng.randn(bounds[i + 1] - bounds[i]))
        return np.concatenate(parts), cps
    if kind == "freq_shift":
        cps = [n // 2]
        t1 = np.arange(n // 2)
        t2 = np.arange(n - n // 2)
        s1 = np.sin(2 * np.pi * t1 / 20.0) + 0.1 * rng.randn(len(t1))
        s2 = np.sin(2 * np.pi * t2 / 47.0) + 0.1 * rng.randn(len(t2))
        return np.concatenate([s1, s2]), cps
    if kind == "var_shift":
        cps = [2 * n // 5, 4 * n // 5]
        b = [0] + cps + [n]
        sds = [0.5, 2.5, 1.0]
        parts = [sds[i] * rng.randn(b[i + 1] - b[i]) for i in range(3)]
        return np.concatenate(parts), cps
    if kind == "amp_freq":
        cps = [n // 4, n // 2, 3 * n // 4]
        b = [0] + cps + [n]
        periods = [15.0, 35.0, 15.0, 60.0]
        amps = [1.0, 2.0, 0.7, 1.5]
        parts = []
        for i in range(4):
            t = np.arange(b[i + 1] - b[i])
            parts.append(amps[i] * np.sin(2 * np.pi * t / periods[i]) + 0.15 * rng.randn(len(t)))
        return np.concatenate(parts), cps
    raise ValueError(kind)


def _default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    raise TypeError(type(o))


def dump(name, obj):
    with open(f"{OUT}/{name}.json", "w") as f:
        json.dump(obj, f, default=_default)
    print("wrote", name)


# 1. MT19937 / temporal constraints parity
rows = []
for n, min_seg in [(1000, 50), (3000, 150), (600, 250), (287, 50)]:
    np.random.seed(2357)
    tcs = [(0, n)]
    while len(tcs) < 10 and n > 3 * min_seg:
        lbound, area = np.random.choice(n, 2, replace=True)
        if n - lbound < area:
            area = n - lbound
        ubound = lbound + area
        if ubound - lbound < 2 * min_seg:
            continue
        tcs.append((lbound, ubound))
    tcs = sorted(tcs, key=lambda tc: tc[1] - tc[0], reverse=True)
    rows.append({"n": n, "min_seg_size": min_seg, "tcs": [list(t) for t in tcs]})
np.random.seed(42)
raw = [int(v) for v in np.random.choice(10 ** 6, 64, replace=True)]
dump("tcs", {"cases": rows, "raw_seed42_n1e6": raw})

# 2. knn + profile on a small series
ts, cps = gen_series("mean_shift", 300, 7)
knn = KSubsequenceNeighbours(window_size=10, k_neighbours=3, n_jobs=1).fit(ts)
clasp = ClaSP(window_size=10, k_neighbours=3, n_jobs=1).fit(ts, knn=knn)
dump("knn_small", {
    "ts": ts.tolist(),
    "window_size": 10, "k": 3,
    "offsets": knn.offsets.tolist(),
    "distances": knn.distances.tolist(),
    "profile": [None if np.isinf(v) or np.isnan(v) else float(v) for v in clasp.profile],
})

# 3. window-size methods
ws_rows = []
for kind, n, seed in [("mean_shift", 600, 1), ("freq_shift", 1200, 2),
                      ("var_shift", 900, 3), ("amp_freq", 1600, 4)]:
    ts, _ = gen_series(kind, n, seed)
    ws_rows.append({
        "kind": kind, "ts": ts.tolist(),
        "suss": int(suss(ts)),
        "fft": int(dominant_fourier_frequency(ts)),
        "acf": int(highest_autocorrelation(ts)),
    })
dump("window_sizes", {"cases": ws_rows})

# 4. full segmentation goldens
seg_rows = []
for kind, n, seed in [("mean_shift", 600, 11), ("freq_shift", 1200, 12),
                      ("var_shift", 900, 13), ("amp_freq", 1600, 14),
                      ("amp_freq", 2000, 15)]:
    ts, true_cps = gen_series(kind, n, seed)
    seg = BinaryClaSPSegmentation(n_jobs=1).fit(ts)
    seg_rows.append({
        "kind": kind, "seed": seed, "ts": ts.tolist(), "true_cps": true_cps,
        "window_size": int(seg.window_size),
        "cps": [int(c) for c in seg.change_points],
        "scores": [float(s) for s in seg.scores],
        "profile": [None if np.isnan(v) else float(v) for v in seg.profile],
    })
dump("segmentation", {"cases": seg_rows})

# 5. fixed-window segmentation (skips suss) + ensemble internals
ts, true_cps = gen_series("mean_shift", 800, 21)
ens = ClaSPEnsemble(n_estimators=10, window_size=12, k_neighbours=3, n_jobs=1).fit(ts)
seg = BinaryClaSPSegmentation(window_size=12, n_jobs=1).fit(ts)
dump("fixed_window", {
    "ts": ts.tolist(), "true_cps": true_cps, "window_size": 12,
    "ensemble_lbound": int(ens.lbound), "ensemble_ubound": int(ens.ubound),
    "ensemble_profile": [None if np.isinf(v) else float(v) for v in ens.profile],
    "cps": [int(c) for c in seg.change_points],
})
print("done")


# 6. streaming: StreamingKSN internals + ClaSS profile + end-to-end streaming segmentation
from claspy.streaming.nearest_neighbour import StreamingKSubsequenceNeighbours
from claspy.streaming.clasp import ClaSS, _profile as class_profile
from claspy.streaming.segmentation import StreamingClaSPSegmentation


def sanitize(arr):
    out = []
    for v in np.asarray(arr, dtype=np.float64):
        if math.isnan(v) or math.isinf(v):
            out.append(None)
        else:
            out.append(float(v))
    return out


# 6a. StreamingKSN: small ring, feed a freq_shift series, dump knn tables
ts_sksn, _ = gen_series("freq_shift", 400, 7)
sksn = StreamingKSubsequenceNeighbours(n_timepoints=300, window_size=10, k_neighbours=3)
for x in ts_sksn:
    sksn.update(x)
ksn_t = sksn.transform()
dump("streaming_knn", {
    "ts": [float(x) for x in ts_sksn],
    "n_timepoints": 300, "window_size": 10, "k_neighbours": 3,
    "lbound": int(sksn.lbound), "knn_filled": int(sksn.knn_filled),
    "knn_insert_idx": int(sksn.knn_insert_idx),
    "offsets": [[int(v) for v in row] for row in ksn_t.offsets],
    "distances": [sanitize(row) for row in ksn_t.distances],
})

# 6b. ClaSS profile on a batch knn (fixed window)
ts_class, cps_class = gen_series("freq_shift", 600, 11)
clasz = ClaSS(window_size=12, k_neighbours=3)
prof_class = clasz.fit_transform(ts_class)
cp_class = clasz.split(validation="significance_test", threshold=1e-15)
dump("streaming_class", {
    "ts": [float(x) for x in ts_class],
    "window_size": 12, "k_neighbours": 3,
    "profile": sanitize(prof_class),
    "cp": (int(cp_class) if cp_class is not None else None),
})

# 6c. end-to-end StreamingClaSPSegmentation with global cp log
seg_cases = []
for kind, n, seed, n_tp, n_wu in [("freq_shift", 2000, 3, 1000, 300),
                                  ("amp_freq", 2500, 5, 1200, 400)]:
    ts_s, cps_s = gen_series(kind, n, seed)
    stream = StreamingClaSPSegmentation(n_timepoints=n_tp, n_warmup=n_wu,
                                        window_size="suss", log_cps=True)
    for x in ts_s:
        stream.update(x)
    seg_cases.append({
        "kind": kind, "seed": seed, "n_timepoints": n_tp, "n_warmup": n_wu,
        "ts": [float(x) for x in ts_s],
        "window_size": int(stream.window_size),
        "last_cp": int(stream.last_cp),
        "change_points": [int(c) for c in stream.change_points],
        "profile": sanitize(stream.profile),
    })
dump("streaming_segmentation", {"cases": seg_cases})


# 7. multivariate segmentation (per-dim window size + min, threshold 1e-30,
# per-dim distance z-normalisation — segmentation.py:205-232)
mv_cases = []
for seed, noise, nlen in ((3, 0.12, 1200), (9, 0.04, 2000)):
    rng = np.random.RandomState(seed)
    n = nlen
    cps_true = [n // 3, 2 * n // 3]
    dims = []
    for d in range(3):
        parts = []
        b = [0] + cps_true + [n]
        for s in range(3):
            t = np.arange(b[s + 1] - b[s])
            period = [8.0, 29.0, 15.0][(s + d) % 3]
            parts.append(np.sin(2 * np.pi * t / period) + noise * rng.randn(len(t)))
        dims.append(np.concatenate(parts))
    ts2d = np.stack(dims, axis=1)  # (n, d)
    seg = BinaryClaSPSegmentation(n_jobs=1)
    cps_pred = seg.fit_predict(ts2d)
    mv_cases.append({
        "seed": seed,
        "dims": [[float(x) for x in dim] for dim in dims],
        "window_size": int(seg.window_size),
        "cps": [int(c) for c in cps_pred],
    })
dump("multivariate", {"cases": mv_cases})
