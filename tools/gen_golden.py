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
                      ("amp_freq", 2000, 15),
                      ("freq_shift", 800, 61), ("freq_shift", 2400, 62),
                      ("var_shift", 1500, 63), ("amp_freq", 1100, 64),
                      ("mean_shift", 1800, 65), ("var_shift", 700, 66)]:
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


# 8. CLaP + AgglomerativeCLaPDetection (state detection)
#
# clap.py/state_detection.py import sklearn (KFold, f1_score, confusion_matrix),
# aeon (the window classifiers) and networkx (plot-only). sklearn pieces are
# stubbed FAITHFULLY in pure numpy below (KFold's shuffle uses the real
# numpy RandomState, so MT19937 semantics are the genuine article). The aeon
# classifier slot is external to the reference's own logic; we substitute a
# deterministic 1-NN implemented operation-for-operation like the Scala
# NN1Classifier, so every fixture pins the reference's dataset construction,
# subselection, CV split, merge loop and process extraction EXACTLY.

def _kfold_split(n, n_splits, seed):
    indices = np.arange(n)
    np.random.RandomState(seed).shuffle(indices)
    fold_sizes = np.full(n_splits, n // n_splits, dtype=int)
    fold_sizes[: n % n_splits] += 1
    ar = np.arange(n)
    current = 0
    for fs in fold_sizes:
        chunk = indices[current:current + fs]
        mask = np.zeros(n, dtype=bool)
        mask[chunk] = True
        yield ar[~mask], ar[mask]
        current += fs

class _KFold:
    def __init__(self, n_splits=5, shuffle=False, random_state=None):
        self.n_splits, self.shuffle, self.random_state = n_splits, shuffle, random_state
    def split(self, X):
        assert self.shuffle
        return _kfold_split(len(X), self.n_splits, self.random_state)

def _sk_confusion_matrix(y_true, y_pred):
    labels = np.unique(np.concatenate([y_true, y_pred]))
    idx = {l: i for i, l in enumerate(labels)}
    cm = np.zeros((len(labels), len(labels)), dtype=np.int64)
    for t, p in zip(y_true, y_pred):
        cm[idx[t], idx[p]] += 1
    return cm

def _sk_f1_score(y_true, y_pred, average="macro"):
    assert average == "macro"
    labels = np.unique(np.concatenate([y_true, y_pred]))
    total = 0.0
    for l in labels:
        tp = float(np.sum((y_true == l) & (y_pred == l)))
        fp = float(np.sum((y_true != l) & (y_pred == l)))
        fn = float(np.sum((y_true == l) & (y_pred != l)))
        pre = tp / (tp + fp) if tp + fp > 0 else 0.0
        re = tp / (tp + fn) if tp + fn > 0 else 0.0
        total += (2.0 * pre * re / (pre + re)) if pre + re > 0 else 0.0
    return total / len(labels)

sk_metrics = types.ModuleType("sklearn.metrics")
sk_metrics.f1_score = _sk_f1_score
sk_metrics.confusion_matrix = _sk_confusion_matrix
sk_ms = types.ModuleType("sklearn.model_selection")
sk_ms.KFold = _KFold
sklearn.metrics = sk_metrics
sklearn.model_selection = sk_ms
sys.modules["sklearn.metrics"] = sk_metrics
sys.modules["sklearn.model_selection"] = sk_ms

class _NN1:
    """Deterministic 1-NN stand-in for the aeon classifier slot. Squared
    euclidean accumulated PER FEATURE left-to-right (acc += d*d elementwise)
    so each train-row distance has the same FP op order as the Scala loop;
    argmin takes the first minimum."""
    def __init__(self, *a, **k):
        pass
    def fit(self, X, y):
        X = np.asarray(X, dtype=float)
        self.X = X.reshape(len(X), -1)
        self.y = np.asarray(y)
        return self
    def predict(self, X):
        X = np.asarray(X, dtype=float).reshape(len(X), -1)
        out = np.empty(len(X), dtype=self.y.dtype)
        for i in range(len(X)):
            acc = np.zeros(len(self.X))
            for j in range(self.X.shape[1]):
                d = self.X[:, j] - X[i, j]
                acc += d * d
            out[i] = self.y[int(np.argmin(acc))]
        return out

aeon = types.ModuleType("aeon")
aeon_cls = types.ModuleType("aeon.classification")
aeon_cls.DummyClassifier = _NN1
for sub, names in [("convolution_based", ["MultiRocketHydraClassifier", "RocketClassifier"]),
                   ("dictionary_based", ["WEASEL_V2"]),
                   ("distance_based", ["ProximityForest"]),
                   ("feature_based", ["FreshPRINCEClassifier"]),
                   ("interval_based", ["QUANTClassifier"])]:
    m = types.ModuleType(f"aeon.classification.{sub}")
    for nm in names:
        setattr(m, nm, _NN1)
    setattr(aeon_cls, sub, m)
    sys.modules[f"aeon.classification.{sub}"] = m
rdst = types.ModuleType("aeon.classification.shapelet_based._rdst")
rdst.RDSTClassifier = _NN1
shp = types.ModuleType("aeon.classification.shapelet_based")
shp._rdst = rdst
sys.modules["aeon.classification.shapelet_based"] = shp
sys.modules["aeon.classification.shapelet_based._rdst"] = rdst
aeon.classification = aeon_cls
sys.modules["aeon"] = aeon
sys.modules["aeon.classification"] = aeon_cls
nx = types.ModuleType("networkx")
sys.modules["networkx"] = nx

from claspy.clap import CLaP
from claspy.state_detection import AgglomerativeCLaPDetection


def gen_state_series(pattern, seg_len, seed, n_dims=1):
    """Recurring-state series: each state id is a distinct waveform."""
    rng = np.random.RandomState(seed)
    dims = []
    for d in range(n_dims):
        parts = []
        for st in pattern:
            t = np.arange(seg_len)
            s = (st + d) % 4
            if s == 0:
                part = np.sin(2 * np.pi * t / 10.0) + 0.1 * rng.randn(seg_len)
            elif s == 1:
                part = 0.5 * np.sin(2 * np.pi * t / 31.0) + 2.0 + 0.1 * rng.randn(seg_len)
            elif s == 2:
                part = 0.2 * rng.randn(seg_len) - 1.5
            else:
                part = np.sign(np.sin(2 * np.pi * t / 17.0)) + 0.1 * rng.randn(seg_len)
            parts.append(part)
        dims.append(np.concatenate(parts))
    ts = np.stack(dims, axis=1)
    cps = np.array([seg_len * (i + 1) for i in range(len(pattern) - 1)], dtype=np.int64)
    return ts, cps


# 8a. RNG + KFold parity primitives
prim = {"permutations": [], "kfolds": []}
for n, seed in [(10, 2357), (37, 2357), (100, 42)]:
    rs = np.random.RandomState(seed)
    arr = np.arange(n)
    rs.shuffle(arr)
    prim["permutations"].append({"n": n, "seed": seed, "perm": [int(v) for v in arr]})
for n, k, seed in [(23, 5, 2357), (57, 5, 2357), (11, 3, 2357)]:
    folds = [{"train": [int(v) for v in tr], "test": [int(v) for v in te]}
             for tr, te in _kfold_split(n, k, seed)]
    prim["kfolds"].append({"n": n, "k": k, "seed": seed, "folds": folds})
dump("sklearn_prim", prim)

# 8b. CLaP internals on one labeled series
ts_c, cps_c = gen_state_series([0, 1, 0, 1], 150, 31)
from claspy.utils import create_state_labels as _csl
state_labels_c = _csl(cps_c, np.arange(len(cps_c) + 1), ts_c.shape[0])
clap_cases = []
for w, sample_size in [(10, 1000), (10, 20), (16, 25)]:
    clap = CLaP(window_size=w, classifier="dummy", sample_size=sample_size)
    X, y = clap._create_dataset(ts_c, state_labels_c)
    starts = []
    excl = np.full(ts_c.shape[0], False)
    for cp in (np.arange(state_labels_c.shape[0] - 1)[state_labels_c[:-1] != state_labels_c[1:]] + 1):
        excl[cp - w // 2 + 1:cp] = True
    for idx in range(0, ts_c.shape[0] - w + 1, w // 2):
        if not excl[idx]:
            starts.append(idx)
    # subselect indices: rerun with X = global indices (RNG use is X-independent)
    idxX, idxY = clap._subselect_dataset(
        np.arange(len(y), dtype=float).reshape(-1, 1), y)
    sel = [int(v) for v in idxX.flatten()]
    y_true, y_pred = clap.fit_transform(ts_c, state_labels_c)
    clap_cases.append({
        "window_size": w, "sample_size": sample_size,
        "dataset_y": [int(v) for v in y],
        "dataset_starts": starts,
        "subselect_idx": sel,
        "subselect_y": [int(v) for v in idxY],
        "y_true": [int(v) for v in y_true],
        "y_pred": [int(v) for v in y_pred],
        "score": float(clap.score()),
    })
dump("clap", {
    "ts": [float(v) for v in ts_c[:, 0]],
    "cps": [int(v) for v in cps_c],
    "cases": clap_cases,
})

# 8c. detector end-to-end
det_cases = []
for name, pattern, seg_len, seed, n_dims, w, sample_size, give_cps in [
        ("uni_abab", [0, 1, 0, 1], 150, 31, 1, 10, 1000, True),
        ("uni_abcabc", [0, 1, 2, 0, 1, 2], 120, 32, 1, 16, 1000, True),
        ("uni_aba", [0, 1, 0], 200, 33, 1, 20, 1000, True),
        ("uni_subsample", [0, 1, 0, 1], 300, 34, 1, 10, 20, True),
        ("uni_auto", [1, 3, 1, 3], 400, 35, 1, None, 1000, False),
        ("mv_ab", [0, 1, 0], 150, 36, 2, 12, 1000, True),
        ("mv_subsample_auto", [0, 1, 0, 1, 2], 220, 37, 2, None, 30, True)]:
    ts2d, cps = gen_state_series(pattern, seg_len, seed, n_dims)
    det = AgglomerativeCLaPDetection(
        window_size=(w if w is not None else "suss"), classifier="dummy",
        sample_size=sample_size, n_jobs=1)
    det.fit(ts2d, change_points=(cps if give_cps else None))
    states, transitions = det.get_process()
    det_cases.append({
        "name": name,
        "dims": [[float(v) for v in ts2d[:, d]] for d in range(n_dims)],
        "cps_in": ([int(v) for v in cps] if give_cps else None),
        "window_size_param": w,
        "sample_size": sample_size,
        "resolved_window": int(det.window_size),
        "detected_cps_in": [int(v) for v in det.change_points],
        "labels": [int(v) for v in det.labels],
        "segment_labels": [int(v) for v in det.get_segment_labels()],
        "change_points": [int(v) for v in det.get_change_points()],
        "dense": [int(v) for v in det.predict()],
        "states": sorted(int(s) for s in states),
        "transitions": sorted([int(a), int(b)] for a, b in transitions),
    })
dump("state_detection", {"cases": det_cases})


# 9. parameter-grid goldens (alternative distances, score_threshold
# validation) + evaluation-metric reference values
param_cases = []
for dist in ["euclidean_distance", "cinvariant_euclidean_distance"]:
    for kind, n, seed in [("freq_shift", 1200, 41), ("amp_freq", 1600, 42)]:
        ts, true_cps = gen_series(kind, n, seed)
        seg = BinaryClaSPSegmentation(distance=dist, n_jobs=1)
        cps = seg.fit_predict(ts)
        param_cases.append({
            "distance": dist, "kind": kind, "ts": ts.tolist(),
            "window_size": int(seg.window_size),
            "cps": [int(c) for c in cps],
            "profile": [None if np.isnan(v) else float(v) for v in seg.profile],
        })
st_cases = []
for thr, kind, n, seed in [(0.75, "freq_shift", 1200, 43), (0.6, "var_shift", 900, 44)]:
    ts, _ = gen_series(kind, n, seed)
    seg = BinaryClaSPSegmentation(validation="score_threshold", threshold=thr, n_jobs=1)
    cps = seg.fit_predict(ts)
    st_cases.append({"threshold": thr, "kind": kind, "ts": ts.tolist(),
                     "window_size": int(seg.window_size),
                     "cps": [int(c) for c in cps]})
dump("param_grid", {"distance_cases": param_cases, "score_threshold_cases": st_cases})

sk_pairwise = types.ModuleType("sklearn.metrics.pairwise")
sk_pairwise.paired_euclidean_distances = lambda a, b: np.sqrt(
    np.sum((np.asarray(a, dtype=float) - np.asarray(b, dtype=float)) ** 2, axis=1))
sk_metrics.pairwise = sk_pairwise
sk_metrics.__path__ = []  # let "sklearn.metrics.pairwise" import as a subpackage
sys.modules["sklearn.metrics.pairwise"] = sk_pairwise

from claspy.tests.evaluation import covering, f_measure, relative_change_point_distance
eval_cases = []
rngE = np.random.RandomState(99)
for i in range(6):
    n = int(rngE.randint(500, 3000))
    k = int(rngE.randint(1, 6))
    cps_true = np.sort(rngE.choice(np.arange(10, n - 10), k, replace=False)).astype(np.int64)
    # jittered predictions of the same cardinality (for rel_cp_distance) ...
    jitter = rngE.randint(-20, 21, size=k)
    cps_pred_same = np.clip(cps_true + jitter, 1, n - 1).astype(np.int64)
    # ... and an independent prediction set (for f_measure/covering)
    kp = int(rngE.randint(1, 7))
    cps_pred = np.sort(rngE.choice(np.arange(10, n - 10), kp, replace=False)).astype(np.int64)
    eval_cases.append({
        "n": n,
        "cps_true": [int(v) for v in cps_true],
        "cps_pred_same": [int(v) for v in cps_pred_same],
        "cps_pred": [int(v) for v in cps_pred],
        "rel_cp_dist": float(relative_change_point_distance(cps_true, cps_pred_same, n)),
        "f_measure": float(f_measure({0: cps_true}, cps_pred, margin=5)),
        "f_measure_m20": float(f_measure({0: cps_true}, cps_pred, margin=20)),
        "covering": float(covering({0: cps_true}, cps_pred, n)),
    })
# one multi-annotator f_measure/covering case
ann = {0: np.array([100, 500, 900]), 1: np.array([110, 480]), 2: np.array([95, 505, 910, 1200])}
pred = np.array([105, 490, 905])
eval_multi = {
    "n": 1500,
    "annotations": [[int(v) for v in a] for a in ann.values()],
    "cps_pred": [int(v) for v in pred],
    "f_measure": float(f_measure(ann, pred, margin=5)),
    "covering": float(covering(ann, pred, 1500)),
}
dump("eval_metrics", {"cases": eval_cases, "multi": eval_multi})


# 10. TSSB / HAS file-format loader fixtures + goldens: write small datasets
# in the benchmarks' EXACT on-disk formats, then run the reference's own
# load_tssb_dataset / load_has_dataset on them (extract_path=local, so no
# network) and dump what they return.
import io, zipfile
import pandas as pd
from claspy.data_loader import load_tssb_dataset, load_has_dataset

LOADER_DIR = "/root/repo/src/test/resources/loaders"
tssb_dir = os.path.join(LOADER_DIR, "tssb")
has_dir = os.path.join(LOADER_DIR, "has")
os.makedirs(tssb_dir, exist_ok=True)
os.makedirs(has_dir, exist_ok=True)

# --- TSSB format: desc.txt (name,window,cp...), properties.txt
# (name,interpretable,label_cut,resample_rate,label...), <name>.txt (floats)
tssb_fixtures = []
for name, kind, n, seed, w, labels in [
        ("SynthFreq", "freq_shift", 1200, 51, 14, [0, 1]),
        ("SynthAmp", "amp_freq", 1600, 52, 21, [0, 1, 0, 2])]:
    ts, cps = gen_series(kind, n, seed)
    tssb_fixtures.append((name, w, cps, labels, ts))
with open(os.path.join(tssb_dir, "desc.txt"), "w") as f:
    for name, w, cps, labels, ts in tssb_fixtures:
        f.write(",".join([name, str(w)] + [str(c) for c in cps]) + "\n")
with open(os.path.join(tssb_dir, "properties.txt"), "w") as f:
    for name, w, cps, labels, ts in tssb_fixtures:
        f.write(",".join([name, "True", "0", "1"] + [str(l) for l in labels]) + "\n")
for name, w, cps, labels, ts in tssb_fixtures:
    with open(os.path.join(tssb_dir, name + ".txt"), "w") as f:
        for v in ts:
            f.write(repr(float(v)) + "\n")

tssb_loaded = load_tssb_dataset(extract_path=tssb_dir)
tssb_golden = []
for _, (dataset, window_size, cps, labels, time_series) in tssb_loaded.iterrows():
    seg = BinaryClaSPSegmentation(n_jobs=1)
    found = seg.fit_predict(time_series)
    tssb_golden.append({
        "dataset": dataset, "window_size": int(window_size),
        "cps": [int(c) for c in cps],
        "labels": [int(l) for l in labels],
        "ts_head": [float(v) for v in time_series[:8]],
        "ts_len": int(time_series.shape[0]),
        "segmentation_cps": [int(c) for c in found],
    })
dump("tssb_loader", {"cases": tssb_golden})

# --- HAS format: zipped CSV with python-list cells
rngH = np.random.RandomState(77)
def _lst(a):
    return "[" + ", ".join(repr(float(v)) for v in a) + "]"
rows = []
for i, group in enumerate(["indoor", "outdoor"]):
    n = 400
    cps = [130, 260]
    acts = "['walk', 'sit', 'walk']" if group == "indoor" else "['run', 'stand', 'run']"
    sig = {}
    sensors = (["x-acc", "y-acc", "z-acc", "x-gyro", "y-gyro", "z-gyro",
                "x-mag", "y-mag", "z-mag"] if group == "indoor"
               else ["x-acc", "y-acc", "z-acc", "x-mag", "y-mag", "z-mag"])
    # waveform keyed on the ACTIVITY (recurring segments share a shape, so
    # state detection can merge them), distinct per sensor
    act_ids = [0, 1, 0]
    for s_i, s in enumerate(sensors):
        parts = []
        for seg_i, b in enumerate([(0, 130), (130, 260), (260, 400)]):
            t = np.arange(b[1] - b[0])
            period = 8.0 + 7 * ((act_ids[seg_i] + s_i) % 3)
            parts.append(np.sin(2 * np.pi * t / period) + 0.1 * rngH.randn(len(t)))
        sig[s] = np.concatenate(parts)
    row = {
        "group": group, "subject": i + 1, "routine": 1, "ts_challenge_id": 100 + i,
        "change_points": "[130, 260]", "activities": acts,
        "lat": "[]", "lon": "[]", "speed": "[]",
    }
    for s in ["x-acc", "y-acc", "z-acc", "x-gyro", "y-gyro", "z-gyro", "x-mag", "y-mag", "z-mag"]:
        row[s] = _lst(sig[s]) if s in sig else "[]"
    rows.append(row)
has_df = pd.DataFrame(rows)
csv_bytes = has_df.to_csv(index=False).encode()
with zipfile.ZipFile(os.path.join(has_dir, "has.csv.zip"), "w", zipfile.ZIP_DEFLATED) as z:
    z.writestr("has.csv", csv_bytes)

has_loaded = load_has_dataset(extract_path=has_dir)
has_golden = []
for _, (dataset, window_size, cps, labels, time_series) in has_loaded.iterrows():
    has_golden.append({
        "dataset": dataset, "window_size": int(window_size),
        "cps": [int(c) for c in cps],
        "labels": [str(l) for l in labels],
        "n_dims": int(time_series.shape[1]),
        "ts_len": int(time_series.shape[0]),
        "dims_head": [[float(v) for v in time_series[:5, d]] for d in range(time_series.shape[1])],
        "dims_sum": [repr(float(np.sum(time_series[:, d]))) for d in range(time_series.shape[1])],
    })
dump("has_loader", {"cases": has_golden})


# 11. aggregate covering-parity corpus (mirrors the DATASET-level semantics of
# claspy/tests/segmentation_test.py:31-45: many series, per-series cps, and a
# mean-covering floor). Real TSSB data is unavailable offline, so the corpus
# is synthetic with TSSB-like statistics: 34 series, lengths 286..17000,
# 1..9 change points, per-segment regime = {sine, square, sawtooth, AM} with
# randomized period/amplitude. Everything below runs the ACTUAL reference
# (BinaryClaSPSegmentation + claspy's own covering) and records its outputs.

def gen_corpus_series(seed, n):
    rng = np.random.RandomState(seed)
    max_k = max(1, min(9, n // 300 - 1))
    k = int(rng.randint(1, max_k + 1))
    while True:
        raw = rng.rand(k + 1) + 0.35
        bounds = np.cumsum(raw / raw.sum() * n).astype(np.int64)[:-1]
        bounds = np.unique(np.clip(bounds, 130, n - 130))
        if len(bounds) == k and np.diff(np.array([0] + list(bounds) + [n])).min() >= 130:
            break
    shapes = rng.randint(0, 4, size=k + 1)
    periods = rng.choice(np.array([9.0, 14.0, 21.0, 33.0, 50.0]), size=k + 1)
    amps = 0.6 + 2.0 * rng.rand(k + 1)
    for i in range(1, k + 1):
        # adjacent segments must differ in shape or period (z-normed distance
        # is amplitude/level invariant, so amp alone is not a regime change)
        if shapes[i] == shapes[i - 1] and periods[i] == periods[i - 1]:
            shapes[i] = (shapes[i] + 1 + rng.randint(3)) % 4
    b = [0] + [int(v) for v in bounds] + [n]
    parts = []
    for i in range(k + 1):
        m = b[i + 1] - b[i]
        t = np.arange(m)
        p = periods[i]
        s = shapes[i]
        if s == 0:
            part = np.sin(2 * np.pi * t / p)
        elif s == 1:
            part = np.sign(np.sin(2 * np.pi * t / p))
        elif s == 2:
            part = (np.mod(t, p) / p) * 2.0 - 1.0
        else:
            part = np.sin(2 * np.pi * t / p) * np.sin(2 * np.pi * t / (4.7 * p))
        parts.append(amps[i] * part + 0.12 * rng.randn(m))
    return np.concatenate(parts), [int(v) for v in bounds]


CORPUS = [(101, 286), (102, 350), (103, 450), (104, 560), (105, 640),
          (106, 720), (107, 800), (108, 800), (109, 900), (110, 1000),
          (111, 1000), (112, 1100), (113, 1200), (114, 1200), (115, 1400),
          (116, 1500), (117, 1600), (118, 1800), (119, 2000), (120, 2000),
          (121, 2200), (122, 2400), (123, 2600), (124, 2800), (125, 3000),
          (126, 3200), (127, 3600), (128, 4000), (129, 4400), (130, 5000),
          (131, 6000), (132, 8000), (133, 12000), (134, 17000)]

import time as _time
import warnings as _warnings
corpus_rows = []
for seed, n in CORPUS:
    ts, true_cps = gen_corpus_series(seed, n)
    t0 = _time.time()
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        seg = BinaryClaSPSegmentation(n_jobs=1)
        pred = seg.fit_predict(ts)
    cov = float(covering({0: np.array(true_cps, dtype=np.int64)},
                         np.array(pred, dtype=np.int64), n))
    corpus_rows.append({
        "seed": seed, "n": n, "ts": ts.tolist(), "true_cps": true_cps,
        "window_size": int(seg.window_size),
        "cps": [int(c) for c in pred],
        "covering": cov,
    })
    print(f"corpus seed={seed} n={n} k_true={len(true_cps)} "
          f"k_pred={len(pred)} covering={cov:.4f} ({_time.time()-t0:.1f}s)",
          flush=True)
mean_cov = float(np.mean([r["covering"] for r in corpus_rows]))
dump("corpus_segmentation", {
    "cases": corpus_rows,
    "mean_covering": mean_cov,
    "n_series": len(corpus_rows),
})
print("corpus mean covering:", mean_cov)


# 12. streaming covering corpus (streaming_segmentation_test.py:16-31
# semantics: replay series through StreamingClaSPSegmentation, dataset-level
# covering floor over the logged global change points).
STREAM_CORPUS = [(201, 2000, 1000, 300), (202, 2200, 1000, 300),
                 (203, 2400, 1200, 400), (204, 2600, 1200, 400),
                 (205, 2800, 1400, 400), (206, 3000, 1400, 400),
                 (207, 3200, 1500, 500), (208, 2000, 800, 250),
                 (209, 2500, 1250, 350), (210, 3000, 1000, 300)]
stream_rows = []
for seed, n, n_tp, n_wu in STREAM_CORPUS:
    ts, true_cps = gen_corpus_series(seed, n)
    t0 = _time.time()
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        stream = StreamingClaSPSegmentation(n_timepoints=n_tp, n_warmup=n_wu,
                                            window_size="suss", log_cps=True)
        for x in ts:
            stream.update(x)
    log = [int(c) for c in stream.change_points]
    cov = float(covering({0: np.array(true_cps, dtype=np.int64)},
                         np.array(log, dtype=np.int64), n))
    stream_rows.append({
        "seed": seed, "n": n, "n_timepoints": n_tp, "n_warmup": n_wu,
        "ts": ts.tolist(), "true_cps": true_cps,
        "window_size": int(stream.window_size),
        "last_cp": int(stream.last_cp),
        "change_points": log,
        "covering": cov,
    })
    print(f"stream corpus seed={seed} n={n} k_true={len(true_cps)} "
          f"k_pred={len(log)} covering={cov:.4f} ({_time.time()-t0:.1f}s)",
          flush=True)
mean_scov = float(np.mean([r["covering"] for r in stream_rows]))
dump("corpus_streaming", {
    "cases": stream_rows,
    "mean_covering": mean_scov,
    "n_series": len(stream_rows),
})
print("stream corpus mean covering:", mean_scov)
