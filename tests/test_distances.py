"""Per-space distance kernel correctness vs slow numpy references
(SURVEY.md §4: 'per-kernel distance tests against gold standard')."""

import numpy as np
import pytest

from tpu_knn.core.dataset import DataKind, DataStore
from tpu_knn.core.params import Params
from tpu_knn.core.registry import create_space


def _np_distances(space_name, q, x, p=None, alpha=None, beta=None):
    """Straight-line numpy implementations of the reference formulas."""
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    if space_name == "l2":
        return np.sqrt(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    if space_name == "l1":
        return np.abs(q[:, None, :] - x[None, :, :]).sum(-1)
    if space_name == "linf":
        return np.abs(q[:, None, :] - x[None, :, :]).max(-1)
    if space_name == "lp":
        return (np.abs(q[:, None, :] - x[None, :, :]) ** p).sum(-1) ** (1.0 / p)
    if space_name == "cosinesimil":
        return 1.0 - qn @ xn.T
    if space_name == "angulardist":
        return np.arccos(np.clip(qn @ xn.T, -1, 1))
    if space_name == "negdotprod":
        return -(q @ x.T)
    if space_name == "kldivfast":
        return (q[:, None, :] * np.log(q[:, None, :] / x[None, :, :])).sum(-1)
    if space_name == "kldivfastrq":
        return (x[None, :, :] * np.log(x[None, :, :] / q[:, None, :])).sum(-1)
    if space_name == "kldivgenfast":
        a, b = q[:, None, :], x[None, :, :]
        return (a * np.log(a / b) - a + b).sum(-1)
    if space_name == "kldivgenfastrq":
        a, b = x[None, :, :], q[:, None, :]
        return (a * np.log(a / b) - a + b).sum(-1)
    if space_name == "itakurasaitofast":
        a, b = q[:, None, :], x[None, :, :]
        return (a / b - np.log(a / b) - 1).sum(-1)
    if space_name == "itakurasaitofastrq":
        a, b = x[None, :, :], q[:, None, :]
        return (a / b - np.log(a / b) - 1).sum(-1)
    if space_name in ("js_div_slow", "jsmetrfast"):
        a, b = q[:, None, :], x[None, :, :]
        m = 0.5 * (a + b)
        t = lambda v: np.where(v > 0, v * np.log(np.maximum(v, 1e-38) / m), 0.0)
        js = 0.5 * (t(a) + t(b)).sum(-1)
        return np.sqrt(np.maximum(js, 0)) if space_name == "jsmetrfast" else js
    if space_name == "renyidiv_fast":
        a, b = q[:, None, :], x[None, :, :]
        return np.log((a**alpha * b ** (1 - alpha)).sum(-1)) / (alpha - 1)
    if space_name == "abdiv_fast":
        a, b = q[:, None, :], x[None, :, :]
        s = alpha + beta
        v = (a**alpha * b**beta - alpha / s * a**s - beta / s * b**s).sum(-1)
        return -v / (alpha * beta)
    raise ValueError(space_name)


DENSE_SPACES = [
    ("l2", {"dim": 24}),
    ("l1", {}),
    ("linf", {}),
    ("lp", {"p": 3.0}),
    ("cosinesimil", {"dim": 24}),
    ("angulardist", {}),
    ("negdotprod", {}),
    ("kldivfast", {}),
    ("kldivfastrq", {}),
    ("kldivgenfast", {}),
    ("kldivgenfastrq", {}),
    ("itakurasaitofast", {}),
    ("itakurasaitofastrq", {}),
    ("js_div_slow", {}),
    ("jsmetrfast", {}),
    ("renyidiv_fast", {"alpha": 0.75}),
    ("abdiv_fast", {"alpha": 1.2, "beta": 0.7}),
]


@pytest.mark.parametrize("name,params", DENSE_SPACES)
def test_dense_space_blocked_matches_numpy(name, params, rng):
    d = 24
    q = rng.random((5, d)).astype(np.float32) + 0.1  # positive for divergences
    x = rng.random((17, d)).astype(np.float32) + 0.1
    space = create_space(name, Params(params))
    store = DataStore(DataKind.DENSE)
    store.add_dense_batch(x)
    data = space.encode_dataset(store)
    qenc = space.encode_queries(q)
    got = np.asarray(space.block(qenc, space.slice_data(data, 0, data.ids.shape[0])))
    got = got[:, : x.shape[0]]
    want = _np_distances(
        name, q, x, p=params.get("p"), alpha=params.get("alpha"), beta=params.get("beta")
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_l2sqr_sift_exact_int(rng):
    q = rng.integers(0, 256, (4, 128), dtype=np.uint8)
    x = rng.integers(0, 256, (9, 128), dtype=np.uint8)
    space = create_space("l2sqr_sift", Params({"dim": 128}))
    store = DataStore(DataKind.UINT8)
    store.add_uint8_batch(x)
    data = space.encode_dataset(store)
    qenc = space.encode_queries(q)
    got = np.asarray(space.block(qenc, space.slice_data(data, 0, data.ids.shape[0])))[:, :9]
    want = ((q[:, None, :].astype(np.int64) - x[None, :, :].astype(np.int64)) ** 2).sum(-1)
    # must be exact integers (reference: distcomp_l2sqr_sift.cc int kernel)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_pairwise_get_distance():
    space = create_space("l2", Params({"dim": 4}))
    a = [0.0, 0.0, 0.0, 0.0]
    b = [1.0, 1.0, 0.0, 0.0]
    assert abs(space.pairwise(a, b) - np.sqrt(2.0)) < 1e-6
