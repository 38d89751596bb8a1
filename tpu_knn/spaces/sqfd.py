"""SQFD — signature quadratic form distance (reference:
include/space/space_sqfd.h, src/space/space_sqfd.cc). The reference
ships this space but EXCLUDES it from its build (build.zig:16,
WITH_EXTRAS); we implement it anyway because the quadratic form is
naturally MXU work.

An object is a *signature*: a set of (weight, center in R^d) clusters.
With W = [w_a, -w_b] and A[i,j] = f(L2(c_i, c_j)) over the union of both
signatures' centers (space_sqfd.cc HiddenDistance):

    SQFD(a, b) = sqrt( W^T A W )
               = sqrt( s_a + s_b - 2 * w_a^T F_ab w_b )

where s_x = w_x^T F_xx w_x is a per-object self-term precomputed at
encode time, and the cross term F_ab = f(L2(centers_a, centers_b)) is a
blocked matmul over all center pairs. Similarity functions
(space_sqfd.h:49-99):

    sqfd_minus_func      f(d) = -d
    sqfd_heuristic_func  f(d) = 1 / (alpha + d)
    sqfd_gaussian_func   f(d) = exp(-alpha d^2)

Input format: each object is a JSON string
``{"weights": [...], "centers": [[...d floats...], ...]}`` added via
add_string_batch (the reference reads a multi-line text format from
disk; JSON carries the same payload through the batch API). Padding
clusters have weight 0 and therefore contribute nothing.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import DataKind, DataStore, DistKind, StringDeviceData, round_up
from ..core.errors import InvalidArgumentError
from ..core.params import ParamManager, Params
from ..core.registry import register_space
from .base import Space
from .dense import PAD_TERM


def _pair_l2(ca, cb):
    """L2 distances between two center sets: [A, d] x [B, d] -> [A, B]."""
    g = jnp.dot(ca, cb.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    sa = jnp.sum(ca * ca, axis=1)
    sb = jnp.sum(cb * cb, axis=1)
    return jnp.sqrt(jnp.maximum(sa[:, None] + sb[None, :] - 2 * g, 0.0))


class SqfdSpaceBase(Space):
    data_kind = DataKind.STRING
    dist_kind = DistKind.FLOAT
    #: cross term materializes [Q*Cq, X*Cx]; keep corpus chunks small
    preferred_chunk = 128

    def __init__(self, params: Params | None = None):
        super().__init__(params)
        pm = ParamManager(self.params)
        self.alpha = pm.get("alpha", 1.0, float)
        pm.check_unused()

    def _f(self, d):
        raise NotImplementedError

    # -- parsing --
    @staticmethod
    def _parse(points):
        sigs = []
        for p in points:
            s = p.decode("utf-8") if isinstance(p, bytes) else str(p)
            try:
                o = json.loads(s)
            except json.JSONDecodeError as e:
                raise InvalidArgumentError(f"bad SQFD signature JSON: {e}")
            w = np.asarray(o["weights"], np.float32)
            c = np.asarray(o["centers"], np.float32)
            if c.ndim != 2 or w.shape[0] != c.shape[0]:
                raise InvalidArgumentError("SQFD: weights/centers shape mismatch")
            sigs.append((w, c))
        return sigs

    def _pack(self, sigs, n_pad: int):
        cmax = round_up(max((w.shape[0] for w, _ in sigs), default=1), 8)
        d = sigs[0][1].shape[1] if sigs else 1
        dp = round_up(max(d, 1), 8)
        weights = np.zeros((n_pad, cmax), np.float32)
        centers = np.zeros((n_pad, cmax, dp), np.float32)
        for i, (w, c) in enumerate(sigs):
            if c.shape[1] != d:
                raise InvalidArgumentError("SQFD: differing feature dimensions")
            weights[i, : w.shape[0]] = w
            centers[i, : c.shape[0], :d] = c
        return weights, centers

    def _self_terms(self, weights, centers):
        """s_x = w^T f(L2(c, c)) w, batched over objects."""

        def one(w, c):
            f = self._f(_pair_l2(c, c))
            return w @ f @ w

        return jax.vmap(one)(jnp.asarray(weights), jnp.asarray(centers))

    # -- Space interface --
    def encode_dataset(self, store: DataStore, row_multiple: int = 8):
        sigs = self._parse(store.strings())
        n = len(sigs)
        n_pad = round_up(max(n, 1), row_multiple)
        weights, centers = self._pack(sigs, n_pad)
        pad = np.zeros(n_pad, np.float32)
        pad[n:] = PAD_TERM
        ids = np.full(n_pad, -1, np.int32)
        ids[:n] = np.asarray(store.ids, np.int32)
        data = StringDeviceData(
            chars=jnp.zeros((n_pad, 1), jnp.int32),
            length=jnp.zeros(n_pad, jnp.int32),
            ids=jnp.asarray(ids),
            count=n,
        )
        data.extra["pad"] = jnp.asarray(pad)
        data.extra["w"] = jnp.asarray(weights)
        data.extra["c"] = jnp.asarray(centers)
        data.extra["self"] = self._self_terms(weights, centers)
        return data

    def encode_queries(self, points):
        sigs = self._parse(points)
        weights, centers = self._pack(sigs, len(sigs))
        return {
            "qw": jnp.asarray(weights),
            "qc": jnp.asarray(centers),
            "q_self": self._self_terms(weights, centers),
        }

    def slice_data(self, data, start, size) -> dict:
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, size, 0)
        return {
            "x": sl(data.extra["w"]),
            "c": sl(data.extra["c"]),
            "self": sl(data.extra["self"]),
            "pad": sl(data.extra["pad"]),
        }

    def corpus_dict(self, data) -> dict:
        c = {
            "vecs": data.extra["w"],
            "c": data.extra["c"],
            "self": data.extra["self"],
            "pad": data.extra["pad"],
            "count": data.count,  # static pad mask in gather paths
        }
        if "row_mask" in data.extra:
            c["row_mask"] = data.extra["row_mask"]
        return c

    def block(self, qenc, xc, precision: str = "float32"):
        qw, qc = qenc["qw"], qenc["qc"]  # [Q, Cq], [Q, Cq, d]
        xw, xcen = xc["x"], xc["c"]  # [X, Cx], [X, Cx, d]
        q, cq, d = qc.shape
        x, cx, _ = xcen.shape
        # all cross center distances as one [Q*Cq, X*Cx] matmul
        dd = _pair_l2(qc.reshape(q * cq, d), xcen.reshape(x * cx, d))
        f = self._f(dd).reshape(q, cq, x, cx)
        cross = jnp.einsum("qi,qixj,xj->qx", qw, f, xw)
        sq = qenc["q_self"][:, None] + xc["self"][None, :] - 2.0 * cross
        return jnp.sqrt(jnp.maximum(sq, 0.0)) + xc["pad"][None, :]


@register_space("sqfd_minus_func")
class SqfdMinus(SqfdSpaceBase):
    name = "sqfd_minus_func"

    def _f(self, d):
        return -d


@register_space("sqfd_heuristic_func")
class SqfdHeuristic(SqfdSpaceBase):
    name = "sqfd_heuristic_func"

    def _f(self, d):
        return 1.0 / (self.alpha + d)


@register_space("sqfd_gaussian_func")
class SqfdGaussian(SqfdSpaceBase):
    name = "sqfd_gaussian_func"

    def _f(self, d):
        return jnp.exp(-self.alpha * d * d)
