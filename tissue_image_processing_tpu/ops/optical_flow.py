"""Pyramidal TV-L1 optical flow (Zach et al. 2007), JAX/TPU.

TPU-native replacement for ``skimage.registration.optical_flow_tvl1`` as used by
the reference's legacy tracker (``tissue_info.py:2061-2071``, the ``use_piv``
branch): a dense per-pixel displacement map that replaces the single global
drift when stage correction fails (nonuniform tissue motion, flow chamber
wobble).

Design: every step is a fixed-iteration-count fused elementwise pass — the
duality-based TV-L1 solver (pointwise threshold on the residual + Chambolle
dual ascent on the flow gradient, IPOL Sanchez-Perez et al. 2013 structure) has
no data-dependent control flow, so the whole pyramid jits into one XLA program.
The only gathers are the per-warp bilinear image warps (num_warp per level);
everything else is shifts/adds on (H, W) planes, which XLA fuses into a few
VPU passes per iteration.

Convention: ``optical_flow_tvl1(ref, mov)`` returns ``flow`` with shape
(2, H, W) such that ``mov(r + flow(r)) ~= ref(r)`` (skimage's convention).
For tracking use ``flow = optical_flow_tvl1(cur, prev)`` and the cell at
previous-frame position ``y`` is found near ``y - flow(y)`` in the current
frame (see ``core/tracking.py:track_movie_nearest_pixel``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["optical_flow_tvl1", "warp_bilinear"]


def warp_bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` at (y + u, x + v) with bilinear weights, edge-clamped."""
    H, W = img.shape
    yy = jnp.arange(H, dtype=jnp.float32)[:, None] + u
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] + v
    yy = jnp.clip(yy, 0.0, H - 1.0)
    xx = jnp.clip(xx, 0.0, W - 1.0)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = yy - y0
    fx = xx - x0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _grad(f):
    """Forward differences with zero at the far edge (standard TV discretization)."""
    gy = jnp.concatenate([f[1:] - f[:-1], jnp.zeros((1, f.shape[1]), f.dtype)], 0)
    gx = jnp.concatenate([f[:, 1:] - f[:, :-1],
                          jnp.zeros((f.shape[0], 1), f.dtype)], 1)
    return gy, gx


def _div(py, px):
    """Adjoint of ``_grad``: backward-difference divergence."""
    dy = jnp.concatenate([py[:1], py[1:-1] - py[:-2], -py[-2:-1]], 0)
    dx = jnp.concatenate([px[:, :1], px[:, 1:-1] - px[:, :-2], -px[:, -2:-1]], 1)
    return dy + dx


def _tvl1_level(I0, I1, u, v, attachment, tightness, num_warp, num_iter, tau=0.25):
    """One pyramid level of the TV-L1 solver (flow refined in place).

    Both the warp loop and the inner proximal loop are ``lax.fori_loop``s: the
    body is a fixed elementwise pass (bandwidth-bound — no cross-iteration
    fusion to lose), and rolling it keeps the XLA graph O(1) in
    num_warp*num_iter instead of unrolling ~50 copies per pyramid level
    (which dominated compile time)."""
    th = attachment * tightness  # lambda * theta threshold scale
    sigma = tau / tightness

    def warp_body(_, uv):
        u0, v0 = uv
        I1w = warp_bilinear(I1, u0, v0)
        # gradients of the WARPED moving image (central differences)
        Iy = (jnp.roll(I1w, -1, 0) - jnp.roll(I1w, 1, 0)) * 0.5
        Ix = (jnp.roll(I1w, -1, 1) - jnp.roll(I1w, 1, 1)) * 0.5
        grad2 = Iy * Iy + Ix * Ix
        safe = jnp.maximum(grad2, 1e-8)
        rho_c = I1w - Iy * u0 - Ix * v0 - I0

        def prox_body(_, st):
            u, v, pyu, pxu, pyv, pxv = st
            rho = rho_c + Iy * u + Ix * v
            # pointwise threshold (the L1 data-term proximal step)
            case_neg = rho < -th * grad2
            case_pos = rho > th * grad2
            du = jnp.where(case_neg, th * Iy,
                           jnp.where(case_pos, -th * Iy, -rho * Iy / safe))
            dv = jnp.where(case_neg, th * Ix,
                           jnp.where(case_pos, -th * Ix, -rho * Ix / safe))
            vu = u + du
            vv = v + dv
            # TV proximal via Chambolle dual ascent
            u = vu + tightness * _div(pyu, pxu)
            v = vv + tightness * _div(pyv, pxv)
            gy, gx = _grad(u)
            pyu = pyu + sigma * gy
            pxu = pxu + sigma * gx
            nu = jnp.maximum(1.0, jnp.sqrt(pyu * pyu + pxu * pxu))
            pyu, pxu = pyu / nu, pxu / nu
            gy, gx = _grad(v)
            pyv = pyv + sigma * gy
            pxv = pxv + sigma * gx
            nv = jnp.maximum(1.0, jnp.sqrt(pyv * pyv + pxv * pxv))
            pyv, pxv = pyv / nv, pxv / nv
            return (u, v, pyu, pxu, pyv, pxv)

        z = jnp.zeros_like(u0)
        st = jax.lax.fori_loop(0, num_iter,
                               prox_body, (u0, v0, z, z, z, z))
        return st[0], st[1]

    return jax.lax.fori_loop(0, num_warp, warp_body, (u, v))


@functools.partial(jax.jit, static_argnames=("attachment", "tightness",
                                             "num_warp", "num_iter", "min_size"))
def optical_flow_tvl1(reference: jnp.ndarray, moving: jnp.ndarray,
                      attachment: float = 15.0, tightness: float = 0.3,
                      num_warp: int = 5, num_iter: int = 10,
                      min_size: int = 16) -> jnp.ndarray:
    """Dense flow (2, H, W) with ``moving(r + flow(r)) ~= reference(r)``.

    Parameters mirror skimage's ``optical_flow_tvl1`` (reference call at
    ``tissue_info.py:2066``); images are normalized to [0, 1] internally.
    """
    I0 = reference.astype(jnp.float32)
    I1 = moving.astype(jnp.float32)
    lo = jnp.minimum(I0.min(), I1.min())
    hi = jnp.maximum(I0.max(), I1.max())
    scale = jnp.maximum(hi - lo, 1e-8)
    I0 = (I0 - lo) / scale
    I1 = (I1 - lo) / scale
    H, W = I0.shape

    # pyramid shapes (static): halve until min_size
    shapes = [(H, W)]
    while min(shapes[-1]) // 2 >= min_size:
        shapes.append((shapes[-1][0] // 2, shapes[-1][1] // 2))
    shapes = shapes[::-1]  # coarse -> fine

    def down(img, shp):
        return jax.image.resize(img, shp, method="linear")

    u = jnp.zeros(shapes[0], jnp.float32)
    v = jnp.zeros(shapes[0], jnp.float32)
    for i, shp in enumerate(shapes):
        I0l = down(I0, shp)
        I1l = down(I1, shp)
        if i > 0:
            sy = shp[0] / shapes[i - 1][0]
            sx = shp[1] / shapes[i - 1][1]
            u = jax.image.resize(u, shp, method="linear") * sy
            v = jax.image.resize(v, shp, method="linear") * sx
        u, v = _tvl1_level(I0l, I1l, u, v, attachment, tightness,
                           num_warp, num_iter)
    return jnp.stack([u, v])
