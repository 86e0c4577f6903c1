"""Edge-avoiding à-trous wavelet denoiser (Dammertz et al. 2010 — the
standard real-time path-tracing filter; re-derived, not ported).

Extension beyond the reference (which ships raw 1-rpp noise and relies on
progressive accumulation): a few guided filter iterations give a usable
image at low frame counts. TPU-native shape: each iteration is 25
statically-shifted multiply-adds over the full image (B3-spline 5×5 taps
dilated 2^i à-trous) — pure elementwise jnp that XLA fuses; no gathers,
no data-dependent control flow.

Guidance weights stop the blur at feature edges:
    w = exp(-|c−c'|²/σ_c²) · exp(-|n−n'|²/σ_n²) · exp(-|z−z'|²/σ_z²)
using the primary-ray normal/depth AOVs (renderer.render_aov) — miss
pixels carry n=0/z=0, which is itself a feature edge, so silhouettes
against the sky stay crisp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# B3-spline coefficients (1/16, 1/4, 3/8, 1/4, 1/16)
_B3 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _pad_edge(x, p):
    """Edge-replicated spatial padding (one pad per iteration; every tap
    is then a STATIC slice — on TPU a slice is a cheap windowed copy
    while the equivalent index-array gather is row-rate-limited)."""
    return jnp.pad(x, ((p, p), (p, p), (0, 0)), mode="edge")


def _tap(xp, p, dy, dx, H, W):
    """Static-offset window of the padded image."""
    return xp[p + dy:p + dy + H, p + dx:p + dx + W]


@functools.partial(jax.jit, static_argnames=("iterations",))
def denoise(img, normal, depth, iterations: int = 3,
            sigma_color: float = 0.5, sigma_normal: float = 0.3,
            sigma_depth: float = 0.15):
    """À-trous guided filter → denoised (H, W, 3).

    Args:
      img: (H, W, 3) linear radiance (the accumulated beauty pass).
      normal: (H, W, 3) primary-ray normals (render_aov "normal").
      depth: (H, W, 1|3) primary-ray depth (render_aov "depth").
      iterations: à-trous levels (dilation 1, 2, 4, ...).
      sigma_*: edge-stopping bandwidths; depth is compared RELATIVE to
        the scene's depth range so the default works across scene scales.
    """
    depth = depth[..., :1]
    zrange = jnp.maximum(jnp.max(depth) - jnp.min(depth), 1e-6)
    z = depth / zrange
    H, W = img.shape[0], img.shape[1]
    out = img
    for it in range(iterations):
        step = 1 << it
        p = 2 * step
        outp = _pad_edge(out, p)
        np_ = _pad_edge(normal, p)
        zp = _pad_edge(z, p)
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros_like(out[..., :1])
        for iy in range(-2, 3):
            for ix in range(-2, 3):
                k = float(_B3[iy + 2] * _B3[ix + 2])
                c_s = _tap(outp, p, iy * step, ix * step, H, W)
                n_s = _tap(np_, p, iy * step, ix * step, H, W)
                z_s = _tap(zp, p, iy * step, ix * step, H, W)
                dc = jnp.sum((c_s - out) ** 2, -1, keepdims=True)
                dn = jnp.sum((n_s - normal) ** 2, -1, keepdims=True)
                dz = (z_s - z) ** 2
                w = k * jnp.exp(-dc / (sigma_color ** 2)
                                - dn / (sigma_normal ** 2)
                                - dz / (sigma_depth ** 2))
                acc = acc + w * c_s
                wsum = wsum + w
        out = acc / jnp.maximum(wsum, 1e-12)
    return out


def denoise_render(scene, basis, params, img, iterations: int = 3):
    """Convenience: fetch the guide AOVs and filter ``img``."""
    from .renderer import render_aov

    normal = render_aov(scene, basis, params, "normal")
    depth = render_aov(scene, basis, params, "depth")
    return denoise(img, normal, depth, iterations=iterations)
