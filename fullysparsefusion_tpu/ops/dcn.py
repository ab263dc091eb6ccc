"""Deformable convolution v2 (DCN) — TPU-native.

The reference's 2D pre-inference model is HTC with DCN stages
(projects/configs/_base_/nuimages/htc_x101_64x4d_fpn_dconv_c3-c5_coco-20e_…:
``dcn=dict(type='DCNv2')``), run offline through mmcv's CUDA
``modulated_deform_conv``. The TPU formulation: the K² sampling locations
per output pixel are plain (base grid + predicted offset) coordinates, so
the op is bilinear gathers + a K²·Cin → Cout matmul — XLA-friendly, no
custom kernel needed (gathers are [H·W, Cin] row gathers, the matmul is
MXU-shaped).

out[p] = Σ_k m_k(p) · x(p + k + Δk(p)) @ w[k]   (modulated, v2)

Layout: NHWC activations, offsets [N, H, W, 2·K²] as (dy, dx) pairs in
mmcv channel order, mask [N, H, W, K²] (post-sigmoid).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(x: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """x [H, W, C]; ys/xs [...]: bilinear sample with zero padding outside."""
    h, w, c = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    out = 0.0
    flat = x.reshape(h * w, c)
    for dy, wyy in ((0, 1.0 - wy), (1, wy)):
        for dx, wxx in ((0, 1.0 - wx), (1, wx)):
            yi = y0.astype(jnp.int32) + dy
            xi = x0.astype(jnp.int32) + dx
            ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            v = flat[idx]  # [..., C] row gather
            out = out + v * (wyy * wxx * ok)[..., None]
    return out


def deform_conv2d(
    x: jax.Array,        # [N, H, W, Cin]
    offsets: jax.Array,  # [N, Ho, Wo, 2·K²] (dy, dx) interleaved, mmcv order
    w: jax.Array,        # [K, K, Cin, Cout]
    mask: Optional[jax.Array] = None,  # [N, Ho, Wo, K²] modulation (v2)
    stride: int = 1,
    padding: int = 1,
    bias: Optional[jax.Array] = None,
    groups: int = 1,
) -> jax.Array:
    """Modulated deformable conv (DCNv2 when ``mask`` given, v1 otherwise).

    ``groups`` is the CONV group count (ResNeXt's 64-way grouped 3×3 —
    w is then [K, K, Cin/groups, Cout]); deform_groups stays 1, matching
    the reference HTC config (deform_groups=1)."""
    n, h, wdt, cin = x.shape
    k = w.shape[0]
    k2 = k * k
    ho = (h + 2 * padding - k) // stride + 1
    wo = (wdt + 2 * padding - k) // stride + 1
    assert offsets.shape[-1] == 2 * k2, offsets.shape

    base_y = jnp.arange(ho, dtype=x.dtype) * stride - padding
    base_x = jnp.arange(wo, dtype=x.dtype) * stride - padding
    ky, kx = jnp.meshgrid(
        jnp.arange(k, dtype=x.dtype), jnp.arange(k, dtype=x.dtype), indexing="ij"
    )
    ky = ky.reshape(-1)  # [K²]
    kx = kx.reshape(-1)

    off = offsets.reshape(n, ho, wo, k2, 2)
    dy = off[..., 0]
    dx = off[..., 1]
    ys = base_y[None, :, None, None] + ky[None, None, None, :] + dy  # [N,Ho,Wo,K²]
    xs = base_x[None, None, :, None] + kx[None, None, None, :] + dx

    def one_image(xi, ysi, xsi, mi):
        samp = _bilinear_gather(xi, ysi, xsi)            # [Ho, Wo, K², Cin]
        if mi is not None:
            samp = samp * mi[..., None]
        if groups == 1:
            flat = samp.reshape(ho * wo, k2 * cin)
            return flat @ w.reshape(k2 * cin, -1)        # [Ho·Wo, Cout]
        cg = cin // groups
        cout = w.shape[-1]
        # [Ho·Wo, K², G, cg] × w [K², cg, Cout] with Cout split per group
        sg = samp.reshape(ho * wo, k2, groups, cg)
        wg = w.reshape(k2, cg, groups, cout // groups)
        return jnp.einsum(
            "pkgc,kcgo->pgo", sg, wg,
            preferred_element_type=jnp.float32,
        ).reshape(ho * wo, cout).astype(samp.dtype)

    if mask is None:
        out = jax.vmap(lambda a, b, c: one_image(a, b, c, None))(x, ys, xs)
    else:
        out = jax.vmap(one_image)(x, ys, xs, mask)
    out = out.reshape(n, ho, wo, -1)
    if bias is not None:
        out = out + bias
    return out


def dcn_offsets_conv(
    x: jax.Array, w_off: jax.Array, b_off: jax.Array, k: int,
    stride: int = 1, padding: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """The standard DCNv2 offset/mask branch: a plain conv producing
    3·K² channels → (offsets [.., 2K²], sigmoid mask [.., K²])."""
    out = jax.lax.conv_general_dilated(
        x, w_off, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b_off
    k2 = k * k
    return out[..., : 2 * k2], jax.nn.sigmoid(out[..., 2 * k2:])
