"""Deformable conv: zero-offset equivalence with a dense conv + a numpy
bilinear oracle for arbitrary offsets."""
import numpy as np
import jax
import jax.numpy as jnp

from fullysparsefusion_tpu.ops.dcn import deform_conv2d, dcn_offsets_conv


def _np_oracle(x, offsets, w, mask, stride, padding):
    n, h, wd, cin = x.shape
    k = w.shape[0]
    k2 = k * k
    ho = (h + 2 * padding - k) // stride + 1
    wo = (wd + 2 * padding - k) // stride + 1
    out = np.zeros((n, ho, wo, w.shape[-1]), np.float64)
    for ni in range(n):
        for oy in range(ho):
            for ox in range(wo):
                acc = np.zeros(w.shape[-1], np.float64)
                for ki in range(k2):
                    ky, kx = ki // k, ki % k
                    dy = offsets[ni, oy, ox, 2 * ki]
                    dx = offsets[ni, oy, ox, 2 * ki + 1]
                    ys = oy * stride - padding + ky + dy
                    xs = ox * stride - padding + kx + dx
                    y0, x0 = int(np.floor(ys)), int(np.floor(xs))
                    wy, wx = ys - y0, xs - x0
                    v = np.zeros(cin, np.float64)
                    for yy, wyy in ((y0, 1 - wy), (y0 + 1, wy)):
                        for xx, wxx in ((x0, 1 - wx), (x0 + 1, wx)):
                            if 0 <= yy < h and 0 <= xx < wd:
                                v += x[ni, yy, xx] * wyy * wxx
                    m = mask[ni, oy, ox, ki] if mask is not None else 1.0
                    acc += m * (v @ w[ky, kx])
                out[ni, oy, ox] = acc
    return out


def test_zero_offset_matches_dense_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 9, 11, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    offsets = jnp.zeros((2, 9, 11, 18), jnp.float32)
    out = deform_conv2d(x, offsets, w)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fractional_offsets_match_numpy_oracle():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 7, 8, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 5)).astype(np.float32)
    offsets = rng.uniform(-1.5, 1.5, (1, 7, 8, 18)).astype(np.float32)
    mask = rng.uniform(0, 1, (1, 7, 8, 9)).astype(np.float32)
    out = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w), jnp.asarray(mask)
    )
    ref = _np_oracle(x, offsets, w, mask, 1, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_offset_branch_and_jit_grad():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    w_off = jnp.asarray(rng.normal(size=(3, 3, 4, 27)).astype(np.float32) * 0.01)
    b_off = jnp.zeros(27, jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32))

    @jax.jit
    def f(x, w_off, w):
        off, m = dcn_offsets_conv(x, w_off, b_off, 3)
        return deform_conv2d(x, off, w, m).sum()

    v, g = jax.value_and_grad(f, argnums=(0, 1, 2))(x, w_off, w)
    assert np.isfinite(float(v))
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(gi).sum()) > 0
