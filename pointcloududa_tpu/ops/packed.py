"""Space-to-depth channel packing for the sub-128-channel U-Net levels.

Why: the round-1 device profile (profiles/r2_trace, docs/SCALING.md) showed
the 224x224 level-0 ops — bf16[16,224,224,32] convs, BN reductions and the
decoder up-conv — running 4x lane-padded: XLA's TPU layout pads the trailing
(channel) axis to the 128-lane register width, so a C=32 tensor reads/writes
4x the physical bytes and a 32->32 conv occupies a 128x128 MXU tile at 1/16
useful occupancy. Those kernels measured at physical HBM peak, i.e. the
padding itself was the bottleneck.

Fix: run level 0 in a space-to-depth packed representation. A block-2
space-to-depth turns (B, H, W, C) into (B, H/2, W/2, 4C) — C=32 becomes 128
channels, exactly one lane register, zero padding. Every level-0 op has an
*exact* packed equivalent (this module provides the kernel/parameter
transforms; `models/unet.py` wires them behind ``packed_level0``):

- 3x3 stride-1 SAME conv  -> 3x3 SAME conv on the packed grid with a
  structured (4C, 4K) kernel: output sub-pixel (qy,qx) at packed cell (i,j)
  is original pixel (2i+qy, 2j+qx); its 3x3 input window spans packed cells
  (i+a, j+b), a,b in {-1,0,1}, at sub-positions (py,px) with
  dy = 2a+py-qy, dx = 2b+px-qx. Entries with |dy|>1 or |dx|>1 are zero
  (the packed kernel is 75% zeros — but those slots were *already* wasted
  as lane padding in the unpacked layout, and the packed tensor moves 4x
  fewer HBM bytes).
- nearest-up(2x) + 3x3 conv -> ONE 3x3 SAME conv on the *unpacked low-res*
  input producing the packed high-res output directly (the 224^2 upsampled
  intermediate never exists): up(x)[2i+qy+dy] = x[i + floor((qy+dy)/2)], so
  taps dy with equal floor((qy+dy)/2) merge by summation into a dense
  (C, 4K) kernel. This one is dense — same useful FLOPs as the logical op,
  zero padding, 4x less traffic.
- 2x2/2 max-pool -> max over the 4 sub-position lanes of each packed cell
  (pool windows coincide with packed cells).
- BatchNorm -> per-original-channel stats reduce over (batch, space,
  sub-position); flax BatchNorm semantics are reproduced exactly
  (f32 fast-variance E[x^2]-E[x]^2 with clipping, momentum running-stat
  update, no update at init time).
- 1x1 conv (classifier) -> sub-position-block-diagonal (4C, 4K) kernel,
  then depth_to_space on the logits.

Parameters are stored in the ORIGINAL unpacked shapes and packed on the fly
inside the step (9*32*32 -> 9*128*128 floats, negligible), so checkpoints
are interchangeable between the packed and standard paths.

Packed channel order is c-major: packed channel = c*4 + (py*2 + px). This
makes channel-wise concatenation commute with packing, which the decoder's
[skip, upsampled] concat relies on.

Reference parity: this is a pure execution-layout change of
``src/networks/unet.py``'s level-0 ops; numerics match the standard path to
dtype tolerance (tests/test_packed.py proves exact f32 agreement of the
kernel transforms and end-to-end model equivalence).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

_SUB = 4  # block 2x2 -> 4 sub-positions per packed cell


def _conv_maps():
    """Constant index/mask maps for :func:`pack_conv_kernel`.

    Returns (dy+1, dx+1, mask) of shape (3, 3, 4, 4) indexed by
    (a+1, b+1, p, q) with p = py*2+px (input sub-pos), q = qy*2+qx
    (output sub-pos); dy = 2a+py-qy, dx = 2b+px-qx; mask=1 iff both taps
    fall inside the original 3x3 window.
    """
    dy = np.zeros((3, 3, 4, 4), np.int32)
    dx = np.zeros((3, 3, 4, 4), np.int32)
    ok = np.zeros((3, 3, 4, 4), np.float32)
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    for qy in (0, 1):
                        for qx in (0, 1):
                            p, q = py * 2 + px, qy * 2 + qx
                            ddy, ddx = 2 * a + py - qy, 2 * b + px - qx
                            if abs(ddy) <= 1 and abs(ddx) <= 1:
                                dy[a + 1, b + 1, p, q] = ddy + 1
                                dx[a + 1, b + 1, p, q] = ddx + 1
                                ok[a + 1, b + 1, p, q] = 1.0
    return dy, dx, ok


_CONV_DY, _CONV_DX, _CONV_OK = _conv_maps()


def _upconv_maps():
    """Constant maps for :func:`pack_upconv_kernel`: per (a+1, b+1, q) the
    up-to-2 contributing taps per axis (dy in {2a-qy, 2a+1-qy} inside the
    3x3 window), as two (index, mask) candidate pairs per axis."""
    dy = np.zeros((2, 3, 4), np.int32)   # candidate i, a+1, q
    my = np.zeros((2, 3, 4), np.float32)
    dx = np.zeros((2, 3, 4), np.int32)
    mx = np.zeros((2, 3, 4), np.float32)
    for a in (-1, 0, 1):
        for qy in (0, 1):
            for qx in (0, 1):
                q = qy * 2 + qx
                for i, d in enumerate((2 * a - qy, 2 * a + 1 - qy)):
                    if -1 <= d <= 1:
                        dy[i, a + 1, q] = d + 1
                        my[i, a + 1, q] = 1.0
                for i, d in enumerate((2 * a - qx, 2 * a + 1 - qx)):
                    if -1 <= d <= 1:
                        dx[i, a + 1, q] = d + 1
                        mx[i, a + 1, q] = 1.0
    return dy, my, dx, mx


_UP_DY, _UP_MY, _UP_DX, _UP_MX = _upconv_maps()


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), packed channel = c*4 + py*2 + px."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"space_to_depth needs even H, W (got {h}x{w})")
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H/2, W/2, C, py, px
    return x.reshape(b, h // 2, w // 2, c * _SUB)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, hp, wp, c4 = x.shape
    c = c4 // _SUB
    x = x.reshape(b, hp, wp, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H/2, py, W/2, px, C
    return x.reshape(b, hp * 2, wp * 2, c)


def pack_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,C,K) stride-1 SAME kernel -> (3,3,4C,4K) packed-grid kernel."""
    kh, kw, c, k = w.shape
    assert kh == 3 and kw == 3, "packed path supports 3x3 kernels only"
    # one gather over the constant maps: (3,3,4,4,C,K) indexed (a,b,p,q,c,k)
    wp = w[_CONV_DY, _CONV_DX] * _CONV_OK[..., None, None].astype(w.dtype)
    wp = wp.transpose(0, 1, 4, 2, 5, 3)  # (3,3,C,p,K,q)
    return wp.reshape(3, 3, c * _SUB, k * _SUB)


def pack_upconv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,C,K) kernel of nearest-up(2x)+SAME-conv -> (3,3,C,4K) dense
    kernel applied directly to the low-res input, producing packed output."""
    kh, kw, c, k = w.shape
    assert kh == 3 and kw == 3
    wp = 0.0
    for i in range(2):
        for j in range(2):
            # (3,4) maps broadcast to (a,b,q): gather -> (3,3,4,C,K)
            dy = _UP_DY[i][:, None, :]
            dx = _UP_DX[j][None, :, :]
            m = (_UP_MY[i][:, None, :] * _UP_MX[j][None, :, :]).astype(w.dtype)
            dy, dx = np.broadcast_arrays(dy, dx)
            wp = wp + w[dy, dx] * m[..., None, None]
    wp = wp.transpose(0, 1, 3, 4, 2)  # (3,3,C,K,q)
    return wp.reshape(3, 3, c, k * _SUB)


def pack_pointwise_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(1,1,C,K) kernel -> (1,1,4C,4K) sub-position-block-diagonal kernel."""
    _, _, c, k = w.shape
    eye = np.eye(_SUB, dtype=np.float32)
    wp = w[0, 0][:, None, :, None] * jnp.asarray(eye, w.dtype)[None, :, None, :]
    return wp.reshape(1, 1, c * _SUB, k * _SUB)


def pack_bias(b: jnp.ndarray) -> jnp.ndarray:
    """(K,) bias -> (4K,) packed bias (each channel repeated per sub-pos)."""
    return jnp.repeat(b, _SUB)


def packed_conv(xp: jnp.ndarray, wp: jnp.ndarray, bp: jnp.ndarray) -> jnp.ndarray:
    """SAME NHWC conv on the packed grid (also used for the fused up-conv,
    where ``xp`` is the unpacked low-res input)."""
    y = lax.conv_general_dilated(
        xp,
        wp,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bp.astype(y.dtype)


def packed_max_pool(xp: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max-pool of the original tensor == max over the 4
    sub-position lanes of each packed cell. Returns the UNPACKED pooled
    tensor (B, H/2, W/2, C) — i.e. the packed cell grid, one value per cell."""
    b, hp, wp_, c4 = xp.shape
    return xp.reshape(b, hp, wp_, c4 // _SUB, _SUB).max(axis=-1)


def packed_bn_stats(xp: jnp.ndarray):
    """flax-BatchNorm-equivalent batch statistics of the packed tensor:
    f32 fast variance (E[x^2] - E[x]^2, clipped at 0) reduced over batch,
    space and the 4 sub-position lanes. Returns (mean, var) of shape (C,)."""
    b, hp, wp_, c4 = xp.shape
    xf = xp.astype(jnp.float32).reshape(b, hp, wp_, c4 // _SUB, _SUB)
    mean = jnp.mean(xf, axis=(0, 1, 2, 4))
    mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 4))
    return mean, jnp.maximum(mean2 - jnp.square(mean), 0.0)


def pack_stride2_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(4,4,C,K) stride-2 pad-2 kernel -> (2,2,4C,K) DENSE kernel on the
    packed grid (output UNPACKED at the strided resolution).

    Output pixel (i,j) of the original conv reads rows 2i+dy-2, dy in 0..3;
    row 2i+dy-2 = packed cell (i + alpha - 1) sub-position py with
    dy = 2*alpha + py — every tap maps, so the packed kernel has no zeros.
    With ((1,1),(1,1)) padding on the packed grid the 113-wide torch output
    of a 224-input (pad-2 k4 s2) is reproduced exactly: the left pad cell
    covers original rows -2/-1 and the right pad cell rows 224/225, all
    zero in both formulations."""
    kh, kw, c, k = w.shape
    assert kh == 4 and kw == 4, "stride-2 packed path supports 4x4 kernels only"
    wp = w.reshape(2, 2, 2, 2, c, k)  # (alpha, py, beta, px, c, k)
    wp = wp.transpose(0, 2, 4, 1, 3, 5)  # (alpha, beta, c, py, px, k)
    return wp.reshape(2, 2, c * _SUB, k)


def packed_stride2_conv(xp: jnp.ndarray, wp: jnp.ndarray) -> jnp.ndarray:
    """Apply a :func:`pack_stride2_kernel` kernel to a packed input: the
    exact equivalent of the original k4 s2 pad2 conv (e.g. the
    UncertaintyDiscriminator's first layer, GAN.py:97)."""
    return lax.conv_general_dilated(
        xp,
        wp,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def pixel_class_view(t: jnp.ndarray, n_class: int) -> jnp.ndarray:
    """c-major packed (B, h, w, 4C) -> (B, h, w, 4, C): the per-PIXEL class
    axis exposed last, for class-sensitive reductions (softmax, jaccard,
    dice, CE). Owns the packed-channel-order invariant (channel = c*4+sub)
    together with :func:`space_to_depth` — keep them in lockstep."""
    b, h, w, c4 = t.shape
    return t.reshape(b, h, w, n_class, _SUB).swapaxes(-1, -2)


def unpixel_class_view(t: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pixel_class_view`."""
    b, h, w, sub, c = t.shape
    return t.swapaxes(-1, -2).reshape(b, h, w, c * sub)
