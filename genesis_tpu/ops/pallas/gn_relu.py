"""Fused GroupNorm+ReLU (+optional 1x1 conv head) as Pallas TPU kernels.

The GENESIS-V2 decoder (models/genesisv2_config.py `_decoder_module`,
reference genesisv2_config.py:72-89 decoder Sequential) is the top
bandwidth-bound stage at 64px: its [K*B, H, W, C] activations make
multiple HBM round trips per stage under stock XLA — the deconv writes
the activation, GroupNorm's stats pass reads it, the normalise pass
reads it again and writes the ReLU output, and (at the last stage) the
1x1 RGBA head reads the full-size tensor once more.  Fused here, each
activation is read ONCE per stage (stats, normalise, ReLU and the head
matmul all happen on the VMEM-resident block):

  * `gn_relu(x, scale, bias)`            -> relu(groupnorm(x))
    2 passes (read x, write y) instead of 3.
  * `gn_relu_head(x, scale, bias, w, b)` -> relu(groupnorm(x)) @ w + b
    reads x once and writes only the [N, H, W, out] head output
    (out=4 vs C=64), instead of read+read+write+read+write-small.

Statistics use flax GroupNorm's conventions (float32, fast variance
``E[x^2] - E[x]^2``, epsilon inside the rsqrt) so the fused path is
numerically interchangeable with ``nn.relu(nn.GroupNorm(...)(x))``.

Gradients: both ops carry a custom VJP whose backward is a second
Pallas kernel over the same blocks.  The backward recomputes the group
statistics from the saved input (cheaper than round-tripping x_hat) and
emits per-program partial reductions for d(scale)/d(bias)/d(w)/d(b)
that the wrapper sums on the host side of the kernel boundary.

Layout: one image per program, grid over the folded [K*B] batch; the
block is [P, C] with pixels on sublanes and channels on lanes.  Group
reductions are expressed as [1, C] column sums folded through a static
0/1 channel->group assignment matmul (Mosaic-friendly; no 1D reshapes).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 8 * 1024 * 1024


def _group_mats(C: int, groups: int):
    """[C, G] one-hot channel->group assignment matrix, built from iota
    in-trace (Pallas kernels may not capture host array constants)."""
    gs = C // groups
    chan = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    return (chan // gs == grp).astype(jnp.float32)


def _stats(x, m_cg, gsize_p):
    """x: [P, C] f32. Returns per-channel (mean_c, inv_c) [1, C] using
    fast variance over each channel group (flax GroupNorm parity)."""
    s_c = jnp.sum(x, axis=0, keepdims=True)              # [1, C]
    q_c = jnp.sum(x * x, axis=0, keepdims=True)          # [1, C]
    if m_cg is None:  # groups == C (instance norm): identity fold
        mean_c = s_c / gsize_p
        var_c = jnp.maximum(q_c / gsize_p - mean_c * mean_c, 0.0)
        return mean_c, var_c
    s_g = jnp.dot(s_c, m_cg)                             # [1, G]
    q_g = jnp.dot(q_c, m_cg)                             # [1, G]
    mean_g = s_g / gsize_p
    var_g = jnp.maximum(q_g / gsize_p - mean_g * mean_g, 0.0)
    mean_c = jnp.dot(mean_g, m_cg.T)                     # [1, C]
    var_c = jnp.dot(var_g, m_cg.T)
    return mean_c, var_c


def _gn_relu_fwd_kernel(x_ref, scale_ref, bias_ref, y_ref,
                        *, groups: int, eps: float):
    x = x_ref[0].astype(jnp.float32)                     # [P, C]
    P, C = x.shape
    m_cg = None if groups == C else _group_mats(C, groups)
    mean_c, var_c = _stats(x, m_cg, float(P * (C // groups)))
    inv_c = jax.lax.rsqrt(var_c + eps)
    g = scale_ref[...].astype(jnp.float32)               # [1, C]
    b = bias_ref[...].astype(jnp.float32)
    a_c = inv_c * g
    b_c = b - mean_c * a_c
    y = jnp.maximum(x * a_c + b_c, 0.0)
    y_ref[0] = y.astype(y_ref.dtype)


def _gn_relu_head_fwd_kernel(x_ref, scale_ref, bias_ref, w_ref, hb_ref,
                             y_ref, *, groups: int, eps: float):
    x = x_ref[0].astype(jnp.float32)
    P, C = x.shape
    m_cg = None if groups == C else _group_mats(C, groups)
    mean_c, var_c = _stats(x, m_cg, float(P * (C // groups)))
    inv_c = jax.lax.rsqrt(var_c + eps)
    g = scale_ref[...].astype(jnp.float32)
    b = bias_ref[...].astype(jnp.float32)
    a_c = inv_c * g
    b_c = b - mean_c * a_c
    y = jnp.maximum(x * a_c + b_c, 0.0)                  # [P, C] f32
    w = w_ref[...].astype(jnp.float32)                   # [C, F]
    out = jnp.dot(y, w, preferred_element_type=jnp.float32)
    y_ref[0] = (out + hb_ref[...].astype(jnp.float32)).astype(y_ref.dtype)


def _fold(v, m_cg, gsize):
    """Group-fold a [1, C] row (sum within each group, broadcast back),
    divided by the group size; identity when groups == C."""
    if m_cg is None:
        return v / gsize
    return jnp.dot(jnp.dot(v, m_cg), m_cg.T) / gsize


def _gn_bwd_core(x, scale, groups, eps):
    """Recompute the forward's normalisation from the saved input.
    Returns (xhat, yhat_nobias = xhat*scale, inv_c, m_cg, gsize)."""
    P, C = x.shape
    m_cg = None if groups == C else _group_mats(C, groups)
    gsize = float(P * (C // groups))
    mean_c, var_c = _stats(x, m_cg, gsize)
    inv_c = jax.lax.rsqrt(var_c + eps)
    g = scale.astype(jnp.float32)
    xhat = (x - mean_c) * inv_c
    return xhat, xhat * g, inv_c, m_cg, gsize


def _gn_relu_bwd_kernel(x_ref, scale_ref, bias_ref, dy_ref,
                        dx_ref, dg_ref, db_ref,
                        *, groups: int, eps: float):
    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    g = scale_ref[...].astype(jnp.float32)
    b = bias_ref[...].astype(jnp.float32)
    xhat, yhat_nb, inv_c, m_cg, gsize = _gn_bwd_core(
        x, scale_ref[...], groups, eps)
    mask = (yhat_nb + b) > 0.0
    dyh = jnp.where(mask, dy, 0.0)                        # dL/d y_hat
    dg_ref[0] = jnp.sum(dyh * xhat, axis=0, keepdims=True)
    db_ref[0] = jnp.sum(dyh, axis=0, keepdims=True)
    dxh = dyh * g
    m1_c = _fold(jnp.sum(dxh, axis=0, keepdims=True), m_cg, gsize)
    m2_c = _fold(jnp.sum(dxh * xhat, axis=0, keepdims=True), m_cg,
                 gsize)
    dx = inv_c * (dxh - m1_c - xhat * m2_c)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _gn_relu_head_bwd_kernel(x_ref, scale_ref, bias_ref, w_ref,
                             dout_ref,
                             dx_ref, dg_ref, db_ref, dw_ref, dhb_ref,
                             *, groups: int, eps: float):
    x = x_ref[0].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)                # [P, F]
    g = scale_ref[...].astype(jnp.float32)
    b = bias_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)                    # [C, F]
    xhat, yhat_nb, inv_c, m_cg, gsize = _gn_bwd_core(
        x, scale_ref[...], groups, eps)
    yhat = yhat_nb + b
    y = jnp.maximum(yhat, 0.0)                            # relu out [P,C]
    # Head grads.
    dw_ref[0] = jax.lax.dot_general(
        y, dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [C, F]
    dhb_ref[0] = jnp.sum(dout, axis=0, keepdims=True)     # [1, F]
    dy = jax.lax.dot_general(
        dout, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [P, C]
    dyh = jnp.where(yhat > 0.0, dy, 0.0)
    dg_ref[0] = jnp.sum(dyh * xhat, axis=0, keepdims=True)
    db_ref[0] = jnp.sum(dyh, axis=0, keepdims=True)
    dxh = dyh * g
    m1_c = _fold(jnp.sum(dxh, axis=0, keepdims=True), m_cg, gsize)
    m2_c = _fold(jnp.sum(dxh * xhat, axis=0, keepdims=True), m_cg,
                 gsize)
    dx = inv_c * (dxh - m1_c - xhat * m2_c)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _interpret():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# gn_relu
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gn_relu(x, scale, bias, groups: int = 8, eps: float = 1e-5,
            out_dtype=None):
    """relu(groupnorm(x, scale, bias)) fused.  x: [N, H, W, C]."""
    out, _ = _gn_relu_fwd(x, scale, bias, groups, eps, out_dtype)
    return out


def _gn_relu_fwd(x, scale, bias, groups, eps, out_dtype):
    N, H, W, C = x.shape
    P = H * W
    od = out_dtype or x.dtype
    x3 = x.reshape(N, P, C)
    kern = functools.partial(_gn_relu_fwd_kernel, groups=groups, eps=eps)
    y = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, C), lambda n: (0, 0)),
            pl.BlockSpec((1, C), lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, P, C), od),
        interpret=_interpret(),
    )(x3, scale.reshape(1, C), bias.reshape(1, C))
    return y.reshape(N, H, W, C), (x, scale, bias)


def _gn_relu_bwd(groups, eps, out_dtype, res, dy):
    x, scale, bias = res
    N, H, W, C = x.shape
    P = H * W
    kern = functools.partial(_gn_relu_bwd_kernel, groups=groups, eps=eps)
    dx, dg, db = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, C), lambda n: (0, 0)),
            pl.BlockSpec((1, C), lambda n: (0, 0)),
            pl.BlockSpec((1, P, C), lambda n: (n, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, P, C), lambda n: (n, 0, 0)),
            # Mosaic tiling: trailing block dims must equal the array's
            # (or be x8/x128-tileable) — per-program reduction rows are
            # [N, 1, C] so each (1, 1, C) block matches the array tail.
            pl.BlockSpec((1, 1, C), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda n: (n, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, P, C), x.dtype),
            jax.ShapeDtypeStruct((N, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, C), jnp.float32),
        ),
        interpret=_interpret(),
    )(x.reshape(N, P, C), scale.reshape(1, C), bias.reshape(1, C),
      dy.reshape(N, P, C))
    return (dx.reshape(N, H, W, C),
            jnp.sum(dg, axis=(0, 1)).astype(scale.dtype),
            jnp.sum(db, axis=(0, 1)).astype(bias.dtype))


gn_relu.defvjp(_gn_relu_fwd, _gn_relu_bwd)


# ---------------------------------------------------------------------------
# gn_relu_head
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gn_relu_head(x, scale, bias, w, hb, groups: int = 8,
                 eps: float = 1e-5):
    """(relu(groupnorm(x)) @ w + hb) fused; the [N,H,W,C] activation is
    read once and never re-materialised.  w: [C, F]; out f32 [N,H,W,F]."""
    out, _ = _gn_relu_head_fwd(x, scale, bias, w, hb, groups, eps)
    return out


def _gn_relu_head_fwd(x, scale, bias, w, hb, groups, eps):
    N, H, W, C = x.shape
    F = w.shape[-1]
    P = H * W
    kern = functools.partial(_gn_relu_head_fwd_kernel, groups=groups,
                             eps=eps)
    y = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, C), lambda n: (0, 0)),
            pl.BlockSpec((1, C), lambda n: (0, 0)),
            pl.BlockSpec((C, F), lambda n: (0, 0)),
            pl.BlockSpec((1, F), lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, F), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, P, F), jnp.float32),
        interpret=_interpret(),
    )(x.reshape(N, P, C), scale.reshape(1, C), bias.reshape(1, C),
      w, hb.reshape(1, F))
    # Residuals must be JAX types (a raw np.dtype is not) — carry the
    # tiny [F] bias itself so the bwd can cast its cotangent to match.
    return y.reshape(N, H, W, F), (x, scale, bias, w, hb)


def _gn_relu_head_bwd(groups, eps, res, dout):
    x, scale, bias, w, hb = res
    N, H, W, C = x.shape
    F = w.shape[-1]
    P = H * W
    kern = functools.partial(_gn_relu_head_bwd_kernel, groups=groups,
                             eps=eps)
    dx, dg, db, dw, dhb = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, C), lambda n: (0, 0)),
            pl.BlockSpec((1, C), lambda n: (0, 0)),
            pl.BlockSpec((C, F), lambda n: (0, 0)),
            pl.BlockSpec((1, P, F), lambda n: (n, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, P, C), lambda n: (n, 0, 0)),
            # [N, 1, C]/[N, 1, F] reduction rows: see _gn_relu_bwd.
            pl.BlockSpec((1, 1, C), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, C, F), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda n: (n, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, P, C), x.dtype),
            jax.ShapeDtypeStruct((N, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((N, C, F), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, F), jnp.float32),
        ),
        interpret=_interpret(),
    )(x.reshape(N, P, C), scale.reshape(1, C), bias.reshape(1, C),
      w, dout.reshape(N, P, F))
    return (dx.reshape(N, H, W, C),
            jnp.sum(dg, axis=(0, 1)).astype(scale.dtype),
            jnp.sum(db, axis=(0, 1)).astype(bias.dtype),
            jnp.sum(dw, axis=0).astype(w.dtype),
            jnp.sum(dhb, axis=(0, 1)).astype(hb.dtype))


gn_relu_head.defvjp(_gn_relu_head_fwd, _gn_relu_head_bwd)


def supported(H: int, W: int, C: int, groups: int) -> bool:
    """One [P, C] image block (f32 in + f32 work + out) must fit VMEM
    and be tileable: pixels on sublanes (x8), channels on lanes."""
    P = H * W
    if C % groups != 0 or C % 8 != 0 or P % 8 != 0:
        return False
    return 3 * 4 * P * C <= _VMEM_BUDGET
