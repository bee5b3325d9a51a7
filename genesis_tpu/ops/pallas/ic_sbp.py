"""Fused IC-SBP rollout as a Pallas TPU kernel.

The IC-SBP loop (ops/attention.py InstanceColouringSBP, reference
modules/attention.py:183-221) is a serial chain of small elementwise ops
per slot step: seed argmax under the scope, a colour gather, a kernel
distance over the colour field, a clamp and the SBP log-space update. As
stock XLA this is ~K x a dozen small VPU kernels with HBM round-trips
between them; here the whole K-step rollout runs in one kernel with the
colour field, random field and scope resident in VMEM.

Layout: batch rows on sublanes, pixels on lanes — every op in the kernel
is a full-width [B_chunk, P] VPU op; the per-step argmax is a row-wise
reduction and the seed "gather" is a one-hot masked row reduction (Mosaic
has no dynamic element gather). Grid over batch chunks bounds VMEM.

Gradients: seed *selection* is non-differentiable by construction, so
the custom VJP replays the differentiable alpha chain with the seed
pixel indices fixed (saved from the forward). With seeds fixed the K
steps decouple — alphas are computed for all K at once and the scope
recursion collapses to a cumsum — so the backward replay is fully
parallel, unlike the forward's inherently serial selection.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
CLAMP_LO = 0.01
CLAMP_HI = 0.99


def _ic_sbp_kernel(colour_ref, rand_ref, sigma_ref,
                   log_m_ref, log_s_ref,
                   scope_scratch,
                   *, steps: int, kernel: str):
    """One batch chunk per program; everything batch-vectorised.

    colour_ref: [D, Bc, P] VMEM; rand_ref: [Bc, P] VMEM;
    sigma_ref: [1, 1] SMEM; log_m_ref: [S+1, Bc, P];
    log_s_ref: [S+1, Bc, P]; scope_scratch: [Bc, P] f32 VMEM.

    Seed pixel indices are NOT exported: the caller recovers them as
    argmax(rand * exp(log_s_k)) from the returned scopes.
    """
    D = colour_ref.shape[0]
    Bc, P = rand_ref.shape
    sigma = sigma_ref[0, 0]
    pix_ids = jax.lax.broadcasted_iota(jnp.int32, (Bc, P), 1)

    scope_scratch[...] = jnp.zeros((Bc, P), jnp.float32)
    log_s_ref[0] = jnp.zeros((Bc, P), jnp.float32)
    rand = rand_ref[...]

    for k in range(steps):
        log_s = scope_scratch[...]
        probs = rand * jnp.exp(log_s)
        # Row-wise argmax with first-occurrence ties (jnp.argmax).
        pmax = jnp.max(probs, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(probs == pmax, pix_ids,
                                jnp.int32(2 ** 30)),
                      axis=1, keepdims=True)                # [Bc, 1]
        onehot = (pix_ids == idx).astype(jnp.float32)       # [Bc, P]
        dist = jnp.zeros((Bc, P), jnp.float32)
        for d in range(D):
            cd = colour_ref[d]                              # [Bc, P]
            seed_d = jnp.sum(cd * onehot, axis=1,
                             keepdims=True)                 # [Bc, 1]
            diff = cd - seed_d
            dist = dist + diff * diff
        if kernel == "laplacian":
            dist = jnp.sqrt(jnp.clip(dist, 1e-10, 1e10))
            alpha = jnp.exp(-dist / sigma)
        elif kernel == "gaussian":
            alpha = jnp.exp(-dist / sigma)
        else:  # epanechnikov
            alpha = jnp.maximum(1.0 - dist / sigma, 0.0)
        alpha = jnp.clip(alpha, CLAMP_LO, CLAMP_HI)
        log_m_ref[k] = log_s + jnp.log(alpha)
        new_s = log_s + jnp.log1p(-alpha)
        scope_scratch[...] = new_s
        log_s_ref[k + 1] = new_s
    log_m_ref[steps] = scope_scratch[...]


def _ic_sbp_step_kernel(colour_ref, rand_ref, sigma_ref,
                        log_m_ref, log_s_ref,
                        scope_scratch,
                        *, steps: int, kernel: str):
    """Step-grid variant for large pixel counts (128px+).

    One program per (batch-chunk, slot-step): the colour field, random
    field and running scope stay VMEM-resident across the step grid
    (scratch persists between sequential grid iterations; the colour
    block's index map ignores the step so Mosaic keeps it in place),
    while each step's log_m / log_s rows stream straight to HBM — VMEM
    holds 2 output rows instead of the 2*(S+1)-deep stack that blocks
    the resident kernel above 64px.

    Block shapes: colour [D, Bc, P]; rand [Bc, P]; log_m/log_s blocks
    [1, Bc, P] at step index k.
    """
    k = pl.program_id(1)
    D = colour_ref.shape[0]
    Bc, P = rand_ref.shape
    sigma = sigma_ref[0, 0]
    pix_ids = jax.lax.broadcasted_iota(jnp.int32, (Bc, P), 1)

    @pl.when(k == 0)
    def _():
        scope_scratch[...] = jnp.zeros((Bc, P), jnp.float32)

    log_s = scope_scratch[...]
    # log_s[k] = scope before step k (the final program k == steps only
    # writes the last scope and the scope-valued last mask).
    log_s_ref[0] = log_s

    @pl.when(k < steps)
    def _():
        probs = rand_ref[...] * jnp.exp(log_s)
        pmax = jnp.max(probs, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(probs == pmax, pix_ids,
                                jnp.int32(2 ** 30)),
                      axis=1, keepdims=True)
        onehot = (pix_ids == idx).astype(jnp.float32)
        dist = jnp.zeros((Bc, P), jnp.float32)
        for d in range(D):
            cd = colour_ref[d]
            seed_d = jnp.sum(cd * onehot, axis=1, keepdims=True)
            diff = cd - seed_d
            dist = dist + diff * diff
        if kernel == "laplacian":
            dist2 = jnp.sqrt(jnp.clip(dist, 1e-10, 1e10))
            alpha = jnp.exp(-dist2 / sigma)
        elif kernel == "gaussian":
            alpha = jnp.exp(-dist / sigma)
        else:  # epanechnikov
            alpha = jnp.maximum(1.0 - dist / sigma, 0.0)
        alpha = jnp.clip(alpha, CLAMP_LO, CLAMP_HI)
        log_m_ref[0] = log_s + jnp.log(alpha)
        scope_scratch[...] = log_s + jnp.log1p(-alpha)

    @pl.when(k == steps)
    def _():
        log_m_ref[0] = log_s


def _resident_bytes(chunk: int, P: int, D: int, steps: int) -> int:
    return 4 * chunk * P * (D + 1 + 2 * (steps + 1) + 1)


def _streamed_bytes(chunk: int, P: int, D: int) -> int:
    # colour + rand + scope scratch + 2 streamed out rows (+ double
    # buffering margin on the out rows).
    return 4 * chunk * P * (D + 1 + 1 + 4)


_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_chunk(B: int, P: int, D: int, steps: int) -> int:
    """Largest batch chunk keeping the resident kernel's VMEM under
    ~8MB (colour + rand + outputs + scratch, all f32)."""
    for chunk in (B, 16, 8):
        if B % chunk != 0 or chunk % 8 != 0:
            continue
        if _resident_bytes(chunk, P, D, steps) <= _VMEM_BUDGET:
            return chunk
    return 8 if B % 8 == 0 else B


def _pallas_forward(colour_t, rand, sigma, steps: int, kernel: str):
    """colour_t: [D, B, P] f32; rand: [B, P] f32; sigma: [1, 1] f32.
    Returns (log_m [S+1,B,P], log_s [S+1,B,P]).

    Dispatch: the fully-resident kernel when the (S+1)-deep output stack
    fits VMEM (<=64px), otherwise the step-grid kernel that streams each
    step's rows to HBM (extends Pallas IC-SBP to 128px)."""
    D, B, P = colour_t.shape
    out_shapes = (
        jax.ShapeDtypeStruct((steps + 1, B, P), jnp.float32),
        jax.ShapeDtypeStruct((steps + 1, B, P), jnp.float32),
    )
    interpret = jax.default_backend() != "tpu"

    Bc = _pick_chunk(B, P, D, steps)
    if _resident_bytes(Bc, P, D, steps) <= _VMEM_BUDGET:
        kern = functools.partial(_ic_sbp_kernel, steps=steps,
                                 kernel=kernel)
        return pl.pallas_call(
            kern,
            grid=(B // Bc,),
            in_specs=[
                pl.BlockSpec((D, Bc, P), lambda b: (0, b, 0)),
                pl.BlockSpec((Bc, P), lambda b: (b, 0)),
                pl.BlockSpec((1, 1), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((steps + 1, Bc, P), lambda b: (0, b, 0)),
                pl.BlockSpec((steps + 1, Bc, P), lambda b: (0, b, 0)),
            ),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((Bc, P), jnp.float32)],
            interpret=interpret,
        )(colour_t, rand, sigma)

    # Step-grid: grid (batch chunk, step); step is the fast axis so the
    # scope scratch carries across steps of one batch chunk and the
    # colour/rand blocks stay put between consecutive programs.
    Bc = 8 if B % 8 == 0 else B
    kern = functools.partial(_ic_sbp_step_kernel, steps=steps,
                             kernel=kernel)
    return pl.pallas_call(
        kern,
        grid=(B // Bc, steps + 1),
        in_specs=[
            pl.BlockSpec((D, Bc, P), lambda b, k: (0, b, 0)),
            pl.BlockSpec((Bc, P), lambda b, k: (b, 0)),
            pl.BlockSpec((1, 1), lambda b, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Bc, P), lambda b, k: (k, b, 0)),
            pl.BlockSpec((1, Bc, P), lambda b, k: (k, b, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((Bc, P), jnp.float32)],
        interpret=interpret,
    )(colour_t, rand, sigma)


def _alphas_fixed_seeds(colour_flat, log_sigma, seed_idx, steps: int,
                        kernel: str):
    """Differentiable, K-PARALLEL alpha computation with seed pixel
    indices fixed. colour_flat: [B,P,D]; seed_idx: [S,B].
    Returns (log_m [S+1,B,P], log_s [S+1,B,P], seeds [S,B,D])."""
    from genesis_tpu.ops import blocks as Bx

    sigma = jnp.exp(log_sigma)
    # seeds for all steps at once: [S, B, D]
    seeds = jax.vmap(
        lambda idx: jnp.take_along_axis(
            colour_flat, idx[:, None, None], axis=1)[:, 0])(seed_idx)
    diff = colour_flat[None] - seeds[:, :, None, :]         # [S,B,P,D]
    if kernel == "laplacian":
        sq = jnp.sum(diff ** 2, axis=-1)
        dist = jnp.sqrt(Bx.clamp_preserve_gradients(sq, 1e-10, 1e10))
        alpha = jnp.exp(-dist / sigma)
    elif kernel == "gaussian":
        dist = jnp.sum(diff ** 2, axis=-1)
        alpha = jnp.exp(-dist / sigma)
    else:
        dist = jnp.sum(diff ** 2, axis=-1)
        alpha = jax.nn.relu(1.0 - dist / sigma)
    alpha = Bx.clamp_preserve_gradients(alpha, CLAMP_LO, CLAMP_HI)
    # Scope recursion is a prefix sum once alphas are known.
    log_na = jnp.log1p(-alpha)                              # [S,B,P]
    zeros = jnp.zeros_like(log_na[:1])
    log_s = jnp.concatenate([zeros, jnp.cumsum(log_na, axis=0)], axis=0)
    log_m = jnp.concatenate(
        [log_s[:-1] + jnp.log(alpha), log_s[-1:]], axis=0)
    return log_m, log_s, seeds


def jax_rollout(colour, rand_pixel, log_sigma, steps: int, kernel: str):
    """Pure-JAX serial rollout (identical math; non-Pallas fallback and
    parity oracle). colour: [B,H,W,D]; rand_pixel: [B,H,W].
    Returns (log_m [S+1,B,H,W], log_s [S+1,B,H,W], seeds [S,B,D])."""
    from genesis_tpu.ops import blocks as Bx

    B, H, W, D = colour.shape
    flat = colour.reshape(B, H * W, D)
    rand = rand_pixel.reshape(B, H * W)
    sigma = jnp.exp(log_sigma)
    log_s = jnp.zeros((B, H * W), jnp.float32)
    log_m_k, log_s_k, seeds = [], [log_s], []
    for _ in range(steps):
        probs = rand * jnp.exp(log_s)
        idx = jnp.argmax(probs, axis=1)
        seed = jnp.take_along_axis(flat, idx[:, None, None], axis=1)
        seeds.append(seed[:, 0])
        if kernel == "laplacian":
            sq = jnp.sum((flat - seed) ** 2, axis=-1)
            dist = jnp.sqrt(Bx.clamp_preserve_gradients(sq, 1e-10, 1e10))
            alpha = jnp.exp(-dist / sigma)
        elif kernel == "gaussian":
            dist = jnp.sum((flat - seed) ** 2, axis=-1)
            alpha = jnp.exp(-dist / sigma)
        else:
            dist = jnp.sum((flat - seed) ** 2, axis=-1)
            alpha = jax.nn.relu(1.0 - dist / sigma)
        alpha = Bx.clamp_preserve_gradients(alpha, CLAMP_LO, CLAMP_HI)
        log_m_k.append(log_s + jnp.log(alpha))
        log_s = log_s + jnp.log1p(-alpha)
        log_s_k.append(log_s)
    log_m_k.append(log_s)
    return (jnp.stack(log_m_k).reshape(-1, B, H, W),
            jnp.stack(log_s_k).reshape(-1, B, H, W),
            jnp.stack(seeds))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ic_sbp_rollout(colour, rand_pixel, log_sigma, steps: int, kernel: str):
    """Fused IC-SBP rollout (Pallas forward, fixed-seed parallel VJP).

    colour: [B,H,W,D] f32; rand_pixel: [B,H,W] f32; log_sigma scalar.
    Returns (log_m [S+1,B,H,W], log_s [S+1,B,H,W], seeds [S,B,D]).
    """
    out, _ = _ic_sbp_fwd(colour, rand_pixel, log_sigma, steps, kernel)
    return out


def _ic_sbp_fwd(colour, rand_pixel, log_sigma, steps, kernel):
    B, H, W, D = colour.shape
    P = H * W
    colour_t = jnp.transpose(
        colour.reshape(B, P, D), (2, 0, 1)).astype(jnp.float32)
    rand = rand_pixel.reshape(B, P).astype(jnp.float32)
    sigma = jnp.exp(log_sigma).astype(jnp.float32).reshape(1, 1)
    log_m, log_s = _pallas_forward(colour_t, rand, sigma, steps, kernel)
    # Recover seed pixel indices from the scopes (the kernel's argmax is
    # a deterministic function of rand and log_s): [S, B].
    probs = rand[None] * jnp.exp(log_s[:-1])
    seed_idx = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    # Seeds for the stats output (cheap outside-kernel gather).
    flat = colour.reshape(B, P, D)
    seeds = jax.vmap(
        lambda idx: jnp.take_along_axis(
            flat, idx[:, None, None], axis=1)[:, 0])(seed_idx)  # [S,B,D]
    out = (log_m.reshape(-1, B, H, W), log_s.reshape(-1, B, H, W), seeds)
    return out, (colour, log_sigma, seed_idx)


def _ic_sbp_bwd(steps, kernel, residuals, cotangents):
    colour, log_sigma, seed_idx = residuals
    B, H, W, D = colour.shape

    def replay(colour, log_sigma):
        log_m, log_s, seeds = _alphas_fixed_seeds(
            colour.reshape(B, H * W, D), log_sigma, seed_idx, steps,
            kernel)
        return (log_m.reshape(-1, B, H, W), log_s.reshape(-1, B, H, W),
                seeds)

    _, vjp = jax.vjp(replay, colour, log_sigma)
    g_colour, g_log_sigma = vjp(cotangents)
    return g_colour, None, g_log_sigma


ic_sbp_rollout.defvjp(_ic_sbp_fwd, _ic_sbp_bwd)


def supported(img_size: int, steps: int = 10, colour_dim: int = 8) -> bool:
    """Lane-aligned pixel count AND the minimum batch chunk (8 sublanes)
    must fit VMEM for at least one kernel layout: the fully-resident
    rollout (<=64px) or the step-grid streaming variant (128px)."""
    P = img_size * img_size
    if P % LANE != 0:
        return False
    if _resident_bytes(8, P, colour_dim, steps) <= _VMEM_BUDGET:
        return True
    return _streamed_bytes(8, P, colour_dim) <= _VMEM_BUDGET
